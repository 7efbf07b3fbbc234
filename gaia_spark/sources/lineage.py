"""Resumable batch execution with per-partition lineage + metrics.

North-rule requirement (``BASELINE.json:14``): "resumable from checkpoint
with per-partition lineage + metrics". A job is split into named UNITS
(e.g. warc_ts days or url-hash buckets); each unit's output is committed to
an icelite table together with a lineage row. On restart, done units are
anti-joined away and only the remainder recomputes — unit processing must
be deterministic (everything in this engine is), so reruns are idempotent.

Lineage rows live in their own icelite table:
    (job_id, unit, status, input_rows, output_rows, attempt,
     started_unix, finished_unix)
"""

from __future__ import annotations

import time
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from gaia_spark.sources.icelite import IceTable


class ResumableJob:
    def __init__(self, spark: SparkSession, job_id: str, output: IceTable, lineage: IceTable):
        self.spark = spark
        self.job_id = job_id
        self.output = output
        self.lineage = lineage

    def done_units(self) -> set[str]:
        try:
            ldf = self.lineage.read(self.spark)
        except FileNotFoundError:
            return set()
        rows = (
            ldf.where(f"job_id = '{self.job_id}' AND status = 'done'")
            .select("unit")
            .distinct()
            .collect()
        )
        return {r.unit for r in rows}

    def run(
        self,
        units: list[str],
        process: Callable[[SparkSession, str], DataFrame],
        fail_after: int | None = None,
    ) -> dict:
        """Process every not-yet-done unit; each unit = one atomic commit of
        (data append, lineage append). ``fail_after`` aborts after N units —
        the crash-injection hook for resumability tests."""
        done = self.done_units()
        # exactly-once: prune data commits whose lineage row never landed
        # (crash between data-append and lineage-append), then recompute them
        self.output.rollback_uncommitted_units(self.job_id, done)
        pending = [u for u in units if u not in done]
        processed = 0
        for unit in pending:
            if fail_after is not None and processed >= fail_after:
                raise RuntimeError(f"injected failure after {processed} units")
            t0 = time.time()
            out = process(self.spark, unit)
            # ONE execution per unit: append() writes the data and records the
            # row count from the parquet footers in the commit manifest — a
            # separate count() action would re-run the whole unit plan.
            manifest = self.output.append(out, meta={"job_id": self.job_id, "unit": unit})
            n_out = manifest["meta"]["added_rows"]
            lrow = self.spark.createDataFrame(
                [(self.job_id, unit, "done", n_out, 1, float(t0), float(time.time()))],
                "job_id string, unit string, status string, output_rows long, "
                "attempt int, started_unix double, finished_unix double",
            )
            self.lineage.append(lrow)
            processed += 1
        return {"processed": processed, "skipped": len(units) - len(pending)}
