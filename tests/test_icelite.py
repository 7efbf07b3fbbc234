"""icelite snapshots + resumable-job exactly-once semantics (SURVEY.md §7 M5)."""

import pytest

from gaia_spark.sources.icelite import IceTable
from gaia_spark.sources.lineage import ResumableJob


def make_tables(tmp_path):
    return IceTable(str(tmp_path / "out")), IceTable(str(tmp_path / "lineage"))


def process(spark, unit):
    # deterministic per-unit output: 10 rows keyed by the unit
    return spark.range(10).selectExpr(f"'{unit}' AS unit", "id AS v")


UNITS = [f"day-{i}" for i in range(6)]


def test_snapshot_append_and_time_travel(spark, tmp_path):
    t = IceTable(str(tmp_path / "t"))
    t.append(spark.range(5).selectExpr("id AS v"))
    t.append(spark.range(3).selectExpr("id + 100 AS v"))
    assert t.read(spark).count() == 8
    assert t.read(spark, snapshot_id=1).count() == 5  # time travel
    t.overwrite(spark.range(2).selectExpr("id AS v"))
    assert t.read(spark).count() == 2
    assert len(t.snapshots()) == 3


def test_resume_skips_done_units(spark, tmp_path):
    out, lin = make_tables(tmp_path)
    job = ResumableJob(spark, "job1", out, lin)
    with pytest.raises(RuntimeError, match="injected failure"):
        job.run(UNITS, process, fail_after=3)
    assert out.read(spark).count() == 30
    assert job.done_units() == set(UNITS[:3])

    stats = job.run(UNITS, process)  # resume
    assert stats == {"processed": 3, "skipped": 3}
    final = out.read(spark)
    assert final.count() == 60
    assert {r.unit for r in final.select("unit").distinct().collect()} == set(UNITS)
    # rerun is a no-op
    assert job.run(UNITS, process) == {"processed": 0, "skipped": 6}
    assert out.read(spark).count() == 60


def test_crash_between_data_and_lineage_is_rolled_back(spark, tmp_path):
    out, lin = make_tables(tmp_path)
    job = ResumableJob(spark, "job2", out, lin)
    # simulate torn commit: data appended with unit meta, lineage missing
    out.append(process(spark, "day-0"), meta={"job_id": "job2", "unit": "day-0"})
    assert out.read(spark).count() == 10
    stats = job.run(UNITS, process)
    assert stats["processed"] == 6  # day-0 recomputed, orphan pruned
    assert out.read(spark).count() == 60  # NOT 70 — exactly-once held


def test_resume_output_equals_oneshot(spark, tmp_path):
    out1, lin1 = make_tables(tmp_path / "a")
    ResumableJob(spark, "j", out1, lin1).run(UNITS, process)
    out2, lin2 = make_tables(tmp_path / "b")
    job2 = ResumableJob(spark, "j", out2, lin2)
    with pytest.raises(RuntimeError):
        job2.run(UNITS, process, fail_after=2)
    job2.run(UNITS, process)
    a = {tuple(r) for r in out1.read(spark).collect()}
    b = {tuple(r) for r in out2.read(spark).collect()}
    assert a == b
