"""Extra benchmark tooling for optimization rounds (guide §1).

NOT the driver's bench — bench.py stays frozen. This harness reuses
bench.headline_queries verbatim so numbers are comparable, and adds:

  --only q1,q2     run a subset (prefix match, like SPARK_GRAFT_ONLY)
  --reps N         reps per query (default 3, min reported)
  --noop           time with the noop sink (computes EVERY column) instead
                   of count() — guide §1.4 isolation
  --explain DIR    write .explain("formatted") per query to DIR/<name>.txt
  --tag TAG        suffix for explain files (e.g. before/after)

Usage:
  python bench_extra.py --only ngon512 --reps 3
  python bench_extra.py --explain plans/r06 --tag before --reps 0
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import bench  # the frozen harness: session + data + query builders


def membw_canary_gbps() -> float:
    """Fixed memory-bandwidth probe (VERDICT r5 #4): a 256 MB numpy copy
    sweep. Hypervisor memory-bandwidth storms that do NOT surface as steal%
    show up here as a depressed GB/s; a rep only counts as calm when the
    canary is within tolerance of the best observed value."""
    import numpy as np

    a = np.empty(32 * 1024 * 1024, dtype=np.float64)  # 256 MB
    a[:] = 1.0
    t0 = time.perf_counter()
    b = a.copy()
    dt = time.perf_counter() - t0
    del b
    return round(2 * a.nbytes / dt / 1e9, 2)  # read+write bytes


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--only", default="")
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--noop", action="store_true")
    ap.add_argument("--explain", default="")
    ap.add_argument("--tag", default="")
    args = ap.parse_args()

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    n_pages = int(os.environ.get("SPARK_GRAFT_PAGES", "1000000"))
    cache_dir = os.environ.get(
        "SPARK_GRAFT_CACHE",
        os.path.join(os.path.dirname(os.path.abspath(__file__)), "BENCH", "cache"),
    )

    spark = bench.build_session(cpus)
    pages_path = bench.ensure_pages(spark, n_pages, cache_dir)
    points_path = bench.ensure_points(spark, n_pages, cache_dir)

    prefixes = [p for p in args.only.split(",") if p]
    times: dict[str, list[float]] = {}
    rows: dict[str, int] = {}
    cany: dict[str, list[float]] = {}
    stl: dict[str, list[float]] = {}
    for name, build in bench.headline_queries(spark, pages_path, sf_dir, points_path).items():
        if prefixes and not any(name.startswith(p) for p in prefixes):
            continue
        if args.explain:
            os.makedirs(args.explain, exist_ok=True)
            suffix = f"_{args.tag}" if args.tag else ""
            mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
            txt = build()._jdf.queryExecution().explainString(mode)
            with open(os.path.join(args.explain, f"{name}{suffix}.txt"), "w") as f:
                f.write(txt)
        samples, canaries, steals = [], [], []
        for _ in range(args.reps):
            spark.catalog.clearCache()
            spark.sparkContext.setJobDescription(f"bench_extra: {name}")
            canaries.append(membw_canary_gbps())
            c0, s0 = bench.cpu_ticks()
            t0 = time.perf_counter()
            df = build()
            if args.noop:
                df.write.format("noop").mode("overwrite").save()
                n = -1
            else:
                n = df.count()
            samples.append(round(time.perf_counter() - t0, 3))
            c1, s1 = bench.cpu_ticks()
            steals.append(round(100.0 * (s1 - s0) / max(c1 - c0, 1), 2))
            print(
                f"  {name}: {samples[-1]:.3f}s steal={steals[-1]}% "
                f"membw={canaries[-1]}GB/s",
                file=sys.stderr,
            )
        if samples:
            times[name] = samples
            rows[name] = n
            cany.setdefault(name, canaries)
            stl.setdefault(name, steals)
    out = {
        "mode": "noop" if args.noop else "count",
        "times": times,
        "min": {k: min(v) for k, v in times.items()},
        "rows_out": rows,
        "membw_gbps": cany,
        "steal_pct": stl,
    }
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
