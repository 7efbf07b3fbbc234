"""Benchmark harness — prints ONE JSON line with headline timings.

Covers the north-rule metrics (BASELINE.json:2): pages/sec through
geoparse+encode, join-rows/sec through the cell-bucketed spatial join, plus
tiling/kNN/zonal/relational headline queries on the driver's sf tables.

Env knobs:
  SPARK_GRAFT_SF_DIR   testdata dir      (default /root/testdata/sf0.1)
  SPARK_GRAFT_CPUS     local[N] threads  (default 32)
  SPARK_GRAFT_PAGES    synthetic pages   (default 1_000_000)
  SPARK_GRAFT_REPS     reps per query    (default 1; median reported)

Synthetic pages are written once to parquet (deterministic, seed 42) so
every query reads from disk like a real table scan; the cache is keyed by
row count and reused across runs/parallelism levels.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def build_session(cpus: int):
    from gaia_spark.session import get_session

    return get_session(
        master=f"local[{cpus}]",
        app_name=f"gaia_spark_bench_{cpus}",
        confs={
            "spark.sql.shuffle.partitions": str(max(cpus * 2, 8)),
            # NB: oversized heaps (48g) measured 3-6x SLOWER on this suite
            # (GC ergonomics); 8g is plenty for local-mode benches.
            "spark.driver.memory": os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"),
            # scan-task granularity: the default 128m packed a 1.3 GB input
            # into 19 tasks — at 8+ threads that is ~2.4 waves with a ragged
            # 3-task tail (~20% idle), which alone caps N-vs-4N join scaling
            # at ~0.83. 16m gives ~80 tasks → even waves at every level.
            "spark.sql.files.maxPartitionBytes": os.environ.get(
                "SPARK_GRAFT_MAX_PARTITION_BYTES", "16m"
            ),
        },
    )


def ensure_pages(spark, n_pages: int, cache_dir: str) -> str:
    path = os.path.join(cache_dir, f"pages_{n_pages}")
    marker = os.path.join(path, "_SUCCESS")
    if not os.path.exists(marker):
        from gaia_spark.synth import synth_pages

        # ≥ 64 files so every parallelism level under test has full task
        # fan-out on the scan stage (a 9-file table caps local[32] at 9 tasks)
        parts = min(max(n_pages // 15_625, 64), 512)
        synth_pages(spark, n_pages, partitions=parts).write.mode("overwrite").parquet(path)
    return path


def ensure_points(spark, n_pages: int, cache_dir: str) -> str:
    """Materialized geoparsed points (url, lat, lon) — isolates the JVM-only
    join metric from the Python geoparse stage. (Python UDF workers run on
    cores OUTSIDE local[N]'s task slots, so a UDF-bearing job at local[2]
    effectively uses ~4 cores and corrupts N-vs-4N scaling ratios.)"""
    path = os.path.join(cache_dir, f"points_{n_pages}")
    marker = os.path.join(path, "_SUCCESS")
    if not os.path.exists(marker):
        from gaia_spark.functions.geoparse import geoparse

        pages = spark.read.parquet(ensure_pages(spark, n_pages, cache_dir))
        geoparse(pages).where("lat is not null").select("url", "lat", "lon").write.mode(
            "overwrite"
        ).parquet(path)
    return path


def ensure_points_synth(spark, n_points: int, cache_dir: str) -> str:
    """Large synthetic point table generated JVM-side (key-derived lat/lon,
    no Python anywhere) — sized to amortize fixed job overheads when
    measuring the isolated join's N-vs-4N scaling."""
    import pyspark.sql.functions as F

    path = os.path.join(cache_dir, f"points_synth_{n_points}")
    marker = os.path.join(path, "_SUCCESS")
    if not os.path.exists(marker):
        parts = min(max(n_points // 250_000, 64), 512)
        df = (
            spark.range(0, n_points, numPartitions=parts)
            .select(
                F.col("id").cast("string").alias("url"),
                F.expr("((id * 7919) % 17000000) / cast(100000 as double) - 85.0").alias("lat"),
                F.expr("((id * 104729) % 36000000) / cast(100000 as double) - 180.0").alias("lon"),
            )
        )
        df.write.mode("overwrite").parquet(path)
    return path


def ensure_parcels_synth(spark, n_parcels: int, cache_dir: str) -> str:
    """Synthetic rect-parcel FEATURE layer (ring arrays, JVM-generated,
    0.2-1.2 deg extents) — benches the non-point feature join."""
    import pyspark.sql.functions as F

    path = os.path.join(cache_dir, f"parcels_synth_{n_parcels}")
    marker = os.path.join(path, "_SUCCESS")
    if not os.path.exists(marker):
        parts = min(max(n_parcels // 15_625, 64), 512)
        base = spark.range(0, n_parcels, numPartitions=parts).select(
            F.col("id").alias("fid"),
            F.expr("((id * 7919) % 16000000) / cast(100000 as double) - 80.0").alias("_clat"),
            F.expr("((id * 104729) % 35000000) / cast(100000 as double) - 175.0").alias("_clon"),
            F.expr("(10 + (id * 13) % 50) / cast(100 as double)").alias("_hl"),
            F.expr("(10 + (id * 29) % 110) / cast(100 as double)").alias("_hw"),
        )
        ring = (
            "array(struct(_clat - _hl AS lat, _clon - _hw AS lon), "
            "struct(_clat - _hl AS lat, _clon + _hw AS lon), "
            "struct(_clat + _hl AS lat, _clon + _hw AS lon), "
            "struct(_clat + _hl AS lat, _clon - _hw AS lon), "
            "struct(_clat - _hl AS lat, _clon - _hw AS lon))"
        )
        base.select("fid", F.expr(ring).alias("vertices")).write.mode("overwrite").parquet(path)
    return path


def ensure_ngon_parcels_synth(spark, n_parcels: int, n_vertices: int, cache_dir: str) -> str:
    """Synthetic LARGE-VERTEX polygon layer (n_vertices-gon rings, JVM
    sequence/transform generated) — benches the edge-bucket prefilter: the
    pairwise cross/overlap sweep must stay sub-quadratic in vertex count."""
    import pyspark.sql.functions as F

    path = os.path.join(cache_dir, f"ngon_{n_vertices}_parcels_{n_parcels}")
    marker = os.path.join(path, "_SUCCESS")
    if not os.path.exists(marker):
        parts = min(max(n_parcels // 2_000, 32), 256)
        base = spark.range(0, n_parcels, numPartitions=parts).select(
            F.col("id").alias("fid"),
            F.expr("((id * 7919) % 15000000) / cast(100000 as double) - 75.0").alias("_clat"),
            F.expr("((id * 104729) % 34000000) / cast(100000 as double) - 170.0").alias("_clon"),
            F.expr("(30 + (id * 13) % 120) / cast(100 as double)").alias("_r"),
        )
        ring = (
            f"transform(sequence(0, {n_vertices}), i -> struct("
            f"_clat + _r * cos(2 * pi() * (i % {n_vertices}) / {n_vertices}) AS lat, "
            f"_clon + _r * sin(2 * pi() * (i % {n_vertices}) / {n_vertices}) AS lon))"
        )
        base.select("fid", F.expr(ring).alias("vertices")).write.mode("overwrite").parquet(path)
    return path


def headline_queries(spark, pages_path: str, sf_dir: str, points_path: str | None = None):
    """name -> (build_df, rows_metric) — rows_metric counts throughput rows."""
    import pyspark.sql.functions as F

    from gaia_spark.functions.geoparse import geoparse
    from gaia_spark.operators.knn import knn_join_broadcast
    from gaia_spark.operators.raster import point_tile_pyramid
    from gaia_spark.operators.spatial_join import ZoneIndex, spatial_join, with_cell
    from gaia_spark.operators.zonal import zonal_stats
    from gaia_spark.queries import REGISTRY, site_points_pdf
    from gaia_spark.synth import synth_zones_pdf

    idx = ZoneIndex.build(synth_zones_pdf(16))

    def pages():
        return spark.read.parquet(pages_path)

    def geoparsed():
        return geoparse(pages())

    def _parcels_join():
        from gaia_spark.operators.feature_join import feature_spatial_join

        cache_dir = os.path.dirname(pages_path)
        parcels = spark.read.parquet(ensure_parcels_synth(spark, 1_000_000, cache_dir))
        return feature_spatial_join(parcels, idx, "intersects", feature_key="fid")

    def _kde(res: int = 8, bandwidth_m: float = 60_000.0):
        from gaia_spark.operators.interpolate import kde_grid

        return kde_grid(geoparsed().where(F.col("lat").isNotNull()), res, bandwidth_m)

    def _ngon_join(refine: str = "sql"):
        from gaia_spark.operators.feature_join import feature_spatial_join

        cache_dir = os.path.dirname(pages_path)
        ngons = spark.read.parquet(ensure_ngon_parcels_synth(spark, 100_000, 512, cache_dir))
        return feature_spatial_join(ngons, idx, "intersects", feature_key="fid", refine=refine)

    qs = {
        # pages/sec metric: geoparse + multi-res encode over the full table.
        # filter on lat (nullable UDF output) forces the parse — a bare
        # count() lets Catalyst prune the UDF, and cell ids are clamped
        # non-nullable so filtering on them constant-folds away
        "pages_geoparse_encode": lambda: with_cell(with_cell(geoparsed(), 10), 6).where(
            F.col("lat").isNotNull()
        ),
        # join-rows/sec metric: cell-bucketed within join vs 16 zones
        "pages_within_join": lambda: spatial_join(geoparsed(), idx, "within"),
        # join operator isolated (pre-parsed points, pure JVM end to end) —
        # the scaling-gate variant of join-rows/sec
        "points_within_join": lambda: spatial_join(
            spark.read.parquet(points_path), idx, "within"
        )
        if points_path
        else spatial_join(geoparsed(), idx, "within"),
        "pages_zonal_stats": lambda: zonal_stats(
            spatial_join(
                geoparsed().withColumn("val", F.length("text").cast("double")), idx, "within"
            ),
            "val",
        ),
        # the 10^12-scale path: approx median is a mergeable sketch, so the
        # final aggregation stays combine-based instead of buffering values
        "pages_zonal_stats_approx": lambda: zonal_stats(
            spatial_join(
                geoparsed().withColumn("val", F.length("text").cast("double")), idx, "within"
            ),
            "val",
            exact_median=False,
        ),
        "pages_tile_pyramid": lambda: point_tile_pyramid(geoparsed(), max_zoom=8, min_zoom=4),
        # non-point feature layer: 1M rect parcels vs 16 zones, generic
        # vertex/edge refine (poly-poly intersects), zero-shuffle plan
        "parcels_intersects_join": lambda: _parcels_join(),
        # LARGE-VERTEX feature layer: 100k 512-gon polygons — exercises the
        # bbox-intersection edge clip that keeps the pairwise cross sweep
        # sub-quadratic in vertex count
        "ngon512_intersects_join": lambda: _ngon_join(),
        # A/B refine backend: the same join refined by Arrow-batched numpy
        # (one vectorized matrix op per pair instead of interpreted HOF
        # lambdas) — the large-vertex fast path
        "ngon512_intersects_arrow": lambda: _ngon_join(refine="arrow"),
        "pages_knn1": lambda: knn_join_broadcast(geoparsed(), site_points_pdf(), k=1),
        # density rasterization (round-4): join-free scatter plan — points
        # explode onto reachable res-8 cells, one groupBy(cell); measures
        # the IDW/KDE operator family at page scale
        "pages_kde_grid": lambda: _kde(),
        # movement tier (round-5): dwell-episode detection over the events
        # timeline — one user window shuffle + reused-partitioning agg
        "q_staypoints": lambda: REGISTRY["q_staypoints"].spark(spark, sf_dir),
        # round-5 session-4 flagships: Viterbi map matching (cogrouped
        # Arrow DP over pre-quantized ints) and two-stage toponym
        # disambiguation (broadcast gazetteer, doc-keyed shuffles)
        "q_map_match": lambda: REGISTRY["q_map_match"].spark(spark, sf_dir),
        "q_geo_disambig": lambda: REGISTRY["q_geo_disambig"].spark(spark, sf_dir),
        # driver-table headliners (same code paths the oracle checks)
        "q_within_join": lambda: REGISTRY["q_within_join"].spark(spark, sf_dir),
        "q_zonal_stats": lambda: REGISTRY["q_zonal_stats"].spark(spark, sf_dir),
        "q_knn3": lambda: REGISTRY["q_knn3"].spark(spark, sf_dir),
        "q_pricing_summary": lambda: REGISTRY["q_pricing_summary"].spark(spark, sf_dir),
        "q_tile_pyramid": lambda: REGISTRY["q_tile_pyramid"].spark(spark, sf_dir),
    }
    return qs


def cpu_ticks() -> tuple[int, int]:
    f = open("/proc/stat").readline().split()
    return sum(int(x) for x in f[1:]), int(f[8])


def run_suite(
    spark, pages_path: str, sf_dir: str, reps: int, points_path: str | None = None
) -> tuple[dict, dict, dict, dict]:
    times: dict[str, float] = {}
    rows: dict[str, int] = {}
    rep_times: dict[str, list[float]] = {}
    rep_steal: dict[str, list[float]] = {}
    only_prefix = os.environ.get("SPARK_GRAFT_ONLY", "")
    for name, build in headline_queries(spark, pages_path, sf_dir, points_path).items():
        if only_prefix and not any(
            name.startswith(p) for p in only_prefix.split(",")
        ):
            continue
        samples, steals = [], []
        n = 0
        # adaptive reps (VERDICT r4 #2): a steal storm can contaminate ALL
        # base reps (BENCH_r04 recorded a 6.55%-steal window whose minima
        # were 2-5x calm evidence); keep re-running — up to the extra cap —
        # until at least one rep executed in a calm window, then take the
        # min over CALM reps so the committed driver artifact matches calm
        # evidence instead of whichever weather the driver sampled.
        calm_pct = float(os.environ.get("SPARK_GRAFT_CALM_PCT", "2.0"))
        max_extra = int(os.environ.get("SPARK_GRAFT_MAX_EXTRA_REPS", "2"))
        # never let calm-hunting blow the driver's wall budget: stop
        # extending once this query has consumed its time allowance
        extra_budget_s = float(os.environ.get("SPARK_GRAFT_EXTRA_BUDGET_S", "45"))
        total = reps
        r = 0
        while r < total:
            # operators like point_tile_pyramid persist() intermediates;
            # without this, Spark's CacheManager plan-matches rep 2+ onto
            # rep 1's cache and the bench measures cached reads
            spark.catalog.clearCache()
            c0, s0 = cpu_ticks()
            t0 = time.perf_counter()
            n = build().count()  # count() forces the full plan, no collect skew
            samples.append(time.perf_counter() - t0)
            c1, s1 = cpu_ticks()
            steals.append(round(100.0 * (s1 - s0) / max(c1 - c0, 1), 2))
            r += 1
            if (
                r == total
                and total < reps + max_extra
                and sum(samples) < extra_budget_s
                and not any(s <= calm_pct for s in steals)
            ):
                total += 1
        # MIN of CALM reps (falling back to min of all if no rep was calm):
        # this sandbox host shows heavy hypervisor steal time (observed
        # 10-25x wall-clock swings on identical plans); the calm minimum is
        # the unimpeded execution time and is what scaling ratios need.
        # The per-rep arrays + per-rep steal go into the JSON so a stormy
        # round is self-evidently noise to any reader of BENCH_rN.json.
        calm = [t for t, s in zip(samples, steals) if s <= calm_pct]
        times[name] = round(min(calm) if calm else min(samples), 3)
        rows[name] = n
        rep_times[name] = [round(s, 3) for s in samples]
        rep_steal[name] = steals
    return times, rows, rep_times, rep_steal


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    n_pages = int(os.environ.get("SPARK_GRAFT_PAGES", "1000000"))
    # 3 reps: this host's steal storms can last >2 consecutive runs; with 2
    # reps a single stormy window contaminates the min (observed 16 s for a
    # query whose calm-window time is 1.5 s)
    reps = int(os.environ.get("SPARK_GRAFT_REPS", "3"))
    cache_dir = os.environ.get(
        "SPARK_GRAFT_CACHE", os.path.join(os.path.dirname(os.path.abspath(__file__)), "BENCH", "cache")
    )

    spark = build_session(cpus)
    pages_path = ensure_pages(spark, n_pages, cache_dir)
    points_path = ensure_points(spark, n_pages, cache_dir)
    t0, s0 = cpu_ticks()
    times, rows, rep_times, rep_steal = run_suite(spark, pages_path, sf_dir, reps, points_path)
    t1, s1 = cpu_ticks()

    total = round(sum(times.values()), 3)
    result = {
        "metric": "spatial_join_tiling_suite_seconds",
        "value": total,
        "unit": "sec",
        "queries": times,
        "sf": sf_dir.rstrip("/").split("/")[-1],
        "cpus": cpus,
        "n_pages": n_pages,
        "rows_out": rows,
        "pages_per_sec": round(n_pages / times["pages_geoparse_encode"], 1)
        if "pages_geoparse_encode" in times else None,
        "join_rows_per_sec": round(rows["pages_within_join"] / times["pages_within_join"], 1)
        if "pages_within_join" in times else None,
        # oversubscribed-hypervisor disclosure: fraction of CPU ticks stolen
        # by the host during the suite (identical plans swing 5-25x with it);
        # `queries` holds the per-query MIN of `rep_times` — read it next to
        # `rep_steal_pct` to see which reps were storm-contaminated
        "host_steal_pct": round(100.0 * (s1 - s0) / max(t1 - t0, 1), 2),
        "reps": reps,
        "rep_times": rep_times,
        "rep_steal_pct": rep_steal,
        "n_queries": len(times),
    }
    print(json.dumps(result))
    spark.stop()


if __name__ == "__main__":
    main()
