"""Toponym resolution: link place-name mentions in web text to gazetteer
senses — the geoparsing step AFTER extraction, where an ambiguous name
("Springfield") must be pinned to ONE of several candidate locations.

Role: the web×geo bridge of this graft — the reference's vector-ingestion
layer (``[R] SURVEY.md §2.A VectorFileIO`` + ``§2.E geoparse``) feeds
points born from text; this module adds the entity-linking stage a
Common-Crawl-scale pipeline needs between "found a place name" and "have
a point geometry". Algorithm = the classic two-stage disambiguator:

  1. population prior — every mention provisionally takes its word's
     highest-population sense (deterministic tie-break on candidate id);
  2. context re-rank — the provisional picks give each document an
     anchor (exact-integer mean center); every mention is then re-scored
     against ALL its senses by great-circle distance to that anchor and
     takes the nearest (mm-quantized distance, candidate-id tie-break).

Scale shape (100 TB): the gazetteer is vocabulary-sized — BOTH joins
broadcast it. The corpus-sized mention table shuffles twice, both times
on doc_id (anchor aggregation, anchor re-join), and the stage-2 candidate
fan-out is a bounded ×n_senses explode of the mention table, never a
cross join. No Python anywhere; every score is an exact bigint so the
argmin/argmax picks are engine-independent.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window

from gaia_spark.functions import portable as P

N_SENSES = 3

# candidate attributes are pure functions of the 60-bit candidate id, so
# the gazetteer is replayable from the word list alone in either engine
CAND_LAT = "((cand % 17000) / cast(100 as double) - 85.0)"
CAND_POP = "((cand % 9973) + 1)"


def cand_id_sql(word: str, i: str, dialect: str) -> str:
    return P.md5_int60(f"concat({word}, '#', cast({i} as string))", dialect)


def cand_lon_sql(dialect: str) -> str:
    d131 = P.bigint_div("cand", "131", dialect)
    return f"(({d131} % 36000) / cast(100 as double) - 180.0)"


def gazetteer(words: DataFrame, dialect: str = P.SPARK) -> DataFrame:
    """Expand a distinct-word DataFrame into the n-sense candidate table
    (word, sense, cand, lat, lon, pop). Vocabulary-sized by construction."""
    g = words.select(
        "word", F.explode(F.expr(f"sequence(0, {N_SENSES - 1})")).alias("sense")
    ).withColumn("cand", F.expr(cand_id_sql("word", "sense", dialect)))
    return (
        g.withColumn("lat", F.expr(CAND_LAT))
        .withColumn("lon", F.expr(cand_lon_sql(dialect)))
        .withColumn("pop", F.expr(CAND_POP))
    )


def disambiguate_toponyms(mentions: DataFrame) -> DataFrame:
    """Resolve (doc_id, word) mentions to gazetteer senses.

    Returns one row per mention: doc_id, word, cand_id, lat_e4, lon_e4,
    d_anchor_mm — the chosen sense and its mm distance to the document
    anchor. Deterministic end to end (exact-integer scores, fixed
    tie-breaks), hence hash-checkable cross-engine.
    """
    words = mentions.select("word").distinct()
    gaz = gazetteer(words)

    # stage 1: population prior, one pick per WORD (doc-independent) —
    # materialized as a RANK on the (vocabulary-sized) gazetteer itself so
    # the prior rides along the single broadcast fan-out below
    w1 = Window.partitionBy("word").orderBy(F.desc("pop"), F.desc("cand"))
    gaz_ranked = gaz.withColumn("_rk1", F.row_number().over(w1))

    # ONE doc-keyed exchange for the whole operator, placed BELOW the fan
    # so it ships plain 1x mention rows (not the 3x sense fan-out with
    # gazetteer columns): mentions repartition by doc_id, fan out over the
    # broadcast gazetteer (a narrow join — partitioning preserved), and
    # the document anchor — the exact-integer mean center of the PRIOR
    # picks — is a whole-partition window sum over doc_id of the _rk1 = 1
    # rows (exactly one per mention), replacing the former groupBy(doc_id)
    # aggregate + doc_id re-join of two large sides. The stage-2 rank
    # window partitions by (doc_id, word), which hash(doc_id) already
    # clusters, so both windows reuse the one exchange with only sorts.
    n_part = int(mentions.sparkSession.conf.get("spark.sql.shuffle.partitions"))
    fan = mentions.repartition(n_part, "doc_id").join(F.broadcast(gaz_ranked), "word")
    wd = Window.partitionBy("doc_id")
    fan = (
        fan.withColumn(
            "_slat",
            F.sum(
                F.when(F.col("_rk1") == 1, F.expr(P.floor_scaled_sql("lat + 90.0", 4)))
            ).over(wd),
        )
        .withColumn(
            "_slon",
            F.sum(
                F.when(F.col("_rk1") == 1, F.expr(P.floor_scaled_sql("lon + 180.0", 4)))
            ).over(wd),
        )
        .withColumn("_cnt", F.count(F.when(F.col("_rk1") == 1, F.lit(1))).over(wd))
        .withColumn("_alat_e4", F.expr(P.bigint_div("_slat", "_cnt", P.SPARK)))
        .withColumn("_alon_e4", F.expr(P.bigint_div("_slon", "_cnt", P.SPARK)))
    )

    # stage 2: re-rank every sense by distance to the anchor
    alat = "(cast(_alat_e4 as double) / cast(10000 as double) - 90.0)"
    alon = "(cast(_alon_e4 as double) / cast(10000 as double) - 180.0)"
    cand = fan.withColumn(
        "d_anchor_mm",
        F.expr(P.floor_scaled_sql(P.haversine_m_sql("lat", "lon", alat, alon), 3)),
    )
    w2 = Window.partitionBy("doc_id", "word").orderBy("d_anchor_mm", "cand")
    return (
        cand.withColumn("_rk", F.row_number().over(w2))
        .filter(F.col("_rk") == 1)
        .select(
            "doc_id",
            "word",
            F.col("cand").alias("cand_id"),
            (F.expr(P.floor_scaled_sql("lat + 90.0", 4)) - 900000).alias("lat_e4"),
            (F.expr(P.floor_scaled_sql("lon + 180.0", 4)) - 1800000).alias("lon_e4"),
            "d_anchor_mm",
        )
    )


def place_comentions(resolved: DataFrame, min_pairs: int = 2) -> DataFrame:
    """Co-mention network over resolved places: one edge per unordered
    sense pair that co-occurs in a document, with the exact doc counts,
    a floor-scaled PMI-style lift, and the great-circle distance between
    the two senses (the distance-decay covariate of spatial-interaction
    text models).

    Scale shape: the pair generator is a doc_id self-equi-join of the
    per-doc DISTINCT place list — fan-out bounded by places-per-doc², the
    textbook co-occurrence shape (never corpus²); the three count aggs
    are combinable groupBys.
    """
    r = resolved.select("doc_id", "word", "cand_id", "lat_e4", "lon_e4").distinct()
    n_docs = r.select("doc_id").distinct().count()
    per = r.groupBy("word", "cand_id").agg(F.count("*").alias("n_docs_w"))
    a = r.select(
        "doc_id",
        F.col("word").alias("word_a"),
        F.col("cand_id").alias("cand_a"),
        F.col("lat_e4").alias("_la"),
        F.col("lon_e4").alias("_loa"),
    )
    b = r.select(
        "doc_id",
        F.col("word").alias("word_b"),
        F.col("cand_id").alias("cand_b"),
        F.col("lat_e4").alias("_lb"),
        F.col("lon_e4").alias("_lob"),
    )
    pairs = a.join(b, "doc_id").filter(F.col("word_a") < F.col("word_b"))
    g = pairs.groupBy("word_a", "cand_a", "word_b", "cand_b").agg(
        F.count("*").alias("n_ab"),
        F.min("_la").alias("_la"),
        F.min("_loa").alias("_loa"),
        F.min("_lb").alias("_lb"),
        F.min("_lob").alias("_lob"),
    )
    g = (
        g.join(
            F.broadcast(
                per.select(
                    F.col("word").alias("word_a"),
                    F.col("cand_id").alias("cand_a"),
                    F.col("n_docs_w").alias("n_a"),
                )
            ),
            ["word_a", "cand_a"],
        )
        .join(
            F.broadcast(
                per.select(
                    F.col("word").alias("word_b"),
                    F.col("cand_id").alias("cand_b"),
                    F.col("n_docs_w").alias("n_b"),
                )
            ),
            ["word_b", "cand_b"],
        )
        .filter(F.col("n_ab") >= min_pairs)
    )
    lift = (
        f"cast(n_ab as double) * cast({n_docs} as double) "
        "/ (cast(n_a as double) * cast(n_b as double))"
    )
    la = "(cast(_la as double) / cast(10000 as double))"
    loa = "(cast(_loa as double) / cast(10000 as double))"
    lb = "(cast(_lb as double) / cast(10000 as double))"
    lob = "(cast(_lob as double) / cast(10000 as double))"
    return g.select(
        "word_a",
        "word_b",
        "cand_a",
        "cand_b",
        "n_ab",
        F.expr(P.floor_scaled_sql(lift, 6)).alias("lift_e6"),
        F.expr(P.floor_scaled_sql(P.haversine_m_sql(la, loa, lb, lob), 0)).alias(
            "dist_m"
        ),
    )


def geo_focus(resolved: DataFrame) -> DataFrame:
    """Per-document geographic focus: exact-integer mean center of the
    resolved places plus a dispersion radius (root mean squared deviation
    in e4 degree space, computed from exact bigint moments so the
    local/regional/global classification never flips cross-engine)."""
    # moments over the SHIFTED (non-negative) coordinates so the exact
    # integer-division macro's non-negativity contract holds; the shift
    # cancels out of the variance and divides out of the mean exactly
    x = F.col("lat_e4") + 900000
    y = F.col("lon_e4") + 1800000
    g = resolved.groupBy("doc_id").agg(
        F.count("*").alias("n_places"),
        F.sum(x).alias("_sx"),
        F.sum(x * x).alias("_sx2"),
        F.sum(y).alias("_sy"),
        F.sum(y * y).alias("_sy2"),
    )
    # n²·msd = n·Σx² − (Σx)² + n·Σy² − (Σy)²  (exact bigint numerator)
    num = "(n_places * _sx2 - _sx * _sx + n_places * _sy2 - _sy * _sy)"
    radius = (
        f"(sqrt(cast({num} as double)) / cast(n_places as double) "
        "/ cast(10000 as double))"
    )
    out = g.withColumn("radius_deg_e6", F.expr(P.floor_scaled_sql(radius, 6)))
    return out.select(
        "doc_id",
        "n_places",
        (F.expr(P.bigint_div("_sx", "n_places", P.SPARK)) - 900000).alias("clat_e4"),
        (F.expr(P.bigint_div("_sy", "n_places", P.SPARK)) - 1800000).alias("clon_e4"),
        "radius_deg_e6",
        F.expr(
            "CASE WHEN radius_deg_e6 < 5000000 THEN 'local' "
            "WHEN radius_deg_e6 < 30000000 THEN 'regional' "
            "ELSE 'global' END"
        ).alias("focus"),
    )
