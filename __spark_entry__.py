"""Driver contract for the spark-graft builder (PySpark target).

``entry`` runs the flagship spatial pipeline (pages-shaped table →
geoparse → cell encode → cell-bucketed within-join vs zones → zonal
counts); ``queries``/``oracle_sql`` expose the operator registry in
:mod:`gaia_spark.queries`, one entry per implemented operator from
SURVEY.md §2, each paired with its DuckDB oracle.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def _pages_from_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A pages-shaped table (url, warc_ts, html, text, lang) derived
    deterministically from the driver's documents table: 80% of rows get an
    embedded 'geo: lat,lon' coordinate (key-derived), 20% stay coordinate-
    free (geoparse must yield NULL for them). Shared with q_geoparse."""
    from gaia_spark.queries import pages_from_documents

    return pages_from_documents(spark, sf_dir)


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: pages → geoparse → cell encode → within-join → zone counts."""
    import pyspark.sql.functions as F

    from gaia_spark.functions.geoparse import geoparse
    from gaia_spark.operators.spatial_join import ZoneIndex, spatial_join, with_cell
    from gaia_spark.queries import oracle_zones_pdf

    pages = _pages_from_documents(spark, "/root/testdata/sf0.001")
    pts = with_cell(geoparse(pages), 8)
    idx = ZoneIndex.build(oracle_zones_pdf())
    joined = spatial_join(pts, idx, predicate="intersects", point_key="url")
    return (
        joined.groupBy("zone_id")
        .agg(F.count("*").alias("n_pages"))
        .orderBy("zone_id")
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from gaia_spark.queries import REGISTRY

    return {name: q.spark for name, q in REGISTRY.items()}


def oracle_sql() -> dict[str, str]:
    from gaia_spark.queries import REGISTRY

    return {name: q.oracle for name, q in REGISTRY.items() if q.oracle is not None}
