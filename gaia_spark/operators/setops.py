"""Set operations over feature sets.

Reference semantics: ``[R] gaia/geo/processes_vector.py :: UnionProcess`` —
append two vector datasets with identical columns, NO dedup (UNION ALL).
intersect/except are attribute-level complements Spark gives natively.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def union_features(a: DataFrame, b: DataFrame) -> DataFrame:
    """UnionProcess: schema-aligned append, duplicates preserved."""
    return a.unionByName(b)


def intersect_features(a: DataFrame, b: DataFrame) -> DataFrame:
    return a.intersect(b)


def except_features(a: DataFrame, b: DataFrame) -> DataFrame:
    return a.exceptAll(b)
