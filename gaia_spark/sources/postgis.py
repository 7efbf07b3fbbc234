"""PostgisIO — pruned + pushed SQL reads over JDBC.

Reference semantics: ``[R] gaia/geo/geo_inputs.py :: PostgisIO`` builds
``SELECT <columns> FROM <table> WHERE <filters>`` from a declarative filter
list (``[R] gaia/filters.py :: filter_postgis``) and loads the result. Here
the same filter list becomes (a) a parameter-quoted WHERE clause pushed into
the JDBC subquery, and (b) partition predicates so Spark reads in parallel.

No database is reachable in this sandbox, so ``read()`` raises a clear
error if the driver is absent — but the SQL generation (the part gaia owns)
is pure and unit-tested offline. On a cluster, ``spark.read.jdbc`` +
``predicates=`` gives DSv2-equivalent pushdown: the database evaluates the
WHERE, Spark sees only the pruned columns.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

OPS = {"=", "!=", ">", "<", ">=", "<=", "in", "contains"}


def _quote_ident(name: str) -> str:
    if not name.replace("_", "").isalnum():
        raise ValueError(f"bad identifier: {name!r}")
    return f'"{name}"'


def _quote_val(v) -> str:
    if isinstance(v, bool):
        return "TRUE" if v else "FALSE"
    if isinstance(v, (int, float)):
        return repr(v)
    return "'" + str(v).replace("'", "''") + "'"


def filter_sql(filters: list[list] | None) -> str:
    """gaia filter list ``[[attr, op, value], ...]`` → SQL WHERE body
    (conjunction). ops: = != > < >= <= in contains (ILIKE substring)."""
    if not filters:
        return ""
    parts = []
    for attr, op, value in filters:
        col = _quote_ident(attr)
        if op not in OPS:
            raise ValueError(f"unsupported op {op!r}")
        if op == "in":
            vals = ", ".join(_quote_val(v) for v in value)
            parts.append(f"{col} IN ({vals})")
        elif op == "contains":
            pat = "%" + str(value).replace("'", "''") + "%"
            parts.append(f"{col} ILIKE '{pat}'")
        else:
            parts.append(f"{col} {op} {_quote_val(value)}")
    return " AND ".join(parts)


def build_query(
    table: str,
    columns: list[str] | None = None,
    filters: list[list] | None = None,
) -> str:
    """The pushed subquery: column pruning via explicit SELECT list, filter
    pushdown via WHERE — both evaluated BY THE DATABASE."""
    cols = ", ".join(_quote_ident(c) for c in columns) if columns else "*"
    where = filter_sql(filters)
    q = f"SELECT {cols} FROM {_quote_ident(table)}"
    return f"{q} WHERE {where}" if where else q


def partition_predicates(column: str, bounds: list) -> list[str]:
    """Range predicates over a numeric/key column → one JDBC partition per
    adjacent bound pair (parallel read; the db sees disjoint WHEREs)."""
    col = _quote_ident(column)
    out = []
    for lo, hi in zip(bounds[:-1], bounds[1:]):
        out.append(f"{col} >= {_quote_val(lo)} AND {col} < {_quote_val(hi)}")
    return out


def read(
    spark: SparkSession,
    url: str,
    table: str,
    columns: list[str] | None = None,
    filters: list[list] | None = None,
    predicates: list[str] | None = None,
    user: str | None = None,
    password: str | None = None,
) -> DataFrame:
    """spark.read.jdbc over the generated pruned/pushed subquery."""
    query = build_query(table, columns, filters)
    props = {"driver": "org.postgresql.Driver"}
    if user:
        props["user"] = user
    if password:
        props["password"] = password
    reader = spark.read
    if predicates:
        return reader.jdbc(url, f"({query}) AS t", predicates=predicates, properties=props)
    return reader.jdbc(url, f"({query}) AS t", properties=props)
