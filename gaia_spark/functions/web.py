"""URL functions for web-page tables: host / path / TLD extraction and
host-level aggregation keys.

Role: the web-pipeline companions to geoparse — per-host dedup scopes,
host-level quality priors, crawl-politeness partitioning all key on the
registrable host. Built on ONE regex evaluated verbatim in both engines
(Spark's ``parse_url`` has no DuckDB twin; ``regexp_extract`` with an
identical pattern does, and both return '' on no-match, normalized to NULL
via nullif).
"""

from __future__ import annotations

_HOST_RE = "^[a-zA-Z][a-zA-Z0-9+.-]*://([^/?#]+)"
_PATH_RE = "^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]+(/[^?#]*)"
# [.] not \. — Spark SQL string literals eat backslashes, DuckDB's don't;
# a class-escaped dot is byte-identical in both
_TLD_RE = "[.]([a-zA-Z0-9-]+)$"


def host_sql(url: str) -> str:
    """Authority component (host[:port]) — '' → NULL. Same string in both
    dialects (Spark regexp_extract and DuckDB regexp_extract share RE2-safe
    syntax here)."""
    return f"nullif(regexp_extract({url}, '{_HOST_RE}', 1), '')"


def path_sql(url: str) -> str:
    return f"nullif(regexp_extract({url}, '{_PATH_RE}', 1), '')"


def tld_sql(url: str) -> str:
    """Last dot-label of the host (naive TLD — no public-suffix list
    offline; good enough for grouping keys, documented limit)."""
    return f"nullif(regexp_extract({host_sql(url)}, '{_TLD_RE}', 1), '')"
