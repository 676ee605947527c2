"""URL column expressions for web-crawl corpora.

Crawl pipelines key nearly everything on normalized URLs (per-site
rollups, per-domain dedup, robots/blocklist joins), so URL surgery must be
JVM-side codegen, not Python: every function here is a pure expression
over one string column (``parse_url`` / ``regexp_*`` built-ins), no
shuffle, prunable to a single-column scan.

Normalization contract (deliberately minimal and deterministic):
- host: lowercase, leading ``www.`` stripped;
- registrable domain: last two dot-labels of the host — a heuristic, NOT
  the Public Suffix List (no data files in-engine; swap in a PSL UDF if
  the pipeline needs co.uk-style suffixes, documented trade-off);
- path: ``parse_url`` PATH part, "/" when absent/empty.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

__all__ = ["url_host", "url_domain", "url_path", "url_query_param", "normalize_url"]


def url_host(url: Column) -> Column:
    """Lowercased host with any leading ``www.`` stripped; NULL on unparsable."""
    host = F.lower(F.parse_url(url, F.lit("HOST")))
    return F.regexp_replace(host, r"^www\.", "")


def url_domain(url: Column) -> Column:
    """Registrable-domain heuristic: last two labels of the host
    (``a.b.site.com`` → ``site.com``). See module docstring for the PSL
    caveat."""
    return F.regexp_extract(url_host(url), r"([^.]+\.[^.]+)$", 1)


def url_path(url: Column) -> Column:
    """PATH part; '/' for URLs with no path."""
    p = F.parse_url(url, F.lit("PATH"))
    return F.when(p.isNull() | (p == ""), F.lit("/")).otherwise(p)


def url_query_param(url: Column, key: str) -> Column:
    """Value of one query parameter (NULL when absent)."""
    return F.parse_url(url, F.lit("QUERY"), F.lit(key))


def normalize_url(url: Column) -> Column:
    """Canonical join key: ``host/path`` with www stripped, lowercase host,
    query and fragment dropped — the standard crawl-frontier dedup key."""
    return F.concat(url_host(url), url_path(url))
