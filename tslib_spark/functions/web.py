"""URL column expressions for web-crawl corpora.

Crawl pipelines key nearly everything on normalized URLs (per-site
rollups, per-domain dedup, robots/blocklist joins), so URL surgery must be
JVM-side codegen, not Python: every function here is a pure expression
over one string column (``parse_url`` / ``regexp_*`` built-ins), no
shuffle, prunable to a single-column scan.

Normalization contract (deliberately minimal and deterministic):
- host: lowercase, leading ``www.`` stripped;
- registrable domain, two flavors:
  ``url_domain`` — last two dot-labels of the host (fast heuristic;
  single-label hosts like ``localhost`` fall back to the host itself,
  never the empty string — empty-string domains would silently group
  together in per-domain rollups);
  ``url_domain_psl`` — same, but consults the bundled Public-Suffix-List
  snapshot (psl_snapshot.py) so ``a.site.co.uk`` → ``site.co.uk``; the
  PSL set is one codegen IN predicate, still a pure expression;
- path: ``parse_url`` PATH part, "/" when absent/empty.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from tslib_spark.functions.psl_snapshot import TWO_LABEL_SUFFIXES

__all__ = [
    "url_host", "url_domain", "url_domain_psl", "url_path",
    "url_query_param", "normalize_url",
]


def url_host(url: Column) -> Column:
    """Lowercased host with any leading ``www.`` stripped; NULL on unparsable.

    ``try_parse_url``, not ``parse_url``: under ANSI mode (pinned on in
    session.py) the plain variant THROWS on malformed URLs — and crawl
    corpora contain malformed URLs as a matter of course; one garbage row
    must not kill a 100 TB job. NULL flows through every downstream
    expression instead."""
    host = F.lower(F.try_parse_url(url, F.lit("HOST")))
    return F.regexp_replace(host, r"^www\.", "")


def url_domain(url: Column) -> Column:
    """Registrable-domain heuristic: last two labels of the host
    (``a.b.site.com`` → ``site.com``); the host itself when it has no dot
    (``localhost``) — consistent with url_host's NULL-on-unparsable, no
    empty-string sink. See module docstring for the PSL caveat."""
    host = url_host(url)
    two = F.regexp_extract(host, r"([^.]+\.[^.]+)$", 1)
    return F.when(two == "", host).otherwise(two)


def url_domain_psl(url: Column) -> Column:
    """Registrable domain against the bundled PSL snapshot: when the last
    two labels form a known registry suffix (``co.uk``), the registrable
    domain is the last THREE labels; otherwise the two-label heuristic.
    A host that IS a bare suffix (``co.uk`` itself) has no registrable
    domain under the PSL; it falls back to the host, mirroring
    url_domain's single-label fallback."""
    host = url_host(url)
    two = F.regexp_extract(host, r"([^.]+\.[^.]+)$", 1)
    three = F.regexp_extract(host, r"([^.]+\.[^.]+\.[^.]+)$", 1)
    return (
        F.when(two == "", host)
        .when(two.isin(list(TWO_LABEL_SUFFIXES)) & (three != ""), three)
        .otherwise(two)
    )


def url_path(url: Column) -> Column:
    """PATH part; '/' for URLs with no path (NULL-safe, see url_host)."""
    p = F.try_parse_url(url, F.lit("PATH"))
    return F.when(p.isNull() | (p == ""), F.lit("/")).otherwise(p)


def url_query_param(url: Column, key: str) -> Column:
    """Value of one query parameter (NULL when absent/unparsable)."""
    return F.try_parse_url(url, F.lit("QUERY"), F.lit(key))


def normalize_url(url: Column) -> Column:
    """Canonical join key: ``host/path`` with www stripped, lowercase host,
    query and fragment dropped — the standard crawl-frontier dedup key."""
    return F.concat(url_host(url), url_path(url))
