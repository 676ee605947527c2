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
  ``url_domain_psl`` — the COMPLETE Public-Suffix-List algorithm
  (psl_snapshot.py: exact/wildcard/exception rules of any label count,
  ICANN + PRIVATE sections) so ``a.site.co.uk`` → ``site.co.uk`` and
  ``x.user.github.io`` → ``user.github.io``; the rules compile to chained
  CASE + literal IN predicates — still a pure codegen expression;
- path: ``parse_url`` PATH part, "/" when absent/empty.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from tslib_spark.functions.psl_snapshot import PslRules, bundled_rules

__all__ = [
    "url_host", "url_domain", "url_domain_psl", "psl_registrable_domain",
    "url_path", "url_query_param", "normalize_url",
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


def psl_registrable_domain(host: Column, rules: PslRules | None = None) -> Column:
    """The COMPLETE Public-Suffix-List algorithm as one codegen expression:
    exception rules win outright (``!www.ck`` → suffix is the rule minus
    its leading label), otherwise the longest matching rule — exact rules
    of any label count and ``*.base`` wildcards (the ``*`` must consume a
    real label) — with the implicit ``*`` default rule when nothing
    matches. Registrable domain = public suffix + one label.

    Codegen shape: per-length suffix extraction (one ``regexp_extract``
    per label count up to the rule-set maximum), a chained CASE over
    literal IN hash sets resolving the suffix LENGTH, then one
    ``element_at`` over the extraction array — no Python per row, no
    join, no shuffle. A host that IS a bare public suffix falls back to
    itself (never an empty-string sink)."""
    if rules is None:
        rules = bundled_rules()
    maxk = rules.max_suffix_labels + 1
    lastk = {
        k: F.regexp_extract(host, r"((?:[^.]+\.){%d}[^.]+)$" % (k - 1), 1)
        for k in range(1, maxk + 1)
    }
    w = None

    def add(cond, length: int) -> None:
        nonlocal w
        w = F.when(cond, F.lit(length)) if w is None else w.when(cond, F.lit(length))

    for k in sorted(rules.exception, reverse=True):  # exceptions beat everything
        add(lastk[k].isin(*sorted(rules.exception[k])), k - 1)
    for L in sorted(set(rules.exact) | {k + 1 for k in rules.wildcard}, reverse=True):
        cond = None
        if L in rules.exact:
            cond = lastk[L].isin(*sorted(rules.exact[L]))
        if (L - 1) in rules.wildcard:
            wc = (lastk[L] != "") & lastk[L - 1].isin(*sorted(rules.wildcard[L - 1]))
            cond = wc if cond is None else (cond | wc)
        if L > 1:  # the default rule already yields 1
            add(cond, L)
    slen = F.lit(1) if w is None else w.otherwise(F.lit(1))
    dom = F.element_at(F.array(*[lastk[k] for k in range(1, maxk + 1)]), slen + F.lit(1))
    return F.when(dom.isNull() | (dom == ""), host).otherwise(dom)


def url_domain_psl(url: Column, include_private: bool = True) -> Column:
    """Registrable domain of a URL against the bundled PSL snapshot (full
    algorithm — wildcards, exceptions, multi-label and PRIVATE-section
    rules; see psl_registrable_domain). ``include_private=False`` uses
    only ICANN-section rules (``x.github.io`` then groups under
    ``github.io``'s registrant instead of being its own site)."""
    return psl_registrable_domain(url_host(url), bundled_rules(include_private))


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
