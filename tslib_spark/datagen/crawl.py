"""Deterministic synthetic Common-Crawl-style pages table.

Produces the engine's primary input per BASELINE.json ``input_hint``:
``(url: string, warc_ts: timestamp, html: binary, text: string, lang: string)``.

Design constraints (FIXTURES.md F1):

- **Zipfian head domains** — a log-uniform rank map gives frequency ~ 1/rank,
  so a handful of head urls dominate traffic and exercise skew salting.
- **Deliberate bucket gaps** — both uniform-random missing minutes and
  consecutive missing runs, mirroring the reference's test fixtures
  (/root/reference/src/tsUtils.py:119-128 and :133-167) which simulate
  missing web-crawl coverage.
- **Byte-identical text per url** — ``text`` is a pure function of the url,
  never of the row, so the per-row invariant holds trivially and any
  violation downstream is a real bug.
- **Parallelism-invariant determinism** — every random draw derives from
  ``xxhash64(id, seed)``, never ``F.rand`` (whose stream depends on the
  partition index and would change between local[8] and local[32]).

Everything is generated distributed (``spark.range`` + column expressions);
at 100 TB this generator shape is exactly how you'd synthesize load-test
data on a cluster — no driver-side loops, no collect.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

LANGS = ["en", "de", "fr", "es", "zh"]

_UNIT_DENOM = 1 << 40  # uniform-unit resolution carved from xxhash64


def _unit(*cols) -> F.Column:
    """Deterministic U[0,1) from column values — stable under repartitioning."""
    return F.pmod(F.xxhash64(*cols), F.lit(_UNIT_DENOM)) / F.lit(float(_UNIT_DENOM))


def generate_pages(
    spark: SparkSession,
    n_events: int = 200_000,
    n_urls: int = 2_000,
    n_minutes: int = 60 * 24 * 21,  # 3 weeks so 1m/1h/1d/1w tiers are all non-trivial
    start_ts: str = "2024-01-01 00:00:00",
    seed: int = 42,
    p_observe: float = 0.85,
    gap_period_minutes: int = 1440,
    gap_len_minutes: int = 360,
    p_gap_run: float = 0.10,
    parallelism: int | None = None,
) -> DataFrame:
    """Synthesize the crawl pages table.

    Each candidate event row picks a url by a Zipf-ish log-uniform rank map
    and a uniform minute bucket, then survives two independent censoring
    passes: uniform hiding (prob ``1 - p_observe``) and per-(url, day)
    consecutive gap runs of ``gap_len_minutes`` with prob ``p_gap_run`` —
    the crawl-scale analogue of tsUtils.randomlyHideValues /
    randomlyHideConsecutiveEntries.
    """
    base = spark.range(0, n_events, 1, parallelism or spark.sparkContext.defaultParallelism)

    # Zipf-ish url choice: rank = floor(n_urls ** u) - 1 → P(rank r) ~ 1/r.
    u_url = _unit(F.col("id"), F.lit(seed), F.lit("url"))
    url_rank = F.least(
        F.lit(n_urls - 1),
        (F.pow(F.lit(float(n_urls)), u_url) - F.lit(1.0)).cast("long"),
    )

    u_min = _unit(F.col("id"), F.lit(seed), F.lit("minute"))
    minute = (u_min * F.lit(n_minutes)).cast("long")

    df = base.select(
        url_rank.alias("url_rank"),
        minute.alias("minute"),
        F.col("id"),
    )

    # Uniform censoring: drop ~ (1 - p_observe) of candidate events.
    df = df.filter(_unit(F.col("id"), F.lit(seed), F.lit("obs")) < F.lit(p_observe))

    # Consecutive-gap censoring: for each (url, gap-period window) decide
    # (deterministically) whether a run is hidden, and where it starts.
    period = F.floor(F.col("minute") / F.lit(gap_period_minutes))
    run_hidden = _unit(F.col("url_rank"), period, F.lit(seed), F.lit("gaprun")) < F.lit(p_gap_run)
    run_start = (
        _unit(F.col("url_rank"), period, F.lit(seed), F.lit("gapstart"))
        * F.lit(max(gap_period_minutes - gap_len_minutes, 1))
    ).cast("long")
    in_run = (
        (F.col("minute") % gap_period_minutes >= run_start)
        & (F.col("minute") % gap_period_minutes < run_start + F.lit(gap_len_minutes))
    )
    df = df.filter(~(run_hidden & in_run))

    # Stable per-url attributes (text is a pure function of url → the
    # byte-identity invariant holds by construction).
    domain_id = F.pmod(F.xxhash64(F.col("url_rank"), F.lit(seed), F.lit("domain")), F.lit(max(n_urls // 20, 1)))
    url = F.concat(
        F.lit("https://site-"),
        domain_id.cast("string"),
        F.lit(".example.com/page/"),
        F.col("url_rank").cast("string"),
    )
    lang = F.element_at(
        F.array(*[F.lit(l) for l in LANGS]),
        (F.pmod(F.xxhash64(F.col("url_rank"), F.lit(seed), F.lit("lang")), F.lit(len(LANGS))) + 1).cast("int"),
    )
    text = F.concat(
        F.lit("Extracted text of page "),
        F.col("url_rank").cast("string"),
        F.lit(" on domain "),
        domain_id.cast("string"),
        F.lit(". "),
        F.repeat(
            F.concat(F.lit("token"), F.pmod(F.col("url_rank"), F.lit(97)).cast("string"), F.lit(" ")),
            (F.pmod(F.col("url_rank"), F.lit(40)) + 5).cast("int"),
        ),
    )
    html = F.encode(F.concat(F.lit("<html><body>"), text, F.lit("</body></html>")), "UTF-8")
    warc_ts = F.timestamp_seconds(
        F.unix_timestamp(F.lit(start_ts), "yyyy-MM-dd HH:mm:ss") + F.col("minute") * 60
    )

    return df.select(
        url.alias("url"),
        warc_ts.alias("warc_ts"),
        html.alias("html"),
        text.alias("text"),
        lang.alias("lang"),
    )
