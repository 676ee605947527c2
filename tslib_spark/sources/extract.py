"""Text extraction with the byte-identity invariant.

BASELINE.json input_hint: "per-row invariant vs the reference:
byte-identical extracted text per url". The extraction itself is a
deterministic normalization of the ``text`` column (the html→text step is
upstream of this table per the input schema); what the engine must
guarantee is that the same url always yields the same bytes, across
partitions, retries, and re-runs. That property is enforced two ways:

1. the transform is a pure column expression of (url, text) — no RNG, no
   timestamps, no partition-dependent state;
2. ``verify_text_identity`` audits a table: any url with >1 distinct
   extracted-text hash is a violation (returned, not raised, so the caller
   can route to quarantine at scale instead of failing the job).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def extract_text(pages: DataFrame) -> DataFrame:
    """pages → (url, warc_ts, lang, extracted_text, text_sha) rows.

    Normalization: strip, collapse whitespace runs to single spaces —
    byte-stable and order-free.
    """
    norm = F.regexp_replace(F.trim(F.col("text")), r"\s+", " ")
    return pages.select(
        "url",
        "warc_ts",
        "lang",
        norm.alias("extracted_text"),
        F.sha2(norm, 256).alias("text_sha"),
    )


def verify_text_identity(extracted: DataFrame) -> DataFrame:
    """Urls violating the byte-identity invariant (empty when healthy)."""
    return (
        extracted.groupBy("url")
        .agg(F.countDistinct("text_sha").alias("n_variants"))
        .filter(F.col("n_variants") > 1)
    )
