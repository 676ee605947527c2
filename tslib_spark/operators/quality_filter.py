"""Composed rule-based corpus filter: Gopher-style keep/drop with reasons.

The step a training pipeline actually runs after computing signals: apply
a rule set over the text + repetition statistics and keep only documents
passing ALL rules, recording per-rule failures so the drop distribution
is auditable (every serious pipeline reports WHY documents were dropped,
not just how many).

Rules (thresholds per Rae et al. 2112.11446 App. A1.1, adapted to word
n-grams; all configurable):

- ``min_tokens`` / ``max_tokens`` — length window;
- ``max_top_ngram_share`` — most-common-bigram dominance;
- ``max_dup_ngram_frac``  — duplicated-bigram mass;
- ``max_punct_ratio``, ``max_digit_ratio`` — symbol noise.

Plan shape: the signal columns are one map-side projection + the two
repetition exchanges (see operators/repetition.py); the rule evaluation
itself is a single codegen projection producing a boolean per rule and a
``fail_reasons`` array — no additional shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from tslib_spark.functions.text import digit_ratio, punct_ratio, token_count
from tslib_spark.operators.repetition import _ngram_stats, _with_ratios, dup_token_frac

__all__ = ["quality_filter"]


def quality_filter(
    docs: DataFrame,
    id_col: str,
    text_col: str,
    min_tokens: int = 10,
    max_tokens: int = 100_000,
    max_top_ngram_share: float = 0.20,
    max_dup_ngram_frac: float = 0.40,
    max_punct_ratio: float = 0.20,
    max_digit_ratio: float = 0.20,
    n: int = 2,
) -> DataFrame:
    """Annotate every doc with ``keep`` and ``fail_reasons``.

    Returns ``docs``' id column + signal columns + ``keep: boolean`` +
    ``fail_reasons: array<string>`` (empty when keep). Callers filter
    ``keep`` for the surviving corpus and aggregate ``fail_reasons`` for
    the drop report.
    """
    # ONE per-doc projection computes every row-local signal (token count,
    # dup-token fraction, punct/digit ratios) so a single left join against
    # the n-gram aggregate remains — the previous shape scanned the corpus
    # twice and joined twice (r7, guide §2.4: share the exchange).
    per_doc = docs.select(
        F.col(id_col),
        token_count(F.col(text_col)).cast("long").alias("total_tokens"),
        dup_token_frac(F.col(text_col)).alias("dup_token_frac"),
        punct_ratio(F.col(text_col)).alias("punct_ratio"),
        digit_ratio(F.col(text_col)).alias("digit_ratio"),
    )
    joined = per_doc.join(_ngram_stats(docs, id_col, text_col, n), id_col, "left")
    df = _with_ratios(
        joined, id_col,
        ["total_tokens", "dup_token_frac", "punct_ratio", "digit_ratio"],
    ).select(
        id_col, "total_tokens", "dup_token_frac", "ngram_total",
        "top_ngram_share", "dup_ngram_frac", "punct_ratio", "digit_ratio",
    )

    rules = [
        ("too_short", F.col("total_tokens") < min_tokens),
        ("too_long", F.col("total_tokens") > max_tokens),
        ("top_ngram_dominant", F.col("top_ngram_share") > max_top_ngram_share),
        ("dup_ngram_heavy", F.col("dup_ngram_frac") > max_dup_ngram_frac),
        ("punct_noise", F.col("punct_ratio") > max_punct_ratio),
        ("digit_noise", F.col("digit_ratio") > max_digit_ratio),
    ]
    reasons = F.filter(
        F.array(*[F.when(cond, F.lit(name)).otherwise(F.lit(None)) for name, cond in rules]),
        lambda x: x.isNotNull(),
    )
    return df.withColumn("fail_reasons", reasons).withColumn(
        "keep", F.size("fail_reasons") == 0
    )
