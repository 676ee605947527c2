"""Benchmark decontamination: flag training docs overlapping an eval set.

Standard pretraining hygiene (GPT-3 App. C, Gopher App. A1.2): any
training document sharing an n-gram with a held-out evaluation benchmark
is flagged (and usually dropped) so downstream eval numbers aren't
memorization. The eval side is always tiny relative to the corpus, which
fixes the join strategy:

- eval set → distinct hashed n-grams → **broadcast** (a benchmark is
  thousands of docs; its distinct n-gram hash set is a few MB);
- corpus docs stream map-side through the same windowing
  (``substring.doc_windows``) and probe the broadcast set — a broadcast
  semi-join, NO shuffle of corpus data at all;
- per-doc hit aggregation is the only exchange, keyed on doc id, and
  only flagged docs reach it.

At 100 TB this is the one shape that works: the corpus never moves, the
eval fingerprint ships to every executor once.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from tslib_spark.operators.substring import doc_windows

__all__ = ["eval_ngram_set", "contamination_hits", "decontaminate"]


def eval_ngram_set(
    eval_docs: DataFrame, text_col: str, n: int = 13
) -> DataFrame:
    """Distinct 64-bit hashes of every n-gram in the eval set — the
    broadcast fingerprint. One column ``h``."""
    tmp = eval_docs.select(F.monotonically_increasing_id().alias("_eid"), F.col(text_col))
    return doc_windows(tmp, "_eid", text_col, n).select("h").distinct()


def contamination_hits(
    docs: DataFrame,
    id_col: str,
    text_col: str,
    eval_grams: DataFrame,
    n: int = 13,
) -> DataFrame:
    """(id, n_hits, first_pos, last_pos) for docs sharing ≥1 eval n-gram.

    ``eval_grams``: output of :func:`eval_ngram_set` (same ``n``!).
    """
    w = doc_windows(docs, id_col, text_col, n)
    hits = w.join(F.broadcast(eval_grams), "h", "left_semi")
    return hits.groupBy(id_col).agg(
        F.count(F.lit(1)).cast("long").alias("n_hits"),
        F.min("pos").cast("long").alias("first_pos"),
        F.max("pos").cast("long").alias("last_pos"),
    )


def decontaminate(
    docs: DataFrame,
    id_col: str,
    text_col: str,
    eval_docs: DataFrame,
    eval_text_col: str,
    n: int = 13,
) -> DataFrame:
    """``docs`` minus every document overlapping the eval set by ≥1
    n-gram — the corpus-shrinking step. Anti-join on the flagged ids."""
    grams = eval_ngram_set(eval_docs, eval_text_col, n)
    flagged = contamination_hits(docs, id_col, text_col, grams, n).select(id_col)
    return docs.join(flagged, id_col, "left_anti")
