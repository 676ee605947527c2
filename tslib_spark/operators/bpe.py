"""Byte-pair-encoding subword tokenizer: distributed train + Arrow encode.

The real thing, not the regex stand-in (`functions.text.bpe_ish_token_count`
stays as the cheap estimator): ``bpe_train`` learns an ordered merge list
with the classic Sennrich et al. 2015 recipe, ``bpe_encode`` tokenizes a
corpus with it.

Training is driver-orchestrated but corpus-scale-safe: the corpus is
reduced ONCE to the distinct-word frequency table (one explode + groupBy —
vocabulary-sized from then on, the standard trick; ``max_words`` takes the
deterministic top-N head when even the vocabulary is huge). Each merge
iteration is two vocabulary-sized Spark jobs: (1) weighted adjacent-pair
counts via a pure-Catalyst transform+explode+groupBy with a deterministic
argmax (count desc, pair asc), and (2) the merge applied to every word's
symbol array with a pure-Catalyst ``F.aggregate`` left fold (leftmost-
greedy non-overlapping, exactly the reference scan). ``localCheckpoint``
truncates lineage each iteration so the plan doesn't deepen with the merge
count. Only the argmax row ever reaches the driver — an iterative
algorithm in the checkpoint/lineage family, not a collect anti-pattern.

Encoding broadcasts the merge list (≤ num_merges small strings) into an
Arrow ``mapInPandas`` kernel that applies merges in rank order with the
same leftmost-greedy scan, memoizing per distinct word within each batch —
the multimodal-decoder discipline: batch-level Python doing the actual
work, never per-row dispatch.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["bpe_train", "bpe_encode", "END_OF_WORD"]

END_OF_WORD = "</w>"


def _word_freq(df: DataFrame, text_col: str, lowercase: bool, max_words: int | None) -> DataFrame:
    text = F.lower(F.col(text_col)) if lowercase else F.col(text_col)
    toks = F.filter(F.split(F.trim(text), "\\s+"), lambda t: F.length(t) > 0)
    words = (
        df.select(F.explode(toks).alias("word"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("freq"))
    )
    if max_words is not None:
        words = words.orderBy(F.col("freq").desc(), F.col("word")).limit(int(max_words))
    return words


def _merge_fold(sym_col, a: str, b: str):
    """Leftmost-greedy non-overlapping replacement of adjacent (a, b) with
    a+b, as a pure-Catalyst left fold. try_element_at(acc, -1) is NULL on
    the empty accumulator (never an ANSI index error), and a just-merged
    token can't re-match ``a`` because a+b != a."""
    merged = F.lit(a + b)

    def step(acc, s):
        tail_is_a = F.try_element_at(acc, F.lit(-1)) == F.lit(a)
        take = tail_is_a.isNotNull() & tail_is_a & (s == F.lit(b))
        replaced = F.concat(F.slice(acc, 1, F.size(acc) - 1), F.array(merged))
        return F.when(take, replaced).otherwise(F.concat(acc, F.array(s)))

    return F.aggregate(sym_col, F.array().cast("array<string>"), step)


def bpe_train(
    df: DataFrame,
    text_col: str = "text",
    num_merges: int = 100,
    min_pair_count: int = 2,
    lowercase: bool = False,
    max_words: int | None = None,
) -> list[tuple[str, str]]:
    """Learn an ordered BPE merge list from the corpus.

    Words are whitespace tokens; initial symbols are the word's characters
    plus a trailing END_OF_WORD marker. Each iteration merges the most
    frequent adjacent symbol pair (ties broken by pair lexicographic order,
    so training is deterministic and partition-invariant) and stops early
    when no pair reaches ``min_pair_count``.
    """
    words = _word_freq(df, text_col, lowercase, max_words)
    words = words.select(
        "freq",
        F.concat(
            F.filter(F.split(F.col("word"), ""), lambda c: F.length(c) > 0),
            F.array(F.lit(END_OF_WORD)),
        ).alias("sym"),
    )
    if max_words is not None:
        # capped vocabulary ⇒ the symbol table is driver-sized BY
        # CONSTRUCTION (≤ max_words rows): collect it once and run the
        # classic in-memory Sennrich merge loop instead of 2 Spark jobs +
        # a collect PER MERGE (r6 verdict #3 — 30k-merge production vocabs
        # mean ~10⁵ driver-orchestrated jobs on the distributed path).
        # The symbol arrays are collected FROM the same Spark expression
        # the distributed fold starts from, and the local loop replicates
        # its pair-count / tiebreak / leftmost-greedy semantics exactly
        # (pytest-pinned parity), so both paths learn the identical list.
        sym_freqs = [(list(r["sym"]), int(r["freq"])) for r in words.collect()]
        return _train_local(sym_freqs, int(num_merges), int(min_pair_count))
    words = words.localCheckpoint()

    merges: list[tuple[str, str]] = []
    for _ in range(int(num_merges)):
        n = F.size("sym")
        pairs = F.when(
            n >= 2,
            F.transform(
                F.sequence(F.lit(1), n - 1),
                lambda i: F.struct(
                    F.element_at(F.col("sym"), i).alias("a"),
                    F.element_at(F.col("sym"), i + 1).alias("b"),
                ),
            ),
        ).otherwise(F.array().cast("array<struct<a:string,b:string>>"))
        best = (
            words.select(F.explode(pairs).alias("p"), "freq")
            .groupBy("p.a", "p.b")
            .agg(F.sum("freq").alias("cnt"))
            .orderBy(F.col("cnt").desc(), F.col("a"), F.col("b"))
            .limit(1)
            .collect()
        )
        if not best or best[0]["cnt"] < int(min_pair_count):
            break
        a, b = best[0]["a"], best[0]["b"]
        merges.append((a, b))
        prev = words
        words = words.select("freq", _merge_fold(F.col("sym"), a, b).alias("sym")).localCheckpoint()
        prev.unpersist()
    words.unpersist()
    return merges


def _train_local(
    sym_freqs: list[tuple[list[str], int]], num_merges: int, min_pair_count: int
) -> list[tuple[str, str]]:
    """In-memory Sennrich merge loop over a driver-sized symbol table —
    semantics identical to the distributed fold path: adjacent pairs
    weighted by word frequency (every occurrence counts), argmax with
    (count desc, pair lexicographic asc) tiebreak, leftmost-greedy
    non-overlapping merge application."""
    merges: list[tuple[str, str]] = []
    for _ in range(num_merges):
        pc: dict[tuple[str, str], int] = {}
        for syms, freq in sym_freqs:
            for i in range(len(syms) - 1):
                p = (syms[i], syms[i + 1])
                pc[p] = pc.get(p, 0) + freq
        if not pc:
            break
        (a, b), cnt = min(pc.items(), key=lambda kv: (-kv[1], kv[0]))
        if cnt < min_pair_count:
            break
        merges.append((a, b))
        ranked = [(a, b, a + b)]
        sym_freqs = [(_apply_merges(syms, ranked), freq) for syms, freq in sym_freqs]
    return merges


def _apply_merges(syms: list[str], merges: list[tuple[str, str, str]]) -> list[str]:
    """Rank-ordered application, each merge with the same leftmost-greedy
    scan as the training fold — encode(word) is bit-equal to what the
    trainer's final symbol table holds for that word."""
    for a, b, ab in merges:
        if len(syms) < 2:
            break
        out: list[str] = []
        i, n = 0, len(syms)
        while i < n:
            if i < n - 1 and syms[i] == a and syms[i + 1] == b:
                out.append(ab)
                i += 2
            else:
                out.append(syms[i])
                i += 1
        syms = out
    return syms


def bpe_encode(
    df: DataFrame,
    merges: list[tuple[str, str]],
    text_col: str = "text",
    out_col: str = "bpe_tokens",
    lowercase: bool = False,
) -> DataFrame:
    """Append ``out_col`` (array<string> of subword tokens, END_OF_WORD
    markers included) computed by an Arrow-batched kernel with the merge
    list in the task closure. Distinct words are memoized per batch."""
    ranked = [(a, b, a + b) for a, b in merges]
    fields = [f"{f.name} {f.dataType.simpleString()}" for f in df.schema.fields]
    out_schema = ", ".join([*fields, f"{out_col} array<string>"])

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        memo: dict[str, list[str]] = {}

        def encode_word(w: str) -> list[str]:
            got = memo.get(w)
            if got is None:
                got = memo[w] = _apply_merges([*w, END_OF_WORD], ranked)
            return got

        for pdf in batches:
            # NULL text must encode to an empty token array — a bare
            # astype(str) would fabricate tokens for the literal strings
            # 'None'/'nan' that the trainer never saw (r6 advice)
            raw = pdf[text_col]
            null_mask = raw.isna()
            col = raw.astype(str)
            if lowercase:
                col = col.str.lower()
            toks = [
                [] if is_null else [t for w in text.split() for t in encode_word(w)]
                for text, is_null in zip(col, null_mask)
            ]
            out = pdf.copy()
            out[out_col] = toks
            yield out

    return df.mapInPandas(run, schema=out_schema)
