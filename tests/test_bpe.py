"""BPE train/encode vs an independent pure-Python reference.

The oracle trains with Counter-based pair counting and a plain scan-merge —
no shared code with the Spark fold — and must produce the identical merge
list (training is exact integer arithmetic with a deterministic tiebreak)
and identical tokenizations.
"""

from __future__ import annotations

from collections import Counter

import numpy as np
import pytest
from pyspark.sql import functions as F

from tslib_spark.operators.bpe import END_OF_WORD, bpe_encode, bpe_train


def _scan_merge(syms, a, b):
    out, i = [], 0
    while i < len(syms):
        if i < len(syms) - 1 and syms[i] == a and syms[i + 1] == b:
            out.append(a + b)
            i += 2
        else:
            out.append(syms[i])
            i += 1
    return out


def _py_bpe_train(texts, num_merges, min_pair_count=2, lowercase=False):
    vocab: Counter = Counter()
    for t in texts:
        vocab.update((t.lower() if lowercase else t).split())
    words = {w: [*w, END_OF_WORD] for w in vocab}
    merges = []
    for _ in range(num_merges):
        pc: Counter = Counter()
        for w, freq in vocab.items():
            syms = words[w]
            for i in range(len(syms) - 1):
                pc[(syms[i], syms[i + 1])] += freq
        if not pc:
            break
        # max count, ties by lexicographically smallest pair (mirrors the
        # Spark orderBy cnt desc, a asc, b asc — written independently)
        best_pair = min(pc, key=lambda p: (-pc[p], p))
        if pc[best_pair] < min_pair_count:
            break
        merges.append(best_pair)
        a, b = best_pair
        for w in words:
            words[w] = _scan_merge(words[w], a, b)
    return merges


def _py_encode(text, merges, lowercase=False):
    out = []
    for w in (text.lower() if lowercase else text).split():
        syms = [*w, END_OF_WORD]
        for a, b in merges:
            syms = _scan_merge(syms, a, b)
        out.extend(syms)
    return out


def _texts(seed=17, n=80):
    rng = np.random.default_rng(seed)
    stems = ["low", "lower", "lowest", "new", "newer", "newest", "wide", "wider", "widest"]
    extra = ["the", "a", "of", "ab", "abab", "ababab", "x"]
    return [
        " ".join(rng.choice(stems + extra, size=rng.integers(3, 12)))
        for _ in range(n)
    ]


@pytest.fixture(scope="module")
def corpus(spark):
    texts = _texts()
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    return texts, df


def test_bpe_train_matches_reference(spark, corpus):
    texts, df = corpus
    got = bpe_train(df, num_merges=40, min_pair_count=2)
    want = _py_bpe_train(texts, num_merges=40, min_pair_count=2)
    assert got == want
    assert len(got) > 10  # the fixture has real merge structure


def test_bpe_train_partition_invariant(spark, corpus):
    texts, df = corpus
    a = bpe_train(df.repartition(1), num_merges=12)
    b = bpe_train(df.repartition(16), num_merges=12)
    assert a == b == _py_bpe_train(texts, num_merges=12)


def test_bpe_train_early_stop_and_max_words(spark):
    df = spark.createDataFrame([(0, "q q q zz")], "doc_id long, text string")
    # only pairs: (q,</w>) x3, (z,z) x1, (z,</w>), (zz-ish)...; with
    # min_pair_count=4 nothing qualifies
    assert bpe_train(df, num_merges=10, min_pair_count=4) == []
    got = bpe_train(df, num_merges=1, min_pair_count=1, max_words=1)
    # top word by freq is 'q': best pair is (q, </w>)
    assert got == [("q", END_OF_WORD)]


def test_bpe_encode_matches_reference(spark, corpus):
    texts, df = corpus
    merges = _py_bpe_train(texts, num_merges=40, min_pair_count=2)
    got = {r["doc_id"]: r["bpe_tokens"] for r in bpe_encode(df, merges).collect()}
    for i, t in enumerate(texts):
        assert got[i] == _py_encode(t, merges)


def test_bpe_encode_edges(spark):
    merges = [("a", "b"), ("ab", END_OF_WORD)]
    df = spark.createDataFrame(
        [(0, ""), (1, "   "), (2, "ab"), (3, "aab abab"), (4, "AB")],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r["bpe_tokens"] for r in bpe_encode(df, merges).collect()}
    assert got[0] == [] and got[1] == []
    assert got[2] == ["ab</w>"]
    assert got[3] == ["a", "ab</w>", "ab", "ab</w>"]
    assert got[4] == ["A", "B", END_OF_WORD]
    low = {r["doc_id"]: r["bpe_tokens"] for r in bpe_encode(df, merges, lowercase=True).collect()}
    assert low[4] == ["ab</w>"]


def test_bpe_roundtrip_reconstructs_text(spark, corpus):
    """Detokenization sanity: joining tokens and splitting on END_OF_WORD
    recovers the original whitespace-normalized text."""
    texts, df = corpus
    merges = _py_bpe_train(texts, num_merges=25)
    enc = bpe_encode(df, merges)
    back = enc.select(
        "doc_id",
        F.array_join(F.col("bpe_tokens"), "").alias("joined"),
    ).collect()
    for r in back:
        want = " ".join(texts[r["doc_id"]].split())
        got = r["joined"].replace(END_OF_WORD, " ").rstrip()
        assert got == want


def test_bpe_pack_composition(spark, corpus):
    """Tokenize -> count -> pack: the packed offsets over BPE token counts
    match the pure-Python composition of both oracles."""
    from pyspark.sql import functions as F

    from tslib_spark.operators.packing import pack_sequences

    texts, df = corpus
    merges = _py_bpe_train(texts, num_merges=25)
    enc = bpe_encode(df, merges).withColumn("n_bpe", F.size("bpe_tokens"))
    packed = pack_sequences(enc, token_col="n_bpe", order_col="doc_id", budget=64)
    got = {r["doc_id"]: (r["bin_id"], r["bin_offset"]) for r in packed.collect()}
    acc = 0
    for i, t in enumerate(texts):
        n = len(_py_encode(t, merges))
        assert got[i] == (acc // 64, acc % 64)
        acc += n


def test_bpe_train_local_path_matches_distributed(spark, corpus):
    """r7: max_words triggers the driver-local merge loop — it must learn
    the identical merge list as the uncapped distributed fold path when the
    cap doesn't actually drop any word."""
    texts, df = corpus
    distributed = bpe_train(df, num_merges=25, min_pair_count=2)  # max_words=None
    local = bpe_train(df, num_merges=25, min_pair_count=2, max_words=10_000)
    assert local == distributed
    # and many merges in the local path stay cheap (would be 2k Spark jobs
    # on the distributed path) while agreeing with the Counter oracle
    big = bpe_train(df, num_merges=200, min_pair_count=1, max_words=10_000)
    assert big[:25] == distributed[:25] or big[:25] == local[:25]
    assert big == _py_bpe_train(texts, num_merges=200, min_pair_count=1)


def test_bpe_encode_null_text_yields_empty(spark):
    merges = [("a", "b")]
    df = spark.createDataFrame(
        [(0, None), (1, "ab"), (2, "nan")], "doc_id long, text string"
    )
    got = {r["doc_id"]: r["bpe_tokens"] for r in bpe_encode(df, merges).collect()}
    assert got[0] == []  # NULL encodes to nothing, not tokens of 'None'
    assert got[1] == ["ab", END_OF_WORD]
    assert got[2] == ["n", "a", "n", END_OF_WORD]  # the real string 'nan' still encodes
