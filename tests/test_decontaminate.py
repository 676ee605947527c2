"""Decontamination: planted eval overlap, span arithmetic, anti-join."""

from tslib_spark.operators.decontaminate import (
    contamination_hits,
    decontaminate,
    eval_ngram_set,
)

W = ["w%d" % i for i in range(40)]


def test_planted_overlap_flagged_with_span(spark):
    leak = W[0:13]  # a 13-token eval passage
    docs = spark.createDataFrame(
        [
            (1, " ".join(["a1", "a2"] + leak + ["a3"])),   # contaminated
            (2, " ".join(W[20:36])),                        # clean
        ],
        "doc_id long, text string",
    )
    evals = spark.createDataFrame(
        [(" ".join(["e1"] + leak + ["e2"]),)], "text string"
    )
    grams = eval_ngram_set(evals, "text", n=13)
    out = contamination_hits(docs, "doc_id", "text", grams, n=13).collect()
    assert len(out) == 1
    r = out[0]
    # the 13-gram window matching the leak starts at token index 2
    assert r["doc_id"] == 1 and r["n_hits"] == 1
    assert r["first_pos"] == 2 and r["last_pos"] == 2

    kept = decontaminate(docs, "doc_id", "text", evals, "text", n=13)
    assert [r["doc_id"] for r in kept.collect()] == [2]


def test_multiple_hits_counted(spark):
    leak = W[0:8]
    text = " ".join(leak + ["x"] + leak)  # the leaked 8-gram occurs twice
    docs = spark.createDataFrame([(1, text)], "doc_id long, text string")
    evals = spark.createDataFrame([(" ".join(leak),)], "text string")
    grams = eval_ngram_set(evals, "text", n=8)
    r = contamination_hits(docs, "doc_id", "text", grams, n=8).collect()[0]
    assert r["n_hits"] == 2
    assert (r["first_pos"], r["last_pos"]) == (0, 9)


def test_short_eval_docs_contribute_nothing(spark):
    docs = spark.createDataFrame([(1, " ".join(W[0:20]))], "doc_id long, text string")
    evals = spark.createDataFrame([("too short",)], "text string")  # < n tokens
    grams = eval_ngram_set(evals, "text", n=13)
    assert grams.count() == 0
    assert contamination_hits(docs, "doc_id", "text", grams, n=13).count() == 0
