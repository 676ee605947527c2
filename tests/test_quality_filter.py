"""Quality filter: every rule fires on a planted doc; clean doc passes."""

from tslib_spark.operators.quality_filter import quality_filter

CLEAN = " ".join(
    "abcdefghijklmnopqrstuvwxyz"[i % 26] + "word" for i in range(30)
)  # letters only: digit/punct ratios must stay 0


def _run(spark, rows, **kw):
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = quality_filter(df, "doc_id", "text", **kw)
    return {r["doc_id"]: r for r in out.collect()}


def test_each_rule_fires(spark):
    rows = [
        (1, CLEAN),                                    # passes everything
        (2, "just a few words"),                       # too_short
        (3, " ".join(["spam ham"] * 20)),              # top-bigram dominant + dup heavy
        (4, "!!! ??? ###" + " !!!" * 10),               # punct noise (+ short)
        (5, " ".join(["123 456 789"] * 12)),            # digit noise
    ]
    out = _run(spark, rows, min_tokens=10)
    assert out[1]["keep"] and out[1]["fail_reasons"] == []
    assert "too_short" in out[2]["fail_reasons"]
    assert "top_ngram_dominant" in out[3]["fail_reasons"]
    assert "dup_ngram_heavy" in out[3]["fail_reasons"]
    assert "punct_noise" in out[4]["fail_reasons"]
    assert "digit_noise" in out[5]["fail_reasons"]
    assert not out[3]["keep"] and not out[5]["keep"]


def test_too_long_rule(spark):
    out = _run(spark, [(1, CLEAN)], min_tokens=5, max_tokens=20)
    assert out[1]["fail_reasons"] == ["too_long"]


def test_reason_order_is_rule_order(spark):
    # a doc failing multiple rules lists reasons in the fixed rule order
    out = _run(spark, [(1, " ".join(["99 99"] * 25))], min_tokens=10)
    r = out[1]["fail_reasons"]
    assert r == sorted(r, key=["too_short", "too_long", "top_ngram_dominant",
                               "dup_ngram_heavy", "punct_noise", "digit_noise"].index)
    assert "digit_noise" in r and "top_ngram_dominant" in r
