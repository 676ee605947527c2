"""URL expression edge cases: no-www, bare host, missing params, ports."""

from pyspark.sql import functions as F

from tslib_spark.functions.web import (
    normalize_url,
    url_domain,
    url_host,
    url_path,
    url_query_param,
)


def _parse(spark, urls):
    df = spark.createDataFrame([(u,) for u in urls], "url string")
    rows = df.select(
        "url",
        url_host(F.col("url")).alias("host"),
        url_domain(F.col("url")).alias("domain"),
        url_path(F.col("url")).alias("path"),
        url_query_param(F.col("url"), "q").alias("q"),
        normalize_url(F.col("url")).alias("norm"),
    ).collect()
    return {r["url"]: r for r in rows}

def test_url_parts(spark):
    out = _parse(spark, [
        "https://www.Example.COM/a/b?q=1#top",
        "http://sub.site.org",
        "https://example.com/?q=x&y=2",
        "https://deep.a.b.site.net/path",
    ])
    r = out["https://www.Example.COM/a/b?q=1#top"]
    assert r["host"] == "example.com"
    assert r["domain"] == "example.com"
    assert r["path"] == "/a/b"
    assert r["q"] == "1"
    assert r["norm"] == "example.com/a/b"

    r = out["http://sub.site.org"]
    assert r["host"] == "sub.site.org"
    assert r["domain"] == "site.org"
    assert r["path"] == "/"
    assert r["q"] is None
    assert r["norm"] == "sub.site.org/"

    assert out["https://example.com/?q=x&y=2"]["q"] == "x"
    assert out["https://deep.a.b.site.net/path"]["domain"] == "site.net"


def test_norm_is_stable_dedup_key(spark):
    # the canonical key collapses scheme/case/www/query/fragment variants
    variants = [
        "https://www.site.com/p/1?utm=x",
        "http://site.com/p/1#frag",
        "https://SITE.com/p/1",
    ]
    df = spark.createDataFrame([(u,) for u in variants], "url string")
    norms = df.select(normalize_url(F.col("url")).alias("n")).distinct().collect()
    assert len(norms) == 1 and norms[0]["n"] == "site.com/p/1"


def test_domain_psl_and_single_label_fallback(spark):
    """r4: url_domain never returns an empty-string sink (single-label
    hosts fall back to the host), and url_domain_psl consults the bundled
    public-suffix snapshot for co.uk-style registries."""
    from tslib_spark.functions.web import url_domain, url_domain_psl

    cases = [
        ("https://a.b.site.co.uk/x", "co.uk", "site.co.uk"),
        ("https://www.shop.com.au/", "com.au", "shop.com.au"),
        ("https://news.example.com/", "example.com", "example.com"),
        ("http://localhost:8080/health", "localhost", "localhost"),
        ("https://co.uk/", "co.uk", "co.uk"),  # bare suffix: host fallback
        ("https://x.gov.br/", "gov.br", "x.gov.br"),
    ]
    df = spark.createDataFrame([(u,) for u, _, _ in cases], "url string")
    got = {
        r["url"]: (r["d"], r["p"])
        for r in df.select(
            "url",
            url_domain(F.col("url")).alias("d"),
            url_domain_psl(F.col("url")).alias("p"),
        ).collect()
    }
    for url, want_d, want_p in cases:
        assert got[url] == (want_d, want_p), (url, got[url])
