"""URL canonicalization + domain operators (operators/urls.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from energy_pandas_spark.operators.urls import (
    canonical_url,
    domain_stats,
    registrable_domain,
    url_dedup,
    url_domain,
)


def _canon(spark, urls):
    df = spark.createDataFrame([(u,) for u in urls], "url string")
    return [
        r.c for r in df.select(canonical_url("url").alias("c")).collect()
    ]


def test_canonicalization_rules(spark):
    cases = {
        # scheme + host lowercase, www stripped, fragment dropped
        "HTTPS://WWW.Example.COM/Path#frag": "https://example.com/Path",
        # default ports stripped, non-default kept
        "https://example.com:443/a": "https://example.com/a",
        "http://example.com:80/a": "http://example.com/a",
        "http://example.com:8080/a": "http://example.com:8080/a",
        # empty path -> /, trailing slashes stripped
        "https://example.com": "https://example.com/",
        "https://example.com/a/b///": "https://example.com/a/b",
        # tracking params dropped, the rest sorted; empty query dropped
        "https://example.com/p?utm_source=x&b=2&a=1&gclid=zz":
            "https://example.com/p?a=1&b=2",
        "https://example.com/p?utm_campaign=y&fbclid=1":
            "https://example.com/p",
        # userinfo stripped
        "https://user:pw@example.com/x": "https://example.com/x",
        # path case preserved (URL paths are case-sensitive)
        "https://example.com/CaseSensitive":
            "https://example.com/CaseSensitive",
    }
    got = _canon(spark, list(cases))
    assert got == list(cases.values())


def test_non_urls_canonicalize_to_null(spark):
    got = _canon(spark, ["not a url", "", "ftp:/broken", "http://"])
    assert got == [None, None, None, None]


def test_registrable_domain(spark):
    df = spark.createDataFrame(
        [
            ("news.example.co.uk",),
            ("a.b.example.com",),
            ("example.com",),
            ("localhost",),
            ("shop.example.com.au",),
        ],
        "host string",
    )
    got = [
        r.d for r in df.select(registrable_domain("host").alias("d")).collect()
    ]
    assert got == [
        "example.co.uk",
        "example.com",
        "example.com",
        "localhost",
        "example.com.au",
    ]


def test_url_domain_and_extra_suffixes(spark):
    df = spark.createDataFrame(
        [("https://www.blog.example.co.uk/x",), ("nope",)], "url string"
    )
    got = [r.d for r in df.select(url_domain("url").alias("d")).collect()]
    assert got == ["example.co.uk", None]
    got2 = [
        r.d
        for r in df.select(
            url_domain("url", extra_suffixes=("example.co.uk",)).alias("d")
        ).collect()
    ]
    # treating example.co.uk itself as a suffix pushes one label deeper
    assert got2[0] == "blog.example.co.uk"


def test_url_domain_strips_www_like_canonical_url(spark):
    # www must strip BEFORE domain extraction, matching canonical_url's
    # host — otherwise www.<suffix> pages group under a phantom site
    df = spark.createDataFrame(
        [("https://www.co.uk/x",), ("https://www.example.com/y",)],
        "url string",
    )
    got = [r.d for r in df.select(url_domain("url").alias("d")).collect()]
    assert got == ["co.uk", "example.com"]


def test_url_dedup_keep_min_and_quality(spark):
    rows = [
        (1, "https://www.example.com/p?utm_source=a", 0.9),
        (2, "https://example.com/p", 0.5),
        (3, "https://example.com/p/", 0.7),
        (4, "https://other.org/q", 0.1),
        (5, "garbage", 0.2),
        (6, "junk", 0.3),
    ]
    df = spark.createDataFrame(rows, "doc_id long, url string, q double")
    kept = {r.doc_id: r for r in url_dedup(df).collect()}
    # 1,2,3 collapse to one canonical URL; smallest id survives
    assert set(kept) == {1, 4, 5, 6}
    assert kept[1].n_copies == 3
    assert kept[5].canonical_url is None and kept[5].n_copies == 1
    best = {r.doc_id: r for r in url_dedup(df, quality_col="q").collect()}
    # quality survivor: doc 1 has q=0.9
    assert set(best) == {1, 4, 5, 6}
    tie = spark.createDataFrame(
        [(7, "https://t.io/a", 1.0), (8, "https://t.io/a", 1.0)],
        "doc_id long, url string, q double",
    )
    # quality tie -> lowest id
    assert [r.doc_id for r in url_dedup(tie, quality_col="q").collect()] == [7]


def test_domain_stats(spark):
    rows = [
        (1, "https://a.example.com/1", "xxxx"),
        (2, "https://b.example.com/2", "yyyyyy"),
        (3, "https://other.org/3", "zz"),
        (4, None, "n"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, url string, text string")
    got = {r.domain: r for r in domain_stats(df).collect()}
    assert got["example.com"].n_docs == 2
    assert got["example.com"].n_chars == 10
    assert got["example.com"].docs_permille == 500
    assert got["other.org"].n_docs == 1
    assert got["(none)"].n_docs == 1
    assert sum(r.n_docs for r in got.values()) == 4


def test_canonical_url_plan_is_pure_projection(spark):
    df = spark.createDataFrame([("https://x.io/a",)], "url string")
    plan = (
        df.select(canonical_url("url").alias("c"), url_domain("url").alias("d"))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan
    assert "mapInPandas" not in plan.lower()
