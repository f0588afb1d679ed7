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


def test_extract_links_resolution(spark):
    from pyspark.sql import Row

    from energy_pandas_spark.operators.urls import extract_links

    df = spark.createDataFrame(
        [
            Row(
                doc_id=1,
                url="https://a.example.org/p/1",
                text=(
                    '<a href="https://hub.net/a/1">l</a> '
                    "<a href='HTTP://WWW.b.co.uk:80/x'>m</a> "
                    '<a href="/rel/3">r</a> <a href="//cdn.c.net/img">p</a> '
                    '<a href="mailto:x@y.z">e</a> <a href="">q</a> '
                    '<a href="rel2.html">s</a>'
                ),
            ),
            # base does not parse: root-relative cannot resolve,
            # absolute still passes through
            Row(doc_id=2, url="not a url",
                text='<a href="/only/rel">x</a> <a href="https://hub.net/b">y</a>'),
            Row(doc_id=3, url="https://d.example.org/", text=None),
        ]
    )
    rows = extract_links(df, base_url_col="url").collect()
    resolved = {(r.doc_id, r.href): r.url for r in rows}
    assert resolved[(1, "https://hub.net/a/1")] == "https://hub.net/a/1"
    # single-quoted href captured; absolute passes through unchanged
    assert resolved[(1, "HTTP://WWW.b.co.uk:80/x")] == "HTTP://WWW.b.co.uk:80/x"
    # root-relative joins the base origin; protocol-relative takes its scheme
    assert resolved[(1, "/rel/3")] == "https://a.example.org/rel/3"
    assert resolved[(1, "//cdn.c.net/img")] == "https://cdn.c.net/img"
    # mailto / empty / relative-path hrefs do not resolve
    assert resolved[(1, "mailto:x@y.z")] is None
    assert resolved[(1, "")] is None
    assert resolved[(1, "rel2.html")] is None
    assert resolved[(2, "/only/rel")] is None
    assert resolved[(2, "https://hub.net/b")] == "https://hub.net/b"
    # NULL html -> no rows
    assert not [r for r in rows if r.doc_id == 3]


def test_extract_links_is_map_only(spark):
    from energy_pandas_spark.operators.urls import extract_links

    df = spark.createDataFrame(
        [(1, "https://a.org/", '<a href="/x">y</a>')],
        "doc_id long, url string, text string",
    )
    plan = (
        extract_links(df, base_url_col="url")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan and "Python" not in plan


def test_domain_links_and_degrees(spark):
    from pyspark.sql import Row

    from energy_pandas_spark.operators.urls import (
        domain_links,
        link_degree_stats,
    )

    df = spark.createDataFrame(
        [
            Row(
                doc_id=1,
                url="https://a.example.org/p/1",
                text=(
                    '<a href="https://hub.net/a/1">l</a> '
                    '<a href="https://hub.net/a/2">l2</a> '
                    '<a href="/self">s</a>'
                ),
            ),
            Row(doc_id=2, url="https://b.example.org/p/2",
                text='<a href="https://hub.net/b">y</a>'),
            # src without a parseable URL contributes no edges
            Row(doc_id=3, url=None, text='<a href="https://hub.net/c">z</a>'),
        ]
    )
    edges = {
        (r.src_domain, r.dst_domain): r.n_links
        for r in domain_links(df).collect()
    }
    # a.example.org and b.example.org share the registrable domain
    assert edges == {
        ("example.org", "hub.net"): 3,
        ("example.org", "example.org"): 1,
    }
    deg = {
        r.domain: (r.n_out_links, r.n_out_domains, r.n_in_links, r.n_in_domains)
        for r in link_degree_stats(domain_links(df)).collect()
    }
    assert deg["example.org"] == (4, 2, 1, 1)
    assert deg["hub.net"] == (0, 0, 3, 1)
    # dropping self-loops removes the intra-site edge
    no_self = {
        (r.src_domain, r.dst_domain)
        for r in domain_links(df, keep_self_loops=False).collect()
    }
    assert no_self == {("example.org", "hub.net")}


def test_domain_links_single_scan_no_join(spark):
    from energy_pandas_spark.operators.urls import domain_links

    df = spark.createDataFrame(
        [(1, "https://a.org/", '<a href="https://b.net/x">y</a>')],
        "doc_id long, url string, text string",
    )
    plan = domain_links(df)._jdf.queryExecution().executedPlan().toString()
    # src_domain comes from the same row as the hrefs: one pass over
    # the corpus, no join back, one map-combined edge aggregate
    assert "Join" not in plan and "Python" not in plan
    assert plan.count("Scan ExistingRDD") + plan.count("LocalTableScan") == 1


def test_plan_fetch_waves_politeness_and_priority(spark):
    from energy_pandas_spark.operators.urls import plan_fetch_waves

    rows = [
        # big.org: priorities 5,3,3,1 -> waves by (prio desc, url asc)
        ("https://big.org/a", 3),
        ("https://big.org/b", 5),
        ("https://big.org/c", 3),
        ("https://big.org/d", 1),
        ("https://small.net/only", 2),
        ("not a url", 9),  # unparseable -> dropped
    ]
    df = spark.createDataFrame(rows, "url string, n_refs long")
    out = plan_fetch_waves(df, n_workers=8).collect()
    got = {r.url: (r.domain, r.priority, r.wave) for r in out}
    assert "not a url" not in got
    assert got["https://big.org/b"] == ("big.org", 5, 1)
    assert got["https://big.org/a"] == ("big.org", 3, 2)
    assert got["https://big.org/c"] == ("big.org", 3, 3)
    assert got["https://big.org/d"] == ("big.org", 1, 4)
    assert got["https://small.net/only"] == ("small.net", 2, 1)
    # one URL per (domain, wave); worker stable per domain, in range
    assert len({(r.domain, r.wave) for r in out}) == len(out)
    workers = {}
    for r in out:
        assert 0 <= r.worker < 8
        assert workers.setdefault(r.domain, r.worker) == r.worker


def test_plan_fetch_waves_cap_and_partitioning_invariance(spark):
    from energy_pandas_spark.operators.urls import plan_fetch_waves

    rows = [(f"https://cap.org/{i:03d}", i % 7) for i in range(40)] + [
        (f"https://other.io/{i}", i) for i in range(3)
    ]
    df = spark.createDataFrame(rows, "url string, n_refs long")
    out1 = plan_fetch_waves(df, max_waves=5, n_workers=4)
    got1 = sorted((r.domain, r.wave, r.url) for r in out1.collect())
    # cap: cap.org keeps exactly max_waves rows, other.io all 3
    assert sum(1 for d, _, _ in got1 if d == "cap.org") == 5
    assert sum(1 for d, _, _ in got1 if d == "other.io") == 3
    # the two-stage bounded rank is split-plan invariant
    out2 = plan_fetch_waves(df.repartition(7), max_waves=5, n_workers=4)
    assert got1 == sorted((r.domain, r.wave, r.url) for r in out2.collect())


def test_plan_fetch_waves_validation(spark):
    import pytest as _pytest

    from energy_pandas_spark.operators.urls import plan_fetch_waves

    df = spark.createDataFrame([("https://a.org/x", 1)], "url string, n_refs long")
    with _pytest.raises(ValueError):
        plan_fetch_waves(df, n_workers=0)
    with _pytest.raises(ValueError):
        plan_fetch_waves(df, max_waves=0)


class TestAnchorTexts:
    def test_extract_and_clean(self, spark):
        from energy_pandas_spark.operators.urls import extract_anchor_texts

        html = (
            '<p>x</p><a href="https://a.com/p">Read   <b>more</b>\nhere</a>'
            "<a href='https://b.com'><img src=\"i.png\"></a>"
            '<A HREF="/rel" class="c">Rel Link</A>'
        )
        df = spark.createDataFrame(
            [(1, html, "https://base.org/dir/page")],
            "doc_id long, text string, url string",
        )
        out = extract_anchor_texts(df, base_url_col="url")
        rows = {r.url: r.anchor for r in out.collect()}
        assert rows["https://a.com/p"] == "Read more here"  # tags stripped
        assert rows["https://b.com"] is None  # image link -> NULL anchor
        assert rows["https://base.org/rel"] == "Rel Link"  # resolved + (?i)

    def test_protocol_relative_and_no_base(self, spark):
        from energy_pandas_spark.operators.urls import extract_anchor_texts

        html = '<a href="//cdn.net/x">c</a><a href="mailto:a@b">m</a>'
        df = spark.createDataFrame(
            [(1, html, "HTTPS://Base.org/p")], "doc_id long, text string, url string"
        )
        rows = {r.anchor: r.url for r in
                extract_anchor_texts(df, base_url_col="url").collect()}
        assert rows["c"] == "https://cdn.net/x"  # base scheme, lowercased
        assert rows["m"] is None
        # without a base, only absolute hrefs resolve
        rows2 = {r.anchor: r.url for r in extract_anchor_texts(df).collect()}
        assert rows2["c"] is None

    def test_null_text(self, spark):
        from energy_pandas_spark.operators.urls import extract_anchor_texts

        df = spark.createDataFrame([(1, None)], "doc_id long, text string")
        assert extract_anchor_texts(df).count() == 0

    def test_extract_is_map_only(self, spark):
        from energy_pandas_spark.operators.urls import extract_anchor_texts
        from energy_pandas_spark.plans.explain import exchange_count

        df = spark.range(10).select(
            F.col("id").alias("doc_id"),
            F.lit('<a href="https://x.com">y</a>').alias("text"),
        )
        out = extract_anchor_texts(df)
        assert exchange_count(out) == 0
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert "Python" not in plan

    def test_summary_pools_canonical_variants(self, spark):
        from energy_pandas_spark.operators.urls import (
            anchor_text_summary,
            extract_anchor_texts,
        )

        pages = []
        # 3 pages call the target "home", 2 call it "start"; tracking
        # params and fragments must pool onto one canonical target
        variants = [
            "https://t.com/", "https://t.com/?utm_source=x",
            "https://t.com/#frag", "https://www.t.com/", "https://t.com",
        ]
        anchors = ["home", "home", "home", "start", "start"]
        for i, (v, a) in enumerate(zip(variants, anchors)):
            pages.append((i, f'<a href="{v}">{a}</a>'))
        df = spark.createDataFrame(pages, "doc_id long, text string")
        out = anchor_text_summary(extract_anchor_texts(df), k=1).collect()
        assert len(out) == 1
        r = out[0]
        assert r.n_links == 5 and r.n_unique_anchors == 2
        assert r.top_anchors == "home"

    def test_summary_topk_order(self, spark):
        from energy_pandas_spark.operators.urls import anchor_text_summary

        links = spark.createDataFrame(
            [(1, "https://t.com/", a) for a in
             ["b", "b", "b", "a", "a", "c"]],
            "doc_id long, url string, anchor string",
        )
        r = anchor_text_summary(links, k=2).collect()[0]
        assert r.top_anchors == "b | a"  # count desc, anchor asc
        # never a whole-URL single window task
        plan = (
            anchor_text_summary(links, k=2)
            ._jdf.queryExecution().executedPlan().toString()
        )
        assert "SinglePartition" not in plan
