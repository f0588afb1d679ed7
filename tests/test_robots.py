"""robots.txt parsing + crawl gating (operators/robots.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from energy_pandas_spark.operators.robots import (
    apply_robots,
    parse_robots,
    robots_like_pattern,
)

ROBOTS_MAIN = """# site robots
User-agent: *
Disallow: /private/
Allow: /private/ok/
Disallow: /tmp*
Disallow:

User-agent: gptbot
User-agent: ccbot
Disallow: /

Sitemap: https://example.com/sitemap.xml
"""


def _rules(spark, text, agent="*", key="example.com"):
    df = spark.createDataFrame([(key, text)], "domain string, text string")
    return {
        (r.allow, r.path): r.rule_len
        for r in parse_robots(df, agent=agent).collect()
    }


def test_parse_star_group(spark):
    got = _rules(spark, ROBOTS_MAIN, agent="*")
    # empty Disallow dropped; Sitemap is not a rule
    assert got == {
        (False, "/private/"): 9,
        (True, "/private/ok/"): 12,
        (False, "/tmp*"): 5,
    }


def test_parse_specific_agent_beats_star(spark):
    # ccbot is named in a specific group -> the * group is ignored
    got = _rules(spark, ROBOTS_MAIN, agent="CCBot")
    assert got == {(False, "/"): 1}


def test_parse_unknown_agent_falls_back_to_star(spark):
    got = _rules(spark, ROBOTS_MAIN, agent="unknownbot")
    assert (False, "/private/") in got and (False, "/") not in got


def test_consecutive_ua_lines_share_one_group(spark):
    text = "User-agent: a\nUser-agent: b\nDisallow: /x\n"
    assert _rules(spark, text, agent="a") == {(False, "/x"): 2}
    assert _rules(spark, text, agent="b") == {(False, "/x"): 2}


def test_ua_after_rules_starts_new_group(spark):
    text = (
        "User-agent: a\nDisallow: /a\n"
        "User-agent: b\nDisallow: /b\n"
    )
    # group 2's rule must not leak into group 1's agent
    assert _rules(spark, text, agent="a") == {(False, "/a"): 2}
    assert _rules(spark, text, agent="b") == {(False, "/b"): 2}


def test_rules_before_any_ua_are_ignored(spark):
    text = "Disallow: /orphan\nUser-agent: *\nDisallow: /x\n"
    assert _rules(spark, text) == {(False, "/x"): 2}


def test_comments_crlf_and_case(spark):
    text = "USER-AGENT: *  # inline\r\nDISALLOW: /a # tail\r\nallow: /a/b\r\n"
    assert _rules(spark, text) == {(False, "/a"): 2, (True, "/a/b"): 4}


def test_null_and_empty_text(spark):
    df = spark.createDataFrame(
        [("d1", None), ("d2", "")], "domain string, text string"
    )
    assert parse_robots(df).count() == 0


def _patterns(spark, paths):
    df = spark.createDataFrame([(p,) for p in paths], "path string")
    return [
        r.p
        for r in df.select(robots_like_pattern("path").alias("p")).collect()
    ]


def test_like_pattern_compile(spark):
    got = _patterns(
        spark, ["/a", "/a*", "/a$", "/*.php$", "/50%_off", "/a*b$"]
    )
    assert got == [
        "/a%",
        "/a%%",  # trailing * then prefix % (harmless duplicate wildcard)
        "/a",
        "/%.php",
        "/50\\%\\_off%",
        "/a%b",
    ]


def _gate(spark, pages, rules_text, agent="*"):
    robots = spark.createDataFrame(
        [("example.com", rules_text)], "domain string, text string"
    )
    rules = parse_robots(robots, agent=agent)
    df = spark.createDataFrame(
        [(i, u) for i, u in enumerate(pages)], "doc_id long, url string"
    )
    out = apply_robots(df, F.broadcast(rules))
    return {r.url: (r.allowed, r.matched_rule) for r in out.collect()}


def test_gate_longest_match_and_allow_tie(spark):
    text = (
        "User-agent: *\n"
        "Disallow: /private/\n"
        "Allow: /private/ok/\n"
        "Disallow: /tmp*\n"
    )
    got = _gate(
        spark,
        [
            "https://example.com/public/x",
            "https://example.com/private/x",
            "https://example.com/private/ok/x",
            "https://example.com/tmpfiles/y",
            "https://www.example.com/private/z",  # www-stripped key joins
            "not a url 1",  # unparseable -> allowed, no rule
        ],
        text,
    )
    assert got["https://example.com/public/x"] == (True, None)
    assert got["https://example.com/private/x"] == (False, "/private/")
    assert got["https://example.com/private/ok/x"] == (True, "/private/ok/")
    assert got["https://example.com/tmpfiles/y"] == (False, "/tmp*")
    assert got["https://www.example.com/private/z"] == (False, "/private/")
    assert got["not a url 1"] == (True, None)


def test_gate_end_anchor_and_query(spark):
    text = (
        "User-agent: *\n"
        "Disallow: /*.php$\n"
        "Disallow: /search?q=*\n"
    )
    got = _gate(
        spark,
        [
            "https://example.com/index.php",
            "https://example.com/index.php?x=1",  # $ anchor: query breaks it
            "https://example.com/search?q=cats",
            "https://example.com/search",
        ],
        text,
    )
    assert got["https://example.com/index.php"][0] is False
    assert got["https://example.com/index.php?x=1"][0] is True
    assert got["https://example.com/search?q=cats"][0] is False
    assert got["https://example.com/search"][0] is True


def test_gate_root_path_and_no_rules_domain(spark):
    text = "User-agent: *\nDisallow: /\n"
    robots = spark.createDataFrame(
        [("example.com", text)], "domain string, text string"
    )
    rules = parse_robots(robots)
    df = spark.createDataFrame(
        [(1, "https://example.com"), (2, "https://other.org/x")],
        "doc_id long, url string",
    )
    got = {
        r.doc_id: r.allowed for r in apply_robots(df, rules).collect()
    }
    # bare-origin URL matches Disallow: / ; unrelated domain untouched
    assert got == {1: False, 2: True}


def test_parse_plan_never_touches_pages(spark):
    # parse windows partition by the robots-doc key; assert no
    # single-partition window sneaks in
    robots = spark.createDataFrame(
        [("example.com", ROBOTS_MAIN)], "domain string, text string"
    )
    plan = parse_robots(robots)._jdf.queryExecution().executedPlan().toString()
    assert "SinglePartition" not in plan


def test_sitemap_urls(spark):
    from energy_pandas_spark.operators.robots import sitemap_urls

    text = (
        "User-agent: *\r\n"
        "Disallow: /x\r\n"
        "SITEMAP: https://example.com/sitemap.xml  # primary\r\n"
        "sitemap: https://cdn.example.com/s2.xml.gz\r\n"
        "Sitemap: not-a-url\r\n"
        "Sitemap:\r\n"
    )
    df = spark.createDataFrame(
        [("example.com", text), ("empty.org", None)],
        "domain string, text string",
    )
    got = sorted(map(tuple, sitemap_urls(df).collect()))
    assert got == [
        ("example.com", "https://cdn.example.com/s2.xml.gz"),
        ("example.com", "https://example.com/sitemap.xml"),
    ]


def test_sitemap_urls_zero_shuffle(spark):
    from energy_pandas_spark.operators.robots import sitemap_urls
    from energy_pandas_spark.plans import exchange_count

    df = spark.createDataFrame(
        [("a.io", "Sitemap: https://a.io/s.xml")],
        "domain string, text string",
    )
    assert exchange_count(sitemap_urls(df)) == 0
