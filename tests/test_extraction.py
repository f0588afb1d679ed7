"""Block-level main-content extraction (jusText-style): block
splitting/scoring goldens, label thresholds, zero-shuffle plan locks,
and a Python recomputation property."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from energy_pandas_spark.operators.extraction import (
    content_blocks,
    extract_main_content,
)
from energy_pandas_spark.plans.explain import exchange_count

PAGE = (
    '<html><head><title>T</title><script>var x = "<p>junk</p>";</script>'
    "<style>p{}</style></head><body>"
    '<nav><a href="/">Home</a> <a href="/about">About</a> '
    '<a href="/contact">Contact</a></nav>'
    "<h1>Short head</h1>"
    "<p>It is the case that a good result of the work is in the text "
    "and that it is for a test of the block scoring.</p>"
    "<p>alpha beta gamma delta epsilon zeta eta theta iota kappa</p>"
    '<footer><a href="/tos">Terms</a> <a href="/priv">Privacy</a></footer>'
    "</body></html>"
)


def _one(spark, text=PAGE):
    return spark.createDataFrame([(1, text)], "doc_id long, text string")


class TestContentBlocks:
    def test_labels_golden(self, spark):
        rows = content_blocks(_one(spark)).orderBy("block_idx").collect()
        by_label = {}
        for r in rows:
            by_label.setdefault(r.label, []).append(r.block_text)
        # nav and footer: all-link blocks -> boilerplate
        assert any("Home About Contact" in t for t in by_label["boilerplate"])
        assert any("Terms Privacy" in t for t in by_label["boilerplate"])
        # the stopword-rich paragraph -> good
        assert any(t.startswith("It is the case") for t in by_label["good"])
        # the greek-letter list: long, link-free, stopword-free
        assert any(t.startswith("alpha beta") for t in by_label["low_text"])
        # headings under min_words -> short; title survives head strip
        assert any(t == "Short head" for t in by_label["short"])
        # script/style payloads never became blocks
        assert not any("junk" in r.block_text for r in rows)

    def test_stats_golden(self, spark):
        rows = {r.block_text: r for r in content_blocks(_one(spark)).collect()}
        nav = rows["Home About Contact"]
        assert nav.n_link_chars == len("Home") + len("About") + len("Contact")
        # 'Home About Contact' = 18 chars, links = 16 -> 888 permille
        assert nav.link_permille == (16 * 1000) // 18
        good = next(r for t, r in rows.items() if t.startswith("It is the"))
        assert good.stop_permille >= 400
        assert good.n_words == len(good.block_text.split())

    def test_entities_and_null(self, spark):
        rows = content_blocks(
            _one(spark, "<p>a &amp; b &lt;c&gt; d e f g h</p>")
        ).collect()
        assert rows[0].block_text == 'a & b <c> d e f g h'
        assert content_blocks(_one(spark, None)).count() == 0

    def test_threshold_validation(self, spark):
        df = _one(spark)
        with pytest.raises(ValueError):
            content_blocks(df, min_words=0)
        with pytest.raises(ValueError):
            content_blocks(df, max_link_permille=1001)
        with pytest.raises(ValueError):
            content_blocks(df, stopwords=())

    def test_block_idx_is_document_order(self, spark):
        rows = content_blocks(_one(spark)).orderBy("block_idx").collect()
        texts = [r.block_text for r in rows]
        assert texts.index("Short head") < texts.index(
            next(t for t in texts if t.startswith("It is the"))
        )


class TestExtractMainContent:
    def test_keeps_only_good_prose(self, spark):
        out = extract_main_content(_one(spark)).collect()[0].main_content
        assert out.startswith("It is the case")
        assert "Home" not in out and "Terms" not in out
        assert "alpha beta" not in out and "Short head" not in out

    def test_multiple_good_blocks_join_in_order(self, spark):
        page = (
            "<p>It is the first of the good blocks that we have in it.</p>"
            "<div>x y z</div>"
            "<p>And it is the second of the good blocks for the test.</p>"
        )
        out = extract_main_content(_one(spark, page)).collect()[0].main_content
        parts = out.split("\n")
        assert len(parts) == 2
        assert parts[0].startswith("It is the first")
        assert parts[1].startswith("And it is the second")

    def test_no_good_blocks_yields_empty(self, spark):
        out = extract_main_content(
            _one(spark, "<p>x</p>")
        ).collect()[0].main_content
        assert out == ""

    def test_zero_shuffle_no_python(self, spark):
        df = spark.range(10).select(
            F.col("id").alias("doc_id"), F.lit(PAGE).alias("text")
        )
        out = extract_main_content(df)
        assert exchange_count(out) == 0
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert "Python" not in plan
        blocks = content_blocks(df)
        assert exchange_count(blocks) == 0


def _py_blocks(page: str) -> list[dict]:
    """Independent Python recomputation of the block pipeline."""
    import re

    h = page or ""
    h = re.sub(r"(?is)<script\b.*?</script\s*>", " ", h)
    h = re.sub(r"(?is)<style\b.*?</style\s*>", " ", h)
    h = re.sub(r"(?s)<!--.*?-->", " ", h)
    pat = (
        r"(?i)</?(?:p|div|br|li|ul|ol|tr|td|th|table|h[1-6]|blockquote"
        r"|section|article|header|footer|nav|aside|main|form)\b[^>]*>"
    )
    stop = {"a", "and", "be", "for", "have", "in", "is", "it",
            "of", "that", "the", "to", "with"}

    def clean(s):
        s = re.sub(r"(?s)<[^>]*>", " ", s)
        for ent, ch in (("&lt;", "<"), ("&gt;", ">"), ("&quot;", '"'),
                        ("&#39;", "'"), ("&nbsp;", " "), ("&amp;", "&")):
            s = s.replace(ent, ch)
        return re.sub(r"\s+", " ", s).strip()

    out = []
    for b in re.split(pat, h):
        text = clean(b)
        if not text:
            continue
        links = sum(
            len(clean(m)) for m in re.findall(r"(?is)<a\b[^>]*>(.*?)</a\s*>", b)
        )
        toks = [t for t in text.lower().split(" ") if t]
        n_stop = sum(1 for t in toks if t in stop)
        link_pm = links * 1000 // max(len(text), 1)
        stop_pm = n_stop * 1000 // max(len(toks), 1)
        if link_pm > 330:
            label = "boilerplate"
        elif len(toks) < 5:
            label = "short"
        elif stop_pm >= 150:
            label = "good"
        else:
            label = "low_text"
        out.append({"text": text, "link_pm": link_pm,
                    "stop_pm": stop_pm, "label": label})
    return out


def test_matches_python_recomputation(spark):
    pages = [
        PAGE,
        "<p>just words here now</p>",
        '<ul><li><a href="/a">a b c d e f</a> plus the text of it</li></ul>',
        "no markup at all but it is a text that has the stopwords in it",
        "<div></div><p>&amp;&amp;&amp; x y z w v u t s</p>",
    ]
    df = spark.createDataFrame(
        [(i, p) for i, p in enumerate(pages)], "doc_id long, text string"
    )
    got = {}
    for r in content_blocks(df).collect():
        got.setdefault(r.doc_id, []).append(
            (r.block_text, r.link_permille, r.stop_permille, r.label)
        )
    for i, p in enumerate(pages):
        exp = [(b["text"], b["link_pm"], b["stop_pm"], b["label"])
               for b in _py_blocks(p)]
        assert sorted(got.get(i, [])) == sorted(exp), f"page {i}"


class TestPrepareWebCorpus:
    def test_full_chain(self, spark):
        from energy_pandas_spark.operators.pipeline import prepare_web_corpus

        pages = []
        for i in range(6):
            pages.append((
                i, "a.com",
                '<nav><a href="/">Home of the site</a></nav>'
                "<p>\t It is the case that a good result of the work "
                f"is in the text of page {i}.</p>"
                "<p>The copyright of a dot com is with the site.</p>"
                '<footer><a href="/t">Terms of it all</a></footer>',
            ))
        df = spark.createDataFrame(
            pages, "doc_id long, domain string, text string"
        )
        out = {r.doc_id: r.text for r in
               prepare_web_corpus(df, "domain").collect()}
        assert len(out) == 6
        for i, t in out.items():
            # hygiene folded the tab/NBSP head; boilerplate gone;
            # per-site copyright template stripped; prose survived
            assert t == ("It is the case that a good result of the "
                         f"work is in the text of page {i}.")

    def test_drop_empty_and_store_posture(self, spark, tmp_path):
        from energy_pandas_spark.operators.pipeline import prepare_web_corpus
        from energy_pandas_spark.streaming.templates import (
            make_template_writer,
            read_templates,
        )

        # all-boilerplate pages vanish with drop_empty
        junk = spark.createDataFrame(
            [(i, "b.net", '<nav><a href="/">Home page here</a></nav>')
             for i in range(3)],
            "doc_id long, domain string, text string",
        )
        assert prepare_web_corpus(junk, "domain").count() == 0
        # incremental posture: the store's template strips a single
        # fresh page that in-batch detection could never catch
        hist = spark.createDataFrame(
            [(i, "c.org",
              "It is the case that a good result of the work is here "
              f"in {i}.\nThe one true footer of the site is this.")
             for i in range(4)],
            "doc_id long, domain string, text string",
        )
        store = str(tmp_path / "store")
        make_template_writer(store, "domain")(hist, 0)
        # the footer sits in its OWN block: extraction collapses
        # intra-block whitespace, so post-extraction "lines" are blocks
        fresh = spark.createDataFrame(
            [(99, "c.org",
              "<p>It is the case that a good result of the work is "
              "here in 99.</p>"
              "<p>The one true footer of the site is this.</p>")],
            "doc_id long, domain string, text string",
        )
        out = prepare_web_corpus(
            fresh, "domain",
            templates=read_templates(spark, store, "domain"),
        ).collect()[0]
        assert "one true footer" not in out.text
        assert out.text.endswith("here in 99.")
