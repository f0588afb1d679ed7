"""Cross-document line dedup (C4-style corpus hygiene)."""

from __future__ import annotations

from pyspark.sql import Row, functions as F

from energy_pandas_spark.operators.text import line_dedup, line_dup_stats


def _docs(spark):
    return spark.createDataFrame(
        [
            # doc 0: boilerplate header + unique body
            Row(doc_id=0, text="Subscribe to our newsletter\nalpha body zero\n\nfooter common"),
            # doc 1: same header (different case/space), unique body
            Row(doc_id=1, text="subscribe  to our Newsletter\nbeta body one\nfooter common"),
            # doc 2: all lines are repeats of earlier docs
            Row(doc_id=2, text="SUBSCRIBE TO OUR NEWSLETTER\nfooter common"),
            # doc 3: unique everywhere
            Row(doc_id=3, text="wholly unique line"),
            # doc 4: null text
            Row(doc_id=4, text=None),
        ]
    )


def test_line_dedup_keeps_first_occurrence(spark):
    out = {r.doc_id: r for r in line_dedup(_docs(spark)).collect()}
    # doc 0 keeps everything (it IS the first occurrence of both dups)
    assert out[0].text == "Subscribe to our newsletter\nalpha body zero\n\nfooter common"
    assert out[0].n_lines_kept == 4
    # doc 1 loses the header and the footer, keeps its body
    assert out[1].text == "beta body one"
    assert out[1].n_lines_kept == 1
    # doc 2 loses every line
    assert out[2].text == ""
    assert out[2].n_lines_kept == 0
    # doc 3 untouched (count == 1)
    assert out[3].text == "wholly unique line"
    # null text becomes one blank line, kept as structure
    assert out[4].text == ""
    assert out[4].n_lines_kept == 1


def test_line_dedup_drop_empty(spark):
    kept = line_dedup(_docs(spark), drop_empty=True)
    assert {r.doc_id for r in kept.collect()} == {0, 1, 3}


def test_line_dedup_blank_lines_survive(spark):
    df = spark.createDataFrame(
        [Row(doc_id=0, text="a\n\nb"), Row(doc_id=1, text="a\n\nc")]
    )
    out = {r.doc_id: r.text for r in line_dedup(df).collect()}
    # the blank line occurs in both docs but is never deduped
    assert out[0] == "a\n\nb"
    assert out[1] == "\nc"


def test_line_dedup_schema_preserved(spark):
    df = _docs(spark).withColumn("lang", F.lit("en"))
    out = line_dedup(df)
    assert set(out.columns) == {"doc_id", "text", "lang", "n_lines_kept"}
    assert out.count() == 5


def test_line_dup_stats(spark):
    stats = line_dup_stats(_docs(spark)).collect()[0]
    # non-blank lines: 3 + 3 + 2 + 1 = 9; blanks: doc0's empty line + doc4
    assert stats.n_lines == 9
    assert stats.n_blank_lines == 2
    # distinct normalized: header, alpha, footer, beta, wholly = 5
    assert stats.n_distinct_lines == 5
    assert stats.n_dup_lines == 2  # header x3, footer x3
    # repeats beyond first: (3-1) + (3-1) = 4 of 9 occurrences
    assert abs(stats.dup_occurrence_frac - round(4 / 9, 6)) < 1e-9


def test_line_dedup_deterministic(spark):
    a = line_dedup(_docs(spark)).orderBy("doc_id").collect()
    b = line_dedup(_docs(spark).repartition(7)).orderBy("doc_id").collect()
    assert a == b


def test_line_dedup_in_doc(spark):
    from energy_pandas_spark.operators.text import line_dedup_in_doc

    df = spark.createDataFrame(
        [
            Row(doc_id=0, text="same\nother\nSAME \nlast\nsame"),
            Row(doc_id=1, text="same\nsame"),  # other docs unaffected
            Row(doc_id=2, text="a\n\nb\n\na"),
            Row(doc_id=3, text=None),
        ]
    )
    out = {r.doc_id: r for r in line_dedup_in_doc(df).collect()}
    assert out[0].text == "same\nother\nlast"
    assert out[0].n_lines_kept == 3
    assert out[1].text == "same"  # corpus-wide repeat NOT removed across docs
    assert out[2].text == "a\n\nb\n"  # blanks survive, repeated 'a' dropped
    assert out[3].text == "" and out[3].n_lines_kept == 1


def test_line_dedup_in_doc_map_only(spark):
    from energy_pandas_spark.operators.text import line_dedup_in_doc
    from energy_pandas_spark.plans import exchange_count

    df = spark.createDataFrame([Row(doc_id=0, text="x\ny\nx")])
    assert exchange_count(line_dedup_in_doc(df)) == 0


def test_line_dedup_incremental(spark):
    from energy_pandas_spark.operators.text import (
        line_dedup_incremental,
        line_digests,
    )

    batch0 = spark.createDataFrame(
        [Row(doc_id=0, text="header common\nalpha body")]
    )
    store = line_digests(batch0)
    batch1 = spark.createDataFrame(
        [
            Row(doc_id=10, text="header common\nbeta body\nbeta body"),
            Row(doc_id=11, text="gamma body"),
        ]
    )
    out = {r.doc_id: r for r in line_dedup_incremental(batch1, store).collect()}
    # store line rejected; in-batch repeat keeps first
    assert out[10].text == "beta body"
    assert out[10].n_lines_kept == 1
    assert out[11].text == "gamma body"
    # appending the accepted digests makes the dedup cumulative
    store2 = store.union(line_digests(line_dedup_incremental(batch1, store)))
    batch2 = spark.createDataFrame(
        [Row(doc_id=20, text="beta body\nnew line here")]
    )
    out2 = line_dedup_incremental(batch2, store2).collect()[0]
    assert out2.text == "new line here"


def test_line_dedup_incremental_bloom_identical(spark):
    from pyspark.sql import functions as F

    from energy_pandas_spark.functions.bloom import build_bloom_distributed
    from energy_pandas_spark.operators.text import (
        line_dedup_incremental,
        line_digests,
    )

    history = spark.createDataFrame(
        [Row(doc_id=i, text=f"shared header\nbody {i}") for i in range(20)]
    )
    store = line_digests(history)
    bits = build_bloom_distributed(store, "h", n_bits=1 << 16)
    batch = spark.createDataFrame(
        [
            Row(doc_id=100, text="shared header\nnovel alpha"),
            Row(doc_id=101, text="body 7\nnovel beta"),
        ]
    )
    plain = sorted(
        (r.doc_id, r.text)
        for r in line_dedup_incremental(batch, store).collect()
    )
    fast = sorted(
        (r.doc_id, r.text)
        for r in line_dedup_incremental(batch, store, store_bloom=bits).collect()
    )
    assert plain == fast
    assert dict(plain)[100] == "novel alpha"
    assert dict(plain)[101] == "novel beta"


def test_line_dedup_min_count_threshold(spark):
    df = spark.createDataFrame(
        [
            Row(doc_id=0, text="twice\nthrice"),
            Row(doc_id=1, text="twice\nthrice"),
            Row(doc_id=2, text="thrice"),
        ]
    )
    # min_count=3: the 2x line survives everywhere, the 3x line dedups
    out = {r.doc_id: r.text for r in line_dedup(df, min_count=3).collect()}
    assert out[0] == "twice\nthrice"
    assert out[1] == "twice"
    assert out[2] == ""
    # default (2) dedups both
    out2 = {r.doc_id: r.text for r in line_dedup(df).collect()}
    assert out2[1] == "" and out2[2] == ""


class TestWinnowing:
    @staticmethod
    def _py_fps(text, k=3, w=4):
        import hashlib

        toks = [t for t in (text or "").lower().split() if t]
        if len(toks) < k:
            grams = [" ".join(toks)]
        else:
            grams = [" ".join(toks[i : i + k]) for i in range(len(toks) - k + 1)]
        hs = [
            int(hashlib.md5(g.encode()).hexdigest()[:10], 16) for g in grams
        ]
        m = len(hs)
        ws = min(w, m)
        sel = set()
        for i in range(max(m - w + 1, 1)):
            win = hs[i : i + ws]
            mn = min(win)
            # rightmost minimum (robust winnowing)
            j = max(jj for jj, h in enumerate(win) if h == mn)
            sel.add((mn, i + j))
        return sel

    def test_matches_python_replay(self, spark):
        from energy_pandas_spark.operators.dedup import winnow_fingerprints

        texts = [
            (0, "a b c d e f g h i j"),
            (1, "x y a b c d e f q r"),   # shares the run 'a b c d e f'
            (2, "one two"),                # fewer tokens than k
            (3, ""),                       # empty
            (4, "z z z z z z"),            # all-equal hashes exercise ties
        ]
        df = spark.createDataFrame(texts, "doc_id long, text string")
        got = {}
        for r in winnow_fingerprints(df).collect():
            got.setdefault(r["doc_id"], set()).add((r["fp_hash"], r["pos"]))
        for i, t in texts:
            assert got.get(i, set()) == self._py_fps(t), f"doc {i}"

    def test_shared_run_guarantee(self, spark):
        # any shared run of >= w + k - 1 tokens must share a fingerprint
        from energy_pandas_spark.operators.dedup import winnow_pairs

        shared = "alpha beta gamma delta epsilon zeta"  # 6 = w + k - 1
        df = spark.createDataFrame(
            [
                (0, f"pre1 pre2 {shared} post1 post2"),
                (1, f"other words {shared} trailing stuff here"),
                (2, "completely unrelated text with no overlap at all"),
            ],
            "doc_id long, text string",
        )
        pairs = winnow_pairs(df, min_shared=1).collect()
        got = {(r["id_a"], r["id_b"]) for r in pairs}
        assert (0, 1) in got
        assert all(2 not in p for p in got)

    def test_bucket_cap_drops_degenerate_gram(self, spark):
        from energy_pandas_spark.operators.dedup import winnow_pairs

        # 30 docs all sharing one boilerplate line: with max_bucket=10
        # the degenerate bucket is dropped and no pairs emerge
        df = spark.createDataFrame(
            [(i, "the same boilerplate line here") for i in range(30)],
            "doc_id long, text string",
        )
        assert winnow_pairs(df, min_shared=1, max_bucket=10).count() == 0


class TestTemplateStripping:
    def _corpus(self, spark):
        rows = []
        for i in range(8):
            rows.append(
                (i, "a.com",
                 f"Copyright A Corp\nreal content {i} differs\nAbout | Contact")
            )
        for i in range(8, 12):
            rows.append((i, "b.net", f"unique page {i}\nmore text {i}"))
        # b.net shares one line across only 2/4 docs (50% -> at 500
        # permille threshold it IS a template with min_docs=2)
        rows[8] = (8, "b.net", "Shared Footer\nunique page 8")
        rows[9] = (9, "b.net", "Shared Footer\nunique page 9")
        return spark.createDataFrame(
            rows, "doc_id long, domain string, text string"
        )

    def test_template_lines_detection(self, spark):
        from energy_pandas_spark.operators.text import template_lines

        out = template_lines(self._corpus(spark), "domain")
        t = {(r.domain, r.line): r for r in out.collect()}
        assert ("a.com", "copyright a corp") in t
        assert ("a.com", "about | contact") in t
        assert t[("a.com", "copyright a corp")].doc_permille == 1000
        assert ("b.net", "shared footer") in t
        assert t[("b.net", "shared footer")].n_docs_with_line == 2
        # per-doc content lines never template
        assert not any(l.startswith("real content") for (_, l) in t)

    def test_min_docs_floor(self, spark):
        from energy_pandas_spark.operators.text import template_lines

        df = spark.createDataFrame(
            [(1, "tiny.io", "only page line")],
            "doc_id long, domain string, text string",
        )
        # 1/1 docs = 1000 permille but min_docs=2 blocks it
        assert template_lines(df, "domain").count() == 0

    def test_in_doc_repeat_counts_once(self, spark):
        from energy_pandas_spark.operators.text import template_lines

        df = spark.createDataFrame(
            [(1, "d", "dup line\ndup line\nx"), (2, "d", "y")],
            "doc_id long, domain string, text string",
        )
        # 'dup line' is in 1 of 2 docs = 500 permille, but min_docs=2
        # needs two DOCS, not two occurrences
        out = template_lines(df, "domain").collect()
        assert out == []

    def test_strip_rebuilds_content(self, spark):
        from energy_pandas_spark.operators.text import strip_templates

        out = strip_templates(self._corpus(spark), "domain")
        rows = {r.doc_id: r for r in out.collect()}
        assert rows[0].text == "real content 0 differs"
        assert rows[0].n_lines_kept == 1
        # b.net: footer stripped from both carriers, content kept
        assert rows[8].text == "unique page 8"
        assert rows[10].text == "unique page 10\nmore text 10"
        # group isolation: a.com's template never leaks into b.net
        assert "Copyright" not in rows[8].text

    def test_strip_normalized_matching_keeps_original_lines(self, spark):
        from energy_pandas_spark.operators.text import strip_templates

        # template match is on the NORMALIZED form; surviving lines
        # keep their original casing/spacing
        df = spark.createDataFrame(
            [(1, "d", "FOOTER  TEXT\nKeep Me"),
             (2, "d", "footer text\nother stuff")],
            "doc_id long, domain string, text string",
        )
        rows = {r.doc_id: r.text for r in strip_templates(df, "domain").collect()}
        assert rows[1] == "Keep Me"
        assert rows[2] == "other stuff"

    def test_blank_lines_survive_and_empty_doc(self, spark):
        from energy_pandas_spark.operators.text import strip_templates

        df = spark.createDataFrame(
            [(1, "d", "tmpl\n\ntmpl"), (2, "d", "tmpl\nreal")],
            "doc_id long, domain string, text string",
        )
        rows = {r.doc_id: r for r in strip_templates(df, "domain").collect()}
        assert rows[1].text == ""  # blank joined alone
        assert rows[2].text == "real"
        out = strip_templates(df, "domain", drop_empty=True)
        assert {r.doc_id for r in out.collect()} == {2}

    def test_validation(self, spark):
        from energy_pandas_spark.operators.text import (
            strip_templates,
            template_lines,
        )
        import pytest as _pt

        df = self._corpus(spark)
        with _pt.raises(ValueError):
            template_lines(df, "domain", min_doc_permille=1001)
        with _pt.raises(ValueError):
            strip_templates(df, "domain", min_docs=0)


class TestLshPlan:
    def test_high_threshold_is_cheap(self):
        from energy_pandas_spark.operators.dedup import lsh_plan

        p = lsh_plan(0.9, max_miss=1e-4)
        assert p["miss_at_threshold"] <= 1e-4
        assert p["num_hashes"] == p["bands"] * p["rows"]
        assert p["num_hashes"] <= 64  # j=0.9 needs few hashes

    def test_low_threshold_needs_more_and_flags_the_old_mistake(self):
        from energy_pandas_spark.operators.dedup import lsh_plan

        p = lsh_plan(0.5, max_miss=1e-4)
        assert p["miss_at_threshold"] <= 1e-4
        # the round-2 advisory case: 16x4 misses 36% at j=0.5
        assert (1 - 0.5**4) ** 16 > 0.35
        # a sound plan at 0.5 costs more than the j=0.9 plan
        assert p["num_hashes"] > lsh_plan(0.9, max_miss=1e-4)["num_hashes"]

    def test_min_rows_bars_degenerate_single_hash_buckets(self):
        from energy_pandas_spark.operators.dedup import lsh_plan

        p = lsh_plan(0.5, max_miss=1e-4)
        assert p["rows"] >= 2

    def test_fp_constraint_honest_failure(self):
        import pytest as _pt

        from energy_pandas_spark.operators.dedup import lsh_plan

        # a sharp S-curve at j=0.5 (tight fp at 0.25) needs thousands
        # of hashes: the planner must refuse, not silently degrade
        with _pt.raises(ValueError):
            lsh_plan(0.5, max_miss=1e-4, fp_at=0.25, max_fp=0.05,
                     max_hashes=512)
        # but a loose fp cap is satisfiable
        p = lsh_plan(0.8, max_miss=1e-3, fp_at=0.3, max_fp=0.2)
        assert 1 - (1 - 0.3 ** p["rows"]) ** p["bands"] <= 0.2

    def test_matches_brute_force_optimum(self):
        from energy_pandas_spark.operators.dedup import lsh_plan

        for thr, miss in ((0.9, 1e-4), (0.7, 1e-3), (0.5, 1e-4)):
            p = lsh_plan(thr, max_miss=miss)
            # no cheaper feasible total exists
            for total in range(2, p["num_hashes"]):
                for rows in range(2, total + 1):
                    if total % rows:
                        continue
                    assert (1 - thr**rows) ** (total // rows) > miss, (
                        thr, total, rows)

    def test_validation(self):
        import pytest as _pt

        from energy_pandas_spark.operators.dedup import lsh_plan

        with _pt.raises(ValueError):
            lsh_plan(1.0)
        with _pt.raises(ValueError):
            lsh_plan(0.5, fp_at=0.25)  # max_fp missing
        with _pt.raises(ValueError):
            lsh_plan(0.5, fp_at=0.6, max_fp=0.1)  # fp_at >= threshold
