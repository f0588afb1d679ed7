"""Streaming per-site template store: per-batch partial counts,
read-time merge, replay idempotence, threshold-crossing across
batches, and the incremental strip posture."""

from __future__ import annotations

from pyspark.sql import functions as F

from energy_pandas_spark.operators.text import strip_templates, template_lines
from energy_pandas_spark.streaming.templates import (
    continuous_templates,
    make_template_writer,
    read_templates,
)


def _batch(spark, rows):
    return spark.createDataFrame(
        rows, "doc_id long, domain string, text string"
    )


def test_merge_crosses_threshold_only_across_batches(spark, tmp_path):
    path = str(tmp_path / "store")
    w = make_template_writer(path, "domain")
    # batch 0: footer in 1 of 2 a.com docs (500 permille but min_docs=2)
    w(_batch(spark, [(0, "a.com", "FOOT\nbody zero"),
                     (1, "a.com", "body one")]), 0)
    t0 = read_templates(spark, path, "domain")
    assert t0.count() == 0
    # batch 1: footer in 1 of 2 more docs -> merged 2/4 docs, 500
    # permille AND 2 docs -> template now
    w(_batch(spark, [(2, "a.com", "FOOT\nbody two"),
                     (3, "a.com", "body three")]), 1)
    t1 = {r.line: r for r in read_templates(spark, path, "domain").collect()}
    assert "foot" in t1
    assert t1["foot"].n_docs_with_line == 2
    assert t1["foot"].n_docs_group == 4
    assert t1["foot"].doc_permille == 500


def test_replay_is_idempotent(spark, tmp_path):
    path = str(tmp_path / "store")
    w = make_template_writer(path, "domain")
    b = _batch(spark, [(0, "a.com", "FOOT\nx"), (1, "a.com", "FOOT\ny")])
    w(b, 0)
    before = {
        (r.domain, r.line): (r.n_docs_with_line, r.n_docs_group)
        for r in read_templates(spark, path, "domain").collect()
    }
    w(b, 0)  # replay the SAME batch id
    after = {
        (r.domain, r.line): (r.n_docs_with_line, r.n_docs_group)
        for r in read_templates(spark, path, "domain").collect()
    }
    assert before == after == {("a.com", "foot"): (2, 2)}


def test_store_matches_batch_detector_on_union(spark, tmp_path):
    path = str(tmp_path / "store")
    w = make_template_writer(path, "domain")
    b0 = _batch(spark, [(i, "a.com", f"HEAD line\nbody {i}") for i in range(3)])
    b1 = _batch(spark, [(i, "b.net", f"other {i}") for i in range(3, 6)])
    w(b0, 0)
    w(b1, 1)
    got = {
        (r.domain, r.line, r.n_docs_with_line, r.n_docs_group, r.doc_permille)
        for r in read_templates(spark, path, "domain").collect()
    }
    union = b0.unionByName(b1)
    want = {
        (r.domain, r.line, r.n_docs_with_line, r.n_docs_group, r.doc_permille)
        for r in template_lines(union, "domain").collect()
    }
    assert got == want


def test_incremental_strip_with_store(spark, tmp_path):
    path = str(tmp_path / "store")
    w = make_template_writer(path, "domain")
    history = _batch(
        spark,
        [(i, "a.com", "(c) A Corp\nold body %d" % i) for i in range(4)],
    )
    w(history, 0)
    tmpl = read_templates(spark, path, "domain")
    # a NEW batch with ONE page: per-batch detection could never fire
    # (min_docs=2), but the store's history strips it
    fresh = _batch(spark, [(99, "a.com", "(c) A Corp\nfresh body")])
    out = strip_templates(fresh, "domain", templates=tmpl).collect()[0]
    assert out.text == "fresh body"
    assert out.n_lines_kept == 1
    # the self-detecting posture indeed keeps the template line here
    solo = strip_templates(fresh, "domain").collect()[0]
    assert "(c) A Corp" in solo.text


def test_empty_store_strips_nothing(spark, tmp_path):
    tmpl = read_templates(spark, str(tmp_path / "missing"), "domain")
    assert tmpl.count() == 0
    fresh = _batch(spark, [(1, "a.com", "line a\nline b")])
    out = strip_templates(fresh, "domain", templates=tmpl).collect()[0]
    assert out.text == "line a\nline b"


def test_streaming_end_to_end(spark, tmp_path):
    src = str(tmp_path / "src")
    _batch(
        spark,
        [(i, "a.com", "NAV BAR\ncontent %d" % i) for i in range(3)],
    ).write.mode("overwrite").parquet(src)
    stream = spark.readStream.schema(
        "doc_id long, domain string, text string"
    ).parquet(src)
    q = continuous_templates(
        stream,
        str(tmp_path / "store"),
        str(tmp_path / "ckpt"),
        "domain",
        available_now=True,
    )
    q.awaitTermination(120)
    t = {r.line for r in
         read_templates(spark, str(tmp_path / "store"), "domain").collect()}
    assert t == {"nav bar"}
