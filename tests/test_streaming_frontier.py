"""Streaming crawl-frontier maintenance (streaming/frontier.py)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from energy_pandas_spark.streaming.frontier import (
    make_frontier_ingest_writer,
    read_frontier,
)


@pytest.fixture()
def writer_and_paths(tmp_path):
    frontier = str(tmp_path / "frontier")
    seen = str(tmp_path / "seen")
    return make_frontier_ingest_writer(frontier, seen), frontier, seen


def _pages(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, url string, text string")


def test_frontier_discovers_and_counts_links(spark, writer_and_paths):
    w, frontier, seen = writer_and_paths
    b0 = _pages(
        spark,
        [
            (1, "https://a.io/1",
             '<a href="https://b.io/x">l</a><a href="/local">r</a>'),
            # tracking-tagged link to the SAME target as doc 1's
            (2, "https://a.io/2", '<a href="https://b.io/x?utm_source=f">l</a>'),
            # link back to a page fetched in this very batch: satisfied
            (3, "https://a.io/3", '<a href="https://a.io/1">back</a>'),
        ],
    )
    w(b0, 0)
    got = {r.url: r.n_refs for r in read_frontier(spark, frontier).collect()}
    # b.io/x referenced twice (canonicalization merged the utm copy);
    # /local resolved against its page; the in-batch page NOT enqueued
    assert got == {"https://b.io/x": 2, "https://a.io/local": 1}


def test_frontier_never_reemits_across_batches(spark, writer_and_paths):
    w, frontier, seen = writer_and_paths
    w(_pages(spark, [(1, "https://a.io/1", '<a href="https://b.io/x">l</a>')]), 0)
    # batch 1: b.io/x linked AGAIN, plus one genuinely new target;
    # also the frontier entry b.io/x is now fetched as a page
    w(
        _pages(
            spark,
            [(2, "https://b.io/x",
              '<a href="https://b.io/x">self</a><a href="https://c.io/new">n</a>')],
        ),
        1,
    )
    got = {(r.url, r.n_refs) for r in read_frontier(spark, frontier).collect()}
    assert got == {("https://b.io/x", 1), ("https://c.io/new", 1)}
    # batch 2: everything seen already -> frontier gains nothing
    w(_pages(spark, [(3, "https://c.io/new", '<a href="https://a.io/1">l</a>')]), 2)
    after = {(r.url, r.n_refs) for r in read_frontier(spark, frontier).collect()}
    assert after == got


def test_frontier_replay_idempotent(spark, writer_and_paths):
    w, frontier, seen = writer_and_paths
    b0 = _pages(spark, [(1, "https://a.io/1", '<a href="https://b.io/x">l</a>')])
    b1 = _pages(
        spark,
        [(2, "https://b.io/x", '<a href="https://c.io/y">l</a>')],
    )
    w(b0, 0)
    w(b1, 1)
    before_f = sorted(map(tuple, read_frontier(spark, frontier).collect()))
    before_s = sorted(r.h for r in spark.read.parquet(seen).collect())
    w(b1, 1)  # replay
    assert sorted(map(tuple, read_frontier(spark, frontier).collect())) == before_f
    store = spark.read.parquet(seen)
    assert sorted(r.h for r in store.collect()) == before_s
    # no duplicate hashes across batch partitions
    assert store.count() == store.select("h").distinct().count()


def test_frontier_store_does_not_regrow_on_refetch(spark, writer_and_paths):
    w, frontier, seen = writer_and_paths
    w(_pages(spark, [(1, "https://a.io/1", '<a href="https://b.io/x">l</a>')]), 0)
    n0 = spark.read.parquet(seen).count()
    # fetching the frontier entry adds NO new hash (it was stored at
    # emission time) and its links are all old
    w(_pages(spark, [(2, "https://b.io/x", '<a href="https://a.io/1">l</a>')]), 1)
    assert spark.read.parquet(seen).count() == n0


def test_frontier_link_filter_scopes_discovery(spark, tmp_path):
    frontier = str(tmp_path / "f")
    seen = str(tmp_path / "s")
    w = make_frontier_ingest_writer(
        frontier,
        seen,
        link_filter=lambda links: links.filter(
            F.col("url").rlike(r"^https://[a-z.]*a\.io/")
        ),
    )
    w(
        _pages(
            spark,
            [(1, "https://a.io/1",
              '<a href="https://a.io/in">i</a><a href="https://evil.io/out">o</a>')],
        ),
        0,
    )
    got = {r.url for r in read_frontier(spark, frontier).collect()}
    assert got == {"https://a.io/in"}
    # out-of-scope link left NO store entry: widening scope later
    # re-discovers it
    w2 = make_frontier_ingest_writer(frontier, seen)
    w2(_pages(spark, [(2, "https://a.io/2", '<a href="https://evil.io/out">o</a>')]), 1)
    got = {r.url for r in read_frontier(spark, frontier).collect()}
    assert got == {"https://a.io/in", "https://evil.io/out"}


def test_frontier_streaming_end_to_end(spark, tmp_path):
    from energy_pandas_spark.streaming.frontier import frontier_ingest

    src = str(tmp_path / "src")
    _pages(
        spark,
        [
            (1, "https://a.io/1", '<a href="https://b.io/x">l</a>'),
            (2, "https://a.io/2", '<a href="https://b.io/x">l</a>'),
        ],
    ).write.mode("overwrite").parquet(src)
    stream = spark.readStream.schema("doc_id long, url string, text string").parquet(
        src
    )
    q = frontier_ingest(
        stream, str(tmp_path / "f"), str(tmp_path / "s"), str(tmp_path / "ckpt")
    )
    assert q.awaitTermination(300)
    got = {(r.url, r.n_refs) for r in read_frontier(spark, str(tmp_path / "f")).collect()}
    assert got == {("https://b.io/x", 2)}


def test_frontier_with_robots_gate(spark, tmp_path):
    """The politeness composition: a robots-gated frontier drops
    disallowed targets WITHOUT storing them, so a later policy change
    re-discovers them."""
    from energy_pandas_spark.operators.robots import (
        parse_robots,
        robots_link_filter,
    )
    from energy_pandas_spark.streaming.frontier import (
        make_frontier_ingest_writer,
        read_frontier,
    )

    robots = spark.createDataFrame(
        [("b.io", "User-agent: *\nDisallow: /private/\n")],
        "domain string, text string",
    )
    rules = parse_robots(robots)
    frontier = str(tmp_path / "frontier")
    seen = str(tmp_path / "seen")
    gated_writer = make_frontier_ingest_writer(
        frontier, seen, link_filter=robots_link_filter(F.broadcast(rules))
    )
    b0 = _pages(
        spark,
        [
            (1, "https://a.io/1",
             '<a href="https://b.io/ok">x</a>'
             '<a href="https://b.io/private/secret">y</a>'),
        ],
    )
    gated_writer(b0, 0)
    got = {r.url for r in read_frontier(spark, frontier).collect()}
    assert got == {"https://b.io/ok"}

    # policy relaxed: a writer with no gate sees the same link again
    # (the disallowed target left no seen-store entry) and enqueues it
    open_writer = make_frontier_ingest_writer(frontier, seen)
    b1 = _pages(
        spark,
        [
            (2, "https://a.io/2",
             '<a href="https://b.io/private/secret">y</a>'),
        ],
    )
    open_writer(b1, 1)
    after = {r.url for r in read_frontier(spark, frontier).collect()}
    assert after == {"https://b.io/ok", "https://b.io/private/secret"}


def test_read_frontier_subtracts_fetch_log(spark, writer_and_paths):
    """Frontier rows persist after fetch (the seen store only blocks
    re-EMISSION); passing the crawler's fetch log anti-joins fetched
    URLs out so a self-driving crawler never re-enqueues them."""
    w, frontier, seen = writer_and_paths
    w(
        _pages(
            spark,
            [(1, "https://a.io/1",
              '<a href="https://b.io/x">l</a><a href="https://b.io/y">r</a>')],
        ),
        0,
    )
    fetched = spark.createDataFrame(
        # tracking-tagged variant: canonicalization must still match
        [("https://b.io/x?utm_source=f",)], "url string"
    )
    left = {
        r.url
        for r in read_frontier(spark, frontier, fetched=fetched).collect()
    }
    assert left == {"https://b.io/y"}
    # without the fetch log both rows remain (documented behavior)
    assert {
        r.url for r in read_frontier(spark, frontier).collect()
    } == {"https://b.io/x", "https://b.io/y"}
