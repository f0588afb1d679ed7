"""Streaming decontamination: stateless per-batch scoring against a
fixed benchmark set, equal to the batch operator on the same data."""

from __future__ import annotations

from pyspark.sql import functions as F

from energy_pandas_spark.streaming.decontaminate import decontaminate_stream


def test_matches_batch_operator(spark, sf_dir):
    from energy_pandas_spark.operators.text import contamination_overlap
    from energy_pandas_spark.sources.readers import load_table

    docs = load_table(spark, sf_dir, "documents")
    bench = docs.filter(F.col("doc_id") % 10 == 0).select(
        (F.col("doc_id") + 100000).alias("doc_id"), "text"
    )
    train = docs.filter(F.col("doc_id") % 10 != 0)

    batch = {
        r.doc_id: (r.n_grams, r.n_hits, r.overlap, r.contaminated)
        for r in contamination_overlap(train, bench, n=3).collect()
    }
    stream_style = {
        r.doc_id: (r.n_grams, r.n_hits, r.overlap, r.contaminated)
        for r in decontaminate_stream(train, bench, n=3)
        .select("doc_id", "n_grams", "n_hits", "overlap", "contaminated")
        .collect()
    }
    assert stream_style == batch


def test_streaming_end_to_end(spark, tmp_path):
    """Real writeStream path: availableNow file source -> stateless
    scoring -> append sink; contaminated rows filter out."""
    bench = spark.createDataFrame(
        [(100, "alpha beta gamma delta epsilon zeta")],
        "doc_id long, text string",
    )
    src = str(tmp_path / "src")
    spark.createDataFrame(
        [
            (0, "alpha beta gamma delta epsilon zeta"),   # contaminated
            (1, "totally unrelated words in this doc"),
            (2, "alpha beta gamma then something else entirely here"),
        ],
        "doc_id long, text string",
    ).write.mode("overwrite").parquet(src)

    stream = spark.readStream.schema("doc_id long, text string").parquet(src)
    scored = decontaminate_stream(stream, bench, n=3, threshold=0.5)
    kept = scored.filter(~F.col("contaminated"))
    out = str(tmp_path / "clean")
    q = (
        kept.writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {r.doc_id: r.overlap for r in spark.read.parquet(out).collect()}
    assert set(got) == {1, 2}
    assert got[1] == 0.0 and 0.0 < got[2] < 0.5
