"""Full-product integration story: raw JSONL corpus in, training-ready
WebDataset shards out — every stage an engine operator, every boundary
checked. This is the flow README's quickstart describes, executed for
real:

  read_jsonl_corpus -> gopher_filter -> line_dedup (corpus-wide)
  -> dedup_exact keep-first -> dsir_score -> hash_split
  -> write_webdataset (train split) -> read_webdataset round-trip
"""

from __future__ import annotations

import json

from pyspark.sql import functions as F

HEADER = "subscribe to the newsletter of this site"
GOOD_BODY = (
    "the quick brown fox jumps over the lazy dog and that is a fine "
    "thing to have said with some more words of filler so the gopher "
    "word count rule passes for this document body easily enough "
    "because it keeps going and going with the usual test filler terms"
)


def test_jsonl_to_webdataset_pipeline(spark, tmp_path):
    from energy_pandas_spark.operators.sampling import hash_split
    from energy_pandas_spark.operators.text import (
        dsir_score,
        dsir_weights,
        gopher_filter,
        line_dedup,
    )
    from energy_pandas_spark.sources.textcorpus import read_jsonl_corpus
    from energy_pandas_spark.sources.webdataset import (
        read_webdataset,
        write_webdataset,
    )

    # --- raw corpus: 30 docs, some sharing a boilerplate header, one
    # exact dup pair, one junk doc, one malformed line -----------------
    src = tmp_path / "raw"
    src.mkdir()
    lines = []
    for i in range(28):
        body = f"{GOOD_BODY} variant {i}"
        text = f"{HEADER}\n{body}" if i % 2 == 0 else body
        lines.append(json.dumps({"text": text, "lang": "en"}))
    lines.append(json.dumps({"text": lines and f"{GOOD_BODY} variant 0", "lang": "en"}))
    lines.append(json.dumps({"text": "#### ####", "lang": "en"}))  # junk
    lines.append("{broken json")
    (src / "part0.jsonl").write_text("\n".join(lines) + "\n")

    # stable_ids: the whole chain below (line-dedup winners, exact-dedup
    # keep-first, hash_split) is keyed on doc_id, so the assertions are
    # only deterministic if ids don't depend on Spark's file-split plan
    docs = read_jsonl_corpus(spark, str(src), schema="lang STRING", stable_ids=True)
    assert docs.count() == 30  # malformed line dropped

    # --- quality gate: junk doc out ----------------------------------
    gated = gopher_filter(docs, min_words=30, min_stopword_hits=2)
    assert gated.count() == 29

    # --- corpus-wide line dedup: the header survives exactly once ----
    deduped = line_dedup(gated, drop_empty=True)
    header_carriers = deduped.filter(
        F.col("text").contains(HEADER)
    ).count()
    assert header_carriers == 1

    # --- exact dedup keep-first on the rebuilt text ------------------
    digest = F.md5(F.trim(F.regexp_replace(F.lower("text"), r"\s+", " ")))
    win = (
        deduped.withColumn("__d", digest)
        .groupBy("__d")
        .agg(F.min("doc_id").alias("doc_id"))
    )
    unique = deduped.join(win.select("doc_id"), "doc_id", "left_semi")
    # the "variant 0" body existed three times (with header, bare, and
    # the appended dup); after line-dedup + exact dedup one bare copy
    # and the header-carrying original remain
    assert unique.count() == 28

    # --- DSIR scoring attaches importance ----------------------------
    target = unique.limit(5)
    w = dsir_weights(unique, target, n_buckets=256)
    scored = dsir_score(unique, w, n_buckets=256)
    assert scored.filter(F.col("importance_q").isNull()).count() == 0

    # --- deterministic split + shard the train set -------------------
    split = hash_split(scored, key="doc_id")
    counts = {r.split: r.n for r in split.groupBy("split").agg(F.count("*").alias("n")).collect()}
    assert sum(counts.values()) == 28
    train = split.filter(F.col("split") == "train").select(
        "doc_id", "text", F.col("score").cast("string").alias("score")
    )
    out = str(tmp_path / "shards")
    manifest = write_webdataset(
        train, out, "doc_id", {"text": "txt", "score": "score.txt"}, n_shards=2
    )
    assert sum(r.n_samples for r in manifest.collect()) == train.count()

    # --- loader-side round trip --------------------------------------
    back = read_webdataset(spark, out, {"text": "txt", "score": "score.txt"})
    src_rows = {r.doc_id: r.text for r in train.collect()}
    got_rows = {r.key: r.text for r in back.collect()}
    assert got_rows == src_rows

    # multi-part extensions decode as text, and scores survive verbatim
    src_scores = {r.doc_id: r.score for r in train.collect()}
    got_scores = {r.key: r.score for r in back.collect()}
    assert got_scores == src_scores
