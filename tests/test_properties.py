"""Property-based tests (hypothesis): invariants that must hold for
ANY input, not just the fixtures — packing conservation, split
totality/determinism, quantization error bounds, unit round-trips.

Example counts are deliberately small: each example is a Spark job.
"""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

_SETTINGS = dict(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


@given(
    toks=st.lists(st.integers(min_value=0, max_value=500), min_size=1, max_size=60),
    budget=st.integers(min_value=8, max_value=256),
)
@settings(**_SETTINGS)
def test_pack_sequences_invariants(spark, toks, budget):
    from energy_pandas_spark.operators.packing import pack_sequences

    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(toks)], "doc_id long, n_tokens long"
    )
    rows = sorted(
        pack_sequences(df, "n_tokens", budget=budget, n_buckets=3).collect(),
        key=lambda r: (r.pack_bucket, r.doc_id),
    )
    by_bucket: dict[int, list] = {}
    for r in rows:
        by_bucket.setdefault(r.pack_bucket, []).append(r)
    for bucket_rows in by_bucket.values():
        cum = 0
        for r in bucket_rows:
            # the assigned slot is exactly the running-token position
            assert r.seq_id == cum // budget
            assert r.seq_offset == cum % budget
            span = (cum + max(r.n_tokens, 1) - 1) // budget - cum // budget + 1
            assert r.n_seqs == span >= 1
            cum += r.n_tokens


@given(
    keys=st.lists(st.integers(min_value=0, max_value=10**9), min_size=1,
                  max_size=80, unique=True)
)
@settings(**_SETTINGS)
def test_hash_split_total_and_deterministic(spark, keys):
    from energy_pandas_spark.operators.sampling import hash_split

    df = spark.createDataFrame([(k,) for k in keys], "k long")
    out = hash_split(df, "k", {"train": 0.8, "val": 0.1, "test": 0.1})
    rows = out.collect()
    # total: every row lands in exactly one named split
    assert len(rows) == len(keys)
    assert {r.split for r in rows} <= {"train", "val", "test"}
    # deterministic: a rerun assigns identically
    again = {r.k: r.split for r in
             hash_split(df, "k", {"train": 0.8, "val": 0.1, "test": 0.1}).collect()}
    for r in rows:
        assert again[r.k] == r.split


@given(
    vec=st.lists(
        st.floats(min_value=-1e6, max_value=1e6, allow_nan=False,
                  allow_infinity=False, width=32),
        min_size=1, max_size=32,
    )
)
@settings(**_SETTINGS)
def test_quantize_error_bound(spark, vec):
    from energy_pandas_spark.functions.vectors import dequantize_int8, quantize_int8

    df = spark.createDataFrame([(vec,)], "v array<double>")
    row = df.select(
        "v", quantize_int8("v").alias("qs")
    ).withColumn("r", dequantize_int8("qs")).first()
    scale = row.qs.scale
    assert all(-127 <= q <= 127 for q in row.qs.q)
    for orig, rec in zip(row.v, row.r):
        assert abs(orig - rec) <= scale / 2 + 1e-9 * max(abs(orig), 1.0)


@given(
    vals=st.lists(
        st.floats(min_value=-1e4, max_value=1e4, allow_nan=False,
                  allow_infinity=False),
        min_size=1, max_size=30,
    )
)
@settings(**_SETTINGS)
def test_unit_conversion_roundtrip(spark, vals):
    from energy_pandas_spark import EnergyFrame

    df = spark.createDataFrame([(float(v),) for v in vals], "value double")
    ef = EnergyFrame(df, units={"value": "degC"})
    back = ef.to_units("kelvin").to_units("degC")
    got = [r.value for r in back.spark_df.collect()]
    assert back.units["value"].dimensionless is False
    for a, b in zip(sorted(vals), sorted(got)):
        assert abs(a - b) <= 1e-9 * max(abs(a), 1.0) + 1e-9


@given(
    pts=st.lists(
        st.tuples(
            st.floats(min_value=-50, max_value=50, allow_nan=False),
            st.floats(min_value=-50, max_value=50, allow_nan=False),
        ),
        min_size=3,
        max_size=30,
    ),
    dx=st.floats(min_value=-10, max_value=10, allow_nan=False),
)
@settings(**_SETTINGS)
def test_linear_fit_translation_invariance(spark, pts, dx):
    """Slope and r2 are invariant under x-translation; r2 stays in
    [0, 1] whenever defined. Constrained to well-conditioned inputs:
    the closed form is documented cancellation-prone when the x-spread
    is tiny relative to the shift (callers must center/rescale x)."""
    from statistics import pvariance

    from hypothesis import assume

    from energy_pandas_spark.operators.analytics import linear_fit

    assume(pvariance([x for x, _ in pts]) > 1e-3)
    df = spark.createDataFrame(
        [(float(x), float(y)) for x, y in pts], "x double, y double"
    )
    base = linear_fit(df, "x", "y").first()
    shifted = linear_fit(
        df.withColumn("x", F.col("x") + F.lit(dx)), "x", "y"
    ).first()
    if base["slope"] is not None and shifted["slope"] is not None:
        assert abs(base["slope"] - shifted["slope"]) < 1e-6 * (
            1 + abs(base["slope"])
        )
    if base["r2"] is not None:
        assert -1e-9 <= base["r2"] <= 1 + 1e-9


@given(
    texts=st.lists(
        st.text(
            alphabet="ab cdefg",
            max_size=40,
        ),
        min_size=1,
        max_size=8,
    )
)
@settings(**_SETTINGS)
def test_classifier_score_bounds_and_determinism(spark, texts):
    """Scores are means of [-1,1] weights (plus bias 0) and depend only
    on content — duplicate texts always get identical scores."""
    from energy_pandas_spark.operators.text import classifier_score

    rows = [(i, t) for i, t in enumerate(texts + texts)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = classifier_score(df).collect()
    n = len(texts)
    by_id = {r["doc_id"]: r["score"] for r in got}
    for i in range(n):
        assert by_id[i] == by_id[i + n]
        assert -1.0 <= by_id[i] <= 1.0


@given(
    vals=st.lists(
        st.floats(min_value=-1e6, max_value=1e6, allow_nan=False),
        min_size=1,
        max_size=40,
    )
)
@settings(**_SETTINGS)
def test_robust_scale_median_maps_to_zero(spark, vals):
    from energy_pandas_spark.operators.analytics import robust_scale

    df = spark.createDataFrame(
        [(i, float(v)) for i, v in enumerate(vals)], "id long, value double"
    )
    out = robust_scale(df).collect()
    scaled = sorted(r["value"] for r in out)
    # median of the scaled values is ~0 (exactly 0 for odd n), and the
    # transform is monotone
    n = len(scaled)
    if n % 2 == 1:
        assert abs(scaled[n // 2]) < 1e-9


@given(
    toks=st.lists(
        st.integers(min_value=1, max_value=40), min_size=1, max_size=40
    ),
    quals=st.lists(
        st.floats(min_value=0.0, max_value=1.0, allow_nan=False),
        min_size=1, max_size=40,
    ),
    budget=st.integers(min_value=0, max_value=2000),
)
@settings(**_SETTINGS)
def test_select_token_budget_monotone_nested(spark, toks, quals, budget):
    """Budget selections NEST: everything kept at budget B is kept at
    any budget B' >= B (reruns with a raised budget only add docs), and
    the kept token total never exceeds the budget by more than one
    boundary-bucket slice."""
    from energy_pandas_spark.operators.sampling import select_token_budget

    n = min(len(toks), len(quals))
    df = spark.createDataFrame(
        [(i, float(quals[i]), int(toks[i])) for i in range(n)],
        "doc_id long, quality double, tok int",
    )
    small = {
        r.doc_id
        for r in select_token_budget(df, budget, "quality", "tok", key="doc_id").collect()
    }
    big = {
        r.doc_id
        for r in select_token_budget(
            df, budget + 57, "quality", "tok", key="doc_id"
        ).collect()
    }
    assert small <= big
    kept_tokens = sum(toks[i] for i in small)
    assert kept_tokens <= budget + max(toks[:n])


@given(
    words=st.lists(
        st.text(alphabet="abcdefg", min_size=1, max_size=4),
        min_size=0, max_size=60,
    ),
    target=st.integers(min_value=1, max_value=12),
)
@settings(**_SETTINGS)
def test_chunk_documents_partition_property(spark, words, target):
    """Chunks PARTITION the token stream: concatenation reconstructs
    the document, counts add up, indices are dense from 0."""
    from energy_pandas_spark.operators.text import chunk_documents

    text = " ".join(words)
    df = spark.createDataFrame([(0, text)], "doc_id long, text string")
    rows = sorted(
        chunk_documents(df, target_tokens=target).collect(),
        key=lambda r: r.chunk_idx,
    )
    if not words:
        assert rows == []
        return
    assert [r.chunk_idx for r in rows] == list(range(len(rows)))
    assert " ".join(r.chunk_text for r in rows) == text
    assert sum(r.n_tokens for r in rows) == len(words)
    assert all(r.n_tokens >= 1 for r in rows)


@given(
    words=st.lists(
        st.text(alphabet="abcdefgh ", min_size=0, max_size=6),
        min_size=0, max_size=30,
    ),
    dim=st.sampled_from([4, 16, 64]),
)
@settings(**_SETTINGS)
def test_hashed_embedding_unit_norm_or_zero(spark, words, dim):
    """For ANY text: the vector has exactly `dim` components and is
    unit-norm (to rounding) or exactly zero; identical texts map to
    identical vectors."""
    import numpy as np

    text = " ".join(words)
    from energy_pandas_spark.operators.text import hashed_embedding

    df = spark.createDataFrame(
        [(0, text), (1, text)], "doc_id long, text string"
    )
    out = {r.doc_id: r.embedding for r in hashed_embedding(df, dim=dim).collect()}
    v0, v1 = np.array(out[0]), np.array(out[1])
    assert len(v0) == dim and np.array_equal(v0, v1)
    nrm = np.linalg.norm(v0)
    assert nrm == 0.0 or abs(nrm - 1.0) < 1e-4
    # the distributed explode+aggregate path (id_col=) must be
    # bit-identical to the map-only fold — same hashes, same integer
    # ±1 sums, same norm division (the r6 scale path)
    agg = {
        r.doc_id: r.embedding
        for r in hashed_embedding(df, dim=dim, id_col="doc_id").collect()
    }
    assert agg == out


_LINE_ALPHABET = ["dup one", "dup two", "alpha", "beta", "gamma", ""]


@given(
    docs=st.lists(
        st.lists(st.sampled_from(_LINE_ALPHABET), min_size=0, max_size=6),
        min_size=1,
        max_size=8,
    )
)
@settings(**_SETTINGS)
def test_line_dedup_invariants(spark, docs):
    from energy_pandas_spark.operators.text import line_dedup

    df = spark.createDataFrame(
        [(i, "\n".join(lines)) for i, lines in enumerate(docs)],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in line_dedup(df).collect()}
    # invariant 1: every non-blank line survives exactly once corpus-wide,
    # at its first (doc, idx) occurrence; blanks survive everywhere
    first_seen: set[str] = set()
    for i, lines in enumerate(docs):
        expect = []
        for ln in ("\n".join(lines)).split("\n"):
            if ln.strip() == "":
                expect.append(ln)
            elif ln not in first_seen:
                first_seen.add(ln)
                expect.append(ln)
        assert out[i].text == "\n".join(expect), (i, docs)
        assert out[i].n_lines_kept == len(expect)
    # invariant 2: idempotence — a deduped corpus has nothing left to drop
    once = line_dedup(df).select("doc_id", "text")
    twice = line_dedup(once).select("doc_id", "text")
    assert sorted(map(tuple, once.collect())) == sorted(map(tuple, twice.collect()))


@given(
    words=st.lists(
        st.text(alphabet="abcd", min_size=1, max_size=5), min_size=1, max_size=30
    ),
    n_merges=st.integers(min_value=0, max_value=6),
)
@settings(**_SETTINGS)
def test_bpe_invariants(spark, words, n_merges):
    from energy_pandas_spark.operators.bpe import (
        END_OF_WORD,
        bpe_encode,
        train_bpe,
    )

    text = " ".join(words)
    df = spark.createDataFrame([(0, text)], "doc_id long, text string")
    merges = train_bpe(df, n_merges)
    mrows = merges.orderBy("rank").collect()
    # counts are non-increasing in rank (greedy argmax)
    counts = [r.pair_count for r in mrows]
    assert counts == sorted(counts, reverse=True)
    enc = bpe_encode(df, merges).collect()[0]
    # lossless: concatenation reconstructs the words
    rebuilt = "".join(enc.bpe_tokens).replace(END_OF_WORD, " ").split()
    assert rebuilt == text.lower().split()
    # compression: token count never exceeds chars + one marker per word
    assert enc.n_bpe_tokens <= sum(len(w) for w in words) + len(words)


_GOPHER_WORDS = ["the", "fox", "##", "a1", "…", "supercal", "-x", "..."]


@given(
    docs=st.lists(
        st.lists(st.sampled_from(_GOPHER_WORDS), min_size=0, max_size=20),
        min_size=1,
        max_size=5,
    )
)
@settings(**_SETTINGS)
def test_gopher_counts_match_python(spark, docs):
    import re as _re

    from energy_pandas_spark.operators.text import gopher_rules

    df = spark.createDataFrame(
        [(i, " ".join(ws)) for i, ws in enumerate(docs)],
        "doc_id long, text string",
    )
    got = {r.doc_id: r for r in gopher_rules(df).collect()}
    for i, ws in enumerate(docs):
        text = " ".join(ws)
        toks = [w for w in text.lower().split(" ") if w]
        r = got[i]
        assert r.n_words == len(toks)
        assert r.n_alpha_words == sum(
            1 for w in toks if _re.search(r"[^\W\d_]", w, _re.UNICODE)
        )
        symbols = (
            text.count("#")
            + text.count("…")
            + (len(text) - len(text.replace("...", ""))) // 3
        )
        assert r.n_symbol_chars == symbols
        stop = {"the", "be", "to", "of", "and", "that", "have", "with"}
        assert r.n_stopword_hits == len(set(toks) & stop)


@given(
    n=st.integers(min_value=1, max_value=25),
    n_shards=st.integers(min_value=1, max_value=4),
    payload=st.binary(min_size=0, max_size=40),
)
@settings(**_SETTINGS)
def test_webdataset_roundtrip_property(spark, tmp_path_factory, n, n_shards, payload):
    import tarfile

    from energy_pandas_spark.sources.webdataset import (
        read_webdataset,
        write_webdataset,
    )

    tmp = tmp_path_factory.mktemp("wds_prop")
    df = spark.createDataFrame(
        [(i, f"text {i}", bytes(payload) + bytes([i])) for i in range(n)],
        "doc_id long, text string, blob binary",
    )
    out = str(tmp / "w")
    manifest = write_webdataset(
        df, out, "doc_id", {"text": "txt", "blob": "bin"}, n_shards=n_shards
    )
    assert sum(r.n_samples for r in manifest.collect()) == n
    back = {r.key: r for r in read_webdataset(
        spark, out, {"text": "txt", "blob": "bin"}).collect()}
    assert len(back) == n
    for i in range(n):
        assert back[i].text == f"text {i}"
        assert bytes(back[i].blob) == bytes(payload) + bytes([i])


@given(
    old_texts=st.lists(
        st.text(alphabet="ab \n", min_size=0, max_size=12), min_size=0, max_size=10
    ),
    new_texts=st.lists(
        st.text(alphabet="ab \n", min_size=0, max_size=12), min_size=0, max_size=10
    ),
)
@settings(**_SETTINGS)
def test_corpus_diff_matches_python(spark, old_texts, new_texts):
    """corpus_diff == a dict-based recomputation with the same
    normalization, on arbitrary (possibly overlapping) id spaces."""
    import re

    from energy_pandas_spark.operators.pipeline import corpus_diff

    old = [(i, t) for i, t in enumerate(old_texts)]
    new = [(i + len(old_texts) // 2, t) for i, t in enumerate(new_texts)]
    schema = "doc_id long, text string"
    got = {
        r.doc_id: r.status
        for r in corpus_diff(
            spark.createDataFrame(old, schema), spark.createDataFrame(new, schema)
        ).collect()
    }

    def norm(t):
        return re.sub(r"\s+", " ", (t or "").lower()).strip()

    od, nd = dict(old), dict(new)
    expect = {}
    for i in set(od) | set(nd):
        if i not in od:
            expect[i] = "added"
        elif i not in nd:
            expect[i] = "removed"
        elif norm(od[i]) == norm(nd[i]):
            expect[i] = "unchanged"
        else:
            expect[i] = "changed"
    assert got == expect


@given(
    texts=st.lists(
        st.text(alphabet="abc xyz", min_size=0, max_size=30), min_size=1, max_size=8
    ),
    size=st.integers(min_value=1, max_value=6),
    overlap=st.integers(min_value=0, max_value=5),
)
@settings(**_SETTINGS)
def test_chunk_fixed_matches_python(spark, texts, size, overlap):
    """chunk_fixed == a pure-Python sliding window for ANY size/overlap
    combination (overlap clamped below size)."""
    from energy_pandas_spark.operators.text import chunk_fixed

    overlap = min(overlap, size - 1)
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    got = sorted(
        (r.doc_id, r.chunk_idx, r.chunk_text, r.n_chunk_tokens)
        for r in chunk_fixed(df, size=size, overlap=overlap).collect()
    )
    step = size - overlap
    expect = []
    for i, t in enumerate(texts):
        toks = [w for w in t.lower().split() if w]
        for ci, s in enumerate(range(0, len(toks), step)):
            window = toks[s : s + size]
            expect.append((i, ci, " ".join(window), len(window)))
    assert got == sorted(expect)


@given(
    docs=st.lists(
        st.lists(st.sampled_from("abc"), min_size=0, max_size=14).map(" ".join),
        min_size=1,
        max_size=6,
    ),
    k=st.integers(min_value=2, max_value=4),
)
@settings(**_SETTINGS)
def test_exact_substring_dedup_matches_python(spark, docs, k):
    """The scrub == a pure-Python recomputation of the same semantics
    (global-first winner per span content, later occurrences' k
    positions cut) on tiny-alphabet corpora that force heavy span
    collisions and overlaps."""
    from energy_pandas_spark.operators.text import exact_substring_dedup

    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(docs)], "doc_id long, text string"
    )
    got = {
        r.doc_id: (r.text, r.n_tokens_before, r.n_tokens_removed)
        for r in exact_substring_dedup(df, k=k).collect()
    }

    toks = {i: [w for w in t.lower().split() if w] for i, t in enumerate(docs)}
    occ: dict[tuple, list] = {}
    for i, tt in toks.items():
        for p in range(len(tt) - k + 1):
            occ.setdefault(tuple(tt[p : p + k]), []).append((i, p))
    covered: dict[int, set] = {i: set() for i in toks}
    for span, places in occ.items():
        if len(places) < 2:
            continue
        for (i, p) in sorted(places)[1:]:
            covered[i].update(range(p, p + k))
    for i, tt in toks.items():
        keep = [w for j, w in enumerate(tt) if j not in covered[i]]
        assert got[i] == (" ".join(keep), len(tt), len(tt) - len(keep))


@given(
    recs=st.lists(
        st.tuples(
            st.integers(0, 10**9),
            st.text(
                alphabet=st.characters(
                    blacklist_categories=("Cs",), blacklist_characters="\r"
                ),
                max_size=200,
            ),
        ),
        max_size=8,
    )
)
@settings(max_examples=40, deadline=None)
def test_warc_roundtrip_any_payload(recs):
    """encode -> parse recovers every record exactly for ANY payload
    text (including embedded newlines and record-marker lookalikes) —
    Content-Length framing, not delimiter scanning."""
    from energy_pandas_spark.sources.wet import encode_warc, iter_warc_records

    rows = [
        (f"<urn:uuid:{i}>", f"http://x/{i}", "2024-01-01T00:00:00Z", t)
        for i, t in recs
    ]
    got = list(iter_warc_records(encode_warc(rows)))
    assert len(got) == len(rows)
    for (rid, url, _, text), (h, payload) in zip(rows, got):
        assert h["warc-record-id"] == rid
        assert payload.decode("utf-8") == text


@given(
    words=st.lists(
        st.text(alphabet="abcd", min_size=1, max_size=12), min_size=1,
        max_size=15,
    ),
    pieces=st.dictionaries(
        st.text(alphabet="abcd", min_size=1, max_size=4),
        st.integers(-(10**7), -1),
        min_size=1,
        max_size=20,
    ),
)
@settings(max_examples=60, deadline=None)
def test_viterbi_lossless_and_deterministic(words, pieces):
    """Viterbi segmentation always reconstructs the word exactly and
    is a pure function of (word, scores) — for arbitrary score tables
    that may not even cover the alphabet (OOV single chars fall back)."""
    from energy_pandas_spark.operators.unigram import _viterbi

    for w in words:
        a = _viterbi(w, pieces, 4)
        b = _viterbi(w, dict(pieces), 4)
        assert "".join(a) == w
        assert a == b
        assert all(p in pieces or len(p) == 1 for p in a)


@given(
    texts=st.lists(
        st.text(alphabet="ab .!?X", min_size=0, max_size=40),
        min_size=1,
        max_size=6,
    ),
    size=st.integers(min_value=1, max_value=4),
    overlap=st.integers(min_value=0, max_value=3),
)
@settings(**_SETTINGS)
def test_chunk_sentences_matches_python(spark, texts, size, overlap):
    """chunk_sentences == a pure-Python re-implementation of the same
    regex heuristic for ANY punctuation soup (runs of terminators,
    leading/trailing marks, empty docs) and window geometry."""
    import re

    from energy_pandas_spark.operators.text import chunk_sentences

    overlap = min(overlap, size - 1)
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    got = sorted(
        (r.doc_id, r.chunk_idx, r.chunk_text, r.n_sentences)
        for r in chunk_sentences(df, size=size, overlap=overlap).collect()
    )
    step = size - overlap
    expect = []
    for i, t in enumerate(texts):
        sents = [
            s.strip(" ")
            for s in re.findall(r"[^.!?]+[.!?]*", t)
        ]
        sents = [s for s in sents if s]
        for ci, s0 in enumerate(range(0, len(sents), step)):
            window = sents[s0 : s0 + size]
            expect.append((i, ci, " ".join(window), len(window)))
    assert got == sorted(expect)
