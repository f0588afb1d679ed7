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
