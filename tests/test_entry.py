"""Differential tests of the driver contract: run every ``queries()``
entry on Spark AND its ``oracle_sql()`` in DuckDB over the same parquet,
compare row counts + order-insensitive values (columns sorted by name,
rows sorted) — a local replica of the driver's correctness gate.
"""

from __future__ import annotations

import pytest

import __spark_entry__ as entrymod
from tests.oracle_compare import (  # shared driver-gate replica
    compare_to_oracle,
    ddb_connect,
)

ORACLES = entrymod.oracle_sql()
QUERIES = entrymod.queries()


@pytest.fixture(scope="module")
def ddb(sf_dir):
    return ddb_connect(sf_dir)


def test_oracle_keys_subset_of_queries():
    assert set(ORACLES) <= set(QUERIES)


def test_array_valued_output_rejected():
    """Pin the driver-fidelity contract (r5 red `doc_hashed_embedding`):
    the driver's pandas sort_values canonicalizer crashes on list-valued
    columns, so compare_to_oracle must reject them loudly — the pre-fix
    (doc_id, embedding ARRAY<BIGINT>) shape must reproduce RED locally.
    """
    import duckdb
    import pandas as pd

    spdf = pd.DataFrame({"doc_id": [1, 2], "embedding": [[1, 2], [3, 4]]})
    res = duckdb.connect().execute(
        "SELECT * FROM (VALUES (1, [1, 2]), (2, [3, 4]))"
        " t(doc_id, embedding)"
    )
    with pytest.raises(AssertionError, match="array/struct-valued"):
        compare_to_oracle("arrcheck", spdf, res)


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    assert df.count() >= 0
    assert len(df.schema.fields) > 0


@pytest.mark.parametrize("name", sorted(ORACLES))
def test_query_matches_oracle(spark, sf_dir, ddb, name):
    sdf = QUERIES[name](spark, sf_dir)
    # Both sides go through pandas, like the driver: DuckDB HUGEINT and
    # NULL-bearing int columns surface as float64 here, so a dtype drift
    # the driver would flag fails locally too.
    compare_to_oracle(name, sdf.toPandas(), ddb.execute(ORACLES[name]))


@pytest.mark.parametrize(
    "name", sorted(set(QUERIES) - set(ORACLES))
)
def test_rows_only_queries_run(spark, sf_dir, name):
    df = QUERIES[name](spark, sf_dir)
    assert df.count() >= 0
