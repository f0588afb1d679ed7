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
