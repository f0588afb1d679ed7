"""sf0.01 differential leg (VERDICT r3 #4): the driver's oracles run
at sf0.01 while the local gate defaults to sf0.001 — exactly the gap
where the q10 float-rounding divergence hid (half-cent boundary sums
only materialize with enough rows per group). Re-run the differential
compare at the DRIVER'S scale for the numerically riskiest families:
the whole TPC-H `q*` set plus every float-reducing analytics query.

Kept separate from test_entry.py so `SPARK_GRAFT_SF_DIR` still scales
the main gate while this leg stays pinned to /root/testdata/sf0.01.
"""

from __future__ import annotations

import os
import re

import pytest

from tests.test_entry import ORACLES, QUERIES
from tests.oracle_compare import compare_to_oracle, ddb_connect

SF01_DIR = "/root/testdata/sf0.01"

# TPC-H money family + every oracle-gated query that reduces doubles
# across rows (sum/avg/stddev/corr of float columns) — the class where
# partial-aggregation order can flip a rounded digit at larger SF.
_FLOAT_ADJACENT = [
    "twa_per_user",
    "ewma_final_per_user",
    "degree_days_daily",
    "robust_scale_by_type",
    "value_trend_by_type",
    "rolling_trend_by_type",
    "zscore_outliers_by_type",
    "capacity_factor",
    "monthly_avg",
    "normalize_minmax",
    "ldc",
    "ldc_source",
    "cohort_retention_weekly",
    "corpus_mixture",
    "tfidf_top3",
    "p_max_by_type",
    "source_side",
    "resample_6h",
    "rowwise_mean",
    "value_rank_stats",
]

SF01_NAMES = sorted(
    n
    for n in ORACLES
    if re.match(r"q\d+_", n) or n in _FLOAT_ADJACENT
)


@pytest.fixture(scope="module")
def ddb01():
    return ddb_connect(SF01_DIR)


pytestmark = pytest.mark.skipif(
    not os.path.isdir(SF01_DIR), reason="sf0.01 testdata not present"
)


@pytest.mark.parametrize("name", SF01_NAMES)
def test_query_matches_oracle_at_driver_scale(spark, ddb01, name):
    sdf = QUERIES[name](spark, SF01_DIR)
    compare_to_oracle(name, sdf.toPandas(), ddb01.execute(ORACLES[name]))
