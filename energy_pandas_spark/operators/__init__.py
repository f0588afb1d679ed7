"""Engine operators: pure functions over pyspark DataFrames.

Each operator is expressed with built-in Column expressions so Catalyst
can optimize (pushdown, partial aggregation, whole-stage codegen); Python
touches data only where genuinely unavoidable (Arrow-batched
mapInPandas/applyInPandas), never row-at-a-time.
"""

from energy_pandas_spark.operators.analytics import (
    capacity_factor,
    ldc,
    ldc_source,
    monthly,
    normalize,
    p_max,
    source_side,
    time_at_min,
)
from energy_pandas_spark.operators.dedup import (
    dedup_exact,
    embedding_neardup_pairs,
    minhash_dedup,
    minhash_lsh_pairs,
    minhash_signature,
    ngram_jaccard_pairs,
    simhash64,
    simhash_neardup_pairs,
)
from energy_pandas_spark.operators.graph import connected_components, dedup_clusters
from energy_pandas_spark.operators.joins import (
    asof_join,
    asof_join_broadcast,
    interval_join,
    salted_join,
)
from energy_pandas_spark.operators.reshape import unstack_to_periods, with_ordinal
from energy_pandas_spark.operators.similarity import cosine_topk, ivf_topk
from energy_pandas_spark.operators.windows import (
    cumulative_aggregate,
    rolling_aggregate,
)

__all__ = [
    # analytics (reference parity)
    "normalize",
    "ldc",
    "ldc_source",
    "monthly",
    "p_max",
    "capacity_factor",
    "time_at_min",
    "source_side",
    # reshape
    "unstack_to_periods",
    "with_ordinal",
    # dedup
    "dedup_exact",
    "minhash_signature",
    "minhash_lsh_pairs",
    "minhash_dedup",
    "simhash64",
    "simhash_neardup_pairs",
    "ngram_jaccard_pairs",
    "embedding_neardup_pairs",
    # graph
    "connected_components",
    "dedup_clusters",
    # joins
    "asof_join",
    "asof_join_broadcast",
    "interval_join",
    "salted_join",
    # similarity
    "cosine_topk",
    "ivf_topk",
    # windows
    "rolling_aggregate",
    "cumulative_aggregate",
]
