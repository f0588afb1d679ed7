"""Column-expression function library.

Everything here returns pyspark Column expressions built from built-in
functions — JVM-evaluated inside whole-stage codegen, usable in any
operator without Python-worker round trips.
"""

from energy_pandas_spark.functions.vectors import (
    cosine_similarity,
    dot,
    l2_norm,
    l2_normalize,
)
from energy_pandas_spark.functions.textfns import (
    char_shingles,
    char_shingles_of_text,
    jaccard,
    normalized_text,
    tokens,
    word_shingles,
    word_shingles_of_tokens,
)

__all__ = [
    "dot",
    "l2_norm",
    "l2_normalize",
    "cosine_similarity",
    "tokens",
    "normalized_text",
    "word_shingles",
    "word_shingles_of_tokens",
    "char_shingles",
    "char_shingles_of_text",
    "jaccard",
]
