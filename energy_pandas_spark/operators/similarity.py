"""Similarity search over embedding columns (``array<float>``).

Two paths, as a 100 TB-scale engine needs both:

- ``cosine_topk``: exact brute force. The query set is assumed small
  (it is broadcast); the corpus streams once. Top-k extraction is
  TWO-STAGE: a per-(query, input-partition) local top-k (bounded window
  over partition-local rows) followed by a global top-k over the
  ``k x num_partitions`` survivors — never a single-partition window
  over the whole corpus, never a collect_list of the corpus.
- ``ivf_topk``: IVF-style approximate search. Centroids are trained
  driver-side (k-means on a bounded sample), corpus vectors are
  assigned to their nearest centroid with a vectorized Arrow batch
  kernel (one matmul per batch), and each query probes only the
  ``nprobe`` nearest cells — the classic inverted-file pruning, with
  the cell assignment persisted so repeated queries reuse it.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window, functions as F

from energy_pandas_spark.functions.vectors import cosine_similarity
from energy_pandas_spark.util import spread_partitions

__all__ = [
    "cosine_topk",
    "cosine_topk_arrow",
    "hard_negative_topk",
    "embedding_dim_stats",
    "whiten_embeddings",
    "train_centroids",
    "train_centroids_distributed",
    "assign_cells",
    "ivf_topk",
    "build_ivf_index",
    "append_ivf_index",
    "ivf_search",
    "train_pq",
    "train_pq_distributed",
    "pq_encode",
    "pq_topk",
    "pq_recall_topk",
    "build_ivfpq_index",
    "ivfpq_search",
]


def cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    corpus_id: str = "vec_id",
    corpus_vec: str = "embedding",
    query_id: str = "query_id",
    query_vec: str = "query_vec",
    round_digits: int | None = 6,
) -> DataFrame:
    """Exact cosine top-k neighbors for every query vector.

    Returns (query_id, vec_id, cosine, rank) with rank 1..k per query.
    """
    q = queries.select(F.col(query_id), F.col(query_vec))
    # the per-row cosine expressions are interpreted HOFs — make sure a
    # small single-file corpus doesn't serialize them on one core
    corpus = spread_partitions(corpus)
    scored = corpus.crossJoin(F.broadcast(q)).select(
        F.col(query_id),
        F.col(corpus_id),
        cosine_similarity(corpus_vec, query_vec).alias("__cos"),
    )
    return _topk_per_query(scored, k, query_id, corpus_id, round_digits)


def hard_negative_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    corpus_id: str = "vec_id",
    corpus_vec: str = "embedding",
    corpus_label: str = "label",
    query_id: str = "query_id",
    query_vec: str = "query_vec",
    query_label: str = "query_label",
    round_digits: int | None = 6,
) -> DataFrame:
    """Hard-negative mining for contrastive training: for every query
    vector, the top-k most-similar corpus vectors whose label DIFFERS
    from the query's — the near-miss negatives that make retriever /
    embedding training actually learn boundaries (random negatives are
    too easy).

    Same plan as :func:`cosine_topk` (broadcast query set, two-stage
    top-k) with the label-inequality predicate applied before scoring,
    so disallowed rows never enter the candidate set. Rows with a NULL
    label on either side are excluded (inequality is unknowable)."""
    q = queries.select(F.col(query_id), F.col(query_vec), F.col(query_label))
    corpus = spread_partitions(corpus)
    scored = (
        corpus.crossJoin(F.broadcast(q))
        .filter(F.col(corpus_label) != F.col(query_label))
        .select(
            F.col(query_id),
            F.col(corpus_id),
            cosine_similarity(corpus_vec, query_vec).alias("__cos"),
        )
    )
    return _topk_per_query(scored, k, query_id, corpus_id, round_digits)


def _global_topk(
    scored: DataFrame,
    k: int,
    query_id: str,
    corpus_id: str,
    round_digits: int | None = 6,
) -> DataFrame:
    """Final top-k over an already locally-pruned candidate set: one
    window keyed on the query id (ties break on corpus id)."""
    cos = F.round(F.col("__cos"), round_digits) if round_digits else F.col("__cos")
    return (
        scored.withColumn(
            "rank",
            F.row_number().over(
                Window.partitionBy(query_id).orderBy(F.desc("__cos"), F.asc(corpus_id))
            ),
        )
        .filter(F.col("rank") <= k)
        .select(query_id, corpus_id, cos.alias("cosine"), "rank")
    )


def _topk_per_query(
    scored: DataFrame,
    k: int,
    query_id: str,
    corpus_id: str,
    round_digits: int | None = 6,
) -> DataFrame:
    """Two-stage top-k: a per-(query, input-partition) local top-k
    (bounded window over partition-local rows) feeds a global top-k
    over the ``k x num_partitions`` survivors — never a full sort of
    one query's whole candidate set on a single partition."""
    local = (
        scored.withColumn("__pid", F.spark_partition_id())
        .withColumn(
            "__lr",
            F.row_number().over(
                Window.partitionBy(query_id, "__pid").orderBy(
                    F.desc("__cos"), F.asc(corpus_id)
                )
            ),
        )
        .filter(F.col("__lr") <= k)
    )
    return _global_topk(local, k, query_id, corpus_id, round_digits)


def cosine_topk_arrow(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    corpus_id: str = "vec_id",
    corpus_vec: str = "embedding",
    query_id: str = "query_id",
    query_vec: str = "query_vec",
    round_digits: int | None = 6,
) -> DataFrame:
    """Exact brute-force cosine top-k through the Arrow/BLAS kernel —
    the scale-path twin of :func:`cosine_topk` (same results, same
    determinism contract).

    The small query set collects to the driver once and rides in the
    task closure as a normalized (q x dim) matrix; every Arrow batch of
    corpus vectors computes ONE (batch x dim) @ (dim x q) matmul and
    emits only its per-query local top-k (ties broken on corpus id), so
    the shuffle carries k*q rows per batch no matter how wide the
    corpus. A final per-query window ranks the survivors. Spark's
    interpreted higher-order functions never touch the hot loop."""
    qrows = queries.select(query_id, query_vec).collect()
    if not qrows:
        empty = corpus.sparkSession.createDataFrame(
            [], f"{query_id} long, {corpus_id} long, cosine double, rank int"
        )
        return empty
    qids = np.array([r[0] for r in qrows])
    Q = np.array([r[1] for r in qrows], dtype=np.float64)
    Qn = Q / np.maximum(np.linalg.norm(Q, axis=1, keepdims=True), 1e-12)

    def fn(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            n = len(pdf)
            if n == 0:
                continue
            X = np.array(list(pdf[corpus_vec]), dtype=np.float64)
            Xn = X / np.maximum(np.linalg.norm(X, axis=1, keepdims=True), 1e-12)
            S = Xn @ Qn.T  # (batch x q) similarity block
            ids = pdf[corpus_id].to_numpy()
            kk = min(k, n)
            out_q: list = []
            out_id: list = []
            out_cos: list = []
            for j in range(S.shape[1]):
                col = S[:, j]
                # lexsort: primary -cos desc, secondary corpus id asc
                idx = np.lexsort((ids, -col))[:kk]
                out_q.extend([qids[j]] * len(idx))
                out_id.extend(ids[idx])
                out_cos.extend(col[idx])
            yield pd.DataFrame(
                {query_id: out_q, corpus_id: out_id, "__cos": out_cos}
            )

    scored = spread_partitions(corpus.select(corpus_id, corpus_vec)).mapInPandas(
        fn, schema=f"{query_id} long, {corpus_id} long, __cos double"
    )
    return _global_topk(scored, k, query_id, corpus_id, round_digits)


# ---------------------------------------------------------------------------
# IVF
# ---------------------------------------------------------------------------


def _bounded_sample(df: DataFrame, sample_rows: int, seed: int) -> list:
    """Collect a bounded RANDOM sample: estimate the fraction from a
    (parquet-metadata-cheap) count, oversample 3x for variance, then
    cap with limit. A bare ``limit(n)`` would take a deterministic
    PREFIX — on a corpus laid out by source/language that trains the
    quantizer on one source and silently wrecks everyone else's cells.
    Seeded Bernoulli sampling draws from every partition instead."""
    cnt = df.count()
    if cnt > sample_rows:
        frac = min(1.0, 3.0 * sample_rows / cnt)
        df = df.sample(fraction=frac, seed=seed)
    return df.limit(sample_rows).collect()


def train_centroids(
    corpus: DataFrame,
    n_cells: int = 16,
    vec_col: str = "embedding",
    sample_rows: int = 20000,
    iters: int = 10,
    seed: int = 42,
) -> np.ndarray:
    """Driver-side k-means (Lloyd) on a bounded sample — the IVF coarse
    quantizer. The sample is capped, so driver memory is bounded
    regardless of corpus size."""
    sample = _bounded_sample(corpus.select(vec_col), sample_rows, seed)
    X = np.array([r[0] for r in sample], dtype=np.float64)
    X = X / np.maximum(np.linalg.norm(X, axis=1, keepdims=True), 1e-12)
    rng = np.random.default_rng(seed)
    cent = X[rng.choice(len(X), size=min(n_cells, len(X)), replace=False)]
    for _ in range(iters):
        sims = X @ cent.T
        lab = sims.argmax(axis=1)
        for c in range(len(cent)):
            m = lab == c
            if m.any():
                v = X[m].mean(axis=0)
                cent[c] = v / max(np.linalg.norm(v), 1e-12)
    return cent


def train_centroids_distributed(
    corpus: DataFrame,
    n_cells: int = 16,
    vec_col: str = "embedding",
    iters: int = 10,
    seed: int = 42,
) -> np.ndarray:
    """Scale-honest IVF/SemDeDup centroid trainer: ``pyspark.ml`` KMeans
    with ``distanceMeasure='cosine'`` over the WHOLE corpus (kmeans||
    init + distributed Lloyd iterations), instead of the bounded
    driver-side sample ``train_centroids`` uses. At 100 TB the sample
    trainer's centroid quality rests on 20k rows; this one sees every
    vector while only ever collecting the k centers. Returns unit-norm
    centroids in the same shape/contract as ``train_centroids``, so
    ``assign_cells``/``ivf_topk``/``build_ivf_index`` compose unchanged."""
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    feats = corpus.select(
        array_to_vector(F.col(vec_col).cast("array<double>")).alias("__features")
    )
    model = KMeans(
        k=n_cells,
        maxIter=iters,
        seed=seed,
        distanceMeasure="cosine",
        featuresCol="__features",
    ).fit(feats)
    cent = np.array([np.asarray(c) for c in model.clusterCenters()], dtype=np.float64)
    return cent / np.maximum(np.linalg.norm(cent, axis=1, keepdims=True), 1e-12)


def assign_cells(
    corpus: DataFrame,
    centroids: np.ndarray,
    vec_col: str = "embedding",
    out_col: str = "cell",
) -> DataFrame:
    """Nearest-centroid assignment with an Arrow-vectorized kernel: one
    (batch x dim) @ (dim x cells) matmul per batch."""
    cent = centroids.astype(np.float64)
    cols = corpus.columns

    def fn(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            X = np.array(list(pdf[vec_col]), dtype=np.float64)
            if len(X) == 0:
                pdf[out_col] = pd.Series([], dtype="int32")
                yield pdf
                continue
            Xn = X / np.maximum(np.linalg.norm(X, axis=1, keepdims=True), 1e-12)
            pdf[out_col] = (Xn @ cent.T).argmax(axis=1).astype(np.int32)
            yield pdf

    from pyspark.sql.types import IntegerType, StructField, StructType

    schema = StructType(
        list(corpus.schema.fields) + [StructField(out_col, IntegerType())]
    )
    return corpus.mapInPandas(fn, schema=schema)


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    n_cells: int = 16,
    nprobe: int = 4,
    corpus_id: str = "vec_id",
    corpus_vec: str = "embedding",
    query_id: str = "query_id",
    query_vec: str = "query_vec",
    centroids: np.ndarray | None = None,
    trainer: str = "sample",
) -> DataFrame:
    """Approximate cosine top-k: probe only the ``nprobe`` nearest
    IVF cells per query. The equi-join on ``cell`` replaces the full
    cross join — the scan prunes to ~nprobe/n_cells of the corpus.

    ``trainer='distributed'`` swaps the bounded-sample quantizer for
    the full-corpus ``pyspark.ml`` KMeans (see
    ``train_centroids_distributed``)."""
    if centroids is None:
        train = (
            train_centroids_distributed if trainer == "distributed"
            else train_centroids
        )
        centroids = train(corpus, n_cells, corpus_vec)
    cells = assign_cells(corpus, centroids, corpus_vec)

    # queries are small: probe cells computed driver-side
    qrows = queries.select(query_id, query_vec).collect()
    Q = np.array([r[1] for r in qrows], dtype=np.float64)
    Qn = Q / np.maximum(np.linalg.norm(Q, axis=1, keepdims=True), 1e-12)
    probes = np.argsort(-(Qn @ centroids.T), axis=1)[:, :nprobe]
    spark = corpus.sparkSession
    probe_df = spark.createDataFrame(
        [
            (r[0], r[1], int(c))
            for r, pr in zip(qrows, probes)
            for c in pr
        ],
        schema=f"{query_id} long, {query_vec} array<double>, cell int",
    )
    scored = cells.join(F.broadcast(probe_df), "cell").select(
        F.col(query_id),
        F.col(corpus_id),
        cosine_similarity(corpus_vec, query_vec).alias("__cos"),
    )
    return _topk_per_query(scored, k, query_id, corpus_id)


# ---------------------------------------------------------------------------
# persisted IVF index
# ---------------------------------------------------------------------------


def build_ivf_index(
    corpus: DataFrame,
    path: str,
    n_cells: int = 16,
    corpus_id: str = "vec_id",
    corpus_vec: str = "embedding",
    trainer: str = "sample",
    **train_kwargs,
) -> None:
    """Materialize an IVF index as TABLES: cell assignments written
    hive-partitioned by ``cell`` (so probing N of M cells is a
    partition-pruned scan that never lists the other directories) plus
    a tiny centroid table. Rebuild after large ingests; queries between
    rebuilds just probe slightly stale cells. ``trainer='distributed'``
    trains the quantizer on the full corpus via ``pyspark.ml`` KMeans."""
    train = (
        train_centroids_distributed if trainer == "distributed"
        else train_centroids
    )
    centroids = train(corpus, n_cells, corpus_vec, **train_kwargs)
    cells = assign_cells(
        corpus.select(corpus_id, corpus_vec), centroids, corpus_vec
    )
    cells.write.mode("overwrite").partitionBy("cell").parquet(path + "/cells")
    spark = corpus.sparkSession
    spark.createDataFrame(
        [(int(i), [float(x) for x in c]) for i, c in enumerate(centroids)],
        "cell int, centroid array<double>",
    ).coalesce(1).write.mode("overwrite").parquet(path + "/centroids")


def append_ivf_index(
    new: DataFrame,
    path: str,
    corpus_id: str = "vec_id",
    corpus_vec: str = "embedding",
) -> None:
    """Incremental index growth WITHOUT retraining: assign the new
    vectors against the index's EXISTING centroid table and append to
    the hive cell partitions. This is how a 100 TB index absorbs a
    daily ingest — the coarse quantizer only drifts slowly, so the
    standard operating cycle is append-per-batch, retrain-per-epoch
    (``build_ivf_index`` again). Search needs no coordination: probes
    read whatever files the cells hold at scan time."""
    spark = new.sparkSession
    cent_rows = spark.read.parquet(path + "/centroids").collect()
    cent_rows.sort(key=lambda r: r.cell)
    centroids = np.array([r.centroid for r in cent_rows], dtype=np.float64)
    cells = assign_cells(
        new.select(corpus_id, corpus_vec), centroids, corpus_vec
    )
    cells.write.mode("append").partitionBy("cell").parquet(path + "/cells")


def ivf_search(
    spark,
    path: str,
    queries: DataFrame,
    k: int = 5,
    nprobe: int = 4,
    corpus_id: str = "vec_id",
    corpus_vec: str = "embedding",
    query_id: str = "query_id",
    query_vec: str = "query_vec",
) -> DataFrame:
    """Top-k against a persisted IVF index. The probe-cell filter is a
    PARTITION filter on the cells table — Spark prunes the non-probed
    cell directories at planning time, so the scan touches
    ~nprobe/n_cells of the index files."""
    cent_rows = spark.read.parquet(path + "/centroids").collect()
    cent_rows.sort(key=lambda r: r.cell)
    centroids = np.array([r.centroid for r in cent_rows], dtype=np.float64)

    qrows = queries.select(query_id, query_vec).collect()
    if not qrows:
        return spark.createDataFrame(
            [], f"{query_id} long, {corpus_id} long, cosine double, rank int"
        )
    Q = np.array([r[1] for r in qrows], dtype=np.float64)
    Qn = Q / np.maximum(np.linalg.norm(Q, axis=1, keepdims=True), 1e-12)
    probes = np.argsort(-(Qn @ centroids.T), axis=1)[:, :nprobe]
    probe_df = spark.createDataFrame(
        [(r[0], r[1], int(c)) for r, pr in zip(qrows, probes) for c in pr],
        schema=f"{query_id} long, {query_vec} array<double>, cell int",
    )
    wanted = sorted({int(c) for pr in probes for c in pr})
    cells = spark.read.parquet(path + "/cells").filter(F.col("cell").isin(wanted))
    scored = cells.join(F.broadcast(probe_df), "cell").select(
        F.col(query_id),
        F.col(corpus_id),
        cosine_similarity(corpus_vec, query_vec).alias("__cos"),
    )
    return _topk_per_query(scored, k, query_id, corpus_id)


# ---------------------------------------------------------------------------
# Product quantization (PQ) — the memory-bound half of IVF-PQ
# ---------------------------------------------------------------------------
#
# At 100 TB of float32 embeddings the working set, not the FLOPs, kills
# brute force: a 1024-dim vector is 4 KiB; PQ with m=16 subspaces and
# 256 centroids each stores 16 BYTES per vector (256x) plus one shared
# (m x 256 x dim/m) codebook that broadcasts to every task. Search is
# asymmetric distance computation (ADC): per query build an (m x k)
# lookup table of exact subvector inner products once, then every
# corpus vector scores with m table lookups — no float vector ever
# re-read. This is the standard IVF-PQ decomposition (Jégou et al.,
# "Product Quantization for Nearest Neighbor Search", TPAMI 2011).


def train_pq(
    corpus: DataFrame,
    m: int = 8,
    k: int = 16,
    vec_col: str = "embedding",
    sample_rows: int = 20000,
    iters: int = 15,
    seed: int = 42,
) -> np.ndarray:
    """Train PQ codebooks: split the (L2-normalized) vectors into ``m``
    equal subvectors and run k-means (L2 Lloyd) per subspace on a
    bounded driver-side sample. Returns ``(m, k, dim/m)`` float64.

    Sample training is the standard practice (FAISS trains PQ on a
    bounded sample too — codebook quality converges long before the
    corpus is exhausted); the bounded seeded sample keeps driver memory
    flat regardless of corpus size and draws from every partition (a
    bare limit would train on a single-source prefix)."""
    sample = _bounded_sample(corpus.select(vec_col), sample_rows, seed)
    X = np.array([r[0] for r in sample], dtype=np.float64)
    X = X / np.maximum(np.linalg.norm(X, axis=1, keepdims=True), 1e-12)
    dim = X.shape[1]
    if dim % m:
        raise ValueError(f"dim {dim} not divisible by m={m}")
    dsub = dim // m
    rng = np.random.default_rng(seed)
    books = np.empty((m, k, dsub))
    for j in range(m):
        S = X[:, j * dsub : (j + 1) * dsub]
        cent = S[rng.choice(len(S), size=min(k, len(S)), replace=False)]
        for _ in range(iters):
            # L2 argmin via the expanded form: ||s-c||^2 = -2 s.c + ||c||^2 (+||s||^2 const)
            d2 = -2.0 * (S @ cent.T) + (cent * cent).sum(axis=1)
            lab = d2.argmin(axis=1)
            for c in range(len(cent)):
                msk = lab == c
                if msk.any():
                    cent[c] = S[msk].mean(axis=0)
        if len(cent) < k:  # degenerate tiny sample: cycle-pad up to k
            reps = -(-k // len(cent))  # ceil division
            cent = np.concatenate([cent] * reps)[:k]
        books[j] = cent
    return books


def train_pq_distributed(
    corpus: DataFrame,
    m: int = 8,
    k: int = 16,
    vec_col: str = "embedding",
    iters: int = 15,
    seed: int = 42,
) -> np.ndarray:
    """Scale-honest PQ trainer: one ``pyspark.ml`` KMeans (kmeans||
    init + distributed Lloyd) PER SUBSPACE over the WHOLE corpus —
    the full-data twin of :func:`train_pq`, mirroring
    ``train_centroids_distributed`` for the coarse quantizer. Returns
    the same ``(m, k, dim/m)`` contract, so encode/search compose
    unchanged. Cost is ``m`` clustering jobs over slices of the
    normalized vectors; at 100 TB that is the honest price of codebooks
    that have seen every source."""
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    dim = len(corpus.select(vec_col).first()[0])
    if dim % m:
        raise ValueError(f"dim {dim} not divisible by m={m}")
    dsub = dim // m
    from energy_pandas_spark.functions.vectors import l2_normalize

    base = corpus.select(
        l2_normalize(F.col(vec_col).cast("array<double>")).alias("__v")
    )
    books = np.empty((m, k, dsub))
    for j in range(m):
        feats = base.select(
            array_to_vector(F.slice("__v", j * dsub + 1, dsub)).alias(
                "__features"
            )
        )
        model = KMeans(
            k=k, maxIter=iters, seed=seed + j, featuresCol="__features"
        ).fit(feats)
        cent = np.array(
            [np.asarray(c) for c in model.clusterCenters()], dtype=np.float64
        )
        if len(cent) < k:  # degenerate tiny corpus: cycle-pad up to k
            reps = -(-k // len(cent))
            cent = np.concatenate([cent] * reps)[:k]
        books[j] = cent
    return books


def pq_encode(
    corpus: DataFrame,
    codebooks: np.ndarray,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Encode vectors to PQ codes: ``(id, codes array<smallint>)`` with
    ``codes[j] = argmin_c ||x_j - codebook[j][c]||`` over the normalized
    vector's j-th subvector.

    One Arrow batch = m small matmuls; the codebook rides in the task
    closure (m*k*dsub floats — a few hundred KiB at production sizes).
    Map-only: no shuffle, output is 1-2 bytes per subspace per vector."""
    books = np.asarray(codebooks, dtype=np.float64)
    m, k, dsub = books.shape
    cnorm2 = (books * books).sum(axis=2)  # (m, k)

    def fn(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            if not len(pdf):
                continue
            X = np.array(list(pdf[vec_col]), dtype=np.float64)
            X = X / np.maximum(np.linalg.norm(X, axis=1, keepdims=True), 1e-12)
            codes = np.empty((len(X), m), dtype=np.int16)
            for j in range(m):
                S = X[:, j * dsub : (j + 1) * dsub]
                d2 = -2.0 * (S @ books[j].T) + cnorm2[j]
                codes[:, j] = d2.argmin(axis=1)
            yield pd.DataFrame(
                {id_col: pdf[id_col].to_numpy(), "codes": list(codes)}
            )

    src = spread_partitions(corpus.select(id_col, vec_col))
    return src.mapInPandas(fn, schema=f"{id_col} long, codes array<smallint>")


def pq_topk(
    codes: DataFrame,
    queries: DataFrame,
    codebooks: np.ndarray,
    k: int = 5,
    corpus_id: str = "vec_id",
    query_id: str = "query_id",
    query_vec: str = "query_vec",
    round_digits: int | None = 6,
) -> DataFrame:
    """Approximate cosine top-k by ADC over PQ codes.

    Per task the (small, broadcast) query set expands to an exact
    subvector-IP lookup table ``T[q, j, c] = <q_j, codebook[j][c]>``;
    each corpus code row scores as ``sum_j T[q, j, codes[j]]`` — a pure
    gather-sum over int16 codes, never touching float vectors. Batches
    emit only their per-query local top-k, a final window ranks the
    ``k x batches`` survivors (same two-stage contract as the exact
    paths)."""
    books = np.asarray(codebooks, dtype=np.float64)
    m, kk_, dsub = books.shape
    qrows = queries.select(query_id, query_vec).collect()
    if not qrows:
        return codes.sparkSession.createDataFrame(
            [], f"{query_id} long, {corpus_id} long, score double, rank int"
        )
    qids = np.array([r[0] for r in qrows])
    Q = np.array([r[1] for r in qrows], dtype=np.float64)
    Qn = Q / np.maximum(np.linalg.norm(Q, axis=1, keepdims=True), 1e-12)
    # (nq, m, k) lookup tables: exact query-side, quantized corpus-side
    lut = np.einsum(
        "qjd,jcd->qjc", Qn.reshape(len(Qn), m, dsub), books
    )

    def fn(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            n = len(pdf)
            if n == 0:
                continue
            C = np.array(list(pdf["codes"]), dtype=np.int64)  # (n, m)
            ids = pdf[corpus_id].to_numpy()
            # scores[q, i] = sum_j lut[q, j, C[i, j]]
            gathered = lut[:, np.arange(m)[None, :], C]  # (nq, n, m)
            S = gathered.sum(axis=2)
            kk = min(k, n)
            out_q: list = []
            out_id: list = []
            out_s: list = []
            for qi in range(S.shape[0]):
                row = S[qi]
                idx = np.lexsort((ids, -row))[:kk]
                out_q.extend([qids[qi]] * len(idx))
                out_id.extend(ids[idx])
                out_s.extend(row[idx])
            yield pd.DataFrame(
                {query_id: out_q, corpus_id: out_id, "__cos": out_s}
            )

    scored = spread_partitions(codes.select(corpus_id, "codes")).mapInPandas(
        fn, schema=f"{query_id} long, {corpus_id} long, __cos double"
    )
    out = _global_topk(scored, k, query_id, corpus_id, round_digits)
    return out.withColumnRenamed("cosine", "score")


def pq_recall_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    m: int = 8,
    n_codes: int = 16,
    corpus_id: str = "vec_id",
    corpus_vec: str = "embedding",
    query_id: str = "query_id",
    query_vec: str = "query_vec",
    codebooks: np.ndarray | None = None,
    refine: int = 4,
    trainer: str = "sample",
) -> DataFrame:
    """Train → encode → ADC shortlist → exact rerank in one call.
    ``trainer='distributed'`` swaps the bounded-sample codebooks for
    the full-corpus per-subspace ``pyspark.ml`` KMeans.

    ``refine`` is the standard PQ refinement step (FAISS's
    ``IndexRefineFlat``): ADC retrieves ``refine * k`` candidates per
    query from the compressed codes, then ONLY those rows' float
    vectors are re-read (a semi-join — at 100 TB that's ``refine*k*q``
    point lookups against the corpus, not a scan) and reranked by exact
    cosine. Quantization error then only hurts recall when a true
    neighbor falls outside the shortlist, not via final-rank jitter.
    ``refine=1`` skips the rerank and returns raw ADC ranks.
    Production persists the codes table and calls :func:`pq_topk` /
    reranks explicitly."""
    if codebooks is None:
        train = train_pq_distributed if trainer == "distributed" else train_pq
        codebooks = train(corpus, m=m, k=n_codes, vec_col=corpus_vec)
    enc = pq_encode(corpus, codebooks, id_col=corpus_id, vec_col=corpus_vec)
    adc = pq_topk(
        enc, queries, codebooks, k=max(k, refine * k),
        corpus_id=corpus_id, query_id=query_id, query_vec=query_vec,
    )
    if refine <= 1:
        return adc
    qn = queries.select(query_id, query_vec)
    # shortlist (refine*k*q rows) broadcasts; the corpus side is a
    # broadcast-hash join probe — no corpus shuffle for the rerank
    cand = adc.select(query_id, corpus_id).join(F.broadcast(qn), query_id)
    scored = corpus.select(corpus_id, corpus_vec).join(
        F.broadcast(cand), corpus_id
    ).select(
        F.col(query_id),
        F.col(corpus_id),
        cosine_similarity(corpus_vec, query_vec).alias("__cos"),
    )
    return _global_topk(scored, k, query_id, corpus_id)


# ---------------------------------------------------------------------------
# persisted IVF-PQ index: the production ANN stack (coarse cells prune
# the scan, PQ codes bound the bytes, optional exact rerank restores
# precision)
# ---------------------------------------------------------------------------


def build_ivfpq_index(
    corpus: DataFrame,
    path: str,
    n_cells: int = 16,
    m: int = 8,
    n_codes: int = 16,
    corpus_id: str = "vec_id",
    corpus_vec: str = "embedding",
    trainer: str = "sample",
    keep_vectors: bool = True,
) -> None:
    """Materialize an IVF-PQ index as tables:

    - ``cells/``  — (id, codes[, vector]) hive-partitioned by coarse
      cell: probing N of M cells is a partition-pruned scan, and each
      row carries ``m`` int16 codes instead of the float vector, so
      the probed bytes shrink ~(4*dim)/(2*m)x on top of the pruning.
    - ``centroids/`` — the coarse quantizer (tiny).
    - ``codebooks/`` — the PQ codebooks, flattened (tiny).

    ``keep_vectors=True`` also stores the float vector beside the codes
    so :func:`ivfpq_search` can exact-rerank without a second source
    join; pass ``False`` when the raw corpus stays queryable elsewhere
    and the index must be minimal."""
    train = (
        train_centroids_distributed if trainer == "distributed"
        else train_centroids
    )
    centroids = train(corpus, n_cells, corpus_vec)
    train_codes = (
        train_pq_distributed if trainer == "distributed" else train_pq
    )
    books = train_codes(corpus, m=m, k=n_codes, vec_col=corpus_vec)
    enc = pq_encode(corpus, books, id_col=corpus_id, vec_col=corpus_vec)
    src = corpus.select(corpus_id, corpus_vec).join(enc, corpus_id)
    cells = assign_cells(src, centroids, corpus_vec)
    if not keep_vectors:
        cells = cells.drop(corpus_vec)
    cells.write.mode("overwrite").partitionBy("cell").parquet(path + "/cells")
    spark = corpus.sparkSession
    spark.createDataFrame(
        [(int(i), [float(x) for x in c]) for i, c in enumerate(centroids)],
        "cell int, centroid array<double>",
    ).coalesce(1).write.mode("overwrite").parquet(path + "/centroids")
    mm, kk, dsub = books.shape
    spark.createDataFrame(
        [
            (int(j), int(c), [float(x) for x in books[j][c]])
            for j in range(mm)
            for c in range(kk)
        ],
        "subspace int, code int, centroid array<double>",
    ).coalesce(1).write.mode("overwrite").parquet(path + "/codebooks")


def ivfpq_search(
    spark,
    path: str,
    queries: DataFrame,
    k: int = 5,
    nprobe: int = 4,
    refine: int = 4,
    corpus_id: str = "vec_id",
    corpus_vec: str = "embedding",
    query_id: str = "query_id",
    query_vec: str = "query_vec",
) -> DataFrame:
    """Top-k against a persisted IVF-PQ index: partition-pruned scan of
    the ``nprobe`` nearest cells, ADC scoring over the int16 codes, and
    (when the index kept vectors and ``refine > 1``) an exact cosine
    rerank of the ``refine * k`` shortlist — the bytes read scale with
    ``nprobe/n_cells * corpus * (2m + [4 dim])``, never the corpus."""
    cent_rows = spark.read.parquet(path + "/centroids").collect()
    cent_rows.sort(key=lambda r: r.cell)
    centroids = np.array([r.centroid for r in cent_rows], dtype=np.float64)
    book_rows = spark.read.parquet(path + "/codebooks").collect()
    mm = 1 + max(r.subspace for r in book_rows)
    kk = 1 + max(r.code for r in book_rows)
    dsub = len(book_rows[0].centroid)
    books = np.zeros((mm, kk, dsub))
    for r in book_rows:
        books[r.subspace][r.code] = r.centroid

    qrows = queries.select(query_id, query_vec).collect()
    if not qrows:
        return spark.createDataFrame(
            [], f"{query_id} long, {corpus_id} long, cosine double, rank int"
        )
    Q = np.array([r[1] for r in qrows], dtype=np.float64)
    Qn = Q / np.maximum(np.linalg.norm(Q, axis=1, keepdims=True), 1e-12)
    probes = np.argsort(-(Qn @ centroids.T), axis=1)[:, :nprobe]
    wanted = sorted({int(c) for pr in probes for c in pr})
    cells = spark.read.parquet(path + "/cells").filter(
        F.col("cell").isin(wanted)
    )
    has_vectors = corpus_vec in cells.columns

    probe_pairs = {
        (r[0], int(c)) for r, pr in zip(qrows, probes) for c in pr
    }
    qids_by_cell: dict[int, list] = {}
    for qid, c in probe_pairs:
        qids_by_cell.setdefault(c, []).append(qid)
    qid_index = {r[0]: i for i, r in enumerate(qrows)}
    m_ = mm
    lut = np.einsum("qjd,jcd->qjc", Qn.reshape(len(Qn), m_, dsub), books)

    def fn(it: "Iterator[pd.DataFrame]") -> "Iterator[pd.DataFrame]":
        for pdf in it:
            if not len(pdf):
                continue
            out_q: list = []
            out_id: list = []
            out_s: list = []
            for cell, grp in pdf.groupby("cell"):
                qids = qids_by_cell.get(int(cell))
                if not qids:
                    continue
                C = np.array(list(grp["codes"]), dtype=np.int64)
                ids = grp[corpus_id].to_numpy()
                for qid in qids:
                    row = lut[qid_index[qid], np.arange(m_)[None, :], C].sum(
                        axis=1
                    )
                    kk_ = min(refine * k if refine > 1 else k, len(ids))
                    idx = np.lexsort((ids, -row))[:kk_]
                    out_q.extend([qid] * len(idx))
                    out_id.extend(ids[idx])
                    out_s.extend(row[idx])
            if out_q:
                yield pd.DataFrame(
                    {query_id: out_q, corpus_id: out_id, "__cos": out_s}
                )

    scored = cells.select(corpus_id, "codes", "cell").mapInPandas(
        fn, schema=f"{query_id} long, {corpus_id} long, __cos double"
    )
    if not has_vectors or refine <= 1:
        return _global_topk(scored, k, query_id, corpus_id)

    # exact rerank from the vectors stored IN the index: shortlist
    # broadcasts, probed cells re-read only the shortlisted rows
    shortlist = _global_topk(
        scored, refine * k, query_id, corpus_id, round_digits=None
    ).select(query_id, corpus_id)
    qn = queries.select(query_id, query_vec)
    cand = shortlist.join(F.broadcast(qn), query_id)
    rescored = cells.select(corpus_id, corpus_vec).join(
        F.broadcast(cand), corpus_id
    ).select(
        F.col(query_id),
        F.col(corpus_id),
        cosine_similarity(corpus_vec, query_vec).alias("__cos"),
    )
    return _global_topk(rescored, k, query_id, corpus_id)


def embedding_dim_stats(
    df: DataFrame,
    vec_col: str = "embedding",
) -> DataFrame:
    """Per-dimension mean and standard deviation of an embedding
    column — the statistics behind whitening, drift monitoring, and
    dead-dimension detection.

    Scale shape: posexplode to (dim, value) rows, then ONE
    map-combined aggregate keyed on the dimension index — the shuffle
    carries ``dims x partitions`` partial rows, never the vectors.
    Returns (dim, mean, std, n) ordered by dim; ``std`` is the
    population (sqrt of ``var_pop``) value."""
    vals = df.select(F.posexplode(F.col(vec_col)).alias("dim", "__v"))
    return (
        vals.groupBy("dim")
        .agg(
            F.round(F.avg("__v"), 6).alias("mean"),
            F.round(F.sqrt(F.var_pop("__v")), 6).alias("std"),
            F.count(F.lit(1)).alias("n"),
        )
        .orderBy("dim")
    )


def whiten_embeddings(
    df: DataFrame,
    stats: DataFrame | None = None,
    vec_col: str = "embedding",
    out_col: str | None = None,
    eps: float = 1e-6,
) -> DataFrame:
    """Per-dimension standardization (diagonal whitening):
    ``(x - mean) / max(std, eps)`` for every dimension — the cheap
    whitening that repairs anisotropic embedding spaces before
    IVF/PQ training (dominant dimensions stop owning every centroid).

    The per-dimension stats collapse to two broadcastable arrays (one
    driver collect of ``dims`` rows), so the transform itself is a
    map-only ``zip_with`` over in-plan literals — zero shuffles on the
    corpus path."""
    out = out_col or vec_col
    if stats is None:
        stats = embedding_dim_stats(df, vec_col)
    rows = sorted(
        ((r.dim, r.mean, r.std) for r in stats.collect()), key=lambda t: t[0]
    )
    if not rows:
        return df.withColumn(out, F.col(vec_col))
    means = F.lit([float(m) for _, m, _ in rows])
    scales = F.lit([1.0 / max(float(s), eps) for _, _, s in rows])
    centered = F.zip_with(
        F.col(vec_col).cast("array<double>"), means, lambda x, m: x - m
    )
    return df.withColumn(
        out, F.zip_with(centered, scales, lambda x, s: x * s)
    )


def pool_embeddings(
    df: DataFrame,
    group_col: str,
    vec_col: str = "embedding",
    mode: str = "mean",
    quant: int = 1 << 20,
) -> DataFrame:
    """Exact distributed embedding pooling: one vector per group —
    chunk-to-document pooling, class centroids, per-cluster prototype
    vectors. ``mode='mean'`` quantizes each component to integer
    1/``quant`` units (round half-away, the house pattern) so the
    per-(group, dim) sums are order-free integer aggregates and each
    output component is ONE correctly-rounded double division —
    bit-identical across engines and partitionings (a float mean
    would reorder under shuffle). ``mode='max'`` needs no
    quantization: max is order-free on floats.

    Scale shape: ``posexplode`` to (group, dim) keyed rows — the
    shuffle carries n*d skinny rows with map-side partial aggregation,
    never a per-group vector list; the final array assembles from the
    d-bounded per-group dim set. Vectors missing dimensions average
    over the vectors that HAVE each dimension (ragged inputs are the
    caller's contract to avoid).

    Returns (group_col, pooled array<double>, n_vectors).
    """
    if mode not in ("mean", "max"):
        raise ValueError(f"mode must be 'mean' or 'max', got {mode!r}")
    ex = df.select(
        group_col, F.posexplode(vec_col).alias("dim", "__v")
    )
    if mode == "max":
        agg = ex.groupBy(group_col, "dim").agg(
            F.max(F.col("__v").cast("double")).alias("__val"),
            F.count(F.lit(1)).alias("c"),
        )
    else:
        q = F.round(F.lit(float(quant)) * F.col("__v").cast("double")).cast(
            "long"
        )
        agg = (
            ex.select(group_col, "dim", q.alias("__q"))
            .groupBy(group_col, "dim")
            .agg(F.sum("__q").alias("__sq"), F.count(F.lit(1)).alias("c"))
            .select(
                group_col,
                "dim",
                (
                    F.col("__sq").cast("double")
                    / (F.lit(quant) * F.col("c")).cast("double")
                ).alias("__val"),
                "c",
            )
        )
    return agg.groupBy(group_col).agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("dim", "__val"))),
            lambda s: s["__val"],
        ).alias("pooled"),
        F.max("c").alias("n_vectors"),
    )


def nearest_centroid_eval(
    df: DataFrame,
    group_col: str = "label",
    vec_col: str = "embedding",
    quant: int = 1 << 20,
    id_col: str | None = None,
) -> DataFrame:
    """Nearest-centroid confusion matrix: pool per-group centroids
    (:func:`pool_embeddings`), assign every vector to its nearest
    centroid, and count (true group, assigned group) pairs — the
    "are these labels/clusters separable in embedding space?" eval
    that gates an embedding-based classifier or a semantic-dedup
    clustering. Distances are EXACT: both sides quantize to integer
    1/``quant`` units and the squared-distance sums are integer
    arithmetic, so the argmin (ties to the smallest group id) is
    deterministic on any engine or partitioning — no float-noise
    flapping between near-equidistant centroids.

    Scale shape: the centroid table is group-count-sized and
    BROADCAST; the per-vector work is a map-side cross join with k
    centroids plus one (vector)-keyed min-struct aggregate and the
    confusion count — no shuffle of the embedding table beyond the
    pooling pass. Returns (group_col, assigned, n).
    """
    cent = pool_embeddings(df, group_col, vec_col, mode="mean", quant=quant)
    qexpr = lambda c: F.transform(  # noqa: E731
        c, lambda x: F.round(F.lit(float(quant)) * x.cast("double")).cast("long")
    )
    cq = cent.select(
        F.col(group_col).alias("__clabel"), qexpr(F.col("pooled")).alias("__cq")
    )
    # prefer a real row id when the caller has one; the fallback
    # monotonic id is only a transient grouping key inside this one
    # plan (its values never reach the output), so split-plan
    # dependence is harmless here
    vid = F.col(id_col) if id_col is not None else F.monotonically_increasing_id()
    vq = df.select(
        vid.alias("__vid"),
        F.col(group_col),
        qexpr(F.col(vec_col)).alias("__vq"),
    )
    dist = F.aggregate(
        F.zip_with("__vq", "__cq", lambda a, b: (a - b) * (a - b)),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    scored = vq.crossJoin(F.broadcast(cq)).select(
        "__vid",
        group_col,
        "__clabel",
        dist.alias("__d"),
    )
    best = scored.groupBy("__vid", group_col).agg(
        F.min(F.struct("__d", "__clabel")).alias("__best")
    )
    return (
        best.select(group_col, F.col("__best.__clabel").alias("assigned"))
        .groupBy(group_col, "assigned")
        .agg(F.count(F.lit(1)).alias("n"))
    )
