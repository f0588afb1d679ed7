"""Typical-period aggregation — the engine's replacement for the
reference's tsam integration (``discretize_tsam``, energypandas.py:
384-412 series, :1118-1147 frame; golden value test_energypandas.py:
167-173: reconstructing ``range(100)`` hourly with one typical period
sums to 4235.070422535211 = 3510 * 5140/4260).

Algorithm (tsam ``TimeSeriesAggregation`` semantics, re-derived and
verified against the golden value):

1. ``timeStepsPerPeriod = hoursPerPeriod / resolution`` (resolution in
   hours, inferred from the time grid).
2. Unstack the series into period vectors; an incomplete final period is
   completed by APPENDING THE HEAD of the series (tsam's
   ``unstackToPeriods`` attaches the first ``missing`` steps).
3. Min-max normalize each column over the original values.
4. Agglomerative hierarchical clustering (Ward linkage) of the period
   vectors into ``noTypicalPeriods`` clusters.
5. Representative = cluster MEDOID (the member minimizing the summed
   euclidean distance to its cluster mates).
6. Rescale each column of the typical periods so the weighted sum over
   all periods matches the unstacked original's sum, iteratively
   clipping normalized values at 1.0.
7. Predict: each original period is replaced by its cluster's typical
   profile; de-normalize; truncate to the original length.

Execution strategy: the whole pipeline runs inside ``applyInPandas``
per group — a year of hourly data is 8,760 rows, trivially
memory-resident — so a table of MANY series (one per building / meter /
key column) clusters all groups in parallel across executors. This is
the correct distribution axis: the algorithm is quadratic in periods
within one series but embarrassingly parallel across series.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F

from energy_pandas_spark.operators.reshape import infer_step_seconds

__all__ = ["typical_periods_reconstruct", "discretize_frame", "discretize_grouped"]


# ---------------------------------------------------------------------------
# numpy core (runs on executors inside Arrow batches)
# ---------------------------------------------------------------------------


def _ward_labels(X: np.ndarray, n_clusters: int) -> np.ndarray:
    """Agglomerative hierarchical clustering, Ward linkage via the
    Lance-Williams update. O(P^2) memory/time — P is the number of
    periods in ONE series (365 for a year of days), never the table size.
    """
    P = X.shape[0]
    if n_clusters >= P:
        return np.arange(P)
    # squared euclidean distances
    sq = ((X[:, None, :] - X[None, :, :]) ** 2).sum(axis=2)
    # Ward objective uses d^2/2 initially with unit sizes
    d = sq.copy().astype(float)
    np.fill_diagonal(d, np.inf)
    sizes = np.ones(P)
    active = list(range(P))
    members: dict[int, list[int]] = {i: [i] for i in range(P)}
    while len(active) > n_clusters:
        # find closest pair among active
        sub = d[np.ix_(active, active)]
        k = np.argmin(sub)
        ai, aj = divmod(k, len(active))
        i, j = active[ai], active[aj]
        if i > j:
            i, j = j, i
        # Lance-Williams Ward update: merge j into i
        ni, nj = sizes[i], sizes[j]
        for m in active:
            if m in (i, j):
                continue
            nm = sizes[m]
            d_new = (
                (ni + nm) * d[i, m] + (nj + nm) * d[j, m] - nm * d[i, j]
            ) / (ni + nj + nm)
            d[i, m] = d[m, i] = d_new
        sizes[i] = ni + nj
        members[i].extend(members.pop(j))
        active.remove(j)
        d[j, :] = np.inf
        d[:, j] = np.inf
    labels = np.empty(P, dtype=int)
    for ci, root in enumerate(sorted(members)):
        labels[np.array(members[root])] = ci
    return labels


def _medoids(X: np.ndarray, labels: np.ndarray) -> np.ndarray:
    """Representative period per cluster: the medoid (tsam's default
    representation for hierarchical clustering)."""
    reps = []
    for c in sorted(set(labels)):
        idx = np.where(labels == c)[0]
        sub = X[idx]
        dist = np.sqrt(((sub[:, None, :] - sub[None, :, :]) ** 2).sum(axis=2))
        reps.append(sub[np.argmin(dist.sum(axis=1))])
    return np.asarray(reps)


def typical_periods_reconstruct(
    values: np.ndarray,
    steps_per_period: int,
    n_clusters: int,
    rescale: bool = True,
) -> np.ndarray:
    """Cluster -> representative -> rescale -> predict, for one series
    group. ``values``: (n, k) float array (k series clustered jointly,
    as the reference frame variant clusters the whole frame).
    Returns the reconstructed (n, k) array.
    """
    values = np.asarray(values, dtype=float)
    if values.ndim == 1:
        values = values[:, None]
    n, k = values.shape
    spp = steps_per_period
    # 2. complete the last period with the head of the series
    missing = (-n) % spp
    padded = np.vstack([values, values[:missing]]) if missing else values
    P = padded.shape[0] // spp
    # 3. min-max normalize per column
    lo = values.min(axis=0)
    hi = values.max(axis=0)
    rng = np.where(hi > lo, hi - lo, 1.0)
    norm = (padded - lo) / rng
    # periods as vectors over the joint column space
    X = norm.reshape(P, spp * k)
    # 4-5. cluster + medoid representatives
    labels = _ward_labels(X, n_clusters)
    reps = _medoids(X, labels)  # (C, spp*k)
    # 6. rescale so the weighted (per assigned period) sum matches the
    # unstacked original, clipping normalized values at 1.0
    if rescale:
        reps3 = reps.reshape(-1, spp, k)
        counts = np.bincount(labels, minlength=reps.shape[0]).astype(float)
        target = norm.reshape(P, spp, k).sum(axis=(0, 1))  # per column
        for _ in range(20):
            got = (reps3.sum(axis=1) * counts[:, None]).sum(axis=0)
            with np.errstate(divide="ignore", invalid="ignore"):
                factor = np.where(got != 0, target / got, 1.0)
            if np.allclose(factor, 1.0, rtol=1e-12, atol=1e-12):
                break
            reps3 = np.clip(reps3 * factor[None, None, :], None, 1.0)
        reps = reps3.reshape(reps.shape[0], spp * k)
    # 7. predict original data
    recon = reps[labels].reshape(P * spp, k)[:n]
    return recon * rng + lo


# ---------------------------------------------------------------------------
# Spark drivers
# ---------------------------------------------------------------------------


def discretize_frame(
    df: DataFrame,
    ts_col: str,
    value_cols: list[str],
    noTypicalPeriods: int = 10,
    hoursPerPeriod: int = 24,
    resolution_hours: float | None = None,
    rescale: bool = True,
) -> DataFrame:
    """Reference-parity path: cluster ALL value columns jointly over one
    logical series (the reference passes the whole frame to tsam,
    energypandas.py:401-404, :1133-1135). Executed as a single
    ``applyInPandas`` group — correct for one year of one building; for
    many-entity tables use :func:`discretize_grouped`.
    """
    one = df.withColumn("__g", F.lit(0))
    out = discretize_grouped(
        one, "__g", ts_col, value_cols,
        noTypicalPeriods=noTypicalPeriods,
        hoursPerPeriod=hoursPerPeriod,
        resolution_hours=resolution_hours,
        rescale=rescale,
    )
    return out.drop("__g")


def discretize_grouped(
    df: DataFrame,
    group_col: str,
    ts_col: str,
    value_cols: list[str],
    noTypicalPeriods: int = 10,
    hoursPerPeriod: int = 24,
    resolution_hours: float | None = None,
    rescale: bool = True,
) -> DataFrame:
    """Scale path: one typical-period aggregation PER GROUP, all groups
    in parallel (Arrow-batched ``applyInPandas``; each group must fit in
    executor memory — 8,760x8B floats per year-series is trivial)."""
    if resolution_hours is None:
        resolution_hours = infer_step_seconds(df, ts_col) / 3600.0
    spp = int(round(hoursPerPeriod / resolution_hours))
    schema = df.select(group_col, ts_col, *value_cols).schema

    def fn(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(ts_col).reset_index(drop=True)
        vals = pdf[value_cols].to_numpy(dtype=float)
        recon = typical_periods_reconstruct(
            vals, spp, noTypicalPeriods, rescale=rescale
        )
        out = pdf[[group_col, ts_col]].copy()
        for i, c in enumerate(value_cols):
            out[c] = recon[:, i]
        return out

    return (
        df.select(group_col, ts_col, *value_cols)
        .groupBy(group_col)
        .applyInPandas(fn, schema=schema)
    )
