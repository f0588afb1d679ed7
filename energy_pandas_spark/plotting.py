"""Plotting surface (reference: plotting.py:18-196, EnergySeries.plot2d
energypandas.py:679-802, plot3d :414-601, EnergyDataFrame.plot2d
:1010-1108).

Split cleanly into two layers:

1. **Distributed data prep** (always available): the period-unstack
   aggregations run as Spark jobs and return a bounded pandas matrix —
   plot outputs are pixel-capped (365 x 96 at worst), so the collect is
   safe by construction at any corpus scale.
2. **Driver-side rendering**: matplotlib is imported lazily; in
   environments without it the prep functions still work and the render
   functions raise a clear ImportError.
"""

from __future__ import annotations

from typing import TYPE_CHECKING, Any

import pandas as pd
from pyspark.sql import DataFrame

from energy_pandas_spark.operators.reshape import infer_step_seconds, unstack_to_periods

if TYPE_CHECKING:
    from energy_pandas_spark.core.frame import EnergyFrame

__all__ = [
    "heatmap_matrix",
    "plot2d",
    "plot3d",
    "save_and_show",
    "RESOLUTION_NAME",
]

#: axis-label vocabulary (reference energypandas.py:805-814)
RESOLUTION_NAME = {
    "H": "hours",
    "T": "minutes",
    "MIN": "minutes",
    "D": "days",
    "M": "months",
    "W": "weeks",
    "S": "seconds",
}


def heatmap_matrix(
    df: DataFrame,
    ts_col: str,
    value_col: str,
    periodlength: int | None = None,
) -> pd.DataFrame:
    """Distributed unstack -> bounded (periods x periodlength) pandas
    matrix. ``periodlength`` defaults to one day of steps at the
    inferred resolution (reference energypandas.py:752-760)."""
    step = infer_step_seconds(df, ts_col)
    if periodlength is None:
        periodlength = int(24 * 3600 / step)
    wide = unstack_to_periods(df, ts_col, value_col, periodlength, step)
    pdf = wide.toPandas().set_index("period").sort_index()
    pdf.columns = [int(c[1:]) for c in pdf.columns]
    return pdf


def _mpl():
    try:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        return plt
    except ImportError as e:
        raise ImportError(
            "matplotlib is required for rendering; the distributed data "
            "prep (heatmap_matrix) works without it"
        ) from e


def plot2d(
    ef: "EnergyFrame",
    periodlength: int | None = None,
    cmap: str = "RdBu",
    vmin: float | None = None,
    vmax: float | None = None,
    vcenter: float | None = None,
    axis_off: bool = True,
    colorbar: bool = False,
    figsize: tuple[int, int] | None = None,
    **kwargs: Any,
):
    """Heatmap of the period-unstacked series (reference
    energypandas.py:679-802): imshow of the (periods x steps) matrix,
    colorbar labelled with the unit."""
    if not ef.is_series:
        raise ValueError("plot2d renders one series; slice a column first")
    mat = heatmap_matrix(ef.spark_df, ef.index_col, ef.name, periodlength)
    plt = _mpl()
    fig, ax = plt.subplots(figsize=figsize)
    norm = None
    if vcenter is not None:
        from matplotlib.colors import TwoSlopeNorm

        norm = TwoSlopeNorm(vcenter, vmin=vmin, vmax=vmax)
    im = ax.imshow(
        mat.T, interpolation="nearest", vmin=vmin, vmax=vmax,
        cmap=plt.get_cmap(cmap), norm=norm, aspect="auto", **kwargs,
    )
    if axis_off:
        ax.set_axis_off()
    if colorbar:
        cb = fig.colorbar(im, ax=ax)
        if ef.unit is not None:
            cb.set_label(str(ef.unit))
    return fig, ax


def plot3d(
    ef: "EnergyFrame",
    periodlength: int | None = None,
    kind: str = "surface",
    cmap: str = "viridis",
    figsize: tuple[int, int] | None = None,
    **kwargs: Any,
):
    """3D (period x step x value) rendering (reference
    energypandas.py:414-601, kinds dispatched at :500-549): polygon
    (one filled curve per period, the reference's poly-collection at
    plotting.py:105-116/151-160), surface, wireframe, or contour over
    the unstacked matrix."""
    if not ef.is_series:
        raise ValueError("plot3d renders one series; slice a column first")
    import numpy as np

    mat = heatmap_matrix(ef.spark_df, ef.index_col, ef.name, periodlength)
    plt = _mpl()
    fig = plt.figure(figsize=figsize)
    ax = fig.add_subplot(projection="3d")
    X, Y = np.meshgrid(mat.columns.to_numpy(), mat.index.to_numpy())
    Z = mat.to_numpy()
    if kind == "surface":
        ax.plot_surface(X, Y, Z, cmap=cmap, **kwargs)
    elif kind == "wireframe":
        ax.plot_wireframe(X, Y, Z, **kwargs)
    elif kind == "contour":
        ax.contourf(X, Y, Z, cmap=cmap, **kwargs)
    elif kind == "polygon":
        from matplotlib.collections import PolyCollection

        xs = mat.columns.to_numpy(dtype=float)
        # one closed polygon under each period's curve (reference
        # plotting.py:151-160 _polygon_under_graph)
        verts = [
            [(xs[0], 0.0), *zip(xs, row), (xs[-1], 0.0)]
            for row in Z
        ]
        poly = PolyCollection(
            verts, cmap=plt.get_cmap(cmap),
            **{k: v for k, v in kwargs.items() if k != "zs"},
        )
        poly.set_array(np.asarray([row.mean() for row in Z]))
        ax.add_collection3d(
            poly, zs=mat.index.to_numpy(dtype=float), zdir="y"
        )
        ax.set_xlim(xs[0], xs[-1])
        ax.set_ylim(float(mat.index.min()), float(mat.index.max()) + 1)
        ax.set_zlim(float(np.nanmin(Z)), float(np.nanmax(Z)))
    else:
        raise ValueError(f"unsupported kind {kind!r}")
    return fig, ax


def save_and_show(
    fig,
    ax=None,
    save: bool = False,
    show: bool = False,
    close: bool = True,
    filename: str = "untitled",
    file_format: str = "png",
    dpi: int = 300,
    axis_off: bool = False,
    extent=None,
):
    """Save/show helper (reference plotting.py:18-102)."""
    plt = _mpl()
    if axis_off and ax is not None:
        ax.set_axis_off()
    if save:
        fig.savefig(
            f"{filename}.{file_format}", dpi=dpi, format=file_format,
            bbox_inches="tight" if extent == "tight" else None,
        )
    if show:
        plt.show()
    if close:
        plt.close(fig)
    return fig, ax
