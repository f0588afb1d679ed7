"""Plotting layer: distributed data prep is always testable; rendering
is smoke-tested only when matplotlib is installed (it is not in the
build environment — reference smoke tests use show=False similarly,
test_energypandas.py:144-165).
"""

from __future__ import annotations

import pytest

from energy_pandas_spark import EnergyFrame
from energy_pandas_spark.plotting import heatmap_matrix, plot2d

HAVE_MPL = True
try:  # pragma: no cover
    import matplotlib  # noqa: F401
except ImportError:
    HAVE_MPL = False


class TestHeatmapMatrix:
    def test_hourly_default_daylength(self, spark):
        es = EnergyFrame.from_range(spark, 96, name="v")
        mat = heatmap_matrix(es.spark_df, "ts", "v")
        assert mat.shape == (4, 24)
        assert mat.loc[0, 0] == 0.0 and mat.loc[3, 23] == 95.0

    def test_15min_resolution(self, spark):
        # F5-style: 15-minute resolution -> 96 steps/day
        es = EnergyFrame.from_range(spark, 96 * 2, frequency="15min", name="v")
        mat = heatmap_matrix(es.spark_df, "ts", "v")
        assert mat.shape == (2, 96)

    def test_explicit_periodlength(self, spark):
        es = EnergyFrame.from_range(spark, 48, name="v")
        mat = heatmap_matrix(es.spark_df, "ts", "v", periodlength=12)
        assert mat.shape == (4, 12)


@pytest.mark.skipif(not HAVE_MPL, reason="matplotlib not installed")
class TestRender:  # pragma: no cover
    def test_plot2d_smoke(self, spark):
        es = EnergyFrame.from_range(spark, 96, units="degC", name="v")
        fig, ax = plot2d(es, colorbar=True)
        assert fig is not None


class TestGating:
    @pytest.mark.skipif(HAVE_MPL, reason="matplotlib installed")
    def test_clear_import_error(self, spark):
        es = EnergyFrame.from_range(spark, 24, name="v")
        with pytest.raises(ImportError, match="matplotlib is required"):
            plot2d(es)
