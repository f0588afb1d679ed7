"""EnergyFrame facade tests — ports the reference's TestEnergySeries /
TestEnergyDataFrame behavioral assertions (tests/test_energypandas.py:
60-256) to the Spark engine.
"""

from __future__ import annotations

import math

import numpy as np
import pytest

from energy_pandas_spark import EnergyFrame
from energy_pandas_spark.units import unit_registry as ur


@pytest.fixture(scope="module")
def es(spark):
    # fixture `es`: 100 hourly points from 2018-01-01, degC, extra meta
    # (test_energypandas.py:43-57)
    return EnergyFrame.from_range(
        spark, 100, units="degC", name="Temp", meta={"extrameta": "this"}
    )


@pytest.fixture(scope="module")
def edf_mixed(spark):
    # fixture `edf_from_e_series`: hourly year, degC + degK columns
    # (test_energypandas.py:25-40)
    a = EnergyFrame.from_range(spark, 8760, name="Series 1 degC")
    b = EnergyFrame.from_range(spark, 8760, name="Series 2 degK")
    df = a.spark_df.join(
        b.spark_df.withColumnRenamed("Series 2 degK", "b"), "ts"
    ).withColumnRenamed("b", "Series 2 degK")
    return EnergyFrame(
        df,
        units={"Series 1 degC": "degC", "Series 2 degK": "degK"},
        index_col="ts",
    )


class TestSeriesSemantics:
    def test_unit_conversion_values(self, es):
        # to_units("kelvin") == series + 273.15 (test :80-87)
        k = es.to_units("kelvin")
        v, kv = es.collect_values(), k.collect_values()
        assert np.allclose(kv, np.array(v) + 273.15)
        assert k.unit == ur.parse("K")

    def test_ops_preserve_units(self, es):
        # (es * 2).units == es.units (test :75-78)
        assert (es * 2).unit == es.unit
        assert (es + 10).unit == es.unit
        assert (2 * es).unit == es.unit

    def test_meta_preserved(self, es):
        assert es.extrameta == "this"
        assert (es * 2).extrameta == "this"
        assert es["Temp"].extrameta == "this"

    def test_si_ip_roundtrip(self, es):
        # SI/IP round trips (test :89-97)
        ip = es.to_ip()
        assert ip.unit == ur.parse("F")
        back = ip.to_si()
        assert back.unit == ur.parse("C")
        assert np.allclose(back.collect_values(), es.collect_values())

    def test_mixed_unit_ops_left_wins(self, spark):
        # degC * degK keeps degC (test :99-104, :193-197)
        a = EnergyFrame.from_range(spark, 24, units="degC", name="x")
        b = EnergyFrame.from_range(spark, 24, units="degK", name="x")
        assert (a * b).unit == ur.parse("degC")
        assert (b * a).unit == ur.parse("degK")

    def test_normalize(self, es):
        # normalize: values in [0,1], sum == 50 (test :106-114)
        n = es.normalize()
        vals = n.collect_values()
        assert math.isclose(sum(vals), 50.0)
        assert min(vals) == 0.0 and max(vals) == 1.0
        assert n.unit == ur.parse("dimensionless")

    def test_monthly(self, es):
        # monthly mean of 100 hourly points = 49.5 in January (test :129-131)
        m = es.monthly()
        rows = m.to_pandas()
        assert len(rows) == 1
        assert rows["Temp"][0] == 49.5
        assert m.meta["frequency"] == "M"

    def test_ldc(self, es):
        curve = es.ldc.to_pandas()
        assert list(curve["Temp"]) == sorted(
            (float(x) for x in range(100)), reverse=True
        )
        assert list(curve["idx"]) == list(range(100))
        assert es.ldc.unit == es.unit

    def test_p_max_capacity_factor_time_at_min(self, es):
        assert es.p_max() == 99.0
        assert math.isclose(es.capacity_factor(), 49.5 / 99.0)
        tmin = es.time_at_min()
        assert (tmin.year, tmin.month, tmin.day, tmin.hour) == (2018, 1, 1, 0)

    def test_source_side(self, es):
        # x * (1 - 1/SCOPH) (energypandas.py:366-382)
        v = np.array(es.collect_values())
        assert np.allclose(
            es.source_side(scoph=4.0).collect_values(), v * 0.75
        )
        assert np.allclose(
            es.source_side(scopc=3.0).collect_values(), v * (1 + 1 / 3)
        )
        with pytest.raises(ValueError):
            es.source_side()

    def test_ldc_source(self, es):
        out = es.ldc_source(scoph=4.0, scopc=3.0).to_pandas()
        expected = sorted((float(x) for x in range(100)), reverse=True)
        expected = [x * 0.75 if x > 0 else x * (1 + 1 / 3) for x in expected]
        assert np.allclose(out["Temp"], expected)


class TestFrameSemantics:
    def test_slice_keeps_units(self, edf_mixed):
        # per-column unit retention on slices (test :187-191, :224-240)
        s1 = edf_mixed["Series 1 degC"]
        assert s1.is_series and s1.unit == ur.parse("degC")
        s2 = edf_mixed["Series 2 degK"]
        assert s2.unit == ur.parse("K")
        both = edf_mixed[["Series 1 degC", "Series 2 degK"]]
        assert both.units["Series 1 degC"] == ur.parse("degC")

    def test_mixed_unit_frame_convert(self, edf_mixed):
        # to_units("degR") converts each column from its OWN unit
        # (test :199-203)
        r = edf_mixed.to_units("degR")
        src = edf_mixed.to_pandas()
        out = r.to_pandas()
        assert np.allclose(out["Series 1 degC"], (src["Series 1 degC"] + 273.15) * 1.8)
        assert np.allclose(out["Series 2 degK"], src["Series 2 degK"] * 1.8)
        assert all(u == ur.parse("degR") for u in r.units.values())

    def test_frame_scalar_equivalence(self, spark):
        # edf + 273.15 == edf.to_units("K") for degC frame (test :205-212)
        ef = EnergyFrame.from_range(spark, 100, units="C", name="Temp")
        a = ef.to_units("kelvin").collect_values()
        b = (ef + 273.15).collect_values()
        assert np.allclose(a, b)

    def test_frame_normalize(self, edf_mixed):
        n = edf_mixed.normalize()
        pdf = n.to_pandas()
        for c in ("Series 1 degC", "Series 2 degK"):
            assert math.isclose(pdf[c].sum(), 8760 / 2)
        assert all(u == ur.parse("dimensionless") for u in n.units.values())

    def test_axis1_reductions_keep_shared_unit(self, spark):
        # mean(axis=1)/sum(axis=1) over uniform-unit frame (test :242-244)
        a = EnergyFrame.from_range(spark, 48, units="degC", name="a")
        df = a.spark_df.withColumn("b", a.spark_df["a"] * 2)
        ef = EnergyFrame(df, units={"a": "degC", "b": "degC"}, index_col="ts")
        m = ef.mean(axis=1)
        assert m.unit == ur.parse("degC")
        pdf = m.to_pandas()
        src = ef.to_pandas()
        assert np.allclose(pdf["mean"], (src["a"] + src["b"]) / 2)
        s = ef.sum(axis=1)
        assert s.unit == ur.parse("degC")
        # mixed units -> no shared unit
        ef2 = EnergyFrame(df, units={"a": "degC", "b": "K"}, index_col="ts")
        assert ef2.mean(axis=1).unit is None

    def test_nseries(self, edf_mixed):
        assert edf_mixed.nseries == 2
        assert edf_mixed["Series 1 degC"].nseries == 1

    def test_units_metadata_stamped(self, es):
        field = {f.name: f for f in es.df.schema.fields}["Temp"]
        assert field.metadata.get("units") == "degC"

    def test_parquet_round_trip_rehydrates_units(self, spark, tmp_path):
        ef = EnergyFrame.from_range(spark, 24, units="degC", name="Temp")
        k = ef.to_units("kelvin")
        path = str(tmp_path / "rt")
        k.to_parquet(path)
        back = EnergyFrame.read_parquet(spark, path)
        assert back.units["Temp"] == ur.parse("kelvin")
        assert back.index_col == "ts"
        assert back.spark_df.count() == 24
        # values preserved (degC range(24) + 273.15)
        vals = sorted(r.Temp for r in back.spark_df.collect())
        assert abs(vals[0] - 273.15) < 1e-9 and abs(vals[-1] - 296.15) < 1e-9

    def test_csv_round_trip_rehydrates_units_and_types(self, spark, tmp_path):
        ef = EnergyFrame.from_range(spark, 24, units="degC", name="Temp")
        k = ef.to_units("kelvin")
        path = str(tmp_path / "rt_csv")
        k.to_csv(path)
        back = EnergyFrame.read_csv(spark, path)
        assert back.units["Temp"] == ur.parse("kelvin")
        assert back.index_col == "ts"  # restored from the sidecar
        # saved schema keeps the timestamp typed (no inference scan)
        assert dict(back.spark_df.dtypes)["ts"] == "timestamp"
        vals = sorted(r.Temp for r in back.spark_df.collect())
        assert abs(vals[0] - 273.15) < 1e-9 and abs(vals[-1] - 296.15) < 1e-9

    def test_json_round_trip_rehydrates_units_and_types(self, spark, tmp_path):
        ef = EnergyFrame.from_range(spark, 24, units="degC", name="Temp")
        path = str(tmp_path / "rt_json")
        ef.to_json(path)
        back = EnergyFrame.read_json(spark, path)
        assert back.units["Temp"] == ur.parse("degC")
        assert back.index_col == "ts"
        assert dict(back.spark_df.dtypes)["ts"] == "timestamp"
        assert back.spark_df.count() == 24

    def test_orc_round_trip_rehydrates_units_and_types(self, spark, tmp_path):
        ef = EnergyFrame.from_range(spark, 24, units="degC", name="Temp")
        k = ef.to_units("kelvin")
        path = str(tmp_path / "rt_orc")
        k.to_orc(path)
        back = EnergyFrame.read_orc(spark, path)
        assert back.units["Temp"] == ur.parse("kelvin")
        assert back.index_col == "ts"
        assert dict(back.spark_df.dtypes)["ts"] == "timestamp"
        vals = sorted(r.Temp for r in back.spark_df.collect())
        assert abs(vals[0] - 273.15) < 1e-9 and abs(vals[-1] - 296.15) < 1e-9

    def test_read_csv_without_sidecar_still_loads(self, spark, tmp_path):
        path = str(tmp_path / "plain_csv")
        spark.range(5).selectExpr("id", "id * 1.5 AS v").write.option(
            "header", "true"
        ).csv(path)
        back = EnergyFrame.read_csv(spark, path)
        assert back.spark_df.count() == 5
        assert back.units == {"id": None, "v": None} or all(
            u is None for u in back.units.values()
        )


def test_filter_keeps_units_and_meta(spark):
    from pyspark.sql import functions as F

    ef = EnergyFrame.from_range(spark, 24, units="degC", name="Temp",
                                meta={"extrameta": "this"})
    half = ef.filter(F.col("Temp") >= 12)
    assert half.spark_df.count() == 12
    assert half.units["Temp"] == ur.parse("degC")
    assert half.extrameta == "this"
    # SQL-string condition too, and chained conversion still works
    k = ef.where("Temp < 2").to_units("kelvin")
    vals = sorted(r.Temp for r in k.spark_df.collect())
    assert vals == [273.15, 274.15]


class TestCoreReviewRegressions:
    """Regressions from the core-parity review: skipna axis-1
    reductions, reflected operators, wrapper guards."""

    def test_axis1_skipna_like_pandas(self, spark):
        from energy_pandas_spark import EnergyFrame

        df = spark.createDataFrame(
            [(1, 1.0, 3.0), (2, 2.0, None), (3, None, None)],
            "ts long, a double, b double",
        )
        ef = EnergyFrame(df, units={"a": "W", "b": "W"}, index_col="ts")
        m = {r["ts"]: r["mean"] for r in ef.mean(axis=1).df.collect()}
        s = {r["ts"]: r["sum"] for r in ef.sum(axis=1).df.collect()}
        assert m[1] == 2.0 and s[1] == 4.0
        assert m[2] == 2.0 and s[2] == 2.0   # NULL cell skipped
        assert m[3] is None and s[3] == 0.0  # pandas all-NaN semantics

    def test_reflected_sub_div(self, spark):
        from energy_pandas_spark import EnergyFrame

        df = spark.createDataFrame([(1, 4.0)], "ts long, v double")
        ef = EnergyFrame(df, units={"v": "W"}, index_col="ts")
        assert (10.0 - ef).df.collect()[0]["v"] == 6.0
        assert (8.0 / ef).df.collect()[0]["v"] == 2.0
        assert (ef - 1.0).df.collect()[0]["v"] == 3.0  # unchanged

    def test_multicolumn_guards_raise_clearly(self, spark):
        import pytest as _pt

        from energy_pandas_spark import EnergyFrame

        df = spark.createDataFrame(
            [(1, 1.0, 2.0)], "ts long, a double, b double"
        )
        ef = EnergyFrame(df, units={"a": "W", "b": "W"}, index_col="ts")
        for call in (
            lambda: ef.ldc_source(),
            lambda: ef.time_at_min(),
            lambda: ef.unstack_to_periods(4),
        ):
            with _pt.raises(ValueError, match="single value column"):
                call()

    def test_ewma_null_keys_survive(self, spark):
        from energy_pandas_spark.operators.windows import ewma

        df = spark.createDataFrame(
            [("a", 1, 1.0), (None, 1, 10.0), ("a", 2, 2.0), (None, 2, 20.0)],
            "k string, t long, v double",
        )
        out = ewma(df, "t", "v", alpha=0.5, by="k").collect()
        nulls = sorted(
            (r["t"], r["ewma"]) for r in out if r["k"] is None
        )
        # NULL is a real group with its own recurrence, not a crash
        assert nulls[0] == (1, 10.0) and abs(nulls[1][1] - 15.0) < 1e-9


def test_ntz_epoch_micros_ignores_session_dst(spark):
    """epoch_micros on TIMESTAMP_NTZ must be a pure wall-clock read:
    timestamp_diff routes NTZ through the session zone, collapsing the
    spring-forward hour onto its neighbor in DST-observing sessions."""
    from pyspark.sql import functions as F

    from energy_pandas_spark.util import epoch_micros

    old = spark.conf.get("spark.sql.session.timeZone")
    spark.conf.set("spark.sql.session.timeZone", "America/New_York")
    try:
        rows = [(f"2018-03-11 {h:02d}:00:00",) for h in range(6)]
        ntz = spark.createDataFrame(rows, "ts string").select(
            F.col("ts").cast("timestamp_ntz").alias("ts")
        )
        micros = [
            r["m"]
            for r in ntz.select(epoch_micros(ntz, "ts").alias("m"))
            .orderBy("ts")
            .collect()
        ]
        diffs = [b - a for a, b in zip(micros, micros[1:])]
        assert diffs == [3_600_000_000] * 5  # 02:00 != 03:00
    finally:
        spark.conf.set("spark.sql.session.timeZone", old)
