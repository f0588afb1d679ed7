"""Units layer tests — ports every behavioral assertion of the
reference's TestUnits (tests/test_energypandas.py:270-338) plus
conversion-coefficient checks and property-based round trips.
"""

from __future__ import annotations

import math

import pytest
from hypothesis import given, strategies as st

from energy_pandas_spark.units import (
    IncompatibleUnitsError,
    IP_DEFAULT_CONVERSION,
    SI_DEFAULT_CONVERSION,
    dash_to_mul,
    to_ip_unit,
    to_si_unit,
    unit_registry as ur,
    wrap_denominator,
)

# The 39 EnergyPlus unit strings from test_energypandas.py:272-311.
UNITS_CORPUS = [
    "deg", "m", "m2", "m3", "s", "Hz", "C", "K", "deltaC", "m/s", "J", "W",
    "kg", "N", "kg/s", "m3/s", "Pa", "J/kg", "kg/m3", "W/m2", "J/kg-K",
    "W/m-K", "m2/s", "W/m2-K", "m2-K/W", "V", "A", "lx", "lm", "cd",
    "cd/m2", "kg/m-s", "N-s/m2", "kg/kg-K", "m3/kg",
]


class TestPreprocessors:
    # reference tests at test_energypandas.py:314-318
    def test_wrap_denominator(self):
        assert wrap_denominator("W/m-K") == "W/(m-K)"
        assert wrap_denominator("W") == "W"

    def test_dash_to_mul(self):
        assert dash_to_mul("W/(m-K)") == "W/(m*K)"


class TestGrammar:
    @pytest.mark.parametrize("u", UNITS_CORPUS)
    def test_parse(self, u):
        # test_energypandas.py:320-325 — every string parses
        ur.parse(u)

    @pytest.mark.parametrize("u", UNITS_CORPUS)
    def test_to_ip_lookup(self, u):
        # test_energypandas.py:327-332 — to_ip never raises; silent no-op
        pu = ur.parse(u)
        tgt = to_ip_unit(pu)
        if tgt is not None:
            ur.conversion(pu, tgt)

    @pytest.mark.parametrize("u", UNITS_CORPUS)
    def test_to_si_lookup(self, u):
        # test_energypandas.py:334-338
        pu = ur.parse(u)
        tgt = to_si_unit(pu)
        if tgt is not None:
            ur.conversion(pu, tgt)

    def test_celsius_not_coulomb(self):
        # energyplus_en.txt:49 override
        assert ur.parse("C") == ur.parse("degC") == ur.parse("celsius")
        assert ur.parse("C") != ur.parse("coulomb")

    def test_exponent_suffixes(self):
        assert ur.parse("m2") == ur.parse("m**2")
        assert ur.parse("kg/m3") == ur.parse("kg/m**3")
        assert ur.parse("J/kg-K2") == ur.parse("J/(kg*K**2)")

    def test_prefixes(self):
        s, b = ur.conversion("kW", "W")
        assert (s, b) == (1000.0, 0.0)
        s, _ = ur.conversion("cm", "m")
        assert math.isclose(s, 0.01)
        s, _ = ur.conversion("GJ", "J")
        assert s == 1e9


class TestConversions:
    def test_affine_celsius_kelvin(self):
        # the golden value check: to_units("kelvin") == series + 273.15
        # (test_energypandas.py:80-87)
        assert ur.conversion("degC", "kelvin") == (1.0, 273.15)
        assert ur.convert(25.0, "C", "K") == 298.15

    def test_fahrenheit(self):
        s, b = ur.conversion("degC", "degF")
        assert math.isclose(25.0 * s + b, 77.0)
        s, b = ur.conversion("K", "degR")
        assert math.isclose(s, 1.8) and b == 0.0

    def test_delta_units_have_no_offset(self):
        s, b = ur.conversion("deltaC", "deltaF")
        assert math.isclose(s, 1.8) and b == 0.0

    def test_nominal_identity(self):
        # K and deltaC convert 1:1 but are distinct table keys
        assert ur.parse("K") != ur.parse("deltaC")
        assert to_ip_unit(ur.parse("K")) == ur.parse("R")
        assert to_ip_unit(ur.parse("deltaC")) == ur.parse("deltaF")

    def test_known_factors(self):
        s, _ = ur.conversion("W", "Btu/h")
        assert math.isclose(s, 3.412141633, rel_tol=1e-9)
        s, _ = ur.conversion("m2-K/W", "ft2-F-hr/Btu")
        assert math.isclose(s, 5.678263341, rel_tol=1e-9)
        s, _ = ur.conversion("m", "ft")
        assert math.isclose(s, 1 / 0.3048)

    def test_incompatible(self):
        with pytest.raises(IncompatibleUnitsError):
            ur.conversion("m", "kg")

    def test_table_overrides(self):
        # dict-literal last-wins parity (units.py:130-131 lists W/m2 twice)
        assert to_ip_unit(ur.parse("W/m2")) == ur.parse("W/ft2")
        # inverted-table collisions (units.py:141): Btu/lb -> kJ/kg
        assert to_si_unit(ur.parse("Btu/lb")) == ur.parse("kJ/kg")
        assert to_si_unit(ur.parse("lb/MWh")) == ur.parse("g/MJ")

    def test_tables_cover_reference_surface(self):
        assert len(IP_DEFAULT_CONVERSION) == 81
        assert len(SI_DEFAULT_CONVERSION) == 75


class TestCorpusRoundTripValues:
    """Value-level SI<->IP round trips for the full reference corpus —
    exceeds the reference, which only smoke-tests that to_ip/to_si do
    not raise (test_energypandas.py:327-338)."""

    @pytest.mark.parametrize("u", UNITS_CORPUS)
    def test_to_ip_value_roundtrip(self, u):
        pu = ur.parse(u)
        tgt = to_ip_unit(pu)
        if tgt is None:
            return  # silent no-op contract
        s, b = ur.conversion(pu, tgt)
        si, bi = ur.conversion(tgt, pu)
        for x in (0.0, 1.0, -40.0, 123.456):
            y = si * (s * x + b) + bi
            assert math.isclose(x, y, rel_tol=1e-9, abs_tol=1e-9), (
                f"{u} -> {tgt} -> {u}: {x} became {y}"
            )
        # inverse coefficients are the algebraic inverse of the forward
        assert math.isclose(s * si, 1.0, rel_tol=1e-9)
        assert math.isclose(si * b + bi, 0.0, abs_tol=1e-9)

    @pytest.mark.parametrize("u", UNITS_CORPUS)
    def test_to_si_value_roundtrip(self, u):
        pu = ur.parse(u)
        tgt = to_si_unit(pu)
        if tgt is None:
            return
        s, b = ur.conversion(pu, tgt)
        si, bi = ur.conversion(tgt, pu)
        for x in (0.0, 1.0, -40.0, 987.25):
            y = si * (s * x + b) + bi
            assert math.isclose(x, y, rel_tol=1e-9, abs_tol=1e-9)

    def test_ip_si_value_goldens(self):
        # spot values against published EnergyPlus conversion constants
        s, b = ur.conversion("C", to_ip_unit(ur.parse("C")))
        assert math.isclose(25.0 * s + b, 77.0)  # 25 degC = 77 degF
        s, _ = ur.conversion("m", to_ip_unit(ur.parse("m")))
        assert math.isclose(100.0 * s, 328.0839895, rel_tol=1e-9)
        s, _ = ur.conversion("W/m2", to_ip_unit(ur.parse("W/m2")))
        assert math.isclose(s, 0.09290304, rel_tol=1e-6)  # W/m2 -> W/ft2


@given(
    st.sampled_from(["C", "K", "degF", "degR"]),
    st.sampled_from(["C", "K", "degF", "degR"]),
    st.floats(min_value=-1e6, max_value=1e6, allow_nan=False),
)
def test_roundtrip_temperature(u1, u2, x):
    y = ur.convert(ur.convert(x, u1, u2), u2, u1)
    assert math.isclose(x, y, rel_tol=1e-9, abs_tol=1e-6)


@given(
    st.sampled_from(["W", "kW", "Btu/h", "J/s", "MW"]),
    st.sampled_from(["W", "kW", "Btu/h", "J/s", "MW"]),
    st.floats(min_value=0, max_value=1e9, allow_nan=False),
)
def test_roundtrip_power(u1, u2, x):
    y = ur.convert(ur.convert(x, u1, u2), u2, u1)
    assert math.isclose(x, y, rel_tol=1e-9, abs_tol=1e-9)
