"""Default SI <-> IP (inch-pound) unit conversion tables.

Behavioral parity with the reference's ``IP_DEFAULT_CONVERSION`` /
``SI_DEFAULT_CONVERSION`` (energy_pandas/units.py:43-141): the table maps
*nominal* units (so ``K`` -> ``R`` and ``deltaC`` -> ``deltaF`` are
distinct entries, and ``kW`` is distinct from ``W``), later duplicate
keys override earlier ones (the reference's dict literal lists ``W/m2``
twice — ``W/ft2`` wins), and the SI table is the inversion of the IP
table with last-wins collision handling (units.py:141), which makes e.g.
``Btu/lb`` map back to ``kJ/kg`` (not ``J/kg``) and ``lb/MWh`` to
``g/MJ``.

The pair list below states the same EnergyPlus SI->IP default-conversion
facts (from the EnergyPlus Input-Output Reference's unit-conversion
table) in source order matching the reference dict so the overrides
resolve identically. ``to_si``/``to_ip`` silently no-op when a unit has
no entry (energypandas.py:660-662, :672-674).
"""

from __future__ import annotations

from energy_pandas_spark.units.registry import Unit, unit_registry

__all__ = ["IP_DEFAULT_CONVERSION", "SI_DEFAULT_CONVERSION", "to_ip_unit", "to_si_unit"]

# (si, ip) spellings; order matters for duplicate-key override parity.
_PAIRS: tuple[tuple[str, str], ...] = (
    ("m3/s", "ft3/min"),
    ("W/K", "Btu/h-F"),
    ("kW", "kBtuh/h"),
    ("m2", "ft2"),
    ("m3", "ft3"),
    ("(kg/s)/W", "(lbm/sec)/(Btu/hr)"),
    ("1/K", "1/F"),
    ("1/m", "1/ft"),
    ("A/K", "A/F"),
    ("C", "F"),
    ("cm", "in"),
    ("cm2", "inch2"),
    ("deltaC", "deltaF"),
    ("g/GJ", "lb/MWh"),
    ("g/kg", "grains/lb"),
    ("g/MJ", "lb/MWh"),
    ("g/mol", "lb/mol"),
    ("g/m-s", "lb/ft-s"),
    ("g/m-s-K", "lb/ft-s-F"),
    ("GJ", "ton-hrs"),
    ("J", "Wh"),
    ("J/K", "Btu/F"),
    ("J/kg", "Btu/lb"),
    ("J/kg-K", "Btu/lb-F"),
    ("J/kg-K2", "Btu/lb-F2"),
    ("J/kg-K3", "Btu/lb-F3"),
    ("J/m2-K", "Btu/ft2-F"),
    ("J/m3", "Btu/ft3"),
    ("J/m3-K", "Btu/ft3-F"),
    ("K", "R"),
    ("K/m", "F/ft"),
    ("kg", "lb"),
    ("kg/J", "lb/Btu"),
    ("kg/kg-K", "lb/lb-F"),
    ("kg/m", "lb/ft"),
    ("kg/m2", "lb/ft2"),
    ("kg/m3", "lb/ft3"),
    ("kg/m-s", "lb/ft-s"),
    ("kg/m-s-K", "lb/ft-s-F"),
    ("kg/m-s-K2", "lb/ft-s-F2"),
    ("kg/Pa-s-m2", "lb/psi-s-ft2"),
    ("kg/s", "lb/s"),
    ("kg/s2", "lb/s2"),
    ("kg/s-m", "lb/s-ft"),
    ("kJ/kg", "Btu/lb"),
    ("kPa", "psi"),
    ("L/day", "pint/day"),
    ("L/GJ", "gal/kWh"),
    ("L/kWh", "pint/kWh"),
    ("L/MJ", "gal/kWh"),
    ("lux", "footcandles"),
    ("m", "ft"),
    ("m/hr", "ft/hr"),
    ("m/s", "ft/min"),
    ("m/yr", "inch/yr"),
    ("m2", "ft2"),
    ("m2/m", "ft2/ft"),
    ("m2/person", "ft2/person"),
    ("m2/s", "ft2/s"),
    ("m2-K/W", "ft2-F-hr/Btu"),
    ("m3", "ft3"),
    ("m3/GJ", "ft3/MWh"),
    ("m3/hr", "ft3/hr"),
    ("m3/hr-m2", "ft3/hr-ft2"),
    ("m3/hr-person", "ft3/hr-person"),
    ("m3/kg", "ft3/lb"),
    ("m3/m2", "ft3/ft2"),
    ("m3/MJ", "ft3/kWh"),
    ("m3/person", "ft3/person"),
    ("m3/s", "ft3/min"),
    ("m3/s-m", "ft3/min-ft"),
    ("m3/s-m2", "ft3/min-ft2"),
    ("m3/s-person", "ft3/min-person"),
    ("m3/s-W", "(ft3/min)/(Btu/h)"),
    ("N-m", "lbf-in"),
    ("N-s/m2", "lbf-s/ft2"),
    ("Pa", "psi"),
    ("percent/K", "percent/F"),
    ("person/m2", "person/ft2"),
    ("s/m", "s/ft"),
    ("V/K", "V/F"),
    ("W", "Btu/h"),
    ("W/(m3/s)", "W/(ft3/min)"),
    ("W/K", "Btu/h-F"),
    ("W/m", "Btu/h-ft"),
    ("W/m2", "Btu/h-ft2"),
    ("W/m2", "W/ft2"),
    ("W/m2-K", "Btu/h-ft2-F"),
    ("W/m2-K2", "Btu/h-ft2-F2"),
    ("W/m-K", "Btu-in/h-ft2-F"),
    ("W/m-K2", "Btu/h-F2-ft"),
    ("W/m-K3", "Btu/h-F3-ft"),
    ("W/person", "Btu/h-person"),
)

IP_DEFAULT_CONVERSION: dict[Unit, Unit] = {
    unit_registry.parse(si): unit_registry.parse(ip) for si, ip in _PAIRS
}

SI_DEFAULT_CONVERSION: dict[Unit, Unit] = {
    v: k for k, v in IP_DEFAULT_CONVERSION.items()
}


def to_ip_unit(unit: Unit) -> Unit | None:
    """Default IP unit for ``unit``, or None when unmapped (silent no-op
    contract of ``to_ip``, energypandas.py:672-674)."""
    return IP_DEFAULT_CONVERSION.get(unit)


def to_si_unit(unit: Unit) -> Unit | None:
    """Default SI unit for ``unit``, or None when unmapped
    (energypandas.py:660-662)."""
    return SI_DEFAULT_CONVERSION.get(unit)
