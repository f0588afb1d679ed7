"""Driver-side units layer (no executor code; see registry.py docstring)."""

from energy_pandas_spark.units.registry import (
    IncompatibleUnitsError,
    UndefinedUnitError,
    Unit,
    UnitRegistry,
    dash_to_mul,
    unit_registry,
    wrap_denominator,
)
from energy_pandas_spark.units.tables import (
    IP_DEFAULT_CONVERSION,
    SI_DEFAULT_CONVERSION,
    to_ip_unit,
    to_si_unit,
)

__all__ = [
    "IncompatibleUnitsError",
    "UndefinedUnitError",
    "Unit",
    "UnitRegistry",
    "unit_registry",
    "wrap_denominator",
    "dash_to_mul",
    "IP_DEFAULT_CONVERSION",
    "SI_DEFAULT_CONVERSION",
    "to_ip_unit",
    "to_si_unit",
]
