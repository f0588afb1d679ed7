"""Driver-side units-of-measure system for the EnergyPlus unit grammar.

A from-scratch replacement for the reference's pint-based registry
(reference: energy_pandas/units.py:1-141 and energyplus_en.txt:1-49).
pint is intentionally NOT a dependency: the engine only ever needs
*affine conversion coefficients* ``y = slope * x + intercept`` derived on
the driver and compiled into Spark Column expressions, so a compact
registry with nominal unit identity is all that is required.

Semantics replicated from the reference:

- Two string preprocessors run before parsing (units.py:14-30, applied in
  order at units.py:38): ``wrap_denominator`` encloses everything after
  the first ``/`` in parentheses ("W/m-K" -> "W/(m-K)"), then
  ``dash_to_mul`` rewrites ``-`` to ``*`` ("W/(m-K)" -> "W/(m*K)").
- EnergyPlus writes exponents as bare digit suffixes ("kg/m3", "J/kg-K2",
  energyplus_en.txt:24-34); the parser resolves any trailing-digit token
  as ``base ** digits``.
- ``C`` resolves to degree Celsius, NOT coulomb (the override at
  energyplus_en.txt:49), with the affine offset 273.15 K.
- ``deltaC`` / ``deltaF`` are interval (delta) temperature units: same
  scale as their absolute counterparts but no offset
  (energyplus_en.txt:16-17).
- ``person`` is dimensionless, ``percent`` is 0.01 count, ``ach`` is
  dimensionless, ``kBtuh = 1000 * Btu * hour`` (sic — the reference
  multiplies by hour rather than dividing, energyplus_en.txt:43-46; we
  replicate that definition so IP-table conversions agree).

Unit identity is *nominal* (by named-component composition), exactly like
pint's: ``K`` and ``deltaC`` convert 1:1 but are distinct keys in the
IP/SI default-conversion tables, and ``kW`` is distinct from ``W``.
"""

from __future__ import annotations

import math
import re
from dataclasses import dataclass

__all__ = [
    "Unit",
    "UnitRegistry",
    "IncompatibleUnitsError",
    "UndefinedUnitError",
    "unit_registry",
]


class IncompatibleUnitsError(ValueError):
    """Raised when converting between units of different dimensionality."""


class UndefinedUnitError(ValueError):
    """Raised when a unit token cannot be resolved."""


# ---------------------------------------------------------------------------
# Preprocessors (reference: units.py:14-30; order fixed at units.py:38)
# ---------------------------------------------------------------------------


def wrap_denominator(s: str) -> str:
    """Enclose everything after the first ``/`` in parentheses.

    "W/m-K" -> "W/(m-K)"; "(kg/s)/W" -> "(kg/(s)/W)" — matches the
    token-level behavior of the reference's ``underline_dash``
    (units.py:14-25) because the first ``/`` token is the first ``/``
    character.
    """
    i = s.find("/")
    if i == -1:
        return s
    return s[: i + 1] + "(" + s[i + 1 :] + ")"


def dash_to_mul(s: str) -> str:
    """Replace '-' with '*' (reference: units.py:28-30)."""
    return s.replace("-", "*")


# ---------------------------------------------------------------------------
# Dimension vectors: (m, kg, s, K, A, cd, mol)
# ---------------------------------------------------------------------------

_NDIM = 7
_ZERO = (0,) * _NDIM


def _dim(**kw: int) -> tuple[int, ...]:
    order = ("m", "kg", "s", "K", "A", "cd", "mol")
    return tuple(kw.get(k, 0) for k in order)


def _dim_mul(a: tuple[int, ...], b: tuple[int, ...], sign: int = 1) -> tuple[int, ...]:
    return tuple(x + sign * y for x, y in zip(a, b))


def _dim_pow(a: tuple[int, ...], p: int) -> tuple[int, ...]:
    return tuple(x * p for x in a)


# ---------------------------------------------------------------------------
# Unit value object
# ---------------------------------------------------------------------------


@dataclass(frozen=True)
class Unit:
    """An immutable unit: nominal parts + derived (scale, dims, offset).

    ``parts`` is a sorted tuple of (label, exponent) pairs, where label is
    the canonical (possibly SI-prefixed) unit symbol. Equality and hashing
    are *nominal* — by parts only — mirroring pint Unit equality so the
    IP/SI conversion tables distinguish e.g. ``K`` from ``deltaC`` and
    ``W`` from ``kW`` (reference keys the tables by pint units,
    units.py:43-138).
    """

    parts: tuple[tuple[str, int], ...]
    scale: float
    dims: tuple[int, ...]
    offset: float = 0.0

    # -- identity ----------------------------------------------------------
    def __eq__(self, other: object) -> bool:
        if not isinstance(other, Unit):
            return NotImplemented
        return self.parts == other.parts

    def __hash__(self) -> int:
        return hash(self.parts)

    # -- algebra (offset never survives composition) -----------------------
    def __mul__(self, other: "Unit") -> "Unit":
        return Unit(
            _merge_parts(self.parts, other.parts, 1),
            self.scale * other.scale,
            _dim_mul(self.dims, other.dims),
        )

    def __truediv__(self, other: "Unit") -> "Unit":
        return Unit(
            _merge_parts(self.parts, other.parts, -1),
            self.scale / other.scale,
            _dim_mul(self.dims, other.dims, -1),
        )

    def __pow__(self, p: int) -> "Unit":
        return Unit(
            tuple(sorted((n, e * p) for n, e in self.parts)),
            self.scale**p,
            _dim_pow(self.dims, p),
        )

    # -- display -----------------------------------------------------------
    def __str__(self) -> str:
        if not self.parts:
            return "dimensionless"
        num = [self._part_str(n, e) for n, e in self.parts if e > 0]
        den = [self._part_str(n, -e) for n, e in self.parts if e < 0]
        if not num:
            return "1/" + "-".join(den) if den else "dimensionless"
        out = "-".join(num)
        if den:
            out += "/" + "-".join(den)
        return out

    @staticmethod
    def _part_str(name: str, exp: int) -> str:
        return name if exp == 1 else f"{name}{exp}"

    def __repr__(self) -> str:
        return f"Unit({self})"

    @property
    def dimensionless(self) -> bool:
        return self.dims == _ZERO


def _merge_parts(
    a: tuple[tuple[str, int], ...], b: tuple[tuple[str, int], ...], sign: int
) -> tuple[tuple[str, int], ...]:
    acc: dict[str, int] = {}
    for n, e in a:
        acc[n] = acc.get(n, 0) + e
    for n, e in b:
        acc[n] = acc.get(n, 0) + sign * e
    return tuple(sorted((n, e) for n, e in acc.items() if e != 0))


# ---------------------------------------------------------------------------
# Registry
# ---------------------------------------------------------------------------

# Exact legal/NIST constants.
_FT = 0.3048
_IN = 0.0254
_LB = 0.45359237
_BTU = 1055.05585262  # International Table Btu
_GAL = 0.003785411784  # US liquid gallon, m^3
_LBF = 4.4482216152605
_HOUR = 3600.0
_DEG_F_SCALE = 5.0 / 9.0

_PREFIXES: dict[str, float] = {
    "Y": 1e24, "Z": 1e21, "E": 1e18, "P": 1e15, "T": 1e12, "G": 1e9,
    "M": 1e6, "k": 1e3, "h": 1e2, "da": 1e1, "d": 1e-1, "c": 1e-2,
    "m": 1e-3, "µ": 1e-6, "u": 1e-6, "n": 1e-9, "p": 1e-12, "f": 1e-15,
}

_TOKEN_RE = re.compile(
    r"\s*(?:(?P<num>\d+\.\d*|\.\d+|\d+)"
    r"|(?P<name>[A-Za-z_°µ%][A-Za-z_°µ%0-9]*|%)"
    r"|(?P<op>\*\*|[*/()^]))"
)


class UnitRegistry:
    """Parse EnergyPlus-style unit strings into :class:`Unit` objects and
    derive affine conversion coefficients between them.
    """

    def __init__(self) -> None:
        # canonical symbol -> (scale, dims, offset)
        self._defs: dict[str, tuple[float, tuple[int, ...], float]] = {}
        self._aliases: dict[str, str] = {}
        # per-instance parse cache (an @lru_cache on the bound method
        # would pin every registry instance in a class-level cache and
        # serve stale parses after define())
        self._parse_cache: dict[str, Unit] = {}
        self._load_defaults()

    # -- definition helpers -------------------------------------------------
    def define(
        self,
        symbol: str,
        scale: float,
        dims: tuple[int, ...] = _ZERO,
        offset: float = 0.0,
        aliases: tuple[str, ...] = (),
    ) -> None:
        self._defs[symbol] = (scale, dims, offset)
        for a in aliases:
            self._aliases[a] = symbol
        self._parse_cache.clear()

    def _load_defaults(self) -> None:
        d = self.define
        # SI base + named derived units
        d("m", 1.0, _dim(m=1), aliases=("meter", "meters", "metre"))
        d("g", 1e-3, _dim(kg=1), aliases=("gram", "grams"))
        d("kg", 1.0, _dim(kg=1), aliases=("kilogram", "kilograms"))
        d("s", 1.0, _dim(s=1), aliases=("sec", "secs", "second", "seconds"))
        d("A", 1.0, _dim(A=1), aliases=("amp", "ampere", "amperes"))
        d("cd", 1.0, _dim(cd=1), aliases=("candela",))
        d("mol", 1.0, _dim(mol=1), aliases=("mole", "moles"))
        d("K", 1.0, _dim(K=1), aliases=("kelvin", "degK", "degree_Kelvin", "°K"))
        d("rad", 1.0, aliases=("radian", "radians"))
        d("sr", 1.0, aliases=("steradian",))
        d("count", 1.0, aliases=("counts", "each", "item", "_"))
        d("Hz", 1.0, _dim(s=-1), aliases=("hertz",))
        d("N", 1.0, _dim(kg=1, m=1, s=-2), aliases=("newton", "newtons"))
        d("Pa", 1.0, _dim(kg=1, m=-1, s=-2), aliases=("pascal", "pascals"))
        d("J", 1.0, _dim(kg=1, m=2, s=-2), aliases=("joule", "joules"))
        d("W", 1.0, _dim(kg=1, m=2, s=-3), aliases=("watt", "watts"))
        d("V", 1.0, _dim(kg=1, m=2, s=-3, A=-1), aliases=("volt", "volts"))
        d("coulomb", 1.0, _dim(A=1, s=1))  # NOT "C" — EnergyPlus override below
        d("lm", 1.0, _dim(cd=1), aliases=("lumen", "lumens"))
        d("lx", 1.0, _dim(cd=1, m=-2), aliases=("lux",))
        # time
        d("min", 60.0, _dim(s=1), aliases=("minute", "minutes"))
        d("h", _HOUR, _dim(s=1), aliases=("hr", "hrs", "hour", "hours"))
        d("day", 86400.0, _dim(s=1), aliases=("days",))
        d("yr", 365.25 * 86400.0, _dim(s=1), aliases=("year", "years", "a"))
        d("week", 7 * 86400.0, _dim(s=1), aliases=("weeks",))
        # temperature (affine family). "C" overrides coulomb per
        # energyplus_en.txt:49; deltas carry scale but no offset.
        d(
            "degC", 1.0, _dim(K=1), offset=273.15,
            aliases=("C", "celsius", "degreeC", "degree_Celsius", "°C"),
        )
        d(
            "degF", _DEG_F_SCALE, _dim(K=1), offset=459.67 * _DEG_F_SCALE,
            aliases=("F", "fahrenheit", "degree_Fahrenheit", "°F"),
        )
        d("degR", _DEG_F_SCALE, _dim(K=1), aliases=("R", "rankine", "degree_Rankine"))
        d("deltaC", 1.0, _dim(K=1), aliases=("delta_degC", "delta_degreeC"))
        d(
            "deltaF", _DEG_F_SCALE, _dim(K=1),
            aliases=("delta_degF", "delta_degree_Fahrenheit"),
        )
        # angle
        d("deg", math.pi / 180.0, aliases=("degree", "degrees", "°"))
        # volume
        d("L", 1e-3, _dim(m=3), aliases=("liter", "liters", "litre", "l"))
        # US / IP units
        d("ft", _FT, _dim(m=1), aliases=("foot", "feet"))
        d("inch", _IN, _dim(m=1), aliases=("in", "inches"))
        d("mi", 1609.344, _dim(m=1), aliases=("mile", "miles"))
        d("lb", _LB, _dim(kg=1), aliases=("lbm", "pound", "pounds"))
        d("lbf", _LBF, _dim(kg=1, m=1, s=-2), aliases=("pound_force",))
        d("grain", _LB / 7000.0, _dim(kg=1), aliases=("grains",))
        d("oz", _LB / 16.0, _dim(kg=1), aliases=("ounce",))
        d("Btu", _BTU, _dim(kg=1, m=2, s=-2), aliases=("BTU", "btu"))
        d("Wh", _HOUR, _dim(kg=1, m=2, s=-2), aliases=("watthour", "watt_hour"))
        d("cal", 4.184, _dim(kg=1, m=2, s=-2), aliases=("calorie",))
        d("therm", 1.054804e8, _dim(kg=1, m=2, s=-2), aliases=("therms",))
        d("psi", _LBF / (_IN * _IN), _dim(kg=1, m=-1, s=-2))
        d("bar", 1e5, _dim(kg=1, m=-1, s=-2))
        d("atm", 101325.0, _dim(kg=1, m=-1, s=-2), aliases=("atmosphere",))
        d("gal", _GAL, _dim(m=3), aliases=("gallon", "gallons"))
        d("pint", _GAL / 8.0, _dim(m=3), aliases=("pints", "pt"))
        d("quart", _GAL / 4.0, _dim(m=3), aliases=("quarts", "qt"))
        d(
            "ton", 12000.0 * _BTU / _HOUR, _dim(kg=1, m=2, s=-3),
            aliases=("ton_of_refrigeration", "tons"),
        )
        d("hp", 745.6998715822702, _dim(kg=1, m=2, s=-3), aliases=("horsepower",))
        # EnergyPlus specials (energyplus_en.txt:36-46)
        d("person", 1.0, aliases=("people", "persons"))
        d("percent", 0.01, aliases=("%", "pct"))
        d("ach", 1.0, aliases=("ACH",))  # air changes per hour: dimensionless
        d("acr", 1.0 / _HOUR, _dim(s=-1))  # air change rate
        # kBtuh = 1000 * Btu * hour — sic, replicating energyplus_en.txt:45
        d("kBtuh", 1000.0 * _BTU * _HOUR, _dim(kg=1, m=2, s=-1))
        d(
            "footcandle", 1.0 / (_FT * _FT), _dim(cd=1, m=-2),
            aliases=("footcandles", "fc"),
        )
        d("cfm", _FT**3 / 60.0, _dim(m=3, s=-1), aliases=("CFM",))

    # -- parsing ------------------------------------------------------------
    def parse(self, text: str) -> Unit:
        """Parse a unit string through the EnergyPlus preprocessors."""
        if text is None:
            raise UndefinedUnitError("cannot parse None as a unit")
        if isinstance(text, Unit):
            return text
        cached = self._parse_cache.get(text)
        if cached is not None:
            return cached
        unit = self._parse_uncached(text)
        if len(self._parse_cache) < 4096:
            self._parse_cache[text] = unit
        return unit

    def _parse_uncached(self, text: str) -> Unit:
        s = text.strip()
        if not s or s.lower() == "dimensionless":
            return Unit((), 1.0, _ZERO)
        s = dash_to_mul(wrap_denominator(s))
        tokens = self._tokenize(s)
        unit, pos = self._parse_expr(tokens, 0)
        if pos != len(tokens):
            raise UndefinedUnitError(f"trailing tokens in unit string {text!r}")
        return unit

    # alias matching pint's API shape used by the reference (units.py:44+)
    parse_units = parse

    def __call__(self, text: str) -> Unit:
        return self.parse(text)

    def _tokenize(self, s: str) -> list[tuple[str, str]]:
        out: list[tuple[str, str]] = []
        pos = 0
        while pos < len(s):
            m = _TOKEN_RE.match(s, pos)
            if m is None or m.end() == pos:
                if s[pos:].strip() == "":
                    break
                raise UndefinedUnitError(f"cannot tokenize unit string {s!r} at {pos}")
            if m.group("num") is not None:
                out.append(("num", m.group("num")))
            elif m.group("name") is not None:
                out.append(("name", m.group("name")))
            else:
                out.append(("op", m.group("op")))
            pos = m.end()
        return out

    def _parse_expr(self, toks: list[tuple[str, str]], pos: int) -> tuple[Unit, int]:
        left, pos = self._parse_term(toks, pos)
        while pos < len(toks) and toks[pos] in (("op", "*"), ("op", "/")):
            op = toks[pos][1]
            right, pos = self._parse_term(toks, pos + 1)
            left = left * right if op == "*" else left / right
        return left, pos

    def _parse_term(self, toks: list[tuple[str, str]], pos: int) -> tuple[Unit, int]:
        base, pos = self._parse_atom(toks, pos)
        if pos < len(toks) and toks[pos][0] == "op" and toks[pos][1] in ("**", "^"):
            if pos + 1 >= len(toks) or toks[pos + 1][0] != "num":
                raise UndefinedUnitError("expected integer exponent after '**'")
            base = base ** int(toks[pos + 1][1])
            pos += 2
        return base, pos

    def _parse_atom(self, toks: list[tuple[str, str]], pos: int) -> tuple[Unit, int]:
        if pos >= len(toks):
            raise UndefinedUnitError("unexpected end of unit string")
        kind, val = toks[pos]
        if kind == "num":
            return Unit((), float(val), _ZERO), pos + 1
        if kind == "name":
            return self._resolve(val), pos + 1
        if (kind, val) == ("op", "("):
            inner, pos = self._parse_expr(toks, pos + 1)
            if pos >= len(toks) or toks[pos] != ("op", ")"):
                raise UndefinedUnitError("unbalanced parentheses in unit string")
            return inner, pos + 1
        raise UndefinedUnitError(f"unexpected token {val!r} in unit string")

    def _resolve(self, name: str) -> Unit:
        """Resolve one name token: direct | trailing-digit exponent | prefix."""
        got = self._resolve_name(name)
        if got is not None:
            return got
        # trailing-digit exponent: m3 -> m**3, F2 -> F**2 (energyplus_en.txt:24)
        m = re.fullmatch(r"(.*?[^0-9])(\d+)", name)
        if m:
            base = self._resolve_name(m.group(1))
            if base is not None:
                return base ** int(m.group(2))
        raise UndefinedUnitError(f"undefined unit {name!r}")

    def _resolve_name(self, name: str) -> Unit | None:
        canon = self._aliases.get(name, name)
        if canon in self._defs:
            scale, dims, offset = self._defs[canon]
            return Unit(((canon, 1),), scale, dims, offset)
        # SI prefix on a known unit: kW, GJ, cm, kWh ...
        for p in sorted(_PREFIXES, key=len, reverse=True):
            if name.startswith(p) and len(name) > len(p):
                rest = self._aliases.get(name[len(p):], name[len(p):])
                if rest in self._defs:
                    scale, dims, offset = self._defs[rest]
                    # prefixed units are pure scales — never keep the offset
                    return Unit(((p + rest, 1),), _PREFIXES[p] * scale, dims)
        return None

    # -- conversion ---------------------------------------------------------
    def conversion(self, src: "Unit | str", dst: "Unit | str") -> tuple[float, float]:
        """Affine coefficients (slope, intercept) with ``y = slope*x + b``
        converting magnitudes in ``src`` to magnitudes in ``dst``.

        This is the driver-side analogue of the reference's
        ``Quantity(values, units).to(target).m`` (energypandas.py:317,
        :980): offsets are honored for absolute temperature units
        (degC -> K adds 273.15, test_energypandas.py:80-87) and absent for
        delta/compound units.

        Absolute<->delta temperature conversions (degC -> deltaC)
        convert through the absolute scale (20 degC -> 293.15 deltaC)
        — pint's ``.to()`` parity: delta units are multiplicative
        twins of kelvin, and only offset-unit ARITHMETIC is ambiguous
        in pint, not ``.to()``. Callers converting a difference column
        must already hold it in delta units.
        """
        u = self.parse(src) if isinstance(src, str) else src
        v = self.parse(dst) if isinstance(dst, str) else dst
        if u.dims != v.dims:
            raise IncompatibleUnitsError(
                f"cannot convert {u} (dims {u.dims}) to {v} (dims {v.dims})"
            )
        slope = u.scale / v.scale
        intercept = (u.offset - v.offset) / v.scale
        return slope, intercept

    def convert(self, value: float, src: "Unit | str", dst: "Unit | str") -> float:
        slope, intercept = self.conversion(src, dst)
        return value * slope + intercept


#: process-wide default registry (mirrors pint's application registry,
#: reference units.py:38-40)
unit_registry = UnitRegistry()
