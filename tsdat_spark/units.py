"""Affine unit conversion — the driver-side analog of tsdat's pint usage.

tsdat's ``UnitsConverter`` (``tsdat/io/converters/units_converter.py:30-114``)
evaluates ``(data * ureg(input_units)).to(output_units)`` eagerly over the
whole array. For a Spark engine the right factoring is: resolve the unit
pair to an affine ``(scale, offset)`` ON THE DRIVER, then apply
``col * scale + offset`` as a pure Catalyst expression (whole-stage
codegen'd, no Python in the hot path).

pint is not in this image, so a deterministic subset is implemented here:

- linear units over the dimensions time / length / mass / pressure /
  frequency / fraction, with SI prefixes;
- compound linear units as a quotient of products with integer exponents
  (``m/s``, ``km/h``, ``m s-1``, ``kg*m/s^2``);
- affine temperature units (degC / degF / K / degK), standalone only —
  the same restriction pint enforces (offset units cannot participate in
  compound expressions without explicit delta units).

Every conversion is exact rational-ish float math computed once; unknown
units raise ``UnitsError`` (tsdat logs-and-skips; callers can catch).
"""

from __future__ import annotations

import re
from fractions import Fraction

class UnitsError(ValueError):
    pass


# base factors expressed relative to a canonical unit per dimension
# (dimension tag, factor-to-canonical). Canonical: s, m, g, Pa, Hz, 1.
_LINEAR: dict[str, tuple[str, Fraction]] = {
    # time (canonical: s)
    "s": ("time", Fraction(1)),
    "sec": ("time", Fraction(1)),
    "second": ("time", Fraction(1)),
    "seconds": ("time", Fraction(1)),
    "min": ("time", Fraction(60)),
    "minute": ("time", Fraction(60)),
    "minutes": ("time", Fraction(60)),
    "h": ("time", Fraction(3600)),
    "hr": ("time", Fraction(3600)),
    "hour": ("time", Fraction(3600)),
    "hours": ("time", Fraction(3600)),
    "day": ("time", Fraction(86400)),
    "days": ("time", Fraction(86400)),
    # length (canonical: m)
    "m": ("length", Fraction(1)),
    "meter": ("length", Fraction(1)),
    "meters": ("length", Fraction(1)),
    "metre": ("length", Fraction(1)),
    "in": ("length", Fraction(254, 10000)),
    "inch": ("length", Fraction(254, 10000)),
    "ft": ("length", Fraction(3048, 10000)),
    "foot": ("length", Fraction(3048, 10000)),
    "feet": ("length", Fraction(3048, 10000)),
    "mi": ("length", Fraction(1609344, 1000)),
    "mile": ("length", Fraction(1609344, 1000)),
    "miles": ("length", Fraction(1609344, 1000)),
    # mass (canonical: g)
    "g": ("mass", Fraction(1)),
    "gram": ("mass", Fraction(1)),
    "grams": ("mass", Fraction(1)),
    "lb": ("mass", Fraction(45359237, 100000)),
    "t": ("mass", Fraction(1_000_000)),
    # pressure (canonical: Pa)
    "Pa": ("pressure", Fraction(1)),
    "pascal": ("pressure", Fraction(1)),
    "bar": ("pressure", Fraction(100_000)),
    "mbar": ("pressure", Fraction(100)),
    "atm": ("pressure", Fraction(101325)),
    # frequency (canonical: Hz)
    "Hz": ("frequency", Fraction(1)),
    "hertz": ("frequency", Fraction(1)),
    # dimensionless
    "1": ("fraction", Fraction(1)),
    "%": ("fraction", Fraction(1, 100)),
    "percent": ("fraction", Fraction(1, 100)),
    "count": ("fraction", Fraction(1)),
    "counts": ("fraction", Fraction(1)),
}

_PREFIXES: dict[str, Fraction] = {
    "n": Fraction(1, 10**9),
    "u": Fraction(1, 10**6),
    "µ": Fraction(1, 10**6),
    "m": Fraction(1, 1000),
    "c": Fraction(1, 100),
    "d": Fraction(1, 10),
    "h": Fraction(100),
    "k": Fraction(1000),
    "M": Fraction(10**6),
    "G": Fraction(10**9),
}

# affine temperature units: value_canonical_K = value * scale + offset
_AFFINE: dict[str, tuple[Fraction, Fraction]] = {
    "K": (Fraction(1), Fraction(0)),
    "degK": (Fraction(1), Fraction(0)),
    "kelvin": (Fraction(1), Fraction(0)),
    "degC": (Fraction(1), Fraction(27315, 100)),
    "celsius": (Fraction(1), Fraction(27315, 100)),
    "degF": (Fraction(5, 9), Fraction(45967, 180)),  # (F + 459.67) * 5/9
    "fahrenheit": (Fraction(5, 9), Fraction(45967, 180)),
}

_FACTOR_RE = re.compile(r"^(?P<unit>[A-Za-zµ%1]+)(?:\^?(?P<exp>-?\d+))?$")


def _atom(token: str) -> tuple[str, Fraction]:
    """Resolve one unit atom (with optional SI prefix) to (dimension, factor)."""
    if token in _LINEAR:
        return _LINEAR[token]
    for p, pf in _PREFIXES.items():
        if token.startswith(p) and token[len(p):] in _LINEAR:
            dim, f = _LINEAR[token[len(p):]]
            return dim, f * pf
    raise UnitsError(f"unknown unit {token!r}")


def _parse_linear(units: str) -> tuple[dict[str, int], Fraction]:
    """Parse a compound linear unit into ({dimension: exponent}, factor)."""
    units = units.strip()
    num, _, den = units.partition("/")
    dims: dict[str, int] = {}
    factor = Fraction(1)
    for part, sign in ((num, 1), (den, -1)):
        if not part.strip():
            continue
        for tok in re.split(r"[\s*·]+", part.strip()):
            if not tok:
                continue
            m = _FACTOR_RE.match(tok)
            if not m:
                raise UnitsError(f"cannot parse unit factor {tok!r} in {units!r}")
            exp = int(m.group("exp") or 1) * sign
            dim, f = _atom(m.group("unit"))
            if dim != "fraction":
                dims[dim] = dims.get(dim, 0) + exp
            factor *= f**exp
    return {d: e for d, e in dims.items() if e != 0}, factor


def conversion(input_units: str, output_units: str) -> tuple[float, float]:
    """(scale, offset) such that ``out = value * scale + offset``.

    Mirrors pint's behavior for the supported subset: affine temperature
    pairs convert through Kelvin; linear units must share dimensions.
    """
    iu, ou = input_units.strip(), output_units.strip()
    if iu == ou or iu == "1" or ou == "1":
        return 1.0, 0.0
    if iu in _AFFINE or ou in _AFFINE:
        if iu not in _AFFINE or ou not in _AFFINE:
            raise UnitsError(f"cannot convert {iu!r} -> {ou!r} (affine/linear mix)")
        s_in, o_in = _AFFINE[iu]
        s_out, o_out = _AFFINE[ou]
        # value -> K -> out: out = (value*s_in + o_in - o_out) / s_out
        scale = s_in / s_out
        offset = (o_in - o_out) / s_out
        return float(scale), float(offset)
    dims_in, f_in = _parse_linear(iu)
    dims_out, f_out = _parse_linear(ou)
    if dims_in != dims_out:
        raise UnitsError(f"dimension mismatch: {iu!r} ({dims_in}) vs {ou!r} ({dims_out})")
    return float(f_in / f_out), 0.0
