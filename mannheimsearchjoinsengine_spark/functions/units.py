"""Unit dictionary (reference P16/F11 tables).

Re-derivation of the reference's convertible-unit tables
(``Units/Convertible/{Length,Area,Mass,Time}.txt``, loaded by
``units/UnitManager.java:162-240``): abbreviation → (base unit, rate to
base). Rates are the reference's own constants, copied value-for-value from
the pipe-delimited tables; the base unit of each family is the table's
first row (rate 1.0) — metre, square metre, gram, second.

Two deliberate reductions vs the reference, both documented:

* abbreviations are matched lowercase (the type-guess cascade lowercases
  values first), so case-colliding pairs like Mm (megametre) vs mm are out
  of scope — the synthetic corpus never emits them;
* the reference resolves the minute/metre collision on "m" per column
  header (``parsers/UnitParser.java:105-115`` reads bracketed header
  abbreviations); a flat value-only dictionary cannot, so "m" is metre
  here and minute keeps its unambiguous "min".

``MUSD`` (million USD) is the synthetic corpus's currency compound
(Numbers.txt ``million``=1e6 applied to a USD base).
"""

from __future__ import annotations

# abbr -> (base_unit, rate_to_base)
UNIT_RATES: dict[str, tuple[str, float]] = {
    # Length.txt (base: metre)
    "mm": ("m", 0.001),
    "cm": ("m", 0.01),
    "dm": ("m", 0.1),
    "m": ("m", 1.0),
    "km": ("m", 1000.0),
    "in": ("m", 0.0254),
    "ft": ("m", 0.3048),
    "yd": ("m", 0.9144),
    "mi": ("m", 1609.344),
    "nmi": ("m", 1852.01),
    # Area.txt (base: square metre)
    "mm2": ("m2", 1e-06),
    "cm2": ("m2", 0.0001),
    "m2": ("m2", 1.0),
    "ha": ("m2", 10000.0),
    "km2": ("m2", 1_000_000.0),
    "sqft": ("m2", 0.09290304),
    "sqyd": ("m2", 0.83612736),
    "acre": ("m2", 4046.8564224),
    "mi2": ("m2", 2_589_988.110336),
    # Mass.txt (base: gram)
    "mg": ("g", 0.001),
    "g": ("g", 1.0),
    "kg": ("g", 1000.0),
    "t": ("g", 1_000_000.0),
    "oz": ("g", 28.35),
    "lb": ("g", 453.6),
    "st": ("g", 6350.29318),
    # Time.txt (base: second)
    "ms": ("s", 0.001),
    "s": ("s", 1.0),
    "min": ("s", 60.0),
    "h": ("s", 3600.0),
    "d": ("s", 86400.0),
    # currency compound for the synthetic corpus (Numbers.txt million=1e6)
    "musd": ("usd", 1_000_000.0),
}


def unit_alternation() -> str:
    """Regex alternation of all known abbreviations, longest first so a
    prefix ("m") never shadows a longer match ("mm2")."""
    return "|".join(sorted(UNIT_RATES, key=lambda a: (-len(a), a)))
