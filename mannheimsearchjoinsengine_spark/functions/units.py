"""Unit dictionary (reference P16/F11 tables).

Re-derivation of the reference's convertible-unit tables
(``Units/Convertible/{Length,Area,Mass,Time}.txt``, loaded by
``units/UnitManager.java:162-240``): abbreviation → (base unit, rate to
base). Rates are the reference's own constants, copied value-for-value from
the pipe-delimited tables; the base unit of each family is the table's
first row (rate 1.0) — metre, square metre, gram, second.

Deliberate reduction vs the reference (documented): abbreviations are
matched lowercase (the type-guess cascade lowercases values first), so
case-colliding pairs like Mm (megametre) vs mm are out of scope — the
synthetic corpus never emits them.

The minute/metre collision on "m" (Length.txt row 1 lists "m" for metre;
Time.txt's minute row lists "m","min",... with rate 60) is resolved by
CONTEXT: the reference reads a bracketed column-header abbreviation and
prepends it to the value before parsing
(``TableProcessor/ColumnTypeGuesser.java:52-62`` +
``extractUnitAbbrFromHeader:105-115``). The transcript analog is the
predicate: ``fuse.unit_normalize`` elects each predicate's majority unit
FAMILY from its unambiguous values and reads ambiguous abbreviations in
that family (``AMBIGUOUS_UNITS``); with no family evidence, "m" stays
metre (the flat-dictionary default — the reference's value-only fallback
hits a HashMap-iteration-order tie there, which is not twinnable).

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


# family of each abbreviation (the Convertible table it came from) — the
# vote grain for predicate-context disambiguation
UNIT_FAMILY: dict[str, str] = {
    **{a: "length" for a in ("mm", "cm", "dm", "m", "km", "in", "ft", "yd", "mi", "nmi")},
    **{a: "area" for a in ("mm2", "cm2", "m2", "ha", "km2", "sqft", "sqyd", "acre", "mi2")},
    **{a: "mass" for a in ("mg", "g", "kg", "t", "oz", "lb", "st")},
    **{a: "time" for a in ("ms", "s", "min", "h", "d")},
    "musd": "currency",
}

# abbr -> family -> (base_unit, rate): the readings an ambiguous abbreviation
# takes under each family's context. "m" is metre (Length.txt:1) under a
# length-majority predicate and minute (Time.txt minute row, rate 60 s)
# under a time-majority one.
AMBIGUOUS_UNITS: dict[str, dict[str, tuple[str, float]]] = {
    "m": {"length": ("m", 1.0), "time": ("s", 60.0)},
}


def unit_family(abbr):
    """Column expr: family of an UNambiguous abbreviation, NULL for
    ambiguous ones (they don't vote) and unknown strings."""
    from pyspark.sql import functions as F

    fam = F.lit(None).cast("string")
    for a, f in UNIT_FAMILY.items():
        if a in AMBIGUOUS_UNITS:
            continue
        fam = F.when(abbr == a, F.lit(f)).otherwise(fam)
    return fam


def unit_alternation() -> str:
    """Regex alternation of all known abbreviations, longest first so a
    prefix ("m") never shadows a longer match ("mm2")."""
    return "|".join(sorted(UNIT_RATES, key=lambda a: (-len(a), a)))
