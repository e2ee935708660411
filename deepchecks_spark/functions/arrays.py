"""Array-literal helpers for quantizer/projection constants.

Operators that bake numeric constants into the plan (PQ codebooks, IVF
centroids, LSH planes, RFF projections) need nested array<double>
literals with hundreds to thousands of elements. Building those with
``F.lit(nested_list)`` converts the list element-by-element over py4j —
measured 0.54 s for 1024 doubles PER CALL on this class of host — while
parsing the equivalent SQL ``array(array(...))`` text is one py4j call
and ~5 ms. The parsed literal is value- and type-identical
(``array<...array<double>>``): every element is formatted with ``repr``
(the shortest string that round-trips the binary64 value) and forced to
DOUBLE via exponent notation, so parsing recovers the exact bits.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _fmt_double(x) -> str:
    """SQL DOUBLE literal text that parses back to exactly ``x``:
    ``repr`` round-trips the value; an exponent suffix keeps Spark's
    parser from typing a plain decimal as DECIMAL(p, s)."""
    r = repr(float(x))
    if "e" in r or "E" in r:
        return r
    if "inf" in r or "nan" in r:  # never expected from trained constants
        raise ValueError(f"non-finite literal {r!r} cannot be inlined")
    return r + "E0"


def _nested_sql(v) -> str:
    if isinstance(v, (list, tuple)):
        return "array(" + ", ".join(_nested_sql(x) for x in v) + ")"
    return _fmt_double(v)


def double_array_lit(nested) -> Column:
    """ONE Column literal for an arbitrarily nested list/tuple of
    floats — `array<double>`, `array<array<double>>`, ... — built by
    parsing a single SQL expression string instead of shipping each
    element through py4j."""
    return F.expr(_nested_sql(nested))
