"""String normalization expressions (reference deepchecks/utils/strings.py).

``string_baseform`` (reference strings.py:279-303): strip every
non-alphanumeric character and lowercase; if the result is empty, fall
back to the original value (unless allow_empty_result).

Fast path = JVM regexp (``[^\\p{L}\\p{N}]`` ≈ python ``str.isalnum``);
a pandas-UDF twin using the exact python predicate exists for byte-
parity-critical paths (python and java unicode classes diverge on a
handful of codepoints).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F

# Baseforms the reference treats as null representations
# (reference mixed_nulls.py:32 DEFAULT_NULL_VALUES = {'none','null','nan','na',''}).
NULL_BASEFORMS = ("none", "null", "nan", "na", "")

_NON_ALNUM_RE = r"[^\p{L}\p{N}]"


def baseform_expr(col: Column | str, allow_empty_result: bool = False) -> Column:
    """JVM-side string_baseform: lowercase, strip non-alphanumerics."""
    c = F.col(col) if isinstance(col, str) else col
    stripped = F.lower(F.regexp_replace(c, _NON_ALNUM_RE, ""))
    if allow_empty_result:
        return stripped
    return F.when(F.length(stripped) > 0, stripped).otherwise(c)


def python_baseform(value, allow_empty_result: bool = False):
    """Exact python twin of the reference implementation."""
    if not isinstance(value, str):
        return value
    stripped = "".join(ch for ch in value if ch.isalnum()).lower()
    if not allow_empty_result and not stripped:
        return value
    return stripped


def is_null_string_expr(col: Column | str) -> Column:
    """True where the *string* value is a null representation:
    baseform ∈ {'none','null','nan','na',''} (reference mixed_nulls.py:105-139)."""
    c = F.col(col) if isinstance(col, str) else col
    # allow_empty_result=False matches the reference call site: a pure-
    # whitespace/symbol string falls back to itself (NOT a null repr),
    # while '' stays '' and matches the '' baseform.
    return baseform_expr(c, allow_empty_result=False).isin(*NULL_BASEFORMS) & c.isNotNull()


def make_baseform_pandas_udf(allow_empty_result: bool = False):
    """Arrow-batched UDF with the exact python semantics, for the
    byte-parity path (SURVEY.md §2.6 caveat)."""
    from pyspark.sql import types as T

    @F.pandas_udf(T.StringType())
    def _bf(s: pd.Series) -> pd.Series:
        return s.map(lambda v: python_baseform(v, allow_empty_result) if v is not None else None)

    return _bf
