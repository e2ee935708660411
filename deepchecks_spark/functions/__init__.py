from deepchecks_spark.functions.strings import (
    NULL_BASEFORMS,
    baseform_expr,
    is_null_string_expr,
    python_baseform,
    make_baseform_pandas_udf,
)

__all__ = [
    "NULL_BASEFORMS",
    "baseform_expr",
    "is_null_string_expr",
    "python_baseform",
    "make_baseform_pandas_udf",
]
