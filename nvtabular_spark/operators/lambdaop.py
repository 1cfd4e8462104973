"""LambdaOp — user functions, vectorized.

Reference: nvtabular/ops/lambdaop.py:19-51 (apply a named function to
each selected column, Series→Series) and graph_serializer.py:71-99
(lambdas are usable at runtime but NOT serializable — only importable
named functions survive a save/load round-trip; same contract here).

Spark-first: the function runs as an Arrow-batched pandas_udf
(Series→Series) — never row-at-a-time Python. When the function can be
expressed as a Spark Column expression instead, pass
``LambdaOp(expr=lambda col: ...)`` built from ``pyspark.sql.functions``
to stay JVM-side entirely.
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

from .base import Operator


_NUMPY_TO_SPARK = {
    "float64": "double", "float32": "float", "float16": "float",
    "float128": "double",
    "int64": "bigint", "int32": "int", "int16": "smallint",
    "int8": "tinyint",
    "uint8": "smallint", "uint16": "int", "uint32": "bigint",
    "uint64": "bigint",
    "bool": "boolean", "object": "string", "str": "string",
    "datetime64[ns]": "timestamp", "datetime64[us]": "timestamp",
    "datetime64[ms]": "timestamp", "datetime64[s]": "timestamp",
}


def _spark_dtype(dtype) -> str:
    """Accept a Spark type string OR a numpy dtype/type (the reference
    API takes np.float64 etc., lambdaop.py dtype param). Unsigned ints
    widen to the next signed Spark type. An unmapped numpy dtype raises
    a clear ValueError instead of leaking a KeyError or an invalid
    Spark type string into pandas_udf."""
    if dtype is None:
        return "double"
    if isinstance(dtype, str) and dtype not in _NUMPY_TO_SPARK:
        return dtype  # assume a Spark type string ("double", "array<int>", …)
    import numpy as np
    name = np.dtype(dtype).name if not isinstance(dtype, str) else dtype
    try:
        return _NUMPY_TO_SPARK[name]
    except KeyError:
        raise ValueError(
            f"LambdaOp dtype {dtype!r} (numpy {name!r}) has no Spark "
            "mapping; pass a Spark type string instead") from None


def _as_series(result):
    """The user fn may return an ndarray (reference tests use
    np.where); Arrow needs a pandas Series."""
    import pandas as pd
    return result if isinstance(result, pd.Series) else pd.Series(result)


class LambdaOp(Operator):
    def __init__(self, f: Callable, dtype=None,
                 is_expr: bool = False, tags=None, properties=None):
        """``f``: pandas ``Series -> Series`` (default, runs as an Arrow
        pandas_udf with declared output ``dtype``) or, with
        ``is_expr=True``, ``Column -> Column`` (pure Catalyst).

        ``dtype``/``tags``/``properties`` mirror the reference's schema
        annotations (lambdaop.py dtype/tags/properties params,
        tests/unit/ops/test_lambda.py:161 test_lambdaop_schema_computation):
        they flow into ``Workflow.fit_schema`` output column schemas.
        """
        self.f = f
        self.dtype = _spark_dtype(dtype)
        self.is_expr = is_expr
        self.tags = [str(t) for t in (tags or [])]
        self.properties = dict(properties or {})

    def expr(self, col: Column, name, df, ctx):
        if self.is_expr:
            return self.f(col)
        import inspect
        n_params = len(inspect.signature(self.f).parameters)
        fn = self.f
        if n_params >= 2:
            # reference 2-arg contract f(col, gdf) (lambdaop.py:19-51,
            # exercised by test_workflow_chaining.py:93): the second
            # argument is a pandas view of the op's OTHER input columns
            # under their public names, shipped as one struct column
            struct_col = F.struct(*[F.col(act).alias(pub)
                                    for pub, act in ctx.pairs()])
            udf = pandas_udf(lambda s, frame: _as_series(fn(s, frame)),
                             self.dtype)
            return udf(col, struct_col)
        udf = pandas_udf(lambda s: _as_series(fn(s)), self.dtype)
        return udf(col)

    def output_tags(self):
        return list(self.tags)

    def output_properties(self):
        return dict(self.properties)

    def output_dtype(self):
        return None if self.is_expr else self.dtype

    def save_params(self):
        from ..plans.serializer import callable_ref
        return {"f": callable_ref(self.f), "dtype": self.dtype,
                "is_expr": self.is_expr, "tags": self.tags,
                "properties": self.properties}

    @classmethod
    def load_params(cls, params):
        from ..plans.serializer import resolve_callable
        return cls(resolve_callable(params["f"]), params.get("dtype"),
                   params.get("is_expr", False), params.get("tags"),
                   params.get("properties"))
