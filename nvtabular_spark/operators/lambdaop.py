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

from typing import Callable, Optional

from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

from .base import Operator


class LambdaOp(Operator):
    def __init__(self, f: Callable, dtype: Optional[str] = None,
                 is_expr: bool = False):
        """``f``: pandas ``Series -> Series`` (default, runs as an Arrow
        pandas_udf with declared output ``dtype``) or, with
        ``is_expr=True``, ``Column -> Column`` (pure Catalyst)."""
        self.f = f
        self.dtype = dtype or "double"
        self.is_expr = is_expr

    def expr(self, col: Column, name, df, ctx):
        if self.is_expr:
            return self.f(col)
        udf = pandas_udf(self.f, self.dtype)
        return udf(col)

    def save_params(self):
        from ..plans.serializer import callable_ref
        return {"f": callable_ref(self.f), "dtype": self.dtype,
                "is_expr": self.is_expr}

    @classmethod
    def load_params(cls, params):
        from ..plans.serializer import resolve_callable
        return cls(resolve_callable(params["f"]), params.get("dtype"),
                   params.get("is_expr", False))
