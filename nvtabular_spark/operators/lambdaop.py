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
        import inspect
        n_params = len(inspect.signature(self.f).parameters)
        if n_params >= 2:
            # reference 2-arg contract f(col, gdf) (lambdaop.py:19-51,
            # exercised by test_workflow_chaining.py:93): the second
            # argument is a pandas view of the op's OTHER input columns
            # under their public names, shipped as one struct column
            fn = self.f
            struct_col = F.struct(*[F.col(act).alias(pub)
                                    for pub, act in ctx.pairs()])
            udf = pandas_udf(lambda s, frame: fn(s, frame), self.dtype)
            return udf(col, struct_col)
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
