"""Scalar math ops: LogOp, Clip, Bucketize.

Reference: nvtabular/ops/logop.py:29-63, clip.py:21-57,
bucketize.py:24-104. All stay JVM-side (whole-stage codegen); list
("multi-hot") columns are handled with ``F.transform`` — no Python in
the hot path.
"""

from __future__ import annotations

from typing import List, Optional

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType

from .base import AggStatOperator, Operator, TransformContext


def _is_list(df: DataFrame, name: str) -> bool:
    return isinstance(df.schema[name].dataType, ArrayType)


def _elementwise(df: DataFrame, actual: str, fn) -> Column:
    """Apply ``fn(Column) -> Column`` to a scalar or (element-wise) to an
    array column, mirroring the reference's flatten/re-wrap of list values
    (logop.py:46-50, normalize.py:75-88)."""
    col = F.col(actual)
    if _is_list(df, actual):
        return F.transform(col, fn)
    return fn(col)


class LogOp(Operator):
    """``log(x + 1)`` cast to float32 (reference logop.py:29-63)."""

    def __init__(self, out_dtype: str = "float"):
        self.out_dtype = out_dtype

    def expr(self, col, name, df, ctx):
        return _elementwise(df, ctx.actual(name),
                            lambda c: F.log1p(c).cast(self.out_dtype))

    def output_tags(self):
        return ["continuous"]


class Clip(Operator):
    """Clamp to [min_value, max_value] (reference clip.py:21-57)."""

    def __init__(self, min_value: Optional[float] = None,
                 max_value: Optional[float] = None):
        if min_value is None and max_value is None:
            raise ValueError("Clip needs min_value and/or max_value")
        self.min_value = min_value
        self.max_value = max_value

    def _clip(self, c: Column) -> Column:
        if self.min_value is not None:
            c = F.greatest(c, F.lit(self.min_value))
        if self.max_value is not None:
            c = F.least(c, F.lit(self.max_value))
        return c

    def expr(self, col, name, df, ctx):
        return _elementwise(df, ctx.actual(name), self._clip)

    def output_tags(self):
        return ["continuous"]


class Bucketize(Operator):
    """Digitize continuous values into bins: output i such that
    ``boundaries[i-1] <= x < boundaries[i]`` (right=False semantics,
    reference bucketize.py:24-104). NULL → NULL.

    Expressed as a sum of boundary comparisons — pure codegen, no UDF,
    and exactly reproducible in ANSI SQL for the oracle.
    """

    def __init__(self, boundaries):
        # accept list (same for all cols) or dict col->list
        self.boundaries = boundaries

    def _bounds_for(self, name: str) -> List[float]:
        b = self.boundaries[name] if isinstance(self.boundaries, dict) \
            else self.boundaries
        return list(b)

    def expr(self, col, name, df, ctx):
        bounds = self._bounds_for(name)

        def digitize(c: Column) -> Column:
            acc = F.lit(0)
            for b in bounds:
                acc = acc + (c >= F.lit(b)).cast("int")
            return F.when(c.isNull(), F.lit(None)).otherwise(acc)

        return _elementwise(df, ctx.actual(name), digitize)

    def output_tags(self):
        return ["categorical"]


class QuantileBin(AggStatOperator):
    """Equal-frequency (quantile) binning — Bucketize with FITTED
    boundaries: fit computes the ``n_bins - 1`` interior quantiles of
    each column, transform digitizes with the same ``x >= boundary``
    comparison chain as :class:`Bucketize` (pure codegen). The
    reference has no fitted discretizer (bucketize.py takes explicit
    boundaries only); this is the standard equal-frequency extension.

    Exact ``percentile`` by default (linear-interpolation definition,
    shared by DuckDB's ``quantile_cont`` — oracle-exact);
    ``approx=True`` switches to the single-pass ``percentile_approx``
    sketch, the right trade at 100 TB. The fit is batchable: all
    columns' quantiles ride the Workflow's single fused agg job.
    NULL/NaN → NULL bucket.
    """

    def __init__(self, n_bins: int = 4, approx: bool = False):
        super().__init__()
        if int(n_bins) < 2:
            raise ValueError(f"n_bins must be >= 2, got {n_bins}")
        self.n_bins = int(n_bins)
        self.approx = approx
        self.boundaries = {}

    def agg_requests(self, ctx: TransformContext, df: DataFrame):
        fn = F.percentile_approx if self.approx else F.percentile
        qs = [i / self.n_bins for i in range(1, self.n_bins)]
        self._pubs = [pub for pub, _ in ctx.pairs()]
        reqs = []
        for pub, act in ctx.pairs():
            if isinstance(df.schema[act].dataType, ArrayType):
                raise ValueError("QuantileBin supports scalar columns "
                                 f"only; {act!r} is a list column")
            # NaN ≡ missing on the FIT side too (package-wide contract,
            # fill.py _null_if_nan): Spark's percentile sorts NaN as
            # largest, which would skew every boundary and fit the top
            # boundary itself to NaN (making that bucket unreachable)
            c = F.col(act).cast("double")
            c = F.when(F.isnan(c), F.lit(None)).otherwise(c)
            for j, q in enumerate(qs):
                reqs.append(fn(c, F.lit(q))
                            .alias(self._alias(f"{pub}__q{j}")))
        return reqs

    def consume_agg(self, row) -> None:
        k = self.n_bins - 1
        self.boundaries = {
            pub: [row[self._alias(f"{pub}__q{j}")] for j in range(k)]
            for pub in self._pubs}

    def expr(self, col, name, df, ctx):
        self._require_fitted()
        bounds = self.boundaries[name]

        def digitize(c: Column) -> Column:
            acc = F.lit(0)
            for b in bounds:
                acc = acc + (c >= F.lit(b)).cast("int")
            return F.when(c.isNull() | F.isnan(c.cast("double")),
                          F.lit(None)).otherwise(acc)

        return _elementwise(df, ctx.actual(name), digitize)

    def output_dtype(self):
        return "int"

    def save_state(self):
        return {"n_bins": self.n_bins, "boundaries": self.boundaries}

    def load_state(self, state):
        self.n_bins = state["n_bins"]
        self.boundaries = state["boundaries"]
        self.fitted = True

    def clear(self):
        super().clear()
        self.boundaries = {}

    def output_tags(self):
        return ["categorical"]
