"""FillMissing / FillMedian.

Reference: nvtabular/ops/fill.py:23-80 (constant fill + optional
``<col>_filled`` indicator), :83-147 (median fill; reference uses
dask's approximate quantile — fill.py:115-126).
"""

from __future__ import annotations

from typing import Dict, Optional

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from pyspark.sql.types import DoubleType, FloatType

from .base import AggStatOperator, Operator, StatOperator, TransformContext
from ..plans.graph import ColumnSelector


def _null_if_nan(df: DataFrame, act: str):
    """NaN → NULL for float columns (the reference treats NaN as missing
    everywhere — e.g. fill.py:23-80 fillna covers NaN)."""
    c = F.col(act)
    if isinstance(df.schema[act].dataType, (DoubleType, FloatType)):
        return F.when(F.isnan(c), F.lit(None)).otherwise(c)
    return c


class FillMissing(Operator):
    """Constant fillna; with ``add_binary_cols`` also emits a
    ``<col>_filled`` boolean indicator (reference fill.py:23-80)."""

    def __init__(self, fill_val: float = 0, add_binary_cols: bool = False):
        self.fill_val = fill_val
        self.add_binary_cols = add_binary_cols

    def output_column_names(self, selector: ColumnSelector):
        out = list(selector.names)
        if self.add_binary_cols:
            out += [f"{c}_filled" for c in selector.names]
        return out

    def transform(self, ctx: TransformContext, df: DataFrame) -> DataFrame:
        cols = {}
        for pub, act in ctx.pairs():
            c = _null_if_nan(df, act)
            cols[ctx.out(pub)] = F.coalesce(c, F.lit(self.fill_val))
            if self.add_binary_cols:
                cols[ctx.out(f"{pub}_filled")] = c.isNull()
        return df.withColumns(cols)

    def output_tags(self):
        return ["continuous"]


class FillMedian(AggStatOperator):
    """fit: per-column median; transform: fillna(median).

    The reference uses an approximate quantile (fill.py:115-126); we use
    exact ``percentile`` by default for oracle parity, with
    ``approx=True`` switching to ``percentile_approx`` (single-pass
    sketch — the right choice at 100 TB). Batchable fit.
    """

    def __init__(self, add_binary_cols: bool = False, approx: bool = False):
        super().__init__()
        self.add_binary_cols = add_binary_cols
        self.approx = approx
        self.medians: Dict[str, float] = {}

    def output_column_names(self, selector: ColumnSelector):
        out = list(selector.names)
        if self.add_binary_cols:
            out += [f"{c}_filled" for c in selector.names]
        return out

    def agg_requests(self, ctx: TransformContext, df: DataFrame):
        fn = F.percentile_approx if self.approx else F.percentile
        self._pubs = [pub for pub, _ in ctx.pairs()]
        return [fn(_null_if_nan(df, act), F.lit(0.5)).alias(self._alias(pub))
                for pub, act in ctx.pairs()]

    def consume_agg(self, row) -> None:
        self.medians = {pub: row[self._alias(pub)] for pub in self._pubs}

    def transform(self, ctx: TransformContext, df: DataFrame) -> DataFrame:
        self._require_fitted()
        cols = {}
        for pub, act in ctx.pairs():
            c = _null_if_nan(df, act)
            cols[ctx.out(pub)] = F.coalesce(c, F.lit(self.medians[pub]))
            if self.add_binary_cols:
                cols[ctx.out(f"{pub}_filled")] = c.isNull()
        return df.withColumns(cols)

    def save_state(self):
        return {"medians": self.medians}

    def load_state(self, state):
        self.medians = state["medians"]
        self.fitted = True

    def clear(self):
        super().clear()
        self.medians = {}

    def output_tags(self):
        return ["continuous"]
