"""Groupby — aggregate to one row per key.

Reference: nvtabular/ops/groupby.py:26-319 — partition-local groupby
that REQUIRES a prior ``shuffle_by_keys`` (:33-40) and sorts each
partition by ``sort_cols`` (:116-118). Spark-first: a *global*
``df.groupBy`` — Catalyst plans partial (map-side) + final aggregation,
making the pre-shuffle contract unnecessary and the result exact across
any partitioning. Ordered list aggs (`list`/`first`/`last`) are
expressed as ``sort_array(collect_list(struct(sort_cols, x)))`` so the
sort happens inside the aggregation buffer, not as a global sort.

Changes row cardinality — run it as a terminal / linear stage, not as a
sibling of row-preserving branches.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Union

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .base import Operator, TransformContext
from ..plans.graph import ColumnSelector

_SIMPLE_AGGS = {
    "sum": F.sum,
    "max": F.max,
    "min": F.min,
    "mean": F.mean,
    "count": lambda c: F.count(c).cast("long"),
    "nunique": lambda c: F.count_distinct(c).cast("long"),
    "median": F.median,
    "std": F.stddev_samp,
    "var": F.var_samp,
}
_ORDERED_AGGS = ("list", "first", "last")

#: reference output-dtype coercion table (groupby.py:190-198) — applied
#: only with ``coerce_dtypes=True``; the default keeps Spark's native
#: agg dtypes (long/double) so DuckDB oracle dtypes stay aligned
_COERCE_DTYPES = {
    "count": "int",
    "nunique": "int",
    "mean": "float",
    "var": "float",
    "std": "float",
    "median": "float",
    "sum": "float",
}


class Groupby(Operator):
    row_preserving = False

    cheap_transform = False  # aggregation

    def __init__(self, groupby_cols: Union[str, List[str]],
                 sort_cols: Optional[Union[str, List[str]]] = None,
                 aggs: Union[str, List[str], Dict[str, list]] = "list",
                 name_sep: str = "_", ascending: bool = True,
                 coerce_dtypes: bool = False):
        self.groupby_cols = [groupby_cols] if isinstance(groupby_cols, str) \
            else list(groupby_cols)
        sc = sort_cols or []
        self.sort_cols = [sc] if isinstance(sc, str) else list(sc)
        self.aggs = aggs
        self.name_sep = name_sep
        self.ascending = ascending
        #: apply the reference's output-dtype table (count/nunique →
        #: int32, mean/std/var/median/sum → float32) for parity with
        #: fixed-dtype trainer inputs
        self.coerce_dtypes = coerce_dtypes

    def dependencies(self):
        return self.groupby_cols + self.sort_cols

    def _aggs_for(self, col: str) -> List[str]:
        if isinstance(self.aggs, str):
            return [self.aggs]
        if isinstance(self.aggs, dict):
            return list(self.aggs.get(col, []))
        return list(self.aggs)

    def _value_cols(self, selector: ColumnSelector) -> List[str]:
        return [c for c in selector.names if c not in self.groupby_cols]

    def output_column_names(self, selector: ColumnSelector):
        out = list(self.groupby_cols)
        for c in self._value_cols(selector):
            for a in self._aggs_for(c):
                out.append(f"{c}{self.name_sep}{a}")
        return out

    def transform(self, ctx: TransformContext, df: DataFrame) -> DataFrame:
        exprs: List[Column] = []
        order = [F.col(s) for s in self.sort_cols] if self.ascending else \
            [F.col(s).desc() for s in self.sort_cols]
        for pub in self._value_cols(ctx.selector):
            act = ctx.actual(pub) if pub in ctx.inputs else pub
            c = F.col(act)
            if df.schema[act].dataType.simpleString() in ("double", "float"):
                # pandas/cudf agg semantics: NaN ≡ missing (skipped)
                c = F.when(F.isnan(c), F.lit(None)).otherwise(c)
            for a in self._aggs_for(pub):
                name = ctx.out(f"{pub}{self.name_sep}{a}")
                if a in _SIMPLE_AGGS:
                    e = _SIMPLE_AGGS[a](c)
                    if self.coerce_dtypes and a in _COERCE_DTYPES:
                        e = e.cast(_COERCE_DTYPES[a])
                    exprs.append(e.alias(name))
                elif a in _ORDERED_AGGS:
                    if not self.sort_cols:
                        if a == "list":
                            exprs.append(F.collect_list(c).alias(name))
                        elif a == "first":
                            exprs.append(F.first(c, ignorenulls=False).alias(name))
                        else:
                            exprs.append(F.last(c, ignorenulls=False).alias(name))
                    else:
                        asc_struct = F.struct(
                            *[F.col(s) for s in self.sort_cols], c.alias("__v__"))
                        arr = F.sort_array(F.collect_list(asc_struct),
                                           asc=self.ascending)
                        vals = F.transform(arr, lambda x: x["__v__"])
                        if a == "list":
                            exprs.append(vals.alias(name))
                        elif a == "first":
                            exprs.append(F.element_at(vals, 1).alias(name))
                        else:
                            exprs.append(F.element_at(vals, -1).alias(name))
                else:
                    raise ValueError(f"Unsupported agg {a!r}")
        keys = [F.col(k).alias(ctx.out(k)) for k in self.groupby_cols]
        return df.groupBy(*keys).agg(*exprs)
