"""List ("multi-hot") column ops: ListSlice, ValueCount.

Reference: nvtabular/ops/list_slice.py:29-228 (slicing with negative
indices + optional pad-to-fixed-length; GPU path is numba kernels over
Arrow offsets/elements — here it's pure ``F.slice``/``F.concat``
expressions, fully inside codegen) and value_counts.py:26-75 (min/max
list length → schema value_count).
"""

from __future__ import annotations

from typing import Dict, Optional

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .base import AggStatOperator, Operator, StatOperator, TransformContext


class ListSlice(Operator):
    """Slice every list to ``[start, end)`` (python semantics, negative
    indices allowed), optionally right-pad to the slice length with
    ``pad_value`` (reference list_slice.py:29-144)."""

    def __init__(self, start: int, end: Optional[int] = None,
                 pad: bool = False, pad_value: float = 0):
        # reference arg normalization (list_slice.py:64-71):
        # ListSlice(10) → [0:10]; ListSlice(-10) → last 10; else [start:end]
        if start > 0 and end is None:
            start, end = 0, start
        self.start = start
        self.end = end          # None = to end of list
        self.pad = pad
        self.pad_value = pad_value

    def expr(self, col: Column, name, df, ctx):
        n = F.size(col)
        start, end = self.start, self.end
        if end is None:
            if not self.pad:
                if start >= 0:
                    return F.slice(col, start + 1, F.greatest(
                        n - start, F.lit(0)))
                return F.slice(col, F.greatest(n + F.lit(start + 1), F.lit(1)),
                               F.lit(-start))
            # pad requires a fixed target length
            if start >= 0:
                raise ValueError("pad=True with open end requires start < 0")
            max_len = -start
            sliced = F.slice(col, F.greatest(n + F.lit(start + 1), F.lit(1)),
                             F.lit(max_len))
            elem_t = df.schema[ctx.actual(name)].dataType.elementType \
                .simpleString()
            pad_arr = F.array_repeat(F.lit(self.pad_value).cast(elem_t),
                                     max_len)
            return F.slice(F.concat(sliced, pad_arr), 1, max_len)
        # python-slice → 1-based F.slice(start, length)
        s = F.lit(start + 1) if start >= 0 else F.greatest(
            n + F.lit(start + 1), F.lit(1))
        e = F.least(F.lit(end), n) if end >= 0 else n + F.lit(end)
        length = F.greatest(e - s + F.lit(1), F.lit(0))
        sliced = F.slice(col, s, length)
        if not self.pad:
            return sliced
        max_len = (end - start) if (end >= 0) == (start >= 0) else None
        if max_len is None or max_len <= 0:
            raise ValueError("pad=True requires start/end with the same sign")
        elem_t = df.schema[ctx.actual(name)].dataType.elementType.simpleString()
        pad_arr = F.array_repeat(F.lit(self.pad_value).cast(elem_t), max_len)
        return F.slice(F.concat(sliced, pad_arr), 1, max_len)

    def output_tags(self):
        return ["list"]


class ValueCount(AggStatOperator):
    """fit: min/max list length per column → schema ``value_count``
    properties; transform: identity (value_counts.py:26-75). Batchable."""

    preserves_dtype = True  # transform is identity: values untouched

    def __init__(self):
        super().__init__()
        self.counts: Dict[str, dict] = {}

    def agg_requests(self, ctx: TransformContext, df: DataFrame):
        self._pubs = [pub for pub, _ in ctx.pairs()]
        aggs = []
        for pub, act in ctx.pairs():
            aggs += [F.min(F.size(F.col(act))).alias(self._alias(f"{pub}__min")),
                     F.max(F.size(F.col(act))).alias(self._alias(f"{pub}__max"))]
        return aggs

    def consume_agg(self, row) -> None:
        self.counts = {
            pub: {"min": row[self._alias(f"{pub}__min")],
                  "max": row[self._alias(f"{pub}__max")]}
            for pub in self._pubs
        }

    def expr(self, col, name, df, ctx):
        return col

    def output_properties(self):
        # per-OUTPUT-column mapping (reference schema contract,
        # tests/unit/ops/test_value_count.py:63: each list column's
        # schema carries properties["value_count"] = {min, max})
        return {pub: {"value_count": c} for pub, c in self.counts.items()}

    def save_state(self):
        return {"counts": self.counts}

    def load_state(self, state):
        self.counts = state["counts"]
        self.fitted = True

    def merge_precheck(self, other: "ValueCount") -> None:
        self._require_fitted(), other._require_fitted()

    def merge_fitted(self, other: "ValueCount") -> None:
        for pub, c in other.counts.items():
            a = self.counts.get(pub)
            if a is None:
                self.counts[pub] = dict(c)
                continue
            for k, pick in (("min", min), ("max", max)):
                if c[k] is not None:
                    a[k] = c[k] if a[k] is None else pick(a[k], c[k])

    def output_tags(self):
        return ["list"]
