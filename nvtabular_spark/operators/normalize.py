"""Normalize (z-score) and NormalizeMinMax.

Reference: nvtabular/ops/normalize.py:33-124 (fit mean/std via
``_custom_moments`` — moments.py:28-116: tree-reduced count/sum/sum²
with ddof=1 finalize) and :127-213 (min-max; ``dif == 0`` → ``x/(2x)``).

Spark-first: the reference's hand-built tree reduction collapses to one
``df.agg`` — Catalyst plans partial+final HashAggregate automatically,
which IS the tree reduction. We aggregate count/sum/sum² explicitly for
exact ddof=1 parity with moments.py:89-116.
"""

from __future__ import annotations

import math
from typing import Dict

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .base import AggStatOperator, StatOperator, TransformContext


def _is_list_col(df: DataFrame, name: str) -> bool:
    from pyspark.sql.types import ArrayType
    return isinstance(df.schema[name].dataType, ArrayType)


class Normalize(AggStatOperator):
    """z-score: ``(x - mean) / std`` with sample std (ddof=1); columns
    with std == 0 pass through centered (guard mirrors
    normalize.py:86-90). Batchable: its fit is one count/sum/sum² agg
    (moments.py:28-116), fused with sibling stat ops into one job.

    Numerical note: the one-pass ``(s2 − s²/n)/(n−1)`` finalize (scalar
    AND flattened-list paths) deliberately mirrors the reference's own
    ``_custom_moments`` sum formula — same cancellation behavior for
    large-offset/small-variance data (e.g. epoch timestamps), where
    both engines degrade toward std≈0 and the guard centers without
    scaling. Pre-shift such columns (e.g. subtract a base timestamp)
    before normalizing; the fused JoinGroupby var path uses Chan
    merging because there dtype/precision parity is contractual."""

    def __init__(self, out_dtype: str = "double"):
        super().__init__()
        self.out_dtype = out_dtype
        self.means: Dict[str, float] = {}
        self.stds: Dict[str, float] = {}
        self.moments: Dict[str, list] = {}    # pub -> [n, sum, sum_sq]

    def agg_requests(self, ctx: TransformContext, df: DataFrame):
        aggs = []
        self._pubs = [pub for pub, _ in ctx.pairs()]
        for pub, act in ctx.pairs():
            if _is_list_col(df, act):
                # list columns: moments over the FLATTENED values
                # (reference moments.py:68-69 via _custom_moments) —
                # a per-row fold inside the same single fused agg job
                vals = F.filter(
                    F.transform(F.col(act), lambda x: x.cast("double")),
                    lambda x: x.isNotNull() & ~F.isnan(x))
                vals = F.when(F.col(act).isNull(),
                              F.array().cast("array<double>")) \
                    .otherwise(vals)
                aggs += [
                    F.sum(F.size(vals)).alias(self._alias(f"{pub}__n")),
                    F.sum(F.aggregate(vals, F.lit(0.0),
                                      lambda a, x: a + x))
                    .alias(self._alias(f"{pub}__s")),
                    F.sum(F.aggregate(vals, F.lit(0.0),
                                      lambda a, x: a + x * x))
                    .alias(self._alias(f"{pub}__s2")),
                ]
                continue
            c = F.col(act).cast("double")
            c = F.when(F.isnan(c), F.lit(None)).otherwise(c)  # NaN ≡ missing
            aggs += [
                F.count(c).alias(self._alias(f"{pub}__n")),
                F.sum(c).alias(self._alias(f"{pub}__s")),
                F.sum(c * c).alias(self._alias(f"{pub}__s2")),
            ]
        return aggs

    def consume_agg(self, row) -> None:
        for pub in self._pubs:
            n = row[self._alias(f"{pub}__n")] or 0
            s = row[self._alias(f"{pub}__s")] or 0.0
            s2 = row[self._alias(f"{pub}__s2")] or 0.0
            # raw moments retained: they are the distributive sufficient
            # statistic that makes fitted state mergeable (plans/merge.py)
            self.moments[pub] = [int(n), float(s), float(s2)]
            self._finalize(pub)

    def _finalize(self, pub: str) -> None:
        n, s, s2 = self.moments[pub]
        mean = s / n if n else 0.0
        # ddof=1 finalize, exactly moments.py:89-116
        var = (s2 - s * s / n) / (n - 1) if n > 1 else 0.0
        self.means[pub] = float(mean)
        self.stds[pub] = math.sqrt(max(var, 0.0))

    def merge_precheck(self, other: "Normalize") -> None:
        from ..plans.merge import WorkflowMergeError
        self._require_fitted(), other._require_fitted()
        if not self.moments or not other.moments:
            raise WorkflowMergeError(
                "Normalize fitted state predates moment tracking (loaded "
                "from an old save?) — re-fit before merging")

    def merge_fitted(self, other: "Normalize") -> None:
        for pub, (n, s, s2) in other.moments.items():
            a = self.moments.get(pub, [0, 0.0, 0.0])
            self.moments[pub] = [a[0] + n, a[1] + s, a[2] + s2]
            self._finalize(pub)

    def transform(self, ctx: TransformContext, df: DataFrame) -> DataFrame:
        self._require_fitted()
        cols = {}
        for pub, act in ctx.pairs():
            # factory, NOT default-arg lambda: F.transform calls 2-arg
            # callables as (element, index)
            def _make_z(_m, _s):
                def _z(c):
                    expr = c.cast("double") - F.lit(_m)
                    if _s > 0:
                        expr = expr / F.lit(_s)
                    return expr.cast(self.out_dtype)
                return _z

            _z = _make_z(self.means[pub], self.stds[pub])

            if _is_list_col(df, act):
                # element-wise z-score with the flattened-global moments
                # (reference normalize.py:75-88 flatten → encode back)
                cols[ctx.out(pub)] = F.transform(F.col(act), _z)
            else:
                cols[ctx.out(pub)] = _z(F.col(act))
        return df.withColumns(cols)

    def save_state(self):
        return {"means": self.means, "stds": self.stds,
                "moments": self.moments}

    def load_state(self, state):
        self.means, self.stds = state["means"], state["stds"]
        self.moments = state.get("moments", {})
        self.fitted = True

    def clear(self):
        super().clear()
        self.means, self.stds, self.moments = {}, {}, {}

    def output_tags(self):
        return ["continuous"]


class NormalizeMinMax(AggStatOperator):
    """``(x - min) / (max - min)``; when max == min the reference yields
    x/(2x) = 0.5 (normalize.py:196-204). Batchable fit."""

    def __init__(self, out_dtype: str = "double"):
        super().__init__()
        self.out_dtype = out_dtype
        self.mins: Dict[str, float] = {}
        self.maxs: Dict[str, float] = {}
        self.raw_minmax: Dict[str, list] = {}  # pub -> [min|None, max|None]

    def agg_requests(self, ctx: TransformContext, df: DataFrame):
        aggs = []
        self._pubs = [pub for pub, _ in ctx.pairs()]
        for pub, act in ctx.pairs():
            c = F.col(act).cast("double")
            c = F.when(F.isnan(c), F.lit(None)).otherwise(c)  # NaN ≡ missing
            aggs += [F.min(c).alias(self._alias(f"{pub}__min")),
                     F.max(c).alias(self._alias(f"{pub}__max"))]
        return aggs

    def consume_agg(self, row) -> None:
        for pub in self._pubs:
            mn = row[self._alias(f"{pub}__min")]
            mx = row[self._alias(f"{pub}__max")]
            # raw (None-preserving) extrema retained for exact merging:
            # the 0.0 fallback below is a FINALIZE rule for all-null
            # columns, not a real minimum, and must not win a merge
            self.raw_minmax[pub] = [None if mn is None else float(mn),
                                    None if mx is None else float(mx)]
            self.mins[pub] = float(mn or 0.0)
            self.maxs[pub] = float(mx or 0.0)

    def merge_precheck(self, other: "NormalizeMinMax") -> None:
        from ..plans.merge import WorkflowMergeError
        self._require_fitted(), other._require_fitted()
        if not self.raw_minmax or not other.raw_minmax:
            raise WorkflowMergeError(
                "NormalizeMinMax fitted state predates raw-extrema "
                "tracking (loaded from an old save?) — re-fit before "
                "merging")

    def merge_fitted(self, other: "NormalizeMinMax") -> None:
        for pub, (mn_b, mx_b) in other.raw_minmax.items():
            mn_a, mx_a = self.raw_minmax.get(pub, [None, None])
            mn = mn_b if mn_a is None else (
                mn_a if mn_b is None else min(mn_a, mn_b))
            mx = mx_b if mx_a is None else (
                mx_a if mx_b is None else max(mx_a, mx_b))
            self.raw_minmax[pub] = [mn, mx]
            self.mins[pub] = float(mn or 0.0)
            self.maxs[pub] = float(mx or 0.0)

    def transform(self, ctx: TransformContext, df: DataFrame) -> DataFrame:
        self._require_fitted()
        cols = {}
        for pub, act in ctx.pairs():
            c = F.col(act).cast("double")
            lo, hi = self.mins[pub], self.maxs[pub]
            dif = hi - lo
            if dif != 0:
                expr = (c - F.lit(lo)) / F.lit(dif)
            else:
                # degenerate max==min: reference x/(2x) → 0.5 (0 for
                # x==0); NULL must stay NULL — `null == 0` is null, so
                # guard nulls before the zero test
                expr = (F.when(c.isNull() | F.isnan(c),
                               F.lit(None).cast("double"))
                        .when(c == 0, F.lit(0.0))
                        .otherwise(F.lit(0.5)))
            cols[ctx.out(pub)] = expr.cast(self.out_dtype)
        return df.withColumns(cols)

    def save_state(self):
        return {"mins": self.mins, "maxs": self.maxs,
                "raw_minmax": self.raw_minmax}

    def load_state(self, state):
        self.mins, self.maxs = state["mins"], state["maxs"]
        self.raw_minmax = state.get("raw_minmax", {})
        self.fitted = True

    def clear(self):
        super().clear()
        self.mins, self.maxs, self.raw_minmax = {}, {}, {}

    def output_tags(self):
        return ["continuous"]
