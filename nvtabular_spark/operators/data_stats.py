"""DataStats — per-column statistics snapshot.

Reference: nvtabular/ops/data_stats.py:25-114 (per-column min/max/
mean/std, %NaN, cardinality) and tools/dataset_inspector.py:38+.
Transform is identity; stats land in ``op.stats`` (JSON-safe).
"""

from __future__ import annotations

from typing import Dict

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, NumericType, StringType

from .base import AggStatOperator, TransformContext


class DataStats(AggStatOperator):
    def __init__(self, exact_cardinality: bool = False):
        super().__init__()
        self.exact_cardinality = exact_cardinality
        self.stats: Dict[str, dict] = {}
        self.num_rows = None

    def agg_requests(self, ctx: TransformContext, df: DataFrame):
        total = F.count(F.lit(1))
        aggs = [total.alias(self._alias("__nrows__"))]
        self._pubs = [pub for pub, _ in ctx.pairs()]
        self._dtypes = {pub: df.schema[act].dataType.simpleString()
                        for pub, act in ctx.pairs()}
        for pub, act in ctx.pairs():
            dt = df.schema[act].dataType
            c = F.col(act)
            if dt.simpleString() in ("double", "float"):
                c = F.when(F.isnan(c), F.lit(None)).otherwise(c)  # NaN ≡ null
            # try_divide: empty input → NULL frac, not an ANSI
            # DIVIDE_BY_ZERO job failure
            aggs.append(F.try_divide(F.sum(c.isNull().cast("long")), total)
                        .alias(self._alias(f"{pub}::null_frac")))
            if isinstance(dt, NumericType):
                aggs += [F.min(c).alias(self._alias(f"{pub}::min")),
                         F.max(c).alias(self._alias(f"{pub}::max")),
                         F.mean(c.cast("double"))
                         .alias(self._alias(f"{pub}::mean")),
                         F.stddev_samp(c.cast("double"))
                         .alias(self._alias(f"{pub}::std"))]
            elif isinstance(dt, StringType):
                card = (F.count_distinct(c) if self.exact_cardinality
                        else F.approx_count_distinct(c))
                aggs += [card.cast("long")
                         .alias(self._alias(f"{pub}::cardinality")),
                         F.min(F.length(c)).alias(self._alias(f"{pub}::min")),
                         F.max(F.length(c)).alias(self._alias(f"{pub}::max")),
                         F.mean(F.length(c))
                         .alias(self._alias(f"{pub}::mean"))]
            elif isinstance(dt, ArrayType):
                aggs += [F.min(F.size(c)).alias(self._alias(f"{pub}::min")),
                         F.max(F.size(c)).alias(self._alias(f"{pub}::max")),
                         F.mean(F.size(c)).alias(self._alias(f"{pub}::mean"))]
        return aggs

    def consume_agg(self, row) -> None:
        d = row.asDict()
        prefix = self._agg_prefix + "__"
        self.num_rows = int(d.get(f"{prefix}__nrows__", 0) or 0)
        self.stats = {}
        for pub in self._pubs:
            st = {k[len(prefix) + len(pub) + 2:]: v for k, v in d.items()
                  if k.startswith(f"{prefix}{pub}::")}
            st["dtype"] = self._dtypes[pub]
            self.stats[pub] = st

    def expr(self, col, name, df, ctx):
        return col

    def save_state(self):
        return {"stats": self.stats}

    def load_state(self, state):
        self.stats = state["stats"]
        self.fitted = True
