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

from .base import StatOperator, TransformContext


class DataStats(StatOperator):
    def __init__(self, exact_cardinality: bool = False):
        super().__init__()
        self.exact_cardinality = exact_cardinality
        self.stats: Dict[str, dict] = {}

    def fit(self, ctx: TransformContext, df: DataFrame) -> None:
        aggs = []
        total = F.count(F.lit(1))
        for pub, act in ctx.pairs():
            dt = df.schema[act].dataType
            c = F.col(act)
            if dt.simpleString() in ("double", "float"):
                c = F.when(F.isnan(c), F.lit(None)).otherwise(c)  # NaN ≡ null
            aggs.append((F.sum(c.isNull().cast("long")) / total)
                        .alias(f"{pub}__null_frac"))
            if isinstance(dt, NumericType):
                aggs += [F.min(c).alias(f"{pub}__min"),
                         F.max(c).alias(f"{pub}__max"),
                         F.mean(c.cast("double")).alias(f"{pub}__mean"),
                         F.stddev_samp(c.cast("double")).alias(f"{pub}__std")]
            elif isinstance(dt, StringType):
                card = (F.count_distinct(c) if self.exact_cardinality
                        else F.approx_count_distinct(c))
                aggs += [card.cast("long").alias(f"{pub}__cardinality"),
                         F.min(F.length(c)).alias(f"{pub}__min"),
                         F.max(F.length(c)).alias(f"{pub}__max"),
                         F.mean(F.length(c)).alias(f"{pub}__mean")]
            elif isinstance(dt, ArrayType):
                aggs += [F.min(F.size(c)).alias(f"{pub}__min"),
                         F.max(F.size(c)).alias(f"{pub}__max"),
                         F.mean(F.size(c)).alias(f"{pub}__mean")]
        row = df.agg(*aggs).collect()[0].asDict()
        self.stats = {}
        for pub, act in ctx.pairs():
            st = {k.split("__", 1)[1]: v for k, v in row.items()
                  if k.startswith(f"{pub}__")}
            st["dtype"] = df.schema[act].dataType.simpleString()
            self.stats[pub] = st
        self.fitted = True

    def expr(self, col, name, df, ctx):
        return col

    def save_state(self):
        return {"stats": self.stats}

    def load_state(self, state):
        self.stats = state["stats"]
        self.fitted = True
