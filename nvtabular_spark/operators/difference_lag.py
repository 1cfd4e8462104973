"""DifferenceLag — ``x - shift(x, k)`` within entity partitions.

Reference: nvtabular/ops/difference_lag.py:23-105 — partition-local,
REQUIRES the caller to have pre-shuffled + pre-sorted by the partition
keys. Spark window functions are globally correct without that contract:
``F.lag(c, k).over(Window.partitionBy(keys).orderBy(ts))`` shuffles on
the entity key exactly once and AQE handles skewed entities (see also
functions/skew.py for salting when one entity dominates).
"""

from __future__ import annotations

from typing import List, Optional, Union

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .base import Operator, TransformContext
from ..functions.planning import scale_window_partitions
from ..plans.graph import ColumnSelector


class DifferenceLag(Operator):
    cheap_transform = False  # window-backed

    def __init__(self, partition_cols: Union[str, List[str]],
                 shift: Union[int, List[int]] = 1,
                 order_by: Optional[Union[str, List[str]]] = None):
        self.partition_cols = [partition_cols] if isinstance(partition_cols, str) \
            else list(partition_cols)
        self.shifts = [shift] if isinstance(shift, int) else list(shift)
        if order_by is None:
            order_by = []
        self.order_by = [order_by] if isinstance(order_by, str) else list(order_by)

    def dependencies(self):
        return self.partition_cols + self.order_by

    def output_column_names(self, selector: ColumnSelector):
        return [f"{c}_difference_lag_{s}" for c in selector.names
                for s in self.shifts]

    def window_fusion(self, ctx, df):
        order = self.order_by or self.partition_cols
        w = Window.partitionBy(*self.partition_cols).orderBy(*order)
        cols = {}
        for pub, act in ctx.pairs():
            for s in self.shifts:
                name = ctx.out(f"{pub}_difference_lag_{s}")
                shifted = F.lag(F.col(act), s).over(w) if s >= 0 \
                    else F.lead(F.col(act), -s).over(w)
                cols[name] = F.col(act) - shifted
        return cols

    def transform(self, ctx: TransformContext, df: DataFrame) -> DataFrame:
        df = scale_window_partitions(df, self.partition_cols)
        return df.withColumns(self.window_fusion(ctx, df))

    def output_tags(self):
        return ["continuous"]
