"""Scalable global-order index assignment.

Categorify needs contiguous ids over a frequency-sorted vocabulary
(reference ``_write_uniques`` sort-by-size, categorify.py:1300-1316).
A naive ``row_number() OVER (ORDER BY ...)`` funnels the whole vocab
through ONE partition — fine at test scale, a straggler at 100 TB where
a high-cardinality column can have 10^8 uniques.

``with_global_index`` is the zipWithIndex pattern expressed fully in
DataFrame ops (JVM-side, no Python serialization): total sort → per-
partition row_number → tiny collected per-partition counts → cumulative
offset joined back as a literal map lookup.
"""

from __future__ import annotations

from typing import List, Optional

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def with_global_index(df: DataFrame, order_cols: List, index_col: str = "__gidx__",
                      start: int = 0) -> DataFrame:
    """Return ``df`` sorted by ``order_cols`` with a contiguous 0-based
    (plus ``start``) global index column, without a single-partition sort.

    ``order_cols``: list of Column expressions defining the total order.
    The result carries ``.total_rows`` (int) — the per-partition count
    job already knows it, so callers avoid a separate count() job.
    """
    sorted_df = df.repartitionByRange(*order_cols).sortWithinPartitions(*order_cols)
    sorted_df = sorted_df.withColumn("__pid__", F.spark_partition_id())
    w = Window.partitionBy("__pid__").orderBy(*order_cols)
    sorted_df = sorted_df.withColumn("__pos__", F.row_number().over(w))

    counts = sorted_df.groupBy("__pid__").count().collect()
    offsets = {}
    acc = start
    for row in sorted(counts, key=lambda r: r["__pid__"]):
        offsets[row["__pid__"]] = acc
        acc += row["count"]

    if not offsets:
        out = df.withColumn(index_col, F.lit(start).cast("long")).limit(0)
        out.total_rows = 0
        return out

    offset_expr = F.create_map(
        *[F.lit(x) for kv in offsets.items() for x in kv]
    )
    out = (
        sorted_df
        .withColumn(index_col,
                    (offset_expr[F.col("__pid__")] + F.col("__pos__") - 1)
                    .cast("long"))
        .drop("__pid__", "__pos__")
    )
    out.total_rows = acc - start
    return out
