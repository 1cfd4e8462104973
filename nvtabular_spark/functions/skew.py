"""Skew handling: salting for hot keys + AQE configuration.

The reference handles skew with per-column ``split_out`` and host spill
(MultiGPUBench.md:114-138). On Spark, joins get AQE skew handling for
free; *aggregations and windows over a hot entity* do not — one entity
with 10^8 rows funnels into one task. ``north_rule`` requires explicit
salted repartitioning, provided here as composable helpers.
"""

from __future__ import annotations

from typing import List, Optional

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def with_salt(df: DataFrame, salt_col: str = "__salt__",
              buckets: int = 16, by: Optional[Column] = None) -> DataFrame:
    """Add a salt column in [0, buckets). Default salt is uniform-random
    per row (rand is fine — salting needs no determinism); pass ``by``
    (e.g. ``F.pmod(F.xxhash64('ts'), lit(buckets))``) for a deterministic
    variant when retries must be stable."""
    salt = by if by is not None else (F.rand() * buckets).cast("int")
    return df.withColumn(salt_col, salt)


def salted_agg(df: DataFrame, keys: List[str], aggs: List[tuple],
               buckets: int = 16) -> DataFrame:
    """Two-stage aggregation for skewed group keys.

    ``aggs``: list of (col, fn) with fn in {'sum','count','min','max'} —
    the algebra must be decomposable (mean = sum/count composed by the
    caller). Stage 1 aggregates per (key, salt); stage 2 merges salts.
    Catalyst's partial aggregation usually makes this unnecessary for
    plain sums — use it when a downstream op forces a full shuffle by
    key (e.g. collect_list over a hot entity).
    """
    mergers = {"sum": F.sum, "count": F.sum, "min": F.min, "max": F.max}
    firsts = {"sum": F.sum, "count": lambda c: F.count(c).cast("long"),
              "min": F.min, "max": F.max}
    salted = with_salt(df, buckets=buckets)
    stage1 = salted.groupBy(*keys, "__salt__").agg(
        *[firsts[fn](F.col(c)).alias(f"{c}_{fn}") for c, fn in aggs])
    return stage1.groupBy(*keys).agg(
        *[mergers[fn](F.col(f"{c}_{fn}")).alias(f"{c}_{fn}")
          for c, fn in aggs])


def configure_aqe(spark, shuffle_partitions: Optional[int] = None,
                  advisory_partition_mb: int = 64) -> None:
    """Turn on the AQE features the engine relies on (runtime coalesce,
    skew-join splitting) — the Spark-native replacement for the
    reference's split_out/part_size tuning (SURVEY.md §4)."""
    conf = spark.conf
    conf.set("spark.sql.adaptive.enabled", "true")
    conf.set("spark.sql.adaptive.coalescePartitions.enabled", "true")
    conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
    conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes",
             f"{advisory_partition_mb}m")
    if shuffle_partitions:
        conf.set("spark.sql.shuffle.partitions", str(shuffle_partitions))
