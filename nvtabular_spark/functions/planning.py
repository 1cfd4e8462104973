"""Planning-time corpus-size estimation — WITHOUT a full scan.

``prefix_filter="auto"`` / ``num_planes="auto"`` need a row count only
to pick a physical plan.  Round 3 burned a full ``df.count()`` for it —
a whole corpus scan before any work, which at 100 TB is the single most
expensive operation in the job.  These helpers replace it:

* :func:`estimate_row_count` — statistics-only estimate (Catalyst
  ``rowCount`` when CBO stats exist, else file-source ``sizeInBytes`` /
  schema default row width).  Zero jobs.  Exact enough for a log₂-scale
  knob; callers needing precision pass an explicit count.
* :func:`at_least_n_rows` — exact threshold probe via ``LIMIT n``:
  scans only until n rows have been produced (one or a few input
  partitions under AQE), never the whole input.
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import DataFrame


def estimate_row_count(df: DataFrame) -> Optional[int]:
    """Best-effort row-count estimate from plan statistics — no job.

    Uses the optimized plan's ``rowCount`` when defined (CBO / catalog
    stats), else ``sizeInBytes ÷ schema.defaultSize()``.  The byte
    estimate is compressed-file-size over in-memory row width, so it
    can be off by the compression ratio (fine for choosing a bucket
    count, clamped downstream).  Returns None when no statistics are
    available (e.g. a purely local relation).
    """
    try:
        stats = df._jdf.queryExecution().optimizedPlan().stats()
        rc = stats.rowCount()
        if rc.isDefined():
            return int(str(rc.get()))
        size = int(str(stats.sizeInBytes()))
        width = max(int(df._jdf.schema().defaultSize()), 1)
        if size <= 0:
            return None
        return max(size // width, 1)
    except Exception:  # py4j / plan-shape drift — estimation is optional
        return None


def ensure_min_parallelism(df: DataFrame,
                           min_partitions: Optional[int] = None) -> DataFrame:
    """Round-robin repartition inputs that arrive with fewer partitions
    than the cluster has slots.

    A single-file parquet table with one row group plans as ONE scan
    task, so every per-row expression downstream (shingling, hashing,
    tokenizing) runs on one core no matter how wide the cluster is —
    and ``spark.sql.files.maxPartitionBytes`` cannot split it (byte
    ranges without a row-group boundary produce empty tasks).  At web
    scale inputs always carry ≥ defaultParallelism splits and this is a
    no-op; the repartition only fires for small/skinny inputs where the
    one extra tiny shuffle is far cheaper than the serialized compute.
    """
    sc = df.sparkSession.sparkContext
    target = min_partitions or sc.defaultParallelism
    try:
        cur = df.rdd.getNumPartitions()
    except Exception:
        return df
    return df.repartition(target) if cur < target else df


def at_least_n_rows(df: DataFrame, n: int) -> bool:
    """True iff ``df`` has ≥ n rows, via a ``LIMIT n`` probe.

    ``df.limit(n).count()`` stops scanning once n rows are collected
    (CollectLimit launches incrementally larger partition batches), so
    the cost is bounded by n rows regardless of corpus size — unlike a
    full ``df.count()``.
    """
    return df.limit(n).count() >= n
