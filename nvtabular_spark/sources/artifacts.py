"""Fitted-state materialization.

The reference writes fitted stats to parquet (``unique.<col>.parquet``,
categorify.py:719-822; JoinGroupby stats likewise) and caches them at
workers (cat_cache, categorify.py:1627-1643). We do the same with
Spark: fit results are written once to parquet and read back, cutting
the lineage to the (possibly 100 TB) input — so every downstream
transform re-reads a small columnar table instead of recomputing the
aggregation, and save/load gets the artifact for free.
"""

from __future__ import annotations

import os
import tempfile
import uuid
from typing import Optional, Tuple

from pyspark.sql import DataFrame


def materialize(df: DataFrame, name: str,
                out_path: Optional[str] = None) -> Tuple[DataFrame, str]:
    """Write ``df`` to parquet and return (read-back df, path)."""
    base = out_path or os.path.join(
        tempfile.gettempdir(), f"nvtspark_{uuid.uuid4().hex[:12]}")
    path = os.path.join(base, name)
    df.write.mode("overwrite").parquet(path)
    return df.sparkSession.read.parquet(path), path


def parquet_rows(path: str, fallback_df: Optional[DataFrame] = None) -> int:
    """Row count of a materialized parquet table WITHOUT a Spark job:
    sum the footer ``num_rows`` of each file driver-side (pyarrow).
    Every such count during fit was a full job-submission round-trip
    (~0.3-1 s of the fit's serial floor). Falls back to ``df.count()``
    for non-local paths (s3/hdfs) or unreadable footers."""
    try:
        import glob

        import pyarrow.parquet as pq
        files = glob.glob(os.path.join(path, "*.parquet"))
        if not files:
            raise FileNotFoundError(path)
        return sum(pq.ParquetFile(f).metadata.num_rows for f in files)
    except Exception:
        if fallback_df is not None:
            return fallback_df.count()
        raise


def small_parquet_pandas(path: str, max_rows: int = 200_000):
    """Driver-side pandas view of a SMALL materialized table (fit-time
    derivations like global means / max codes) — avoids a Spark
    job-submission round-trip per derivation. Returns None when the
    table exceeds ``max_rows`` or footers are unreadable (non-local
    storage); callers must then fall back to a Spark aggregation."""
    try:
        import glob

        import pyarrow.parquet as pq
        files = glob.glob(os.path.join(path, "*.parquet"))
        if not files:
            return None
        if sum(pq.ParquetFile(f).metadata.num_rows for f in files) > max_rows:
            return None
        import pyarrow as pa
        tables = [pq.read_table(f) for f in files]
        return (pa.concat_tables(tables).to_pandas()
                if len(tables) > 1 else tables[0].to_pandas())
    except Exception:
        return None
