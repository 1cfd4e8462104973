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
