"""Per-partition checkpoint manifest: lineage + row-count/hash metrics.

north_rule: "resumable from per-partition checkpoints carrying lineage
+ row-count/hash metrics". The reference has none (Dask recomputes).

Design: a transform job writes its output partitioned by a bucket
column; after each bucket lands, a manifest row records
(bucket, rows, value_hash, input_lineage, wall_s). On re-run,
completed buckets are skipped — idempotent resume. The value hash is
an order-insensitive xor/sum over xxhash64 of the row's canonical
string — cheap, associative, partition-order independent.
"""

from __future__ import annotations

import json
import os
import time
from typing import Callable, Dict, List, Optional

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

MANIFEST_NAME = "_manifest.json"


def row_signature(df: DataFrame, cols: Optional[List[str]] = None):
    """(count, order-insensitive hash) aggregate expressions."""
    cols = cols or df.columns
    h = F.xxhash64(*[F.col(c).cast("string") for c in cols])
    # bit_xor: associative + commutative + overflow-free (ANSI-safe)
    return [F.count(F.lit(1)).alias("rows"),
            F.bit_xor(h).alias("value_hash")]


def table_lineage(spark: SparkSession, table: str) -> dict:
    """Lineage record for a catalog table input (north_rule: checkpoint
    manifests carry input lineage; SURVEY §2.11 names Iceberg snapshot
    ids). For an Iceberg table the current snapshot id + timestamp are
    read from its ``.snapshots`` metadata table; any other catalog
    table (Hive/in-memory, e.g. ``write_bucketed`` output) falls back
    to the catalog's createTime — still a monotone version surrogate.
    The Iceberg path is exercised only when an Iceberg runtime jar is
    on the session classpath (none is vendored in this sandbox; see
    tests/test_checkpoint_and_scale.py::test_iceberg_snapshot_lineage).
    """
    lineage: dict = {"table": table}
    try:
        snap = spark.sql(
            f"SELECT snapshot_id, committed_at FROM {table}.snapshots "
            f"ORDER BY committed_at DESC LIMIT 1").collect()
        if snap:
            lineage["iceberg_snapshot_id"] = int(snap[0]["snapshot_id"])
            lineage["committed_at"] = str(snap[0]["committed_at"])
            return lineage
    except Exception:
        pass  # not an Iceberg table / no Iceberg runtime
    try:
        t = spark.catalog.getTable(table)
        lineage["catalog"] = t.catalog
        lineage["table_type"] = t.tableType
        detail = spark.sql(f"DESCRIBE TABLE EXTENDED {table}").collect()
        for r in detail:
            if r["col_name"] in ("Created Time", "Location"):
                lineage[r["col_name"].lower().replace(" ", "_")] = \
                    r["data_type"]
    except Exception:
        pass
    return lineage


def _manifest_path(output_path: str) -> str:
    return os.path.join(output_path, MANIFEST_NAME)


def load_manifest(output_path: str) -> Dict[str, dict]:
    p = _manifest_path(output_path)
    if not os.path.exists(p):
        return {}
    with open(p) as fh:
        return json.load(fh)


def save_manifest(output_path: str, manifest: Dict[str, dict]) -> None:
    os.makedirs(output_path, exist_ok=True)
    tmp = _manifest_path(output_path) + ".tmp"
    with open(tmp, "w") as fh:
        json.dump(manifest, fh, indent=2)
    os.replace(tmp, _manifest_path(output_path))


def run_partitioned(df: DataFrame, output_path: str, bucket_col: str,
                    num_buckets: int,
                    transform: Callable[[DataFrame], DataFrame],
                    lineage: Optional[dict] = None,
                    sig_cols: Optional[List[str]] = None) -> Dict[str, dict]:
    """Execute ``transform`` bucket-by-bucket with resume.

    ``df`` gains a deterministic bucket id (hash of ``bucket_col`` —
    e.g. the entity key, so window/as-of state stays bucket-local).
    Buckets already present in the manifest are SKIPPED. Each completed
    bucket appends parquet under ``bucket=<i>/`` plus a manifest row
    {rows, value_hash, lineage, wall_s} — giving per-partition lineage
    and integrity metrics for the whole run.
    """
    manifest = load_manifest(output_path)
    bucketed = df.withColumn(
        "__bucket__", F.pmod(F.xxhash64(F.col(bucket_col)),
                             F.lit(num_buckets)).cast("int"))
    for b in range(num_buckets):
        key = str(b)
        if key in manifest and manifest[key].get("status") == "done":
            continue
        t0 = time.time()
        part = bucketed.filter(F.col("__bucket__") == b).drop("__bucket__")
        out = transform(part)
        out_path = os.path.join(output_path, f"bucket={b}")
        out.write.mode("overwrite").parquet(out_path)
        back = out.sparkSession.read.parquet(out_path)
        sig = back.agg(*row_signature(back, sig_cols)).collect()[0]
        manifest[key] = {
            "status": "done",
            "rows": sig["rows"],
            "value_hash": int(sig["value_hash"]) if sig["value_hash"]
            is not None else 0,
            "lineage": lineage or {},
            "wall_s": round(time.time() - t0, 3),
        }
        save_manifest(output_path, manifest)
    return manifest
