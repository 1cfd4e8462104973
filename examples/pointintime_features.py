"""End-to-end example: point-in-time features over tokenized sequences.

The north-rule shape: entity×timestamp feature vectors with ZERO
temporal leakage — as-of joined reference values, lag/rolling window
features, session ids — over the (doc_id, tokens, n_tok, source, ...)
table, resumable from per-partition checkpoints.

    python examples/pointintime_features.py [n_rows] [out_dir]
"""
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

import nvtabular_spark as nvt
from nvtabular_spark import ops
from nvtabular_spark.functions.skew import configure_aqe
from nvtabular_spark.sources import run_partitioned, tokenized_sequences


def main():
    n_rows = int(sys.argv[1]) if len(sys.argv) > 1 else 200_000
    out_dir = sys.argv[2] if len(sys.argv) > 2 else \
        os.path.join(tempfile.mkdtemp(), "pit_out")

    spark = (SparkSession.builder.master(
        os.environ.get("SPARK_MASTER", "local[8]"))
        .config("spark.ui.enabled", "false")
        .appName("pointintime-features").getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")
    configure_aqe(spark)

    seqs = tokenized_sequences(spark, n_rows, seed=42)

    # an external reference stream to as-of join (e.g. hourly quality
    # scores per entity) — strictly t' < t, no leakage
    ref = (seqs.groupBy("entity_id",
                        F.date_trunc("hour", "ts").alias("ts"))
           .agg(F.avg("n_tok").alias("hourly_mean_len")))

    pipeline = (
        (["source", "entity_id"] >> ops.Categorify(num_buckets=16))
        + (["x", "y"] >> ops.FillMedian() >> ops.Normalize())
        + (["doc_id"] >> ops.AsOfJoin(ref, on="entity_id", ts_col="ts",
                                      allow_exact_matches=False,
                                      suffix="_asof"))["hourly_mean_len_asof"]
        + (["n_tok"] >> ops.Lag("entity_id", "ts", [1, 2]))
        + (["n_tok"] >> ops.RollingAgg("entity_id", "ts", window_rows=16,
                                       aggs=["mean", "max"]))
        + (["ts"] >> ops.Sessionize("entity_id", gap=1800.0))
        + (["tokens"] >> ops.ListSlice(0, 64, pad=True, pad_value=0))
        + ["doc_id", "ts", "label"]
    )

    wf = nvt.Workflow(pipeline)
    t0 = time.time()
    wf.fit(seqs)
    # resumable checkpointed transform: entity-hash buckets, each with
    # lineage + row-count/value-hash in the manifest
    manifest = run_partitioned(
        seqs, out_dir, bucket_col="entity_id", num_buckets=8,
        transform=wf.transform,
        lineage={"input": f"tokenized_sequences({n_rows}, seed=42)"})
    wall = time.time() - t0

    rows = sum(v["rows"] for v in manifest.values())
    print(f"rows={rows} wall={wall:.1f}s "
          f"throughput={rows / wall:,.0f} sequences/s")
    print("buckets:", {k: v["rows"] for k, v in manifest.items()})
    print("output:", out_dir)


if __name__ == "__main__":
    main()
