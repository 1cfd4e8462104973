"""spark-submit entrypoint: run the tokenized-sequence preprocessing
pipeline over a parquet/Iceberg table with per-partition checkpoints.

    spark-submit --py-files dist/nvtabular_spark.zip \
        scripts/run_pipeline.py \
        --input /path/to/seqs --output /path/to/out \
        --buckets 64 [--table db.tokenized_seqs] [--resume]

The job is resumable: completed entity-hash buckets are skipped on
re-run (manifest carries lineage + row-count/hash per bucket).
"""

from __future__ import annotations

import argparse
import json
import os
import sys

# plain-python fallback; under spark-submit the --py-files zip provides it
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", help="parquet path of the sequence table")
    ap.add_argument("--table", help="catalog (e.g. Iceberg) table name")
    ap.add_argument("--output", required=True)
    ap.add_argument("--buckets", type=int, default=64,
                    help="entity-hash checkpoint buckets")
    ap.add_argument("--shuffle-partitions", type=int, default=None)
    ap.add_argument("--gap", type=float, default=1800.0)
    args = ap.parse_args()

    from pyspark.sql import SparkSession
    spark = SparkSession.builder.appName("nvtabular-spark-pipeline") \
        .getOrCreate()

    import nvtabular_spark as nvt
    from nvtabular_spark import ops
    from nvtabular_spark.functions.skew import configure_aqe
    from nvtabular_spark.sources import run_partitioned, read_dataset

    configure_aqe(spark, shuffle_partitions=args.shuffle_partitions)
    data = (spark.table(args.table) if args.table
            else read_dataset(spark, args.input))

    pipeline = (
        (["source", "entity_id"] >> ops.Categorify(freq_threshold=2,
                                                   num_buckets=16))
        + (["x", "y"] >> ops.FillMissing(0) >> ops.Normalize())
        + (["source"] >> ops.TargetEncoding(
            target="label", fold_col="doc_id", kfold=3, p_smooth=20)
           >> ops.Rename(postfix="_te"))
        + (["tokens"] >> ops.ListSlice(0, 64, pad=True, pad_value=0))
        + (["n_tok"] >> ops.Lag("entity_id", "ts", 1))
        + (["ts"] >> ops.Sessionize("entity_id", gap=args.gap))
        + ["doc_id", "n_tok", "ts", "label"]
    )
    wf = nvt.Workflow(pipeline)
    wf.fit(data)       # stats pass: broadcastable vocab/moment tables
    wf.save(args.output + "/_workflow")

    lineage = {"input": args.table or args.input,
               "workflow": args.output + "/_workflow"}
    manifest = run_partitioned(
        data, args.output, bucket_col="entity_id", num_buckets=args.buckets,
        transform=wf.transform, lineage=lineage)
    done = sum(1 for v in manifest.values() if v.get("status") == "done")
    rows = sum(v.get("rows", 0) for v in manifest.values())
    print(json.dumps({"buckets_done": done, "rows": rows,
                      "output": args.output}))


if __name__ == "__main__":
    main()
