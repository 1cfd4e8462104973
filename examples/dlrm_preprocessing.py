"""End-to-end example: Criteo/DLRM-style preprocessing.

Mirrors the reference benchmark pipeline
(bench/examples/dask-nvtabular-criteo-benchmark.py:200-252) on the
synthetic generator — the exact pipeline a reference user would port:

    python examples/dlrm_preprocessing.py [n_rows] [out_dir]
"""
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession

import nvtabular_spark as nvt
from nvtabular_spark import ops
from nvtabular_spark.functions.skew import configure_aqe
from nvtabular_spark.operators.categorify import get_embedding_sizes
from nvtabular_spark.sources import synthetic_tabular, write_shuffled


def main():
    n_rows = int(sys.argv[1]) if len(sys.argv) > 1 else 500_000
    out_dir = sys.argv[2] if len(sys.argv) > 2 else \
        os.path.join(tempfile.mkdtemp(), "dlrm_out")

    spark = (SparkSession.builder.master(
        os.environ.get("SPARK_MASTER", "local[8]"))
        .config("spark.ui.enabled", "false")
        .appName("dlrm-preprocessing").getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")
    configure_aqe(spark)

    # 26 categorical + 13 continuous + label, like Criteo
    raw = synthetic_tabular(spark, n_rows, n_cats=26, n_conts=13,
                            cat_cardinality=50_000)
    cat_cols = [f"cat_{i}" for i in range(26)]
    cont_cols = [f"cont_{i}" for i in range(13)]

    pipeline = (
        (cat_cols >> ops.Categorify(freq_threshold=15, num_buckets=16))
        + (cont_cols >> ops.FillMissing(0) >> ops.Clip(min_value=0)
           >> ops.LogOp())
        + ["label"]
    )

    wf = nvt.Workflow(pipeline)
    t0 = time.time()
    wf.fit(raw)                                    # statistics pass
    out = wf.transform(raw)                        # lazy transform
    write_shuffled(out, out_dir, shuffle="per_partition")  # training sink
    wall = time.time() - t0

    wf.save(os.path.join(out_dir, "_workflow"))    # reusable artifact
    sizes = get_embedding_sizes(wf)
    print(f"rows={n_rows} wall={wall:.1f}s "
          f"throughput={n_rows / wall:,.0f} rows/s")
    print("embedding sizes (first 3):",
          {k: sizes[k] for k in list(sizes)[:3]})
    print("output:", out_dir)


if __name__ == "__main__":
    main()
