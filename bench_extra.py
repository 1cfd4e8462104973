"""Round-6 optimization harness — NOT the graded bench (bench.py is
frozen; guide §1.4 noop-sink isolation lives here).

Times each headline query in isolation with a noop sink, captures
.explain("formatted") to plans/r06/, and (optionally) repeats. Also
times the two bench legs (tokenized workload + criteo-like) with
per-phase breakdown.

Usage:
  python bench_extra.py queries [repeat] [only_query ...]
  python bench_extra.py workload
  python bench_extra.py criteo
Env: SPARK_GRAFT_SF_DIR, SPARK_GRAFT_CPUS, PLANS_TAG (before/after)
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf1.0")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
TAG = os.environ.get("PLANS_TAG", "probe")
PLANS_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                         "plans", "r06")

HEADLINE = ["groupby_agg", "join_groupby", "categorify_freq_oov",
            "target_encoding", "asof_join", "sessionize", "rolling_agg",
            "expanding_te",
            "minhash_signature", "ngram_jaccard", "ann_cosine_topk",
            "tokens_pipeline", "simhash"]


def build_spark():
    from pyspark.sql import SparkSession
    s = (SparkSession.builder.master(f"local[{CPUS}]")
         .config("spark.sql.shuffle.partitions", str(CPUS))
         .config("spark.sql.adaptive.enabled", "true")
         .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
         .config("spark.sql.adaptive.skewJoin.enabled", "true")
         .config("spark.ui.enabled", "false")
         .config("spark.driver.memory",
                 os.environ.get("BENCH_DRIVER_MEM", "24g"))
         .config("spark.sql.session.timeZone", "UTC")
         .appName("nvtabular-spark-bench-extra").getOrCreate())
    s.sparkContext.setLogLevel("ERROR")
    return s


def sink(df):
    df.write.format("noop").mode("overwrite").save()


def capture_plan(df, name):
    os.makedirs(PLANS_DIR, exist_ok=True)
    txt = df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted")
    with open(os.path.join(PLANS_DIR, f"{name}_{TAG}.txt"), "w") as f:
        f.write(txt)


def run_queries(repeat=1, only=None):
    import functools

    import __spark_entry__ as entry
    spark = build_spark()
    qs = entry.queries()
    qs.setdefault("categorify_freq_oov", entry.q_categorify_freq_oov)
    for name in ("minhash_signature", "simhash", "tokens_pipeline",
                 "ngram_jaccard"):
        qs[name] = functools.partial(qs[name], family="xxhash64")
    names = only or HEADLINE
    out = {}
    for name in names:
        fn = qs[name]
        samples = []
        for i in range(repeat):
            spark.sparkContext.setJobDescription(f"{name}#{i}")
            df = fn(spark, SF_DIR)
            if i == 0:
                capture_plan(df, name)
            t0 = time.time()
            sink(df)
            samples.append(round(time.time() - t0, 3))
        out[name] = samples
        print(name, samples, flush=True)
    print(json.dumps({"sf_dir": SF_DIR, "samples": out}))


def run_workload():
    from bench import tokenized_workload
    spark = build_spark()
    print(json.dumps(tokenized_workload(
        spark, int(os.environ.get("BENCH_ROWS", "10000000")))))


def run_criteo():
    from bench import criteo_like_workload
    spark = build_spark()
    print(json.dumps(criteo_like_workload(
        spark, int(os.environ.get("BENCH_ROWS", "5000000")))))


if __name__ == "__main__":
    mode = sys.argv[1] if len(sys.argv) > 1 else "queries"
    if mode == "queries":
        rep = int(sys.argv[2]) if len(sys.argv) > 2 else 1
        only = sys.argv[3:] or None
        run_queries(rep, only)
    elif mode == "workload":
        run_workload()
    elif mode == "criteo":
        run_criteo()
