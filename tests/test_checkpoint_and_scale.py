"""Checkpoint/resume (north_rule) + scale-shape guards: broadcast
plans, salting correctness, generator determinism."""
import json
import os

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

import nvtabular_spark as nvt
from nvtabular_spark import ops
from nvtabular_spark.functions.skew import salted_agg
from nvtabular_spark.sources import (load_manifest, run_partitioned,
                                     tokenized_sequences)


def test_checkpoint_resume_skips_done_buckets(spark, tmp_path):
    df = spark.range(1000).select(
        F.col("id"), F.concat(F.lit("e"), (F.col("id") % 7).cast("string"))
        .alias("entity"))
    out_path = str(tmp_path / "ckpt")
    calls = []

    def transform(part):
        calls.append(1)
        return part.withColumn("twice", F.col("id") * 2)

    m1 = run_partitioned(df, out_path, "entity", 4, transform,
                         lineage={"input": "range(1000)", "step": "x2"})
    assert len(calls) == 4
    assert all(m1[str(b)]["status"] == "done" for b in range(4))
    assert sum(m1[str(b)]["rows"] for b in range(4)) == 1000
    assert all("value_hash" in m1[str(b)] for b in range(4))
    assert m1["0"]["lineage"]["step"] == "x2"

    # simulate partial failure: mark bucket 2 incomplete, re-run
    m = load_manifest(out_path)
    del m["2"]
    with open(os.path.join(out_path, "_manifest.json"), "w") as fh:
        json.dump(m, fh)
    calls.clear()
    m2 = run_partitioned(df, out_path, "entity", 4, transform)
    assert len(calls) == 1          # only the missing bucket re-ran
    assert m2["2"]["rows"] == m1["2"]["rows"]
    assert m2["2"]["value_hash"] == m1["2"]["value_hash"]

    total = spark.read.parquet(os.path.join(out_path, "bucket=*")).count()
    assert total == 1000


def test_salted_agg_matches_plain(spark):
    df = spark.range(10000).select(
        (F.col("id") % 3).alias("k"), (F.col("id") % 100).alias("v"))
    plain = df.groupBy("k").agg(F.sum("v").alias("v_sum"),
                                F.count("v").alias("v_count")) \
        .orderBy("k").toPandas()
    salted = salted_agg(df, ["k"], [("v", "sum"), ("v", "count")],
                        buckets=8).orderBy("k").toPandas()
    assert plain["v_sum"].tolist() == salted["v_sum"].tolist()
    assert plain["v_count"].tolist() == salted["v_count"].tolist()


def test_tokenized_sequences_deterministic(spark):
    a = tokenized_sequences(spark, 500, seed=42).orderBy("doc_id").toPandas()
    b = tokenized_sequences(spark, 500, seed=42, partitions=3) \
        .orderBy("doc_id").toPandas()
    assert a["doc_id"].tolist() == b["doc_id"].tolist()
    assert [list(x) for x in a["tokens"]] == [list(x) for x in b["tokens"]]
    # invariant: n_tok == len(tokens)
    assert (a["n_tok"] == a["tokens"].map(len)).all()
    assert a["tokens"].map(lambda t: max(t) < 50000 and min(t) >= 0).all()
    # skew: hot entities own a sizable share
    share = (a["entity_id"].str.startswith("e_hot")).mean()
    assert 0.10 < share < 0.35


def test_join_groupby_transform_is_broadcast(spark):
    rng = np.random.RandomState(1)
    df = spark.createDataFrame(pd.DataFrame({
        "cat": rng.choice(["a", "b"], 100), "v": rng.rand(100)}))
    jg = ops.JoinGroupby(cont_cols=["v"], stats=["mean"])
    out = nvt.Workflow(["cat"] >> jg).fit_transform(df)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan and "SortMergeJoin" not in plan


def test_bucketed_input_elides_window_shuffle(spark, tmp_path):
    """north-rule storage layout: entity-bucketed + ts-sorted tables
    make every windowed feature op shuffle-free (no Exchange)."""
    import uuid
    from nvtabular_spark.sources import tokenized_sequences, write_bucketed
    table = f"seqs_bucketed_{uuid.uuid4().hex[:8]}"
    df = tokenized_sequences(spark, 5000, seed=42)
    write_bucketed(df, table, buckets=4, key="entity_id",
                   sort_cols=["ts"])
    t = spark.table(table)
    lag = ops.Lag("entity_id", "ts", 1)
    sz = ops.Sessionize("entity_id", gap=1800.0)
    rt = ops.RollingAgg("entity_id", "ts", window_seconds=3600,
                        aggs=["mean"])
    td = ops.TimeDecay("entity_id", "ts", half_life_seconds=1800,
                       window_seconds=3600)
    out = nvt.Workflow((["n_tok"] >> lag) + (["ts"] >> sz)
                       + (["n_tok"] >> rt) + (["n_tok"] >> td)
                       + ["doc_id"]) \
        .transform(t)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    assert "Bucketed: true" in plan
    # and the result is still correct vs the unbucketed path
    base = nvt.Workflow((["n_tok"] >> ops.Lag("entity_id", "ts", 1))
                        + ["doc_id"]).transform(df) \
        .orderBy("doc_id").toPandas()
    got = out.select("doc_id", "n_tok_lag_1").orderBy("doc_id").toPandas()
    np.testing.assert_allclose(got["n_tok_lag_1"].to_numpy(dtype="float64"),
                               base["n_tok_lag_1"].to_numpy(dtype="float64"),
                               equal_nan=True)
    spark.sql(f"DROP TABLE IF EXISTS {table}")


def test_criteo_shape_transform_plan(spark):
    """26-column Categorify transform: every vocab join must be a
    broadcast hash join and the whole chain must plan with no shuffle
    Exchange (broadcast exchanges only)."""
    from nvtabular_spark.sources import synthetic_tabular
    df = synthetic_tabular(spark, 2000, n_cats=6, n_conts=2,
                           cat_cardinality=50)
    cat_cols = [f"cat_{i}" for i in range(6)]
    wf = nvt.Workflow(
        (cat_cols >> ops.Categorify(freq_threshold=2, num_buckets=4))
        + ([f"cont_{i}" for i in range(2)] >> ops.FillMissing(0)
           >> ops.LogOp()) + ["label"])
    out = wf.fit_transform(df)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert plan.count("BroadcastHashJoin") == 6
    assert "SortMergeJoin" not in plan
    # no shuffle exchanges — only broadcast exchanges
    assert "Exchange hashpartitioning" not in plan
    assert "Exchange rangepartitioning" not in plan


def test_expression_ops_fuse_into_single_codegen_stage(spark):
    """FillMissing→Clip→LogOp must stay one WholeStageCodegen projection
    — no shuffle, no extra stages (the 100 TB pipeline-fusion guard)."""
    df = spark.range(1000).select(F.col("id").cast("double").alias("x"))
    chain = ["x"] >> ops.FillMissing() >> ops.Clip(min_value=0) \
        >> ops.LogOp(out_dtype="double")
    out = nvt.Workflow(chain).fit_transform(df)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan      # no shuffle anywhere
    # codegen stages print as "*(n)"; everything must fuse into stage 1
    assert "*(1)" in plan and "*(2)" not in plan


def _has_iceberg(spark):
    try:
        spark.sparkContext._jvm.java.lang.Class.forName(
            "org.apache.iceberg.spark.SparkCatalog")
        return True
    except Exception:
        return False


def test_catalog_table_engine_and_lineage(spark):
    """read_dataset(engine='table') over a bucketed catalog table +
    checkpoint manifest carrying table lineage (SURVEY §2.11). Uses the
    built-in catalog — identical code path to an Iceberg catalog up to
    the catalog implementation."""
    import uuid
    from nvtabular_spark.sources import (read_dataset, run_partitioned,
                                         table_lineage, write_bucketed)
    from nvtabular_spark.sources.dataset import tokenized_sequences
    table = f"seqs_cat_{uuid.uuid4().hex[:8]}"
    write_bucketed(tokenized_sequences(spark, 2000, seed=7), table,
                   buckets=2, key="entity_id", sort_cols=["ts"])
    t = read_dataset(spark, table, engine="table")
    assert t.count() == 2000
    lin = table_lineage(spark, table)
    assert lin["table"] == table
    assert "iceberg_snapshot_id" not in lin     # no Iceberg runtime here
    assert lin.get("table_type") in ("MANAGED", "EXTERNAL")

    import tempfile
    out_dir = tempfile.mkdtemp(prefix="nvts_ckpt_")
    man = run_partitioned(
        t.select("doc_id", "entity_id", "n_tok"), out_dir,
        bucket_col="entity_id", num_buckets=2,
        transform=lambda d: d, lineage=lin)
    assert len(man) == 2
    for rec in man.values():
        assert rec["lineage"]["table"] == table
        assert rec["rows"] > 0
    spark.sql(f"DROP TABLE IF EXISTS {table}")


def test_iceberg_snapshot_lineage(spark):
    """Iceberg-specific lineage (snapshot ids, time travel, partition
    transforms). SKIPPED unless an Iceberg runtime jar is on the
    classpath — none can be vendored in this offline sandbox (no
    network, no pip/apt); table_lineage() already reads
    <table>.snapshots when the runtime is present."""
    if not _has_iceberg(spark):
        pytest.skip("no org.apache.iceberg runtime jar on the classpath "
                    "(offline sandbox); the snapshot-id path in "
                    "table_lineage() activates when one is added via "
                    "spark.jars.packages=org.apache.iceberg:"
                    "iceberg-spark-runtime-3.5_2.12")
    from nvtabular_spark.sources import table_lineage
    spark.sql("CREATE TABLE ice_t (id BIGINT) USING iceberg")
    spark.sql("INSERT INTO ice_t VALUES (1), (2)")
    lin = table_lineage(spark, "ice_t")
    assert "iceberg_snapshot_id" in lin
    spark.sql("DROP TABLE ice_t")


def test_iceberg_snapshot_parsing_via_metadata_double(spark):
    """Exercise table_lineage's Iceberg branch WITHOUT a runtime jar:
    Iceberg exposes snapshots as a ``<table>.snapshots`` metadata table
    (public interface), so a database named like the table with a
    ``snapshots`` table inside reproduces the exact SQL surface the
    branch queries — newest-snapshot selection and field extraction
    are fully covered; only the jar-backed catalog plumbing remains
    the documented skip above."""
    from nvtabular_spark.sources.checkpoint import table_lineage
    spark.sql("CREATE DATABASE IF NOT EXISTS iceberg_double")
    spark.sql("DROP TABLE IF EXISTS iceberg_double.snapshots")
    spark.sql("""
        CREATE TABLE iceberg_double.snapshots (
            snapshot_id BIGINT, committed_at TIMESTAMP) USING parquet""")
    spark.sql("""
        INSERT INTO iceberg_double.snapshots VALUES
        (111111111, TIMESTAMP '2024-01-01 00:00:00'),
        (333333333, TIMESTAMP '2024-03-01 00:00:00'),
        (222222222, TIMESTAMP '2024-02-01 00:00:00')""")
    try:
        lin = table_lineage(spark, "iceberg_double")
        assert lin["iceberg_snapshot_id"] == 333333333   # newest wins
        assert lin["committed_at"].startswith("2024-03-01")
        assert lin["table"] == "iceberg_double"
    finally:
        spark.sql("DROP TABLE IF EXISTS iceberg_double.snapshots")
        spark.sql("DROP DATABASE IF EXISTS iceberg_double")


def test_temporal_feature_stack_single_exchange(spark):
    """The full temporal feature stack over ONE entity key — lag,
    rolling, time-decay AND the expanding target encoding — must plan
    with exactly one hash Exchange (they all share the entity×ts
    window partitioning); WoE rides the same plan as a broadcast
    join, never a shuffle join."""
    from nvtabular_spark.sources import tokenized_sequences
    df = tokenized_sequences(spark, 5000, seed=42) \
        .withColumn("hi", (F.col("n_tok") > 20).cast("double"))
    stack = ((["n_tok"] >> ops.Lag("entity_id", "ts", 1))
             + (["n_tok"] >> ops.RollingAgg("entity_id", "ts",
                                            window_seconds=3600,
                                            aggs=["mean"]))
             + (["n_tok"] >> ops.TimeDecay("entity_id", "ts",
                                           half_life_seconds=1800,
                                           window_seconds=3600))
             + (["entity_id"] >> ops.ExpandingTargetEncoding(
                 target="n_tok", order_by="ts", p_smooth=20))
             + (["source"] >> ops.WoEEncoding(target="hi"))
             + ["doc_id"])
    out = nvt.Workflow(stack).fit_transform(df)
    plan = out._jdf.queryExecution().executedPlan().toString()
    import re
    shuffles = len(re.findall(r"Exchange hashpartitioning", plan))
    assert shuffles == 1, plan[:2000]
    assert "BroadcastHashJoin" in plan     # the WoE category table
    assert "SortMergeJoin" not in plan
    # and exactly one Window covering all four window-backed features
    assert plan.count("Window") >= 1
