"""Workflow mechanics: DAG algebra, pruning, serialization round-trip
(reference test_workflow.py:691-838)."""
import os

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

import nvtabular_spark as nvt
from nvtabular_spark import ops
from nvtabular_spark.plans.serializer import WorkflowSerializationError


@pytest.fixture()
def pipeline_df(spark):
    rng = np.random.RandomState(5)
    return spark.createDataFrame(pd.DataFrame({
        "cat": rng.choice(["a", "b", "c"], 100),
        "x": rng.randn(100),
        "y": rng.rand(100),
        "rid": np.arange(100, dtype="int64"),
        "fold": (np.arange(100) % 3).astype("int32"),
    }))


def _pipeline():
    return ((["cat"] >> ops.Categorify())
            + (["x"] >> ops.FillMissing() >> ops.Normalize())
            + (["cat"] >> ops.TargetEncoding(
                target="y", fold_col="fold", fold_is_precomputed=True)
               >> ops.Rename(postfix="_smoothed"))
            + ["rid"])


def test_save_load_round_trip(spark, pipeline_df, tmp_path):
    """Reference contract: transform-after-load ≡ transform-before-save
    (test_workflow.py:691-725)."""
    wf = nvt.Workflow(_pipeline())
    before = wf.fit_transform(pipeline_df).orderBy("rid").toPandas()
    path = str(tmp_path / "wf")
    wf.save(path)
    wf2 = nvt.Workflow.load(path, spark)
    after = wf2.transform(pipeline_df).orderBy("rid").toPandas()
    pd.testing.assert_frame_equal(before, after)
    assert os.path.exists(os.path.join(path, "graph.json"))
    assert os.path.exists(os.path.join(path, "metadata.json"))


def test_lambda_rejected_at_save(spark, pipeline_df, tmp_path):
    wf = nvt.Workflow((["x"] >> ops.LambdaOp(lambda s: s + 1)) + ["rid"])
    wf.fit(pipeline_df)
    with pytest.raises(WorkflowSerializationError):
        wf.save(str(tmp_path / "bad"))


def test_input_column_pruning(spark, pipeline_df):
    """Reference workflow.py:239 — only DAG-referenced columns are read."""
    wf = nvt.Workflow(["cat"] >> ops.Categorify())
    assert set(wf.input_columns()) == {"cat"}
    wf2 = nvt.Workflow(_pipeline())
    assert set(wf2.input_columns()) == {"cat", "x", "y", "rid", "fold"}


def test_branch_subtraction_and_subset(spark, pipeline_df):
    node = (["cat", "x", "rid"] >> ops.FillMissing()) - ["x"]
    out = nvt.Workflow(node).fit_transform(pipeline_df)
    assert out.columns == ["cat", "rid"]
    node2 = (["cat", "x", "rid"] >> ops.FillMissing())["rid"]
    out2 = nvt.Workflow(node2).fit_transform(pipeline_df)
    assert out2.columns == ["rid"]


def test_fit_is_idempotent_per_fit_call(spark, pipeline_df):
    wf = nvt.Workflow(_pipeline())
    a = wf.fit_transform(pipeline_df).orderBy("rid").toPandas()
    b = wf.transform(pipeline_df).orderBy("rid").toPandas()
    pd.testing.assert_frame_equal(a, b)


def test_transform_new_data_uses_frozen_stats(spark, pipeline_df):
    wf = nvt.Workflow((["x"] >> ops.Normalize()) + ["rid"])
    wf.fit(pipeline_df)
    op = wf.plan.order[1].op if wf.plan.order[1].op else wf.plan.order[0].op
    new = spark.createDataFrame(pd.DataFrame({
        "x": [1000.0], "rid": [0]}))
    out = wf.transform(new).toPandas()
    node_op = [n.op for n in wf.plan.order
               if n.op and isinstance(n.op, ops.Normalize)][0]
    exp = (1000.0 - node_op.means["x"]) / node_op.stds["x"]
    np.testing.assert_allclose(out["x"].iloc[0], exp, rtol=1e-12)


def test_output_schema_tags(spark, pipeline_df):
    wf = nvt.Workflow(_pipeline())
    wf.fit(pipeline_df)
    assert "categorical" in wf.output_schema["cat"].tags
    assert "continuous" in wf.output_schema["x"].tags


def test_source_scan_prunes_columns(spark, tmp_path, pipeline_df):
    """ReadSchema of the parquet scan must contain only DAG columns —
    the 100 TB scan-cost guard."""
    p = str(tmp_path / "t.parquet")
    pipeline_df.write.parquet(p)
    df = spark.read.parquet(p)
    wf = nvt.Workflow(["cat"] >> ops.Categorify())
    wf.fit(df)
    plan = wf.transform(df)._jdf.queryExecution().executedPlan().toString()
    import re
    read_schema = re.search(r"ReadSchema: ([^\n]+)", plan)
    assert read_schema and "x" not in read_schema.group(1)
    assert "cat" in read_schema.group(1)


def test_chained_heavy_ops_categorify_then_rename(spark, pipeline_df):
    """Regression: a node consuming a deferred heavy fit's output must
    flush pending_heavy even when no AggStatOperator is pending
    (compiler.py flush guard). Categorify >> Rename is the canonical
    reference chaining pattern (reference test_workflow.py:COLUMN ops)."""
    wf = nvt.Workflow(
        (["cat"] >> ops.Categorify() >> ops.Rename(postfix="_enc"))
        + ["rid"])
    out = wf.fit_transform(pipeline_df).orderBy("rid").toPandas()
    assert "cat_enc" in out.columns
    # 3 distinct values, encoded starting at OOV_OFFSET + 1 bucket = 3
    assert out["cat_enc"].between(3, 5).all()
    assert out["cat_enc"].nunique() == 3


def test_chained_heavy_ops_categorify_then_target_encoding(spark, pipeline_df):
    """Categorify >> TargetEncoding: two heavy deferred fits where the
    second consumes the first's output column."""
    wf = nvt.Workflow(
        (["cat"] >> ops.Categorify()
         >> ops.TargetEncoding(target="y", fold_col="fold",
                               fold_is_precomputed=True))
        + ["rid", "y"])
    out = wf.fit_transform(pipeline_df).orderBy("rid").toPandas()
    te_col = [c for c in out.columns if c.startswith("TE_")][0]
    assert out[te_col].notna().all()
    # smoothed encodings stay inside the target's observed range
    assert out[te_col].between(out["y"].min(), out["y"].max()).all()


def test_shared_key_fit_fusion_single_scan(spark, pipeline_df):
    """JoinGroupby + TargetEncoding (+ a second TE) grouping by the
    same key must fit from ONE shared groupBy job — the input-scan
    count per key set is constant in the number of ops (fit_report
    asserts the plan shape; value-equality vs standalone fits asserts
    correctness)."""
    jg = ops.JoinGroupby(cont_cols=["y"], stats=["count", "mean", "std"])
    te1 = ops.TargetEncoding(target="y", fold_col="fold",
                             fold_is_precomputed=True)
    te2 = ops.TargetEncoding(target="x", fold_col="fold",
                             fold_is_precomputed=True)
    flow = ((["cat"] >> jg) + ((["cat"] >> te1) - ["cat"])
            + (["cat"] >> te2 >> ops.Rename(postfix="_x")) + ["rid", "y"])
    wf = nvt.Workflow(flow)
    fused = wf.fit_transform(pipeline_df).orderBy("rid").toPandas()
    rep = wf.plan.fit_report
    assert rep["fused_groups"] == 1          # one key set -> one scan
    assert rep["fused_requests"] == 3        # serving all three ops
    assert rep["standalone_fits"] == 0

    # correctness: identical values to three standalone fits
    solo_jg = nvt.Workflow((["cat"] >> ops.JoinGroupby(
        cont_cols=["y"], stats=["count", "mean", "std"])) + ["rid"])
    solo = solo_jg.fit_transform(pipeline_df).orderBy("rid").toPandas()
    for c in ("cat_count", "cat_y_mean", "cat_y_std"):
        np.testing.assert_allclose(fused[c].to_numpy(dtype="float64"),
                                   solo[c].to_numpy(dtype="float64"),
                                   rtol=1e-9, err_msg=c)
    solo_te = nvt.Workflow((["cat"] >> ops.TargetEncoding(
        target="y", fold_col="fold", fold_is_precomputed=True))
        + ["rid"]).fit_transform(pipeline_df).orderBy("rid").toPandas()
    np.testing.assert_allclose(fused["TE_cat_y"], solo_te["TE_cat_y"],
                               rtol=1e-9)


def test_fusion_respects_distinct_keys(spark, pipeline_df):
    """Ops grouping by DIFFERENT keys must not share a groupBy."""
    pdf2 = pipeline_df.withColumn("cat2",
                                  F.concat(F.col("cat"), F.lit("_z")))
    flow = ((["cat"] >> ops.JoinGroupby(cont_cols=["y"], stats=["mean"]))
            + (["cat2"] >> ops.JoinGroupby(cont_cols=["y"], stats=["sum"]))
            + ["rid"])
    wf = nvt.Workflow(flow)
    out = wf.fit_transform(pdf2).orderBy("rid").toPandas()
    assert wf.plan.fit_report["fused_groups"] == 2
    assert "cat_y_mean" in out.columns and "cat2_y_sum" in out.columns


def test_fusion_multi_column_keys(spark, pipeline_df):
    """Fusion with a composite (2-column) group key: TE and JoinGroupby
    over [['cat','fold']] must share one groupBy and stay value-correct."""
    pdf = pipeline_df.withColumn("cat2", (F.col("rid") % 2).cast("string"))
    jg = ops.JoinGroupby(cont_cols=["y"], stats=["mean"])
    te = ops.TargetEncoding(target="y", fold_col="rid", kfold=2)
    flow = (([["cat", "cat2"]] >> jg)
            + (([["cat", "cat2"]] >> te) - ["cat", "cat2"])
            + ["rid", "y"])
    wf = nvt.Workflow(flow)
    out = wf.fit_transform(pdf).orderBy("rid").toPandas()
    rep = wf.plan.fit_report
    assert rep["fused_groups"] == 1 and rep["fused_requests"] == 2
    # value check vs pandas for the JoinGroupby mean
    base = pdf.toPandas()
    exp = base.groupby(["cat", "cat2"])["y"].transform("mean")
    got = out.sort_values("rid")["cat_cat2_y_mean"]
    np.testing.assert_allclose(got.to_numpy(), exp.to_numpy(), rtol=1e-9)


def test_shared_op_instance_rejected(spark, pipeline_df):
    """One op instance at two DAG nodes would race its fit state across
    driver threads — must fail loudly with guidance."""
    op = ops.TargetEncoding(target="y", fold_col="fold",
                            fold_is_precomputed=True)
    flow = ((["cat"] >> op) - ["cat"]) \
        + ((["cat"] >> op >> ops.Rename(postfix="_b")) - ["cat_b"]) \
        + ["rid"]
    with pytest.raises(ValueError, match="separate instance"):
        nvt.Workflow(flow).fit(pipeline_df)


def test_fused_fit_plan_shape(spark, pipeline_df):
    """The shared-key fit job must plan as ONE shuffle Exchange with
    map-side partial aggregation (partial_* HashAggregate below the
    Exchange) — the 100 TB shape."""
    import re
    jg = ops.JoinGroupby(cont_cols=["y"], stats=["mean"])
    te = ops.TargetEncoding(target="y", fold_col="fold",
                            fold_is_precomputed=True)
    flow = ((["cat"] >> jg) + ((["cat"] >> te) - ["cat"]) + ["rid", "y"])
    wf = nvt.Workflow(flow)
    wf.fit(pipeline_df)
    plans = wf.plan.fit_report.get("fused_plans", [])
    assert len(plans) == 1
    plan = plans[0]
    assert len(re.findall(r"Exchange hashpartitioning", plan)) == 1
    assert "partial_" in plan          # map-side combine present
    assert "SortMergeJoin" not in plan
