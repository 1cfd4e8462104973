"""Ports of the reference serializer edge-case tests
(tests/unit/workflow/test_workflow.py:728-838): JSON round-trips for
Normalize / Categorify / named-function LambdaOp / multi-branch
graphs, the lambda- and __main__-rejection variants, graph.json
human-readability, and version-mismatch load."""

import json
import os

import pandas as pd
import pytest

import nvtabular_spark as nvt
from nvtabular_spark import ops
from nvtabular_spark.plans.serializer import (FORMAT_VERSION,
                                              WorkflowSerializationError)


def _rt(workflow, df, tmp_path, name):
    """fit → save → load → transform must equal transform-before-save
    (reference test_workflow.py:728-741 pattern)."""
    expected = workflow.fit_transform(df).toPandas()
    p = str(tmp_path / name)
    workflow.save(p)
    wf2 = nvt.Workflow.load(p)
    got = wf2.transform(df).toPandas()
    cols = sorted(expected.columns)
    pd.testing.assert_frame_equal(
        expected[cols].sort_values(cols).reset_index(drop=True),
        got[cols].sort_values(cols).reset_index(drop=True))


def test_save_load_json_normalize(spark, tmp_path):
    # reference test_workflow_save_load_json_normalize:728
    df = spark.createDataFrame(pd.DataFrame(
        {"x": [1.0, 2.0, 3.0, 4.0, 5.0],
         "y": [10.0, 20.0, 30.0, 40.0, 50.0]}))
    _rt(nvt.Workflow(["x", "y"] >> ops.Normalize()), df, tmp_path, "wfn")


def test_save_load_json_categorify(spark, tmp_path):
    # reference test_workflow_save_load_json_categorify:745
    df = spark.createDataFrame(pd.DataFrame(
        {"cat": ["a", "b", "a", "c", "b"]}))
    _rt(nvt.Workflow(["cat"] >> ops.Categorify()), df, tmp_path, "wfc")


def test_save_load_json_named_function(spark, tmp_path):
    # reference test_workflow_save_load_json_named_function:762
    from nvtabular_spark.functions import udfs
    df = spark.createDataFrame(pd.DataFrame(
        {"geo": ["US>CA>510", "US>MI>505", "CA>NB"]}))
    wf = nvt.Workflow(["geo"] >> ops.LambdaOp(udfs.slice_5, dtype="string")
                      >> ops.Rename(postfix="_state"))
    _rt(wf, df, tmp_path, "wfl")


def test_save_load_json_lambda_raises(spark, tmp_path):
    # reference test_workflow_save_load_json_lambda_raises:780
    df = spark.createDataFrame(pd.DataFrame({"x": [1.0, 2.0, 3.0]}))
    wf = nvt.Workflow(["x"] >> ops.LambdaOp(lambda x: x * 2))
    wf.fit(df)
    with pytest.raises(WorkflowSerializationError, match="[Ll]ambda"):
        wf.save(str(tmp_path / "wf"))


def test_save_load_json_closure_raises(spark, tmp_path):
    # <locals> functions are as unserializable as lambdas
    def doubler(s):
        return s * 2
    df = spark.createDataFrame(pd.DataFrame({"x": [1.0, 2.0, 3.0]}))
    wf = nvt.Workflow(["x"] >> ops.LambdaOp(doubler))
    wf.fit(df)
    with pytest.raises(WorkflowSerializationError):
        wf.save(str(tmp_path / "wf"))


def test_save_load_json_main_module_raises(spark, tmp_path):
    # reference graph_serializer.py:71-88 — __main__ functions cannot
    # be re-imported on load; simulate a function defined in __main__
    from nvtabular_spark.functions import udfs

    def fake_main_fn(s):
        return s + 1
    fake_main_fn.__module__ = "__main__"
    fake_main_fn.__qualname__ = "fake_main_fn"
    df = spark.createDataFrame(pd.DataFrame({"x": [1.0, 2.0, 3.0]}))
    wf = nvt.Workflow(["x"] >> ops.LambdaOp(fake_main_fn))
    wf.fit(df)
    with pytest.raises(WorkflowSerializationError, match="__main__"):
        wf.save(str(tmp_path / "wf"))
    del udfs  # silence unused-import linters


def test_save_load_json_multi_branch(spark, tmp_path):
    # reference test_workflow_save_load_json_multi_branch:792
    df = spark.createDataFrame(pd.DataFrame(
        {"x": [1.0, 2.0, 3.0], "cat": ["a", "b", "a"]}))
    wf = nvt.Workflow((["x"] >> ops.Normalize())
                      + (["cat"] >> ops.Categorify()))
    _rt(wf, df, tmp_path, "wfm")


def test_graph_json_is_human_readable(spark, tmp_path):
    # reference test_graph_json_is_human_readable:810 — keys adapted to
    # this serializer's documented format (graph.json node records)
    df = spark.createDataFrame(pd.DataFrame({"x": [1.0, 2.0, 3.0]}))
    wf = nvt.Workflow(["x"] >> ops.Normalize())
    wf.fit(df)
    p = str(tmp_path / "wf")
    wf.save(p)

    graph_path = os.path.join(p, "graph.json")
    assert os.path.exists(graph_path)
    with open(graph_path) as f:
        data = json.load(f)
    assert data["format_version"] == FORMAT_VERSION
    assert isinstance(data["nodes"], list) and data["nodes"]
    op_nodes = [n for n in data["nodes"] if "op_class" in n]
    assert op_nodes
    for node in data["nodes"]:
        assert "id" in node
        assert "parent_ids" in node
        assert "dependency_ids" in node
    for node in op_nodes:
        assert "op_params" in node
        assert "op_state" in node


def test_version_mismatch_load_raises(spark, tmp_path):
    df = spark.createDataFrame(pd.DataFrame({"x": [1.0, 2.0, 3.0]}))
    wf = nvt.Workflow(["x"] >> ops.Normalize())
    wf.fit(df)
    p = str(tmp_path / "wf")
    wf.save(p)
    gp = os.path.join(p, "graph.json")
    with open(gp) as f:
        data = json.load(f)
    data["format_version"] = FORMAT_VERSION + 999
    with open(gp, "w") as f:
        json.dump(data, f)
    with pytest.raises(WorkflowSerializationError, match="format"):
        nvt.Workflow.load(p)


def test_double_save_overwrites_artifact_paths(spark, tmp_path):
    """Artifact KEYS may contain ':' (TargetEncoding's 'all::key'),
    which Hadoop paths cannot — a second save to the SAME path used to
    die in URI parsing on the overwrite. Keys stay verbatim; only the
    on-disk segment is sanitized."""
    df = spark.createDataFrame(pd.DataFrame(
        {"cat": ["a", "b", "a"], "lbl": [1.0, 0.0, 1.0], "k": [0, 1, 2]}))
    wf = nvt.Workflow((["cat"] >> ops.TargetEncoding(
        target="lbl", fold_col="k", kfold=2)) + ["k"])
    wf.fit(df)
    p = str(tmp_path / "wf")
    wf.save(p)
    wf.save(p)          # overwrite must succeed
    got = nvt.Workflow.load(p).transform(df).toPandas()
    want = wf.transform(df).toPandas()
    cols = sorted(got.columns)
    pd.testing.assert_frame_equal(
        got[cols].sort_values("k").reset_index(drop=True),
        want[cols].sort_values("k").reset_index(drop=True))
    import os as _os
    art_root = _os.path.join(p, "artifacts")
    for root, _d, _f in _os.walk(art_root):
        assert ":" not in _os.path.basename(root)


def test_load_warns_on_pyspark_version_skew(spark, tmp_path):
    """Reference port (tests/unit/workflow/test_workflow.py version-
    mismatch case): a workflow saved under a different engine version
    loads with a WARNING, not an error; only an unknown format raises."""
    import warnings
    df = spark.createDataFrame(pd.DataFrame(
        {"cat": ["a", "b", "a"], "k": [0, 1, 2]}))
    wf = nvt.Workflow((["cat"] >> ops.Categorify()) + ["k"])
    wf.fit(df)
    p = str(tmp_path / "wf")
    wf.save(p)
    meta_path = os.path.join(p, "metadata.json")
    with open(meta_path) as fh:
        meta = json.load(fh)
    meta["pyspark_version"] = "0.0.1-test"
    with open(meta_path, "w") as fh:
        json.dump(meta, fh)
    with warnings.catch_warnings(record=True) as rec:
        warnings.simplefilter("always")
        wf2 = nvt.Workflow.load(p, spark)
    assert any("0.0.1-test" in str(w.message) for w in rec)
    got = wf2.transform(df).toPandas().sort_values("k")
    want = wf.transform(df).toPandas().sort_values("k")
    pd.testing.assert_frame_equal(got.reset_index(drop=True),
                                  want.reset_index(drop=True))


def test_load_after_artifacts_dir_relocation(spark, tmp_path):
    """Reference port (artifacts-dir relocation): artifact paths are
    stored RELATIVE to the save dir, so moving the whole directory
    keeps the loaded workflow transformable."""
    import shutil
    df = spark.createDataFrame(pd.DataFrame(
        {"cat": ["a", "b", "a", "c"], "k": [0, 1, 2, 3]}))
    wf = nvt.Workflow((["cat"] >> ops.Categorify()) + ["k"])
    wf.fit(df)
    p1 = str(tmp_path / "orig" / "wf")
    wf.save(p1)
    want = wf.transform(df).toPandas().sort_values("k")
    p2 = str(tmp_path / "moved" / "wf")
    os.makedirs(os.path.dirname(p2), exist_ok=True)
    shutil.move(p1, p2)
    wf2 = nvt.Workflow.load(p2, spark)
    got = wf2.transform(df).toPandas().sort_values("k")
    pd.testing.assert_frame_equal(got.reset_index(drop=True),
                                  want.reset_index(drop=True))
