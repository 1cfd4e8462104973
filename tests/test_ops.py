"""Stateless + stat ops vs pandas/numpy oracles
(reference tests/unit/test_dask_nvt.py:144-181 pattern)."""
import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

import nvtabular_spark as nvt
from nvtabular_spark import ops


@pytest.fixture(scope="module")
def num_pdf():
    rng = np.random.RandomState(3)
    pdf = pd.DataFrame({
        "x": rng.randn(200) * 10,
        "y": rng.rand(200) * 100,
        "cat": rng.choice(["a", "b", "c"], 200),
        "rid": np.arange(200, dtype="int64"),
    })
    pdf.loc[rng.choice(200, 10, replace=False), "x"] = None
    return pdf


def test_fillmissing_indicator(spark, num_pdf):
    df = spark.createDataFrame(num_pdf)
    wf = nvt.Workflow(
        (["x"] >> ops.FillMissing(fill_val=-5, add_binary_cols=True)) + ["rid"])
    out = wf.fit_transform(df).orderBy("rid").toPandas()
    exp = num_pdf["x"].fillna(-5)
    np.testing.assert_allclose(out["x"], exp, rtol=1e-12)
    assert out["x_filled"].tolist() == num_pdf["x"].isna().tolist()


def test_fillmedian(spark, num_pdf):
    df = spark.createDataFrame(num_pdf)
    wf = nvt.Workflow((["x"] >> ops.FillMedian()) + ["rid"])
    out = wf.fit_transform(df).orderBy("rid").toPandas()
    med = num_pdf["x"].median()
    np.testing.assert_allclose(out["x"], num_pdf["x"].fillna(med), rtol=1e-12)


def test_normalize_ddof1(spark, num_pdf):
    df = spark.createDataFrame(num_pdf)
    wf = nvt.Workflow((["y"] >> ops.Normalize()) + ["rid"])
    out = wf.fit_transform(df).orderBy("rid").toPandas()
    exp = (num_pdf["y"] - num_pdf["y"].mean()) / num_pdf["y"].std(ddof=1)
    np.testing.assert_allclose(out["y"], exp, rtol=1e-9)


def test_normalize_minmax(spark, num_pdf):
    df = spark.createDataFrame(num_pdf)
    wf = nvt.Workflow((["y"] >> ops.NormalizeMinMax()) + ["rid"])
    out = wf.fit_transform(df).orderBy("rid").toPandas()
    y = num_pdf["y"]
    np.testing.assert_allclose(out["y"], (y - y.min()) / (y.max() - y.min()),
                               rtol=1e-12)


def test_logop_clip_list_and_scalar(spark):
    pdf = pd.DataFrame({"v": [0.0, 1.0, 100.0], "l": [[0.0, 1.0], [2.0], []],
                        "rid": [1, 2, 3]})
    df = spark.createDataFrame(pdf)
    wf = nvt.Workflow(
        (["v"] >> ops.Clip(min_value=0.5) >> ops.LogOp(out_dtype="double"))
        + (["l"] >> ops.LogOp(out_dtype="double") >> ops.Rename(postfix="_log"))
        + ["rid"])
    out = wf.fit_transform(df).orderBy("rid").toPandas()
    np.testing.assert_allclose(out["v"], np.log1p([0.5, 1.0, 100.0]))
    assert [list(np.round(x, 9)) for x in out["l_log"]] == \
        [list(np.round(np.log1p(x), 9)) for x in pdf["l"]]


def test_bucketize(spark):
    df = spark.createDataFrame(pd.DataFrame({"v": [-5.0, 0.0, 5.0, 15.0, 50.0],
                                             "rid": range(5)}))
    wf = nvt.Workflow((["v"] >> ops.Bucketize([0.0, 10.0, 20.0])) + ["rid"])
    out = wf.fit_transform(df).orderBy("rid").toPandas()
    assert out["v"].tolist() == list(np.digitize([-5, 0, 5, 15, 50],
                                                 [0, 10, 20]))


def test_hashbucket_range_and_determinism(spark, num_pdf):
    df = spark.createDataFrame(num_pdf)
    wf = nvt.Workflow((["cat"] >> ops.HashBucket(num_buckets=7)) + ["rid"])
    out1 = wf.fit_transform(df).orderBy("rid").toPandas()
    out2 = wf.transform(df.repartition(5)).orderBy("rid").toPandas()
    assert out1["cat"].between(0, 6).all()
    assert out1["cat"].tolist() == out2["cat"].tolist()
    # same input value → same bucket
    m = pd.DataFrame({"cat": num_pdf["cat"], "b": out1["cat"]})
    assert (m.groupby("cat")["b"].nunique() == 1).all()


def test_hashed_cross(spark, num_pdf):
    df = spark.createDataFrame(num_pdf)
    wf = nvt.Workflow(
        (["cat", "rid"] >> ops.HashedCross(num_buckets=13)) + ["rid"])
    out = wf.fit_transform(df).toPandas()
    assert "cat_X_rid" in out.columns
    assert out["cat_X_rid"].between(0, 12).all()


def test_listslice_negative_and_pad(spark):
    pdf = pd.DataFrame({"l": [[1, 2, 3, 4, 5], [1], []], "rid": [1, 2, 3]})
    df = spark.createDataFrame(pdf)
    wf = nvt.Workflow(
        (["l"] >> ops.ListSlice(-3) >> ops.Rename(name="last3"))
        + (["l"] >> ops.ListSlice(0, 4, pad=True, pad_value=-1)
           >> ops.Rename(name="pad4")) + ["rid"])
    out = wf.fit_transform(df).orderBy("rid").toPandas()
    assert [list(x) for x in out["last3"]] == [[3, 4, 5], [1], []]
    assert [list(x) for x in out["pad4"]] == \
        [[1, 2, 3, 4], [1, -1, -1, -1], [-1, -1, -1, -1]]


def test_lambdaop_pandas_udf(spark, num_pdf):
    df = spark.createDataFrame(num_pdf)

    def double_it(s):   # nested → cloudpickled by value, works on executors
        return s * 2

    wf = nvt.Workflow(
        (["y"] >> ops.LambdaOp(double_it, dtype="double")) + ["rid"])
    out = wf.fit_transform(df).orderBy("rid").toPandas()
    np.testing.assert_allclose(out["y"], num_pdf["y"] * 2, rtol=1e-12)


def test_lambdaop_expr_mode(spark, num_pdf):
    df = spark.createDataFrame(num_pdf)
    wf = nvt.Workflow(
        (["y"] >> ops.LambdaOp(lambda c: c + 1, is_expr=True)) + ["rid"])
    out = wf.fit_transform(df).orderBy("rid").toPandas()
    np.testing.assert_allclose(out["y"], num_pdf["y"] + 1, rtol=1e-12)


def test_dropna_filter(spark, num_pdf):
    df = spark.createDataFrame(num_pdf)
    wf = nvt.Workflow((["x"] >> ops.Dropna() >> ops.Filter("x > 0")) + ["rid"])
    out = wf.fit_transform(df).toPandas()
    exp = num_pdf[num_pdf["x"].notna() & (num_pdf["x"] > 0)]
    assert len(out) == len(exp)
    assert set(out["rid"]) == set(exp["rid"])


def test_reduce_dtype_size(spark):
    df = spark.createDataFrame(pd.DataFrame({
        "small": pd.array([1, 2, 100], dtype="int64"),
        "big": pd.array([1, 2, 10 ** 10], dtype="int64"),
        "f": [1.0, 2.0, 3.0]}))
    wf = nvt.Workflow(["small", "big", "f"] >> ops.ReduceDtypeSize())
    out = wf.fit_transform(df)
    types = dict((f.name, f.dataType.simpleString()) for f in out.schema)
    assert types["small"] == "tinyint"
    assert types["big"] == "bigint"
    assert types["f"] == "float"


def test_drop_low_cardinality(spark, num_pdf):
    pdf = num_pdf.assign(const="same")
    df = spark.createDataFrame(pdf)
    wf = nvt.Workflow(["cat", "const"] >> ops.DropLowCardinality(2))
    out = wf.fit_transform(df)
    assert out.columns == ["cat"]


def test_value_count_and_datastats(spark):
    df = spark.createDataFrame(pd.DataFrame({
        "l": [[1, 2], [1], [1, 2, 3]], "x": [1.0, 2.0, None]}))
    vc = ops.ValueCount()
    ds = ops.DataStats()
    wf = nvt.Workflow((["l"] >> vc) + (["x"] >> ds))
    wf.fit(df)
    assert vc.counts["l"] == {"min": 1, "max": 3}
    assert ds.stats["x"]["min"] == 1.0 and ds.stats["x"]["max"] == 2.0
    assert abs(ds.stats["x"]["null_frac"] - 1 / 3) < 1e-9


def test_groupby_list_aggs_sorted(spark, timeseries_df):
    g = ops.Groupby(groupby_cols=["id"], sort_cols=["ts"],
                    aggs={"x": ["list", "first", "last", "sum", "count"]})
    out = nvt.Workflow(["x"] >> g).transform(timeseries_df).toPandas()
    pdf = timeseries_df.toPandas().sort_values("ts")
    for _, row in out.iterrows():
        grp = pdf[pdf["id"] == row["id"]]["x"]
        lst = [v for v in row["x_list"] if v == v or v is None]
        # first/last equal list ends (reference test_groupyby.py:82-105)
        if len(lst):
            assert row["x_first"] == row["x_list"][0] or \
                (pd.isna(row["x_first"]) and pd.isna(row["x_list"][0]))
            assert row["x_last"] == row["x_list"][-1] or \
                (pd.isna(row["x_last"]) and pd.isna(row["x_list"][-1]))
        np.testing.assert_allclose(row["x_sum"], grp.dropna().sum(),
                                   rtol=1e-9)


def test_join_groupby_matches_pandas(spark, num_pdf):
    df = spark.createDataFrame(num_pdf)
    jg = ops.JoinGroupby(cont_cols=["y"], stats=["count", "sum", "mean", "std"])
    out = nvt.Workflow((["cat"] >> jg) + ["rid"]).fit_transform(df) \
        .orderBy("rid").toPandas()
    g = num_pdf.groupby("cat")["y"]
    for stat, pd_fn in [("sum", g.sum()), ("mean", g.mean()),
                        ("std", g.std(ddof=1))]:
        exp = num_pdf["cat"].map(pd_fn)
        np.testing.assert_allclose(out[f"cat_y_{stat}"], exp, rtol=1e-9)
    np.testing.assert_allclose(out["cat_count"],
                               num_pdf["cat"].map(g.count()), rtol=0)


def test_join_external(spark, num_pdf):
    df = spark.createDataFrame(num_pdf)
    ext = spark.createDataFrame(pd.DataFrame({
        "key": ["a", "b", "c"], "payload": [10, 20, 30]}))
    j = ops.JoinExternal(ext, on="cat", on_ext="key", how="left")
    out = nvt.Workflow((["rid"] >> j)).transform(df).orderBy("rid").toPandas()
    exp = num_pdf["cat"].map({"a": 10, "b": 20, "c": 30})
    assert out["payload"].tolist() == exp.tolist()


def test_difference_lag(spark, timeseries_df):
    dl = ops.DifferenceLag(partition_cols="id", shift=[1, -1], order_by="ts")
    out = nvt.Workflow((["x"] >> dl) + ["id", "ts"]) \
        .transform(timeseries_df).toPandas()
    pdf = timeseries_df.toPandas().sort_values(["id", "ts"])
    exp1 = pdf.groupby("id")["x"].diff(1)
    got = out.sort_values(["id", "ts"])["x_difference_lag_1"]
    np.testing.assert_allclose(got.to_numpy(), exp1.to_numpy(), rtol=1e-9,
                               equal_nan=True)


def test_column_similarity(spark):
    feats = np.array([[1.0, 0.0], [0.0, 1.0], [1.0, 1.0]])
    pdf = pd.DataFrame({"left_id": [0, 1, 2], "right_id": [2, 2, 2],
                        "rid": [0, 1, 2]})
    df = spark.createDataFrame(pdf)
    for metric, exp in [
        ("inner", [1.0, 1.0, 2.0]),
        ("cosine", [np.sqrt(0.5), np.sqrt(0.5), 1.0]),
    ]:
        op = ops.ColumnSimilarity(feats, metric=metric, right_col="right_id")
        out = nvt.Workflow((["left_id"] >> op) + ["rid"]) \
            .transform(df).orderBy("rid").toPandas()
        np.testing.assert_allclose(out["left_id_right_id_sim"], exp,
                                   rtol=1e-9)


def test_lambdaop_roundtrip(spark, num_pdf, tmp_path):
    """Named importable functions survive save/load (reference
    lambdaop.py:25-51 serialization contract)."""
    from nvtabular_spark.functions.udfs import log1p
    df = spark.createDataFrame(num_pdf)
    wf = nvt.Workflow(
        (["y"] >> ops.LambdaOp(log1p, dtype="double")) + ["rid"])
    before = wf.fit_transform(df).orderBy("rid").toPandas()
    p = str(tmp_path / "wf_lambda")
    wf.save(p)
    wf2 = nvt.Workflow.load(p, spark)
    after = wf2.transform(df).orderBy("rid").toPandas()
    pd.testing.assert_frame_equal(before, after)


def test_add_metadata_tags(spark, num_pdf):
    df = spark.createDataFrame(num_pdf)
    wf = nvt.Workflow(["cat"] >> ops.TagAsUserID())
    wf.fit(df)
    assert "user_id" in wf.output_schema["cat"].tags


def test_normalize_minmax_degenerate_nulls(spark):
    """Regression: max==min branch sent NULL inputs to 0.5 because
    `null == 0` is null. NULLs must propagate in both branches
    (reference normalize.py:196-204 x/(2x) is null-preserving)."""
    df = spark.createDataFrame(
        pd.DataFrame({"x": [5.0, 5.0, None], "z": [0.0, 0.0, None],
                      "rid": [0, 1, 2]}))
    wf = nvt.Workflow((["x", "z"] >> ops.NormalizeMinMax()) + ["rid"])
    out = wf.fit_transform(df).orderBy("rid").toPandas()
    assert out["x"].tolist()[:2] == [0.5, 0.5]
    assert pd.isna(out["x"].iloc[2])
    assert out["z"].tolist()[:2] == [0.0, 0.0]
    assert pd.isna(out["z"].iloc[2])


def test_filter_sql_does_not_clobber_raw_columns(spark, num_pdf):
    """Regression: the SQL-string Filter path remapped public → actual
    names on the threaded frame, silently replacing a raw input column
    (read downstream via dependencies()) with the transformed value."""
    df = spark.createDataFrame(num_pdf.fillna(0.0))
    # y is transformed (normalized) in one branch and ALSO consumed raw
    # by TargetEncoding in a sibling branch after a Filter
    flow = ((["y"] >> ops.Normalize() >> ops.Filter("y > -10")
             >> ops.Rename(postfix="_n"))
            + (["cat"] >> ops.TargetEncoding(target="y", fold_col="rid",
                                             kfold=2))
            + ["rid", "y"])
    out = nvt.Workflow(flow).fit_transform(df).orderBy("rid").toPandas()
    orig = num_pdf.fillna(0.0).set_index("rid").loc[out["rid"]]
    # raw y must survive untouched (not the normalized copy)
    np.testing.assert_allclose(out["y"].to_numpy(),
                               orig["y"].to_numpy(), rtol=1e-12)


def test_filter_mask_callable(spark, num_pdf):
    """Reference filter.py:28-62 — callable over a real frame returning
    a boolean mask Series (Arrow-batched mapInPandas fallback)."""
    df = spark.createDataFrame(num_pdf.fillna(0.0))
    wf = nvt.Workflow(
        (["x", "rid"] >> ops.Filter(lambda d: (d["x"] > 0) & (d["x"].notna())))
        + ["y"])
    out = wf.fit_transform(df).toPandas()
    exp = num_pdf.fillna(0.0)
    exp = exp[exp["x"] > 0]
    assert set(out["rid"]) == set(exp["rid"])


def test_filter_df_callable(spark, num_pdf):
    """Callable returning a filtered pandas DataFrame (index subset)."""
    df = spark.createDataFrame(num_pdf.fillna(0.0))
    wf = nvt.Workflow(
        (["x", "rid"] >> ops.Filter(lambda d: d[d["x"] > 0])) + ["y"])
    out = wf.fit_transform(df).toPandas()
    exp = num_pdf.fillna(0.0)
    exp = exp[exp["x"] > 0]
    assert set(out["rid"]) == set(exp["rid"])


def test_coerce_dtypes_reference_table(spark, num_pdf):
    """Reference AGG_DTYPES parity (groupby.py:190-198 /
    join_groupby.py:29-34): count/nunique -> int32,
    mean/std/var/median/sum -> float32 when coerce_dtypes=True."""
    df = spark.createDataFrame(num_pdf.fillna(0.0))
    g = ops.Groupby(groupby_cols=["cat"],
                    aggs={"x": ["count", "nunique", "mean", "std", "var",
                                "median", "sum", "min"]},
                    coerce_dtypes=True)
    out = nvt.Workflow(["x"] >> g).transform(df)
    t = dict(out.dtypes)
    assert t["x_count"] == "int" and t["x_nunique"] == "int"
    for a in ("mean", "std", "var", "median", "sum"):
        assert t[f"x_{a}"] == "float", (a, t[f"x_{a}"])
    assert t["x_min"] == "double"   # not in the table: input dtype kept

    jg = ops.JoinGroupby(cont_cols=["x"], stats=["count", "mean", "std"],
                         coerce_dtypes=True)
    out2 = nvt.Workflow((["cat"] >> jg) + ["rid"]).fit_transform(df)
    t2 = dict(out2.dtypes)
    assert t2["cat_count"] == "int"
    assert t2["cat_x_mean"] == "float" and t2["cat_x_std"] == "float"


def test_column_similarity_sparse_matches_dense(spark):
    """Reference parity (column_similarity.py:31-130): scipy CSR feature
    matrices, grouped-pair selector, tfidf/cosine — sparse result must
    equal the dense computation."""
    scipy = pytest.importorskip("scipy")
    import scipy.sparse as sp
    rng = np.random.RandomState(11)
    dense = rng.rand(20, 30)
    dense[dense < 0.8] = 0.0          # ~80% sparse
    csr = sp.csr_matrix(dense)
    pdf = pd.DataFrame({"a": rng.randint(0, 20, 50),
                        "b": rng.randint(0, 20, 50),
                        "rid": np.arange(50)})
    df = spark.createDataFrame(pdf)
    for metric in ("inner", "cosine", "tfidf"):
        sparse_op = ops.ColumnSimilarity(csr, metric=metric)
        dense_op = ops.ColumnSimilarity(dense, metric=metric)
        flow_s = ([["a", "b"]] >> sparse_op) + ["rid"]
        flow_d = ([["a", "b"]] >> dense_op) + ["rid"]
        out_s = nvt.Workflow(flow_s).transform(df).orderBy("rid").toPandas()
        out_d = nvt.Workflow(flow_d).transform(df).orderBy("rid").toPandas()
        np.testing.assert_allclose(out_s["a_b_sim"], out_d["a_b_sim"],
                                   rtol=1e-9, err_msg=metric)


def test_column_similarity_right_features(spark):
    """Distinct right-side feature matrix (reference :64-67)."""
    left = np.array([[1.0, 0.0], [0.0, 2.0]])
    right = np.array([[0.0, 3.0], [4.0, 0.0]])
    df = spark.createDataFrame(pd.DataFrame(
        {"a": [0, 1], "b": [0, 1], "rid": [0, 1]}))
    op = ops.ColumnSimilarity(left, right_features=right, metric="inner")
    out = nvt.Workflow(([["a", "b"]] >> op) + ["rid"]) \
        .transform(df).orderBy("rid").toPandas()
    np.testing.assert_allclose(out["a_b_sim"], [0.0, 0.0])
    df2 = spark.createDataFrame(pd.DataFrame(
        {"a": [0, 1], "b": [1, 0], "rid": [0, 1]}))
    out2 = nvt.Workflow(([["a", "b"]] >> op) + ["rid"]) \
        .transform(df2).orderBy("rid").toPandas()
    np.testing.assert_allclose(out2["a_b_sim"], [4.0, 6.0])


def test_column_similarity_save_load_round_trip(spark, tmp_path):
    """The (prepped) feature matrix round-trips through graph.json —
    a loaded workflow transforms without re-providing features."""
    feats = np.array([[1.0, 0.0], [0.0, 1.0], [1.0, 1.0]])
    pdf = pd.DataFrame({"a": [0, 1, 2], "b": [2, 2, 2], "rid": [0, 1, 2]})
    df = spark.createDataFrame(pdf)
    op = ops.ColumnSimilarity(feats, metric="cosine")
    wf = nvt.Workflow(([["a", "b"]] >> op) + ["rid"])
    before = wf.fit_transform(df).orderBy("rid").toPandas()
    p = str(tmp_path / "cswf")
    wf.save(p)
    wf2 = nvt.Workflow.load(p, spark)
    after = wf2.transform(df).orderBy("rid").toPandas()
    np.testing.assert_allclose(before["a_b_sim"], after["a_b_sim"],
                               rtol=1e-12)


def test_normalize_lists(spark):
    # ported: reference tests/unit/ops/test_normalize.py:88
    # (test_normalize_lists) — list columns are z-scored with moments
    # over the FLATTENED values
    df = spark.createDataFrame(pd.DataFrame(
        {"rid": [0, 1, 2], "vals": [[0.0, 1.0, 2.0], [3.0, 4.0], [5.0]]}))
    out = nvt.Workflow((["vals"] >> ops.Normalize()) + ["rid"]) \
        .fit_transform(df).orderBy("rid").toPandas()
    flat = np.arange(6, dtype="float64")
    exp = (flat - flat.mean()) / flat.std(ddof=1)
    np.testing.assert_allclose(np.concatenate(out["vals"].to_numpy()), exp,
                               rtol=1e-12)


def test_normalize_std_zero(spark):
    # ported: reference test_normalize.py:111 — constant column
    # normalizes to all zeros (centered pass-through when std == 0)
    df = spark.createDataFrame(pd.DataFrame({"a": [10.0] * 7}))
    out = nvt.Workflow(["a"] >> ops.Normalize()).fit_transform(df).toPandas()
    assert (out["a"] == 0).all()


def test_normalize_list_null_and_nan_elements(spark):
    # null rows stay null; NaN elements are excluded from the fitted
    # moments but propagate through the element-wise transform
    df = spark.createDataFrame(pd.DataFrame({
        "rid": [0, 1, 2],
        "v": [[1.0, float("nan")], None, [2.0, 3.0]]}))
    out = nvt.Workflow((["v"] >> ops.Normalize()) + ["rid"]) \
        .fit_transform(df).orderBy("rid").toPandas()
    vals = np.array([1.0, 2.0, 3.0])
    exp = (vals - vals.mean()) / vals.std(ddof=1)
    got = out["v"].tolist()
    assert got[1] is None
    np.testing.assert_allclose([got[0][0], got[2][0], got[2][1]],
                               exp, rtol=1e-12)
    assert np.isnan(got[0][1])


def test_joingroupby_node_dependency(spark):
    # ported: reference tests/unit/ops/test_join.py:33
    # (test_joingroupby_dependency) — cont_cols given as a workflow NODE
    # whose outputs feed the groupby stats
    df = spark.createDataFrame(pd.DataFrame({
        "Author": ["User_A", "User_A", "User_A", "User_B", "User_B"],
        "Cost": [100.0, 200.0, 300.0, 400.0, 400.0]}))
    normalized_cost = ["Cost"] >> ops.NormalizeMinMax() \
        >> ops.Rename(postfix="_normalized")
    gf = ["Author"] >> ops.JoinGroupby(stats=["sum"],
                                       cont_cols=normalized_cost)
    out = nvt.Workflow(gf).fit_transform(df).orderBy("Author").toPandas()
    assert out["Author_Cost_normalized_sum"].tolist() == \
        [1.0, 1.0, 1.0, 2.0, 2.0]


def test_joingroupby_node_dependency_save_load(spark, tmp_path):
    df = spark.createDataFrame(pd.DataFrame({
        "Author": ["User_A", "User_A", "User_B"],
        "Cost": [1.0, 3.0, 2.0]}))
    normalized = ["Cost"] >> ops.NormalizeMinMax() \
        >> ops.Rename(postfix="_n")
    wf = nvt.Workflow(["Author"] >> ops.JoinGroupby(
        stats=["sum"], cont_cols=normalized))
    expect = wf.fit_transform(df).orderBy("Author").toPandas()
    wf.save(str(tmp_path / "wf"))
    wf2 = nvt.Workflow.load(str(tmp_path / "wf"), spark)
    got = wf2.transform(df).orderBy("Author").toPandas()
    pd.testing.assert_frame_equal(got, expect)


@pytest.mark.parametrize("kind_ext", ["spark", "pandas", "arrow",
                                      "parquet", "csv", "dataset"])
@pytest.mark.parametrize("how", ["left", "inner"])
def test_join_external_kinds(spark, tmp_path, kind_ext, how):
    # ported: reference tests/unit/ops/test_join.py:115
    # (test_join_external engine × kind_ext × how matrix)
    left = pd.DataFrame({"id": [1, 2, 3, 4, 2], "x": [10., 20., 30., 40., 21.]})
    ext = pd.DataFrame({"id": [1, 2, 3, 3],
                        "new_col": [101, 102, 103, 103],
                        "new_col_2": ["keep"] * 4,
                        "new_col_3": ["ignore"] * 4})
    if kind_ext == "spark":
        df_ext = spark.createDataFrame(ext)
    elif kind_ext == "pandas":
        df_ext = ext
    elif kind_ext == "arrow":
        import pyarrow as pa
        df_ext = pa.Table.from_pandas(ext)
    elif kind_ext == "parquet":
        p = str(tmp_path / "external.parquet")
        spark.createDataFrame(ext).write.parquet(p)
        df_ext = p
    elif kind_ext == "csv":
        p = str(tmp_path / "external.csv")
        ext.to_csv(p, index=False)
        df_ext = p
    else:
        from nvtabular_spark.sources.dataset import Dataset
        df_ext = Dataset(spark.createDataFrame(ext))

    joined = ["id", "x"] >> ops.JoinExternal(
        df_ext, "id", how=how, columns_ext=["id", "new_col", "new_col_2"],
        drop_duplicates_ext=True)
    out = nvt.Workflow(joined).fit_transform(
        spark.createDataFrame(left)).toPandas()

    check = left.merge(
        ext[["id", "new_col", "new_col_2"]].drop_duplicates(),
        how=how, on="id").sort_values(["id", "x"]).reset_index(drop=True)
    got = out.sort_values(["id", "x"]).reset_index(drop=True)[check.columns]
    assert "new_col_3" not in out.columns
    assert len(got) == len(check)
    pd.testing.assert_frame_equal(
        got.astype({"new_col": "float64"}),
        check.astype({"new_col": "float64"}))


def test_join_external_full_row_dedup(spark):
    # drop_duplicates_ext is FULL-ROW dedup (reference
    # join_external.py:135-139): duplicate keys with DIFFERENT payloads
    # both survive and fan out the join
    left = spark.createDataFrame(pd.DataFrame({"id": [1]}))
    ext = spark.createDataFrame(pd.DataFrame(
        {"id": [1, 1, 1], "v": [7, 7, 8]}))
    out = nvt.Workflow(["id"] >> ops.JoinExternal(
        ext, "id", drop_duplicates_ext=True)).fit_transform(left).toPandas()
    assert sorted(out["v"].tolist()) == [7, 8]


def test_join_external_kind_ext_overrides_suffix(spark, tmp_path):
    # an explicit kind_ext="csv" must win over a non-.csv suffix
    ext = pd.DataFrame({"id": [1, 2], "v": [10, 20]})
    p = str(tmp_path / "lookup.txt")
    ext.to_csv(p, index=False)
    left = spark.createDataFrame(pd.DataFrame({"id": [1, 2]}))
    out = nvt.Workflow(["id"] >> ops.JoinExternal(
        p, "id", kind_ext="csv")).fit_transform(left) \
        .orderBy("id").toPandas()
    assert out["v"].tolist() == [10, 20]
    with pytest.raises(ValueError, match="kind_ext"):
        ops.JoinExternal(p, "id", kind_ext="avro")


def test_value_count_schema_properties(spark):
    # ported: reference tests/unit/ops/test_value_count.py:63 — the
    # transformed Dataset's schema carries value_count {min,max} on the
    # list column
    from nvtabular_spark.sources.dataset import Dataset
    df = spark.createDataFrame(pd.DataFrame({"feature": [[1, 2], [3]]}))
    wf = nvt.Workflow(["feature"] >> ops.ValueCount())
    wf.fit(Dataset(df))
    transformed = wf.transform(Dataset(df))
    cs = transformed.schema["feature"]
    assert cs.properties["value_count"] == {"min": 1, "max": 2}
    assert "list" in cs.tags


def test_list_slice_ndarray_elements(spark):
    # ported: reference tests/unit/ops/test_list_slice.py:107 — numpy
    # int32 list elements flow through ListSlice(pad=True)
    import numpy as np
    # ndarray-backed list column via the ARROW conversion path (the
    # supported numpy route — Spark's row-based inference rejects raw
    # np.int32 elements)
    key = "spark.sql.execution.arrow.pyspark.enabled"
    old = spark.conf.get(key, "false")
    spark.conf.set(key, "true")
    try:
        df = spark.createDataFrame(
            pd.DataFrame({"test": [np.arange(1, 4, dtype=np.int32)]}))
        df = df.localCheckpoint()  # materialize before restoring conf
    finally:
        spark.conf.set(key, old)
    out = nvt.Workflow(["test"] >> ops.ListSlice(10, pad=True)) \
        .fit_transform(df).toPandas()
    assert list(out["test"][0])[:3] == [1, 2, 3]
    assert len(out["test"][0]) == 10


def test_quantile_bin_equal_frequency(spark):
    """QuantileBin: fitted quartile boundaries give ~equal-count
    buckets; NULL -> NULL; save/load keeps boundaries."""
    import pandas as pd
    import nvtabular_spark as nvt
    from nvtabular_spark import ops as _ops
    pdf = pd.DataFrame({"x": [float(i) for i in range(100)] + [None],
                        "k": list(range(101))})
    df = spark.createDataFrame(pdf)
    wf = nvt.Workflow((["x"] >> _ops.QuantileBin(n_bins=4)) + ["k"])
    out = wf.fit_transform(df).toPandas()
    counts = out["x"].value_counts()
    assert set(counts.index) == {0, 1, 2, 3}
    assert counts.min() >= 24 and counts.max() <= 26
    assert out.loc[out["k"] == 100, "x"].isna().all()
    # bucket is monotone in the input
    got = out.sort_values("k")["x"].iloc[:100].tolist()
    assert got == sorted(got)


def test_quantile_bin_save_load_round_trip(spark, tmp_path):
    import pandas as pd
    import nvtabular_spark as nvt
    from nvtabular_spark import ops as _ops
    pdf = pd.DataFrame({"x": [1.0, 5.0, 9.0, 13.0, 2.0, 6.0, 10.0, 14.0],
                        "k": list(range(8))})
    df = spark.createDataFrame(pdf)
    wf = nvt.Workflow((["x"] >> _ops.QuantileBin(n_bins=2)) + ["k"])
    expected = wf.fit_transform(df).toPandas().sort_values("k")
    p = str(tmp_path / "qb")
    wf.save(p)
    wf2 = nvt.Workflow.load(p)
    got = wf2.transform(df).toPandas().sort_values("k")
    assert expected["x"].tolist() == got["x"].tolist()


def test_quantile_bin_rejects_bad_args(spark):
    from nvtabular_spark import ops as _ops
    import pytest as _pytest
    with _pytest.raises(ValueError):
        _ops.QuantileBin(n_bins=1)
