"""TargetEncoding parity with a pandas oracle + the reference's own
property assertions (test_target_encode.py:71-147)."""
import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

import nvtabular_spark as nvt
from nvtabular_spark import ops


def _pandas_te(pdf, group, target, fold, p):
    mean = pdf[target].mean()
    ga = pdf.groupby(group)[target].agg(["count", "sum"])
    gf = pdf.groupby([group, fold])[target].agg(["count", "sum"])
    out = []
    for _, r in pdf.iterrows():
        ca, sa = ga.loc[r[group]]
        try:
            cf, sf = gf.loc[(r[group], r[fold])]
        except KeyError:
            cf, sf = 0, 0.0
        out.append(((sa - sf) + p * mean) / ((ca - cf) + p))
    return np.array(out)


@pytest.fixture(scope="module")
def te_pdf():
    rng = np.random.RandomState(7)
    n = 300
    return pd.DataFrame({
        "cat": rng.choice(["a", "b", "c", "d"], n),
        "y": rng.rand(n),
        "rid": np.arange(n, dtype="int64"),
        "fold": (np.arange(n) % 3).astype("int32"),
    })


def test_te_formula_matches_pandas(spark, te_pdf):
    df = spark.createDataFrame(te_pdf)
    te = ops.TargetEncoding(target="y", fold_col="fold",
                            fold_is_precomputed=True, kfold=3, p_smooth=20)
    out = nvt.Workflow((["cat"] >> te) + ["rid"]).fit_transform(df) \
        .orderBy("rid").toPandas()
    expected = _pandas_te(te_pdf, "cat", "y", "fold", 20.0)
    np.testing.assert_allclose(out["TE_cat_y"].to_numpy(), expected,
                               rtol=1e-9)


def test_te_single_category_equals_global_mean(spark):
    """Reference test_target_encode.py:111-147: with one category and
    fold-free smoothing behavior — TE with all-other-folds empty must
    still approach mean; we check the exact formula limit: single
    category, many rows per fold."""
    pdf = pd.DataFrame({"cat": ["only"] * 90, "y": np.arange(90) / 90.0,
                        "rid": np.arange(90, dtype="int64"),
                        "fold": (np.arange(90) % 3).astype("int32")})
    df = spark.createDataFrame(pdf)
    te = ops.TargetEncoding(target="y", fold_col="fold",
                            fold_is_precomputed=True, kfold=3, p_smooth=0.0001)
    out = nvt.Workflow((["cat"] >> te) + ["rid"]).fit_transform(df).toPandas()
    # with tiny smoothing, TE ≈ mean of the other folds
    for f in range(3):
        mask = pdf["fold"] == f
        other_mean = pdf.loc[~mask, "y"].mean()
        got = out.merge(pdf[["rid", "fold"]], on="rid")
        np.testing.assert_allclose(
            got.loc[got["fold"] == f, "TE_cat_y"].to_numpy(),
            other_mean, rtol=1e-6)


def test_te_unseen_group_gets_global_mean(spark, te_pdf):
    df = spark.createDataFrame(te_pdf)
    te = ops.TargetEncoding(target="y", fold_col="fold",
                            fold_is_precomputed=True, p_smooth=20)
    wf = nvt.Workflow((["cat"] >> te) + ["rid"])
    wf.fit(df)
    new = spark.createDataFrame(pd.DataFrame({
        "cat": ["never_seen"], "y": [0.0], "rid": [999],
        "fold": np.array([0], dtype="int32")}))
    out = wf.transform(new).toPandas()
    np.testing.assert_allclose(out["TE_cat_y"].iloc[0], te_pdf["y"].mean(),
                               rtol=1e-9)


def test_te_fold_assignment_deterministic(spark, te_pdf):
    """Reference asserts fold self-consistency, not exact fold values
    (test_target_encode.py:71-84). Hash folds must be stable across
    runs and partitionings."""
    df = spark.createDataFrame(te_pdf)
    te = ops.TargetEncoding(target="y", fold_col="rid", kfold=3,
                            fold_seed=42, drop_folds=False)
    out1 = nvt.Workflow((["cat"] >> te) + ["rid"]).fit_transform(df) \
        .orderBy("rid").toPandas()
    te2 = ops.TargetEncoding(target="y", fold_col="rid", kfold=3,
                             fold_seed=42, drop_folds=False)
    out2 = nvt.Workflow((["cat"] >> te2) + ["rid"]) \
        .fit_transform(df.repartition(7)).orderBy("rid").toPandas()
    assert out1["__fold__"].tolist() == out2["__fold__"].tolist()
    assert out1["__fold__"].between(0, 2).all()
    np.testing.assert_allclose(out1["TE_cat_y"], out2["TE_cat_y"], rtol=1e-12)


def test_te_multi_column_group(spark, te_pdf):
    pdf = te_pdf.assign(cat2=np.where(te_pdf["rid"] % 2 == 0, "u", "v"))
    df = spark.createDataFrame(pdf)
    te = ops.TargetEncoding(target="y", fold_col="fold",
                            fold_is_precomputed=True, p_smooth=20)
    out = nvt.Workflow(([["cat", "cat2"]] >> te) + ["rid"]) \
        .fit_transform(df).orderBy("rid").toPandas()
    assert "TE_cat_cat2_y" in out.columns
    key = pdf["cat"] + "|" + pdf["cat2"]
    expected = _pandas_te(pdf.assign(k=key), "k", "y", "fold", 20.0)
    np.testing.assert_allclose(out["TE_cat_cat2_y"].to_numpy(), expected,
                               rtol=1e-9)


def test_te_nan_target_treated_as_missing(spark):
    """NaN targets must not poison group sums (pandas/cudf skipna
    semantics, same contract as Normalize/Groupby)."""
    import numpy as np
    import pandas as pd
    pdf = pd.DataFrame({
        "cat": ["a", "a", "a", "b", "b", "b"],
        "y": [1.0, np.nan, 3.0, 2.0, 2.0, np.nan],
        "fold": [0, 1, 0, 1, 0, 1],
        "rid": range(6)})
    df = spark.createDataFrame(pdf)
    wf = nvt.Workflow(
        (["cat"] >> ops.TargetEncoding(target="y", fold_col="fold",
                                       fold_is_precomputed=True,
                                       p_smooth=0)) + ["rid"])
    out = wf.fit_transform(df).orderBy("rid").toPandas()
    assert out["TE_cat_y"].notna().all()
    # row 1 (cat=a, fold=1): other folds hold y=1,3 -> mean 2.0
    assert abs(out["TE_cat_y"].iloc[1] - 2.0) < 1e-9


# -- WoEEncoding ----------------------------------------------------------------

def test_woe_brute_force(spark):
    """WoE per category vs a pandas recomputation of the smoothed
    log-odds-vs-prior formula; unseen-at-transform category → 0.0."""
    import math
    rng = np.random.RandomState(5)
    pdf = pd.DataFrame({
        "cat": rng.choice(["a", "b", "c"], 300),
        "y": rng.binomial(1, 0.3, 300).astype("float64"),
        "rid": np.arange(300, dtype="int64"),
    })
    df = spark.createDataFrame(pdf)
    woe = ops.WoEEncoding(target="y", alpha=0.5)
    wf = nvt.Workflow((["cat"] >> woe) + ["rid"])
    out = wf.fit_transform(df).orderBy("rid").toPandas()

    a = 0.5
    pos_t, neg_t = pdf["y"].sum(), (1 - pdf["y"]).sum()
    prior = math.log((pos_t + a) / (neg_t + a))
    for c in ["a", "b", "c"]:
        sub = pdf[pdf["cat"] == c]
        exp = math.log((sub["y"].sum() + a)
                       / ((1 - sub["y"]).sum() + a)) - prior
        got = out.loc[out["cat"] == c, "WOE_cat_y"].unique()
        assert len(got) == 1
        np.testing.assert_allclose(got[0], exp, rtol=1e-12)

    # unseen category at transform → exactly 0.0 (the prior)
    new = spark.createDataFrame(pd.DataFrame(
        {"cat": ["zz"], "y": [0.0], "rid": [999]}))
    got = wf.transform(new).toPandas()
    assert got["WOE_cat_y"].iloc[0] == 0.0


def test_woe_nan_target_roundtrip_and_validation(spark, tmp_path):
    import math
    with pytest.raises(ValueError, match="alpha"):
        ops.WoEEncoding(target="y", alpha=0.0)
    pdf = pd.DataFrame({
        "cat": ["a", "a", "a", "b"],
        "y": [1.0, 0.0, np.nan, 1.0],     # NaN excluded from counts
        "rid": range(4)})
    df = spark.createDataFrame(pdf)
    wf = nvt.Workflow((["cat"] >> ops.WoEEncoding(target="y", alpha=1.0))
                      + ["rid"])
    wf.fit(df)
    # a: pos=1 neg=1; totals pos=2 neg=1
    exp_a = math.log((1 + 1) / (1 + 1)) - math.log((2 + 1) / (1 + 1))
    out = wf.transform(df).orderBy("rid").toPandas()
    np.testing.assert_allclose(out["WOE_cat_y"].iloc[0], exp_a,
                               rtol=1e-12)
    path = str(tmp_path / "woe_wf")
    wf.save(path)
    loaded = nvt.Workflow.load(path)
    pd.testing.assert_frame_equal(
        out, loaded.transform(df).orderBy("rid").toPandas())


def test_woe_multi_key_group(spark):
    """Grouped selector = composite key: WoE over (cat, seg) pairs."""
    pdf = pd.DataFrame({
        "cat": ["a", "a", "b", "b", "a", "b"],
        "seg": ["x", "y", "x", "y", "x", "x"],
        "y": [1.0, 0.0, 1.0, 1.0, 1.0, 0.0],
        "rid": range(6)})
    df = spark.createDataFrame(pdf)
    out = nvt.Workflow(([("cat", "seg")] >> ops.WoEEncoding(
        target="y", alpha=0.5)) + ["rid"]) \
        .fit_transform(df).orderBy("rid").toPandas()
    import math
    a = 0.5
    prior = math.log((4 + a) / (2 + a))
    sub = pdf[(pdf["cat"] == "a") & (pdf["seg"] == "x")]
    exp = math.log((2 + a) / (0 + a)) - prior
    np.testing.assert_allclose(out["WOE_cat_seg_y"].iloc[0], exp,
                               rtol=1e-12)
