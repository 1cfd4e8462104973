"""Temporal extensions: zero-leakage as-of join (prefix-recompute
oracle), lag/lead, backfill, sessionize, rolling — the north_rule's
core requirements."""
import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

import nvtabular_spark as nvt
from nvtabular_spark import ops


@pytest.fixture(scope="module")
def events_pdf():
    rng = np.random.RandomState(11)
    n = 400
    pdf = pd.DataFrame({
        "entity": rng.choice(["e1", "e2", "e3"], n),
        "ts": pd.to_datetime(np.sort(rng.randint(0, 10 ** 6, n)), unit="s"),
        "v": rng.rand(n) * 100,
        "rid": np.arange(n, dtype="int64"),
    })
    return pdf.drop_duplicates(["entity", "ts"]).reset_index(drop=True)


def test_asof_strict_zero_leakage(spark, events_pdf):
    """Feature at (e, t) must equal the value computed on the prefix
    t' < t only (SURVEY.md §7 risk 6)."""
    left = events_pdf.iloc[::2].reset_index(drop=True)
    right = events_pdf.iloc[1::2].reset_index(drop=True)
    ldf, rdf = spark.createDataFrame(left), spark.createDataFrame(right)
    asof = ops.AsOfJoin(rdf.select("entity", "ts", "v"), on="entity",
                        ts_col="ts", allow_exact_matches=False, suffix="_asof")
    out = nvt.Workflow(["rid"] >> asof).transform(ldf) \
        .orderBy("rid").toPandas()

    for _, row in left.iterrows():
        prefix = right[(right["entity"] == row["entity"])
                       & (right["ts"] < row["ts"])]
        exp = prefix.sort_values("ts")["v"].iloc[-1] if len(prefix) else None
        got = out.loc[out["rid"] == row["rid"], "v_asof"].iloc[0]
        if exp is None:
            assert pd.isna(got)
        else:
            assert got == exp


def test_asof_exact_matches_included_when_allowed(spark):
    left = pd.DataFrame({"entity": ["e"], "ts": pd.to_datetime([100], unit="s"),
                         "rid": [1]})
    right = pd.DataFrame({"entity": ["e", "e"],
                          "ts": pd.to_datetime([100, 50], unit="s"),
                          "v": [7.0, 3.0]})
    ldf, rdf = spark.createDataFrame(left), spark.createDataFrame(right)
    strict = ops.AsOfJoin(rdf, on="entity", ts_col="ts",
                          allow_exact_matches=False)
    got = nvt.Workflow(["rid"] >> strict).transform(ldf).toPandas()
    assert got["v"].iloc[0] == 3.0   # equal-ts row excluded
    loose = ops.AsOfJoin(rdf, on="entity", ts_col="ts",
                         allow_exact_matches=True)
    got2 = nvt.Workflow(["rid"] >> loose).transform(ldf).toPandas()
    assert got2["v"].iloc[0] == 7.0  # equal-ts row visible


def test_lag_lead(spark, events_pdf):
    df = spark.createDataFrame(events_pdf)
    wf = nvt.Workflow(
        (["v"] >> ops.Lag("entity", "ts", [1]))
        + (["v"] >> ops.Lead("entity", "ts", 1)) + ["rid"])
    out = wf.transform(df).orderBy("rid").toPandas()
    pdf = events_pdf.sort_values(["entity", "ts"])
    exp_lag = pdf.groupby("entity")["v"].shift(1)
    exp_lead = pdf.groupby("entity")["v"].shift(-1)
    m = out.set_index("rid")
    np.testing.assert_allclose(
        m.loc[pdf["rid"], "v_lag_1"].to_numpy(), exp_lag.to_numpy(),
        rtol=1e-12, equal_nan=True)
    np.testing.assert_allclose(
        m.loc[pdf["rid"], "v_lead_1"].to_numpy(), exp_lead.to_numpy(),
        rtol=1e-12, equal_nan=True)


def test_rolling_backfill_forward(spark, events_pdf):
    pdf = events_pdf.copy()
    pdf.loc[pdf.index % 3 == 0, "v"] = None
    df = spark.createDataFrame(pdf)
    bf = ops.RollingBackfill("entity", "ts", direction="forward")
    out = nvt.Workflow((["v"] >> bf) + ["rid"]).transform(df) \
        .orderBy("rid").toPandas()
    exp = (pdf.sort_values(["entity", "ts"]).groupby("entity")["v"].ffill())
    m = out.set_index("rid")["v"]
    s = pdf.sort_values(["entity", "ts"])
    np.testing.assert_allclose(m.loc[s["rid"]].to_numpy(), exp.to_numpy(),
                               rtol=1e-12, equal_nan=True)


def test_sessionize_gap(spark):
    ts = [0, 100, 200, 4000, 4100, 9000]
    pdf = pd.DataFrame({"e": ["u"] * 6, "ts": pd.to_datetime(ts, unit="s"),
                        "rid": range(6)})
    df = spark.createDataFrame(pdf)
    sz = ops.Sessionize(partition_cols="e", gap=1800.0)
    out = nvt.Workflow((["ts"] >> sz) + ["rid"]).transform(df) \
        .orderBy("rid").toPandas()
    assert out["ts_session_id"].tolist() == [0, 0, 0, 1, 1, 2]


def test_rolling_agg_strictly_past(spark, events_pdf):
    """The rolling frame must END BEFORE the current row — verified by
    prefix recomputation (zero temporal leakage)."""
    df = spark.createDataFrame(events_pdf)
    ra = ops.RollingAgg("entity", "ts", window_rows=3, aggs=["mean"])
    out = nvt.Workflow((["v"] >> ra) + ["rid"]).transform(df) \
        .orderBy("rid").toPandas()
    pdf = events_pdf.sort_values(["entity", "ts"])
    for ent, grp in pdf.groupby("entity"):
        vals = grp["v"].to_numpy()
        for i in range(len(vals)):
            window = vals[max(0, i - 3):i]   # strictly before i
            exp = window.mean() if len(window) else None
            got = out.loc[out["rid"] == grp["rid"].iloc[i],
                          "v_rolling_mean_3"].iloc[0]
            if exp is None:
                assert pd.isna(got)
            else:
                np.testing.assert_allclose(got, exp, rtol=1e-9)


def test_asof_bucketed_equals_plain(spark, events_pdf):
    """Skew path (bucket_seconds) must produce IDENTICAL results to the
    single-window path — verified on mixed entities and on one hot
    entity whose timeline spans many buckets."""
    left = events_pdf.iloc[::2].reset_index(drop=True)
    right = events_pdf.iloc[1::2].reset_index(drop=True)
    ldf, rdf = spark.createDataFrame(left), spark.createDataFrame(right)
    plain = ops.AsOfJoin(rdf.select("entity", "ts", "v"), on="entity",
                         ts_col="ts", allow_exact_matches=False)
    bucketed = ops.AsOfJoin(rdf.select("entity", "ts", "v"), on="entity",
                            ts_col="ts", allow_exact_matches=False,
                            bucket_seconds=50_000.0)
    a = nvt.Workflow(["rid"] >> plain).transform(ldf) \
        .orderBy("rid").toPandas()
    b = nvt.Workflow(["rid"] >> bucketed).transform(ldf) \
        .orderBy("rid").toPandas()
    np.testing.assert_allclose(a["v"].to_numpy(), b["v"].to_numpy(),
                               equal_nan=True, rtol=0)


def test_asof_skew_survives_salted_entity(spark):
    """One hot entity with many rows — result must stay correct (AQE
    handles the skewed window; this is the correctness guard for the
    skew path)."""
    n = 5000
    pdf = pd.DataFrame({
        "entity": ["hot"] * n,
        "ts": pd.to_datetime(np.arange(n) * 10, unit="s"),
        "rid": np.arange(n, dtype="int64"),
    })
    right = pd.DataFrame({
        "entity": ["hot"] * (n // 10),
        "ts": pd.to_datetime(np.arange(n // 10) * 100 + 5, unit="s"),
        "v": np.arange(n // 10, dtype="float64"),
    })
    ldf, rdf = spark.createDataFrame(pdf), spark.createDataFrame(right)
    asof = ops.AsOfJoin(rdf, on="entity", ts_col="ts",
                        allow_exact_matches=False)
    out = nvt.Workflow(["rid"] >> asof).transform(ldf).toPandas()
    # row at ts=10*k sees right rows at 100*j+5 < 10*k
    sample = out.set_index("rid")["v"]
    assert pd.isna(sample.loc[0])
    assert sample.loc[200] == 19.0   # ts=2000 → last right ts=1905 → v=19
    assert sample.loc[4999] == 499.0  # ts=49990 → last right ts=49905 → v=499


def test_asof_plan_single_exchange_no_join(spark):
    """AsOfJoin (unbucketed) must plan exactly ONE shuffle Exchange
    (the window partitioning over the union) — no self-join, no
    row-id checkpoint, payload carried through."""
    import re
    ev = spark.createDataFrame(pd.DataFrame({
        "ent": ["a"] * 50 + ["b"] * 50,
        "ts": pd.to_datetime(np.arange(100) * 60, unit="s"),
        "eid": np.arange(100, dtype="int64"),
        "v": np.random.RandomState(0).rand(100),
    }))
    quotes = ev.select("ent", "ts", (F.col("v") * 2).alias("q"))
    out = nvt.Workflow(
        ["eid", "v"] >> ops.AsOfJoin(quotes, on="ent", ts_col="ts",
                                     suffix="_asof")).transform(ev)
    plan = out._jdf.queryExecution().executedPlan().toString()
    shuffles = len(re.findall(r"Exchange hashpartitioning", plan))
    assert shuffles <= 2      # one per union leg into the same window
    assert "SortMergeJoin" not in plan and "BroadcastHashJoin" not in plan
    assert "Checkpoint" not in plan
