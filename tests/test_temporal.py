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


def test_rolling_agg_time_window_brute_force(spark, events_pdf):
    """Time-range frame [ts - w, ts - 1s]: verified against a pandas
    brute-force recomputation per row (zero temporal leakage; events
    closer than gap_seconds — including ties — are excluded)."""
    w_sec = 50_000
    df = spark.createDataFrame(events_pdf)
    ra = ops.RollingAgg("entity", "ts", window_seconds=w_sec,
                        aggs=["mean", "count"])
    out = nvt.Workflow((["v"] >> ra) + ["rid"]).transform(df) \
        .orderBy("rid").toPandas()
    suffix = f"t{w_sec}s"
    epoch = events_pdf["ts"].astype("int64") / 1e9
    for i, row in events_pdf.iterrows():
        t = epoch.iloc[i]
        mask = ((events_pdf["entity"] == row["entity"])
                & (epoch >= t - w_sec) & (epoch <= t - 1))
        window = events_pdf.loc[mask, "v"]
        got_m = out.loc[out["rid"] == row["rid"],
                        f"v_rolling_mean_{suffix}"].iloc[0]
        got_c = out.loc[out["rid"] == row["rid"],
                        f"v_rolling_count_{suffix}"].iloc[0]
        if len(window) == 0:
            assert pd.isna(got_m)
            assert got_c == 0
        else:
            np.testing.assert_allclose(got_m, window.mean(), rtol=1e-9)
            assert got_c == len(window)


def test_rolling_agg_time_window_excludes_ties(spark):
    """Two events at the SAME timestamp must not see each other — the
    >=1s gap keeps the strictly-past contract deterministic under
    ties (a rows-frame cannot promise that)."""
    pdf = pd.DataFrame({
        "e": ["a"] * 4,
        "ts": pd.to_datetime([1000, 2000, 2000, 3000], unit="s"),
        "v": [1.0, 10.0, 20.0, 100.0],
        "rid": range(4)})
    df = spark.createDataFrame(pdf)
    ra = ops.RollingAgg("e", "ts", window_seconds=10_000, aggs=["sum"])
    out = nvt.Workflow((["v"] >> ra) + ["rid"]).transform(df) \
        .orderBy("rid").toPandas()
    # both ts=2000 rows see ONLY the ts=1000 row; ts=3000 sees the
    # three earlier rows (1 + 10 + 20) and never itself
    assert out["v_rolling_sum_t10000s"].tolist()[1:] == [1.0, 1.0, 31.0]
    assert pd.isna(out["v_rolling_sum_t10000s"].iloc[0])


def test_rolling_agg_time_window_validation_and_roundtrip(spark, tmp_path):
    with pytest.raises(ValueError, match="exclusive"):
        ops.RollingAgg("e", "ts", window_rows=3, window_seconds=60)
    with pytest.raises(ValueError, match="one timestamp"):
        ops.RollingAgg("e", ["ts", "ts2"], window_seconds=60)
    with pytest.raises(ValueError, match="gap_seconds"):
        ops.RollingAgg("e", "ts", window_seconds=60, gap_seconds=0)
    # save/load round-trip carries the time-frame params
    wf = nvt.Workflow((["v"] >> ops.RollingAgg(
        "e", "ts", window_seconds=3600, gap_seconds=2,
        aggs=["mean"])) + ["rid"])
    path = str(tmp_path / "ra_wf")
    wf.save(path)
    loaded = nvt.Workflow.load(path)
    pdf = pd.DataFrame({"e": ["a", "a"],
                        "ts": pd.to_datetime([0, 1800], unit="s"),
                        "v": [5.0, 7.0], "rid": [0, 1]})
    out = loaded.transform(spark.createDataFrame(pdf)) \
        .orderBy("rid").toPandas()
    assert pd.isna(out["v_rolling_mean_t3600s"].iloc[0])
    assert out["v_rolling_mean_t3600s"].iloc[1] == 5.0


def test_time_decay_brute_force(spark, events_pdf):
    """decayed_sum/count over [ts-W, ts-1s] with half-life h must match
    a per-row pandas recomputation exactly (strictly past, 0.5^(dt/h)
    weights)."""
    w_sec, h = 80_000, 20_000.0
    df = spark.createDataFrame(events_pdf)
    td = ops.TimeDecay("entity", "ts", half_life_seconds=h,
                       window_seconds=w_sec, aggs=["sum", "count"])
    out = nvt.Workflow((["v"] >> td) + ["rid"]).transform(df) \
        .orderBy("rid").toPandas()
    epoch = events_pdf["ts"].astype("int64") / 1e9
    for i, row in events_pdf.iterrows():
        t = epoch.iloc[i]
        mask = ((events_pdf["entity"] == row["entity"])
                & (epoch >= t - w_sec) & (epoch <= t - 1))
        dt = t - epoch[mask]
        wts = np.power(0.5, dt / h)
        exp_sum = float((events_pdf.loc[mask, "v"] * wts).sum())
        exp_cnt = float(wts.sum())
        got = out[out["rid"] == row["rid"]]
        np.testing.assert_allclose(got["v_decay_sum_h20000s"].iloc[0],
                                   exp_sum, rtol=1e-9, atol=1e-12)
        np.testing.assert_allclose(got["v_decay_count_h20000s"].iloc[0],
                                   exp_cnt, rtol=1e-9, atol=1e-12)


def test_time_decay_nulls_and_validation(spark):
    """NULL values contribute 0 to decayed_sum and 0 to decayed_count,
    but their rows still exist on the timeline."""
    pdf = pd.DataFrame({
        "e": ["a"] * 3,
        "ts": pd.to_datetime([0, 100, 200], unit="s"),
        "v": [4.0, np.nan, 1.0],
        "rid": range(3)})
    df = spark.createDataFrame(pdf).withColumn(
        "v", F.when(F.isnan("v"), None).otherwise(F.col("v")))
    td = ops.TimeDecay("e", "ts", half_life_seconds=100.0,
                       window_seconds=1000, aggs=["sum", "count"])
    out = nvt.Workflow((["v"] >> td) + ["rid"]).transform(df) \
        .orderBy("rid").toPandas()
    # rid=2 at t=200 sees v=4 at dt=200 (weight 0.25) and the NULL row
    # at dt=100 (contributes 0 to both sum and count)
    np.testing.assert_allclose(out["v_decay_sum_h100s"].iloc[2], 1.0)
    np.testing.assert_allclose(out["v_decay_count_h100s"].iloc[2], 0.25)
    with pytest.raises(ValueError, match="half_life"):
        ops.TimeDecay("e", "ts", half_life_seconds=0, window_seconds=10)
    with pytest.raises(ValueError, match="unsupported decay"):
        ops.TimeDecay("e", "ts", half_life_seconds=1.0,
                      window_seconds=10, aggs=["median"])


def test_time_decay_duckdb_cross_engine(spark, events_pdf):
    """Cross-engine parity: the same decayed sum via DuckDB's windowed
    ARRAY_AGG + list_transform lambda."""
    import duckdb
    w_sec, h = 80_000, 20_000.0
    df = spark.createDataFrame(events_pdf)
    td = ops.TimeDecay("entity", "ts", half_life_seconds=h,
                       window_seconds=w_sec, aggs=["sum"])
    got = nvt.Workflow((["v"] >> td) + ["rid"]).transform(df) \
        .orderBy("rid").toPandas()
    con = duckdb.connect()
    con.register("events", events_pdf)
    exp = con.execute(f"""
        WITH e AS (SELECT rid, entity, v, epoch(ts) AS t FROM events)
        SELECT rid,
               COALESCE(list_sum(list_transform(
                   ARRAY_AGG(struct_pack(t := t, v := v)) OVER w,
                   s -> COALESCE(s.v, 0) * POWER(0.5, (t - s.t) / {h}))),
                   0.0) AS dsum
        FROM e WINDOW w AS (PARTITION BY entity ORDER BY t
             RANGE BETWEEN {w_sec} PRECEDING AND 1 PRECEDING)
        ORDER BY rid""").df()
    np.testing.assert_allclose(got["v_decay_sum_h20000s"].to_numpy(),
                               exp["dsum"].to_numpy(),
                               rtol=1e-9, atol=1e-12)


def test_rolling_agg_std_var_brute_force(spark, events_pdf):
    """Rolling volatility (ddof=1 std/var, matching the package-wide
    sample convention) over both frame kinds vs pandas recomputation."""
    df = spark.createDataFrame(events_pdf)
    ra = ops.RollingAgg("entity", "ts", window_rows=5,
                        aggs=["std", "var"])
    out = nvt.Workflow((["v"] >> ra) + ["rid"]).transform(df) \
        .orderBy("rid").toPandas()
    pdf = events_pdf.sort_values(["entity", "ts"])
    for ent, grp in pdf.groupby("entity"):
        vals = grp["v"].to_numpy()
        for i in range(len(vals)):
            window = vals[max(0, i - 5):i]
            got_s = out.loc[out["rid"] == grp["rid"].iloc[i],
                            "v_rolling_std_5"].iloc[0]
            got_v = out.loc[out["rid"] == grp["rid"].iloc[i],
                            "v_rolling_var_5"].iloc[0]
            if len(window) < 2:
                assert pd.isna(got_s) and pd.isna(got_v)
            else:
                np.testing.assert_allclose(got_s, window.std(ddof=1),
                                           rtol=1e-9)
                np.testing.assert_allclose(got_v, window.var(ddof=1),
                                           rtol=1e-9)
    # time-range frame takes the same aggs
    rt = ops.RollingAgg("entity", "ts", window_seconds=80_000,
                        aggs=["std"])
    out_t = nvt.Workflow((["v"] >> rt) + ["rid"]).transform(df) \
        .orderBy("rid").toPandas()
    epoch = events_pdf["ts"].astype("int64") / 1e9
    for i, row in events_pdf.iterrows():
        t = epoch.iloc[i]
        mask = ((events_pdf["entity"] == row["entity"])
                & (epoch >= t - 80_000) & (epoch <= t - 1))
        window = events_pdf.loc[mask, "v"].to_numpy()
        got = out_t.loc[out_t["rid"] == row["rid"],
                        "v_rolling_std_t80000s"].iloc[0]
        if len(window) < 2:
            assert pd.isna(got)
        else:
            np.testing.assert_allclose(got, window.std(ddof=1), rtol=1e-9)


def test_rolling_nunique_brute_force(spark, events_pdf):
    """Trailing distinct count (exact nunique) over both frame kinds vs
    pandas recomputation; approx_nunique agrees exactly at the tiny
    per-frame cardinalities the fixture produces (HLL++ is exact far
    below its relative-error regime)."""
    pdf = events_pdf.copy()
    # quantize values so frames actually contain repeats
    pdf["item"] = (pdf["v"] // 20).astype("int64")
    df = spark.createDataFrame(pdf)
    ra = ops.RollingAgg("entity", "ts", window_rows=4,
                        aggs=["nunique", "approx_nunique"])
    rt = ops.RollingAgg("entity", "ts", window_seconds=80_000,
                        aggs=["nunique"])
    out = nvt.Workflow((["item"] >> ra) + (["item"] >> rt) + ["rid"]) \
        .transform(df).orderBy("rid").toPandas()

    srt = pdf.sort_values(["entity", "ts"])
    for ent, grp in srt.groupby("entity"):
        vals = grp["item"].to_numpy()
        for i in range(len(vals)):
            frame = vals[max(0, i - 4):i]
            exp = len(set(frame))
            rid = grp["rid"].iloc[i]
            got = out.loc[out["rid"] == rid, "item_rolling_nunique_4"]
            assert int(got.iloc[0]) == exp, (ent, i)
            got_a = out.loc[out["rid"] == rid,
                            "item_rolling_approx_nunique_4"]
            assert int(got_a.iloc[0]) == exp, (ent, i)

    epoch = pdf["ts"].astype("int64") / 1e9
    for i, row in pdf.iterrows():
        t = epoch.iloc[i]
        mask = ((pdf["entity"] == row["entity"])
                & (epoch >= t - 80_000) & (epoch <= t - 1))
        exp = pdf.loc[mask, "item"].nunique()
        got = out.loc[out["rid"] == row["rid"],
                      "item_rolling_nunique_t80000s"]
        assert int(got.iloc[0]) == exp, i


def test_rolling_agg_rejects_unknown_agg():
    with pytest.raises(ValueError, match="unsupported rolling aggs"):
        ops.RollingAgg("e", "ts", window_rows=3, aggs=["median"])


# -- ExpandingTargetEncoding ---------------------------------------------------

def test_expanding_te_brute_force(spark, events_pdf):
    """ETE at (e, t) must equal (sum_past + p*prior)/(count_past + p)
    where past = the entity's rows at ts <= t - 1s over the WHOLE
    input (expanding frame), prior = the global mean — recomputed
    per row in pandas."""
    p = 20.0
    df = spark.createDataFrame(events_pdf)
    ete = ops.ExpandingTargetEncoding(target="v", order_by="ts",
                                      p_smooth=p)
    out = nvt.Workflow((["entity"] >> ete) + ["rid"]) \
        .fit_transform(df).orderBy("rid").toPandas()
    prior = events_pdf["v"].mean()
    epoch = events_pdf["ts"].astype("int64") / 1e9
    for i, row in events_pdf.iterrows():
        t = epoch.iloc[i]
        past = events_pdf.loc[(events_pdf["entity"] == row["entity"])
                              & (epoch <= t - 1), "v"]
        exp = (past.sum() + p * prior) / (len(past) + p)
        got = out.loc[out["rid"] == row["rid"], "ETE_entity_v"].iloc[0]
        np.testing.assert_allclose(got, exp, rtol=1e-12)


def test_expanding_te_first_event_is_prior_and_ties_excluded(spark):
    pdf = pd.DataFrame({
        "e": ["a"] * 4,
        "ts": pd.to_datetime([1000, 2000, 2000, 3000], unit="s"),
        "y": [4.0, 8.0, 16.0, 2.0],
        "rid": range(4)})
    df = spark.createDataFrame(pdf)
    ete = ops.ExpandingTargetEncoding(target="y", order_by="ts",
                                      p_smooth=2.0)
    out = nvt.Workflow((["e"] >> ete) + ["rid"]) \
        .fit_transform(df).orderBy("rid").toPandas()
    prior = pdf["y"].mean()    # 7.5
    # rid 0: no past → exactly the prior
    np.testing.assert_allclose(out["ETE_e_y"].iloc[0], prior)
    # the two ts=2000 rows see ONLY ts=1000 — not each other
    exp_tied = (4.0 + 2.0 * prior) / (1 + 2.0)
    np.testing.assert_allclose(out["ETE_e_y"].iloc[1], exp_tied)
    np.testing.assert_allclose(out["ETE_e_y"].iloc[2], exp_tied)
    # rid 3 sees all three earlier rows
    exp3 = (28.0 + 2.0 * prior) / (3 + 2.0)
    np.testing.assert_allclose(out["ETE_e_y"].iloc[3], exp3)


def test_expanding_te_psmooth_zero_and_nan_target(spark):
    """p_smooth=0 → raw expanding mean, NULL when no history; NaN
    targets are missing (never poison the running sum)."""
    pdf = pd.DataFrame({
        "e": ["a", "a", "a"],
        "ts": pd.to_datetime([10, 20, 30], unit="s"),
        "y": [5.0, np.nan, 7.0],
        "rid": range(3)})
    df = spark.createDataFrame(pdf)
    ete = ops.ExpandingTargetEncoding(target="y", order_by="ts",
                                      p_smooth=0.0)
    out = nvt.Workflow((["e"] >> ete) + ["rid"]) \
        .fit_transform(df).orderBy("rid").toPandas()
    assert pd.isna(out["ETE_e_y"].iloc[0])
    np.testing.assert_allclose(out["ETE_e_y"].iloc[1], 5.0)
    np.testing.assert_allclose(out["ETE_e_y"].iloc[2], 5.0)  # NaN skipped


def test_expanding_te_roundtrip_and_validation(spark, tmp_path):
    with pytest.raises(ValueError, match="gap_seconds"):
        ops.ExpandingTargetEncoding(target="y", order_by="ts",
                                    gap_seconds=0)
    pdf = pd.DataFrame({
        "e": ["a", "a", "b"],
        "ts": pd.to_datetime([10, 20, 30], unit="s"),
        "y": [1.0, 3.0, 5.0],
        "rid": range(3)})
    df = spark.createDataFrame(pdf)
    wf = nvt.Workflow((["e"] >> ops.ExpandingTargetEncoding(
        target="y", order_by="ts", p_smooth=1.0)) + ["rid"])
    wf.fit(df)
    path = str(tmp_path / "ete_wf")
    wf.save(path)
    loaded = nvt.Workflow.load(path)
    a = wf.transform(df).orderBy("rid").toPandas()
    b = loaded.transform(df).orderBy("rid").toPandas()
    pd.testing.assert_frame_equal(a, b)
    # fitted prior rides the round-trip (no refit needed)
    np.testing.assert_allclose(a["ETE_e_y"].iloc[0], 3.0)  # global mean


def test_expanding_te_multi_key_and_fused_fit(spark, events_pdf):
    """Grouped selector = composite entity key; the prior fit fuses
    into the same single agg job as Normalize's moments (both are
    AggStatOperators) — assert equivalence, not the job count (the
    compiler plan-shape tests own that)."""
    pdf = events_pdf.assign(seg=np.where(events_pdf["rid"] % 2 == 0,
                                         "x", "y"))
    df = spark.createDataFrame(pdf)
    ete = ops.ExpandingTargetEncoding(target="v", order_by="ts",
                                      p_smooth=5.0)
    wf = nvt.Workflow(([("entity", "seg")] >> ete)
                      + (["v"] >> ops.Normalize()) + ["rid"])
    out = wf.fit_transform(df).orderBy("rid").toPandas()
    assert "ETE_entity_seg_v" in out.columns
    prior = pdf["v"].mean()
    epoch = pdf["ts"].astype("int64") / 1e9
    for i in [0, 57, 123]:
        row = pdf.iloc[i]
        t = epoch.iloc[i]
        past = pdf.loc[(pdf["entity"] == row["entity"])
                       & (pdf["seg"] == row["seg"])
                       & (epoch <= t - 1), "v"]
        exp = (past.sum() + 5.0 * prior) / (len(past) + 5.0)
        got = out.loc[out["rid"] == row["rid"],
                      "ETE_entity_seg_v"].iloc[0]
        np.testing.assert_allclose(got, exp, rtol=1e-12)


def test_asof_tolerance_staleness(spark, events_pdf):
    """merge_asof-style tolerance: the matched value is NULLed when
    its own timestamp is more than tolerance_seconds before the left
    row — brute-forced per row, default and bucketed paths, and the
    ignorenulls contract (staleness judged on the ts of the last
    NON-NULL right value)."""
    left = events_pdf.iloc[::2].reset_index(drop=True)
    right = events_pdf.iloc[1::2].reset_index(drop=True)
    ldf = spark.createDataFrame(left)
    rdf = spark.createDataFrame(right)
    tol = 40_000.0

    for bucket in (None, 30_000.0):
        asof = ops.AsOfJoin(rdf.select("entity", "ts", "v"),
                            on="entity", ts_col="ts",
                            allow_exact_matches=False, suffix="_asof",
                            tolerance_seconds=tol,
                            bucket_seconds=bucket)
        out = nvt.Workflow(["rid"] >> asof).transform(ldf) \
            .orderBy("rid").toPandas()
        for _, row in left.iterrows():
            prefix = right[(right["entity"] == row["entity"])
                           & (right["ts"] < row["ts"])]
            exp = None
            if len(prefix):
                last = prefix.sort_values("ts").iloc[-1]
                age = (row["ts"] - last["ts"]).total_seconds()
                exp = last["v"] if age <= tol else None
            got = out.loc[out["rid"] == row["rid"], "v_asof"].iloc[0]
            if exp is None:
                assert pd.isna(got), (bucket, row["rid"])
            else:
                assert got == exp, (bucket, row["rid"])

    # ignorenulls + tolerance: a null right value is skipped and the
    # OLDER non-null match is judged by its own (stale) timestamp
    rdf2 = spark.createDataFrame(
        [("e", 10, 100.0), ("e", 500, None)],
        "entity string, sec long, quote double") \
        .selectExpr("entity", "timestamp_seconds(sec) AS ts", "quote")
    ldf2 = spark.createDataFrame(
        pd.DataFrame({"entity": ["e"], "rid": [1],
                      "ts": pd.to_datetime([600], unit="s")}))
    strict = ops.AsOfJoin(rdf2, on="entity", ts_col="ts",
                          tolerance_seconds=200.0)
    got = nvt.Workflow(["rid"] >> strict).transform(ldf2).toPandas()
    assert pd.isna(got["quote"].iloc[0])   # 100.0 is 590s stale
    loose = ops.AsOfJoin(rdf2, on="entity", ts_col="ts",
                         tolerance_seconds=1000.0)
    got2 = nvt.Workflow(["rid"] >> loose).transform(ldf2).toPandas()
    assert got2["quote"].iloc[0] == 100.0

    with pytest.raises(ValueError, match="tolerance"):
        ops.AsOfJoin(rdf2, on="entity", ts_col="ts",
                     tolerance_seconds=0)


def test_asof_save_load_round_trip_with_tolerance(spark, tmp_path):
    """AsOfJoin params (including tolerance_seconds) must survive
    save/load: the loaded workflow transforms identically, and a
    configured tolerance keeps NULLing stale matches after reload."""
    left = pd.DataFrame({"entity": ["e", "e"],
                         "ts": pd.to_datetime([100, 5000], unit="s"),
                         "rid": [1, 2]})
    right = pd.DataFrame({"entity": ["e"],
                          "ts": pd.to_datetime([50], unit="s"),
                          "v": [3.0]})
    ldf, rdf = spark.createDataFrame(left), spark.createDataFrame(right)
    asof = ops.AsOfJoin(rdf, on="entity", ts_col="ts",
                        allow_exact_matches=False, suffix="_asof",
                        tolerance_seconds=600)
    wf = nvt.Workflow(["rid"] >> asof)
    before = wf.transform(ldf).orderBy("rid").toPandas()
    p = str(tmp_path / "wf_asof")
    wf.save(p)
    wf2 = nvt.Workflow.load(p, spark)
    after = wf2.transform(ldf).orderBy("rid").toPandas()
    pd.testing.assert_frame_equal(before, after)
    # rid=1: match at ts=50 is 50s stale (within 600s) -> value kept;
    # rid=2: 4950s stale -> NULLed by tolerance
    assert after.loc[after["rid"] == 1, "v_asof"].iloc[0] == 3.0
    assert pd.isna(after.loc[after["rid"] == 2, "v_asof"].iloc[0])

    # an op saved WITHOUT tolerance (pre-r5 graph) must default to None
    legacy = ops.AsOfJoin.load_params({"on": ["entity"], "ts_col": "ts"})
    assert legacy.tolerance_seconds is None
