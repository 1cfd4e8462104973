"""Structured Streaming surface: fitted-workflow stream transform
(stream-static broadcast joins) and watermarked windowed aggregation."""
import os

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

import nvtabular_spark as nvt
from nvtabular_spark import ops
from nvtabular_spark.streaming import transform_stream, windowed_agg_stream


@pytest.fixture()
def stream_dir(spark, tmp_path):
    rng = np.random.RandomState(21)
    pdf = pd.DataFrame({
        "cat": rng.choice(["a", "b", "c"], 200),
        "x": rng.randn(200),
        "ts": pd.date_range("2024-01-01", periods=200, freq="30s"),
        "rid": np.arange(200, dtype="int64"),
    })
    p = str(tmp_path / "in")
    spark.createDataFrame(pdf).write.parquet(p)
    return p, pdf


def test_fitted_workflow_transforms_a_stream(spark, stream_dir, tmp_path):
    path, pdf = stream_dir
    static = spark.read.parquet(path)
    # QuantileBin included: a fitted-boundary op must stream like any
    # other pure-expression transform (fit state frozen at fit time)
    wf = nvt.Workflow((["cat"] >> ops.Categorify())
                      + (["x"] >> ops.FillMissing() >> ops.Normalize())
                      + (["x"] >> ops.QuantileBin(n_bins=3)
                         >> ops.Rename(postfix="_qb"))
                      + ["rid"])
    wf.fit(static)
    expected = wf.transform(static).orderBy("rid").toPandas()

    stream = spark.readStream.schema(static.schema).parquet(path)
    out = transform_stream(wf, stream)
    assert out.isStreaming
    q = (out.writeStream.format("memory").queryName("wf_stream")
         .trigger(availableNow=True).start())
    q.awaitTermination(120)
    got = spark.sql("select * from wf_stream").orderBy("rid").toPandas()
    pd.testing.assert_frame_equal(
        got.reset_index(drop=True), expected.reset_index(drop=True))


def test_sessionize_stream_stateful(spark, tmp_path):
    """applyInPandasWithState sessionizer: session ids must match the
    batch Sessionize op on the same data."""
    from nvtabular_spark.streaming import sessionize_stream
    ts = [0, 100, 200, 4000, 4100, 9000, 9050]
    pdf = pd.DataFrame({"user": ["u1"] * 7,
                        "ts": pd.to_datetime(ts, unit="s")})
    pdf2 = pd.DataFrame({"user": ["u2"] * 3,
                         "ts": pd.to_datetime([0, 5000, 5100], unit="s")})
    alldf = pd.concat([pdf, pdf2])
    p = str(tmp_path / "sess_in")
    spark.createDataFrame(alldf).write.parquet(p)
    static = spark.read.parquet(p)

    stream = spark.readStream.schema(static.schema).parquet(p)
    out = sessionize_stream(stream, "ts", "user", gap_seconds=1800.0)
    q = (out.writeStream.format("memory").queryName("sess_stream")
         .outputMode("append").trigger(availableNow=True).start())
    q.awaitTermination(120)
    got = spark.sql("select * from sess_stream").toPandas()
    # u1: sessions {0,100,200}, {4000,4100}, {9000,9050}; u2: {0},{5000,5100}
    u1 = got[got["user"] == "u1"].sort_values("session_id")
    assert u1["events"].tolist() == [3, 2, 2]
    u2 = got[got["user"] == "u2"].sort_values("session_id")
    assert u2["events"].tolist() == [1, 2]


def test_windowed_agg_stream(spark, stream_dir):
    path, pdf = stream_dir
    static = spark.read.parquet(path)
    stream = spark.readStream.schema(static.schema).parquet(path)
    agg = windowed_agg_stream(stream, "ts", ["cat"], window="10 minutes",
                              watermark="1 hour",
                              aggs=[F.count(F.lit(1)).alias("rows"),
                                    F.sum("x").alias("x_sum")])
    # complete mode: emit every window (append would hold back windows
    # the watermark has not passed yet — correct late-data behavior)
    q = (agg.writeStream.format("memory").queryName("win_stream")
         .outputMode("complete").trigger(availableNow=True).start())
    q.awaitTermination(120)
    got = spark.sql("select * from win_stream").toPandas()
    # batch oracle: same windows computed statically
    exp = (static.groupBy(F.window("ts", "10 minutes").alias("window"), "cat")
           .agg(F.count(F.lit(1)).alias("rows"), F.sum("x").alias("x_sum"))
           .toPandas())
    assert got["rows"].sum() == 200
    assert len(got) == len(exp)


def test_asof_join_stream_matches_batch_op(spark, tmp_path):
    """Streaming as-of join (applyInPandasWithState) must agree with the
    batch AsOfJoin op on in-order per-entity data (strict t' < t)."""
    from nvtabular_spark.streaming import asof_join_stream

    trades = pd.DataFrame({
        "ent": ["e1"] * 4 + ["e2"] * 3,
        "ts": pd.to_datetime([10, 20, 30, 40, 5, 25, 45], unit="s"),
        "tid": np.arange(7, dtype="int64"),
        "px": [1.0] * 7,
    })
    quotes = pd.DataFrame({
        "ent": ["e1"] * 3 + ["e2"] * 2,
        "ts": pd.to_datetime([5, 20, 35, 10, 25], unit="s"),
        "quote": [100.0, 101.0, 102.0, 200.0, 201.0],
    })
    lp, rp = str(tmp_path / "l"), str(tmp_path / "r")
    ldf = spark.createDataFrame(trades)
    rdf = spark.createDataFrame(quotes)
    ldf.write.parquet(lp)
    rdf.write.parquet(rp)

    ls = spark.readStream.schema(ldf.schema).parquet(lp)
    rs = spark.readStream.schema(rdf.schema).parquet(rp)
    out = asof_join_stream(ls, rs, on="ent", ts_col="ts",
                           value_col="quote", left_id_col="tid",
                           allow_exact_matches=False)
    q = (out.writeStream.format("memory").queryName("asof_stream")
         .trigger(availableNow=True).start())
    q.awaitTermination(120)
    got = spark.sql("select tid, quote_asof from asof_stream") \
        .orderBy("tid").toPandas()

    batch = nvt.Workflow(
        ["tid", "px"] >> ops.AsOfJoin(rdf, on="ent", ts_col="ts",
                                      allow_exact_matches=False,
                                      suffix="_asof")) \
        .transform(ldf).orderBy("tid").toPandas()
    np.testing.assert_allclose(
        got["quote_asof"].to_numpy(dtype="float64"),
        batch["quote_asof"].to_numpy(dtype="float64"), equal_nan=True)


def test_lag_rolling_stream_matches_batch_ops(spark, tmp_path):
    """Streaming lag/rolling (applyInPandasWithState) must equal the
    batch Lag + RollingAgg ops on in-order per-entity data."""
    from nvtabular_spark.streaming import lag_rolling_stream
    rng = np.random.RandomState(9)
    pdf = pd.DataFrame({
        "ent": ["a"] * 30 + ["b"] * 20,
        "ts": pd.to_datetime(
            np.concatenate([np.arange(30), np.arange(20)]) * 60, unit="s"),
        "v": rng.rand(50),
    })
    p = str(tmp_path / "lr_in")
    sdf = spark.createDataFrame(pdf)
    sdf.write.parquet(p)

    stream = spark.readStream.schema(sdf.schema).parquet(p)
    out = lag_rolling_stream(stream, key="ent", ts_col="ts", value_col="v",
                             lags=(1, 2), window_rows=4)
    q = (out.writeStream.format("memory").queryName("lr_stream")
         .trigger(availableNow=True).start())
    q.awaitTermination(120)
    got = spark.sql("select * from lr_stream").orderBy("ent", "ts").toPandas()

    batch = nvt.Workflow(
        (["v"] >> ops.Lag("ent", "ts", [1, 2]))
        + (["v"] >> ops.RollingAgg("ent", "ts", window_rows=4,
                                   aggs=["mean", "count"]))
        + ["ent", "ts"]).transform(sdf).orderBy("ent", "ts").toPandas()
    for sc, bc in [("v_lag_1", "v_lag_1"), ("v_lag_2", "v_lag_2"),
                   ("v_rolling_mean_4", "v_rolling_mean_4"),
                   ("v_rolling_count_4", "v_rolling_count_4")]:
        np.testing.assert_allclose(
            got[sc].to_numpy(dtype="float64"),
            batch[bc].to_numpy(dtype="float64"),
            equal_nan=True, err_msg=sc)


def test_asof_join_stream_ignores_null_right_values(spark, tmp_path):
    """A NULL/NaN right value must NOT clobber the last valid state —
    batch AsOfJoin uses last(..., ignorenulls=True); the stream op must
    agree."""
    from nvtabular_spark.streaming import asof_join_stream

    trades = pd.DataFrame({
        "ent": ["e1"] * 3,
        "ts": pd.to_datetime([15, 25, 35], unit="s"),
        "tid": np.arange(3, dtype="int64"),
    })
    # true NULL at t=20 (a pandas NaN would reach Spark as NaN, which
    # both the batch op and the stream treat as missing anyway)
    rdf = spark.createDataFrame(
        [("e1", 10, 100.0), ("e1", 20, None), ("e1", 30, 102.0)],
        "ent string, sec long, quote double") \
        .selectExpr("ent", "timestamp_seconds(sec) AS ts", "quote")
    lp, rp = str(tmp_path / "ln"), str(tmp_path / "rn")
    ldf = spark.createDataFrame(trades)
    ldf.write.parquet(lp)
    rdf.write.parquet(rp)
    ls = spark.readStream.schema(ldf.schema).parquet(lp)
    rs = spark.readStream.schema(rdf.schema).parquet(rp)
    out = asof_join_stream(ls, rs, on="ent", ts_col="ts",
                           value_col="quote", left_id_col="tid",
                           allow_exact_matches=False)
    q = (out.writeStream.format("memory").queryName("asof_null_stream")
         .trigger(availableNow=True).start())
    q.awaitTermination(120)
    got = spark.sql("select tid, quote_asof from asof_null_stream") \
        .orderBy("tid").toPandas()
    # t=25 sees the NaN quote at t=20 but must keep 100.0 (t=10)
    assert got["quote_asof"].tolist() == [100.0, 100.0, 102.0]

    batch = nvt.Workflow(
        ["tid"] >> ops.AsOfJoin(rdf, on="ent", ts_col="ts",
                                allow_exact_matches=False,
                                suffix="_asof")) \
        .transform(ldf).orderBy("tid").toPandas()
    np.testing.assert_allclose(got["quote_asof"].to_numpy(),
                               batch["quote_asof"].to_numpy())


def test_lag_rolling_stream_validates_lags(spark):
    from nvtabular_spark.streaming import lag_rolling_stream
    sdf = spark.readStream.format("rate").load()
    with pytest.raises(ValueError, match="non-empty"):
        lag_rolling_stream(sdf, key="value", ts_col="timestamp",
                           value_col="value", lags=())
    with pytest.raises(ValueError, match="positive"):
        lag_rolling_stream(sdf, key="value", ts_col="timestamp",
                           value_col="value", lags=(0, 1))


def test_streaming_all_exports():
    import nvtabular_spark.streaming as st
    for name in ("asof_join_stream", "lag_rolling_stream",
                 "sessionize_stream", "transform_stream",
                 "windowed_agg_stream"):
        assert name in st.__all__ and hasattr(st, name)


def test_drop_exact_duplicates_stream(spark, tmp_path):
    """Streaming exact dedup keeps ONE row per normalized fingerprint
    (first-arrived, vs batch's min-id — documented divergence)."""
    from nvtabular_spark.streaming import drop_exact_duplicates_stream
    pdf = pd.DataFrame({
        "doc_id": list(range(6)),
        "ts": pd.to_datetime([10, 20, 30, 40, 50, 60], unit="s"),
        "text": [
            "the quick brown fox",
            "the quick brown fox",       # exact dup
            "The quick brown fox!",      # normalized dup
            "something else entirely",
            "SOMETHING ELSE entirely",   # normalized dup
            "unique third document",
        ],
    })
    p = str(tmp_path / "dd_in")
    sdf = spark.createDataFrame(pdf)
    sdf.write.parquet(p)
    stream = spark.readStream.schema(sdf.schema).parquet(p)
    out = drop_exact_duplicates_stream(stream, text_col="text",
                                       ts_col="ts", watermark="1 hour")
    q = (out.writeStream.format("memory").queryName("dd_stream")
         .trigger(availableNow=True).start())
    q.awaitTermination(120)
    got = spark.sql("select * from dd_stream").toPandas()
    assert len(got) == 3
    # batch op agrees on the SET of surviving fingerprints
    from nvtabular_spark.functions import dedup as d
    batch = d.drop_exact_duplicates(sdf).toPandas()
    from nvtabular_spark.functions.text import fingerprint
    fp = lambda df: set(
        spark.createDataFrame(df[["text"]]).select(
            fingerprint(F.col("text")).alias("f")).toPandas()["f"])
    assert fp(got) == fp(batch)


def test_pii_scrub_and_repetition_on_stream(spark, tmp_path):
    """The stateless text ops (PII scrub, quality/token expressions)
    apply unchanged to a Structured Stream — pure Column expressions
    need no state and must equal the batch result."""
    from nvtabular_spark.functions import text
    pdf = pd.DataFrame({
        "doc_id": [0, 1],
        "text": ["mail a@b.example.com now",
                 "visit https://x.example today"]})
    path = str(tmp_path / "pii_stream")
    spark.createDataFrame(pdf).write.parquet(path)
    static = spark.read.parquet(path)

    def apply(df):
        return df.select("doc_id",
                         text.scrub_pii(F.col("text")).alias("s"),
                         text.token_count(F.col("text")).alias("n"))

    stream = spark.readStream.schema(static.schema).parquet(path)
    q = (apply(stream).writeStream.format("memory")
         .queryName("pii_stream").trigger(availableNow=True).start())
    q.awaitTermination(60)
    got = spark.sql("select * from pii_stream").orderBy("doc_id").toPandas()
    exp = apply(static).orderBy("doc_id").toPandas()
    pd.testing.assert_frame_equal(got, exp)
    assert got["s"].tolist() == ["mail <EMAIL> now", "visit <URL> today"]


def test_stream_restart_recovers_exactly_once(spark, tmp_path):
    """Checkpoint recovery: stop a fitted-workflow stream query, land
    MORE input, restart with the SAME checkpointLocation — the file
    sink must contain every input row exactly once (no reprocessing of
    batch-1 files, no gaps). This is the property a production restart
    relies on; availableNow + parquet source/sink are both
    replayable/idempotent so transform_stream must compose with it."""
    in_dir = str(tmp_path / "in")
    out_dir = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")

    def land(lo, hi):
        pdf = pd.DataFrame({
            "cat": ["a", "b"] * ((hi - lo) // 2),
            "x": np.arange(lo, hi, dtype="float64"),
            "rid": np.arange(lo, hi, dtype="int64"),
        })
        spark.createDataFrame(pdf).coalesce(1) \
            .write.mode("append").parquet(in_dir)

    land(0, 100)
    static = spark.read.parquet(in_dir)
    wf = nvt.Workflow((["cat"] >> ops.Categorify())
                      + (["x"] >> ops.FillMissing() >> ops.Normalize())
                      + ["rid"])
    wf.fit(static)

    def run_once():
        stream = spark.readStream.schema(static.schema).parquet(in_dir)
        q = (transform_stream(wf, stream)
             .writeStream.format("parquet").option("path", out_dir)
             .option("checkpointLocation", ckpt)
             .trigger(availableNow=True).start())
        q.awaitTermination(120)

    run_once()                      # processes rows 0..99
    land(100, 160)                  # more data lands while "down"
    run_once()                      # restart from the same checkpoint

    got = spark.read.parquet(out_dir).select("rid").toPandas()["rid"]
    assert sorted(got.tolist()) == list(range(160))   # exactly once
    assert got.nunique() == 160


def test_sessionize_stream_state_survives_restart(spark, tmp_path):
    """applyInPandasWithState checkpoint recovery: the per-key
    (last_ts, session_id) state must survive a query restart — an
    event landed AFTER the restart that exceeds the gap from the last
    PRE-restart event must open session 1, not restart numbering at
    0 (which is what a lost state would produce)."""
    from nvtabular_spark.streaming import sessionize_stream
    in_dir = str(tmp_path / "in")
    ckpt = str(tmp_path / "ckpt")

    def land(ts_list):
        pdf = pd.DataFrame({"user": ["u1"] * len(ts_list),
                            "ts": pd.to_datetime(ts_list, unit="s")})
        spark.createDataFrame(pdf).coalesce(1) \
            .write.mode("append").parquet(in_dir)

    land([0, 100])
    schema = spark.read.parquet(in_dir).schema
    out_dir = str(tmp_path / "sess_out")

    def run_once():
        # file sink: the one that supports checkpoint recovery
        # (memory sink refuses to restart from a checkpoint)
        stream = spark.readStream.schema(schema).parquet(in_dir)
        out = sessionize_stream(stream, "ts", "user", gap_seconds=1800.0)
        q = (out.writeStream.format("parquet").option("path", out_dir)
             .outputMode("append")
             .option("checkpointLocation", ckpt)
             .trigger(availableNow=True).start())
        q.awaitTermination(120)

    run_once()                      # session 0: events {0, 100}
    land([5000])                    # gap 4900s > 1800 -> NEW session...
    run_once()                      # ...but only if last_ts survived

    allr = spark.read.parquet(out_dir).toPandas()
    per_session = allr.groupby("session_id")["events"].sum()
    assert per_session.to_dict() == {0: 2, 1: 1}, per_session.to_dict()


def test_lag_rolling_stream_state_across_batches(spark, tmp_path):
    """Force MULTIPLE micro-batches in one run (maxFilesPerTrigger=1):
    the per-entity state path (GroupState.get — a property, not a
    method) must carry the rolling buffer across batches, matching the
    batch ops on the full data."""
    from nvtabular_spark.streaming import lag_rolling_stream
    in_dir = str(tmp_path / "in")
    rng = np.random.RandomState(3)

    def land(lo, hi):
        pdf = pd.DataFrame({
            "ent": ["a"] * (hi - lo),
            "ts": pd.to_datetime(np.arange(lo, hi) * 60, unit="s"),
            "v": rng.rand(hi - lo)})
        spark.createDataFrame(pdf).coalesce(1) \
            .write.mode("append").parquet(in_dir)

    land(0, 10)
    land(10, 20)          # second FILE -> second micro-batch
    sdf = spark.read.parquet(in_dir)

    stream = (spark.readStream.schema(sdf.schema)
              .option("maxFilesPerTrigger", 1).parquet(in_dir))
    out = lag_rolling_stream(stream, key="ent", ts_col="ts",
                             value_col="v", lags=(1,), window_rows=4)
    q = (out.writeStream.format("memory").queryName("lr_mb")
         .trigger(availableNow=True).start())
    q.awaitTermination(120)
    got = spark.sql("select * from lr_mb").orderBy("ts").toPandas()
    assert len(got) == 20

    batch = nvt.Workflow(
        (["v"] >> ops.Lag("ent", "ts", [1]))
        + (["v"] >> ops.RollingAgg("ent", "ts", window_rows=4,
                                   aggs=["mean"]))
        + ["ent", "ts"]).transform(sdf).orderBy("ts").toPandas()
    np.testing.assert_allclose(
        got["v_lag_1"].to_numpy("float64"),
        batch["v_lag_1"].to_numpy("float64"), equal_nan=True)
    np.testing.assert_allclose(
        got["v_rolling_mean_4"].to_numpy("float64"),
        batch["v_rolling_mean_4"].to_numpy("float64"), equal_nan=True)


def test_asof_stream_state_survives_restart(spark, tmp_path):
    """The as-of stream's (last_ts, last_val) state must survive a
    checkpoint restart: a trade landed AFTER the restart, with NO new
    quotes, must still join against the last pre-restart quote."""
    from nvtabular_spark.streaming import asof_join_stream
    lp, rp = str(tmp_path / "l"), str(tmp_path / "r")
    out_dir, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")

    def land(path, pdf):
        spark.createDataFrame(pdf).coalesce(1) \
            .write.mode("append").parquet(path)

    land(rp, pd.DataFrame({"ent": ["e1"],
                           "ts": pd.to_datetime([5], unit="s"),
                           "quote": [100.0]}))
    land(lp, pd.DataFrame({"ent": ["e1"],
                           "ts": pd.to_datetime([10], unit="s"),
                           "tid": np.array([0], dtype="int64"),
                           "px": [1.0]}))
    lschema = spark.read.parquet(lp).schema
    rschema = spark.read.parquet(rp).schema

    def run_once():
        ls = spark.readStream.schema(lschema).parquet(lp)
        rs = spark.readStream.schema(rschema).parquet(rp)
        out = asof_join_stream(ls, rs, on="ent", ts_col="ts",
                               value_col="quote", left_id_col="tid",
                               allow_exact_matches=False)
        q = (out.writeStream.format("parquet").option("path", out_dir)
             .option("checkpointLocation", ckpt)
             .trigger(availableNow=True).start())
        q.awaitTermination(120)

    run_once()                       # trade 0 joins quote 100.0
    # a later trade lands while "down"; NO new quote — the answer must
    # come from recovered state
    land(lp, pd.DataFrame({"ent": ["e1"],
                           "ts": pd.to_datetime([20], unit="s"),
                           "tid": np.array([1], dtype="int64"),
                           "px": [1.0]}))
    run_once()

    got = spark.read.parquet(out_dir).orderBy("tid").toPandas()
    assert got["tid"].tolist() == [0, 1]
    assert got["quote_asof"].tolist() == [100.0, 100.0]


def test_expanding_te_stream_matches_batch_op(spark, tmp_path):
    """Streaming expanding target encoding (O(1) count/sum state per
    entity) must equal the batch ExpandingTargetEncoding on in-order
    per-entity data with timestamps >= 1s apart."""
    from nvtabular_spark.streaming import expanding_te_stream
    rng = np.random.RandomState(13)
    pdf = pd.DataFrame({
        "ent": ["a"] * 25 + ["b"] * 15,
        "ts": pd.to_datetime(
            np.concatenate([np.arange(25), np.arange(15)]) * 60, unit="s"),
        "y": rng.rand(40) * 10,
    })
    # plant a NaN target: emitted, never enters the running state
    pdf.loc[5, "y"] = np.nan
    sdf = spark.createDataFrame(pdf)
    p = str(tmp_path / "ete_in")
    sdf.write.parquet(p)

    ete = ops.ExpandingTargetEncoding(target="y", order_by="ts",
                                      p_smooth=7.0)
    wf = nvt.Workflow((["ent"] >> ete) + ["ts"])
    wf.fit(sdf)
    prior = ete.means["y"]
    np.testing.assert_allclose(prior, pdf["y"].mean())  # skipna both sides

    stream = spark.readStream.schema(sdf.schema).parquet(p)
    out = expanding_te_stream(stream, key="ent", ts_col="ts",
                              target_col="y", prior=prior, p_smooth=7.0)
    q = (out.writeStream.format("memory").queryName("ete_stream")
         .trigger(availableNow=True).start())
    q.awaitTermination(120)
    got = spark.sql("select * from ete_stream") \
        .orderBy("ent", "ts").toPandas()
    batch = wf.transform(sdf).orderBy("ent", "ts").toPandas()
    np.testing.assert_allclose(
        got["ete"].to_numpy(dtype="float64"),
        batch["ETE_ent_y"].to_numpy(dtype="float64"),
        rtol=1e-12, equal_nan=True)


def test_psi_stream_matches_batch_per_window(spark, tmp_path):
    """Each streamed window's (psi, js) must equal the batch drift.psi
    rollup computed on exactly that window's rows against the same
    static reference (same edges, clamping, Laplace smoothing)."""
    from nvtabular_spark.functions import drift
    from nvtabular_spark.streaming import psi_stream
    rng = np.random.RandomState(17)
    ref_pdf = pd.DataFrame({"v": rng.normal(0, 1, 400)})
    ref = spark.createDataFrame(ref_pdf)
    # two 10-minute windows with different distributions + a NULL/NaN
    cur_pdf = pd.DataFrame({
        "ts": pd.to_datetime(
            np.concatenate([np.arange(0, 300, 2),
                            np.arange(600, 900, 2)]), unit="s"),
        "v": np.concatenate([rng.normal(0, 1, 150),
                             rng.normal(1.5, 2.0, 150)]),
    })
    cur_pdf.loc[5, "v"] = np.nan
    sdf = spark.createDataFrame(cur_pdf)
    p = str(tmp_path / "psi_in")
    sdf.write.parquet(p)

    stream = spark.readStream.schema(sdf.schema).parquet(p)
    out = psi_stream(stream, ref, "v", ts_col="ts",
                     window="10 minutes", bins=8, alpha=0.5)
    # complete mode: append would hold every window until the
    # watermark passes its END, which never happens for the last
    # window of a finite replay — production monitors run append with
    # a real watermark, tests need the windows now
    q = (out.writeStream.format("memory").queryName("psi_stream")
         .outputMode("complete")
         .trigger(availableNow=True).start())
    q.awaitTermination(120)
    got = spark.sql("select * from psi_stream") \
        .orderBy("window").toPandas()
    assert len(got) == 2

    for i, lo_s in enumerate([0, 600]):
        mask = (cur_pdf["ts"] >= pd.Timestamp(lo_s, unit="s")) & \
               (cur_pdf["ts"] < pd.Timestamp(lo_s + 600, unit="s"))
        window_df = spark.createDataFrame(cur_pdf[mask])
        want = drift.drift_summary(ref, window_df, "v",
                                   bins=8, alpha=0.5).collect()[0]
        np.testing.assert_allclose(got["psi"].iloc[i],
                                   float(want["psi"]), rtol=1e-9)
        np.testing.assert_allclose(got["js_divergence"].iloc[i],
                                   float(want["js_divergence"]),
                                   rtol=1e-9)
        assert got["n_cur"].iloc[i] == int(want["n_cur"])
    # the second (shifted) window must read as drifted vs the first
    assert got["psi"].iloc[1] > got["psi"].iloc[0]
