"""Driver contract for the spark-graft builder (PySpark target).

Each ``queries()`` entry exercises one operator family from SURVEY.md §2
through the real engine (``nvtabular_spark``); ``oracle_sql()`` holds
the DuckDB-runnable ANSI-SQL twin. Column names and dtypes are aligned
on both sides; row-level float outputs are rounded identically so the
order-insensitive value-hash comparison is stable across engines.

Hash-based ops use the engine's SQL-portable md5 hash family
(functions/hashing.py) so DuckDB reproduces bucket ids bit-for-bit.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

import nvtabular_spark as nvt
from nvtabular_spark import ops
from nvtabular_spark.functions import ann, dedup, text
from nvtabular_spark.functions.hashing import hash64, md5_hash64_sql


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))


def _t_wide(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Loader for CPU-bound per-row hashing queries: testdata tables
    are single-row-group parquet (one scan task), so raise the
    parallelism floor before the expensive expressions; no-op on
    multi-split inputs."""
    from nvtabular_spark.functions.planning import ensure_min_parallelism
    return ensure_min_parallelism(_t(spark, sf_dir, name))


# ---------------------------------------------------------------------------
# flagship
# ---------------------------------------------------------------------------

def entry(spark: SparkSession) -> DataFrame:
    """Flagship: tokenized-sequence preprocessing (Criteo-style fit+
    transform) over sf0.001 — synthesize tokens from documents.text,
    Categorify the categorical columns, fill+log the continuous one,
    slice/pad token arrays, fingerprint the text."""
    sf_dir = "/root/testdata/sf0.001"
    docs = _t(spark, sf_dir, "documents")
    tokens = F.transform(
        text.words(F.col("text")),
        lambda w: F.pmod(hash64(w, "md5"), F.lit(50000)).cast("int"))
    base = docs.select(
        "doc_id", "lang", "source",
        F.col("n_chars").cast("double").alias("n_chars"),
        tokens.alias("tokens"),
        text.fingerprint(F.col("text")).alias("fp"),
    )
    pipeline = (
        (["lang", "source"] >> ops.Categorify())
        + (["n_chars"] >> ops.FillMissing(0) >> ops.LogOp(out_dtype="double"))
        + (["tokens"] >> ops.ListSlice(0, 16, pad=True, pad_value=0))
        + ["doc_id", "fp"]
    )
    wf = nvt.Workflow(pipeline)
    return wf.fit_transform(base)


# ---------------------------------------------------------------------------
# queries — one per operator family
# ---------------------------------------------------------------------------

def q_groupby_agg(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") <= F.lit("1998-09-01"))
    g = ops.Groupby(groupby_cols=["l_returnflag", "l_linestatus"],
                    aggs={"l_quantity": ["sum", "count"],
                          "l_extendedprice": ["sum", "mean"],
                          "l_discount": ["min", "max"]})
    out = nvt.Workflow(
        ["l_quantity", "l_extendedprice", "l_discount"] >> g).transform(li)
    return out.select(
        "l_returnflag", "l_linestatus", "l_quantity_sum", "l_quantity_count",
        F.round("l_extendedprice_sum", 4).alias("l_extendedprice_sum"),
        F.round("l_extendedprice_mean", 4).alias("l_extendedprice_mean"),
        "l_discount_min", "l_discount_max")


def q_groupby_first_last(spark, sf_dir):
    ev = _t(spark, sf_dir, "events")
    g = ops.Groupby(groupby_cols=["user_id"], sort_cols=["ts"],
                    aggs={"value": ["first", "last", "count"]})
    return nvt.Workflow(["value"] >> g).transform(ev)


def q_groupby_stats(spark, sf_dir):
    ev = _t(spark, sf_dir, "events")
    g = ops.Groupby(groupby_cols=["user_id"],
                    aggs={"value": ["median", "nunique", "std", "var"]})
    out = nvt.Workflow(["value"] >> g).transform(ev)
    return out.select(
        "user_id", "value_median", "value_nunique",
        F.round("value_std", 4).alias("value_std"),
        F.round("value_var", 4).alias("value_var"))


def q_groupby_list(spark, sf_dir):
    """Ordered list aggregation (Groupby aggs='list'): the per-key
    value sequence sorted inside the aggregation buffer. Output arrays
    are stringified (micro-unit floor) for the driver's pandas-based
    canonicalizer; ties on ts break by value on BOTH engines."""
    ev = _t(spark, sf_dir, "events")
    g = ops.Groupby(groupby_cols=["user_id"], sort_cols=["ts", "value"],
                    aggs={"value": ["list"]})
    out = nvt.Workflow(["value"] >> g).transform(ev)
    return out.select(
        "user_id", _arr_str_float(F.col("value_list")).alias("value_list"))


def q_groupby_events(spark, sf_dir):
    """Consolidated events groupby: ordered first/last, count, median,
    nunique, std/var AND ordered list in ONE Groupby op — the fused
    multi-agg path (single shuffle for all eight aggregates). Merges
    the former groupby_first_last / groupby_stats / groupby_list
    driver rows so all registry keys fit the driver's record window.
    Ties on ts break by value on BOTH engines."""
    ev = _t(spark, sf_dir, "events")
    g = ops.Groupby(groupby_cols=["user_id"], sort_cols=["ts", "value"],
                    aggs={"value": ["first", "last", "count", "median",
                                    "nunique", "std", "var", "list"]})
    out = nvt.Workflow(["value"] >> g).transform(ev)
    return out.select(
        "user_id", "value_first", "value_last", "value_count",
        "value_median", "value_nunique",
        F.round("value_std", 4).alias("value_std"),
        F.round("value_var", 4).alias("value_var"),
        _arr_str_float(F.col("value_list")).alias("value_list"))


def q_value_count(spark, sf_dir):
    """ValueCount list-length stats over the embeddings array column."""
    emb = _t(spark, sf_dir, "embeddings")
    vc = ops.ValueCount()
    wf = nvt.Workflow(["embedding"] >> vc)
    wf.fit(emb)
    c = vc.counts["embedding"]
    return spark.createDataFrame(
        [(int(c["min"]), int(c["max"]))], "len_min int, len_max int")


def q_drop_low_cardinality(spark, sf_dir):
    """DropLowCardinality: columns whose distinct count is below the
    threshold are removed. c_mktsegment has 5 distinct values (kept at
    threshold 3), a constant column is dropped."""
    cust = _t(spark, sf_dir, "customer").withColumn(
        "const_col", F.lit("same"))
    wf = nvt.Workflow(
        (["c_mktsegment", "const_col"] >> ops.DropLowCardinality(3))
        + ["c_custkey"])
    return wf.fit_transform(cust)


def q_data_stats(spark, sf_dir):
    """DataStats fit over a continuous column → one stats row."""
    ev = _t(spark, sf_dir, "events")
    ds = ops.DataStats()
    wf = nvt.Workflow(["value"] >> ds)
    wf.fit(ev)
    s = ds.stats["value"]
    return spark.createDataFrame(
        [(round(float(s["min"]), 6), round(float(s["max"]), 6),
          round(float(s["mean"]), 6), round(float(s["std"]), 6),
          round(float(s["null_frac"]), 9))],
        "v_min double, v_max double, v_mean double, v_std double, "
        "null_frac double")


def q_join_external(spark, sf_dir):
    orders = _t(spark, sf_dir, "orders")
    cust = _t(spark, sf_dir, "customer").select(
        "c_custkey", "c_mktsegment", "c_nationkey")
    j = ops.JoinExternal(cust, on="o_custkey", on_ext="c_custkey", how="left")
    out = nvt.Workflow(["o_orderkey", "o_totalprice"] >> j).transform(orders)
    return out.select("o_orderkey",
                      F.round("o_totalprice", 4).alias("o_totalprice"),
                      "c_mktsegment", "c_nationkey")


def q_join_groupby(spark, sf_dir):
    orders = _t(spark, sf_dir, "orders")
    jg = ops.JoinGroupby(cont_cols=["o_totalprice"],
                         stats=["count", "sum", "mean"])
    out = nvt.Workflow((["o_orderpriority"] >> jg) + ["o_orderkey"]) \
        .fit_transform(orders)
    return out.select(
        "o_orderkey", "o_orderpriority", "o_orderpriority_count",
        F.round("o_orderpriority_o_totalprice_sum", 2)
        .alias("o_orderpriority_o_totalprice_sum"),
        F.round("o_orderpriority_o_totalprice_mean", 2)
        .alias("o_orderpriority_o_totalprice_mean"))


def q_categorify(spark, sf_dir):
    cust = _t(spark, sf_dir, "customer")
    wf = nvt.Workflow((["c_mktsegment"] >> ops.Categorify()) + ["c_custkey"])
    return wf.fit_transform(cust)


def q_categorify_freq_oov(spark, sf_dir):
    orders = _t(spark, sf_dir, "orders")
    cat = ops.Categorify(freq_threshold=3, num_buckets=10, hash_family="md5")
    wf = nvt.Workflow((["o_custkey"] >> cat) + ["o_orderkey"])
    return wf.fit_transform(orders)


def q_categorify_combo(spark, sf_dir):
    orders = _t(spark, sf_dir, "orders")
    cat = ops.Categorify(encode_type="combo")
    wf = nvt.Workflow(
        ([["o_orderpriority", "o_orderstatus"]] >> cat) + ["o_orderkey"])
    return wf.fit_transform(orders)


def q_categorify_multi(spark, sf_dir):
    """Consolidated Categorify: plain frequency-ranked encode, the
    freq-threshold + OOV-hash-bucket variant, and a joint ("combo")
    encode — three independent Categorify instances in ONE Workflow
    over orders, all keyed on o_orderkey. Merges the former
    categorify / categorify_freq_oov / categorify_combo driver rows
    so all registry keys fit the driver's record window."""
    orders = _t(spark, sf_dir, "orders")
    plain = ["o_orderpriority"] >> ops.Categorify()
    freq = ["o_custkey"] >> ops.Categorify(
        freq_threshold=3, num_buckets=10, hash_family="md5")
    combo = [["o_orderpriority", "o_orderstatus"]] >> ops.Categorify(
        encode_type="combo")
    wf = nvt.Workflow(plain + freq + combo + ["o_orderkey"])
    return wf.fit_transform(orders)


def q_target_encoding(spark, sf_dir):
    orders = _t(spark, sf_dir, "orders").withColumn(
        "fold", (F.col("o_orderkey") % 3).cast("int"))
    te = ops.TargetEncoding(target="o_totalprice", fold_col="fold",
                            fold_is_precomputed=True, kfold=3, p_smooth=20)
    wf = nvt.Workflow((["o_orderpriority"] >> te) + ["o_orderkey"])
    out = wf.fit_transform(orders)
    return out.select("o_orderkey", "o_orderpriority",
                      F.round("TE_o_orderpriority_o_totalprice", 2)
                      .alias("TE_o_orderpriority_o_totalprice"))


def q_normalize(spark, sf_dir):
    cust = _t(spark, sf_dir, "customer")
    wf = nvt.Workflow((["c_acctbal"] >> ops.Normalize()) + ["c_custkey"])
    out = wf.fit_transform(cust)
    return out.select("c_custkey",
                      (F.round("c_acctbal", 4) + F.lit(0.0))
                      .alias("c_acctbal_z"))


def q_normalize_minmax(spark, sf_dir):
    cust = _t(spark, sf_dir, "customer")
    wf = nvt.Workflow((["c_acctbal"] >> ops.NormalizeMinMax()) + ["c_custkey"])
    out = wf.fit_transform(cust)
    return out.select("c_custkey", F.col("c_acctbal").alias("c_acctbal_mm"))


def q_normalize_both(spark, sf_dir):
    """Consolidated continuous-normalization row: z-score Normalize AND
    NormalizeMinMax as two branches of ONE Workflow over the same
    column, disambiguated with Rename — exercises the branch-concat +
    rename composition on stat ops. Merges the former normalize /
    normalize_minmax driver rows."""
    cust = _t(spark, sf_dir, "customer")
    z = ["c_acctbal"] >> ops.Normalize() >> ops.Rename(postfix="_z")
    mm = ["c_acctbal"] >> ops.NormalizeMinMax() >> ops.Rename(postfix="_mm")
    out = nvt.Workflow(z + mm + ["c_custkey"]).fit_transform(cust)
    return out.select(
        "c_custkey",
        (F.round("c_acctbal_z", 4) + F.lit(0.0)).alias("c_acctbal_z"),
        F.col("c_acctbal_mm"))


def q_temperature_mix(spark, sf_dir):
    """Temperature-based mixing (p^alpha flattening, the standard
    multilingual/multi-source pre-training mix): per-stratum keep
    fractions (n_min/n_i)^(1-alpha) computed from one tiny
    groupBy-count, applied as the row-local md5 predicate. Strata on
    ``lang`` — the skewed column in the testdata (en dominates), so
    the flattening actually downsamples."""
    from nvtabular_spark.functions import sampling
    docs = _t(spark, sf_dir, "documents")
    out = sampling.temperature_mix(docs, alpha=0.5, strata_col="lang",
                                   key_col="doc_id", seed=0)
    return out.select("doc_id", "lang")


def q_fill_ops(spark, sf_dir):
    """Consolidated fill row: constant FillMissing (+ indicator) AND
    fitted FillMedian as two branches of ONE Workflow over the same
    NULL-injected column, disambiguated with Rename. Merges the former
    fillmissing / fillmedian driver rows."""
    ev = _t(spark, sf_dir, "events").withColumn(
        "value2", F.when(F.col("value") > 150, F.lit(None))
        .otherwise(F.col("value")))
    cst = ["value2"] >> ops.FillMissing(fill_val=-1, add_binary_cols=True) \
        >> ops.Rename(postfix="_c")
    med = ["value2"] >> ops.FillMedian() >> ops.Rename(postfix="_m")
    wf = nvt.Workflow(cst + med + ["event_id"])
    return wf.fit_transform(ev)


def q_quantile_bin(spark, sf_dir):
    """Fitted equal-frequency binning (QuantileBin): boundaries are the
    exact interior quartiles of events.value; transform digitizes with
    the Bucketize comparison chain. Exact percentile ≡ DuckDB
    quantile_cont (same linear-interpolation definition)."""
    ev = _t(spark, sf_dir, "events")
    wf = nvt.Workflow(
        (["value"] >> ops.QuantileBin(n_bins=4)) + ["event_id"])
    return wf.fit_transform(ev)


def q_fillmissing(spark, sf_dir):
    ev = _t(spark, sf_dir, "events").withColumn(
        "value2", F.when(F.col("value") > 150, F.lit(None))
        .otherwise(F.col("value")))
    wf = nvt.Workflow(
        (["value2"] >> ops.FillMissing(fill_val=-1, add_binary_cols=True))
        + ["event_id"])
    return wf.fit_transform(ev)


def q_fillmedian(spark, sf_dir):
    ev = _t(spark, sf_dir, "events").withColumn(
        "value2", F.when(F.col("value") > 150, F.lit(None))
        .otherwise(F.col("value")))
    wf = nvt.Workflow((["value2"] >> ops.FillMedian()) + ["event_id"])
    return wf.fit_transform(ev)


def q_logop_clip(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem")
    chain = ["l_extendedprice"] >> ops.Clip(min_value=0, max_value=1000) \
        >> ops.LogOp(out_dtype="double")
    out = nvt.Workflow(chain + ["l_orderkey", "l_linenumber"]).transform(li)
    return out.select("l_orderkey", "l_linenumber",
                      F.round("l_extendedprice", 6).alias("price_log"))


def q_bucketize(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem")
    b = ops.Bucketize(boundaries=[1.0, 10.0, 25.0, 40.0])
    out = nvt.Workflow((["l_quantity"] >> b) + ["l_orderkey", "l_linenumber"]) \
        .transform(li)
    return out.select("l_orderkey", "l_linenumber",
                      F.col("l_quantity").alias("qty_bucket"))


def q_hash_bucket(spark, sf_dir):
    cust = _t(spark, sf_dir, "customer")
    hb = ops.HashBucket(num_buckets=50, hash_family="md5")
    out = nvt.Workflow((["c_name"] >> hb) + ["c_custkey"]).transform(cust)
    return out.select("c_custkey", F.col("c_name").alias("name_bucket"))


def q_hashed_cross(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem")
    hc = ops.HashedCross(num_buckets=100, hash_family="md5", combine="xor")
    out = nvt.Workflow(
        (["l_returnflag", "l_linestatus"] >> hc)
        + ["l_orderkey", "l_linenumber"]).transform(li)
    return out.select("l_orderkey", "l_linenumber",
                      F.col("l_returnflag_X_l_linestatus").alias("cross_bucket"))


def q_difference_lag(spark, sf_dir):
    ev = _t(spark, sf_dir, "events")
    dl = ops.DifferenceLag(partition_cols="user_id", shift=[1, -1],
                           order_by="ts")
    out = nvt.Workflow((["value"] >> dl) + ["event_id"]).transform(ev)
    return out.select("event_id", "value_difference_lag_1",
                      "value_difference_lag_-1")


def _arr_str_float(c):
    """Comparison-stable array rendering for the driver's pandas-based
    canonicalizer (cannot sort/hash list cells): micro-unit floor
    encoding, comma-joined. floor(x*1e6) is bit-identical between Spark
    and DuckDB (both widen float32 → double, IEEE multiply, floor)."""
    return F.array_join(
        F.transform(c, lambda x: F.floor(x.cast("double") * F.lit(1e6))
                    .cast("long").cast("string")), ",")


def _arr_str_int(c):
    return F.array_join(F.transform(c, lambda x: x.cast("string")), ",")


def q_list_slice(spark, sf_dir):
    emb = _t(spark, sf_dir, "embeddings")
    sl = (["embedding"] >> ops.ListSlice(1, 4)
          >> ops.Rename(name="emb_slice"))
    pad = (["embedding"] >> ops.ListSlice(0, 80, pad=True, pad_value=0.0)
           >> ops.Rename(name="emb_padded"))
    wf = nvt.Workflow(sl + pad + ["vec_id"])
    out = wf.transform(emb)
    return out.select(
        _arr_str_float(F.col("emb_slice")).alias("emb_slice"),
        _arr_str_float(F.col("emb_padded")).alias("emb_padded"),
        "vec_id")


def q_asof_join(spark, sf_dir):
    ev = _t(spark, sf_dir, "events")
    quotes = (ev.filter(F.col("event_type") == "view")
              .groupBy("user_id", "ts").agg(F.max("value").alias("quote")))
    trades = ev.filter(F.col("event_type") == "purchase")
    asof = ops.AsOfJoin(quotes, on="user_id", ts_col="ts",
                        allow_exact_matches=False, suffix="_asof")
    wf = nvt.Workflow((["event_id", "value"] >> asof))
    out = wf.transform(trades)
    return out.select("event_id", "value", "quote_asof")


def q_lag_lead(spark, sf_dir):
    ev = _t(spark, sf_dir, "events")
    lag = ops.Lag(partition_cols="user_id", order_by="ts", shifts=[1, 2])
    lead = ops.Lead(partition_cols="user_id", order_by="ts", shifts=1)
    wf = nvt.Workflow((["value"] >> lag) + (["value"] >> lead) + ["event_id"])
    return wf.transform(ev)


def q_lag_lead_difference(spark, sf_dir):
    """Consolidated windowed-shift row: Lag/Lead AND DifferenceLag in
    one Workflow over events, keyed on event_id (all three share one
    PARTITION BY user_id ORDER BY ts window spec, so Catalyst plans a
    single sort+window). Merges the former lag_lead / difference_lag
    driver rows so all registry keys fit the driver's record window."""
    ev = _t(spark, sf_dir, "events")
    lag = ops.Lag(partition_cols="user_id", order_by="ts", shifts=[1, 2])
    lead = ops.Lead(partition_cols="user_id", order_by="ts", shifts=1)
    dl = ops.DifferenceLag(partition_cols="user_id", shift=[1, -1],
                           order_by="ts")
    wf = nvt.Workflow((["value"] >> lag) + (["value"] >> lead)
                      + (["value"] >> dl) + ["event_id"])
    return wf.transform(ev)


def q_rolling_backfill(spark, sf_dir):
    ev = _t(spark, sf_dir, "events").withColumn(
        "value3", F.when(F.col("value") < 50, F.lit(None))
        .otherwise(F.col("value")))
    bf = ops.RollingBackfill(partition_cols="user_id", order_by="ts",
                             direction="forward")
    wf = nvt.Workflow((["value3"] >> bf) + ["event_id"])
    out = wf.transform(ev)
    return out.select("event_id", F.col("value3").alias("value_ffill"))


def q_sessionize(spark, sf_dir):
    ev = _t(spark, sf_dir, "events")
    sz = ops.Sessionize(partition_cols="user_id", gap=1800.0)
    wf = nvt.Workflow((["ts"] >> sz) + ["event_id"])
    return wf.transform(ev)


def q_rolling_agg(spark, sf_dir):
    """Both rolling frames in one DAG: the previous-3-rows frame and
    the trailing-hour time-range frame [ts - 3600s, ts - 1s] — same
    single entity×ts window partitioning, zero temporal leakage."""
    ev = _t(spark, sf_dir, "events")
    ra = ops.RollingAgg(partition_cols="user_id", order_by="ts",
                        window_rows=3, aggs=["mean", "count", "nunique"])
    rt = ops.RollingAgg(partition_cols="user_id", order_by="ts",
                        window_seconds=3600,
                        aggs=["mean", "count", "nunique"])
    td = ops.TimeDecay(partition_cols="user_id", order_by="ts",
                       half_life_seconds=1800, window_seconds=3600,
                       aggs=["sum"])
    wf = nvt.Workflow((["value"] >> ra) + (["value"] >> rt)
                      + (["value"] >> td) + ["event_id"])
    out = wf.transform(ev)
    return out.select("event_id",
                      F.round("value_rolling_mean_3", 6)
                      .alias("value_rolling_mean_3"),
                      "value_rolling_count_3",
                      "value_rolling_nunique_3",
                      F.round("value_rolling_mean_t3600s", 6)
                      .alias("value_rolling_mean_t3600s"),
                      "value_rolling_count_t3600s",
                      "value_rolling_nunique_t3600s",
                      F.round("value_decay_sum_h1800s", 6)
                      .alias("value_decay_sum_h1800s"))


def q_expanding_te(spark, sf_dir):
    """Leakage-free time-ordered target encoding: smoothed expanding
    mean of ``value`` over each user's STRICTLY-PAST events (range
    frame over epoch seconds ending 1 s before the row; prior = the
    fitted global mean). The streaming-shaped sibling of the kfold
    TargetEncoding — no feature reads rows at t' >= t."""
    ev = _t(spark, sf_dir, "events")
    ete = ops.ExpandingTargetEncoding(target="value", order_by="ts",
                                      p_smooth=20.0)
    wf = nvt.Workflow((["user_id"] >> ete) + ["event_id"])
    out = wf.fit_transform(ev)
    return out.select("event_id",
                      F.round("ETE_user_id_value", 6).alias("ete_value"))


def q_psi_drift(spark, sf_dir):
    """Snapshot-drift gate: PSI + JS-divergence per-bin table between
    the even-user and odd-user halves of events.value, over 10
    fixed-width bins anchored to the reference half's [min, max]
    (Laplace alpha=0.5). The retraining-gate data-quality check."""
    from nvtabular_spark.functions import drift
    ev = _t(spark, sf_dir, "events")
    ref = ev.where(F.col("user_id") % 2 == 0)
    cur = ev.where(F.col("user_id") % 2 == 1)
    out = drift.psi(ref, cur, "value", bins=10, alpha=0.5)
    return out.select(
        "bin", "n_ref", "n_cur",
        F.round("p_ref", 6).alias("p_ref"),
        F.round("p_cur", 6).alias("p_cur"),
        F.round("psi_contrib", 6).alias("psi_contrib"),
        F.round("js_contrib", 6).alias("js_contrib"))


def q_psi_drift_cat(spark, sf_dir):
    """Categorical drift gate: PSI/JS over the even-user half's top-3
    event types + __other__, vs the odd-user half — the
    vocabulary-shift check (a category that explodes in the current
    snapshot surfaces as __other__ drift)."""
    from nvtabular_spark.functions import drift
    ev = _t(spark, sf_dir, "events")
    ref = ev.where(F.col("user_id") % 2 == 0)
    cur = ev.where(F.col("user_id") % 2 == 1)
    out = drift.psi_categorical(ref, cur, "event_type", top_k=3,
                                alpha=0.5)
    return out.select(
        "category", "n_ref", "n_cur",
        F.round("p_ref", 6).alias("p_ref"),
        F.round("p_cur", 6).alias("p_cur"),
        F.round("psi_contrib", 6).alias("psi_contrib"),
        F.round("js_contrib", 6).alias("js_contrib"))


def q_woe_encoding(spark, sf_dir):
    """Weight-of-Evidence categorical encoding: per event_type, the
    Laplace-smoothed log-odds of the binary high-value target
    (value > 150) relative to the global prior log-odds."""
    ev = _t(spark, sf_dir, "events").withColumn(
        "hi", F.when(F.col("value").isNull(), F.lit(None))
              .otherwise((F.col("value") > 150).cast("double")))
    woe = ops.WoEEncoding(target="hi", alpha=0.5)
    out = nvt.Workflow((["event_type"] >> woe) + ["event_id"]) \
        .fit_transform(ev)
    return out.select("event_id", "event_type",
                      F.round("WOE_event_type_hi", 6).alias("woe"))


def q_mutual_info(spark, sf_dir):
    """Feature-selection association: plug-in mutual information (and
    marginal entropies + sqrt-NMI) between event_type and the binary
    high-value target — contingency groupBy + broadcast-joined
    marginals, raw rows scanned once."""
    from nvtabular_spark.functions import drift
    ev = _t(spark, sf_dir, "events").withColumn(
        "hi", F.when(F.col("value").isNull(), F.lit(None))
              .otherwise((F.col("value") > 150).cast("int")))
    out = drift.mutual_information(ev, "event_type", "hi")
    return out.select(F.round("mi", 6).alias("mi"),
                      F.round("h_x", 6).alias("h_x"),
                      F.round("h_y", 6).alias("h_y"),
                      F.round("nmi", 6).alias("nmi"), "n")


def q_correlation_matrix(spark, sf_dir):
    """Feature-redundancy screen: all-pairs Pearson correlation of
    lineitem's numeric measures from ONE aggregate pass."""
    from nvtabular_spark.functions import drift
    li = _t(spark, sf_dir, "lineitem")
    out = drift.correlation_matrix(
        li, ["l_quantity", "l_extendedprice", "l_discount", "l_tax"])
    return out.select("col_x", "col_y",
                      F.round("corr", 6).alias("corr"))


def q_dedup_exact(spark, sf_dir):
    docs = _t(spark, sf_dir, "documents")
    return dedup.exact_duplicates(docs).select(
        "doc_id", "dup_key", "canonical_id", "is_dup")


def q_drop_exact_dups(spark, sf_dir):
    """Full-row exact dedup: the corpus minus non-canonical duplicate
    rows, every original column carried through (drop_exact_duplicates
    keeps the min-doc_id row of each normalized-text group)."""
    docs = _t(spark, sf_dir, "documents")
    return dedup.drop_exact_duplicates(docs).select(
        "doc_id", "lang", "source", "n_chars")


def q_dedup_exact_full(spark, sf_dir):
    """Consolidated exact-dedup row: exact_duplicates metadata (per-doc
    fingerprint key, canonical id, is_dup flag) with the survivor
    payload columns masked onto canonical rows — semantically the
    drop_exact_duplicates survivor set (which is pytest-gated
    separately) in the same frame, computed with ONE fingerprint pass
    instead of running both helpers over the corpus. Merges the former
    dedup_exact / drop_exact_dups driver rows to free a registry slot
    within the driver's 50-row record window."""
    docs = _t(spark, sf_dir, "documents")
    keyed = dedup.exact_duplicates(docs).select(
        "doc_id", "dup_key", "canonical_id", "is_dup")
    payload = docs.select("doc_id", "lang", "source", "n_chars")
    out = keyed.join(payload, "doc_id")
    keep = ~F.col("is_dup")
    return out.select(
        "doc_id", "dup_key", "canonical_id", "is_dup",
        F.when(keep, F.col("lang")).alias("lang"),
        F.when(keep, F.col("source")).alias("source"),
        F.when(keep, F.col("n_chars")).alias("n_chars"))


def q_pack_sequences_global(spark, sf_dir):
    """Global (cross-shard) two-level greedy packing: hash-sharded
    exact greedy, then one greedy pass over the bin summaries — every
    document lands in one corpus-wide capacity-respecting bin."""
    from nvtabular_spark.functions import packing
    docs = _t(spark, sf_dir, "documents")
    out = packing.pack_sequences_global(
        docs, capacity=5000, order_col="doc_id", tok_col="n_chars",
        id_col="doc_id", shards=4, family="md5")
    return out.select("doc_id", "bin_id", "bin_offset")


def q_verify_distribution(spark, sf_dir):
    """DatasetGen.verify_df parity (KS goodness-of-fit, scipy-free):
    a deterministic uniform column derived from md5(doc_id) is tested
    against the uniform CDF; the DuckDB twin rebuilds the same 100-bin
    ECDF, sup-difference and asymptotic Kolmogorov p-value."""
    from nvtabular_spark.sources.dataset import verify_distribution
    docs = _t(spark, sf_dir, "documents")
    u = (F.pmod(hash64(F.col("doc_id"), "md5"), F.lit(1000000))
         / F.lit(1000000.0))
    stat, p = verify_distribution(docs.select(u.alias("u")), "u",
                                  "uniform", bins=100)
    # 6 digits, not 9: the Kolmogorov series and ECDF sums accumulate in
    # engine-specific order, so a last-ulp difference straddling a 9th-
    # decimal rounding boundary could flip the comparison intermittently
    return spark.createDataFrame(
        [(round(float(stat), 6), round(float(p), 6))],
        "ks_stat double, p_value double")


def q_pack_sequences_prefix(spark, sf_dir):
    """Sequence packing, prefix-sum strategy: one window per shard
    assigns fixed-capacity training bins (documents: shard=lang,
    order=doc_id, weight=n_chars)."""
    from nvtabular_spark.functions import packing
    docs = _t(spark, sf_dir, "documents")
    out = packing.pack_sequences(docs, capacity=5000, shard_col="lang",
                                 order_col="doc_id", tok_col="n_chars")
    return out.select("doc_id", "lang", "bin_id", "bin_offset")


def q_pack_sequences_greedy(spark, sf_dir):
    """Exact capacity-respecting greedy packing (applyInPandas per
    shard); oracle is a DuckDB recursive CTE stepping the same
    first-fit recurrence."""
    from nvtabular_spark.functions import packing
    docs = _t(spark, sf_dir, "documents")
    out = packing.pack_sequences(docs, capacity=5000, shard_col="lang",
                                 order_col="doc_id", tok_col="n_chars",
                                 strategy="greedy")
    return out.select("doc_id", "lang", "bin_id", "bin_offset")


def q_ngram_contamination(spark, sf_dir, family="md5"):
    """Benchmark-contamination signal: docs ending in 0 act as the
    held-out benchmark, the rest as the training corpus."""
    from nvtabular_spark.functions import packing
    docs = _t_wide(spark, sf_dir, "documents")
    bench = docs.filter(F.col("doc_id") % 10 == 0)
    corpus = docs.filter(F.col("doc_id") % 10 != 0)
    return packing.ngram_contamination(corpus, bench, n=5,
                                       family=family)


def q_stratified_sample(spark, sf_dir):
    """Deterministic per-stratum sampling (data-mixing quotas): keep
    all of lang 'de', 30% of 'en', 10% of everything else — membership
    is a row-local md5 predicate, reproducible on any engine."""
    from nvtabular_spark.functions import sampling
    docs = _t(spark, sf_dir, "documents")
    out = sampling.stratified_sample(
        docs, {"de": 1.0, "en": 0.3}, strata_col="lang",
        default_fraction=0.1, seed=3)
    return out.select("doc_id", "lang", "source")


def q_token_vocab_stats(spark, sf_dir, family="md5"):
    """Corpus token-frequency table (freq + doc_freq) over synthesized
    token ids, truncated to a deterministic top-100."""
    from nvtabular_spark.functions import sampling
    docs = _t_wide(spark, sf_dir, "documents")
    toks = F.transform(text.words(F.col("text")),
                       lambda w: F.pmod(hash64(w, family), F.lit(50000)))
    return sampling.token_vocab_stats(
        docs.select(toks.alias("tokens")), top_k=100)


def q_minhash_signature(spark, sf_dir, family="md5"):
    docs = _t_wide(spark, sf_dir, "documents")
    sig = dedup.minhash_signature(F.col("text"), num_hashes=4, shingle_n=3,
                                  family=family)
    out = docs.filter(F.size(text.words(F.col("text"))) >= 3) \
        .select("doc_id", sig.alias("sig"))
    return out.select(
        "doc_id",
        *[F.element_at("sig", i + 1).alias(f"mh{i}") for i in range(4)])


def q_simhash(spark, sf_dir, family="md5"):
    docs = _t_wide(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        dedup.simhash(F.col("text"), bits=16, family=family)
        .alias("simhash16"))


def q_ngram_jaccard(spark, sf_dir, family="md5"):
    # NB: keep the skew caps ON in example code — max_posting bounds the
    # quadratic blowup of hot shingles (boilerplate) at corpus scale; at
    # oracle scale the cap never binds so results equal the exact answer
    # (asserted by test_skew_caps_inactive_at_test_scale)
    docs = _t(spark, sf_dir, "documents")
    return dedup.ngram_jaccard_pairs(docs, n=3, threshold=0.5,
                                     max_posting=10000, family=family)


def q_minhash_lsh_pairs(spark, sf_dir, family="md5"):
    docs = _t(spark, sf_dir, "documents")
    return dedup.minhash_lsh_pairs(docs, num_hashes=4, bands=2, shingle_n=3,
                                   max_bucket=1000, family=family)


def q_dedup_components(spark, sf_dir, family="md5"):
    # full fuzzy-dedup clustering: LSH candidate pairs → connected
    # components (large-star/small-star) → (id, component-min)
    docs = _t(spark, sf_dir, "documents")
    pairs = dedup.minhash_lsh_pairs(docs, num_hashes=4, bands=2, shingle_n=3,
                                    max_bucket=1000, family=family)
    return dedup.connected_components(pairs)


def q_near_dedup_survivors(spark, sf_dir, family="md5"):
    # documents that survive fuzzy dedup (one per cluster, the min id)
    docs = _t(spark, sf_dir, "documents")
    pairs = dedup.minhash_lsh_pairs(docs, num_hashes=4, bands=2, shingle_n=3,
                                    max_bucket=1000, family=family)
    return dedup.drop_near_duplicates(docs, pairs).select("doc_id")


def q_text_repetition(spark, sf_dir):
    # Gopher-style within-doc repetition signals over word 2-grams
    docs = _t(spark, sf_dir, "documents")
    return text.repetition_stats(docs, n=2)


def q_duplicate_spans(spark, sf_dir, family="md5"):
    # substring-level dedup (Lee et al. 2022): maximal word spans >= k
    # that appear in more than one document
    docs = _t(spark, sf_dir, "documents")
    return dedup.duplicate_spans(docs, k=8, family=family)


def q_duplicate_span_stats(spark, sf_dir, family="md5"):
    docs = _t(spark, sf_dir, "documents")
    return dedup.duplicate_span_stats(docs, k=8, family=family)


def q_duplicate_spans_full(spark, sf_dir, family="md5"):
    """Consolidated substring-span dedup row: per-doc stats LEFT JOINed
    with the individual (span_start, span_end) spans — docs with zero
    duplicate spans keep one row with NULL span bounds, so both the
    span enumeration and the per-doc fractions are hash-gated in one
    driver row. Merges the former duplicate_spans /
    duplicate_span_stats rows so all registry keys fit the driver's
    record window."""
    docs = _t(spark, sf_dir, "documents")
    # compute the span pipeline ONCE: checkpoint the spans and derive
    # the stats from them (spans feeds two consumers below)
    spans = dedup.duplicate_spans(docs, k=8, family=family) \
        .localCheckpoint(eager=False)
    stats = dedup.duplicate_span_stats(docs, k=8, family=family,
                                       spans=spans)
    return stats.join(spans, "doc_id", "left")


def q_random_projection(spark, sf_dir):
    # JL sign projection 64 → 8 dims; per-output scalar doubles so the
    # driver's float canonicalization applies
    emb = _t(spark, sf_dir, "embeddings")
    proj = ann.random_projection(F.col("embedding"), dim=64, out_dim=8)
    return emb.select(
        "vec_id",
        *[F.element_at(proj, j + 1).alias(f"rp{j}") for j in range(8)])


def q_pii_scrub(spark, sf_dir):
    # plant deterministic PII (email + URL + IPv4 derived from doc_id)
    # into the corpus, then scrub and count — exercises the regex
    # semantics on both engines with non-trivial matches
    docs = _t(spark, sf_dir, "documents")
    sid = F.col("doc_id").cast("string")
    planted = docs.select(
        "doc_id",
        F.concat(F.col("text"), F.lit(" contact user"), sid,
                 F.lit("@example.com via http://site.example/p/"), sid,
                 F.lit(" from 10.0."), (F.col("doc_id") % 200).cast("string"),
                 F.lit(".7 ok")).alias("text"))
    counts = text.pii_counts(F.col("text"))
    return planted.select(
        "doc_id",
        text.scrub_pii(F.col("text")).alias("scrubbed"),
        counts["url"].cast("long").alias("n_url"),
        counts["email"].cast("long").alias("n_email"),
        counts["ipv4"].cast("long").alias("n_ipv4"))


def q_simhash_pairs(spark, sf_dir, family="md5"):
    # bits=64 / max_hamming=3 → 16-bit chunk keys (65,536 buckets per
    # chunk, not 8 as the old bits=16/max_hamming=4 setting gave);
    # max_bucket caps hot buckets at corpus scale — inactive at oracle
    # scale (asserted by test_skew_caps_inactive_at_test_scale), so the
    # result equals the exact answer
    # full corpus (the old doc_id < 200 guard bounded the quadratic
    # candidate volume of 3-bit chunk keys; 16-bit keys don't need it)
    docs = _t(spark, sf_dir, "documents")
    return dedup.simhash_near_dups(docs, bits=64, max_hamming=3,
                                   max_bucket=1000, family=family)


def q_embedding_near_dups(spark, sf_dir):
    emb = _t(spark, sf_dir, "embeddings").filter(F.col("vec_id") < 200)
    out = ann.embedding_near_dups(emb, threshold=0.2, dim=64, exact=True)
    return out.select("id_a", "id_b",
                      (F.round("cosine_sim", 6) + F.lit(0.0))
                      .alias("cos_r"))


def q_embedding_near_dups_lsh(spark, sf_dir):
    # the SCALE path: hyperplane-bucketed candidate generation with the
    # occupancy cap ON (inactive at oracle scale — bucketed result is
    # recall<1 vs exact, and the oracle replicates the bucketing)
    emb = _t(spark, sf_dir, "embeddings").filter(F.col("vec_id") < 500)
    out = ann.embedding_near_dups(emb, threshold=0.2, dim=64,
                                  num_planes=8, max_bucket=1000)
    return out.select("id_a", "id_b",
                      (F.round("cosine_sim", 6) + F.lit(0.0))
                      .alias("cos_r"))


def q_ann_cosine_topk(spark, sf_dir):
    emb = _t(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 5)
    out = ann.brute_force_topk(emb, queries, k=3)
    return out.select("query_id", "neighbor_id", "rank")


def q_column_similarity(spark, sf_dir):
    """ColumnSimilarity (reference column_similarity.py:31-130): cosine
    between feature-matrix rows looked up by a left and right id column.
    The feature matrix is built from the embeddings table (driver-side
    at query scale; the op broadcasts it — scipy CSR at real vocabulary
    sizes)."""
    import numpy as np
    emb = _t(spark, sf_dir, "embeddings")
    rows = emb.select("vec_id", "embedding").orderBy("vec_id").collect()
    n = len(rows)
    mat = np.array([r["embedding"] for r in rows], dtype="float64")
    pairs = emb.select(
        F.col("vec_id").alias("left_id"),
        ((F.col("vec_id") * 7 + 3) % n).cast("int").alias("right_id"))
    op = ops.ColumnSimilarity(mat, metric="cosine")
    out = nvt.Workflow(([["left_id", "right_id"]] >> op)
                       + ["left_id", "right_id"]).transform(pairs)
    return out.select("left_id", "right_id",
                      (F.round("left_id_right_id_sim", 6) + F.lit(0.0))
                      .alias("cos_sim"))


def q_text_stats(spark, sf_dir):
    docs = _t_wide(spark, sf_dir, "documents")
    c = F.col("text")
    return docs.select(
        "doc_id",
        text.token_count(c).alias("n_tok"),
        text.stopword_hits(c, text.LANG_STOPWORDS["en"]).alias("sw_en"),
        text.lang_id(c).alias("lang_pred"),
        text.fingerprint(c).alias("fp"),
        F.round(text.quality_score(c), 6).alias("quality"),
    )


def q_text_signals(spark, sf_dir):
    """Consolidated per-doc text-signal row: text_stats LEFT JOIN
    repetition_stats (docs under 2 words have no 2-grams → NULL
    signals) JOIN pii_scrub, all on doc_id — the former text_stats /
    text_repetition / pii_scrub rows in one driver slot with no value
    coverage lost (each branch keeps its exact columns)."""
    ts = q_text_stats(spark, sf_dir)
    tr = q_text_repetition(spark, sf_dir)
    ps = q_pii_scrub(spark, sf_dir).select(
        "doc_id", "scrubbed", "n_url", "n_email", "n_ipv4")
    return ts.join(tr, "doc_id", "left").join(ps, "doc_id")


def q_chunk_sequences(spark, sf_dir):
    """Context-window chunking (functions/packing.py::chunk_sequences):
    token arrays synthesized deterministically from documents text
    (per-word lengths — cross-engine-stable ints), then overlapping
    12-token windows every 5 with min_tail=3."""
    from nvtabular_spark.functions import packing
    docs = _t(spark, sf_dir, "documents")
    base = docs.select(
        "doc_id",
        F.transform(text.words(F.col("text")),
                    lambda w: F.length(w).cast("int")).alias("tokens"))
    out = packing.chunk_sequences(base, max_len=12, stride=5, min_tail=3)
    return out.select(
        "doc_id", "chunk_id", "chunk_start",
        _arr_str_int(F.col("tokens")).alias("chunk_toks"), "n_tok")


def q_bpe_word_counts(spark, sf_dir):
    """The distributed portion of the BPE trainer (functions/bpe.py):
    one word-count pass with the shared ASCII-exact pretokenizer +
    deterministic top-300 (count desc, word asc). The driver's
    value-hash gates the exact table the merge loop trains on."""
    from nvtabular_spark.functions import bpe
    docs = _t(spark, sf_dir, "documents")
    wc = bpe.word_counts(docs, text_col="text", lowercase=True)
    return (wc.orderBy(F.col("cnt").desc(), F.col("word").asc())
            .limit(300))


def q_tokens_pipeline(spark, sf_dir, family="md5"):
    docs = _t_wide(spark, sf_dir, "documents")
    tokens = F.transform(
        text.words(F.col("text")),
        lambda w: F.pmod(hash64(w, family), F.lit(50000)).cast("int"))
    base = docs.select("doc_id", tokens.alias("tokens"))
    wf = nvt.Workflow(
        (["tokens"] >> ops.ListSlice(0, 16, pad=True, pad_value=0)
         >> ops.Rename(name="tokens16")) + ["doc_id"])
    out = wf.transform(base.withColumn("n_tok", F.size("tokens")))
    out = out.join(base.select("doc_id", F.size("tokens").alias("n_tok")),
                   "doc_id")
    return out.select(_arr_str_int(F.col("tokens16")).alias("tokens16"),
                      "doc_id", "n_tok")


def q_reduce_dtype(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem")
    rd = ops.ReduceDtypeSize()
    wf = nvt.Workflow((["l_linenumber"] >> rd) + ["l_orderkey", "l_quantity"])
    out = wf.fit_transform(li)
    return out.select("l_orderkey", "l_quantity",
                      F.col("l_linenumber").alias("linenum_small"))


def q_filter_dropna_rename(spark, sf_dir):
    ev = _t(spark, sf_dir, "events").withColumn(
        "value2", F.when(F.col("value") > 150, F.lit(None))
        .otherwise(F.col("value")))
    chain = (["value2"] >> ops.Dropna() >> ops.Filter("value2 > 100")
             >> ops.Rename(postfix="_clean"))
    wf = nvt.Workflow(chain + ["event_id"])
    return wf.transform(ev)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        # The driver records at most the first 50 rows. Ordering
        # policy (rotation promised in round 5): the 6 rows the r5
        # 50-cap pushed past the record window lead this round so each
        # gets a hard driver CORRECTNESS row; everything else keeps its
        # r5 relative order and the 6 rows that now fall past 50 were
        # driver-green in r5 and stay covered by
        # scripts/check_oracle.py.
        "dedup_components": q_dedup_components,
        "near_dedup_survivors": q_near_dedup_survivors,
        "random_projection": q_random_projection,
        "simhash_pairs": q_simhash_pairs,
        "embedding_near_dups": q_embedding_near_dups,
        "embedding_near_dups_lsh": q_embedding_near_dups_lsh,
        "expanding_te": q_expanding_te,
        "psi_drift": q_psi_drift,
        "psi_drift_cat": q_psi_drift_cat,
        "woe_encoding": q_woe_encoding,
        "mutual_info": q_mutual_info,
        "correlation_matrix": q_correlation_matrix,
        "chunk_sequences": q_chunk_sequences,
        "bpe_word_counts": q_bpe_word_counts,
        "text_signals": q_text_signals,
        "ann_cosine_topk": q_ann_cosine_topk,
        "column_similarity": q_column_similarity,
        "tokens_pipeline": q_tokens_pipeline,
        "reduce_dtype": q_reduce_dtype,
        "filter_dropna_rename": q_filter_dropna_rename,
        "categorify_multi": q_categorify_multi,
        "groupby_events": q_groupby_events,
        "lag_lead_difference": q_lag_lead_difference,
        "duplicate_spans_full": q_duplicate_spans_full,
        "dedup_exact_full": q_dedup_exact_full,
        "pack_sequences_global": q_pack_sequences_global,
        "normalize_both": q_normalize_both,
        "temperature_mix": q_temperature_mix,
        "fill_ops": q_fill_ops,
        "quantile_bin": q_quantile_bin,
        # previously driver-green rows
        "groupby_agg": q_groupby_agg,
        "value_count": q_value_count,
        "drop_low_cardinality": q_drop_low_cardinality,
        "data_stats": q_data_stats,
        "join_external": q_join_external,
        "join_groupby": q_join_groupby,
        "target_encoding": q_target_encoding,
        "logop_clip": q_logop_clip,
        "bucketize": q_bucketize,
        "hash_bucket": q_hash_bucket,
        "hashed_cross": q_hashed_cross,
        "list_slice": q_list_slice,
        "asof_join": q_asof_join,
        "rolling_backfill": q_rolling_backfill,
        "sessionize": q_sessionize,
        "rolling_agg": q_rolling_agg,
        "verify_distribution": q_verify_distribution,
        "pack_sequences_prefix": q_pack_sequences_prefix,
        "pack_sequences_greedy": q_pack_sequences_greedy,
        "ngram_contamination": q_ngram_contamination,
        "stratified_sample": q_stratified_sample,
        "token_vocab_stats": q_token_vocab_stats,
        "minhash_signature": q_minhash_signature,
        "simhash": q_simhash,
        "ngram_jaccard": q_ngram_jaccard,
        "minhash_lsh_pairs": q_minhash_lsh_pairs,
    }


# ---------------------------------------------------------------------------
# oracles
# ---------------------------------------------------------------------------

def _md5h(expr: str) -> str:
    return md5_hash64_sql(expr)


def _md5h_seeded(expr: str, seed: int) -> str:
    """DuckDB twin of hash64(col, 'md5', seed): md5 of 'value#seed'."""
    return md5_hash64_sql(f"CAST({expr} AS VARCHAR) || '#{seed}'")


_SHINGLES3 = dedup.shingle_hashes_sql("w", 3, _md5h)
_SHINGLES5 = dedup.shingle_hashes_sql("w", 5, _md5h)


def _mh_lane(i: int) -> str:
    """DuckDB twin of dedup.minhash_signature lane i over the shingle
    HASH list `sl`: lane = (a_i * low32(shingle_hash) + b_i) mod P."""
    a, b = dedup.minhash_coeffs(8)[i]
    return (f"list_min(list_transform(sl, s -> "
            f"({a} * (s & 4294967295) + {b})"
            f" % {dedup.MINHASH_PRIME}))")


def oracle_sql() -> dict[str, str]:
    sw_en = "['the','and','of','to','a','in','is','it']"
    sw = {
        "de": "['der','die','und','das','ist','ein','nicht','mit']",
        "en": sw_en,
        "es": "['el','la','de','que','y','en','un','es']",
        "fr": "['le','la','et','les','des','un','est','que']",
        "zh": "['的','是','了','在','我','有','和','不']",
    }
    hits = {k: f"len(list_filter(w, t -> list_contains({v}, t)))"
            for k, v in sw.items()}
    lang_case = f"""CASE
        WHEN h_de >= h_en AND h_de >= h_es AND h_de >= h_fr AND h_de >= h_zh AND h_de > 0 THEN 'de'
        WHEN h_en >= h_es AND h_en >= h_fr AND h_en >= h_zh AND h_en > 0 THEN 'en'
        WHEN h_es >= h_fr AND h_es >= h_zh AND h_es > 0 THEN 'es'
        WHEN h_fr >= h_zh AND h_fr > 0 THEN 'fr'
        WHEN h_zh > 0 THEN 'zh'
        ELSE 'en' END"""

    simhash_bits = " + ".join(
        f"(CASE WHEN list_sum(list_transform(hs, h -> ((h >> {b}) & 1) * 2 - 1)) > 0 "
        f"THEN {1 << b} ELSE 0 END)" for b in range(16))

    # 64-bit twin: bit 63 is the SIGNED long-min literal so the sum
    # stays in BIGINT range (matches nvtabular_spark dedup._bit_mask)
    simhash_bits64 = " + ".join(
        f"(CASE WHEN list_sum(list_transform(hs, h -> ((h >> {b}) & 1) * 2 - 1)) > 0 "
        f"THEN CAST({-(1 << 63) if b == 63 else (1 << b)} AS BIGINT) "
        f"ELSE 0 END)" for b in range(64))

    fp_expr = ("md5(trim(regexp_replace(regexp_replace(lower(text), "
               "'[^a-z0-9 ]', '', 'g'), ' +', ' ', 'g')))")

    # hyperplane components are md5-derived CONSTANTS (ann.py
    # hyperplane_bits): replicate them here with hashlib and inline ±1
    # literals; the projection sum is written left-associative to match
    # Spark's F.aggregate fold bit-for-bit (IEEE determinism)
    import hashlib as _hl

    def _plane_comp(p, d):
        h = int(_hl.md5(f"{p}#{d}".encode()).hexdigest()[:15], 16)
        return (h % 2) * 2 - 1

    _bucket_terms = []
    for p in range(8):
        proj = " + ".join(f"(v[{d + 1}] * {_plane_comp(p, d)}.0)"
                          for d in range(64))
        _bucket_terms.append(
            f"(CASE WHEN (0.0 + {proj}) > 0 THEN {1 << p} ELSE 0 END)")
    emb_bucket = " + ".join(_bucket_terms)

    # duplicate-span closure shared by both span queries: positional
    # 8-gram rolling hashes → cross-doc duplicated hashes → merged
    # per-doc spans (gaps-and-islands, identical frames both engines)
    sp8 = dedup.shingle_hashes_sql("w", 8, _md5h)
    spans_cte = f"""
            WITH w AS (SELECT doc_id, string_split(text, ' ') w
                       FROM documents),
            sh AS (SELECT doc_id, {sp8} AS hl FROM w WHERE len(w) >= 8),
            post AS (SELECT doc_id, u.pos AS pos, u.h AS h
                     FROM (SELECT doc_id,
                             unnest(list_transform(range(len(hl)),
                               i -> struct_pack(pos := i, h := hl[i+1])))
                             AS u
                           FROM sh)),
            dup AS (SELECT h FROM post GROUP BY h
                    HAVING COUNT(DISTINCT doc_id) >= 2),
            occ AS (SELECT p.doc_id, p.pos, p.pos + 8 AS e
                    FROM post p JOIN dup USING (h)),
            m AS (SELECT doc_id, pos, e,
                    CASE WHEN max(e) OVER pw IS NULL
                           OR pos > max(e) OVER pw THEN 1 ELSE 0 END AS ni
                  FROM occ
                  WINDOW pw AS (PARTITION BY doc_id ORDER BY pos
                                ROWS BETWEEN UNBOUNDED PRECEDING
                                AND 1 PRECEDING)),
            isl AS (SELECT doc_id, pos, e,
                      SUM(ni) OVER (PARTITION BY doc_id ORDER BY pos
                                    ROWS BETWEEN UNBOUNDED PRECEDING
                                    AND CURRENT ROW) AS island
                    FROM m),
            spans AS (SELECT doc_id, MIN(pos) AS span_start,
                             MAX(e) AS span_end
                      FROM isl GROUP BY doc_id, island)"""

    # shared by minhash_lsh_pairs and the components/survivors closures
    lsh_pairs = f"""
            WITH sh AS (
              SELECT doc_id, {_SHINGLES3} AS sl
              FROM (SELECT doc_id, string_split(text, ' ') w FROM documents)
              WHERE len(w) >= 3),
            sig AS (
              SELECT doc_id,
                {_mh_lane(0)} s0,
                {_mh_lane(1)} s1,
                {_mh_lane(2)} s2,
                {_mh_lane(3)} s3
              FROM sh),
            banded AS (
              SELECT doc_id, 0 AS band,
                     CAST(s0 AS VARCHAR) || ',' || CAST(s1 AS VARCHAR) AS key
              FROM sig
              UNION ALL
              SELECT doc_id, 1,
                     CAST(s2 AS VARCHAR) || ',' || CAST(s3 AS VARCHAR)
              FROM sig)
            SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
            FROM banded a JOIN banded b
              ON a.band = b.band AND a.key = b.key AND a.doc_id < b.doc_id"""

    o = {
        "groupby_agg": """
            SELECT l_returnflag, l_linestatus,
                   SUM(l_quantity) AS l_quantity_sum,
                   COUNT(l_quantity) AS l_quantity_count,
                   ROUND(SUM(l_extendedprice), 4) AS l_extendedprice_sum,
                   ROUND(AVG(l_extendedprice), 4) AS l_extendedprice_mean,
                   MIN(l_discount) AS l_discount_min,
                   MAX(l_discount) AS l_discount_max
            FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-01'
            GROUP BY 1, 2""",
        "groupby_first_last": """
            WITH r AS (
              SELECT user_id, value,
                     ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts ASC) rn,
                     COUNT(*) OVER (PARTITION BY user_id) n
              FROM events)
            SELECT user_id,
                   MAX(CASE WHEN rn = 1 THEN value END) AS value_first,
                   MAX(CASE WHEN rn = n THEN value END) AS value_last,
                   COUNT(value) AS value_count
            FROM r GROUP BY user_id""",
        "groupby_stats": """
            SELECT user_id,
                   quantile_cont(value, 0.5) AS value_median,
                   COUNT(DISTINCT value) AS value_nunique,
                   ROUND(stddev_samp(value), 4) AS value_std,
                   ROUND(var_samp(value), 4) AS value_var
            FROM events GROUP BY user_id""",
        "groupby_list": """
            SELECT user_id,
                   array_to_string(list_transform(
                     list(value ORDER BY ts, value),
                     x -> CAST(CAST(FLOOR(CAST(x AS DOUBLE) * 1000000)
                               AS BIGINT) AS VARCHAR)), ',') AS value_list
            FROM events GROUP BY user_id""",
        "value_count": """
            SELECT CAST(MIN(len(embedding)) AS INTEGER) AS len_min,
                   CAST(MAX(len(embedding)) AS INTEGER) AS len_max
            FROM embeddings""",
        "drop_low_cardinality": """
            SELECT c_mktsegment, c_custkey FROM customer""",
        "data_stats": """
            SELECT ROUND(MIN(value), 6) AS v_min,
                   ROUND(MAX(value), 6) AS v_max,
                   ROUND(AVG(value), 6) AS v_mean,
                   ROUND(STDDEV_SAMP(value), 6) AS v_std,
                   ROUND(CAST(COUNT(*) - COUNT(value) AS DOUBLE)
                         / COUNT(*), 9) AS null_frac
            FROM events""",
        "join_external": """
            SELECT o.o_orderkey, ROUND(o.o_totalprice, 4) AS o_totalprice,
                   c.c_mktsegment, c.c_nationkey
            FROM orders o LEFT JOIN customer c ON o.o_custkey = c.c_custkey""",
        "join_groupby": """
            SELECT o_orderkey, o_orderpriority,
                   COUNT(*) OVER (PARTITION BY o_orderpriority) AS o_orderpriority_count,
                   ROUND(SUM(o_totalprice) OVER (PARTITION BY o_orderpriority), 2)
                       AS o_orderpriority_o_totalprice_sum,
                   ROUND(AVG(o_totalprice) OVER (PARTITION BY o_orderpriority), 2)
                       AS o_orderpriority_o_totalprice_mean
            FROM orders""",
        "categorify": """
            WITH counts AS (
              SELECT c_mktsegment AS value, COUNT(*) AS cnt FROM customer
              WHERE c_mktsegment IS NOT NULL GROUP BY 1),
            vocab AS (
              SELECT value, CAST(ROW_NUMBER() OVER (ORDER BY cnt DESC, value ASC)
                                 + 2 AS INTEGER) AS code FROM counts)
            SELECT COALESCE(v.code, CASE WHEN c.c_mktsegment IS NULL THEN 1
                                         ELSE 2 END) AS c_mktsegment,
                   c.c_custkey
            FROM customer c LEFT JOIN vocab v ON c.c_mktsegment = v.value""",
        "categorify_freq_oov": f"""
            WITH counts AS (
              SELECT o_custkey AS value, COUNT(*) AS cnt FROM orders GROUP BY 1),
            vocab AS (
              SELECT value, CAST(ROW_NUMBER() OVER (ORDER BY cnt DESC, value ASC)
                                 + 11 AS INTEGER) AS code
              FROM counts WHERE cnt >= 3)
            SELECT COALESCE(v.code,
                            CAST(({_md5h('o.o_custkey')} % 10) + 2 AS INTEGER))
                       AS o_custkey,
                   o.o_orderkey
            FROM orders o LEFT JOIN vocab v ON o.o_custkey = v.value""",
        "categorify_combo": """
            WITH counts AS (
              SELECT o_orderpriority v0, o_orderstatus v1, COUNT(*) cnt
              FROM orders GROUP BY 1, 2),
            vocab AS (
              SELECT v0, v1, CAST(ROW_NUMBER() OVER (ORDER BY cnt DESC, v0 ASC,
                                                     v1 ASC) + 2 AS INTEGER) code
              FROM counts)
            SELECT v.code AS "o_orderpriority_o_orderstatus", o.o_orderkey
            FROM orders o JOIN vocab v
              ON o.o_orderpriority = v.v0 AND o.o_orderstatus = v.v1""",
        "categorify_multi": f"""
            WITH cp AS (
              SELECT o_orderpriority AS value, COUNT(*) AS cnt FROM orders
              WHERE o_orderpriority IS NOT NULL GROUP BY 1),
            vp AS (
              SELECT value, CAST(ROW_NUMBER() OVER (ORDER BY cnt DESC, value ASC)
                                 + 2 AS INTEGER) AS code FROM cp),
            ck AS (
              SELECT o_custkey AS value, COUNT(*) AS cnt FROM orders GROUP BY 1),
            vk AS (
              SELECT value, CAST(ROW_NUMBER() OVER (ORDER BY cnt DESC, value ASC)
                                 + 11 AS INTEGER) AS code
              FROM ck WHERE cnt >= 3),
            cj AS (
              SELECT o_orderpriority v0, o_orderstatus v1, COUNT(*) cnt
              FROM orders GROUP BY 1, 2),
            vj AS (
              SELECT v0, v1, CAST(ROW_NUMBER() OVER (ORDER BY cnt DESC, v0 ASC,
                                                     v1 ASC) + 2 AS INTEGER) code
              FROM cj)
            SELECT COALESCE(vp.code,
                            CASE WHEN o.o_orderpriority IS NULL THEN 1
                                 ELSE 2 END) AS o_orderpriority,
                   COALESCE(vk.code,
                            CAST(({_md5h('o.o_custkey')} % 10) + 2 AS INTEGER))
                       AS o_custkey,
                   vj.code AS "o_orderpriority_o_orderstatus",
                   o.o_orderkey
            FROM orders o
            LEFT JOIN vp ON o.o_orderpriority = vp.value
            LEFT JOIN vk ON o.o_custkey = vk.value
            JOIN vj ON o.o_orderpriority = vj.v0
                   AND o.o_orderstatus = vj.v1""",
        "target_encoding": """
            WITH base AS (
              SELECT o_orderkey, o_orderpriority g, o_totalprice y,
                     CAST(o_orderkey % 3 AS INTEGER) f FROM orders),
            ga AS (SELECT g, COUNT(y) c, SUM(y) s FROM base GROUP BY g),
            gf AS (SELECT g, f, COUNT(y) c, SUM(y) s FROM base GROUP BY g, f),
            m AS (SELECT AVG(y) mean FROM base)
            SELECT b.o_orderkey, b.g AS o_orderpriority,
                   ROUND(((ga.s - COALESCE(gf.s, 0)) + 20 * m.mean)
                         / ((ga.c - COALESCE(gf.c, 0)) + 20), 2)
                       AS TE_o_orderpriority_o_totalprice
            FROM base b JOIN ga ON b.g = ga.g
            LEFT JOIN gf ON b.g = gf.g AND b.f = gf.f
            CROSS JOIN m""",
        "normalize": """
            WITH s AS (SELECT COUNT(c_acctbal) n, SUM(c_acctbal) s,
                              SUM(c_acctbal * c_acctbal) s2 FROM customer)
            SELECT c.c_custkey,
                   ROUND((c.c_acctbal - s.s / s.n)
                         / sqrt((s.s2 - s.s * s.s / s.n) / (s.n - 1)), 4)
                   + 0.0 AS c_acctbal_z
            FROM customer c CROSS JOIN s""",
        "normalize_minmax": """
            WITH s AS (SELECT MIN(c_acctbal) lo, MAX(c_acctbal) hi FROM customer)
            SELECT c.c_custkey,
                   (c.c_acctbal - s.lo) / (s.hi - s.lo) AS c_acctbal_mm
            FROM customer c CROSS JOIN s""",
        "normalize_both": """
            WITH s AS (SELECT COUNT(c_acctbal) n, SUM(c_acctbal) s,
                              SUM(c_acctbal * c_acctbal) s2,
                              MIN(c_acctbal) lo, MAX(c_acctbal) hi
                       FROM customer)
            SELECT c.c_custkey,
                   ROUND((c.c_acctbal - s.s / s.n)
                         / sqrt((s.s2 - s.s * s.s / s.n) / (s.n - 1)), 4)
                   + 0.0 AS c_acctbal_z,
                   (c.c_acctbal - s.lo) / (s.hi - s.lo) AS c_acctbal_mm
            FROM customer c CROSS JOIN s""",
        "temperature_mix": f"""
            WITH cnt AS (SELECT lang, COUNT(*) AS n FROM documents
                         GROUP BY 1),
            mn AS (SELECT MIN(n) AS nmin FROM cnt),
            fr AS (SELECT c.lang,
                          CAST(ROUND(POWER(CAST(m.nmin AS DOUBLE) / c.n,
                                           0.5) * 1000000, 0) AS BIGINT)
                              AS thr
                   FROM cnt c CROSS JOIN mn m)
            SELECT d.doc_id, d.lang
            FROM documents d
            LEFT JOIN fr ON d.lang IS NOT DISTINCT FROM fr.lang
            WHERE ({_md5h('d.doc_id')}) % 1000000
                  < COALESCE(fr.thr, 0)""",
        "fillmissing": """
            SELECT COALESCE(CASE WHEN value > 150 THEN NULL ELSE value END, -1)
                       AS value2,
                   (CASE WHEN value > 150 THEN NULL ELSE value END) IS NULL
                       AS value2_filled,
                   event_id
            FROM events""",
        "fillmedian": """
            WITH v AS (SELECT event_id,
                              CASE WHEN value > 150 THEN NULL ELSE value END v2
                       FROM events),
            m AS (SELECT quantile_cont(v2, 0.5) med FROM v)
            SELECT COALESCE(v.v2, m.med) AS value2, v.event_id
            FROM v CROSS JOIN m""",
        "fill_ops": """
            WITH v AS (SELECT event_id,
                              CASE WHEN value > 150 THEN NULL ELSE value END v2
                       FROM events),
            m AS (SELECT quantile_cont(v2, 0.5) med FROM v)
            SELECT COALESCE(v.v2, -1) AS value2_c,
                   v.v2 IS NULL AS value2_filled_c,
                   COALESCE(v.v2, m.med) AS value2_m,
                   v.event_id
            FROM v CROSS JOIN m""",
        "quantile_bin": """
            WITH q AS (SELECT quantile_cont(value, 0.25) q1,
                              quantile_cont(value, 0.50) q2,
                              quantile_cont(value, 0.75) q3
                       FROM events)
            SELECT CASE WHEN e.value IS NULL THEN NULL
                        ELSE CAST((CASE WHEN e.value >= q.q1 THEN 1 ELSE 0 END)
                           + (CASE WHEN e.value >= q.q2 THEN 1 ELSE 0 END)
                           + (CASE WHEN e.value >= q.q3 THEN 1 ELSE 0 END)
                           AS INTEGER) END AS value,
                   e.event_id
            FROM events e CROSS JOIN q""",
        "logop_clip": """
            SELECT l_orderkey, l_linenumber,
                   ROUND(ln(1 + LEAST(GREATEST(l_extendedprice, 0), 1000)), 6)
                       AS price_log
            FROM lineitem""",
        "bucketize": """
            SELECT l_orderkey, l_linenumber,
                   CASE WHEN l_quantity IS NULL THEN NULL ELSE
                     CAST(l_quantity >= 1 AS INTEGER)
                     + CAST(l_quantity >= 10 AS INTEGER)
                     + CAST(l_quantity >= 25 AS INTEGER)
                     + CAST(l_quantity >= 40 AS INTEGER) END AS qty_bucket
            FROM lineitem""",
        "hash_bucket": f"""
            SELECT c_custkey,
                   CAST({_md5h('c_name')} % 50 AS INTEGER) AS name_bucket
            FROM customer""",
        "hashed_cross": f"""
            SELECT l_orderkey, l_linenumber,
                   CAST(xor({_md5h('l_returnflag')}, {_md5h('l_linestatus')})
                        % 100 AS INTEGER) AS cross_bucket
            FROM lineitem""",
        "difference_lag": """
            SELECT event_id,
                   value - LAG(value, 1) OVER w AS "value_difference_lag_1",
                   value - LEAD(value, 1) OVER w AS "value_difference_lag_-1"
            FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts)""",
        "list_slice": """
            SELECT array_to_string(list_transform(embedding[2:4],
                     x -> CAST(CAST(FLOOR(CAST(x AS DOUBLE) * 1000000)
                               AS BIGINT) AS VARCHAR)), ',') AS emb_slice,
                   array_to_string(list_transform(
                     (embedding[1:80] ||
                      list_transform(range(80), i -> CAST(0.0 AS REAL)))[1:80],
                     x -> CAST(CAST(FLOOR(CAST(x AS DOUBLE) * 1000000)
                               AS BIGINT) AS VARCHAR)), ',') AS emb_padded,
                   vec_id
            FROM embeddings""",
        "asof_join": """
            WITH quotes AS (
              SELECT user_id, ts, MAX(value) AS quote FROM events
              WHERE event_type = 'view' GROUP BY 1, 2),
            trades AS (SELECT * FROM events WHERE event_type = 'purchase')
            SELECT t.event_id, t.value, q.quote AS quote_asof
            FROM trades t ASOF LEFT JOIN quotes q
              ON t.user_id = q.user_id AND t.ts > q.ts""",
        "lag_lead": """
            SELECT LAG(value, 1) OVER w AS value_lag_1,
                   LAG(value, 2) OVER w AS value_lag_2,
                   LEAD(value, 1) OVER w AS value_lead_1,
                   event_id
            FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts)""",
        "rolling_backfill": """
            SELECT event_id,
                   LAST_VALUE(CASE WHEN value < 50 THEN NULL ELSE value END
                              IGNORE NULLS)
                     OVER (PARTITION BY user_id ORDER BY ts
                           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                       AS value_ffill
            FROM events""",
        "sessionize": """
            WITH g AS (
              SELECT event_id, user_id, ts,
                     CASE WHEN LAG(ts) OVER w IS NULL THEN 0
                          WHEN epoch(ts) - epoch(LAG(ts) OVER w) > 1800 THEN 1
                          ELSE 0 END AS boundary
              FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts))
            SELECT CAST(SUM(boundary) OVER (PARTITION BY user_id ORDER BY ts
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                        AS BIGINT) AS ts_session_id,
                   event_id
            FROM g""",
        "correlation_matrix": """
            SELECT 'l_discount' AS col_x, 'l_extendedprice' AS col_y,
                   ROUND(CORR(l_discount, l_extendedprice), 6) AS corr
            FROM lineitem
            UNION ALL
            SELECT 'l_discount', 'l_quantity',
                   ROUND(CORR(l_discount, l_quantity), 6) FROM lineitem
            UNION ALL
            SELECT 'l_discount', 'l_tax',
                   ROUND(CORR(l_discount, l_tax), 6) FROM lineitem
            UNION ALL
            SELECT 'l_extendedprice', 'l_quantity',
                   ROUND(CORR(l_extendedprice, l_quantity), 6)
            FROM lineitem
            UNION ALL
            SELECT 'l_extendedprice', 'l_tax',
                   ROUND(CORR(l_extendedprice, l_tax), 6) FROM lineitem
            UNION ALL
            SELECT 'l_quantity', 'l_tax',
                   ROUND(CORR(l_quantity, l_tax), 6) FROM lineitem""",
        "mutual_info": """
            WITH b AS (SELECT CAST(event_type AS VARCHAR) AS x,
                              CAST(value > 150 AS VARCHAR) AS y
                       FROM events
                       WHERE event_type IS NOT NULL
                         AND value IS NOT NULL),
            cont AS (SELECT x, y, COUNT(*) nxy FROM b GROUP BY 1, 2),
            tot AS (SELECT CAST(SUM(nxy) AS DOUBLE) n FROM cont),
            mx AS (SELECT x, SUM(nxy) nx FROM cont GROUP BY 1),
            my AS (SELECT y, SUM(nxy) ny FROM cont GROUP BY 1),
            mi AS (SELECT SUM((c.nxy / t.n)
                       * LN(c.nxy * t.n / (m1.nx * m2.ny))) v
                   FROM cont c, tot t, mx m1, my m2
                   WHERE c.x = m1.x AND c.y = m2.y),
            hx AS (SELECT -SUM((nx / t.n) * LN(nx / t.n)) v
                   FROM mx, tot t),
            hy AS (SELECT -SUM((ny / t.n) * LN(ny / t.n)) v
                   FROM my, tot t)
            SELECT ROUND(mi.v, 6) AS mi, ROUND(hx.v, 6) AS h_x,
                   ROUND(hy.v, 6) AS h_y,
                   ROUND(CASE WHEN hx.v > 0 AND hy.v > 0
                              THEN mi.v / SQRT(hx.v * hy.v)
                              ELSE 0.0 END, 6) AS nmi,
                   CAST(t.n AS BIGINT) AS n
            FROM mi, hx, hy, tot t""",
        "woe_encoding": """
            WITH b AS (SELECT event_id, event_type,
                              CASE WHEN value IS NULL THEN NULL
                                   ELSE CAST(value > 150 AS DOUBLE)
                              END AS hi
                       FROM events),
            g AS (SELECT event_type, SUM(hi) pos, COUNT(hi) cnt
                  FROM b GROUP BY 1),
            t AS (SELECT SUM(pos) pt, SUM(cnt) ct FROM g)
            SELECT b.event_id, b.event_type,
                   ROUND(LN((g.pos + 0.5)
                            / (g.cnt - g.pos + 0.5))
                         - LN((t.pt + 0.5) / (t.ct - t.pt + 0.5)), 6)
                       AS woe
            FROM b LEFT JOIN g
              ON b.event_type IS NOT DISTINCT FROM g.event_type, t""",
        "psi_drift_cat": """
            WITH rh AS (SELECT event_type AS category, COUNT(*) n
                        FROM events WHERE user_id % 2 = 0
                          AND event_type IS NOT NULL GROUP BY 1),
            ch AS (SELECT event_type AS category, COUNT(*) n
                   FROM events WHERE user_id % 2 = 1
                     AND event_type IS NOT NULL GROUP BY 1),
            top AS (SELECT category FROM rh
                    ORDER BY n DESC, category ASC LIMIT 3),
            rb AS (SELECT COALESCE(t.category, '__other__') AS category,
                          SUM(rh.n) AS n
                   FROM rh LEFT JOIN top t ON rh.category = t.category
                   GROUP BY 1),
            cb AS (SELECT COALESCE(t.category, '__other__') AS category,
                          SUM(ch.n) AS n
                   FROM ch LEFT JOIN top t ON ch.category = t.category
                   GROUP BY 1),
            grid AS (SELECT category FROM top
                     UNION ALL SELECT '__other__'),
            d AS (SELECT g.category, COALESCE(rb.n, 0) AS n_ref,
                         COALESCE(cb.n, 0) AS n_cur
                  FROM grid g LEFT JOIN rb ON g.category = rb.category
                              LEFT JOIN cb ON g.category = cb.category),
            t AS (SELECT SUM(n_ref) tr, SUM(n_cur) tc,
                         COUNT(*) nb FROM d),
            q AS (SELECT d.category, d.n_ref, d.n_cur,
                         (d.n_ref + 0.5) / (t.tr + 0.5 * t.nb) AS pr,
                         (d.n_cur + 0.5) / (t.tc + 0.5 * t.nb) AS pc
                  FROM d, t)
            SELECT category, CAST(n_ref AS BIGINT) AS n_ref,
                   CAST(n_cur AS BIGINT) AS n_cur,
                   ROUND(pr, 6) AS p_ref, ROUND(pc, 6) AS p_cur,
                   ROUND((pc - pr) * LN(pc / pr), 6) AS psi_contrib,
                   ROUND((pr * LN(pr / ((pr + pc) / 2))
                          + pc * LN(pc / ((pr + pc) / 2))) / 2, 6)
                       AS js_contrib
            FROM q""",
        "psi_drift": """
            WITH ref AS (SELECT value AS v FROM events
                         WHERE user_id % 2 = 0 AND value IS NOT NULL),
            cur AS (SELECT value AS v FROM events
                    WHERE user_id % 2 = 1 AND value IS NOT NULL),
            p AS (SELECT lo, CASE WHEN (hi - lo) / 10.0 = 0 THEN 1.0
                                  ELSE (hi - lo) / 10.0 END AS w
                  FROM (SELECT MIN(v) lo, MAX(v) hi FROM ref)),
            rh AS (SELECT LEAST(GREATEST(CAST(FLOOR((v - p.lo) / p.w)
                       AS INT), 0), 9) AS bin, COUNT(*) n
                   FROM ref, p GROUP BY 1),
            ch AS (SELECT LEAST(GREATEST(CAST(FLOOR((v - p.lo) / p.w)
                       AS INT), 0), 9) AS bin, COUNT(*) n
                   FROM cur, p GROUP BY 1),
            grid AS (SELECT CAST(range AS INT) AS bin FROM range(10)),
            d AS (SELECT g.bin, COALESCE(rh.n, 0) AS n_ref,
                         COALESCE(ch.n, 0) AS n_cur
                  FROM grid g LEFT JOIN rh ON g.bin = rh.bin
                              LEFT JOIN ch ON g.bin = ch.bin),
            t AS (SELECT SUM(n_ref) tr, SUM(n_cur) tc FROM d),
            q AS (SELECT d.bin, d.n_ref, d.n_cur,
                         (d.n_ref + 0.5) / (t.tr + 5.0) AS pr,
                         (d.n_cur + 0.5) / (t.tc + 5.0) AS pc
                  FROM d, t)
            SELECT bin, CAST(n_ref AS BIGINT) AS n_ref,
                   CAST(n_cur AS BIGINT) AS n_cur,
                   ROUND(pr, 6) AS p_ref, ROUND(pc, 6) AS p_cur,
                   ROUND((pc - pr) * LN(pc / pr), 6) AS psi_contrib,
                   ROUND((pr * LN(pr / ((pr + pc) / 2))
                          + pc * LN(pc / ((pr + pc) / 2))) / 2, 6)
                       AS js_contrib
            FROM q""",
        "expanding_te": """
            SELECT event_id,
                   ROUND((COALESCE(SUM(value) OVER w, 0)
                          + 20 * (SELECT AVG(value) FROM events))
                         / (COUNT(value) OVER w + 20), 6) AS ete_value
            FROM events
            WINDOW w AS (PARTITION BY user_id ORDER BY epoch(ts)
                         RANGE BETWEEN UNBOUNDED PRECEDING
                         AND 1 PRECEDING)""",
        "rolling_agg": """
            SELECT event_id,
                   ROUND(AVG(value) OVER w, 6) AS value_rolling_mean_3,
                   CAST(COUNT(value) OVER w AS BIGINT) AS value_rolling_count_3,
                   CAST(COUNT(DISTINCT value) OVER w AS BIGINT)
                       AS value_rolling_nunique_3,
                   ROUND(AVG(value) OVER wt, 6) AS value_rolling_mean_t3600s,
                   CAST(COUNT(value) OVER wt AS BIGINT)
                       AS value_rolling_count_t3600s,
                   CAST(COUNT(DISTINCT value) OVER wt AS BIGINT)
                       AS value_rolling_nunique_t3600s,
                   ROUND(COALESCE(list_sum(list_transform(
                       ARRAY_AGG(struct_pack(t := epoch(ts), v := value))
                           OVER wt,
                       s -> COALESCE(s.v, 0)
                            * POWER(0.5, (epoch(ts) - s.t) / 1800.0))),
                       0.0), 6) AS value_decay_sum_h1800s
            FROM events WINDOW
                 w AS (PARTITION BY user_id ORDER BY ts
                       ROWS BETWEEN 3 PRECEDING AND 1 PRECEDING),
                 wt AS (PARTITION BY user_id ORDER BY epoch(ts)
                        RANGE BETWEEN 3600 PRECEDING AND 1 PRECEDING)""",
        "dedup_exact": f"""
            WITH keyed AS (SELECT doc_id, {fp_expr} AS dup_key FROM documents),
            canon AS (SELECT dup_key, MIN(doc_id) canonical_id FROM keyed
                      GROUP BY 1)
            SELECT k.doc_id, k.dup_key, c.canonical_id,
                   k.doc_id <> c.canonical_id AS is_dup
            FROM keyed k JOIN canon c ON k.dup_key = c.dup_key""",
        "drop_exact_dups": f"""
            WITH keyed AS (SELECT doc_id, lang, source, n_chars,
                                  {fp_expr} AS dk FROM documents),
            canon AS (SELECT dk, MIN(doc_id) cid FROM keyed GROUP BY 1)
            SELECT k.doc_id, k.lang, k.source, k.n_chars
            FROM keyed k JOIN canon c ON k.dk = c.dk
            WHERE k.doc_id = c.cid""",
        "dedup_exact_full": f"""
            WITH keyed AS (SELECT doc_id, lang, source, n_chars,
                                  {fp_expr} AS dup_key FROM documents),
            canon AS (SELECT dup_key, MIN(doc_id) canonical_id FROM keyed
                      GROUP BY 1)
            SELECT k.doc_id, k.dup_key, c.canonical_id,
                   k.doc_id <> c.canonical_id AS is_dup,
                   CASE WHEN k.doc_id = c.canonical_id THEN k.lang END
                       AS lang,
                   CASE WHEN k.doc_id = c.canonical_id THEN k.source END
                       AS source,
                   CASE WHEN k.doc_id = c.canonical_id THEN k.n_chars END
                       AS n_chars
            FROM keyed k JOIN canon c ON k.dup_key = c.dup_key""",
        "verify_distribution": f"""
            WITH u AS (SELECT ({_md5h('doc_id')} % 1000000) / 1000000.0
                              AS u FROM documents),
            hist AS (SELECT LEAST(GREATEST(CAST(FLOOR(u * 100) AS BIGINT),
                                           0), 99) AS b, COUNT(*) AS c
                     FROM u GROUP BY 1),
            grid AS (SELECT g.b, COALESCE(h.c, 0) AS c
                     FROM (SELECT UNNEST(range(0, 100)) AS b) g
                     LEFT JOIN hist h USING (b)),
            ecdf AS (SELECT b,
                       SUM(c) OVER (ORDER BY b) * 1.0
                         / (SELECT SUM(c) FROM grid) AS e
                     FROM grid),
            ks AS (SELECT MAX(ABS(e - (b + 1) / 100.0)) AS stat,
                          (SELECT SUM(c) FROM grid) AS n
                   FROM ecdf),
            lamv AS (SELECT stat, (SQRT(n) + 0.12 + 0.11 / SQRT(n)) * stat
                            AS lam FROM ks)
            SELECT ROUND(stat, 6) AS ks_stat,
                   ROUND(GREATEST(0.0, LEAST(1.0, 2.0 * (
                     SELECT SUM(CASE WHEN k % 2 = 1 THEN 1.0 ELSE -1.0 END
                                * EXP(-2.0 * k * k * lam * lam))
                     FROM (SELECT UNNEST(range(1, 101)) AS k)
                   ))), 6) AS p_value
            FROM lamv""",
        "pack_sequences_prefix": """
            WITH w AS (
              SELECT doc_id, lang,
                     CAST(COALESCE(SUM(n_chars) OVER (
                        PARTITION BY lang ORDER BY doc_id
                        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
                     ), 0) AS BIGINT) AS prev
              FROM documents)
            SELECT doc_id, lang,
                   CAST(FLOOR(prev / 5000.0) AS BIGINT) AS bin_id,
                   CAST(prev % 5000 AS BIGINT) AS bin_offset
            FROM w""",
        "pack_sequences_greedy": """
            WITH RECURSIVE ordered AS MATERIALIZED (
              SELECT doc_id, lang, n_chars,
                     ROW_NUMBER() OVER (PARTITION BY lang
                                        ORDER BY doc_id) AS rn
              FROM documents),
            rec AS (
              SELECT lang, rn, doc_id,
                     CAST(0 AS BIGINT) AS bin_id,
                     CAST(0 AS BIGINT) AS bin_offset,
                     CAST(n_chars AS BIGINT) AS fill
              FROM ordered WHERE rn = 1
              UNION ALL
              SELECT o.lang, o.rn, o.doc_id,
                     CASE WHEN r.fill + o.n_chars > 5000 AND r.fill > 0
                          THEN r.bin_id + 1 ELSE r.bin_id END,
                     CASE WHEN r.fill + o.n_chars > 5000 AND r.fill > 0
                          THEN CAST(0 AS BIGINT) ELSE r.fill END,
                     CASE WHEN r.fill + o.n_chars > 5000 AND r.fill > 0
                          THEN CAST(o.n_chars AS BIGINT)
                          ELSE r.fill + o.n_chars END
              FROM rec r JOIN ordered o
                ON o.lang IS NOT DISTINCT FROM r.lang
                   AND o.rn = r.rn + 1)
            SELECT doc_id, lang, bin_id, bin_offset FROM rec""",
        "pack_sequences_global": f"""
            WITH RECURSIVE base AS MATERIALIZED (
              SELECT doc_id, n_chars,
                     ({_md5h('doc_id')} % 4) AS shard
              FROM documents),
            ordered AS MATERIALIZED (
              SELECT doc_id, n_chars, shard,
                     ROW_NUMBER() OVER (PARTITION BY shard
                                        ORDER BY doc_id) AS rn
              FROM base),
            rec AS (
              SELECT shard, rn, doc_id,
                     CAST(0 AS BIGINT) AS lbin,
                     CAST(0 AS BIGINT) AS loff,
                     CAST(n_chars AS BIGINT) AS fill
              FROM ordered WHERE rn = 1
              UNION ALL
              SELECT o.shard, o.rn, o.doc_id,
                     CASE WHEN r.fill + o.n_chars > 5000 AND r.fill > 0
                          THEN r.lbin + 1 ELSE r.lbin END,
                     CASE WHEN r.fill + o.n_chars > 5000 AND r.fill > 0
                          THEN CAST(0 AS BIGINT) ELSE r.fill END,
                     CASE WHEN r.fill + o.n_chars > 5000 AND r.fill > 0
                          THEN CAST(o.n_chars AS BIGINT)
                          ELSE r.fill + o.n_chars END
              FROM rec r JOIN ordered o
                ON o.shard = r.shard AND o.rn = r.rn + 1),
            summ AS MATERIALIZED (
              SELECT r.shard, r.lbin,
                     CAST(SUM(b.n_chars) AS BIGINT) AS btok
              FROM rec r JOIN base b USING (doc_id)
              GROUP BY 1, 2),
            sordered AS MATERIALIZED (
              SELECT shard, lbin, btok,
                     ROW_NUMBER() OVER (ORDER BY shard, lbin) AS srn
              FROM summ),
            grec AS (
              SELECT srn, shard, lbin,
                     CAST(0 AS BIGINT) AS gbin,
                     CAST(0 AS BIGINT) AS goff,
                     btok AS fill
              FROM sordered WHERE srn = 1
              UNION ALL
              SELECT o.srn, o.shard, o.lbin,
                     CASE WHEN r.fill + o.btok > 5000 AND r.fill > 0
                          THEN r.gbin + 1 ELSE r.gbin END,
                     CASE WHEN r.fill + o.btok > 5000 AND r.fill > 0
                          THEN CAST(0 AS BIGINT) ELSE r.fill END,
                     CASE WHEN r.fill + o.btok > 5000 AND r.fill > 0
                          THEN o.btok ELSE r.fill + o.btok END
              FROM grec r JOIN sordered o ON o.srn = r.srn + 1)
            SELECT rec.doc_id, g.gbin AS bin_id,
                   g.goff + rec.loff AS bin_offset
            FROM rec JOIN grec g
              ON rec.shard = g.shard AND rec.lbin = g.lbin""",
        "ngram_contamination": f"""
            WITH bw AS (SELECT string_split(text, ' ') w FROM documents
                        WHERE doc_id % 10 = 0),
            bsh AS (SELECT DISTINCT UNNEST({_SHINGLES5}) AS sh
                    FROM bw WHERE len(w) >= 5),
            cw AS (SELECT doc_id, string_split(text, ' ') w
                   FROM documents WHERE doc_id % 10 <> 0),
            csh AS (SELECT doc_id,
                           UNNEST(list_distinct({_SHINGLES5})) AS sh
                    FROM cw WHERE len(w) >= 5),
            per AS (
              SELECT doc_id,
                     CAST(COUNT(*) AS BIGINT) AS n_ngrams,
                     CAST(SUM(CASE WHEN sh IN (SELECT sh FROM bsh)
                              THEN 1 ELSE 0 END) AS BIGINT)
                       AS n_contaminated
              FROM csh GROUP BY doc_id)
            SELECT d.doc_id,
                   CAST(COALESCE(p.n_ngrams, 0) AS BIGINT) AS n_ngrams,
                   CAST(COALESCE(p.n_contaminated, 0) AS BIGINT)
                     AS n_contaminated,
                   CASE WHEN COALESCE(p.n_ngrams, 0) > 0
                        THEN CAST(p.n_contaminated AS DOUBLE)
                             / p.n_ngrams
                        ELSE 0.0 END AS contamination_frac
            FROM (SELECT DISTINCT doc_id FROM documents
                  WHERE doc_id % 10 <> 0) d
            LEFT JOIN per p USING (doc_id)""",
        "stratified_sample": f"""
            SELECT doc_id, lang, source FROM documents
            WHERE ({_md5h_seeded('doc_id', 3)}) % 1000000 <
                  CAST((CASE WHEN lang = 'de' THEN 1.0
                             WHEN lang = 'en' THEN 0.3
                             ELSE 0.1 END) * 1000000 AS BIGINT)""",
        "token_vocab_stats": f"""
            WITH t AS (SELECT doc_id,
                         list_transform(string_split(text, ' '),
                                        w -> {_md5h('w')} % 50000)
                           AS toks
                       FROM documents),
            freq AS (SELECT UNNEST(toks) AS token FROM t),
            fr AS (SELECT token, CAST(COUNT(*) AS BIGINT) AS freq
                   FROM freq GROUP BY 1),
            dfq AS (SELECT token, CAST(COUNT(*) AS BIGINT) AS doc_freq
                    FROM (SELECT doc_id,
                                 UNNEST(list_distinct(toks)) AS token
                          FROM t)
                    GROUP BY 1)
            SELECT fr.token, fr.freq, dfq.doc_freq
            FROM fr JOIN dfq USING (token)
            ORDER BY fr.freq DESC, fr.token ASC LIMIT 100""",
        "minhash_signature": f"""
            WITH sh AS (
              SELECT doc_id, {_SHINGLES3} AS sl
              FROM (SELECT doc_id, string_split(text, ' ') w FROM documents)
              WHERE len(w) >= 3)
            SELECT doc_id,
                   {_mh_lane(0)} AS mh0,
                   {_mh_lane(1)} AS mh1,
                   {_mh_lane(2)} AS mh2,
                   {_mh_lane(3)} AS mh3
            FROM sh""",
        "simhash": f"""
            WITH h AS (
              SELECT doc_id,
                     list_transform(string_split(text, ' '),
                                    t -> {_md5h('t')}) hs
              FROM documents)
            SELECT doc_id, CAST({simhash_bits} AS BIGINT) AS simhash16
            FROM h""",
        "ngram_jaccard": f"""
            WITH sh AS (
              SELECT doc_id,
                     unnest(list_distinct({_SHINGLES3})) AS sh
              FROM (SELECT doc_id, string_split(text, ' ') w FROM documents)
              WHERE len(w) >= 3),
            sz AS (SELECT doc_id, COUNT(*) sz FROM sh GROUP BY 1),
            inter AS (
              SELECT a.doc_id id_a, b.doc_id id_b, COUNT(*) inter
              FROM sh a JOIN sh b ON a.sh = b.sh AND a.doc_id < b.doc_id
              GROUP BY 1, 2)
            SELECT i.id_a, i.id_b,
                   CAST(i.inter AS DOUBLE) / (sa.sz + sb.sz - i.inter) AS jaccard
            FROM inter i JOIN sz sa ON i.id_a = sa.doc_id
            JOIN sz sb ON i.id_b = sb.doc_id
            WHERE CAST(i.inter AS DOUBLE) / (sa.sz + sb.sz - i.inter) >= 0.5""",
        "minhash_lsh_pairs": lsh_pairs,
        "dedup_components": f"""
            WITH RECURSIVE pairs AS ({lsh_pairs}),
            e AS (SELECT id_a AS a, id_b AS b FROM pairs
                  UNION SELECT id_b, id_a FROM pairs),
            reach(id, label) AS (
              SELECT a, a FROM e
              UNION
              SELECT e.b, r.label FROM reach r JOIN e ON e.a = r.id)
            SELECT id, MIN(label) AS component FROM reach GROUP BY id""",
        "near_dedup_survivors": f"""
            WITH RECURSIVE pairs AS ({lsh_pairs}),
            e AS (SELECT id_a AS a, id_b AS b FROM pairs
                  UNION SELECT id_b, id_a FROM pairs),
            reach(id, label) AS (
              SELECT a, a FROM e
              UNION
              SELECT e.b, r.label FROM reach r JOIN e ON e.a = r.id)
            SELECT d.doc_id FROM documents d
            WHERE d.doc_id NOT IN (
              SELECT id FROM reach GROUP BY id
              HAVING id <> MIN(label))""",
        "pii_scrub": (lambda pu, pe, pi: f"""
            WITH planted AS (
              SELECT doc_id,
                     text || ' contact user' || CAST(doc_id AS VARCHAR)
                     || '@example.com via http://site.example/p/'
                     || CAST(doc_id AS VARCHAR)
                     || ' from 10.0.' || CAST(doc_id % 200 AS VARCHAR)
                     || '.7 ok' AS text
              FROM documents)
            , s1 AS (SELECT doc_id, text,
                       regexp_replace(text, '{pu}', '<URL>', 'g') AS t1
                     FROM planted),
            s2 AS (SELECT doc_id, text, t1,
                     regexp_replace(t1, '{pe}', '<EMAIL>', 'g') AS t2
                   FROM s1)
            SELECT doc_id,
                   regexp_replace(t2, '{pi}', '<IP>', 'g') AS scrubbed,
                   len(regexp_extract_all(text, '{pu}')) AS n_url,
                   len(regexp_extract_all(t1, '{pe}')) AS n_email,
                   len(regexp_extract_all(t2, '{pi}')) AS n_ipv4
            FROM s2""")(text.PII_PATTERNS["url"],
                             text.PII_PATTERNS["email"],
                             text.PII_PATTERNS["ipv4"]),
        "duplicate_spans": spans_cte + """
            SELECT doc_id, span_start, span_end FROM spans""",
        "duplicate_span_stats": spans_cte + """,
            per AS (SELECT doc_id, COUNT(*) AS n_dup_spans,
                           SUM(span_end - span_start) AS dup_words
                    FROM spans GROUP BY doc_id)
            SELECT d.doc_id,
                   len(string_split(d.text, ' ')) AS n_words,
                   COALESCE(p.n_dup_spans, 0) AS n_dup_spans,
                   CAST(COALESCE(p.dup_words, 0) AS BIGINT) AS dup_words,
                   CASE WHEN len(string_split(d.text, ' ')) > 0
                        THEN CAST(COALESCE(p.dup_words, 0) AS DOUBLE)
                             / len(string_split(d.text, ' '))
                   END AS dup_word_frac
            FROM documents d LEFT JOIN per p USING (doc_id)""",
        "duplicate_spans_full": spans_cte + """,
            per AS (SELECT doc_id, COUNT(*) AS n_dup_spans,
                           SUM(span_end - span_start) AS dup_words
                    FROM spans GROUP BY doc_id)
            SELECT d.doc_id,
                   len(string_split(d.text, ' ')) AS n_words,
                   COALESCE(p.n_dup_spans, 0) AS n_dup_spans,
                   CAST(COALESCE(p.dup_words, 0) AS BIGINT) AS dup_words,
                   CASE WHEN len(string_split(d.text, ' ')) > 0
                        THEN CAST(COALESCE(p.dup_words, 0) AS DOUBLE)
                             / len(string_split(d.text, ' '))
                   END AS dup_word_frac,
                   s.span_start, s.span_end
            FROM documents d LEFT JOIN per p USING (doc_id)
            LEFT JOIN spans s USING (doc_id)""",
        "groupby_events": """
            WITH r AS (
              SELECT user_id, value,
                     ROW_NUMBER() OVER (PARTITION BY user_id
                                        ORDER BY ts ASC, value ASC) rn,
                     COUNT(*) OVER (PARTITION BY user_id) n
              FROM events)
            SELECT user_id,
                   MAX(CASE WHEN rn = 1 THEN value END) AS value_first,
                   MAX(CASE WHEN rn = n THEN value END) AS value_last,
                   COUNT(value) AS value_count,
                   quantile_cont(value, 0.5) AS value_median,
                   COUNT(DISTINCT value) AS value_nunique,
                   ROUND(stddev_samp(value), 4) AS value_std,
                   ROUND(var_samp(value), 4) AS value_var,
                   array_to_string(list_transform(
                     list(value ORDER BY rn),
                     x -> CAST(CAST(FLOOR(CAST(x AS DOUBLE) * 1000000)
                               AS BIGINT) AS VARCHAR)), ',') AS value_list
            FROM r GROUP BY user_id""",
        "lag_lead_difference": """
            SELECT LAG(value, 1) OVER w AS value_lag_1,
                   LAG(value, 2) OVER w AS value_lag_2,
                   LEAD(value, 1) OVER w AS value_lead_1,
                   value - LAG(value, 1) OVER w AS "value_difference_lag_1",
                   value - LEAD(value, 1) OVER w AS "value_difference_lag_-1",
                   event_id
            FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts)""",
        "text_repetition": """
            WITH w AS (SELECT doc_id, len(text) tchars,
                              string_split(text, ' ') w FROM documents),
            ng AS (SELECT doc_id, tchars,
                     unnest(list_transform(range(1, len(w)),
                                           i -> w[i] || ' ' || w[i+1])) AS ng
                   FROM w WHERE len(w) >= 2),
            cnt AS (SELECT doc_id, tchars, ng, COUNT(*) cnt
                    FROM ng GROUP BY 1, 2, 3)
            SELECT doc_id,
              CAST(SUM(cnt) AS BIGINT) AS ngram_count,
              COUNT(*) AS distinct_ngrams,
              MAX(cnt) AS top_ngram_count,
              1.0 - CAST(COUNT(*) AS DOUBLE) / SUM(cnt) AS dup_ngram_frac,
              CAST(MAX(cnt * len(ng)) AS DOUBLE) / tchars
                AS top_ngram_char_frac,
              CAST(SUM(CASE WHEN cnt > 1 THEN cnt * len(ng) ELSE 0 END)
                   AS DOUBLE) / tchars AS dup_ngram_char_frac
            FROM cnt GROUP BY doc_id, tchars""",
        "simhash_pairs": f"""
            WITH h AS (
              SELECT doc_id,
                     list_transform(string_split(text, ' '),
                                    t -> {_md5h('t')}) hs
              FROM documents),
            s AS (SELECT doc_id, CAST({simhash_bits64} AS BIGINT) sh FROM h),
            banded AS (
              SELECT doc_id, sh, c.chunk,
                     (sh >> (c.chunk * 16)) & 65535 AS key
              FROM s, (SELECT unnest(range(4)) chunk) c),
            pairs AS (
              SELECT DISTINCT a.doc_id id_a, b.doc_id id_b, a.sh sh_a, b.sh sh_b
              FROM banded a JOIN banded b
                ON a.chunk = b.chunk AND a.key = b.key AND a.doc_id < b.doc_id)
            SELECT id_a, id_b,
                   CAST(bit_count(xor(sh_a, sh_b)) AS INTEGER) AS hamming
            FROM pairs WHERE bit_count(xor(sh_a, sh_b)) <= 3""",
        "embedding_near_dups": """
            WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) v
                       FROM embeddings WHERE vec_id < 200)
            SELECT a.vec_id AS id_a, b.vec_id AS id_b,
                   ROUND(list_cosine_similarity(a.v, b.v), 6) + 0.0 AS cos_r
            FROM e a JOIN e b ON a.vec_id < b.vec_id
            WHERE list_cosine_similarity(a.v, b.v) >= 0.2""",
        "random_projection": (lambda: (
            lambda scale: f"""
            WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) v
                       FROM embeddings)
            SELECT vec_id,
              {', '.join(
                  f'((0.0 + '
                  + ' + '.join(f'(v[{d + 1}] * {_plane_comp(j, d)}.0)'
                               for d in range(64))
                  + f') * {scale}) AS rp{j}' for j in range(8))}
            FROM e""")(repr(1.0 / 8 ** 0.5)))(),
        "embedding_near_dups_lsh": f"""
            WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) v
                       FROM embeddings WHERE vec_id < 500),
            bk AS (SELECT vec_id, v, ({emb_bucket}) AS bucket FROM e)
            SELECT a.vec_id AS id_a, b.vec_id AS id_b,
                   ROUND(list_cosine_similarity(a.v, b.v), 6) + 0.0 AS cos_r
            FROM bk a JOIN bk b
              ON a.bucket = b.bucket AND a.vec_id < b.vec_id
            WHERE list_cosine_similarity(a.v, b.v) >= 0.2""",
        "ann_cosine_topk": """
            WITH q AS (SELECT vec_id qid, embedding qv FROM embeddings
                       WHERE vec_id < 5),
            s AS (
              SELECT q.qid query_id, e.vec_id neighbor_id,
                     list_cosine_similarity(CAST(e.embedding AS DOUBLE[]),
                                            CAST(q.qv AS DOUBLE[])) sim
              FROM embeddings e, q WHERE e.vec_id <> q.qid),
            r AS (SELECT query_id, neighbor_id,
                         CAST(ROW_NUMBER() OVER (PARTITION BY query_id
                              ORDER BY sim DESC, neighbor_id ASC) AS INTEGER) rank
                  FROM s)
            SELECT query_id, neighbor_id, rank FROM r WHERE rank <= 3""",
        "text_stats": f"""
            WITH w AS (SELECT doc_id, text, string_split(text, ' ') w
                       FROM documents),
            h AS (SELECT doc_id, text, w,
                         {hits['de']} h_de, {hits['en']} h_en, {hits['es']} h_es,
                         {hits['fr']} h_fr, {hits['zh']} h_zh
                  FROM w)
            SELECT doc_id,
                   CAST(len(w) AS INTEGER) AS n_tok,
                   CAST(h_en AS INTEGER) AS sw_en,
                   {lang_case} AS lang_pred,
                   {fp_expr} AS fp,
                   ROUND((
                     (CASE WHEN length(text) > 0 THEN
                        CAST(length(regexp_replace(text, '[^a-zA-Z ]', '', 'g'))
                             AS DOUBLE) / length(text) ELSE 0 END)
                     + LEAST(CASE WHEN len(w) > 0 THEN
                         CAST(h_en AS DOUBLE) / len(w) ELSE 0 END * 5.0, 1.0)
                     + LEAST(CAST(len(w) AS DOUBLE) / 100.0, 1.0)
                   ) / 3.0, 6) AS quality
            FROM h""",
        "column_similarity": """
            WITH n AS (SELECT COUNT(*) c FROM embeddings)
            SELECT e.vec_id AS left_id,
                   CAST((e.vec_id * 7 + 3) % n.c AS INTEGER) AS right_id,
                   ROUND(list_cosine_similarity(
                       CAST(e.embedding AS DOUBLE[]),
                       CAST(r.embedding AS DOUBLE[])), 6) + 0.0 AS cos_sim
            FROM embeddings e, n
            JOIN embeddings r ON r.vec_id = (e.vec_id * 7 + 3) % n.c""",
        "tokens_pipeline": f"""
            WITH t AS (
              SELECT doc_id,
                     list_transform(string_split(text, ' '),
                                    tk -> CAST({_md5h('tk')} % 50000
                                               AS INTEGER)) tokens
              FROM documents)
            SELECT array_to_string(list_transform(
                     (tokens[1:16] ||
                      list_transform(range(16), i -> CAST(0 AS INTEGER)))[1:16],
                     x -> CAST(x AS VARCHAR)), ',') AS tokens16,
                   doc_id,
                   CAST(len(tokens) AS INTEGER) AS n_tok
            FROM t""",
        "reduce_dtype": """
            SELECT l_orderkey, l_quantity,
                   CAST(l_linenumber AS TINYINT) AS linenum_small
            FROM lineitem""",
        "filter_dropna_rename": """
            SELECT CASE WHEN value > 150 THEN NULL ELSE value END AS value2_clean,
                   event_id
            FROM events
            WHERE (CASE WHEN value > 150 THEN NULL ELSE value END) IS NOT NULL
              AND (CASE WHEN value > 150 THEN NULL ELSE value END) > 100""",
    }

    # consolidated text-signal row: the three per-doc bodies above,
    # joined on doc_id exactly as the Spark query joins them (LEFT for
    # repetition — docs under 2 words have no 2-grams)
    o["text_signals"] = f"""
        SELECT ts.doc_id, ts.n_tok, ts.sw_en, ts.lang_pred, ts.fp,
               ts.quality,
               tr.ngram_count, tr.distinct_ngrams, tr.top_ngram_count,
               tr.dup_ngram_frac, tr.top_ngram_char_frac,
               tr.dup_ngram_char_frac,
               ps.scrubbed, ps.n_url, ps.n_email, ps.n_ipv4
        FROM ({o["text_stats"]}) ts
        LEFT JOIN ({o["text_repetition"]}) tr ON ts.doc_id = tr.doc_id
        JOIN ({o["pii_scrub"]}) ps ON ts.doc_id = ps.doc_id"""

    # context-window chunking: per-word-length token arrays (stable
    # ints across engines), 12-token windows every 5, min_tail=3
    o["chunk_sequences"] = """
        WITH t AS (
          SELECT doc_id,
                 list_transform(string_split(text, ' '),
                                w -> CAST(len(w) AS INTEGER)) tokens
          FROM documents),
        base AS (
          SELECT doc_id, tokens,
                 unnest(generate_series(0, (len(tokens) - 1) // 5))
                   AS chunk_id
          FROM t WHERE len(tokens) > 0),
        win AS (
          SELECT doc_id, chunk_id, chunk_id * 5 AS chunk_start,
                 list_slice(tokens, chunk_id * 5 + 1,
                            chunk_id * 5 + 12) AS toks
          FROM base)
        SELECT doc_id, CAST(chunk_id AS INTEGER) AS chunk_id,
               CAST(chunk_start AS INTEGER) AS chunk_start,
               array_to_string(list_transform(
                   toks, x -> CAST(x AS VARCHAR)), ',') AS chunk_toks,
               CAST(len(toks) AS INTEGER) AS n_tok
        FROM win WHERE len(toks) >= 3 OR chunk_id = 0"""

    # BPE trainer's distributed pass: word counts with the shared
    # ASCII-exact pretokenizer + deterministic top-300. The regex is
    # built from chr() so the tab/newline bytes survive SQL quoting.
    o["bpe_word_counts"] = """
        WITH w AS (
          SELECT unnest(regexp_extract_all(lower(text),
                   '[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ' || chr(9) || chr(10)
                   || chr(13) || ']')) AS word
          FROM documents WHERE text IS NOT NULL)
        SELECT word, CAST(COUNT(*) AS BIGINT) AS cnt
        FROM w GROUP BY word
        ORDER BY cnt DESC, word ASC LIMIT 300"""
    return o
