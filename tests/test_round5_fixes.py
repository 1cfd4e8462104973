"""Round-5 consolidation fixes:

* greedy packer: block-scan (cumsum + per-bin searchsorted) replaces
  the per-row Python loop — equivalence vs the naive recurrence and a
  wall-clock bound on a 1M-row shard
* connected_components: the module checkpoint lock is released when
  setup fails (unwritable checkpoint dir), not leaked
* strict-mode image decode chains the codec's real error for corrupt
  recognized-format payloads
* ngram_contamination: explicit broadcast override; hint survives
  missing plan statistics
"""

import numpy as np
import pandas as pd
import pytest

from nvtabular_spark.functions import dedup, packing


def _naive_greedy(toks, cap):
    bins = np.zeros(len(toks), dtype="int64")
    offs = np.zeros(len(toks), dtype="int64")
    b = fill = 0
    for j, t in enumerate(toks):
        if fill + t > cap and fill > 0:
            b += 1
            fill = 0
        bins[j] = b
        offs[j] = fill
        fill += t
    return bins, offs


def test_greedy_block_scan_matches_naive_recurrence():
    rng = np.random.default_rng(17)
    for _ in range(500):
        n = int(rng.integers(0, 80))
        cap = int(rng.integers(1, 30))
        # heavy zero mass + oversize values hit every boundary case:
        # zero-led bins, oversize-alone bins, exact-fit + trailing zeros
        toks = rng.choice([0, 0, 0, 1, 2, 3, 5, 8, 13, 35, 60],
                          size=n).astype("int64")
        nb, no = _naive_greedy(toks, cap)
        bb, bo = packing._greedy_pack_arrays(toks, cap)
        assert (nb == bb).all() and (no == bo).all(), \
            (cap, toks.tolist())


def test_greedy_block_scan_million_row_shard_wall():
    rng = np.random.default_rng(3)
    toks = rng.integers(0, 2048, size=1_000_000).astype("int64")
    import time
    # best-of-3 so one co-tenant contention burst cannot fail the gate
    # (the round-5 single-shot 5s bound failed twice under load); the
    # vectorized pack idles at ~30ms, so 2s still has ~60x margin
    wall = min(
        _timed(lambda: packing._greedy_pack_arrays(toks, 8192))
        for _ in range(3))
    assert wall < 2.0, f"1M-row shard took {wall:.2f}s (best of 3)"
    bins, offs = packing._greedy_pack_arrays(toks, 8192)
    # capacity respected (no oversize rows in this draw)
    fills = pd.DataFrame({"b": bins, "t": toks}).groupby("b")["t"].sum()
    assert (fills <= 8192).all()


def _timed(fn):
    import time
    t0 = time.time()
    fn()
    return time.time() - t0


def test_ckpt_lock_released_on_bad_checkpoint_dir(spark):
    df = spark.createDataFrame(
        pd.DataFrame({"src": [1, 2], "dst": [2, 3]}))
    with pytest.raises(Exception):
        dedup.connected_components(
            df, "src", "dst",
            checkpoint_dir="nosuchscheme://bad/path")
    # the lock must be free again: a no-checkpoint run and a second
    # failing run must both proceed without deadlock
    assert dedup._CKPT_LOCK.acquire(timeout=5)
    dedup._CKPT_LOCK.release()
    out = dedup.connected_components(df, "src", "dst").toPandas()
    assert out["component"].nunique() == 1


def test_ckpt_lock_released_when_set_checkpoint_dir_raises(
        spark, monkeypatch, tmp_path):
    """Pin the narrower leak path: a failure in the FIRST statements
    inside the guarded setup (setCheckpointDir itself raising) must
    still release the module lock."""
    df = spark.createDataFrame(
        pd.DataFrame({"src": [1, 2], "dst": [2, 3]}))

    def boom(_d):
        raise RuntimeError("setCheckpointDir refused")

    monkeypatch.setattr(spark.sparkContext, "setCheckpointDir", boom)
    with pytest.raises(RuntimeError, match="refused"):
        dedup.connected_components(
            df, "src", "dst", checkpoint_dir=str(tmp_path / "cc"))
    monkeypatch.undo()
    assert dedup._CKPT_LOCK.acquire(timeout=5)
    dedup._CKPT_LOCK.release()
    out = dedup.connected_components(df, "src", "dst").toPandas()
    assert out["component"].nunique() == 1


def test_strict_decode_chains_cause_for_corrupt_jpeg(spark):
    from nvtabular_spark.sources import multimodal as mm
    corrupt = b"\xff\xd8\xff\xe0" + b"\x00" * 40   # JPEG magic, garbage body
    df = spark.createDataFrame(
        pd.DataFrame({"doc_id": ["a"], "payload": [corrupt]}))
    with pytest.raises(Exception) as ei:
        mm.extract_image_features(df, strict=True).collect()
    # Py4J wraps the executor-side traceback into the message; the
    # chained diagnostic (error type of the real decode failure) must
    # survive rather than the misleading 'exotic format' text
    msg = str(ei.value)
    assert "recognized format" in msg
    assert "exotic image decode" not in msg


def test_contamination_broadcast_hint_without_stats(spark):
    corpus = spark.createDataFrame(pd.DataFrame({
        "doc_id": [1, 2],
        "text": ["a b c d e f g h i j", "k l m n o p q r s t"]}))
    bench = spark.createDataFrame(pd.DataFrame({
        "doc_id": [9], "text": ["a b c d e f g h i j"]}))
    # createDataFrame plans have no file statistics; the hint must
    # still be applied by default (benchmark known-small by contract)
    out = packing.ngram_contamination(corpus, bench, n=5)
    got = {r["doc_id"]: r["n_contaminated"] for r in out.collect()}
    assert got[1] > 0 and got[2] == 0
    # after execution the adaptive plan is final — the hint must have
    # produced a broadcast join despite the absent statistics
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan or "BroadcastExchange" in plan


def test_contamination_broadcast_false_forbids_hint(spark):
    corpus = spark.createDataFrame(pd.DataFrame({
        "doc_id": [1], "text": ["a b c d e f g h i j"]}))
    bench = spark.createDataFrame(pd.DataFrame({
        "doc_id": [9], "text": ["a b c d e f g h i j"]}))
    out = packing.ngram_contamination(corpus, bench, n=5, broadcast=False)
    # without the hint the optimizer may STILL pick broadcast from its
    # own size estimate; assert only that the override path runs and
    # returns the same answer
    got = {r["doc_id"]: r["n_contaminated"] for r in out.collect()}
    assert got[1] > 0


def test_pack_sequences_global_capacity_and_coverage(spark):
    import pandas as pd
    rng_rows = [(i, (i * 37) % 300) for i in range(400)]
    df = spark.createDataFrame(
        pd.DataFrame(rng_rows, columns=["doc_id", "n_tok"]))
    out = packing.pack_sequences_global(
        df, capacity=500, order_col="doc_id", tok_col="n_tok",
        id_col="doc_id", shards=4).toPandas()
    # every row assigned exactly once
    assert len(out) == 400 and out["doc_id"].nunique() == 400
    # capacity respected globally (no oversize rows in this draw)
    fills = out.groupby("bin_id")["n_tok"].sum()
    assert (fills <= 500).all()
    # offsets contiguous: within a bin, sorted offsets tile the fill.
    # Zero-token sequences occupy zero width, so they legitimately
    # share an offset with the next row — break offset ties by n_tok
    # so the zero-width rows are checked first at their position.
    for b, g in out.groupby("bin_id"):
        g = g.sort_values(["bin_offset", "n_tok"])
        expect = 0
        for _, r in g.iterrows():
            assert r["bin_offset"] == expect
            expect += r["n_tok"]


def test_pack_sequences_global_partitioning_invariant(spark):
    import pandas as pd
    df = spark.createDataFrame(pd.DataFrame(
        {"doc_id": list(range(200)),
         "n_tok": [(i * 13) % 100 for i in range(200)]}))
    a = packing.pack_sequences_global(
        df, capacity=300, order_col="doc_id", tok_col="n_tok",
        id_col="doc_id", shards=3).toPandas().sort_values("doc_id")
    b = packing.pack_sequences_global(
        df.repartition(7), capacity=300, order_col="doc_id",
        tok_col="n_tok", id_col="doc_id", shards=3) \
        .toPandas().sort_values("doc_id")
    assert (a[["bin_id", "bin_offset"]].to_numpy()
            == b[["bin_id", "bin_offset"]].to_numpy()).all()


def test_pack_sequences_global_oversize_rows_alone(spark):
    import pandas as pd
    df = spark.createDataFrame(pd.DataFrame(
        {"doc_id": [1, 2, 3, 4],
         "n_tok": [10, 999, 10, 999]}))   # 999 > capacity
    out = packing.pack_sequences_global(
        df, capacity=100, order_col="doc_id", tok_col="n_tok",
        id_col="doc_id", shards=2).toPandas()
    big = out[out["n_tok"] == 999]
    small = out[out["n_tok"] == 10]
    # each oversize row has its own bin, at offset 0
    assert big["bin_id"].nunique() == 2
    assert (big["bin_offset"] == 0).all()
    assert not set(big["bin_id"]) & set(small["bin_id"])


def test_temperature_fractions_math():
    from nvtabular_spark.functions.sampling import temperature_fractions
    fr = temperature_fractions({"a": 100, "b": 400, "c": 100}, alpha=0.5)
    # smallest strata keep everything; 4x stratum keeps (1/4)^0.5 = 1/2
    assert fr["a"] == 1.0 and fr["c"] == 1.0
    assert abs(fr["b"] - 0.5) < 1e-12
    # alpha=1 -> natural mix (keep all); alpha=0 -> equalize to n_min
    fr1 = temperature_fractions({"a": 10, "b": 1000}, alpha=1.0)
    assert fr1["b"] == 1.0
    fr0 = temperature_fractions({"a": 10, "b": 1000}, alpha=0.0)
    assert abs(fr0["b"] - 0.01) < 1e-12
    assert temperature_fractions({}, 0.5) == {}
    assert temperature_fractions({"a": 0, "b": 5}, 0.5)["a"] == 0.0


def test_temperature_mix_flattens_skew(spark):
    import pandas as pd
    from nvtabular_spark.functions import sampling
    rows = [(i, "big" if i < 900 else "small") for i in range(1000)]
    df = spark.createDataFrame(pd.DataFrame(rows, columns=["doc_id", "src"]))
    out = sampling.temperature_mix(df, alpha=0.0, strata_col="src",
                                   key_col="doc_id").toPandas()
    by = out.groupby("src").size()
    # alpha=0 equalizes: big downsampled to ~n_min (hash sampling is
    # exact-in-expectation; allow generous slack on 900 draws)
    assert by["small"] == 100
    assert 60 <= by["big"] <= 140
    # deterministic: re-run identical
    out2 = sampling.temperature_mix(df, alpha=0.0, strata_col="src",
                                    key_col="doc_id").toPandas()
    assert sorted(out["doc_id"]) == sorted(out2["doc_id"])


def test_pack_sequences_global_null_id_not_dropped(spark):
    import pandas as pd
    pdf = pd.DataFrame({"doc_id": ["a", None, "b", "c"],
                        "n_tok": [10, 20, 30, 40]})
    df = spark.createDataFrame(pdf)
    out = packing.pack_sequences_global(
        df, capacity=100, order_col="doc_id", tok_col="n_tok",
        id_col="doc_id", shards=2).toPandas()
    # the NULL-id row must survive (sentinel-hashed shard, not a NULL
    # join key) and land in a capacity-respecting bin like every other
    assert len(out) == 4
    assert out["n_tok"].sum() == 100
    fills = out.groupby("bin_id")["n_tok"].sum()
    assert (fills <= 100).all()


def test_quantile_bin_nan_excluded_from_fit(spark):
    import pandas as pd
    import nvtabular_spark as nvt
    from nvtabular_spark import ops as _ops
    pdf = pd.DataFrame({"x": [1.0, 2.0, 3.0, 4.0, 5.0, 6.0, 7.0, 8.0,
                              float("nan")] * 1,
                        "k": list(range(9))})
    df = spark.createDataFrame(pdf)
    op = _ops.QuantileBin(n_bins=4)
    wf = nvt.Workflow((["x"] >> op) + ["k"])
    out = wf.fit_transform(df).toPandas().sort_values("k")
    # boundaries fitted on [1..8] only — NaN must not poison the top
    # quartile (Spark percentile sorts NaN largest)
    import math
    assert all(not math.isnan(b) for b in op.boundaries["x"])
    assert set(out["x"].dropna()) == {0, 1, 2, 3}   # top bucket reachable
    assert out.loc[out["k"] == 8, "x"].isna().all()  # NaN row -> NULL


def test_pack_sequences_global_fractional_float_tokens(spark):
    import pandas as pd
    # 10 rows of 2.5 tokens: level-1 truncates per row (fill 20);
    # level-2 must weigh the bin at 20 too, not floor(sum)=25 — a
    # mismatch would open offset gaps inside merged global bins
    pdf = pd.DataFrame({"doc_id": list(range(12)),
                        "n_tok": [2.5] * 10 + [30.0, 40.0]})
    df = spark.createDataFrame(pdf)
    out = packing.pack_sequences_global(
        df, capacity=100, order_col="doc_id", tok_col="n_tok",
        id_col="doc_id", shards=1).toPandas()
    for b, g in out.groupby("bin_id"):
        g = g.sort_values(["bin_offset", "n_tok"])
        expect = 0
        for _, r in g.iterrows():
            assert r["bin_offset"] == expect, \
                (b, g[["doc_id", "n_tok", "bin_offset"]].to_dict())
            expect += int(r["n_tok"])


def test_packing_stats_global_bins(spark):
    import pandas as pd
    df = spark.createDataFrame(pd.DataFrame(
        {"doc_id": list(range(50)),
         "n_tok": [(i * 7) % 40 for i in range(50)]}))
    packed = packing.pack_sequences_global(
        df, capacity=120, order_col="doc_id", tok_col="n_tok",
        id_col="doc_id", shards=2)
    st = packing.packing_stats(packed, capacity=120,
                               shard_col=None).toPandas()
    assert set(st.columns) == {"bin_id", "n_seqs", "bin_tokens",
                               "fill_frac"}
    assert st["n_seqs"].sum() == 50
    assert (st["fill_frac"] <= 1.0).all()


def test_unconsumed_cheap_projection_sinks_above_window_exchange(spark):
    """Compiler sinks a cheap projection no other op consumes to the
    end of the plan: the derived (possibly wide) column is computed
    ABOVE the window's Exchange instead of being shuffled through it,
    and the values are unchanged."""
    import nvtabular_spark as nvt
    from nvtabular_spark import ops
    from nvtabular_spark.sources import tokenized_sequences
    data = tokenized_sequences(spark, 500, seed=42)
    pipe = ((["tokens"] >> ops.ListSlice(0, 8, pad=True, pad_value=0))
            + (["n_tok"] >> ops.Lag("entity_id", "ts", 1))
            + ["doc_id", "n_tok", "ts"])
    out = nvt.Workflow(pipe).fit_transform(data)
    plan = out._jdf.queryExecution().executedPlan().toString()
    lines = plan.splitlines()
    ex = [i for i, l in enumerate(lines) if "Exchange" in l]
    sl = [i for i, l in enumerate(lines) if "slice(" in l]
    assert sl and ex and max(sl) < min(ex), \
        "slice projection must sit above the window Exchange"
    got = out.orderBy("doc_id").toPandas()
    # value check vs the unsunk shape (slice consumed by a Rename is
    # not sinkable, so it computes below the window as before)
    ref_pipe = ((["tokens"] >> ops.ListSlice(0, 8, pad=True, pad_value=0)
                 >> ops.Rename(name="tokens"))
                + (["n_tok"] >> ops.Lag("entity_id", "ts", 1))
                + ["doc_id", "n_tok", "ts"])
    ref = nvt.Workflow(ref_pipe).fit_transform(data) \
        .orderBy("doc_id").toPandas()
    pd.testing.assert_frame_equal(
        got[sorted(got.columns)], ref[sorted(ref.columns)])
