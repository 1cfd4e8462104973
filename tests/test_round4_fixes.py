"""Round-4 regression tests: the r3 verdict/advice items.

* oracle-gate dtype sensitivity (the HUGEINT→float64 drift that shipped
  two driver reds in round 3 must now be caught locally)
* compiler: one dependency node consumed by TWO downstream ops
* connected_components driver-heap guard
* hyperplane_bits family validation
* rowops docstrings restored (dead-string-expression advice item)
* corrupt/truncated image bytes hit the non-strict fallback instead of
  killing the mapInPandas task
* planning-time count estimation replaces the eager full scan in
  prefix_filter="auto" / num_planes="auto"
"""
import sys
import warnings

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

import nvtabular_spark as nvt
from nvtabular_spark import ops
from nvtabular_spark.functions import ann, dedup, planning
from nvtabular_spark.sources import multimodal as mm

sys.path.insert(0, "/root/repo/scripts")
import check_oracle  # noqa: E402


# -- oracle gate hardening ---------------------------------------------------

def test_gate_catches_int_float_dtype_drift():
    """int64 137 vs float64 137.0 must NOT canonicalize equal (the
    round-3 masking bug: iterrows() upcast mixed rows to float)."""
    sdf = pd.DataFrame({"k": ["a"], "v": np.array([137], dtype="int64")})
    odf = pd.DataFrame({"k": ["a"], "v": np.array([137.0])})
    assert check_oracle.dtype_drift(sdf, odf) == [("v", "int64", "float64")]
    _, srows = check_oracle.canon(sdf)
    _, orows = check_oracle.canon(odf)
    assert srows != orows


def test_gate_passes_identical_dtypes():
    a = pd.DataFrame({"k": ["a", "b"], "v": [1.5, float("nan")],
                      "n": np.array([3, 4], dtype="int64")})
    b = pd.DataFrame({"k": ["b", "a"], "v": [float("nan"), 1.5],
                      "n": np.array([4, 3], dtype="int64")})
    assert check_oracle.dtype_drift(a, b) == []
    assert check_oracle.canon(a)[1] == check_oracle.canon(b)[1]


def test_gate_mixed_row_not_upcast():
    """A frame with BOTH an int and a float column keeps per-column
    typing in the canonical rows (regression for the iterrows bug)."""
    df = pd.DataFrame({"i": np.array([7], dtype="int64"), "f": [7.0]})
    _, rows = check_oracle.canon(df)
    assert rows == ["7.0|7"]  # sorted cols: f then i — float keeps .0


# -- compiler: shared dependency node ----------------------------------------

def test_dependency_node_with_two_consumers(spark):
    """ADVICE r3: two JoinGroupby ops sharing one cont_cols node raised
    a spurious 'collides with an existing column' ValueError because
    the first consumer's bridged column stayed in df_work."""
    rng = np.random.RandomState(3)
    pdf = pd.DataFrame({
        "cat1": rng.choice(["a", "b"], 60),
        "cat2": rng.choice(["x", "y", "z"], 60),
        "cost": rng.rand(60),
        "rid": np.arange(60),
    })
    df = spark.createDataFrame(pdf)

    dep = ["cost"] >> ops.NormalizeMinMax() >> ops.Rename(postfix="_nrm")
    jg1 = ["cat1"] >> ops.JoinGroupby(cont_cols=dep, stats=["mean"])
    jg2 = ["cat2"] >> ops.JoinGroupby(cont_cols=dep, stats=["mean"])
    wf = nvt.Workflow(jg1 + jg2 + ["rid"])
    got = wf.fit_transform(df).orderBy("rid").toPandas()
    assert "cat1_cost_nrm_mean" in got.columns
    assert "cat2_cost_nrm_mean" in got.columns

    # values match the hand-materialized equivalent
    lo, hi = pdf["cost"].min(), pdf["cost"].max()
    pdf["nrm"] = (pdf["cost"] - lo) / (hi - lo)
    for key, col in (("cat1", "cat1_cost_nrm_mean"),
                     ("cat2", "cat2_cost_nrm_mean")):
        exp = pdf.groupby(key)["nrm"].mean()
        np.testing.assert_allclose(
            got[col].to_numpy(),
            pdf[key].map(exp).to_numpy(), rtol=1e-5)


def test_dependency_collision_still_raises(spark):
    """A GENUINE collision (dependency output name already a live
    column bound to a different source) must still be rejected."""
    pdf = pd.DataFrame({"cat": ["a", "b"] * 5, "cost": np.arange(10.0),
                        "cost_nrm": np.arange(10.0)})
    df = spark.createDataFrame(pdf)
    dep = ["cost"] >> ops.NormalizeMinMax() >> ops.Rename(postfix="_nrm")
    jg = ["cat"] >> ops.JoinGroupby(cont_cols=dep, stats=["mean"])
    wf = nvt.Workflow(jg + ["cost_nrm"])
    with pytest.raises(ValueError, match="collides"):
        wf.fit_transform(df)


# -- connected_components heap guard -----------------------------------------

def test_driver_heap_guard_warns_on_small_heap(spark):
    # the test session runs with the default (unset ⇒ 1g) driver heap
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        fired = dedup._check_driver_heap(spark)
    if fired:
        assert any("driver.memory" in str(x.message) for x in w)
    else:  # conftest configured a big heap — guard must then stay quiet
        assert not w


def test_parse_jvm_mem():
    assert dedup._parse_jvm_mem("12g") == 12 << 30
    assert dedup._parse_jvm_mem("512m") == 512 << 20
    assert dedup._parse_jvm_mem("1024k") == 1 << 20
    # Spark parses suffix-less memory properties as MiB, not bytes —
    # spark.driver.memory=2048 means 2 GiB and must NOT warn
    assert dedup._parse_jvm_mem("2048") == 2048 << 20
    # two-letter suffixes are valid Spark syntax too
    assert dedup._parse_jvm_mem("2gb") == 2 << 30
    assert dedup._parse_jvm_mem("512mb") == 512 << 20
    assert dedup._parse_jvm_mem("bogus") is None


def test_components_still_correct_under_guard(spark):
    pairs = spark.createDataFrame(
        pd.DataFrame({"id_a": [1, 2, 10], "id_b": [2, 3, 11]}))
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        comp = dedup.connected_components(pairs).toPandas()
    got = dict(zip(comp["id"], comp["component"]))
    assert got == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10}


# -- hyperplane_bits family validation ---------------------------------------

def test_hyperplane_bits_rejects_non_md5():
    with pytest.raises(ValueError, match="family"):
        ann.hyperplane_bits(F.col("v"), dim=4, family="xxhash64")


# -- rowops docstrings (dead string expression advice item) ------------------

def test_rowops_docstrings_restored():
    from nvtabular_spark.operators import rowops
    for cls in (rowops.Rename, rowops.Filter, rowops.Dropna,
                rowops.AddMetadata, rowops.DropLowCardinality):
        assert cls.__doc__, f"{cls.__name__} lost its docstring"
        assert cls.preserves_dtype is True


# -- corrupt image bytes fall back in non-strict mode ------------------------

def test_corrupt_jpeg_falls_back_not_crashes(spark):
    """Truncated JPEG (struct.error/IndexError inside the codec) and a
    progressive-SOF2 header (NotImplementedError) must yield the
    deterministic fake in non-strict mode — previously they killed the
    whole task (ADVICE r3)."""
    trunc = b"\xff\xd8\xff\xe0" + b"\x00\x04JF"           # truncated
    sof2 = (b"\xff\xd8\xff\xc2" + b"\x00\x0b\x08\x00\x10"
            b"\x00\x10\x01\x01\x11\x00")                   # progressive
    pdf = pd.DataFrame({"doc_id": ["t", "p"],
                        "img": [bytearray(trunc), bytearray(sof2)]})
    df = spark.createDataFrame(pdf)
    out = mm.extract_image_features(df, binary_col="img",
                                    feature_dim=8).toPandas()
    assert len(out) == 2
    assert all(f is not None and len(f) > 0 for f in out["features"])
    # deterministic: same bytes → same fake features
    out2 = mm.extract_image_features(df, binary_col="img",
                                     feature_dim=8).toPandas()
    for a, b in zip(out.sort_values("doc_id")["features"],
                    out2.sort_values("doc_id")["features"]):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


# -- planning-time count estimation ------------------------------------------

def test_estimate_row_count_on_parquet(spark, tmp_path):
    p = str(tmp_path / "t.parquet")
    spark.range(10_000).withColumn("x", F.rand(7)).write.parquet(p)
    df = spark.read.parquet(p)
    est = planning.estimate_row_count(df)
    assert est is not None and est > 0
    # order-of-magnitude knob: within ~30x is all num_planes needs
    assert 10_000 / 30 <= est <= 10_000 * 30


def test_at_least_n_rows(spark):
    df = spark.range(500)
    assert planning.at_least_n_rows(df, 100)
    assert planning.at_least_n_rows(df, 500)
    assert not planning.at_least_n_rows(df, 501)


def test_ngram_auto_no_full_count_same_result(spark):
    pdf = pd.DataFrame({
        "doc_id": [f"d{i}" for i in range(30)],
        "text": [f"the quick brown fox {i % 3} jumps over the lazy dog"
                 for i in range(30)],
    })
    df = spark.createDataFrame(pdf)
    auto = dedup.ngram_jaccard_pairs(df, threshold=0.5).toPandas()
    # approx_count skips even the LIMIT probe; same (naive) plan choice
    hinted = dedup.ngram_jaccard_pairs(df, threshold=0.5,
                                       approx_count=30).toPandas()
    key = lambda d: sorted(map(tuple, d[["id_a", "id_b"]].to_numpy()))
    assert key(auto) == key(hinted)
    # and the explicit prefix plan agrees (exactness unchanged)
    pref = dedup.ngram_jaccard_pairs(df, threshold=0.5,
                                     prefix_filter=True).toPandas()
    assert key(pref) == key(auto)


def test_embedding_near_dups_auto_planes_with_hint(spark):
    rng = np.random.RandomState(5)
    base = rng.randn(8, 16).astype("float64")
    rows = []
    for i, v in enumerate(base):
        rows.append((f"v{i}", (v / np.linalg.norm(v)).tolist()))
        w = v + rng.randn(16) * 0.01
        rows.append((f"v{i}_dup", (w / np.linalg.norm(w)).tolist()))
    df = spark.createDataFrame(rows, ["vec_id", "embedding"])
    got = ann.embedding_near_dups(df, threshold=0.98, dim=16,
                                  num_planes="auto",
                                  approx_count=16).toPandas()
    found = set(map(tuple, got[["id_a", "id_b"]].to_numpy()))
    assert (f"v0", f"v0_dup") in found


# -- post-review fixes (round-4 code review) ---------------------------------

def test_group_pairs_excludes_duplicate_id_self_pairs(spark):
    """Duplicate ids in one bucket must not yield (id, id) pairs — the
    join formulation's strict a.id < b.id excluded them; the in-array
    expansion must match."""
    rows = [("d1", [1.0, 0.0]), ("d1", [1.0, 0.0]), ("d2", [1.0, 0.01])]
    df = spark.createDataFrame(rows, ["vec_id", "embedding"])
    got = ann.embedding_near_dups(df, threshold=0.9, dim=2,
                                  num_planes=2).toPandas()
    assert (got["id_a"] != got["id_b"]).all()
    assert ("d1", "d2") in set(map(tuple, got[["id_a", "id_b"]].to_numpy()))


def test_group_pairs_large_group_no_single_buffer_blowup(spark):
    """A hot bucket near the cap must stream its C(n,2) expansion, not
    materialize it as one array value (the old single-flatten plan
    built ~n²/2 structs in one row)."""
    n = 3000
    pdf = pd.DataFrame({"doc": [f"d{i:05d}" for i in range(n)],
                        "sz": [10] * n, "sh": [7] * n})
    df = spark.createDataFrame(pdf)
    from nvtabular_spark.functions.dedup import _group_pairs
    cnt = _group_pairs(df, ["sh"], cap=n).count()
    assert cnt == n * (n - 1) // 2


def test_avi_video_not_stream_zero(spark):
    """An AVI whose audio strl precedes the video strl numbers video
    chunks '01dc' — the walker must follow the stream number instead
    of silently returning zero frames."""
    import struct as st

    from nvtabular_spark.sources.avi import (_chunk, _list,
                                             avi_mjpeg_frames)
    from nvtabular_spark.sources.jpeg import encode_jpeg

    img = np.full((8, 8, 3), 99, dtype=np.uint8)
    jp = encode_jpeg(img)
    auds_strh = b"auds" + b"\x00" * 52
    vids_strh = (b"vids" + b"MJPG"
                 + st.pack("<IHHIIIIIIII", 0, 0, 0, 0, 1, 10, 0, 1, 0,
                           0xFFFFFFFF, 0) + st.pack("<4H", 0, 0, 8, 8))
    hdrl = _list(b"hdrl", _chunk(b"avih", b"\x00" * 56)
                 + _list(b"strl", _chunk(b"strh", auds_strh))
                 + _list(b"strl", _chunk(b"strh", vids_strh)))
    movi = _list(b"movi", _chunk(b"01dc", jp))
    body = b"AVI " + hdrl + movi
    avi = b"RIFF" + st.pack("<I", len(body)) + body
    assert avi_mjpeg_frames(avi) == [jp]


def test_fit_schema_list_categorify_dtype(spark):
    """Categorify on a LIST column declares array<int>, not scalar int,
    in the schema-only fit."""
    from nvtabular_spark.plans.schema import ColumnSchema, Schema
    schema = Schema([ColumnSchema("toks", dtype="array<string>"),
                     ColumnSchema("cat", dtype="string")])
    wf = nvt.Workflow(["toks", "cat"] >> ops.Categorify())
    wf.fit_schema(schema)
    assert wf.output_schema["toks"].dtype == "array<int>"
    assert wf.output_schema["cat"].dtype == "int"


# -- sequence packing + contamination ----------------------------------------

def test_pack_sequences_greedy_capacity_invariant(spark):
    rng = np.random.RandomState(11)
    pdf = pd.DataFrame({
        "doc_id": [f"d{i:04d}" for i in range(300)],
        "entity_id": rng.choice(["e1", "e2", "e3"], 300),
        "ts": np.arange(300),
        "n_tok": rng.randint(1, 900, 300),
    })
    pdf.loc[0, "n_tok"] = 5000                    # overlong sequence
    df = spark.createDataFrame(pdf)
    from nvtabular_spark.functions import packing
    out = packing.pack_sequences(df, capacity=2048,
                                 strategy="greedy").toPandas()
    stats = out.groupby(["entity_id", "bin_id"])["n_tok"].agg(
        ["sum", "count"])
    # no bin exceeds capacity unless it holds exactly one overlong seq
    bad = stats[(stats["sum"] > 2048) & (stats["count"] > 1)]
    assert bad.empty, bad
    # offsets are the exclusive running total within the bin
    for (_, _), grp in out.groupby(["entity_id", "bin_id"]):
        grp = grp.sort_values(["ts", "doc_id"])
        assert grp["bin_offset"].tolist() == \
            [0] + grp["n_tok"].cumsum().tolist()[:-1]


def test_pack_sequences_prefix_vs_greedy_fill(spark):
    """Prefix bins may overflow by < one sequence; greedy never does.
    Both produce identical results when every shard fits one bin."""
    pdf = pd.DataFrame({
        "doc_id": [f"d{i}" for i in range(20)],
        "entity_id": ["e"] * 20,
        "ts": np.arange(20),
        "n_tok": [10] * 20,
    })
    df = spark.createDataFrame(pdf)
    from nvtabular_spark.functions import packing
    a = packing.pack_sequences(df, capacity=500).toPandas() \
        .sort_values("doc_id")
    b = packing.pack_sequences(df, capacity=500, strategy="greedy") \
        .toPandas().sort_values("doc_id")
    assert a[["bin_id", "bin_offset"]].to_numpy().tolist() == \
        b[["bin_id", "bin_offset"]].to_numpy().tolist()
    st = packing.packing_stats(
        packing.pack_sequences(df, capacity=100), capacity=100) \
        .toPandas()
    assert (st["bin_tokens"] == 100).all()
    assert (st["fill_frac"] == 1.0).all()


def test_ngram_contamination_planted(spark):
    from nvtabular_spark.functions import packing
    bench = spark.createDataFrame(pd.DataFrame({
        "doc_id": [100],
        "text": ["alpha beta gamma delta epsilon zeta eta theta"],
    }))
    corpus = spark.createDataFrame(pd.DataFrame({
        "doc_id": [1, 2, 3],
        "text": [
            "alpha beta gamma delta epsilon zeta eta theta",  # fully in
            "alpha beta gamma delta epsilon something else here now",
            "totally unrelated words that never appear in benchmark x",
        ],
    }))
    out = packing.ngram_contamination(corpus, bench, n=5) \
        .orderBy("doc_id").toPandas()
    fr = out.set_index("doc_id")["contamination_frac"]
    assert fr[1] == 1.0
    assert 0.0 < fr[2] < 1.0
    assert fr[3] == 0.0


def test_pack_greedy_null_tokens_match_prefix_semantics(spark):
    """Null token counts contribute 0 in BOTH strategies (prefix's
    F.sum skips nulls; greedy must not NaN-poison the shard)."""
    pdf = pd.DataFrame({
        "doc_id": ["a", "b", "c", "d"],
        "entity_id": ["e"] * 4,
        "ts": [1, 2, 3, 4],
        "n_tok": [10.0, None, 20.0, 30.0],
    })
    df = spark.createDataFrame(pdf)
    from nvtabular_spark.functions import packing
    g = packing.pack_sequences(df, capacity=100, strategy="greedy") \
        .orderBy("ts").toPandas()
    p = packing.pack_sequences(df, capacity=100) \
        .orderBy("ts").toPandas()
    assert g["bin_offset"].tolist() == [0, 10, 10, 30]
    assert p["bin_offset"].tolist() == g["bin_offset"].tolist()


def test_contamination_reports_short_docs_with_zeros(spark):
    from nvtabular_spark.functions import packing
    bench = spark.createDataFrame(
        pd.DataFrame({"doc_id": [9], "text": ["a b c d e f g"]}))
    corpus = spark.createDataFrame(pd.DataFrame({
        "doc_id": [1, 2],
        "text": ["a b c d e f g", "too short"]}))
    out = packing.ngram_contamination(corpus, bench, n=5) \
        .orderBy("doc_id").toPandas()
    assert out["doc_id"].tolist() == [1, 2]          # short doc present
    assert out.loc[1, "n_ngrams"] == 0
    assert out.loc[1, "contamination_frac"] == 0.0
    assert out.loc[0, "contamination_frac"] == 1.0


# -- deterministic sampling ---------------------------------------------------

def test_split_train_holdout_disjoint_exhaustive(spark):
    from nvtabular_spark.functions import sampling
    df = spark.range(2000).withColumnRenamed("id", "doc_id")
    train, hold = sampling.split_train_holdout(df, 0.1, seed=5)
    nt, nh = train.count(), hold.count()
    assert nt + nh == 2000
    assert train.join(hold, "doc_id").count() == 0
    assert 100 < nh < 320                      # ~10% within tolerance


def test_deterministic_sample_stable_under_repartition(spark):
    from nvtabular_spark.functions import sampling
    df = spark.range(1000).withColumnRenamed("id", "doc_id")
    a = set(r["doc_id"] for r in
            sampling.deterministic_sample(df, 0.25, seed=2).collect())
    b = set(r["doc_id"] for r in sampling.deterministic_sample(
        df.repartition(13), 0.25, seed=2).collect())
    assert a == b and 180 < len(a) < 320
    # different seed → different membership
    c = set(r["doc_id"] for r in
            sampling.deterministic_sample(df, 0.25, seed=3).collect())
    assert a != c


# -- workflow text ops + curation pipeline ------------------------------------

def test_text_ops_in_workflow(spark, tmp_path):
    from nvtabular_spark.functions import text as tf
    pdf = pd.DataFrame({
        "doc_id": [1, 2],
        "text": ["the cat and the dog sat at http://x.example/a today",
                 "der Hund ist nicht mit der Katze hier"],
    })
    df = spark.createDataFrame(pdf)
    wf = nvt.Workflow(
        (["text"] >> ops.LangId())
        + (["text"] >> ops.QualityScore())
        + (["text"] >> ops.TokenCount())
        + (["text"] >> ops.ScrubPII())
        + ["doc_id"])
    out = wf.fit_transform(df).orderBy("doc_id").toPandas()
    assert out["text_lang"].tolist() == ["en", "de"]
    assert "<URL>" in out["text"].iloc[0]
    # values equal the direct column functions
    direct = df.select(
        "doc_id", tf.token_count(F.col("text")).alias("n")) \
        .orderBy("doc_id").toPandas()
    assert out["text_n_tok"].tolist() == direct["n"].tolist()
    assert ((out["text_quality"] >= 0) & (out["text_quality"] <= 1)).all()

    # save/load round-trips the new op family
    p = str(tmp_path / "textwf")
    wf.save(p)
    wf2 = nvt.Workflow.load(p, spark=spark)
    again = wf2.transform(df).orderBy("doc_id").toPandas()
    assert again["text_lang"].tolist() == out["text_lang"].tolist()
    assert again["text"].iloc[0] == out["text"].iloc[0]


def test_curation_pipeline_end_to_end(spark):
    sys.path.insert(0, "/root/repo/examples")
    import curation_pipeline
    counts = curation_pipeline.curate(spark, "/root/testdata/sf0.001",
                                      capacity=512)
    assert counts["input"] == 500
    assert counts["after_exact_dedup"] <= counts["input"]
    assert counts["after_fuzzy_dedup"] < counts["input"]
    # CCNet tail drop keeps roughly the best two thirds
    assert counts["after_ppl_filter"] < counts["after_quality_filter"]
    assert counts["after_ppl_filter"] >= \
        counts["after_quality_filter"] // 2
    assert counts["after_decontamination"] <= \
        counts["after_ppl_filter"]
    assert counts["train"] + counts["holdout"] <= \
        counts["after_decontamination"]
    assert counts["bins"] > 0 and 0 < counts["avg_fill"] <= 1.0
    # stage 8: BPE fit on the train split, chunked to the context
    # window, re-packed by real token counts — the terminal
    # north-rule sequence table
    assert counts["bpe_vocab"] > 0
    assert counts["sequences"] >= counts["train"]
    assert counts["token_bins"] > 0
    assert 0 < counts["token_avg_fill"] <= 1.0
    # stage 9: release gates — the train split must not reshape the
    # mixed corpus it was drawn from (PSI well under the 0.1 stability
    # rule of thumb on both the length distribution and the source
    # mix; train is ~95% of mixed, so this is tight at any scale —
    # unlike holdout-vs-train, which is sampling noise on a tiny
    # holdout and is reported, not gated), and the ingest ledger must
    # find novel docs in the increment without re-reading corpus text
    assert abs(counts["split_psi"]) < 0.1
    assert abs(counts["split_psi_source"]) < 0.1
    assert "holdout_psi_info" in counts
    assert 0 <= counts["novel_in_increment"] <= counts["increment"]


def test_components_with_disk_checkpoint(spark, tmp_path):
    """checkpoint_dir switches the iteration to reliable disk
    checkpoints (bounded memory at any scale) — same labels, and
    rounds older than the last two are pruned from disk."""
    import os
    # a chain forces several convergence rounds
    n = 40
    pairs = spark.createDataFrame(
        pd.DataFrame({"id_a": list(range(n - 1)),
                      "id_b": list(range(1, n))}))
    ck = str(tmp_path / "ckpt")
    comp = dedup.drop_near_duplicates(
        spark.createDataFrame(pd.DataFrame({"doc_id": list(range(n))})),
        pairs, checkpoint_dir=ck).toPandas()
    assert comp["doc_id"].tolist() == [0]        # one chain, min-id wins
    rdds = [os.path.join(r, d)
            for r, ds, _ in os.walk(ck) for d in ds
            if d.startswith("rdd-")]
    assert 0 < len(rdds) <= 2, rdds              # stale rounds pruned
