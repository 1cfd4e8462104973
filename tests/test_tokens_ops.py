"""Token-pipeline ops over the north-rule tokenized-sequence table:
context-window chunking (this file also hosts the BPE trainer tests).

The tokenized table (doc_id, tokens:array<int>, n_tok, source) is
synthesized deterministically in pandas and fed byte-identically to
Spark and DuckDB, so cross-engine checks compare the op, not a
tokenizer.
"""

import numpy as np
import pandas as pd
import pytest

from pyspark.sql import functions as F

from nvtabular_spark.functions import packing


def _tok_table(n_docs=60, seed=7):
    rng = np.random.default_rng(seed)
    rows = []
    for i in range(n_docs):
        n = int(rng.integers(0, 40))
        rows.append({
            "doc_id": f"d{i:03d}",
            "tokens": rng.integers(0, 50000, size=n).astype("int32").tolist(),
            "n_tok": n,
            "source": ["web", "books", "code"][i % 3],
        })
    # explicit edge rows: empty array and a null array
    rows.append({"doc_id": "d_empty", "tokens": [], "n_tok": 0,
                 "source": "web"})
    rows.append({"doc_id": "d_null", "tokens": None, "n_tok": 0,
                 "source": "web"})
    return pd.DataFrame(rows)


def _spark_toks(spark, pdf):
    return spark.createDataFrame(
        pdf, "doc_id string, tokens array<int>, n_tok int, source string")


def _chunk_ref(pdf, max_len, stride=None, min_tail=1):
    """Naive python reference for chunk_sequences."""
    stride = max_len if stride is None else stride
    out = []
    for r in pdf.itertuples(index=False):
        toks = r.tokens
        if toks is None or len(toks) == 0:
            continue
        k = 0
        while k * stride < len(toks):
            w = list(toks[k * stride: k * stride + max_len])
            if len(w) >= min_tail or k == 0:
                out.append((r.doc_id, k, k * stride, w, len(w), r.source))
            k += 1
    return sorted(out)


def _collect_chunks(df):
    rows = df.select("doc_id", "chunk_id", "chunk_start", "tokens",
                     "n_tok", "source").collect()
    return sorted((r.doc_id, r.chunk_id, r.chunk_start,
                   list(r.tokens), r.n_tok, r.source) for r in rows)


def test_chunk_disjoint_matches_reference(spark):
    pdf = _tok_table()
    got = _collect_chunks(packing.chunk_sequences(
        _spark_toks(spark, pdf), max_len=8))
    assert got == _chunk_ref(pdf, 8)


def test_chunk_overlap_matches_reference(spark):
    pdf = _tok_table(seed=11)
    got = _collect_chunks(packing.chunk_sequences(
        _spark_toks(spark, pdf), max_len=10, stride=4, min_tail=3))
    assert got == _chunk_ref(pdf, 10, stride=4, min_tail=3)


def test_chunk_concat_byte_equal_to_source(spark):
    """North-rule per-row token invariant: disjoint chunks reassemble
    to the exact source array."""
    pdf = _tok_table(seed=23)
    out = packing.chunk_sequences(_spark_toks(spark, pdf), max_len=7)
    re = (out.groupBy("doc_id")
          .agg(F.flatten(F.array_sort(F.collect_list(
              F.struct("chunk_id", "tokens"))).tokens).alias("re")))
    src = {r.doc_id: list(r.tokens) if r.tokens is not None else None
           for r in _spark_toks(spark, pdf).collect()}
    for r in re.collect():
        assert list(r.re) == src[r.doc_id]


def test_chunk_min_tail_keeps_only_chunk_zero(spark):
    pdf = pd.DataFrame({
        "doc_id": ["a", "b"],
        "tokens": [[1, 2, 3], [1, 2, 3, 4, 5, 6, 7, 8, 9]],
        "n_tok": [3, 9], "source": ["web", "web"]})
    out = packing.chunk_sequences(_spark_toks(spark, pdf),
                                  max_len=8, min_tail=4)
    got = {(r.doc_id, r.chunk_id): r.n_tok for r in out.collect()}
    # a: single 3-token window survives as the doc's only chunk
    # b: 8-token window kept, 1-token tail dropped (< min_tail)
    assert got == {("a", 0): 3, ("b", 0): 8}


def test_chunk_null_and_empty_produce_no_rows(spark):
    pdf = _tok_table(n_docs=0)
    out = packing.chunk_sequences(_spark_toks(spark, pdf), max_len=8)
    assert out.count() == 0


def test_chunk_validation():
    with pytest.raises(ValueError):
        packing.chunk_sequences(None, max_len=0)
    with pytest.raises(ValueError):
        packing.chunk_sequences(None, max_len=8, stride=0)
    with pytest.raises(ValueError):
        packing.chunk_sequences(None, max_len=8, stride=9)
    with pytest.raises(ValueError):
        packing.chunk_sequences(None, max_len=8, min_tail=0)


def test_chunk_plan_is_pure_codegen(spark):
    """No shuffle, no Python on data: the plan must contain neither an
    Exchange nor any python/pandas eval node."""
    pdf = _tok_table(seed=3)
    out = packing.chunk_sequences(_spark_toks(spark, pdf), max_len=8)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    assert "Python" not in plan and "ArrowEval" not in plan


def test_chunk_duckdb_equivalence(spark):
    """Cross-engine: same pandas table through DuckDB SQL."""
    duckdb = pytest.importorskip("duckdb")
    pdf = _tok_table(seed=42)
    got = _collect_chunks(packing.chunk_sequences(
        _spark_toks(spark, pdf), max_len=6, stride=3, min_tail=2))
    con = duckdb.connect()
    con.register("toks", pdf)
    oracle = con.execute("""
        WITH base AS (
            SELECT doc_id, tokens, source,
                   unnest(generate_series(
                       0, (len(tokens) - 1) // 3)) AS chunk_id
            FROM toks WHERE tokens IS NOT NULL AND len(tokens) > 0
        ), win AS (
            SELECT doc_id, chunk_id, chunk_id * 3 AS chunk_start,
                   list_slice(tokens, chunk_id * 3 + 1,
                              chunk_id * 3 + 6) AS tokens, source
            FROM base
        )
        SELECT doc_id, chunk_id, chunk_start, tokens,
               len(tokens) AS n_tok, source
        FROM win WHERE len(tokens) >= 2 OR chunk_id = 0
    """).fetchall()
    want = sorted((d, int(c), int(s), [int(t) for t in toks], int(n), src)
                  for d, c, s, toks, n, src in oracle)
    assert got == want


# ---------------------------------------------------------------- BPE

from collections import Counter

from nvtabular_spark.functions import bpe


def _naive_merges(word_counter, n_merges, min_pair_count=2):
    """From-scratch reference: recount every pair every iteration."""
    words = {w: list(bpe._word_symbols(w)) for w in word_counter}
    merges = []
    while len(merges) < n_merges:
        pc = Counter()
        for w, sym in words.items():
            c = word_counter[w]
            for p in zip(sym, sym[1:]):
                pc[p] += c
        if not pc:
            break
        best = min(pc.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        if pc[best] < min_pair_count:
            break
        a, b = best
        for w in words:
            words[w] = bpe._merge_word(words[w], a, b, a + b)
        merges.append(best)
    return merges


def _naive_encode(model, text):
    """Apply merges strictly in rank order (classic formulation)."""
    ids = []
    unk = model.vocab[bpe.UNK]
    for w in bpe._pretokenize_py(text, model.lowercase):
        sym = list(bpe._word_symbols(w))
        for a, b in model.merges:
            sym = bpe._merge_word(sym, a, b, a + b)
        ids.extend(model.vocab.get(s, unk) for s in sym)
    return ids


CORPUS = [
    "the quick brown fox jumps over the lazy dog",
    "the lazy dog sleeps, the quick fox runs!",
    "low lower lowest new newer newest",
    "Unicode: café naïve 東京 12345 mixed-case Words",
    "    ",
    "",
    None,
    "repeat repeat repeat repeat repeat",
]


@pytest.fixture(scope="module")
def corpus_df(spark):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(CORPUS)], "doc_id long, text string")


def test_word_counts_match_python(spark, corpus_df):
    got = {r.word: r.cnt for r in
           bpe.word_counts(corpus_df, lowercase=True).collect()}
    want = Counter()
    for t in CORPUS:
        if t is not None:
            want.update(bpe._pretokenize_py(t, True))
    assert got == dict(want)


def test_bpe_fit_matches_naive_reference(spark, corpus_df):
    model = bpe.bpe_fit(corpus_df, n_merges=40, min_pair_count=2)
    want = Counter()
    for t in CORPUS:
        if t is not None:
            want.update(bpe._pretokenize_py(t, True))
    assert model.merges == _naive_merges(want, 40)
    assert model.alphabet == sorted(
        {s for w in want for s in bpe._word_symbols(w)})


def test_bpe_fit_deterministic_across_partitionings(spark, corpus_df):
    m1 = bpe.bpe_fit(corpus_df, n_merges=30)
    m2 = bpe.bpe_fit(corpus_df.repartition(7), n_merges=30)
    assert m1.merges == m2.merges and m1.vocab == m2.vocab


def test_bpe_encode_matches_naive(spark, corpus_df):
    model = bpe.bpe_fit(corpus_df, n_merges=40)
    out = {r.doc_id: r.tokens for r in
           bpe.bpe_encode(corpus_df, model).collect()}
    for i, t in enumerate(CORPUS):
        if t is None:
            assert out[i] is None
        else:
            assert out[i] == _naive_encode(model, t), (i, t)


def test_bpe_round_trip_normalized_text(spark, corpus_df):
    """decode(encode(x)) == pretokenized words joined by spaces, for
    text whose alphabet was fully seen at fit time."""
    model = bpe.bpe_fit(corpus_df, n_merges=50)
    got = {r.doc_id: r.text_decoded for r in bpe.bpe_decode(
        bpe.bpe_encode(corpus_df, model), model).collect()}
    for i, t in enumerate(CORPUS):
        if t is None:
            assert got[i] is None
        else:
            assert got[i] == " ".join(bpe._pretokenize_py(t, True))


def test_bpe_model_save_load_round_trip(spark, corpus_df, tmp_path):
    model = bpe.bpe_fit(corpus_df, n_merges=25)
    p = str(tmp_path / "bpe.json")
    model.save(p)
    loaded = bpe.BPEModel.load(p)
    assert loaded.merges == model.merges
    assert loaded.vocab == model.vocab
    assert loaded.lowercase == model.lowercase


def test_bpe_unk_for_unseen_alphabet(spark, corpus_df):
    model = bpe.bpe_fit(corpus_df, n_merges=10)
    df = spark.createDataFrame([(0, "ŘŘŘ")], "doc_id long, text string")
    row = bpe.bpe_encode(df, model).collect()[0]
    assert row.tokens == [model.vocab[bpe.UNK]] * 3
    assert row.n_tok == 3


def test_bpe_fit_empty_corpus_raises(spark):
    df = spark.createDataFrame([(0, None)], "doc_id long, text string")
    with pytest.raises(ValueError):
        bpe.bpe_fit(df, n_merges=5)


def test_bpe_fit_plan_is_one_shuffle_topk(spark, corpus_df):
    """Fit's corpus job: one Exchange (word groupBy) + TakeOrdered —
    no global sort, no Python on data."""
    wc = bpe.word_counts(corpus_df)
    top = wc.orderBy(F.col("cnt").desc(), F.col("word").asc()).limit(100)
    plan = top._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") == 1
    assert "TakeOrderedAndProject" in plan
    assert "Python" not in plan and "ArrowEval" not in plan


def test_bpe_encode_on_documents_testdata(spark):
    """End-to-end on the real documents table: fit + encode, token
    arrays non-empty for non-empty docs, ids within vocab range."""
    docs = spark.read.parquet(
        "/root/testdata/sf0.001/documents.parquet").limit(200)
    model = bpe.bpe_fit(docs, n_merges=200, max_words=10_000)
    enc = bpe.bpe_encode(docs, model)
    stats = enc.agg(
        F.min("n_tok").alias("mn"),
        F.max(F.array_max("tokens")).alias("mx")).collect()[0]
    assert stats.mn >= 0
    assert stats.mx < model.vocab_size
    assert 2 < model.vocab_size


# ------------------------------------------------------- BPETokenize op

import nvtabular_spark as nvt
from nvtabular_spark import ops


def test_bpetokenize_workflow_matches_direct(spark, corpus_df):
    wf = nvt.Workflow(
        (["text"] >> ops.BPETokenize(n_merges=30)) + ["doc_id"])
    out = wf.fit_transform(corpus_df)
    model = bpe.bpe_fit(corpus_df, n_merges=30)
    want = {r.doc_id: r.tokens for r in
            bpe.bpe_encode(corpus_df, model, n_tok_col=None).collect()}
    got = {r.doc_id: r.text_tokens for r in out.collect()}
    assert got == want
    assert dict(out.dtypes)["text_tokens"] == "array<int>"


def test_bpetokenize_save_load_round_trip(spark, corpus_df, tmp_path):
    wf = nvt.Workflow(
        (["text"] >> ops.BPETokenize(n_merges=20)) + ["doc_id"])
    a = wf.fit_transform(corpus_df)
    p = str(tmp_path / "wf_bpe")
    wf.save(p)
    wf2 = nvt.Workflow.load(p, spark)
    b = wf2.transform(corpus_df)
    ra = sorted((r.doc_id, r.text_tokens) for r in a.collect())
    rb = sorted((r.doc_id, r.text_tokens) for r in b.collect())
    assert ra == rb
    def _walk(n, seen):
        if id(n) in seen:
            return
        seen.add(id(n))
        yield n
        for p in n.parents:
            yield from _walk(p, seen)
    op2 = [n.op for n in _walk(wf2.output_node, set())
           if isinstance(n.op, ops.BPETokenize)]
    assert op2 and op2[0].model.merges == bpe.bpe_fit(
        corpus_df, n_merges=20).merges


def test_bpetokenize_requires_fit(spark, corpus_df):
    wf = nvt.Workflow(["text"] >> ops.BPETokenize(n_merges=5))
    with pytest.raises(RuntimeError):
        wf.transform(corpus_df).collect()
