"""Property-based tests (hypothesis) — invariants over generated inputs.
The reference suite is example-based only; these guard the slicing and
encoding contracts against edge shapes."""
import numpy as np
import pandas as pd
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

import nvtabular_spark as nvt
from nvtabular_spark import ops

_lists = st.lists(
    st.lists(st.integers(min_value=-100, max_value=100), max_size=12),
    min_size=1, max_size=8)
_slices = st.tuples(st.integers(-6, 6), st.integers(-6, 6))


@settings(max_examples=12, deadline=None,
          suppress_health_check=list(HealthCheck))
@given(data=_lists, sl=_slices)
def test_listslice_matches_python_slicing(spark, data, sl):
    start, end = sl
    pdf = pd.DataFrame({"l": data, "rid": range(len(data))})
    # explicit schema: all-empty list columns can't be inferred
    df = spark.createDataFrame(pdf.astype({"rid": "int64"}),
                               schema="l array<int>, rid long")
    out = nvt.Workflow((["l"] >> ops.ListSlice(start, end)) + ["rid"]) \
        .transform(df).orderBy("rid").toPandas()
    got = [list(x) for x in out["l"]]
    exp = [list(x[start:end]) for x in data]
    assert got == exp


@settings(max_examples=8, deadline=None,
          suppress_health_check=list(HealthCheck))
@given(vals=st.lists(st.sampled_from(["a", "b", "c", "d", None]),
                     min_size=1, max_size=40))
def test_categorify_code_contract(spark, vals):
    """For any value multiset: nulls → 1; codes ≥ 2; equal values get
    equal codes; more-frequent values get smaller codes (freq-desc)."""
    pdf = pd.DataFrame({"c": vals, "rid": range(len(vals))})
    df = spark.createDataFrame(pdf.astype({"rid": "int64"}),
                               schema="c string, rid long")
    out = nvt.Workflow((["c"] >> ops.Categorify()) + ["rid"]) \
        .fit_transform(df).orderBy("rid").toPandas()
    codes = dict(zip(pdf["c"], out["c"]))
    freq = pdf["c"].value_counts(dropna=True)
    for v, code in codes.items():
        if v is None:
            assert code == 1
        else:
            assert code >= 3  # 2 is the (single) OOV slot
    seen = [(v, codes[v]) for v in freq.index]
    for (v1, c1) in seen:
        for (v2, c2) in seen:
            if freq[v1] > freq[v2]:
                assert c1 < c2, (v1, v2, codes)
            elif freq[v1] == freq[v2] and v1 < v2:
                assert c1 < c2


_texts = st.lists(
    st.text(alphabet="abcdef gh", min_size=0, max_size=60),
    min_size=1, max_size=6)


@settings(max_examples=10, deadline=None,
          suppress_health_check=list(HealthCheck))
@given(texts=_texts)
def test_shingle_hashes_match_python_reference(spark, texts):
    """word_shingle_hashes (md5 family) must equal a direct python
    recomputation of the rolling-polynomial combine — the same formula
    the DuckDB oracles evaluate (shingle_hashes_sql)."""
    import hashlib
    from pyspark.sql import functions as F
    from nvtabular_spark.functions.dedup import (SHINGLE_P,
                                                 word_shingle_hashes)
    MASK32, MASK44 = (1 << 32) - 1, (1 << 44) - 1

    def py_hash64(s):
        return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)

    def py_shingles(text, n=3):
        w = text.split(" ")
        hw = [py_hash64(x) & MASK32 for x in w]
        out = []
        for i in range(max(0, len(w) - n + 1)):
            acc = hw[i]
            for j in range(1, n):
                acc = (acc & MASK44) * SHINGLE_P + hw[i + j]
            out.append(acc)
        return out

    pdf = pd.DataFrame({"t": texts, "rid": range(len(texts))})
    df = spark.createDataFrame(pdf)
    got = df.select(
        "rid", word_shingle_hashes(F.col("t"), 3, "md5").alias("sh")) \
        .orderBy("rid").toPandas()
    for text, sh in zip(pdf["t"], got["sh"]):
        assert list(sh) == py_shingles(text), text


@settings(max_examples=10, deadline=None,
          suppress_health_check=list(HealthCheck))
@given(texts=_texts)
def test_minhash_jaccard_consistency(spark, texts):
    """Minhash invariants: identical texts → identical signatures;
    signature values always in [0, MINHASH_PRIME); fewer than n words
    → NULL signature."""
    from pyspark.sql import functions as F
    from nvtabular_spark.functions.dedup import (MINHASH_PRIME,
                                                 minhash_signature)
    pdf = pd.DataFrame({"t": texts + texts,
                        "rid": range(2 * len(texts))})
    df = spark.createDataFrame(pdf)
    got = df.select(
        "rid", minhash_signature(F.col("t"), 6, 3, "xxhash64").alias("s")) \
        .orderBy("rid").toPandas()
    n = len(texts)
    for i in range(n):
        a, b = got["s"].iloc[i], got["s"].iloc[i + n]
        if a is None:
            assert b is None
            assert len(texts[i].split(" ")) < 3 or \
                all(len(x) == 0 for x in texts[i].split(" ")[:1])
        else:
            assert list(a) == list(b)
            assert all(0 <= v < MINHASH_PRIME for v in a)
