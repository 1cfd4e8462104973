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
