"""Ports of the remaining reference op unit tests not yet mirrored:
tests/unit/ops/test_list_slice.py:31-113 (the full slice/pad matrix),
test_hash_bucket.py:60-81 (list hashing consistency),
test_normalize.py:123-139 (float64 upcast / large magnitudes),
test_value_count.py:63-79 (value_count schema property)."""

import math

import pandas as pd
import pytest

import nvtabular_spark as nvt
from nvtabular_spark import ops


@pytest.fixture(scope="module")
def ydf(spark):
    return spark.createDataFrame(pd.DataFrame(
        {"y": [[0, 1, 2, 2, 767], [1, 2, 2, 3], [1, 223, 4]],
         "k": [0, 1, 2]}))


def _apply(spark, ydf, op):
    out = nvt.Workflow((["y"] >> op) + ["k"]).transform(ydf)
    pdf = out.toPandas().sort_values("k")
    return [list(v) for v in pdf["y"]]


# reference test_list_slice:31-66 — every slice window shape
@pytest.mark.parametrize("args,kwargs,expected", [
    ((0, 2), {}, [[0, 1], [1, 2], [1, 223]]),
    ((3, 5), {}, [[2, 767], [3], []]),
    ((4, 10), {}, [[767], [], []]),
    ((100, 20000), {}, [[], [], []]),
    ((-4,), {}, [[1, 2, 2, 767], [1, 2, 2, 3], [1, 223, 4]]),
    ((-3, -1), {}, [[2, 2], [2, 2], [1, 223]]),
])
def test_list_slice_matrix(spark, ydf, args, kwargs, expected):
    assert _apply(spark, ydf, ops.ListSlice(*args, **kwargs)) == expected


# reference test_list_slice_pad:69-104
@pytest.mark.parametrize("args,kwargs,expected", [
    ((5,), {"pad": True},
     [[0, 1, 2, 2, 767], [1, 2, 2, 3, 0], [1, 223, 4, 0, 0]]),
    ((1, 6), {"pad": True, "pad_value": 123},
     [[1, 2, 2, 767, 123], [2, 2, 3, 123, 123], [223, 4, 123, 123, 123]]),
    ((-4,), {"pad": True, "pad_value": -1},
     [[1, 2, 2, 767], [1, 2, 2, 3], [1, 223, 4, -1]]),
    ((-4, -1), {"pad": True, "pad_value": -1},
     [[1, 2, 2], [1, 2, 2], [1, 223, -1]]),
])
def test_list_slice_pad_matrix(spark, ydf, args, kwargs, expected):
    assert _apply(spark, ydf, ops.ListSlice(*args, **kwargs)) == expected


def test_hash_bucket_lists(spark):
    # reference test_hash_bucket.py:60-81 — element-wise list hashing,
    # equal strings hash equal, every bucket within num_buckets
    df = spark.createDataFrame(pd.DataFrame({
        "Authors": [["User_A"], ["User_A", "User_E"],
                    ["User_B", "User_C"], ["User_C"]],
        "Post": [1, 2, 3, 4]}))
    wf = nvt.Workflow((["Authors"] >> ops.HashBucket(num_buckets=10))
                      + ["Post"])
    out = wf.fit_transform(df).toPandas().sort_values("Post")
    authors = [list(v) for v in out["Authors"]]
    assert authors[0][0] == authors[1][0]      # 'User_A'
    assert authors[2][1] == authors[3][0]      # 'User_C'
    assert all(0 <= h < 10 for lst in authors for h in lst)


def test_normalize_upcastfloat64(spark):
    # reference test_normalize.py:123-139 — huge magnitudes must fit in
    # float64 moments without overflow/precision collapse
    vals = [1.9e10, 2.3e16, 3.4e18, 1.6e19]
    df = spark.createDataFrame(pd.DataFrame(
        {"x": vals, "k": [0, 1, 2, 3]}))
    op = ops.Normalize()
    wf = nvt.Workflow((["x"] >> op) + ["k"])
    out = wf.fit_transform(df).toPandas().sort_values("k")
    s = pd.Series(vals)
    assert math.isclose(s.mean(), op.means["x"], rel_tol=1e-4)
    assert math.isclose(s.std(), op.stds["x"], rel_tol=1e-4)
    expect = (s - op.means["x"]) / op.stds["x"]
    assert (abs(expect.to_numpy() - out["x"].to_numpy()) <= 1e-2).all()


def test_value_count_schema_property(spark):
    # reference test_value_count.py:63-79 — ValueCount annotates the
    # fitted min/max list lengths on the output schema
    df = spark.createDataFrame(pd.DataFrame({"feature": [[1, 2], [3]]}))
    wf = nvt.Workflow(["feature"] >> ops.ValueCount())
    wf.fit(df)
    col = wf.output_schema["feature"]
    vc = col.properties.get("value_count")
    assert vc == {"min": 1, "max": 2}
