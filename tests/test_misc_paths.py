"""Small-path coverage: shuffled writes, dict-parameterized ops,
inner JoinExternal, callable Filter, inspect_dataset, synthetic_tabular."""
import os

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

import nvtabular_spark as nvt
from nvtabular_spark import ops
from nvtabular_spark.sources import (inspect_dataset, synthetic_tabular,
                                     write_shuffled)


def test_write_shuffled_per_partition(spark, tmp_path):
    df = spark.range(1000).select(F.col("id"))
    p = str(tmp_path / "out")
    write_shuffled(df, p, shuffle="per_partition", out_files=4, seed=7)
    back = spark.read.parquet(p)
    assert back.count() == 1000
    assert set(r["id"] for r in back.collect()) == set(range(1000))
    # rows within a file are shuffled: first file isn't sorted
    import glob
    f0 = sorted(glob.glob(p + "/part-*"))[0]
    ids = spark.read.parquet(f0).toPandas()["id"].tolist()
    assert ids != sorted(ids)


def test_bucketize_dict_boundaries(spark):
    df = spark.createDataFrame(pd.DataFrame({
        "a": [1.0, 5.0, 20.0], "b": [1.0, 5.0, 20.0], "rid": range(3)}))
    b = ops.Bucketize({"a": [2.0], "b": [2.0, 10.0]})
    out = nvt.Workflow((["a", "b"] >> b) + ["rid"]).transform(df) \
        .orderBy("rid").toPandas()
    assert out["a"].tolist() == [0, 1, 1]
    assert out["b"].tolist() == [0, 1, 2]


def test_hashbucket_dict_buckets(spark):
    df = spark.createDataFrame(pd.DataFrame({
        "a": ["x", "y"], "b": ["x", "y"], "rid": range(2)}))
    hb = ops.HashBucket({"a": 2, "b": 1000})
    out = nvt.Workflow((["a", "b"] >> hb) + ["rid"]).transform(df).toPandas()
    assert out["a"].between(0, 1).all()
    assert out["b"].between(0, 999).all()


def test_join_external_inner(spark):
    df = spark.createDataFrame(pd.DataFrame({
        "k": [1, 2, 3], "rid": range(3)}))
    ext = spark.createDataFrame(pd.DataFrame({"k": [1, 3], "v": ["a", "c"]}))
    j = ops.JoinExternal(ext, on="k", how="inner")
    out = nvt.Workflow(["rid"] >> j).transform(df).orderBy("rid").toPandas()
    assert len(out) == 2 and out["v"].tolist() == ["a", "c"]


def test_filter_column_predicate(spark):
    df = spark.createDataFrame(pd.DataFrame({"x": [1.0, -1.0, 3.0],
                                             "rid": range(3)}))
    out = nvt.Workflow((["x"] >> ops.Filter(F.col("x") > 0)) + ["rid"]) \
        .transform(df).toPandas()
    assert set(out["rid"]) == {0, 2}


def test_dataset_wrapper_api_parity(spark, tmp_path):
    """Reference user code shape: nvt.Dataset(path) → Workflow.fit →
    transform(...).to_ddf() → to_parquet()."""
    pdf = pd.DataFrame({"cat": ["a", "b", "a"], "rid": range(3)})
    p = str(tmp_path / "in")
    spark.createDataFrame(pdf).write.parquet(p)
    ds = nvt.Dataset(p, spark=spark)
    wf = nvt.Workflow((["cat"] >> ops.Categorify()) + ["rid"])
    out = wf.fit_transform(ds)
    # Dataset in -> Dataset out (reference contract)
    assert isinstance(out, nvt.Dataset)
    got = out.to_ddf().orderBy("rid").toPandas()
    assert got["cat"].tolist() == [3, 4, 3]
    out.to_parquet(str(tmp_path / "out"), shuffle=None)
    assert spark.read.parquet(str(tmp_path / "out")).count() == 3
    assert "cat" in out.schema.column_names


def test_filter_callable(spark):
    df = spark.createDataFrame(pd.DataFrame({"x": [1.0, -2.0, 3.0],
                                             "rid": range(3)}))
    out = nvt.Workflow(
        (["x"] >> ops.Filter(lambda d: d["x"] > 0)) + ["rid"]) \
        .transform(df).toPandas()
    assert set(out["rid"]) == {0, 2}


def test_inspect_dataset(spark):
    df = spark.createDataFrame(pd.DataFrame({
        "s": ["a", "b", "b"], "x": [1.0, 2.0, None]}))
    rep = inspect_dataset(df, exact_cardinality=True)
    assert rep["columns"]["s"]["cardinality"] == 2
    assert abs(rep["columns"]["x"]["null_frac"] - 1 / 3) < 1e-9


def test_synthetic_tabular_shape_and_determinism(spark):
    a = synthetic_tabular(spark, 300, seed=1, n_cats=3, n_conts=2) \
        .orderBy("row_id").toPandas()
    b = synthetic_tabular(spark, 300, seed=1, n_cats=3, n_conts=2,
                          partitions=5).orderBy("row_id").toPandas()
    assert list(a.columns) == ["row_id", "cat_0", "cat_1", "cat_2",
                               "cont_0", "cont_1", "mh_0", "label"]
    assert a["cat_0"].tolist() == b["cat_0"].tolist()
    assert [list(x) for x in a["mh_0"]] == [list(x) for x in b["mh_0"]]
    # power-law: head value should dominate
    vc = a["cat_0"].value_counts()
    assert vc.iloc[0] > vc.iloc[-1]


def test_to_parquet_partition_on(spark, tmp_path):
    """Reference Dataset.to_parquet(partition_on=...) — hive-style
    directory partitioning."""
    import os
    import pandas as pd
    from nvtabular_spark.sources import Dataset
    pdf = pd.DataFrame({"k": ["a", "b", "a", "b"], "v": [1, 2, 3, 4]})
    ds = Dataset(spark.createDataFrame(pdf))
    out = str(tmp_path / "po")
    ds.to_parquet(out, shuffle=None, partition_on=["k"])
    assert sorted(d for d in os.listdir(out) if d.startswith("k=")) \
        == ["k=a", "k=b"]
    back = spark.read.parquet(out)
    assert back.count() == 4 and set(back.columns) == {"k", "v"}


def test_read_dataset_json_and_orc(spark, tmp_path):
    import pandas as pd
    from nvtabular_spark.sources import read_dataset
    pdf = pd.DataFrame({"k": ["a", "b"], "v": [1, 2]})
    df = spark.createDataFrame(pdf)
    jp, op_ = str(tmp_path / "j"), str(tmp_path / "o")
    df.write.json(jp)
    df.write.orc(op_)
    back_j = read_dataset(spark, jp, engine="json")
    back_o = read_dataset(spark, op_, engine="orc")
    assert back_j.count() == 2 and set(back_j.columns) == {"k", "v"}
    assert back_o.count() == 2 and set(back_o.columns) == {"k", "v"}


def test_read_dataset_avro_when_package_available(spark, tmp_path):
    """engine="avro" round-trip, mirroring the reference's engine
    parametrization; skipped when the external spark-avro package is
    absent (this sandbox ships without it, like scipy)."""
    import pandas as pd
    import pytest
    from nvtabular_spark.sources import read_dataset
    pdf = pd.DataFrame({"k": ["a", "b"], "v": [1, 2]})
    df = spark.createDataFrame(pdf)
    ap = str(tmp_path / "a")
    try:
        df.write.format("avro").save(ap)
    except Exception as e:
        if "FAILED_TO_FIND_DATA_SOURCE" in str(e) or "avro" in str(e):
            pytest.skip("spark-avro package not on the classpath")
        raise
    back = read_dataset(spark, ap, engine="avro")
    assert back.count() == 2 and set(back.columns) == {"k", "v"}


def test_verify_distribution_datagen(spark):
    # ported intent: reference tests/unit/test_tools.py:50-92
    # (test_powerlaw / test_uniform) — the generator's columns fit
    # their generating distribution and FAIL the wrong one
    from nvtabular_spark.sources.dataset import (synthetic_tabular,
                                                 verify_distribution)
    df = synthetic_tabular(spark, 20000, seed=7, cat_cardinality=1000,
                           powerlaw=1.5)
    # cont_0 ~ uniform on [-1, 1] → scale to [0, 1]
    scaled = df.select(((F.col("cont_0") + 1) / 2).alias("u"))
    stat, p = verify_distribution(scaled, "u", "uniform")
    assert stat < 0.02 and p > 0.01, (stat, p)

    # cat rank = floor(u^1.5 * card) → rank/card has CDF x^(1/1.5)
    ranks = df.select(
        (F.split(F.col("cat_0"), "_")[1].cast("double") / 1000)
        .alias("r"))
    stat_pl, p_pl = verify_distribution(ranks, "r", "powerlaw",
                                        alpha=1 / 1.5)
    assert stat_pl < 0.02, (stat_pl, p_pl)
    # and the SAME column decisively fails a uniform hypothesis
    stat_u, _ = verify_distribution(ranks, "r", "uniform")
    assert stat_u > 0.1, stat_u
