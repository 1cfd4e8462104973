"""Port of reference tests/unit/workflow/test_cpu_workflow.py:19-81 —
the canonical end-to-end CPU path: FillMissing >> Clip >> Normalize on
continuous columns + Categorify on categoricals, fitted stats checked
against pandas, optional save/load in the middle, then a shuffled
multi-file parquet write read back with dtype and row-count checks.

Adapted: the reference's dataset fixture (name-cat/name-string/x/y/id/
label with nulls) is synthesized with the same shape; `get_cats` maps
to the Categorify vocab DataFrame; `nvt.io.Shuffle.PER_PARTITION` maps
to Dataset.to_parquet(shuffle="per_partition").
"""
import glob
import math

import numpy as np
import pandas as pd
import pytest
from pandas.api.types import is_integer_dtype

import nvtabular_spark as nvt
from nvtabular_spark import ops
from nvtabular_spark.sources.dataset import Dataset


def _fixture_df(rng):
    n = 400
    pdf = pd.DataFrame({
        "name-cat": rng.choice(["apple", "pear", "plum", "kiwi"], n),
        "name-string": rng.choice([f"n{i}" for i in range(12)], n),
        "x": rng.randn(n) * 3.0,
        "y": rng.randn(n) + 1.0,
        "id": rng.randint(0, 1000, n).astype("float64"),
        "label": rng.randint(0, 2, n),
    })
    pdf.loc[::17, "x"] = np.nan
    pdf.loc[::23, "y"] = np.nan
    return pdf


def _get_cats(wf, col):
    """Reference get_cats analog: the fitted vocab values for col."""
    cat_op = [n.op for n in wf.plan.order
              if isinstance(n.op, ops.Categorify)][0]
    vdf = cat_op._vocab_dfs[col].toPandas()
    val_col = [c for c in vdf.columns if c not in ("__id__", "id")][0]
    return sorted(v for v in vdf[val_col].tolist() if v is not None)


@pytest.mark.parametrize("dump", [True, False])
def test_cpu_workflow(spark, tmp_path, dump):
    rng = np.random.RandomState(42)
    pdf = _fixture_df(rng)
    df = spark.createDataFrame(pdf)

    cat_names = ["name-cat", "name-string"]
    cont_names = ["x", "y", "id"]

    norms = ops.Normalize()
    conts = cont_names >> ops.FillMissing() >> ops.Clip(min_value=0) \
        >> norms
    cats = cat_names >> ops.Categorify()
    wf = nvt.Workflow(conts + cats + ["label"])
    wf.fit(df)

    if dump:
        wdir = str(tmp_path / "workflow")
        wf.save(wdir)
        wf = nvt.Workflow.load(wdir, spark=spark)
        norms = [n.op for n in wf.plan.order
                 if isinstance(n.op, ops.Normalize)][0]

    # fitted moments match pandas on the same FillMissing+Clip pipeline
    def get_norms(tar: pd.Series):
        t = tar.fillna(0)
        return t * (t >= 0).astype("int")

    assert math.isclose(get_norms(pdf.x).mean(), norms.means["x"],
                        rel_tol=1e-4)
    assert math.isclose(get_norms(pdf.y).mean(), norms.means["y"],
                        rel_tol=1e-4)
    # reference tolerates 1e-3 on std (ddof conventions)
    assert math.isclose(get_norms(pdf.x).std(), norms.stds["x"],
                        rel_tol=1e-2)
    assert math.isclose(get_norms(pdf.y).std(), norms.stds["y"],
                        rel_tol=1e-2)

    # categories match the input uniques exactly
    assert _get_cats(wf, "name-cat") == \
        sorted(pdf["name-cat"].unique().tolist())
    assert _get_cats(wf, "name-string") == \
        sorted(pdf["name-string"].unique().tolist())

    # shuffled multi-file write, read back
    out_dir = str(tmp_path / "processed")
    Dataset(wf.transform(df)).to_parquet(
        out_dir, shuffle="per_partition", out_files_per_proc=10)
    files = glob.glob(out_dir + "/**/*.parquet", recursive=True)
    assert files
    df_pp = spark.read.parquet(out_dir).toPandas()
    assert is_integer_dtype(df_pp["name-cat"].dtype)
    assert is_integer_dtype(df_pp["name-string"].dtype)
    assert len(df_pp) == len(pdf)
    # normalized conts are standardized (post clip-at-zero)
    assert abs(df_pp["x"].mean()) < 0.15
