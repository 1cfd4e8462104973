"""Port of the reference ops×selector output-schema sweep
(/root/reference/tests/unit/ops/test_ops_schema.py:10-231), adapted to
this engine's schema-only surface (``Workflow.fit_schema``).

Engine-convention divergences (documented, consistent with
tests/test_workflow_ports.py):

* ops are always instances; TargetEncoding takes an explicit fold
  column; Groupby takes ``groupby_cols``/``aggs``.
* the reference asserts ``compute_output_schema`` against the op's own
  ``_compute_dtype/_compute_tags/_compute_properties`` hooks (self-
  consistency); here the expectations are PINNED per op so a future
  change to either the op declaration or the fit_schema propagation
  rules fails loudly instead of drifting together.
"""
import numpy as np
import pandas as pd
import pytest

import nvtabular_spark as nvt
from nvtabular_spark import ColumnSelector, Schema, ops
from nvtabular_spark.plans.schema import ColumnSchema

COLS = [str(x) for x in range(5)]


def _sweep_ops():
    """(id, factory, expected) — expected is a dict with:
    dtype: expected output dtype given int-typed inputs
           ("int" = preserved, None = unknown/encoded, else declared)
    tags:  tags the op must add to every output column
    n_out_for(sel): output-name derivation (default: 1 per input)
    """
    return [
        ("bucketize", lambda: ops.Bucketize([1]),
         {"dtype": None, "tags": {"categorical"}}),
        ("rename", lambda: ops.Rename(postfix="_trim"),
         {"dtype": "int", "tags": set()}),
        ("categorify", lambda: ops.Categorify(),
         {"dtype": "int", "tags": {"categorical"}}),
        ("categorify_combo", lambda: ops.Categorify(encode_type="combo"),
         {"dtype": "int", "tags": {"categorical"}}),
        ("clip", lambda: ops.Clip(0),
         {"dtype": None, "tags": {"continuous"}}),
        ("difference_lag", lambda: ops.DifferenceLag("1"),
         {"dtype": None, "tags": {"continuous"}}),
        ("fill_missing", lambda: ops.FillMissing(),
         {"dtype": None, "tags": {"continuous"}}),
        ("hash_bucket", lambda: ops.HashBucket(1),
         {"dtype": None, "tags": {"categorical"}}),
        ("hashed_cross", lambda: ops.HashedCross(1),
         {"dtype": None, "tags": {"categorical"}}),
        ("list_slice", lambda: ops.ListSlice(0),
         {"dtype": None, "tags": {"list"}}),
        ("log_op", lambda: ops.LogOp(),
         {"dtype": "float", "tags": {"continuous"}}),
        ("normalize", lambda: ops.Normalize(),
         {"dtype": "double", "tags": {"continuous"}}),
        ("add_metadata",
         lambda: ops.AddMetadata(tags=["excellent"],
                                 properties={"domain": {"min": 0,
                                                        "max": 20}}),
         {"dtype": "int", "tags": {"excellent"}}),
        ("add_tags", lambda: ops.AddTags(tags=["excellent"]),
         {"dtype": "int", "tags": {"excellent"}}),
        ("tag_user_id", lambda: ops.TagAsUserID(),
         {"dtype": "int", "tags": {"user_id"}}),
        ("tag_item_id", lambda: ops.TagAsItemID(),
         {"dtype": "int", "tags": {"item_id"}}),
        ("tag_user_features", lambda: ops.TagAsUserFeatures(),
         {"dtype": "int", "tags": {"user"}}),
        ("tag_item_features", lambda: ops.TagAsItemFeatures(),
         {"dtype": "int", "tags": {"item"}}),
        ("value_count", lambda: ops.ValueCount(),
         {"dtype": "int", "tags": {"list"}}),
    ]


@pytest.mark.parametrize("properties", [{}, {"p1": "1"}])
@pytest.mark.parametrize("tags", [[], ["TAG1", "TAG2"]])
@pytest.mark.parametrize("selection", [["1"], ["2", "3"],
                                       ["1", "2", "3", "4"]])
@pytest.mark.parametrize("case", _sweep_ops(), ids=lambda c: c[0])
def test_schema_out(tags, properties, selection, case):
    _, factory, exp = case
    op = factory()
    schema = Schema([ColumnSchema(c, dtype="int", tags=tags,
                                  properties=properties) for c in COLS])
    wf = nvt.Workflow(ColumnSelector(selection) >> op)
    wf.fit_schema(schema)
    out = wf.output_schema

    expected_names = op.output_column_names(ColumnSelector(selection))
    assert out.column_names == expected_names

    # unused input columns never leak into the output schema
    for unused in (c for c in COLS if c not in selection):
        assert unused not in out.column_schemas

    one_to_one = len(expected_names) == len(selection)
    for i, name in enumerate(expected_names):
        cs = out[name]
        # op-declared tags always present
        assert exp["tags"] <= cs.tags, (name, cs.tags)
        if one_to_one:
            # input tags/properties ride through 1:1 ops to the
            # positionally matching output
            assert set(tags) <= cs.tags
            for k, v in properties.items():
                assert cs.properties.get(k) == v
        # dtype contract: preserved / declared / unknown-after-encode
        assert cs.dtype == exp["dtype"], (name, cs.dtype)


@pytest.mark.parametrize("selection", [["1"], ["2", "3"]])
def test_schema_out_stat_ops_with_deps(selection):
    """TargetEncoding / JoinGroupby / Groupby shapes (dependency
    columns and multi-output naming) — reference rows ops.JoinGroupby,
    ops.TargetEncoding, ops.Groupby from the same sweep."""
    schema = Schema([ColumnSchema(c, dtype="int", tags=["TAG1"])
                     for c in COLS])

    te = ops.TargetEncoding(target="0", fold_col="4", kfold=2)
    wf = nvt.Workflow(ColumnSelector(selection) >> te)
    wf.fit_schema(schema)
    for c in selection:
        assert f"TE_{c}_0" in wf.output_schema.column_names
        assert "continuous" in wf.output_schema[f"TE_{c}_0"].tags

    jg = ops.JoinGroupby(cont_cols=["0"], stats=["mean", "count"])
    wf = nvt.Workflow(ColumnSelector(selection) >> jg)
    wf.fit_schema(schema)
    for c in selection:
        assert f"{c}_0_mean" in wf.output_schema.column_names
        assert f"{c}_count" in wf.output_schema.column_names

    g = ops.Groupby(groupby_cols=["1"], aggs={"2": ["sum"]})
    wf = nvt.Workflow(ColumnSelector(["1", "2"]) >> g)
    wf.fit_schema(schema)
    assert "2_sum" in wf.output_schema.column_names


@pytest.mark.parametrize("op_routine", [
    lambda: [ops.Categorify()],
    lambda: [ops.Clip(min_value=10), ops.Categorify()],
    lambda: [ops.Categorify(), ops.Rename(postfix="_test")],
    lambda: [ops.Clip(min_value=10), ops.Categorify(),
             ops.Rename(postfix="_test")],
], ids=["cat", "clip_cat", "cat_rename", "clip_cat_rename"])
@pytest.mark.parametrize("tags,properties", [
    ([], {}), (["TAG1", "TAG2"], {}), ([], {"p1": "1"}),
    (["TAG1", "TAG2"], {"p1": "1"}),
])
def test_categorify_schema_properties(spark, tags, properties, op_routine):
    """run_op_full port: after a REAL fit, every output column carries
    the Categorify domain property {min: 0, max: max encoded id} even
    through downstream ops/renames."""
    rng = np.random.RandomState(11)
    pdf = pd.DataFrame({c: rng.randint(1, 1000, 1000) for c in COLS})
    df = spark.createDataFrame(pdf)

    node = ColumnSelector(COLS)
    for op in op_routine():
        node = node >> op
    wf = nvt.Workflow(node)
    wf.fit_schema(Schema([ColumnSchema(c, dtype="bigint", tags=tags,
                                       properties=properties)
                          for c in COLS]))
    got = wf.fit_transform(df).toPandas()
    out_schema = wf.output_schema
    for name in out_schema.column_names:
        cs = out_schema[name]
        assert "domain" in cs.properties, name
        dom = cs.properties["domain"]
        assert dom["min"] == 0
        assert dom["max"] == got[name].max()


def test_ops_list_vc(spark):
    """List-column routine port: Categorify >> Rename >> ValueCount —
    domain over list ELEMENTS plus the value_count {min,max} contract."""
    rng = np.random.RandomState(3)
    pdf = pd.DataFrame({
        c: [[int(v)] * rng.randint(1, 10)
            for v in rng.randint(1, 1000, 500)]
        for c in COLS
    })
    df = spark.createDataFrame(pdf)
    vc = ops.ValueCount()
    node = ColumnSelector(COLS) >> ops.Categorify() \
        >> ops.Rename(postfix="_test") >> vc
    wf = nvt.Workflow(node)
    got = wf.fit_transform(df).toPandas()
    out_schema = wf.output_schema
    for name in out_schema.column_names:
        cs = out_schema[name]
        assert "domain" in cs.properties, name
        dom = cs.properties["domain"]
        assert dom["min"] == 0
        assert dom["max"] == max(max(v) for v in got[name])
        assert "value_count" in cs.properties, name
        v = cs.properties["value_count"]
        # divergence: this engine keys counts[pub] = {min, max} directly
        # (the reference nests op.stats[col]["value_count"])
        assert v["min"] == vc.counts[name]["min"] == 1
        assert v["max"] == vc.counts[name]["max"] == 9
