"""Ports of the reference Categorify goldens
(/root/reference/tests/unit/ops/test_categorify.py)."""
import pandas as pd
import pytest
from pyspark.sql import functions as F

import nvtabular_spark as nvt
from nvtabular_spark import ops
from nvtabular_spark.operators.categorify import embedding_size, get_embedding_sizes


def test_joint_golden(author_df):
    # reference test_categorify.py:163-195
    cats = [["Author", "Engaging User"]] >> ops.Categorify(encode_type="joint")
    out = nvt.Workflow(cats + ["Post"]).fit_transform(author_df) \
        .orderBy("Post").toPandas()
    assert out["Author"].tolist() == [4, 7, 3, 5]
    assert out["Engaging User"].tolist() == [3, 3, 4, 6]


def test_combo_golden(author_df):
    cats = [["Author", "Engaging User"]] >> ops.Categorify(encode_type="combo")
    out = nvt.Workflow(cats + ["Post"]).fit_transform(author_df) \
        .orderBy("Post").toPandas()
    # 4 distinct combos, all count 1 → value-asc: (A,B)=3,(B,A)=4,(C,D)=5,(E,B)=6
    assert out["Author_Engaging User"].tolist() == [3, 6, 4, 5]


def test_list_column_golden(list_df):
    # reference test_categorify.py:128-157
    out = nvt.Workflow((["Authors"] >> ops.Categorify()) + ["Post"]) \
        .fit_transform(list_df).orderBy("Post").toPandas()
    assert [list(x) for x in out["Authors"]] == [[3], [3, 6], [5, 4], [4]]


def test_list_freq_threshold(list_df):
    out = nvt.Workflow(
        (["Authors"] >> ops.Categorify(freq_threshold=2)) + ["Post"]) \
        .fit_transform(list_df).orderBy("Post").toPandas()
    assert [list(x) for x in out["Authors"]] == [[3], [3, 2], [2, 4], [4]]


def test_list_explode_strategy_matches_udf(list_df):
    udf_out = nvt.Workflow(
        (["Authors"] >> ops.Categorify(list_strategy="udf")) + ["Post"]) \
        .fit_transform(list_df).orderBy("Post").toPandas()
    ex_out = nvt.Workflow(
        (["Authors"] >> ops.Categorify(list_strategy="explode")) + ["Post"]) \
        .fit_transform(list_df).orderBy("Post").toPandas()
    assert [list(x) for x in udf_out["Authors"]] == \
        [list(x) for x in ex_out["Authors"]]


def test_nulls_to_one(spark):
    df = spark.createDataFrame(
        pd.DataFrame({"brand": ["A", None, "B", "A", None], "i": range(5)}))
    out = nvt.Workflow((["brand"] >> ops.Categorify()) + ["i"]) \
        .fit_transform(df).orderBy("i").toPandas()
    # A(2)→3, B(1)→4, null→1
    assert out["brand"].tolist() == [3, 1, 4, 3, 1]


def test_max_size_caps_vocab(spark):
    pdf = pd.DataFrame({"c": ["a"] * 5 + ["b"] * 4 + ["c"] * 3 + ["d"] * 2
                        + ["e"], "i": range(15)})
    df = spark.createDataFrame(pdf)
    # max_size=5 → reserved 3 (pad,null,oov) → keep top-2 {a,b}
    out = nvt.Workflow((["c"] >> ops.Categorify(max_size=5)) + ["i"]) \
        .fit_transform(df).toPandas()
    codes = dict(zip(pdf["c"], out.sort_values("i")["c"]))
    assert codes["a"] == 3 and codes["b"] == 4
    assert codes["c"] == 2 and codes["d"] == 2 and codes["e"] == 2


def test_num_buckets_oov_range(spark):
    pdf = pd.DataFrame({"c": [f"v{i}" for i in range(20)] + ["hot"] * 10,
                        "i": range(30)})
    df = spark.createDataFrame(pdf)
    cat = ops.Categorify(freq_threshold=5, num_buckets=4)
    out = nvt.Workflow((["c"] >> cat) + ["i"]).fit_transform(df).toPandas()
    hot_code = out[out["i"] >= 20]["c"].unique().tolist()
    assert hot_code == [6]  # start = 2 + 4
    oov = out[out["i"] < 20]["c"]
    assert oov.between(2, 5).all()


def test_user_vocab_bypasses_fit(spark):
    df = spark.createDataFrame(pd.DataFrame({"c": ["x", "y", "z"],
                                             "i": [1, 2, 3]}))
    cat = ops.Categorify(vocabs={"c": ["z", "y"]})
    out = nvt.Workflow((["c"] >> cat) + ["i"]).fit_transform(df) \
        .orderBy("i").toPandas()
    # z→3, y→4 (given order), x OOV→2
    assert out["c"].tolist() == [2, 4, 3]


def test_freq_threshold_per_column_dict(spark):
    df = spark.createDataFrame(pd.DataFrame({
        "a": ["x", "x", "y"], "b": ["p", "q", "q"], "i": [1, 2, 3]}))
    cat = ops.Categorify(freq_threshold={"a": 2, "b": 0})
    out = nvt.Workflow((["a", "b"] >> cat) + ["i"]).fit_transform(df) \
        .orderBy("i").toPandas()
    assert out["a"].tolist() == [3, 3, 2]   # y dropped to OOV
    assert out["b"].tolist() == [4, 3, 3]   # q(2)→3, p(1)→4


def test_embedding_size_rule():
    # reference categorify.py:687-688
    assert embedding_size(10) == 16
    assert embedding_size(1000) == min(max(16, round(1.6 * 1000 ** 0.56)), 512)
    assert embedding_size(10 ** 9) == 512


def test_get_embedding_sizes(author_df):
    cat = ops.Categorify()
    wf = nvt.Workflow((["Author"] >> cat) + ["Post"])
    wf.fit(author_df)
    sizes = get_embedding_sizes(wf)
    # 4 unique + 3 reserved slots
    assert sizes["Author"][0] == 7


def test_single_table_contiguous(spark):
    """Reference test_categorify_single_table (:509-529): with
    single_table=True each column's code range sits strictly above the
    previous column's max — one shared embedding table."""
    df = spark.createDataFrame(pd.DataFrame({
        "Authors": [None, "User_A", "User_A", "User_E", "User_B", "User_C"],
        "Engaging_User": [None, "User_B", "User_B", "User_A", "User_D",
                          "User_D"],
        "Post": [1, 2, 3, 4, 5, 6],
    }))
    wf = nvt.Workflow(
        (["Authors", "Engaging_User"] >> ops.Categorify(single_table=True))
        + ["Post"])
    out = wf.fit_transform(df).toPandas()
    old_max = 1
    for name in ["Authors", "Engaging_User"]:
        assert old_max <= out[name].min()
        old_max += out[name].max()


def test_empty_vocab_all_oov(spark):
    """freq_threshold above every count → empty vocabulary → every
    value maps to OOV (2), nulls still 1."""
    df = spark.createDataFrame(
        pd.DataFrame({"c": ["a", "b", None], "i": [1, 2, 3]}))
    out = nvt.Workflow((["c"] >> ops.Categorify(freq_threshold=99)) + ["i"]) \
        .fit_transform(df).orderBy("i").toPandas()
    assert out["c"].tolist() == [2, 2, 1]


def test_transform_is_broadcast_join(author_df):
    """Scale guard: the vocab join must be a broadcast hash join, not a
    shuffle join (reference broadcasts vocab to workers too)."""
    wf = nvt.Workflow((["Author"] >> ops.Categorify()) + ["Post"])
    plan = wf.fit_transform(author_df)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_list_strategies_agree_on_empty_and_null(spark):
    """Regression: posexplode_outer conflated NULL and [] into a single
    (null,null) row, so both encoded as [NULL_OFFSET] under the explode
    strategy while the udf strategy kept them as null/[] — identical
    data silently encoded differently past list_vocab_limit. Both
    strategies must now agree element-wise, including the edge shapes."""
    import pyspark.sql.types as T
    schema = T.StructType([
        T.StructField("Authors", T.ArrayType(T.StringType()), True),
        T.StructField("Post", T.LongType(), False)])
    df = spark.createDataFrame(
        [(["User_A"], 1), (["User_A", "User_E"], 2), ([], 3), (None, 4),
         (["User_B", None], 5)], schema)

    def run(strategy):
        return (nvt.Workflow(
            (["Authors"] >> ops.Categorify(list_strategy=strategy))
            + ["Post"])
            .fit_transform(df).orderBy("Post").toPandas())

    udf_out, ex_out = run("udf"), run("explode")
    canon = lambda v: None if v is None else list(v)
    u = [canon(x) for x in udf_out["Authors"]]
    e = [canon(x) for x in ex_out["Authors"]]
    assert u == e
    assert u[2] == []        # empty stays empty
    assert u[3] is None      # null stays null
    assert u[4][1] == 1      # in-array null -> NULL code


def test_list_vocab_rides_stacked_scan(spark, list_df):
    """Single-column LIST vocabularies now join the one-pass stacked
    counts job + window ranking (no solo per-column input scan):
    their vocab path is the shared unique_all table."""
    op = ops.Categorify()
    wf = nvt.Workflow((["Authors"] >> op) + ["Post"])
    out = wf.fit_transform(list_df).orderBy("Post").toPandas()
    assert "unique_all" in op._paths["Authors"]
    # encoding contract unchanged (reference golden, freq desc value asc)
    assert [list(x) for x in out["Authors"]] == [[3], [3, 6], [5, 4], [4]]


def test_mixed_scalar_and_list_single_scan(spark):
    """Scalar + list columns of the same element dtype share ONE
    stacked fit scan and both window-rank from it."""
    pdf = pd.DataFrame({
        "cat": ["x", "y", "x", "z"],
        "tags": [["a"], ["a", "b"], ["b"], []],
        "rid": range(4)})
    df = spark.createDataFrame(pdf)
    op = ops.Categorify()
    wf = nvt.Workflow((["cat", "tags"] >> op) + ["rid"])
    out = wf.fit_transform(df).orderBy("rid").toPandas()
    assert op._paths["cat"] == op._paths["tags"]   # same materialized table
    assert out["cat"].tolist() == [3, 4, 3, 5]     # x(2)→3, y→4, z→5
    assert [list(v) for v in out["tags"]] == [[3], [3, 4], [4], []]


def test_joint_group_with_list_member_stacked(spark):
    """Joint (shared-vocab) group mixing a scalar and a LIST column now
    fits from the stacked scan too; shared codes across members."""
    pdf = pd.DataFrame({
        "primary": ["a", "b", "a", None],
        "extras": [["b"], ["a", "c"], [], None],
        "rid": range(4)})
    df = spark.createDataFrame(pdf)
    op = ops.Categorify()
    wf = nvt.Workflow(([["primary", "extras"]] >> op) + ["rid"])
    out = wf.fit_transform(df).orderBy("rid").toPandas()
    # shared vocab counts: a=3 (2 scalar + 1 list), b=2, c=1
    # codes: a→3, b→4, c→5; null scalar→1; null list→None; []→[]
    assert out["primary"].tolist() == [3, 4, 3, 1]
    got = [None if v is None else list(v) for v in out["extras"]]
    assert got == [[4], [3, 5], [], None]


def test_categorify_joint_list_reference_golden(spark):
    """Direct port of reference test_categorify.py:637-666
    (test_categorify_joint_list): joint vocab over a scalar + list
    column pair; expected ids are the reference's own goldens."""
    pdf = pd.DataFrame({
        "Author": ["User_A", "User_E", "User_B", "User_C"],
        "Engaging User": [["User_B", "User_C"], [],
                          ["User_A", "User_D"], ["User_A"]],
        "Post": [1, 2, 3, 4],
    })
    df = spark.createDataFrame(pdf)
    cats = ((["Post"] >> ops.Categorify(encode_type="joint"))
            + ([["Author", "Engaging User"]]
               >> ops.Categorify(encode_type="joint")))
    out = nvt.Workflow(cats).fit_transform(df).orderBy("Post").toPandas()
    assert out["Author"].tolist() == [3, 7, 4, 5]
    exploded = [x for lst in out["Engaging User"]
                for x in (lst if lst is not None else [])]
    assert exploded == [4, 5, 3, 6, 3]


@pytest.mark.parametrize("max_emb_size", [6, {"Author": 8, "Engaging_User": 7}])
def test_categorify_max_size_reference_port(spark, max_emb_size):
    """Port of reference test_categorify.py:444-505: max_size caps the
    encoded id space (freq-hashing the tail into num_buckets OOV
    slots); per-column dict sizes supported."""
    pdf = pd.DataFrame({
        "Author": ["User_A", "User_E", "User_B", "User_C", "User_A",
                   "User_E", "User_B", "User_C", "User_D", "User_F",
                   "User_F"],
        "Engaging_User": ["User_B", "User_B", "User_A", "User_D",
                          "User_B", "User_M", "User_A", "User_D",
                          "User_N", "User_F", "User_E"],
    })
    df = spark.createDataFrame(pdf)
    cat_names = ["Author", "Engaging_User"]
    op = ops.Categorify(max_size=max_emb_size, num_buckets=3)
    wf = nvt.Workflow(cat_names >> op)
    out = wf.fit_transform(df).toPandas()
    sizes = {k: v for k, v in max_emb_size.items()} \
        if isinstance(max_emb_size, dict) \
        else {n: max_emb_size for n in cat_names}
    for name in cat_names:
        # every encoded id fits the reference's bound
        assert out[name].max() <= sizes[name] + 1
        # fitted cardinality respects max_size
        assert op._sizes[name] <= sizes[name] + 1
        # embedding-size heuristic derived from the capped cardinality
        props = op.output_properties()[name]
        assert props["cardinality"] <= sizes[name] + 1


@pytest.mark.parametrize("cat_names", [[("Author", "Engaging User")],
                                       ["Author", "Engaging User"]])
@pytest.mark.parametrize("kind", ["joint", "combo"])
def test_categorify_domain_name(spark, cat_names, kind):
    # ported: reference tests/unit/ops/test_categorify.py:562 — every
    # categorical output column carries properties["domain"]["name"];
    # joint members share one name, combo outputs carry the combined
    # name, independent columns get distinct names
    df = spark.createDataFrame(pd.DataFrame({
        "Author": ["User_A", "User_E", "User_B", "User_C"],
        "Engaging User": ["User_B", "User_B", "User_A", "User_D"],
        "Post": [1, 2, 3, 4]}))
    wf = nvt.Workflow(cat_names >> ops.Categorify(encode_type=kind))
    wf.fit_transform(df)

    domain_names = []
    for col in wf.output_schema.column_names:
        cs = wf.output_schema[col]
        assert cs.properties != {}
        assert "name" in cs.properties["domain"]
        domain_names.append(cs.properties["domain"]["name"])
    if len(cat_names) == 1 and kind == "combo":
        assert domain_names == ["Author_Engaging User"]
    elif len(cat_names) == 1 and kind == "joint":
        assert len(set(domain_names)) == 1
    else:
        assert len(set(domain_names)) > 1


def test_categorify_domain_max(spark):
    # ported: reference test_categorify.py:597 — domain max > 0 on
    # every output column after a joint fit incl. a shared group
    df = spark.createDataFrame(pd.DataFrame({
        "Author": ["User_A", "User_E", "User_B", "User_C"],
        "Engaging User": ["User_B", "User_B", "User_A", "User_D"],
        "Post": [1, 2, 3, 4]}))
    wf = nvt.Workflow(["Post", ("Author", "Engaging User")]
                      >> ops.Categorify(encode_type="joint"))
    wf.fit_transform(df)
    for col in ["Post", "Author", "Engaging User"]:
        assert wf.output_schema[col].properties["domain"]["max"] > 0


def test_categorify_domain_survives_save_load(spark, tmp_path):
    df = spark.createDataFrame(pd.DataFrame({"g": ["a", "b", "a"]}))
    wf = nvt.Workflow(["g"] >> ops.Categorify())
    wf.fit(df)
    p = str(tmp_path / "wf_dom")
    wf.save(p)
    wf2 = nvt.Workflow.load(p, spark)
    op = [n.op for n in wf2.plan.order if isinstance(n.op, ops.Categorify)][0]
    props = op.output_properties()["g"]
    assert props["domain"]["name"] == "g"
    # inclusive max id = cardinality - 1 (reference categorify.py:575)
    assert props["domain"]["max"] == props["cardinality"] - 1 > 0
