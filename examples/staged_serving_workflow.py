"""Staged training/serving split with tag-driven selection and named
Subgraphs (the reference's recommended packaging pattern:
tests/unit/workflow/test_workflow_subgraphs.py + test_workflow.py:84).

Build ONE workflow whose user-feature and item-feature branches are
named Subgraphs selected by schema TAGS, fit it once, then re-extract
each branch as a standalone serving workflow sharing the fitted stats.

    python examples/staged_serving_workflow.py [sf_dir]
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import nvtabular_spark as nvt
from nvtabular_spark import ColumnSelector, Subgraph, Tags, ops


def main():
    from pyspark.sql import SparkSession
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = (SparkSession.builder.master("local[8]")
             .config("spark.sql.shuffle.partitions", "8")
             .config("spark.ui.enabled", "false").getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")

    ds = nvt.Dataset(os.path.join(sf_dir, "orders.parquet"), spark=spark)
    # tag the schema once; every downstream selector is tag-driven
    tag_of = {"o_custkey": Tags.USER, "o_orderstatus": Tags.ITEM,
              "o_orderpriority": Tags.ITEM, "o_totalprice": Tags.CONTINUOUS}
    for name, tag in tag_of.items():
        ds.schema.column_schemas[name] = \
            ds.schema.column_schemas[name].with_tags([tag])

    user_graph = Subgraph(
        "user", ColumnSelector(tags=[Tags.USER]) >> ops.Categorify())
    item_graph = Subgraph(
        "item", (ColumnSelector(tags=[Tags.ITEM]) >> ops.Categorify())
        + (ColumnSelector(tags=[Tags.CONTINUOUS])
           >> ops.FillMissing() >> ops.Normalize()))
    wf = nvt.Workflow(user_graph + item_graph + ["o_orderkey"])
    wf.fit(ds)
    full = wf.transform(ds)
    print("full output columns:", full.to_ddf().columns)

    # serving: each branch alone, with the SAME fitted statistics
    user_wf = wf.get_subworkflow("user")
    item_wf = wf.get_subworkflow("item")
    print("user branch:", user_wf.transform(ds).to_ddf().columns)
    print("item branch:", item_wf.transform(ds).to_ddf().columns)

    # inference-side input pruning (drop a training-only column)
    wf.remove_inputs(["o_totalprice"])
    print("after remove_inputs:", sorted(wf.input_columns()))
    print("OK")


if __name__ == "__main__":
    main()
