"""Workflow: sklearn-style fit/transform over the operator DAG.

Reference: nvtabular/workflow/workflow.py:45-74 (construction),
:195-210 (fit = executor walks StatOperators in topo order),
:235-254 (transform = lazy per-partition function). Here ``fit`` runs
one small Spark aggregation job per stat-op and ``transform`` returns a
single lazily-composed DataFrame — Catalyst is the executor.
"""

from __future__ import annotations

from typing import List, Optional

from pyspark.sql import DataFrame

from .compiler import CompiledPlan
from .graph import Node, _to_node
from .schema import Schema


class Workflow:
    def __init__(self, output_node):
        self.output_node: Node = _to_node(output_node)
        self.plan = CompiledPlan(self.output_node)
        self.input_schema: Optional[Schema] = None
        self.output_schema: Optional[Schema] = None

    @staticmethod
    def _unwrap(df):
        # accept the Dataset API-parity wrapper transparently
        return df.df if hasattr(df, "df") and isinstance(
            getattr(df, "df"), DataFrame) else df

    # -- lifecycle ----------------------------------------------------------
    def fit(self, df: DataFrame) -> "Workflow":
        """Run the statistics pass: each StatOperator triggers its own
        (small) aggregation job in topological order, then stores
        broadcastable state. No full-data materialization happens."""
        pruned = self._prune(self._unwrap(df))
        self.input_schema = Schema.from_spark(pruned.schema)
        out = self.plan.run(pruned, fit=True)
        self.output_schema = self._build_output_schema(out)
        return self

    def transform(self, df: DataFrame) -> DataFrame:
        """Lazily compose the transform; nothing executes until an
        action (write/collect) — mirroring reference workflow.py:86-88."""
        return self.plan.run(self._prune(self._unwrap(df)), fit=False)

    def fit_transform(self, df: DataFrame) -> DataFrame:
        self.fit(df)
        return self.transform(df)

    # -- introspection --------------------------------------------------------
    def input_columns(self) -> List[str]:
        return self.plan.input_columns()

    def explain(self, df: DataFrame, mode: str = "formatted") -> None:
        """Print the physical plan of the compiled transform — the
        feedback loop for shuffle/broadcast/pushdown review."""
        self.transform(df).explain(mode)

    def clear_stats(self) -> None:
        from ..operators.base import StatOperator
        for node in self.plan.order:
            if isinstance(node.op, StatOperator):
                node.op.clear()

    def _prune(self, df: DataFrame) -> DataFrame:
        """Column pruning at the source (reference workflow.py:239):
        select only DAG-referenced columns so the parquet/Iceberg scan's
        ReadSchema shrinks accordingly."""
        cols = [c for c in self.input_columns() if c in df.columns]
        missing = [c for c in self.input_columns() if c not in df.columns]
        if missing:
            raise KeyError(f"Workflow requires missing input columns {missing}")
        return df.select(*cols)

    def _build_output_schema(self, out_df: DataFrame) -> Schema:
        schema = Schema.from_spark(out_df.schema)
        # walk the DAG, attaching per-op tags/properties to its outputs
        for node in self.plan.order:
            if node.op is None:
                continue
            sel = node.input_group_selector()
            for col in node.op.output_column_names(sel):
                if col in schema:
                    cs = schema[col]
                    cs.tags |= set(node.op.output_tags())
                    props = node.op.output_properties()
                    cs.properties.update(props.get(col, {}) if
                                         set(props) & set(node.op.output_column_names(sel))
                                         else props)
        return schema

    # -- serialization --------------------------------------------------------
    def save(self, path: str) -> None:
        from .serializer import save_workflow
        save_workflow(self, path)

    @classmethod
    def load(cls, path: str, spark=None) -> "Workflow":
        from .serializer import load_workflow
        return load_workflow(path, spark=spark)
