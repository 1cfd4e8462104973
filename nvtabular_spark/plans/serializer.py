"""Workflow save/load — graph.json + parquet artifacts.

Format mirrors the reference (workflow/graph_serializer.py:1077-1113,
1011-1021): ``metadata.json`` (versions) + ``graph.json`` with
topologically-ordered node records {id, op_class, op_params, op_state,
parent_ids, selector} + ``artifacts/node_<id>/<name>/`` parquet dirs
for file-based fitted state (≙ reference ``unique.<col>.parquet``
copies, graph_serializer.py:257-276).

Correctness contract: transform-after-load ≡ transform-before-save
(reference test_workflow.py:691-725). Lambdas / ``__main__`` functions
raise WorkflowSerializationError exactly like the reference
(graph_serializer.py:71-88).
"""

from __future__ import annotations

import importlib
import json
import os
from typing import Dict

from .graph import ColumnSelector, Node

FORMAT_VERSION = 1


class WorkflowSerializationError(ValueError):
    pass


def callable_ref(f) -> dict:
    """{module, qualname} for an importable named function; rejects
    lambdas and __main__ functions (reference graph_serializer.py:71-88)."""
    name = getattr(f, "__qualname__", getattr(f, "__name__", ""))
    module = getattr(f, "__module__", "")
    if "<lambda>" in name or "<locals>" in name:
        raise WorkflowSerializationError(
            f"Cannot serialize lambda/closure {name!r}; use an importable "
            "named function")
    if module in ("__main__", ""):
        raise WorkflowSerializationError(
            f"Cannot serialize function {name!r} from __main__; move it to "
            "an importable module")
    return {"module": module, "qualname": name}


def resolve_callable(ref: dict):
    mod = importlib.import_module(ref["module"])
    obj = mod
    for part in ref["qualname"].split("."):
        obj = getattr(obj, part)
    return obj


def _op_registry() -> Dict[str, type]:
    from .. import operators as ops_pkg
    reg = {}
    for name in dir(ops_pkg):
        obj = getattr(ops_pkg, name)
        if isinstance(obj, type):
            reg[f"{obj.__module__}.{obj.__name__}"] = obj
            reg[obj.__name__] = obj
    return reg


def save_workflow(workflow, path: str) -> None:
    os.makedirs(path, exist_ok=True)
    plan = workflow.plan
    records = []
    for node in plan.order:
        nid = plan.node_index[id(node)]
        rec = {
            "id": nid,
            "parent_ids": [plan.node_index[id(p)] for p in node.parents],
            "dependency_ids": [plan.node_index[id(d)]
                               for d in node.dependency_nodes],
            "selector": list(node.selector.names) if node.selector else None,
            "selector_groups": [list(g.names) for g in
                                node.selector.subgroups] if node.selector else [],
            "selector_scalars": list(node.selector._scalars)
            if node.selector else [],
            "selector_tags": list(node.selector.tags) if node.selector else [],
            "selector_tags_resolved": bool(node.selector._tags_resolved)
            if node.selector else False,
            "removed": node.removed,
            "subset": node.subset,
            "subgraph_name": node.subgraph_name,
        }
        if node.op is not None:
            op = node.op
            rec["op_class"] = f"{type(op).__module__}.{type(op).__name__}"
            rec["op_params"] = op.save_params()
            rec["op_state"] = op.save_state()
            artifacts = op.artifacts()
            if artifacts:
                import hashlib as _hl
                import re as _re
                art_paths = {}
                for name, adf in artifacts.items():
                    # artifact KEYS may contain any separator (e.g.
                    # TargetEncoding's "all::source") but Hadoop paths
                    # cannot: ':' parses as a URI scheme on relative
                    # paths and is forbidden outright on HDFS/S3 —
                    # sanitize the path segment, keep the key verbatim.
                    # The md5 suffix keeps sanitization injective (two
                    # keys differing only in separators must not share
                    # a directory) and defuses traversal segments
                    safe = _re.sub(r"[^A-Za-z0-9_.-]", "_", name) \
                        + "_" + _hl.md5(name.encode()).hexdigest()[:8]
                    rel = os.path.join("artifacts", f"node_{nid}", safe)
                    adf.write.mode("overwrite").parquet(os.path.join(path, rel))
                    art_paths[name] = rel
                rec["artifacts"] = art_paths
        records.append(rec)

    with open(os.path.join(path, "graph.json"), "w") as fh:
        json.dump({"format_version": FORMAT_VERSION, "nodes": records}, fh,
                  indent=2)
    import pyspark
    meta = {
        "format_version": FORMAT_VERSION,
        "pyspark_version": pyspark.__version__,
        "input_schema": workflow.input_schema.to_dict()
        if workflow.input_schema else None,
        "output_schema": workflow.output_schema.to_dict()
        if workflow.output_schema else None,
    }
    with open(os.path.join(path, "metadata.json"), "w") as fh:
        json.dump(meta, fh, indent=2)


def load_workflow(path: str, spark=None):
    from .workflow import Workflow
    from .schema import Schema

    with open(os.path.join(path, "graph.json")) as fh:
        graph = json.load(fh)
    if graph.get("format_version") != FORMAT_VERSION:
        raise WorkflowSerializationError(
            f"Unsupported workflow format {graph.get('format_version')}")

    registry = _op_registry()
    nodes: Dict[int, Node] = {}
    for rec in sorted(graph["nodes"], key=lambda r: r["id"]):
        parents = [nodes[pid] for pid in rec["parent_ids"]]
        if rec.get("selector") is not None:
            sel = ColumnSelector(tags=rec.get("selector_tags", ()))
            sel.names = list(rec["selector"])
            sel._tags_resolved = bool(rec.get("selector_tags_resolved"))
            for g in rec.get("selector_groups", []):
                sel.subgroups.append(ColumnSelector(g))
            scalars = rec.get("selector_scalars")
            if scalars is None:  # legacy file: scalars = names not grouped
                in_group = {n for g in sel.subgroups for n in g.names}
                scalars = [n for n in sel.names if n not in in_group]
            sel._scalars = list(scalars)
            node = Node(selector=sel)
        elif rec.get("op_class"):
            cls = registry.get(rec["op_class"]) or \
                registry.get(rec["op_class"].rsplit(".", 1)[-1])
            if cls is None:
                mod_name, cls_name = rec["op_class"].rsplit(".", 1)
                cls = getattr(importlib.import_module(mod_name), cls_name)
            op = cls.load_params(rec.get("op_params", {}))
            op.load_state(rec.get("op_state", {}))
            if rec.get("artifacts"):
                if spark is None:
                    from pyspark.sql import SparkSession
                    spark = SparkSession.getActiveSession()
                    if spark is None:
                        raise WorkflowSerializationError(
                            "load_workflow needs a SparkSession for artifacts")
                op.load_artifacts(spark, {
                    name: os.path.join(path, rel)
                    for name, rel in rec["artifacts"].items()})
            if hasattr(op, "fitted"):
                op.fitted = True  # reference marks loaded StatOperators fitted
            node = Node(op=op, parents=parents)
            node.removed = rec.get("removed") or []
            node.subset = rec.get("subset")
        else:
            node = Node(parents=parents)
            node.removed = rec.get("removed") or []
            node.subset = rec.get("subset")
        node.subgraph_name = rec.get("subgraph_name")
        node.dependency_nodes = [nodes[did]
                                 for did in rec.get("dependency_ids", [])]
        nodes[rec["id"]] = node

    root = nodes[max(nodes)]
    wf = Workflow(root)
    with open(os.path.join(path, "metadata.json")) as fh:
        meta = json.load(fh)
    saved_v = meta.get("pyspark_version")
    import pyspark
    if saved_v and saved_v != pyspark.__version__:
        # reference behavior (workflow.py load): a version skew warns
        # but still loads — only an incompatible FORMAT hard-errors
        import warnings
        warnings.warn(
            f"Workflow saved with pyspark {saved_v}, loading with "
            f"{pyspark.__version__}; transforms may differ across "
            f"engine versions")
    if meta.get("input_schema"):
        wf.input_schema = Schema.from_dict(meta["input_schema"])
    if meta.get("output_schema"):
        wf.output_schema = Schema.from_dict(meta["output_schema"])
    return wf
