"""nvtabular_spark — a from-scratch PySpark-native feature-engineering
engine with the capabilities of NVIDIA-Merlin/NVTabular.

Public API parity with the reference (nvtabular/__init__.py:22-35):
``Workflow``, ``ColumnSelector``, the ``ops`` namespace — plus the
north_rule extensions (as-of joins, windowed features, sessionization)
and large-scale training-data utilities (dedup, ANN, text analysis).
"""

from . import operators as ops

# make `import nvtabular_spark.ops` (the reference's module-path style,
# `import nvtabular.ops`) work, not just `from nvtabular_spark import ops`
import sys as _sys
_sys.modules[__name__ + ".ops"] = ops
from .plans.graph import ColumnSelector, Node, Subgraph
# reference name parity (nvtabular.workflow.node.WorkflowNode)
WorkflowNode = Node
from .plans.schema import ColumnSchema, Schema, Tags
from .plans import workflow as _workflow_mod
from .plans.workflow import Workflow
_sys.modules[__name__ + ".workflow"] = _workflow_mod
from .sources.dataset import Dataset

__version__ = "0.1.0"

__all__ = ["Workflow", "ColumnSelector", "Node", "WorkflowNode",
           "Subgraph", "Schema",
           "ColumnSchema", "Tags", "Dataset", "ops", "__version__"]
