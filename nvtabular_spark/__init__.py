"""nvtabular_spark — a from-scratch PySpark-native feature-engineering
engine with the capabilities of NVIDIA-Merlin/NVTabular.

Public API parity with the reference (nvtabular/__init__.py:22-35):
``Workflow``, ``ColumnSelector``, the ``ops`` namespace — plus the
north_rule extensions (as-of joins, windowed features, sessionization)
and large-scale training-data utilities (dedup, ANN, text analysis).
"""

from . import operators as ops

# make `import nvtabular_spark.ops` (the reference's module-path style,
# `import nvtabular.ops`) work, not just `from nvtabular_spark import ops`.
# Every operators SUBMODULE must be aliased too: otherwise an import
# like `from nvtabular_spark.ops.categorify import Categorify` loads a
# SECOND copy of the module through the alias path and isinstance
# dispatch (e.g. StatOperator checks in the compiler) silently breaks.
import sys as _sys
_sys.modules[__name__ + ".ops"] = ops
for _n in [k for k in _sys.modules if k.startswith(__name__ + ".operators")]:
    _sys.modules[_n.replace(".operators", ".ops", 1)] = _sys.modules[_n]
from .plans.graph import ColumnSelector, Node, Subgraph
# reference name parity (nvtabular.workflow.node.WorkflowNode)
WorkflowNode = Node
from .plans.schema import ColumnSchema, Schema, Tags
from .plans import workflow as workflow  # noqa: PLC0414 — public alias
from .plans.workflow import Workflow
# bind BOTH the sys.modules entry and the package attribute: plain
# `import nvtabular_spark.workflow` resolves via sys.modules, but the
# subsequent `nvtabular_spark.workflow.X` attribute access needs the
# name on the package itself
_sys.modules[__name__ + ".workflow"] = workflow
from .sources.dataset import Dataset
from .plans.merge import WorkflowMergeError, merge_fits

__version__ = "0.1.0"

__all__ = ["Workflow", "ColumnSelector", "Node", "WorkflowNode",
           "Subgraph", "Schema",
           "ColumnSchema", "Tags", "Dataset", "ops", "__version__",
           "merge_fits", "WorkflowMergeError"]
