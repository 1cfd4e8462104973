"""nvtabular_spark — a from-scratch PySpark-native feature-engineering
engine with the capabilities of NVIDIA-Merlin/NVTabular.

Public API parity with the reference (nvtabular/__init__.py:22-35):
``Workflow``, ``ColumnSelector``, the ``ops`` namespace — plus the
north_rule extensions (as-of joins, windowed features, sessionization)
and large-scale training-data utilities (dedup, ANN, text analysis).
"""

from . import operators as ops
from .plans.graph import ColumnSelector, Node, Subgraph
from .plans.schema import ColumnSchema, Schema, Tags
from .plans.workflow import Workflow
from .sources.dataset import Dataset

__version__ = "0.1.0"

__all__ = ["Workflow", "ColumnSelector", "Node", "Subgraph", "Schema",
           "ColumnSchema", "Tags", "Dataset", "ops", "__version__"]
