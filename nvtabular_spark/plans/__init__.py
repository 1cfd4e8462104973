from .graph import ColumnSelector, Node, postorder
from .compiler import CompiledPlan
from .schema import ColumnSchema, Schema, Tags
from .workflow import Workflow

__all__ = ["ColumnSelector", "Node", "postorder", "CompiledPlan",
           "ColumnSchema", "Schema", "Tags", "Workflow"]
