from .artifacts import materialize

__all__ = ["materialize"]
