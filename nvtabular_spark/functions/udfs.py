"""Importable named Series→Series functions for LambdaOp.

The serialization contract (reference lambdaop.py:25-51,
graph_serializer.py:71-99) requires LambdaOp functions to be importable
named functions — lambdas work at runtime but cannot be saved. Common
vectorized helpers live here.
"""

from __future__ import annotations


def log1p(s):
    import numpy as np
    return np.log1p(s)


def plus_one(s):
    return s + 1


def to_lower(s):
    return s.str.lower()


def str_length(s):
    return s.str.len().astype("float64")


def slice_5(s):
    return s.str.slice(0, 5)


def slice_2(s):
    return s.str.slice(0, 2)
