"""ColumnSimilarity — row-wise similarity between two id-indexed
feature matrices.

Reference: nvtabular/ops/column_similarity.py:31-283 (inner product /
cosine / tf-idf between SPARSE feature matrices indexed by a left and a
right id column; ``[["a","b"]] >> ColumnSimilarity(features)`` yields
``a_b_sim``). Spark-first: the feature matrix — scipy CSR (preferred at
real vocabulary sizes, e.g. 1e6×1e5) or dense numpy — is broadcast once
per executor; similarities are computed in an Arrow-batched pandas_udf
with vectorized numpy / scipy row ops — no per-row Python.

Two invocation styles:

* reference-parity: ``[["doc_id", "doc_id_promo"]] >> ColumnSimilarity(
  features, metric="tfidf")`` — grouped pairs, output ``a_b_sim``;
* keyword: ``["doc_id"] >> ColumnSimilarity(features,
  right_col="doc_id_promo")`` — one fixed right column.

``right_features`` (reference :64-67) supplies a different matrix for
the right ids; default shares the left matrix.
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
    import scipy.sparse as _sp
    _HAS_SCIPY = True
except Exception:  # pragma: no cover
    _HAS_SCIPY = False


def _prep_matrix(features, metric: str):
    """tf-idf re-weighting + row normalization (reference :180-210
    semantics), preserving sparsity: a CSR input stays CSR end-to-end
    (the column re-weighting is a diagonal multiply, the row
    normalization a diagonal pre-multiply)."""
    if _HAS_SCIPY and _sp.issparse(features):
        mat = features.tocsr().astype("float64")
        if metric == "tfidf":
            df_count = np.asarray((mat > 0).sum(axis=0)).ravel()
            idf = np.log((1.0 + mat.shape[0]) / (1.0 + df_count)) + 1.0
            mat = mat.multiply(idf).tocsr()
        if metric in ("tfidf", "cosine"):
            norms = np.sqrt(np.asarray(mat.multiply(mat).sum(axis=1)).ravel())
            norms[norms == 0] = 1.0
            mat = (_sp.diags(1.0 / norms) @ mat).tocsr()
        return mat
    mat = np.asarray(features, dtype="float64")
    if metric == "tfidf":
        df_count = (mat > 0).sum(axis=0)
        idf = np.log((1.0 + mat.shape[0]) / (1.0 + df_count)) + 1.0
        mat = mat * idf
    if metric in ("tfidf", "cosine"):
        norms = np.linalg.norm(mat, axis=1)
        norms[norms == 0] = 1.0
        mat = mat / norms[:, None]
    return mat


def _row_dots(left_mat, li, right_mat, ri):
    """Vectorized <left_mat[li[k]], right_mat[ri[k]]> for all k."""
    if _HAS_SCIPY and _sp.issparse(left_mat):
        a, b = left_mat[li], right_mat[ri]
        return np.asarray(a.multiply(b).sum(axis=1)).ravel()
    return np.einsum("ij,ij->i", left_mat[li], right_mat[ri])


class ColumnSimilarity(Operator):
    """``sim = <features[left_id], right_features[right_id]>`` with
    metric in {inner, cosine, tfidf}. ``features``: scipy sparse matrix
    or dense numpy array whose row i is the feature vector of id i."""

    def __init__(self, features, right_features=None,
                 metric: str = "inner", right_col: Optional[str] = None):
        if metric not in ("inner", "cosine", "tfidf"):
            raise ValueError("metric must be inner|cosine|tfidf")
        self.right_col = right_col
        self.metric = metric
        self._mat = _prep_matrix(features, metric)
        self._rmat = (_prep_matrix(right_features, metric)
                      if right_features is not None else None)

    def dependencies(self):
        return [self.right_col] if self.right_col else []

    def _pairs(self, selector: ColumnSelector):
        if self.right_col:
            return [(c, self.right_col) for c in selector.names]
        pairs = []
        for g in selector.grouped_names:
            if not isinstance(g, tuple) or len(g) != 2:
                raise ValueError(
                    "ColumnSimilarity needs grouped column pairs "
                    "([['a','b']] >> op) or a right_col= keyword")
            pairs.append(g)
        return pairs

    def output_column_names(self, selector: ColumnSelector):
        return [f"{a}_{b}_sim" for a, b in self._pairs(selector)]

    def transform(self, ctx: TransformContext, df: DataFrame) -> DataFrame:
        sc = df.sparkSession.sparkContext
        # scipy CSR pickles to its (indptr, indices, data) arrays — the
        # broadcast ships the compressed form, never a densified matrix
        bc = sc.broadcast(self._mat)
        bc_r = sc.broadcast(self._rmat) if self._rmat is not None else None

        @pandas_udf("double")
        def sim(left_ids, right_ids):
            import pandas as pd
            m = bc.value
            rm = bc_r.value if bc_r is not None else m
            li = left_ids.to_numpy(dtype="int64")
            ri = right_ids.to_numpy(dtype="int64")
            return pd.Series(_row_dots(m, li, rm, ri))

        cols = {}
        for a, b in self._pairs(ctx.selector):
            act_a = ctx.inputs.get(a, a)
            act_b = ctx.inputs.get(b, b)
            cols[ctx.out(f"{a}_{b}_sim")] = sim(F.col(act_a), F.col(act_b))
        return df.withColumns(cols)

    _SAVE_LIMIT = 2_000_000  # stored entries (nnz for CSR)

    @staticmethod
    def _mat_to_params(mat):
        if mat is None:
            return None
        if _HAS_SCIPY and _sp.issparse(mat):
            if mat.nnz > ColumnSimilarity._SAVE_LIMIT:
                raise ValueError(
                    f"feature matrix too large to embed in graph.json "
                    f"({mat.nnz} nnz > {ColumnSimilarity._SAVE_LIMIT}); "
                    f"rebuild the op with its features after load")
            m = mat.tocsr()
            return {"kind": "csr", "shape": list(m.shape),
                    "data": m.data.tolist(),
                    "indices": m.indices.tolist(),
                    "indptr": m.indptr.tolist()}
        arr = np.asarray(mat)
        if arr.size > ColumnSimilarity._SAVE_LIMIT:
            raise ValueError(
                f"feature matrix too large to embed in graph.json "
                f"({arr.size} entries > {ColumnSimilarity._SAVE_LIMIT}); "
                f"rebuild the op with its features after load")
        return {"kind": "dense", "shape": list(arr.shape),
                "data": arr.reshape(-1).tolist()}

    @staticmethod
    def _mat_from_params(p):
        if p is None:
            return None
        if p["kind"] == "csr":
            import scipy.sparse as sp
            return sp.csr_matrix(
                (np.array(p["data"]), np.array(p["indices"]),
                 np.array(p["indptr"])), shape=tuple(p["shape"]))
        return np.array(p["data"], dtype="float64").reshape(p["shape"])

    def save_params(self):
        # matrices are saved POST-prep (tfidf/normalization already
        # applied), so load skips re-prep
        return {"right_col": self.right_col, "metric": self.metric,
                "mat": self._mat_to_params(self._mat),
                "rmat": self._mat_to_params(self._rmat)}

    @classmethod
    def load_params(cls, params):
        op = cls.__new__(cls)
        op.right_col = params["right_col"]
        op.metric = params["metric"]
        op._mat = cls._mat_from_params(params.get("mat"))
        op._rmat = cls._mat_from_params(params.get("rmat"))
        return op
