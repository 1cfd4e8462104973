"""JoinExternal and JoinGroupby.

Reference: nvtabular/ops/join_external.py:35-221 (broadcast left/inner
equi-join of every partition against an external table; only
left/inner supported :110-111) and join_groupby.py:37-283 (fit:
distributed groupby stats per categorical key; transform: left-join the
stats back; agg dtypes :29-34).

Spark-first: the reference's hand-rolled partition-wise broadcast merge
is exactly ``df.join(F.broadcast(ext), on, how)``. The reference's
row-order restoration via temp arange columns (:155-164) is dropped —
Spark has set semantics and our tests sort before compare, like the
reference's own dask tests (tests/unit/test_dask_nvt.py:119-138).
"""

from __future__ import annotations

import os
from typing import Dict, List, Optional, Union

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .base import Operator, StatOperator, TransformContext
from ..plans.graph import ColumnSelector
from ..sources.artifacts import materialize

_STAT_FNS = {
    "count": lambda c: F.count(c).cast("long"),
    "sum": F.sum,
    "mean": F.mean,
    "std": F.stddev_samp,
    "var": F.var_samp,
    "min": F.min,
    "max": F.max,
}


class JoinExternal(Operator):
    """Equi-join against an external (small) table. ``how`` ∈
    {left, inner} (join_external.py:110-111). ``broadcast=True`` by
    default — at 100 TB the external dim table must not shuffle the
    fact side; set False to let AQE pick (e.g. when ext is huge)."""

    cheap_transform = False  # join-backed

    def __init__(self, df_ext, on: Union[str, List[str]],
                 how: str = "left", on_ext: Optional[Union[str, List[str]]] = None,
                 columns_ext: Optional[List[str]] = None,
                 drop_duplicates_ext: bool = False, broadcast: bool = True,
                 kind_ext: Optional[str] = None, cache: Optional[str] = None):
        if how not in ("left", "inner"):
            raise ValueError("JoinExternal supports only how='left'|'inner'")
        self.on = [on] if isinstance(on, str) else list(on)
        self.on_ext = ([on_ext] if isinstance(on_ext, str) else list(on_ext)) \
            if on_ext else list(self.on)
        self.how = how
        self.columns_ext = columns_ext
        self.drop_duplicates_ext = drop_duplicates_ext
        self.broadcast = broadcast
        #: accepted for reference API parity (join_external.py:75-79);
        #: the format is inferred from the object and Spark manages
        #: caching (broadcast) itself, so both are advisory here
        self.kind_ext = kind_ext
        self.cache = cache
        self._ext = self._prep(self._resolve(df_ext, kind_ext))

    @staticmethod
    def _resolve(ext, kind_ext: Optional[str] = None) -> DataFrame:
        """Accept the reference's external-table kinds
        (join_external.py kind_ext: dataframe / pandas / arrow /
        parquet / csv path / Dataset) and return a Spark DataFrame.
        An explicit ``kind_ext`` of ``"csv"``/``"parquet"`` decides the
        path reader; otherwise the format is inferred from a ``.csv``
        suffix (a declared format must win — a ``.tsv`` csv file would
        otherwise be read as parquet)."""
        if isinstance(ext, DataFrame):
            return ext
        to_ddf = getattr(ext, "to_ddf", None)  # our Dataset wrapper
        if callable(to_ddf):
            return to_ddf()
        from pyspark.sql import SparkSession
        spark = SparkSession.getActiveSession()
        if spark is None:
            raise ValueError(
                "JoinExternal needs an active SparkSession to load a "
                f"{type(ext).__name__} external table")
        if isinstance(ext, (str, os.PathLike)):
            path = str(ext)
            kind = (kind_ext or "").lower()
            if kind == "csv" or (not kind and path.endswith(".csv")):
                return spark.read.csv(path, header=True, inferSchema=True)
            if kind and kind != "parquet":
                raise ValueError(
                    f"JoinExternal kind_ext={kind_ext!r} is not a "
                    "readable path format here (use 'csv' or 'parquet')")
            return spark.read.parquet(path)
        if hasattr(ext, "to_pandas"):  # pyarrow.Table
            ext = ext.to_pandas()
        return spark.createDataFrame(ext)  # pandas DataFrame

    def _prep(self, ext: DataFrame) -> DataFrame:
        if self.columns_ext:
            keep = list(dict.fromkeys(self.on_ext + self.columns_ext))
            ext = ext.select(*keep)
        if self.drop_duplicates_ext:
            # FULL-row dedup over the selected columns, matching the
            # reference's drop_duplicates(ignore_index=True)
            # (join_external.py:135-139) — not key-based
            ext = ext.dropDuplicates()
        # rename ext join keys to match left-side names
        for l, r in zip(self.on, self.on_ext):
            if l != r:
                ext = ext.withColumnRenamed(r, l)
        return ext

    def dependencies(self):
        return list(self.on)

    def output_column_names(self, selector: ColumnSelector):
        ext_cols = [c for c in self._ext.columns if c not in self.on]
        return list(selector.names) + [c for c in ext_cols
                                       if c not in selector.names]

    def transform(self, ctx: TransformContext, df: DataFrame) -> DataFrame:
        ext = F.broadcast(self._ext) if self.broadcast else self._ext
        # join on raw key columns (dependencies) — alias ext payload to
        # the namespaced outputs to avoid collisions
        ext_cols = [c for c in self._ext.columns if c not in self.on]
        joined = df.join(ext, on=self.on, how=self.how)
        cols = {ctx.out(pub): F.col(act) for pub, act in ctx.pairs()}
        for c in ext_cols:
            if c in ctx.outputs:
                cols[ctx.out(c)] = F.col(c)
        return joined.withColumns(cols).drop(*ext_cols)

    def save_params(self):
        return {"on": self.on, "on_ext": self.on_ext, "how": self.how,
                "columns_ext": self.columns_ext,
                "drop_duplicates_ext": self.drop_duplicates_ext,
                "broadcast": self.broadcast}

    @classmethod
    def load_params(cls, params):
        op = cls.__new__(cls)
        for k, v in params.items():
            setattr(op, k, v)
        op._ext = None
        return op

    def artifacts(self):
        return {"ext": self._ext}

    def load_artifacts(self, spark, paths):
        self._ext = spark.read.parquet(paths["ext"])


class JoinGroupby(StatOperator):
    """fit: ``groupBy(key).agg(stats of cont_cols)`` materialized to
    parquet; transform: broadcast left-join stats onto rows. Output
    names ``<key>_<cont>_<stat>`` and ``<key>_count``
    (join_groupby.py:175-217, 252-261)."""

    cheap_transform = False  # join-backed

    def __init__(self, cont_cols: Optional[List[str]] = None,
                 stats: Optional[List[str]] = None, out_path: Optional[str] = None,
                 name_sep: str = "_", broadcast: bool = True,
                 coerce_dtypes: bool = False):
        super().__init__()
        # cont_cols may be a str, a list of str, or a workflow NODE
        # whose outputs are the continuous columns (reference
        # node-dependency form, tests/unit/ops/test_join.py:33
        # test_joingroupby_dependency: JoinGroupby(cont_cols=["Cost"]
        # >> NormalizeMinMax() >> Rename(...)))
        from ..plans.graph import Node as _Node
        raw = [cont_cols] if isinstance(cont_cols, (str, _Node)) \
            else list(cont_cols or [])
        self.cont_cols: List[str] = []
        self._cont_nodes: List = []
        self._node_cont_names: List[str] = []
        for c in raw:
            if isinstance(c, _Node):
                outs = c.output_columns()
                self._cont_nodes.append(c)
                self._node_cont_names.extend(outs)
                self.cont_cols.extend(outs)
            else:
                self.cont_cols.append(c)
        self.stats = list(stats or ["count"])
        bad = [s for s in self.stats if s not in _STAT_FNS]
        if bad:
            raise ValueError(f"Unsupported stats {bad}; choose from {list(_STAT_FNS)}")
        self.out_path = out_path
        self.name_sep = name_sep
        self.broadcast = broadcast
        #: reference AGG_DTYPES parity (join_groupby.py:29-34):
        #: count -> int32, std/var/mean -> float32 (default off keeps
        #: Spark-native long/double, aligned with the DuckDB oracles)
        self.coerce_dtypes = coerce_dtypes
        self._stats_dfs: Dict[str, DataFrame] = {}
        self._paths: Dict[str, str] = {}

    def dependencies(self):
        # RAW workflow-input columns only; node-resolved cont_cols are
        # produced inside the DAG, not read from the source
        node_made = set(self._node_cont_names)
        return [c for c in self.cont_cols if c not in node_made]

    def node_dependencies(self):
        """DAG nodes whose outputs this op consumes (cont_cols given as
        nodes); attached as Node.dependency_nodes by the graph algebra."""
        return list(self._cont_nodes)

    def save_params(self):
        p = super().save_params()
        # node-resolved cont names must survive load (they are NOT raw
        # inputs; dependencies() excludes them)
        p["node_cont_names"] = list(self._node_cont_names)
        return p

    @classmethod
    def load_params(cls, params):
        params = dict(params)
        node_names = params.pop("node_cont_names", [])
        op = super().load_params(params)
        op._node_cont_names = list(node_names)
        return op

    def _group_keys(self, selector: ColumnSelector) -> List[tuple]:
        """Each grouped name (tuple for multi-key) becomes one stats table."""
        return [g if isinstance(g, tuple) else (g,)
                for g in selector.grouped_names]

    def _out_names(self, keys: tuple) -> Dict[str, str]:
        prefix = self.name_sep.join(keys)
        out = {"count": f"{prefix}{self.name_sep}count"}
        for c in self.cont_cols:
            for s in self.stats:
                if s == "count":
                    continue
                out[f"{c}:{s}"] = f"{prefix}{self.name_sep}{c}{self.name_sep}{s}"
        return out

    def output_column_names(self, selector: ColumnSelector):
        out = list(selector.names)
        for keys in self._group_keys(selector):
            names = self._out_names(keys)
            if "count" in self.stats:
                out.append(names["count"])
            out.extend(v for k, v in names.items() if k != "count")
        return out

    def fit(self, ctx: TransformContext, df: DataFrame) -> None:
        self._stats_dfs, self._paths = {}, {}
        for keys in self._group_keys(ctx.selector):
            acts = [ctx.inputs.get(k, k) for k in keys]
            names = self._out_names(keys)
            aggs = []
            count_t = "int" if self.coerce_dtypes else "long"
            if "count" in self.stats:
                aggs.append(F.count(F.lit(1)).cast(count_t)
                            .alias(names["count"]))
            for c in self.cont_cols:
                cc = F.col(c)
                if df.schema[c].dataType.simpleString() in ("double", "float"):
                    cc = F.when(F.isnan(cc), F.lit(None)).otherwise(cc)
                for s in self.stats:
                    if s == "count":
                        continue
                    e = _STAT_FNS[s](cc)
                    if self.coerce_dtypes and s in ("std", "var", "mean"):
                        e = e.cast("float")
                    aggs.append(e.alias(names[f"{c}:{s}"]))
            grouped = df.groupBy(
                *[F.col(a).alias(f"__key_{k}") for a, k in zip(acts, keys)]
            ).agg(*aggs)
            key = self.name_sep.join(keys)
            self._stats_dfs[key], self._paths[key] = materialize(
                grouped, f"joingroupby_{key}", self.out_path)
        self.fitted = True

    def transform(self, ctx: TransformContext, df: DataFrame) -> DataFrame:
        self._require_fitted()
        for keys in self._group_keys(ctx.selector):
            key = self.name_sep.join(keys)
            stats = self._stats_dfs[key]
            if self.broadcast:
                stats = F.broadcast(stats)
            cond = None
            for k in keys:
                act = ctx.inputs.get(k, k)
                c = df[act].eqNullSafe(stats[f"__key_{k}"])
                cond = c if cond is None else (cond & c)
            df = df.join(stats, cond, "left").drop(
                *[f"__key_{k}" for k in keys])
        cols = {ctx.out(pub): F.col(act) for pub, act in ctx.pairs()}
        for keys in self._group_keys(ctx.selector):
            for name in self._out_names(keys).values():
                if name in ctx.outputs:
                    cols[ctx.out(name)] = F.col(name)
        drop_after = [n for keys in self._group_keys(ctx.selector)
                      for n in self._out_names(keys).values()]
        return df.withColumns(cols).drop(*drop_after)

    # -- shared-key fit fusion (base.StatOperator protocol) -------------------
    def fused_fit_requests(self, ctx: TransformContext):
        """All JoinGroupby stats are derivable from per-(key[, fold])
        partials, so every group joins the compiler's shared groupBy
        job; ``consume_fused`` re-aggregates the (small) partial table
        over the fold dimension.

        Dtype contract matches standalone :meth:`fit`: sum/min/max
        partials stay in the column's NATIVE dtype (int64 in → int64
        out, no silent double widening); only the moment stats
        (mean/std/var) work in double. std/var partials are JVM
        ``var_samp`` (Welford-stable) per (key[, fold]) and are merged
        across partials with Chan's pairwise update in
        ``consume_fused`` — no (ssq − s²/n) catastrophic cancellation
        anywhere in the pipeline."""
        from .base import FusedFitRequest
        self._stats_dfs, self._paths = {}, {}
        reqs = []
        for keys in self._group_keys(ctx.selector):
            acts = tuple(ctx.inputs.get(k, k) for k in keys)
            p = f"jg{abs(id(self)) % 10 ** 8}_{self.name_sep.join(keys)}"
            aggs = [F.count(F.lit(1)).alias(f"{p}__n")]
            need_moments = bool({"mean", "std", "var"} & set(self.stats))
            for c in self.cont_cols:
                # NaN→NULL guard that works for any dtype: only the
                # isnan TEST casts to double; the value branch stays
                # native, so int64 sum/min/max keep their dtype
                raw = F.col(c)
                cc = F.when(F.isnan(raw.cast("double")), F.lit(None)) \
                    .otherwise(raw)
                ccd = cc.cast("double")
                if "sum" in self.stats:
                    aggs.append(F.sum(cc).alias(f"{p}__sum_{c}"))
                if need_moments:
                    aggs += [F.count(cc).alias(f"{p}__cnt_{c}"),
                             F.avg(ccd).alias(f"{p}__mu_{c}")]
                if {"std", "var"} & set(self.stats):
                    aggs.append(F.var_samp(ccd).alias(f"{p}__vs_{c}"))
                if "min" in self.stats:
                    aggs.append(F.min(cc).alias(f"{p}__min_{c}"))
                if "max" in self.stats:
                    aggs.append(F.max(cc).alias(f"{p}__max_{c}"))
            reqs.append(FusedFitRequest(self, ctx, acts, aggs,
                                        tag=(keys, p)))
        return reqs

    @staticmethod
    def _chan_merge(cnt_col: str, mu_col: str, vs_col=None):
        """Merge per-partial (n, mean, var_samp) triples into global
        (n, mean, M2) with Chan's parallel-variance update — exact for
        the mean, numerically stable for M2 (no mean² subtraction of
        raw sums of squares). ``vs_col=None`` (mean-only callers) sets
        per-partial M2 to 0; the merged mean is unaffected."""
        m2 = F.lit(0.0) if vs_col is None else \
            F.when(F.col(cnt_col) > 1,
                   F.col(vs_col) * (F.col(cnt_col) - 1)) \
            .otherwise(F.lit(0.0))
        parts = F.collect_list(F.struct(
            F.coalesce(F.col(cnt_col).cast("double"), F.lit(0.0)).alias("n"),
            F.coalesce(F.col(mu_col), F.lit(0.0)).alias("m"),
            F.coalesce(m2, F.lit(0.0)).alias("q")))
        zero = F.struct(F.lit(0.0).alias("n"), F.lit(0.0).alias("m"),
                        F.lit(0.0).alias("q"))

        def step(a, x):
            tot = a["n"] + x["n"]
            safe = F.when(tot == 0, F.lit(1.0)).otherwise(tot)
            delta = x["m"] - a["m"]
            return F.struct(
                tot.alias("n"),
                (a["m"] + delta * x["n"] / safe).alias("m"),
                (a["q"] + x["q"]
                 + delta * delta * a["n"] * x["n"] / safe).alias("q"))

        return F.aggregate(parts, zero, step)

    def consume_fused(self, req, grouped: DataFrame) -> None:
        keys, p = req.tag
        names = self._out_names(keys)
        count_t = "int" if self.coerce_dtypes else "long"
        finals = []
        if "count" in self.stats:
            finals.append(F.sum(f"{p}__n").cast(count_t)
                          .alias(names["count"]))
        for c in self.cont_cols:
            merged = None
            if {"mean", "std", "var"} & set(self.stats):
                vs = f"{p}__vs_{c}" \
                    if {"std", "var"} & set(self.stats) else None
                merged = self._chan_merge(f"{p}__cnt_{c}", f"{p}__mu_{c}", vs)
            for stat in self.stats:
                if stat == "count":
                    continue
                if stat == "sum":
                    e = F.sum(f"{p}__sum_{c}")
                elif stat == "mean":
                    e = F.when(merged["n"] > 0, merged["m"])
                elif stat in ("std", "var"):
                    var = F.when(merged["n"] > 1,
                                 F.greatest(merged["q"] / (merged["n"] - 1),
                                            F.lit(0.0)))
                    e = F.sqrt(var) if stat == "std" else var
                elif stat == "min":
                    e = F.min(f"{p}__min_{c}")
                elif stat == "max":
                    e = F.max(f"{p}__max_{c}")
                if self.coerce_dtypes and stat in ("std", "var", "mean"):
                    e = e.cast("float")
                finals.append(e.alias(names[f"{c}:{stat}"]))
        key_sel = [F.col(f"__k{i}").alias(f"__key_{k}")
                   for i, k in enumerate(keys)]
        stats = grouped.groupBy(*key_sel).agg(*finals)
        key = self.name_sep.join(keys)
        self._stats_dfs[key], self._paths[key] = materialize(
            stats, f"joingroupby_{key}", self.out_path)

    def artifacts(self):
        return dict(self._stats_dfs)

    def load_artifacts(self, spark, paths):
        self._stats_dfs = {k: spark.read.parquet(p) for k, p in paths.items()}
        self.fitted = True

    def save_state(self):
        return {"groups": list(self._stats_dfs)}

    def clear(self):
        super().clear()
        self._stats_dfs, self._paths = {}, {}
