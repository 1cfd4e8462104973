"""TargetEncoding — smoothed out-of-fold target mean per category.

Reference: nvtabular/ops/target_encoding.py:35-439. Formula
(:54-61,340-349)::

    TE = (sum_y_other_folds + p_smooth * mean_global)
       / (count_other_folds + p_smooth)

fit computes groupby (count,sum) per [group] AND per [fold]+[group]
(:180-213) plus the global target mean (:174-176); transform does the
leave-one-fold-out arithmetic and a broadcast left join, filling unseen
groups with the global mean (:301-384). Output columns are
``TE_<group>_<target>`` (:297-299).

Fold assignment: the reference draws folds with a numpy RNG per
partition (:427-439) which is not reproducible across engines; its own
tests only assert fold self-consistency (test_target_encode.py:71-84).
Our contract is deterministic: ``fold = pmod(hash64(fold_col, seed),
kfold)`` over a user-named id column — reproducible across runs,
partitionings, and engines (SURVEY.md §7 risk 3).
"""

from __future__ import annotations

from typing import Dict, List, Optional, Union

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .base import StatOperator, TransformContext
from ..functions.hashing import hash64
from ..plans.graph import ColumnSelector
from ..sources.artifacts import (materialize, parquet_rows,
                                 small_parquet_pandas)


class TargetEncoding(StatOperator):
    cheap_transform = False  # broadcast-join-backed transform

    def __init__(self, target: Union[str, List[str]], fold_col: str,
                 kfold: int = 3, fold_seed: int = 42, p_smooth: float = 20,
                 target_mean: Optional[float] = None, out_dtype: str = "double",
                 name_sep: str = "_", out_path: Optional[str] = None,
                 fold_is_precomputed: bool = False,
                 broadcast: Optional[bool] = None,
                 broadcast_limit: int = 5_000_000,
                 hash_family: str = "xxhash64", drop_folds: bool = True):
        super().__init__()
        # target may be a str, a list, or a workflow NODE whose outputs
        # are the target columns (reference node-dependency form,
        # TargetEncoding(cont_features) — workflow/node.py dependencies;
        # tests/unit/workflow/test_workflow_schemas.py:162). Node
        # targets are resolved to their output names here; the node
        # itself is attached as a dependency of the consuming DAG node
        # by Node.__rshift__ via node_dependencies().
        from ..plans.graph import Node as _Node
        raw = [target] if isinstance(target, (str, _Node)) else list(target)
        self.targets: List[str] = []
        self._target_nodes: List = []
        self._node_target_names: List[str] = []
        for t in raw:
            if isinstance(t, _Node):
                outs = t.output_columns()
                self._target_nodes.append(t)
                self._node_target_names.extend(outs)
                self.targets.extend(outs)
            else:
                self.targets.append(t)
        self.fold_col = fold_col
        self.kfold = kfold
        self.fold_seed = fold_seed
        self.p_smooth = p_smooth
        self.target_mean = target_mean
        self.out_dtype = out_dtype
        self.name_sep = name_sep
        self.out_path = out_path
        self.fold_is_precomputed = fold_is_precomputed
        #: None (default) = broadcast iff the fitted stats tables are
        #: under broadcast_limit rows (counted at fit time from the
        #: materialized parquet — one tiny job); True/False forces.
        #: Mirrors Categorify._should_broadcast: a 1e8-group fold table
        #: must NOT be hinted onto every executor.
        self.broadcast = broadcast
        self.broadcast_limit = broadcast_limit
        self.hash_family = hash_family
        self.drop_folds = drop_folds
        self.means: Dict[str, float] = {}
        self._all_dfs: Dict[str, DataFrame] = {}
        self._fold_dfs: Dict[str, DataFrame] = {}
        self._table_rows: Dict[str, int] = {}

    def dependencies(self):
        # RAW workflow-input columns only; node-resolved targets are
        # produced inside the DAG, not read from the source
        node_made = set(self._node_target_names)
        return [t for t in self.targets if t not in node_made] \
            + [self.fold_col]

    def node_dependencies(self):
        """DAG nodes whose outputs this op consumes (targets given as
        nodes); attached as Node.dependency_nodes by the graph algebra."""
        return list(self._target_nodes)

    def _fold_expr(self) -> Column:
        if self.fold_is_precomputed:
            return F.col(self.fold_col).cast("int")
        return F.pmod(hash64(F.col(self.fold_col), self.hash_family,
                             seed=self.fold_seed),
                      F.lit(self.kfold)).cast("int")

    def _groups(self, selector: ColumnSelector) -> List[tuple]:
        return [g if isinstance(g, tuple) else (g,)
                for g in selector.grouped_names]

    def _te_name(self, g: tuple, target: str) -> str:
        return f"TE_{self.name_sep.join(g)}_{target}"

    def output_column_names(self, selector: ColumnSelector):
        out = list(selector.names)
        for g in self._groups(selector):
            for t in self.targets:
                out.append(self._te_name(g, t))
        if not self.drop_folds:
            out.append("__fold__")
        return out

    # -- fit ------------------------------------------------------------------
    def fit(self, ctx: TransformContext, df: DataFrame) -> None:
        """Single-scan fit per group: only the per-(group, fold) groupBy
        touches the input; the all-folds table AND the global target
        mean are re-aggregated from that (small) materialized table —
        the reference runs three separate passes (target_encoding.py:
        174-213), we run one."""
        self._all_dfs, self._fold_dfs, self.means = {}, {}, {}
        dff = df.withColumn("__fold__", self._fold_expr())
        for gi, g in enumerate(self._groups(ctx.selector)):
            key = self.name_sep.join(g)
            acts = [ctx.inputs.get(c, c) for c in g]
            keys_all = [F.col(a).alias(f"__te_{c}") for a, c in zip(acts, g)]
            aggs_f = []
            for t in self.targets:
                tc = F.col(t).cast("double")
                # pandas/cudf agg semantics: NaN ≡ missing — an unguarded
                # NaN would poison the whole group's sum
                tc = F.when(F.isnan(tc), F.lit(None)).otherwise(tc)
                aggs_f += [F.count(tc).alias(f"__cnt_{t}"),
                           F.sum(tc).alias(f"__sum_{t}")]
            g_fold = dff.groupBy(*(keys_all + [F.col("__fold__")])).agg(*aggs_f)
            self._fold_dfs[key], fpath = materialize(
                g_fold, f"te_fold_{key}", self.out_path)
            self._table_rows[key] = parquet_rows(
                fpath, fallback_df=self._fold_dfs[key])

            folded = self._fold_dfs[key]
            # the all-folds table stays a LAZY aggregation over the
            # (small, materialized) fold parquet — writing it out was a
            # second fit job per group for a table the broadcast build
            # re-derives in microseconds
            self._all_dfs[key] = folded.groupBy(
                *[f"__te_{c}" for c in g]).agg(
                *[F.sum(f"__cnt_{t}").alias(f"__cnt_{t}")
                  for t in self.targets],
                *[F.sum(f"__sum_{t}").alias(f"__sum_{t}")
                  for t in self.targets])

            if gi == 0:
                self._derive_means(folded, fpath)
        self.fitted = True

    def _derive_means(self, folded: DataFrame, fpath: str) -> None:
        """Global target means from the materialized fold table —
        driver-side pandas when the table is small (no Spark job),
        Spark aggregation otherwise."""
        if self.target_mean is not None:
            self.means = {t: float(self.target_mean) for t in self.targets}
            return
        pdf = small_parquet_pandas(fpath)
        if pdf is not None:
            self.means = {t: float(pdf[f"__sum_{t}"].sum()
                                   / pdf[f"__cnt_{t}"].sum())
                          for t in self.targets}
            return
        row = folded.agg(
            *[(F.sum(f"__sum_{t}") / F.sum(f"__cnt_{t}")).alias(t)
              for t in self.targets]).collect()[0]
        self.means = {t: float(row[t]) for t in self.targets}

    # -- shared-key fit fusion (base.StatOperator protocol) -------------------
    def _fold_sig(self) -> str:
        if self.fold_is_precomputed:
            return f"pre:{self.fold_col}"
        return (f"hash:{self.fold_col}:{self.fold_seed}:{self.kfold}"
                f":{self.hash_family}")

    def fused_fit_requests(self, ctx: TransformContext):
        """The per-(group, fold) count/sum partials ARE this op's fold
        table, so a TargetEncoding sharing keys (and fold definition)
        with other stat ops rides the compiler's single groupBy scan;
        the all-folds table and the global mean re-aggregate from the
        small materialized result exactly as in :meth:`fit`."""
        from .base import FusedFitRequest
        self._all_dfs, self._fold_dfs, self.means = {}, {}, {}
        reqs = []
        for g in self._groups(ctx.selector):
            key = self.name_sep.join(g)
            acts = tuple(ctx.inputs.get(c, c) for c in g)
            p = f"te{abs(id(self)) % 10 ** 8}_{key}"
            aggs = []
            for t in self.targets:
                tc = F.col(t).cast("double")
                tc = F.when(F.isnan(tc), F.lit(None)).otherwise(tc)
                aggs += [F.count(tc).alias(f"{p}__cnt_{t}"),
                         F.sum(tc).alias(f"{p}__sum_{t}")]
            reqs.append(FusedFitRequest(
                self, ctx, acts, aggs, fold_expr=self._fold_expr(),
                fold_sig=self._fold_sig(), tag=(g, p)))
        return reqs

    def consume_fused(self, req, grouped: DataFrame) -> None:
        g, p = req.tag
        key = self.name_sep.join(g)
        sel = [F.col(f"__k{i}").alias(f"__te_{c}")
               for i, c in enumerate(g)] + [F.col("__fold__")]
        for t in self.targets:
            sel += [F.col(f"{p}__cnt_{t}").alias(f"__cnt_{t}"),
                    F.col(f"{p}__sum_{t}").alias(f"__sum_{t}")]
        folded = grouped.select(*sel)
        self._fold_dfs[key], fpath = materialize(
            folded, f"te_fold_{key}", self.out_path)
        folded = self._fold_dfs[key]
        self._table_rows[key] = parquet_rows(fpath, fallback_df=folded)
        # lazy all-folds aggregation over the materialized fold parquet
        # (see fit() — no second write job)
        self._all_dfs[key] = folded.groupBy(*[f"__te_{c}" for c in g]).agg(
            *[F.sum(f"__cnt_{t}").alias(f"__cnt_{t}") for t in self.targets],
            *[F.sum(f"__sum_{t}").alias(f"__sum_{t}") for t in self.targets])
        if not self.means:
            self._derive_means(folded, fpath)

    def _should_broadcast(self, key: str) -> bool:
        if self.broadcast is not None:
            return self.broadcast
        rows = self._table_rows.get(key)
        return rows is None or rows <= self.broadcast_limit

    # -- transform ----------------------------------------------------------------
    def transform(self, ctx: TransformContext, df: DataFrame) -> DataFrame:
        self._require_fitted()
        df = df.withColumn("__fold__", self._fold_expr())
        for g in self._groups(ctx.selector):
            key = self.name_sep.join(g)
            acts = [ctx.inputs.get(c, c) for c in g]
            alls, folds = self._all_dfs[key], self._fold_dfs[key]

            a_sel = [F.col(f"__te_{c}") for c in g] + \
                [F.col(f"__cnt_{t}").alias(f"__acnt_{t}") for t in self.targets] + \
                [F.col(f"__sum_{t}").alias(f"__asum_{t}") for t in self.targets]
            f_sel = [F.col(f"__te_{c}") for c in g] + [F.col("__fold__").alias("__ffold__")] + \
                [F.col(f"__cnt_{t}").alias(f"__fcnt_{t}") for t in self.targets] + \
                [F.col(f"__sum_{t}").alias(f"__fsum_{t}") for t in self.targets]
            a_df, f_df = alls.select(*a_sel), folds.select(*f_sel)
            if self._should_broadcast(key):
                a_df, f_df = F.broadcast(a_df), F.broadcast(f_df)

            cond_a = None
            for a, c in zip(acts, g):
                e = df[a].eqNullSafe(a_df[f"__te_{c}"])
                cond_a = e if cond_a is None else (cond_a & e)
            df = df.join(a_df, cond_a, "left").drop(*[f"__te_{c}" for c in g])

            cond_f = None
            for a, c in zip(acts, g):
                e = df[a].eqNullSafe(f_df[f"__te_{c}"])
                cond_f = e if cond_f is None else (cond_f & e)
            cond_f = cond_f & (df["__fold__"] == f_df["__ffold__"])
            df = df.join(f_df, cond_f, "left").drop(
                *[f"__te_{c}" for c in g], "__ffold__")

            p = float(self.p_smooth)
            new_cols = {}
            for t in self.targets:
                mean = self.means[t]
                cnt = (F.coalesce(F.col(f"__acnt_{t}"), F.lit(0))
                       - F.coalesce(F.col(f"__fcnt_{t}"), F.lit(0)))
                ssum = (F.coalesce(F.col(f"__asum_{t}"), F.lit(0.0))
                        - F.coalesce(F.col(f"__fsum_{t}"), F.lit(0.0)))
                te = (ssum + F.lit(p * mean)) / (cnt + F.lit(p))
                # unseen group OR no out-of-fold evidence with p=0
                # (ANSI division-by-zero) → global mean
                te = (F.when(F.col(f"__acnt_{t}").isNull(), F.lit(mean))
                      .when(cnt + F.lit(p) == 0, F.lit(mean))
                      .otherwise(te))
                new_cols[ctx.out(self._te_name(g, t))] = te.cast(self.out_dtype)
            drops = [f"__acnt_{t}" for t in self.targets] + \
                    [f"__asum_{t}" for t in self.targets] + \
                    [f"__fcnt_{t}" for t in self.targets] + \
                    [f"__fsum_{t}" for t in self.targets]
            df = df.withColumns(new_cols).drop(*drops)

        passthrough = {ctx.out(pub): F.col(act) for pub, act in ctx.pairs()}
        if not self.drop_folds:
            passthrough[ctx.out("__fold__")] = F.col("__fold__")
        df = df.withColumns(passthrough)
        return df.drop("__fold__") if self.drop_folds else df

    def merge_precheck(self, other: "TargetEncoding") -> None:
        from ..plans.merge import WorkflowMergeError
        self._require_fitted(), other._require_fitted()
        if set(self._fold_dfs) != set(other._fold_dfs):
            raise WorkflowMergeError(
                f"TargetEncoding group key sets differ: "
                f"{sorted(self._fold_dfs)} vs {sorted(other._fold_dfs)}")

    def merge_fitted(self, other: "TargetEncoding") -> None:
        """Exact partition-wise merge (plans/merge.py): per-(group,
        fold) count/sum tables are additive, and the fold assignment is
        row-local (hash/modulo of a stable key), so summing the two
        fold tables reproduces the union fit exactly; the all-folds
        table and global means re-derive from the merged folds."""
        from ..sources.artifacts import materialize, parquet_rows
        last = None
        for key, fa in self._fold_dfs.items():
            fb = other._fold_dfs[key]
            g_cols = [c for c in fa.columns
                      if c.startswith("__te_")] + ["__fold__"]
            sums = [F.sum(c).alias(c) for c in fa.columns
                    if c.startswith(("__cnt_", "__sum_"))]
            merged = fa.unionByName(fb).groupBy(*g_cols).agg(*sums)
            folded, fpath = materialize(merged, f"te_fold_merged_{key}",
                                        self.out_path)
            self._fold_dfs[key] = folded
            self._table_rows[key] = parquet_rows(fpath, fallback_df=folded)
            grp = [c for c in folded.columns if c.startswith("__te_")]
            self._all_dfs[key] = folded.groupBy(*grp).agg(
                *[F.sum(f"__cnt_{t}").alias(f"__cnt_{t}")
                  for t in self.targets],
                *[F.sum(f"__sum_{t}").alias(f"__sum_{t}")
                  for t in self.targets])
            last = (folded, fpath)
        if last is not None:
            # global means are identical from ANY key's fold table
            # (every table sums all rows) — derive ONCE, same as fit
            self.means = {}
            self._derive_means(*last)

    def artifacts(self):
        out = {}
        for k, v in self._all_dfs.items():
            out[f"all::{k}"] = v
        for k, v in self._fold_dfs.items():
            out[f"fold::{k}"] = v
        return out

    def load_artifacts(self, spark, paths):
        for name, p in paths.items():
            kind, key = name.split("::", 1)
            tgt = self._all_dfs if kind == "all" else self._fold_dfs
            tgt[key] = spark.read.parquet(p)
        self.fitted = True

    def save_params(self):
        p = super().save_params()
        p.pop("means", None)
        p["target"] = self.targets  # init-arg name for load round-trip
        # node-resolved target names must survive load (they are NOT
        # raw inputs; dependencies() excludes them)
        p["node_target_names"] = list(self._node_target_names)
        return p

    @classmethod
    def load_params(cls, params):
        params = dict(params)
        node_names = params.pop("node_target_names", [])
        op = super().load_params(params)
        op._node_target_names = list(node_names)
        return op

    def save_state(self):
        return {"means": self.means, "table_rows": self._table_rows}

    def load_state(self, state):
        self.means = state["means"]
        self._table_rows = state.get("table_rows", {})

    def clear(self):
        super().clear()
        self._all_dfs, self._fold_dfs, self.means = {}, {}, {}
        self._table_rows = {}

    def output_tags(self):
        return ["continuous"]


class WoEEncoding(StatOperator):
    """Weight-of-Evidence encoding — the credit-scoring categorical
    encoder (public method; not in the reference, whose closest analog
    is TargetEncoding's smoothed mean, target_encoding.py:54-61): per
    category ``c`` of a BINARY 0/1 target::

        WOE_c = ln((pos_c + alpha) / (neg_c + alpha))
              - ln((pos_tot + alpha) / (neg_tot + alpha))

    i.e. the category's Laplace-smoothed log-odds relative to the
    global prior log-odds — positive where the category skews toward
    target=1, negative toward 0, exactly 0 for a category that matches
    the prior. Unseen categories at transform time encode to 0.0 (the
    prior), mirroring TargetEncoding's global-mean fill. NaN targets
    are missing (excluded from both counts).

    Selector columns are the categorical keys (grouped selectors =
    multi-column keys); output ``WOE_<key>_<target>``, keys pass
    through. Unlike TargetEncoding there is no fold machinery: WoE's
    leakage control is the smoothing prior (the classic formulation) —
    for strict out-of-time hygiene fit on the train split only
    (``functions.sampling.split_time_holdout``).

    Scale shape: fit is ONE map-side-partial groupBy per key group
    (pos-sum + count); totals re-aggregate driver-side from the small
    materialized table; transform is a broadcast left join (forced
    off above ``broadcast_limit`` rows, matching TargetEncoding).
    """

    cheap_transform = False  # broadcast-join-backed transform

    def __init__(self, target: str, alpha: float = 0.5,
                 out_dtype: str = "double", name_sep: str = "_",
                 out_path: Optional[str] = None,
                 broadcast: Optional[bool] = None,
                 broadcast_limit: int = 5_000_000):
        super().__init__()
        self.target = target
        self.alpha = float(alpha)
        if self.alpha <= 0:
            raise ValueError("alpha must be > 0 (empty categories "
                             "would make the log-odds undefined)")
        self.out_dtype = out_dtype
        self.name_sep = name_sep
        self.out_path = out_path
        self.broadcast = broadcast
        self.broadcast_limit = broadcast_limit
        self.totals: Dict[str, List[float]] = {}   # key -> [pos, neg]
        self._tables: Dict[str, DataFrame] = {}
        self._table_rows: Dict[str, int] = {}

    def dependencies(self):
        return [self.target]

    def _groups(self, selector: ColumnSelector) -> List[tuple]:
        return [g if isinstance(g, tuple) else (g,)
                for g in selector.grouped_names]

    def _woe_name(self, g: tuple) -> str:
        return f"WOE_{self.name_sep.join(g)}_{self.target}"

    def output_column_names(self, selector: ColumnSelector):
        return list(selector.names) + [self._woe_name(g)
                                       for g in self._groups(selector)]

    def _target_expr(self) -> Column:
        tc = F.col(self.target).cast("double")
        return F.when(F.isnan(tc), F.lit(None)).otherwise(tc)

    def fit(self, ctx: TransformContext, df: DataFrame) -> None:
        from ..sources.artifacts import (materialize, parquet_rows,
                                         small_parquet_pandas)
        self._tables, self.totals, self._table_rows = {}, {}, {}
        tc = self._target_expr()
        for g in self._groups(ctx.selector):
            key = self.name_sep.join(g)
            acts = [ctx.inputs.get(c, c) for c in g]
            keys = [F.col(a).alias(f"__woe_{c}")
                    for a, c in zip(acts, g)]
            tbl = df.groupBy(*keys).agg(
                F.sum(tc).alias("__pos__"),
                F.count(tc).alias("__cnt__"))
            self._tables[key], fpath = materialize(
                tbl, f"woe_{key}", self.out_path)
            self._table_rows[key] = parquet_rows(
                fpath, fallback_df=self._tables[key])
            pdf = small_parquet_pandas(fpath)
            if pdf is not None:
                pos = float(pdf["__pos__"].sum())
                cnt = float(pdf["__cnt__"].sum())
            else:
                row = self._tables[key].agg(
                    F.sum("__pos__").alias("p"),
                    F.sum("__cnt__").alias("c")).collect()[0]
                pos = float(row["p"] or 0.0)
                cnt = float(row["c"] or 0.0)
            self.totals[key] = [pos, cnt - pos]
        self.fitted = True

    def _should_broadcast(self, key: str) -> bool:
        if self.broadcast is not None:
            return self.broadcast
        rows = self._table_rows.get(key)
        return rows is None or rows <= self.broadcast_limit

    def transform(self, ctx: TransformContext, df: DataFrame) -> DataFrame:
        import math
        self._require_fitted()
        a = self.alpha
        for g in self._groups(ctx.selector):
            key = self.name_sep.join(g)
            acts = [ctx.inputs.get(c, c) for c in g]
            tbl = self._tables[key]
            if self._should_broadcast(key):
                tbl = F.broadcast(tbl)
            cond = None
            for act, c in zip(acts, g):
                e = df[act].eqNullSafe(tbl[f"__woe_{c}"])
                cond = e if cond is None else (cond & e)
            df = df.join(tbl, cond, "left") \
                .drop(*[f"__woe_{c}" for c in g])
            pos_t, neg_t = self.totals[key]
            prior = math.log((pos_t + a) / (neg_t + a))
            pos = F.coalesce(F.col("__pos__"), F.lit(0.0))
            neg = (F.coalesce(F.col("__cnt__"), F.lit(0)) - pos)
            woe = (F.log((pos + F.lit(a)) / (neg + F.lit(a)))
                   - F.lit(prior))
            # unseen category (no fitted row) → the prior, i.e. 0.0
            woe = F.when(F.col("__cnt__").isNull(), F.lit(0.0)) \
                .otherwise(woe)
            df = df.withColumn(ctx.out(self._woe_name(g)),
                               woe.cast(self.out_dtype)) \
                .drop("__pos__", "__cnt__")
        passthrough = {ctx.out(pub): F.col(act)
                       for pub, act in ctx.pairs()}
        return df.withColumns(passthrough)

    def merge_precheck(self, other: "WoEEncoding") -> None:
        from ..plans.merge import WorkflowMergeError
        self._require_fitted(), other._require_fitted()
        if self.target != other.target:
            raise WorkflowMergeError(
                f"WoEEncoding targets differ: {self.target!r} vs "
                f"{other.target!r}")
        if set(self._tables) != set(other._tables):
            raise WorkflowMergeError(
                f"WoEEncoding key sets differ: {sorted(self._tables)} "
                f"vs {sorted(other._tables)}")

    def merge_fitted(self, other: "WoEEncoding") -> None:
        """Exact partition-wise merge (plans/merge.py): per-category
        (pos, cnt) pairs are additive, so summing the two fitted
        tables reproduces the union-fit state exactly; totals sum
        element-wise."""
        from ..sources.artifacts import materialize, parquet_rows
        for key, ta in self._tables.items():
            tb = other._tables[key]
            keys = [c for c in ta.columns if c.startswith("__woe_")]
            merged = ta.unionByName(tb).groupBy(*keys).agg(
                F.sum("__pos__").alias("__pos__"),
                F.sum("__cnt__").alias("__cnt__"))
            self._tables[key], fpath = materialize(
                merged, f"woe_merged_{key}", self.out_path)
            self._table_rows[key] = parquet_rows(
                fpath, fallback_df=self._tables[key])
            pa, pb = self.totals[key], other.totals[key]
            self.totals[key] = [pa[0] + pb[0], pa[1] + pb[1]]

    def artifacts(self):
        return {f"woe::{k}": v for k, v in self._tables.items()}

    def load_artifacts(self, spark, paths):
        for name, p in paths.items():
            _, key = name.split("::", 1)
            self._tables[key] = spark.read.parquet(p)
        self.fitted = True

    def save_state(self):
        return {"totals": self.totals, "table_rows": self._table_rows}

    def load_state(self, state):
        self.totals = state["totals"]
        self._table_rows = {k: int(v) for k, v in
                            state.get("table_rows", {}).items()}
        self.fitted = True

