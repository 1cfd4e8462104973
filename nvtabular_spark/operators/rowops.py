"""Row/projection ops: Rename, Filter, Dropna, AddMetadata family,
ReduceDtypeSize, DropLowCardinality.

Reference: rename.py:20-78, filter.py:28-62, dropna.py:21-37,
add_metadata.py:21-72, reduce_dtype_size.py:27-86,
drop_low_cardinality.py:21-89.
"""

from __future__ import annotations

from typing import Callable, Dict, List, Optional

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .base import AggStatOperator, Operator, StatOperator, TransformContext
from ..plans.graph import ColumnSelector


class Rename(Operator):
    """Rename via callable, postfix, or fixed name (reference
    rename.py:20-78; ``name`` requires a single input column)."""

    preserves_dtype = True  # schema-only op: values untouched


    def __init__(self, f: Optional[Callable] = None, postfix: Optional[str] = None,
                 name: Optional[str] = None):
        if not (f or postfix or name):
            raise ValueError("Rename requires one of f/postfix/name")
        self.f = f
        self.postfix = postfix
        self.name = name

    def _rename(self, c: str) -> str:
        if self.f:
            return self.f(c)
        if self.postfix:
            return f"{c}{self.postfix}"
        return self.name  # type: ignore[return-value]

    def output_column_names(self, selector: ColumnSelector):
        if self.name and len(selector.names) != 1:
            raise ValueError("Rename(name=...) needs exactly one input column")
        return [self._rename(c) for c in selector.names]

    def transform(self, ctx: TransformContext, df: DataFrame) -> DataFrame:
        cols = {ctx.out(self._rename(pub)): F.col(act) for pub, act in ctx.pairs()}
        return df.withColumns(cols)

    def save_params(self):
        if self.f is not None:
            from ..plans.serializer import callable_ref
            return {"f": callable_ref(self.f), "postfix": self.postfix,
                    "name": self.name}
        return {"f": None, "postfix": self.postfix, "name": self.name}

    @classmethod
    def load_params(cls, params):
        f = params.get("f")
        if isinstance(f, dict):
            from ..plans.serializer import resolve_callable
            f = resolve_callable(f)
        return cls(f=f, postfix=params.get("postfix"), name=params.get("name"))


class Filter(Operator):
    """Row filter (reference filter.py:28-62). Accepts either a Spark
    Column / SQL-string predicate (fast path, stays in codegen) or a
    callable ``DataFrame -> Column`` evaluated against the selected
    columns."""

    preserves_dtype = True  # row/metadata op: values untouched


    row_preserving = False

    def __init__(self, f):
        self.f = f

    def transform(self, ctx: TransformContext, df: DataFrame) -> DataFrame:
        if isinstance(self.f, str):
            # SQL predicate over *public* names: remap public → actual
            # names only for predicate evaluation. Public-named columns
            # that already exist in the threaded frame (e.g. a raw
            # TargetEncoding target read via dependencies()) are backed
            # up and restored so the remap never leaks downstream.
            remap = {pub: act for pub, act in ctx.pairs() if pub != act}
            existed = {pub for pub in remap if pub in df.columns}
            backup = {f"__fbk__{pub}": F.col(pub) for pub in existed}
            pred_df = df.withColumns(backup).withColumns(
                {pub: F.col(act) for pub, act in remap.items()})
            df = pred_df.filter(self.f)
            # restore clobbered raw columns; drop pub columns the remap
            # CREATED (they didn't exist before and must not leak)
            if existed:
                df = df.withColumns(
                    {pub: F.col(f"__fbk__{pub}") for pub in existed})
            df = df.drop(*backup, *[p for p in remap if p not in existed])
        elif isinstance(self.f, Column):
            df = df.filter(self.f)
        else:
            # Column-proxy fast path first: callable receives a proxy
            # (public name → Column over the actual namespaced column),
            # so the returned predicate stays in JVM codegen. Reference
            # callables that need a real DataFrame (returning a filtered
            # frame or a bool mask, filter.py:28-62) fall back to an
            # Arrow-batched mapInPandas evaluation.
            # Only proxy-incompatibility errors reroute to the pandas
            # fallback (a Column-style callable poking DataFrame-only
            # attributes raises one of these); anything else is a real
            # bug in the callable and must surface HERE, not per-batch
            # on executors with a confusing mapInPandas traceback.
            pred = None
            try:
                pred = self.f(_ColumnProxy(dict(ctx.pairs())))
            except (TypeError, KeyError, AttributeError) as e:
                import logging
                logging.getLogger(__name__).debug(
                    "Filter callable is not Column-proxy compatible "
                    "(%s: %s); using the Arrow mapInPandas path",
                    type(e).__name__, e)
            if isinstance(pred, Column):
                df = df.filter(pred)
            else:
                df = self._filter_pandas(ctx, df)
        cols = {ctx.out(pub): F.col(act) for pub, act in ctx.pairs()}
        return df.withColumns(cols)

    def _filter_pandas(self, ctx, df: DataFrame) -> DataFrame:
        """Reference-compatible slow path (filter.py:28-62): the callable
        sees a pandas view of the selected columns under their PUBLIC
        names and may return either a filtered DataFrame (index subset)
        or a boolean mask Series. Arrow-batched via mapInPandas — no
        per-row Python."""
        import pandas as pd

        pairs = dict(ctx.pairs())  # pub -> act
        fn = self.f

        def gen(batches):
            for pdf in batches:
                view = pdf[list(pairs.values())].rename(
                    columns={act: pub for pub, act in pairs.items()})
                res = fn(view)
                if isinstance(res, pd.Series):
                    mask = res.fillna(False).to_numpy(dtype=bool)
                    yield pdf[mask]
                elif isinstance(res, pd.DataFrame):
                    yield pdf.loc[res.index]
                else:
                    raise TypeError(
                        "Filter callable must return a Column predicate, "
                        "a boolean mask Series, or a filtered DataFrame; "
                        f"got {type(res).__name__}")

        return df.mapInPandas(gen, schema=df.schema)

    def save_params(self):
        if isinstance(self.f, str):
            return {"f": self.f}
        if isinstance(self.f, Column):
            raise ValueError(
                "Filter built from a live Column is not serializable; use a "
                "SQL string predicate")
        from ..plans.serializer import callable_ref
        return {"f": callable_ref(self.f)}

    @classmethod
    def load_params(cls, params):
        f = params["f"]
        if isinstance(f, dict):
            from ..plans.serializer import resolve_callable
            f = resolve_callable(f)
        return cls(f)


class _ColumnProxy:
    """Duck-typed stand-in for a DataFrame inside Filter callables:
    ``d["x"]`` / ``d.x`` yield Columns over the actual column names."""

    def __init__(self, mapping):
        self._mapping = mapping

    def __getitem__(self, name: str) -> Column:
        return F.col(self._mapping[name])

    def __getattr__(self, name: str) -> Column:
        mapping = object.__getattribute__(self, "_mapping")
        if name in mapping:
            return F.col(mapping[name])
        raise AttributeError(name)


class Dropna(Operator):
    """Drop rows with nulls in the selected columns (dropna.py:21-37)."""

    preserves_dtype = True  # row/metadata op: values untouched


    row_preserving = False

    def transform(self, ctx: TransformContext, df: DataFrame) -> DataFrame:
        df = df.dropna(subset=[act for _, act in ctx.pairs()])
        cols = {ctx.out(pub): F.col(act) for pub, act in ctx.pairs()}
        return df.withColumns(cols)


class AddMetadata(Operator):
    """Data no-op; annotates the sidecar schema with tags/properties
    (reference add_metadata.py:21-72)."""

    preserves_dtype = True  # row/metadata op: values untouched


    def __init__(self, tags=None, properties=None):
        self.tags = list(tags or [])
        self.properties = dict(properties or {})

    def expr(self, col, name, df, ctx):
        return col

    def output_tags(self):
        return self.tags

    def output_properties(self):
        return self.properties


class AddTags(AddMetadata):
    def __init__(self, tags=None):
        super().__init__(tags=tags)


class AddProperties(AddMetadata):
    def __init__(self, properties=None):
        super().__init__(properties=properties)


class TagAsUserID(AddMetadata):
    def __init__(self):
        super().__init__(tags=["user_id", "user", "categorical"])


class TagAsItemID(AddMetadata):
    def __init__(self):
        super().__init__(tags=["item_id", "item", "categorical"])


class TagAsUserFeatures(AddMetadata):
    def __init__(self):
        super().__init__(tags=["user"])


class TagAsItemFeatures(AddMetadata):
    def __init__(self):
        super().__init__(tags=["item"])


_INT_STEPS = [("tinyint", -128, 127), ("smallint", -32768, 32767),
              ("int", -2147483648, 2147483647), ("bigint", None, None)]


class ReduceDtypeSize(AggStatOperator):
    """fit: global min/max per column; transform: cast ints to the
    smallest fitting integer type, floats to ``float_dtype``
    (reference reduce_dtype_size.py:27-86). Batchable fit."""

    def __init__(self, float_dtype: str = "float"):
        super().__init__()
        self.float_dtype = float_dtype
        self.ranges: Dict[str, tuple] = {}

    def agg_requests(self, ctx: TransformContext, df: DataFrame):
        self._pubs = [pub for pub, _ in ctx.pairs()]
        aggs = []
        for pub, act in ctx.pairs():
            aggs += [F.min(act).alias(self._alias(f"{pub}__min")),
                     F.max(act).alias(self._alias(f"{pub}__max"))]
        return aggs

    def consume_agg(self, row) -> None:
        self.ranges = {pub: (row[self._alias(f"{pub}__min")],
                             row[self._alias(f"{pub}__max")])
                       for pub in self._pubs}

    def _target_dtype(self, df: DataFrame, act: str, pub: str) -> Optional[str]:
        dt = df.schema[act].dataType.simpleString()
        if dt in ("tinyint", "smallint", "int", "bigint"):
            lo, hi = self.ranges.get(pub, (None, None))
            if lo is None or hi is None:
                return None
            for name, tlo, thi in _INT_STEPS:
                if tlo is None or (lo >= tlo and hi <= thi):
                    return name if name != dt else None
            return None
        if dt in ("double", "float"):
            return self.float_dtype if dt != self.float_dtype else None
        return None

    def transform(self, ctx: TransformContext, df: DataFrame) -> DataFrame:
        self._require_fitted()
        cols = {}
        for pub, act in ctx.pairs():
            target = self._target_dtype(df, act, pub)
            cols[ctx.out(pub)] = F.col(act).cast(target) if target else F.col(act)
        return df.withColumns(cols)

    def save_state(self):
        return {"ranges": {k: [v[0], v[1]] for k, v in self.ranges.items()}}

    def load_state(self, state):
        self.ranges = {k: (v[0], v[1]) for k, v in state["ranges"].items()}
        self.fitted = True


class DropLowCardinality(AggStatOperator):
    """Drops categorical columns whose distinct count < min_cardinality
    (reference drop_low_cardinality.py:21-89; there it is schema-driven
    from Categorify metadata — here we measure with
    approx_count_distinct, exact on small data).

    Not deferrable: its output columns depend on the fitted result."""

    preserves_dtype = True  # drops columns/rows, never rewrites values


    defer_ok = False

    def __init__(self, min_cardinality: int = 2, exact: bool = True):
        super().__init__()
        self.min_cardinality = min_cardinality
        self.exact = exact
        self.kept: List[str] = []

    def agg_requests(self, ctx: TransformContext, df: DataFrame):
        fn = F.count_distinct if self.exact else F.approx_count_distinct
        self._pubs = [pub for pub, _ in ctx.pairs()]
        return [fn(F.col(act)).alias(self._alias(pub))
                for pub, act in ctx.pairs()]

    def consume_agg(self, row) -> None:
        self.kept = [pub for pub in self._pubs
                     if (row[self._alias(pub)] or 0) >= self.min_cardinality]

    def output_column_names(self, selector: ColumnSelector):
        if getattr(self, "fitted", False):
            return [c for c in selector.names if c in self.kept]
        return list(selector.names)

    def transform(self, ctx: TransformContext, df: DataFrame) -> DataFrame:
        self._require_fitted()
        cols = {ctx.out(pub): F.col(act) for pub, act in ctx.pairs()
                if pub in self.kept}
        return df.withColumns(cols)

    def save_state(self):
        return {"kept": self.kept}

    def load_state(self, state):
        self.kept = state["kept"]
        self.fitted = True
