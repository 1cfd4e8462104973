"""Categorify — categorical → contiguous integer ids.

Reference: nvtabular/ops/categorify.py:58-1916. Encoding contract
(categorify.py:52-71, verified against tests/unit/ops/test_categorify.py:128-195):

* ``0``                      — reserved for padding, never emitted
* ``1``                      — null/NaN
* ``[2, 2 + nb)``            — OOV (hash buckets; nb = num_buckets or 1)
* ``[2 + nb, ...)``          — vocabulary, ordered by frequency DESC,
                               value ASC tie-break

``freq_threshold`` drops rare values to OOV (ref :774-785); ``max_size``
caps the vocab at ``max_size - 2 - nb`` top rows (ref :186-198,768-782);
``encode_type='joint'`` shares one vocab across a column group
(ref :972-981); ``'combo'`` encodes value-combinations as one new
column ``A_B`` (ref :266-272,539-553); list columns encode element-wise
(ref :1694-1705); user ``vocabs`` bypass fit (ref :421-454).

Spark-first design: the reference's ~600-line hand-built tree reduction
(`_top/_mid/_bottom_level_groupby`, :955-1137,1344-1540) is ONE
``df.groupBy(col).count()`` — Catalyst plans the partial/final hash
aggregation and AQE picks shuffle parallelism. Contiguous ids come from
:func:`~nvtabular_spark.functions.ids.with_global_index` (distributed
zipWithIndex, no single-partition sort). The vocab is materialized to
parquet (≙ reference ``unique.<col>.parquet``, :719-822) and applied as
a broadcast hash left-join (≙ reference ``_encode``, :1558-1807).
List columns are encoded by a dict-broadcast Arrow pandas_udf — at
10^12-row scale this avoids the explode→join→regroup shuffle entirely;
an ``explode`` strategy is available when the vocab exceeds memory.

Dask-specific knobs (``split_out``, ``split_every``, ``cat_cache``,
``on_host``, ``search_sorted``) are intentionally absent: AQE +
broadcast variables replace them (SURVEY.md §4).
"""

from __future__ import annotations

import hashlib
import math
from typing import Dict, List, Optional, Union

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import ArrayType

from .base import StatOperator, TransformContext
from ..functions.hashing import hash64
from ..functions.ids import with_global_index
from ..plans.graph import ColumnSelector
from ..sources.artifacts import (materialize, parquet_rows,
                                 small_parquet_pandas)

PAD_OFFSET = 0
NULL_OFFSET = 1
OOV_OFFSET = 2


def embedding_size(cardinality: int, multiplier: float = 1.6,
                   minimum: int = 16, maximum: int = 512) -> int:
    """Reference heuristic (categorify.py:687-688):
    ``min(max(16, round(1.6 * n**0.56)), 512)``."""
    return int(min(max(minimum, round(multiplier * cardinality ** 0.56)), maximum))


def _md5_bucket_py(value, num_buckets: int) -> int:
    """Python twin of hashing.hash64(family='md5') % nb — used inside the
    list-column pandas_udf so scalar and list paths agree bit-for-bit."""
    h = hashlib.md5(str(value).encode("utf-8")).hexdigest()
    return int(h[:15], 16) % num_buckets


class Categorify(StatOperator):
    cheap_transform = False  # broadcast-join-backed transform

    def __init__(self, freq_threshold: Union[int, Dict[str, int]] = 0,
                 encode_type: str = "joint",
                 num_buckets: Union[None, int, Dict[str, int]] = None,
                 max_size: Union[int, Dict[str, int]] = 0,
                 vocabs: Optional[dict] = None,
                 dtype: str = "int",
                 out_path: Optional[str] = None,
                 name_sep: str = "_",
                 hash_family: str = "xxhash64",
                 broadcast: Optional[bool] = None,
                 list_strategy: str = "udf",
                 single_table: bool = False,
                 broadcast_limit: int = 30_000_000,
                 list_vocab_limit: int = 500_000):
        super().__init__()
        if encode_type not in ("joint", "combo"):
            raise ValueError("encode_type must be 'joint' or 'combo'")
        self.freq_threshold = freq_threshold
        self.encode_type = encode_type
        self.num_buckets = num_buckets
        self.max_size = max_size
        self.vocabs = vocabs
        self.dtype = dtype
        self.out_path = out_path
        self.name_sep = name_sep
        self.hash_family = hash_family
        self.broadcast = broadcast
        self.list_strategy = list_strategy
        self.single_table = single_table
        # scale guards: vocabularies beyond broadcast_limit rows fall
        # back to a shuffle join (AQE picks the strategy), and list
        # columns beyond list_vocab_limit switch from the driver-dict
        # pandas_udf to the explode-join strategy — neither path ever
        # materializes an unbounded vocabulary on the driver. The
        # default 500k keeps the pickled dict broadcast under ~50-100MB
        # per executor (a 5M-entry python dict is ~0.5-1GB — too big)
        # (≙ reference split_out>1 handling, categorify.py:1644-1664)
        self.broadcast_limit = broadcast_limit
        self.list_vocab_limit = list_vocab_limit
        self._vocab_dfs: Dict[str, DataFrame] = {}
        self._paths: Dict[str, str] = {}
        self._sizes: Dict[str, int] = {}
        self._member_keys: Dict[str, str] = {}

    # -- option resolution ---------------------------------------------------
    def _opt(self, option, key: str, default):
        if isinstance(option, dict):
            return option.get(key, default)
        return option if option is not None else default

    def _nb_slots(self, key: str) -> int:
        nb = self._opt(self.num_buckets, key, None)
        return int(nb) if nb else 1

    def _oov_buckets(self, key: str) -> Optional[int]:
        nb = self._opt(self.num_buckets, key, None)
        return int(nb) if nb else None

    def _start_index(self, key: str) -> int:
        return OOV_OFFSET + self._nb_slots(key)

    # -- grouping -------------------------------------------------------------
    def _groups(self, selector: ColumnSelector) -> List[tuple]:
        return [g if isinstance(g, tuple) else (g,)
                for g in selector.grouped_names]

    def _group_key(self, cols: tuple) -> str:
        return self.name_sep.join(cols)

    def output_column_names(self, selector: ColumnSelector):
        out: List[str] = []
        for g in self._groups(selector):
            if self.encode_type == "combo" and len(g) > 1:
                out.append(self._group_key(g))
            else:
                out.extend(g)
        return out

    # -- fit --------------------------------------------------------------------
    def fit(self, ctx: TransformContext, df: DataFrame) -> None:
        """One-scan fit: all scalar column counts of a common dtype are
        stacked (explode of a struct array — a flatMap, no extra scan)
        into a single groupBy job whose result is materialized once;
        per-group vocab ranking then runs on that small counts table.
        Replaces the reference's per-column ``_groupby_to_disk`` task
        graphs (categorify.py:1344-1540) with Catalyst-planned partial+
        final aggregation."""
        self._vocab_dfs, self._paths, self._sizes = {}, {}, {}
        groups = self._groups(ctx.selector)
        # output column → vocab key, for schema domain properties
        # (reference domain contract: joint members share one domain,
        # tests/unit/ops/test_categorify.py:562 test_categorify_domain_name)
        self._member_keys = {}
        for g in groups:
            key = self._group_key(g)
            if self.encode_type == "combo" and len(g) > 1:
                self._member_keys[key] = key
            else:
                for c in g:
                    self._member_keys[c] = key

        # classify groups
        stackable: list = []   # (key, col, tag, cast_string, is_list)
        solo: list = []        # groups handled individually
        for g in groups:
            key = self._group_key(g)
            if self.vocabs and key in self.vocabs:
                continue
            if self.encode_type == "combo" and len(g) > 1:
                solo.append(g)
                continue
            cast_string = len(g) > 1
            for col in g:
                act = ctx.inputs.get(col, col)
                is_list = isinstance(df.schema[act].dataType, ArrayType)
                # tag is a small INT, not a "key::col" string: the tag
                # rides every stacked (tag, value) row through the fit's
                # one big shuffle, and hashing/compare/shuffle of an int
                # is ~4x cheaper than a composite string at 10^8 rows
                # (guide §2.3 "narrower types"; measured 38.8s -> 10.2s
                # on the 5M x 26-column criteo fit aggregate)
                stackable.append((key, col, len(stackable),
                                  cast_string, is_list))

        counts_by_key: Dict[str, DataFrame] = {}
        ranked_by_key: Dict[str, DataFrame] = {}
        sizes_from_rank: Dict[str, int] = {}
        if stackable:
            # bucket by value dtype so the struct array is homogeneous
            buckets: Dict[str, list] = {}
            for key, col, tag, cast_string, is_list in stackable:
                act = ctx.inputs.get(col, col)
                dtyp = df.schema[act].dataType
                if cast_string:
                    dt = "string"   # joint groups share one string vocab
                elif is_list:
                    dt = dtyp.elementType.simpleString()
                else:
                    dt = dtyp.simpleString()
                buckets.setdefault(dt, []).append(
                    (key, col, tag, cast_string, is_list))
            for dt, entries in buckets.items():
                structs = []     # scalar columns → one struct each
                list_arrs = []   # list columns → element-wise struct arrays
                for key, col, tag, cast_string, is_list in entries:
                    act = ctx.inputs.get(col, col)
                    if is_list:
                        # per-element structs; coalesce keeps NULL-array
                        # rows from nulling the whole concat.
                        # NB: closure factory, NOT a default-arg lambda —
                        # a 2-arg lambda is (element, index) to F.transform
                        def _tagger(t, cs):
                            return lambda x: F.struct(
                                F.lit(t).alias("__c__"),
                                (x.cast("string") if cs else x)
                                .alias("value"))

                        arr = F.transform(F.col(act),
                                          _tagger(tag, cast_string))
                        list_arrs.append(F.coalesce(
                            arr, F.array().cast(
                                f"array<struct<__c__:int,value:{dt}>>")))
                    else:
                        v = F.col(act).cast("string") if cast_string \
                            else F.col(act)
                        structs.append(F.struct(F.lit(tag).alias("__c__"),
                                                v.alias("value")))
                # ONE exploded array per row covers every scalar column
                # AND every list element — a single scan for all vocabs
                parts = ([F.array(*structs)] if structs else []) + list_arrs
                arr_all = parts[0] if len(parts) == 1 else F.concat(*parts)
                stacked = df.select(
                    F.explode(arr_all).alias("kv")
                ).select("kv.__c__", "kv.value") \
                    .filter(F.col("value").isNotNull())
                counts = stacked.groupBy("__c__", "value").agg(
                    F.count(F.lit(1)).alias("value_count"))
                single_col = [e for e in entries
                              if len([x for x in entries
                                      if x[0] == e[0]]) == 1 and not e[3]]
                multi = [e for e in entries if e not in single_col]
                if multi:
                    # several consumers → cut lineage once
                    counts_m, _ = materialize(counts, f"counts_{dt}",
                                              self.out_path)
                else:
                    # the ranking job is the ONLY consumer and its
                    # result is materialized anyway — skip the
                    # intermediate write+read of the counts table
                    counts_m = counts
                if single_col:
                    # rank EVERY single-column vocab in ONE window pass:
                    # per-column partitions rank in parallel, one
                    # materialize for all vocabularies — fit cost is
                    # O(1) jobs in the number of columns, not O(3N)
                    from pyspark.sql import Window
                    tags = [e[2] for e in single_col]
                    thr_map, cap_map, start_map = {}, {}, {}
                    for key, col, tag, _cs, _il in single_col:
                        thr_map[tag] = int(self._opt(self.freq_threshold,
                                                     key, 0) or 0)
                        ms = int(self._opt(self.max_size, key, 0) or 0)
                        start = self._start_index(key)
                        if ms and ms - start <= 0:
                            raise ValueError(
                                f"max_size={ms} too small for reserved "
                                f"slots ({start})")
                        cap_map[tag] = (ms - start) if ms else 2 ** 62
                        start_map[tag] = start

                    def per_tag(mapping, default=0):
                        # int tags index a literal array — O(1) lookup
                        # and a flat expression tree, vs the old nested
                        # WHEN chain whose depth grew with the column
                        # count (26 columns -> 26-deep CASE, ~2.6s of
                        # driver-side plan building alone)
                        n = max(mapping) + 1
                        return F.array(
                            *[F.lit(mapping.get(i, default))
                              for i in range(n)])[F.col("__c__")]

                    base = counts_m.filter(F.col("__c__").isin(tags))
                    base = base.filter(
                        (per_tag(thr_map) <= 1)
                        | (F.col("value_count") >= per_tag(thr_map)))
                    w = Window.partitionBy("__c__").orderBy(
                        F.col("value_count").desc(), F.col("value").asc())
                    ranked = (base.withColumn("__rn__", F.row_number().over(w))
                              .filter(F.col("__rn__") <= per_tag(cap_map))
                              .withColumn("code",
                                          (F.col("__rn__") - 1
                                           + per_tag(start_map)).cast("long"))
                              .select("__c__", "value", "value_count", "code"))
                    ranked_m, rpath = materialize(
                        ranked, f"unique_all_{dt}.parquet", self.out_path)
                    pdf = small_parquet_pandas(rpath)
                    if pdf is not None:   # max code per tag, no Spark job
                        mx = {} if pdf.empty else \
                            pdf.groupby("__c__")["code"].max().to_dict()
                    else:
                        size_rows = ranked_m.groupBy("__c__").agg(
                            F.max("code").alias("mx")).collect()
                        mx = {r["__c__"]: r["mx"] for r in size_rows}
                    for key, col, tag, _cs, _il in single_col:
                        ranked_by_key[key] = ranked_m \
                            .filter(F.col("__c__") == tag) \
                            .select("value", "value_count", "code")
                        self._paths[key] = rpath
                        sizes_from_rank[key] = int(
                            mx.get(tag, self._start_index(key) - 1)) + 1
                for key, col, tag, cast_string, _il in multi:
                    part = counts_m.filter(F.col("__c__") == tag) \
                        .select("value", "value_count")
                    if key in counts_by_key:   # joint group: merge members
                        counts_by_key[key] = counts_by_key[key].unionAll(part)
                    else:
                        counts_by_key[key] = part
            # joint groups with >1 member: same value across members sums
            for g in groups:
                key = self._group_key(g)
                if key in counts_by_key and len(g) > 1:
                    counts_by_key[key] = counts_by_key[key] \
                        .groupBy("value") \
                        .agg(F.sum("value_count").alias("value_count"))

        for g in groups:
            key = self._group_key(g)
            if key in ranked_by_key:
                # already ranked + materialized in the one-pass window job
                self._vocab_dfs[key] = ranked_by_key[key]
                self._sizes[key] = sizes_from_rank[key]
                continue
            if self.vocabs and key in self.vocabs:
                vocab = self._user_vocab(df.sparkSession, key, self.vocabs[key])
            elif key in counts_by_key:
                vocab = self._rank_vocab(counts_by_key[key], key,
                                         value_cols=["value"])
            elif self.encode_type == "combo" and len(g) > 1:
                vocab = self._fit_combo(ctx, df, g)
            else:
                vocab = self._fit_list_or_single(ctx, df, g)
            self._vocab_dfs[key], self._paths[key] = materialize(
                vocab, f"unique.{key}.parquet", self.out_path)
            n_vocab = getattr(vocab, "total_rows", None)
            if n_vocab is None:
                n_vocab = parquet_rows(self._paths[key],
                                       fallback_df=self._vocab_dfs[key])
            self._sizes[key] = n_vocab + self._start_index(key)
        self.fitted = True

    def _values_of(self, ctx: TransformContext, df: DataFrame,
                   col: str) -> Column:
        act = ctx.inputs.get(col, col)
        c = F.col(act)
        if isinstance(df.schema[act].dataType, ArrayType):
            return F.explode(c)
        return c

    def _fit_list_or_single(self, ctx, df: DataFrame, cols: tuple) -> DataFrame:
        """Fallback path: list columns (element-wise explode) and joint
        groups containing list columns."""
        key = self._group_key(cols)
        parts = []
        for col in cols:
            v = self._values_of(ctx, df, col)
            if len(cols) > 1:
                v = v.cast("string")  # shared vocab across columns → common type
            parts.append(df.select(v.alias("value")))
        values = parts[0]
        for p in parts[1:]:
            values = values.unionAll(p)
        counts = (values.filter(F.col("value").isNotNull())
                  .groupBy("value")
                  .agg(F.count(F.lit(1)).alias("value_count")))
        # materialize BEFORE ranking so the rank's per-partition count
        # job reruns over the small counts table, not the full input
        counts_m, _ = materialize(counts, f"counts.{key}", self.out_path)
        return self._rank_vocab(counts_m, key, value_cols=["value"])

    def _fit_combo(self, ctx, df: DataFrame, cols: tuple) -> DataFrame:
        key = self._group_key(cols)
        acts = [ctx.inputs.get(c, c) for c in cols]
        counts = (df.select(*[F.col(a).alias(f"value_{i}")
                              for i, a in enumerate(acts)])
                  .filter(F.expr(" AND ".join(
                      f"value_{i} IS NOT NULL" for i in range(len(acts)))))
                  .groupBy(*[f"value_{i}" for i in range(len(acts))])
                  .agg(F.count(F.lit(1)).alias("value_count")))
        counts_m, _ = materialize(counts, f"counts.{key}", self.out_path)
        return self._rank_vocab(counts_m, key,
                                value_cols=[f"value_{i}" for i in range(len(cols))])

    def _rank_vocab(self, counts: DataFrame, key: str,
                    value_cols: List[str]) -> DataFrame:
        thr = int(self._opt(self.freq_threshold, key, 0) or 0)
        if thr > 1:
            counts = counts.filter(F.col("value_count") >= thr)
        max_size = int(self._opt(self.max_size, key, 0) or 0)
        order = [F.col("value_count").desc()] + [F.col(c).asc() for c in value_cols]
        if max_size:
            cap = max_size - self._start_index(key)
            if cap <= 0:
                raise ValueError(
                    f"max_size={max_size} too small for reserved slots "
                    f"({self._start_index(key)})")
            counts = counts.orderBy(*order).limit(cap)
        ranked = with_global_index(counts, order, index_col="code",
                                   start=self._start_index(key))
        out = ranked.select(*value_cols, "value_count", "code")
        out.total_rows = ranked.total_rows   # avoid a later count() job
        return out

    def _user_vocab(self, spark, key: str, vocab) -> DataFrame:
        if isinstance(vocab, DataFrame):
            if "code" not in vocab.columns:
                vocab = with_global_index(
                    vocab, [F.col(vocab.columns[0]).asc()], index_col="code",
                    start=self._start_index(key))
                vocab = vocab.select(F.col(vocab.columns[0]).alias("value"),
                                     F.lit(0).alias("value_count"), "code")
            return vocab
        start = self._start_index(key)
        pdf = pd.DataFrame({
            "value": list(vocab),
            "value_count": [0] * len(vocab),
            "code": list(range(start, start + len(vocab))),
        })
        return spark.createDataFrame(pdf)

    # -- transform ----------------------------------------------------------------
    def transform(self, ctx: TransformContext, df: DataFrame) -> DataFrame:
        self._require_fitted()
        offset = 0  # single_table: each column shifted past the previous
        for g in self._groups(ctx.selector):
            key = self._group_key(g)
            vocab = self._vocab_dfs[key]
            if self.encode_type == "combo" and len(g) > 1:
                df = self._encode_combo(ctx, df, g, key, vocab, offset)
                if self.single_table:
                    offset += self._sizes[key] - 1
            else:
                for col in g:
                    df = self._encode_column(ctx, df, col, key, vocab,
                                             cast_string=len(g) > 1,
                                             offset=offset)
                    if self.single_table:
                        offset += self._sizes[key] - 1
        return df

    def _should_broadcast(self, key: str) -> bool:
        if self.broadcast is not None:
            return self.broadcast
        size = self._sizes.get(key)
        return size is None or size <= self.broadcast_limit

    def _oov_expr(self, key: str, value: Column) -> Column:
        nb = self._oov_buckets(key)
        if not nb:
            return F.lit(OOV_OFFSET)
        return (F.pmod(hash64(value, self.hash_family), F.lit(nb))
                + F.lit(OOV_OFFSET))

    def _encode_column(self, ctx, df: DataFrame, col: str, key: str,
                       vocab: DataFrame, cast_string: bool,
                       offset: int = 0) -> DataFrame:
        act = ctx.inputs.get(col, col)
        out = ctx.out(col)
        if isinstance(df.schema[act].dataType, ArrayType):
            return self._encode_list(ctx, df, act, out, key, vocab,
                                     cast_string, offset)
        cv, cc = f"__cv__{out}", f"__cc__{out}"
        v = vocab.select(F.col("value").alias(cv), F.col("code").alias(cc))
        if self._should_broadcast(key):
            v = F.broadcast(v)
        left = F.col(act).cast("string") if cast_string else F.col(act)
        joined = df.join(v, left == F.col(cv), "left")
        code = (F.when(F.col(act).isNull(), F.lit(NULL_OFFSET))
                .otherwise(F.coalesce(F.col(cc), self._oov_expr(key, left))))
        if offset:
            code = code + F.lit(offset)
        return joined.withColumn(out, code.cast(self.dtype)).drop(cv, cc)

    def _encode_combo(self, ctx, df: DataFrame, cols: tuple, key: str,
                      vocab: DataFrame, offset: int = 0) -> DataFrame:
        acts = [ctx.inputs.get(c, c) for c in cols]
        out = ctx.out(key)
        sel = [F.col(f"value_{i}").alias(f"__cv{i}__{out}")
               for i in range(len(cols))] + [F.col("code").alias(f"__cc__{out}")]
        v = vocab.select(*sel)
        if self._should_broadcast(key):
            v = F.broadcast(v)
        cond = None
        for i, a in enumerate(acts):
            c = F.col(a) == F.col(f"__cv{i}__{out}")
            cond = c if cond is None else (cond & c)
        joined = df.join(v, cond, "left")
        any_null = None
        for a in acts:
            n = F.col(a).isNull()
            any_null = n if any_null is None else (any_null | n)
        combo_str = F.concat_ws(self.name_sep,
                                *[F.col(a).cast("string") for a in acts])
        code = (F.when(any_null, F.lit(NULL_OFFSET))
                .otherwise(F.coalesce(F.col(f"__cc__{out}"),
                                      self._oov_expr(key, combo_str))))
        if offset:
            code = code + F.lit(offset)
        drops = [f"__cv{i}__{out}" for i in range(len(cols))] + [f"__cc__{out}"]
        return joined.withColumn(out, code.cast(self.dtype)).drop(*drops)

    def _encode_list(self, ctx, df: DataFrame, act: str, out: str, key: str,
                     vocab: DataFrame, cast_string: bool,
                     offset: int = 0) -> DataFrame:
        vocab_size = self._sizes.get(key, 0) - self._start_index(key)
        if self.list_strategy == "explode" or vocab_size > self.list_vocab_limit:
            if offset:
                raise NotImplementedError(
                    "single_table with explode strategy not supported")
            return self._encode_list_explode(df, act, out, key, vocab, cast_string)
        # dict-broadcast pandas_udf — Arrow batches, no shuffle
        rows = vocab.select("value", "code").collect()
        mapping = {r["value"]: r["code"] for r in rows}
        if cast_string:
            mapping = {str(k): v for k, v in mapping.items()}
        sc = df.sparkSession.sparkContext
        bc = sc.broadcast(mapping)
        nb = self._oov_buckets(key)
        null_code, oov0 = NULL_OFFSET, OOV_OFFSET
        cs = cast_string
        code_offset = offset

        import numpy as np

        @pandas_udf(ArrayType(_spark_int_type(self.dtype)))
        def encode(s: pd.Series) -> pd.Series:
            """Vectorized: flatten all arrays in the Arrow batch, one
            C-speed dict lookup over the flat values, python fallback
            only on the (rare) OOV misses, then regroup by offsets."""
            m = bc.value
            notnull = s.notna().to_numpy()
            lists = s[notnull]
            if len(lists) == 0:
                return pd.Series([None] * len(s), dtype=object)
            lengths = np.fromiter((len(a) for a in lists), dtype="int64",
                                  count=len(lists))
            if lengths.sum():
                flat = pd.Series(np.concatenate(
                    [np.asarray(a, dtype=object) for a in lists]))
            else:
                flat = pd.Series([], dtype=object)
            isnull_el = flat.isna().to_numpy()
            keys = flat.astype(str) if cs else flat
            mapped = keys.map(m)
            miss = mapped.isna().to_numpy() & ~isnull_el
            if miss.any():
                if nb:
                    # md5-family OOV hashing, inlined so the pickled UDF
                    # is self-contained (no module import on workers)
                    import hashlib

                    def _bucket(v):
                        h = hashlib.md5(str(v).encode("utf-8")).hexdigest()
                        return int(h[:15], 16) % nb

                    mapped.iloc[miss] = [oov0 + _bucket(k)
                                         for k in keys.iloc[miss]]
                else:
                    mapped.iloc[miss] = oov0
            codes = mapped.to_numpy()
            codes[isnull_el] = null_code
            codes = codes.astype("int64") + code_offset
            groups = np.split(codes, np.cumsum(lengths)[:-1])
            result = pd.Series([None] * len(s), dtype=object)
            result.iloc[np.flatnonzero(notnull)] = \
                [g.tolist() for g in groups]
            return result

        return df.withColumn(out, encode(F.col(act)))

    def _encode_list_explode(self, df, act, out, key, vocab, cast_string):
        """Exact-join strategy for vocabularies too large to broadcast:
        posexplode → join → re-collect by original row. One extra
        shuffle, arbitrary vocab size (≙ reference split_out>1 path,
        categorify.py:1644-1664).

        Correctness notes (both self-join hazards fixed):
        * the row id is stamped ONCE and the stamped frame is
          ``localCheckpoint``-ed before branching, so the id-carrying
          plan is never recomputed on the two sides of the join —
          ``monotonically_increasing_id`` is not stable across
          recomputations when the input has upstream shuffles.
          (Deliberate trade vs AsOfJoin's payload-carry design: here
          the payload would be duplicated per ARRAY ELEMENT through
          the vocab-join shuffle — ~100× for typical token arrays —
          so one checkpoint write of the input is the cheaper side;
          this path only engages past ``list_vocab_limit`` anyway.)
        * ``posexplode`` (inner) is used instead of ``posexplode_outer``
          so NULL arrays and empty arrays are NOT conflated into a
          (null, null) element row: after the left join back, NULL
          input stays NULL and ``[]`` stays ``[]`` — matching the
          element-wise udf strategy."""
        rid = "__rid__" + out
        pos, val = "__pos__" + out, "__val__" + out
        stamped = df.withColumn(rid, F.monotonically_increasing_id())
        # cut lineage: both branches below must observe identical rids
        stamped = stamped.localCheckpoint(eager=False)
        exploded = stamped.select(
            rid, F.posexplode(F.col(act)).alias(pos, val))
        cv, cc = f"__cv__{out}", f"__cc__{out}"
        v = vocab.select(F.col("value").alias(cv), F.col("code").alias(cc))
        left = F.col(val).cast("string") if cast_string else F.col(val)
        enc = exploded.join(v, left == F.col(cv), "left").withColumn(
            "__code__",
            F.when(F.col(val).isNull(), F.lit(NULL_OFFSET))
            .otherwise(F.coalesce(F.col(cc), self._oov_expr(key, left)))
            .cast(self.dtype))
        regrouped = (enc.groupBy(rid)
                     .agg(F.transform(
                         F.sort_array(F.collect_list(F.struct(F.col(pos), F.col("__code__")))),
                         lambda x: x["__code__"]).alias(out)))
        elem_type = _spark_int_type(self.dtype)
        joined = stamped.join(regrouped, rid, "left")
        restored = (F.when(F.col(act).isNull(),
                           F.lit(None).cast(ArrayType(elem_type)))
                    .otherwise(F.coalesce(
                        F.col(out), F.array().cast(ArrayType(elem_type)))))
        return joined.withColumn(out, restored).drop(rid)

    # -- schema / serialization -----------------------------------------------------
    def output_tags(self):
        return ["categorical"]

    def output_dtype(self):
        # reference categorify.py:586: encoded ids are self.dtype
        # (int64 default there, 'int' here) — declared, not unknown
        return self.dtype

    def output_properties(self):
        """Per-OUTPUT-column properties incl. the reference ``domain``
        contract ({name, min, max} — categorify.py output schema;
        joint members share one domain name/max, combo outputs carry
        the combined name)."""
        member_keys = getattr(self, "_member_keys", None) or \
            {k: k for k in self._sizes}
        props = {}
        for col, key in member_keys.items():
            size = self._sizes.get(key)
            if size is None:
                continue
            props[col] = {
                "cardinality": size,
                "embedding_size": embedding_size(size),
                "cat_path": self._paths.get(key),
                # INCLUSIVE max id (reference categorify.py:575
                # "max": cardinality - 1): the largest assignable code,
                # not the table size
                "domain": {"name": key, "min": 0, "max": size - 1},
            }
        return props

    def merge_precheck(self, other: "Categorify") -> None:
        """Only count-PRESERVING configurations are mergeable —
        freq_threshold > 1 or max_size truncate the stored counts (a
        value below threshold in both halves but above it combined
        would be lost), and user vocabs carry no counts."""
        from ..plans.merge import WorkflowMergeError
        self._require_fitted(), other._require_fitted()
        thr_vals = (self.freq_threshold.values()
                    if isinstance(self.freq_threshold, dict)
                    else [self.freq_threshold])
        if any((t or 0) > 1 for t in thr_vals):
            raise WorkflowMergeError(
                "Categorify with freq_threshold > 1 stores truncated "
                "counts — partition-wise merge would undercount; fit "
                "with freq_threshold <= 1 and filter after merging, or "
                "re-fit on the union")
        if self.max_size:
            raise WorkflowMergeError(
                "Categorify with max_size truncates the stored vocab — "
                "not mergeable; re-fit on the union")
        if self.vocabs:
            raise WorkflowMergeError(
                "Categorify with a user-supplied vocabulary has no "
                "counts to merge — the vocab is already fixed")
        if set(self._vocab_dfs) != set(other._vocab_dfs):
            raise WorkflowMergeError(
                f"Categorify vocab key sets differ: "
                f"{sorted(self._vocab_dfs)} vs {sorted(other._vocab_dfs)}")

    def merge_fitted(self, other: "Categorify") -> None:
        """Exact partition-wise vocab merge (plans/merge.py): union the
        two count-carrying vocab tables, sum counts, re-rank."""
        from ..sources.artifacts import materialize, parquet_rows
        for key, va in self._vocab_dfs.items():
            vb = other._vocab_dfs[key]
            value_cols = [c for c in va.columns
                          if c not in ("value_count", "code")]
            cols = [*value_cols, "value_count"]
            merged = (va.select(*cols).unionByName(vb.select(*cols))
                      .groupBy(*value_cols)
                      .agg(F.sum("value_count").alias("value_count")))
            ranked = self._rank_vocab(merged, key, value_cols)
            n_vocab = getattr(ranked, "total_rows", None)
            # out_path matters on a real cluster: artifacts must land on
            # a SHARED filesystem, same as every fit-path materialize
            self._vocab_dfs[key], self._paths[key] = materialize(
                ranked, f"vocab_merged_{key}", self.out_path)
            if n_vocab is None:
                n_vocab = parquet_rows(self._paths[key],
                                       fallback_df=self._vocab_dfs[key])
            self._sizes[key] = n_vocab + self._start_index(key)

    def artifacts(self):
        return dict(self._vocab_dfs)

    def load_artifacts(self, spark, paths):
        self._vocab_dfs = {k: spark.read.parquet(p) for k, p in paths.items()}
        self._paths = dict(paths)
        self._sizes = {k: parquet_rows(paths[k], fallback_df=v)
                       + self._start_index(k)
                       for k, v in self._vocab_dfs.items()}
        self.fitted = True

    def save_state(self):
        return {"sizes": self._sizes,
                "member_keys": getattr(self, "_member_keys", {})}

    def load_state(self, state):
        self._sizes = dict(state.get("sizes", {}))
        self._member_keys = dict(state.get("member_keys", {}))

    def clear(self):
        super().clear()
        self._vocab_dfs, self._paths, self._sizes = {}, {}, {}
        self._member_keys = {}


def _spark_int_type(dtype: str):
    from pyspark.sql.types import (ByteType, IntegerType, LongType, ShortType)
    return {"tinyint": ByteType(), "smallint": ShortType(), "int": IntegerType(),
            "bigint": LongType(), "long": LongType()}.get(dtype, IntegerType())


def get_embedding_sizes(workflow) -> Dict[str, tuple]:
    """Reference API parity (nvtabular ``get_embedding_sizes``): map of
    categorical output column → (cardinality, embedding dim)."""
    out = {}
    for node in workflow.plan.order:
        if isinstance(node.op, Categorify):
            for key, size in node.op._sizes.items():
                out[key] = (size, embedding_size(size))
    return out
