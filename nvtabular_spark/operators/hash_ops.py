"""HashBucket and HashedCross.

Reference: nvtabular/ops/hash_bucket.py:32-131 (``hash_series % nb``,
list-capable), hashed_cross.py:24-91 (XOR of per-column hashes % nb,
output named ``a_X_b``). The reference disclaims cross-engine hash
equality (categorify.py:332-338); our contract is
:mod:`nvtabular_spark.functions.hashing` — xxhash64 fast path or the
SQL-portable md5 family.
"""

from __future__ import annotations

from typing import Dict, Optional, Union

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType

from .base import Operator, TransformContext
from ..functions.hashing import hash64
from ..plans.graph import ColumnSelector


class HashBucket(Operator):
    """``hash(x) % num_buckets``; NULL → NULL. Array columns hash
    element-wise (hash_bucket.py:88-100 list support)."""

    def __init__(self, num_buckets: Union[int, Dict[str, int]],
                 hash_family: str = "xxhash64"):
        self.num_buckets = num_buckets
        self.hash_family = hash_family

    def _nb(self, name: str) -> int:
        if isinstance(self.num_buckets, dict):
            return self.num_buckets[name]
        return self.num_buckets

    def expr(self, col, name, df, ctx):
        nb = self._nb(name)

        def bucket(c):
            return F.pmod(hash64(c, self.hash_family), F.lit(nb)).cast("int")

        if isinstance(df.schema[ctx.actual(name)].dataType, ArrayType):
            return F.transform(col, bucket)
        return bucket(col)

    def output_tags(self):
        return ["categorical"]


class HashedCross(Operator):
    """Cross of N columns into one bucketed id. The reference XORs the
    per-column hashes then mods (hashed_cross.py:60-77); we hash the
    concatenated string form by default (``combine='concat'``) which has
    strictly better mixing, or XOR for reference-shape parity."""

    def __init__(self, num_buckets: int, hash_family: str = "xxhash64",
                 combine: str = "xor"):
        self.num_buckets = num_buckets
        self.hash_family = hash_family
        self.combine = combine

    def output_column_names(self, selector: ColumnSelector):
        return ["_X_".join(selector.names)]

    def transform(self, ctx: TransformContext, df: DataFrame) -> DataFrame:
        out_name = ctx.out("_X_".join(ctx.input_names))
        if self.combine == "xor":
            acc = None
            for pub, act in ctx.pairs():
                h = hash64(F.col(act), self.hash_family)
                acc = h if acc is None else acc.bitwiseXOR(h)
        else:
            acc = hash64(
                F.concat_ws("", *[F.col(a).cast("string")
                                        for _, a in ctx.pairs()]),
                self.hash_family,
            )
        return df.withColumn(
            out_name, F.pmod(acc, F.lit(self.num_buckets)).cast("int")
        )

    def output_tags(self):
        return ["categorical"]
