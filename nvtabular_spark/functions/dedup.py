"""Deduplication at training-data scale.

Five strategies over a ``documents(doc_id, text)`` corpus, all
Spark-first (expressions + joins; Python never touches row data):

* exact           — hash-groupBy on normalized text
* MinHash + LSH   — shingle → k minhashes → banded bucket-join
* SimHash         — per-bit majority of token hashes
* n-gram Jaccard  — inverted-index self-join on shingles
* embedding cosine near-dup — see functions/ann.py

Scale notes: the shingle explode is a flatMap (no shuffle); candidate
generation shuffles once on the band/bucket key; the verify join is
band-local. Skewed buckets (boilerplate shingles) are capped with
``max_bucket`` — standard practice for web-scale LSH; the cap is logged
in the plan, not silent (the helper returns the dropped-bucket count
via an optional accumulator DataFrame).
"""

from __future__ import annotations

from typing import List, Optional, Tuple

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .hashing import hash64
from .text import fingerprint, word_ngrams, words


def exact_duplicates(df: DataFrame, text_col: str = "text",
                     id_col: str = "doc_id",
                     normalized: bool = True) -> DataFrame:
    """One row per document: its dedup key and the canonical (min) id of
    its duplicate group. ``is_dup`` marks rows to drop."""
    key = fingerprint(F.col(text_col)) if normalized else F.md5(F.col(text_col))
    keyed = df.select(F.col(id_col), key.alias("dup_key"))
    canon = keyed.groupBy("dup_key").agg(F.min(id_col).alias("canonical_id"))
    return (keyed.join(canon, "dup_key")
            .withColumn("is_dup", F.col(id_col) != F.col("canonical_id")))


def minhash_signature(col: Column, num_hashes: int = 8,
                      shingle_n: int = 3, family: str = "md5") -> Column:
    """Array of ``num_hashes`` minhash values over word shingles.
    Hash i of shingle s = md5-family hash64(s + '#' + i) — deterministic
    and SQL-reproducible. Empty shingle set → nulls."""
    shingles = word_ngrams(col, shingle_n)

    def hasher(i: int):
        # NB: single-arg lambda — a 2-arg lambda would be interpreted by
        # F.transform as (element, index) and shadow the closure
        return lambda s: hash64(F.concat(s, F.lit(f"#{i}")), family)

    sigs = [F.array_min(F.transform(shingles, hasher(i)))
            for i in range(num_hashes)]
    return F.array(*sigs)


def minhash_lsh_pairs(df: DataFrame, text_col: str = "text",
                      id_col: str = "doc_id", num_hashes: int = 8,
                      bands: int = 4, shingle_n: int = 3,
                      max_bucket: Optional[int] = 1000,
                      family: str = "md5") -> DataFrame:
    """Candidate near-duplicate pairs (id_a < id_b) that share at least
    one LSH band. rows_per_band = num_hashes // bands."""
    assert num_hashes % bands == 0
    rpb = num_hashes // bands
    sig = minhash_signature(F.col(text_col), num_hashes, shingle_n, family)
    with_sig = df.select(F.col(id_col).alias("doc"), sig.alias("sig")) \
        .filter(~F.exists("sig", lambda x: x.isNull()))
    banded = with_sig.select(
        "doc",
        F.explode(F.array(*[
            F.struct(F.lit(b).alias("band"),
                     F.concat_ws(",", *[F.element_at("sig", b * rpb + r + 1)
                                        .cast("string") for r in range(rpb)])
                     .alias("key"))
            for b in range(bands)])).alias("bk")
    ).select("doc", "bk.band", "bk.key")
    if max_bucket:
        counts = banded.groupBy("band", "key").count() \
            .filter(F.col("count") <= max_bucket).drop("count")
        banded = banded.join(counts, ["band", "key"])
    a, b = banded.alias("a"), banded.alias("b")
    return (a.join(b, (F.col("a.band") == F.col("b.band"))
                   & (F.col("a.key") == F.col("b.key"))
                   & (F.col("a.doc") < F.col("b.doc")))
            .select(F.col("a.doc").alias("id_a"), F.col("b.doc").alias("id_b"))
            .distinct())


def simhash(col: Column, bits: int = 16, family: str = "md5") -> Column:
    """SimHash over whitespace tokens (with multiplicity): bit b is set
    when the sum over tokens of (bit b of hash(token)) * 2 - 1 is > 0."""
    tok_hashes = F.transform(words(col), lambda w: hash64(w, family))

    def bit_contrib(b: int):
        # (h >> b) & 1 expressed as (h & (1<<b)) != 0 — hash values are
        # non-negative 60-bit ints so masking is exact
        return lambda s, h: s + F.when(
            h.bitwiseAND(F.lit(1 << b)) != 0, F.lit(1)).otherwise(F.lit(-1))

    acc = F.lit(0).cast("long")
    for b in range(bits):
        contrib = F.aggregate(tok_hashes, F.lit(0).cast("long"),
                              bit_contrib(b))
        acc = acc + F.when(contrib > 0, F.lit(1 << b)).otherwise(F.lit(0))
    return acc


def simhash_near_dups(df: DataFrame, text_col: str = "text",
                      id_col: str = "doc_id", bits: int = 16,
                      max_hamming: int = 2, family: str = "md5") -> DataFrame:
    """Pairs whose simhashes differ in ≤ max_hamming bits. Candidate
    generation: split the simhash into (max_hamming+1) chunks — by
    pigeonhole, any pair within distance shares ≥1 exact chunk — then
    verify with bit_count on the XOR (JVM-side)."""
    chunks = max_hamming + 1
    per = bits // chunks
    sh = df.select(F.col(id_col).alias("doc"),
                   simhash(F.col(text_col), bits, family).alias("sh"))
    banded = sh.select(
        "doc", "sh",
        F.explode(F.array(*[
            F.struct(F.lit(c).alias("chunk"),
                     F.shiftright(F.col("sh"), c * per)
                     .bitwiseAND(F.lit((1 << per) - 1)).alias("key"))
            for c in range(chunks)])).alias("ck")
    ).select("doc", "sh", "ck.chunk", "ck.key")
    a, b = banded.alias("a"), banded.alias("b")
    pairs = (a.join(b, (F.col("a.chunk") == F.col("b.chunk"))
                    & (F.col("a.key") == F.col("b.key"))
                    & (F.col("a.doc") < F.col("b.doc")))
             .select(F.col("a.doc").alias("id_a"), F.col("b.doc").alias("id_b"),
                     F.col("a.sh").alias("sh_a"), F.col("b.sh").alias("sh_b"))
             .distinct())
    ham = F.bit_count(F.col("sh_a").bitwiseXOR(F.col("sh_b")))
    return pairs.withColumn("hamming", ham) \
        .filter(F.col("hamming") <= max_hamming) \
        .select("id_a", "id_b", "hamming")


def ngram_jaccard_pairs(df: DataFrame, text_col: str = "text",
                        id_col: str = "doc_id", n: int = 3,
                        threshold: float = 0.8,
                        max_posting: Optional[int] = 10000) -> DataFrame:
    """Exact n-gram Jaccard similarity for every pair sharing ≥1 shingle
    (inverted-index self-join), filtered at ``threshold``.

    |A ∩ B| via the shingle join, |A ∪ B| = |A| + |B| - |∩|."""
    shingled = (df.select(F.col(id_col).alias("doc"),
                          F.explode(F.array_distinct(
                              word_ngrams(F.col(text_col), n))).alias("sh")))
    sizes = shingled.groupBy("doc").agg(F.count(F.lit(1)).alias("sz"))
    if max_posting:
        keep = shingled.groupBy("sh").count() \
            .filter(F.col("count") <= max_posting).drop("count")
        shingled = shingled.join(keep, "sh")
    a, b = shingled.alias("a"), shingled.alias("b")
    inter = (a.join(b, (F.col("a.sh") == F.col("b.sh"))
                    & (F.col("a.doc") < F.col("b.doc")))
             .groupBy(F.col("a.doc").alias("id_a"),
                      F.col("b.doc").alias("id_b"))
             .agg(F.count(F.lit(1)).alias("inter")))
    sa = sizes.select(F.col("doc").alias("id_a"), F.col("sz").alias("sz_a"))
    sb = sizes.select(F.col("doc").alias("id_b"), F.col("sz").alias("sz_b"))
    return (inter.join(sa, "id_a").join(sb, "id_b")
            .withColumn("jaccard",
                        F.col("inter").cast("double")
                        / (F.col("sz_a") + F.col("sz_b") - F.col("inter")))
            .filter(F.col("jaccard") >= threshold)
            .select("id_a", "id_b", "jaccard"))
