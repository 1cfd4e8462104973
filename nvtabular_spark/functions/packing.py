"""Sequence packing and benchmark contamination — token-pipeline ops.

Both operate on the north-rule tokenized-sequence table
(``doc_id, tokens, n_tok, ...``) / the ``documents`` corpus and are
expression/join-first (no per-row Python in the scalable paths).

* :func:`pack_sequences` — assign each sequence to a fixed-capacity
  training bin (the standard LLM pre-training packing step). Two
  strategies:

  - ``"prefix"`` (default): bin = floor(exclusive-prefix-sum(n_tok) /
    capacity) within each shard, computed with ONE window — fully
    distributed, deterministic, SQL-expressible (value-level oracle).
    Bins are contiguous in (shard, order) and can overflow capacity by
    at most one sequence's tokens — the streaming-packing trade every
    prefix-sum binner makes.
  - ``"greedy"``: exact capacity-respecting first-fit in (shard,
    order) — running total resets at the boundary, so no bin ever
    exceeds capacity (sequences longer than capacity get their own
    bin). The reset recurrence is inherently sequential per shard, so
    it runs as an Arrow-batched ``applyInPandas`` per shard — the
    per-shard work is a vectorizable numpy scan, and shards
    (entities/hash shards) give the parallelism.

* :func:`ngram_contamination` — per-document fraction of word n-grams
  that appear in a benchmark/eval set (decontamination signal, as in
  GPT-3 appx C / Dolma / FineWeb pipelines — public method). Benchmark
  shingles are distinct-collected and joined (broadcast when small);
  one groupBy per doc yields matched/total.
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.types import LongType, StructField, StructType

from .dedup import word_shingle_hashes


def pack_sequences(df: DataFrame, capacity: int = 2048,
                   shard_col: str = "entity_id", order_col: str = "ts",
                   tok_col: str = "n_tok", id_col: str = "doc_id",
                   strategy: str = "prefix") -> DataFrame:
    """Assign ``bin_id`` (per shard) and ``bin_offset`` (token start
    within the bin) to every sequence. See module docstring for the
    strategy contract; output is input columns + (bin_id, bin_offset).
    """
    tok = F.col(tok_col)
    if df.schema[tok_col].dataType.simpleString() in ("float", "double"):
        # pandas-sourced frames carry missing counts as NaN, which is
        # NOT null to Spark — an unguarded NaN poisons the running sum
        tok = F.when(F.isnan(tok), F.lit(None)).otherwise(tok)
    if strategy == "prefix":
        w = Window.partitionBy(shard_col).orderBy(order_col, id_col)
        prev = F.coalesce(
            F.sum(tok).over(w.rowsBetween(Window.unboundedPreceding,
                                          -1)),
            F.lit(0)).cast("long")
        return (df.withColumn("bin_id",
                              F.floor(prev / F.lit(capacity))
                              .cast("long"))
                .withColumn("bin_offset",
                            (prev % F.lit(capacity)).cast("long")))
    if strategy != "greedy":
        raise ValueError(f"unknown packing strategy {strategy!r}")

    out_schema = StructType(list(df.schema.fields)
                            + [StructField("bin_id", LongType()),
                               StructField("bin_offset", LongType())])
    cap = int(capacity)
    ocol, tcol, icol = order_col, tok_col, id_col

    def pack(pdf):
        import numpy as np
        pdf = pdf.sort_values([ocol, icol], kind="mergesort") \
            .reset_index(drop=True)
        # null token counts contribute 0, matching the prefix
        # strategy's F.sum null-skipping — a NaN would otherwise poison
        # every later offset in the shard
        toks = pdf[tcol].fillna(0).to_numpy("int64")
        bins = np.zeros(len(toks), dtype="int64")
        offs = np.zeros(len(toks), dtype="int64")
        b = fill = 0
        for j, t in enumerate(toks):       # per-shard scan; shards are
            if fill + t > cap and fill > 0:  # the parallel unit
                b += 1
                fill = 0
            bins[j] = b
            offs[j] = fill
            fill += t
        pdf["bin_id"] = bins
        pdf["bin_offset"] = offs
        return pdf

    return df.groupBy(shard_col).applyInPandas(pack, out_schema)


def packing_stats(packed: DataFrame, capacity: int = 2048,
                  shard_col: str = "entity_id",
                  tok_col: str = "n_tok") -> DataFrame:
    """Per-(shard, bin) fill statistics: sequence count, token total,
    fill fraction — the packing-efficiency report."""
    return (packed.groupBy(shard_col, "bin_id")
            .agg(F.count(F.lit(1)).alias("n_seqs"),
                 F.sum(tok_col).cast("long").alias("bin_tokens"))
            .withColumn("fill_frac",
                        F.col("bin_tokens") / F.lit(float(capacity))))


def ngram_contamination(corpus: DataFrame, benchmark: DataFrame,
                        n: int = 8, text_col: str = "text",
                        id_col: str = "doc_id", family: str = "md5",
                        broadcast_threshold: Optional[int] = 5_000_000
                        ) -> DataFrame:
    """Per-corpus-document contamination against a benchmark set:
    ``(doc_id, n_ngrams, n_contaminated, contamination_frac)`` where a
    document n-gram is contaminated iff its hash appears anywhere in
    the benchmark's n-gram set.

    Scale shape: the benchmark shingle set is distinct (one groupBy on
    the benchmark — typically tiny next to the corpus) and the
    membership join broadcasts when it fits; the corpus side is one
    flatMap + one groupBy per doc. No caps needed — membership is a
    semi-join, not pair generation.
    """
    bench_sh = (benchmark
                .select(F.explode(F.array_distinct(
                    word_shingle_hashes(F.col(text_col), n, family)))
                    .alias("sh"))
                .distinct())
    if broadcast_threshold is not None:
        from . import planning
        est = planning.estimate_row_count(bench_sh)
        if est is not None and est <= broadcast_threshold:
            bench_sh = F.broadcast(bench_sh)
    doc_sh = corpus.select(
        F.col(id_col),
        F.explode(F.array_distinct(
            word_shingle_hashes(F.col(text_col), n, family))).alias("sh"))
    marked = doc_sh.join(bench_sh.withColumn("__hit__", F.lit(1)),
                         "sh", "left")
    per_doc = (marked.groupBy(id_col)
               .agg(F.count(F.lit(1)).cast("long").alias("n_ngrams"),
                    F.coalesce(F.sum("__hit__"), F.lit(0)).cast("long")
                    .alias("n_contaminated")))
    # documents shorter than n words produce no shingles — report them
    # with zeros rather than silently dropping them (corpus-level
    # stats and join-backs must see every input row)
    base = corpus.select(id_col).distinct()
    return (base.join(per_doc, id_col, "left")
            .select(
                F.col(id_col),
                F.coalesce("n_ngrams", F.lit(0)).cast("long")
                .alias("n_ngrams"),
                F.coalesce("n_contaminated", F.lit(0)).cast("long")
                .alias("n_contaminated"),
                F.when(F.coalesce("n_ngrams", F.lit(0)) > 0,
                       F.col("n_contaminated").cast("double")
                       / F.col("n_ngrams"))
                .otherwise(F.lit(0.0)).alias("contamination_frac")))
