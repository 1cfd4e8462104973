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
    it runs as an Arrow-batched ``applyInPandas`` per shard; inside a
    shard the scan is a numpy cumsum + one ``searchsorted`` per BIN
    (O(bins log rows), not per-row Python), so a 1M-row shard packs in
    well under a second. Shards (entities/hash shards) are the
    parallel unit — a single shard still materializes in one Arrow
    batch on one task, so keep shards under ~10M rows (repartition the
    shard key or use ``"prefix"`` for pathological single-shard
    inputs).

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
        bins, offs = _greedy_pack_arrays(toks, cap)
        pdf["bin_id"] = bins
        pdf["bin_offset"] = offs
        return pdf

    return df.groupBy(shard_col).applyInPandas(pack, out_schema)


def _greedy_pack_arrays(toks, cap):
    """Exact greedy first-fit over one shard's ordered token counts:
    returns (bin_id, bin_offset) int64 arrays. Semantics of the naive
    per-row recurrence ``if fill + t > cap and fill > 0: new bin``
    (oversize sequences occupy a bin alone; zero-token rows never open
    a bin).

    Fully vectorized: ONE batch ``searchsorted`` (C speed, all rows at
    once) precomputes, for every row i taken as a hypothetical bin
    start, where that bin would end — a jump table ``nxt``. Walking the
    table from row 0 then visits one entry per BIN with plain integer
    indexing (~0.1 us/hop), so the Python-level cost is O(bins) trivial
    hops instead of O(bins) numpy searchsorted calls (the round-5 shape
    whose ~20 us/call dominated the 1M-row shard wall). Assumes
    non-negative token counts (cumsum monotonicity), which ``n_tok`` is
    by construction."""
    import numpy as np
    n = len(toks)
    bins = np.zeros(n, dtype="int64")
    offs = np.zeros(n, dtype="int64")
    if n == 0:
        return bins, offs
    csum = np.cumsum(toks, dtype="int64")
    prev = np.concatenate(([0], csum[:-1]))          # tokens before row
    # bin starting at row i has base prev[i]; it ends at the maximal j
    # with csum[j] <= prev[i] + cap ...
    j = np.searchsorted(csum, prev + cap, side="right") - 1
    idx = np.arange(n, dtype="int64")
    # ... but an oversize first row still occupies the bin alone ...
    j = np.maximum(j, idx)
    # ... and a bin holding only zero-token rows (fill still 0) admits
    # the next row regardless of its size
    grow = (csum[j] == prev[idx]) & (j + 1 < n)
    j[grow] += 1
    nxt = j + 1                                      # next bin's start
    starts = [0]
    i = int(nxt[0])
    while i < n:
        starts.append(i)
        i = int(nxt[i])
    starts = np.asarray(starts, dtype="int64")
    marks = np.zeros(n, dtype="int64")
    marks[starts[1:]] = 1
    bins = np.cumsum(marks)
    offs = prev - prev[starts[bins]]                 # minus bin's base
    return bins, offs


def pack_sequences_global(df: DataFrame, capacity: int = 2048,
                          order_col: str = "ts", tok_col: str = "n_tok",
                          id_col: str = "doc_id", shards: int = 32,
                          family: str = "xxhash64") -> DataFrame:
    """GLOBAL (cross-shard) capacity-respecting packing — the one
    packing shape the shard-local contract doesn't cover: every
    sequence in the corpus lands in one global ``bin_id``, no bin
    exceeds ``capacity`` (oversize sequences occupy a bin alone), and
    offsets are contiguous within each bin.

    Two-level algorithm, deterministic end-to-end:

    1. sequences are hash-sharded (``hash_bucket(id_col) % shards``)
       and packed per shard with the exact greedy first-fit
       (:func:`pack_sequences` ``strategy="greedy"``) — fully parallel;
    2. the resulting LOCAL bins (each ≤ capacity by construction)
       become super-sequences of weight ``bin_tokens``, packed ONCE
       more by the same greedy recurrence in ``(shard, local_bin)``
       order — the level-2 input is ~``total_tokens/capacity`` rows,
       2–4 orders of magnitude below the sequence count, so the single
       sequential pass is cheap;
    3. each sequence's global bin = its local bin's super-bin, offset
       = super-bin offset of the local bin + local offset.

    Not bin-minimal (global first-fit over a hash order never is), but
    capacity-exact and restart-stable: the assignment depends only on
    (id, order, tokens), never on partitioning.

    Scale boundary, stated: level 2 runs as one task over the bin
    summaries. At 10^12 sequences × ~100 seqs/bin that is ~10^10
    summary rows — too many for one task; raise ``capacity·shards``
    granularity or chain a third level before that point. Below
    ~10^9 bins this is the right trade (summaries are 24 bytes each).
    """
    from .hashing import hash_bucket
    # sentinel-hash NULL ids (hashing.py contract: callers route nulls):
    # a NULL shard would survive the per-shard pack but be DROPPED by
    # the final equi-join on __shard (NULL != NULL)
    shard = hash_bucket(F.coalesce(F.col(id_col).cast("string"),
                                   F.lit("\x00<NULL>")), shards, family)
    l1 = pack_sequences(df.withColumn("__shard", shard),
                        capacity=capacity, shard_col="__shard",
                        order_col=order_col, tok_col=tok_col,
                        id_col=id_col, strategy="greedy") \
        .withColumnRenamed("bin_id", "__lbin") \
        .withColumnRenamed("bin_offset", "__loff") \
        .localCheckpoint(eager=False)
    # ^ l1 feeds BOTH the bin-summary branch and the final join;
    # without the checkpoint Spark re-executes the whole level-1
    # applyInPandas pack once per consumer (exchange reuse does not
    # cache Python-stage compute)

    tok = F.col(tok_col)
    if df.schema[tok_col].dataType.simpleString() in ("float", "double"):
        tok = F.when(F.isnan(tok), F.lit(None)).otherwise(tok)
    # sum the PER-ROW-truncated weights (cast before sum), matching
    # level 1's int64 view of each token count — summing floats then
    # flooring once would inflate bin weights for fractional tok_col
    # and open gaps between local bins inside a global bin
    summ = (l1.groupBy("__shard", "__lbin")
            .agg(F.coalesce(F.sum(tok.cast("long")), F.lit(0))
                 .cast("long").alias("__btok")))

    out_schema = StructType([StructField("__shard", LongType()),
                             StructField("__lbin", LongType()),
                             StructField("__gbin", LongType()),
                             StructField("__goff", LongType())])
    cap = int(capacity)

    def pack_bins(pdf):
        pdf = pdf.sort_values(["__shard", "__lbin"],
                              kind="mergesort").reset_index(drop=True)
        toks = pdf["__btok"].to_numpy("int64")
        gbins, goffs = _greedy_pack_arrays(toks, cap)
        pdf["__gbin"] = gbins
        pdf["__goff"] = goffs
        return pdf[["__shard", "__lbin", "__gbin", "__goff"]]

    placed = (summ.withColumn("__one", F.lit(1))
              .groupBy("__one").applyInPandas(pack_bins, out_schema))

    return (l1.join(placed, ["__shard", "__lbin"])
            .withColumn("bin_id", F.col("__gbin"))
            .withColumn("bin_offset", F.col("__goff") + F.col("__loff"))
            .drop("__shard", "__lbin", "__loff", "__gbin", "__goff"))


def packing_stats(packed: DataFrame, capacity: int = 2048,
                  shard_col: Optional[str] = "entity_id",
                  tok_col: str = "n_tok") -> DataFrame:
    """Per-(shard, bin) fill statistics: sequence count, token total,
    fill fraction — the packing-efficiency report. Pass
    ``shard_col=None`` for :func:`pack_sequences_global` output, whose
    bins are corpus-wide (grouped by ``bin_id`` alone)."""
    keys = ["bin_id"] if shard_col is None else [shard_col, "bin_id"]
    tok = F.col(tok_col)
    if packed.schema[tok_col].dataType.simpleString() in ("float",
                                                          "double"):
        tok = F.when(F.isnan(tok), F.lit(None)).otherwise(tok)
    # per-row truncation BEFORE the sum — the same int64 view the
    # packers use, so a capacity-exact bin can never report
    # fill_frac > 1.0 for fractional float token counts
    return (packed.groupBy(*keys)
            .agg(F.count(F.lit(1)).alias("n_seqs"),
                 F.coalesce(F.sum(tok.cast("long")), F.lit(0))
                 .cast("long").alias("bin_tokens"))
            .withColumn("fill_frac",
                        F.col("bin_tokens") / F.lit(float(capacity))))


def ngram_contamination(corpus: DataFrame, benchmark: DataFrame,
                        n: int = 8, text_col: str = "text",
                        id_col: str = "doc_id", family: str = "md5",
                        broadcast_threshold: Optional[int] = 5_000_000,
                        broadcast: Optional[bool] = None) -> DataFrame:
    """Per-corpus-document contamination against a benchmark set:
    ``(doc_id, n_ngrams, n_contaminated, contamination_frac)`` where a
    document n-gram is contaminated iff its hash appears anywhere in
    the benchmark's n-gram set.

    Scale shape: the benchmark shingle set is distinct (one groupBy on
    the benchmark — typically tiny next to the corpus) and the
    membership join broadcasts when it fits; the corpus side is one
    flatMap + one groupBy per doc. No caps needed — membership is a
    semi-join, not pair generation.

    ``broadcast``: ``True``/``False`` forces or forbids the broadcast
    hint on the benchmark shingle set. Default ``None`` hints when the
    set is small: plan statistics on the shingle set when available,
    else the benchmark's own row count (stats, else a bounded LIMIT
    probe) against ``broadcast_threshold // 64`` — rows multiply into
    many shingles each, so the row bound is deliberately conservative.
    A benchmark is almost always tiny next to the corpus, so missing
    stats don't silently downgrade the join to a shuffle — but a
    genuinely huge benchmark is never blind-broadcast into the 8 GB
    broadcast limit either.
    """
    bench_sh = (benchmark
                .select(F.explode(F.array_distinct(
                    word_shingle_hashes(F.col(text_col), n, family)))
                    .alias("sh"))
                .distinct())
    if broadcast is None and broadcast_threshold is not None:
        from . import planning
        est = planning.estimate_row_count(bench_sh)
        if est is not None:
            broadcast = est <= broadcast_threshold
        else:
            row_bound = max(1, broadcast_threshold // 64)
            rows = planning.estimate_row_count(benchmark)
            if rows is not None:
                broadcast = rows <= row_bound
            else:
                broadcast = not planning.at_least_n_rows(benchmark,
                                                         row_bound)
    if broadcast:
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


def chunk_sequences(df: DataFrame, max_len: int, stride: Optional[int] = None,
                    tokens_col: str = "tokens", id_col: str = "doc_id",
                    min_tail: int = 1) -> DataFrame:
    """Split over-length token arrays into training-window chunks.

    The standard context-window preparation step (HF ``run_clm``-style
    grouping, public method): a document whose ``tokens_col`` array is
    longer than ``max_len`` becomes several rows, one per window of
    ``max_len`` tokens taken every ``stride`` positions (``stride <
    max_len`` ⇒ overlapping windows for long-range-context training;
    default ``stride = max_len`` ⇒ disjoint chunks). Output keeps every
    input column, overwrites ``tokens_col`` with the window and
    ``n_tok`` with its length, and adds ``chunk_id`` (0-based window
    index) + ``chunk_start`` (0-based token offset).

    Contract details:

    * windows start at ``k * stride`` for every ``k`` with
      ``k * stride < len(tokens)``; the last window is short when the
      document doesn't divide evenly.
    * tail windows shorter than ``min_tail`` are dropped UNLESS they
      are the document's only window (short documents survive as one
      chunk) — dropping a 3-token tail beats training on it, but
      dropping whole short documents silently would change corpus
      membership, which is a sampling decision, not a chunking one.
    * null/empty token arrays produce no output rows (documented; use
      a Dropna/filter beforehand if their ids must be preserved).
    * per-row token invariant: with ``stride = max_len`` the
      concatenation of a document's chunks in ``chunk_id`` order is
      byte-equal to the source array (property-tested).

    Scale shape: pure expressions — one ``explode(sequence(...))`` +
    ``slice``; no shuffle, no Python on data, survives any input
    partitioning. Output row count ≈ total_tokens / stride.
    """
    if max_len < 1:
        raise ValueError(f"max_len must be >= 1, got {max_len}")
    stride = max_len if stride is None else stride
    if not 1 <= stride:
        raise ValueError(f"stride must be >= 1, got {stride}")
    if stride > max_len:
        raise ValueError(
            f"stride {stride} > max_len {max_len} would skip tokens")
    if min_tail < 1:
        raise ValueError(f"min_tail must be >= 1, got {min_tail}")
    toks = F.col(tokens_col)
    n = F.size(toks)                         # -1 for null arrays
    base = df.filter(n > 0)
    # last window index: greatest k with k*stride < n
    last = F.floor((n - F.lit(1)) / F.lit(stride)).cast("int")
    out = (base
           .withColumn("chunk_id",
                       F.explode(F.sequence(F.lit(0), last)))
           .withColumn("chunk_start",
                       (F.col("chunk_id") * F.lit(stride)).cast("int")))
    chunk = F.slice(toks, F.col("chunk_start") + F.lit(1), max_len)
    out = (out
           .withColumn(tokens_col, chunk)
           .withColumn("n_tok", F.size(F.col(tokens_col)).cast("int")))
    return out.filter((F.col("n_tok") >= min_tail)
                      | (F.col("chunk_id") == 0))
