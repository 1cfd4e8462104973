"""Unigram language-model perplexity scoring (CCNet-style quality
signal).

CCNet (Wenzek et al. 2020, "CCNet: Extracting High Quality Monolingual
Datasets from Web Crawl Data" — public) ranks web documents by the
perplexity of a language model trained on a trusted reference corpus
(Wikipedia) and keeps the low-perplexity head/middle. The full recipe
uses a KenLM 5-gram; this module implements the same *pipeline shape*
with a unigram LM — the model that is exactly expressible as Spark
aggregations + one broadcast join, with no external artifacts. The
reference NVTabular has no text-quality ops (extension surface, like
the rest of ``functions/text.py``).

Model: add-k smoothed unigram over a capped vocabulary::

    P(t)     = (c(t) + k) / (N + k * (V + 1))        for t in vocab
    P(<unk>) = (c_oov_total + k) / (N + k * (V + 1))  — the CLASS mass
    P(w∉vocab) = P(<unk>) / max(1, n_oov_types)       — per TOKEN

where ``N`` is the total token count of the reference corpus, ``V``
the retained vocabulary size, and all out-of-vocabulary occurrences
share ONE ``<unk>`` class whose mass is spread uniformly over the
distinct OOV types observed at fit time. The spread matters: scoring
every unknown token with the whole pooled class mass makes all-OOV
garbage score BETTER than common text whenever the tail is heavy —
the uniform per-type spread restores the correct ordering while
keeping total probability mass exactly 1 over the closed
``vocab ∪ {unk types}`` event space. Document score = mean per-token
log10 probability; ``perplexity = 10 ** (-mean_logp)``.

Scale shape:

* **fit** — one flatMap (split/explode) + ONE map-side-partial
  ``groupBy(token)`` (distinct-token volume, not corpus volume), then
  a distributed top-V (``orderBy().limit()`` compiles to
  TakeOrderedAndProject — per-partition heaps, no global sort) and two
  tiny driver aggregates. Fit state is O(V), independent of corpus
  size.
* **score** — flatMap + broadcast-hash-join against the O(V) vocab +
  ONE ``groupBy(id)`` with map-side partial mean. No Python touches
  row data anywhere.
"""

from __future__ import annotations

import math
from dataclasses import dataclass
from typing import Optional

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .text import words


def _tokens(col, lowercase: bool):
    src = F.lower(col) if lowercase else col
    return F.filter(words(src), lambda w: w != F.lit(""))


@dataclass
class UnigramLM:
    """Fitted unigram model: ``vocab`` is a small (token, logp)
    DataFrame (≤ ``vocab_size`` rows, broadcast at score time);
    ``oov_logp`` the shared log10 probability of the pooled ``<unk>``
    class. ``n_tokens``/``n_distinct`` describe the reference corpus."""
    vocab: DataFrame
    oov_logp: float          #: per-TOKEN log10 prob of an unknown word
    oov_class_logp: float    #: log10 mass of the whole <unk> class
    n_tokens: int
    n_distinct: int
    smoothing_k: float
    lowercase: bool

    def as_rows(self):
        """Driver-side {token: logp} (test/debug; O(V))."""
        return {r["token"]: r["logp"] for r in self.vocab.collect()}


def unigram_lm_fit(ref: DataFrame, text_col: str = "text",
                   vocab_size: int = 50_000, smoothing_k: float = 0.5,
                   lowercase: bool = True) -> UnigramLM:
    """Fit an add-k unigram LM on a reference corpus (the CCNet
    "Wikipedia side"). Ties at the vocabulary cut break
    deterministically by (count desc, token asc)."""
    counts = (ref.select(F.explode(_tokens(F.col(text_col), lowercase))
                         .alias("token"))
              .groupBy("token")
              .agg(F.count(F.lit(1)).cast("long").alias("cnt")))
    # three actions follow; persist the distinct-token table so the
    # corpus itself is scanned exactly once (counts is distinct-token
    # volume — orders of magnitude below corpus volume)
    counts = counts.persist()
    try:
        totals = counts.agg(
            F.sum("cnt").alias("n_tokens"),
            F.count(F.lit(1)).alias("n_distinct")).collect()[0]
        n_tokens = int(totals["n_tokens"] or 0)
        n_distinct = int(totals["n_distinct"] or 0)
        if n_tokens == 0:
            raise ValueError(
                "unigram_lm_fit: reference corpus has no tokens")

        top = (counts.orderBy(F.col("cnt").desc(), F.col("token").asc())
               .limit(vocab_size))
        v_eff = min(vocab_size, n_distinct)
        denom = n_tokens + smoothing_k * (v_eff + 1)
        vocab = top.select(
            "token",
            F.log10((F.col("cnt") + F.lit(float(smoothing_k)))
                    / F.lit(float(denom))).alias("logp"))

        # pooled OOV mass = tokens not retained in the top-V vocab;
        # materialize the O(V) vocab now — it must not depend on the
        # persisted counts after unpersist
        rows = vocab.collect()
        spark = SparkSession.getActiveSession() or ref.sparkSession
        vocab = spark.createDataFrame(rows, schema=vocab.schema)
        in_vocab = int(
            top.agg(F.sum("cnt").alias("s")).collect()[0]["s"] or 0)
    finally:
        counts.unpersist()
    oov_total = n_tokens - in_vocab
    n_oov_types = n_distinct - v_eff
    oov_class_logp = math.log10((oov_total + smoothing_k) / denom)
    oov_logp = oov_class_logp - math.log10(max(1, n_oov_types))
    return UnigramLM(vocab=vocab, oov_logp=oov_logp,
                     oov_class_logp=oov_class_logp, n_tokens=n_tokens,
                     n_distinct=n_distinct, smoothing_k=smoothing_k,
                     lowercase=lowercase)


def perplexity_score(df: DataFrame, lm: UnigramLM,
                     text_col: str = "text", id_col: str = "doc_id",
                     broadcast: bool = True) -> DataFrame:
    """Per-document unigram perplexity under a fitted :class:`UnigramLM`.

    Returns one row per input row: ``(id_col, n_tok, avg_logp,
    perplexity)``. Documents with no tokens (empty or null text) get
    NULL ``avg_logp``/``perplexity`` and ``n_tok = 0`` — they carry no
    evidence either way; callers decide their fate explicitly rather
    than inheriting a fake score.

    ``broadcast=False`` only if the vocab was fitted with an enormous
    ``vocab_size``; the default O(≤50k)-row broadcast join is the
    100 TB shape.
    """
    vocab = F.broadcast(lm.vocab) if broadcast else lm.vocab
    toks = df.select(
        F.col(id_col),
        F.explode_outer(_tokens(F.col(text_col), lm.lowercase))
        .alias("token"))
    scored = (toks.join(vocab, "token", "left")
              .withColumn("logp",
                          F.when(F.col("token").isNull(), F.lit(None))
                          .otherwise(F.coalesce(F.col("logp"),
                                                F.lit(lm.oov_logp)))))
    per_doc = scored.groupBy(id_col).agg(
        F.count("logp").cast("long").alias("n_tok"),
        F.avg("logp").alias("avg_logp"))
    return per_doc.select(
        id_col, "n_tok", "avg_logp",
        F.pow(F.lit(10.0), -F.col("avg_logp")).alias("perplexity"))


def perplexity_partition(scores: DataFrame,
                         head_frac: float = 1 / 3,
                         middle_frac: float = 1 / 3,
                         ppl_col: str = "perplexity",
                         exact: bool = False) -> DataFrame:
    """CCNet's head/middle/tail split by perplexity: the lowest
    ``head_frac`` of scored documents → ``'head'``, the next
    ``middle_frac`` → ``'middle'``, the rest → ``'tail'``; unscored
    (NULL-perplexity) rows → NULL bucket.

    Thresholds come from ``approx_quantile`` epsilon-exact percentiles
    (one pass, driver receives two doubles) — at 100 TB an exact
    global sort for two cut points would be a pointless full shuffle.
    CAVEAT the approximation is run-order dependent: the
    Greenwald-Khanna summaries merge in task-completion order, so two
    runs over identical data can place boundary documents in different
    buckets (observed: a downstream gate flaking on exactly this).
    ``exact=True`` switches to relativeError=0 (exact percentiles,
    deterministic membership) — the right setting whenever bucket
    membership feeds a reproducibility-sensitive step at a scale where
    the extra pass is affordable.
    """
    if not 0 < head_frac + middle_frac <= 1:
        raise ValueError("head_frac + middle_frac must be in (0, 1]")
    cuts = scores.filter(F.col(ppl_col).isNotNull()).approxQuantile(
        ppl_col, [head_frac, head_frac + middle_frac],
        0.0 if exact else 1e-4)
    if not cuts:
        return scores.withColumn(
            "ppl_bucket", F.lit(None).cast("string"))
    lo, hi = cuts
    return scores.withColumn(
        "ppl_bucket",
        F.when(F.col(ppl_col).isNull(), F.lit(None))
        .when(F.col(ppl_col) <= lo, F.lit("head"))
        .when(F.col(ppl_col) <= hi, F.lit("middle"))
        .otherwise(F.lit("tail")))


# --------------------------------------------------------------- DSIR

def dsir_log_weights(df: DataFrame, target_lm: UnigramLM,
                     raw_lm: UnigramLM, text_col: str = "text",
                     id_col: str = "doc_id") -> DataFrame:
    """DSIR importance log-weights (Xie et al. 2023, "Data Selection
    for Language Models via Importance Resampling" — public). Each
    document's log10 importance ratio under two unigram LMs::

        log_w(doc) = Σ_t [ log10 P_target(t) − log10 P_raw(t) ]

    ``target_lm`` is fitted on a small trusted corpus (the domain you
    want more of), ``raw_lm`` on the raw pool itself. Documents whose
    token distribution looks more target-like get positive weight.
    Zero-token documents carry no evidence: ``log_weight = 0``
    (importance ratio 1, the empty product).

    Scale shape: ONE flatMap + two broadcast joins against the O(V)
    vocabs + ONE map-side-partial ``groupBy(id)``. Output is one row
    per input row: ``(id_col, n_tok, log_weight)``.
    """
    if target_lm.lowercase != raw_lm.lowercase:
        raise ValueError("target and raw LMs disagree on lowercase=")
    t_vocab = F.broadcast(target_lm.vocab.withColumnRenamed("logp", "lp_t"))
    r_vocab = F.broadcast(raw_lm.vocab.withColumnRenamed("logp", "lp_r"))
    toks = df.select(
        F.col(id_col),
        F.explode_outer(_tokens(F.col(text_col), target_lm.lowercase))
        .alias("token"))
    scored = (toks.join(t_vocab, "token", "left")
              .join(r_vocab, "token", "left")
              .withColumn("ratio",
                          F.when(F.col("token").isNull(), F.lit(None))
                          .otherwise(
                              F.coalesce(F.col("lp_t"),
                                         F.lit(target_lm.oov_logp))
                              - F.coalesce(F.col("lp_r"),
                                           F.lit(raw_lm.oov_logp)))))
    return scored.groupBy(id_col).agg(
        F.count("ratio").cast("long").alias("n_tok"),
        F.coalesce(F.sum("ratio"), F.lit(0.0)).alias("log_weight"))


def dsir_sample(df: DataFrame, target_lm: UnigramLM, raw_lm: UnigramLM,
                k: int, text_col: str = "text", id_col: str = "doc_id",
                seed: int = 0) -> DataFrame:
    """Select ``k`` documents by DSIR importance resampling WITHOUT
    replacement via the Gumbel-top-k trick (Kool et al. 2019 —
    public): sampling k items with probability ∝ w is exactly taking
    the top k of ``ln w + Gumbel(0,1)`` noise. The Gumbel draw is
    DETERMINISTIC — ``u`` comes from the row-key hash (same md5 family
    as the samplers in ``functions/sampling.py``), so the selection is
    reproducible under retries and repartitioning, and seedable.

    Returns the selected input rows plus ``log_weight`` and the
    ``gumbel_key`` that ranked them.

    Scale shape: the weight pass (see :func:`dsir_log_weights`), a
    per-partition top-k (``orderBy().limit()`` compiles to
    TakeOrderedAndProject — no global sort), and one broadcast join of
    the k winners back to the input. ``k`` must be driver-broadcast
    sized (the winners table is exactly k rows).
    """
    from .hashing import hash64
    from .sampling import _DENOM, _keyed
    w = dsir_log_weights(df, target_lm, raw_lm, text_col, id_col)
    # u ∈ (0,1) strictly: (pmod(hash)+0.5)/1e6 never hits 0 or 1
    u = ((F.pmod(hash64(_keyed(F.col(id_col)), "md5", seed),
                 F.lit(_DENOM)) + F.lit(0.5)) / F.lit(float(_DENOM)))
    ln10 = math.log(10.0)
    keyed = w.withColumn(
        "gumbel_key",
        F.col("log_weight") * F.lit(ln10) - F.log(-F.log(u)))
    winners = (keyed.orderBy(F.col("gumbel_key").desc(),
                             F.col(id_col).asc())
               .limit(k)
               .select(id_col, "log_weight", "gumbel_key"))
    return df.join(F.broadcast(winners), id_col, "inner")
