"""Deterministic sampling for training-data curation.

Random `df.sample` is neither reproducible across retries/partitionings
nor expressible in an oracle; these samplers hash a stable key instead,
so membership is a pure row-local predicate — no shuffle, no state,
identical on ANY engine with the same hash (md5 family twin in DuckDB),
and stable under re-runs, task retries and repartitioning. This is the
standard curation-pipeline shape (per-source mixing quotas).
"""

from __future__ import annotations

from typing import Dict, Optional

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .hashing import hash64

#: hash-space denominator: fractions quantize to 1/1e6 (0.0001%)
_DENOM = 1_000_000


def sample_predicate(key: Column, fraction: float, seed: int = 0,
                     family: str = "md5") -> Column:
    """Boolean column: row is in the deterministic ``fraction`` sample.
    ``pmod(hash(key, seed), 1e6) < fraction * 1e6`` — row-local, exact
    on any engine sharing the hash family."""
    return F.pmod(hash64(key.cast("string"), family, seed),
                  F.lit(_DENOM)) < F.lit(int(round(fraction * _DENOM)))


def deterministic_sample(df: DataFrame, fraction: float,
                         key_col: str = "doc_id", seed: int = 0,
                         family: str = "md5") -> DataFrame:
    """Reproducible ``fraction`` sample keyed on ``key_col``."""
    return df.filter(sample_predicate(F.col(key_col), fraction, seed,
                                      family))


def stratified_sample(df: DataFrame, fractions: Dict[str, float],
                      strata_col: str = "source",
                      key_col: str = "doc_id", seed: int = 0,
                      default_fraction: float = 0.0,
                      family: str = "md5") -> DataFrame:
    """Per-stratum deterministic sampling — the data-mixing step of a
    curation pipeline (e.g. keep 100% wiki, 30% web). Strata absent
    from ``fractions`` get ``default_fraction``. One row-local
    predicate, no shuffle; exact, not approximate like
    ``df.stat.sampleBy``."""
    frac = F.lit(float(default_fraction))
    for k, v in sorted(fractions.items()):
        frac = F.when(F.col(strata_col) == k, F.lit(float(v))) \
            .otherwise(frac)
    thresh = (frac * _DENOM).cast("long")
    h = F.pmod(hash64(F.col(key_col).cast("string"), family, seed),
               F.lit(_DENOM))
    return df.filter(h < thresh)


def split_train_holdout(df: DataFrame, holdout_fraction: float = 0.01,
                        key_col: str = "doc_id", seed: int = 17,
                        family: str = "md5"):
    """(train, holdout) split on a stable key — disjoint and exhaustive
    by construction (same hash, complementary predicates)."""
    pred = sample_predicate(F.col(key_col), holdout_fraction, seed,
                            family)
    return df.filter(~pred), df.filter(pred)


def token_vocab_stats(df: DataFrame, tokens_col: str = "tokens",
                      top_k: Optional[int] = None) -> DataFrame:
    """Corpus token-frequency table from an ``array<int>`` column:
    ``(token, freq, doc_freq)`` — one explode (flatMap) + one groupBy
    with map-side partials; ``top_k`` truncates by (freq desc, token)
    for a deterministic head. The vocabulary-coverage report every
    token pipeline wants before training."""
    freq = (df.select(F.explode(tokens_col).alias("token"))
            .groupBy("token")
            .agg(F.count(F.lit(1)).cast("long").alias("freq")))
    # doc_freq: each doc contributes each DISTINCT token once
    dfreq = (df.select(F.explode(F.array_distinct(tokens_col))
                       .alias("token"))
             .groupBy("token")
             .agg(F.count(F.lit(1)).cast("long").alias("doc_freq")))
    out = freq.join(dfreq, "token")
    if top_k:
        out = (out.orderBy(F.col("freq").desc(), F.col("token").asc())
               .limit(int(top_k)))
    return out
