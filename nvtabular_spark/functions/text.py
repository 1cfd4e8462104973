"""Text-analysis expression builders (training-data pipeline ops).

All pure ``pyspark.sql.functions`` Column expressions — JVM-side,
whole-stage codegen, no Python in the hot path. Each has an exact ANSI
SQL twin used by the DuckDB oracles in ``__spark_entry__``.

These extend the reference (which has no text ops) for the 100 TB
training-data use case: language-ID, quality scoring, token counting,
fingerprinting over a ``documents`` corpus.
"""

from __future__ import annotations

from typing import Dict, List

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .hashing import hash64

# small deterministic stopword lists per language (toy language-ID
# heuristic; deterministic and SQL-reproducible by construction)
LANG_STOPWORDS: Dict[str, List[str]] = {
    "en": ["the", "and", "of", "to", "a", "in", "is", "it"],
    "de": ["der", "die", "und", "das", "ist", "ein", "nicht", "mit"],
    "es": ["el", "la", "de", "que", "y", "en", "un", "es"],
    "fr": ["le", "la", "et", "les", "des", "un", "est", "que"],
    "zh": ["的", "是", "了", "在", "我", "有", "和", "不"],
}
LANG_CODES = {lang: i for i, lang in enumerate(sorted(LANG_STOPWORDS))}


def words(col: Column) -> Column:
    """Whitespace tokenization."""
    return F.split(col, " ")


def token_count(col: Column) -> Column:
    return F.size(words(col))


def bpe_ish_token_count(col: Column) -> Column:
    """BPE-ish proxy: count word pieces after splitting on non-alnum
    boundaries and digits (regex tokenizer — still JVM-side)."""
    return F.size(F.filter(
        F.split(col, r"[^\p{L}\p{N}]+|(?<=\p{L})(?=\p{N})|(?<=\p{N})(?=\p{L})"),
        lambda w: w != F.lit("")))


def word_ngrams(col: Column, n: int = 3) -> Column:
    """Space-joined word n-grams; empty array when fewer than n words."""
    w = words(col)
    make = F.transform(
        F.sequence(F.lit(1), F.size(w) - F.lit(n - 1)),
        lambda i: F.concat_ws(" ", F.slice(w, i, n)))
    return F.when(F.size(w) >= n, make).otherwise(
        F.array().cast("array<string>"))


def stopword_hits(col: Column, stopwords: List[str]) -> Column:
    """Number of tokens that are in ``stopwords`` (with multiplicity)."""
    sw = F.array(*[F.lit(s) for s in stopwords])
    return F.size(F.filter(words(col), lambda x: F.array_contains(sw, x)))


def quality_score(col: Column) -> Column:
    """Deterministic [0,1] quality heuristic: length band + alpha ratio
    + stopword ratio (en), equally weighted."""
    n_tok = token_count(col).cast("double")
    n_chars = F.length(col).cast("double")
    alpha = F.length(F.regexp_replace(col, r"[^a-zA-Z ]", "")).cast("double")
    alpha_ratio = F.when(n_chars > 0, alpha / n_chars).otherwise(F.lit(0.0))
    sw_ratio = F.when(n_tok > 0,
                      stopword_hits(col, LANG_STOPWORDS["en"]).cast("double")
                      / n_tok).otherwise(F.lit(0.0))
    len_score = F.least(n_tok / F.lit(100.0), F.lit(1.0))
    return (alpha_ratio + F.least(sw_ratio * 5.0, F.lit(1.0)) + len_score) / 3.0


def lang_scores(col: Column) -> Dict[str, Column]:
    return {lang: stopword_hits(col, sws)
            for lang, sws in LANG_STOPWORDS.items()}


def lang_id(col: Column, default: str = "en") -> Column:
    """argmax of per-language stopword hits; ties break to the
    alphabetically-first language; all-zero → ``default``.

    Expressed as ``array_max`` over (score, -lang_code) structs — pure
    codegen, exactly reproducible in SQL."""
    scores = lang_scores(col)
    structs = [F.struct(s.alias("score"),
                        F.lit(-LANG_CODES[lang]).alias("neg_code"))
               for lang, s in scores.items()]
    best = F.array_max(F.array(*structs))
    code_to_lang = F.create_map(
        *[F.lit(x) for lang, c in LANG_CODES.items() for x in (c, lang)])
    return F.when(best["score"] <= 0, F.lit(default)) \
        .otherwise(code_to_lang[-best["neg_code"]])


def fingerprint(col: Column) -> Column:
    """Document fingerprint: md5 of the lower-cased, space-normalized,
    alphanumeric-only text (near-identity normalization → exact dup
    detection robust to case/punctuation noise)."""
    norm = F.regexp_replace(F.lower(col), r"[^a-z0-9 ]", "")
    norm = F.regexp_replace(norm, r" +", " ")
    return F.md5(F.trim(norm))


def rolling_hash(col: Column, window: int = 8) -> Column:
    """Per-document set of rolling window fingerprints (winnowing-style
    document sketch): hash of each ``window``-word shingle."""
    return F.transform(word_ngrams(col, window),
                       lambda s: hash64(s, "md5"))


def repetition_stats(df: "DataFrame", text_col: str = "text",
                     id_col: str = "doc_id", n: int = 2) -> "DataFrame":
    """Gopher-style within-document repetition signals (Rae et al.
    2021, "Scaling Language Models: ... Gopher", §A1.1 — public;
    also used by RefinedWeb / Dolma quality filtering).

    Per document, over space-split word ``n``-grams:

    * ``ngram_count`` / ``distinct_ngrams`` / ``top_ngram_count``
    * ``dup_ngram_frac`` — fraction of n-gram OCCURRENCES that are
      repeats (``1 − distinct/count``)
    * ``top_ngram_char_frac`` — the largest single-n-gram repetition
      mass ``max(count·len(ngram)) / len(text)`` (tie-free, unlike
      "chars of THE most frequent n-gram")
    * ``dup_ngram_char_frac`` — repetition mass of all duplicated
      n-grams ``Σ_{count>1} count·len(ngram) / len(text)`` (can
      exceed 1 for highly repetitive text — callers threshold, not
      sum, so it is left unclipped like Gopher's own definition)

    Documents with fewer than ``n`` words produce no n-grams and are
    absent from the output (inner semantics).

    Scale shape: explode is a flatMap; both aggregations key on the
    document id so map-side partial aggregation applies to each. The
    executed plan is two hash Exchanges — the first over per-partition
    (id, ngram) partial counts (≈ distinct n-grams per doc), the
    second over per-partition per-DOC partials (≤ one row per doc per
    partition — negligible). No self-joins, no windows, no Python.
    Safe at any corpus size.
    """
    from . import planning
    df = planning.ensure_min_parallelism(df)  # ngram explode is CPU-bound
    ng = df.select(F.col(id_col).alias("id"),
                   F.length(text_col).alias("tchars"),
                   F.explode(word_ngrams(F.col(text_col), n)).alias("ng"))
    cnt = ng.groupBy("id", "tchars", "ng") \
        .agg(F.count(F.lit(1)).alias("cnt"))
    agg = cnt.groupBy("id", "tchars").agg(
        F.sum("cnt").alias("ngram_count"),
        F.count(F.lit(1)).alias("distinct_ngrams"),
        F.max("cnt").alias("top_ngram_count"),
        F.max(F.col("cnt") * F.length("ng")).alias("top_mass"),
        F.sum(F.when(F.col("cnt") > 1, F.col("cnt") * F.length("ng"))
              .otherwise(F.lit(0))).alias("dup_mass"))
    safe_chars = F.when(F.col("tchars") > 0, F.col("tchars"))  # NULL if 0
    return agg.select(
        F.col("id").alias(id_col),
        "ngram_count", "distinct_ngrams", "top_ngram_count",
        (F.lit(1.0) - F.col("distinct_ngrams").cast("double")
         / F.col("ngram_count")).alias("dup_ngram_frac"),
        (F.col("top_mass").cast("double") / safe_chars)
        .alias("top_ngram_char_frac"),
        (F.col("dup_mass").cast("double") / safe_chars)
        .alias("dup_ngram_char_frac"))


#: conservative PII patterns chosen to behave identically under Java
#: regex (Spark) and RE2 (DuckDB): pure greedy character classes, no
#: backtracking-dependent constructs, and NO \s shorthand — Java's \s
#: includes \x0B while RE2's does not, so the whitespace class is
#: spelled out explicitly
PII_PATTERNS = {
    "url": "https?://[^ \\t\\n\\x0B\\f\\r]+",
    "email": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    "ipv4": r"\b(\d{1,3}\.){3}\d{1,3}\b",
}
PII_REPLACEMENTS = {"url": "<URL>", "email": "<EMAIL>", "ipv4": "<IP>"}


def scrub_pii(col: Column, kinds=("url", "email", "ipv4")) -> Column:
    """Replace PII-shaped substrings with typed placeholder tokens —
    the pre-training scrub step of NeMo-Curator-class pipelines
    (public practice; regex-based PII redaction). URL runs first so an
    email inside a URL is swallowed by the URL token. Pure
    ``regexp_replace`` chain — whole-stage codegen, no Python."""
    out = col
    for kind in kinds:
        out = F.regexp_replace(out, PII_PATTERNS[kind],
                               PII_REPLACEMENTS[kind])
    return out


def pii_counts(col: Column, kinds=("url", "email", "ipv4")) -> dict:
    """Per-kind PII match counts (name → Column), CONSISTENT with
    :func:`scrub_pii`: each kind is counted on the text with all
    EARLIER kinds already scrubbed, so an email inside a URL counts as
    (and is redacted as) exactly one URL — ``n_<kind>`` equals the
    number of ``<KIND>`` tokens the scrub emits."""
    out = {}
    cur = col
    for kind in kinds:
        out[kind] = F.regexp_count(cur, F.lit(PII_PATTERNS[kind]))
        cur = F.regexp_replace(cur, PII_PATTERNS[kind],
                               PII_REPLACEMENTS[kind])
    return out
