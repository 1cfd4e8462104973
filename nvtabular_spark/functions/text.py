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


def gopher_quality_flags(df: "DataFrame", text_col: str = "text",
                         id_col: str = "doc_id") -> "DataFrame":
    """Gopher document-level quality rules (Rae et al. 2021, §A1.1 —
    public; adopted by MassiveText / RefinedWeb / Dolma): per document,
    the raw statistics and one boolean per rule, plus their
    conjunction ``gopher_pass``. NULL text fails every rule.

    Rules (thresholds exactly as published):

    * ``ok_word_count``     — 50 ≤ words ≤ 100,000
    * ``ok_mean_word_len``  — mean word length in [3, 10]
    * ``ok_symbol_ratio``   — (# '#' or '…' symbols) / words ≤ 0.1
    * ``ok_bullet_lines``   — < 90% of lines start with a bullet
    * ``ok_ellipsis_lines`` — < 30% of lines end with an ellipsis
    * ``ok_alpha_words``    — ≥ 80% of words contain ≥ 1 alphabetic char
    * ``ok_stop_words``     — ≥ 2 distinct hits from a tiny English
      stop list (the, be/is, to, of, and, that, have, with)

    Everything is a pure Column expression over the split word/line
    arrays — whole-stage codegen, one pass, no shuffle, no Python.
    """
    w = F.filter(F.split(F.col(text_col), " "), lambda x: x != F.lit(""))
    lines = F.filter(F.split(F.col(text_col), "\n"),
                     lambda x: F.trim(x) != F.lit(""))
    n_words = F.size(w).cast("double")
    n_lines = F.size(lines).cast("double")
    safe_words = F.when(n_words > 0, n_words)   # NULL when empty
    safe_lines = F.when(n_lines > 0, n_lines)
    mean_wl = (F.aggregate(w, F.lit(0).cast("long"),
                           lambda acc, x: acc + F.length(x))
               .cast("double") / safe_words)
    n_sym = F.regexp_count(F.col(text_col),
                           F.lit(r"[#…]|\.\.\.")).cast("double")
    bullet_frac = (F.size(F.filter(
        lines, lambda x: F.trim(x).rlike(r"^([-*•‣▪]|•)")))
        .cast("double") / safe_lines)
    ellipsis_frac = (F.size(F.filter(
        lines, lambda x: F.rtrim(x).rlike(r"(\.\.\.|…)$")))
        .cast("double") / safe_lines)
    alpha_frac = (F.size(F.filter(w, lambda x: x.rlike(r"\p{L}")))
                  .cast("double") / safe_words)
    stops = ["the", "be", "is", "to", "of", "and", "that", "have",
             "with"]
    stop_arr = F.array(*[F.lit(s) for s in stops])
    n_stop_types = F.size(F.array_intersect(
        F.transform(w, F.lower), stop_arr))

    flags = {
        "n_words": n_words.cast("long"),
        "mean_word_len": mean_wl,
        "ok_word_count": (n_words >= 50) & (n_words <= 100_000),
        "ok_mean_word_len": (mean_wl >= 3) & (mean_wl <= 10),
        "ok_symbol_ratio": (n_sym / safe_words) <= 0.1,
        "ok_bullet_lines": bullet_frac < 0.9,
        "ok_ellipsis_lines": ellipsis_frac < 0.3,
        "ok_alpha_words": alpha_frac >= 0.8,
        "ok_stop_words": n_stop_types >= 2,
    }
    out = df.select(
        *df.columns,
        *[F.coalesce(c.cast("boolean"), F.lit(False)).alias(name)
          if name.startswith("ok_") else c.alias(name)
          for name, c in flags.items()])
    ok_cols = [n for n in flags if n.startswith("ok_")]
    acc = F.col(ok_cols[0])
    for n in ok_cols[1:]:
        acc = acc & F.col(n)
    return out.withColumn("gopher_pass", acc)


def c4_clean(df: "DataFrame", text_col: str = "text",
             id_col: str = "doc_id", min_words_per_line: int = 3,
             min_sentences: int = 3) -> "DataFrame":
    """C4-style cleaning (Raffel et al. 2020, §2.2 — public): line
    filters + document flags, as one pure-expression pass.

    Line retention (applied in order, output ``text_clean``):

    * the trimmed line ends with terminal punctuation (``.!?"'``)
    * the line has ≥ ``min_words_per_line`` words
    * the line does not contain the word ``javascript``
      (case-insensitive)

    Document flags (callers filter on these; C4 drops the doc):

    * ``has_lorem_ipsum`` — contains "lorem ipsum" (case-insensitive)
    * ``has_brace``       — contains ``{`` (code, not prose)
    * ``ok_sentences``    — ``text_clean`` keeps ≥ ``min_sentences``
      terminal-punctuated lines (C4's "at least 3 sentences" rule,
      counted on retained lines)
    * ``c4_keep``         — the conjunction a C4 pipeline applies

    NULL text → NULL ``text_clean``, ``c4_keep`` false.
    """
    lines = F.split(F.col(text_col), "\n")
    keep = F.filter(lines, lambda x: (
        F.rtrim(x).rlike(r"""[.!?"']$""")
        & (F.size(F.filter(F.split(F.trim(x), " +"),
                           lambda t: t != F.lit("")))
           >= min_words_per_line)
        & ~F.lower(x).contains("javascript")))
    n_kept = F.size(keep)
    text_clean = F.when(F.col(text_col).isNull(), F.lit(None)) \
        .otherwise(F.array_join(keep, "\n"))
    has_li = F.coalesce(F.lower(F.col(text_col)).contains("lorem ipsum"),
                        F.lit(False))
    has_brace = F.coalesce(F.col(text_col).contains("{"), F.lit(False))
    ok_sent = F.coalesce(n_kept >= min_sentences, F.lit(False))
    return df.select(
        *df.columns,
        text_clean.alias("text_clean"),
        F.coalesce(n_kept, F.lit(0)).alias("n_lines_kept"),
        has_li.alias("has_lorem_ipsum"),
        has_brace.alias("has_brace"),
        ok_sent.alias("ok_sentences"),
        (ok_sent & ~has_li & ~has_brace).alias("c4_keep"))
