"""End-to-end LLM training-data pipeline over the documents corpus:

    PII scrub → text stats + repetition filter → quality filter →
    exact dedup → duplicate-span filter → MinHash-LSH candidates →
    n-gram-Jaccard verify → cluster-based near-dup removal →
    hash-tokenize → slice/pad → training-set parquet

Every stage is expression/join-level Spark (no row Python); the LSH
candidate pass is banded (never all-pairs) and the exact Jaccard only
runs on LSH candidates — the verify-stage pattern that keeps 100 TB
corpora tractable.

    python examples/llm_data_pipeline.py [sf_dir] [out_dir]
"""
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

import nvtabular_spark as nvt
from nvtabular_spark import ops
from nvtabular_spark.functions import dedup, text
from nvtabular_spark.functions.hashing import hash64
from nvtabular_spark.sources import write_shuffled

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
OUT = sys.argv[2] if len(sys.argv) > 2 else tempfile.mkdtemp(prefix="llm_out_")


def main():
    spark = (SparkSession.builder.master("local[8]")
             .config("spark.sql.shuffle.partitions", "8")
             .config("spark.sql.adaptive.enabled", "true")
             .config("spark.ui.enabled", "false").getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")
    t0 = time.time()

    docs = spark.read.parquet(os.path.join(SF_DIR, "documents.parquet"))
    n0 = docs.count()

    # 0. PII scrub (URL/email/IPv4 → typed placeholder tokens)
    docs = docs.select("doc_id",
                       text.scrub_pii(F.col("text")).alias("text"))

    # 1. quality filter: language + quality score + length gates +
    #    Gopher repetition gate (dup-2-gram char mass)
    c = F.col("text")
    scored = docs.select(
        "doc_id", "text",
        text.lang_id(c).alias("lang_pred"),
        text.quality_score(c).alias("quality"),
        text.token_count(c).alias("n_tok"))
    rep = text.repetition_stats(docs, n=2) \
        .select("doc_id", "dup_ngram_char_frac")
    kept = (scored.join(rep, "doc_id", "left")
            .filter((F.col("quality") > 0.3) & (F.col("n_tok") >= 5)
                    & (F.coalesce("dup_ngram_char_frac", F.lit(0.0))
                       <= 0.6))
            .drop("dup_ngram_char_frac"))
    n1 = kept.count()

    # 1b. substring-dedup gate: drop docs mostly covered by spans that
    #     also appear in other documents (Lee et al. 2022 signal)
    span_frac = dedup.duplicate_span_stats(kept, k=8, family="xxhash64") \
        .select("doc_id", "dup_word_frac")
    kept = (kept.join(span_frac, "doc_id", "left")
            .filter(F.coalesce("dup_word_frac", F.lit(0.0)) <= 0.9)
            .drop("dup_word_frac"))

    # 2. exact dedup (normalized fingerprint, keep canonical)
    deduped = dedup.drop_exact_duplicates(kept)
    n2 = deduped.count()

    # 3. near-dup removal: banded MinHash-LSH candidates, verified with
    #    exact n-gram Jaccard, then connected components over the
    #    verified pair graph keep ONE doc per duplicate CLUSTER (the
    #    standard fuzzy-dedup policy — pairwise dropping can keep two
    #    docs bridged by a third, components cannot)
    cands = dedup.minhash_lsh_pairs(deduped, num_hashes=8, bands=4,
                                    family="xxhash64", max_bucket=1000)
    cand_docs = (cands.select(F.col("id_a").alias("doc_id"))
                 .union(cands.select("id_b")).distinct())
    verify_corpus = deduped.join(cand_docs, "doc_id")
    verified = dedup.ngram_jaccard_pairs(verify_corpus, threshold=0.7,
                                         family="xxhash64")
    clean = dedup.drop_near_duplicates(deduped, verified)
    n3 = clean.count()

    # 4. tokenize (hash vocab) + slice/pad via the Workflow DAG
    tokens = F.transform(
        text.words(F.col("text")),
        lambda w: F.pmod(hash64(w), F.lit(50000)).cast("int"))
    base = clean.select("doc_id", "lang_pred", "quality",
                        tokens.alias("tokens"))
    wf = nvt.Workflow(
        (["tokens"] >> ops.ListSlice(0, 128, pad=True, pad_value=0))
        + (["lang_pred"] >> ops.Categorify())
        + ["doc_id", "quality"])
    out = wf.fit_transform(base)

    # 5. shuffled training-set write
    write_shuffled(out, OUT, shuffle="per_partition")

    wall = time.time() - t0
    print(f"corpus={n0} quality_kept={n1} exact_deduped={n2} "
          f"near_dedup={n3} wall={wall:.1f}s output={OUT}")


if __name__ == "__main__":
    main()
