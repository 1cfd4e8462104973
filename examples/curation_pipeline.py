"""End-to-end LLM training-data curation over the documents corpus —
the integrated story the individual ops serve:

  1. exact dedup        (fingerprint hash-groupBy)
  2. fuzzy dedup        (minhash-LSH pairs → connected components →
                         min-id survivor per cluster)
  3. quality signals    (Workflow DAG: lang-id, quality score, token
                         count, PII scrub — one pass, pure codegen)
  4. quality filter     (lang == en, quality ≥ threshold, repetition
                         and duplicate-span mass below thresholds)
  5. decontamination    (n-gram overlap vs a held-out benchmark)
  6. mixing + split     (deterministic per-source sampling quotas,
                         train/holdout split on a stable key)
  7. packing            (greedy fixed-capacity training bins)
  8. tokenization       (BPE fit on the curated train split, encode to
                         token arrays, chunk to the context window,
                         re-pack by REAL token counts — the pipeline's
                         terminal artifact is the north-rule table
                         shape (doc_id, tokens:array<int>, n_tok,
                         source))

Run: python examples/curation_pipeline.py [sf_dir]
Prints one JSON line of per-stage row counts.
"""
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

import nvtabular_spark as nvt
from nvtabular_spark import ops
from nvtabular_spark.functions import (bpe, dedup, lm, packing, sampling,
                                       text)


def curate(spark, sf_dir, capacity=4096):
    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    counts = {"input": docs.count()}

    # 1-2: exact then fuzzy dedup
    docs = dedup.drop_exact_duplicates(docs)
    counts["after_exact_dedup"] = docs.count()
    pairs = dedup.minhash_lsh_pairs(docs, num_hashes=8, bands=4,
                                    family="xxhash64")
    docs = dedup.drop_near_duplicates(docs, pairs)
    counts["after_fuzzy_dedup"] = docs.count()

    # 3: quality signals as ONE Workflow pass
    wf = nvt.Workflow(
        (["text"] >> ops.LangId())
        + (["text"] >> ops.QualityScore())
        + (["text"] >> ops.TokenCount())
        + (["text"] >> ops.ScrubPII())
        + ["doc_id", "source"])
    scored = wf.fit_transform(docs)

    # 4: threshold filter + repetition / span-dup mass
    rep = text.repetition_stats(docs).select(
        "doc_id", "dup_ngram_frac")
    span = dedup.duplicate_span_stats(docs, k=8).select(
        "doc_id", "dup_word_frac")
    kept = (scored.join(rep, "doc_id", "left")
            .join(span, "doc_id", "left")
            .filter((F.col("text_lang") == "en")
                    & (F.col("text_quality") >= 0.3)
                    & (F.coalesce("dup_ngram_frac", F.lit(0.0)) < 0.9)
                    & (F.coalesce("dup_word_frac", F.lit(0.0)) < 0.5)))
    counts["after_quality_filter"] = kept.count()

    # 4b: CCNet-style perplexity gate — fit a unigram LM on the
    # surviving corpus, drop the worst-perplexity tail third. (The
    # Gopher/C4 rule sets also run here as signals only: the synthetic
    # corpus is single-line punctuation-free text, so C4's
    # terminal-punctuation rule and Gopher's stopword rule would
    # reject it wholesale — on real web text they'd be filters.)
    kept_docs = docs.join(kept.select("doc_id"), "doc_id")
    model = lm.unigram_lm_fit(kept_docs, vocab_size=10_000)
    scores = lm.perplexity_score(kept_docs, model)
    # exact=True: bucket membership feeds every later stage, and the
    # approximate thresholds are run-order dependent (task-completion
    # order changes boundary docs run to run)
    head_mid = lm.perplexity_partition(scores, 1 / 3, 1 / 3,
                                       exact=True) \
        .filter(F.col("ppl_bucket") != "tail").select("doc_id")
    kept = kept.join(head_mid, "doc_id")
    counts["after_ppl_filter"] = kept.count()
    counts["gopher_pass"] = int(
        text.gopher_quality_flags(kept_docs)
        .filter("gopher_pass").count())

    # 5: decontamination vs a synthetic benchmark slice. Compare RAW
    # text on both sides — the scrubbed text from step 3 would break
    # every shingle spanning a PII placeholder and let contaminated
    # docs containing URLs/emails slip through
    bench = spark.read.parquet(
        os.path.join(sf_dir, "documents.parquet")) \
        .filter(F.col("doc_id") % 97 == 0)
    kept_raw = docs.join(kept.select("doc_id"), "doc_id")
    contam = packing.ngram_contamination(kept_raw, bench, n=8,
                                         family="xxhash64")
    kept = kept.join(
        contam.filter(F.col("contamination_frac") < 0.8)
        .select("doc_id"), "doc_id")
    counts["after_decontamination"] = kept.count()

    # 6: mixing quotas + stable holdout split
    mixed = sampling.stratified_sample(
        kept, {"src1": 1.0}, strata_col="source",
        default_fraction=0.8, seed=11)
    train, holdout = sampling.split_train_holdout(mixed, 0.05)
    counts["train"] = train.count()
    counts["holdout"] = holdout.count()

    # 7: pack the training set into fixed-capacity bins — the
    # workflow's TokenCount output (text_n_tok) is already on the rows
    packed = packing.pack_sequences(
        train, capacity=capacity, shard_col="source",
        order_col="doc_id", tok_col="text_n_tok", strategy="greedy")
    st = packing.packing_stats(packed, capacity=capacity,
                               shard_col="source", tok_col="text_n_tok")
    row = st.agg(F.count(F.lit(1)).alias("bins"),
                 F.avg("fill_frac").alias("avg_fill")).collect()[0]
    counts["bins"] = int(row["bins"])
    counts["avg_fill"] = round(float(row["avg_fill"]), 3)

    # 8: tokenize the curated train split with a BPE model fitted ON
    # that split (fit = one word-count pass; the merge loop never
    # re-reads the corpus), chunk over-length sequences to the
    # training context window, and re-pack by the REAL token counts —
    # the terminal artifact is the north-rule training-sequence table
    # (doc_id, tokens:array<int>, n_tok, source).
    train_raw = docs.join(train.select("doc_id"), "doc_id")
    model = bpe.bpe_fit(train_raw, n_merges=512, max_words=50_000)
    counts["bpe_vocab"] = model.vocab_size
    toks = bpe.bpe_encode(train_raw, model).select(
        "doc_id", "source", "tokens", "n_tok")
    # context window 64 < the corpus' max sequence length, so the
    # chunker genuinely splits at this scale (the synthetic corpus
    # tops out near 100 tokens/doc)
    chunks = packing.chunk_sequences(toks, max_len=64, min_tail=8)
    sequences = chunks.select(
        F.concat_ws("#", F.col("doc_id").cast("string"),
                    F.col("chunk_id").cast("string")).alias("doc_id"),
        "tokens", "n_tok", "source")
    counts["sequences"] = sequences.count()
    tok_packed = packing.pack_sequences(
        sequences, capacity=capacity, shard_col="source",
        order_col="doc_id", tok_col="n_tok", strategy="greedy")
    tok_st = packing.packing_stats(tok_packed, capacity=capacity,
                                   shard_col="source", tok_col="n_tok")
    row = tok_st.agg(F.count(F.lit(1)).alias("bins"),
                     F.avg("fill_frac").alias("avg_fill")).collect()[0]
    counts["token_bins"] = int(row["bins"])
    counts["token_avg_fill"] = round(float(row["avg_fill"]), 3)

    # 9: release gates — (a) snapshot drift of the TRAIN split against
    # the full mixed corpus (a stable-key split must not reshape the
    # length distribution or the source mix; this is the invariant
    # that holds at ANY holdout size — holdout-vs-train PSI is pure
    # sampling noise when the holdout is a handful of rows, so it is
    # reported, not gated); (b) the incremental-ingest ledger: persist
    # exact_keys once, and tomorrow's crawl anti-joins against 16-byte
    # fingerprints instead of re-reading corpus text.
    from nvtabular_spark.functions import drift
    srow = drift.drift_summary(mixed, train, "text_n_tok",
                               bins=10).collect()[0]
    counts["split_psi"] = round(float(srow["psi"]), 4)
    crow = drift.psi_categorical(mixed, train, "source", top_k=5) \
        .agg(F.sum("psi_contrib").alias("p")).collect()[0]
    counts["split_psi_source"] = round(float(crow["p"]), 4)
    hrow = drift.drift_summary(train, holdout, "text_n_tok",
                               bins=10).collect()[0]
    counts["holdout_psi_info"] = round(float(hrow["psi"]), 4)
    ledger = dedup.exact_keys(train_raw)
    increment = spark.read.parquet(
        os.path.join(sf_dir, "documents.parquet")) \
        .filter(F.col("doc_id") % 89 == 1)
    counts["increment"] = increment.count()
    counts["novel_in_increment"] = dedup.novel_documents(
        increment, ledger, seen_is_keys=True).count()
    return counts


def main():
    import time
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "8"))
    spark = (SparkSession.builder.master(f"local[{cpus}]")
             .config("spark.sql.shuffle.partitions", str(cpus))
             .config("spark.sql.adaptive.enabled", "true")
             .config("spark.ui.enabled", "false")
             .appName("curation-pipeline").getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")
    t0 = time.time()
    counts = curate(spark, sf_dir)
    counts["wall_sec"] = round(time.time() - t0, 3)
    counts["sf_dir"] = sf_dir
    counts["cpus"] = cpus
    print(json.dumps(counts))


if __name__ == "__main__":
    main()
