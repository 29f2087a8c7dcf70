"""Training-data corpus cleaning job: the composed pipeline a 100 TB
pretraining corpus runs before tokenization.

    documents → exact dedup → MinHash-LSH near-dup removal →
    quality filter → language filter → clean parquet + stats JSON

Every stage is one of the first-class operators (SURVEY §2 Table C);
this job is the composition proof + the spark-submit entry for it.

Usage:
    python jobs/clean_corpus.py --input /root/testdata/sf0.01 \
        --out /tmp/clean --min-words 5 --max-stop 0.6 --langs en,de,fr,es
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True,
                    help="sf dir containing documents.parquet")
    ap.add_argument("--out", required=True)
    ap.add_argument("--parallelism", type=int,
                    default=int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    ap.add_argument("--jaccard", type=float, default=0.8)
    ap.add_argument("--strategy", default="greedy",
                    choices=["greedy", "components"],
                    help="near-dup survivor policy: greedy drop-larger-id "
                         "or connected-components keep-min-per-cluster")
    ap.add_argument("--min-words", type=int, default=5)
    ap.add_argument("--max-stop", type=float, default=0.7)
    ap.add_argument("--max-len-quantile", type=float, default=None,
                    help="drop docs above this corpus word-length "
                         "quantile (e.g. 0.99 — outlier/garbage cap via "
                         "the one-pass approx_percentile sketch)")
    ap.add_argument("--langs", default="en,de,fr,es")
    ap.add_argument("--max-rep", type=float, default=None,
                    help="drop docs whose duplicate-trigram fraction "
                         "exceeds this (Gopher-style repetition filter)")
    ap.add_argument("--scrub-pii", action="store_true",
                    help="mask emails/IPs/phones/SSN-shaped spans in the "
                         "output text")
    ap.add_argument("--chunk-words", type=int, default=None,
                    help="also emit <out>/chunks parquet: fixed word "
                         "windows of this size (overlap 1/8th)")
    ap.add_argument("--bpe-merges", type=int, default=None,
                    help="train a real BPE merge table of this size on "
                         "the survivors and emit <out>/token_counts "
                         "parquet + bpe_merges.json (token-budget "
                         "accounting)")
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from duke_spark.config import get_spark
    from duke_spark.operators.dedup import exact_dedup, near_dup_filter
    from duke_spark.operators.lang_id import detect_language
    from duke_spark.operators.text_analysis import quality_scores

    spark = get_spark("clean_corpus", master=f"local[{args.parallelism}]")
    spark.sparkContext.setLogLevel("ERROR")
    t0 = time.time()

    docs = spark.read.parquet(
        os.path.join(args.input, "documents.parquet")).repartition(
        args.parallelism)
    n0 = docs.count()

    # 1. exact dedup (keep min doc_id per distinct text)
    survivors = exact_dedup(docs).select("doc_id")
    docs = docs.join(survivors, "doc_id", "left_semi")
    n1 = docs.count()

    # 2. near-dup removal (MinHash+LSH candidates, Jaccard-verified)
    docs = near_dup_filter(docs, jaccard_threshold=args.jaccard,
                           strategy=args.strategy)
    n2 = docs.count()

    # 3. quality filter
    q = quality_scores(docs)
    docs = (q.filter((F.col("n_words") >= args.min_words) &
                     (F.col("stopword_ratio") <= args.max_stop))
            .select(*docs.columns))
    n3 = docs.count()

    # 4. language filter (keep confidently-identified allowed languages)
    # — the full ~45-language script+stopword+trigram detector, still a
    # narrow zero-shuffle projection (operators/lang_id.py)
    allowed = args.langs.split(",")
    lid = detect_language(docs)
    docs = (lid.filter(F.col("lang_pred").isin(allowed))
            .select(*[c for c in docs.columns]))
    n4 = docs.count()

    # 5. optional length-outlier cap: one approx_percentile sketch pass
    # over the survivors, then a pushable filter (runaway concatenations
    # and binary-garbage docs live in the extreme right tail)
    len_cap = None
    if args.max_len_quantile is not None:
        n_words = F.size(F.split(F.col("text"), " "))
        len_cap = docs.agg(F.approx_percentile(
            n_words.cast("double"), F.lit(args.max_len_quantile),
            F.lit(10000))).collect()[0][0]
        docs = docs.filter(n_words <= len_cap)
    n5 = docs.count()

    # 6. optional repetition filter (duplicate-trigram fraction)
    n6 = n5
    if args.max_rep is not None:
        from duke_spark.operators.corpus_prep import repetition_scores
        docs = (repetition_scores(docs)
                .filter(F.col("rep_ratio") <= args.max_rep)
                .drop("n_ngrams", "rep_ratio"))
        n6 = docs.count()

    # 7. optional PII scrub (masks in place, keeps schema)
    if args.scrub_pii:
        from duke_spark.operators.corpus_prep import scrub_pii
        docs = (scrub_pii(docs).drop("text")
                .withColumnRenamed("scrubbed_text", "text"))

    docs.write.mode("overwrite").parquet(os.path.join(args.out, "clean"))

    # 8. optional chunk emission for the tokenizer stage
    if args.chunk_words:
        from duke_spark.operators.corpus_prep import chunk_documents
        chunk_documents(docs, chunk_words=args.chunk_words,
                        overlap=max(args.chunk_words // 8, 1)) \
            .write.mode("overwrite") \
            .parquet(os.path.join(args.out, "chunks"))

    # 9. optional real-BPE token accounting (train on the word-frequency
    # table — one agg — then per-doc counts)
    n_bpe = None
    if args.bpe_merges:
        from duke_spark.operators.bpe import apply_bpe, save_merges, \
            train_bpe
        merges = train_bpe(docs, num_merges=args.bpe_merges)
        os.makedirs(args.out, exist_ok=True)
        save_merges(merges, os.path.join(args.out, "bpe_merges.json"))
        counts = apply_bpe(docs, merges)
        counts.write.mode("overwrite") \
            .parquet(os.path.join(args.out, "token_counts"))
        row = spark.read.parquet(os.path.join(args.out, "token_counts")) \
            .agg(F.sum("n_bpe_tokens")).collect()[0][0]
        n_bpe = int(row or 0)
    stats = {
        "job": "clean_corpus", "input": args.input,
        "rows_in": int(n0),
        "after_exact_dedup": int(n1),
        "after_near_dup": int(n2),
        "after_quality": int(n3),
        "after_language": int(n4),
        "after_length_cap": int(n5),
        "after_repetition": int(n6),
        "length_cap_words": len_cap,
        "pii_scrubbed": bool(args.scrub_pii),
        "bpe_total_tokens": n_bpe,
        "kept_frac": round(n6 / n0, 4) if n0 else None,
        "elapsed_sec": round(time.time() - t0, 2),
    }
    os.makedirs(args.out, exist_ok=True)
    with open(os.path.join(args.out, "stats.json"), "w") as f:
        json.dump(stats, f, indent=2)
    print(json.dumps(stats))
    spark.stop()


if __name__ == "__main__":
    main()
