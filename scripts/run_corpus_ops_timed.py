#!/usr/bin/env python
"""spark-submit target: timed corpus-ops job for the scaling evidence
(VERDICT r3 #8 — the two-level run must include the round-3 heavy
operators, not just the validation pipeline).

Composition timed as ONE job (the operators a training-data pipeline chains):
  1. dedup_corpus  — exact pass + MinHash/LSH near-dup clusters over a
     dup-heavy corpus (documents table replicated REP_DOCS x with re-keyed
     ids; replicas are byte-identical, which is the realistic shape — the
     exact pass must absorb the mass before LSH);
  2. quality filter + language allowlist + deterministic hash split over the
     retained rows (the curate_corpus composition);
  3. Naive-Bayes quality classifier — fit from weak labels (ONE
     explode+groupBy to the hashed weight table) and score every retained
     doc via the broadcast-weights join (the round-4 model-based filter);
  4. semantic_dedup — cell-bounded within-cell cosine pairs over the
     embeddings table replicated REP_EMB x, quantized by spherical k-means
     (2 Lloyd iterations, fit INSIDE the timed window — n_cells grown with
     the corpus, the operator's documented scaling contract);
  5. interleaved surface (round-4 session-4): canonicalize the two-span
     interleaved form of the retained corpus, OBELICS layout filter, and
     the multimodal t:/m: token-set MinHash-LSH candidate pass.

Prints ONE JSON line: {"label", "docs", "vectors", "elapsed_sec",
"docs_per_sec"}. Execution forced with the noop sink.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

# spark-submit ships jsonschema_spark via --py-files; for a bare `python`
# invocation fall back to the repo checkout
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession
from pyspark.sql import functions as F


def _force(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def replicate(df, id_col: str, k: int, vary_text: bool = False):
    """k deterministic re-keyed copies: id' = id * k + rep.

    vary_text=True rotates each replica's word order by the replica index
    (deterministic, no RNG): replicas stay ~near-duplicates of each other
    (same shingle multiset shifted at the seam) but are no longer
    byte-identical, so the exact pass can't absorb them and the MinHash/LSH
    machinery does real per-doc work — the compute-dominated shape the
    scaling evidence needs."""
    rep = df.select("*", F.explode(F.sequence(F.lit(0), F.lit(k - 1))).alias("__rep"))
    rep = rep.withColumn(id_col, F.col(id_col) * k + F.col("__rep"))
    if vary_text:
        words = F.split(F.col("text"), " ")
        n = F.size(words)
        shift = F.pmod(F.col("__rep"), F.greatest(n, F.lit(1)))
        rotated = F.concat(F.slice(words, shift + 1, n - shift), F.slice(words, 1, shift))
        rep = rep.withColumn("text", F.array_join(rotated, " "))
    return rep.drop("__rep")


def run_once(spark, sf_dir: str, rep_docs: int, rep_emb: int, n_cells: int) -> tuple[int, int]:
    from jsonschema_spark.operators.dedup import dedup_corpus
    from jsonschema_spark.operators.quality_model import (
        fit_nb_quality_model,
        score_quality_model,
    )
    from jsonschema_spark.operators.sampling import hash_split
    from jsonschema_spark.operators.semdedup import (
        fit_spherical_kmeans_centroids,
        semantic_dedup,
    )
    from jsonschema_spark.operators.text import quality_features

    # replicas of a single parquet split land in ONE partition — spread them
    # (at production scale the input arrives in thousands of file splits; the
    # repartition stands in for that, it is not part of the timed operators'
    # own plans)
    par = spark.sparkContext.defaultParallelism
    docs = replicate(
        spark.read.parquet(f"{sf_dir}/documents.parquet"), "doc_id", rep_docs, vary_text=True
    ).repartition(par)
    emb = replicate(
        spark.read.parquet(f"{sf_dir}/embeddings.parquet"), "vec_id", rep_emb
    ).repartition(par)

    kept = dedup_corpus(docs, "doc_id", "text")
    q = quality_features(kept, "doc_id", "text")
    good_ids = q.filter((F.col("n_tokens") >= 5) & (F.col("punct_ratio") < 0.2)).select(
        F.col("id").alias("doc_id")
    )
    # `good` feeds the split, the classifier (fit AND score), and the
    # interleaved stage — persist it or every consumer re-derives the whole
    # dedup_corpus chain (LSH + iterative connected components); observed
    # blowing the timed run up ~10x when stage 5 landed unpersisted
    good = (
        kept.join(good_ids, "doc_id", "left_semi")
        .filter(F.col("lang").isin("en", "de", "fr", "es"))
        .persist()
    )
    _force(hash_split(good, "doc_id", {"train": 0.9, "val": 0.05, "test": 0.05}))

    labeled = good.withColumn("pos", F.col("lang") == "en")
    weights, consts = fit_nb_quality_model(labeled, "doc_id", "text", "pos")
    _force(score_quality_model(good, weights, consts, "doc_id", "text"))

    emb_d = emb.select(
        "vec_id", F.transform("embedding", lambda x: x.cast("double")).alias("embedding")
    )
    model = fit_spherical_kmeans_centroids(emb_d, n_cells, n_iters=2)
    _force(semantic_dedup(emb_d, threshold=0.95, n_cells=n_cells, centroids=model))

    # 5. interleaved surface (round-4 session-4 operators): build the
    #    two-span-per-doc interleaved form of the SAME retained corpus,
    #    canonicalize the layout, apply the OBELICS layout filter, and run
    #    the multimodal (t:/m: token set) MinHash-LSH candidate pass —
    #    the chain interleaved_pipeline_docs composes
    from jsonschema_spark.operators.dedup import lsh_candidate_pairs, minhash_fold
    from jsonschema_spark.operators.spans import (
        canonicalize_spans,
        interleaved_doc_filter,
        interleaved_token_set,
    )

    snull = F.lit(None).cast("string")
    spans = F.array(
        F.struct(F.lit("text").alias("kind"), F.col("text").alias("text"),
                 snull.alias("media_ref"), F.lit(0).alias("offset")),
        F.struct(F.lit("media").alias("kind"), snull.alias("text"),
                 F.concat(F.lit("media://img-"), (F.col("doc_id") % 50).cast("string")).alias("media_ref"),
                 F.lit(1).alias("offset")),
        F.struct(F.lit("text").alias("kind"), F.reverse(F.col("text")).alias("text"),
                 snull.alias("media_ref"), F.lit(2).alias("offset")),
    )
    inter = good.select("doc_id", spans.alias("spans"))
    canon = canonicalize_spans(inter).persist()  # self-joined below
    flt = interleaved_doc_filter(canon, max_media=100, max_media_frac=1.0, min_text_chars=50)
    kept_i = canon.join(flt.filter(F.col("keep")).select("doc_id"), "doc_id", "left_semi")
    sig = kept_i.select(
        F.col("doc_id").alias("id"),
        minhash_fold(interleaved_token_set("spans", shingle_n=3), 8).alias("sig"),
    )
    _force(lsh_candidate_pairs(sig, bands=4, rows_per_band=2))
    canon.unpersist()
    good.unpersist()
    return rep_docs, rep_emb


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument("--rep-docs", type=int, default=100)
    ap.add_argument("--rep-emb", type=int, default=10)
    ap.add_argument("--n-cells", type=int, default=128)
    ap.add_argument("--label", default="")
    args = ap.parse_args()

    spark = SparkSession.builder.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    n_docs = spark.read.parquet(f"{args.sf_dir}/documents.parquet").count() * args.rep_docs
    n_vec = spark.read.parquet(f"{args.sf_dir}/embeddings.parquet").count() * args.rep_emb

    # JIT/codegen warm-up at 1/10 scale, then best-of-2 at full scale
    run_once(spark, args.sf_dir, max(args.rep_docs // 10, 1), max(args.rep_emb // 5, 1),
             max(args.n_cells // 4, 16))
    best = None
    for _ in range(2):
        t0 = time.perf_counter()
        run_once(spark, args.sf_dir, args.rep_docs, args.rep_emb, args.n_cells)
        dt = time.perf_counter() - t0
        best = dt if best is None or dt < best else best

    print(json.dumps({
        "label": args.label,
        "docs": n_docs,
        "vectors": n_vec,
        "elapsed_sec": round(best, 2),
        "docs_per_sec": round(n_docs / best, 1),
    }))


if __name__ == "__main__":
    main()
