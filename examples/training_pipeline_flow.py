"""End-to-end LLM training-data curation pipeline on this engine.

The north-star flow (SURVEY.md §2.5): raw documents -> language ID ->
quality gate -> exact dedup -> fuzzy (MinHash-LSH) dedup -> chunking,
with embedding-side near-dup pruning and an IVF ANN probe — each stage
a lazy DataFrame transformation, materialized once at the end. Usage:

    python examples/training_pipeline_flow.py [sf_dir]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from providenciasbigdata_spark.functions.text import (
    chunk_spans,
    lang_id,
    quality_score,
    tokenize,
)
from providenciasbigdata_spark.io import load_table
from providenciasbigdata_spark.operators import dedup, similarity
from providenciasbigdata_spark.session import get_spark


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark(app_name="training-pipeline", master="local[4]", shuffle_partitions=4)

    raw = load_table(spark, sf_dir, "documents")
    n_raw = raw.count()

    # -- 0. deterministic source mix (operators/mix.py): per-language
    #       sources at training weights, reproducible across runs -------
    from providenciasbigdata_spark.operators.mix import mix_corpus

    docs = mix_corpus(
        [
            ("en", raw.filter(F.col("lang") == "en"), 1.0),
            ("de", raw.filter(F.col("lang") == "de"), 0.5),
            ("es", raw.filter(F.col("lang") == "es"), 0.5),
        ]
    ).drop("mix_source")
    n0 = docs.count()
    print(f"[0] raw corpus: {n_raw} docs -> mixed (en 1.0 / de .5 / es .5): {n0}")

    # -- 0b. encoding-health screen: the gate that runs BEFORE content
    # rules — wrong-charset shards sail through length/stopword
    # heuristics while being garbage (round 6) -----------------------------
    from providenciasbigdata_spark.operators.curate import encoding_screen

    enc = encoding_screen(docs)
    n_enc_bad = enc.filter(~F.col("pass_encoding")).count()
    docs = enc.filter(F.col("pass_encoding")).select(*docs.columns)
    print(f"[0b] encoding screen: {n_enc_bad} docs dropped "
          f"(replacement/control/mojibake)")

    # -- 1. language ID + quality gate (pure Catalyst expressions) --------
    scored = docs.select(
        "doc_id", "text", tokenize(F.col("text")).alias("toks")
    ).select(
        "doc_id", "text", "toks",
        lang_id(F.col("toks")).alias("lang"),
        quality_score(F.col("text"), F.col("toks")).alias("quality"),
    )
    kept = scored.filter((F.col("lang") == "en") & (F.col("quality") >= 0.5))
    n1 = kept.count()
    print(f"[1] lang=en & quality>=0.5: {n1} docs")

    # -- 1b. Gopher rule audit + DSIR target-likeness scores --------------
    from providenciasbigdata_spark.operators.curate import gopher_quality_flags
    from providenciasbigdata_spark.operators.mix import dsir_log_weights

    flags = gopher_quality_flags(docs)
    n_gopher = flags.filter(F.col("pass_gopher")).count()
    print(f"[1b] gopher rule gate would keep {n_gopher} of {n0} "
          "(audit only here — the fixture docs are short)")
    dsir = dsir_log_weights(
        docs, raw.filter(F.col("lang") == "en"), n_buckets=1024
    )
    top_dsir = dsir.orderBy(F.desc("log_weight")).limit(3).collect()
    print(f"[1b] DSIR most-target-like docs: "
          f"{[(r.doc_id, round(r.log_weight, 2)) for r in top_dsir]}")

    # -- 2. exact dedup (content fingerprint, min-id survivor) ------------
    exact = dedup.dedup_exact(kept.select("doc_id", "text"))
    n2 = exact.count()
    print(f"[2] exact dedup: {n2} docs ({n1 - n2} dropped)")

    # -- 2b. paragraph-level dedup + rewrite (Dolma-style) ----------------
    rewritten = dedup.dedup_paragraphs(exact, chunk_tokens=20)
    dropped_paras = rewritten.agg(
        F.sum(F.col("n_chunks") - F.col("kept_chunks")).alias("d")
    ).first().d
    exact = exact.drop("text").join(
        rewritten.filter(F.col("kept_chunks") > 0).select(
            "doc_id", F.col("new_text").alias("text")
        ),
        "doc_id",
    )
    print(f"[2b] paragraph dedup: {dropped_paras} duplicated paragraphs removed")

    # -- 3. fuzzy dedup: MinHash LSH -> verify -> transitive clusters -----
    fuzzy = dedup.dedup_near(exact, threshold=0.5)
    n3 = fuzzy.count()
    print(f"[3] fuzzy dedup (jaccard>=0.5 clusters): {n3} docs ({n2 - n3} dropped)")

    # -- 3b. length-weighted deterministic subsample (epoch mix draw) -----
    from providenciasbigdata_spark.operators.mix import weighted_sample_topk

    drawn = weighted_sample_topk(
        fuzzy.withColumn("n_chars", F.length("text")), "n_chars", k=max(1, n3 // 2)
    )
    print(f"[3b] weighted draw (longer docs likelier): {drawn.count()} of {n3}")
    fuzzy = drawn.drop("n_chars")

    # -- 3c. epoch plan: does the token budget force >4-epoch repeats
    # of any slice? (round 6; Muennighoff et al. cap) ----------------------
    from providenciasbigdata_spark.operators.mix import epoch_plan

    plan = epoch_plan(
        # everything here is lang=en by the stage-1 gate (the lang
        # column itself was consumed there)
        fuzzy.select(
            F.lit("en").alias("lang"),
            F.size(tokenize(F.col("text"))).alias("n_tok"),
        ),
        "lang", "n_tok", weights={"en": 1}, budget_tokens=50_000,
    ).collect()
    for row in plan:
        cap = " (CAPPED)" if row.needs_cap else ""
        print(f"[3c] epoch plan {row.lang}: {row.tokens} tokens -> "
              f"{row.epochs:.2f} epochs{cap}")

    # -- 4. chunking: 64-token windows, 16 overlap ------------------------
    chunks = (
        fuzzy.select("doc_id", tokenize(F.col("text")).alias("toks"))
        .select("doc_id", F.explode(chunk_spans(F.col("toks"), 64, 16)).alias("c"))
        .select("doc_id", "c.chunk_id", "c.n_tokens")
    )
    stats = chunks.agg(
        F.count("*").alias("n_chunks"), F.sum("n_tokens").alias("n_tokens")
    ).first()
    print(f"[4] chunked: {stats.n_chunks} chunks, {stats.n_tokens} tokens")

    # -- 4b. whole-document context packing (sharded FFD, no straddling) --
    from providenciasbigdata_spark.operators.pack import pack_first_fit

    packed = pack_first_fit(
        fuzzy.withColumn("n_chars", F.length("text")),
        "n_chars", capacity=2048, n_shards=2,
    )
    pk = packed.agg(
        F.count_distinct("bin_id").alias("bins"),
        F.sum("n_chars").alias("fill"),
    ).first()
    print(f"[4b] FFD packed into {pk.bins} bins of 2048 "
          f"(fill {pk.fill}, lower bound {-(-pk.fill // 2048)})")

    # -- 4c. deterministic training-order shuffle into reader shards ------
    from providenciasbigdata_spark.operators.mix import shuffle_to_shards

    sharded = shuffle_to_shards(fuzzy.select("doc_id"), "doc_id",
                                n_shards=4, seed="epoch0")
    dist = sharded.groupBy("shard").count().orderBy("shard").collect()
    print(f"[4c] epoch-0 shuffle: shard sizes {[r['count'] for r in dist]} "
          "(seeded md5 permutation; a new seed is a fresh epoch order)")

    # -- 5. embedding near-dup pruning + IVF ANN probe --------------------
    emb = load_table(spark, sf_dir, "embeddings")
    near = similarity.pairwise_cosine_blocked(emb, threshold=0.95, block_size=512)
    print(f"[5] embedding near-dup pairs (cos>=0.95): {near.count()}")
    sem = dedup.dedup_embedding(emb, threshold=0.95, block_size=512)
    n_comp = sem.count()
    n_emb = emb.count()
    print(f"[5] semantic dedup (SemDeDup shape): {n_comp} survivors "
          f"({n_emb - n_comp} near-dup vectors dropped)")

    centroids, iters = similarity.kmeans_centroids(emb, n_clusters=8, max_iter=5)
    qvec = emb.filter(F.col("vec_id") == 0).first().embedding
    top = similarity.ivf_topk(emb, qvec, centroids, k=5, nprobe=2).collect()
    print(f"[5] IVF (k-means {iters} iters) top-5 for vec 0: "
          f"{[(r.vec_id, round(r.score, 4)) for r in top]}")

    spark.stop()


if __name__ == "__main__":
    main()
