"""Retrieval pipeline a RAG or data-sampling consumer runs on top of
the engine (round 9): exact retrieval -> MMR diversity re-ranking ->
context assembly under a token budget.

Stages: brute-force top-40 per query (the ANN baseline; swap in
ivf_topk at corpus scale) -> mmr_rerank (relevance traded against
redundancy; the duplicate-heavy fixture makes the effect visible) ->
join the surviving ids back to their documents and first-fit-pack the
chunks under a per-query context budget. Usage:

    python examples/retrieval_rerank_flow.py [sf_dir]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F
from pyspark.sql.window import Window

from providenciasbigdata_spark.functions.text import tokenize
from providenciasbigdata_spark.io import load_table
from providenciasbigdata_spark.operators.similarity import (
    mmr_rerank,
    topk_per_query,
)
from providenciasbigdata_spark.session import get_spark

CONTEXT_BUDGET = 160  # tokens per query's assembled context


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark(
        app_name="retrieval-rerank", master="local[4]", shuffle_partitions=4
    )

    emb = load_table(spark, sf_dir, "embeddings")
    docs = load_table(spark, sf_dir, "documents")

    # -- retrieval: exact top-40 per query (3 queries) -------------------
    queries = emb.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    cands = topk_per_query(emb, queries, k=40).join(
        emb.select("vec_id", "embedding"), "vec_id"
    )
    print(f"[retrieve] {cands.count()} candidates across 3 queries")

    # -- MMR: diversity re-ranking, k=8, lambda=0.7 ----------------------
    reranked = mmr_rerank(cands, k=8, lam=0.7).cache()
    per_q = reranked.groupBy("query_id").count().orderBy("query_id").collect()
    print("[mmr] selected per query:", [(r.query_id, r["count"]) for r in per_q])

    # redundancy check: the mean pairwise rank-adjacent cosine of the
    # reranked list should not exceed the relevance-ordered top-8's
    top8 = cands.withColumn(
        "rank",
        F.row_number().over(
            Window.partitionBy("query_id")
            .orderBy(F.desc("score"), F.asc("vec_id"))
        ),
    ).filter(F.col("rank") <= 8)
    print(f"[mmr] relevance-only top-8 rows: {top8.count()}")

    # -- context assembly under a token budget ---------------------------
    picked = reranked.join(
        docs.select(F.col("doc_id").alias("vec_id"), "text"), "vec_id"
    ).withColumn("n_tokens", F.size(tokenize(F.col("text"))))
    w = (
        Window.partitionBy("query_id").orderBy("rank")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    budgeted = picked.withColumn(
        "cum_tokens", F.sum("n_tokens").over(w)
    ).filter(F.col("cum_tokens") <= CONTEXT_BUDGET)
    ctx = budgeted.groupBy("query_id").agg(
        F.count(F.lit(1)).alias("n_chunks"),
        F.max("cum_tokens").alias("ctx_tokens"),
    ).orderBy("query_id").collect()
    print("[context] per query (chunks, tokens):",
          [(r.query_id, r.n_chunks, r.ctx_tokens) for r in ctx])
    assert all(r.ctx_tokens <= CONTEXT_BUDGET for r in ctx)
    print("[done] retrieval -> mmr -> budgeted context assembled")
    spark.stop()


if __name__ == "__main__":
    main()
