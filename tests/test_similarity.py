"""Property tests for similarity search: SRP-LSH recall vs exact
brute force; per-query top-k consistency."""

from __future__ import annotations

from pyspark.sql import functions as F

from providenciasbigdata_spark.io import load_table
from providenciasbigdata_spark.operators import similarity


def test_brute_force_topk_self_first(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    qvec = emb.filter(F.col("vec_id") == 3).first().embedding
    top = similarity.brute_force_topk(emb, qvec, k=5).collect()
    assert top[0].vec_id == 3 and abs(top[0].score - 1.0) < 1e-6
    scores = [r.score for r in top]
    assert scores == sorted(scores, reverse=True)


def test_topk_per_query_matches_brute(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings").cache()
    queries = emb.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    batch = similarity.topk_per_query(emb, queries, k=5).collect()
    for qid in range(3):
        qvec = emb.filter(F.col("vec_id") == qid).first().embedding
        brute = [
            r.vec_id
            for r in similarity.brute_force_topk(emb, qvec, k=6).collect()
            if r.vec_id != qid
        ][:5]
        got = sorted(
            [r for r in batch if r.query_id == qid], key=lambda r: r.rank
        )
        assert [r.vec_id for r in got] == brute
    emb.unpersist()


def test_srp_lsh_topk_recall(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings").cache()
    qvec = emb.filter(F.col("vec_id") == 0).first().embedding
    brute = {r.vec_id for r in similarity.brute_force_topk(emb, qvec, k=10).collect()}
    ann = {
        r.vec_id
        for r in similarity.srp_lsh_topk(
            emb, qvec, dim=64, k=10, n_bits=6, tables=12
        ).collect()
    }
    recall = len(brute & ann) / len(brute)
    assert recall >= 0.5, f"SRP-LSH recall {recall} too low"
    emb.unpersist()


def test_srp_buckets_deterministic(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings").limit(20)
    b1 = sorted((r.id, r.table, r.bucket) for r in similarity.srp_buckets(emb, 64).collect())
    b2 = sorted((r.id, r.table, r.bucket) for r in similarity.srp_buckets(emb, 64).collect())
    assert b1 == b2
