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


def test_blocked_pairwise_matches_broadcast_matmul(spark, sf_dir):
    """pairwise_cosine_blocked (distributed tiles, no driver matrix)
    must produce exactly the pairs of pairwise_cosine_matmul (broadcast
    path) — same ids, same rounded cosines, both directions."""
    emb = load_table(spark, sf_dir, "embeddings").cache()
    bcast = sorted(
        (r.left_id, r.right_id, r.cosine)
        for r in similarity.pairwise_cosine_matmul(emb, threshold=30.0, scale=100.0).collect()
    )
    blocked = sorted(
        (r.left_id, r.right_id, r.cosine)
        for r in similarity.pairwise_cosine_blocked(
            emb, threshold=30.0, scale=100.0, block_size=64
        ).collect()
    )
    assert blocked == bcast and len(blocked) > 0
    emb.unpersist()


def test_blocked_pairwise_single_block_degenerate(spark, sf_dir):
    """n_blocks=1 (everything in one diagonal tile) still honors the
    left != right contract and emits each ordered pair exactly once."""
    emb = load_table(spark, sf_dir, "embeddings").limit(30)
    rows = similarity.pairwise_cosine_blocked(
        emb, threshold=-101.0, scale=100.0, n_blocks=1
    ).collect()
    pairs = [(r.left_id, r.right_id) for r in rows]
    assert len(pairs) == len(set(pairs)) == 30 * 29
    assert all(l != r for l, r in pairs)


def test_kmeans_converges_and_partitions(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings").cache()
    C, iters = similarity.kmeans_centroids(emb, n_clusters=8, max_iter=10)
    assert C.shape == (8, 64) and 1 <= iters <= 10
    import numpy as np

    assert np.allclose(np.linalg.norm(C, axis=1), 1.0)  # spherical
    assigned = similarity.ivf_assign(emb, C)
    n = emb.count()
    assert assigned.count() == n
    sizes = {r.cluster: r.n for r in assigned.groupBy("cluster").agg(
        F.count("*").alias("n")).collect()}
    assert sum(sizes.values()) == n and len(sizes) >= 2
    emb.unpersist()


def test_ivf_topk_recall_vs_brute(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings").cache()
    qvec = emb.filter(F.col("vec_id") == 0).first().embedding
    brute = {r.vec_id for r in similarity.brute_force_topk(emb, qvec, k=10).collect()}
    C, _ = similarity.kmeans_centroids(emb, n_clusters=16, max_iter=5)
    ann = {r.vec_id for r in similarity.ivf_topk(emb, qvec, C, k=10, nprobe=4).collect()}
    recall = len(brute & ann) / len(brute)
    assert recall >= 0.6, f"IVF recall {recall} too low at nprobe=4/16"
    # probing every list is exhaustive => exact
    exact = {r.vec_id for r in similarity.ivf_topk(emb, qvec, C, k=10, nprobe=16).collect()}
    assert exact == brute
    emb.unpersist()


def test_srp_buckets_deterministic(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings").limit(20)
    b1 = sorted((r.id, r.table, r.bucket) for r in similarity.srp_buckets(emb, 64).collect())
    b2 = sorted((r.id, r.table, r.bucket) for r in similarity.srp_buckets(emb, 64).collect())
    assert b1 == b2
