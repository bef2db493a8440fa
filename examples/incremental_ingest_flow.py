"""Rolling-corpus ingest: the INCREMENTAL dedup/index family as one
documented refresh recipe.

The batch pipeline (examples/training_pipeline_flow.py) answers "curate
this corpus once"; a production corpus instead GROWS — every refresh
lands a new batch that must be deduped against everything already
resident WITHOUT recomputing the resident side. The engine keeps one
incremental twin per dedup/index family, each anti-joining or
equi-joining the new batch against a compact INDEX (hashes, distinct
paragraphs, signatures, fingerprints, centroids) rather than the corpus:

    family      index (bytes/doc)              incremental op
    exact       content_hash (16 B)            dedup_exact_incremental
    paragraph   distinct paragraph strings     dedup_paragraphs_incremental
    MinHash     64-long signature (~0.5%)      minhash_near_dups_incremental
    SimHash     64-bit fingerprint (8 B)       simhash_incremental
    ANN (IVF)   k centroids + partitioned dirs ivf_index_append

Every step below ASSERTS batch-then-increment == full-rebuild (or the
documented cross-pair restriction), so this file is both the recipe and
its proof; tests/test_examples.py runs it in CI on two successive
batches. Usage:

    python examples/incremental_ingest_flow.py [sf_dir]
"""

from __future__ import annotations

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from providenciasbigdata_spark.io import load_table
from providenciasbigdata_spark.operators import dedup, similarity
from providenciasbigdata_spark.operators.dedup import content_fingerprint


def run(spark, sf_dir: str, work_dir: str) -> None:
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    split = 300
    batch0 = docs.filter(F.col("doc_id") < split)    # resident corpus
    batch1 = docs.filter(F.col("doc_id") >= split)   # the refresh

    # -- 1. exact dedup: hash index, not corpus ---------------------------
    resident = dedup.dedup_exact(batch0)
    hash_index = resident.select(
        content_fingerprint(F.col("text")).alias("content_hash")
    )
    fresh = dedup.dedup_exact_incremental(batch1, hash_index)
    combined_ids = {r.doc_id for r in resident.select("doc_id").collect()} | {
        r.doc_id for r in fresh.select("doc_id").collect()
    }
    full_ids = {
        r.doc_id
        for r in dedup.dedup_exact(batch0.unionByName(batch1))
        .select("doc_id")
        .collect()
    }
    assert combined_ids == full_ids, "exact: increment != rebuild"
    print(f"[1] exact: resident {resident.count()} + fresh {fresh.count()} "
          f"== rebuild {len(full_ids)}")

    # -- 2. paragraph dedup + rewrite: distinct-paragraph index -----------
    para_index = dedup.paragraph_index(batch0, chunk_tokens=20)
    inc = dedup.dedup_paragraphs_incremental(
        batch1, para_index, chunk_tokens=20
    )
    full = dedup.dedup_paragraphs(
        batch0.unionByName(batch1), chunk_tokens=20
    ).filter(F.col("doc_id") >= split)
    mism = (
        inc.alias("i")
        .join(full.alias("f"), "doc_id", "full_outer")
        .filter(
            ~F.col("i.new_text").eqNullSafe(F.col("f.new_text"))
            | ~F.col("i.kept_chunks").eqNullSafe(F.col("f.kept_chunks"))
        )
        .count()
    )
    assert mism == 0, "paragraph: increment != rebuild"
    kept = inc.agg(F.sum("kept_chunks")).first()[0]
    print(f"[2] paragraph: batch rewrite == rebuild restricted to the "
          f"batch ({kept} paragraphs kept)")

    # -- 3. MinHash near-dups: stored signature index ---------------------
    sig_index = dedup.minhash_signature(batch0)
    cross = dedup.minhash_near_dups_incremental(batch1, sig_index)
    n_cross = cross.count()
    print(f"[3] minhash: {n_cross} batch-vs-resident candidate pairs "
          f"(signature index only; corpus text untouched)")

    # -- 4. SimHash: fingerprint index ------------------------------------
    fps = dedup.simhash(docs).cache()
    # persisted indexes carry their hash-family stamp; SimHash is past
    # v1 so the reader rejects unstamped indexes outright
    idx_fps = dedup.stamp_family(fps.filter(F.col("id") < split), dedup.SIMHASH_FAMILY)
    new_fps = fps.filter(F.col("id") >= split)
    inc_pairs = {
        (r.batch_id, r.index_id)
        for r in dedup.simhash_incremental(new_fps, idx_fps).collect()
    }
    full_pairs = {
        (max(r.left_id, r.right_id), min(r.left_id, r.right_id))
        for r in dedup.simhash_near_dups(fps).collect()
        if (r.left_id < split) != (r.right_id < split)
    }
    assert inc_pairs == full_pairs, "simhash: cross pairs diverge"
    print(f"[4] simhash: incremental == full-rebuild cross pairs "
          f"({len(inc_pairs)} pairs)")
    fps.unpersist()

    # -- 5. IVF ANN index: append without retraining ----------------------
    emb = load_table(spark, sf_dir, "embeddings")
    emb0 = emb.filter(F.col("vec_id") < 200)
    emb1 = emb.filter(F.col("vec_id") >= 200)
    idx_dir = os.path.join(work_dir, "ivf")
    idx = similarity.build_ivf_index(emb0, idx_dir, n_clusters=8, max_iter=3)
    similarity.ivf_index_append(idx, emb1)
    qvec = [float(x) for x in emb.filter(F.col("vec_id") == 5).first().embedding]
    got = similarity.ivf_index_topk(idx, qvec, k=5, nprobe=8).collect()
    want = similarity.brute_force_topk(emb, qvec, k=5).collect()
    assert [(r.vec_id, r.score) for r in got] == [
        (r.vec_id, r.score) for r in want
    ], "ivf: appended index probe-all != brute force over the union"
    print(f"[5] ivf: appended index (no retrain) probe-all == brute force "
          f"top-5 over the grown corpus")


def main() -> None:
    from providenciasbigdata_spark.session import get_spark

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark(
        app_name="incremental-ingest", master="local[4]", shuffle_partitions=4
    )
    with tempfile.TemporaryDirectory(prefix="pbd_ingest_") as wd:
        run(spark, sf_dir, wd)
    spark.stop()


if __name__ == "__main__":
    main()
