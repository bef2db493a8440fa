"""Inverted-index search (operators/postings.py): index-based results
must equal the corpus-scan path exactly."""

from __future__ import annotations

from pyspark.sql import functions as F

from providenciasbigdata_spark.compat.documents import rulings_view, search_text
from providenciasbigdata_spark.io import load_table
from providenciasbigdata_spark.operators.postings import (
    build_postings,
    search_and,
    search_or,
)

SF = "/root/testdata/sf0.001"


def _rulings(spark):
    return rulings_view(load_table(spark, SF, "documents"))


def test_or_search_equals_scan(spark):
    docs = _rulings(spark)
    idx = build_postings(docs)
    via_index = {r["doc_id"] for r in search_or(idx, ["merge", "window"]).collect()}
    via_scan = {r["doc_id"] for r in search_text(docs, "merge window").collect()}
    assert via_index == via_scan and via_index


def test_and_search_is_intersection_of_or_searches(spark):
    docs = _rulings(spark)
    idx = build_postings(docs)
    both = {r["doc_id"] for r in search_and(idx, ["merge", "window"]).collect()}
    only_a = {r["doc_id"] for r in search_or(idx, ["merge"]).collect()}
    only_b = {r["doc_id"] for r in search_or(idx, ["window"]).collect()}
    assert both == (only_a & only_b) and both


def test_and_duplicate_terms_collapse(spark):
    idx = build_postings(_rulings(spark))
    a = {r["doc_id"] for r in search_and(idx, ["merge", "merge"]).collect()}
    b = {r["doc_id"] for r in search_or(idx, ["merge"]).collect()}
    assert a == b


def test_max_df_drops_stopword_like_terms(spark):
    docs = _rulings(spark)
    full = build_postings(docs)
    pruned = build_postings(docs, max_df=0.5)
    n_docs = docs.count()
    kept_max = pruned.agg(F.max("df")).first()[0]
    assert kept_max <= n_docs * 0.5
    assert pruned.count() < full.count()


def test_postings_sorted_and_distinct(spark):
    idx = build_postings(_rulings(spark))
    bad = idx.where(
        (F.col("postings") != F.array_sort("postings"))
        | (F.size("postings") != F.size(F.array_distinct("postings")))
        | (F.size("postings") != F.col("df"))
    )
    assert bad.count() == 0


def test_bm25_ranks_rarer_terms_higher(spark):
    """A doc matching a rare term must outscore a doc with the same tf
    of a common term (idf monotonicity), and k bounds the result."""
    from providenciasbigdata_spark.operators.postings import (
        bm25_search,
        build_term_freqs,
    )

    docs = _rulings(spark)
    tfs = build_term_freqs(docs)
    # pick a rare and a common token from the corpus itself
    freqs = (
        tfs.groupBy("token")
        .agg(F.countDistinct("doc_id").alias("df"))
        .orderBy("df")
        .collect()
    )
    rare = freqs[0]["token"]
    common = freqs[-1]["token"]
    assert freqs[0]["df"] < freqs[-1]["df"]
    top = bm25_search(tfs, [rare, common], k=5).collect()
    assert len(top) <= 5
    # the top hit must contain the rare term
    rare_docs = {r["doc_id"] for r in tfs.where(F.col("token") == rare).collect()}
    assert top[0]["doc_id"] in rare_docs
