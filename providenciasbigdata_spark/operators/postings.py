"""Inverted index (posting lists) for keyword search at corpus scale.

The reference's ``$text`` predicate leans on MongoDB's server-side text
index (SURVEY.md B1 — reference streamlit_app.py:147); our query-time
equivalent (`compat.documents.search_text`) scans the tokenized corpus.
That scan is the right plan for one-off queries, but a search SERVICE
over 100 TB wants the index materialized once and every query answered
from it:

- ``build_postings``: one explode + one hash aggregate -> (token,
  postings: sorted doc ids, df). The single shuffle-the-corpus moment;
  written bucketed by token, each later lookup touches one bucket.
- ``search_or`` / ``search_and``: OR = union of the matched terms'
  postings (explode + distinct); AND = posting intersection via
  count-of-terms (a doc qualifies when it appears under every term) —
  no corpus scan, the join is against the tiny matched-token slice.

Degenerate-key note: stop-word-like tokens produce postings arrays as
long as the corpus. The index is still correct — but at 100 TB those
rows should be chunked (split one token's postings across rows) or the
head terms dropped at build time; ``max_df`` implements the standard
drop (a term in more than max_df of all docs carries ~no selectivity).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def build_postings(
    docs: DataFrame,
    id_col: str = "doc_id",
    tokens_col: str = "tokens",
    max_df: float | None = None,
) -> DataFrame:
    """Materialize the inverted index from a tokenized corpus.

    Output: (token, postings array<long> sorted, df bigint).
    ``max_df``: drop terms whose document frequency exceeds this
    fraction of the corpus (None keeps everything).
    """
    pairs = (
        docs.select(F.col(id_col).alias("doc_id"), F.explode(tokens_col).alias("token"))
        .where(F.col("token") != "")
        .distinct()
    )
    postings = pairs.groupBy("token").agg(
        F.sort_array(F.collect_list("doc_id")).alias("postings"),
        F.count("*").cast("bigint").alias("df"),
    )
    if max_df is not None:
        n_docs = docs.select(id_col).distinct().count()
        postings = postings.where(F.col("df") <= int(max_df * n_docs))
    return postings


def _matched(postings: DataFrame, terms: list[str]) -> DataFrame:
    term_lit: Column = F.array(*[F.lit(t) for t in terms])
    return postings.where(F.array_contains(term_lit, F.col("token")))


def search_or(postings: DataFrame, terms: list[str]) -> DataFrame:
    """Docs containing ANY term (the B1 OR-of-terms contract), from the
    index alone. Output: (doc_id)."""
    return (
        _matched(postings, terms)
        .select(F.explode("postings").alias("doc_id"))
        .distinct()
    )


def search_and(postings: DataFrame, terms: list[str]) -> DataFrame:
    """Docs containing ALL terms: posting intersection by term count.
    Output: (doc_id)."""
    n = len(set(terms))
    return (
        _matched(postings, list(set(terms)))
        .select("token", F.explode("postings").alias("doc_id"))
        .groupBy("doc_id")
        .agg(F.countDistinct("token").alias("nt"))
        .where(F.col("nt") == n)
        .select("doc_id")
    )
