"""The reference's search box, rebuilt as a SERVICE: index once, then
answer every query shape Mongo's ``$text`` box accepts — and the ones a
search product grows into — from prebuilt indexes with zero corpus
scans at query time.

Stages: build token + positional + BM25 indexes -> boolean OR/AND ->
quoted phrase (positional) -> prefix -> fuzzy (Levenshtein dictionary
expansion) -> BM25 ranked top-k -> the same queries through the literal
MQL surface ($text / $meta textScore). Usage:

    python examples/search_service_flow.py [sf_dir]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from providenciasbigdata_spark.compat.documents import rulings_view
from providenciasbigdata_spark.compat.ir import mql_find
from providenciasbigdata_spark.io import load_table
from providenciasbigdata_spark.operators.postings import (
    BM25Index,
    build_bm25_index,
    build_positional_postings,
    bm25_search,
    build_postings,
    search_and,
    search_fuzzy,
    search_or,
    search_phrase_indexed,
    search_prefix,
)
from providenciasbigdata_spark.session import get_spark


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark(app_name="search-service", master="local[4]", shuffle_partitions=4)

    rulings = rulings_view(load_table(spark, sf_dir, "documents"))

    # -- index build (once; at scale these persist bucketed-by-token) --
    idx = build_postings(rulings).cache()
    pos = build_positional_postings(rulings).cache()
    bm25: BM25Index = build_bm25_index(rulings)
    print(f"[index] {idx.count()} dictionary terms, "
          f"{pos.count()} positional postings rows")

    # -- boolean search from the index (B1 OR contract + AND extension) --
    n_or = search_or(idx, ["merge", "window"]).count()
    n_and = search_and(idx, ["merge", "window"]).count()
    print(f"[bool] merge OR window: {n_or} docs; AND: {n_and} docs")

    # -- phrase from the POSITIONAL index (no corpus scan) --------------
    n_phrase = search_phrase_indexed(pos, "table hash").count()
    print(f'[phrase] "table hash": {n_phrase} docs')

    # -- prefix + fuzzy (dictionary-sized work) -------------------------
    n_prefix = search_prefix(idx, "merg").count()
    fuzzy = search_fuzzy(idx, ["mergw"], max_edits=1)
    print(f"[prefix] merg*: {n_prefix} docs; [fuzzy] 'mergw'~1: {fuzzy.count()} docs")

    # -- BM25 ranked top-5 ----------------------------------------------
    top = bm25_search(bm25, ["merge", "shuffle"], k=5).collect()
    print("[bm25] top-5:", [(r.doc_id, round(r.score, 3)) for r in top])

    # -- the SAME box through the literal Mongo surface -----------------
    hits = mql_find(rulings, {"$text": {"$search": '"table hash" -error'}})
    ranked = mql_find(
        rulings,
        {"$text": {"$search": "merge window shuffle"}},
        projection={"providencia": 1, "score": {"$meta": "textScore"}},
        sort=[("score", {"$meta": "textScore"}), ("providencia", 1)],
        limit=5,
    ).collect()
    print(f"[mql] phrase+negation: {hits.count()} docs; "
          f"$meta ranked top-5: {[(r.providencia, r.score) for r in ranked]}")

    spark.stop()


if __name__ == "__main__":
    main()
