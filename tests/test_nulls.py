"""Null/degenerate-input behavior pins: at 100 TB there WILL be null,
empty and sub-ngram documents in every batch; none of the text/dedup
operators may crash or silently drop the rest of the frame on them.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from providenciasbigdata_spark.compat.documents import search_text, tokenize
from providenciasbigdata_spark.functions.text import (
    content_fingerprint,
    quality_score,
    shingles,
    ws_token_count,
)
from providenciasbigdata_spark.operators import dedup


def _docs(spark):
    rows = [
        (1, None),
        (2, ""),
        (3, "   "),
        (4, "one two"),  # fewer tokens than ngram=3
        (5, "normal document with several words inside it"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_tokenize_degenerate_inputs(spark):
    out = _docs(spark).select(
        "doc_id", tokenize(F.col("text")).alias("toks")
    ).collect()
    got = {r.doc_id: r.toks for r in out}
    assert got[1] is None  # null propagates (never fabricate tokens)
    assert got[2] == [] and got[3] == []
    assert got[4] == ["one", "two"]


def test_shingles_degenerate_inputs(spark):
    out = _docs(spark).select(
        "doc_id", shingles(tokenize(F.col("text")), 3).alias("sh")
    ).collect()
    got = {r.doc_id: r.sh for r in out}
    assert got[1] is None and got[2] == [] and got[4] == []
    assert len(got[5]) > 0


def test_quality_and_counts_never_crash(spark):
    out = _docs(spark).select(
        "doc_id",
        ws_token_count(F.col("text")).alias("n"),
        quality_score(F.col("text"), tokenize(F.col("text"))).alias("q"),
    ).collect()
    got = {r.doc_id: (r.n, r.q) for r in out}
    # empty text: length/word scores 0, punct/digit penalty credits
    # still granted -> 0.2 (the formula's defined floor for non-null);
    # whitespace-only counts its chars toward length (3/500*0.4)
    assert got[2] == (0, 0.2) and got[3] == (0, 0.2024)
    assert got[1][0] is None and got[1][1] is None  # null in, null out
    assert got[5][1] > 0


def test_dedup_exact_null_and_empty_texts(spark):
    # null-text docs share fingerprint NULL -> window groups them; the
    # min-id survivor rule keeps exactly one null doc and one ""-doc
    # ("" and "   " normalize equal). Pinned, documented behavior.
    out = dedup.dedup_exact(_docs(spark)).select("doc_id").collect()
    assert sorted(r.doc_id for r in out) == [1, 2, 4, 5]
    fp = _docs(spark).select(content_fingerprint(F.col("text")).alias("h")).collect()
    assert fp[0].h is None


def test_minhash_skips_sub_ngram_docs(spark):
    # docs with no 3-shingles produce no signature rows and no pairs —
    # they can't be near-dups by construction, and must not crash
    sigs = dedup.minhash_signature(_docs(spark), k=16, ngram=3)
    assert sigs.filter(F.col("id").isin(1, 2, 3, 4)).count() == 0
    pairs = dedup.minhash_near_dups(_docs(spark), bands=4, rows_per_band=4)
    assert pairs.count() == 0


def test_search_text_null_rows_never_match(spark):
    hits = search_text(
        _docs(spark).withColumn("tokens", tokenize(F.col("text"))), "normal"
    )
    assert [r.doc_id for r in hits.collect()] == [5]


def test_dedup_paragraphs_null_text(spark):
    from providenciasbigdata_spark.operators.dedup import dedup_paragraphs

    docs = spark.createDataFrame(
        [(1, None), (2, " ".join(f"w{i}" for i in range(25)))],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in dedup_paragraphs(docs, chunk_tokens=20).collect()}
    # null text: no chunks derivable (n_chunks mirrors the null token
    # array on both engines), nothing kept, empty rewrite
    assert out[1].kept_chunks == 0 and out[1].new_text == ""
    assert out[2].n_chunks == 2 and out[2].kept_chunks == 2


def test_weighted_sample_all_nonpositive_weights_empty(spark):
    from pyspark.sql import functions as F

    from providenciasbigdata_spark.operators.mix import weighted_sample_topk

    df = spark.range(5).select(F.col("id").alias("doc_id"), F.lit(0.0).alias("w"))
    assert weighted_sample_topk(df, "w", k=3).count() == 0


def test_feature_hashing_null_and_empty_docs(spark):
    from providenciasbigdata_spark.queries.pipeline import q_feature_hashing  # noqa: F401
    # covered end-to-end by the oracle (LEFT JOIN zero-fill on both
    # engines); here: the underlying expressions tolerate null text
    from providenciasbigdata_spark.compat.documents import tokenize
    from pyspark.sql import functions as F

    df = spark.createDataFrame([(1, None), (2, "")], "doc_id long, text string")
    toks = df.select("doc_id", F.explode_outer(tokenize(F.col("text"))).alias("tok"))
    assert toks.count() == 2  # one NULL-token row per degenerate doc


def test_new_operator_input_guards(spark):
    import pytest as _pytest

    from providenciasbigdata_spark.operators.dedup import dedup_paragraphs
    from providenciasbigdata_spark.operators.mix import weighted_sample_topk
    from providenciasbigdata_spark.operators.bloomjoin import bloom_build

    df = spark.createDataFrame([(1, "a b c")], "doc_id long, text string")
    with _pytest.raises(ValueError, match="chunk_tokens"):
        dedup_paragraphs(df, chunk_tokens=0)
    with _pytest.raises(ValueError, match="k must be positive"):
        weighted_sample_topk(df.withColumn("w", df.doc_id), "w", k=0)
    with _pytest.raises(ValueError, match="multiple of 64"):
        bloom_build(df, "doc_id", n_bits=100)
