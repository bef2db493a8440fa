"""Unit tests for the text-analysis function library."""

from __future__ import annotations

from pyspark.sql import functions as F

from providenciasbigdata_spark.functions import text as tx


def _one(spark, s: str):
    return spark.createDataFrame([(s,)], "text string")


def test_token_counts(spark):
    df = _one(spark, "Hello, world! 42 foo-bar")
    row = df.select(
        tx.ws_token_count(F.col("text")).alias("ws"),
        tx.bpe_ish_token_count(F.col("text")).alias("bpe"),
    ).first()
    assert row.ws == 4
    # pieces: hello , world ! 42 foo - bar => 8
    assert row.bpe == 8
    assert _one(spark, "   ").select(tx.ws_token_count(F.col("text")).alias("n")).first().n == 0


def test_lang_id_hand_sentences(spark):
    cases = {
        "the cat and the dog of a house": "en",
        "el perro y la casa de los gatos": "es",
        "der hund und die katze ist nicht": "de",
        "xyzzy qwerty asdf": "und",
    }
    for sent, want in cases.items():
        got = (
            _one(spark, sent)
            .select(tx.lang_id(tx.tokenize(F.col("text"))).alias("lang"))
            .first()
            .lang
        )
        assert got == want, f"{sent!r}: got {got}, want {want}"


def test_quality_score_ordering(spark):
    rich = "this is a reasonably long and wordy document " * 12
    poor = "!!! ??? ,,, 123 456 !!!"
    df = spark.createDataFrame([(1, rich), (2, poor)], "id int, text string")
    rows = {
        r.id: r.q
        for r in df.select(
            "id", tx.quality_score(F.col("text"), tx.tokenize(F.col("text"))).alias("q")
        ).collect()
    }
    assert 0 <= rows[2] < rows[1] <= 1


def test_content_fingerprint_normalization(spark):
    df = spark.createDataFrame(
        [(1, "Hello   World"), (2, "  hello world "), (3, "héllo wörld"), (4, "different")],
        "id int, text string",
    )
    fps = {r.id: r.fp for r in df.select("id", tx.content_fingerprint(F.col("text")).alias("fp")).collect()}
    assert fps[1] == fps[2] == fps[3] != fps[4]


def test_shingles_and_rolling_hashes(spark):
    df = _one(spark, "a b c d")
    row = df.select(
        tx.shingles(tx.tokenize(F.col("text")), 2).alias("sh"),
        tx.rolling_hashes(tx.tokenize(F.col("text")), 2).alias("rh"),
    ).first()
    assert row.sh == ["a b", "b c", "c d"]
    assert len(row.rh) == 3 and len(set(row.rh)) == 3
    # shorter than n => empty
    short = _one(spark, "a").select(tx.shingles(tx.tokenize(F.col("text")), 3).alias("sh")).first()
    assert short.sh == []
