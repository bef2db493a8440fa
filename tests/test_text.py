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


def test_chunk_spans_cover_and_overlap(spark):
    words = " ".join(f"w{i}" for i in range(25))
    df = _one(spark, words).select(tx.tokenize(F.col("text")).alias("toks"))
    chunks = df.select(
        tx.chunk_spans(F.col("toks"), chunk_size=10, overlap=4).alias("c")
    ).first().c
    # 25 tokens, stride 6: chunks start at 0,6,12,18 -> 4 chunks
    assert [c.chunk_id for c in chunks] == [0, 1, 2, 3]
    assert chunks[0].chunk_text.split() == [f"w{i}" for i in range(10)]
    # consecutive chunks share exactly `overlap` tokens
    assert chunks[0].chunk_text.split()[-4:] == chunks[1].chunk_text.split()[:4]
    # tail chunk is short but non-empty and ends at the last token
    assert chunks[-1].n_tokens == 7 and chunks[-1].chunk_text.split()[-1] == "w24"
    # union of chunks covers every token
    covered = {w for c in chunks for w in c.chunk_text.split()}
    assert covered == {f"w{i}" for i in range(25)}


def test_chunk_spans_degenerate(spark):
    # doc shorter than one chunk -> exactly one chunk, itself
    short = _one(spark, "a b c").select(
        tx.chunk_spans(tx.tokenize(F.col("text")), 10, 2).alias("c")
    ).first().c
    assert len(short) == 1 and short[0].chunk_text == "a b c"
    # empty doc -> no chunks
    empty = _one(spark, "").select(
        tx.chunk_spans(tx.tokenize(F.col("text")), 10, 2).alias("c")
    ).first().c
    assert empty == []
    # exact multiple: 12 tokens, size 6, overlap 0 -> 2 full chunks
    exact = _one(spark, " ".join(f"t{i}" for i in range(12))).select(
        tx.chunk_spans(tx.tokenize(F.col("text")), 6, 0).alias("c")
    ).first().c
    assert [c.n_tokens for c in exact] == [6, 6]


def test_lm_perplexity_matches_numpy_reference(spark):
    """The distributed unigram-LM scorer == a pure-numpy reference LM
    trained on the identical token stream (same smoothing, same
    arithmetic shape), doc for doc."""
    import math
    import re
    import unicodedata

    from providenciasbigdata_spark.io import load_table
    from providenciasbigdata_spark.queries.pipeline import q_lm_perplexity

    sf = "/root/testdata/sf0.001"
    got = {
        r.doc_id: (r.n_tokens, r.cross_entropy, r.perplexity)
        for r in q_lm_perplexity(spark, sf).collect()
    }

    def toks(s):
        folded = unicodedata.normalize("NFKD", s.lower())
        folded = "".join(c for c in folded if not unicodedata.combining(c))
        return [t for t in re.split(r"\W+", folded) if t]

    docs = {
        r.doc_id: toks(r.text)
        for r in load_table(spark, sf, "documents").select("doc_id", "text").collect()
    }
    counts: dict[str, int] = {}
    for ts in docs.values():
        for t in ts:
            counts[t] = counts.get(t, 0) + 1
    n, v, alpha = sum(counts.values()), len(counts), 0.5
    denom = n + alpha * (v + 1)
    # same 2^-20 dyadic quantization as q_lm_perplexity: the per-doc
    # log-prob sum is exact, so cross_entropy must match bit-for-bit
    QUANT = float(1 << 20)
    lp = {
        t: math.floor(math.log((c + alpha) / denom) * QUANT + 0.5) / QUANT
        for t, c in counts.items()
    }
    assert got.keys() == {d for d, ts in docs.items() if ts}
    for doc_id, ts in docs.items():
        if not ts:
            continue
        ce = -sum(lp[t] for t in ts) / len(ts)
        nt, gce, gppl = got[doc_id]
        assert nt == len(ts)
        assert gce == round(ce, 6), doc_id
        assert abs(gppl - round(math.exp(ce), 4)) <= 1e-3, doc_id
