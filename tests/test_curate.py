"""Curation pipeline: stage semantics + audit report."""

from __future__ import annotations

from providenciasbigdata_spark.operators.curate import curate, curate_report


def _docs(spark):
    rows = [
        (1, "the quick brown fox jumps over the lazy dog and runs to the hills again"),
        (2, "the quick brown fox jumps over the lazy dog and runs to the hills again"),  # exact dup of 1
        (3, "el gato y el perro de la casa que corren en los campos y las calles"),
        (4, "der hund und die katze ist nicht hier"),  # de -> filtered by language
        (5, "x"),  # quality floor fails
        (6, None),  # null text: quality null -> fails the floor
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_curate_stages(spark):
    out = curate(_docs(spark), languages=["en", "es"], min_quality=0.3)
    got = {r.doc_id: r.lang_pred for r in out.collect()}
    assert got == {1: "en", 3: "es"}  # 2 deduped, 4 wrong lang, 5/6 low quality


def test_curate_no_language_filter(spark):
    # doc 4 scores 0.2936: kept at the lower floor, cut at 0.3
    out = curate(_docs(spark), languages=None, min_quality=0.25)
    assert sorted(r.doc_id for r in out.collect()) == [1, 3, 4]


def test_curate_report_counts(spark):
    rep = curate_report(_docs(spark), languages=["en", "es"], min_quality=0.3)
    assert rep == {"input": 6, "after_language": 3, "after_quality": 3, "final": 2}


def test_gopher_flags_rule_pins(spark):
    """Each Gopher rule trips on a purpose-built document; a healthy
    50+-word prose doc passes the whole gate."""
    from providenciasbigdata_spark.operators.curate import gopher_quality_flags

    good = "the quick brown fox and the lazy dog have agreed that " * 6
    bullets = "\n".join(f"- item {i}" for i in range(10))
    dots = "the " * 60 + "... " * 20
    symbols = "the " * 60 + "# " * 20
    numbers = " ".join(str(i) for i in range(60)) + " the of and that"
    short = "the of and"
    long_words = ("pneumonoultramicroscopics " * 60) + "the of and that"
    rows = [
        (1, good), (2, bullets), (3, dots), (4, symbols),
        (5, numbers), (6, short), (7, long_words), (8, None),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r.doc_id: r for r in gopher_quality_flags(docs).collect()}

    assert got[1].pass_gopher
    assert not got[2].flag_bullet          # 100% bullet lines
    assert not got[3].flag_ellipsis or not got[3].flag_symbol
    assert not got[4].flag_symbol          # '#' ratio 20/80 >= 0.1
    assert not got[5].flag_alpha           # numbers dominate
    assert not got[6].flag_word_count      # 3 words < 50
    assert not got[7].flag_mean_word_len   # mean word length > 10
    assert not got[8].flag_word_count and not got[8].pass_gopher  # null text
    # stopword rule: >= 2 DISTINCT stopwords present
    assert got[1].flag_stopwords and got[5].flag_stopwords
    assert not got[2].flag_stopwords  # bullet items carry none


def test_encoding_screen_pins(spark):
    """Each corruption class counted independently; tab/CR/LF exempt
    from the control rule; clean text passes; NULL text passes (empty);
    input columns are preserved (append contract)."""
    from providenciasbigdata_spark.operators.curate import encoding_screen

    rows = [
        (1, "clean text\twith\r\nwhitespace"),
        (2, "bad � twice � here"),
        (3, "bell \x07 and esc \x1b"),
        (4, "cafÃ© and â€™quote"),
        (5, None),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r.doc_id: r for r in encoding_screen(df).collect()}
    assert got[1].pass_encoding and got[5].pass_encoding
    assert (got[1].n_replacement, got[1].n_control, got[1].n_mojibake) == (0, 0, 0)
    assert got[2].n_replacement == 2 and not got[2].pass_encoding
    assert got[3].n_control == 2 and got[3].n_replacement == 0
    assert got[4].n_mojibake == 2 and not got[4].pass_encoding
    assert got[2].text is not None  # original columns survive
