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
