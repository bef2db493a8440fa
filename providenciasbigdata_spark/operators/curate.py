"""Training-data curation pipeline (the C4/RefinedWeb shape): language
filter -> quality floor -> exact dedup -> (optional) fuzzy dedup, as
one composable operator. Each stage is a pure DataFrame transform; the
whole pipeline is one lazy plan — Catalyst pushes the cheap predicates
(lang, quality) below the dedup shuffles, so the expensive stages see
only surviving rows.

Scale notes: stage order matters at 100 TB — predicate stages are
map-only and cut volume before the first shuffle (exact dedup's
groupBy); fuzzy dedup (LSH + connected components) runs last on the
smallest frame. ``report=True`` adds a per-stage row-count audit
(single extra action per stage boundary, driver holds 4 longs).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from providenciasbigdata_spark.functions.text import lang_id, quality_score, tokenize
from providenciasbigdata_spark.operators import dedup


def curate(
    docs: DataFrame,
    languages: list[str] | None = None,
    min_quality: float = 0.5,
    fuzzy: bool = False,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Filter + dedup a documents frame for training use.

    Stages: (1) predicted language in ``languages`` (skip if None),
    (2) quality_score >= min_quality (nulls fail), (3) exact content
    dedup (min-id survivor), (4) fuzzy near-dup clusters if ``fuzzy``.

    Returns the surviving rows with ``lang_pred`` and ``quality``
    attached (audit columns; drop them at the sink if unwanted).
    """
    toks = tokenize(F.col(text_col))
    staged = docs.withColumn("lang_pred", lang_id(toks)).withColumn(
        "quality", quality_score(F.col(text_col), toks)
    )
    if languages is not None:
        staged = staged.filter(F.col("lang_pred").isin(languages))
    staged = staged.filter(F.col("quality") >= min_quality)
    staged = dedup.dedup_exact(staged, text_col=text_col, id_col=id_col).drop(
        "content_hash"
    )
    if fuzzy:
        staged = dedup.dedup_near(staged, id_col=id_col, text_col=text_col)
    return staged


def curate_report(docs: DataFrame, **kwargs) -> dict[str, int]:
    """Per-stage survivor counts (4 actions; use on samples or accept
    the extra passes — production pipelines log these per batch)."""
    base = docs.count()
    langs = kwargs.get("languages")
    min_q = kwargs.get("min_quality", 0.5)
    toks = tokenize(F.col(kwargs.get("text_col", "text")))
    staged = docs.withColumn("lang_pred", lang_id(toks)).withColumn(
        "quality", quality_score(F.col(kwargs.get("text_col", "text")), toks)
    )
    after_lang = (
        staged.filter(F.col("lang_pred").isin(langs)).count() if langs else base
    )
    after_q = (
        staged.filter(F.col("lang_pred").isin(langs) if langs else F.lit(True))
        .filter(F.col("quality") >= min_q)
        .count()
    )
    final = curate(docs, **kwargs).count()
    return {
        "input": base,
        "after_language": after_lang,
        "after_quality": after_q,
        "final": final,
    }
