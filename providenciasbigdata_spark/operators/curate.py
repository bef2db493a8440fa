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

from functools import reduce

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


# the eight stop words Gopher's "stop word" rule checks for (Rae et al.
# 2021, table A1); presence of >= 2 DISTINCT ones is our pinned reading
# ("contain at least two of the following stop words")
GOPHER_STOPWORDS = ["the", "be", "to", "of", "and", "that", "have", "with"]

# Both patterns are written in the Java ∩ RE2 dialect (the PII-pattern
# rule, functions/text.py): \xhh-class escapes and literal Unicode
# chars parse identically in Spark's Java regex and DuckDB's RE2.
ENCODING_CONTROL_PATTERN = r"[\x00-\x08\x0B\x0C\x0E-\x1F\x7F]"
# classic UTF-8-bytes-decoded-as-Latin-1 artifacts: 'Ã'+U+0080..00FF
# (Ã©/Ã¡/Ã±...), 'â€' (E2 80 xx punctuation), 'Â'+U+00A0..00BF (Â«, Â°)
ENCODING_MOJIBAKE_PATTERN = (
    "\u00c3[\u0080-\u00ff]|\u00e2[\u0080\u20ac]|\u00c2[\u00a0-\u00bf]"
)


def encoding_screen(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Encoding-health screen — the curation gate that catches broken
    ingestion BEFORE content-quality rules run (a crawl shard decoded
    with the wrong charset sails through length/stopword heuristics
    while being garbage): U+FFFD replacement characters (the decoder
    already gave up), raw control characters (binary bleed; tab/CR/LF
    exempt), and double-encoding mojibake marker pairs. All three are
    exact integer counts (replace-diff and regexp matches), so the
    screen is map-only, engine-exact, and value-hash-checkable — no
    floats anywhere.

    Appends (gopher_quality_flags style, so the screens compose):
    n_replacement, n_control, n_mojibake, pass_encoding.
    """
    t = F.coalesce(F.col(text_col), F.lit(""))
    n_repl = (
        F.length(t) - F.length(F.replace(t, F.lit("\ufffd"), F.lit("")))
    ).cast("long")
    n_ctrl = F.regexp_count(t, F.lit(ENCODING_CONTROL_PATTERN)).cast("long")
    n_moji = F.regexp_count(t, F.lit(ENCODING_MOJIBAKE_PATTERN)).cast("long")
    return docs.select(
        "*",
        n_repl.alias("n_replacement"),
        n_ctrl.alias("n_control"),
        n_moji.alias("n_mojibake"),
        ((n_repl == 0) & (n_ctrl == 0) & (n_moji == 0)).alias("pass_encoding"),
    )


def gopher_quality_flags(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """The Gopher quality-filter rule bundle (Rae et al. 2021 §A1.1 —
    the heuristic gate most open-data pipelines start from), computed
    with EXACT integer arithmetic so every flag is value-hash
    verifiable cross-engine: each ratio bound becomes a cross-
    multiplied integer comparison (``words/lines < 0.9`` is
    ``10*bullets < 9*lines``), never a float division.

    Per-document boolean flags appended:

    - ``flag_word_count``: 50 <= whitespace-word count <= 100_000
    - ``flag_mean_word_len``: mean word length in [3, 10] (as
      ``3*n_words <= non-ws chars <= 10*n_words``)
    - ``flag_bullet``: < 90% of non-blank lines start with a bullet
      ('-', '*', '•'); vacuously true with no lines
    - ``flag_ellipsis``: < 30% of non-blank lines end with '...'/'…'
    - ``flag_symbol``: (# count + non-overlapping '...' count) /
      n_words < 0.1
    - ``flag_alpha``: > 80% of words contain an alphabetic character
    - ``flag_stopwords``: >= 2 distinct GOPHER_STOPWORDS present
    - ``pass_gopher``: AND of all seven

    Everything is one Catalyst projection over one scan — map-only, no
    UDF, no shuffle; at 100 TB this is the same cost as reading the
    text column once. NULL text behaves as empty (fails word count,
    so ``pass_gopher`` is false)."""
    t = F.coalesce(F.col(text_col), F.lit(""))
    words = F.filter(F.split(t, r"\s+"), lambda w: w != F.lit(""))
    n_words = F.size(words)
    non_ws = F.length(F.regexp_replace(t, r"\s", ""))
    lines = F.filter(
        F.split(t, "\n"), lambda ln: F.length(F.trim(ln)) > F.lit(0)
    )
    n_lines = F.size(lines)
    n_bullet = F.size(
        F.filter(
            lines,
            lambda ln: F.startswith(F.ltrim(ln), F.lit("-"))
            | F.startswith(F.ltrim(ln), F.lit("*"))
            | F.startswith(F.ltrim(ln), F.lit("•")),
        )
    )
    n_ellipsis = F.size(
        F.filter(
            lines,
            lambda ln: F.endswith(F.rtrim(ln), F.lit("..."))
            | F.endswith(F.rtrim(ln), F.lit("…")),
        )
    )
    n_hash = F.length(t) - F.length(F.replace(t, F.lit("#"), F.lit("")))
    n_dots = (
        (F.length(t) - F.length(F.replace(t, F.lit("..."), F.lit("")))) / F.lit(3)
    ).cast("long")
    n_alpha = F.size(F.filter(words, lambda w: w.rlike("[A-Za-z]")))
    stop_hits = F.size(
        F.array_intersect(
            F.array_distinct(F.transform(words, F.lower)),
            F.array(*[F.lit(w) for w in GOPHER_STOPWORDS]),
        )
    )
    flags = {
        "flag_word_count": (n_words >= 50) & (n_words <= 100_000),
        "flag_mean_word_len": (n_words > 0)
        & (non_ws >= 3 * n_words)
        & (non_ws <= 10 * n_words),
        "flag_bullet": (n_lines == 0) | (10 * n_bullet < 9 * n_lines),
        "flag_ellipsis": (n_lines == 0) | (10 * n_ellipsis < 3 * n_lines),
        "flag_symbol": 10 * (n_hash + n_dots) < n_words,
        "flag_alpha": 5 * n_alpha > 4 * n_words,
        "flag_stopwords": stop_hits >= 2,
    }
    out = docs.withColumns(flags)
    return out.withColumn(
        "pass_gopher", reduce(lambda a, b: a & b, [F.col(c) for c in flags])
    )
