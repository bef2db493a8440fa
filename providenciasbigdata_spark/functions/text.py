"""Text-analysis functions for training-data pipelines (SURVEY.md C-X5).

Everything here is a pure Catalyst expression over a string/array
column — no UDFs — so the operators vectorize inside whole-stage
codegen and scale linearly with scan throughput. At 100TB these run as
map-only stages fused into the Parquet scan.

The tokenization contract is shared with the compat text search
(compat.documents.tokenize): lowercase, Latin-accent fold, split on
non-word runs, drop empties — pinned so Spark results match the DuckDB
oracle twins (strip_accents + string_split_regex).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from providenciasbigdata_spark.compat.documents import tokenize, unaccent  # noqa: F401

# Tiny per-language stopword lists for the n-gram/stopword language-ID
# heuristic. Deliberately small and SQL-expressible (the oracle uses the
# same literals); a production pipeline would load larger lists as a
# broadcast dimension table.
LANG_STOPWORDS: dict[str, list[str]] = {
    "en": ["the", "a", "of", "and", "to", "is", "in"],
    "es": ["el", "la", "de", "los", "las", "y", "que"],
    "de": ["der", "die", "das", "und", "ist", "nicht"],
    "fr": ["le", "la", "les", "et", "est", "une"],
    "zh": ["de", "shi", "le", "bu", "wo"],
}
# argmax tiebreak precedence (first wins at equal score)
LANG_ORDER = ["en", "es", "de", "fr", "zh"]


def ws_token_count(col: Column) -> Column:
    """Whitespace token count (the cheap estimator)."""
    toks = F.split(F.trim(col), r"\s+")
    return F.when(F.length(F.trim(col)) == 0, F.lit(0)).otherwise(F.size(toks)).cast("long")


def bpe_ish_token_count(col: Column) -> Column:
    """BPE-ish token-count estimate: count word pieces and digit/punct
    runs separately (a GPT-style pre-tokenizer regex, simplified).
    Splitting on the boundaries the regex defines approximates the
    number of merge seeds a BPE tokenizer would start from."""
    pieces = F.regexp_extract_all(F.lower(col), F.lit(r"[a-z]+|[0-9]+|[^a-z0-9\s]"), 0)
    return F.size(pieces).cast("long")


def char_classes(col: Column) -> dict[str, Column]:
    """Character-class tallies used by quality scoring."""
    n = F.length(col)
    alpha = F.length(F.regexp_replace(col, r"[^A-Za-z]", ""))
    digit = F.length(F.regexp_replace(col, r"[^0-9]", ""))
    space = F.length(F.regexp_replace(col, r"[^\s]", ""))
    punct = n - alpha - digit - space
    return {"n_chars": n, "n_alpha": alpha, "n_digit": digit, "n_space": space, "n_punct": punct}


def stopword_hits(tokens: Column, lang: str) -> Column:
    """Distinct stopwords of ``lang`` present in the token array."""
    lits = F.array(*[F.lit(w) for w in LANG_STOPWORDS[lang]])
    return F.size(F.array_intersect(F.array_distinct(tokens), lits)).cast("long")


def lang_id(tokens: Column) -> Column:
    """Stopword-overlap language ID: the first language (in LANG_ORDER)
    whose distinct-stopword-hit count equals the maximum; all-zero =>
    'und' (undetermined). A pure CASE expression tree — the SQL twin in
    queries.pipeline is the same chain, so results oracle-match."""
    scores = {lang: stopword_hits(tokens, lang) for lang in LANG_ORDER}
    mx = F.greatest(*[scores[lang] for lang in LANG_ORDER])
    chain = F.when(mx <= 0, F.lit("und"))
    for lang in LANG_ORDER:  # CASE order = tiebreak precedence
        chain = chain.when(scores[lang] == mx, F.lit(lang))
    return chain


def quality_score(text: Column, tokens: Column) -> Column:
    """Heuristic document quality in [0,1]: rewards reasonable length,
    wordiness and low punctuation/digit density (the classic C4-style
    filters, folded into one score). Deterministic, SQL-expressible."""
    cc = char_classes(text)
    n = cc["n_chars"].cast("double")
    n_tok = F.size(tokens).cast("double")
    len_score = F.least(n / F.lit(500.0), F.lit(1.0))
    word_score = F.least(n_tok / F.lit(50.0), F.lit(1.0))
    punct_penalty = F.least(cc["n_punct"].cast("double") / F.greatest(n, F.lit(1.0)) * 5, F.lit(1.0))
    digit_penalty = F.least(cc["n_digit"].cast("double") / F.greatest(n, F.lit(1.0)) * 5, F.lit(1.0))
    score = (
        F.lit(0.4) * len_score
        + F.lit(0.4) * word_score
        + F.lit(0.1) * (1 - punct_penalty)
        + F.lit(0.1) * (1 - digit_penalty)
    )
    # least()/greatest() SKIP nulls (both Spark and DuckDB), so a null
    # text would otherwise score 0.8 — a silent high-quality pass for
    # garbage rows. Null in, null out.
    return F.when(text.isNotNull(), F.round(score, 6))


def content_fingerprint(col: Column) -> Column:
    """Exact content fingerprint: md5 of the case/accent-normalized,
    whitespace-collapsed text. md5 is available in both Spark and
    DuckDB with identical hex output — the dedup oracle depends on it."""
    normalized = F.regexp_replace(F.trim(unaccent(F.lower(col))), r"\s+", " ")
    return F.md5(normalized)


def shingles(tokens: Column, n: int = 3) -> Column:
    """Word n-gram (shingle) array: the unit of MinHash/Jaccard near-dup
    detection. No explode, no shuffle.

    Built as a zip_with fold over n shifted slices of the token array.
    The lambdas reference ONLY their bound lambda variables — never the
    outer ``tokens`` expression — because higher-order functions are
    interpreted (no codegen) and re-evaluate any captured outer
    expression per element: an earlier element_at(tokens, i+j)
    formulation re-ran the whole tokenizer ~3x per shingle (~300x
    slower at sf0.1). ``tokens`` here is evaluated O(n) times per row.
    """
    k = F.size(tokens) - (n - 1)
    width = F.greatest(k, F.lit(0))
    grams = F.slice(tokens, 1, width)
    for j in range(1, n):
        grams = F.zip_with(
            grams, F.slice(tokens, j + 1, width), lambda a, b: F.concat_ws(" ", a, b)
        )
    return F.when(k <= 0, F.array().cast("array<string>")).otherwise(grams)


def chunk_count(tokens: Column, chunk_size: int, stride: int) -> Column:
    """Number of overlapping token windows covering the array:
    1 window if it fits in ``chunk_size``, else enough stride steps to
    cover the tail; 0 for an empty array. Kept as a standalone expr so
    the DuckDB oracle can mirror the exact integer formula."""
    n = F.size(tokens)
    extra = F.floor((n - chunk_size + stride - 1) / F.lit(stride)).cast("long")
    return (
        F.when(n <= 0, F.lit(0))
        .when(n <= chunk_size, F.lit(1))
        .otherwise(extra + 1)
        .cast("long")
    )


def chunk_spans(tokens: Column, chunk_size: int = 100, overlap: int = 20) -> Column:
    """Overlapping token-window chunks — the LLM-training-data chunker.
    Returns array<struct<chunk_id:long, chunk_text:string,
    n_tokens:int>>; stride = chunk_size - overlap. All JVM expressions:
    sequence -> transform(slice + array_join); explode downstream.

    IMPORTANT: pass a *bound column* (select the tokenized array into a
    named column first), not the raw ``tokenize(text)`` expression — a
    captured outer EXPRESSION is re-evaluated per lambda element
    (re-tokenizing the doc once per chunk), while a captured attribute
    is just a row-value read. See shingles() for the same pitfall.
    """
    stride = chunk_size - overlap
    if stride <= 0:
        raise ValueError("overlap must be < chunk_size")
    ids = F.sequence(F.lit(0), chunk_count(tokens, chunk_size, stride) - 1)
    return F.when(F.size(tokens) <= 0, F.array().cast(
        "array<struct<chunk_id:long,chunk_text:string,n_tokens:int>>"
    )).otherwise(
        F.transform(
            ids,
            lambda i: F.struct(
                i.cast("long").alias("chunk_id"),
                F.array_join(
                    F.slice(tokens, i * stride + 1, chunk_size), " "
                ).alias("chunk_text"),
                F.size(F.slice(tokens, i * stride + 1, chunk_size)).alias("n_tokens"),
            ),
        )
    )


# PII scan patterns — written to behave identically under Java regex
# (Spark) and RE2 (DuckDB oracle): no lookarounds, no backreferences.
PII_PATTERNS: dict[str, str] = {
    "email": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    "url": r"https?://[^\s]+",
    "phone": r"\+?[0-9][0-9()\-\s]{7,}[0-9]",
}


def pii_counts(col: Column) -> dict[str, Column]:
    """Per-document PII match counts (email / url / phone), all
    JVM-side ``regexp_count`` — fused into the scan, no UDF."""
    return {
        name: F.regexp_count(col, F.lit(pat)).cast("long")
        for name, pat in PII_PATTERNS.items()
    }


def redact_pii(col: Column) -> Column:
    """REDACTION counterpart of ``pii_counts`` (round 9): replace each
    PII match with its typed tag (``<EMAIL>``, ``<URL>``, ``<PHONE>``)
    in the fixed PII_PATTERNS order — email and url first so their
    digit runs can never be re-matched by the looser phone pattern;
    the tags themselves contain no redactable characters, so the chain
    is idempotent. A map-only ``regexp_replace`` chain fused into the
    scan (no UDF, no shuffle) — the shape of a 100 TB pre-training
    redaction pass."""
    out = col
    for name, pat in PII_PATTERNS.items():
        out = F.regexp_replace(out, pat, f"<{name.upper()}>")
    return out


def dup_gram_stats(tokens: Column, n: int = 3) -> dict[str, Column]:
    """Within-document repetition via n-gram duplication (the Gopher
    repetition filters, simplified): total n-grams, distinct n-grams,
    and the duplicate fraction. Array-local — no explode, no shuffle."""
    grams = shingles(tokens, n)
    total = F.size(grams).cast("long")
    distinct = F.size(F.array_distinct(grams)).cast("long")
    ratio = F.when(total <= 0, F.lit(0.0)).otherwise(
        F.round(1 - distinct.cast("double") / total.cast("double"), 6)
    )
    return {"n_grams": total, "n_distinct_grams": distinct, "dup_gram_ratio": ratio}


def rolling_hashes(tokens: Column, window: int = 5) -> Column:
    """Winnowing-style rolling fingerprint: xxhash64 of each
    ``window``-gram. Downstream picks minima per band (see
    operators.dedup.minhash_signature) — all JVM-side."""
    grams = shingles(tokens, window)
    return F.transform(grams, lambda g: F.xxhash64(g))
