"""Distributed BPE vocabulary training (the Sennrich et al. 2016
byte-pair-encoding algorithm LLM tokenizers descend from) — the
tokenizer-construction step of a training-data pipeline (SURVEY.md
§2.5 C-X5 extension).

Two-level design for 100 TB:

- The only CORPUS-scale pass is one word-frequency aggregation
  (``word_freqs``): tokenize, explode, two-phase count. Everything
  after operates on the word-TYPE table — vocabulary-sized (Heaps'
  law: ~10^6-10^7 types for a 10^12-token corpus), with ``min_count``
  pruning the long noise tail exactly as reference BPE trainers do.
- Each merge iteration is ONE job over the type table: adjacent-pair
  counts (weighted by word frequency) -> deterministic arg-max
  (count desc, then pair lexicographic — reproducible across runs,
  partitionings, and engines). Applying the winning merge is a lazy
  Catalyst fold over the symbol arrays (no shuffle); lineage is
  truncated with a lazy localCheckpoint that the next iteration's
  aggregate materializes, so the loop stays one-job-per-merge.

The merge list itself is model state (like k-means centroids) and
lives on the driver: O(n_merges), not data-sized.

Correctness: pinned EQUAL to a pure-Python reference BPE trainer over
the same word counts in tests/test_bpe.py (tie-break included), which
is why the registry entry is rows-only (iterative arg-max is not
SQL-expressible) but still full-strength verified.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from providenciasbigdata_spark.functions.text import tokenize

END = "</w>"  # end-of-word marker: lets merges learn word-final units


def _char_symbols(word: Column) -> Column:
    """word -> array of single-char symbols + the end-of-word marker."""
    chars = F.transform(
        F.sequence(F.lit(1), F.length(word)), lambda i: word.substr(i, F.lit(1))
    )
    return F.concat(chars, F.array(F.lit(END)))


def word_freqs(
    docs: DataFrame, text_col: str = "text", min_count: int = 1
) -> DataFrame:
    """The one corpus-scale pass: (word, freq, symbols) per word TYPE.
    ``min_count`` drops rare types (bounds the type table, standard
    BPE-trainer practice)."""
    words = (
        docs.select(F.explode(tokenize(F.col(text_col))).alias("w"))
        .where(F.col("w") != "")
        .groupBy("w")
        .agg(F.count("*").alias("freq"))
    )
    if min_count > 1:
        words = words.where(F.col("freq") >= min_count)
    return words.select("w", "freq", _char_symbols(F.col("w")).alias("symbols"))


def _adjacent_pairs(symbols: Column) -> Column:
    """array<struct<l,r>> of adjacent symbol pairs."""
    n = F.size(symbols)
    return F.zip_with(
        F.slice(symbols, 1, F.greatest(n - 1, F.lit(0))),
        F.slice(symbols, 2, F.greatest(n - 1, F.lit(0))),
        lambda l, r: F.struct(l.alias("l"), r.alias("r")),
    )


def apply_merge(symbols: Column, left: str, right: str) -> Column:
    """Greedy left-to-right application of one merge rule (left, right)
    -> left||right, as a Catalyst fold (no UDF, no shuffle). After a
    merge the new symbol is what the next element sees — standard BPE
    scan semantics ('aaaa' under (a,a) -> [aa, aa], not [aa, a, a])."""
    merged = left + right
    return F.aggregate(
        symbols,
        F.array().cast("array<string>"),
        lambda acc, x: F.when(
            # And short-circuits left-to-right, so element_at only
            # evaluates with size(acc) >= 1 (ANSI-safe indexing)
            (F.size(acc) > 0)
            & (x == right)
            & (F.element_at(acc, F.size(acc)) == left),
            F.concat(
                F.slice(acc, 1, F.size(acc) - 1), F.array(F.lit(merged))
            ),
        ).otherwise(F.concat(acc, F.array(x))),
    )


def bpe_train(
    docs: DataFrame,
    n_merges: int = 16,
    text_col: str = "text",
    min_count: int = 1,
    min_pair_count: int = 2,
) -> list[tuple[str, str]]:
    """Learn ``n_merges`` BPE merge rules from a corpus. Returns the
    ordered rule list [(left, right), ...] — apply with ``bpe_encode``.
    Stops early when no adjacent pair reaches ``min_pair_count``."""
    wf = word_freqs(docs, text_col, min_count)
    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        top = (
            wf.select("freq", F.explode(_adjacent_pairs(F.col("symbols"))).alias("p"))
            .groupBy("p.l", "p.r")
            .agg(F.sum("freq").alias("cnt"))
            .orderBy(F.desc("cnt"), F.asc("l"), F.asc("r"))
            .first()
        )
        if top is None or top["cnt"] < min_pair_count:
            break
        merges.append((top["l"], top["r"]))
        wf = wf.withColumn(
            "symbols", apply_merge(F.col("symbols"), top["l"], top["r"])
        ).localCheckpoint(eager=False)  # materialized by the next arg-max
    return merges


def bpe_encode(tokens: Column, merges: list[tuple[str, str]]) -> Column:
    """Encode a token array with a learned rule list: each word becomes
    its BPE symbols (rules applied in learned priority order — the
    chained-fold formulation matches the training loop's final state
    exactly; pinned in tests). Pure Catalyst expression."""
    def encode_word(w: Column) -> Column:
        sym = _char_symbols(w)
        for left, right in merges:
            sym = apply_merge(sym, left, right)
        return sym

    return F.flatten(F.transform(tokens, encode_word))
