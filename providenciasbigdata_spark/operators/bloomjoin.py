"""Bloom-filter semi-join reduction (runtime filtering).

The reference never correlates its two stores (SURVEY.md §2.4 "joins:
absent"), so this is an engine extension for the standard big-data
shape: a fact table joined to a dim side that is too large to
broadcast as rows but whose KEY SET compresses into a bloom bitmap.
The bitmap is built distributively (bit_or partial aggregates), stays
a DataFrame (never collected to the driver), and is broadcast-joined
against the fact side word-by-word — so non-matching fact rows are
dropped BEFORE the exact join's shuffle. This is Spark's own
InjectRuntimeFilter / semi-join-reduction strategy made explicit and
tunable (Spark only injects it for selective filters it can prove;
here the caller decides).

Scale math: 10^8 dim keys at 16 bits/key -> 1.6e9 bits = 25M longs
~ 200 MB broadcast of packed words, false-positive rate ~0.5% with
k=2 probes — vs shuffling a 100 TB fact table's non-matching rows.
No false negatives ever, so the exact join downstream keeps results
exact regardless of the fpr; the bloom only reduces shuffle volume.

All expressions are JVM-side (xxhash64 / shiftleft / bit_or) — no
UDFs; the whole prefilter stays inside WholeStageCodegen between the
two broadcast hash joins.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DEFAULT_SEEDS = (0x51ED, 0xC0FFEE)


def bloom_build(
    dim: DataFrame, key: str, n_bits: int, seeds: tuple[int, ...] = DEFAULT_SEEDS
) -> DataFrame:
    """Distributed bloom build: 2 rows per (key, probe) -> packed
    64-bit words via a bit_or hash aggregate. Output schema
    (word_idx BIGINT, word_bits BIGINT), at most ceil(n_bits/64) rows.
    Map-side combine collapses the probe stream before the (tiny)
    shuffle; the result is small enough to broadcast by construction.
    """
    if n_bits % 64 != 0:
        raise ValueError("n_bits must be a multiple of 64")
    probes = (
        dim.where(F.col(key).isNotNull())
        .select(
            F.explode(
                F.array(
                    *[
                        F.pmod(F.xxhash64(F.col(key), F.lit(s)), F.lit(n_bits))
                        for s in seeds
                    ]
                )
            ).alias("__pos")
        )
    )
    return probes.select(
        F.shiftright(F.col("__pos"), 6).alias("word_idx"),
        F.expr("shiftleft(CAST(1 AS BIGINT), CAST(__pos % 64 AS INT))").alias("__m"),
    ).groupBy("word_idx").agg(F.bit_or("__m").alias("word_bits"))


def bloom_prefilter(
    fact: DataFrame,
    key: str,
    bloom: DataFrame,
    n_bits: int,
    seeds: tuple[int, ...] = DEFAULT_SEEDS,
) -> DataFrame:
    """Keep only fact rows whose ``key`` MIGHT be in the bloom set
    (plus never a false drop: every key that was fed to bloom_build
    passes). Null keys are dropped — this prefilter is only correct
    upstream of an INNER/SEMI equi-join, where null keys never match.

    One broadcast hash join per probe against the packed-words table
    (word_idx is the equi-key); a fact key whose word row is absent
    has no bits set there and is definitively not in the set, which
    is exactly what the inner join expresses.
    """
    out_cols = list(fact.columns)
    df = fact.where(F.col(key).isNotNull())
    for i, s in enumerate(seeds):
        pos = F.pmod(F.xxhash64(F.col(key), F.lit(s)), F.lit(n_bits))
        df = (
            df.withColumn(f"__pos{i}", pos)
            .withColumn(f"__word{i}", F.shiftright(F.col(f"__pos{i}"), 6))
            .withColumn(
                f"__mask{i}",
                F.expr(f"shiftleft(CAST(1 AS BIGINT), CAST(__pos{i} % 64 AS INT))"),
            )
        )
        b = F.broadcast(
            bloom.select(
                F.col("word_idx").alias(f"__bw{i}"),
                F.col("word_bits").alias(f"__bb{i}"),
            )
        )
        df = df.join(b, F.col(f"__word{i}") == F.col(f"__bw{i}"), "inner").where(
            F.col(f"__bb{i}").bitwiseAND(F.col(f"__mask{i}")) != 0
        )
    return df.select(*out_cols)


def bloom_prefilter_join(
    fact: DataFrame,
    dim: DataFrame,
    fact_key: str,
    dim_key: str,
    n_bits: int = 1 << 20,
    seeds: tuple[int, ...] = DEFAULT_SEEDS,
) -> DataFrame:
    """Inner equi-join with bloom semi-join reduction: build the bloom
    from the dim keys, prefilter the fact side, then run the exact
    join. Result is EXACTLY ``fact JOIN dim`` (no false negatives; the
    exact join removes bloom false positives), but the fact side's
    shuffle carries only rows that might match.
    """
    bloom = bloom_build(dim, dim_key, n_bits, seeds)
    pruned = bloom_prefilter(fact, fact_key, bloom, n_bits, seeds)
    return pruned.join(dim, pruned[fact_key] == dim[dim_key], "inner")
