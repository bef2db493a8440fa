"""Semantic tests for the training-governance operators on crafted
inputs (the oracle gate in test_oracle_parity covers the real tables)."""

from __future__ import annotations

from pyspark.sql import functions as F

from providenciasbigdata_spark.functions.text import (
    dup_gram_stats,
    pii_counts,
    tokenize,
)
from providenciasbigdata_spark.operators.pack import packed_positions


def test_pii_counts_crafted(spark):
    df = spark.createDataFrame(
        [
            (1, "mail me at a.b+c@example.org or x@y.io"),
            (2, "see https://example.com/x?q=1 and http://a.b"),
            (3, "call +1 (415) 555-0199 now"),
            (4, "nothing suspicious here"),
        ],
        "id int, text string",
    )
    c = pii_counts(F.col("text"))
    rows = {
        r.id: r
        for r in df.select(
            "id",
            c["email"].alias("e"),
            c["url"].alias("u"),
            c["phone"].alias("p"),
        ).collect()
    }
    assert (rows[1].e, rows[1].u, rows[1].p) == (2, 0, 0)
    assert rows[2].u == 2 and rows[2].e == 0
    assert rows[3].p == 1
    assert (rows[4].e, rows[4].u, rows[4].p) == (0, 0, 0)


def test_dup_gram_stats_crafted(spark):
    df = spark.createDataFrame(
        [
            (1, "a b c a b c a b c"),  # 7 trigrams, 3 distinct
            (2, "all words here are unique tokens"),
            (3, "x y"),  # shorter than n: no grams
        ],
        "id int, text string",
    )
    g = dup_gram_stats(tokenize(F.col("text")), n=3)
    rows = {
        r.id: r
        for r in df.select(
            "id",
            g["n_grams"].alias("n"),
            g["n_distinct_grams"].alias("d"),
            g["dup_gram_ratio"].alias("r"),
        ).collect()
    }
    assert (rows[1].n, rows[1].d) == (7, 3)
    assert rows[1].r == round(1 - 3 / 7, 6)
    assert rows[2].r == 0.0
    assert (rows[3].n, rows[3].r) == (0, 0.0)


def test_packed_positions_invariants(spark):
    df = spark.range(0, 500).select(
        F.col("id").alias("k"), (F.col("id") % 7 + 1).alias("sz")
    )
    out = packed_positions(df, "k", "sz", capacity=64, n_partitions=8)
    rows = sorted(out.collect(), key=lambda r: r.k)
    # exact prefix sum regardless of partitioning
    cum = 0
    for r in rows:
        assert r.cum_before == cum
        assert r.bin_id == cum // 64
        assert r.bin_offset == cum % 64
        cum += r.sz
    # offsets always inside the window
    assert all(0 <= r.bin_offset < 64 for r in rows)
    # bins are non-decreasing in key order
    bins = [r.bin_id for r in rows]
    assert bins == sorted(bins)


def test_packed_positions_single_row_and_empty(spark):
    one = spark.createDataFrame([(1, 100)], "k int, sz int")
    r = packed_positions(one, "k", "sz", capacity=64).collect()[0]
    assert (r.cum_before, r.bin_id, r.bin_offset) == (0, 0, 0)
    empty = spark.createDataFrame([], "k int, sz int")
    assert packed_positions(empty, "k", "sz", capacity=64).count() == 0


def test_contamination_identical_doc_fully_contaminated(spark, sf_dir):
    """A corpus doc that shares all its 5-grams with a benchmark doc
    must report contamination_rate 1.0 — checked by construction on a
    tiny synthetic frame routed through the same expressions."""
    from providenciasbigdata_spark.functions.text import shingles

    df = spark.createDataFrame(
        [(0, "alpha beta gamma delta epsilon zeta"), (5, "alpha beta gamma delta epsilon zeta")],
        "doc_id long, text string",
    )
    grams = df.select(
        "doc_id",
        F.explode_outer(F.array_distinct(shingles(tokenize(F.col("text")), 5))).alias("gram"),
    )
    bench = (
        grams.filter(F.col("doc_id") == 0)
        .select("gram").distinct().withColumn("_hit", F.lit(1))
    )
    got = (
        grams.filter(F.col("doc_id") != 0)
        .join(F.broadcast(bench), "gram", "left")
        .groupBy("doc_id")
        .agg((F.sum("_hit") / F.count("gram")).alias("rate"))
        .collect()
    )
    assert got[0].rate == 1.0


def test_heavy_hitters_zipf_exact_vs_truth(spark):
    """Vocab (1000) >> counters (k=20): MG must decrement heavily and
    still produce exactly the true heavy-hitter set with exact counts."""
    import numpy as np

    from providenciasbigdata_spark.operators.sketch import heavy_hitters

    rng = np.random.Generator(np.random.PCG64(7))
    vals = (rng.zipf(1.3, size=50_000) % 1000).astype(int).tolist()
    df = spark.createDataFrame([(v,) for v in vals], "v int").repartition(8)
    phi = 0.05
    got = {(r.v, r.cnt) for r in heavy_hitters(df, "v", phi=phi).collect()}
    from collections import Counter

    c = Counter(vals)
    want = {(v, n) for v, n in c.items() if n > phi * len(vals)}
    assert got == want and len(want) > 0


def test_heavy_hitters_uniform_empty(spark):
    """Uniform data above the threshold count: no value exceeds phi*n
    -> empty result, and the sketch must not invent candidates."""
    from providenciasbigdata_spark.operators.sketch import heavy_hitters

    df = spark.range(0, 10_000).select((F.col("id") % 500).alias("v"))
    assert heavy_hitters(df, "v", phi=0.01).count() == 0


def test_mg_candidates_no_false_negatives(spark):
    """Every true heavy hitter appears in the candidate union."""
    import numpy as np

    from providenciasbigdata_spark.operators.sketch import mg_candidates

    rng = np.random.Generator(np.random.PCG64(11))
    vals = (rng.zipf(1.5, size=20_000) % 300).astype(int).tolist()
    df = spark.createDataFrame([(v,) for v in vals], "v int").repartition(4)
    cands = {r.candidate for r in mg_candidates(df, "v", k=25).collect()}
    from collections import Counter

    c = Counter(vals)
    hh = {v for v, n in c.items() if n > len(vals) / 25}
    assert hh <= cands


def test_pack_first_fit_matches_reference_and_invariants(spark):
    """Single-shard FFD equals a pure-Python reference exactly; bins
    never overflow; offsets are consistent prefix fills; oversize
    items raise; the packing is deterministic across runs."""
    import pytest

    from providenciasbigdata_spark.operators.pack import pack_first_fit

    sizes = [500, 300, 300, 200, 200, 200, 100, 100, 50, 450, 350, 250]
    rows = [(i, s) for i, s in enumerate(sizes)]
    df = spark.createDataFrame(rows, "doc_id long, n_chars long")
    cap = 512

    got = pack_first_fit(df, "n_chars", capacity=cap, n_shards=1)
    res = {r.doc_id: (r.bin_id, r.bin_offset) for r in got.collect()}

    # pure-Python FFD over the same (size desc, id asc) order
    order = sorted(range(len(sizes)), key=lambda i: (-sizes[i], i))
    fills, want = [], {}
    for i in order:
        for j, f in enumerate(fills):
            if f + sizes[i] <= cap:
                want[i] = (j, f)
                fills[j] = f + sizes[i]
                break
        else:
            want[i] = (len(fills), 0)
            fills.append(sizes[i])
    assert res == want

    # invariants on the sharded path over the fixture table
    from providenciasbigdata_spark.io import load_table

    docs = load_table(spark, "/root/testdata/sf0.001", "documents")
    packed = pack_first_fit(docs, "n_chars", capacity=2048, n_shards=4)
    per_bin = packed.groupBy("bin_id").agg(
        F.sum("n_chars").alias("fill"), F.count("*").alias("n")
    )
    assert per_bin.filter(F.col("fill") > 2048).count() == 0
    # every item exactly once
    assert packed.count() == docs.count()
    assert packed.select("doc_id").distinct().count() == docs.count()
    # offset + size <= capacity per item
    assert packed.filter(F.col("bin_offset") + F.col("n_chars") > 2048).count() == 0
    # determinism
    again = pack_first_fit(docs, "n_chars", capacity=2048, n_shards=4)
    a = sorted((r.doc_id, r.bin_id, r.bin_offset) for r in packed.collect())
    b = sorted((r.doc_id, r.bin_id, r.bin_offset) for r in again.collect())
    assert a == b
    # bins used within 2x the volume lower bound (sanity efficiency)
    total = docs.agg(F.sum("n_chars")).first()[0]
    n_bins = per_bin.count()
    assert n_bins <= 2 * (-(-total // 2048)) + 4

    # oversize raises
    bad = spark.createDataFrame([(1, 5000)], "doc_id long, n_chars long")
    with pytest.raises(Exception, match="not in"):
        pack_first_fit(bad, "n_chars", capacity=2048).collect()


def test_dsir_weights_match_numpy_reference(spark):
    """The distributed DSIR scorer == a pure-Python/numpy reference on
    the identical tokenizer, md5 buckets, and add-one smoothing; the
    English target slice must up-weight English docs on average."""
    import math
    import re
    import unicodedata
    from hashlib import md5 as _md5

    from providenciasbigdata_spark.io import load_table
    from providenciasbigdata_spark.operators.mix import dsir_log_weights

    sf = "/root/testdata/sf0.001"
    docs = load_table(spark, sf, "documents")
    target = docs.filter(F.col("lang") == "en")
    B = 512
    got = {
        r.doc_id: (r.n_feats, r.log_weight)
        for r in dsir_log_weights(docs, target, n_buckets=B).collect()
    }

    def toks(s):
        folded = unicodedata.normalize("NFKD", s.lower())
        folded = "".join(c for c in folded if not unicodedata.combining(c))
        return [t for t in re.split(r"\W+", folded) if t]

    def buckets(text):
        ts = toks(text)
        grams = ts + [f"{a} {b}" for a, b in zip(ts, ts[1:])]
        return [int(_md5(g.encode()).hexdigest()[:15], 16) % B for g in grams]

    rows = docs.select("doc_id", "text", "lang").collect()
    src_counts: dict[int, int] = {}
    tgt_counts: dict[int, int] = {}
    per_doc: dict[int, list[int]] = {}
    for r in rows:
        bs = buckets(r.text or "")
        per_doc[r.doc_id] = bs
        for b in bs:
            src_counts[b] = src_counts.get(b, 0) + 1
            if r.lang == "en":
                tgt_counts[b] = tgt_counts.get(b, 0) + 1
    s_tot = sum(src_counts.values()) + B
    t_tot = sum(tgt_counts.values()) + B
    # same 2^-20 dyadic quantization as the operator: the per-doc sum
    # of quantized deltas is EXACT in double, so the distributed result
    # must be BIT-IDENTICAL to this python fold, any summation order
    QUANT = float(1 << 20)
    delta = {
        b: math.floor(
            (
                math.log((tgt_counts.get(b, 0) + 1) / t_tot)
                - math.log((src_counts.get(b, 0) + 1) / s_tot)
            )
            * QUANT
            + 0.5
        )
        / QUANT
        for b in src_counts
    }
    for r in rows:
        bs = per_doc[r.doc_id]
        want = sum(delta[b] for b in bs)
        n, logw = got[r.doc_id]
        assert n == len(bs)
        assert logw == want, r.doc_id

    langs = {r.doc_id: r.lang for r in rows}
    en = [got[d][1] for d in got if langs[d] == "en"]
    other = [got[d][1] for d in got if langs[d] != "en"]
    assert sum(en) / len(en) > sum(other) / len(other)


def test_shuffle_to_shards_permutation_properties(spark, sf_dir):
    """Round 7: (shard, pos) is a seeded permutation — every row
    appears exactly once, pos is contiguous per shard, the layout is
    deterministic across calls, and a different seed yields a
    DIFFERENT order of the same rows."""
    from providenciasbigdata_spark.io import load_table
    from providenciasbigdata_spark.operators.mix import shuffle_to_shards

    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    n = docs.count()
    a = shuffle_to_shards(docs, "doc_id", n_shards=4, seed="s1")
    rows = a.collect()
    assert len(rows) == n and len({r.doc_id for r in rows}) == n
    by_shard = {}
    for r in rows:
        by_shard.setdefault(r.shard, []).append(r.pos)
    assert set(by_shard) <= set(range(4))
    for shard, poses in by_shard.items():
        assert sorted(poses) == list(range(len(poses))), shard
    # deterministic replay
    again = {(r.doc_id, r.shard, r.pos) for r in
             shuffle_to_shards(docs, "doc_id", n_shards=4, seed="s1").collect()}
    assert again == {(r.doc_id, r.shard, r.pos) for r in rows}
    # a fresh seed permutes differently (same multiset of rows)
    b = {(r.doc_id, r.shard, r.pos) for r in
         shuffle_to_shards(docs, "doc_id", n_shards=4, seed="s2").collect()}
    assert b != again and len(b) == n
    # roughly balanced shards (md5-uniform): no shard > 2x the mean
    assert max(len(v) for v in by_shard.values()) <= 2 * (n / 4)


def test_minhash_cross_contamination_planted(spark):
    """Round 7: fuzzy decontamination finds PLANTED near-duplicate
    leakage (benchmark doc = corpus doc with small edits) with
    precision 1.0 (every reported pair's exact Jaccard clears the
    threshold) and reports the best benchmark match deterministically;
    unrelated docs are not flagged."""
    from providenciasbigdata_spark.operators.dedup import (
        minhash_cross_contamination,
    )

    base = ("the merge sort spark table window hash join batch stream "
            "filter scan row column value key part agg data fast slow")
    unrelated = ("alpha beta gamma delta epsilon zeta eta theta iota kappa "
                 "lambda mu nu xi omicron pi rho sigma tau upsilon")
    corpus = spark.createDataFrame(
        [(1, base), (2, unrelated), (3, base + " extra tail tokens here")],
        "doc_id long, text string",
    )
    bench = spark.createDataFrame(
        # 101: near-copy of doc 1 (one word changed); 102: disjoint
        [(101, base.replace("batch", "group")), (102, "completely different words only")],
        "doc_id long, text string",
    )
    got = {
        r.doc_id: (r.bench_id, r.jaccard)
        for r in minhash_cross_contamination(
            corpus, bench, threshold=0.4, bands=16, rows_per_band=2, ngram=3
        ).collect()
    }
    assert 1 in got and got[1][0] == 101 and got[1][1] >= 0.4
    assert 2 not in got
    # deterministic replay
    again = {
        r.doc_id: (r.bench_id, r.jaccard)
        for r in minhash_cross_contamination(
            corpus, bench, threshold=0.4, bands=16, rows_per_band=2, ngram=3
        ).collect()
    }
    assert again == got
    # precision 1.0: report nothing when the benchmark is disjoint
    none = minhash_cross_contamination(
        corpus.filter("doc_id = 2"), bench, threshold=0.4,
        bands=16, rows_per_band=2, ngram=3,
    ).count()
    assert none == 0


def test_redact_pii_hand_checked(spark):
    """Round 9: typed-tag redaction, pattern order (email/url before
    phone), idempotence, and count agreement with pii_counts."""
    from providenciasbigdata_spark.functions.text import pii_counts, redact_pii

    df = spark.createDataFrame(
        [
            (1, "mail a.b+c@example.org then call +57 (301) 555-1234 ok"),
            (2, "see https://example.com/x?id=123 for details"),
            (3, "clean text without identifiers"),
            (4, None),
        ],
        "doc_id long, text string",
    )
    out = {r.doc_id: r.red for r in df.select(
        "doc_id", redact_pii(F.col("text")).alias("red")).collect()}
    assert out[1] == "mail <EMAIL> then call <PHONE> ok"
    assert out[2] == "see <URL> for details"
    assert out[3] == "clean text without identifiers"
    assert out[4] is None

    # idempotent: re-redacting the redacted text changes nothing
    again = {r.doc_id: r.red2 for r in df.select(
        "doc_id", redact_pii(redact_pii(F.col("text"))).alias("red2")
    ).collect()}
    assert again == out

    # the inserted tag count equals the pre-redaction match count
    counts = pii_counts(F.col("text"))
    total = sum(counts.values(), F.lit(0))
    rows = df.filter("text IS NOT NULL").select(
        total.alias("n"),
        F.regexp_count(
            redact_pii(F.col("text")), F.lit(r"<(EMAIL|URL|PHONE)>")
        ).alias("t"),
    ).collect()
    assert all(r.n == r.t for r in rows)


def test_stratified_sample_rates_and_determinism(spark):
    """Round 9: per-stratum keep rates hold within hash tolerance,
    rate>=1.0 keeps every row (the 'g'*15 sentinel), default_rate
    covers unlisted strata, and the selection is bit-deterministic."""
    from providenciasbigdata_spark.operators.mix import stratified_sample

    n = 4000
    df = spark.range(n).selectExpr(
        "id AS doc_id",
        "CASE WHEN id % 4 = 0 THEN 'a' WHEN id % 4 = 1 THEN 'b' "
        "WHEN id % 4 = 2 THEN 'c' ELSE 'd' END AS lang",
    )
    out = stratified_sample(
        df, {"a": 1.0, "b": 0.5, "c": 0.0}, strata_col="lang",
        key_col="doc_id", default_rate=0.25, salt="s",
    )
    got = out.groupBy("lang").count().collect()
    by = {r.lang: r["count"] for r in got}
    assert by["a"] == n // 4                      # keep-everything
    assert "c" not in by                          # rate 0 drops all
    assert abs(by["b"] / (n / 4) - 0.5) < 0.08    # hash-uniform
    assert abs(by.get("d", 0) / (n / 4) - 0.25) < 0.08

    a = sorted(r.doc_id for r in out.collect())
    b = sorted(r.doc_id for r in stratified_sample(
        df, {"a": 1.0, "b": 0.5, "c": 0.0}, strata_col="lang",
        key_col="doc_id", default_rate=0.25, salt="s",
    ).collect())
    assert a == b
