"""BPE trainer pins: the distributed merge loop must EQUAL a pure-
Python reference BPE trainer (same tokenization, same deterministic
tie-break) — on a hand corpus AND on the full sf0.001 fixture corpus —
and bpe_encode over the training corpus must reproduce the training
loop's final symbol state."""

from __future__ import annotations

from pyspark.sql import functions as F

from providenciasbigdata_spark.functions.text import tokenize
from providenciasbigdata_spark.io import load_table
from providenciasbigdata_spark.operators import bpe


def _ref_apply(s, left, right):
    out = []
    for x in s:
        if out and x == right and out[-1] == left:
            out[-1] = left + right
        else:
            out.append(x)
    return out


def _ref_bpe(word_freqs, n_merges, min_pair_count=2):
    syms = {w: list(w) + [bpe.END] for w in word_freqs}
    merges = []
    for _ in range(n_merges):
        counts = {}
        for w, f in word_freqs.items():
            s = syms[w]
            for i in range(len(s) - 1):
                counts[(s[i], s[i + 1])] = counts.get((s[i], s[i + 1]), 0) + f
        if not counts:
            break
        (left, right), cnt = sorted(
            counts.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
        )[0]
        if cnt < min_pair_count:
            break
        merges.append((left, right))
        syms = {w: _ref_apply(s, left, right) for w, s in syms.items()}
    return merges, syms


def test_bpe_matches_reference_hand_corpus(spark):
    docs = spark.createDataFrame(
        [(1, "low lower lowest low low"), (2, "new newer newest new")],
        "doc_id long, text string",
    )
    wf = {r.w: r.freq for r in bpe.word_freqs(docs).collect()}
    want, want_syms = _ref_bpe(wf, 8)
    got = bpe.bpe_train(docs, n_merges=8)
    assert got == want
    # encode over the training corpus == the training loop's final state
    enc = {
        r.w: r.e
        for r in bpe.word_freqs(docs)
        .select("w", bpe.bpe_encode(F.array(F.col("w")), got).alias("e"))
        .collect()
    }
    assert enc == want_syms


def test_bpe_matches_reference_full_fixture(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    wf = {r.w: r.freq for r in bpe.word_freqs(docs, min_count=2).collect()}
    want, _ = _ref_bpe(wf, 10)
    got = bpe.bpe_train(docs, n_merges=10, min_count=2)
    assert got == want and len(got) == 10


def test_bpe_greedy_scan_semantics(spark):
    """'aaaa' under (a,a) -> [aa, aa, </w>]: a merged symbol is what
    the next element sees."""
    docs = spark.createDataFrame([(1, "aaaa")], "doc_id long, text string")
    out = docs.select(
        bpe.bpe_encode(tokenize(F.col("text")), [("a", "a")]).alias("e")
    ).first()
    assert out.e == ["aa", "aa", bpe.END]
