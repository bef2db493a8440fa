"""Weak-scaling harness (round 7, verdict-r6 item 8).

Replicates the sf0.1 fixtures x8 into a staged /tmp dir — key columns
shifted per replica so uniqueness and join selectivity are preserved,
document texts tagged per replica so duplicate/shingle structure
scales linearly instead of exploding quadratically across replicas,
embeddings rolled per replica so cosine-pair counts scale linearly —
then times the heavy headline queries whose INPUT actually grows with
the corpus at both scales and reports the per-query scaling exponent
``log8(t8/t1)`` (1.0 = perfectly linear work at fixed parallelism;
< 1 = fixed overhead amortizing; > 1 = a super-linear stage that
needs a plan postmortem).

Fixture-bounded queries (the Cypher/graph family reads the staged
similarity-edges table bounded to 1000 vectors; dedup_embedding_* is
bounded to 150) are deliberately excluded: their inputs do not grow
with the corpus, so a "weak scaling" number for them would measure
nothing. Broadcast dims (region/nation) are copied once, unscaled —
holding dimension tables fixed is the weak-scaling contract.

Usage:  python weak_scaling.py [--replicas 8] [--passes 2]
Prints one JSON line per query and a final markdown table for STATUS.
"""

from __future__ import annotations

import argparse
import json
import math
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import DataFrame, functions as F  # noqa: E402

from providenciasbigdata_spark.io import load_table  # noqa: E402
from providenciasbigdata_spark.queries import all_queries  # noqa: E402
from providenciasbigdata_spark.queries.modern import (  # noqa: E402
    _sf_tag,
    _source_fingerprint,
)
from providenciasbigdata_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

# heavy headline queries whose input grows with the corpus
QUERIES = [
    "minhash_near_dups",
    "dedup_span_stats",
    "dedup_exact_survivors",
    "contamination_ngram_overlap",
    "dsir_importance_weights",
    "a7_search_bm25",
    "agg_pricing_summary",
    "sessionize_events",
    "pack_sequences",
    "sketch_heavy_hitter_tokens",
    # round 9
    "containment_join_prefix",
    "text_pii_redaction",
    "vocab_coverage_curve",
]

# (table, [id columns to shift]); the shift stride of a foreign key
# must equal its referenced primary's stride, so strides are computed
# per KEY DOMAIN, not per table
_SHIFT = {
    "orders": [("o_orderkey", "order"), ("o_custkey", "cust")],
    "lineitem": [("l_orderkey", "order"), ("l_partkey", "part"), ("l_suppkey", "supp")],
    "customer": [("c_custkey", "cust")],
    "supplier": [("s_suppkey", "supp")],
    "part": [("p_partkey", "part")],
    "events": [("event_id", "event"), ("user_id", "user")],
    "documents": [("doc_id", "doc")],
    "embeddings": [("vec_id", "vec")],
}
_DOMAIN_OF = {
    "order": ("orders", "o_orderkey"),
    "cust": ("customer", "c_custkey"),
    "part": ("part", "p_partkey"),
    "supp": ("supplier", "s_suppkey"),
    "event": ("events", "event_id"),
    "user": ("events", "user_id"),
    "doc": ("documents", "doc_id"),
    "vec": ("embeddings", "vec_id"),
}
_COPY = ["region", "nation"]


def stage_replicated(spark, replicas: int) -> str:
    out = os.path.join(
        "/tmp",
        f"pbd_weak{replicas}_{_sf_tag(SF_DIR)}_"
        f"{_source_fingerprint(SF_DIR, 'lineitem')}",
    )
    done = os.path.join(out, "_DONE")
    if os.path.exists(done):
        return out
    shutil.rmtree(out, ignore_errors=True)
    os.makedirs(out, exist_ok=True)

    strides = {}
    for dom, (tbl, col) in _DOMAIN_OF.items():
        strides[dom] = (
            load_table(spark, SF_DIR, tbl).agg(F.max(col)).first()[0] or 0
        ) + 1

    for tbl in _COPY:
        load_table(spark, SF_DIR, tbl).write.mode("overwrite").parquet(
            os.path.join(out, f"{tbl}.parquet")
        )

    for tbl, shifts in _SHIFT.items():
        base = load_table(spark, SF_DIR, tbl)
        if tbl == "embeddings":
            # read the real vector width — a hard-coded dim would
            # silently truncate/misroll if the fixture ever changes
            emb_dim = base.select(F.size("embedding").alias("d")).first()["d"]
        parts: list[DataFrame] = []
        for i in range(replicas):
            df = base
            for col, dom in shifts:
                df = df.withColumn(col, F.col(col) + F.lit(i * strides[dom]))
            if tbl == "documents" and i:
                # per-replica tag token: each replica keeps the
                # original's internal duplicate/shingle structure but
                # never collides across replicas — pair counts scale
                # x8, not x64
                df = df.withColumn(
                    "text", F.concat(F.col("text"), F.lit(f" repl{i}"))
                ).withColumn("n_chars", F.col("n_chars") + F.lit(len(f" repl{i}")))
            if tbl == "embeddings" and i:
                # roll the vector by i: same norms and coordinate
                # distribution, decorrelated across replicas
                df = df.withColumn(
                    "embedding",
                    F.concat(
                        F.slice("embedding", i + 1, emb_dim - i),
                        F.slice("embedding", 1, i),
                    ),
                )
            parts.append(df)
        u = parts[0]
        for p in parts[1:]:
            u = u.unionByName(p)
        u.write.mode("overwrite").parquet(os.path.join(out, f"{tbl}.parquet"))

    open(done, "w").close()
    return out


def time_queries(spark, registry, sf_dir: str, passes: int) -> dict[str, float]:
    for t in ("lineitem", "orders", "customer", "events", "documents", "embeddings"):
        load_table(spark, sf_dir, t).count()  # page-cache warm
    best = {q: float("inf") for q in QUERIES}
    for _ in range(passes):
        for q in QUERIES:
            fn, _sql = registry[q]
            t0 = time.perf_counter()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            best[q] = min(best[q], time.perf_counter() - t0)
            spark.catalog.clearCache()
            for rdd in list(
                spark.sparkContext._jsc.getPersistentRDDs().values()
            ):
                rdd.unpersist()
    return best


# ---- graph family (round 8, verdict-r7 item 8) -----------------------------
# The Cypher/graph registry queries read FIXTURE-BOUNDED edge tables
# (vec_id < 1000), so table replication cannot grow their input.
# Weak-scaling for them scales the similarity-graph BOUND instead:
# edges grow ~bound^2 at a fixed threshold, and the exponent is taken
# against the MEASURED edge-count ratio, not the nominal replica
# factor. small_cutover=0 forces the DISTRIBUTED paths — the driver
# finishers would otherwise absorb the small scale and measure nothing.

_GRAPH_BASE_BOUND = 300
_GRAPH_LO = 30.0


def _graph_ops(edges):
    from providenciasbigdata_spark.compat.ir import cypher_run
    from providenciasbigdata_spark.operators.graph_algos import (
        eigenvector_centrality,
        pagerank,
        strongly_connected_components,
    )

    three_hop = (
        "MATCH (a:Providencia {id: $o})-[r1:SIMILAR]->(b)-[r2:SIMILAR]->(c)"
        "-[r3:SIMILAR]->(d) WHERE r1.similitud >= $lo AND r2.similitud >= $lo "
        "AND r3.similitud >= $lo RETURN d.id AS destino, count(r3) AS caminos"
    )
    anchor = edges.select("src").first()["src"]
    return {
        "graph_pagerank": lambda: pagerank(edges, max_iter=5, small_cutover=0),
        "graph_scc": lambda: strongly_connected_components(
            edges, small_cutover=0
        ),
        "graph_eigenvector_centrality": lambda: eigenvector_centrality(
            edges, weight_col="similitud", max_iter=5, small_cutover=0
        ),
        "cypher_generic_3hop": lambda: cypher_run(
            three_hop, edges=edges, params={"o": anchor, "lo": _GRAPH_LO}
        ),
    }


def time_graph(spark, bound: int, passes: int) -> tuple[dict[str, float], int]:
    from providenciasbigdata_spark.queries.fixtures import staged_similarity_edges

    edges = staged_similarity_edges(spark, SF_DIR, bound).filter(
        F.col("similitud") >= _GRAPH_LO
    )
    n_edges = edges.count()
    ops = _graph_ops(edges)
    best = {q: float("inf") for q in ops}
    for _ in range(passes):
        for q, fn in ops.items():
            t0 = time.perf_counter()
            fn().write.format("noop").mode("overwrite").save()
            best[q] = min(best[q], time.perf_counter() - t0)
            spark.catalog.clearCache()
            for rdd in list(
                spark.sparkContext._jsc.getPersistentRDDs().values()
            ):
                rdd.unpersist()
    return best, n_edges


def run_graph(spark, replicas: int, passes: int) -> None:
    big_bound = int(_GRAPH_BASE_BOUND * math.sqrt(replicas))
    t1, e1 = time_graph(spark, _GRAPH_BASE_BOUND, passes)
    t2, e2 = time_graph(spark, big_bound, passes)
    ratio = e2 / max(e1, 1)
    print(
        f"[weak-graph] edges: bound {_GRAPH_BASE_BOUND} -> {e1}, "
        f"bound {big_bound} -> {e2} ({ratio:.2f}x)",
        file=sys.stderr,
    )
    if ratio <= 1.0:
        # ADVICE-r8: a bound increase that adds no edges makes
        # log(ratio) zero/negative — no exponent is computable
        print(
            f"[weak-graph] edge ratio {ratio:.3f} <= 1: the scaled bound "
            "added no edges; exponents are undefined for this run",
            file=sys.stderr,
        )
    rows = []
    for q in t1:
        exp = (
            math.log(t2[q] / t1[q]) / math.log(ratio) if ratio > 1.0 else None
        )
        rows.append((q, t1[q], t2[q], exp))
        print(json.dumps({
            "query": q, "t_base_sec": round(t1[q], 3),
            "t_big_sec": round(t2[q], 3),
            "edge_ratio": round(ratio, 3),
            "exponent": round(exp, 3) if exp is not None else None,
        }), flush=True)
    print(f"\n| query | E={e1} s | E={e2} s | ratio | exponent |")
    print("|---|---|---|---|---|")
    for q, a, b, e in rows:
        etxt = f"{e:.2f}" if e is not None else "n/a"
        print(f"| {q} | {a:.2f} | {b:.2f} | {b / a:.2f}x | {etxt} |")


def stage_containment(spark, replicas: int) -> str:
    """Containment-specific staging (round 10): documents-only, with
    EVERY token suffixed ``~i`` per replica. The shared table staging
    tags each text with ONE trailing token, which leaves cross-replica
    copies sharing ~99% of their 3-gram shingles — TRUE containment
    pairs, so the fixture's pair/candidate structure grows
    QUADRATICALLY with replicas (x4096 at x64; the two x64 attempts
    that filled the sandbox disk were materializing that true output,
    not an engine defect). Per-token suffixes make the replicas'
    shingle spaces fully disjoint (pairs scale x{replicas}, linearly)
    while preserving within-replica duplicate structure AND per-replica
    token frequencies exactly — each replica is an isomorphic copy of
    the base corpus, the weak-scaling contract.

    The suffix is ``_{i}`` on every ``\\w+`` run: ``_`` and digits are
    word characters to the engine tokenizer (split on ``\\W+``), so
    ``batch_7`` stays ONE token and each replica's shingle STRUCTURE is
    exactly the base corpus's (a first attempt used ``~{i}``, which the
    tokenizer split into interleaved extra tokens — that restructured
    the shingles and made within-replica true pairs explode ~60x,
    poisoning the exponent). For the same reason the x1 BASELINE must
    be the suffixed single replica, not the raw table: both scales
    must run the same text transformation."""
    out = os.path.join(
        "/tmp",
        f"pbd_cont{replicas}_{_sf_tag(SF_DIR)}_"
        f"{_source_fingerprint(SF_DIR, 'documents')}",
    )
    done = os.path.join(out, "_DONE")
    if os.path.exists(done):
        return out
    shutil.rmtree(out, ignore_errors=True)
    os.makedirs(out, exist_ok=True)
    base = load_table(spark, SF_DIR, "documents")
    stride = (base.agg(F.max("doc_id")).first()[0] or 0) + 1
    parts = []
    for i in range(replicas):
        parts.append(
            base.withColumn("doc_id", F.col("doc_id") + F.lit(i * stride))
            .withColumn(
                "text", F.regexp_replace("text", r"(\w+)", f"$1_{i}")
            )
        )
    u = parts[0]
    for p in parts[1:]:
        u = u.unionByName(p)
    u.write.mode("overwrite").parquet(os.path.join(out, "documents.parquet"))
    open(done, "w").close()
    return out


_CORPUS_X64 = ["minhash_near_dups", "dedup_span_stats", "dsir_importance_weights"]


def run_corpus(spark, replicas: int, passes: int) -> None:
    """Targeted ×N points for the remaining x8-only document-corpus
    queries (round 11, verdict-r10 item 7) on the ISOMORPHIC
    token-suffixed fixture that fixed containment (stage_containment):
    per-replica ``_{i}`` token suffixes keep every replica's shingle /
    gram / bucket structure exactly the base corpus's while making the
    replicas' token spaces fully disjoint — true pairs, duplicated
    spans, and vocabulary all scale LINEARLY with replicas, the
    weak-scaling contract. The x1 baseline is the suffixed single
    replica (same text transformation at both scales)."""
    from providenciasbigdata_spark.queries import all_queries

    registry = all_queries()
    base1 = stage_containment(spark, 1)
    staged = stage_containment(spark, replicas)

    def best_of(sf_dir: str, q: str) -> float:
        load_table(spark, sf_dir, "documents").count()  # page-cache warm
        fn, _sql = registry[q]
        best = float("inf")
        for _ in range(passes):
            t0 = time.perf_counter()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            best = min(best, time.perf_counter() - t0)
            spark.catalog.clearCache()
            for rdd in list(
                spark.sparkContext._jsc.getPersistentRDDs().values()
            ):
                rdd.unpersist()
        return best

    for q in _CORPUS_X64:
        t1 = best_of(base1, q)
        tn = best_of(staged, q)
        exp = math.log(tn / t1) / math.log(replicas)
        print(json.dumps({
            "query": q, "fixture": "token-suffixed",
            "t1_sec": round(t1, 3), f"t{replicas}_sec": round(tn, 3),
            "ratio": round(tn / t1, 3), "exponent": round(exp, 3),
        }), flush=True)


def run_containment(spark, replicas: int, passes: int) -> None:
    """Targeted x64 point for containment_join_prefix (verdict-r9
    item 6) on the linear-pair fixture, with measured candidate
    fan-out at both scales. Runs with ``broadcast_verify=True`` at
    BOTH scales (consistent plans): this fixture is candidate-dense
    (~23% of all pairs — templated short docs), so the sort-merge
    verify's array-laden pair shuffle exceeds the sandbox disk at x64;
    the broadcast plan is the right one whenever the hashed set table
    fits executor memory (~140 MB here)."""
    from providenciasbigdata_spark.operators.dedup import (
        containment_join_prefix,
    )

    base1 = stage_containment(spark, 1)   # suffixed x1 baseline
    staged = stage_containment(spark, replicas)
    print(f"[weak-cont] dirs: {base1} -> {staged}", file=sys.stderr)

    def best_of(sf_dir: str) -> float:
        docs = load_table(spark, sf_dir, "documents")
        docs.count()
        best = float("inf")
        for _ in range(passes):
            t0 = time.perf_counter()
            containment_join_prefix(
                docs, ngram=3, threshold=0.6, broadcast_verify=True
            ).write.format("noop").mode("overwrite").save()
            best = min(best, time.perf_counter() - t0)
            spark.catalog.clearCache()
        return best

    t1 = best_of(base1)
    tn = best_of(staged)
    exp = math.log(tn / t1) / math.log(replicas)
    c1 = _containment_candidates(spark, base1)
    cn = _containment_candidates(spark, staged)
    growth = cn["raw_candidates"] / max(c1["raw_candidates"], 1)
    cand_exp = math.log(growth) / math.log(replicas)
    print(json.dumps({
        "query": "containment_join_prefix", "fixture": "token-suffixed",
        "t1_sec": round(t1, 3), f"t{replicas}_sec": round(tn, 3),
        "exponent": round(exp, 3),
        "candidates_base": c1, "candidates_scaled": cn,
        "raw_candidate_growth": round(growth, 3),
        "candidate_exponent": round(cand_exp, 3),
    }), flush=True)


def _containment_candidates(spark, sf_dir: str) -> dict:
    """Measured candidate fan-out of the containment join (round 10,
    verdict-r9 item 6): one run with a rider Observation — raw
    token-match rows and approx distinct pairs, so prefix-filter
    fan-out growth is MEASURED at each scale, not inferred from wall
    time."""
    from pyspark.sql import Observation

    from providenciasbigdata_spark.operators.dedup import (
        containment_join_prefix,
    )

    docs = load_table(spark, sf_dir, "documents")
    obs = Observation()
    out = containment_join_prefix(
        docs, ngram=3, threshold=0.6, observation=obs, broadcast_verify=True
    )
    verified = out.count()
    return {**obs.get, "verified_pairs": verified}


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--replicas", type=int, default=8)
    ap.add_argument("--passes", type=int, default=2)
    ap.add_argument(
        "--graph", action="store_true",
        help="scale the similarity-graph bound instead of the tables",
    )
    ap.add_argument(
        "--only", type=str, default="",
        help="comma-separated subset of QUERIES to run (x64 spot runs)",
    )
    ap.add_argument(
        "--corpus", action="store_true",
        help="x{replicas} points for the document-corpus trio "
        f"({', '.join(_CORPUS_X64)}) on the isomorphic token-suffixed "
        "fixture (see run_corpus)",
    )
    ap.add_argument(
        "--containment", action="store_true",
        help="containment-only x{replicas} on the token-suffixed "
        "linear-pair fixture (the shared tag staging scales the TRUE "
        "pair structure quadratically — see stage_containment)",
    )
    args = ap.parse_args()
    if args.replicas < 2:
        # every path divides by log(replicas); guard before any staging
        # work is spent (ADVICE-r10: --containment --replicas 1 built
        # the x1 fixture then crashed with ZeroDivisionError)
        ap.error("--replicas must be >= 2 (exponent divides by log(replicas))")
    if args.only:
        only = [q.strip() for q in args.only.split(",") if q.strip()]
        unknown = [q for q in only if q not in QUERIES]
        if unknown:
            raise SystemExit(f"--only names not in QUERIES: {unknown}")
        QUERIES[:] = only

    spark = get_spark(
        app_name="weak-scaling",
        extra_conf={"spark.sql.codegen.cache.maxEntries": "5000"},
    )
    if args.graph:
        run_graph(spark, args.replicas, args.passes)
        spark.stop()
        return
    if args.containment:
        run_containment(spark, args.replicas, args.passes)
        spark.stop()
        return
    if args.corpus:
        run_corpus(spark, args.replicas, args.passes)
        spark.stop()
        return
    registry = all_queries()
    staged = stage_replicated(spark, args.replicas)
    print(f"[weak] staged {args.replicas}x dir: {staged}", file=sys.stderr)

    t1 = time_queries(spark, registry, SF_DIR, args.passes)
    t8 = time_queries(spark, registry, staged, args.passes)

    rows = []
    for q in QUERIES:
        exp = math.log(t8[q] / t1[q]) / math.log(args.replicas)
        rows.append((q, t1[q], t8[q], exp))
        print(json.dumps({
            "query": q, "t1_sec": round(t1[q], 3),
            f"t{args.replicas}_sec": round(t8[q], 3),
            "exponent": round(exp, 3),
        }), flush=True)

    print(f"\n| query | sf0.1 s | x{args.replicas} s | ratio | exponent |")
    print("|---|---|---|---|---|")
    for q, a, b, e in rows:
        print(f"| {q} | {a:.2f} | {b:.2f} | {b / a:.2f}x | {e:.2f} |")

    if "containment_join_prefix" in QUERIES:
        c1 = _containment_candidates(spark, SF_DIR)
        c2 = _containment_candidates(spark, staged)
        growth = c2["raw_candidates"] / max(c1["raw_candidates"], 1)
        cand_exp = math.log(growth) / math.log(args.replicas)
        print(json.dumps({
            "observation": "containment_candidates",
            "base": c1, "scaled": c2,
            "raw_candidate_growth": round(growth, 3),
            "candidate_exponent": round(cand_exp, 3),
        }), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
