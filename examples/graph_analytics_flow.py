"""Graph analytics over the similarity graph — the full centrality /
community / structure suite on one staged edge table.

The reference's graph page reads a single anchored 1-hop
(streamlit_app.py:60-64); this flow shows what the engine layers on
the SAME nodes/edges model once the similarity graph is materialized
ONCE (queries/fixtures.py::staged_similarity_edges — the 100 TB
pattern: build the graph one time, query it many times):

  1. structure  — connected components, k-core shells
  2. centrality — PageRank (damped walk), eigenvector (Bonacich),
                  seed-sampled betweenness (Brandes–Pich)
  3. community  — label propagation, checked against the components

Every algorithm is the one-join-plus-one-agg-per-iteration skeleton
with eager lineage truncation (operators/graph_algos.py); nothing here
collects row data to the driver beyond model-sized summaries. The flow
asserts cross-algorithm INVARIANTS rather than reprinting pins that
live in tests/:

  - every k-core member sits inside one connected component;
  - the max-PageRank node of each sizeable component has in-degree
    >= the component median (mass flows toward hubs);
  - eigenvector max-normalization really peaks at 1.0;
  - LPA communities refine components (no community spans two).

Usage:
    python examples/graph_analytics_flow.py [sf_dir]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from providenciasbigdata_spark.session import get_spark


def run(spark, sf_dir: str) -> dict:
    from providenciasbigdata_spark.operators.graph_algos import (
        betweenness_from_seeds,
        connected_components,
        eigenvector_centrality,
        kcore_decomposition,
        label_propagation,
        pagerank,
        symmetrize,
    )
    from providenciasbigdata_spark.queries.fixtures import (
        staged_similarity_edges,
    )

    edges = staged_similarity_edges(spark, sf_dir, 150).filter(
        F.col("similitud") >= 30.0
    )
    sym = symmetrize(edges).persist()
    n_edges = sym.count()
    print(f"[0] staged similarity graph: {n_edges} directed edge rows")

    # -- 1. structure ------------------------------------------------------
    cc = connected_components(edges).persist()
    comp_sizes = cc.groupBy("component").count()
    n_comp = comp_sizes.count()
    biggest = comp_sizes.agg(F.max("count")).first()[0]
    print(f"[1] components: {n_comp} (largest {biggest})")

    cores = kcore_decomposition(edges)
    kmax = cores.agg(F.max("core")).first()[0]
    print(f"[1] k-core shells up to k={kmax}")
    # invariant: core members are component members
    orphan = cores.join(cc, "id", "left_anti").count()
    assert orphan == 0, "k-core member outside every component"

    # -- 2. centrality -----------------------------------------------------
    pr = pagerank(edges, max_iter=5).persist()
    ev = eigenvector_centrality(edges, max_iter=4)
    peak = ev.agg(F.max("score")).first()[0]
    assert abs(peak - 1.0) < 1e-12, peak
    print(f"[2] eigenvector max-normalized peak = {peak}")

    top_pr = pr.orderBy(F.desc("rank")).limit(3).collect()
    print(f"[2] pagerank top-3: {[(r.id, round(r.rank, 5)) for r in top_pr]}")

    # hub invariant: in each component of >= 5 nodes, the max-rank
    # node's in-degree clears the component median in-degree
    indeg = sym.groupBy(F.col("v").alias("id")).agg(F.count("*").alias("deg"))
    ranked = pr.join(cc, "id").join(indeg, "id", "left").fillna(0, ["deg"])
    stats = ranked.groupBy("component").agg(
        F.count("*").alias("n"),
        F.expr("max_by(deg, rank)").alias("hub_deg"),
        F.expr("percentile(deg, 0.5)").alias("med_deg"),
    ).filter(F.col("n") >= 5)
    bad = stats.filter(F.col("hub_deg") < F.col("med_deg")).count()
    assert bad == 0, "a component's top-PageRank node is below median in-degree"
    print(f"[2] hub invariant holds on {stats.count()} sizeable components")

    seeds = [r.id for r in cc.orderBy("id").limit(8).collect()]
    bt = betweenness_from_seeds(edges, seeds)
    top_bt = bt.orderBy(F.desc(bt.columns[1])).limit(3).collect()
    print(f"[2] seed-sampled betweenness top-3: "
          f"{[(r[0], round(float(r[1]), 3)) for r in top_bt]}")

    # -- 3. community ------------------------------------------------------
    lpa = label_propagation(edges, n_rounds=8)
    n_comm = lpa.select("community").distinct().count()
    cross = (
        lpa.join(cc, "id")
        .groupBy("community")
        .agg(F.count_distinct("component").alias("k"))
        .filter(F.col("k") > 1)
        .count()
    )
    assert cross == 0, "an LPA community spans two components"
    print(f"[3] label propagation: {n_comm} communities "
          f"(every one inside a single component)")

    sym.unpersist()
    cc.unpersist()
    pr.unpersist()
    return {"n_components": n_comp, "k_max": int(kmax), "n_communities": n_comm}


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark(app_name="graph-analytics-flow")
    out = run(spark, sf_dir)
    print(f"[done] {out}")
    spark.stop()


if __name__ == "__main__":
    main()
