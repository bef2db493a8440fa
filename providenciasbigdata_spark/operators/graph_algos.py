"""Iterative graph algorithms over the nodes/edges DataFrame model.

The reference's graph surface is a single anchored 1-hop read
(streamlit_app.py:60-64); these are the engine-side analytics a
precomputed similarity graph enables. Both are driver-coordinated
fixed-point loops — the one legitimate use of driver-side control flow:
the driver holds only iteration counters and convergence counts, never
row data.

Scale notes: each iteration is one equi-join + one partial-agg shuffle,
both keyed on node id — a stable partitioning Catalyst reuses across
iterations. ``localCheckpoint`` every few rounds truncates the growing
lineage (otherwise plan size, not data, becomes the bottleneck).
GraphFrames/Pregel would be the library route; this stays dependency-free.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _truncator(df_session, checkpoint_dir):
    """Pick the per-iteration lineage-truncation strategy.

    ``localCheckpoint`` (default) stores blocks in executor storage —
    measured fastest locally (see pagerank docstring) but NOT
    fault-tolerant: at cluster scale an executor loss kills the job.
    Passing ``checkpoint_dir`` (an HDFS/S3/shared path) switches every
    truncation point to a RELIABLE ``checkpoint`` that survives
    executor loss — the production setting for long iterative jobs on
    preemptible fleets.
    """
    if checkpoint_dir is None:
        return lambda df: df.localCheckpoint(eager=True)
    df_session.sparkContext.setCheckpointDir(checkpoint_dir)
    return lambda df: df.checkpoint(eager=True)


def symmetrize(edges: DataFrame, src: str = "src", dst: str = "dst") -> DataFrame:
    """Undirected view of a directed edge list (deduped)."""
    fwd = edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
    rev = edges.select(F.col(dst).alias("u"), F.col(src).alias("v"))
    return fwd.union(rev).distinct()


def connected_components(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_iter: int = 50,
    checkpoint_every: int = 1,
    checkpoint_dir: str | None = None,
) -> DataFrame:
    """Connected components by min-label propagation with POINTER
    JUMPING to a fixed point.

    Every node's label converges to the smallest node id in its
    component (total order on ids = deterministic labels). Each
    iteration (a) takes the min label over every node's neighborhood,
    then (b) pointer-jumps ``label(v) <- label(label(v))`` — the
    hash-to-min accelerant from the MapReduce-CC literature — so
    convergence is O(log diameter) rounds instead of O(diameter):
    a 1000-hop chain resolves in ~10 rounds, not 1000. Each round is
    two equi-joins + one partial-agg shuffle, all keyed on node id.

    ``checkpoint_every`` defaults to 1 BY MEASUREMENT: the label frame
    is referenced multiple times per round (neighbor join, jump join,
    convergence diff), so deferring truncation doubles the plan per
    round — the same 2^k pathology pagerank documents (24.5s vs 7.9s
    for the 150-vector fixture graph at every-5).

    Output: (id, component).
    """
    # materialize the (possibly expensive) edge lineage ONCE — every
    # iteration re-reads it; without this the upstream build (e.g. a
    # pairwise cosine join) re-executes per iteration
    ckpt = _truncator(edges.sparkSession, checkpoint_dir)
    sym = symmetrize(edges, src, dst).persist()
    labels = (
        sym.select(F.col("u").alias("id"))
        .union(sym.select(F.col("v").alias("id")))
        .distinct()
        .withColumn("label", F.col("id"))
    )
    for i in range(max_iter):
        nbr_labels = (
            sym.join(labels.withColumnRenamed("id", "v"), "v")
            .select(F.col("u").alias("id"), "label")
        )
        new_labels = (
            labels.select("id", "label", F.col("label").alias("_old"))
            .unionByName(nbr_labels.withColumn("_old", F.lit(None).cast(
                labels.schema["label"].dataType)))
            .groupBy("id")
            .agg(F.min("label").alias("label"), F.min("_old").alias("_old"))
        )
        # pointer jump: follow the label one more step (labels are node
        # ids, so every label has a row). Left join + coalesce guards
        # the iteration-order edge where a label's own row was pruned.
        jump_map = new_labels.select(
            F.col("id").alias("label"), F.col("label").alias("_label2")
        )
        new_labels = new_labels.join(jump_map, "label", "left").select(
            "id", F.coalesce("_label2", "label").alias("label"), "_old"
        )
        if (i + 1) % checkpoint_every == 0:
            new_labels = ckpt(new_labels)
        # convergence diff rides the SAME materialized frame (the old
        # label was carried through the aggregate) — no extra join job
        changed = new_labels.filter(F.col("label") != F.col("_old")).count()
        labels = new_labels.select("id", "label")
        if changed == 0:
            break
    out = ckpt(labels.select("id", F.col("label").alias("component")))
    sym.unpersist()
    return out


def bfs_distances(
    edges: DataFrame,
    anchor,
    src: str = "src",
    dst: str = "dst",
    max_hops: int = 10,
    directed: bool = True,
    checkpoint_dir: str | None = None,
) -> DataFrame:
    """Hop distances from one anchor node — frontier-expansion BFS.
    Generalizes the reference's 1-hop page (streamlit_app.py:60-64) and
    our 2-hop query to arbitrary depth without the O(edges^k) blowup of
    chained joins: each iteration joins only the CURRENT FRONTIER
    against the edge list (frontier sizes are graph-width-bounded) and
    anti-joins the visited set, so every node is expanded once.

    Output: (id, hops) for every node reachable within ``max_hops``
    (anchor included at 0).
    """
    e = edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
    if not directed:
        e = symmetrize(edges, src, dst)
    e = e.persist()
    spark = edges.sparkSession
    ckpt = _truncator(spark, checkpoint_dir)
    visited = spark.createDataFrame([(anchor, 0)], "id string, hops int")
    # fixture node ids are strings ("P-7"); cast to match arbitrary types
    visited = visited.withColumn("id", F.col("id").cast(e.schema["u"].dataType))
    frontier = visited.select("id")
    for hop in range(1, max_hops + 1):
        nxt = (
            e.join(frontier.withColumnRenamed("id", "u"), "u")
            .select(F.col("v").alias("id"))
            .distinct()
            .join(visited, "id", "left_anti")
            .withColumn("hops", F.lit(hop))
        )
        nxt = ckpt(nxt)  # truncate lineage per level

        if nxt.isEmpty():
            break
        visited = visited.union(nxt)
        frontier = nxt.select("id")
    out = ckpt(visited)
    e.unpersist()
    return out


def pagerank(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    damping: float = 0.85,
    max_iter: int = 10,
    checkpoint_dir: str | None = None,
    checkpoint_every: int = 1,
) -> DataFrame:
    """Power-iteration PageRank on the directed graph.

    Dangling nodes (no out-edges) redistribute uniformly via a 1-row
    broadcast aggregate folded INTO the update plan, and each iteration
    ends in ONE eager lineage checkpoint — one job per iteration,
    versus the two the round-2 version ran (a dangling-scalar collect()
    plus the update job). The checkpoint is per-iteration by
    measurement, not taste: the update references the previous ranks
    twice (contribs + dangling), so deferring truncation doubles the
    plan per step (2^k growth — 9.4s vs ~1s for 5 fixture iterations),
    and caching each level lazily instead measured 3x worse again
    (13-16s: every broadcast build materializes through the cache
    chain). Fixed iteration count — the usual production choice
    (convergence tests belong in offline validation, not the hot
    loop).

    Output: (id, rank); ranks sum to ~1.
    """
    ckpt = _truncator(edges.sparkSession, checkpoint_dir)
    e = edges.select(F.col(src).alias("u"), F.col(dst).alias("v")).distinct().persist()
    nodes = (
        e.select(F.col("u").alias("id")).union(e.select(F.col("v").alias("id")))
        .distinct().persist()
    )
    n = nodes.count()
    out_deg = e.groupBy("u").agg(F.count("*").alias("deg")).persist()
    ranks = nodes.withColumn("rank", F.lit(1.0 / n))
    for i in range(max_iter):
        contribs = (
            e.join(ranks.withColumnRenamed("id", "u"), "u")
            .join(out_deg, "u")
            .select(F.col("v").alias("id"), (F.col("rank") / F.col("deg")).alias("c"))
            .groupBy("id")
            .agg(F.sum("c").alias("inflow"))
        )
        # dangling mass as a lazy 1-row frame, broadcast into the update
        # (arithmetic keeps the scalar version's association order:
        # base = (1-d)/n + d*dangling/n, then + d*inflow)
        dangling = (
            ranks.join(out_deg.withColumnRenamed("u", "id"), "id", "left_anti")
            .agg(F.coalesce(F.sum("rank"), F.lit(0.0)).alias("_dangling"))
        )
        base = (
            F.lit((1.0 - damping) / n)
            + F.lit(damping) * F.col("_dangling") / F.lit(float(n))
        )
        ranks = (
            nodes.join(contribs, "id", "left")
            .crossJoin(F.broadcast(dangling))
            .select(
                "id",
                (base + F.lit(damping) * F.coalesce(F.col("inflow"), F.lit(0.0))).alias("rank"),
            )
        )
        # checkpoint_every=1 by measurement (see docstring); the r02
        # keyword is still honored for callers that tuned it
        if (i + 1) % checkpoint_every == 0 or i == max_iter - 1:
            ranks = ckpt(ranks)  # the iteration's ONE job
    for df in (e, nodes, out_deg):
        df.unpersist()
    return ranks


def personalized_pagerank(
    edges: DataFrame,
    seeds: list,
    src: str = "src",
    dst: str = "dst",
    damping: float = 0.85,
    max_iter: int = 10,
    checkpoint_dir: str | None = None,
) -> DataFrame:
    """Personalized PageRank: the teleport distribution concentrates on
    ``seeds`` (uniform over the seed set) instead of all nodes, so rank
    measures proximity TO the seeds — the standard similar-item /
    recommendation primitive over a similarity graph.

    Same one-job-per-iteration shape as ``pagerank`` (contribs join +
    agg, dangling mass folded in as a broadcast 1-row aggregate — in
    PPR dangling mass teleports back through the seed distribution),
    same per-iteration eager lineage truncation, same reliable-
    checkpoint escape hatch. Output: (id, rank); ranks sum to ~1 and
    are 0 for nodes unreachable from the seed set.
    """
    if not seeds:
        raise ValueError("personalized_pagerank needs a non-empty seed set")
    ckpt = _truncator(edges.sparkSession, checkpoint_dir)
    e = edges.select(F.col(src).alias("u"), F.col(dst).alias("v")).distinct().persist()
    nodes = (
        e.select(F.col("u").alias("id")).union(e.select(F.col("v").alias("id")))
        .distinct().persist()
    )
    out_deg = e.groupBy("u").agg(F.count("*").alias("deg")).persist()
    p = F.when(F.col("id").isin(list(seeds)), F.lit(1.0 / len(seeds))).otherwise(
        F.lit(0.0)
    )
    ranks = nodes.withColumn("rank", p)
    for _ in range(max_iter):
        contribs = (
            e.join(ranks.withColumnRenamed("id", "u"), "u")
            .join(out_deg, "u")
            .select(F.col("v").alias("id"), (F.col("rank") / F.col("deg")).alias("c"))
            .groupBy("id")
            .agg(F.sum("c").alias("inflow"))
        )
        dangling = (
            ranks.join(out_deg.withColumnRenamed("u", "id"), "id", "left_anti")
            .agg(F.coalesce(F.sum("rank"), F.lit(0.0)).alias("_dangling"))
        )
        base = (
            F.lit(1.0 - damping) * p
            + F.lit(damping) * F.col("_dangling") * p
        )
        ranks = ckpt(
            nodes.join(contribs, "id", "left")
            .crossJoin(F.broadcast(dangling))
            .select(
                "id",
                (base + F.lit(damping) * F.coalesce(F.col("inflow"), F.lit(0.0))).alias("rank"),
            )
        )
    for df in (e, nodes, out_deg):
        df.unpersist()
    return ranks


def sssp_distances(
    edges: DataFrame,
    anchor,
    src: str = "src",
    dst: str = "dst",
    weight: str = "w",
    max_hops: int = 4,
    checkpoint_dir: str | None = None,
) -> DataFrame:
    """Weighted single-source shortest paths, hop-bounded Bellman-Ford:
    after iteration h, ``d(v)`` is the minimum total weight over paths
    of <= h edges (the well-defined objective on cyclic graphs without
    running to full convergence). Each iteration is one equi-join of the
    edge list against the current distance table plus a min-aggregate —
    no path enumeration, state is one row per reached node.

    FP note: min-then-extend equals enumerate-then-min bit-for-bit
    because IEEE addition is monotonic (a <= b implies a+w <= b+w), so
    a path-enumerating oracle reproduces these doubles exactly.

    Output: (id, d) for every node reachable within ``max_hops`` edges,
    anchor at 0.0.
    """
    e = edges.select(
        F.col(src).alias("u"), F.col(dst).alias("v"), F.col(weight).alias("w")
    ).persist()
    spark = edges.sparkSession
    ckpt = _truncator(spark, checkpoint_dir)
    dist = spark.createDataFrame([(str(anchor), 0.0)], "id string, d double")
    dist = dist.withColumn("id", F.col("id").cast(e.schema["u"].dataType))
    for _ in range(max_hops):
        relaxed = e.join(
            dist.withColumnRenamed("id", "u").withColumnRenamed("d", "du"), "u"
        ).select(F.col("v").alias("id"), (F.col("du") + F.col("w")).alias("d"))
        dist = (
            dist.unionByName(relaxed)
            .groupBy("id")
            .agg(F.min("d").alias("d"))
        )
        dist = ckpt(dist)
    e.unpersist()
    return dist
