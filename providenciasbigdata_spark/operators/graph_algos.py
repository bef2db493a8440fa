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
        return lambda df, eager=True: df.localCheckpoint(eager=eager)
    df_session.sparkContext.setCheckpointDir(checkpoint_dir)
    return lambda df, eager=True: df.checkpoint(eager=eager)


def _cast_like(spark, dtype, value):
    """Coerce a python anchor/target value through the SAME Spark cast
    the distributed loops apply to their seed frames (string -> edge id
    type), so the driver finishers key their dicts with values equal to
    the collected edge ids (ADVICE r13: a string anchor over long ids
    otherwise silently misses every adjacency lookup). One local-
    relation job; callers gate it behind a python-type-mismatch check
    so the common matched-type path pays nothing."""
    if value is None:
        return None
    return (
        spark.createDataFrame([(str(value),)], "v string")
        .select(F.col("v").cast(dtype))
        .first()[0]
    )


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
    small_cutover: int = 200_000,
) -> DataFrame:
    """Connected components by alternating LARGE-STAR / SMALL-STAR
    edge contraction (Kiveris et al., "Connected Components in
    MapReduce and Beyond", SoCC'14): provably O(log^2 n) rounds and
    O(log n) in practice, versus the min-label-propagation +
    pointer-jump loop this replaces, whose front crawls ONE hop per
    round past star-shaped label clusters (measured: 17 rounds on the
    62-node / diameter-19 fixture component where star contraction
    takes 6 — pointer jumps gain nothing once every local label points
    at a hub that hasn't heard the global min yet).

    Each round rewrites the edge set. Large-star links every node's
    strictly-greater neighbors to the neighborhood min — which also
    tames skewed high-degree nodes, as their neighborhoods collapse
    onto the local min immediately; small-star links the not-greater
    neighbors (and the node) to it. At the fixed point each component
    is a star centered at its min id (total order on ids =
    deterministic labels). Convergence = the contracted edge set stops
    changing, checked as (count, two independent 64-bit hash sums)
    riding the round's one materializing aggregate: a stable triple is
    accepted as set equality (collision odds < 2^-120; ``max_iter``
    bounds the loop regardless).

    Small-subproblem cutover (the same FW-BW-style finisher
    ``strongly_connected_components`` uses): when the normalized edge
    set fits the driver (``small_cutover`` edges, ~3 MB at the
    default) the fixed point resolves with sequential union-find
    instead — a fixed-point loop over a tiny edge set pays per-round
    scheduling + plan-analysis latency for sub-millisecond compute.
    Labels are identical by construction (min id of each component);
    the distributed loop stays pytest-pinned via ``small_cutover=0``.

    Output: (id, component), one row per node incident to an edge.
    """
    spark = edges.sparkSession
    ckpt = _truncator(spark, checkpoint_dir)

    def star(e: DataFrame, large: bool) -> DataFrame:
        # (node=u, neighbor=v) in both directions; m(u) = min(N(u)+{u})
        bidir = e.select("u", "v").union(
            e.select(F.col("v").alias("u"), F.col("u").alias("v"))
        )
        mins = (
            bidir.groupBy("u").agg(F.min("v").alias("_mv"))
            .select("u", F.least("u", "_mv").alias("m"))
        )
        if large:
            cand = bidir.filter(F.col("v") > F.col("u"))
        else:
            cand = bidir.filter(F.col("v") <= F.col("u")).union(
                mins.select("u", F.col("u").alias("v"))
            )
        # join co-partitioned with the groupBy (same key u): the
        # exchange is reused, so each star op is ~2 exchange waves
        linked = cand.join(mins, "u").filter(F.col("v") != F.col("m"))
        return linked.select(
            F.least("v", "m").alias("u"), F.greatest("v", "m").alias("v")
        ).distinct()

    nodes = (
        edges.select(F.col(src).alias("id"))
        .union(edges.select(F.col(dst).alias("id")))
        .distinct()
    )
    # materialize the (possibly expensive) edge lineage ONCE — round 1
    # reads it twice (mins + cand); without this the upstream build
    # (e.g. a pairwise cosine join) re-executes
    cur = ckpt(
        edges.select(
            F.least(F.col(src), F.col(dst)).alias("u"),
            F.greatest(F.col(src), F.col(dst)).alias("v"),
        )
        .filter(F.col("u") != F.col("v"))
        .distinct()
    )
    if small_cutover and cur.count() <= small_cutover:
        comp = _union_find_cc([(r["u"], r["v"]) for r in cur.collect()])
        labels = spark.createDataFrame(
            sorted(comp.items()),
            schema=cur.select(
                F.col("u").alias("id"), F.col("u").alias("component")
            ).schema,
        )
        return nodes.join(labels, "id", "left").select(
            "id", F.coalesce("component", F.col("id")).alias("component")
        )
    prev_sig = None
    for i in range(max_iter):
        cur = star(star(cur, large=True), large=False)
        # LAZY truncation fused with the convergence signature: the
        # aggregate below materializes the checkpoint blocks, so each
        # round runs ONE job (eager-ckpt + separate check measured 2x
        # the wall time on job-overhead-bound fixture graphs)
        if (i + 1) % checkpoint_every == 0:
            cur = ckpt(cur, eager=False)
        sig = tuple(
            cur.agg(
                F.count("*"),
                F.sum(F.xxhash64("u", "v").cast("decimal(38,0)")),
                F.sum(F.xxhash64(F.lit(7), "u", "v").cast("decimal(38,0)")),
            ).first()
        )
        if sig == prev_sig:
            break
        prev_sig = sig
    # fixed point: every edge is (component_min, member); nodes whose
    # edges were all self-loops fall back to their own id
    labels = cur.select(F.col("u").alias("id"), F.col("u").alias("component")).union(
        cur.select(F.col("v").alias("id"), F.col("u").alias("component"))
    ).distinct()
    return nodes.join(labels, "id", "left").select(
        "id", F.coalesce("component", F.col("id")).alias("component")
    )


def bfs_distances(
    edges: DataFrame,
    anchor,
    src: str = "src",
    dst: str = "dst",
    max_hops: int = 10,
    directed: bool = True,
    checkpoint_dir: str | None = None,
    target=None,
    small_cutover: int = 200_000,
) -> DataFrame:
    """Hop distances from one anchor node — frontier-expansion BFS.
    Generalizes the reference's 1-hop page (streamlit_app.py:60-64) and
    our 2-hop query to arbitrary depth without the O(edges^k) blowup of
    chained joins: each iteration joins only the CURRENT FRONTIER
    against the edge list (frontier sizes are graph-width-bounded) and
    anti-joins the visited set, so every node is expanded once.

    ``target``: stop expanding as soon as this node is reached (its
    minimum hop count is final the level it first appears — BFS level
    order), the shortestPath(a, b) case: levels beyond the target's
    are pure waste, so the saving is (cap - target_hops) levels — e.g.
    a 7-hop target under a 30-hop cap skips 23 join rounds; a target
    outside the component saves nothing (the frontier must drain to
    prove unreachability). The check rides the level's already-
    materialized frontier; all-distances callers just omit it.

    Output: (id, hops) for every node reachable within ``max_hops``
    (anchor included at 0); with ``target``, complete only up to the
    target's level.
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

    if small_cutover and e.count() <= small_cutover:
        # driver finisher (round 13 — the SCC/CC/pagerank small-
        # subproblem pattern, guide §1.2: a fixed-point loop over a
        # tiny graph pays per-round scheduling latency for sub-ms
        # compute). Hop counts are integers, so the python
        # level-synchronous BFS reproduces the distributed loop's
        # answer EXACTLY — including the target truncation (stop after
        # completing the level where the target appears). Pinned equal
        # via small_cutover=0 in tests/test_graph_cutover.py.
        rows = e.collect()
        e.unpersist()
        if not rows:
            # no edges: the anchor alone at hop 0, typed by the same
            # cast the distributed path applies
            return visited
        # ADVICE r13: the distributed loop casts the anchor to the edge
        # id type (visited above); the python finisher must key its
        # dicts with the SAME coerced value or a string anchor over
        # non-string ids silently returns anchor-only results. The
        # one-row local job runs only on a type mismatch.
        if type(anchor) is not type(rows[0]["u"]):
            anchor = visited.first()["id"]
        if target is not None and type(target) is not type(rows[0]["u"]):
            target = _cast_like(spark, e.schema["u"].dataType, target)
        adj: dict = {}
        for r in rows:
            adj.setdefault(r["u"], []).append(r["v"])
        hops = {anchor: 0}
        level = [anchor]
        for hop in range(1, max_hops + 1):
            nxt = {v for u in level for v in adj.get(u, ()) if v not in hops}
            if not nxt:
                break
            for v in nxt:
                hops[v] = hop
            level = list(nxt)
            if target is not None and target in nxt:
                break
        return spark.createDataFrame(sorted(hops.items()), schema=visited.schema)

    for hop in range(1, max_hops + 1):
        nxt = (
            e.join(frontier.withColumnRenamed("id", "u"), "u")
            .select(F.col("v").alias("id"))
            .distinct()
            .join(visited, "id", "left_anti")
            .withColumn("hops", F.lit(hop))
        )
        # LAZY truncation (round 13): the stats aggregate below is the
        # level's ONLY job — it materializes the localCheckpoint blocks
        # as a side effect (the former eager ckpt ran a separate
        # materialization job per level, 2 jobs/level -> 1)
        nxt = ckpt(nxt, eager=False)

        # frontier size and target hits ride the same aggregate
        stats = nxt.agg(
            F.count(F.lit(1)).alias("n"),
            F.count(
                F.when(F.col("id") == F.lit(target), 1)
            ).alias("t") if target is not None else F.lit(0).alias("t"),
        ).first()
        if stats["n"] == 0:
            break
        visited = visited.union(nxt)
        frontier = nxt.select("id")
        if target is not None and stats["t"] > 0:
            break
    out = ckpt(visited)
    e.unpersist()
    return out


def shortest_path_sigma(
    edges: DataFrame,
    anchor,
    target,
    src: str = "src",
    dst: str = "dst",
    max_hops: int = 30,
    directed: bool = False,
    checkpoint_dir: str | None = None,
    small_cutover: int = 200_000,
) -> DataFrame:
    """Length of the shortest anchor->target path AND the number of
    distinct shortest paths (Cypher's ``allShortestPaths`` cardinality)
    — Brandes' forward sigma pass restricted to one seed: BFS levels
    carry ``sigma(v)`` = number of shortest anchor->v paths, each level
    one frontier-edge join + grouped SUM + visited anti-join (level
    frames are frontier-sized, never the graph), early exit at the
    target's level (its sigma is complete the level it first appears —
    BFS level order; shortest paths cannot revisit a node, so walk
    counting and simple-path counting agree at the minimum depth).

    Output: one row (hops BIGINT, sigma BIGINT), or an empty frame if
    the target is unreachable within ``max_hops``.

    Multigraph semantics (ADVICE-r8): parallel relationships between
    the same node pair are NOT collapsed — Neo4j's allShortestPaths
    yields one path per relationship-distinct route, so each edge
    carries its multiplicity and the level sum propagates
    ``sigma * mult`` instead of deduping. Undirected multiplicity is
    the MAX of the two directions' row counts, not their sum: the
    engine's undirected edge frames (e.g. the cosine similarity graph)
    redundantly store BOTH orientations of one logical edge, and
    summing would double every path count; a frame that stores each
    undirected relationship once keeps its duplicates counted.
    """
    fwd = edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
    if directed:
        e = fwd.groupBy("u", "v").agg(F.count(F.lit(1)).alias("mult"))
    else:
        cnt = fwd.groupBy("u", "v").agg(F.count(F.lit(1)).alias("c"))
        e = (
            cnt.union(cnt.select(F.col("v").alias("u"), F.col("u").alias("v"), "c"))
            .groupBy("u", "v")
            .agg(F.max("c").alias("mult"))
        )
    e = e.persist()
    spark = edges.sparkSession
    ckpt = _truncator(spark, checkpoint_dir)
    level = spark.createDataFrame([(anchor, 1)], "id string, sigma long")
    level = level.withColumn("id", F.col("id").cast(e.schema["u"].dataType))
    visited = level.select("id")
    if anchor == target:
        e.unpersist()
        return spark.createDataFrame(
            [(0, 1)], "hops long, sigma long"
        )

    if small_cutover and e.count() <= small_cutover:
        # driver finisher (round 13 — SCC/CC/pagerank pattern): sigma
        # counting is integer arithmetic over the SAME level-
        # synchronous expansion, so the python loop is exact; pinned
        # equal via small_cutover=0 in tests/test_graph_cutover.py
        # (including the multigraph multiplicity contract — the mult
        # table is computed by the Spark aggregate above either way).
        rows = e.collect()
        e.unpersist()
        if not rows:
            return spark.createDataFrame([], "hops long, sigma long")
        # ADVICE r13: key the python dicts with the SAME cast values the
        # distributed loop compares (string anchor/target over non-string
        # ids otherwise reports the target unreachable). Mismatch-gated.
        if type(anchor) is not type(rows[0]["u"]):
            anchor = level.first()["id"]
        if type(target) is not type(rows[0]["u"]):
            target = _cast_like(spark, e.schema["u"].dataType, target)
        adj: dict = {}
        for r in rows:
            adj.setdefault(r["u"], []).append((r["v"], int(r["mult"])))
        seen = {anchor}
        frontier = {anchor: 1}
        for hop in range(1, max_hops + 1):
            nxt: dict = {}
            for u, su in frontier.items():
                for v, mult in adj.get(u, ()):
                    if v not in seen:
                        nxt[v] = nxt.get(v, 0) + su * mult
            if not nxt:
                break
            if target in nxt:
                return spark.createDataFrame(
                    [(hop, int(nxt[target]))], "hops long, sigma long"
                )
            seen.update(nxt)
            frontier = nxt
        return spark.createDataFrame([], "hops long, sigma long")

    for hop in range(1, max_hops + 1):
        nxt = (
            e.join(level.withColumnRenamed("id", "u"), "u")
            .groupBy(F.col("v").alias("id"))
            .agg(F.sum(F.col("sigma") * F.col("mult")).alias("sigma"))
            .join(visited, "id", "left_anti")
        )
        # LAZY truncation (round 13): the stats aggregate is the
        # level's only job and materializes the checkpoint blocks
        # itself (was 2 jobs/level)
        nxt = ckpt(nxt, eager=False)
        # frontier size + the target's sigma in one aggregate
        stats = nxt.agg(
            F.count(F.lit(1)).alias("n"),
            F.max(
                F.when(F.col("id") == F.lit(target), F.col("sigma"))
            ).alias("t"),
        ).first()
        if stats["n"] == 0:
            break
        if stats["t"] is not None:
            e.unpersist()
            return spark.createDataFrame(
                [(hop, int(stats["t"]))], "hops long, sigma long"
            )
        visited = visited.union(nxt.select("id"))
        level = nxt
    e.unpersist()
    return spark.createDataFrame([], "hops long, sigma long")


def pagerank(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    damping: float = 0.85,
    max_iter: int = 10,
    checkpoint_dir: str | None = None,
    checkpoint_every: int = 1,
    weight_col: str | None = None,
    small_cutover: int = 200_000,
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
    if weight_col is None:
        e = (
            edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
            .distinct()
            .withColumn("w", F.lit(1.0))
            .persist()
        )
    else:
        # WEIGHTED transitions: probability of following an edge is its
        # weight over the source's total out-weight — the similarity-
        # graph random walk (heavier SIMILAR edges pull more rank).
        # Parallel edges collapse by SUM of weights; non-positive
        # weights are dropped (they carry no transition probability).
        e = (
            edges.filter(F.col(weight_col) > 0)
            .groupBy(F.col(src).alias("u"), F.col(dst).alias("v"))
            .agg(F.sum(F.col(weight_col).cast("double")).alias("w"))
            .persist()
        )
    nodes = (
        e.select(F.col("u").alias("id")).union(e.select(F.col("v").alias("id")))
        .distinct().persist()
    )
    n = nodes.count()
    if small_cutover and e.count() <= small_cutover:
        # small-subproblem finisher (the SCC/CC/k-means pattern): the
        # SAME power-iteration arithmetic in numpy — each distributed
        # iteration otherwise pays a join+agg+broadcast of scheduling
        # latency for microseconds of math. Summation order differs at
        # ~1e-15/iteration, far inside the 6-digit round every consumer
        # applies; the distributed loop stays pytest-forced via
        # ``small_cutover=0``.
        import numpy as np

        rows = e.collect()
        e.unpersist()
        nodes.unpersist()
        ids = sorted({r["u"] for r in rows} | {r["v"] for r in rows})
        ix = {v: i for i, v in enumerate(ids)}
        usrc = np.array([ix[r["u"]] for r in rows], dtype=np.int64)
        vdst = np.array([ix[r["v"]] for r in rows], dtype=np.int64)
        w = np.array([r["w"] for r in rows], dtype=np.float64)
        deg = np.zeros(n)
        np.add.at(deg, usrc, w)
        rank = np.full(n, 1.0 / n)
        for _ in range(max_iter):
            contrib = rank[usrc] * w / deg[usrc]
            inflow = np.bincount(vdst, weights=contrib, minlength=n)
            dangling = float(rank[deg == 0].sum())
            base = (1.0 - damping) / n + damping * dangling / n
            rank = base + damping * inflow
        spark = edges.sparkSession
        return spark.createDataFrame(
            list(zip(ids, [float(x) for x in rank])),
            schema=edges.select(
                F.col(src).alias("id"), F.lit(0.0).alias("rank")
            ).schema,
        )
    out_deg = e.groupBy("u").agg(F.sum("w").alias("deg")).persist()
    ranks = nodes.withColumn("rank", F.lit(1.0 / n))
    for i in range(max_iter):
        contribs = (
            e.join(ranks.withColumnRenamed("id", "u"), "u")
            .join(out_deg, "u")
            .select(
                F.col("v").alias("id"),
                (F.col("rank") * F.col("w") / F.col("deg")).alias("c"),
            )
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
    small_cutover: int = 200_000,
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
    if small_cutover and e.count() <= small_cutover:
        # same driver finisher as pagerank's, seed-concentrated teleport
        # (arithmetic mirrors the Column expressions term for term)
        import numpy as np

        rows = e.collect()
        e.unpersist()
        nodes.unpersist()
        ids = sorted({r["u"] for r in rows} | {r["v"] for r in rows})
        ix = {v: i for i, v in enumerate(ids)}
        n = len(ids)
        usrc = np.array([ix[r["u"]] for r in rows], dtype=np.int64)
        vdst = np.array([ix[r["v"]] for r in rows], dtype=np.int64)
        deg = np.zeros(n)
        np.add.at(deg, usrc, 1.0)
        pvec = np.zeros(n)
        for s in seeds:
            if s in ix:
                pvec[ix[s]] = 1.0 / len(seeds)
        rank = pvec.copy()
        for _ in range(max_iter):
            contrib = rank[usrc] / deg[usrc]
            inflow = np.bincount(vdst, weights=contrib, minlength=n)
            dangling = float(rank[deg == 0].sum())
            rank = (1.0 - damping) * pvec + damping * dangling * pvec + damping * inflow
        spark = edges.sparkSession
        return spark.createDataFrame(
            list(zip(ids, [float(x) for x in rank])),
            schema=edges.select(
                F.col(src).alias("id"), F.lit(0.0).alias("rank")
            ).schema,
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
    small_cutover: int = 200_000,
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

    if small_cutover and e.count() <= small_cutover:
        # driver finisher (round 13 — SCC/CC/pagerank pattern): the
        # SAME synchronous min-then-extend rounds in IEEE doubles, so
        # distances are BIT-IDENTICAL to the distributed loop (python
        # floats are IEEE doubles; min over the same candidate set is
        # order-independent). A converged round changes nothing, so the
        # exact-equality early exit cannot change the answer — it only
        # skips no-op rounds the distributed loop still pays. Pinned
        # equal (exact float compare) in tests/test_graph_cutover.py.
        rows = e.collect()
        e.unpersist()
        if not rows:
            return dist  # anchor alone, typed by the distributed cast
        # ADVICE r13: coerce the anchor to the collected id type (the
        # distributed loop casts it; a string anchor over long ids
        # would otherwise relax nothing). Mismatch-gated local job.
        if type(anchor) is not type(rows[0]["u"]):
            anchor = dist.first()["id"]
        dd = {anchor: 0.0}
        for _ in range(max_hops):
            new = dict(dd)
            for r in rows:
                u = r["u"]
                if u in dd:
                    du = dd[u]
                    # mirror the min-aggregate's null handling (ADVICE
                    # r13): a null weight (or a null upstream distance)
                    # yields a null candidate, which never beats a real
                    # distance but does mark the node reached — exactly
                    # what unionByName + F.min produce distributedly.
                    w = r["w"]
                    cand = du + w if du is not None and w is not None else None
                    v = r["v"]
                    if v not in new:
                        new[v] = cand
                    else:
                        cur = new[v]
                        if cand is not None and (cur is None or cand < cur):
                            new[v] = cand
            if new == dd:
                break
            dd = new
        return spark.createDataFrame(sorted(dd.items()), schema=dist.schema)

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


def kcore_decomposition(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_iter: int = 100,
    checkpoint_every: int = 1,
    checkpoint_dir: str | None = None,
) -> DataFrame:
    """Core number (coreness) for every node by H-INDEX ITERATION
    (Lu, Zhou, Zhang, Stanley, "The H-index of a network node and its
    relation to degree and coreness", Nat. Commun. 2016): initialize
    h(v) = degree(v), then repeatedly set h(v) to the h-index of its
    neighbors' current h values. The sequence is monotone
    non-increasing and its unique fixed point is exactly the k-core
    number — no sequential peeling order, so every node updates in
    parallel each round (the peeling algorithm's "remove min-degree
    nodes one k at a time" outer loop disappears).

    One round = one shuffle join (attach neighbor h) + one aggregate;
    the h-index itself is an array fold over each node's neighbor-h
    multiset: sort desc, count positions where h[i] >= i+1 — JVM-side
    lambda, no UDF. Convergence is checked as an unchanged SUM(h)
    riding the round's aggregate (h is monotone non-increasing per
    node, so a stable sum IS elementwise stability, no hash needed).

    Output: (id, core BIGINT), one row per node incident to >= 1
    non-loop edge. Deterministic: the fixed point is unique.

    Scale: per-round cost is one hash join on node id + a groupBy —
    both partition on the same key, so AQE reuses the exchange; skewed
    hub nodes cost O(degree log degree) in the local sort, bounded by
    the same collect_list ceiling as any neighborhood aggregate (for
    degree >> 10^6 swap the sort-fold for a bucketed counting h-index;
    same contract).
    """
    ckpt = _truncator(edges.sparkSession, checkpoint_dir)
    bidir = (
        edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
        .filter(F.col("u") != F.col("v"))
        .union(
            edges.select(F.col(dst).alias("u"), F.col(src).alias("v")).filter(
                F.col("u") != F.col("v")
            )
        )
        .distinct()
    )
    bidir = ckpt(bidir)  # read every round: truncate the upstream build once
    h = bidir.groupBy("u").agg(F.count("*").cast("long").alias("h"))
    def one_round(hcur):
        nbr = bidir.join(
            hcur.select(F.col("u").alias("v"), F.col("h").alias("nh")), "v"
        ).select("u", "nh")
        return nbr.groupBy("u").agg(
            F.size(
                F.filter(
                    F.sort_array(F.collect_list("nh"), asc=False),
                    lambda x, idx: x >= idx + 1,
                )
            )
            .cast("long")
            .alias("h")
        )

    # two rounds per materializing job: unlike CC's star() (which reads
    # its input twice — lazy chaining there explodes recompute, see
    # STATUS), each h-round consumes h exactly ONCE, so chaining two
    # rounds only deepens the plan linearly and halves the action
    # count. Convergence still detected (fixed point is stable under
    # further rounds); overshoot is at most one cheap extra round.
    prev_sum = None
    for i in range(0, max_iter, 2):
        h = one_round(one_round(h))
        if (i + 2) % checkpoint_every == 0 or checkpoint_every == 1:
            h = ckpt(h, eager=False)
        s = h.agg(F.sum("h")).first()[0]
        if s == prev_sum:
            break
        prev_sum = s
    return h.select(F.col("u").alias("id"), F.col("h").alias("core"))


def strongly_connected_components(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_outer: int = 20,
    max_prop: int = 50,
    checkpoint_dir: str | None = None,
    loop_shuffle_partitions: int = 4,
    small_cutover: int = 200_000,
) -> DataFrame:
    """Strongly connected components of a DIRECTED graph by the
    trim + forward-coloring + backward-membership algorithm (Orzan's
    coloring, the shape Slota et al. 2014 parallelize; completes the
    graph family where ``connected_components`` answers the undirected
    question only), with the standard FW-BW small-subproblem cutover:
    once the still-active edge set fits the driver
    (``small_cutover`` edges, ~3 MB at the default), finish with
    sequential iterative Tarjan — exactly what parallel SCC systems do
    (Slota et al.; Hong et al. 2013), because a fixed-point loop over
    a tiny remnant pays per-round scheduling + plan-analysis latency
    (measured ~0.5 s/round here) for sub-millisecond compute. The
    distributed loops below are the >cutover path and stay pytest-
    pinned via ``small_cutover=0``; both paths produce identical
    labels by construction (min id of the SCC):

    Per outer round, over the still-active subgraph:

    1. TRIM (to fixpoint): a node with no incoming or no outgoing
       active edge is its own singleton SCC — resolved without any
       propagation (the vast majority of nodes in real graphs).
    2. COLOR forward (to fixpoint): color(v) = max(v, colors of
       in-neighbors) — after convergence color(v) is the largest id
       that can reach v, so each color class is closed under forward
       reachability from its ROOT r (the node with color(r) == r).
    3. BACKWARD membership (to fixpoint): within one color, mark the
       nodes that can reach their root through same-color nodes;
       root reaches them (step 2) and they reach root => marked set
       == SCC(root). All colors resolve simultaneously. Marked nodes
       retire; the outer loop continues on what remains.

    Every outer round retires at least every color root, so the loop
    terminates; ``max_outer``/``max_prop`` bound it regardless. Each
    propagation round is one equi-join + partial-agg shuffle keyed on
    node id (the partitioning Catalyst reuses), with ``_truncator``
    lineage control — the same per-iteration cost model as pagerank.
    Component label = MIN id of the SCC (deterministic).

    Output: (id, component), one row per node incident to an edge.
    """
    spark = edges.sparkSession
    ckpt = _truncator(spark, checkpoint_dir)
    e_all = ckpt(
        edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
        .filter(F.col("u") != F.col("v"))
        .distinct()
    )
    active_nodes = ckpt(
        e_all.select(F.col("u").alias("id"))
        .union(e_all.select(F.col("v").alias("id")))
        .distinct()
    )
    e_act = e_all
    done_parts: list[DataFrame] = []

    if small_cutover and e_all.count() <= small_cutover:
        rows = e_all.collect()
        comp = _tarjan_scc([(r["u"], r["v"]) for r in rows])
        return spark.createDataFrame(
            sorted(comp.items()),
            schema=e_all.select(
                F.col("u").alias("id"), F.col("u").alias("component")
            ).schema,
        )

    # Shuffle-partition floor for the loop body (restored in finally):
    # after the first trim, every per-round frame is a shrinking node
    # subset — planning each of the many tiny exchanges at the session
    # width (32+) pays task-scheduling overhead per round that dwarfs
    # the sub-second compute. AQE's coalescing helps but still plans a
    # stage per exchange; capping the width directly was measured
    # fastest (13.4 s -> ~6 s on the 110-node fixture). Callers
    # running SCC over a huge ACTIVE subgraph should raise
    # ``loop_shuffle_partitions`` to match their cluster.
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        spark.conf.set("spark.sql.shuffle.partitions", str(loop_shuffle_partitions))
        return _scc_loop(
            spark, ckpt, e_all, active_nodes, done_parts, max_outer, max_prop,
            loop_shuffle_partitions,
        )
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)


def _scc_loop(spark, ckpt, e_all, active_nodes, done_parts, max_outer, max_prop,
              loop_shuffle_partitions):
    e_act = e_all
    for _outer in range(max_outer):
        # -- 1. trim to fixpoint ----------------------------------------
        # one job per round: the count below materializes the LAZY
        # checkpoints of the previous round (localCheckpoint caches at
        # first computation), so there is no separate eager-ckpt job
        for _t in range(max_prop):
            has_out = e_act.select(F.col("u").alias("id")).distinct()
            has_in = e_act.select(F.col("v").alias("id")).distinct()
            keep = active_nodes.join(has_out, "id", "left_semi").join(
                has_in, "id", "left_semi"
            )
            trimmed = active_nodes.join(keep, "id", "left_anti")
            n_trim = trimmed.count()
            if n_trim == 0:
                break
            done_parts.append(trimmed.select("id", F.col("id").alias("component")))
            active_nodes = ckpt(keep, eager=False)
            e_act = ckpt(
                e_act.join(active_nodes.withColumnRenamed("id", "u"), "u", "left_semi")
                .join(active_nodes.withColumnRenamed("id", "v"), "v", "left_semi"),
                eager=False,
            )
        if active_nodes.isEmpty():
            break

        # -- 2. forward max-color propagation to fixpoint ---------------
        # convergence rides the round's ONE aggregate as a 64-bit hash
        # signature of the whole assignment (the CC trick): a stable
        # signature == fixed point (collision odds ~2^-64 per round,
        # and max_prop bounds the loop regardless) — no per-round
        # change-join, no separate materialization job
        def color_round(c):
            inbound = (
                e_act.join(
                    c.select(F.col("id").alias("u"), F.col("c").alias("cu")), "u"
                )
                .groupBy(F.col("v").alias("id"))
                .agg(F.max("cu").alias("cin"))
            )
            return c.join(inbound, "id", "left").select(
                "id", F.greatest("c", F.coalesce("cin", "c")).alias("c")
            )

        color = active_nodes.withColumn("c", F.col("id"))
        prev_sig = None
        # TWO rounds per job (the k-core cadence): the mid-round lazy
        # checkpoint caches at first materialization inside the same
        # job, so round 2's two reads of round 1 don't recompute it;
        # driver round-trips halve, overshoot is one no-op round
        for _p in range(0, max_prop, 2):
            color = ckpt(
                color_round(ckpt(color_round(color), eager=False)), eager=False
            )
            sig = color.agg(
                F.sum(F.xxhash64("id", "c").cast("decimal(38,0)"))
            ).first()[0]
            if sig == prev_sig:
                break
            prev_sig = sig

        # -- 3. backward membership within each color -------------------
        # marked only grows, so a stable COUNT is the fixed point —
        # again one job per round over the lazy checkpoint
        def back_round(m):
            # u joins its color's marked set if some out-edge lands on a
            # marked same-color node
            newly = (
                e_act.join(
                    m.select(F.col("id").alias("v"), F.col("c").alias("cv")), "v"
                )
                .join(color.select(F.col("id").alias("u"), F.col("c").alias("cu")), "u")
                .filter(F.col("cu") == F.col("cv"))
                .select(F.col("u").alias("id"), F.col("cu").alias("c"))
                .distinct()
                .join(m.select("id"), "id", "left_anti")
            )
            return m.unionByName(newly)

        marked = ckpt(color.filter(F.col("c") == F.col("id")), eager=False)
        prev_n = marked.count()
        # marked only grows, so a stable COUNT is the fixed point —
        # two rounds per job, one count action each
        for _b in range(0, max_prop, 2):
            marked = ckpt(
                back_round(ckpt(back_round(marked), eager=False)), eager=False
            )
            n = marked.count()
            if n == prev_n:
                break
            prev_n = n

        # SCC label = min id of the marked set per color (root is the
        # MAX by construction; relabel for the deterministic-min contract)
        scc = marked.groupBy("c").agg(F.min("id").alias("component"))
        done_parts.append(
            marked.join(scc, "c").select("id", "component")
        )
        active_nodes = ckpt(active_nodes.join(marked.select("id"), "id", "left_anti"))
        if active_nodes.isEmpty():
            break
        e_act = ckpt(
            e_act.join(active_nodes.withColumnRenamed("id", "u"), "u", "left_semi")
            .join(active_nodes.withColumnRenamed("id", "v"), "v", "left_semi")
        )

    out = done_parts[0]
    for part in done_parts[1:]:
        out = out.unionByName(part)
    # the union accumulates one partition set per retired part —
    # collapse before handing downstream
    return ckpt(out.coalesce(loop_shuffle_partitions))


def _tarjan_scc(edge_list):
    """Iterative (explicit-stack) Tarjan over a collected edge list —
    the FW-BW sequential finisher for sub-cutover subgraphs. Returns
    {node: min id of its SCC}; nodes only appear if incident to an
    edge (matching the distributed path's contract)."""
    adj: dict = {}
    nodes = set()
    for u, v in edge_list:
        adj.setdefault(u, []).append(v)
        nodes.add(u)
        nodes.add(v)
    index: dict = {}
    low: dict = {}
    onstack = set()
    S: list = []
    comp: dict = {}
    for root in sorted(nodes):
        if root in index:
            continue
        index[root] = low[root] = len(index)
        S.append(root)
        onstack.add(root)
        work = [(root, iter(adj.get(root, ())))]
        while work:
            v, it = work[-1]
            advanced = False
            for w in it:
                if w not in index:
                    index[w] = low[w] = len(index)
                    S.append(w)
                    onstack.add(w)
                    work.append((w, iter(adj.get(w, ()))))
                    advanced = True
                    break
                if w in onstack:
                    low[v] = min(low[v], index[w])
            if advanced:
                continue
            work.pop()
            if work:
                u = work[-1][0]
                low[u] = min(low[u], low[v])
            if low[v] == index[v]:
                scc = []
                while True:
                    w = S.pop()
                    onstack.discard(w)
                    scc.append(w)
                    if w == v:
                        break
                m = min(scc)
                for w in scc:
                    comp[w] = m
    return comp


def label_propagation(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    n_rounds: int = 5,
    checkpoint_dir: str | None = None,
    small_cutover: int = 200_000,
) -> DataFrame:
    """Community detection by SYNCHRONOUS label propagation (Raghavan
    et al. 2007), determinized: every node starts as its own label;
    each round every node adopts the most frequent label among its
    (undirected) neighbors, ties broken by SMALLEST label, isolated
    nodes keep their own. Classic LPA updates asynchronously in random
    order — irreproducible on a distributed engine — so this is the
    synchronous variant with a FIXED round count: deterministic across
    runs/partitionings/engines (the oracle unrolls the identical
    rounds as SQL CTEs), at the cost of the known oscillation mode on
    bipartite-ish structures, which a fixed round budget tolerates by
    fiat. Each round is one join + one count aggregate + one
    row_number window, all keyed on node id.

    Output: (id, community), community = the converged label.
    """
    from pyspark.sql import Window

    ckpt = _truncator(edges.sparkSession, checkpoint_dir)
    sym = ckpt(symmetrize(edges, src, dst))
    if small_cutover and sym.count() <= small_cutover:
        # driver finisher: the update is pure INTEGER/ordering logic
        # (most-frequent neighbor label, smallest-label tie, fixed
        # rounds), so the sequential replay produces IDENTICAL labels —
        # not merely close ones; distributed loop pytest-forced via
        # ``small_cutover=0``
        rows = sym.collect()
        adj: dict = {}
        for r in rows:
            adj.setdefault(r["u"], []).append(r["v"])
        labels_py = {n: n for n in adj}
        for _ in range(n_rounds):
            nxt = {}
            for n, neigh in adj.items():
                counts: dict = {}
                for v in neigh:
                    lbl = labels_py[v]
                    counts[lbl] = counts.get(lbl, 0) + 1
                nxt[n] = min(
                    counts, key=lambda c: (-counts[c], c)
                )
            labels_py = nxt
        spark = edges.sparkSession
        return spark.createDataFrame(
            sorted(labels_py.items()),
            schema=sym.select(
                F.col("u").alias("id"), F.col("u").alias("community")
            ).schema,
        )
    nodes = ckpt(sym.select(F.col("u").alias("id")).distinct())
    labels = nodes.withColumn("lbl", F.col("id"))
    for _r in range(n_rounds):
        counts = (
            sym.join(
                labels.select(F.col("id").alias("v"), F.col("lbl").alias("nlbl")),
                "v",
            )
            .groupBy("u", "nlbl")
            .agg(F.count(F.lit(1)).alias("cnt"))
        )
        w = Window.partitionBy("u").orderBy(F.desc("cnt"), F.asc("nlbl"))
        winners = (
            counts.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") == 1)
            .select(F.col("u").alias("id"), F.col("nlbl").alias("new_lbl"))
        )
        labels = ckpt(
            labels.join(winners, "id", "left").select(
                "id", F.coalesce("new_lbl", "lbl").alias("lbl")
            ),
            eager=False,
        )
    return labels.select("id", F.col("lbl").alias("community"))


def link_prediction_jaccard(
    edges: DataFrame,
    src_col: str = "src",
    dst_col: str = "dst",
    min_common: int = 1,
) -> DataFrame:
    """Common-neighbor / Jaccard link prediction over the UNDIRECTED
    graph (Liben-Nowell & Kleinberg 2003): for every NON-ADJACENT node
    pair sharing >= ``min_common`` neighbors, emit
    ``(a, b, n_common, n_union, jaccard)`` with ``a < b``,
    ``n_union = deg(a) + deg(b) - n_common`` and
    ``jaccard = n_common / n_union``.

    Everything but the final score is exact integer arithmetic; the
    score itself is ONE IEEE division of two integers — correctly
    rounded, so bit-identical across engines (oracle-checkable without
    decimal gymnastics).

    Plan shape: symmetrize + distinct (one shuffle), wedge self-join on
    the shared-neighbor key (one shuffle on node id), count per pair,
    anti-join against the edge set to drop already-adjacent pairs, two
    degree joins. Scale note: a degree-d hub emits d^2 wedge pairs —
    the canonical skew; AQE's skew-join split handles moderate hubs,
    and for power-law graphs cap neighborhoods upstream (drop nodes
    with deg > cap from the WEDGE side only, the standard
    approximation) before calling this."""
    u, v = F.col(src_col), F.col(dst_col)
    und = (
        edges.select(u.alias("u"), v.alias("v"))
        .union(edges.select(v.alias("u"), u.alias("v")))
        .distinct()
    )
    deg = und.groupBy("u").agg(F.count(F.lit(1)).alias("d"))
    t1 = und.select(F.col("u").alias("n"), F.col("v").alias("a"))
    t2 = und.select(F.col("u").alias("n"), F.col("v").alias("b"))
    pairs = (
        t1.join(t2, "n")
        .filter(F.col("a") < F.col("b"))
        .groupBy("a", "b")
        .agg(F.count(F.lit(1)).alias("n_common"))
        .filter(F.col("n_common") >= min_common)
    )
    adj = und.select(F.col("u").alias("a"), F.col("v").alias("b"))
    nonadj = pairs.join(adj, ["a", "b"], "left_anti")
    da = deg.select(F.col("u").alias("a"), F.col("d").alias("da"))
    db = deg.select(F.col("u").alias("b"), F.col("d").alias("db"))
    return (
        nonadj.join(da, "a")
        .join(db, "b")
        .select(
            "a",
            "b",
            F.col("n_common").cast("long").alias("n_common"),
            (F.col("da") + F.col("db") - F.col("n_common"))
            .cast("long")
            .alias("n_union"),
            (
                F.col("n_common").cast("double")
                / (F.col("da") + F.col("db") - F.col("n_common")).cast("double")
            ).alias("jaccard"),
        )
    )


def _union_find_cc(edge_list):
    """Sequential union-find (path-halving + union-by-size) for the
    small-subproblem finisher of ``connected_components``: returns
    {node: min id of its component} for every node in ``edge_list`` —
    the same labels the star-contraction fixed point produces."""
    parent: dict = {}
    size: dict = {}

    def find(x):
        root = x
        while parent[root] != root:
            parent[root] = parent[parent[root]]
            root = parent[root]
        return root

    for a, b in edge_list:
        for n in (a, b):
            if n not in parent:
                parent[n] = n
                size[n] = 1
        ra, rb = find(a), find(b)
        if ra != rb:
            if size[ra] < size[rb]:
                ra, rb = rb, ra
            parent[rb] = ra
            size[ra] += size[rb]
    members: dict = {}
    for n in parent:
        members.setdefault(find(n), []).append(n)
    out = {}
    for nodes in members.values():
        label = min(nodes)
        for n in nodes:
            out[n] = label
    return out


def scc_condensation(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    **scc_kwargs,
) -> DataFrame:
    """Condensation (quotient DAG) of a directed graph: one node per
    strongly connected component, an edge (A, B) whenever any original
    edge crosses from a node of A to a node of B — acyclic by the
    definition of SCC, which makes it the structure that gives a
    cyclic graph a topological order (dependency resolution, deadlock
    analysis, stratified evaluation).

    Plan: one SCC run (``strongly_connected_components``; its FW-BW
    cutover applies), then two label joins on the edge endpoints and a
    count aggregate — the joins key on node id, the same partitioning
    the SCC loop used. Component labels are min-id, so condensation
    node names are deterministic.

    Output: (src_comp, dst_comp, n_edges) — distinct crossing
    component pairs with the number of original edges collapsed onto
    each."""
    comp = strongly_connected_components(edges, src=src, dst=dst, **scc_kwargs)
    cu = comp.select(F.col("id").alias(src), F.col("component").alias("src_comp"))
    cv = comp.select(F.col("id").alias(dst), F.col("component").alias("dst_comp"))
    return (
        edges.select(src, dst)
        .join(cu, src)
        .join(cv, dst)
        .filter(F.col("src_comp") != F.col("dst_comp"))
        .groupBy("src_comp", "dst_comp")
        .agg(F.count(F.lit(1)).cast("long").alias("n_edges"))
    )


def multi_source_bfs(
    edges: DataFrame,
    seeds: list | DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_hops: int = 10,
    directed: bool = False,
    checkpoint_dir: str | None = None,
    small_cutover: int = 200_000,
) -> DataFrame:
    """Hop distances from EVERY seed in ONE frontier loop: frontier and
    visited set carry (seed, id) pairs, so each iteration expands all
    seeds' frontiers together — m independent BFS runs collapse into
    diameter-many join rounds regardless of seed count (the batch-BFS
    shape behind landmark distance / centrality estimation). Per round:
    one equi-join on the frontier's node ids + one anti-join against
    the visited set, both keyed on id — the frontier is graph-width
    bounded times |seeds|, never the corpus.

    Output: (seed, id, hops) — minimum hop count per (seed, reachable
    node), including (seed, seed, 0).

    ``seeds`` may be a Python list (driver-sized seed sets: landmark
    batches, anchored-chain frontiers) or a single-column DataFrame
    (round 9) — the DataFrame form never materializes the seed set on
    the driver, so an UNBOUNDED seed frame (e.g. an OPTIONAL var-length
    expansion from an unanchored scope) stays fully distributed."""
    spark = edges.sparkSession
    ckpt = _truncator(spark, checkpoint_dir)
    if directed:
        e = edges.select(F.col(src).alias("u"), F.col(dst).alias("v")).distinct()
    else:
        e = symmetrize(edges, src, dst)
    e = ckpt(e)
    if isinstance(seeds, DataFrame):
        if len(seeds.columns) != 1:
            raise ValueError("seeds DataFrame must have exactly one column")
        base = seeds.toDF("seed").distinct()
    else:
        seed_rows = [(s,) for s in seeds]
        base = spark.createDataFrame(
            seed_rows, schema=edges.select(F.col(src).alias("seed")).schema
        )
    frontier = base.select("seed", F.col("seed").alias("id"), F.lit(0).alias("hops"))

    if small_cutover:
        n_edges = e.count()  # cheap: e is checkpointed just above
        if n_edges <= small_cutover:
            # driver finisher (round 13 — SCC/CC/pagerank pattern),
            # additionally bounded by driver WORK = |seeds| x |edges|:
            # the seed frame can be corpus-derived and huge even over a
            # tiny graph, so probe it with a budgeted limit-collect and
            # fall through to the distributed loop when it overflows
            # (the probe costs one bounded job; at fixture scale it
            # replaces the eager frontier checkpoint job). Pinned equal
            # via small_cutover=0 in tests/test_graph_cutover.py.
            budget = max(64, 1_000_000 // max(n_edges, 1))
            seed_rows = base.limit(budget + 1).collect()
            if len(seed_rows) <= budget:
                adj: dict = {}
                for r in e.collect():
                    adj.setdefault(r["u"], []).append(r["v"])
                # ADVICE r13: the list form's base is NOT distinct-ed,
                # and the distributed loop keeps duplicate seed rows
                # only at hop 0 (visited starts as the raw frontier;
                # every later level is distinct-ed). Mirror exactly:
                # expand each seed once, emit one extra (s, s, 0) row
                # per duplicate input row.
                dup0 = []
                uniq = {}
                for srow in seed_rows:
                    s = srow["seed"]
                    if s in uniq:
                        dup0.append(s)
                    else:
                        uniq[s] = None
                out = [(s, s, 0) for s in dup0]
                for s in uniq:
                    hops = {s: 0}
                    level = [s]
                    for hop in range(1, max_hops + 1):
                        nxt = {
                            v
                            for u in level
                            for v in adj.get(u, ())
                            if v not in hops
                        }
                        if not nxt:
                            break
                        for v in nxt:
                            hops[v] = hop
                        level = list(nxt)
                    out.extend((s, node, h) for node, h in hops.items())
                return spark.createDataFrame(sorted(out), schema=frontier.schema)

    visited = ckpt(frontier)
    for hop in range(1, max_hops + 1):
        nxt = (
            frontier.join(e, frontier.id == e.u)
            .select("seed", F.col("v").alias("id"), F.lit(hop).alias("hops"))
            .distinct()
            .join(visited.select("seed", "id"), ["seed", "id"], "left_anti")
        )
        # LAZY truncation + count (round 13): one job per level — the
        # count materializes this level's checkpoint AND the previous
        # level's lazy visited-union checkpoint (was 3 jobs/level:
        # eager nxt ckpt, isEmpty probe, eager visited ckpt)
        nxt = ckpt(nxt, eager=False)
        if nxt.count() == 0:
            break
        visited = ckpt(visited.union(nxt), eager=False)
        frontier = nxt
    return visited


def closeness_from_seeds(
    edges: DataFrame,
    seeds: list,
    src: str = "src",
    dst: str = "dst",
    max_hops: int = 10,
    directed: bool = False,
) -> DataFrame:
    """Closeness centrality of the given seed nodes (the landmark
    subset — exact all-node closeness is all-pairs BFS, which nobody
    runs at 100 TB; seed/landmark closeness is the production form):
    ``closeness = n_reached / total_hops`` over each seed's BFS tree,
    one int/int IEEE division (engine-identical). Seeds reaching
    nothing get NULL rather than a division error.

    Output: (seed, n_reached, total_hops, closeness)."""
    d = multi_source_bfs(
        edges, seeds, src=src, dst=dst, max_hops=max_hops, directed=directed
    )
    return (
        d.filter(F.col("hops") > 0)
        .groupBy("seed")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_reached"),
            F.sum("hops").cast("long").alias("total_hops"),
        )
        .select(
            "seed",
            "n_reached",
            "total_hops",
            F.when(
                F.col("total_hops") > 0,
                F.col("n_reached").cast("double")
                / F.col("total_hops").cast("double"),
            ).alias("closeness"),
        )
    )


def ktruss(
    edges: DataFrame,
    k: int,
    src: str = "src",
    dst: str = "dst",
    max_iter: int = 50,
    checkpoint_dir: str | None = None,
) -> DataFrame:
    """k-truss of the undirected graph (Cohen 2008): the maximal
    subgraph where every edge participates in >= k-2 triangles — the
    edge-centric cohesion notion that k-core (node-centric) misses;
    communities and spam/link farms separate sharply by truss number.

    Fixed-point peeling, set-at-a-time (J. Wang & Cheng, VLDB'12 shape):
    each round recomputes edge supports with the SAME canonical
    triangle join the triangle-count query uses (two equi-joins on
    endpoints, no enumeration of non-triangles) and drops every edge
    below k-2 SIMULTANEOUSLY — deterministic, no sequential peeling
    order. Rounds are bounded by the peeling depth (small in
    practice); each is two joins + one aggregate keyed on endpoints.
    The k-truss is UNIQUE, so any engine agreeing on the definition
    agrees on the result (pinned against a pure-Python reference in
    tests).

    Scale note: the wedge join's fan-out is sum(deg^2) — hub-skewed on
    power-law graphs. The standard mitigation (degree-ordered
    orientation: enumerate each wedge only from its lowest-degree
    endpoint) drops that to O(m^1.5); AQE's skew split covers moderate
    hubs here, and orientation is the upgrade path if supports ever
    dominate a profile.

    Output: the surviving canonical edge set (u < v), columns (u, v).
    """
    if k < 3:
        raise ValueError(f"k-truss needs k >= 3, got {k}")
    ckpt = _truncator(edges.sparkSession, checkpoint_dir)
    und = ckpt(
        edges.select(
            F.least(F.col(src), F.col(dst)).alias("u"),
            F.greatest(F.col(src), F.col(dst)).alias("v"),
        )
        .filter(F.col("u") != F.col("v"))
        .distinct()
    )
    n_edges = und.count()
    for _ in range(max_iter):
        if n_edges == 0:
            break
        bidir = und.union(und.select(F.col("v").alias("u"), F.col("u").alias("v")))
        n1 = bidir.select(F.col("u").alias("x"), F.col("v").alias("w1"))
        n2 = bidir.select(F.col("u").alias("y"), F.col("v").alias("w2"))
        sup = (
            und.join(n1, und.u == n1.x)
            .join(n2, (und.v == n2.y) & (F.col("w1") == F.col("w2")))
            .groupBy("u", "v")
            .agg(F.count(F.lit(1)).alias("support"))
        )
        kept = ckpt(sup.filter(F.col("support") >= k - 2).select("u", "v"))
        n_kept = kept.count()
        if n_kept == n_edges:
            break
        und, n_edges = kept, n_kept
    return und if n_edges else und.limit(0)


def betweenness_from_seeds(
    edges: DataFrame,
    seeds: list,
    src: str = "src",
    dst: str = "dst",
    max_hops: int = 10,
    directed: bool = False,
    checkpoint_dir: str | None = None,
) -> DataFrame:
    """Betweenness centrality contributions from the given seed
    sources — Brandes' algorithm (2001) with the forward/backward
    passes expressed as per-level joins, all seeds advancing in one
    loop (the multi_source_bfs batching). Exact betweenness is
    all-sources Brandes, which nobody runs at 100 TB; seed-sampled
    betweenness (Brandes-Pich 2007) is the production estimator, and
    passing every node as a seed on a bounded subgraph recovers the
    exact value (how the tests pin against the reference
    implementation).

    Forward: level frames (seed, id, sigma) where sigma = number of
    shortest s->v paths, accumulated by a grouped SUM over the
    frontier's out-edges (one join + one anti-join + one aggregate
    per level — frontier-sized, never the corpus). Backward: levels
    replay in reverse, each computing
    delta(u) = sum_v sigma(u)/sigma(v) * (1 + delta(v)) over the
    shortest-path-DAG edges into the deeper level (one join + one
    aggregate per level; the level frames were already checkpointed
    by the forward pass, so nothing recomputes).

    Returns (id, betweenness): the RAW sum of dependency scores over
    ORDERED (seed, target) pairs, seeds excluded from their own
    tally — the undirected unordered-pair convention is this divided
    by 2 when seeds = all nodes (callers' choice; documented rather
    than hidden).

    Floating accumulation (round 11): each dependency TERM
    ``sigma_u/sigma_v * (1 + delta_v)`` is quantized to the 2^-20
    dyadic grid before the per-level SUM — the dsir/lm device — so
    every delta and the final betweenness are EXACT dyadic sums:
    order-independent across partitions, runs, and engines (term
    inputs are integers and already-exact grid deltas, so the
    divide/multiply/floor chain is bit-identical everywhere). That
    turns the op from rows-only into value-hash-oracle territory; the
    per-term bias is <= 2^-21, orders below the seed-sampling error
    the estimator carries by design. Also pinned against a pure-Python
    Brandes (same quantization) in tests.
    """
    spark = edges.sparkSession
    ckpt = _truncator(spark, checkpoint_dir)
    if directed:
        e = edges.select(F.col(src).alias("u"), F.col(dst).alias("v")).distinct()
    else:
        e = symmetrize(edges, src, dst)
    e = ckpt(e)
    base = spark.createDataFrame(
        [(s,) for s in seeds], schema=edges.select(F.col(src).alias("seed")).schema
    )
    level = ckpt(
        base.select("seed", F.col("seed").alias("id"), F.lit(1).cast("long").alias("sigma"))
    )
    levels = [level]
    visited = level.select("seed", "id")
    for _hop in range(1, max_hops + 1):
        seen = visited.select(F.col("seed").alias("ws"), F.col("id").alias("wv"))
        nxt = (
            level.join(e, level.id == e.u)
            .join(
                seen,
                (F.col("seed") == F.col("ws")) & (F.col("v") == F.col("wv")),
                "left_anti",
            )
            .groupBy("seed", F.col("v").alias("id"))
            .agg(F.sum("sigma").alias("sigma"))
        )
        nxt = ckpt(nxt)
        if nxt.isEmpty():
            break
        visited = ckpt(visited.union(nxt.select("seed", "id")))
        level = nxt
        levels.append(level)

    # backward accumulation; deepest level has delta = 0
    deltas = None  # (seed, id, delta) for the level BELOW the current one
    contribs = []
    for d in range(len(levels) - 2, -1, -1):
        below = levels[d + 1].select(
            F.col("seed").alias("bs"), F.col("id").alias("bv"),
            F.col("sigma").alias("bsigma"),
        )
        if deltas is not None:
            below = below.join(
                deltas.select(
                    F.col("seed").alias("bs"), F.col("id").alias("bv"), "delta"
                ),
                ["bs", "bv"],
                "left",
            ).select("bs", "bv", "bsigma", F.coalesce("delta", F.lit(0.0)).alias("bdelta"))
        else:
            below = below.select("bs", "bv", "bsigma", F.lit(0.0).alias("bdelta"))
        cur = levels[d]
        deltas = ckpt(
            cur.join(e, cur.id == e.u)
            .join(below, (cur.seed == F.col("bs")) & (F.col("v") == F.col("bv")))
            .groupBy("seed", "id")
            .agg(
                F.sum(
                    F.floor(
                        (F.col("sigma") / F.col("bsigma"))
                        * (F.lit(1.0) + F.col("bdelta"))
                        * F.lit(1048576.0)
                        + F.lit(0.5)
                    )
                    / F.lit(1048576.0)
                ).alias("delta")
            )
        )
        if d > 0:  # level 0 is the seed itself: excluded from its own tally
            contribs.append(deltas)
    if not contribs:
        return edges.sparkSession.createDataFrame(
            [], "id " + dict(edges.dtypes)[src] + ", betweenness double"
        )
    out = contribs[0]
    for c in contribs[1:]:
        out = out.union(c)
    return out.groupBy("id").agg(F.sum("delta").alias("betweenness"))


def eigenvector_centrality(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    weight_col: str | None = None,
    max_iter: int = 8,
    checkpoint_dir: str | None = None,
    small_cutover: int = 200_000,
) -> DataFrame:
    """Power-iteration eigenvector centrality (round 7): x ← Aᵀx with
    MAX-normalization each step — a node is central in proportion to
    the centrality of the nodes pointing AT it (PageRank without the
    damping/teleport machinery; the classic Bonacich measure).

    Max-normalization is deliberate: the max is accumulation-order-FREE
    (unlike an L2 norm's sum of squares), so the only order-sensitive
    arithmetic is the per-node in-sum — the same grouped double sum
    PageRank's oracle already value-hashes under the 6-digit round.
    Nodes with no in-edges go to 0 after one step, as the definition
    says.

    Same execution skeleton as ``pagerank``: one join + grouped sum +
    broadcast 1-row max per iteration, eager lineage truncation per
    step, and the small-subproblem numpy finisher below
    ``small_cutover`` edges (identical update math; distributed loop
    pytest-forced via ``small_cutover=0``).

    Output: (id, score) with max score = 1.0 (on any graph with at
    least one edge).
    """
    ckpt = _truncator(edges.sparkSession, checkpoint_dir)
    if weight_col is None:
        e = (
            edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
            .distinct()
            .withColumn("w", F.lit(1.0))
            .persist()
        )
    else:
        e = (
            edges.filter(F.col(weight_col) > 0)
            .groupBy(F.col(src).alias("u"), F.col(dst).alias("v"))
            .agg(F.sum(F.col(weight_col).cast("double")).alias("w"))
            .persist()
        )
    nodes = (
        e.select(F.col("u").alias("id")).union(e.select(F.col("v").alias("id")))
        .distinct().persist()
    )

    if small_cutover and e.count() <= small_cutover:
        import numpy as np

        rows = e.collect()
        e.unpersist()
        nodes.unpersist()
        schema = edges.select(
            F.col(src).alias("id"), F.lit(0.0).alias("score")
        ).schema
        if not rows:
            # empty (possibly fully-filtered) edge frame: no nodes, no
            # scores — np.bincount/max would raise on the empty array
            return edges.sparkSession.createDataFrame([], schema=schema)
        ids = sorted({r["u"] for r in rows} | {r["v"] for r in rows})
        ix = {v: i for i, v in enumerate(ids)}
        usrc = np.array([ix[r["u"]] for r in rows], dtype=np.int64)
        vdst = np.array([ix[r["v"]] for r in rows], dtype=np.int64)
        w = np.array([r["w"] for r in rows], dtype=np.float64)
        x = np.ones(len(ids))
        for _ in range(max_iter):
            nxt = np.bincount(vdst, weights=x[usrc] * w, minlength=len(ids))
            m = float(nxt.max())
            x = nxt / m if m > 0 else nxt
        spark = edges.sparkSession
        return spark.createDataFrame(
            list(zip(ids, [float(v) for v in x])), schema=schema
        )

    x = nodes.withColumn("score", F.lit(1.0))
    for _ in range(max_iter):
        inflow = (
            e.join(x.withColumnRenamed("id", "u"), "u")
            .select(F.col("v").alias("id"), (F.col("score") * F.col("w")).alias("c"))
            .groupBy("id")
            .agg(F.sum("c").alias("nxt"))
        )
        peak = inflow.agg(F.max("nxt").alias("_m"))
        x = ckpt(
            nodes.join(inflow, "id", "left")
            .crossJoin(F.broadcast(peak))
            .select(
                "id",
                F.when(
                    F.col("_m") > 0,
                    F.coalesce(F.col("nxt"), F.lit(0.0)) / F.col("_m"),
                ).otherwise(F.coalesce(F.col("nxt"), F.lit(0.0))).alias("score"),
            )
        )
    e.unpersist()
    nodes.unpersist()
    return x
