"""Graph traversal over the materialized triple tables.

The engine's KG output is an edge list (subj, pred, obj); the first thing
a consumer does with a knowledge graph is neighborhood expansion —
"everything within k hops of this entity". k-hop is expressed as iterated
frontier joins, the standard distributed BFS shape:

- the frontier (nodes discovered at hop i) joins the edge list once per
  hop — k small equi-joins, never a transitive-closure blowup;
- visited-set dedup is a left-anti join against the accumulated result,
  so each node is expanded exactly once (min-hop semantics, and the join
  input stays proportional to the NEW frontier, not the whole graph);
- at cluster scale the edge list is the big side (hash-partitioned by
  src), while the frontier is usually small → Spark broadcasts it
  automatically under the join threshold, making each hop a map-side
  join; `checkpoint_hops=True` cuts lineage per hop for large k (same
  rationale as connected_components' seed checkpoints).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def khop(
    edges: DataFrame, seeds: DataFrame, k: int,
    directed: bool = False, checkpoint_hops: bool = False,
) -> DataFrame:
    """edges(src, dst) + seeds(node) → (node, hop) for every node within
    k hops of any seed; hop = minimum distance (seeds are hop 0).
    Deterministic at any parallelism."""
    sym = edges.select("src", "dst")
    if not directed:
        sym = sym.unionByName(
            edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
        )
    reached = seeds.select(F.col("node")).dropDuplicates().withColumn(
        "hop", F.lit(0).cast("long")
    )
    frontier = reached.select("node")
    for i in range(1, k + 1):
        nxt = (
            frontier.join(sym, frontier.node == sym.src)
            .select(F.col("dst").alias("node"))
            .dropDuplicates()
            .join(reached.select("node"), "node", "left_anti")
            .withColumn("hop", F.lit(i).cast("long"))
        )
        if checkpoint_hops:
            nxt = nxt.localCheckpoint(eager=True)
        reached = reached.unionByName(nxt)
        frontier = nxt.select("node")
    return reached


def pagerank(
    edges: DataFrame, n_nodes: int, iters: int = 3, damping: float = 0.85,
    checkpoint_iters: bool = False,
) -> DataFrame:
    """Fixed-iteration PageRank over edges(src, dst) → (node, pr):
    pr_{k+1}(v) = (1-d)/N + d · Σ_{u→v} pr_k(u)/outdeg(u), seeded 1/N.
    Entity-importance ranking for the KG output — the weighted-iteration
    companion of connected_components.

    Deterministic by construction: a FIXED iteration count (no
    convergence probe ⇒ no driver actions in the loop), and the simple
    dangling-node variant (their mass decays rather than redistributing —
    avoiding a per-iteration global aggregate; documented, and replicated
    exactly by the SQL oracle). Each iteration is one join + one
    partial-aggregated shuffle keyed by dst — the same per-round profile
    as CC; checkpoint_iters cuts lineage for large iteration counts.

    n_nodes is passed in rather than counted here, keeping plan
    construction action-free (the caller either knows |V| from its
    catalog/manifest or pays one small count job)."""
    nodes = (
        edges.select(F.col("src").alias("node"))
        .unionByName(edges.select(F.col("dst").alias("node")))
        .dropDuplicates()
    )
    outdeg = edges.groupBy("src").agg(F.count("*").alias("outdeg"))
    base = F.lit((1.0 - damping) / n_nodes)
    pr = nodes.withColumn("pr", F.lit(1.0 / n_nodes))
    for _ in range(iters):
        contrib = (
            edges.join(pr, edges.src == pr.node)
            .join(outdeg, "src")
            .select(F.col("dst").alias("node"), (F.col("pr") / F.col("outdeg")).alias("c"))
            .groupBy("node")
            .agg(F.sum("c").alias("inflow"))
        )
        pr = nodes.join(contrib, "node", "left").select(
            "node", (base + F.lit(damping) * F.coalesce("inflow", F.lit(0.0))).alias("pr")
        )
        if checkpoint_iters:
            pr = pr.localCheckpoint(eager=True)
    return pr


def triangle_counts(edges: DataFrame, a: str = "a", b: str = "b") -> DataFrame:
    """Per-node triangle participation counts over an undirected edge
    list → (node, n_triangles). The KG/near-dup-graph density probe: a
    node in many triangles sits in a tightly-bound cluster (duplicate
    nest, entity community), one in none is a stray pair.

    Distributed shape — the standard oriented wedge-close, never an
    all-pairs product:
    - edges are canonicalized to u < v (dedup'd), so each triangle
      x<y<z is generated exactly once as the wedge (x,y)+(y,z) closed
      by the edge (x,z);
    - wedge build = one self-equi-join on the shared endpoint; closure =
      one more equi-join against the (hash-partitioned) edge list. Both
      shuffle at most the edge list's width — at cluster scale the
      orientation (only u<v wedges) is what keeps high-degree hubs from
      exploding: a degree-d node contributes C(d,2) wedges total across
      BOTH orders, but only pairs ordered above it after
      canonicalization here;
    - per-node counts = explode the 3 corners + one map-side-combinable
      count.
    """
    from ..cache import scoped_persist

    e = scoped_persist(
        edges.select(
            F.least(F.col(a), F.col(b)).alias("u"),
            F.greatest(F.col(a), F.col(b)).alias("v"),
        )
        .where(F.col("u") != F.col("v"))
        .dropDuplicates(["u", "v"]),
        # the edge list feeds THREE join sides; without a persist Spark
        # re-derives it (and everything upstream — e.g. a full MinHash
        # candidate generation) once per side. scoped_persist
        # (MEMORY_AND_DISK): spills at 100 TB instead of OOMing, and a
        # re-invocation releases the previous run's cache.
        "graph.triangles.edges",
    )
    wedge = (
        e.alias("e1")
        .join(e.alias("e2"), F.col("e1.v") == F.col("e2.u"))
        .select(
            F.col("e1.u").alias("x"), F.col("e1.v").alias("y"),
            F.col("e2.v").alias("z"),
        )
    )
    tri = wedge.join(
        e.alias("e3"),
        (F.col("x") == F.col("e3.u")) & (F.col("z") == F.col("e3.v")),
    ).select("x", "y", "z")
    return (
        tri.select(F.explode(F.array("x", "y", "z")).alias("node"))
        .groupBy("node")
        .agg(F.count("*").alias("n_triangles"))
    )


def label_propagation(
    edges: DataFrame, iters: int = 3,
    a: str = "src", b: str = "dst", directed: bool = False,
    checkpoint_iters: bool = False,
) -> DataFrame:
    """Community detection by synchronous label propagation over
    edges(a, b) → (node, label). Labels seed as the node's own id; each
    iteration every node adopts the most frequent label among its
    neighbors, ties broken by the SMALLEST label — so the algorithm is
    fully deterministic (the classic asynchronous LPA is run-order
    dependent; this is the deterministic semi-synchronous variant, the
    same determinism discipline as pagerank's fixed iterations).

    Per iteration: one equi-join (neighbor label lookup), one
    map-side-combinable count shuffle keyed by (node, label), one
    per-node window for the argmax — all partitioned by node, no
    all-pairs stage, no driver actions in the loop. Isolated or
    degree-0-this-direction nodes keep their current label (left join +
    coalesce). Fixed iteration count keeps the loop action-free and the
    result engine-replicable (unrollable as per-iteration SQL CTEs for
    an r6 oracle twin)."""
    from pyspark.sql import Window

    sym = edges.select(F.col(a).alias("src"), F.col(b).alias("dst"))
    if not directed:
        sym = sym.unionByName(
            edges.select(F.col(b).alias("src"), F.col(a).alias("dst"))
        )
    sym = sym.where(F.col("src") != F.col("dst")).dropDuplicates()
    nodes = (
        sym.select(F.col("src").alias("node"))
        .unionByName(sym.select(F.col("dst").alias("node")))
        .dropDuplicates()
    )
    labels = nodes.withColumn("label", F.col("node"))
    w = Window.partitionBy("node").orderBy(F.desc("n"), F.asc("label"))
    for _ in range(iters):
        counts = (
            sym.join(labels.withColumnRenamed("node", "dst"), "dst")
            .select(F.col("src").alias("node"), "label")
            .groupBy("node", "label")
            .agg(F.count("*").alias("n"))
        )
        best = (
            counts.withColumn("rk", F.row_number().over(w))
            .where(F.col("rk") == 1)
            .select("node", F.col("label").alias("new_label"))
        )
        labels = labels.join(best, "node", "left").select(
            "node", F.coalesce("new_label", "label").alias("label")
        )
        if checkpoint_iters:
            labels = labels.localCheckpoint(eager=True)
    return labels


def personalized_pagerank(
    edges: DataFrame, seeds: DataFrame, iters: int = 3,
    damping_num: int = 17, damping_den: int = 20, quant: int = 10 ** 9,
    frontier_only: bool = False,
) -> DataFrame:
    """Fixed-iteration PERSONALIZED PageRank (random walk with restart
    to a seed set) → (node, ppr_q): entity relatedness relative to the
    seeds, the query-time companion of the global pagerank (which ranks
    by total importance; PPR answers "important to WHOM").

    INTEGER-MASS semantics, a deliberate strengthening of pagerank's
    float recurrence: all mass lives in 1/quant units as longs; per-edge
    contribution is pr div outdeg (floor), the damped update is
    base + (num·inflow) div den with damping the exact rational num/den
    (0.85 = 17/20), and the restart mass is quant div |S| per seed. Every
    operation is integer, so the result is independent of partitioning
    and float accumulation order BY CONSTRUCTION, and a SQL oracle
    replays it exactly. Floor divisions leak ≤ 1 unit of mass per
    division (and dangling-node mass decays, as in pagerank — same
    documented simple variant); at quant = 1e9 the relative distortion
    is ≤ ~outdeg/quant per node per round.

    Scale shape: identical to pagerank — per iteration one src-keyed
    join + one dst-keyed partial-aggregated shuffle, no driver actions
    in the loop (|S| is folded in-plan via a broadcast single-row
    count). Nodes unreachable from the seeds in ≤ iters hops report 0 —
    the locality that makes PPR a per-query primitive at 100 TB (mass
    is nonzero only on the seeds' iters-hop neighborhood, so a
    frontier_only=True variant skips the full node relation entirely —
    every join is frontier-sized and the output is the nonzero support,
    row-identical to the general form on it; the general form keeps the
    full relation for the oracle's benefit)."""
    nodes = (
        edges.select(F.col("src").alias("node"))
        .unionByName(edges.select(F.col("dst").alias("node")))
        .unionByName(seeds.select(F.col("node")))
        .dropDuplicates()
    )
    outdeg = edges.groupBy("src").agg(F.count("*").alias("outdeg"))
    ns = seeds.select("node").dropDuplicates()
    n_seeds = ns.agg(F.count("*").alias("n_seeds"))
    share = ns.crossJoin(F.broadcast(n_seeds)).select(
        "node",
        F.expr(f"CAST({quant} AS BIGINT) div n_seeds").alias("share"),
    )
    base = share.select(
        "node", F.expr(
            f"CAST(({damping_den - damping_num} * share) div {damping_den} AS BIGINT)"
        ).alias("base"),
    )
    if frontier_only:
        # the per-query scale path the docstring promises: never touch
        # the full node relation — pr carries only the seeds' reached
        # neighborhood, so every join is frontier-sized. Output is the
        # NONZERO support of the general variant (row-identical on it,
        # asserted in tests); nodes the walk never reached are implied 0.
        pr = share.select("node", F.col("share").alias("ppr_q"))
    else:
        pr = nodes.join(share, "node", "left").select(
            "node", F.coalesce("share", F.lit(0).cast("long")).alias("ppr_q")
        )
    for _ in range(iters):
        contrib = (
            edges.join(pr, edges.src == pr.node)
            .join(outdeg, "src")
            .select(
                F.col("dst").alias("node"),
                F.expr("ppr_q div outdeg").alias("c"),
            )
            .groupBy("node")
            .agg(F.sum("c").alias("inflow"))
        )
        scope = (
            base.select("node").unionByName(contrib.select("node"))
            .dropDuplicates()
            if frontier_only else nodes
        )
        pr = (
            scope.join(base, "node", "left")
            .join(contrib, "node", "left")
            .select(
                "node",
                (
                    F.coalesce("base", F.lit(0).cast("long"))
                    + F.expr(
                        f"({damping_num} * coalesce(inflow, 0)) div {damping_den}"
                    )
                ).cast("long").alias("ppr_q"),
            )
        )
    return pr
