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
