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
