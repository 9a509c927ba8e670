"""Graph operators (SURVEY.md §2.8) as iterative DataFrame programs.

The reference does all of this with NetworkX on a single in-memory graph
(grapher.py, utils/analyze.py). Here every algorithm is a loop of joins
over an ``edges(src, dst)`` DataFrame with lineage hygiene
(cache + localCheckpoint every few rounds), so the same code runs on a
17k-node prosopography graph or a multi-billion-edge cluster graph.

Semantics replicated from the reference:
- k-hop BFS (grapher.py:25-94): undirected expansion from a seed set;
  nodes in `exclude` are included when reached but never expanded
  (grapher.py:48-50); the result keeps exactly the edges whose BOTH
  endpoints were visited — the "queued-up but unestablished periphery"
  trim at grapher.py:90-92 is equivalent to inducing on visited nodes.
- connected components (analyze.py:36-39): undirected, via iterative
  min-label propagation (large-star/small-star style contraction).
- degrees / density (analyze.py:94-117).
- longest chain depth (analyze.py:226-253): longest path in a DAG by
  iterative relaxation, cycle-guarded by an iteration cap.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def undirected(edges: DataFrame) -> DataFrame:
    """Undirected projection (analyze.py:36,127): both directions, deduped."""
    fwd = edges.select(F.col("src").alias("a"), F.col("dst").alias("b"))
    rev = edges.select(F.col("dst").alias("a"), F.col("src").alias("b"))
    return fwd.union(rev).distinct()


def _checkpoint(df: DataFrame, eager: bool = True) -> DataFrame:
    """Cut lineage; iterative loops otherwise build plans that grow
    per round and eventually dominate planning time."""
    return df.localCheckpoint(eager=eager)


def khop_bfs(
    edges: DataFrame,
    seeds: DataFrame,
    hops: int,
    exclude: DataFrame | None = None,
) -> tuple[DataFrame, DataFrame]:
    """k-hop BFS subgraph with exclusion (grapher.py:25-94).

    edges: (src, dst [, ...]) directed edge table.
    seeds: (node) seed set. exclude: (node) or None.
    Returns (nodes(node, dist), subgraph_edges) where subgraph_edges is
    the input edges induced on visited nodes — the periphery-trim
    semantics of grapher.py:90-92.

    Each round is: frontier ⋈ undirected-adjacency → new frontier,
    anti-joined against visited. Frontiers are typically small, so AQE
    flips the expansion join to broadcast; visited accumulates via
    union + localCheckpoint to keep lineage flat.
    """
    adj = undirected(edges).cache()
    frontier = seeds.select(F.col(seeds.columns[0]).alias("node")).distinct()
    visited = frontier.withColumn("dist", F.lit(0)).cache()
    frontier = visited.select("node")

    for depth in range(1, hops + 1):
        # Excluded nodes are visited but never expanded (grapher.py:48-50).
        expandable = (
            frontier.join(exclude.select(F.col(exclude.columns[0]).alias("node")), "node", "left_anti")
            if exclude is not None
            else frontier
        )
        nxt = (
            expandable.join(adj, expandable.node == adj.a)
            .select(F.col("b").alias("node"))
            .distinct()
            .join(visited.select("node"), "node", "left_anti")
        )
        nxt = _checkpoint(nxt.withColumn("dist", F.lit(depth)))
        if nxt.isEmpty():
            break
        visited = _checkpoint(visited.union(nxt))
        frontier = nxt.select("node")

    vnodes = visited.select("node").distinct()
    sub_edges = (
        edges.join(vnodes.withColumnRenamed("node", "src"), "src", "left_semi")
        .join(vnodes.withColumnRenamed("node", "dst"), "dst", "left_semi")
    )
    return visited, sub_edges


def degrees(edges: DataFrame) -> DataFrame:
    """(node, in_degree, out_degree, degree) — analyze.py:107-117.

    Two partial aggregations + one outer join; all map-side combinable.
    """
    ind = edges.groupBy(F.col("dst").alias("node")).agg(F.count(F.lit(1)).alias("in_degree"))
    outd = edges.groupBy(F.col("src").alias("node")).agg(F.count(F.lit(1)).alias("out_degree"))
    return (
        ind.join(outd, "node", "full_outer")
        .na.fill(0, ["in_degree", "out_degree"])
        .withColumn("degree", F.col("in_degree") + F.col("out_degree"))
    )


def density(edges: DataFrame, vertices: DataFrame) -> float:
    """nx.density for digraph: m / (n*(n-1)) — analyze.py:97."""
    n = vertices.count()
    m = edges.count()
    return 0.0 if n <= 1 else m / (n * (n - 1))


def connected_components(
    edges: DataFrame, vertices: DataFrame | None = None, max_iter: int = 50
) -> DataFrame:
    """Undirected connected components (analyze.py:36-39) without
    GraphFrames: iterative min-label propagation to fixpoint.

    Returns (node, component) where component = min node id (string
    comparison if ids are strings) in the component. Each round joins
    the current labels across edges and takes the min of neighbor
    labels; converges in O(diameter) rounds (the reference graph's
    diameter is ~27 per offline_mode.md; cap guards pathological
    inputs). Labels are checkpointed per round to keep lineage flat.

    At 100 TB scale the round count, not data volume, dominates; the
    min-label join is a plain shuffle-hash join that AQE handles, and a
    large-star/small-star contraction variant could cut rounds to
    O(log n) — documented trade-off, diameter here is small.
    """
    und = undirected(edges).cache()
    nodes = (
        vertices.select(F.col(vertices.columns[0]).alias("node"))
        if vertices is not None
        else und.select(F.col("a").alias("node"))
    ).distinct()
    labels = _checkpoint(nodes.withColumn("component", F.col("node")))

    for _ in range(max_iter):
        # min label among self and neighbors
        nbr = (
            und.join(labels.withColumnRenamed("node", "b2"), und.b == F.col("b2"))
            .select(F.col("a").alias("node"), "component")
        )
        new_labels = (
            labels.select("node", "component")
            .union(nbr)
            .groupBy("node")
            .agg(F.min("component").alias("component"))
        )
        new_labels = _checkpoint(new_labels)
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "node")
            .filter(F.col("n.component") != F.col("o.component"))
            .isEmpty()
        )
        labels = new_labels
        if changed:
            break
    return labels


def component_census(components: DataFrame) -> DataFrame:
    """Component-size census bucketed into the reference's 6 named size
    categories (analyze.py:15-22,41-72): per category, component count
    and node count."""
    from panditya_spark.operators.relational import bucket_by_size

    sizes = components.groupBy("component").agg(F.count(F.lit(1)).alias("sz"))
    return (
        sizes.select(bucket_by_size(F.col("sz")).alias("category"), "sz")
        .groupBy("category")
        .agg(
            F.count(F.lit(1)).alias("n_components"),
            F.sum("sz").cast("bigint").alias("n_nodes"),
        )
    )


def longest_chain_depth(edges: DataFrame, max_iter: int = 64) -> DataFrame:
    """Longest downstream chain per node in a DAG (analyze.py:226-253:
    commentary-chain max depth via DFS from root works).

    Iterative relaxation: depth(v) = 1 + max(depth(children)), looping
    until no depth grows (or max_iter as the cycle guard standing in
    for the reference's visited-set). Returns (node, chain_depth) where
    a leaf has depth 0. Roots (no incoming edge) carry the max chain.
    """
    e = edges.select("src", "dst").cache()
    depth = _checkpoint(
        e.select(F.col("src").alias("node"))
        .union(e.select(F.col("dst").alias("node")))
        .distinct()
        .withColumn("chain_depth", F.lit(0))
    )
    for _ in range(max_iter):
        child = depth.withColumnRenamed("node", "dst").withColumnRenamed(
            "chain_depth", "child_depth"
        )
        relaxed = (
            e.join(child, "dst")
            .groupBy(F.col("src").alias("node"))
            .agg((F.max("child_depth") + 1).alias("cand"))
        )
        new_depth = (
            depth.join(relaxed, "node", "left_outer")
            .select(
                "node",
                F.greatest(F.col("chain_depth"), F.coalesce(F.col("cand"), F.lit(0))).alias(
                    "chain_depth"
                ),
            )
        )
        new_depth = _checkpoint(new_depth)
        grew = (
            new_depth.alias("n")
            .join(depth.alias("o"), "node")
            .filter(F.col("n.chain_depth") > F.col("o.chain_depth"))
            .isEmpty()
        )
        depth = new_depth
        if grew:
            break
    return depth


def pagerank(
    edges: DataFrame,
    iters: int = 15,
    damping: float = 0.85,
    vertices: DataFrame | None = None,
) -> DataFrame:
    """Power-iteration PageRank — the engine's substitute surface for
    eigenvector centrality (analyze.py:169-172; SURVEY §2.8 G8).

    Returns (node, rank). Dangling mass is redistributed uniformly each
    round so ranks sum to n. Out-degrees are precomputed once and the
    rank⋈edges join reuses the same key each round — on a cluster the
    edge table would be pre-partitioned by src so every iteration
    shuffles only the rank vector.
    """
    e = edges.select("src", "dst")
    nodes = (
        vertices.select(F.col(vertices.columns[0]).alias("node"))
        if vertices is not None
        else e.select(F.col("src").alias("node")).union(e.select(F.col("dst").alias("node")))
    ).distinct().cache()
    n = nodes.count()
    outd = e.groupBy(F.col("src").alias("node")).agg(F.count(F.lit(1)).alias("out_degree"))
    # contributions flow src -> dst; precompute (src, dst, out_degree)
    adj = e.join(outd, e.src == outd.node).select("src", "dst", "out_degree").cache()

    ranks = _checkpoint(nodes.withColumn("rank", F.lit(1.0)))
    for _ in range(iters):
        contribs = (
            adj.join(ranks.withColumnRenamed("node", "src"), "src")
            .select(F.col("dst").alias("node"), (F.col("rank") / F.col("out_degree")).alias("c"))
            .groupBy("node")
            .agg(F.sum("c").alias("contrib"))
        )
        dangling = (
            ranks.join(outd.select("node"), "node", "left_anti").agg(F.sum("rank")).first()[0]
            or 0.0
        )
        ranks = _checkpoint(
            nodes.join(contribs, "node", "left_outer").select(
                "node",
                (
                    F.lit(1 - damping)
                    + F.lit(damping) * (F.coalesce(F.col("contrib"), F.lit(0.0)) + F.lit(dangling / n))
                ).alias("rank"),
            )
        )
    return ranks
