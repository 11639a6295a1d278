"""Graph-analytics operators over the edge table
(``scripts/analysis/graph_metrics.py`` ports).

* connected components — union-find on the collected edge list when it
  fits (graphs of canonical entities are vocabulary-sized); iterative
  min-label propagation otherwise (same pattern as
  operators/canonicalize.py, where the distributed variant lives).
* sampled betweenness — BFS shortest paths from a deterministic sample
  of sources, node frequency across path interior
  (graph_metrics.py:256-287).
"""

from __future__ import annotations

from collections import deque

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _undirected_pairs(edges: DataFrame):
    return (
        edges.select(F.col("subj_id").alias("a"), F.col("obj_id").alias("b"))
        .filter(F.col("a") != F.col("b"))
        .distinct()
    )


def graph_components(edges: DataFrame, driver_edge_limit: int = 2_000_000) -> DataFrame:
    """(node_id, component_id) for every node that has an edge.

    Entity-graph edges are vocabulary-sized (distinct facts), so the
    driver union-find path applies at any realistic scale; falls back
    to distributed label propagation above ``driver_edge_limit``."""
    und = _undirected_pairs(edges)
    n = und.limit(driver_edge_limit + 1).count()
    if n <= driver_edge_limit:
        rows = und.collect()
        parent: dict = {}

        def find(x):
            root = x
            while parent.get(root, root) != root:
                root = parent[root]
            while parent.get(x, x) != root:
                parent[x], x = root, parent[x]
            return root

        for r in rows:
            ra, rb = find(r.a), find(r.b)
            if ra != rb:
                parent[max(ra, rb)] = min(ra, rb)
        nodes = {r.a for r in rows} | {r.b for r in rows}
        out = [(node, find(node)) for node in nodes]
        return edges.sparkSession.createDataFrame(
            out, "node_id long, component_id long"
        )

    sym = und.unionByName(und.select(F.col("b").alias("a"), F.col("a").alias("b")))
    labels = sym.select(F.col("a").alias("node_id")).distinct() \
        .withColumn("component_id", F.col("node_id")).localCheckpoint(eager=True)
    for _ in range(25):
        neighbor_min = (
            sym.join(labels.withColumnRenamed("node_id", "a"), "a")
            .groupBy(F.col("b").alias("node_id"))
            .agg(F.min("component_id").alias("nlabel"))
        )
        new_labels = (
            labels.join(neighbor_min, "node_id", "left")
            .select(
                "node_id",
                F.least(F.col("component_id"), F.coalesce("nlabel", "component_id"))
                .alias("component_id"),
            )
            .localCheckpoint(eager=True)
        )
        changed = (
            new_labels.alias("n").join(labels.alias("o"), "node_id")
            .filter(F.col("n.component_id") != F.col("o.component_id"))
            .limit(1).count()
        )
        labels = new_labels
        if changed == 0:
            break
    return labels


def component_sizes(edges: DataFrame) -> DataFrame:
    return (
        graph_components(edges)
        .groupBy("component_id")
        .agg(F.count(F.lit(1)).alias("n_nodes"))
        .orderBy(F.desc("n_nodes"), "component_id")
    )


def betweenness_sampled(
    edges: DataFrame, n_sources: int = 16, max_hops: int = 6
) -> DataFrame:
    """Approximate betweenness: run BFS from a deterministic sample of
    source nodes (smallest ids — stable across runs), count how often
    each node sits on a sampled shortest path's interior
    (graph_metrics.py:256-287). Adjacency is collected once — the
    entity graph is vocabulary-sized; at larger scales swap the BFS
    for the frontier-join pattern in plans/queries.shortest_path_length."""
    und = _undirected_pairs(edges)
    rows = und.collect()
    adj: dict[int, list[int]] = {}
    for r in rows:
        adj.setdefault(r.a, []).append(r.b)
        adj.setdefault(r.b, []).append(r.a)
    sources = sorted(adj)[:n_sources]

    counts: dict[int, int] = {}
    for src in sources:
        # BFS tree with parent tracking → one shortest path per node
        parent = {src: None}
        q = deque([(src, 0)])
        while q:
            node, d = q.popleft()
            if d >= max_hops:
                continue
            for nb in sorted(adj.get(node, [])):
                if nb not in parent:
                    parent[nb] = node
                    q.append((nb, d + 1))
        for dst in parent:
            node = parent[dst]
            while node is not None and node != src:
                counts[node] = counts.get(node, 0) + 1
                node = parent[node]
    out = [(k, v) for k, v in sorted(counts.items())]
    spark = edges.sparkSession
    if not out:
        return spark.createDataFrame([], "node_id long, betweenness long")
    return spark.createDataFrame(out, "node_id long, betweenness long") \
        .orderBy(F.desc("betweenness"), "node_id")
