"""Neighbor-set operators: sameneighbors, jaccard (pair + top-N),
adamicadar, resourceallocation, edgeexist, count.

Reference: SameNeighborTraverser.java:38-68,
JaccardSimilarTraverser.java:48-101, PredictionTraverser.java:36-…,
EdgeExistenceTraverser.java:38-…, CountTraverser.java:47-….

All are compositions of groupBy/join set algebra — one shuffle per
grouping, broadcast for the constant-size source sets.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from incubator_hugegraph_spark.graph import BOTH, NO_LIMIT, OUT, PropertyGraph
from incubator_hugegraph_spark.operators.bfs import prepared_adj


def neighbors(graph: PropertyGraph, vertex: str, direction: str = BOTH,
              labels: list[str] | None = None,
              max_degree: int = NO_LIMIT) -> DataFrame:
    adj = prepared_adj(graph, direction, labels, max_degree)
    return adj.filter(F.col("src") == vertex).select("dst").distinct()


def same_neighbors(graph: PropertyGraph, a: str, b: str,
                   direction: str = BOTH,
                   labels: list[str] | None = None,
                   max_degree: int = NO_LIMIT,
                   limit: int = NO_LIMIT) -> DataFrame:
    """Common neighbors of two vertices (SameNeighborTraverser.java:38-68).
    Returns (id)."""
    common = (neighbors(graph, a, direction, labels, max_degree)
              .intersect(neighbors(graph, b, direction, labels, max_degree))
              .select(F.col("dst").alias("id")))
    if limit != NO_LIMIT:
        common = common.orderBy("id").limit(limit)
    return common


def jaccard_similarity(graph: PropertyGraph, a: str, b: str,
                       direction: str = BOTH,
                       labels: list[str] | None = None,
                       max_degree: int = NO_LIMIT) -> DataFrame:
    """Pair-mode Jaccard |A∩B|/|A∪B| of neighbor sets
    (JaccardSimilarTraverser.jaccardSimilarity :48-79).
    Returns one row (jaccard double, rounded 6)."""
    na = neighbors(graph, a, direction, labels, max_degree)
    nb = neighbors(graph, b, direction, labels, max_degree)
    inter = na.intersect(nb).count()
    union = na.union(nb).distinct().count()
    val = float(inter) / union if union else 0.0
    return graph.spark.createDataFrame([(round(val, 6),)], "jaccard double")


def _common_with_degree(graph: PropertyGraph, a: str, b: str,
                        direction: str, labels: list[str] | None,
                        max_degree: int) -> DataFrame:
    """(id, degree) of each common neighbor z of a and b; degree is
    z's degree in the same direction/labels."""
    common = same_neighbors(graph, a, b, direction, labels, max_degree)
    deg = graph.degrees(direction, labels)
    return common.join(F.broadcast(deg).alias("d"), on="id")


def adamic_adar(graph: PropertyGraph, a: str, b: str,
                direction: str = BOTH, labels: list[str] | None = None,
                max_degree: int = NO_LIMIT) -> DataFrame:
    """Adamic-Adar Σ_z 1/ln(deg(z)) over common neighbors z
    (PredictionTraverser.adamicAdar :36-52). Returns (score)."""
    cz = _common_with_degree(graph, a, b, direction, labels, max_degree)
    return cz.agg(F.round(F.sum(1.0 / F.log(F.col("degree"))), 6)
                  .alias("score"))


def resource_allocation(graph: PropertyGraph, a: str, b: str,
                        direction: str = BOTH,
                        labels: list[str] | None = None,
                        max_degree: int = NO_LIMIT) -> DataFrame:
    """Resource-Allocation Σ_z 1/deg(z)
    (PredictionTraverser.resourceAllocation :53-…). Returns (score)."""
    cz = _common_with_degree(graph, a, b, direction, labels, max_degree)
    return cz.agg(F.round(F.sum(1.0 / F.col("degree")), 6).alias("score"))


def edge_exists(graph: PropertyGraph, src: str, dst: str,
                label: str | None = None,
                sort_values: str | None = None) -> DataFrame:
    """Edge-existence semi-check (EdgeExistenceTraverser.
    queryEdgeExistence :38-…): returns the matching edge rows
    (src, dst, label, sort_values)."""
    e = graph.edges
    cond = (F.col("src") == src) & (F.col("dst") == dst)
    if label is not None:
        cond = cond & (F.col("label") == label)
    if sort_values is not None:
        cond = cond & (F.col("sort_values") == sort_values)
    return e.filter(cond).select("src", "dst", "label", "sort_values")


def count_steps(graph: PropertyGraph, source: str,
                steps: list[dict], dedup: bool = False) -> DataFrame:
    """Multi-step count (CountTraverser.java:47-…): expand through
    ``steps`` (each {direction, labels, max_degree}) and count the
    elements reached at the final step. ``dedup`` → distinct vertices,
    else multiset count of arrivals. Returns (cnt)."""
    cur = graph.spark.createDataFrame([(source,)], "id string")
    for i, st in enumerate(steps):
        adj = prepared_adj(graph, st.get("direction", OUT),
                           st.get("labels"), st.get("max_degree", NO_LIMIT))
        cur = (adj.join(F.broadcast(cur), on=adj.src == cur.id)
               .select(F.col("dst").alias("id")))
        # multiset semantics between steps: every arrival continues
    if dedup:
        cur = cur.distinct()
    return cur.agg(F.count(F.lit(1)).alias("cnt"))
