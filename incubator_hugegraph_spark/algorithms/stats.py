"""Counting + subgraph stats jobs.

Reference: CountVertexAlgorithm.java (77), CountEdgeAlgorithm.java
(77), SubgraphStatAlgorithm.java (221).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from incubator_hugegraph_spark.graph import BOTH, PropertyGraph


def count_vertex(graph: PropertyGraph) -> DataFrame:
    return graph.vertices.groupBy("label").agg(
        F.count(F.lit(1)).alias("cnt"))


def count_edge(graph: PropertyGraph) -> DataFrame:
    return graph.edges.groupBy("label").agg(F.count(F.lit(1)).alias("cnt"))


def subgraph_stat(graph: PropertyGraph,
                  labels: list[str] | None = None) -> DataFrame:
    """Stats bundle on a label-filtered subgraph
    (SubgraphStatAlgorithm.java): vertex/edge counts, degree extremes,
    triangle count — one row. Composes the §2.E algorithms."""
    from incubator_hugegraph_spark.algorithms.community import triangle_count

    e = graph.edges if labels is None else \
        graph.edges.filter(F.col("label").isin(labels))
    verts = (e.select(F.col("src").alias("id"))
             .union(e.select(F.col("dst").alias("id"))).distinct())
    deg = (e.select(F.col("src").alias("id"))
           .unionAll(e.select(F.col("dst").alias("id")))
           .groupBy("id").agg(F.count(F.lit(1)).alias("d")))
    tri = triangle_count(graph, labels).collect()[0][0]
    return (verts.agg(F.count(F.lit(1)).alias("n_vertices"))
            .crossJoin(e.agg(F.count(F.lit(1)).alias("n_edges")))
            .crossJoin(deg.agg(F.max("d").alias("max_degree"),
                               F.round(F.avg("d"), 4).alias("avg_degree")))
            .withColumn("triangles", F.lit(tri)))
