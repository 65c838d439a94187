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
    # triangle_count composes LAZILY like the other aggregates —
    # eagerly collect()ing it ran the most expensive job at
    # plan-build time even when the caller never acted (review r06)
    tc = triangle_count(graph, labels)
    tri = tc.select(F.col(tc.columns[0]).alias("triangles"))
    return (verts.agg(F.count(F.lit(1)).alias("n_vertices"))
            .crossJoin(e.agg(F.count(F.lit(1)).alias("n_edges")))
            .crossJoin(deg.agg(F.max("d").alias("max_degree"),
                               F.round(F.avg("d"), 4).alias("avg_degree")))
            .crossJoin(tri))


def degree_assortativity(graph: PropertyGraph,
                         labels: list[str] | None = None) -> DataFrame:
    """Degree assortativity (Newman 2002): the Pearson correlation of
    total degrees across edge endpoints — positive = hubs attach to
    hubs, negative = hub-and-spoke. One row: (n_edges, assortativity).

    Scale: degrees are one map-side-combined aggregation; the two
    endpoint joins key on vertex id; the correlation is a single
    scalar aggregate (Spark's corr is a streaming one-pass moment
    computation — no sort, no second pass)."""
    e = graph.edges if labels is None else \
        graph.edges.filter(F.col("label").isin(labels))
    e = e.select("src", "dst")
    deg = (e.select(F.col("src").alias("id"))
           .unionAll(e.select(F.col("dst").alias("id")))
           .groupBy("id").agg(F.count(F.lit(1)).alias("d")))
    j = (e.join(deg.select(F.col("id").alias("src"),
                           F.col("d").alias("ds")), on="src")
         .join(deg.select(F.col("id").alias("dst"),
                          F.col("d").alias("dd")), on="dst"))
    # Newman 2002 treats each edge as an UNORDERED degree pair: the
    # correlation runs over the symmetrized multiset (each edge
    # contributes (ds,dd) AND (dd,ds)), so the result cannot depend
    # on the arbitrary stored orientation, and a star graph yields
    # its textbook -1 instead of a NULL from a zero-variance side
    # (review r06)
    j = j.select("ds", "dd").unionAll(
        j.select(F.col("dd").alias("ds"), F.col("ds").alias("dd")))
    # corr() under ANSI mode throws DIVIDE_BY_ZERO when either degree
    # column is constant (star graphs) — spell out the moment ratio
    # with try_divide so degenerate graphs yield NULL like SQL corr
    j = j.select(F.col("ds").cast("double").alias("ds"),
                 F.col("dd").cast("double").alias("dd"))
    return j.agg(
        (F.count(F.lit(1)) / 2).cast("long").alias("n_edges"),
        F.round(F.expr("try_divide(covar_samp(ds, dd), "
                       "stddev_samp(ds) * stddev_samp(dd))"), 6)
        .alias("assortativity"))


def reciprocity(graph: PropertyGraph,
                labels: list[str] | None = None) -> DataFrame:
    """Directed-edge reciprocity: the fraction of distinct (src, dst)
    pairs whose reverse pair also exists. One row:
    (n_pairs, n_reciprocal, reciprocity).

    Scale: distinct pair set (one dedup shuffle) + one self-semi-join
    on the flipped key — both keyed, no fanout."""
    e = graph.edges if labels is None else \
        graph.edges.filter(F.col("label").isin(labels))
    # self-loops are neither reciprocated nor unreciprocated dyads —
    # counting one as a reciprocal pair inflated the metric (r06)
    pairs = e.select("src", "dst").filter(
        F.col("src") != F.col("dst")).distinct()
    flipped = pairs.select(F.col("dst").alias("src"),
                           F.col("src").alias("dst"))
    recip = pairs.join(flipped, on=["src", "dst"], how="left_semi")
    return (pairs.agg(F.count(F.lit(1)).alias("n_pairs"))
            .crossJoin(recip.agg(F.count(F.lit(1))
                                 .alias("n_reciprocal")))
            .select("n_pairs", "n_reciprocal",
                    F.round(F.col("n_reciprocal") / F.col("n_pairs"), 6)
                    .alias("reciprocity")))
