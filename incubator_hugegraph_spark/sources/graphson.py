"""GraphSON-style adjacency-list export / import.

The reference serves graph io() through its TinkerPop runtime
(GraphSON read/write — the format hugegraph-loader and the TinkerPop
ecosystem exchange). This module is the Spark-native equivalent: one
JSON document per vertex with its outgoing edges inlined under
``outE`` (the GraphSON adjacency shape), produced and consumed as
DataFrames of JSON strings so the lines can live anywhere Spark can
write (text files, object stores, message queues).

Scale shape: export groups edges ONCE on src (one keyed shuffle; at
most one row per vertex) and left-joins vertices — adjacency stays
co-located with its owner vertex exactly like the EdgeId clustering
(core/backend/id/EdgeId.java:31-38). Import is two narrow
explode/inline passes over the parsed lines — no shuffle at all.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from incubator_hugegraph_spark.graph import PropertyGraph

_EDGE_STRUCT = ("array<struct<inV:string,label:string,"
                "sort_values:string,properties:map<string,string>>>")
_LINE_SCHEMA = (f"id string, label string, "
                f"properties map<string,string>, outE {_EDGE_STRUCT}")


def to_graphson(graph: PropertyGraph) -> DataFrame:
    """One GraphSON adjacency line per vertex: {"id", "label",
    "properties", "outE": [{"inV", "label", "sort_values",
    "properties"}…]}. Returns a single-column (json string)
    DataFrame."""
    # no sort_array: Spark can't order structs containing maps; outE
    # order is non-semantic (import is set-oriented)
    oute = (graph.edges
            .groupBy(F.col("src").alias("id"))
            .agg(F.collect_list(F.struct(
                F.col("dst").alias("inV"), F.col("label"),
                F.col("sort_values"),
                F.col("props").alias("properties"))).alias("outE")))
    # an edge whose OWNER vertex is absent (e.g. TTL-expired) has no
    # document to nest under and is intentionally not exported — the
    # reference's TTL semantics expire a vertex's edges with it
    # (documented; review r06 asked for this to be explicit)
    doc = (graph.vertices
           .select("id", "label", F.col("props").alias("properties"))
           .join(oute, on="id", how="left"))
    return doc.select(F.to_json(F.struct(
        "id", "label", "properties", "outE")).alias("json"))


def from_graphson(spark: SparkSession, lines: DataFrame,
                  schema=None) -> PropertyGraph:
    """Parse GraphSON adjacency lines (a (json string) DataFrame —
    e.g. ``spark.read.text(path)`` renamed to ``json``) back into a
    PropertyGraph. Typed per-label views re-derive from the canonical
    tables when a schema registry is supplied."""
    parsed = lines.select(
        F.from_json(F.col("json"), _LINE_SCHEMA).alias("v"))
    vertices = parsed.select(
        F.col("v.id").alias("id"), F.col("v.label").alias("label"),
        F.coalesce("v.properties",
                   F.create_map().cast("map<string,string>"))
        .alias("props"),
        F.lit(None).cast("timestamp").alias("expired_at"))
    edges = (parsed
             .select(F.col("v.id").alias("src"),
                     F.explode("v.outE").alias("e"))
             .select("src", F.col("e.inV").alias("dst"),
                     F.col("e.label").alias("label"),
                     F.coalesce(F.col("e.sort_values"), F.lit(""))
                     .alias("sort_values"),
                     F.coalesce("e.properties",
                                F.create_map()
                                .cast("map<string,string>"))
                     .alias("props"),
                     F.lit(None).cast("timestamp").alias("expired_at")))
    g = PropertyGraph(spark=spark, vertices=vertices, edges=edges,
                      schema=schema)
    if schema is not None:
        g.refresh_vertex_views()
        g.refresh_edge_views()  # typed EDGE views too (review r06)
    return g
