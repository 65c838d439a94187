"""Build the fixture property graph from the driver's TPC-H-ish
parquet tables, exactly per FIXTURES.md §A.

THIS DERIVATION IS THE CONTRACT between the Spark engine and the
DuckDB oracles in __spark_entry__.py — any change here must be
mirrored in the EDGE_SQL/VERTEX_SQL CTEs there.

Vertex labels : region nation customer supplier part order
Edge labels   : in_nation located_in supplier_nation placed contains
                supplies interacted

``contains`` is frequency=MULTIPLE with sort key l_linenumber
(multi-edges between the same order/part — EdgeLabel.java:52
sortKeys semantics). ``interacted`` is derived from `events`: within
each event_type, events ordered by (ts, event_id); each consecutive
pair with distinct users yields one customer→customer edge keyed by
the later event's id (deterministic, window-lag expressible in both
Spark and ANSI SQL).

Scale notes: dimension tables (region/nation/supplier) are broadcast
size at any SF; edges are built with one pass over each source table
(no self-joins except the events lag window, which shuffles once on
event_type). write_graph() materializes edges bucketed by src so that
downstream BFS joins co-locate adjacency with its owner vertex — the
DataFrame analogue of the reference's EdgeId clustering
(core/backend/id/EdgeId.java:31-38).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from incubator_hugegraph_spark.functions.ids import splice_id_col
from incubator_hugegraph_spark.graph import PropertyGraph
from incubator_hugegraph_spark.schema import Cardinality, Frequency, GraphSchema, IdStrategy

VERTEX_LABELS = ["region", "nation", "customer", "supplier", "part", "order"]
EDGE_LABELS = ["in_nation", "located_in", "supplier_nation", "placed",
               "contains", "supplies", "interacted"]


def fixture_schema() -> GraphSchema:
    s = GraphSchema()
    pk = s.property_key
    for name, dt in [("name", "TEXT"), ("acctbal", "DOUBLE"),
                     ("mktsegment", "TEXT"), ("brand", "TEXT"),
                     ("type", "TEXT"), ("size", "INT"),
                     ("retailprice", "DOUBLE"), ("orderstatus", "TEXT"),
                     ("totalprice", "DOUBLE"), ("orderdate", "DATE"),
                     ("orderpriority", "TEXT"), ("quantity", "DOUBLE"),
                     ("extendedprice", "DOUBLE"), ("discount", "DOUBLE"),
                     ("shipdate", "DATE"), ("event_type", "TEXT"),
                     ("ts", "DATE"), ("value", "DOUBLE"),
                     ("linenumber", "INT"), ("event_id", "LONG")]:
        pk(name, dt)
    pk("comment", "TEXT", Cardinality.LIST)  # ported LIST-cardinality scenario
    vl = s.vertex_label
    vl("region", properties=("name",), primary_keys=("name",))
    vl("nation", properties=("name",), primary_keys=("name",))
    vl("customer", properties=("name", "acctbal", "mktsegment"),
       primary_keys=("name",), nullable_keys=("mktsegment",))
    vl("supplier", properties=("name", "acctbal"), primary_keys=("name",))
    vl("part", properties=("name", "brand", "type", "size", "retailprice"),
       primary_keys=("name", "brand"))  # composite pk scenario
    vl("order", properties=("orderstatus", "totalprice", "orderdate",
                            "orderpriority", "comment"),
       primary_keys=("orderstatus",), id_strategy=IdStrategy.CUSTOMIZE_STRING,
       nullable_keys=("comment",))
    el = s.edge_label
    el("in_nation", "customer", "nation")
    el("located_in", "nation", "region")
    el("supplier_nation", "supplier", "nation")
    el("placed", "customer", "order",
       properties=("orderdate", "totalprice"))
    el("contains", "order", "part",
       properties=("linenumber", "quantity", "extendedprice", "discount",
                   "shipdate"),
       sort_keys=("linenumber",), frequency=Frequency.MULTIPLE)
    el("supplies", "supplier", "part")
    el("interacted", "customer", "customer",
       properties=("event_id", "event_type", "ts", "value"),
       sort_keys=("event_id",), frequency=Frequency.MULTIPLE)
    return s


# Columns that may be stored as TIMESTAMP(NANOS) in the driver parquet.
# events.ts carries a non-zero ns remainder; Spark's native nanos read
# ROUNDS to µs while DuckDB FLOORS — so we read nanos as exact longs
# (spark.sql.legacy.parquet.nanosAsLong) and floor-divide, matching the
# oracle bit-for-bit.
_NANO_TS_COLS = {"orders": ["o_orderdate"], "lineitem": ["l_shipdate"],
                 "events": ["ts"]}


def _fix_ts(name: str, df: DataFrame) -> DataFrame:
    for c in _NANO_TS_COLS.get(name, []):
        dt = dict(df.dtypes).get(c)
        if dt == "bigint":
            df = df.withColumn(
                c, F.timestamp_micros(F.expr(f"`{c}` div 1000")))
        elif dt == "timestamp_ntz":
            # µs-precision parquet inferred as NTZ; session tz is UTC so
            # the cast to TIMESTAMP is value-preserving, and watermarks
            # (which reject NTZ event time) work on the result.
            df = df.withColumn(c, F.col(c).cast("timestamp"))
    return df


def read_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one driver table, canonicalizing nano-timestamps (exact
    floor to µs — see _NANO_TS_COLS)."""
    if name in _NANO_TS_COLS:
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    return _fix_ts(name,
                   spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet")))


def read_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    names = ["region", "nation", "customer", "supplier", "part", "orders",
             "lineitem", "events"]
    return {n: read_table(spark, sf_dir, n) for n in names}


def _vid(label: str, key) -> F.Column:
    return splice_id_col(label, key)


def build_vertex_views(t: dict[str, DataFrame]) -> dict[str, DataFrame]:
    return {
        "region": t["region"].select(
            _vid("region", "r_regionkey").alias("id"),
            F.col("r_name").alias("name")),
        "nation": t["nation"].select(
            _vid("nation", "n_nationkey").alias("id"),
            F.col("n_name").alias("name")),
        "customer": t["customer"].select(
            _vid("customer", "c_custkey").alias("id"),
            F.col("c_name").alias("name"),
            F.col("c_acctbal").alias("acctbal"),
            F.col("c_mktsegment").alias("mktsegment")),
        "supplier": t["supplier"].select(
            _vid("supplier", "s_suppkey").alias("id"),
            F.col("s_name").alias("name"),
            F.col("s_acctbal").alias("acctbal")),
        "part": t["part"].select(
            _vid("part", "p_partkey").alias("id"),
            F.col("p_name").alias("name"),
            F.col("p_brand").alias("brand"),
            F.col("p_type").alias("type"),
            F.col("p_size").alias("size"),
            F.col("p_retailprice").alias("retailprice")),
        "order": t["orders"].select(
            _vid("order", "o_orderkey").alias("id"),
            F.col("o_orderstatus").alias("orderstatus"),
            F.col("o_totalprice").alias("totalprice"),
            F.col("o_orderdate").alias("orderdate"),
            F.col("o_orderpriority").alias("orderpriority")),
    }


def build_edge_views(t: dict[str, DataFrame]) -> dict[str, DataFrame]:
    ev = t["events"]
    # interacted: within event_type ordered by (ts, event_id), edge
    # prev_user → user for consecutive events with distinct users.
    w = Window.partitionBy("event_type").orderBy("ts", "event_id")
    inter = (ev
             .withColumn("prev_user", F.lag("user_id").over(w))
             .filter(F.col("prev_user").isNotNull()
                     & (F.col("prev_user") != F.col("user_id")))
             .select(_vid("customer", "prev_user").alias("src"),
                     _vid("customer", "user_id").alias("dst"),
                     F.col("event_id").cast("string").alias("sort_values"),
                     F.col("event_type"),
                     F.col("ts"),
                     F.col("value")))
    li = t["lineitem"]
    return {
        "in_nation": t["customer"].select(
            _vid("customer", "c_custkey").alias("src"),
            _vid("nation", "c_nationkey").alias("dst"),
            F.lit("").alias("sort_values")),
        "located_in": t["nation"].select(
            _vid("nation", "n_nationkey").alias("src"),
            _vid("region", "n_regionkey").alias("dst"),
            F.lit("").alias("sort_values")),
        "supplier_nation": t["supplier"].select(
            _vid("supplier", "s_suppkey").alias("src"),
            _vid("nation", "s_nationkey").alias("dst"),
            F.lit("").alias("sort_values")),
        "placed": t["orders"].select(
            _vid("customer", "o_custkey").alias("src"),
            _vid("order", "o_orderkey").alias("dst"),
            F.lit("").alias("sort_values"),
            F.col("o_orderdate").alias("orderdate"),
            F.col("o_totalprice").alias("totalprice")),
        "contains": li.select(
            _vid("order", "l_orderkey").alias("src"),
            _vid("part", "l_partkey").alias("dst"),
            F.col("l_linenumber").cast("string").alias("sort_values"),
            F.col("l_quantity").alias("quantity"),
            F.col("l_extendedprice").alias("extendedprice"),
            F.col("l_discount").alias("discount"),
            F.col("l_shipdate").alias("shipdate")),
        "supplies": li.select(
            _vid("supplier", "l_suppkey").alias("src"),
            _vid("part", "l_partkey").alias("dst"))
            .distinct()
            .withColumn("sort_values", F.lit("")),
        "interacted": inter,
    }


def _props_map(df: DataFrame, prop_cols: list[str]) -> F.Column:
    pairs = []
    for c in prop_cols:
        pairs.extend([F.lit(c), F.col(c).cast("string")])
    if not pairs:
        return F.create_map().cast("map<string,string>")
    return F.map_filter(F.create_map(*pairs), lambda k, v: v.isNotNull())


def build_graph(spark: SparkSession, sf_dir: str,
                schema: GraphSchema | None = None) -> PropertyGraph:
    """Assemble the canonical vertices/edges DataFrames + typed views."""
    t = read_tables(spark, sf_dir)
    vviews = build_vertex_views(t)
    eviews = build_edge_views(t)

    vparts = []
    for label, df in vviews.items():
        prop_cols = [c for c in df.columns if c != "id"]
        vparts.append(df.select(
            "id", F.lit(label).alias("label"),
            _props_map(df, prop_cols).alias("props"),
            F.lit(None).cast("timestamp").alias("expired_at")))
    vertices = vparts[0]
    for p in vparts[1:]:
        vertices = vertices.unionByName(p)

    eparts = []
    for label, df in eviews.items():
        prop_cols = [c for c in df.columns
                     if c not in ("src", "dst", "sort_values")]
        eparts.append(df.select(
            "src", "dst", F.lit(label).alias("label"), "sort_values",
            _props_map(df, prop_cols).alias("props"),
            F.lit(None).cast("timestamp").alias("expired_at")))
    edges = eparts[0]
    for p in eparts[1:]:
        edges = edges.unionByName(p)

    return PropertyGraph(spark=spark, vertices=vertices, edges=edges,
                         schema=schema or fixture_schema(),
                         vertex_views=vviews, edge_views=eviews)


def write_graph(graph: PropertyGraph, out_dir: str,
                buckets: int = 64) -> None:
    """Materialize the canonical tables for repeated analytics.

    Edges bucketed+sorted by src (adjacency locality — the Spark
    analogue of the reference's owner-vertex edge clustering);
    vertices bucketed by id. Bucketed tables let every frontier join
    and degree aggregation run shuffle-free on the edge side. At
    100 TB, bump ``buckets`` to O(#cores) and add
    ``partitionBy('label')`` for label-pruned scans.
    """
    spark = graph.spark
    spark.sql(f"CREATE DATABASE IF NOT EXISTS hugegraph LOCATION '{out_dir}'")
    (graph.edges.write.mode("overwrite")
     .bucketBy(buckets, "src").sortBy("src", "label", "sort_values")
     .option("path", os.path.join(out_dir, "edges"))
     .saveAsTable("hugegraph.edges"))
    (graph.vertices.write.mode("overwrite")
     .bucketBy(buckets, "id").sortBy("id")
     .option("path", os.path.join(out_dir, "vertices"))
     .saveAsTable("hugegraph.vertices"))
    # schema registry rides the store as a JSON side file
    # (SchemaTransaction persistence → SURVEY §1.3); a schema-less
    # graph writes no side file instead of crashing AFTER the tables
    # landed (review r06 — the reader falls back when it is absent)
    if graph.schema is not None:
        with open(os.path.join(out_dir, "schema.json"), "w") as f:
            f.write(graph.schema.to_json())


def read_bucketed_graph(spark: SparkSession,
                        schema: GraphSchema | None = None,
                        out_dir: str | None = None) -> PropertyGraph:
    """Reopen a write_graph() materialization. The bucket metadata
    rides the table catalog, so src-keyed aggregations and co-bucketed
    joins over the edge table plan WITHOUT an Exchange — the Spark
    analogue of the reference reading edges clustered under their
    owner vertex (EdgeId layout, core/backend/id/EdgeId.java:31-38).
    When ``out_dir`` is given, the persisted schema.json is loaded."""
    if schema is None and out_dir is not None:
        p = os.path.join(out_dir, "schema.json")
        if os.path.exists(p):
            with open(p) as f:
                schema = GraphSchema.from_json(f.read())
    return PropertyGraph(spark,
                         vertices=spark.table("hugegraph.vertices"),
                         edges=spark.table("hugegraph.edges"),
                         schema=schema or fixture_schema())
