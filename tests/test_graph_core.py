"""M0: graph build, schema registry, adjacency view, degree, TTL."""

from __future__ import annotations

import datetime

from pyspark.sql import functions as F

from incubator_hugegraph_spark.graph import BOTH, IN, OUT, PropertyGraph, cap_degree
from incubator_hugegraph_spark.schema import GraphSchema, IdStrategy, splice_id
from incubator_hugegraph_spark.sources.tpch import fixture_schema


def test_schema_registry_roundtrip():
    s = fixture_schema()
    assert "customer" in s.vertex_labels
    assert s.edge_labels["contains"].sort_keys == ("linenumber",)
    s2 = GraphSchema.from_json(s.to_json())
    assert s2.vertex_labels["part"].primary_keys == ("name", "brand")
    assert s2.edge_labels["placed"].source_label == "customer"
    assert s2.vertex_labels["order"].id_strategy == IdStrategy.CUSTOMIZE_STRING


def test_schema_link_pruning():
    s = fixture_schema()
    assert set(s.edge_labels_from("customer")) == {"in_nation", "placed",
                                                   "interacted"}
    assert set(s.edge_labels_to("part")) == {"contains", "supplies"}


def test_splice_id_escaping():
    assert splice_id("person", "ok") == "person!ok"
    assert splice_id("person", "we!ird") == "person!we\\!ird"


def test_vertex_edge_counts(graph, duck):
    vc = {r["label"]: r["n"] for r in
          graph.vertices.groupBy("label").agg(F.count("*").alias("n")).collect()}
    for tbl, label in [("region", "region"), ("nation", "nation"),
                       ("customer", "customer"), ("supplier", "supplier"),
                       ("part", "part"), ("orders", "order")]:
        n = duck.execute(f"SELECT count(*) FROM {tbl}").fetchone()[0]
        assert vc[label] == n, label

    ec = {r["label"]: r["n"] for r in
          graph.edges.groupBy("label").agg(F.count("*").alias("n")).collect()}
    assert ec["contains"] == duck.execute(
        "SELECT count(*) FROM lineitem").fetchone()[0]
    assert ec["placed"] == duck.execute(
        "SELECT count(*) FROM orders").fetchone()[0]
    assert ec["supplies"] == duck.execute(
        "SELECT count(DISTINCT (l_suppkey, l_partkey)) FROM lineitem").fetchone()[0]
    # interacted: one edge per consecutive same-type event pair with
    # distinct users
    n_inter = duck.execute("""
        SELECT count(*) FROM (
          SELECT lag(user_id) OVER (PARTITION BY event_type
                                    ORDER BY ts, event_id) AS pu, user_id
          FROM events) WHERE pu IS NOT NULL AND pu <> user_id
    """).fetchone()[0]
    assert ec["interacted"] == n_inter


def test_adjacency_directions(graph):
    cust = "customer!1"
    out_n = graph.adj(OUT).filter(F.col("src") == cust).count()
    in_n = graph.adj(IN).filter(F.col("src") == cust).count()
    both_n = graph.adj(BOTH).filter(F.col("src") == cust).count()
    assert both_n == out_n + in_n
    # label filter restricts expansion
    placed = graph.adj(OUT, labels=["placed"]).filter(F.col("src") == cust)
    assert placed.count() <= out_n
    assert {r["label"] for r in placed.collect()} <= {"placed"}


def test_degree_cap_deterministic(graph):
    adj = graph.adj(OUT)
    capped = cap_degree(adj, 3)
    worst = (capped.groupBy("src").count().agg(F.max("count")).collect()[0][0])
    assert worst <= 3
    # deterministic: same result twice
    a = sorted(map(tuple, capped.filter(F.col("src") == "order!1").collect()))
    b = sorted(map(tuple, cap_degree(graph.adj(OUT), 3)
                   .filter(F.col("src") == "order!1").collect()))
    assert a == b


def test_ttl_filter(spark, graph):
    past = datetime.datetime(2000, 1, 1)
    future = datetime.datetime(2100, 1, 1)
    extra = spark.createDataFrame(
        [("x!1", "x", {}, past), ("x!2", "x", {}, future), ("x!3", "x", {}, None)],
        schema=graph.vertices.schema)
    g2 = PropertyGraph(spark=spark, vertices=graph.vertices.unionByName(extra),
                       edges=graph.edges, schema=graph.schema)
    got = {r["id"] for r in g2.vertices.filter(F.col("label") == "x").collect()}
    assert got == {"x!2", "x!3"}  # expired row invisible at read time


def test_bucketed_graph_roundtrip_no_shuffle(spark, graph, tmp_path):
    """write_graph materializes src-bucketed edges; reading back, a
    src-keyed degree aggregation must plan WITHOUT a shuffle exchange
    (the owner-vertex clustering analogue at 100 TB)."""
    from incubator_hugegraph_spark.sources.tpch import (
        read_bucketed_graph, write_graph)
    write_graph(graph, str(tmp_path / "store"), buckets=8)
    g2 = read_bucketed_graph(spark)
    assert g2.edges.count() == graph.edges.count()
    assert g2.vertices.count() == graph.vertices.count()
    deg = g2.edges.groupBy("src").count()
    plan = deg._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan


def test_analyzer_registry_segment(spark):
    """Analyzer plugin surface (AnalyzerFactory.java): named analyzers
    behind one segment() signature; bigram = the CJK fallback."""
    import pytest
    from incubator_hugegraph_spark.functions.text import segment
    df = spark.createDataFrame([("Hello, World",), ("ab",), ("x",)],
                               "t string")
    words = df.select(segment("t", "word").alias("s")).collect()
    assert words[0].s == ["hello", "world"]
    grams = df.select(segment("t", "bigram").alias("s")).collect()
    assert grams[1].s == ["ab"]
    assert grams[2].s == ["x"]
    assert grams[0].s[:3] == ["he", "el", "ll"]
    with pytest.raises(ValueError):
        segment("t", "nope")


def test_edges_by_ids_quadruple(graph):
    rows = graph.edges.select("src", "label", "sort_values", "dst") \
        .orderBy("src", "label", "sort_values", "dst").limit(3).collect()
    ids = [(r.src, r.label, r.sort_values, r.dst) for r in rows]
    got = graph.edges_by_ids(ids)
    assert got.count() == 3
    assert graph.edges_by_ids([("nope!0", "x", "", "nope!1")]).count() == 0


def test_graph_variables_roundtrip(tmp_path):
    from incubator_hugegraph_spark.graph import GraphVariables
    p = str(tmp_path / "variables.json")
    v = GraphVariables(p)
    v.set("refreshed_at", "2026-08-13")
    v.set("build", 7)
    assert GraphVariables(p).all() == {"refreshed_at": "2026-08-13",
                                       "build": 7}
    v.remove("build")
    assert GraphVariables(p).get("build") is None


def test_schema_persists_with_store(spark, graph, tmp_path):
    from incubator_hugegraph_spark.sources.tpch import (
        read_bucketed_graph, write_graph)
    out = str(tmp_path / "store2")
    write_graph(graph, out, buckets=4)
    g2 = read_bucketed_graph(spark, out_dir=out)
    assert set(g2.schema.vertex_labels) == set(graph.schema.vertex_labels)
    assert set(g2.schema.edge_labels) == set(graph.schema.edge_labels)


def test_register_views_sql_entry(spark, graph):
    names = graph.register_views()
    assert {"g_vertices", "g_edges", "g_adj", "g_customer",
            "g_placed"} <= set(names)
    n = spark.sql("SELECT count(*) AS c FROM g_vertices").collect()[0].c
    assert n == graph.vertices.count()


def test_analyzer_registry_and_pandas_udf_plugin(spark):
    """The analyzer plugin surface (AnalyzerFactory.java): built-in
    word/bigram analyzers plus a pandas_udf registered behind the
    same segment() signature (the CJK-segmenter slot)."""
    from pyspark.sql import functions as F
    from incubator_hugegraph_spark.functions.text import (
        register_analyzer, segment)
    df = spark.createDataFrame([("Hello Spark World",)], "t string")
    assert df.select(segment("t", "word").alias("x")).head().x \
        == ["hello", "spark", "world"]
    bi = df.select(segment("t", "bigram").alias("x")).head().x
    assert bi[0] == "he" and "os" in bi  # crosses the stripped space
    # pandas_udf analyzer: comma splitter, Arrow-batched
    from pyspark.sql.functions import pandas_udf
    # no type hints: this module has `from __future__ import
    # annotations`, which turns hints into strings pyspark can't infer
    comma = pandas_udf(lambda s: s.str.split(","), "array<string>")
    register_analyzer("comma", lambda c: comma(c))
    got = (spark.createDataFrame([("a,b,c",)], "t string")
           .select(segment("t", "comma").alias("x")).head().x)
    assert got == ["a", "b", "c"]
    import pytest as _pt
    with _pt.raises(ValueError):
        segment("t", "nope")


def test_cjk_fmm_analyzer(spark):
    """Dictionary FMM segmenter: longest match wins, single-char
    fallback, mixed-script passthrough matches the word rule."""
    from incubator_hugegraph_spark.functions.text import (
        make_fmm_analyzer, segment)
    df = spark.createDataFrame(
        [("分布式系统和图计算引擎X",), ("数据库 spark 4引擎",), ("abc莫def",)],
        "t string")
    rows = df.select(segment("t", "cjk").alias("s")).collect()
    assert rows[0].s == ["分布式系统", "和", "图计算", "引擎", "x"]
    assert rows[1].s == ["数据库", "spark", "4", "引擎"]
    # '莫' is not in the dictionary -> single-char fallback
    assert rows[2].s == ["abc", "莫", "def"]
    # custom dictionary changes the segmentation
    seg2 = make_fmm_analyzer({"图计算引擎"})
    got = df.limit(1).select(seg2("t").alias("s")).head().s
    assert "图计算引擎" in got


def test_rmm_and_bimm_analyzers(spark):
    """Classic segmentation ambiguity: with dict {数据, 数据库, 库存},
    FMM greedily takes 数据库+存 (single-char tail) while RMM finds
    数据+库存; BiMM prefers the segmentation with fewer single-char
    tokens (RMM here)."""
    from incubator_hugegraph_spark.functions.text import (
        make_bimm_analyzer, make_fmm_analyzer, make_rmm_analyzer)
    d = {"数据", "数据库", "库存"}
    df = spark.createDataFrame([("数据库存",)], "t string")
    fmm = df.select(make_fmm_analyzer(d)("t").alias("s")).head().s
    rmm = df.select(make_rmm_analyzer(d)("t").alias("s")).head().s
    bimm = df.select(make_bimm_analyzer(d)("t").alias("s")).head().s
    assert fmm == ["数据库", "存"]
    assert rmm == ["数据", "库存"]
    assert bimm == rmm
    # mixed-script parity with the FMM pass
    df2 = spark.createDataFrame([("abc数据库 x9",)], "t string")
    assert df2.select(make_rmm_analyzer(d)("t").alias("s")).head().s \
        == ["abc", "数据库", "x9"]


def test_create_sql_views(graph, spark):
    names = graph.create_sql_views(prefix="t_")
    assert "t_vertices" in names and "t_v_customer" in names
    n = spark.sql("SELECT count(*) AS n FROM t_vertices").head().n
    assert n == graph.vertices.count()
    joined = spark.sql("""
        SELECT count(*) AS n FROM t_v_nation v
        JOIN t_e_located_in e ON e.src = v.id""").head().n
    assert joined == graph.view("nation").count()
