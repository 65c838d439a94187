"""Write-path operators: upsert merge semantics, TTL, unique checks,
shard scans, pagination, delete cascade, export layout."""

from __future__ import annotations

from pyspark.sql import functions as F

from incubator_hugegraph_spark.operators.mutate import (
    apply_ttl,
    delete_vertices,
    export_graph,
    live,
    page,
    scan_shard,
    shards,
    unique_violations,
    upsert_vertices,
)


def _v(spark, rows):
    return spark.createDataFrame(
        rows, "id string, label string, props map<string,string>, "
              "expired_at timestamp")


def test_upsert_aggregate_types(spark):
    cur = _v(spark, [("v1", "l", {"a": "10", "b": "x", "c": "5",
                                  "s": "p,q", "lst": "1"}, None)])
    new = _v(spark, [("v1", "l", {"a": "3", "b": "y", "c": "7",
                                  "s": "q,r", "lst": "2"}, None),
                     ("v2", "l", {"a": "1"}, None)])
    out = {r["id"]: r["props"] for r in upsert_vertices(
        cur, new, aggregates={"a": "SUM", "b": "OLD", "c": "MAX",
                              "s": "SET", "lst": "LIST"}).collect()}
    assert float(out["v1"]["a"]) == 13.0          # SUM
    assert out["v1"]["b"] == "x"                  # OLD
    assert out["v1"]["c"] == "7"                  # MAX
    assert out["v1"]["s"] == "p,q,r"              # SET: distinct sorted
    assert out["v1"]["lst"] == "1,2"              # LIST: concat
    assert out["v2"]["a"] == "1"                  # plain insert


def test_upsert_none_overwrites(spark):
    cur = _v(spark, [("v1", "l", {"k": "old"}, None)])
    new = _v(spark, [("v1", "l", {"k": "new"}, None)])
    out = upsert_vertices(cur, new).collect()[0]["props"]
    assert out["k"] == "new"


def test_ttl_stamp_and_live(spark):
    df = spark.createDataFrame(
        [(1, "2024-01-01 00:00:00")], "id long, created string") \
        .withColumn("created", F.to_timestamp("created"))
    stamped = apply_ttl(df, 24 * 3600 * 1000, "created")  # 1 day
    assert live(stamped, "2024-01-01 12:00:00").count() == 1
    assert live(stamped, "2024-01-02 12:00:00").count() == 0


def test_unique_violations(spark):
    df = spark.createDataFrame([("a",), ("a",), ("b",)], "k string")
    v = unique_violations(df, ["k"]).collect()
    assert len(v) == 1 and v[0]["k"] == "a" and v[0]["n_elements"] == 2


def test_shards_partition_the_table(graph):
    e = graph.edges.repartition(4).localCheckpoint(eager=True)
    n = shards(e)
    total = sum(scan_shard(e, k).count() for k in range(n))
    assert total == e.count()


def test_cursor_pagination_covers_all(graph):
    cust = graph.vertices_by_label("customer").select("id")
    total = cust.count()
    seen, cursor = [], None
    while True:
        rows = page(cust, "id", 40, cursor=cursor).collect()
        if not rows:
            break
        seen.extend(r["id"] for r in rows)
        cursor = rows[-1]["id"]
    assert len(seen) == total == len(set(seen))
    assert seen == sorted(seen)


def test_delete_cascades_edges(graph):
    v, e = delete_vertices(graph.vertices, graph.edges, ["customer!1"])
    assert v.filter("id = 'customer!1'").count() == 0
    assert e.filter("src = 'customer!1' or dst = 'customer!1'").count() == 0


def test_export_roundtrip(graph, tmp_path, spark):
    out = str(tmp_path / "export")
    export_graph(graph.vertices.limit(100),
                 graph.edges.limit(100), out, edge_buckets=4)
    v = spark.read.parquet(f"{out}/vertices")
    e = spark.read.parquet(f"{out}/edges")
    assert v.count() == 100 and e.count() == 100
    assert set(v.columns) == set(graph.vertices.columns)


def test_bucketed_export_drops_exchanges(graph, spark):
    from incubator_hugegraph_spark.operators.mutate import (
        export_bucketed, load_bucketed)
    export_bucketed(graph, prefix="tb", buckets=8)
    g2 = load_bucketed(spark, prefix="tb", schema=graph.schema)
    # roundtrip parity
    assert g2.edges.count() == graph.edges.count()
    assert g2.vertices.count() == graph.vertices.count()
    assert "customer" in g2.vertex_views
    # aggregation keyed on the bucket column: no shuffle at all
    agg = g2.edges.groupBy("src").count()
    agg.collect()
    plan = agg._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan
    # co-located self-join on src (both sides share the bucket spec):
    # with broadcast off (at real scale neither side broadcasts) the
    # sort-merge join runs with ZERO exchanges — the bucketed layout
    # replaces the shuffle
    thr = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        deg = spark.table("tb_edges").groupBy("src").count()
        j = spark.table("tb_edges").join(deg, on="src")
        j.collect()
        jplan = j._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in jplan, jplan
        assert "SortMergeJoin" in jplan, jplan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", thr)


def test_automatic_id_creates_never_merge(spark):
    """openCypher CREATE / TinkerPop addV must ALWAYS create a new
    element: two creates with identical label+props on an
    AUTOMATIC-id label get DISTINCT ids (r04 ADVICE medium — the
    content-hash fallback silently upsert-merged duplicate
    entities)."""
    from incubator_hugegraph_spark.graph import PropertyGraph
    from incubator_hugegraph_spark.operators.mutate import gen_vertex_id
    from incubator_hugegraph_spark.schema import GraphSchema, VertexLabel

    sch = GraphSchema()
    sch.property_key("name")
    sch.vertex_labels["thing"] = VertexLabel(
        "thing", properties=("name",))  # no primary keys → AUTOMATIC
    v = _v(spark, [])
    e = spark.createDataFrame(
        [], "src string, dst string, label string, sort_values string, "
            "props map<string,string>, expired_at timestamp")
    g = PropertyGraph(spark, v, e, schema=sch)
    a = gen_vertex_id(sch, "thing", {"name": "x"}, graph=g)
    b = gen_vertex_id(sch, "thing", {"name": "x"}, graph=g)
    assert a != b and a.startswith("thing!auto:")
    # PRIMARY_KEY labels still splice deterministically
    sch.vertex_labels["person"] = VertexLabel(
        "person", properties=("name",), primary_keys=("name",))
    assert gen_vertex_id(sch, "person", {"name": "x"}, graph=g) \
        == gen_vertex_id(sch, "person", {"name": "x"}, graph=g) \
        == "person!x"
    # two identical Gremlin addV calls → two vertices
    from incubator_hugegraph_spark.gremlin import G
    G(g).addV("thing").property("name", "dup").iterate()
    G(g).addV("thing").property("name", "dup").iterate()
    assert g.vertices.filter("props['name'] = 'dup'").count() == 2


def test_automatic_id_counter_seeds_past_persisted_ids(spark):
    """A graph reloaded with label!auto:N vertices must not reuse
    those ids (code review r05: a fresh counter restarted at 1 and
    silently upsert-merged into existing entities)."""
    from incubator_hugegraph_spark.graph import PropertyGraph
    from incubator_hugegraph_spark.operators.mutate import gen_vertex_id
    from incubator_hugegraph_spark.schema import GraphSchema, VertexLabel
    sch = GraphSchema()
    sch.property_key("name")
    sch.vertex_labels["thing"] = VertexLabel("thing", properties=("name",))
    v = _v(spark, [("thing!auto:7", "thing", {"name": "old"}, None)])
    e = spark.createDataFrame(
        [], "src string, dst string, label string, sort_values string, "
            "props map<string,string>, expired_at timestamp")
    g = PropertyGraph(spark, v, e, schema=sch)
    nid = gen_vertex_id(sch, "thing", {"name": "new"}, graph=g)
    # never reuses a persisted id; the exact value also reflects the
    # process-wide floor, so assert the invariant, not a literal
    assert nid.startswith("thing!auto:")
    assert int(nid.rsplit(":", 1)[1]) > 7


def test_automatic_id_unique_across_rewraps_and_objects(spark):
    """r05 ADVICE low + code review r06: counters on two
    PropertyGraph objects wrapping the same tables (authorized
    views, isolated entry copies) must never mint the same id — even
    BEFORE either write persists (the process-wide monotonic floor),
    and without a per-create O(|V|) rescan (seeded once per
    object)."""
    from incubator_hugegraph_spark.graph import PropertyGraph
    from incubator_hugegraph_spark.operators.mutate import (
        gen_vertex_id, upsert_vertices)
    from incubator_hugegraph_spark.schema import GraphSchema, VertexLabel
    sch = GraphSchema()
    sch.property_key("name")
    sch.vertex_labels["thing"] = VertexLabel("thing", properties=("name",))
    e = spark.createDataFrame(
        [], "src string, dst string, label string, sort_values string, "
            "props map<string,string>, expired_at timestamp")
    gA = PropertyGraph(spark, _v(spark, []), e, schema=sch)
    id1 = gen_vertex_id(sch, "thing", {"name": "a"}, graph=gA)
    gA.vertices = upsert_vertices(gA.vertices, _v(
        spark, [(id1, "thing", {"name": "a"}, None)]))
    # second wrapper over gA's CURRENT tables
    gB = PropertyGraph(spark, gA.vertices, e, schema=sch)
    id2 = gen_vertex_id(sch, "thing", {"name": "b"}, graph=gB)
    # interleave: gA mints again (its own table changed meanwhile),
    # then gB mints again WITHOUT having persisted id2 — the r06
    # review showed the per-table-change reseed still collided here
    id3 = gen_vertex_id(sch, "thing", {"name": "c"}, graph=gA)
    id4 = gen_vertex_id(sch, "thing", {"name": "d"}, graph=gB)
    assert len({id1, id2, id3, id4}) == 4, (id1, id2, id3, id4)
    # seeding is once-per-object: minting again must not trigger a
    # new vertex-table scan (no fresh Spark job needed — cached max)
    assert hasattr(gA, "_auto_id_persisted_max")
    assert hasattr(gB, "_auto_id_persisted_max")


def test_rest_rejects_reserved_and_ambiguous_explicit_ids(spark):
    """Explicit REST vertex ids may not take the reserved
    '!auto:<n>' shape (collides with a future counter value) nor
    contain a raw '>' (would make the 4-part EdgeId splice
    ambiguous) — r05 ADVICE low + r06 escape hardening."""
    import pytest as _pt

    from incubator_hugegraph_spark import rest
    from incubator_hugegraph_spark.graph import PropertyGraph
    from incubator_hugegraph_spark.schema import GraphSchema, VertexLabel
    sch = GraphSchema()
    sch.property_key("name")
    sch.vertex_labels["thing"] = VertexLabel("thing", properties=("name",))
    e = spark.createDataFrame(
        [], "src string, dst string, label string, sort_values string, "
            "props map<string,string>, expired_at timestamp")
    g = PropertyGraph(spark, _v(spark, []), e, schema=sch)
    for bad in ("thing!auto:7", "a>b", "a\\"):
        with _pt.raises(ValueError, match="Invalid explicit vertex id"):
            rest.execute_graph_crud(g, "POST", "vertices",
                                    {"id": bad, "label": "thing",
                                     "properties": {"name": "x"}})
    # escaped forms (engine-spliced ids) and paired backslashes pass
    rest.execute_graph_crud(g, "POST", "vertices",
                            {"id": "person!a\\>b", "label": "thing",
                             "properties": {"name": "esc"}})
    # edge endpoints get the same validation
    sch.edge_labels = getattr(sch, "edge_labels", {})
    from incubator_hugegraph_spark.schema import EdgeLabel
    sch.edge_labels["met"] = EdgeLabel("met", "thing", "thing")
    for bad_end in ("x>y", "x\\"):
        with _pt.raises(ValueError, match="Invalid edge endpoint id"):
            rest.execute_graph_crud(g, "POST", "edges",
                                    {"outV": bad_end, "inV": "custom-0",
                                     "label": "met", "properties": {}})
    # a normal explicit id still lands
    rest.execute_graph_crud(g, "POST", "vertices",
                            {"id": "custom-1", "label": "thing",
                             "properties": {"name": "ok"}})
    assert g.vertices.filter("id = 'custom-1'").count() == 1
