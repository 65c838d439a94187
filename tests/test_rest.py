"""REST adapter parity: the reference API tests' literal request
payloads (test/api/traversers/*ApiTest.java) executed through
rest.execute against the marko fixture, asserting the reference's
expected outputs."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from incubator_hugegraph_spark.rest import execute
from tests.test_traversers import marko_graph  # noqa: F401 (fixture)


def test_kout_get_payload(marko_graph):
    """KoutApiTest.testGet params verbatim."""
    got = {r.id for r in execute(marko_graph, "kout", {
        "source": '"person!marko"', "max_depth": 2,
    }).collect()}
    assert got == {"person!josh"}


def test_kout_post_payload(marko_graph):
    """KoutApiTest.testPost body verbatim (Steps shape with
    P.gt(0.1) predicates): depth-1 BOTH from marko → size 2."""
    body = {
        "source": "person!marko",
        "steps": {
            "direction": "BOTH",
            "edge_steps": [
                {"label": "knows", "properties": {"weight": "P.gt(0.1)"}},
                {"label": "created", "properties": {"weight": "P.gt(0.1)"}},
            ],
            "vertex_steps": [],
            "max_degree": 10000,
            "skip_degree": 100000,
        },
        "max_depth": 1,
        "nearest": True,
        "limit": 10000,
        "with_vertex": True,
        "with_path": True,
    }
    got = {r.id for r in execute(marko_graph, "kout", body).collect()}
    assert got == {"person!peter", "software!ripple"}


def test_kneighbor_get_payload(marko_graph):
    """KneighborApiTest.testGet params verbatim."""
    got = {r.id for r in execute(marko_graph, "kneighbor", {
        "source": '"person!marko"', "max_depth": 2,
    }).collect()}
    assert got == {"person!peter", "software!ripple", "person!josh"}


def test_count_post_payload(marko_graph):
    """CountApiTest.testCount body verbatim (documented deviation:
    level-synchronous dedup gives 2 where the reference's lazy DFS
    interleave gives 3 — see test_count_api_scenario)."""
    body = {"source": "person!marko",
            "steps": [{"labels": [], "degree": 100, "skip_degree": 100},
                      {"labels": [], "degree": 100, "skip_degree": 100},
                      {"labels": [], "degree": 100, "skip_degree": 100}]}
    assert execute(marko_graph, "count", body).head().cnt == 2


def test_template_paths_post_payload(marko_graph):
    """TemplatePathsApiTest.testPost body verbatim — label+property
    vertex selectors, max_times repeat step; expects exactly the path
    vadas←josh←peter→ripple."""
    body = {
        "sources": {"ids": [], "label": "person",
                    "properties": {"name": "vadas"}},
        "targets": {"ids": [], "label": "software",
                    "properties": {"name": "ripple"}},
        "steps": [
            {"direction": "IN", "labels": ["knows"], "properties": {},
             "max_degree": 10000, "max_times": 2, "skip_degree": 100000},
            {"direction": "OUT", "labels": ["created"], "properties": {},
             "max_degree": 10000, "skip_degree": 100000},
        ],
        "capacity": 10000, "limit": 10, "with_vertex": True,
    }
    rows = execute(marko_graph, "templatepaths", body).collect()
    assert len(rows) == 1
    assert rows[0].path == \
        "person!vadas>person!josh>person!peter>software!ripple"


def test_customized_crosspoints_post_payload(marko_graph):
    """CustomizedCrosspointsApiTest.testPost body verbatim: sources
    marko+ripple, one BOTH step, degree -1 → crosspoints exist (the
    reference asserts 2 paths; our operator returns the crosspoint
    vertices common to both sources)."""
    body = {
        "sources": {"ids": ["person!marko", "software!ripple"]},
        "path_patterns": [{"steps": [{"direction": "BOTH", "labels": [],
                                      "degree": -1}]}],
        "with_path": True, "with_vertex": True,
        "capacity": -1, "limit": -1,
    }
    got = {r.crosspoint for r in
           execute(marko_graph, "customizedcrosspoints", body).collect()}
    assert got == {"person!peter"}


def test_shortestpath_get_payload(marko_graph):
    """ShortestPathApiTest.testGet params verbatim."""
    row = execute(marko_graph, "shortestpath", {
        "source": '"person!marko"', "target": '"person!vadas"',
        "max_depth": 3,
    }).head()
    assert row.path == "person!marko>person!peter>person!josh>person!vadas"


def test_adamicadar_get_payload(marko_graph):
    """AdamicAdarAPITest.testGet params verbatim."""
    row = execute(marko_graph, "adamicadar", {
        "vertex": '"person!marko"', "other": '"person!josh"',
    }).head()
    assert row.score == pytest.approx(0.910239, abs=1e-6)


def test_same_neighbors_get_payload(marko_graph):
    """SameNeighborsApiTest.testGet params verbatim."""
    got = {r.id for r in execute(marko_graph, "sameneighbors", {
        "vertex": '"person!marko"', "other": '"person!josh"',
    }).collect()}
    assert got == {"person!peter"}


def test_vertices_and_edges_payloads(marko_graph):
    """VerticesAPI / EdgesAPI bulk-fetch by ids."""
    v = execute(marko_graph, "vertices",
                {"ids": ['"person!marko"', "person!josh"]})
    assert v.count() == 2
    e = execute(marko_graph, "edges",
                {"ids": ["person!josh>knows>2021-01-01>person!vadas"]})
    assert e.count() == 1


def test_unknown_endpoint_and_unsupported_forms(marko_graph):
    with pytest.raises(KeyError):
        execute(marko_graph, "nope", {})
    with pytest.raises(NotImplementedError):
        execute(marko_graph, "rings", {"source": "person!marko",
                                       "max_depth": 2,
                                       "source_in_ring": False})


def test_algorithm_job_payloads(marko_graph):
    """Algorithm-job adapter (AlgorithmPool names + KEY_* params):
    spot-check the registry with reference-shaped param maps."""
    from incubator_hugegraph_spark.rest import execute_algorithm
    cv = {r.label: r.cnt if "cnt" in r.__fields__ else r["count"]
          for r in execute_algorithm(marko_graph, "count_vertex").collect()}
    assert cv.get("person") == 4 and cv.get("software") == 2
    dc = execute_algorithm(marko_graph, "degree_centrality",
                           {"direction": "BOTH", "top": 1}).head()
    assert dc.id == "person!peter" and dc.degree == 3
    pr = execute_algorithm(marko_graph, "page_rank",
                           {"alpha": 0.15, "times": 3, "top": 2})
    assert pr.count() == 2
    wc = execute_algorithm(marko_graph, "weak_connected_component", {})
    # the marko component plus the isolated software!lop
    assert wc.select("component").distinct().count() == 2
    tri = execute_algorithm(marko_graph, "triangle_count", {}).head()
    assert tri.triangles == 1  # marko-peter-ripple
    with pytest.raises(KeyError):
        execute_algorithm(marko_graph, "nope", {})
    with pytest.raises(NotImplementedError):
        execute_algorithm(marko_graph, "closeness_centrality",
                          {"source_sample": 10})


def test_kout_post_vertex_steps(marko_graph):
    """vertex_steps whitelist (HugeTraverser.validateVertex): BOTH
    endpoints must carry a whitelisted label and satisfy its
    conditions — restricting to person drops the created→ripple edge;
    a city condition narrows further."""
    body = {
        "source": "person!marko",
        "steps": {"direction": "BOTH",
                  "edge_steps": [],
                  "vertex_steps": [{"label": "person", "properties": {}}]},
        "max_depth": 1, "nearest": True,
    }
    got = {r.id for r in execute(marko_graph, "kout", body).collect()}
    assert got == {"person!peter"}
    body["steps"]["vertex_steps"] = [
        {"label": "person", "properties": {"city": "Beijing"}}]
    body["max_depth"] = 2
    # allowed vertices: marko, josh (Beijing) — no marko edge has both
    # endpoints allowed (peter is Shanghai, ripple is software)
    assert execute(marko_graph, "kout", body).count() == 0


def test_same_neighbors_vertex_list_payload(marko_graph):
    """SameNeighborsAPI POST vertex_list (N-way): common neighbors of
    marko, josh, ripple in BOTH direction = {peter}."""
    got = {r.id for r in execute(marko_graph, "sameneighbors", {
        "vertex_list": ["person!marko", "person!josh", "software!ripple"],
        "direction": "BOTH",
    }).collect()}
    assert got == {"person!peter"}
    with pytest.raises(ValueError):
        execute(marko_graph, "sameneighbors",
                {"vertex_list": ["person!marko"]}).count()


def test_count_only_payload(marko_graph):
    """count_only=true returns the size (KoutAPI/KneighborAPI response
    metadata) — kneighbor depth-2 BOTH from marko reaches 3."""
    row = execute(marko_graph, "kneighbor", {
        "source": '"person!marko"', "max_depth": 2, "count_only": True,
    }).head()
    assert row.size == 3
    row = execute(marko_graph, "kout", {
        "source": '"person!marko"', "max_depth": 2, "count_only": True,
    }).head()
    assert row.size == 1


def test_rest_kout_kneighbor_with_path_and_edge(graph):
    from incubator_hugegraph_spark import rest
    # kneighbor POST with_path: every ≤2-hop vertex carries a path
    kp = rest.execute(graph, "kneighbor", {
        "source": "customer!1", "max_depth": 2, "direction": "OUT",
        "with_path": True})
    rows = kp.collect()
    assert rows and all(r.path.startswith("customer!1>") for r in rows)
    assert {r.dist for r in rows} <= {1, 2}
    # kout POST with_path: only the exactly-depth layer
    ko = rest.execute(graph, "kout", {
        "source": "customer!1", "max_depth": 2, "direction": "OUT",
        "with_path": True})
    krows = ko.collect()
    assert krows and all(r.dist == 2 for r in krows)
    # same ids as the plain kout query
    plain = rest.execute(graph, "kout", {
        "source": "customer!1", "max_depth": 2, "direction": "OUT"})
    assert sorted(r.id for r in krows) == sorted(r.id for r in plain.collect())
    # with_edge: neighborhood subgraph edges have both endpoints reached
    ke = rest.execute(graph, "kneighbor", {
        "source": "customer!1", "max_depth": 1, "direction": "OUT",
        "with_edge": True})
    reached = {"customer!1"} | {r.id for r in rest.execute(
        graph, "kneighbor", {"source": "customer!1", "max_depth": 1,
                             "direction": "OUT"}).collect()}
    for e in ke.collect():
        assert e.src in reached and e.dst in reached


def test_rest_schema_endpoints_reference_payloads():
    """SchemaAPI payload shapes (api/api/schema/*API.java, request
    bodies in the style of SchemaApiTest) driven through the
    GraphSchema registry."""
    import pytest
    from incubator_hugegraph_spark import GraphSchema, rest
    s = GraphSchema()
    for pk in [{"name": "name", "data_type": "TEXT"},
               {"name": "age", "data_type": "INT"},
               {"name": "time", "data_type": "TEXT"},
               {"name": "weight", "data_type": "DOUBLE",
                "cardinality": "LIST"}]:
        rest.execute_schema(s, "POST", "propertykeys", pk)
    got = rest.execute_schema(s, "GET", "propertykeys/weight")
    assert got["cardinality"] == "LIST" and got["data_type"] == "DOUBLE"
    rest.execute_schema(s, "POST", "vertexlabels", {
        "name": "person", "id_strategy": "PRIMARY_KEY",
        "properties": ["name", "age"], "primary_keys": ["name"],
        "nullable_keys": ["age"]})
    rest.execute_schema(s, "POST", "vertexlabels", {
        "name": "software", "id_strategy": "CUSTOMIZE_STRING",
        "properties": ["name"]})
    rest.execute_schema(s, "POST", "edgelabels", {
        "name": "created", "source_label": "person",
        "target_label": "software", "frequency": "MULTIPLE",
        "sort_keys": ["time"], "properties": ["time", "weight"]})
    el = rest.execute_schema(s, "GET", "edgelabels/created")
    assert el["frequency"] == "MULTIPLE" and el["sort_keys"] == ["time"]
    rest.execute_schema(s, "POST", "indexlabels", {
        "name": "personByAge", "base_type": "VERTEX_LABEL",
        "base_value": "person", "index_type": "RANGE",
        "fields": ["age"]})
    assert len(rest.execute_schema(s, "GET", "indexlabels")) == 1
    # constraint checks ride the builders: MULTIPLE needs sort_keys,
    # properties must be declared
    with pytest.raises(ValueError):
        rest.execute_schema(s, "POST", "edgelabels", {
            "name": "knows", "source_label": "person",
            "target_label": "person", "frequency": "MULTIPLE"})
    with pytest.raises(ValueError):
        rest.execute_schema(s, "POST", "vertexlabels", {
            "name": "bad", "properties": ["nope"],
            "primary_keys": ["nope"]})
    rest.execute_schema(s, "DELETE", "indexlabels/personByAge")
    assert rest.execute_schema(s, "GET", "indexlabels") == []


def test_rest_variables_endpoint(tmp_path):
    import pytest
    from incubator_hugegraph_spark import rest
    from incubator_hugegraph_spark.graph import GraphVariables
    v = GraphVariables(str(tmp_path / "vars.json"))
    rest.execute_variables(v, "PUT", "answer", {"data": 42})
    assert rest.execute_variables(v, "GET", "answer") == {"answer": 42}
    assert rest.execute_variables(v, "GET") == {"answer": 42}
    # persisted across reopen (the JSON side file)
    v2 = GraphVariables(str(tmp_path / "vars.json"))
    assert rest.execute_variables(v2, "GET", "answer") == {"answer": 42}
    rest.execute_variables(v2, "DELETE", "answer")
    with pytest.raises(KeyError):
        rest.execute_variables(v2, "GET", "answer")


# ---- round 3: ApiMeasurer + graph spaces ----------------------------


def test_measured_kneighbor(marko_graph):
    from incubator_hugegraph_spark.rest import execute_measured
    out, meas = execute_measured(marko_graph, "kneighbor",
                                 {"source": "person!marko",
                                  "max_depth": 2, "direction": "OUT"})
    assert {r.id for r in out.collect()} \
        == {"person!peter", "software!ripple", "person!josh"}
    # visited = {marko, peter, ripple, josh}; expanded = dist<2 =
    # {marko(2 out-edges), peter(2), ripple(0)}
    assert meas == {"vertex.iterations": 4, "edge.iterations": 4}


def test_measured_kout(marko_graph):
    from incubator_hugegraph_spark.rest import execute_measured
    out, meas = execute_measured(marko_graph, "kout",
                                 {"source": "person!marko",
                                  "max_depth": 2, "direction": "OUT"})
    assert {r.id for r in out.collect()} == {"person!josh"}
    assert meas == {"vertex.iterations": 4, "edge.iterations": 4}


def test_measured_sameneighbors(marko_graph):
    from incubator_hugegraph_spark.rest import execute_measured
    out, meas = execute_measured(
        marko_graph, "sameneighbors",
        {"vertex": "person!marko", "other": "person!peter"})
    assert {r.id for r in out.collect()} == {"software!ripple"}
    # BOTH degrees: marko 2 + peter 3; distinct iterated neighbors
    # {peter, ripple, marko, josh} + the 2 sources
    assert meas == {"vertex.iterations": 6, "edge.iterations": 5}


def test_measured_unsupported_endpoint(marko_graph):
    from incubator_hugegraph_spark.rest import execute_measured
    with pytest.raises(NotImplementedError):
        execute_measured(marko_graph, "rings", {"source": "person!marko"})


def test_graph_space_manager(marko_graph):
    from incubator_hugegraph_spark.gremlin import G
    from incubator_hugegraph_spark.rest import GraphSpaceManager
    mgr = GraphSpaceManager()
    mgr.register("hugegraph", marko_graph)
    sub = G(marko_graph).E("created").subgraph()
    mgr.register("created_only", sub, space="analytics")
    assert mgr.list_spaces() == ["DEFAULT", "analytics"]
    assert mgr.list_graphs() == ["hugegraph"]
    assert mgr.list_graphs("analytics") == ["created_only"]
    # the same endpoint executes against either named graph
    full = mgr.execute("DEFAULT", "hugegraph", "kneighbor",
                       {"source": "person!marko", "max_depth": 1,
                        "direction": "OUT"}).count()
    only = mgr.execute("analytics", "created_only", "kneighbor",
                       {"source": "person!marko", "max_depth": 1,
                        "direction": "OUT"}).count()
    assert (full, only) == (2, 1)
    _, meas = mgr.execute_measured(
        "analytics", "created_only", "kneighbor",
        {"source": "person!marko", "max_depth": 1, "direction": "OUT"})
    assert meas["edge.iterations"] == 1
    with pytest.raises(KeyError):
        mgr.graph("nope")
    with pytest.raises(ValueError):
        mgr.drop_space("DEFAULT")


def test_task_scheduler_lifecycle(marko_graph):
    from incubator_hugegraph_spark.rest import TaskScheduler
    ts = TaskScheduler()
    tid = ts.submit_algorithm(marko_graph, "degree_centrality",
                              {"top": 3})
    rec = ts.wait(tid, timeout=120)
    assert rec["task_status"] == "SUCCESS" and rec["id"] == tid
    rows = ts.result(tid).collect()
    assert 0 < len(rows) <= 3
    # failed task records the error and stays queryable
    bad = ts.submit_algorithm(marko_graph, "no_such_algorithm")
    rec2 = ts.wait(bad, timeout=120)
    assert rec2["task_status"] == "FAILED"
    assert "no_such_algorithm" in (rec2["task_result"] or "")
    with pytest.raises(RuntimeError):
        ts.result(bad)
    # listing + status filter + unknown id
    assert [t["id"] for t in ts.list()] == [tid, bad]
    assert [t["id"] for t in ts.list("success")] == [tid]
    with pytest.raises(KeyError):
        ts.get(999)
    # cancel on a finished task is a no-op that returns the record
    assert ts.cancel(tid, marko_graph.spark)["task_status"] == "SUCCESS"


def test_graphs_api_management(marko_graph):
    from incubator_hugegraph_spark.rest import GraphSpaceManager
    m = GraphSpaceManager()
    m.register("hugegraph", marko_graph)
    assert m.list_graphs() == ["hugegraph"]
    # clone: O(1) lineage copy, isolated from the original
    clone = m.clone_graph("hugegraph", "hugegraph2")
    assert m.list_graphs() == ["hugegraph", "hugegraph2"]
    n = marko_graph.vertices.count()
    assert clone.vertices.count() == n
    # clear requires the reference's literal confirm string
    with pytest.raises(ValueError):
        m.clear_graph("hugegraph2", confirm_message="yes")
    m.clear_graph("hugegraph2",
                  confirm_message="I'm sure to delete all data")
    assert clone.vertices.count() == 0 and clone.edges.count() == 0
    # the source graph is untouched by clearing the clone
    assert m.graph("hugegraph").vertices.count() == n
    # snapshot → mutate → resume rolls back
    m.snapshot_create("hugegraph")
    g = m.graph("hugegraph")
    g.vertices = g.vertices.limit(1)
    assert m.graph("hugegraph").vertices.count() == 1
    assert m.snapshot_resume("hugegraph") == {
        "hugegraph": "snapshot_resumed"}
    assert m.graph("hugegraph").vertices.count() == n
    # mode + read-mode validation mirrors GraphsAPI
    assert m.mode("hugegraph") == {"mode": "NONE"}
    assert m.set_mode("hugegraph", "RESTORING") == {"mode": "RESTORING"}
    with pytest.raises(ValueError):
        m.set_mode("hugegraph", "TURBO")
    with pytest.raises(ValueError):
        m.set_graph_read_mode("hugegraph", "OLAP_ONLY")
    assert m.set_graph_read_mode("hugegraph", "OLTP_ONLY") == {
        "graph_read_mode": "OLTP_ONLY"}
    # manage + drop
    assert m.manage({"action": "reload"}) == {"graphs": "reloaded"}
    with pytest.raises(ValueError):
        m.manage({"action": "explode"})
    with pytest.raises(ValueError):
        m.drop_graph("hugegraph2")
    m.drop_graph("hugegraph2",
                 confirm_message="I'm sure to drop the graph")
    assert m.list_graphs() == ["hugegraph"]
    with pytest.raises(KeyError):
        m.graph("hugegraph2")


def test_vertex_edge_crud_doors(marko_graph):
    from incubator_hugegraph_spark.rest import execute_graph_crud as crud
    g = marko_graph
    # single create with explicit id; batch create; reference payloads
    vid = crud(g, "POST", "vertices", {
        "id": "person!crud1", "label": "person",
        "properties": {"name": "crud1", "age": 40, "city": "Beijing"}})
    assert vid == "person!crud1"
    ids = crud(g, "POST", "vertices/batch", [
        {"id": "person!crud2", "label": "person",
         "properties": {"name": "crud2", "age": 41, "city": "Shanghai"}},
        {"id": "person!crud3", "label": "person",
         "properties": {"name": "crud3", "age": 42, "city": "Beijing"}}])
    assert ids == ["person!crud2", "person!crud3"]
    # GET one / GET list with label+property filters
    row = crud(g, "GET", "vertices/person!crud1").head()
    assert row.props["age"] == "40"
    got = crud(g, "GET", "vertices",
               params={"label": "person",
                       "properties": {"city": "Beijing"}})
    assert {"person!crud1", "person!crud3"} <= {
        r.id for r in got.collect()}
    # PUT append / eliminate (reference action semantics)
    crud(g, "PUT", "vertices/person!crud1",
         {"properties": {"age": 99}}, {"action": "append"})
    assert crud(g, "GET", "vertices/person!crud1") \
        .head().props["age"] == "99"
    crud(g, "PUT", "vertices/person!crud1",
         {"properties": {"city": ""}}, {"action": "eliminate"})
    assert "city" not in crud(g, "GET", "vertices/person!crud1") \
        .head().props
    with pytest.raises(ValueError):
        crud(g, "PUT", "vertices/person!crud1",
             {"properties": {}}, {"action": "replace"})
    # null property rejected like JsonVertex.checkUpdate
    with pytest.raises(ValueError):
        crud(g, "POST", "vertices", {
            "label": "person", "properties": {"name": None}})
    # edges: create, get, eliminate prop, delete; cascade on vertex
    eid = crud(g, "POST", "edges", {
        "label": "knows", "outV": "person!crud1", "inV": "person!crud2",
        "outVLabel": "person", "inVLabel": "person",
        "properties": {"weight": 0.9}})
    assert crud(g, "GET", f"edges/{eid}").head().props["weight"] == "0.9"
    n_before = g.edges.count()
    crud(g, "DELETE", f"edges/{eid}")
    assert g.edges.count() == n_before - 1
    crud(g, "POST", "edges", {
        "label": "knows", "outV": "person!crud1",
        "inV": "person!crud3", "properties": {}})
    crud(g, "DELETE", "vertices/person!crud1")
    assert crud(g, "GET", "vertices/person!crud1").count() == 0
    assert g.edges.filter("src = 'person!crud1'").count() == 0
    # cleanup the other two
    crud(g, "DELETE", "vertices/person!crud2")
    crud(g, "DELETE", "vertices/person!crud3")


def test_version_and_metrics_doors(spark):
    from incubator_hugegraph_spark.rest import (execute_metrics,
                                                execute_version)
    v = execute_version()
    assert set(v["versions"]) == {"version", "core", "gremlin", "api"}
    import pyspark
    assert v["versions"]["core"] == pyspark.__version__
    m = execute_metrics(spark)["gauges"]
    assert m["default.parallelism"] >= 1
    assert m["shuffle.partitions"] >= 1 and "spark.version" in m


def test_async_gremlin_and_cypher_jobs(marko_graph):
    from incubator_hugegraph_spark.rest import TaskScheduler
    ts = TaskScheduler()
    tid = ts.submit_gremlin(
        marko_graph, "g.V().hasLabel('person').count()")
    rec = ts.wait(tid, timeout=120)
    assert rec["task_status"] == "SUCCESS"
    assert ts.result(tid).head().cnt == 4
    cid = ts.submit_cypher(
        marko_graph, "MATCH (p:person) RETURN count(*) AS n")
    assert ts.wait(cid, timeout=120)["task_status"] == "SUCCESS"
    assert ts.result(cid).head().n == 4
    bad = ts.submit_gremlin(marko_graph, "g.V().frobnicate()")
    assert ts.wait(bad, timeout=120)["task_status"] == "FAILED"


def test_crud_schema_validation(spark):
    from incubator_hugegraph_spark.rest import execute_graph_crud as crud
    from incubator_hugegraph_spark.sources.tpch import build_graph
    g = build_graph(spark, "/root/testdata/sf0.001")
    # customer label declares (name, acctbal, mktsegment) with
    # mktsegment nullable: undeclared key rejected, missing non-null
    # rejected — with OR without an explicit id (the reference checks
    # non-nullable keys on every write regardless of id strategy,
    # GraphTransaction.checkVertexProperties; r04 ADVICE low)
    with pytest.raises(ValueError, match="Invalid property"):
        crud(g, "POST", "vertices", {
            "label": "customer",
            "properties": {"name": "x", "acctbal": 1.0, "wat": 1}})
    with pytest.raises(ValueError, match="non-null property"):
        crud(g, "POST", "vertices", {
            "label": "customer", "properties": {"name": "x"}})
    with pytest.raises(ValueError, match="non-null property"):
        crud(g, "POST", "vertices", {
            "id": "customer!999001", "label": "customer",
            "properties": {"name": "x"}})
    vid = crud(g, "POST", "vertices", {
        "id": "customer!999001", "label": "customer",
        "properties": {"name": "x", "acctbal": 1.0}})
    assert vid == "customer!999001"
    crud(g, "DELETE", f"vertices/{vid}")
