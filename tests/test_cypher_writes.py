"""Cypher write clauses (CREATE/SET/DELETE) and named paths.

The reference's Cypher surface accepts writes — its own API test
creates data through it (test/api/CypherApiTest.java:62). Writes here
compile onto the batch mutate surface (operators/mutate.py), so these
tests run on a private graph per test, never the shared session
fixture.
"""

from __future__ import annotations

import pytest

from incubator_hugegraph_spark.cypher import cypher
from incubator_hugegraph_spark.graph import PropertyGraph
from incubator_hugegraph_spark.schema import (EdgeLabel, GraphSchema,
                                              VertexLabel)


@pytest.fixture()
def wgraph(spark):
    """Small mutable person graph (marko-style, with schema types)."""
    people = ["marko", "vadas", "josh", "peter"]
    cities = {"marko": "Beijing", "vadas": "HongKong",
              "josh": "Beijing", "peter": "Shanghai"}
    vrows = [(f"person!{p}", "person", {"city": cities[p], "name": p}, None)
             for p in people]
    erows = [
        ("person!marko", "person!peter", "knows", "", {"weight": "0.5"},
         None),
        ("person!peter", "person!josh", "knows", "", {"weight": "0.4"},
         None),
        ("person!josh", "person!vadas", "knows", "", {"weight": "0.3"},
         None)]
    sch = GraphSchema()
    sch.property_key("name")
    sch.property_key("city")
    sch.property_key("age", "INT")
    sch.vertex_labels["person"] = VertexLabel(
        "person", properties=("name", "age", "city"),
        primary_keys=("name",), nullable_keys=("age", "city"))
    sch.edge_labels["knows"] = EdgeLabel("knows", "person", "person")
    v = spark.createDataFrame(
        vrows, "id string, label string, props map<string,string>, "
               "expired_at timestamp")
    e = spark.createDataFrame(
        erows, "src string, dst string, label string, sort_values string, "
               "props map<string,string>, expired_at timestamp")
    return PropertyGraph(spark, v, e, schema=sch)


def test_reference_create_scenario(wgraph):
    """CypherApiTest.testCreate verbatim: response contains 'Hefei'."""
    rows = cypher(wgraph, "CREATE (n:person { name : 'test', age: 20, "
                          "city: 'Hefei' }) return n").collect()
    assert len(rows) == 1
    assert "Hefei" in rows[0][0]
    assert '"id":"person!test"' in rows[0][0]  # PRIMARY_KEY splice


def test_create_read_back_typed(wgraph):
    cypher(wgraph, "CREATE (n:person {name: 'test', age: 20, "
                   "city: 'Hefei'})").collect()
    rb = cypher(wgraph, "MATCH (n:person) WHERE n.name = 'test' "
                        "RETURN n, n.age AS age, n.city AS city").head()
    assert rb.n == "person!test"
    assert rb.age == 20  # INT through the schema registry
    assert rb.city == "Hefei"


def test_create_is_upsert_on_primary_key(wgraph):
    cypher(wgraph, "CREATE (n:person {name: 'test', age: 20})").collect()
    cypher(wgraph, "CREATE (n:person {name: 'test', age: 30})").collect()
    rows = cypher(wgraph, "MATCH (n:person) WHERE n.name = 'test' "
                          "RETURN n.age AS age").collect()
    assert [r.age for r in rows] == [30]  # merged, not duplicated


def test_set_expression_and_literal(wgraph):
    cypher(wgraph, "CREATE (n:person {name: 'test', age: 20, "
                   "city: 'Hefei'})").collect()
    cypher(wgraph, "MATCH (n:person) WHERE n.name = 'test' "
                   "SET n.age = n.age + 1, n.city = 'Wuhan'").collect()
    rb = cypher(wgraph, "MATCH (n:person) WHERE n.name = 'test' "
                        "RETURN n.age AS age, n.city AS city").head()
    assert rb.age == 21 and rb.city == "Wuhan"


def test_set_preserves_untouched_props(wgraph):
    cypher(wgraph, "MATCH (n:person {name: 'marko'}) "
                   "SET n.age = 29").collect()
    rb = cypher(wgraph, "MATCH (n:person {name: 'marko'}) "
                        "RETURN n.age AS age, n.city AS city").head()
    assert rb.age == 29 and rb.city == "Beijing"


def test_create_relationship_between_matched(wgraph):
    cypher(wgraph, "CREATE (n:person {name: 'test'})").collect()
    cypher(wgraph, "MATCH (a:person {name: 'marko'}), "
                   "(b:person {name: 'test'}) "
                   "CREATE (a)-[:knows]->(b)").collect()
    rows = cypher(wgraph, "MATCH (a:person {name: 'marko'})-[:knows]->(b) "
                          "RETURN b ORDER BY b").collect()
    assert [r.b for r in rows] == ["person!peter", "person!test"]


def test_create_node_and_edge_in_one_pattern(wgraph):
    cypher(wgraph, "CREATE (a:person {name: 'x1'})-[:knows]->"
                   "(b:person {name: 'x2'})").collect()
    rows = cypher(wgraph, "MATCH (a:person {name: 'x1'})-[:knows]->(b) "
                          "RETURN b").collect()
    assert [r.b for r in rows] == ["person!x2"]


def test_delete_guard_and_detach(wgraph):
    cypher(wgraph, "CREATE (n:person {name: 'test'})").collect()
    cypher(wgraph, "MATCH (a:person {name: 'marko'}), "
                   "(b:person {name: 'test'}) "
                   "CREATE (a)-[:knows]->(b)").collect()
    with pytest.raises(ValueError, match="DETACH"):
        cypher(wgraph, "MATCH (n:person {name: 'test'}) "
                       "DELETE n").collect()
    cypher(wgraph, "MATCH (n:person {name: 'test'}) "
                   "DETACH DELETE n").collect()
    left = cypher(wgraph, "MATCH (n:person) RETURN n ORDER BY n").collect()
    assert [r.n for r in left] == ["person!josh", "person!marko",
                                   "person!peter", "person!vadas"]
    # cascade removed the incident edge
    out = cypher(wgraph, "MATCH (a:person {name: 'marko'})-[:knows]->(b) "
                         "RETURN b").collect()
    assert [r.b for r in out] == ["person!peter"]


def test_write_without_return_yields_summary(wgraph):
    out = cypher(wgraph, "CREATE (n:person {name: 'test'})").collect()
    assert [(r.id, r.label) for r in out] == [("person!test", "person")]


def test_delete_relationship_by_var(wgraph):
    cypher(wgraph, "MATCH (a:person {name: 'marko'})-[r:knows]->(b) "
                   "DELETE r").collect()
    out = cypher(wgraph, "MATCH (a:person {name: 'marko'})-[:knows]->(b) "
                         "RETURN b").collect()
    assert out == []
    # endpoints survive
    n = cypher(wgraph, "MATCH (n:person) RETURN count(*) AS n").head().n
    assert n == 4


# ---- named paths ----------------------------------------------------


def test_named_path_varlen_functions(wgraph):
    rows = cypher(wgraph, """
        MATCH p = (a:person)-[:knows*1..3]->(b:person)
        WHERE a.name = 'marko'
        RETURN nodes(p) AS ns, relationships(p) AS rs, length(p) AS ln
        ORDER BY ln""").collect()
    assert [r.ln for r in rows] == [1, 2, 3]
    assert rows[2].ns == ["person!marko", "person!peter",
                          "person!josh", "person!vadas"]
    assert len(rows[2].rs) == 3
    assert all(len(r.rs) == r.ln for r in rows)


def test_named_path_fixed_chain(wgraph):
    row = cypher(wgraph, """
        MATCH p = (a:person {name: 'marko'})-[:knows]->(b)-[:knows]->(c)
        RETURN nodes(p) AS ns, length(p) AS ln""").head()
    assert row.ln == 2
    assert row.ns == ["person!marko", "person!peter", "person!josh"]


def test_named_path_bare_var_projects_nodes(wgraph):
    row = cypher(wgraph, """
        MATCH p = (a:person {name: 'marko'})-[:knows]->(b)
        RETURN p""").head()
    assert row.p == ["person!marko", "person!peter"]


def test_named_path_zero_length(wgraph):
    rows = cypher(wgraph, """
        MATCH p = (a:person {name: 'marko'})-[:knows*0..1]->(b)
        RETURN nodes(p) AS ns, length(p) AS ln ORDER BY ln""").collect()
    assert [r.ln for r in rows] == [0, 1]
    assert rows[0].ns == ["person!marko"]


# ---- round 4: MERGE ------------------------------------------------


def test_merge_creates_when_absent(wgraph):
    cypher(wgraph, "MERGE (n:person {name: 'fresh'}) "
                   "ON CREATE SET n.city = 'Chengdu'").collect()
    rb = cypher(wgraph, "MATCH (n:person {name: 'fresh'}) "
                        "RETURN n.city AS city").head()
    assert rb.city == "Chengdu"


def test_merge_matches_when_present(wgraph):
    before = wgraph.vertices.count()
    rows = cypher(wgraph, "MERGE (n:person {name: 'marko'}) "
                          "ON MATCH SET n.age = 30 "
                          "ON CREATE SET n.age = 1 "
                          "RETURN id(n) AS id").collect()
    assert [r.id for r in rows] == ["person!marko"]
    assert wgraph.vertices.count() == before  # no new vertex
    rb = cypher(wgraph, "MATCH (n:person {name: 'marko'}) "
                        "RETURN n.age AS age, n.city AS city").head()
    assert rb.age == 30 and rb.city == "Beijing"  # untouched prop kept


def test_merge_is_idempotent(wgraph):
    for _ in range(2):
        cypher(wgraph, "MERGE (n:person {name: 'once'})").collect()
    rows = cypher(wgraph, "MATCH (n:person {name: 'once'}) "
                          "RETURN id(n) AS id").collect()
    assert len(rows) == 1


@pytest.mark.slow  # verify-budget tier (r11): see pytest.ini
def test_merge_relationship_inserts_only_missing(wgraph):
    q = ("MATCH (a:person {name: 'marko'}), (b:person {name: 'vadas'}) "
         "MERGE (a)-[:knows]->(b)")
    before = wgraph.edges.count()
    cypher(wgraph, q).collect()
    mid = wgraph.edges.count()
    cypher(wgraph, q).collect()
    after = wgraph.edges.count()
    assert mid == before + 1 and after == mid
    # pre-existing edge is never duplicated either
    cypher(wgraph, "MATCH (a:person {name: 'marko'}), "
                   "(b:person {name: 'peter'}) "
                   "MERGE (a)-[:knows]->(b)").collect()
    assert wgraph.edges.count() == after


def test_merge_relationship_keeps_matched_props(wgraph):
    cypher(wgraph, "MATCH (a:person {name: 'marko'}), "
                   "(b:person {name: 'peter'}) "
                   "MERGE (a)-[:knows {weight: '0.9'}]->(b)").collect()
    w = (wgraph.edges
         .filter("src = 'person!marko' AND dst = 'person!peter'")
         .head().props["weight"])
    assert w == "0.5"  # matched edge untouched by the MERGE pattern map


def test_merge_schema_strict_writes(wgraph):
    with pytest.raises(ValueError, match="not declared"):
        cypher(wgraph, "MERGE (n:person {name: 'x'}) "
                       "ON CREATE SET n.bogus = 'v'").collect()
    with pytest.raises(ValueError, match="not declared"):
        cypher(wgraph, "CREATE (n:person {name: 'y', bogus: 'v'})")


def test_merge_unsupported_shape_raises(wgraph):
    with pytest.raises(SyntaxError, match="MERGE"):
        cypher(wgraph, "MERGE (a:person {name: 'p'})-[:knows]->"
                       "(b:person {name: 'q'})")


# ---- round 4 (cont.): REMOVE -----------------------------------------


def test_remove_strips_property(wgraph):
    cypher(wgraph, "MATCH (n:person) WHERE n.name = 'marko' "
                   "SET n.age = 29")
    assert cypher(wgraph, "MATCH (n:person) WHERE n.name = 'marko' "
                          "RETURN n.age AS a").head().a == 29
    cypher(wgraph, "MATCH (n:person) WHERE n.name = 'marko' "
                   "REMOVE n.age")
    assert cypher(wgraph, "MATCH (n:person) WHERE n.name = 'marko' "
                          "RETURN n.age AS a").head().a is None
    # untouched rows keep their props
    assert cypher(wgraph, "MATCH (n:person) WHERE n.name = 'vadas' "
                          "RETURN n.city AS c").head().c == "HongKong"


def test_remove_multiple_and_summary(wgraph):
    out = cypher(wgraph, "MATCH (n:person) REMOVE n.city, n.age")
    assert out.count() == 4  # one summary row per matched vertex
    assert cypher(wgraph, "MATCH (n:person) WHERE n.city IS NULL "
                          "RETURN count(*) AS n").head().n == 4


def test_remove_label_rejected(wgraph):
    import pytest as _pt
    with _pt.raises(SyntaxError, match="single-label"):
        cypher(wgraph, "MATCH (n:person) REMOVE n:person")


# ---- round 4 (cont.): FOREACH ----------------------------------------


def test_foreach_marks_path_nodes(wgraph):
    # chain: marko -> peter -> josh -> vadas
    cypher(wgraph, """
        MATCH p = (a:person)-[:knows*1..2]->(b:person)
        WHERE a.name = 'marko'
        FOREACH (n IN nodes(p) | SET n.city = 'Marked')""")
    rows = {r.nm: r.c for r in cypher(wgraph, """
        MATCH (n:person) RETURN n.name AS nm, n.city AS c""").collect()}
    # depth ≤2 from marko touches marko, peter, josh — vadas is 3 away
    assert rows["marko"] == "Marked"
    assert rows["peter"] == "Marked"
    assert rows["josh"] == "Marked"
    assert rows["vadas"] == "HongKong"


def test_foreach_literal_list_and_expression(wgraph):
    cypher(wgraph, """
        MATCH (n:person) WHERE n.name = 'vadas'
        FOREACH (x IN [n] | SET x.age = 27)""")
    assert cypher(wgraph, "MATCH (n:person) WHERE n.name = 'vadas' "
                          "RETURN n.age AS a").head().a == 27


def test_foreach_requires_set_body(wgraph):
    import pytest as _pt
    with _pt.raises(SyntaxError, match="FOREACH"):
        cypher(wgraph, "MATCH (n:person) FOREACH (x IN [n] | )")


def test_set_map_merge_and_replace(wgraph):
    """SET n += {map} merges (null removes a key); SET n = {map}
    replaces the whole property map; $param maps resolve at parse
    time (r04 verdict item 5; reference anchor
    api/opencypher/CypherOpProcessor.java:124-145)."""
    def props():
        return wgraph.vertices.filter("id = 'person!marko'") \
            .head().props

    cypher(wgraph, "MATCH (n:person {name:'marko'}) "
                   "SET n += {age: 30, city: null}")
    assert props() == {"name": "marko", "age": "30"}
    # expression values over the matched row
    cypher(wgraph, "MATCH (n:person {name:'marko'}) "
                   "SET n += {age: n.age + 1}")
    assert props()["age"] == "31"
    cypher(wgraph, "MATCH (n:person {name:'marko'}) "
                   "SET n = {name: 'marko', city: 'Shanghai'}")
    assert props() == {"name": "marko", "city": "Shanghai"}
    cypher(wgraph, "MATCH (n:person {name:'marko'}) SET n += $m",
           params={"m": {"age": 55}})
    assert props() == {"name": "marko", "city": "Shanghai", "age": "55"}
    # schema-strict: undeclared keys rejected like plain SET
    with pytest.raises(ValueError):
        cypher(wgraph, "MATCH (n:person {name:'marko'}) "
                       "SET n += {wat: 1}")


def test_primary_key_writes_forbidden(wgraph):
    """The reference forbids updating primary-key properties
    (GraphTransaction.java:1154 "Can't update primary key") — r05
    ADVICE medium: SET n = {map} silently stripped the pk. Now: the
    replace never strips pks, a pk re-statement is validated, and a
    pk CHANGE raises on every surface."""
    def props():
        return wgraph.vertices.filter("id = 'person!marko'") \
            .head().props

    with pytest.raises(ValueError, match="primary key"):
        cypher(wgraph, "MATCH (n:person {name:'marko'}) "
                       "SET n.name = 'other'")
    with pytest.raises(ValueError, match="primary key"):
        cypher(wgraph, "MATCH (n:person {name:'marko'}) "
                       "SET n += {name: 'other'}")
    with pytest.raises(ValueError, match="primary key"):
        cypher(wgraph, "MATCH (n:person {name:'marko'}) "
                       "SET n = {name: 'other', city: 'X'}")
    # replace WITHOUT the pk keeps it (previously: silent pk delete)
    cypher(wgraph, "MATCH (n:person {name:'marko'}) SET n = {city: 'X'}")
    assert props().get("name") == "marko"
    assert props().get("city") == "X"
    # pk re-statement with the existing value is a no-op, allowed
    cypher(wgraph, "MATCH (n:person {name:'marko'}) "
                   "SET n = {name: 'marko', city: 'Y'}")
    assert props() == {"name": "marko", "city": "Y"}


def test_primary_key_guard_covers_unlabeled_vars(wgraph):
    """Code review r06: the pk guard must also hold when the var's
    label is NOT statically known — unlabeled MATCH vars and FOREACH
    element vars resolve labels per-row, so the check probes the
    hydrated labels against the schema labels that pk the prop."""
    def props():
        return wgraph.vertices.filter("id = 'person!marko'") \
            .head().props

    with pytest.raises(ValueError, match="primary key"):
        cypher(wgraph, "MATCH (n) WHERE n.name = 'marko' "
                       "SET n.name = 'other'")
    with pytest.raises(ValueError, match="primary key"):
        cypher(wgraph, "MATCH (p:person {name:'marko'}) "
                       "FOREACH (x IN [p] | SET x.name = 'other')")
    with pytest.raises(ValueError, match="primary key"):
        cypher(wgraph, "MATCH (n) WHERE n.name = 'marko' "
                       "REMOVE n.name")
    with pytest.raises(ValueError, match="primary key"):
        cypher(wgraph, "MATCH (n) WHERE n.name = 'marko' "
                       "SET n += {name: 'other'}")
    assert props().get("name") == "marko"  # nothing leaked through
    # non-pk writes through unlabeled vars still apply
    cypher(wgraph, "MATCH (n) WHERE n.name = 'marko' SET n.city = 'Z'")
    assert props().get("city") == "Z"
    # pk re-statement through an unlabeled var is a validated no-op
    cypher(wgraph, "MATCH (n) WHERE n.name = 'marko' "
                   "SET n.name = 'marko'")
    assert props().get("name") == "marko"
    # null-removal of a NON-pk prop through an unlabeled var works
    # (second review pass r06: the strip-probe list crashed on
    # risk=None here instead of removing the key)
    cypher(wgraph, "MATCH (n) WHERE n.name = 'marko' "
                   "SET n += {city: null}")
    assert "city" not in props()
    # null-removal of the PK through an unlabeled var raises
    with pytest.raises(ValueError, match="primary key"):
        cypher(wgraph, "MATCH (n) WHERE n.name = 'marko' "
                       "SET n += {name: null}")


def test_create_duplicate_rel_var_raises(wgraph):
    """r05 ADVICE low: a duplicate rel variable WITHIN one CREATE
    pattern must raise the clear reuse error, not die later with
    AMBIGUOUS_REFERENCE."""
    with pytest.raises(SyntaxError, match="reuse"):
        cypher(wgraph,
               "MATCH (a:person {name:'marko'}), (b:person {name:'josh'})"
               " CREATE (a)-[r:knows]->(b)-[r:knows]->(a)")


def test_temporal_functions(wgraph):
    row = cypher(
        wgraph,
        "MATCH (n:person {name:'marko'}) "
        "RETURN datetime('2020-01-01T12:00:00') AS ts, "
        "date('2020-03-04') AS d, "
        "datetime('2020-01-01T00:00:00') + duration('P1DT2H30M') AS ts2, "
        "datetime('2020-01-02T00:00:00') - duration('PT12H') AS ts3"
    ).head()
    assert str(row.ts) == "2020-01-01 12:00:00"
    assert str(row.d) == "2020-03-04"
    assert str(row.ts2) == "2020-01-02 02:30:00"
    assert str(row.ts3) == "2020-01-01 12:00:00"
    with pytest.raises(SyntaxError):
        cypher(wgraph, "MATCH (n:person) RETURN duration('nope') AS x")


def test_temporal_component_functions(wgraph):
    row = cypher(
        wgraph,
        "MATCH (n:person {name:'marko'}) "
        "RETURN year(datetime('2020-03-04T05:06:07')) AS y, "
        "month(datetime('2020-03-04T05:06:07')) AS mo, "
        "day(datetime('2020-03-04T05:06:07')) AS d, "
        "hour(datetime('2020-03-04T05:06:07')) AS h, "
        "minute(datetime('2020-03-04T05:06:07')) AS mi, "
        "second(datetime('2020-03-04T05:06:07')) AS s").head()
    assert (row.y, row.mo, row.d, row.h, row.mi, row.s) \
        == (2020, 3, 4, 5, 6, 7)
