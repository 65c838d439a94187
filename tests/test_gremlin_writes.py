"""Gremlin write steps (addV/addE/property/drop) — §2.L map family.

The reference's Gremlin surface is also its data-entry API
(g.addV('person').property(...) through GraphTransaction). Here the
steps compile onto the batch mutate layer (operators/mutate.py), so
these tests run on a private graph per test, never the shared session
fixture.
"""

from __future__ import annotations

import pytest

from incubator_hugegraph_spark.gremlin import G
from incubator_hugegraph_spark.gremlin_text import eval_gremlin
from incubator_hugegraph_spark.graph import PropertyGraph
from incubator_hugegraph_spark.schema import (EdgeLabel, GraphSchema,
                                              VertexLabel)


@pytest.fixture()
def wgraph(spark):
    people = ["marko", "vadas", "josh"]
    vrows = [(f"person!{p}", "person", {"name": p}, None) for p in people]
    erows = [("person!marko", "person!vadas", "knows", "",
              {"weight": "0.5"}, None)]
    sch = GraphSchema()
    sch.property_key("name")
    sch.property_key("city")
    sch.property_key("weight", "DOUBLE")
    sch.vertex_labels["person"] = VertexLabel(
        "person", properties=("name", "city"), primary_keys=("name",),
        nullable_keys=("city",))
    sch.edge_labels["knows"] = EdgeLabel("knows", "person", "person")
    v = spark.createDataFrame(
        vrows, "id string, label string, props map<string,string>, "
               "expired_at timestamp")
    e = spark.createDataFrame(
        erows, "src string, dst string, label string, sort_values string, "
               "props map<string,string>, expired_at timestamp")
    return PropertyGraph(spark, v, e, schema=sch)


def test_addv_primary_key_splice_and_property(wgraph):
    t = (G(wgraph).addV("person")
         .property("name", "test").property("city", "Hefei"))
    assert t.id_().df.head().value == "person!test"
    rb = wgraph.view("person").filter("name = 'test'").head()
    assert rb.city == "Hefei"


def test_addv_flushes_once_on_first_step(wgraph):
    before = wgraph.vertices.count()
    t = G(wgraph).addV("person").property("name", "x")
    t.iterate()
    t.iterate()  # idempotent — single create
    assert wgraph.vertices.count() == before + 1


def test_property_updates_matched_vertices(wgraph):
    G(wgraph).V("person!marko").property("city", "Beijing")
    assert wgraph.view("person").filter("name = 'marko'") \
        .head().city == "Beijing"
    # untouched props survive the merge
    assert wgraph.view("person").filter("name = 'marko'") \
        .head().name == "marko"


def test_adde_to_and_properties(wgraph):
    before = wgraph.edges.count()
    (G(wgraph).V("person!marko").addE("knows").to("person!josh")
     .property("weight", 0.9).iterate())
    assert wgraph.edges.count() == before + 1
    w = (wgraph.edges
         .filter("src = 'person!marko' AND dst = 'person!josh'")
         .head().props["weight"])
    assert w == "0.9"


def test_adde_per_incoming_traverser(wgraph):
    # one edge per incoming vertex: all persons → josh
    before = wgraph.edges.count()
    G(wgraph).V().hasLabel("person").addE("likes").to("person!josh") \
        .iterate()
    assert wgraph.edges.count() == before + 3


def test_drop_edges(wgraph):
    before = wgraph.edges.count()
    t = G(wgraph).V("person!marko").outE("knows").drop()
    assert wgraph.edges.count() == before - 1
    assert t.df.count() == 0  # drop filters everything


def test_drop_vertex_cascades(wgraph):
    G(wgraph).V("person!marko").drop()
    assert wgraph.vertices.filter("id = 'person!marko'").count() == 0
    assert wgraph.edges.filter(
        "src = 'person!marko' OR dst = 'person!marko'").count() == 0


def test_text_surface_write_chain(wgraph):
    eval_gremlin(wgraph, "g.addV('person').property('name','txt')"
                         ".property('city','Wuhan')")
    assert wgraph.view("person").filter("name = 'txt'") \
        .head().city == "Wuhan"
    eval_gremlin(wgraph, "g.V('person!txt').addE('knows')"
                         ".to('person!vadas')")
    assert wgraph.edges.filter("src = 'person!txt'").count() == 1
    eval_gremlin(wgraph, "g.V('person!txt').drop()")
    assert wgraph.vertices.filter("id = 'person!txt'").count() == 0
    assert wgraph.edges.filter("src = 'person!txt'").count() == 0


def test_edge_property_update(wgraph):
    """g.V().outE().property(k, v) — TinkerPop PropertyStep on matched
    EDGES (r05, parity with Cypher SET on relationship variables):
    rewrites the matched physical edges' maps, leaves others alone."""
    # add a second edge so "leaves others alone" is observable
    (G(wgraph).V("person!josh").addE("knows").to("person!vadas")
     .property("weight", "0.4").iterate())
    (G(wgraph).V("person!marko").outE("knows")
     .property("weight", "0.99").iterate())
    w = {(r.src, r.dst): r.props["weight"]
         for r in wgraph.edges.collect()}
    assert w[("person!marko", "person!vadas")] == "0.99"
    assert w[("person!josh", "person!vadas")] == "0.4"  # untouched
    # chained read after the write sees the new value
    vals = (G(wgraph).V("person!marko").outE("knows")
            .values("weight").toList())
    assert vals == [0.99]  # weight is a declared DOUBLE


def test_edge_property_schema_strict(wgraph, spark):
    """E-kind property() validates like the Cypher rel-SET path:
    undeclared keys rejected, sort keys immutable (code review
    r05)."""
    from incubator_hugegraph_spark.schema import EdgeLabel
    wgraph.schema.property_key("place")
    wgraph.schema.property_key("note")
    wgraph.schema.edge_labels["met"] = EdgeLabel(
        "met", "person", "person", properties=("place", "note"),
        sort_keys=("place",))
    wgraph.edges = wgraph.edges.unionByName(spark.createDataFrame(
        [("person!marko", "person!josh", "met", "x",
          {"place": "x"}, None)], wgraph.edges.schema))
    with pytest.raises(ValueError):
        (G(wgraph).V("person!marko").outE("met")
         .property("wat", "1").iterate())
    with pytest.raises(ValueError):
        (G(wgraph).V("person!marko").outE("met")
         .property("place", "y").iterate())
    (G(wgraph).V("person!marko").outE("met")
     .property("note", "fine").iterate())
    assert wgraph.edges.filter("label = 'met'").head() \
        .props["note"] == "fine"
