"""Mapping-driven file ingestion (sources/files.py): CSV/JSON inputs
→ PropertyGraph, loader-struct mapping subset (id splice, field
rename, selected/ignored), traversal parity on the loaded graph."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from incubator_hugegraph_spark.sources.files import (
    build_graph_from_mappings, load_edges, load_vertices)


@pytest.fixture(scope="module")
def spec(spark, tmp_path_factory):
    d = tmp_path_factory.mktemp("files_src")
    (d / "people.csv").write_text(
        "name,age,city,junk\nmarko,29,beijing,x\nvadas,27,hongkong,y\n"
        "josh,32,beijing,z\n")
    (d / "knows.json").write_text(
        '{"a": "marko", "b": "vadas", "since": 2010}\n'
        '{"a": "marko", "b": "josh", "since": 2012}\n')
    return {
        "vertices": [{
            "label": "person",
            "input": {"path": str(d / "people.csv"), "format": "csv"},
            "id": ["name"],
            "field_mapping": {"city": "hometown"},
            "ignored": ["junk", "name"],
        }],
        "edges": [{
            "label": "knows",
            "source_label": "person", "source": ["a"],
            "target_label": "person", "target": ["b"],
            "sort_keys": ["since"],
            "input": {"path": str(d / "knows.json"), "format": "json"},
        }],
    }


def test_load_vertices_csv(spark, spec):
    v = load_vertices(spark, spec["vertices"][0])
    rows = {r.id: r for r in v.collect()}
    assert set(rows) == {"person!marko", "person!vadas", "person!josh"}
    assert rows["person!marko"].props["hometown"] == "beijing"
    assert rows["person!marko"].props["age"] == "29"
    assert "junk" not in rows["person!marko"].props
    assert [f.name for f in v.schema.fields] == [
        "id", "label", "props", "expired_at"]


def test_load_edges_json(spark, spec):
    e = load_edges(spark, spec["edges"][0])
    rows = sorted((r.src, r.dst, r.sort_values) for r in e.collect())
    assert rows == [("person!marko", "person!josh", "2012"),
                    ("person!marko", "person!vadas", "2010")]
    # since is consumed by sort_keys? no — sort_keys keep the prop too
    assert e.filter(F.col("props")["since"].isNotNull()).count() == 2


def test_graph_from_mappings_traversals(spark, spec):
    from incubator_hugegraph_spark.gremlin import G
    g = build_graph_from_mappings(spark, spec)
    assert g.vertices.count() == 3 and g.edges.count() == 2
    out = G(g).V("person!marko").out("knows").id_().toList()
    assert sorted(out) == ["person!josh", "person!vadas"]
    # typed view registered for property access
    assert "person" in g.vertex_views
    ages = dict(g.vertex_views["person"]
                .select("id", "age").collect())
    assert ages["person!vadas"] == 27


def test_missing_id_and_bad_format_raise(spark, spec):
    bad = dict(spec["vertices"][0])
    bad.pop("id")
    with pytest.raises(ValueError):
        load_vertices(spark, bad)
    worse = dict(spec["vertices"][0])
    worse = {**worse, "input": {**worse["input"], "format": "xml"}}
    with pytest.raises(ValueError):
        load_vertices(spark, worse)


def test_csv_explicit_schema_skips_inference(spark, spec):
    m = {**spec["vertices"][0],
         "input": {**spec["vertices"][0]["input"],
                   "schema": "name string, age int, city string, "
                             "junk string"}}
    v = load_vertices(spark, m)
    assert v.count() == 3


def test_graphson_roundtrip(graph, spark):
    import json
    from incubator_hugegraph_spark.sources.graphson import (
        from_graphson, to_graphson)
    lines = to_graphson(graph)
    assert lines.count() == graph.vertices.count()
    # every line is valid JSON with the adjacency shape
    sample = json.loads(lines.head().json)
    assert {"id", "label"} <= set(sample)
    g2 = from_graphson(spark, lines, schema=graph.schema)
    assert g2.vertices.count() == graph.vertices.count()
    assert g2.edges.count() == graph.edges.count()
    # value-level parity on both tables
    def vset(g):
        return {(r.id, r.label, tuple(sorted(r.props.items())))
                for r in g.vertices.collect()}
    def eset(g):
        return {(r.src, r.dst, r.label, r.sort_values,
                 tuple(sorted(r.props.items())))
                for r in g.edges.collect()}
    assert vset(g2) == vset(graph)
    assert eset(g2) == eset(graph)
    # traversals run on the reparsed graph
    from incubator_hugegraph_spark.gremlin import G
    assert sorted(G(g2).V("nation!1").out("located_in").id_()
                  .toList()) == \
        sorted(G(graph).V("nation!1").out("located_in").id_().toList())
