"""Cross-surface EdgeId consistency (r04 ADVICE, medium).

Every write surface — REST edge door, Cypher CREATE, Gremlin addE,
file ingestion — must encode multi-sort-key edges with ONE shared
encoder (functions/ids.py: '!'-joined like the reference's
NAME_SPLITOR, SplicingIdGenerator.java:48), distinct from the '>'
EdgeId splice delimiter, so the same logical edge upsert-dedupes
across surfaces and GET/DELETE edges/{id} round-trips.
"""

from __future__ import annotations

import pytest

from incubator_hugegraph_spark.graph import PropertyGraph
from incubator_hugegraph_spark.schema import (EdgeLabel, GraphSchema,
                                              VertexLabel)

SV = "hall\\!a!2020"  # encode_sort_values(["hall!a", "2020"])


@pytest.fixture()
def mgraph(spark):
    """Two-person graph whose 'met' edges carry TWO sort keys."""
    vrows = [("person!marko", "person", {"name": "marko"}, None),
             ("person!josh", "person", {"name": "josh"}, None)]
    sch = GraphSchema()
    sch.property_key("name")
    sch.property_key("place")
    sch.property_key("year")
    sch.vertex_labels["person"] = VertexLabel(
        "person", properties=("name",), primary_keys=("name",))
    sch.edge_labels["met"] = EdgeLabel(
        "met", "person", "person", properties=("place", "year"),
        sort_keys=("place", "year"))
    v = spark.createDataFrame(
        vrows, "id string, label string, props map<string,string>, "
               "expired_at timestamp")
    e = spark.createDataFrame(
        [], "src string, dst string, label string, sort_values string, "
            "props map<string,string>, expired_at timestamp")
    return PropertyGraph(spark, v, e, schema=sch)


def _sort_values(g):
    return [r.sort_values for r in
            g.edges.filter("label = 'met'").collect()]


@pytest.mark.slow  # verify-budget tier (r11): see pytest.ini
def test_rest_cypher_gremlin_encode_identically(mgraph):
    from incubator_hugegraph_spark.cypher import cypher
    from incubator_hugegraph_spark.gremlin import G
    from incubator_hugegraph_spark.rest import execute_graph_crud as crud

    eid = crud(mgraph, "POST", "edges", {
        "label": "met", "outV": "person!marko", "inV": "person!josh",
        "properties": {"place": "hall!a", "year": "2020"}})
    assert _sort_values(mgraph) == [SV]
    assert ">" not in SV and eid.count(">") == 3  # splice unambiguous
    # the id round-trips through the GET door
    assert crud(mgraph, "GET", f"edges/{eid}").head().props[
        "place"] == "hall!a"

    # Cypher CREATE of the SAME logical edge upserts onto it
    cypher(mgraph, "MATCH (a:person {name:'marko'}), "
                   "(b:person {name:'josh'}) "
                   "CREATE (a)-[:met {place:'hall!a', year:'2020'}]->(b)")
    assert _sort_values(mgraph) == [SV]

    # Gremlin addE of the SAME logical edge upserts onto it too
    (G(mgraph).V("person!marko").addE("met").to("person!josh")
     .property("place", "hall!a").property("year", "2020").iterate())
    assert _sort_values(mgraph) == [SV]

    # a DIFFERENT sort-key tuple is a new edge (MULTIPLE cardinality)
    (G(mgraph).V("person!marko").addE("met").to("person!josh")
     .property("place", "hall!a").property("year", "2021").iterate())
    assert sorted(_sort_values(mgraph)) == [SV, "hall\\!a!2021"]


def test_file_ingestion_uses_shared_encoder(spark, tmp_path):
    from incubator_hugegraph_spark.functions.ids import (
        encode_sort_values, sort_values_col)
    df = spark.createDataFrame(
        [("hall!a", "2020")], "place string, year string")
    got = df.select(sort_values_col(["place", "year"]).alias("sv")) \
        .head().sv
    assert got == encode_sort_values(["hall!a", "2020"]) == SV
    # escape-char stress: Column-side and Python-side agree on values
    # containing both the delimiter and the escape character
    df2 = spark.createDataFrame(
        [("a\\", "b!c"), ("a!b\\", "c")], "place string, year string")
    got2 = [r.sv for r in df2.select(
        sort_values_col(["place", "year"]).alias("sv")).collect()]
    want2 = [encode_sort_values(["a\\", "b!c"]),
             encode_sort_values(["a!b\\", "c"])]
    assert got2 == want2 and got2[0] != got2[1]


def test_escape_char_is_escaped():
    """Distinct sort-key tuples must never encode identically: the
    escape char itself is escaped FIRST (code review r05 — without
    it ('a\\\\', 'b!c') and ('a!b\\\\', 'c') collided)."""
    from incubator_hugegraph_spark.functions.ids import (
        encode_sort_values, splice_id)
    a = encode_sort_values(["a\\", "b!c"])
    b = encode_sort_values(["a!b\\", "c"])
    assert a != b
    assert splice_id("l", "a\\", "b!c") != splice_id("l", "a!b\\", "c")


def test_edge_splice_delimiter_is_escaped():
    """r05 ADVICE (medium): a pk or sort value containing '>' must not
    make the 4-part EdgeId concat (src>label>sort_values>dst)
    ambiguous — the reference escapes the splice char in EVERY
    component (SplicingIdGenerator.concat, EdgeId.asString)."""
    from incubator_hugegraph_spark.functions.ids import (
        encode_sort_values, splice_id)
    assert ">" not in splice_id("l", "a>b").replace("\\>", "")
    assert ">" not in encode_sort_values(["x>y", "z"]).replace("\\>", "")
    # two distinct edges whose raw concat WOULD collide without escaping:
    #   src='l!a', sv='b>l!a'   vs   src='l!a>b', sv='l!a'  (label 'e')
    e1 = ">".join([splice_id("l", "a"), "e",
                   encode_sort_values(["b>l!a"]), "d"])
    e2 = ">".join([splice_id("l", "a>b"), "e",
                   encode_sort_values(["l!a"]), "d"])
    assert e1 != e2


def test_rel_write_label_parse_escape_aware(spark):
    """The cypher rel-write label fallback parses the SECOND unescaped
    '>' field out of the EdgeId — an escaped '\\>' inside src must be
    skipped, not split on (cypher.py _apply_rel_writes fallback)."""
    from pyspark.sql import functions as F

    from incubator_hugegraph_spark.functions.ids import (
        encode_sort_values, splice_id)
    src = splice_id("person", "a>b")       # 'person!a\>b'
    eid = ">".join([src, "met", encode_sort_values(["x"]), "person!c"])
    df = spark.createDataFrame([(eid,)], "r string")
    got = df.select(F.regexp_extract(
        F.col("r"), r"^(?:[^\\>]|\\.)*>((?:[^\\>]|\\.)*)>", 1)
        .alias("l")).collect()[0].l
    assert got == "met"
