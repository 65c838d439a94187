"""Cypher MATCH subset (§3.3): parser + executor against directly
computed expectations; the oracle-gated driver queries (cypher_*)
cover the agg/multi-hop/undirected paths."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from incubator_hugegraph_spark.cypher import cypher


def test_keyword_label_and_simple_filter(graph):
    # `order` is both a keyword and the fixture's vertex label
    n = cypher(graph, "MATCH (o:order) RETURN count(*) AS n").head().n
    assert n == graph.vertices.filter("label = 'order'").count()


def test_where_ops_and_types(graph):
    got = cypher(graph, """
        MATCH (p:part) WHERE p.size >= 45 AND p.size < 48
        RETURN p AS id, p.size AS size""")
    manual = graph.view("part").filter("size >= 45 AND size < 48")
    assert got.count() == manual.count()
    assert {r.size for r in got.collect()} <= {45, 46, 47}


def test_in_and_contains(graph):
    got = cypher(graph, """
        MATCH (p:part) WHERE p.name CONTAINS 'bolt'
        AND p.size IN [10, 11, 12] RETURN p AS id""")
    manual = (graph.view("part")
              .filter(F.col("name").contains("bolt")
                      & F.col("size").isin([10, 11, 12])))
    assert sorted(r.id for r in got.collect()) \
        == sorted(r.id for r in manual.collect())


def test_distinct_and_skip_limit(graph):
    base = cypher(graph, """
        MATCH (c:customer)-[:placed]->(o:order)
        RETURN DISTINCT c AS id ORDER BY id""")
    page = cypher(graph, """
        MATCH (c:customer)-[:placed]->(o:order)
        RETURN DISTINCT c AS id ORDER BY id SKIP 5 LIMIT 5""")
    ids = [r.id for r in base.collect()]
    assert [r.id for r in page.collect()] == ids[5:10]


def test_label_and_id_functions(graph):
    rows = cypher(graph, """
        MATCH (n:nation)-[:located_in]->(r:region)
        RETURN label(r) AS l, id(n) AS nid ORDER BY nid LIMIT 2""").collect()
    assert all(r.l == "region" for r in rows)
    assert rows[0].nid.startswith("nation!")


def test_comma_pattern_cross_join(graph):
    n = cypher(graph, """
        MATCH (r:region), (x:region) RETURN count(*) AS n""").head().n
    assert n == 25  # 5 regions x 5 regions


def test_in_direction_equals_reverse(graph):
    a = cypher(graph, """
        MATCH (n:nation)<-[:in_nation]-(c:customer)
        RETURN n AS id, count(c) AS cnt""")
    b = cypher(graph, """
        MATCH (c:customer)-[:in_nation]->(n:nation)
        RETURN n AS id, count(c) AS cnt""")
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))


def test_avg_aggregate_matches_view(graph):
    got = cypher(graph, """
        MATCH (p:part) RETURN avg(p.retailprice) AS v""").head().v
    want = graph.view("part").agg(
        F.round(F.avg("retailprice"), 6)).head()[0]
    assert got == want


def test_parser_rejects_garbage(graph):
    for bad in ["MATCH (a RETURN a",
                "MATCH (a)-[:x]>(b) RETURN a",
                "RETURN 1",
                "MATCH (a:part) RETURN a WHERE a.size > 3"]:
        with pytest.raises(SyntaxError):
            cypher(graph, bad)


def test_labeled_pattern_compiles_to_pushed_typed_scan(graph):
    """Labeled node vars compile against the typed view: the WHERE
    predicate must reach the parquet scan (PushedFilters) and the
    scan must read only the referenced columns — the 100 TB posture
    for declarative filters (SURVEY §4.1)."""
    df = cypher(graph, """
        MATCH (p:part) WHERE p.size >= 45
        RETURN p AS id, p.size AS size""")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "GreaterThanOrEqual(p_size,45)" in plan
    import re
    m = re.search(r"ReadSchema: struct<([^>]*)>", plan)
    assert m and set(c.split(":")[0] for c in m.group(1).split(",")) \
        == {"p_partkey", "p_size"}
    # exactly one file scan survives union-branch pruning
    assert plan.count("FileScan parquet") == 1


def test_schema_link_pruning(graph):
    """SURVEY §4.1 schema-link pruning: unlabeled relationships
    between labeled endpoints scan only schema-compatible edge
    labels; infeasible combinations yield empty without error."""
    # unlabeled rel customer->nation can only be in_nation
    a = cypher(graph, """
        MATCH (c:customer)-[]->(n:nation) RETURN count(*) AS n""").head().n
    b = cypher(graph, """
        MATCH (c:customer)-[:in_nation]->(n:nation)
        RETURN count(*) AS n""").head().n
    assert a == b > 0
    # located_in links nation->region, never customer->region
    assert cypher(graph, """
        MATCH (c:customer)-[:located_in]->(r:region)
        RETURN count(*) AS n""").head().n == 0
    # BOTH direction: nation -[]- region matches located_in either way
    both = cypher(graph, """
        MATCH (n:nation)-[]-(r:region) RETURN count(*) AS n""").head().n
    assert both == 25
