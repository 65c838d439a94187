"""Property-based tests over RANDOM small graphs (hypothesis): the
structural invariants that fixed fixtures can't probe — BFS layering,
WCC/star equivalence, Bellman-Ford relaxation fixpoint, upsert merge
idempotence. Example counts are small (Spark actions per example);
determinism of every kernel makes shrinking reliable.
"""

from __future__ import annotations

import pytest
from hypothesis import HealthCheck, given, settings, strategies as st
from pyspark.sql import functions as F

_EDGES = st.lists(
    st.tuples(st.integers(0, 7), st.integers(0, 7)).filter(
        lambda t: t[0] != t[1]),
    min_size=1, max_size=14, unique=True)

_SETTINGS = dict(max_examples=6, deadline=None,
                 suppress_health_check=[HealthCheck.function_scoped_fixture])


def _mk_graph(spark, graph, edges):
    from incubator_hugegraph_spark.graph import PropertyGraph
    ids = sorted({v for e in edges for v in e})
    vrows = [(f"v!{i}", "v", {}, None) for i in ids]
    erows = [(f"v!{a}", f"v!{b}", "e", "", {}, None) for a, b in edges]
    return PropertyGraph(
        spark=spark,
        vertices=spark.createDataFrame(vrows, graph.vertices.schema),
        edges=spark.createDataFrame(erows, graph.edges.schema),
        schema=graph.schema)


@settings(**_SETTINGS)
@given(edges=_EDGES)
def test_kout_layers_partition_kneighbor(spark, graph, edges):
    """kneighbor(≤k) is the disjoint union of nearest-kout layers."""
    from incubator_hugegraph_spark.operators.bfs import kneighbor, kout
    g = _mk_graph(spark, graph, edges)
    src = f"v!{edges[0][0]}"
    kn = {(r.id, r.dist)
          for r in kneighbor(g, src, 3, direction="OUT").collect()}
    layers = [
        {r.id for r in kout(g, src, d, direction="OUT").collect()}
        for d in (1, 2, 3)]
    assert kn == {(v, d + 1) for d, layer in enumerate(layers)
                  for v in layer}
    assert not (layers[0] & layers[1]) and not (layers[1] & layers[2])


@settings(**_SETTINGS)
@given(edges=_EDGES)
@pytest.mark.slow  # verify-budget tier (r11): see pytest.ini
def test_wcc_star_equivalence_random(spark, graph, edges):
    from incubator_hugegraph_spark.algorithms.wcc import wcc, wcc_star
    g = _mk_graph(spark, graph, edges)
    a = {r.id: r.component for r in wcc(g).collect()}
    b = {r.id: r.component for r in wcc_star(g).collect()}
    assert a == b


@settings(**_SETTINGS)
@given(edges=_EDGES, ws=st.lists(st.integers(1, 9), min_size=14,
                                 max_size=14))
def test_sssp_relaxation_fixpoint(spark, graph, edges, ws):
    """Bellman-Ford output admits no improving edge, and the source
    distance is 0 — the defining fixpoint of shortest paths."""
    from incubator_hugegraph_spark.operators.weighted import sssp
    g = _mk_graph(spark, graph, edges)
    src = f"v!{edges[0][0]}"
    we = [(f"v!{a}", f"v!{b}", float(w))
          for (a, b), w in zip(edges, ws)]
    wdf = spark.createDataFrame(we, "src string, dst string, weight double")
    dist = {r.id: r.dist for r in sssp(g, src, wdf).collect()}
    assert dist[src] == 0.0
    for s, d, w in we:
        if s in dist:
            assert dist.get(d, float("inf")) <= dist[s] + w


@settings(**_SETTINGS)
@given(vals=st.lists(st.integers(-50, 50), min_size=1, max_size=6))
def test_upsert_merge_idempotent(spark, graph, vals):
    """MAX/MIN/SET write-aggregates: re-applying the same batch is a
    no-op (AggregateType merge semantics)."""
    from incubator_hugegraph_spark.operators.mutate import upsert_vertices
    cur = spark.createDataFrame(
        [(f"v!{i}", "v", {"m": str(v)}, None) for i, v in enumerate(vals)],
        graph.vertices.schema)
    batch = spark.createDataFrame(
        [(f"v!{i}", "v", {"m": str(v + (-1) ** i)}, None)
         for i, v in enumerate(vals)], graph.vertices.schema)
    merges = {"m": "MAX"}
    once = upsert_vertices(cur, batch, merges)
    twice = upsert_vertices(once, batch, merges)
    got1 = {r.id: r.props["m"] for r in once.collect()}
    got2 = {r.id: r.props["m"] for r in twice.collect()}
    assert got1 == got2


# ---- round 4: Cypher boolean-WHERE compiler equivalence --------------

_CMP = {"=": "=", "<>": "!=", "<": "<", "<=": "<=", ">": ">", ">=": ">="}


def _leaf():
    return st.tuples(st.sampled_from(sorted(_CMP)), st.integers(1, 50)) \
        .map(lambda t: (f"p.size {t[0]} {t[1]}",
                        f"size {_CMP[t[0]]} {t[1]}"))


def _combine(children):
    def binop(op):
        return st.tuples(children, children).map(
            lambda t: (f"({t[0][0]} {op} {t[1][0]})",
                       # XOR on booleans = <> in Spark SQL
                       f"(({t[0][1]}) {'<>' if op == 'XOR' else op} "
                       f"({t[1][1]}))"))
    return st.one_of(
        binop("AND"), binop("OR"), binop("XOR"),
        children.map(lambda c: (f"NOT ({c[0]})", f"NOT ({c[1]})")))


_BOOL_EXPR = st.recursive(_leaf(), _combine, max_leaves=6)


@settings(max_examples=15, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(expr=_BOOL_EXPR)
def test_cypher_boolean_where_matches_sql(graph, expr):
    """Random boolean expression trees (AND/OR/XOR/NOT, parenthesized,
    openCypher precedence) compile to exactly the filter Spark SQL
    evaluates — the parser/compiler equivalence the fixed-fixture
    tests can't probe. Leaves are non-null int comparisons, so
    3-valued logic stays out of the property (it's pinned separately
    by the null-semantics unit tests)."""
    from incubator_hugegraph_spark.cypher import cypher
    cy, sql = expr
    got = cypher(graph, f"MATCH (p:part) WHERE {cy} "
                        "RETURN count(*) AS n").head().n
    want = graph.view("part").filter(sql).count()
    assert got == want
