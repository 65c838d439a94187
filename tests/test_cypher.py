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


# ---- round 3: var-length, OPTIONAL MATCH, WITH, expressions ---------


def test_varlen_counts_match_manual_unroll(graph):
    """*1..2 path count = 1-hop edges + 2-hop edge sequences."""
    one = cypher(graph, """
        MATCH (a:customer)-[:interacted]->(b:customer)
        RETURN count(*) AS n""").head().n
    two = cypher(graph, """
        MATCH (a:customer)-[:interacted]->(x:customer)
              -[:interacted]->(b:customer)
        RETURN count(*) AS n""").head().n
    both = cypher(graph, """
        MATCH (a:customer)-[:interacted*1..2]->(b:customer)
        RETURN count(*) AS n""").head().n
    assert both == one + two > 0


def test_varlen_exact_and_zero_length(graph):
    exact = cypher(graph, """
        MATCH (n:nation)-[:located_in*1]->(r:region)
        RETURN count(*) AS n""").head().n
    assert exact == 25
    # *0..1: 25 identity pairs (n = x) + 25 located_in hops
    zero = cypher(graph, """
        MATCH (n:nation)-[:located_in*0..1]->(x)
        RETURN count(*) AS n""").head().n
    assert zero == 50


def test_varlen_both_excludes_edge_reuse(graph):
    """Relationship isomorphism: n-r-n over the SAME located_in edge
    is not a match; every 2-hop BOTH path between nations uses two
    distinct physical edges, so endpoints always differ."""
    rows = cypher(graph, """
        MATCH (n:nation)-[:located_in*2..2]-(m:nation)
        RETURN n, m""").collect()
    assert rows and all(r.n != r.m for r in rows)
    # count = sum over regions of deg*(deg-1), both directions counted
    from collections import Counter
    deg = Counter(r.dst for r in graph.edges
                  .filter("label = 'located_in'").collect())
    assert len(rows) == sum(d * (d - 1) for d in deg.values())


def test_optional_match_left_join(graph):
    rows = cypher(graph, """
        MATCH (c:customer) OPTIONAL MATCH (c)-[:placed]->(o:order)
        RETURN c, count(o) AS n""").collect()
    n_cust = graph.vertices.filter("label = 'customer'").count()
    assert len(rows) == n_cust
    placed = graph.edges.filter("label = 'placed'").count()
    assert sum(r.n for r in rows) == placed
    # the fixture is fully connected (every customer has orders), so
    # force unmatched rows through the optional-side WHERE instead
    rows2 = cypher(graph, """
        MATCH (c:customer) OPTIONAL MATCH (c)-[:placed]->(o:order)
        WHERE o.totalprice > 300000
        RETURN c, count(o) AS n""").collect()
    assert len(rows2) == n_cust  # unmatched customers survive as n=0
    big = (graph.view("order").filter("totalprice > 300000")
           .join(graph.edges.filter("label = 'placed'")
                 .selectExpr("dst AS id", "src"), on="id")
           .select("src").distinct().count())
    assert sum(1 for r in rows2 if r.n > 0) == big
    assert any(r.n == 0 for r in rows2)


def test_optional_match_where_filters_before_join(graph):
    rows = cypher(graph, """
        MATCH (n:nation) OPTIONAL MATCH (n)<-[:in_nation]-(c:customer)
        WHERE c.acctbal > 9999
        RETURN n, count(c) AS rich""").collect()
    assert len(rows) == 25  # every nation kept, even with 0 matches
    manual = (graph.view("customer").filter("acctbal > 9999").count())
    assert sum(r.rich for r in rows) == manual


def test_is_null_on_optional(graph):
    no_orders = cypher(graph, """
        MATCH (c:customer) OPTIONAL MATCH (c)-[:placed]->(o:order)
        WITH c, o WHERE o IS NULL
        RETURN count(*) AS n""").head().n
    manual = (graph.vertices.filter("label = 'customer'")
              .join(graph.edges.filter("label = 'placed'")
                    .selectExpr("src AS id"), on="id", how="left_anti")
              .count())
    assert no_orders == manual


def test_with_agg_then_filter_then_match(graph):
    rows = cypher(graph, """
        MATCH (c:customer)-[:placed]->(o:order)
        WITH c, count(o) AS n WHERE n >= 5
        MATCH (c)-[:in_nation]->(nat:nation)
        RETURN nat, sum(n) AS orders""").collect()
    import pyspark.sql.functions as SF
    manual = (graph.edges.filter("label = 'placed'")
              .groupBy("src").count().filter("count >= 5")
              .join(graph.edges.filter("label = 'in_nation'")
                    .select(SF.col("src"), SF.col("dst").alias("nat")),
                    on="src")
              .groupBy("nat").agg(SF.sum("count").alias("orders")))
    got = {(r.nat, r.orders) for r in rows}
    want = {(r.nat, float(r.orders)) for r in manual.collect()}
    assert got == {(n, o) for n, o in want} or \
        {(n, float(o)) for n, o in got} == want


def test_with_carries_node_properties(graph):
    # non-aggregating WITH keeps the node typed columns addressable
    n = cypher(graph, """
        MATCH (p:part) WITH p WHERE p.size > 40
        RETURN count(*) AS n""").head().n
    assert n == graph.view("part").filter("size > 40").count()
    # aggregating WITH re-hydrates the node on property access
    rows = cypher(graph, """
        MATCH (c:customer)-[:placed]->(o:order)
        WITH c, count(o) AS n WHERE n >= 5
        RETURN c.mktsegment AS segment, count(*) AS customers
        ORDER BY segment""").collect()
    assert rows and all(r.segment is not None for r in rows)


def test_return_arithmetic_expression(graph):
    rows = cypher(graph, """
        MATCH (p:part) WHERE p.size IN [10, 20]
        RETURN p AS id, p.size * 2 + 1 AS sz""").collect()
    assert rows and all(r.sz in (21, 41) for r in rows)
    with pytest.raises(SyntaxError):
        cypher(graph, "MATCH (p:part) RETURN p.size * 2")  # needs AS


def test_unwind_literal_and_chaining(graph):
    rows = cypher(graph, """
        MATCH (r:region) UNWIND [1, 2, 3] AS k
        RETURN r, k ORDER BY r, k""").collect()
    assert len(rows) == 15
    assert [r.k for r in rows[:3]] == [1, 2, 3]
    # UNWIND as the first clause
    rows = cypher(graph, "UNWIND [10, 20] AS x RETURN x ORDER BY x") \
        .collect()
    assert [r.x for r in rows] == [10, 20]
    # UNWIND feeding aggregation through WITH
    n = cypher(graph, """
        UNWIND [1, 2, 3, 4] AS x WITH x WHERE x > 2
        RETURN count(*) AS n""").head().n
    assert n == 2


def test_varlen_deep_range_materialized_base(graph):
    """max_hops > 2 exercises the checkpointed edge-view path. Fixed
    chains don't enforce cross-relationship uniqueness, so the 3-hop
    unroll OVERcounts paths that reuse an edge (a→b→a→b): the varlen
    total must sit between sum(1,2 hops) and the raw sum(1,2,3)."""
    parts = []
    for hops in (1, 2, 3):
        q = ("MATCH (a:customer)" +
             "".join(f"-[:interacted]->(v{i}:customer)"
                     for i in range(hops)) +
             " RETURN count(*) AS n")
        parts.append(cypher(graph, q).head().n)
    total = cypher(graph, """
        MATCH (a:customer)-[:interacted*1..3]->(b:customer)
        RETURN count(*) AS n""").head().n
    assert parts[0] + parts[1] < total <= sum(parts)


def test_starts_with_and_ends_with(graph):
    a = cypher(graph, """
        MATCH (p:part) WHERE p.name STARTS WITH 'blue'
        RETURN count(*) AS n""").head().n
    assert a == graph.view("part").filter(
        F.col("name").startswith("blue")).count() > 0
    b = cypher(graph, """
        MATCH (p:part) WHERE p.name ENDS WITH 'bolt'
        RETURN count(*) AS n""").head().n
    assert b == graph.view("part").filter(
        F.col("name").endswith("bolt")).count() > 0


def test_relationship_variable_props(graph):
    rows = cypher(graph, """
        MATCH (o:order)-[r:contains]->(p:part)
        WHERE r.quantity >= 45
        RETURN count(*) AS n, sum(r.quantity) AS q""").head()
    manual = (graph.view("contains").filter("quantity >= 45")
              .agg(F.count(F.lit(1)).alias("n"),
                   F.round(F.sum(F.col("quantity").cast("double")), 6)
                   .alias("q")).head())
    assert (rows.n, rows.q) == (manual.n, manual.q) and rows.n > 0


def test_relationship_variable_id_and_label(graph):
    r0 = cypher(graph, """
        MATCH (n:nation)-[r:located_in]->(x:region)
        RETURN r, label(r) AS l ORDER BY r LIMIT 1""").head()
    assert r0.l == "located_in"
    assert r0.r.startswith("nation!") and ">located_in>" in r0.r
    # IN direction flips endpoints but keeps the physical edge id
    r1 = cypher(graph, """
        MATCH (x:region)<-[r:located_in]-(n:nation)
        RETURN r ORDER BY r LIMIT 1""").head()
    assert r1.r == r0.r


def test_relationship_variable_varlen_rejected(graph):
    with pytest.raises(SyntaxError):
        cypher(graph, """
            MATCH (a)-[r:interacted*1..2]->(b) RETURN count(*) AS n""")


def test_relationship_variable_carries_through_with(graph):
    rows = cypher(graph, """
        MATCH (o:order)-[r:contains]->(p:part)
        WITH r WHERE r.discount > 0.05
        RETURN count(*) AS n""").head()
    manual = graph.view("contains").filter("discount > 0.05").count()
    assert rows.n == manual > 0


def test_relationship_var_predicate_pushdown(graph):
    """An edge-property predicate through a rel var must reach the
    parquet scan (typed edge view — the 100 TB posture for edge
    filters, same rule as node typed views)."""
    df = cypher(graph, """
        MATCH (o:order)-[r:contains]->(p:part)
        WHERE r.quantity >= 45 RETURN count(*) AS n""")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "GreaterThanOrEqual(l_quantity,45" in plan, plan


# ---- round 4: boolean WHERE + scalar functions ----------------------


def test_where_or_not_parens(graph):
    got = cypher(graph, """
        MATCH (p:part)
        WHERE NOT p.size = 1 AND (p.size < 3 OR p.size > 49)
        RETURN count(*) AS n""").head().n
    manual = graph.view("part").filter(
        "NOT size = 1 AND (size < 3 OR size > 49)").count()
    assert got == manual > 0


def test_where_xor_three_valued(graph):
    got = cypher(graph, """
        MATCH (p:part) WHERE p.size < 10 XOR p.name CONTAINS 'bolt'
        RETURN count(*) AS n""").head().n
    a = graph.view("part").filter("size < 10").count()
    b = graph.view("part").filter(
        F.array_contains(F.split(F.lower("name"), "[^a-z0-9]+"), "bolt")
        & (F.col("size") < 10)).count()
    c = graph.view("part").filter(
        F.array_contains(F.split(F.lower("name"), "[^a-z0-9]+"), "bolt")).count()
    assert got == a + c - 2 * b  # |A xor B| = |A| + |B| - 2|A∩B|


def test_where_precedence_not_and_xor_or(graph):
    # NOT > AND > XOR > OR: a OR b AND c parses as a OR (b AND c)
    got = cypher(graph, """
        MATCH (p:part)
        WHERE p.size = 1 OR p.size > 40 AND p.size < 43
        RETURN count(*) AS n""").head().n
    manual = graph.view("part").filter(
        "size = 1 OR (size > 40 AND size < 43)").count()
    assert got == manual > 0


def test_arithmetic_grouping_still_parses(graph):
    got = cypher(graph, """
        MATCH (p:part) WHERE (p.size + 1) * 2 > 100
        RETURN count(*) AS n""").head().n
    manual = graph.view("part").filter("(size + 1) * 2 > 100").count()
    assert got == manual > 0


def test_scalar_string_functions(graph):
    rows = cypher(graph, """
        MATCH (c:customer) WHERE toLower(c.mktsegment) = 'building'
        RETURN toUpper(c.mktsegment) AS u,
               substring(c.mktsegment, 0, 5) AS pre,
               size(c.mktsegment) AS sz,
               coalesce(c.nonexistent, 'dflt') AS co
        LIMIT 3""").collect()
    assert rows and all(
        (r.u, r.pre, r.sz, r.co) == ("BUILDING", "BUILD", 8, "dflt")
        for r in rows)


def test_scalar_math_and_casts(graph):
    r = cypher(graph, """
        MATCH (r:region)
        RETURN toInteger('41') + 1 AS i, round(2.718, 1) AS e,
               abs(0 - 5) AS a, sign(0 - 2) AS s
        LIMIT 1""").head()
    assert (r.i, r.e, r.a, r.s) == (42, 2.7, 5, -1)


def test_split_head_last(graph):
    r = cypher(graph, """
        MATCH (c:customer) WHERE c.name = 'Customer#000000001'
        RETURN head(split(c.name, '#')) AS h,
               last(split(c.name, '#')) AS l""").head()
    assert (r.h, r.l) == ("Customer", "000000001")


def test_type_function_on_rel_var(graph):
    rows = cypher(graph, """
        MATCH (c:customer)-[r:placed]->(o:order)
        RETURN DISTINCT type(r) AS t""").collect()
    assert [r.t for r in rows] == ["placed"]


def test_exists_and_is_not_null_agree(graph):
    a = cypher(graph, """
        MATCH (c:customer) WHERE exists(c.mktsegment)
        RETURN count(*) AS n""").head().n
    b = cypher(graph, """
        MATCH (c:customer) WHERE c.mktsegment IS NOT NULL
        RETURN count(*) AS n""").head().n
    assert a == b == graph.view("customer").filter(
        "mktsegment IS NOT NULL").count()


def test_missing_property_on_typed_label_is_null(graph):
    # openCypher: reading an undeclared property yields null, not error
    n = cypher(graph, """
        MATCH (r:region) WHERE r.population IS NULL
        RETURN count(*) AS n""").head().n
    assert n == graph.view("region").count()


def test_boolean_pushdown_through_or(graph):
    """An OR of two typed-column predicates must still reach the scan
    (Or(...) in PushedFilters) — disjunctions prune at 100 TB too."""
    df = cypher(graph, """
        MATCH (p:part) WHERE p.size = 1 OR p.size = 50
        RETURN count(*) AS n""")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Or(EqualTo(p_size,1),EqualTo(p_size,50))" in plan, plan


# ---- round 4 (cont.): CASE / labels() / UNION ------------------------


def test_case_searched(graph):
    rows = cypher(graph, """
        MATCH (p:part)
        RETURN CASE WHEN p.size < 17 THEN 'small'
                    WHEN p.size < 34 THEN 'mid'
                    ELSE 'large' END AS band,
               count(*) AS n
        ORDER BY band""").collect()
    want = (graph.view("part")
            .groupBy(F.when(F.col("size") < 17, "small")
                     .when(F.col("size") < 34, "mid")
                     .otherwise("large").alias("band"))
            .count().orderBy("band").collect())
    assert [(r.band, r.n) for r in rows] == \
        [(r.band, r["count"]) for r in want]


def test_case_simple_and_no_else_is_null(graph):
    rows = cypher(graph, """
        MATCH (r:region)
        RETURN r.name AS nm,
               CASE r.name WHEN 'AFRICA' THEN 'zero' END AS z
        ORDER BY nm""").collect()
    assert rows[0].z == "zero"
    assert all(r.z is None for r in rows[1:])


def test_case_inside_where(graph):
    n = cypher(graph, """
        MATCH (p:part)
        WHERE CASE WHEN p.size < 10 THEN true ELSE false END
        RETURN count(*) AS n""").head().n
    assert n == graph.view("part").filter("size < 10").count()


def test_labels_function(graph):
    r = cypher(graph,
               "MATCH (c:customer) RETURN labels(c) AS ls LIMIT 1").head()
    assert r.ls == ["customer"]


def test_union_distinct_and_all(graph):
    base = cypher(graph, "MATCH (r:region) RETURN r.name AS name")
    u = cypher(graph, """
        MATCH (r:region) RETURN r.name AS name
        UNION
        MATCH (r:region) RETURN r.name AS name""")
    ua = cypher(graph, """
        MATCH (r:region) RETURN r.name AS name
        UNION ALL
        MATCH (r:region) RETURN r.name AS name""")
    assert u.count() == base.count()
    assert ua.count() == 2 * base.count()


def test_union_mixed_rejected(graph):
    with pytest.raises(SyntaxError, match="mix UNION"):
        cypher(graph, """
            MATCH (r:region) RETURN r.name AS name
            UNION MATCH (n:nation) RETURN n.name AS name
            UNION ALL MATCH (n:nation) RETURN n.name AS name""")


def test_union_column_mismatch_rejected(graph):
    with pytest.raises(SyntaxError, match="same columns"):
        cypher(graph, """
            MATCH (r:region) RETURN r.name AS name
            UNION MATCH (n:nation) RETURN n.name AS other""")


# ---- round 4 (cont.): collect() / range() ----------------------------


def test_collect_groups_sorted(graph):
    rows = cypher(graph, """
        MATCH (n:nation)-[:located_in]->(r:region)
        RETURN r.name AS region, collect(n.name) AS nations
        ORDER BY region""").collect()
    want = (graph.view("nation").alias("n")
            .join(graph.edges.filter("label='located_in'").alias("e"),
                  F.col("n.id") == F.col("e.src"))
            .join(graph.view("region").alias("r"),
                  F.col("e.dst") == F.col("r.id"))
            .groupBy(F.col("r.name").alias("region"))
            .agg(F.sort_array(F.collect_list("n.name")).alias("nations"))
            .orderBy("region").collect())
    assert [(r.region, r.nations) for r in rows] == \
        [(r.region, r.nations) for r in want]


def test_collect_distinct(graph):
    r = cypher(graph, """
        MATCH (n:nation)-[:located_in]->(:region)
        RETURN collect(DISTINCT n.name) AS ns""").head()
    assert len(r.ns) == graph.view("nation").count()
    assert r.ns == sorted(r.ns)


def test_range_is_end_inclusive(graph):
    rows = cypher(graph, """
        UNWIND range(1, 3) AS x
        RETURN x, range(0, x) AS r ORDER BY x""").collect()
    assert [(r.x, r.r) for r in rows] == [
        (1, [0, 1]), (2, [0, 1, 2]), (3, [0, 1, 2, 3])]


def test_anonymous_node_patterns(graph):
    n = cypher(graph, """
        MATCH (n:nation)-[:located_in]->() RETURN count(*) AS n""").head().n
    assert n == graph.edges.filter("label='located_in'").count()
    m = cypher(graph, """
        MATCH ()-[:located_in]->(:region) RETURN count(*) AS n""").head().n
    assert m == n


def test_list_comprehension_filter_map(graph):
    r = cypher(graph, """
        UNWIND [1,2,3,4,5] AS x WITH collect(x) AS xs
        RETURN [y IN xs WHERE y > 2 | y * 10] AS big,
               [y IN xs WHERE y > 4] AS tail,
               [y IN xs | y + 1] AS inc""").head()
    assert r.big == [30, 40, 50]
    assert r.tail == [5]
    assert r.inc == [2, 3, 4, 5, 6]


def test_quantifiers_and_reduce(graph):
    r = cypher(graph, """
        UNWIND [1,2,3] AS x WITH collect(x) AS xs
        RETURN any(y IN xs WHERE y = 3) AS a,
               all(y IN xs WHERE y > 0) AS b,
               none(y IN xs WHERE y > 9) AS c,
               single(y IN xs WHERE y = 2) AS d,
               single(y IN xs WHERE y > 1) AS e,
               reduce(acc = 0, y IN xs | acc + y) AS total""").head()
    assert (r.a, r.b, r.c, r.d, r.e, r.total) == (
        True, True, True, True, False, 6)


def test_quantifier_in_where(graph):
    n = cypher(graph, """
        MATCH (p:part)
        WHERE any(w IN split(p.type, ' ') WHERE w = 'BRASS')
        RETURN count(*) AS n""").head().n
    want = graph.view("part").filter(
        F.array_contains(F.split("type", " "), "BRASS")).count()
    assert n == want


# ---- round 4 (cont.): pattern predicates -----------------------------


def test_pattern_pred_basic(graph):
    n = cypher(graph, """
        MATCH (c:customer) WHERE (c)-[:placed]->()
        RETURN count(*) AS n""").head().n
    want = graph.edges.filter("label='placed'") \
        .select("src").distinct().count()
    assert n == want


def test_pattern_pred_not_exists_and_far_label(graph):
    n = cypher(graph, """
        MATCH (c:customer)
        WHERE NOT exists((c)-[:placed]->(:order))
        RETURN count(*) AS n""").head().n
    want = graph.view("customer").count() - graph.edges.filter(
        "label='placed'").select("src").distinct().count()
    assert n == want


def test_pattern_pred_pair_and_direction(graph):
    n = cypher(graph, """
        MATCH (n:nation), (r:region)
        WHERE (n)-[:located_in]->(r)
        RETURN count(*) AS n""").head().n
    assert n == graph.edges.filter("label='located_in'").count()
    m = cypher(graph, """
        MATCH (r:region) WHERE (r)<-[:located_in]-()
        RETURN count(*) AS n""").head().n
    assert m == graph.edges.filter("label='located_in'") \
        .select("dst").distinct().count()


def test_pattern_pred_undirected_and_or(graph):
    total = cypher(graph, """
        MATCH (n:nation) WHERE (n)--() RETURN count(*) AS n""").head().n
    assert total == graph.view("nation").count()  # all touch an edge
    both = cypher(graph, """
        MATCH (c:customer)
        WHERE (c)-[:placed]->() OR c.acctbal < 0
        RETURN count(*) AS n""").head().n
    assert both == graph.edges.filter("label='placed'") \
        .select("src").distinct().count()  # every customer has orders


def test_pattern_pred_in_return(graph):
    rows = cypher(graph, """
        MATCH (r:region)
        RETURN r.name AS nm, exists((r)<-[:located_in]-()) AS has_n
        ORDER BY nm""").collect()
    assert all(r.has_n for r in rows)
    rows2 = cypher(graph, """
        MATCH (n:nation)
        RETURN n.name AS nm, exists((n)-[:placed]->()) AS x
        LIMIT 3""").collect()
    assert all(not r.x for r in rows2)


def test_exists_subquery_where(graph):
    # EXISTS {} ≡ the equivalent pattern semi-join
    got = cypher(graph, """
        MATCH (n:nation)
        WHERE EXISTS { MATCH (n)<-[:in_nation]-(c:customer)
                       WHERE c.acctbal > 9000.0 }
        RETURN n.name AS nm ORDER BY nm""").collect()
    rich = (graph.view("customer").filter("acctbal > 9000.0")
            .select(F.concat(F.lit("customer!"), F.col("name"))))
    nat = (graph.edges.filter("label='in_nation'")
           .join(graph.view("customer").filter("acctbal > 9000.0")
                 .select(F.col("id").alias("src")), on="src")
           .select("dst").distinct().count())
    assert len(got) == nat


def test_not_exists_subquery(graph):
    # NOT EXISTS {} composes through the boolean layer
    without = cypher(graph, """
        MATCH (n:nation)
        WHERE NOT EXISTS { (n)<-[:supplier_nation]-() }
        RETURN count(*) AS n""").head().n
    with_sup = (graph.edges.filter("label='supplier_nation'")
                .select("dst").distinct().count())
    total = graph.view("nation").count()
    assert without == total - with_sup


def test_count_subquery_return_and_where(graph):
    rows = cypher(graph, """
        MATCH (n:nation)
        RETURN n AS id, COUNT { (n)<-[:in_nation]-() } AS custs
        ORDER BY id""").collect()
    manual = dict(graph.edges.filter("label='in_nation'")
                  .groupBy("dst").count().collect())
    for r in rows:
        assert r.custs == manual.get(r.id, 0)
    heavy = cypher(graph, """
        MATCH (c:customer) WHERE COUNT { (c)-[:placed]->() } >= 15
        RETURN count(*) AS n""").head().n
    manual2 = (graph.edges.filter("label='placed'")
               .groupBy("src").count().filter("count >= 15").count())
    assert heavy == manual2


def test_keys_and_properties_typed(graph):
    rows = cypher(graph, """
        MATCH (c:customer) RETURN keys(c) AS ks, properties(c) AS pm
        LIMIT 3""").collect()
    for r in rows:
        assert r.ks == sorted(r.ks)
        assert set(r.ks) <= {"name", "acctbal", "mktsegment"}
        assert set(r.pm.keys()) == set(r.ks)  # same present-props
        assert "name" in r.ks


def test_keys_generic_var(graph):
    # unlabeled var → generic props-map path
    rows = cypher(graph, """
        MATCH (m) WHERE m.name = 'AFRICA' RETURN keys(m) AS ks""") \
        .collect()
    assert rows and rows[0].ks == ["name"]


def test_statistical_aggregates(graph):
    import math
    row = cypher(graph, """
        MATCH (c:customer)
        RETURN stDev(c.acctbal) AS sd, stDevP(c.acctbal) AS sdp,
               percentileCont(c.acctbal, 0.5) AS p50,
               percentileDisc(c.acctbal, 0.25) AS p25""").head()
    vals = sorted(r.acctbal for r in
                  graph.view("customer").select("acctbal").collect())
    n = len(vals)
    mean = sum(vals) / n
    var_s = sum((v - mean) ** 2 for v in vals) / (n - 1)
    assert abs(row.sd - math.sqrt(var_s)) < 1e-4
    # percentileDisc: smallest value with cumulative rank >= ceil(p*n)
    assert row.p25 == vals[math.ceil(0.25 * n) - 1]
    lo = vals[int((n - 1) * 0.5)]
    hi = vals[int((n - 1) * 0.5) + 1] if n % 2 == 0 else lo
    assert lo - 1e-6 <= row.p50 <= hi + 1e-6


def test_call_subquery_aggregating(graph):
    # per-row aggregation scope: one count per outer nation
    rows = cypher(graph, """
        MATCH (n:nation)
        CALL { WITH n MATCH (n)<-[:in_nation]-(c:customer)
               RETURN count(c) AS n_cust }
        RETURN n AS id, n_cust ORDER BY id""").collect()
    manual = dict(graph.edges.filter("label='in_nation'")
                  .groupBy("dst").count().collect())
    assert rows and all(r.n_cust == manual[r.id] for r in rows)
    # inner join semantics: nations with zero customers drop out
    assert len(rows) == len(manual)


def test_call_subquery_multiplicity(graph):
    # non-aggregating body multiplies per outer row (per-row rows)
    got = cypher(graph, """
        MATCH (r:region)
        CALL { WITH r MATCH (r)<-[:located_in]-(n:nation)
               RETURN n.name AS nn }
        RETURN r.name AS rn, nn ORDER BY rn, nn""").collect()
    manual = cypher(graph, """
        MATCH (r:region)<-[:located_in]-(n:nation)
        RETURN r.name AS rn, n.name AS nn ORDER BY rn, nn""").collect()
    assert [(x.rn, x.nn) for x in got] == [(x.rn, x.nn) for x in manual]


def test_call_subquery_uncorrelated(graph):
    # no imports: body runs once, cross-joins every outer row
    rows = cypher(graph, """
        MATCH (r:region)
        CALL { MATCH (n:nation) RETURN count(n) AS total }
        RETURN r.name AS rn, total ORDER BY rn""").collect()
    n_nation = graph.view("nation").count()
    n_region = graph.view("region").count()
    assert len(rows) == n_region
    assert all(r.total == n_nation for r in rows)


def test_call_subquery_rejects_order_and_writes(graph):
    with pytest.raises(SyntaxError):
        cypher(graph, """
            MATCH (n:nation)
            CALL { WITH n MATCH (n)<-[:in_nation]-(c)
                   RETURN c LIMIT 1 }
            RETURN n""")
    with pytest.raises(SyntaxError):
        cypher(graph, """
            MATCH (n:nation)
            CALL { WITH n SET n.x = 1 RETURN n }
            RETURN n""")


def test_parameters(graph):
    # $param in WHERE comparison, IN $list, property map, and RETURN
    got = cypher(graph, """
        MATCH (p:part) WHERE p.size >= $lo AND p.size < $hi
        RETURN count(*) AS n""", params={"lo": 45, "hi": 48}).head().n
    manual = graph.view("part").filter("size >= 45 AND size < 48").count()
    assert got == manual
    got2 = cypher(graph, """
        MATCH (p:part) WHERE p.size IN $sizes RETURN count(*) AS n""",
        params={"sizes": [10, 11, 12]}).head().n
    manual2 = graph.view("part").filter(
        F.col("size").isin([10, 11, 12])).count()
    assert got2 == manual2
    got3 = cypher(graph, "MATCH (n:nation {name: $nm}) RETURN n.name AS x",
                  params={"nm": "NATION_3"}).head().x
    assert got3 == "NATION_3"
    with pytest.raises(SyntaxError):
        cypher(graph, "MATCH (n) WHERE n.name = $missing RETURN n")


def test_parameter_pushdown_plan(graph):
    # a $param predicate pushes into the scan like its literal form
    plan = cypher(graph, """
        MATCH (p:part) WHERE p.size >= $lo RETURN p AS id""",
        params={"lo": 45})._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters" in plan and "45" in plan


def _interacted_levels(graph, src: str, depth: int) -> dict[str, int]:
    """Min walk length (≤ depth) per reachable vertex over the
    distinct interacted digraph — reference expectation for
    shortestPath semantics (min over walks == BFS distance)."""
    from collections import defaultdict
    adjm = defaultdict(set)
    for r in (graph.edges.filter("label = 'interacted'")
              .select("src", "dst").distinct().collect()):
        adjm[r.src].add(r.dst)
    dist: dict[str, int] = {}
    frontier = {src}
    for ln in range(1, depth + 1):
        nxt: set[str] = set()
        for v in frontier:
            nxt |= adjm[v]
        for v in nxt:
            dist.setdefault(v, ln)
        frontier = nxt
    return dist


def test_shortest_path_single_one_row_per_pair(graph):
    df = cypher(graph, """
        MATCH p = shortestPath(
            (a:customer)-[:interacted*1..3]->(b:customer))
        WHERE a = 'customer!1'
        RETURN b, length(p) AS ln""")
    rows = df.collect()
    dist = _interacted_levels(graph, "customer!1", 3)
    assert len(rows) == len(dist)  # exactly one representative per b
    assert {(r.b, r.ln) for r in rows} == set(dist.items())


def test_all_shortest_paths_min_and_multiplicity(graph):
    df = cypher(graph, """
        MATCH p = allShortestPaths(
            (a:customer)-[:interacted*1..3]->(b:customer))
        WHERE a = 'customer!1'
        RETURN b, length(p) AS ln, count(*) AS n""")
    rows = df.collect()
    dist = _interacted_levels(graph, "customer!1", 3)
    assert {(r.b, r.ln) for r in rows} == set(dist.items())
    # at distance 1 every parallel multi-edge is its own shortest path
    out1 = (graph.edges.filter("label = 'interacted'")
            .filter(F.col("src") == "customer!1").count())
    assert sum(r.n for r in rows if r.ln == 1) == out1


def test_shortest_path_unbound_and_errors(graph):
    n = cypher(graph, """
        MATCH shortestPath((a:customer)-[:interacted*..2]->(b:customer))
        WHERE a = 'customer!1' RETURN count(*) AS n""").head().n
    assert n == len(_interacted_levels(graph, "customer!1", 2))
    with pytest.raises(SyntaxError):
        cypher(graph, "MATCH p = shortestPath((a)-[:x*1..2]->(b)"
                      "-[:y]->(c)) RETURN p")
    with pytest.raises(SyntaxError):
        cypher(graph, "MATCH p = shortestPath((a)-[:x*2..3]->(b)) "
                      "RETURN p")


def test_explain_profile_prefixes(graph):
    s = cypher(graph, "EXPLAIN MATCH (n:nation) RETURN n.name AS nm")
    assert isinstance(s, str) and "== Physical Plan ==" in s
    base = cypher(
        graph, "MATCH (n:nation)-[:located_in]->(r:region) "
               "RETURN n.name AS nm, r.name AS rg")
    prof = cypher(
        graph, "PROFILE MATCH (n:nation)-[:located_in]->(r:region) "
               "RETURN n.name AS nm, r.name AS rg")
    assert {"step", "depth", "operator", "rows"} <= set(prof.columns)
    got = [r.rows for r in prof.collect() if r.rows is not None]
    assert base.count() in got


# ---- round 6 review fixes -------------------------------------------


def test_unary_minus_and_negative_literals(graph):
    """'-1' tokenizes as arrow '-' + num — the operand parser now
    folds unary minus (review r06: every negative literal raised)."""
    row = cypher(graph, "MATCH (n:region) "
                        "RETURN -1 AS a, 5 - -3 AS b, -(1 + 2) AS c "
                        "LIMIT 1").head()
    assert (row.a, row.b, row.c) == (-1, 8, -3)
    n = cypher(graph, "MATCH (c:customer) WHERE c.acctbal > -1000.0 "
                      "RETURN count(*) AS n").head().n
    assert n > 0


def test_string_escape_sequences(graph):
    """Backslash escapes decode to their characters — previously the
    backslash was kept verbatim and a quoted quote was inexpressible
    (review r06)."""
    row = cypher(graph, "MATCH (n:region) "
                        "RETURN 'O\\'Brien' AS q, 'a\\\\b' AS bs, "
                        "'x\\ny' AS nl LIMIT 1").head()
    assert row.q == "O'Brien"
    assert row.bs == "a\\b"
    assert row.nl == "x\ny"


def test_min_max_over_strings(graph):
    """openCypher min/max are defined over strings — the blanket
    double cast nulled them (review r06); numeric props keep numeric
    semantics via the schema-typed resolution."""
    row = cypher(graph, "MATCH (r:region) "
                        "RETURN min(r.name) AS lo, max(r.name) AS hi "
                        ).head()
    assert isinstance(row.lo, str) and row.lo < row.hi
    row2 = cypher(graph, "MATCH (c:customer) "
                         "RETURN max(c.acctbal) AS m").head()
    assert isinstance(row2.m, float)


def test_match_arrow_shorthand(graph):
    """(a)-->(b) / (a)<--(b) / (a)--(b) — the bracketless anonymous
    relationship forms parse in MATCH (review r06: only WHERE pattern
    predicates accepted them)."""
    out_n = cypher(graph, "MATCH (c:customer)-->(n:nation) "
                          "RETURN count(*) AS n").head().n
    in_n = cypher(graph, "MATCH (n:nation)<--(c:customer) "
                         "RETURN count(*) AS n").head().n
    both_n = cypher(graph, "MATCH (c:customer)--(n:nation) "
                           "RETURN count(*) AS n").head().n
    explicit = cypher(graph, "MATCH (c:customer)-[]->(n:nation) "
                             "RETURN count(*) AS n").head().n
    assert out_n == in_n == explicit > 0
    assert both_n >= out_n


def test_with_distinct_carried_node_var(graph):
    """WITH DISTINCT n over a carried node var must not feed the
    hidden map-typed props column into Deduplicate (review r06:
    AnalysisException on a legal query)."""
    n = cypher(graph, "MATCH (n:region)<-[:located_in]-() "
                      "WITH DISTINCT n "
                      "RETURN count(*) AS n").head().n
    assert n == 5


def test_in_list_with_expressions(graph):
    """IN-list elements can be expressions, not only literals
    (review r06: a property element silently contributed the VAR NAME
    string to the membership list)."""
    n = cypher(graph, "MATCH (r:region) "
                      "WHERE r.name IN [r.name, 'nope'] "
                      "RETURN count(*) AS n").head().n
    assert n == 5  # r.name IN [r.name, ...] is trivially true
    n2 = cypher(graph, "MATCH (r:region) WHERE 'x' IN [r.name] "
                       "RETURN count(*) AS n").head().n
    assert n2 == 0


def test_pattern_pred_label_constraints(graph):
    """Node-label assertions inside pattern predicates restrict the
    marker join (review r06: silently dropped when both vars were
    bound)."""
    # every customer-nation edge exists, but no customer is a :region
    n = cypher(graph, "MATCH (c:customer)-[:in_nation]->(n:nation) "
                      "WHERE (c:region)--(n) "
                      "RETURN count(*) AS n").head().n
    assert n == 0
    n2 = cypher(graph, "MATCH (c:customer)-[:in_nation]->(n:nation) "
                       "WHERE (c:customer)--(n) "
                       "RETURN count(*) AS n").head().n
    assert n2 > 0


# ---- openCypher NULL semantics (r06 null-semantics review) -----------

def test_order_by_null_placement(graph):
    """openCypher: nulls sort LAST ascending, FIRST descending —
    Spark's defaults are the exact opposite."""
    from incubator_hugegraph_spark.cypher import cypher
    rows = cypher(graph, """
        MATCH (r:region) OPTIONAL MATCH (r)<-[:located_in]-(n:nation)
        WITH r, count(n) AS cnt
        RETURN r.name AS nm,
               CASE WHEN cnt > 100 THEN 1 END AS never
        ORDER BY never ASC, nm LIMIT 3""").collect()
    # `never` is null everywhere; the query must still order by nm
    # (nulls last would put non-null first — all null, so nm rules)
    assert [r.nm for r in rows] == sorted(r.nm for r in rows)
    asc = cypher(graph, """
        UNWIND [3, null, 1] AS x RETURN x ORDER BY x ASC""").collect()
    assert [r.x for r in asc] == [1, 3, None]
    desc = cypher(graph, """
        UNWIND [3, null, 1] AS x RETURN x ORDER BY x DESC""").collect()
    assert [r.x for r in desc] == [None, 3, 1]


def test_sum_and_stdev_of_no_values(graph):
    """sum() of no values is 0; stDev of fewer than 2 values is 0."""
    from incubator_hugegraph_spark.cypher import cypher
    r = cypher(graph, """
        MATCH (c:customer) WHERE c.acctbal > 1e18
        RETURN sum(c.acctbal) AS s, stdev(c.acctbal) AS sd""").head()
    assert r.s == 0.0 and r.sd == 0.0


def test_null_string_predicates(graph):
    """CONTAINS / STARTS WITH / ENDS WITH null evaluate to null —
    never the string 'None' or token 'none'."""
    from incubator_hugegraph_spark.cypher import cypher
    for pred in ("c.mktsegment CONTAINS $q",
                 "c.mktsegment STARTS WITH $q",
                 "c.mktsegment ENDS WITH $q"):
        n = cypher(graph, f"""
            MATCH (c:customer) WHERE {pred}
            RETURN count(*) AS n""", params={"q": None}).head().n
        assert n == 0, pred


def test_labels_of_null_node(graph):
    """labels(null) is null, not [null] (OPTIONAL MATCH miss)."""
    from incubator_hugegraph_spark.cypher import cypher
    rows = cypher(graph, """
        MATCH (r:region) OPTIONAL MATCH (r)-[:located_in]->(x)
        RETURN r.name AS nm, labels(x) AS lx""").collect()
    assert rows and all(r.lx is None for r in rows)


def test_set_null_semantics(graph):
    """SET n.p = null removes p; SET on a null var (OPTIONAL MATCH
    miss) is skipped — never a phantom null-id vertex."""
    from incubator_hugegraph_spark.cypher import cypher
    from incubator_hugegraph_spark.graph import PropertyGraph
    from pyspark.sql import functions as F
    g = PropertyGraph(graph.spark, graph.vertices, graph.edges,
                      schema=graph.schema,
                      vertex_views=dict(graph.vertex_views),
                      edge_views=dict(graph.edge_views))
    # regions have no outgoing located_in — x is always null: the SET
    # must be a no-op, not a null-id insert
    cypher(g, """
        MATCH (r:region) OPTIONAL MATCH (r)-[:located_in]->(x)
        SET x.touched = 'y'""")
    assert g.vertices.filter(F.col("id").isNull()).count() == 0
    # SET to null removes the property (mktsegment is declared,
    # non-pk on customer)
    pre = cypher(g, "MATCH (c:customer) WHERE c.mktsegment IS NOT NULL "
                    "RETURN c LIMIT 1").head().c
    cypher(g, f"MATCH (c:customer) WHERE c = '{pre}' "
              "SET c.mktsegment = null")
    got = cypher(g, f"MATCH (c:customer) WHERE c = '{pre}' "
                    "RETURN c.mktsegment AS m").head()
    assert got.m is None


def test_merge_rel_null_endpoint_errors(graph):
    """MERGE/CREATE of a relationship with a null endpoint raises
    like Neo4j instead of writing a null-src/dst edge."""
    import pytest
    from incubator_hugegraph_spark.cypher import cypher
    from incubator_hugegraph_spark.graph import PropertyGraph
    g = PropertyGraph(graph.spark, graph.vertices, graph.edges,
                      schema=graph.schema,
                      vertex_views=dict(graph.vertex_views),
                      edge_views=dict(graph.edge_views))
    with pytest.raises(Exception, match="null node"):
        cypher(g, """
            MATCH (r:region) OPTIONAL MATCH (r)-[:located_in]->(x)
            MERGE (r)-[:interacted]->(x)""")


def test_call_subquery_null_import(graph):
    """CALL { WITH n ... } keeps rows whose import is null
    (null-safe key join; openCypher executes with the null binding)."""
    from incubator_hugegraph_spark.cypher import cypher
    rows = cypher(graph, """
        MATCH (r:region) OPTIONAL MATCH (r)-[:located_in]->(x)
        CALL { WITH x OPTIONAL MATCH (x)<-[:located_in]-(m)
               RETURN count(m) AS v }
        RETURN r.name AS nm, v""").collect()
    # x is null for every region (no outgoing located_in): the
    # null-import rows must SURVIVE the subquery join with v = 0
    assert rows and all(r.v == 0 for r in rows)
