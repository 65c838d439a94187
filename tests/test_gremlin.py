"""Gremlin DSL (§2.L): step families compiled to DataFrame plans.

The oracle-gated driver queries (gremlin_dsl_*) cover
has/hop/dedup/count, path multiplicity, groupCount and values/mean;
these tests cover the remaining step families against directly
computed expectations on the fixture graph.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from incubator_hugegraph_spark.gremlin import G, GP


def test_has_id_and_label(graph):
    g = G(graph)
    assert g.V("customer!1", "part!1").hasLabel("part").toList() == [
        "part!1"]
    got = g.V().hasId("nation!3", "nation!4").id_().toList()
    assert sorted(got) == ["nation!3", "nation!4"]


def test_out_in_both_counts_match_adj(graph):
    g = G(graph)
    out_n = g.V("customer!1").out("placed").count().head().cnt
    manual = graph.edges.filter(
        (F.col("label") == "placed")
        & (F.col("src") == "customer!1")).count()
    assert out_n == manual
    # both == out + in multiplicities
    both_n = g.V("customer!1").both("interacted").count().head().cnt
    o = graph.edges.filter((F.col("label") == "interacted")
                           & (F.col("src") == "customer!1")).count()
    i = graph.edges.filter((F.col("label") == "interacted")
                           & (F.col("dst") == "customer!1")).count()
    assert both_n == o + i


def test_edge_steps_and_props(graph):
    g = G(graph)
    # outE.has on edge props, then otherV lands on the far vertex
    t = (g.V("customer!1").outE("placed")
         .has("totalprice", GP.gt(0.0)).otherV())
    ids = t.id_().toList()
    assert ids and all(i.startswith("order!") for i in ids)
    # E() source counts a label
    assert (g.E("in_nation").count().head().cnt
            == graph.edges.filter(F.col("label") == "in_nation").count())


def test_range_limit_tail_are_deterministic_and_disjoint(graph):
    g = G(graph)
    base = g.V().hasLabel("nation").id_()
    first10 = base.limit(10).toList()
    next5 = base.range_(10, 15).toList()
    last3 = base.tail(3).toList()
    allids = sorted(g.V().hasLabel("nation").id_().toList())
    assert first10 == allids[:10]
    assert next5 == allids[10:15]
    assert sorted(last3) == allids[-3:]


def test_sample_deterministic(graph):
    g = G(graph)
    s1 = g.V().hasLabel("customer").sample(7).id_().toList()
    s2 = g.V().hasLabel("customer").sample(7).id_().toList()
    assert len(s1) == 7 and sorted(s1) == sorted(s2)


def test_union_and_fold(graph):
    g = G(graph)
    u = (g.V("nation!1")
         .union(lambda t: t.out("located_in"),
                lambda t: t.in_("in_nation"))
         .id_())
    ids = u.toList()
    assert any(i.startswith("region!") for i in ids)
    folded = g.V().hasLabel("region").id_().fold().head().value
    assert folded == sorted(folded) and len(folded) == 5


def test_simple_vs_cyclic_path_partition(graph):
    g = G(graph)
    two_hop = g.V("customer!1").both("interacted").both("interacted")
    total = two_hop.count().head().cnt
    simple = two_hop.simplePath().count().head().cnt
    cyclic = two_hop.cyclicPath().count().head().cnt
    assert total == simple + cyclic
    # every both().both() walk can step straight back -> cycles exist
    assert cyclic > 0
    paths = two_hop.cyclicPath().path().toList()
    assert all(len(set(p.split(">"))) < 3 for p in paths)


def test_order_by_prop(graph):
    g = G(graph)
    rows = (g.V().hasLabel("part").order_by("size", asc=False)
            .limit(3).toDF().collect())
    sizes = [int(r.props["size"]) for r in rows]
    top = (graph.view("part").agg(F.max("size")).head()[0])
    assert sizes[0] == top


def test_group_count_by_label_and_prop(graph):
    g = G(graph)
    by_label = {r.key: r.cnt for r in g.V().groupCount("label").collect()}
    assert by_label["region"] == 5 and by_label["nation"] == 25
    by_prop = {r.key: r.cnt
               for r in (g.V().hasLabel("customer")
                         .groupCount("mktsegment").collect())}
    assert sum(by_prop.values()) == by_label["customer"]


def test_repeat_equals_unrolled(graph):
    g = G(graph)
    a = (g.V("customer!1").repeat(lambda t: t.out("interacted"), 2)
         .dedup().id_().toList())
    b = (g.V("customer!1").out("interacted").out("interacted")
         .dedup().id_().toList())
    assert sorted(a) == sorted(b)


def test_value_map_and_is(graph):
    g = G(graph)
    rows = g.V("part!1").valueMap("name", "size").toDF().collect()
    assert rows[0].id == "part!1" and set(rows[0].value) <= {"name", "size"}
    vals = (g.V().hasLabel("region").id_()
            .is_(GP.within("region!1", "region!2")).toList())
    assert sorted(vals) == ["region!1", "region!2"]


def test_inject_choose_coalesce_optional(graph):
    g = G(graph)
    got = g.V("region!0").id_().inject("synthetic!1").toList()
    assert sorted(got) == ["region!0", "synthetic!1"]
    # choose: nations 0-12 -> their region; others -> themselves
    t = g.V().hasLabel("nation").choose(
        lambda df: F.split(df.id, "!")[1].cast("int") < 13,
        lambda t: t.out("located_in"),
        lambda t: t)
    ids = t.id_().toList()
    assert sum(i.startswith("region!") for i in ids) == 13
    assert sum(i.startswith("nation!") for i in ids) == 12
    # coalesce: first branch empty (no out-edges from region along
    # located_in), falls through to identity
    kept = g.V("region!3").coalesce(
        lambda t: t.out("located_in"),
        lambda t: t).id_().toList()
    assert kept == ["region!3"]
    assert g.V("region!3").optional(
        lambda t: t.in_("located_in")).count().head().cnt == 5


def test_dedup_keeps_min_path_deterministically(graph):
    g = G(graph)
    t = (g.V("customer!1").out("placed").out("contains").dedup().path())
    p1 = sorted(t.toList())
    p2 = sorted(g.V("customer!1").out("placed").out("contains")
                .dedup().path().toList())
    assert p1 == p2
    # one path per distinct part, and it is the minimum one
    full = (g.V("customer!1").out("placed").out("contains").path()
            .toList())
    by_last: dict[str, tuple] = {}
    for p in full:
        t = tuple(p.split(">"))  # the window compares the path ARRAY
        # element-wise, not the joined string (they diverge on prefix
        # ids like order!5 / order!51)
        by_last[t[-1]] = min(by_last.get(t[-1], t), t)
    assert sorted(">".join(t) for t in by_last.values()) == p1


def test_gremlin_text_matches_fluent(graph):
    from incubator_hugegraph_spark.gremlin_text import eval_gremlin
    g = G(graph)
    a = eval_gremlin(
        graph, "g.V('customer!1').repeat(__.out('interacted')).times(2)"
               ".dedup().id()").collect()
    b = (g.V("customer!1").repeat(lambda t: t.out("interacted"), 2)
         .dedup().id_().toDF().collect())
    assert sorted(r.value for r in a) == sorted(r.value for r in b)
    # predicates, order modifiers, branch steps parse and run
    assert eval_gremlin(
        graph, "g.V().hasLabel('nation').order().by('name', decr)"
               ".limit(1).id()").head().value == "nation!9"
    got = eval_gremlin(
        graph, "g.V('nation!1').union(__.out('located_in'), "
               "__.in('in_nation')).count()").head().cnt
    assert got > 1
    ch = eval_gremlin(
        graph, "g.V().hasLabel('part').choose(__.has('size', lt(25)), "
               "__.values('size'), __.values('name'))").collect()
    assert any(r.value.isdigit() for r in ch) \
        and any(not r.value.isdigit() for r in ch)


def test_gremlin_text_rejects_unsupported(graph):
    import pytest
    from incubator_hugegraph_spark.gremlin_text import eval_gremlin
    for bad in ["g.V().map{it}",           # closure
                "x.V().count()",            # not a g chain
                "g.V().repeat(__.out())",   # repeat without times
                "g.V().frobnicate()"]:      # unknown step
        with pytest.raises(SyntaxError):
            eval_gremlin(graph, bad)


def test_rest_gremlin_adapter(graph):
    from incubator_hugegraph_spark import rest
    df = rest.execute_gremlin(
        graph, {"gremlin": "g.V().hasLabel('region').count()"})
    assert df.head().cnt == 5


def test_as_select_where_label(graph):
    g = G(graph)
    pairs = (g.V().hasLabel("customer").as_("c").out("in_nation")
             .as_("n").select("c", "n"))
    rows = pairs.collect()
    assert len(rows) == graph.edges.filter(
        F.col("label") == "in_nation").count()
    assert all(r.c.startswith("customer!") and r.n.startswith("nation!")
               for r in rows)
    # where_label: 2-hop interacted walks that return to the start
    back = (g.V("customer!1").as_("a").both("interacted")
            .both("interacted").where_label("eq", "a").count().head().cnt)
    cyc = (g.V("customer!1").both("interacted").both("interacted")
           .cyclicPath().count().head().cnt)
    assert back <= cyc and back > 0
    # labels survive edge hops (outE -> otherV)
    got = (g.V("nation!1").as_("x").in_("in_nation").outE("placed")
           .otherV().select("x").dropDuplicates().collect())
    assert [r.x for r in got] == ["nation!1"]


def test_gremlin_text_as_select(graph):
    from incubator_hugegraph_spark.gremlin_text import eval_gremlin
    df = eval_gremlin(
        graph, "g.V().hasLabel('region').as('r').in('located_in')"
               ".as('n').select('r', 'n')")
    rows = df.collect()
    assert df.columns == ["r", "n"] and len(rows) == 25
    assert all(r.r.startswith("region!") and r.n.startswith("nation!")
               for r in rows)


def test_gremlin_text_where_label(graph):
    from incubator_hugegraph_spark.gremlin_text import eval_gremlin
    back = eval_gremlin(
        graph, "g.V('customer!1').as('a').both('interacted')"
               ".both('interacted').where(eq('a')).count()").head().cnt
    away = eval_gremlin(
        graph, "g.V('customer!1').as('a').both('interacted')"
               ".both('interacted').where(neq('a')).count()").head().cnt
    total = eval_gremlin(
        graph, "g.V('customer!1').both('interacted')"
               ".both('interacted').count()").head().cnt
    assert back + away == total and back > 0


# ---- round 3: sack / tree / subgraph / math / mid-traversal V -------


def test_sack_accumulates_through_hops(graph):
    from incubator_hugegraph_spark.gremlin import G
    rows = (G(graph).withSack(0.0).V().hasLabel("customer")
            .sack_("sum", "acctbal").out("placed")
            .sack_("sum", "totalprice").sack_()).df.collect()
    manual = (graph.view("customer")
              .join(graph.edges.filter("label = 'placed'")
                    .selectExpr("src AS id", "dst AS oid"), on="id")
              .join(graph.view("order").selectExpr("id AS oid",
                                                   "totalprice"), on="oid")
              .selectExpr("acctbal + totalprice AS v").collect())
    assert sorted(round(r.value, 4) for r in rows) \
        == sorted(round(r.v, 4) for r in manual)


def test_sack_mult_and_assign(graph):
    from incubator_hugegraph_spark.gremlin import G
    v = (G(graph).withSack(2.0).V("customer!1")
         .sack_("mult", "acctbal").sack_()).df.head().value
    bal = graph.view("customer").filter("id = 'customer!1'") \
        .head().acctbal
    assert abs(v - 2.0 * bal) < 1e-9
    v2 = (G(graph).withSack(7.0).V("customer!1")
          .sack_("assign", "acctbal").sack_()).df.head().value
    assert abs(v2 - bal) < 1e-9


def test_sack_requires_withSack(graph):
    from incubator_hugegraph_spark.gremlin import G
    with pytest.raises(TypeError):
        G(graph).V().sack_()


def test_tree_prefix_identity(graph):
    from incubator_hugegraph_spark.gremlin import G
    rows = (G(graph).V("customer!1").out("placed").out("contains")
            .tree()).collect()
    by_depth = {}
    for r in rows:
        by_depth.setdefault(r.depth, set()).add(r.path)
    assert by_depth[0] == {"customer!1"}
    orders = {r.dst for r in graph.edges
              .filter("label='placed' AND src='customer!1'").collect()}
    assert by_depth[1] == {f"customer!1>{o}" for o in orders}
    # every depth-2 node's parent is a depth-1 path
    parents = {r.parent for r in rows if r.depth == 2}
    assert parents <= by_depth[1]
    # tree node identity is the PREFIX: parts reached via two orders
    # appear once per order
    assert all(r.path.count(">") == r.depth for r in rows)


def test_subgraph_is_property_graph(graph):
    from incubator_hugegraph_spark.gremlin import G
    sub = G(graph).E("located_in").subgraph()
    assert {r.label for r in sub.vertices.select("label")
            .distinct().collect()} == {"nation", "region"}
    assert sub.edges.count() == 25
    # the subgraph is a real PropertyGraph: algorithms run on it
    from incubator_hugegraph_spark.algorithms.wcc import wcc
    comps = wcc(sub, engine="dist")
    assert comps.select("component").distinct().count() == 5


def test_subgraph_after_bothE_dedups_physical_edges(graph):
    from incubator_hugegraph_spark.gremlin import G
    sub = (G(graph).V().hasLabel("nation").bothE("located_in")
           .subgraph())
    # every physical edge seen from both ends exactly once
    assert sub.edges.count() == 25


def test_math_step(graph):
    from incubator_hugegraph_spark.gremlin import G
    rows = (G(graph).V().hasLabel("part").values("size")
            .math_("(_ * 2 + 1) / 2").df.collect())
    manual = [round((r.size * 2 + 1) / 2, 6) for r in
              graph.view("part").select("size").collect()]
    assert sorted(r.value for r in rows) == sorted(manual)
    with pytest.raises(SyntaxError):
        G(graph).V().values("size").math_("bogus(_)")


def test_mid_traversal_v_restart(graph):
    from incubator_hugegraph_spark.gremlin import G
    t = (G(graph).V("customer!1").out("in_nation")
         .V_("region!0", "region!1"))
    rows = t.df.collect()
    assert len(rows) == 2
    assert all(len(r.path) == 3 and r.id.startswith("region!")
               for r in rows)


def test_text_parser_new_steps(graph):
    from incubator_hugegraph_spark.gremlin_text import eval_gremlin
    v = eval_gremlin(graph, "g.withSack(1.0).V('customer!1')"
                            ".sack(mult).by('acctbal').sack()").head().value
    bal = graph.view("customer").filter("id = 'customer!1'").head().acctbal
    assert abs(v - bal) < 1e-9
    n = eval_gremlin(graph, "g.V('customer!1').out('placed')"
                            ".out('contains').tree()").count()
    assert n > 0
    m = eval_gremlin(graph, "g.V().hasLabel('region').values('name')"
                            ".count()").head().cnt
    assert m == 5
    rows = eval_gremlin(graph, "g.V('customer!1').out('in_nation')"
                               ".V('region!0').path()").collect()
    assert len(rows) == 1 and rows[0].value.endswith(">region!0")
    sz = eval_gremlin(graph, "g.V().hasLabel('part')"
                             ".values('size').math('_ * 10')")
    assert sz.count() == graph.view("part").count()


def test_project_step(graph):
    from incubator_hugegraph_spark.gremlin import G
    rows = (G(graph).V().hasLabel("region")
            .project(("rid", "id"), ("nm", "name"))).collect()
    assert len(rows) == 5
    assert all(r.rid.startswith("region!") and r.nm for r in rows)


def test_project_text_parser(graph):
    from incubator_hugegraph_spark.gremlin_text import eval_gremlin
    rows = eval_gremlin(
        graph, "g.V().hasLabel('region')"
               ".project('rid','nm').by(id).by('name')").collect()
    assert len(rows) == 5 and rows[0].rid.startswith("region!")


def test_group_by_by(graph):
    from incubator_hugegraph_spark.gremlin import G
    rows = {r.key: r.value for r in
            G(graph).V().hasLabel("part").group("brand", "mean", "size")
            .collect()}
    manual = {r.brand: r.v for r in
              graph.view("part").groupBy("brand")
              .agg(F.round(F.avg(F.col("size").cast("double")), 6)
                   .alias("v")).collect()}
    assert rows == manual
    # default: group into sorted id lists
    g2 = {r.key: r.value for r in
          G(graph).V().hasLabel("region").group("label").collect()}
    assert g2["region"] == sorted(g2["region"]) and len(g2["region"]) == 5


def test_group_text_parser(graph):
    from incubator_hugegraph_spark.gremlin_text import eval_gremlin
    rows = eval_gremlin(
        graph, "g.V().hasLabel('part').group().by('brand')"
               ".by(__.values('size').mean())").collect()
    manual = graph.view("part").groupBy("brand").count().count()
    assert len(rows) == manual
    cnt = eval_gremlin(
        graph, "g.V().group().by(label).by(__.count())").collect()
    assert {r.key: r.value for r in cnt}["region"] == 5


def test_repeat_emit_unions_rounds(graph):
    from incubator_hugegraph_spark.gremlin import G
    got = sorted(r.value for r in
                 (G(graph).V("customer!1")
                  .repeat_emit(lambda t: t.out("placed"), 2)
                  .id_()).df.collect())
    placed = graph.edges.filter("label='placed' AND src='customer!1'")
    h1 = sorted(r.dst for r in placed.collect())
    assert got == h1  # orders have no outgoing 'placed' edges
    # emit_first also yields the source
    got2 = sorted(r.value for r in
                  (G(graph).V("customer!1")
                   .repeat_emit(lambda t: t.out("placed"), 1,
                                emit_first=True)
                   .id_()).df.collect())
    assert got2 == sorted(["customer!1"] + h1)


def test_repeat_until_stops_matching_traversers(graph):
    # NOTE: the repeat body must converge — an unlabeled out() walks
    # the cyclic `interacted` subgraph and multiplies traversers
    # without bound (true of TinkerPop repeat too; the capacity guard
    # below turns that into CapacityExceeded).
    from incubator_hugegraph_spark.gremlin import G
    from pyspark.sql import functions as SF
    rows = (G(graph).V("customer!1")
            .repeat_until(lambda t: t.out("in_nation", "located_in"),
                          lambda df: SF.col("label") == "region")
            .id_()).df.collect()
    nat = graph.edges.filter(
        "label='in_nation' AND src='customer!1'").head().dst
    reg = graph.edges.filter(
        f"label='located_in' AND src='{nat}'").head().dst
    assert {r.value for r in rows} == {reg}


def test_repeat_until_capacity_guard(graph):
    from incubator_hugegraph_spark.gremlin import G
    from incubator_hugegraph_spark.graph import CapacityExceeded
    from pyspark.sql import functions as SF
    with pytest.raises(CapacityExceeded):
        (G(graph).V("customer!1")
         .repeat_until(lambda t: t.out("interacted"),
                       lambda df: SF.col("label") == "region",
                       capacity=1000)
         .id_()).df.collect()


def test_repeat_text_forms(graph):
    from incubator_hugegraph_spark.gremlin_text import eval_gremlin
    n1 = eval_gremlin(graph, "g.V('customer!1')"
                             ".repeat(__.out('placed')).times(1)"
                             ".count()").head().cnt
    ne = eval_gremlin(graph, "g.V('customer!1')"
                             ".repeat(__.out('placed')).emit().times(2)"
                             ".count()").head().cnt
    assert ne == n1  # second round adds nothing (orders are sinks)
    ru = eval_gremlin(graph, "g.V('customer!1')"
                             ".repeat(__.out('in_nation','located_in'))"
                             ".until(__.hasLabel('region')).id()").collect()
    assert len(ru) == 1 and ru[0].value.startswith("region!")


def test_select_by_projection(graph):
    from incubator_hugegraph_spark.gremlin import G
    rows = (G(graph).V().hasLabel("nation").as_("n")
            .out("located_in").as_("r")
            .select("n", "r", by=["name"]))
    got = {(x.n, x.r) for x in rows.collect()}
    manual = {(a.nn, a.rn) for a in
              (graph.view("nation").selectExpr("id AS nid", "name AS nn")
               .join(graph.edges.filter("label='located_in'")
                     .selectExpr("src AS nid", "dst AS rid"), on="nid")
               .join(graph.view("region").selectExpr("id AS rid",
                                                     "name AS rn"),
                     on="rid")).collect()}
    assert got == manual and len(got) > 0
    # mixed modulators: id passthrough + label
    one = (G(graph).V("nation!0").as_("n").out("located_in").as_("r")
           .select("n", "r", by=["id", "label"])).head()
    assert one.n == "nation!0" and one.r == "region"


def test_select_by_text_parser(graph):
    from incubator_hugegraph_spark.gremlin_text import eval_gremlin
    rows = eval_gremlin(
        graph, "g.V().hasLabel('nation').as('n')"
               ".out('located_in').as('r')"
               ".select('n','r').by('name').by('name')").collect()
    assert len(rows) == 25 and all(r.n and r.r for r in rows)


def test_has_existence_and_has_not(graph):
    from incubator_hugegraph_spark.gremlin import G
    total = graph.vertices.count()
    with_size = G(graph).V().has("size").count().head().cnt
    without = G(graph).V().hasNot("size").count().head().cnt
    assert with_size == graph.vertices.filter(
        "props['size'] IS NOT NULL").count()
    assert with_size + without == total
    assert 0 < with_size < total  # only parts carry size
    # text-parser form
    from incubator_hugegraph_spark.gremlin_text import eval_gremlin
    n = eval_gremlin(graph, "g.V().has('size').count()").head().cnt
    assert n == with_size
    m = eval_gremlin(graph, "g.V().hasNot('size').count()").head().cnt
    assert m == without


def test_store_aggregate_cap(graph):
    """sideEffect store/aggregate + cap (ProcessBasicSuite.java:
    110-198): the bag collects the value stream; cap emits it as one
    traverser with a sorted array."""
    from incubator_hugegraph_spark.gremlin import G
    row = (G(graph).V().hasLabel("region")
           .aggregate("x", by="name").cap("x").toDF()).head()
    names = sorted(r.value for r in
                   G(graph).V().hasLabel("region")
                   .values("name").toDF().collect())
    assert row.value == names
    # store collapses to the same batch semantics
    row2 = (G(graph).V().hasLabel("region")
            .store("x").cap("x").toDF()).head()
    assert row2.value == sorted(
        r.id for r in graph.vertices.filter("label='region'")
        .select("id").collect())


def test_barrier_is_identity(graph):
    from incubator_hugegraph_spark.gremlin import G
    assert (G(graph).V().hasLabel("region").barrier().count()
            .head().cnt) == 5


def test_local_count_per_traverser(graph):
    """local(out().count()) = per-vertex degree, with 0 for vertices
    lacking the edge (TinkerPop CountLocalStep contract) — the global
    count() would collapse everything to one row."""
    from pyspark.sql import functions as SF

    from incubator_hugegraph_spark.gremlin import G
    rows = (G(graph).V().hasLabel("customer")
            .local(lambda t: t.out("placed").count()).toDF()).collect()
    manual = (graph.vertices.filter("label='customer'")
              .join(graph.edges.filter("label='placed'")
                    .selectExpr("src AS id", "dst"), on="id", how="left")
              .groupBy("id")
              .agg(SF.sum(SF.when(SF.col("dst").isNotNull(), 1)
                          .otherwise(0)).alias("n")).collect())
    assert sorted(r.value for r in rows) == sorted(x.n for x in manual)
    assert len(rows) == len(manual)


def test_local_limit_per_traverser(graph):
    from incubator_hugegraph_spark.gremlin import G
    rows = (G(graph).V().hasLabel("region")
            .local(lambda t: t.in_("located_in").limit(2)).toDF()
            ).collect()
    assert len(rows) == 10  # 2 nations per region, not 2 global


def test_local_fold_empty_gives_empty_list(graph):
    from incubator_hugegraph_spark.gremlin import G
    rows = (G(graph).V().hasLabel("region")
            .local(lambda t: t.out("located_in").id_().fold()).toDF()
            ).collect()
    assert len(rows) == 5 and all(r.value == [] for r in rows)


def test_local_text_parser(graph):
    from incubator_hugegraph_spark.gremlin_text import eval_gremlin
    rows = eval_gremlin(
        graph, "g.V().hasLabel('nation')"
               ".local(__.out('located_in').count())").collect()
    assert len(rows) == 25 and all(r.value == 1 for r in rows)
    caps = eval_gremlin(
        graph, "g.V().hasLabel('region').store('s').cap('s')").head()
    assert len(caps.value) == 5


def test_repeat_until_is_do_while(graph):
    """repeat(X).until(P) steps BEFORE the first predicate check
    (TinkerPop until-after = do-while; r03 advice fix): a start
    already satisfying P takes one step — from a region, out() yields
    nothing, so nothing is emitted (the while-do form would emit the
    region itself with zero steps)."""
    from pyspark.sql import functions as SF

    from incubator_hugegraph_spark.gremlin import G
    rows = (G(graph).V("region!0")
            .repeat_until(lambda t: t.out("located_in"),
                          lambda df: SF.col("label") == "region")
            .id_()).df.collect()
    assert rows == []
    # and the normal convergent walk still works
    rows2 = (G(graph).V("nation!0")
             .repeat_until(lambda t: t.out("located_in"),
                           lambda df: SF.col("label") == "region")
             .id_()).df.collect()
    assert len(rows2) == 1 and rows2[0].value.startswith("region!")


# ---- round 4: traversal-predicate filters + elementMap etc. ---------


def test_filter_traversal_predicate(graph):
    n = (G(graph).V().hasLabel("customer")
         .filter_(lambda x: x.out("placed")).count()).head().cnt
    manual = (graph.edges.filter("label='placed'")
              .select("src").distinct().count())
    assert n == manual > 0


def test_not_traversal_predicate(graph):
    ids = sorted((G(graph).V().hasLabel("nation", "region")
                  .not_(lambda x: x.out("located_in"))).toList())
    # only regions lack a located_in out-edge
    assert ids and all(i.startswith("region!") for i in ids)
    assert len(ids) == graph.vertices.filter("label='region'").count()


def test_filter_with_reducer_child(graph):
    """filter(__.outE().count().is(gte(10))) — per-traverser degree
    gate through the local() reducer contract."""
    n = (G(graph).V().hasLabel("customer")
         .filter_(lambda x: x.outE("placed").count().is_(GP.gte(10)))
         .count()).head().cnt
    manual = (graph.edges.filter("label='placed'").groupBy("src").count()
              .filter("count >= 10").count())
    assert n == manual > 0


def test_and_or_combinators(graph):
    base = G(graph).V().hasLabel("customer")
    n_and = base.and_(lambda x: x.out("placed"),
                      lambda x: x.out("in_nation")).count().head().cnt
    n_or = base.or_(lambda x: x.out("placed"),
                    lambda x: x.out("in_nation")).count().head().cnt
    placed = (graph.edges.filter("label='placed'")
              .select("src").distinct())
    innat = (graph.edges.filter("label='in_nation'")
             .select("src").distinct())
    assert n_and == placed.intersect(innat).count()
    assert n_or == placed.union(innat).distinct().count()


def test_element_map(graph):
    rows = (G(graph).V().hasLabel("region").elementMap()).df.collect()
    assert len(rows) == 5
    m = dict(rows[0].value)
    assert m["id"] == rows[0].id and m["label"] == "region" and "name" in m
    # subset form keeps id/label but filters props
    sub = (G(graph).V().hasLabel("customer")
           .elementMap("mktsegment")).df.head()
    assert set(sub.value) == {"id", "label", "mktsegment"}


def test_constant_and_identity(graph):
    t = G(graph).V().hasLabel("region")
    assert t.identity() is t
    vals = [r.value for r in t.constant(7).df.collect()]
    assert vals == [7] * 5


def test_coin_deterministic(graph):
    a = sorted((G(graph).V().hasLabel("customer").coin(0.5)).toList())
    b = sorted((G(graph).V().hasLabel("customer").coin(0.5)).toList())
    assert a == b and 0 < len(a) < 150
    assert (G(graph).V().hasLabel("customer").coin(1.0)
            .count()).head().cnt == 150


def test_text_surface_predicate_steps(graph):
    from incubator_hugegraph_spark.gremlin_text import eval_gremlin
    n = eval_gremlin(
        graph, "g.V().hasLabel('customer')"
               ".filter(__.out('placed')).count()").head().cnt
    manual = (graph.edges.filter("label='placed'")
              .select("src").distinct().count())
    assert n == manual
    n2 = eval_gremlin(
        graph, "g.V().hasLabel('nation','region')"
               ".not(__.out('located_in')).count()").head().cnt
    assert n2 == graph.vertices.filter("label='region'").count()
    r = eval_gremlin(graph,
                     "g.V().hasLabel('region').elementMap('name')")
    assert set(r.head().value) == {"id", "label", "name"}


# ---- round 4: branch().option() --------------------------------------


def test_branch_option_dispatch(graph):
    from incubator_hugegraph_spark.gremlin_text import eval_gremlin
    df = eval_gremlin(
        graph, "g.V().hasLabel('region')"
               ".branch(__.values('name'))"
               ".option('AFRICA', __.values('name'))"
               ".option('ASIA', __.constant('asia!'))"
               ".option(Pick.none, __.constant('other'))")
    vals = sorted(r.value for r in df.collect())
    n_regions = graph.view("region").count()
    assert vals.count("AFRICA") == 1
    assert vals.count("asia!") == 1
    assert vals.count("other") == n_regions - 2


def test_branch_label_selector_with_reducer(graph):
    from incubator_hugegraph_spark.gremlin_text import eval_gremlin
    df = eval_gremlin(
        graph, "g.V().hasLabel('region','nation')"
               ".branch(__.label())"
               ".option('region', __.count())"
               ".option('nation', __.values('name'))")
    vals = [r.value for r in df.collect()]
    assert str(graph.view("region").count()) in vals
    assert len(vals) == graph.view("nation").count() + 1


def test_branch_any_takes_every_traverser(graph):
    from pyspark.sql import functions as F
    from incubator_hugegraph_spark.gremlin import G
    t = G(graph).V().hasLabel("region")._elem()
    out = t.branch(
        lambda df: F.col("props")["name"],
        [("AFRICA", lambda x: x.constant("hit"))],
        any_step=lambda x: x.constant("all"))
    vals = [r.value for r in out.toDF().collect()]
    n = graph.view("region").count()
    assert vals.count("hit") == 1 and vals.count("all") == n


def test_branch_v_kind_union(graph):
    from incubator_hugegraph_spark.gremlin_text import eval_gremlin
    df = eval_gremlin(
        graph, "g.V().hasLabel('nation')"
               ".branch(__.values('name'))"
               ".option('NATION_0', __.out('located_in'))"
               ".option(Pick.none, __.identity())")
    # 24 nations pass through identity; NATION_0 hops to its region
    assert df.count() == graph.view("nation").count()


def test_branch_requires_option(graph):
    from incubator_hugegraph_spark.gremlin_text import eval_gremlin
    with pytest.raises(SyntaxError, match="option"):
        eval_gremlin(graph, "g.V().branch(__.label()).count()")


def test_properties_step_and_key_value(graph):
    t = G(graph)
    rows = (t.V().hasLabel("customer").hasId("customer!0")
            .properties().toDF().collect())
    got = {(r.key, r.value) for r in rows}
    v = graph.view("customer").filter("id = 'customer!0'").head()
    assert ("name", v.name) in got
    assert ("mktsegment", v.mktsegment) in got
    assert len(got) == 3  # name, acctbal, mktsegment
    # key()/value() project the property traverser
    keys = (t.V().hasLabel("nation").properties().key_()
            .toDF().collect())
    assert {r.value for r in keys} == {"name"}
    # selected-key form filters the explode
    sel = (t.V().hasLabel("customer").hasId("customer!0")
           .properties("name").toDF().collect())
    assert len(sel) == 1 and sel[0].key == "name"


def test_map_step_first_per_traverser(graph):
    t = G(graph)
    got = {r.value for r in
           t.V().hasLabel("customer")
           .map_(lambda x: x.out("placed").id_()).toDF().collect()}
    manual = {r.m for r in graph.edges.filter("label='placed'")
              .groupBy("src").agg(F.min("dst").alias("m")).collect()}
    assert got == manual  # first == min under the deterministic order


def test_flatmap_scopes_barriers_per_traverser(graph):
    t = G(graph)
    # flatMap(out().count()) == local(out().count()) — per-customer
    a = sorted(r.value for r in
               t.V().hasLabel("customer")
               .flatMap_(lambda x: x.out("placed").count())
               .toDF().collect())
    b = sorted(r["count"] for r in graph.edges.filter("label='placed'")
               .groupBy("src").count().collect())
    # flatMap emits 0 for order-less customers (CountLocalStep)
    zeros = graph.view("customer").count() - len(b)
    assert a == sorted([0] * zeros + b)


def test_repeat_loops_counter(graph):
    t = G(graph)
    # until(__loops >= 2) == fixed 2-round repeat
    a = sorted(r.id for r in
               t.V("region!0").repeat_until(
                   lambda x: x.in_(),
                   until=lambda df: F.col("__loops") >= 2)
               .toDF().collect())
    b = sorted(r.id for r in
               t.V("region!0").repeat(lambda x: x.in_(), 2)
               .toDF().collect())
    assert a == b and len(a) > 0
    # the body sees __loops: stop expanding after round 1
    c = t.V("region!0").repeat(
        lambda x: x.where(lambda df: F.col("__loops") < 1).in_(), 2)
    n1 = t.V("region!0").in_().toDF().count()
    assert c.toDF().count() == 0 or c.toDF().count() <= n1


def test_properties_text_surface(graph):
    from incubator_hugegraph_spark.gremlin_text import eval_gremlin
    df = eval_gremlin(
        graph, "g.V().hasLabel('nation').properties('name').value()")
    assert df.count() == graph.view("nation").count()
    df2 = eval_gremlin(
        graph, "g.V().hasLabel('customer')"
               ".flatMap(__.out('placed').count())")
    assert df2.count() == graph.view("customer").count()


def test_explain_returns_spark_plan(graph):
    # TinkerPop ExplainTest analogue: the strategy trace here is the
    # Catalyst plan; formatted output must show the parquet scan and
    # the pushed has()-filter
    s = G(graph).V().hasLabel("nation").has(
        "name", GP.gte("B")).explain()
    assert "== Physical Plan ==" in s and "Scan" in s
    ext = G(graph).V().hasLabel("nation").explain("extended")
    assert "== Optimized Logical Plan ==" in ext


def test_profile_metrics_match_count(graph):
    # ProfileTest analogue: executes once, per-operator output rows;
    # the root operator's row count equals the traversal's cardinality
    t = G(graph).V().hasLabel("nation").out("located_in")
    expect = t.toDF().count()
    prof = t.profile()
    rows = prof.orderBy("step").collect()
    assert rows and rows[0].depth == 0
    assert {"operator", "rows", "step", "depth"} <= set(prof.columns)
    got = [r.rows for r in rows if r.rows is not None]
    assert got and expect in got


def test_explain_profile_text_surface(graph):
    from incubator_hugegraph_spark.gremlin_text import eval_gremlin
    s = eval_gremlin(graph, "g.V().hasLabel('part').explain()")
    assert isinstance(s, str) and "Physical Plan" in s
    prof = eval_gremlin(
        graph, "g.V().hasLabel('part').out('composed_of').profile()")
    assert prof.filter(F.col("rows").isNotNull()).count() > 0


def test_order_multi_key(graph):
    # second key breaks ties within the first; desc on the first
    t = (G(graph).V().hasLabel("customer")
         .order_by_specs([("mktsegment", False), ("acctbal", True)])
         .limit(10))
    rows = [r for r in t._elem().df.select(
        F.col("props")["mktsegment"].alias("seg"),
        F.col("props")["acctbal"].cast("double").alias("bal")).collect()]
    segs = [r.seg for r in rows]
    assert segs == sorted(segs, reverse=True)
    for s in set(segs):
        bals = [r.bal for r in rows if r.seg == s]
        assert bals == sorted(bals)


def test_path_by_property(graph):
    got = sorted(r.value for r in
                 G(graph).V().hasLabel("nation").out("located_in")
                 .path_by("name").toDF().collect())
    nv, rv = graph.view("nation"), graph.view("region")
    e = graph.edges.filter("label = 'located_in'")
    expect = sorted(
        r.v for r in
        e.join(nv.select(F.col("id").alias("src"),
                         F.col("name").alias("nn")), on="src")
        .join(rv.select(F.col("id").alias("dst"),
                        F.col("name").alias("rn")), on="dst")
        .select(F.concat_ws(">", "nn", "rn").alias("v")).collect())
    assert got == expect
    # missing property renders as '' (position-preserving)
    miss = G(graph).V().hasLabel("customer").out("placed") \
        .path_by("name").toDF().head().value
    assert miss.endswith(">")  # orders have no 'name' prop


def test_repeat_emit_until(graph):
    # emit().until(): every round's traversers emitted, not just the
    # ones the predicate stops; termination unchanged
    t = G(graph)
    out = t.V("region!0").repeat_until(
        lambda x: x.in_("located_in", "in_nation"),
        until=lambda df: F.col("label") == "customer", emit=True)
    got = sorted(out.id_().toList())
    lvl1 = sorted(t.V("region!0").in_("located_in").id_().toList())
    lvl2 = sorted(t.V("region!0").in_("located_in")
                  .in_("in_nation").id_().toList())
    assert got == sorted(lvl1 + lvl2)
    # without emit only the predicate-stopped traversers come out
    plain = t.V("region!0").repeat_until(
        lambda x: x.in_("located_in", "in_nation"),
        until=lambda df: F.col("label") == "customer")
    assert sorted(plain.id_().toList()) == lvl2
    # text surface: repeat(...).emit().until(...)
    from incubator_hugegraph_spark.gremlin_text import eval_gremlin
    df = eval_gremlin(
        graph, "g.V('region!0')"
               ".repeat(__.in('located_in', 'in_nation'))"
               ".emit().until(__.hasLabel('customer')).id()")
    assert sorted(r.value for r in df.collect()) == got


def test_has_key_has_value_on_properties(graph):
    t = G(graph).V().hasLabel("part").properties()
    keys = set(r.value for r in t.hasKey("size", "brand")
               .key_().toDF().distinct().collect())
    assert keys == {"size", "brand"}
    n45 = t.hasKey("size").hasValue(45).count().head().cnt
    manual = graph.view("part").filter(F.col("size") == 45).count()
    assert n45 == manual
    # text surface
    from incubator_hugegraph_spark.gremlin_text import eval_gremlin
    df = eval_gremlin(
        graph, "g.V().hasLabel('part').properties('size')"
               ".hasValue(45).count()")
    assert df.head().cnt == manual


# ---- round 6 review fixes -------------------------------------------


def test_inv_outv_tinkerpop_semantics(graph):
    """outV is the edge's physical tail, inV its head, regardless of
    traversal direction (review r06: both were aliased to otherV, so
    outE().outV() returned the far vertex)."""
    g = G(graph)
    src = "customer!1"
    back = g.V(src).outE("in_nation").outV().toList()
    assert set(back) == {src}  # outV of my out-edges is me
    far = g.V(src).outE("in_nation").inV().toList()
    assert src not in far and far  # inV is the head (the nation)
    # via inE from the nation side, outV is still the tail (customer)
    n = far[0]
    tails = g.V(n).inE("in_nation").outV().toList()
    assert src in tails and n not in tails


def test_bothe_dedup_canonical_edge_identity(graph):
    """bothE().dedup() collapses each physical edge once — the
    anchor-oriented eid gave one edge two identities (review r06)."""
    g = G(graph)
    src = "customer!1"
    n_edges = graph.edges.filter(
        f"src = '{src}' or dst = '{src}'").count()
    got = g.V(src).bothE().dedup().count().head()[0]
    assert got == n_edges


def test_choose_null_predicate_takes_else(graph):
    """A NULL predicate (missing property) takes the ELSE branch like
    TinkerPop, instead of vanishing from both branches (r06)."""
    from incubator_hugegraph_spark.gremlin import GP
    g = G(graph)
    total = g.V().hasLabel("region").count().head()[0]
    # regions have no 'acctbal' → pred NULL on every row → else
    kept = (G(graph).V().hasLabel("region")
            .choose(lambda df: df["props"]["acctbal"] == "1",
                    lambda t: t.limit(0),
                    lambda t: t)
            .count().head()[0])
    assert kept == total > 0


def test_order_by_then_hop_then_limit(graph):
    """order().by(prop).out().limit(n) — the stale sort spec
    referenced columns the hop dropped and crashed (r06)."""
    g = G(graph)
    rows = (g.V().hasLabel("customer").order_by("name")
            .out("in_nation").limit(3).toList())
    assert len(rows) == 3


def test_properties_barriers(graph):
    """properties() traversers support the generic barriers the
    docstring promises (r06: KeyError/AnalysisException)."""
    g = G(graph)
    two = g.V("customer!1").properties().limit(2).toDF().count()
    assert two == 2
    d = g.V("customer!1").properties().dedup().toDF().count()
    assert d >= 2


def test_text_numeric_seed_and_group_value_by(graph):
    """g.V(<id>) with a non-string seed is a point lookup, not a full
    scan; group().by(label).by('name') collects property VALUES
    (r06: both were silently wrong)."""
    from incubator_hugegraph_spark.gremlin_text import eval_gremlin
    out = eval_gremlin(graph, "g.V('customer!1').out('in_nation')")
    assert out.count() == 1
    grp = eval_gremlin(
        graph, "g.V().hasLabel('region').group().by(T.label).by('name')")
    row = grp.head()
    vals = row[1]
    assert len(vals) == 5 and all(not v.startswith("region!")
                                  for v in vals)


# ---- TinkerPop semantics (r06 semantics review) ----------------------

def test_values_missing_property_emits_nothing(graph):
    """values(k) on elements missing k emits NO traverser (TinkerPop
    PropertiesStep) — counts/means must not see phantom NULLs."""
    from incubator_hugegraph_spark.gremlin import G
    # only customers and suppliers carry acctbal; a V() over
    # everything must count exactly those
    n_with = G(graph).V().hasLabel("customer", "supplier") \
        .count().head().cnt
    n_all = G(graph).V().count().head().cnt
    n_vals = G(graph).V().values("acctbal").count().head().cnt
    assert n_vals == n_with < n_all


def test_empty_stream_reducers_emit_nothing(graph):
    """sum/mean/max/min of an empty value stream emit no traverser."""
    from incubator_hugegraph_spark.gremlin import G
    base = G(graph).V().hasLabel("customer").has(
        "acctbal", GP.gt(1e18)).values("acctbal")
    for red in ("sum_", "mean_", "max_", "min_"):
        assert getattr(base, red)().count() == 0, red
    # count()/fold() keep their defined empty results
    assert G(graph).V().hasLabel("nope").count().head().cnt == 0


def test_coalesce_is_per_traverser(graph):
    """Each traverser takes the FIRST child yielding output FOR IT —
    one satisfied traverser must not silence the others' fallback."""
    from incubator_hugegraph_spark.gremlin import G
    # regions have no out-edges; nations have located_in. A mixed
    # stream must give every element a result.
    t = (G(graph).V().hasLabel("region", "nation")
         .coalesce(lambda x: x.out("located_in").values("name"),
                   lambda x: x.constant("fallback")))
    rows = [r.value for r in t.df.collect()]
    n_nations = G(graph).V().hasLabel("nation").count().head().cnt
    n_regions = G(graph).V().hasLabel("region").count().head().cnt
    assert rows.count("fallback") == n_regions
    assert len(rows) == n_regions + n_nations
    # optional(): unsatisfied traversers pass through unchanged
    opt = (G(graph).V().hasLabel("region")
           .optional(lambda x: x.out("located_in")))
    assert opt.count().head().cnt == n_regions


def test_group_skips_missing_key_elements(graph):
    """group/groupCount by a property skip elements missing it — no
    NULL-key group, count and collect cardinalities consistent."""
    from incubator_hugegraph_spark.gremlin import G
    gc = G(graph).V().groupCount("mktsegment").collect()
    assert all(r.key is not None for r in gc)
    n_cust = G(graph).V().hasLabel("customer").count().head().cnt
    assert sum(r.cnt for r in gc) == n_cust
