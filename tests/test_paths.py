"""M3: path-family semantics (value-level correctness is the oracle gate)."""

from __future__ import annotations

from pyspark.sql import functions as F

from incubator_hugegraph_spark.graph import OUT
from incubator_hugegraph_spark.operators.paths import (
    all_shortest_paths,
    paths,
    rings,
    shortest_path,
)
from incubator_hugegraph_spark.operators.weighted import sssp


def test_shortest_path_is_min_of_all(graph):
    allp = paths(graph, "customer!1", "nation!1", 3, direction=OUT).collect()
    sp = shortest_path(graph, "customer!1", "nation!1", 3,
                       direction=OUT).collect()
    if allp:
        min_len = min(r["length"] for r in allp)
        assert sp[0]["length"] == min_len
        assert sp[0]["path"] == min(r["path"] for r in allp
                                    if r["length"] == min_len)
    else:
        assert not sp


def test_all_shortest_same_length(graph):
    rows = all_shortest_paths(graph, "customer!1", "part!0", 3,
                              direction=OUT).collect()
    assert len({r["length"] for r in rows}) <= 1


def test_paths_are_simple(graph):
    for r in paths(graph, "customer!1", "customer!3", 3, direction=OUT,
                   labels=["interacted"]).collect():
        nodes = r["path"].split(">")
        assert len(nodes) == len(set(nodes))


def test_rings_close_at_source(graph):
    rows = rings(graph, "customer!1", 3, direction=OUT,
                 labels=["interacted"]).limit(50).collect()
    for r in rows:
        nodes = r["path"].split(">")
        assert nodes[0] == nodes[-1] == "customer!1"
        assert len(set(nodes[:-1])) == len(nodes) - 1  # simple interior


def test_sssp_fixpoint_vs_fixed_rounds(graph):
    we = graph.view("interacted").select(
        "src", "dst", F.col("value").alias("weight"))
    d_fix = {r["id"]: r["dist"]
             for r in sssp(graph, "customer!1", we).collect()}
    d_4 = {r["id"]: r["dist"]
           for r in sssp(graph, "customer!1", we, rounds=4).collect()}
    # fixed-round distances are upper bounds of the fixpoint
    for k, v in d_4.items():
        assert d_fix[k] <= v + 1e-9
    assert d_fix["customer!1"] == 0.0


def test_crosspoints_meet_semantics(graph):
    from incubator_hugegraph_spark.operators.paths import crosspoints
    rows = crosspoints(graph, "customer!1", "customer!2", 2,
                       direction=OUT).collect()
    for r in rows:
        nodes = r["path"].split(">")
        assert nodes[0] == "customer!1" and nodes[-1] == "customer!2"
        assert r["crosspoint"] in nodes
        assert len(nodes) == len(set(nodes))  # combined path simple
        assert r["length"] == len(nodes) - 1 <= 2


def test_customized_paths_weights(graph):
    from incubator_hugegraph_spark.operators.paths import customized_paths
    rows = customized_paths(
        graph, ["customer!1"],
        steps=[{"direction": OUT, "labels": ["interacted"],
                "default_weight": 2.0},
               {"direction": OUT, "labels": ["placed"],
                "default_weight": 0.5}],
        sorted_by_weight=True).collect()
    for r in rows:
        assert abs(r["weight"] - 2.5) < 1e-9  # both default weights
        assert len(r["path"].split(">")) == 3
    weights = [r["weight"] for r in rows]
    assert weights == sorted(weights, reverse=True)


def test_customized_paths_sample_caps_fanout(graph):
    from incubator_hugegraph_spark.operators.paths import customized_paths
    capped = customized_paths(
        graph, ["customer!1"],
        steps=[{"direction": OUT, "labels": ["interacted"], "sample": 2}])
    assert capped.count() <= 2


def test_customized_crosspoints_reaches_all(graph):
    from incubator_hugegraph_spark.operators.paths import (
        customized_crosspoints)
    got = customized_crosspoints(
        graph, ["customer!1", "customer!2"],
        patterns=[[{"direction": OUT, "labels": ["in_nation"]}]]).collect()
    # a crosspoint must be the nation of BOTH customers
    nations = {r["crosspoint"] for r in got}
    n1 = {r["dst"] for r in graph.edges
          .filter("src = 'customer!1' and label = 'in_nation'").collect()}
    n2 = {r["dst"] for r in graph.edges
          .filter("src = 'customer!2' and label = 'in_nation'").collect()}
    assert nations == (n1 & n2)


def test_kneighbor_paths_are_consistent(graph):
    from incubator_hugegraph_spark.operators.bfs import (
        kneighbor, kneighbor_paths)
    with_paths = kneighbor_paths(graph, "customer!1", 2,
                                 direction=OUT).collect()
    plain = kneighbor(graph, "customer!1", 2, direction=OUT).collect()
    assert {r["id"] for r in with_paths} == {r["id"] for r in plain}
    for r in with_paths:
        nodes = r["path"].split(">")
        assert nodes[0] == "customer!1" and nodes[-1] == r["id"]
        assert len(nodes) - 1 == r["dist"]


def test_stress_centrality_nonneg(graph):
    from incubator_hugegraph_spark.algorithms.centrality import (
        stress_centrality)
    rows = stress_centrality(graph, ["customer!1", "customer!2"], 3,
                             direction=OUT,
                             labels=["interacted"]).collect()
    assert all(r["stress"] >= 0 for r in rows)
    assert all(r["id"] not in ("customer!1", "customer!2") for r in rows)


def test_collection_paths_endpoints(graph):
    from incubator_hugegraph_spark.operators.paths import collection_paths
    rows = collection_paths(graph, ["customer!1"], ["customer!3"], 2,
                            direction=OUT, labels=["interacted"]).collect()
    for r in rows:
        nodes = r["path"].split(">")
        assert nodes[0] == r["source"] == "customer!1"
        assert nodes[-1] == r["target"] == "customer!3"
        assert len(nodes) == len(set(nodes))
    near = collection_paths(graph, ["customer!1"], ["customer!3"], 2,
                            direction=OUT, labels=["interacted"],
                            nearest=True).collect()
    assert len(near) <= 1  # one pair → at most one nearest path


def test_rings_detect_canonical(graph):
    from incubator_hugegraph_spark.operators.paths import rings_detect
    rows = rings_detect(graph, 3, direction=OUT,
                        labels=["interacted"]).limit(100).collect()
    for r in rows:
        nodes = r["path"].split(">")
        assert nodes[0] == nodes[-1] == min(nodes)  # anchored at min
        assert len(set(nodes[:-1])) == len(nodes) - 1
        assert r["length"] == len(nodes) - 1 <= 3


def test_ram_sssp_matches_distributed(graph):
    """Bellman-Ford kernel equals the distributed relaxation loop —
    per-round states, the fixpoint, and min-id parents."""
    from incubator_hugegraph_spark.operators.weighted import (sssp,
                                                              weighted_adj)
    we = weighted_adj(graph, "value", direction="BOTH",
                      labels=["interacted"])
    for kw in [dict(rounds=2), dict(rounds=4), dict(rounds=-1),
               dict(rounds=-1, with_parent=True)]:
        a = sssp(graph, "customer!1", we, engine="dist", **kw)
        b = sssp(graph, "customer!1", we, engine="ram", **kw)
        cols = [c for c in a.columns if c != "id"]
        j = (a.select("id", *[F.col(c).alias(c + "_1") for c in cols])
             .join(b.select("id", *[F.col(c).alias(c + "_2")
                                    for c in cols]),
                   on="id", how="full"))
        for c in cols:
            bad = j.filter(F.coalesce(F.col(c + "_1").cast("string"),
                                      F.lit("∅"))
                           != F.coalesce(F.col(c + "_2").cast("string"),
                                         F.lit("∅")))
            assert bad.count() == 0, (kw, c, bad.collect()[:3])


def test_ram_shortest_paths_match_distributed(graph):
    from incubator_hugegraph_spark.operators.paths import (
        all_shortest_paths, shortest_path)
    cases = [("customer!1", "part!491", 3, "OUT"),
             ("customer!1", "customer!7", 3, "BOTH"),
             ("customer!1", "missing!9", 3, "OUT"),
             ("customer!1", "nation!0", 2, "OUT")]
    for s, t, d, direction in cases:
        for fn in (shortest_path, all_shortest_paths):
            a = sorted((r.path, r.length) for r in
                       fn(graph, s, t, d, direction=direction,
                          engine="dist").collect())
            b = sorted((r.path, r.length) for r in
                       fn(graph, s, t, d, direction=direction,
                          engine="ram").collect())
            assert a == b, (fn.__name__, s, t, d, direction)


def test_ram_paths_matches_distributed(graph):
    from incubator_hugegraph_spark.operators.paths import paths
    cases = [("customer!1", "part!491", 3, "OUT", {}),
             ("customer!1", "customer!7", 3, "BOTH",
              dict(labels=["interacted"])),
             ("customer!1", "customer!7", 3, "BOTH",
              dict(labels=["interacted"], limit=5)),
             ("customer!1", "missing!2", 2, "OUT", {})]
    for s, t, d, direction, kw in cases:
        a = sorted((r.path, r.length) for r in paths(
            graph, s, t, d, direction=direction, engine="dist",
            **kw).collect())
        b = sorted((r.path, r.length) for r in paths(
            graph, s, t, d, direction=direction, engine="ram",
            **kw).collect())
        assert a == b, (s, t, d, direction, kw)


def test_ram_template_paths_matches_distributed(graph):
    from incubator_hugegraph_spark.operators.paths import template_paths
    nations = [f"nation!{i}" for i in range(25)]
    cases = [
        (["customer!1"], nations,
         [{"direction": "OUT", "labels": ["interacted"], "max_times": 2},
          {"direction": "OUT", "labels": ["in_nation"], "max_times": 1}],
         {}),
        (["customer!1", "customer!2"], ["part!1", "part!2", "part!3"],
         [{"direction": "OUT", "labels": ["placed"], "max_times": 1},
          {"direction": "OUT", "labels": ["contains"], "max_times": 1}],
         dict(limit=7)),
    ]
    for sources, targets, steps, kw in cases:
        a = sorted((r.path, r.length) for r in template_paths(
            graph, sources, targets, steps, engine="dist",
            **kw).collect())
        b = sorted((r.path, r.length) for r in template_paths(
            graph, sources, targets, steps, engine="ram",
            **kw).collect())
        assert a == b, (sources, steps, kw)


def test_ram_rays_rings_match_distributed(graph):
    from incubator_hugegraph_spark.operators.paths import rays, rings
    for fn, cases in [
        (rays, [("customer!1", 3, "OUT", ["placed", "contains"], {}),
                ("customer!1", 2, "BOTH", ["interacted"], {}),
                ("customer!1", 3, "OUT", ["interacted"],
                 dict(limit=10))]),
        (rings, [("customer!1", 3, "OUT", ["interacted"], {}),
                 ("customer!1", 3, "BOTH", ["interacted"], {}),
                 ("customer!1", 4, "OUT", ["interacted"],
                  dict(limit=20))]),
    ]:
        for s, d, direction, labels, kw in cases:
            a = sorted((r.path, r.length) for r in fn(
                graph, s, d, direction=direction, labels=labels,
                engine="dist", **kw).collect())
            b = sorted((r.path, r.length) for r in fn(
                graph, s, d, direction=direction, labels=labels,
                engine="ram", **kw).collect())
            assert a == b, (fn.__name__, s, d, direction, labels, kw)



def test_ram_crosspoints_family_matches_distributed(graph):
    from incubator_hugegraph_spark.operators.paths import (
        collection_paths, crosspoints, customized_crosspoints,
        customized_paths)
    # crosspoints pair mode, both directions
    for d, direction in [(2, "OUT"), (3, "BOTH")]:
        a = sorted(map(tuple, crosspoints(
            graph, "customer!1", "customer!2", d, direction=direction,
            labels=["interacted"], engine="dist").collect()))
        b = sorted(map(tuple, crosspoints(
            graph, "customer!1", "customer!2", d, direction=direction,
            labels=["interacted"], engine="ram").collect()))
        assert a == b, (d, direction)
    # weighted sampled customizedpaths
    steps = [{"direction": "OUT", "labels": ["interacted"],
              "weight_by": "value", "default_weight": 1.0, "sample": 3},
             {"direction": "OUT", "labels": ["placed"],
              "default_weight": 0.5}]
    for kw in [dict(sorted_by_weight=True, limit=10), dict()]:
        a = sorted(map(tuple, customized_paths(
            graph, ["customer!1", "customer!2"], steps, engine="dist",
            **kw).collect()))
        b = sorted(map(tuple, customized_paths(
            graph, ["customer!1", "customer!2"], steps, engine="ram",
            **kw).collect()))
        assert a == b, kw
    # pattern crosspoints incl. an unreachable source → empty
    pats = [[{"direction": "OUT", "labels": ["in_nation"]}],
            [{"direction": "OUT", "labels": ["interacted"]},
             {"direction": "OUT", "labels": ["in_nation"]}]]
    for srcs in [["customer!1", "customer!2", "customer!3"],
                 ["customer!1", "missing!0"]]:
        a = sorted(r.crosspoint for r in customized_crosspoints(
            graph, srcs, pats, engine="dist").collect())
        b = sorted(r.crosspoint for r in customized_crosspoints(
            graph, srcs, pats, engine="ram").collect())
        assert a == b, srcs
    # collection paths incl. nearest mode
    for kw in [dict(), dict(nearest=True), dict(limit=9)]:
        a = sorted(map(tuple, collection_paths(
            graph, ["customer!1", "customer!2"],
            ["customer!3", "customer!4"], 2, direction="OUT",
            labels=["interacted"], engine="dist", **kw).collect()))
        b = sorted(map(tuple, collection_paths(
            graph, ["customer!1", "customer!2"],
            ["customer!3", "customer!4"], 2, direction="OUT",
            labels=["interacted"], engine="ram", **kw).collect()))
        assert a == b, kw


def test_ram_kneighbor_paths_and_rings_detect_match(graph):
    from incubator_hugegraph_spark.operators.bfs import kneighbor_paths
    from incubator_hugegraph_spark.operators.paths import rings_detect
    for kw in [dict(direction="OUT"), dict(direction="BOTH", limit=40)]:
        a = sorted(map(tuple, kneighbor_paths(
            graph, "customer!1", 2, engine="dist", **kw).collect()))
        b = sorted(map(tuple, kneighbor_paths(
            graph, "customer!1", 2, engine="ram", **kw).collect()))
        assert a == b, kw
    a = sorted(map(tuple, rings_detect(
        graph, 3, direction="OUT", labels=["interacted"],
        engine="dist").collect()))
    b = sorted(map(tuple, rings_detect(
        graph, 3, direction="OUT", labels=["interacted"],
        engine="ram").collect()))
    assert a == b
