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
