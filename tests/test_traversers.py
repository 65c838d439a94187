"""M2: BFS kernel + neighborhood traversers (semantics at sf0.001;
value-level correctness is the DuckDB oracle gate)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from incubator_hugegraph_spark.graph import BOTH, OUT
from incubator_hugegraph_spark.operators.bfs import bfs, kneighbor, kout
from incubator_hugegraph_spark.operators.neighbors import (
    count_steps,
    edge_exists,
    jaccard_similarity,
    same_neighbors,
)

SRC = "customer!1"


def test_bfs_layers_disjoint(graph):
    vis = bfs(graph, [SRC], 3, direction=OUT)
    per = vis.groupBy("id").count().agg(F.max("count")).collect()[0][0]
    assert per == 1  # nearest semantics: one dist per vertex
    assert vis.filter(F.col("dist") == 0).collect()[0]["id"] == SRC


def test_kout_subset_of_kneighbor(graph):
    ko = {r["id"] for r in kout(graph, SRC, 2, direction=BOTH).collect()}
    kn = {r["id"] for r in kneighbor(graph, SRC, 2, direction=BOTH).collect()}
    assert ko <= kn
    assert SRC not in kn


def test_kout_nearest_vs_not(graph):
    near = {r["id"] for r in
            kout(graph, SRC, 2, direction=OUT, nearest=True).collect()}
    raw = {r["id"] for r in
           kout(graph, SRC, 2, direction=OUT, nearest=False).collect()}
    assert near <= raw  # non-nearest may re-reach depth-1 vertices


def test_kout_limit_and_degree(graph):
    few = kout(graph, SRC, 2, direction=BOTH, limit=5)
    assert few.count() == 5
    capped = kout(graph, SRC, 2, direction=BOTH, max_degree=2)
    assert capped.count() <= kout(graph, SRC, 2, direction=BOTH).count()


def test_capacity_guard(graph):
    with pytest.raises(Exception, match="apacity"):
        bfs(graph, [SRC], 3, direction=BOTH, capacity=5).count()


def test_same_neighbors_symmetric(graph):
    ab = {r["id"] for r in
          same_neighbors(graph, "customer!1", "customer!2").collect()}
    ba = {r["id"] for r in
          same_neighbors(graph, "customer!2", "customer!1").collect()}
    assert ab == ba


def test_jaccard_bounds(graph):
    v = jaccard_similarity(graph, "customer!1", "customer!2").collect()[0][0]
    assert 0.0 <= v <= 1.0
    self_sim = jaccard_similarity(graph, "customer!1", "customer!1").collect()[0][0]
    assert self_sim == 1.0


def test_edge_exists(graph):
    assert edge_exists(graph, "customer!1", "nation!1000").count() == 0
    # every customer has an in_nation edge
    row = graph.view("customer").filter(F.col("id") == SRC).collect()
    assert row, "fixture has customer!1"


def test_count_steps_multiset_vs_dedup(graph):
    multi = count_steps(graph, SRC, [{"direction": OUT, "labels": ["placed"]},
                                     {"direction": OUT, "labels": ["contains"]}]
                        ).collect()[0][0]
    dedup = count_steps(graph, SRC, [{"direction": OUT, "labels": ["placed"]},
                                     {"direction": OUT, "labels": ["contains"]}],
                        dedup=True).collect()[0][0]
    assert dedup <= multi
