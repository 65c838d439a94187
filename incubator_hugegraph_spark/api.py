"""Endpoint registry: reference REST surface → engine callables.

The reference exposes its analytics as ~27 traverser endpoints under
`api/api/traversers/` (SURVEY §2.D) plus the algorithm-job registry
`core/job/algorithm/AlgorithmPool.java:46-75` (§2.E, mirrored by
`algorithms.ALGORITHMS`). This module is the machine-checkable parity
map: every endpoint name resolves to the DataFrame program that
implements it, so "could a reference user switch?" is answerable by
lookup rather than by reading the tree. Tests assert the registry is
total over the SURVEY §2.D inventory.

Names follow the REST paths (`GET/POST …/traversers/<name>`,
`api/api/traversers/<Name>API.java`).
"""

from __future__ import annotations

from incubator_hugegraph_spark.graph import PropertyGraph
from incubator_hugegraph_spark.operators import bfs as _bfs
from incubator_hugegraph_spark.operators import mutate as _mutate
from incubator_hugegraph_spark.operators import neighbors as _nbr
from incubator_hugegraph_spark.operators import paths as _paths
from incubator_hugegraph_spark.operators import rank as _rank
from incubator_hugegraph_spark.operators import similarity as _sim
from incubator_hugegraph_spark.operators import weighted as _weighted

#: REST traverser endpoint → callable (SURVEY §2.D #1-27). Endpoints
#: whose GET and POST forms differ in capability map to the richer
#: callable plus a `<name>:post` entry where the signatures diverge.
TRAVERSERS = {
    "kout": _bfs.kout,                                     # KoutAPI
    "kout:post": _bfs.customized_kout,                     # Steps form
    "kneighbor": _bfs.kneighbor,                           # KneighborAPI
    "kneighbor:post": _bfs.customized_kneighbor,
    "kneighbor:with_path": _bfs.kneighbor_paths,
    "kneighbor:with_edge": _bfs.kneighbor_edges,
    "shortestpath": _paths.shortest_path,                  # ShortestPathAPI
    "allshortestpaths": _paths.all_shortest_paths,
    "singlesourceshortestpath": _weighted.sssp,
    "weightedshortestpath": _weighted.weighted_shortest_path,
    "multinodeshortestpath": _paths.multi_node_shortest_path,
    "paths": _paths.paths,                                 # PathsAPI
    "paths:post": _paths.collection_paths,                 # advanced form
    "templatepaths": _paths.template_paths,
    "customizedpaths": _paths.customized_paths,
    "customizedcrosspoints": _paths.customized_crosspoints,
    "crosspoints": _paths.crosspoints,
    "rays": _paths.rays,
    "rings": _paths.rings,
    "sameneighbors": _nbr.same_neighbors,
    "sameneighbors:post": _nbr.same_neighbors_multi,  # vertex_list form
    "jaccardsimilarity": _nbr.jaccard_similarity,          # pair mode
    "jaccardsimilarity:post": _sim.jaccard_top,            # top-N mode
    "fusiformsimilarity": _sim.fusiform_similarity,
    "adamicadar": _nbr.adamic_adar,
    "resourceallocation": _nbr.resource_allocation,
    "neighborrank": _rank.neighbor_rank,
    "personalrank": _rank.personal_rank,
    "count": _nbr.count_steps,
    "edgeexist": _nbr.edge_exists,
    "vertices": PropertyGraph.vertices_by_ids,             # VerticesAPI
    "edges": PropertyGraph.edges_by_ids,                   # EdgesAPI
    "vertices/shards": _mutate.shards,
    "vertices/scan": _mutate.scan_shard,
    "edges/shards": _mutate.shards,
    "edges/scan": _mutate.scan_shard,
}


def traverser(name: str):
    """Resolve a reference REST endpoint name to its implementation."""
    try:
        return TRAVERSERS[name]
    except KeyError:
        raise KeyError(
            f"unknown traverser endpoint {name!r}; known: "
            f"{sorted(TRAVERSERS)}") from None
