"""OLAP whole-graph algorithms (SURVEY §2.E): the reference's async
job algorithms (core/job/algorithm/AlgorithmPool.java:46-75)
re-expressed as native Spark jobs. Iterative ones use the
DataFrame-Pregel pattern: join messages on edges → groupBy(dst).agg →
update state, with checkpoint hygiene every few rounds.

Registry mirrors AlgorithmPool: ALGORITHMS[name] -> callable.
"""

from incubator_hugegraph_spark.algorithms.centrality import (
    betweenness_centrality,
    closeness_centrality,
    degree_centrality,
    eigenvector_centrality,
    hits,
    stress_centrality,
)
from incubator_hugegraph_spark.algorithms.community import (
    cluster_coefficient,
    k_core,
    k_truss,
    louvain,
    lpa,
    triangle_count,
    triangles_per_vertex,
)
from incubator_hugegraph_spark.algorithms.pagerank import page_rank
from incubator_hugegraph_spark.algorithms.stats import (
    count_edge,
    count_vertex,
    degree_assortativity,
    reciprocity,
    subgraph_stat,
)
from incubator_hugegraph_spark.algorithms.wcc import wcc, wcc_star

# AlgorithmPool.java:46-75 registry equivalent
ALGORITHMS = {
    "count_vertex": count_vertex,
    "count_edge": count_edge,
    "degree_centrality": degree_centrality,
    "closeness_centrality": closeness_centrality,
    "betweenness_centrality": betweenness_centrality,
    "eigenvector_centrality": eigenvector_centrality,
    "triangle_count": triangle_count,
    "cluster_coefficient": cluster_coefficient,
    "k_core": k_core,
    "lpa": lpa,
    "louvain": louvain,
    "page_rank": page_rank,
    "weak_connected_component": wcc,
    # beyond-reference scale variant (same result, diameter-independent)
    "weak_connected_component_star": wcc_star,
    "subgraph_stat": subgraph_stat,
    "stress_centrality": stress_centrality,
    # beyond-reference OLAP extras — the registry IS the job-API
    # dispatch surface (rest.execute_algorithm), so everything the
    # package implements must be reachable through it (review r06:
    # these were importable but not dispatchable)
    "hits": hits,
    "k_truss": k_truss,
    "triangles_per_vertex": triangles_per_vertex,
    "degree_assortativity": degree_assortativity,
    "reciprocity": reciprocity,
}


def _lazy(name: str):
    # path-module algorithms imported lazily to avoid a cycle
    # (operators.paths imports graph which algorithms also use)
    def run(graph, *a, **kw):
        if name == "rings":
            from incubator_hugegraph_spark.operators.paths import (
                rings_detect)
            return rings_detect(graph, *a, **kw)
        from incubator_hugegraph_spark.operators.similarity import (
            fusiform_similarity)
        return fusiform_similarity(graph, *a, **kw)
    return run


# remaining AlgorithmPool.java:46-75 names, implemented in operators/
ALGORITHMS["rings"] = _lazy("rings")
ALGORITHMS["fusiform_similarity"] = _lazy("fusiform_similarity")
