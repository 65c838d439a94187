"""REST request adapter: execute reference-shaped requests verbatim.

The registry in ``api.py`` answers "which DataFrame program implements
endpoint X"; this module answers "can the reference's actual request
PAYLOADS run unchanged". ``execute(graph, endpoint, request)`` accepts
the literal query-parameter / JSON-body shapes of the reference's
traverser REST API (`api/api/traversers/*API.java` request classes —
same parameter names, same defaults from
`HugeTraverser.java:84-92`: max_degree 10000, capacity 10,000,000,
elements limit 10,000,000, paths limit 10) and dispatches to the
engine. Ids may arrive JSON-quoted (the REST layer's
`HugeVertex.getIdValue` parses them) — quotes are stripped.

Tests feed request bodies copied verbatim from the reference's API
tests (`test/api/traversers/*ApiTest.java`) through this adapter and
assert the reference's expected outputs.
"""

from __future__ import annotations

import json
import re

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from incubator_hugegraph_spark.graph import BOTH, NO_LIMIT, OUT, PropertyGraph

# HugeTraverser.java:84-92
DEFAULT_MAX_DEGREE = 10_000
DEFAULT_CAPACITY = 10_000_000
DEFAULT_ELEMENTS_LIMIT = 10_000_000
DEFAULT_PATHS_LIMIT = 10
DEFAULT_LIMIT = 100


def _id(v) -> str:
    """Parse a REST id value: plain string or JSON-quoted string."""
    if isinstance(v, str) and len(v) >= 2 and v[0] == '"' and v[-1] == '"':
        return json.loads(v)
    return str(v)


def _labels(req: dict) -> list[str] | None:
    lab = req.get("label") or req.get("labels")
    if lab is None or lab == []:
        return None
    return [lab] if isinstance(lab, str) else list(lab)


_P_OPS = {"eq": "eq", "gt": "gt", "gte": "gte", "lt": "lt", "lte": "lte"}


def _pred(v):
    """Parse a step property filter value: the reference accepts
    literals (equality) or TraversalUtil predicate strings like
    "P.gt(0.1)" (api/traversers/… properties maps)."""
    if isinstance(v, str) and v.startswith("P."):
        op, _, rest = v[2:].partition("(")
        if op not in _P_OPS or not rest.endswith(")"):
            raise NotImplementedError(f"predicate {v!r}")
        arg = rest[:-1]
        try:
            num = float(arg)
        except ValueError:
            num = json.loads(arg) if arg.startswith('"') else arg
        return (_P_OPS[op], num)
    return ("eq", v)


def _vsel(graph: PropertyGraph, sel: dict) -> list[str]:
    """Resolve a reference `Vertices` selector ({ids} or
    {label, properties}) to an id list. Selector result sets are
    request-sized (the reference materializes them on the server the
    same way: TraverserAPI.vertices)."""
    if sel.get("ids"):
        return [_id(i) for i in sel["ids"]]
    from pyspark.sql import functions as F
    v = graph.vertices
    if sel.get("label"):
        v = v.filter(F.col("label") == sel["label"])
    for k, val in (sel.get("properties") or {}).items():
        v = v.filter(F.element_at(F.col("props"), F.lit(k)) == str(val))
    return [r.id for r in v.select("id").collect()]


def _steps_spec(spec: dict, max_depth: int) -> list[dict]:
    """Translate the newer `Steps` POST shape (direction +
    edge_steps[{label, properties}] + max_degree/skip_degree, applied
    at EVERY level up to max_depth — KoutAPI/KneighborAPI Request) to
    the engine's per-level step dicts."""
    es = spec.get("edge_steps") or []
    props_sets = [{k: _pred(v) for k, v in (s.get("properties") or {}).items()}
                  for s in es]
    if props_sets and any(p != props_sets[0] for p in props_sets[1:]):
        raise NotImplementedError(
            "per-edge-label differing property filters in one Steps spec")
    st = {
        "direction": (spec.get("direction") or BOTH).upper(),
        "labels": [s["label"] for s in es] or None,
        "max_degree": int(spec.get("max_degree", DEFAULT_MAX_DEGREE)),
        "skip_degree": int(spec.get("skip_degree", 0)) or NO_LIMIT,
    }
    if st["max_degree"] == -1:
        st["max_degree"] = NO_LIMIT
    if props_sets and props_sets[0]:
        st["props"] = props_sets[0]
    vs = spec.get("vertex_steps") or []
    if vs:
        st["vertex_filters"] = {
            s["label"]: {k: _pred(v)
                         for k, v in (s.get("properties") or {}).items()}
            for s in vs}
    return [dict(st) for _ in range(max_depth)]


def _dir(req: dict, default: str = BOTH) -> str:
    return (req.get("direction") or default).upper()


def _deg(req: dict) -> int:
    d = int(req.get("max_degree", req.get("degree", DEFAULT_MAX_DEGREE)))
    return NO_LIMIT if d == -1 else d


def _step(st: dict) -> dict:
    """Normalize a reference Step/EdgeStep JSON object to the engine's
    step dict (direction/labels/max_degree/skip_degree/props/top)."""
    out = {
        # CountAPI.Step documents BOTH as the default; the other APIs'
        # Step classes require an explicit direction (null would NPE
        # server-side), so BOTH is the only observable default
        "direction": (st.get("direction") or BOTH).upper(),
        "labels": _labels(st),
        "max_degree": int(st.get("max_degree",
                                 st.get("degree", DEFAULT_MAX_DEGREE))),
        "skip_degree": int(st.get("skip_degree", 0)) or NO_LIMIT,
    }
    if out["max_degree"] == -1:
        out["max_degree"] = NO_LIMIT
    if st.get("properties"):
        out["props"] = {k: _pred(v) for k, v in st["properties"].items()}
    if "top" in st:
        out["top"] = int(st["top"])
    if "max_times" in st:
        out["max_times"] = int(st["max_times"])
    return out


def _count_only(df: DataFrame) -> DataFrame:
    """count_only=true response shape ({"size": N} — KoutAPI:198-222):
    the element count instead of the elements."""
    from pyspark.sql import functions as F
    return df.agg(F.count(F.lit(1)).cast("bigint").alias("size"))


def _exec_kout(graph, req):
    from incubator_hugegraph_spark.operators.bfs import (customized_kout,
                                                         kout)
    if "steps" in req:  # POST form (KoutAPI Request: Steps + max_depth)
        reps = _steps_spec(req["steps"], int(req["max_depth"]))
        out = customized_kout(graph, _id(req["source"]), reps,
                              nearest=bool(req.get("nearest", True)),
                              limit=int(req.get("limit",
                                                DEFAULT_ELEMENTS_LIMIT)))
    else:
        if req.get("with_path"):
            # KoutAPI POST with_path (KoutAPI.java Request.withPath):
            # the exactly-depth layer with one min-lex path each —
            # the ≤depth path table filtered to the last layer
            # (nearest=true only: non-nearest kout revisits earlier
            # layers, which the single-path record cannot express)
            if not req.get("nearest", True):
                raise ValueError("with_path requires nearest=true")
            from incubator_hugegraph_spark.operators.bfs import (
                kneighbor_paths)
            return kneighbor_paths(
                graph, _id(req["source"]), int(req["max_depth"]),
                direction=_dir(req), labels=_labels(req),
                max_degree=_deg(req)) \
                .filter(F.col("dist") == int(req["max_depth"]))
        out = kout(graph, _id(req["source"]), int(req["max_depth"]),
                   direction=_dir(req), labels=_labels(req),
                   nearest=bool(req.get("nearest", True)),
                   max_degree=_deg(req),
                   capacity=int(req.get("capacity", DEFAULT_CAPACITY)),
                   limit=int(req.get("limit", DEFAULT_ELEMENTS_LIMIT)))
    return _count_only(out) if req.get("count_only") else out


def _exec_kneighbor(graph, req):
    from incubator_hugegraph_spark.operators.bfs import (
        customized_kneighbor, kneighbor)
    if "steps" in req:  # POST form (KneighborAPI Request)
        reps = _steps_spec(req["steps"], int(req["max_depth"]))
        out = customized_kneighbor(
            graph, _id(req["source"]), reps,
            limit=int(req.get("limit", DEFAULT_ELEMENTS_LIMIT)))
    else:
        if req.get("with_path"):
            from incubator_hugegraph_spark.operators.bfs import (
                kneighbor_paths)
            return kneighbor_paths(
                graph, _id(req["source"]), int(req["max_depth"]),
                direction=_dir(req), labels=_labels(req),
                max_degree=_deg(req),
                limit=int(req.get("limit", DEFAULT_ELEMENTS_LIMIT)))
        if req.get("with_edge"):
            from incubator_hugegraph_spark.operators.bfs import (
                kneighbor_edges)
            return kneighbor_edges(
                graph, _id(req["source"]), int(req["max_depth"]),
                direction=_dir(req), labels=_labels(req),
                max_degree=_deg(req))
        out = kneighbor(graph, _id(req["source"]), int(req["max_depth"]),
                        direction=_dir(req), labels=_labels(req),
                        max_degree=_deg(req),
                        limit=int(req.get("limit", DEFAULT_ELEMENTS_LIMIT)))
    return _count_only(out) if req.get("count_only") else out


def _exec_shortestpath(graph, req):
    from incubator_hugegraph_spark.operators.paths import shortest_path
    return shortest_path(graph, _id(req["source"]), _id(req["target"]),
                         int(req["max_depth"]), direction=_dir(req),
                         labels=_labels(req), max_degree=_deg(req),
                         skip_degree=int(req.get("skip_degree", 0))
                         or NO_LIMIT)


def _exec_allshortestpaths(graph, req):
    from incubator_hugegraph_spark.operators.paths import all_shortest_paths
    return all_shortest_paths(graph, _id(req["source"]), _id(req["target"]),
                              int(req["max_depth"]), direction=_dir(req),
                              labels=_labels(req), max_degree=_deg(req))


def _weighted(graph, req):
    from incubator_hugegraph_spark.operators.weighted import weighted_adj
    return weighted_adj(graph, req["weight"], direction=_dir(req),
                        labels=_labels(req))


def _exec_sssp(graph, req):
    from incubator_hugegraph_spark.graph import NO_LIMIT
    from incubator_hugegraph_spark.operators.weighted import sssp
    out = sssp(graph, _id(req["source"]), _weighted(graph, req))
    limit = int(req.get("limit", DEFAULT_ELEMENTS_LIMIT))
    out = out.orderBy("dist", "id")
    # the reference's NO_LIMIT (-1) means "all rows" — every other
    # executor honors it; an unguarded .limit(-1) raises (review r06)
    return out if limit == NO_LIMIT else out.limit(limit)


def _exec_weightedshortestpath(graph, req):
    from incubator_hugegraph_spark.operators.weighted import (
        weighted_shortest_path)
    return weighted_shortest_path(graph, _id(req["source"]),
                                  _id(req["target"]),
                                  _weighted(graph, req))


def _exec_multinodeshortestpath(graph, req):
    from incubator_hugegraph_spark.operators.paths import (
        multi_node_shortest_path)
    ids = _vsel(graph, req["vertices"])
    st = _step(req.get("step", {}))
    return multi_node_shortest_path(graph, ids, int(req["max_depth"]),
                                    direction=st["direction"],
                                    labels=st["labels"],
                                    max_degree=st["max_degree"])


def _exec_paths(graph, req):
    from incubator_hugegraph_spark.operators.paths import (collection_paths,
                                                           paths)
    if "sources" in req:  # POST advanced form (PathsAPI Request)
        st = _step(req.get("step", {}))
        return collection_paths(
            graph, _vsel(graph, req["sources"]),
            _vsel(graph, req["targets"]),
            int(req["max_depth"]), direction=st["direction"],
            labels=st["labels"], max_degree=st["max_degree"],
            nearest=bool(req.get("nearest", False)),
            limit=int(req.get("limit", DEFAULT_PATHS_LIMIT)))
    return paths(graph, _id(req["source"]), _id(req["target"]),
                 int(req["max_depth"]), direction=_dir(req),
                 labels=_labels(req), max_degree=_deg(req),
                 limit=int(req.get("limit", DEFAULT_PATHS_LIMIT)))


def _exec_crosspoints(graph, req):
    from incubator_hugegraph_spark.operators.paths import crosspoints
    return crosspoints(graph, _id(req["source"]), _id(req["target"]),
                       int(req["max_depth"]), direction=_dir(req, OUT),
                       labels=_labels(req), max_degree=_deg(req),
                       limit=int(req.get("limit", DEFAULT_PATHS_LIMIT)))


def _exec_rays(graph, req):
    from incubator_hugegraph_spark.operators.paths import rays
    return rays(graph, _id(req["source"]), int(req["max_depth"]),
                direction=_dir(req, OUT), labels=_labels(req),
                max_degree=_deg(req),
                limit=int(req.get("limit", DEFAULT_PATHS_LIMIT)))


def _exec_rings(graph, req):
    from incubator_hugegraph_spark.operators.paths import rings
    if not bool(req.get("source_in_ring", True)):
        raise NotImplementedError(
            "source_in_ring=false (rings anywhere on the walk) is not "
            "implemented; the default true mode is")
    return rings(graph, _id(req["source"]), int(req["max_depth"]),
                 direction=_dir(req, OUT), labels=_labels(req),
                 max_degree=_deg(req),
                 limit=int(req.get("limit", DEFAULT_PATHS_LIMIT)))


def _exec_templatepaths(graph, req):
    from incubator_hugegraph_spark.operators.paths import template_paths
    steps = [_step(s) for s in req["steps"]]
    return template_paths(graph, _vsel(graph, req["sources"]),
                          _vsel(graph, req["targets"]), steps,
                          limit=int(req.get("limit", DEFAULT_PATHS_LIMIT)))


def _exec_customizedpaths(graph, req):
    from incubator_hugegraph_spark.operators.paths import customized_paths
    steps = [_step(s) for s in req["steps"]]
    return customized_paths(graph, _vsel(graph, req["sources"]),
                            steps,
                            sorted_by_weight=req.get("sort_by",
                                                     "NONE") != "NONE",
                            limit=int(req.get("limit",
                                              DEFAULT_PATHS_LIMIT)))


def _exec_customizedcrosspoints(graph, req):
    from incubator_hugegraph_spark.operators.paths import (
        customized_crosspoints)
    patterns = [[_step(s) for s in p["steps"]]
                for p in req["path_patterns"]]
    return customized_crosspoints(
        graph, _vsel(graph, req["sources"]), patterns,
        limit=int(req.get("limit", DEFAULT_PATHS_LIMIT)))


def _exec_sameneighbors(graph, req):
    from incubator_hugegraph_spark.operators.neighbors import (
        same_neighbors, same_neighbors_multi)
    if "vertex_list" in req:  # POST N-way form (SameNeighborsAPI:113-122)
        return same_neighbors_multi(
            graph, [_id(i) for i in req["vertex_list"]],
            direction=_dir(req), labels=_labels(req), max_degree=_deg(req),
            limit=int(req.get("limit", DEFAULT_ELEMENTS_LIMIT)))
    return same_neighbors(graph, _id(req["vertex"]), _id(req["other"]),
                          direction=_dir(req), labels=_labels(req),
                          max_degree=_deg(req),
                          limit=int(req.get("limit", DEFAULT_ELEMENTS_LIMIT)))


def _exec_jaccard(graph, req):
    from incubator_hugegraph_spark.operators.neighbors import (
        jaccard_similarity)
    from incubator_hugegraph_spark.operators.similarity import jaccard_top
    if "top" in req:  # POST top-N form
        st = _step(req.get("step", {}))
        return jaccard_top(graph, _id(req["vertex"]), int(req["top"]),
                           direction=st["direction"], labels=st["labels"],
                           max_degree=st["max_degree"])
    return jaccard_similarity(graph, _id(req["vertex"]), _id(req["other"]),
                              direction=_dir(req), labels=_labels(req),
                              max_degree=_deg(req))


def _exec_adamicadar(graph, req):
    from incubator_hugegraph_spark.operators.neighbors import adamic_adar
    return adamic_adar(graph, _id(req["vertex"]), _id(req["other"]),
                       direction=_dir(req), labels=_labels(req),
                       max_degree=_deg(req))


def _exec_resourceallocation(graph, req):
    from incubator_hugegraph_spark.operators.neighbors import (
        resource_allocation)
    return resource_allocation(graph, _id(req["vertex"]), _id(req["other"]),
                               direction=_dir(req), labels=_labels(req),
                               max_degree=_deg(req))


def _exec_count(graph, req):
    from incubator_hugegraph_spark.operators.neighbors import count_steps
    return count_steps(graph, _id(req["source"]),
                       [_step(s) for s in req["steps"]],
                       dedup_size=int(req.get("dedup_size", 1_000_000)),
                       contains_traversed=bool(
                           req.get("contains_traversed", False)))


def _exec_edgeexist(graph, req):
    from incubator_hugegraph_spark.operators.neighbors import edge_exists
    return edge_exists(graph, _id(req["source"]), _id(req["target"]),
                       label=req.get("label"),
                       sort_values=req.get("sort_values", ""))


def _exec_neighborrank(graph, req):
    from incubator_hugegraph_spark.operators.rank import neighbor_rank
    return neighbor_rank(graph, _id(req["source"]),
                         [_step(s) for s in req["steps"]],
                         alpha=float(req.get("alpha", 0.85)))


def _exec_personalrank(graph, req):
    from incubator_hugegraph_spark.operators.rank import personal_rank
    return personal_rank(graph, _id(req["source"]), req["label"],
                         alpha=float(req.get("alpha", 0.85)),
                         max_depth=int(req.get("max_depth", 5)),
                         with_label=req.get("with_label", "BOTH_LABEL"),
                         max_degree=_deg(req))


def _exec_fusiform(graph, req):
    from incubator_hugegraph_spark.operators.similarity import (
        fusiform_similarity)
    srcs = req["sources"]
    if not srcs.get("label") or srcs.get("ids"):
        raise NotImplementedError(
            "fusiformsimilarity sources by explicit ids — use "
            "sources.label (the whole-label job form)")
    return fusiform_similarity(
        graph, srcs["label"], direction=_dir(req, BOTH),
        labels=_labels(req),
        min_neighbors=int(req.get("min_neighbors", 1)),
        alpha=float(req.get("alpha", 1.0)),
        min_similars=int(req.get("min_similars", 1)),
        top=int(req.get("top", 0)) or NO_LIMIT,
        max_degree=_deg(req),
        group_property=req.get("group_property"),
        min_groups=int(req.get("min_groups", 0)))


def _exec_vertices(graph, req):
    return graph.vertices_by_ids([_id(i) for i in req["ids"]])


def _exec_edges(graph, req):
    return graph.edges_by_ids(
        [tuple(i.split(">")) for i in req["ids"]])


_EXECUTORS = {
    "kout": _exec_kout,
    "kneighbor": _exec_kneighbor,
    "shortestpath": _exec_shortestpath,
    "allshortestpaths": _exec_allshortestpaths,
    "singlesourceshortestpath": _exec_sssp,
    "weightedshortestpath": _exec_weightedshortestpath,
    "multinodeshortestpath": _exec_multinodeshortestpath,
    "paths": _exec_paths,
    "crosspoints": _exec_crosspoints,
    "rays": _exec_rays,
    "rings": _exec_rings,
    "templatepaths": _exec_templatepaths,
    "customizedpaths": _exec_customizedpaths,
    "customizedcrosspoints": _exec_customizedcrosspoints,
    "sameneighbors": _exec_sameneighbors,
    "jaccardsimilarity": _exec_jaccard,
    "adamicadar": _exec_adamicadar,
    "resourceallocation": _exec_resourceallocation,
    "count": _exec_count,
    "edgeexist": _exec_edgeexist,
    "neighborrank": _exec_neighborrank,
    "personalrank": _exec_personalrank,
    "fusiformsimilarity": _exec_fusiform,
    "vertices": _exec_vertices,
    "edges": _exec_edges,
}


def execute(graph: PropertyGraph, endpoint: str, request: dict) -> DataFrame:
    """Run a reference-shaped REST request against the engine.

    ``endpoint`` is the REST path tail (`…/traversers/<endpoint>`);
    ``request`` is the merged query-params / JSON-body dict in the
    reference's own parameter names."""
    try:
        ex = _EXECUTORS[endpoint]
    except KeyError:
        raise KeyError(f"unknown endpoint {endpoint!r}; known: "
                       f"{sorted(_EXECUTORS)}") from None
    return ex(graph, request)


# ---------------------------------------------------------------------------
# Algorithm-job API: POST …/jobs/algorithm/{name} with a JSON params
# map (AbstractAlgorithm.java:78-99 KEY_* names; names registered in
# AlgorithmPool.java:46-75). The reference runs these async as tasks;
# our "task" is the returned DataFrame's job.
# ---------------------------------------------------------------------------

def _alg_labels(p: dict) -> list[str] | None:
    lab = p.get("label")
    return None if lab in (None, "", "*") else [lab]


def _top_limit(df: DataFrame, p: dict, order_col: str) -> DataFrame:
    from pyspark.sql import functions as F
    top = int(p.get("top", 0))
    if top:
        df = df.orderBy(F.desc(order_col), F.asc(df.columns[0])).limit(top)
    return df


def _alg_sources(graph, p: dict) -> list[str]:
    """The sampled-source algorithms (closeness/betweenness/stress)
    take KEY_SOURCE_SAMPLE etc.; random server-side sampling is not
    reproducible, so we accept an explicit `sources` list (the
    deterministic form) and reject the sampling keys."""
    if "sources" in p:
        return [_id(i) for i in p["sources"]]
    raise NotImplementedError(
        "random source sampling (source_sample) is nondeterministic; "
        "pass an explicit sources list")


def execute_algorithm(graph: PropertyGraph, name: str,
                      params: dict | None = None) -> DataFrame:
    """Run an algorithm job by its AlgorithmPool name with the
    reference's own parameter keys."""
    from incubator_hugegraph_spark import algorithms as A
    p = params or {}
    lab = _alg_labels(p)
    if name == "count_vertex":
        return A.count_vertex(graph)
    if name == "count_edge":
        return A.count_edge(graph)
    if name == "degree_centrality":
        return A.degree_centrality(graph, direction=_dir(p), labels=lab,
                                   top=int(p.get("top", 0)) or NO_LIMIT)
    if name == "closeness_centrality":
        return A.closeness_centrality(graph, _alg_sources(graph, p),
                                      int(p.get("depth", 5)),
                                      direction=_dir(p, OUT), labels=lab)
    if name == "betweenness_centrality":
        return A.betweenness_centrality(graph, _alg_sources(graph, p),
                                        int(p.get("depth", 5)),
                                        direction=_dir(p), labels=lab)
    if name == "stress_centrality":
        return A.stress_centrality(graph, _alg_sources(graph, p),
                                   int(p.get("depth", 5)),
                                   direction=_dir(p), labels=lab)
    if name == "eigenvector_centrality":
        return A.eigenvector_centrality(graph,
                                        rounds=int(p.get("times", 5)),
                                        direction=_dir(p, OUT), labels=lab,
                                        top=int(p.get("top", 0)) or NO_LIMIT)
    if name == "triangle_count":
        return A.triangle_count(graph, labels=lab)
    if name == "cluster_coefficient":
        return A.cluster_coefficient(graph, labels=lab)
    if name == "lpa":
        return A.lpa(graph, labels=lab, rounds=int(p.get("times", 10)))
    if name == "louvain":
        return A.louvain(graph, labels=lab, passes=int(p.get("times", 2)))
    if name == "weak_connected_component":
        return A.wcc(graph, labels=lab)
    if name == "k_core":
        return A.k_core(graph, int(p.get("k", 3)), labels=lab)
    if name == "page_rank":
        r = A.page_rank(graph, alpha=float(p.get("alpha", 0.15)),
                        max_times=int(p.get("times", 20)),
                        precision=float(p.get("precision", 1e-7)),
                        labels=lab)
        return _top_limit(r, p, "rank")
    if name == "rings":
        from incubator_hugegraph_spark.operators.paths import rings_detect
        return rings_detect(graph, int(p.get("depth", 5)),
                            direction=_dir(p, OUT), labels=lab,
                            limit=int(p.get("limit", -1)))
    if name == "fusiform_similarity":
        from incubator_hugegraph_spark.operators.similarity import (
            fusiform_similarity)
        return fusiform_similarity(
            graph, p["source_label"], direction=_dir(p, BOTH),
            labels=lab,
            min_neighbors=int(p.get("min_neighbors", 10)),
            alpha=float(p.get("alpha", 0.5)),
            min_similars=int(p.get("min_similars", 1)),
            top=int(p.get("top", 0)) or NO_LIMIT,
            group_property=p.get("group_property"),
            min_groups=int(p.get("min_groups", 0)))
    if name == "subgraph_stat":
        return A.subgraph_stat(graph, labels=lab)
    raise KeyError(f"unknown algorithm {name!r} "
                   f"(AlgorithmPool.java registry)")


def execute_cypher(graph: PropertyGraph, request: dict | str) -> DataFrame:
    """`POST …/graphs/{graph}/cypher` (api/api/cypher/CypherAPI.java:
    49-110): the body is the Cypher text (the reference also accepts
    {"gremlin": …}-style wrapped payloads via CypherManager — we take
    the raw string or a {"cypher": "..."} dict)."""
    from incubator_hugegraph_spark.cypher import cypher
    query = request if isinstance(request, str) else request["cypher"]
    return cypher(graph, query)


def execute_schema(schema, method: str, path: str,
                   payload: dict | None = None):
    """Schema REST surface (api/api/schema/*API.java — PropertyKeyAPI,
    VertexLabelAPI, EdgeLabelAPI, IndexLabelAPI): the reference's
    request shapes mapped onto the GraphSchema registry builders
    (SchemaManager facade). `path` is the REST tail, e.g.
    'propertykeys' or 'vertexlabels/person'. Returns JSON-able dicts
    in the reference's response style (enum names as strings)."""
    from dataclasses import asdict
    from incubator_hugegraph_spark.schema import (Cardinality, Frequency,
                                                  IdStrategy, IndexType)

    kind, _, name = path.partition("/")
    method = method.upper()

    def dump(obj) -> dict:
        d = asdict(obj)
        return {k: (v.value if hasattr(v, "value") else
                    list(v) if isinstance(v, tuple) else v)
                for k, v in d.items()}

    registries = {"propertykeys": schema.property_keys,
                  "vertexlabels": schema.vertex_labels,
                  "edgelabels": schema.edge_labels,
                  "indexlabels": schema.index_labels}
    if kind not in registries:
        raise KeyError(f"unknown schema endpoint {kind!r}")
    reg = registries[kind]

    if method == "GET":
        if name:
            return dump(reg[name])
        return [dump(v) for v in reg.values()]
    if method == "DELETE":
        del reg[name or payload["name"]]
        return None
    if method != "POST":
        raise ValueError(f"unsupported method {method}")

    p = dict(payload or {})
    if kind == "propertykeys":
        pk = schema.property_key(
            p["name"], p.get("data_type", "TEXT").upper(),
            Cardinality(p.get("cardinality", "SINGLE").upper()))
        return dump(pk)
    if kind == "vertexlabels":
        vl = schema.vertex_label(
            p["name"],
            properties=tuple(p.get("properties", ())),
            primary_keys=tuple(p.get("primary_keys", ())),
            nullable_keys=tuple(p.get("nullable_keys", ())),
            id_strategy=IdStrategy(
                p.get("id_strategy", "PRIMARY_KEY").upper()),
            ttl_ms=int(p.get("ttl", 0)),
            enable_label_index=bool(p.get("enable_label_index", True)))
        return dump(vl)
    if kind == "edgelabels":
        el = schema.edge_label(
            p["name"], p["source_label"], p["target_label"],
            properties=tuple(p.get("properties", ())),
            sort_keys=tuple(p.get("sort_keys", ())),
            nullable_keys=tuple(p.get("nullable_keys", ())),
            frequency=Frequency(p.get("frequency", "SINGLE").upper()),
            ttl_ms=int(p.get("ttl", 0)))
        return dump(el)
    il = schema.index_label(
        p["name"], p["base_type"].upper().replace("_LABEL", ""),
        p["base_value"],
        IndexType(p["index_type"].upper()),
        tuple(p.get("fields", ())))
    return dump(il)


def execute_gremlin(graph: PropertyGraph, request: dict | str) -> DataFrame:
    """`POST /gremlin` (api/api/gremlin/GremlinAPI.java:41-88): the
    body's ``gremlin`` field is a traversal string; the supported
    method-chain subset is parsed by gremlin_text.eval_gremlin
    (arbitrary groovy stays out of scope — SURVEY §2.K)."""
    from incubator_hugegraph_spark.gremlin_text import eval_gremlin
    query = request if isinstance(request, str) else request["gremlin"]
    return eval_gremlin(graph, query)


def execute_version() -> dict:
    """GET /apis/versions (api/profile/VersionAPI.java:46-50 — the
    same {"versions": {...}} envelope; 'core' reports the Spark
    runtime this engine compiles onto)."""
    import pyspark
    return {"versions": {"version": "v1",
                         "core": pyspark.__version__,
                         "gremlin": "dsl+text (gremlin.py)",
                         "api": "0.69"}}


def execute_metrics(spark) -> dict:
    """GET /metrics (api/metrics/MetricsAPI.java): the gauges envelope
    with the Spark-native equivalents of the reference's JVM/backend
    gauges — parallelism, executor count, scheduler state. Driver-side
    status lookups only."""
    sc = spark.sparkContext
    tracker = sc.statusTracker()
    return {"gauges": {
        "spark.version": sc.version,
        "default.parallelism": sc.defaultParallelism,
        "active.jobs": len(tracker.getActiveJobsIds()),
        "active.stages": len(tracker.getActiveStageIds()),
        "shuffle.partitions": int(
            spark.conf.get("spark.sql.shuffle.partitions")),
        "aqe.enabled": spark.conf.get("spark.sql.adaptive.enabled"),
    }}


def execute_variables(variables, method: str, key: str | None = None,
                      payload: dict | None = None):
    """`/graphs/{graph}/variables[/{key}]` (api/api/variables/
    VariablesAPI.java): GET one/all, PUT {"data": value}, DELETE."""
    method = method.upper()
    if method == "GET":
        if key is None:
            return dict(variables.items()) if hasattr(variables, "items") \
                else dict(variables._data)
        v = variables.get(key, None)
        if v is None:
            raise KeyError(key)
        return {key: v}
    if method == "PUT":
        variables.set(key, (payload or {}).get("data"))
        return {key: variables.get(key)}
    if method == "DELETE":
        variables.remove(key)
        return None
    raise ValueError(f"unsupported method {method}")


#: The complete REST surface map — "could a reference user switch?"
#: answered by lookup: every reference endpoint family → the adapter
#: that accepts its literal request shapes.
SURFACES = {
    "graphs/{g}/traversers/*": "execute",          # 25+ traversers
    "graphs/{g}/jobs/algorithm/{name}": "execute_algorithm",
    "graphs/{g}/cypher": "execute_cypher",
    "gremlin": "execute_gremlin",
    "graphs/{g}/schema/*": "execute_schema",
    "graphs/{g}/variables": "execute_variables",
    "graphs/{g}/graph/vertices|edges (CRUD)":
        "operators.mutate (batch MERGE surface)",
}


# ---------------------------------------------------------------------------
# ApiMeasurer — per-request vertex/edge iteration counts
# (api/ApiMeasurer.java; surfaced per endpoint as in
# KneighborAPI.java:106-110 measure.addIterCount(...)).
#
# The reference increments counters inside its iterator pulls. A
# set-oriented engine gets the same numbers from the traversal's OWN
# output by identity, with ONE cheap extra aggregation and no
# re-traversal:
#   - vertex.iterations = |visited| (global-dedup BFS touches each
#     vertex exactly once, sources included);
#   - edge.iterations   = Σ degree(v) over every EXPANDED vertex
#     (dist < max_depth): the loop consumes each expanded vertex's
#     adjacency exactly once.
# At 100 TB the extra job is a semi-joined degree aggregation over the
# visited set — frontier-sized, not graph-sized.
# ---------------------------------------------------------------------------


class ApiMeasurer:
    """Mutable per-request measure record (ApiMeasurer.java)."""

    def __init__(self) -> None:
        self.vertex_iterations = 0
        self.edge_iterations = 0

    def add_iter_count(self, vertices: int, edges: int) -> None:
        self.vertex_iterations += int(vertices)
        self.edge_iterations += int(edges)

    def measures(self) -> dict:
        return {"vertex.iterations": self.vertex_iterations,
                "edge.iterations": self.edge_iterations}


def _expanded_edge_iters(graph, visited, direction, labels,
                         n_hint: int | None = None) -> int:
    """Σ direction-degree over the expanded vertex set. The semi-join
    broadcasts only while the set is small (the same
    BROADCAST_FRONTIER_LIMIT row-count fallback as the BFS kernel —
    r03 advice fix: an unconditional broadcast here would re-create
    the failure mode the BFS fix removed once the visited set reaches
    executor-memory scale). ``n_hint`` reuses a count the caller
    already paid for."""
    from pyspark.sql import functions as F

    from incubator_hugegraph_spark.operators.bfs import (
        BROADCAST_FRONTIER_LIMIT)
    n = visited.count() if n_hint is None else n_hint
    keys = F.broadcast(visited) if n <= BROADCAST_FRONTIER_LIMIT \
        else visited
    deg = graph.degrees(direction, labels)
    row = (deg.join(keys, on="id", how="left_semi")
           .agg(F.coalesce(F.sum("degree"), F.lit(0)).alias("s")).head())
    return int(row.s)


def execute_measured(graph: PropertyGraph, endpoint: str,
                     request: dict) -> tuple[DataFrame, dict]:
    """`execute` plus the reference's per-request measures. Supported
    for the BFS-shaped endpoints (kout, kneighbor) and sameneighbors;
    other endpoints raise (their iteration semantics differ per
    traverser — extend per endpoint as needed)."""
    from pyspark.sql import functions as F
    m = ApiMeasurer()
    if endpoint in ("kout", "kneighbor"):
        if "steps" in request or request.get("with_path") \
                or request.get("with_edge"):
            raise NotImplementedError(
                "measured form supports the GET shape (no steps/"
                "with_path/with_edge)")
        if endpoint == "kout" and request.get("nearest") is False:
            # the measured BFS is global-dedup (nearest) by
            # construction; silently returning nearest results for a
            # nearest=false request diverged from execute() (r06)
            raise NotImplementedError(
                "measured kout supports nearest=true only")
        from incubator_hugegraph_spark.operators.bfs import bfs
        depth = int(request["max_depth"])
        direction, labels = _dir(request), _labels(request)
        visited = bfs(graph, [_id(request["source"])], depth,
                      direction=direction, labels=labels,
                      max_degree=_deg(request)).localCheckpoint()
        n_visited = visited.count()
        expanded = visited.filter(F.col("dist") < depth).select("id")
        m.add_iter_count(
            n_visited,
            _expanded_edge_iters(graph, expanded, direction, labels,
                                 n_hint=n_visited))
        if endpoint == "kout":
            out = visited.filter(F.col("dist") == depth).select("id")
        else:
            out = visited.filter(F.col("dist") > 0).select("id")
        limit = int(request.get("limit", DEFAULT_ELEMENTS_LIMIT))
        if limit != NO_LIMIT:
            out = out.orderBy("id").limit(limit)
        return ((_count_only(out) if request.get("count_only") else out),
                m.measures())
    if endpoint == "sameneighbors":
        from pyspark.sql import functions as F
        out = _exec_sameneighbors(graph, request)
        direction, labels = _dir(request), _labels(request)
        srcs = graph.spark.createDataFrame(
            [(_id(request["vertex"]),), (_id(request["other"]),)]
            if "vertex" in request else
            [(_id(v),) for v in request["vertex_list"]], "id string")
        nbrs = (graph.adj(direction, labels)
                .join(F.broadcast(srcs),
                      on=F.col("src") == srcs.id, how="left_semi"))
        agg = nbrs.agg(
            F.count(F.lit(1)).alias("e"),
            F.size(F.collect_set("dst")).alias("v")).head()
        m.add_iter_count(int(agg.v) + srcs.count(), int(agg.e))
        return out, m.measures()
    raise NotImplementedError(
        f"measured execution not defined for endpoint {endpoint!r}")


# ---------------------------------------------------------------------------
# Element CRUD doors — api/graph/VertexAPI.java / EdgeAPI.java: the
# reference's literal JsonVertex/JsonEdge payload shapes ({"label",
# "properties"[, "id"]}; edges add "outV"/"outVLabel"/"inV"/
# "inVLabel") over the batch mutate layer. PUT {id}?action=append
# adds/updates properties, action=eliminate removes them
# (VertexAPI.checkAndParseAction). Deviation (documented): our edge
# id is the engine's canonical quadruple splice src>label>sort>dst,
# not the reference's S1:x>1>>S2:y encoding.
# ---------------------------------------------------------------------------


def _json_vertex_rows(graph: PropertyGraph, items: list[dict]) -> list:
    from incubator_hugegraph_spark.operators.mutate import gen_vertex_id
    rows = []
    for jv in items:
        if jv.get("properties") is None:
            raise ValueError("The properties of vertex can't be null")
        if any(v is None for v in jv["properties"].values()):
            raise ValueError("Not allowed to set value of property "
                             "to null")
        # schema validation (GraphTransaction.checkVertexProperties /
        # HugeVertex.assignId posture): undeclared property keys and
        # missing non-nullable keys are write errors when the label
        # is registered
        vl = graph.schema.vertex_labels.get(jv["label"]) \
            if graph.schema else None
        if vl is not None and vl.properties:
            extra = set(jv["properties"]) - set(vl.properties)
            if extra:
                raise ValueError(
                    f"Invalid property '{sorted(extra)[0]}' for "
                    f"vertex label '{jv['label']}'")
            required = (set(vl.properties) - set(vl.nullable_keys))
            missing = required - set(jv["properties"])
            # enforced regardless of id strategy — the reference
            # checks non-nullable keys on every write, customized ids
            # included (GraphTransaction.checkVertexProperties); only
            # primary-key-derived id GENERATION depends on id presence
            if missing:
                raise ValueError(
                    f"The non-null property '{sorted(missing)[0]}' "
                    f"of vertex label '{jv['label']}' is missing")
        props = {k: str(v) for k, v in jv["properties"].items()}
        if jv.get("id") is not None:
            vid = str(jv["id"])
            # the '!auto:<n>' suffix is reserved for the AUTOMATIC id
            # strategy's counter (operators/mutate.py gen_vertex_id) —
            # an explicit id of that shape collides with a future
            # counter value and silently upsert-merges (r05 ADVICE)
            if re.search(r"!auto:\d+$", vid):
                raise ValueError(
                    f"Invalid explicit vertex id '{vid}': the "
                    "'!auto:<n>' suffix is reserved for "
                    "AUTOMATIC-strategy generated ids")
            # a raw (unescaped) '>' or a trailing unpaired backslash
            # would make the 4-part EdgeId splice
            # (src>label>sort_values>dst) ambiguous — engine-generated
            # ids carry only the escaped forms (schema.escape_id_value),
            # which stay legal here so spliced ids can be re-posted;
            # raw forms are rejected, mirroring the reference's id
            # validation (IdUtil checks)
            from incubator_hugegraph_spark.schema import id_splice_safe
            ok, why = id_splice_safe(vid)
            if not ok:
                raise ValueError(
                    f"Invalid explicit vertex id '{vid}': {why}")
        else:
            vid = gen_vertex_id(graph.schema, jv["label"], props,
                                graph=graph)
        rows.append((vid, jv["label"], props, None))
    return rows


def _apply_vertex_batch(graph: PropertyGraph, rows: list) -> list[str]:
    from incubator_hugegraph_spark.operators.mutate import (
        upsert_vertices)
    batch = graph.spark.createDataFrame(
        rows, "id string, label string, props map<string,string>, "
              "expired_at timestamp")
    graph.vertices = upsert_vertices(graph.vertices, batch)
    graph.refresh_vertex_views({r[1] for r in rows})
    return [r[0] for r in rows]


def _edge_eid(src: str, label: str, sort_values: str, dst: str) -> str:
    return ">".join([src, label, sort_values, dst])


def _prop_update(graph: PropertyGraph, kind: str, key_filter,
                 props: dict, append: bool) -> None:
    """action=append merges the given properties into the matched
    element's map; action=eliminate removes the given KEYS — one
    narrow withColumn over the canonical table, no shuffle."""
    tgt = graph.vertices if kind == "V" else graph.edges
    if append:
        pairs = []
        for k, v in props.items():
            pairs.extend([F.lit(k), F.lit(str(v))])
        newmap = F.map_concat(
            F.map_filter("props",
                         lambda k, _: ~k.isin(list(props))),
            F.create_map(*pairs))
    else:
        newmap = F.map_filter(
            "props", lambda k, _: ~k.isin(list(props)))
    updated = tgt.withColumn(
        "props", F.when(key_filter(tgt), newmap)
        .otherwise(F.col("props")))
    if kind == "V":
        graph.vertices = updated
        graph.refresh_vertex_views()
    else:
        graph.edges = updated
        graph.refresh_edge_views()


def execute_graph_crud(graph: PropertyGraph, method: str, path: str,
                       payload=None, params: dict | None = None):
    """`…/graphs/{graph}/graph/vertices[...]` and `…/graph/edges[...]`
    — the element CRUD REST surface. ``path`` is the tail after
    `graph/` (e.g. 'vertices', 'vertices/batch', 'vertices/{id}',
    'edges', 'edges/batch', 'edges/{id}'); ``params`` carries query
    params (action=append|eliminate, label/properties filters for
    GET lists)."""
    from incubator_hugegraph_spark.operators.mutate import (
        delete_vertices, upsert_edges)
    params = params or {}
    parts = path.strip("/").split("/")
    kind, rest = parts[0], parts[1:]
    if kind not in ("vertices", "edges"):
        raise KeyError(f"unknown graph CRUD path {path!r}")

    if kind == "vertices":
        if method == "POST":
            items = payload if rest == ["batch"] else [payload]
            ids = _apply_vertex_batch(
                graph, _json_vertex_rows(graph, items))
            return ids if rest == ["batch"] else ids[0]
        if method == "GET" and rest:
            return graph.vertices.filter(F.col("id") == rest[0])
        if method == "GET":
            out = graph.vertices
            if "label" in params:
                out = out.filter(F.col("label") == params["label"])
            for k, v in (params.get("properties") or {}).items():
                out = out.filter(F.col("props")[k] == str(v))
            return out
        if method == "DELETE" and rest:
            v, e = delete_vertices(graph.vertices, graph.edges,
                                   [rest[0]])
            graph.vertices, graph.edges = v, e
            graph.refresh_vertex_views()
            graph.refresh_edge_views()  # the cascade dropped edges
            return None
        if method == "PUT" and rest:
            append = _parse_action(params.get("action"))
            props = (payload or {}).get("properties") or {}
            vid = rest[0]
            _prop_update(graph, "V",
                         lambda t: F.col("id") == vid, props, append)
            return vid

    else:  # edges
        if method == "POST":
            from incubator_hugegraph_spark.functions.ids import (
                encode_sort_values)
            from incubator_hugegraph_spark.schema import id_splice_safe
            items = payload if rest == ["batch"] else [payload]
            rows = []
            for je in items:
                raw = je.get("properties") or {}
                # same validation the VERTEX path enforces (review
                # r06): null values are write errors, undeclared keys
                # are rejected on registered labels, and the sort-key
                # properties must be PRESENT — a missing sort key
                # would encode as '' and collapse two distinct edges
                # onto one EdgeId
                if any(v is None for v in raw.values()):
                    raise ValueError("Not allowed to set value of "
                                     "property to null")
                props = {k: str(v) for k, v in raw.items()}
                el = graph.schema.edge_labels.get(je["label"]) \
                    if graph.schema else None
                sk = el.sort_keys if el else ()
                if el is not None and el.properties:
                    extra = set(props) - set(el.properties) \
                        - set(sk or ())
                    if extra:
                        raise ValueError(
                            f"Invalid property '{sorted(extra)[0]}' "
                            f"for edge label '{je['label']}'")
                missing_sk = [k for k in (sk or ()) if k not in props]
                if missing_sk:
                    raise ValueError(
                        f"The sort key '{missing_sk[0]}' of edge "
                        f"label '{je['label']}' is missing")
                sort_values = encode_sort_values(
                    props[k] for k in sk)
                src, dst = str(je["outV"]), str(je["inV"])
                # endpoint ids land verbatim in the 4-part EdgeId
                # splice (code review r06; engine-spliced ids only
                # carry escaped delimiters, which are fine)
                for end in (src, dst):
                    ok, why = id_splice_safe(end)
                    if not ok:
                        raise ValueError(
                            f"Invalid edge endpoint id '{end}': {why}")
                rows.append((src, dst, je["label"], sort_values,
                             props, None))
            batch = graph.spark.createDataFrame(
                rows, "src string, dst string, label string, "
                      "sort_values string, props map<string,string>, "
                      "expired_at timestamp")
            graph.edges = upsert_edges(graph.edges, batch)
            graph.refresh_edge_views({r[2] for r in rows})
            eids = [_edge_eid(r[0], r[2], r[3], r[1]) for r in rows]
            return eids if rest == ["batch"] else eids[0]
        key = F.concat_ws(">", "src", "label", "sort_values", "dst")
        if method == "GET" and rest:
            return graph.edges.filter(key == rest[0])
        if method == "GET":
            out = graph.edges
            if "label" in params:
                out = out.filter(F.col("label") == params["label"])
            for k, v in (params.get("properties") or {}).items():
                out = out.filter(F.col("props")[k] == str(v))
            return out
        if method == "DELETE" and rest:
            graph.edges = graph.edges.filter(key != rest[0])
            graph.refresh_edge_views()
            return None
        if method == "PUT" and rest:
            append = _parse_action(params.get("action"))
            props = (payload or {}).get("properties") or {}
            eid = rest[0]
            _prop_update(
                graph, "E",
                lambda t: F.concat_ws(">", "src", "label",
                                      "sort_values", "dst") == eid,
                props, append)
            return eid
    raise KeyError(f"unsupported {method} {path}")


def _parse_action(action: str | None) -> bool:
    """VertexAPI.checkAndParseAction: append → True, eliminate →
    False, anything else rejected."""
    if action == "append":
        return True
    if action == "eliminate":
        return False
    raise ValueError(f"Not support action '{action}'")


# ---------------------------------------------------------------------------
# Graph spaces / multi-graph management (api/space/GraphSpaceAPI.java,
# core/GraphManager): named spaces each holding named graphs; the
# traverser/algorithm adapters take the resolved graph, so one manager
# serves every surface. The reference's default space is DEFAULT.
# ---------------------------------------------------------------------------


class GraphSpaceManager:
    """graphspaces/{space}/graphs/{name} resolution + listing."""

    DEFAULT = "DEFAULT"

    def __init__(self) -> None:
        self._spaces: dict[str, dict[str, PropertyGraph]] = {
            self.DEFAULT: {}}

    def create_space(self, space: str) -> None:
        self._spaces.setdefault(space, {})

    def drop_space(self, space: str) -> None:
        if space == self.DEFAULT:
            raise ValueError("cannot drop the DEFAULT graph space")
        self._spaces.pop(space, None)

    def register(self, name: str, graph: PropertyGraph,
                 space: str = DEFAULT) -> None:
        self.create_space(space)
        self._spaces[space][name] = graph

    def graph(self, name: str, space: str = DEFAULT) -> PropertyGraph:
        try:
            return self._spaces[space][name]
        except KeyError:
            raise KeyError(
                f"unknown graph {space}/{name}; known: "
                f"{self.list_graphs(space) if space in self._spaces else []}"
            ) from None

    def list_spaces(self) -> list[str]:
        return sorted(self._spaces)

    def list_graphs(self, space: str = DEFAULT) -> list[str]:
        return sorted(self._spaces.get(space, {}))

    def execute(self, space: str, graph_name: str, endpoint: str,
                request: dict) -> DataFrame:
        """…/graphspaces/{space}/graphs/{graph}/traversers/{endpoint}"""
        return execute(self.graph(graph_name, space), endpoint, request)

    def execute_measured(self, space: str, graph_name: str, endpoint: str,
                         request: dict) -> tuple[DataFrame, dict]:
        return execute_measured(self.graph(graph_name, space), endpoint,
                                request)

    # -- GraphsAPI management verbs (api/profile/GraphsAPI.java) ------
    # The reference's literal confirm strings (GraphsAPI.java:72-73)
    CONFIRM_CLEAR = "I'm sure to delete all data"
    CONFIRM_DROP = "I'm sure to drop the graph"
    MODES = ("NONE", "RESTORING", "MERGING", "LOADING")
    READ_MODES = ("ALL", "OLTP_ONLY")

    def drop_graph(self, name: str, space: str = DEFAULT,
                   confirm_message: str | None = None) -> None:
        """DELETE …/graphs/{name}?confirm_message= (GraphsAPI.java:
        135-149): refuses without the exact confirm string."""
        if confirm_message != self.CONFIRM_DROP:
            raise ValueError(
                f"Please take the message: {self.CONFIRM_DROP}")
        self.graph(name, space)  # raises the unknown-graph error
        del self._spaces[space][name]
        self._meta(space, name, drop=True)

    def clone_graph(self, clone_from: str, name: str,
                    space: str = DEFAULT) -> PropertyGraph:
        """POST …/graphs/{name}?clone_graph_name= (GraphsAPI.java:
        172-210). DataFrames are immutable lineage, so the clone is
        O(1) metadata and fully isolated from later mutations of
        either graph — the Spark-native form of clone-from-config."""
        g = self.graph(clone_from, space)
        clone = PropertyGraph(
            spark=g.spark, vertices=g.vertices, edges=g.edges,
            schema=g.schema, vertex_views=dict(g.vertex_views),
            edge_views=dict(g.edge_views))
        self.register(name, clone, space)
        return clone

    def clear_graph(self, name: str, space: str = DEFAULT,
                    confirm_message: str | None = None) -> None:
        """DELETE …/graphs/{name}/clear (GraphsAPI.java:247-262):
        truncate all data, keep the graph + schema registered."""
        if confirm_message != self.CONFIRM_CLEAR:
            raise ValueError(
                f"Please take the message: {self.CONFIRM_CLEAR}")
        g = self.graph(name, space)
        g.vertices = g.vertices.filter(F.lit(False))
        g.edges = g.edges.filter(F.lit(False))
        g.vertex_views = {k: v.filter(F.lit(False))
                          for k, v in g.vertex_views.items()}
        g.edge_views = {k: v.filter(F.lit(False))
                        for k, v in g.edge_views.items()}

    def snapshot_create(self, name: str, space: str = DEFAULT) -> dict:
        """PUT …/graphs/{name}/snapshot_create: immutable-lineage
        snapshot — O(1); resume rolls the graph back to it."""
        g = self.graph(name, space)
        self._meta(space, name)["snapshot"] = (
            g.vertices, g.edges, dict(g.vertex_views),
            dict(g.edge_views))
        return {name: "snapshot_created"}

    def snapshot_resume(self, name: str, space: str = DEFAULT) -> dict:
        g = self.graph(name, space)
        snap = self._meta(space, name).get("snapshot")
        if snap is None:
            raise ValueError(f"graph {name!r} has no snapshot")
        g.vertices, g.edges, g.vertex_views, g.edge_views = (
            snap[0], snap[1], dict(snap[2]), dict(snap[3]))
        return {name: "snapshot_resumed"}

    def set_mode(self, name: str, mode: str,
                 space: str = DEFAULT) -> dict:
        """PUT …/graphs/{name}/mode (GraphMode: NONE/RESTORING/
        MERGING/LOADING)."""
        if mode not in self.MODES:
            raise ValueError(f"Graph mode must be one of {self.MODES}")
        self._meta(space, name)["mode"] = mode
        return {"mode": mode}

    def mode(self, name: str, space: str = DEFAULT) -> dict:
        return {"mode": self._meta(space, name).get("mode", "NONE")}

    def set_graph_read_mode(self, name: str, read_mode: str,
                            space: str = DEFAULT) -> dict:
        """PUT …/graphs/{name}/graph_read_mode (ALL / OLTP_ONLY —
        the reference rejects OLAP_ONLY here too)."""
        if read_mode not in self.READ_MODES:
            raise ValueError(
                "Graph-read-mode could be ALL or OLTP_ONLY")
        self._meta(space, name)["graph_read_mode"] = read_mode
        return {"graph_read_mode": read_mode}

    def manage(self, action_map: dict) -> dict:
        """PUT …/graphs/manage — {'action': 'reload'}
        (GraphsAPI.java:151-170)."""
        if not action_map or "action" not in action_map:
            raise ValueError("Please pass 'action' for graphs manage")
        if action_map["action"] == "reload":
            return {"graphs": "reloaded"}
        raise ValueError(
            f"Invalid graphs action: '{action_map['action']}'")

    def _meta(self, space: str, name: str, drop: bool = False) -> dict:
        key = (space, name)
        store = getattr(self, "_graph_meta", None)
        if store is None:
            store = self._graph_meta = {}
        if drop:
            store.pop(key, None)
            return {}
        return store.setdefault(key, {})


# ---------------------------------------------------------------------------
# Async task scheduler — api/task/TaskAPI.java + core/task/HugeTask /
# TaskScheduler: algorithm jobs run asynchronously with an id and a
# RUNNING → SUCCESS/FAILED/CANCELLED lifecycle; results are fetched by
# task id. Spark-native: each task runs the job's action on a worker
# thread inside a Spark job group, so cancel() maps to
# SparkContext.cancelJobGroup (the same kill switch the reference's
# task restore/cancel path uses on its executors).
# ---------------------------------------------------------------------------


class TaskScheduler:
    """Minimal HugeTask lifecycle over Spark job groups."""

    def __init__(self) -> None:
        import threading
        self._lock = threading.Lock()
        self._tasks: dict[int, dict] = {}
        self._next = 1

    def submit_algorithm(self, graph: PropertyGraph, name: str,
                         params: dict | None = None) -> int:
        """POST …/jobs/algorithm/{name} — returns the task id
        immediately; the job materializes on a worker thread."""
        return self._submit(graph, "algorithm", name,
                            lambda: execute_algorithm(graph, name,
                                                      params))

    def submit_gremlin(self, graph: PropertyGraph, query: str) -> int:
        """POST …/jobs/gremlin (api/job/GremlinAPI.java): async
        Gremlin job — same task lifecycle as algorithm jobs."""
        from incubator_hugegraph_spark.gremlin_text import eval_gremlin

        def run():
            out = eval_gremlin(graph, query)
            return out if isinstance(out, DataFrame) else out.toDF()
        return self._submit(graph, "gremlin", query, run)

    def submit_cypher(self, graph: PropertyGraph, query: str) -> int:
        """Async Cypher job (the reference routes Cypher through the
        same job machinery via its translation layer)."""
        from incubator_hugegraph_spark.cypher import cypher as _cy
        return self._submit(graph, "cypher", query,
                            lambda: _cy(graph, query))

    def _submit(self, graph: PropertyGraph, jtype: str, name: str,
                thunk) -> int:
        import threading
        with self._lock:
            task_id = self._next
            self._next += 1
            rec = {"id": task_id, "type": jtype, "name": name,
                   "status": "RUNNING", "error": None, "result": None,
                   # captured here so cancel() never depends on the
                   # caller remembering the session (r03 advice fix)
                   "_spark": graph.spark}
            self._tasks[task_id] = rec
        group = f"task-{task_id}"

        def run() -> None:
            sc = graph.spark.sparkContext
            sc.setJobGroup(group, f"{jtype} {name}", True)
            try:
                rec["result"] = thunk().localCheckpoint()  # materialize
                rec["status"] = "SUCCESS"
            except Exception as e:  # noqa: BLE001 — task records it
                rec["error"] = f"{type(e).__name__}: {e}"
                rec["status"] = ("CANCELLED"
                                 if "cancelled" in str(e).lower()
                                 else "FAILED")
            finally:
                sc._jsc.clearJobGroup()

        t = threading.Thread(target=run, name=group, daemon=True)
        rec["_thread"] = t
        t.start()
        return task_id

    def _rec(self, task_id: int) -> dict:
        try:
            return self._tasks[task_id]
        except KeyError:
            raise KeyError(f"unknown task {task_id}") from None

    def get(self, task_id: int) -> dict:
        """GET …/tasks/{id} — status record (reference field names)."""
        r = self._rec(task_id)
        return {"id": r["id"], "task_type": r["type"],
                "task_name": r["name"], "task_status": r["status"],
                "task_result": r["error"]}

    def result(self, task_id: int) -> DataFrame:
        r = self._rec(task_id)
        if r["status"] != "SUCCESS":
            raise RuntimeError(
                f"task {task_id} is {r['status']}: {r['error']}")
        return r["result"]

    def wait(self, task_id: int, timeout: float | None = None) -> dict:
        self._rec(task_id)["_thread"].join(timeout)
        return self.get(task_id)

    def cancel(self, task_id: int, spark=None) -> dict:
        """DELETE …/tasks/{id} — cancels the task's Spark job group;
        a finished task is left untouched (reference behavior). The
        session was captured at submit time, so the kill switch fires
        without the caller passing ``spark`` (r03 advice fix — the
        old default silently skipped cancelJobGroup)."""
        r = self._rec(task_id)
        if r["status"] == "RUNNING":
            sess = spark or r.get("_spark")
            if sess is None:  # defensive: submit always captures it
                raise RuntimeError(
                    f"task {task_id} is RUNNING but no SparkSession "
                    "is available to cancel its job group")
            sess.sparkContext.cancelJobGroup(f"task-{task_id}")
        return self.get(task_id)

    def list(self, status: str | None = None) -> list[dict]:
        """GET …/tasks[?status=…]"""
        out = [self.get(i) for i in sorted(self._tasks)]
        if status:
            out = [t for t in out if t["task_status"] == status.upper()]
        return out
