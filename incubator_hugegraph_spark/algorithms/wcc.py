"""Weakly connected components — comm/WeakConnectedComponent.java:45-220.

Min-id label propagation over the undirected adjacency:

    comp_0(v) = v
    comp_{k+1}(v) = min(comp_k(v), min_{u ~ v} comp_k(u))

until fixpoint (delta count == 0) or ``fixed_rounds``. Each round is
one join + one groupBy-min; labels are strings so min = lexicographic
min (deterministic), and the round count is bounded by graph diameter
(small for this schema). `wcc_star` is the diameter-independent
large-star/small-star variant for 100 TB graphs — identical result,
O(log²) rounds.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from contextlib import nullcontext

from incubator_hugegraph_spark.graph import (
    BOTH, PropertyGraph, balanced, checkpointed, iterate_hygiene, no_aqe,
    release_ckpt)
from incubator_hugegraph_spark.algorithms.pagerank import BROADCAST_VERTEX_LIMIT


def wcc(graph: PropertyGraph, labels: list[str] | None = None,
        fixed_rounds: int | None = None, max_rounds: int = 50,
        engine: str = "auto") -> DataFrame:
    """Returns (id, component) — component = min reachable vertex id.

    ``engine``: 'auto' takes the RamTable-style in-memory kernel
    (ram.py) when the edge count fits AND the caller wants the
    fixpoint (fixed_rounds pins per-round semantics only the
    distributed loop has); 'ram'/'dist' force a path."""
    if engine != "dist" and fixed_rounds is None:
        from incubator_hugegraph_spark.ram import ram_fits, ram_wcc
        if engine == "ram" or ram_fits(graph):
            return ram_wcc(graph, labels)
    # component vector is O(|V|): broadcast it while it fits (same
    # adaptive rule as page_rank — see BROADCAST_VERTEX_LIMIT there
    # for the driver-heap sizing rationale) so each round's
    # propagation is a map-side join; shuffle joins past the limit
    bcast = graph.vertices.count() <= BROADCAST_VERTEX_LIMIT

    def _b(df: DataFrame) -> DataFrame:
        return F.broadcast(df) if bcast else df

    # §2.3 narrower types (optimization r11, finding #9 — shared with
    # page_rank): on the broadcast fixpoint tier, encode vertex ids to
    # longs once through the ORDER-PRESERVING vertex_index and run
    # every round's join/min/least on longs. Unlike page_rank there is
    # no float anywhere — min over the order-preserving encoding IS
    # the lexicographic min, so the decoded components are bit-
    # identical strings. The hash-gated fixed-rounds path keeps the
    # string-keyed plan byte-identical anyway (same discipline as
    # page_rank). The encode also fuses dedup into the cache build:
    # repartition(src) BEFORE dropDuplicates lets the dedup aggregate
    # run on the already-src-clustered partitions (hashpartitioning
    # on a subset of the grouping keys satisfies the aggregate's
    # distribution) — one O(|E|) exchange where distinct().
    # repartition(src) paid two.
    int_tier = bcast and fixed_rounds is None
    if int_tier:
        from incubator_hugegraph_spark.algorithms.pagerank import (
            vertex_index)
        idx = vertex_index(graph)
        adj = (balanced(
            graph.adj(BOTH, labels).select("src", "dst")
            .join(F.broadcast(idx.withColumnRenamed("id", "src")),
                  on="src")
            .select(F.col("vi").alias("src"), "dst")
            .join(F.broadcast(idx.withColumnRenamed("id", "dst")),
                  on="dst")
            .select("src", F.col("vi").alias("dst")),
            "src")
            .dropDuplicates(["src", "dst"]).persist())
        adj.count()
        comp = checkpointed(
            idx.select(F.col("vi").alias("id"),
                       F.col("vi").alias("component")))
    else:
        # the adjacency is reused every round: dedup once,
        # hash-partition by SRC and persist with the repartition
        # visible to Catalyst so each round's groupBy(src)
        # min-aggregation runs directly on the cached partitions — no
        # per-round O(|E|) shuffle (same pattern as page_rank's
        # dst-partitioned edge cache)
        adj = balanced(
            graph.adj(BOTH, labels).select("src", "dst").distinct(),
            "src").persist()
        adj.count()
        comp = checkpointed(
            graph.vertices.select("id", F.col("id").alias("component")))
    rounds = fixed_rounds if fixed_rounds is not None else max_rounds
    # one JOB per round (broadcast path): lazy checkpoint + the
    # full-vector fixpoint agg as the materializing action, AQE
    # suspended since the round plan's only exchanges are broadcasts
    # (see graph.no_aqe / page_rank for the measured rationale)
    converged = fixed_rounds is not None
    with no_aqe(graph.spark) if bcast else nullcontext():
        prev = comp
        for k in range(rounds):
            nbr_min = (adj.join(_b(comp), on=adj.dst == comp.id)
                       .groupBy("src")
                       .agg(F.min("component").alias("nbr_comp"))
                       .withColumnRenamed("src", "id"))
            # the component vector is total (every vertex id) — build
            # the new vector from it with one outer join against the
            # aggregated neighbor-min table. The previous component is
            # carried as `old` so the fixpoint probe is a column agg
            # over the checkpointed vector, not another join. On the
            # broadcast tier the AGGREGATED nbr_min (≤|V| rows) is the
            # broadcast build side of a LEFT join from the vector
            # (re-measured r11 session 2: the r10/r11 right-join-with-
            # broadcast-vector shape never actually broadcast — a
            # build-RIGHT hint on a RIGHT outer join is unsupported
            # ("HintErrorLogger: not supported ... build right for
            # right outer join") and Catalyst fell back to a
            # SortMergeJoin with two per-round exchanges + sorts; the
            # supported broadcast costs one nbr_min build sub-job per
            # round and measured ~20% faster per round on the int
            # tier: 0.417 vs 0.528 s best at sf0.1). Exact on every
            # path — components and the delta are min/least/count,
            # no floats.
            vec = comp.withColumnRenamed("component", "old")
            if bcast:
                new = (vec.join(F.broadcast(nbr_min), on="id",
                                how="left")
                       .select("id", F.col("old"),
                               F.least("old",
                                       F.coalesce("nbr_comp", "old"))
                               .alias("component")))
            else:
                new = (vec.join(nbr_min, on="id", how="left")
                       .select("id", F.col("old"),
                               F.least("old",
                                       F.coalesce("nbr_comp", "old"))
                               .alias("component")))
            if fixed_rounds is None:
                # lazy checkpoint: the delta agg scans EVERY partition
                # (a limit-probe would materialize only some), so the
                # round's compute runs exactly once, in this one job
                new = checkpointed(new, eager=False)
                delta = new.agg(F.sum(
                    (F.col("component") != F.col("old")).cast("int"))
                    .alias("d")).collect()[0]["d"]
                comp = new.select("id", "component")
                # round k materialized — free round k-1's blocks now
                # (see page_rank: keeps long loops flat, no residue)
                release_ckpt(prev)
                prev = new
                if not delta:
                    converged = True
                    break
            else:
                comp = iterate_hygiene(new.select("id", "component"),
                                       k + 1, every=3)
                # only when this round MATERIALIZED a new checkpoint is
                # the previous one dead (non-checkpoint rounds still
                # derive lazily from prev)
                if getattr(comp, "_ckpt_jrdd", None) is not None:
                    release_ckpt(prev)
                    prev = comp
    if int_tier:
        # decode both long columns back to vertex ids (two broadcast
        # joins against the checkpointed index; exact — see above)
        d1 = idx.select(F.col("vi").alias("id"),
                        F.col("id").alias("__sid"))
        d2 = idx.select(F.col("vi").alias("component"),
                        F.col("id").alias("__scomp"))
        comp = (comp.join(F.broadcast(d1), on="id")
                .join(F.broadcast(d2), on="component")
                .select(F.col("__sid").alias("id"),
                        F.col("__scomp").alias("component")))
    comp = checkpointed(comp)
    release_ckpt(prev)
    if int_tier:
        release_ckpt(idx)
    adj.unpersist()
    if not converged:
        # SILENTLY returning a partial propagation splits one true
        # component into several labels (review r06: bites exactly the
        # >50M-edge graphs where the distributed path is mandatory and
        # diameter can exceed the cap). Fail loudly and point to the
        # diameter-independent variant.
        raise RuntimeError(
            f"wcc: min-label propagation did not converge within "
            f"max_rounds={max_rounds} (graph diameter exceeds the "
            "cap) — raise max_rounds or use wcc_star, whose "
            "large-star/small-star contraction converges in "
            "O(log d) rounds")
    return comp


def wcc_star(graph: PropertyGraph, labels: list[str] | None = None,
             max_rounds: int = 50) -> DataFrame:
    """Large-star/small-star connected components (Kiveris et al.,
    "Connected Components in MapReduce and Beyond") — the 100 TB
    path: O(log²) alternation rounds independent of graph DIAMETER,
    where plain min-label propagation (`wcc`) needs diameter rounds.
    Converges to the same answer — component = lexicographic min
    reachable id — so the two are interchangeable and oracle-checked
    against each other.

    Each phase is one groupBy-min + one join over the current edge
    set; the edge set shrinks toward a star forest centered at each
    component's minimum. Returns (id, component).
    """
    und = checkpointed(
        graph.adj(BOTH, labels).select(
            F.col("src").alias("u"), F.col("dst").alias("v"))
        .filter(F.col("u") != F.col("v")).distinct())
    edges = und

    def _mins(adj: DataFrame) -> DataFrame:
        # m(u) = min(N(u) ∪ {u})
        return (adj.unionByName(adj.select(F.col("u"),
                                           F.col("u").alias("v")))
                .groupBy("u").agg(F.min("v").alias("m")))

    for k in range(max_rounds):
        # ---- large-star: (v, m(u)) for v ∈ N(u), v > u
        adj = edges.unionByName(
            edges.select(F.col("v").alias("u"), F.col("u").alias("v")))
        mins = _mins(adj)
        large = (adj.join(mins, on="u")
                 .filter(F.col("v") > F.col("u"))
                 .select(F.col("v").alias("u"), F.col("m").alias("v"))
                 .filter(F.col("u") != F.col("v")).distinct())
        # ---- small-star: (v, m(u)) for v ∈ N(u), v ≤ u  ∪  (u, m(u))
        adj2 = large.unionByName(
            large.select(F.col("v").alias("u"), F.col("u").alias("v")))
        mins2 = _mins(adj2)
        small = (adj2.join(mins2, on="u")
                 .filter(F.col("v") <= F.col("u"))
                 .select(F.col("v").alias("u"), F.col("m").alias("v"))
                 .unionByName(mins2.select("u", F.col("m").alias("v")))
                 .filter(F.col("u") != F.col("v")).distinct())
        small = checkpointed(small)
        # fixpoint: the undirected edge multiset is stable
        changed = (small.unionByName(edges)
                   .groupBy("u", "v").agg(F.count(F.lit(1)).alias("c"))
                   .filter(F.col("c") == 1).limit(1).count())
        edges = small
        if changed == 0:
            break
    # star forest: every non-root u has its component as neighbor min;
    # roots (and isolated vertices) are their own component
    comp = edges.groupBy("u").agg(F.min("v").alias("component")) \
        .withColumnRenamed("u", "id")
    out = (graph.vertices.select("id")
           .join(comp, on="id", how="left")
           .select("id", F.coalesce("component", F.col("id"))
                   .alias("component")))
    return checkpointed(out)
