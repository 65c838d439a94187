#!/usr/bin/env python
"""Benchmark harness (driver contract): runs the B1-B10 query set from
BASELINE.md §2 at $SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1)
on local[$SPARK_GRAFT_CPUS] and prints ONE JSON line:

    {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Each query is forced with a cheap terminal action (count) — results
stay distributed; nothing wide is collected.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def _sf(sf_dir: str) -> float:
    import re
    # anchored numeric form — 'sf0.1.bak'-style names must not feed
    # float() a two-dot run and kill the final JSON line (infra
    # review r06)
    m = re.search(r"sf(\d+(?:\.\d+)?)", sf_dir)
    return float(m.group(1)) if m else -1.0


def main() -> None:
    from incubator_hugegraph_spark.session import get_spark
    from incubator_hugegraph_spark.sources.tpch import build_graph
    from incubator_hugegraph_spark.functions.conditions import P
    from incubator_hugegraph_spark.operators.bfs import bfs
    from incubator_hugegraph_spark.operators.paths import (
        multi_node_shortest_path)
    from incubator_hugegraph_spark.operators.similarity import (
        fusiform_similarity, jaccard_top_batch)
    from incubator_hugegraph_spark.algorithms.pagerank import page_rank
    from incubator_hugegraph_spark.algorithms.wcc import wcc
    from incubator_hugegraph_spark.algorithms.community import triangle_count
    from incubator_hugegraph_spark.algorithms.centrality import (
        degree_centrality)
    from incubator_hugegraph_spark.algorithms.stats import (
        count_edge, count_vertex)
    from pyspark.sql import functions as F

    spark = get_spark("bench")
    graph = build_graph(spark, SF_DIR)
    graph.vertices = graph.vertices.persist()
    graph.edges = graph.edges.persist()
    graph.vertices.count()
    graph.edges.count()
    # untimed allocator warmup (r11, guide §5): this host class
    # discards pages a process returns (virtio free-page reporting)
    # and re-provides fresh ones at 7-11 MB/s under host pressure —
    # the first RamTable kernel rep was paying 90-165 s of first-touch
    # page faults (b9 reps [121.5, 5.3, 3.6] in the r10 driver record,
    # [94.9, 2.7, 1.3] / [91.9, 1.5, 1.1] in two quiet-host runs of
    # the same tree). Acquire the numpy pool's pages once here, in
    # setup; the glibc thresholds retain them for every kernel. This
    # computes nothing and caches nothing — timed methodology (same
    # queries, same count() action, same best-of-N) is unchanged.
    from incubator_hugegraph_spark._alloc import (warm_allocator,
                                                  warm_jvm_heap)
    warm_allocator()
    warm_jvm_heap(spark)
    # untimed JVM warmup: exercise the codegen/join/agg paths once so
    # b1 doesn't absorb first-query JIT compilation (standard harness
    # practice; per-query numbers then measure the queries)
    (graph.edges.groupBy("label").count()
     .join(graph.vertices.groupBy("label").count(), on="label", how="left")
     .count())
    bfs(graph, [f"customer!{i}" for i in range(5)], depth=1,
        direction="OUT").count()

    cust100 = [f"customer!{i}" for i in range(100)]
    # 10 customers × 10 parts → 100 customer→part shortest paths over
    # the OUT-directed customer→order→part chain (BASELINE.md B4)
    mnsp_ids = ([f"customer!{i}" for i in range(10)]
                + [f"part!{i}" for i in range(10)])

    def b1():
        return count_vertex(graph).count() + count_edge(graph).count()

    def b2():
        return (graph.view("part")
                .filter(P.gte("size", 20) & P.text_contains("name", "green"))
                .count())

    def b3():
        return bfs(graph, cust100, depth=3, direction="OUT").count()

    def b4():
        return multi_node_shortest_path(graph, mnsp_ids, max_depth=3,
                                        direction="OUT").count()

    def b5():
        return jaccard_top_batch(graph, cust100, top=20).count()

    def b6():
        return page_rank(graph, alpha=0.15, max_times=20,
                         precision=1e-4).count()

    def b7():
        return wcc(graph).count()

    def b8():
        return triangle_count(graph).count()

    def b9():
        return fusiform_similarity(graph, "customer", direction="OUT",
                                   min_neighbors=2, alpha=0.8,
                                   min_similars=1, top=20).count()

    def b10():
        return degree_centrality(graph, direction="BOTH", top=100).count()

    queries = {"b1": b1, "b2": b2, "b3": b3, "b4": b4, "b5": b5,
               "b6": b6, "b7": b7, "b8": b8, "b9": b9, "b10": b10}

    from incubator_hugegraph_spark.graph import free_scratch

    timings: dict[str, float] = {}
    all_reps: dict[str, list[float]] = {}
    # best-of-2: the host carries external load bursts that can
    # multiply a single run 3-10x (a cached-count query has been
    # observed at 21 s); the better of two runs measures the query,
    # not the burst. b8/b9/b10 get a third rep (r03 verdict item 8):
    # their r03 +1-13% wiggle was measurement noise — pin it visibly.
    # Every rep is recorded in the JSON's "reps" key so variance is
    # attributable (r04 verdict item 3: the whole suite drifted
    # +15-30% on an environment burst and only best values were kept).
    _REPS = {"b8": 3, "b9": 3, "b10": 3}
    for name, fn in queries.items():
        reps: list[float] = []
        for _ in range(_REPS.get(name, 2)):
            t0 = time.monotonic()
            fn()
            reps.append(round(time.monotonic() - t0, 3))
            # the query's result is consumed (count above): drop its
            # checkpointed intermediates so dead frontier/vector
            # blocks don't pile up in storage memory across the suite
            # (a real service would do the same between requests)
            free_scratch(spark)
        all_reps[name] = reps
        timings[name] = min(reps)
        print(f"  {name}: {timings[name]}s {reps}", file=sys.stderr)

    # extra surfaces (round 2) measured at the same SF — reported in a
    # separate key so `value`/`queries` stay the BASELINE.md B1-B10
    # contract the driver compares across rounds
    from incubator_hugegraph_spark.cypher import cypher
    from incubator_hugegraph_spark.data.dedup import minhash_lsh_pairs
    from incubator_hugegraph_spark.data.similarity import cosine_topk_np
    from incubator_hugegraph_spark.gremlin_text import eval_gremlin

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")

    def x_cypher():
        return cypher(graph, """
            MATCH (c:customer)-[:placed]->(o:order)-[:contains]->(p:part)
            WHERE p.size >= 40
            RETURN count(DISTINCT c) AS n""").count()

    def x_gremlin():
        return eval_gremlin(
            graph, "g.V().hasLabel('part').has('size', gte(40))"
                   ".in('contains').dedup().count()").count()

    def x_minhash():
        # profiled r09 (verdict item 4): ~all of the ~6.6 s is the
        # 64-permutation signature aggregation over the exploded
        # shingle table (signatures 8.3 s warm standalone; banding +
        # candidate join + verify ~0) — intrinsic compute, and the
        # Arrow/numpy partial-min variant already measured slower at
        # this SF (see the NOTE in dedup.minhash_signatures). No
        # cheap structural win; flat r06-r08 confirms.
        return minhash_lsh_pairs(docs, threshold=0.3).count()

    def x_ann():
        return cosine_topk_np(emb, [0, 1, 2, 3, 4], 10).count()

    def x_ann_ivf():
        # the 100 TB ANN path: bucketed IVF probe + exact re-rank —
        # measured per-round alongside the brute-force baseline
        from incubator_hugegraph_spark.data.similarity import ivf_topk
        return ivf_topk(emb, [0, 1, 2, 3, 4], 10).count()

    def x_bpe():
        from incubator_hugegraph_spark.data.text import bpe_pair_counts
        return bpe_pair_counts(docs).count()

    def x_chunks():
        from incubator_hugegraph_spark.data.sample import chunk_docs
        return chunk_docs(docs).count()

    def x_media_decode():
        # the r06 real-decode tier: render genuine PNG/WAV/AVI
        # containers and decode them back (inflate+unfilter / PCM
        # unpack / movi walk) to exact pixel stats — measured
        # per-round so the mapInPandas encode/decode cost is tracked.
        # repartition models the many-split layout a blob store gives
        # (the sf fixture is one parquet file = one task otherwise).
        # r07 drift attribution (r08 interleaved git-archive A/B,
        # best-of-3 × 2 rounds): r06 tree 0.97/0.80 s vs current
        # 0.96/0.95 s — overlapping, both at the r06 driver reading
        # (0.92 s), so the r07 1.44 s was host drift, and the shared
        # decode dispatch (commit eac3334) costs nothing measurable.
        from incubator_hugegraph_spark.data.multimodal import (
            decode_media, media_docs_as_assets)
        nparts = int(spark.sparkContext.defaultParallelism)
        return decode_media(
            media_docs_as_assets(docs.repartition(nparts))).count()

    def x_mjpeg_decode():
        # r08 compressed-video tier: render genuine Motion-JPEG AVIs
        # (1-3 baseline-JPEG frames per doc) and decode every frame
        # back to exact pixel stats — the per-frame Huffman+IDCT cost
        # of the last modality to leave the stub, tracked per-round.
        # Rides the same render adapter as the driver query (review
        # r08 dedup), repartitioned to model a many-split blob store.
        import __spark_entry__ as _entry
        from incubator_hugegraph_spark.data.multimodal import (
            decode_media, render_media_mjpeg)
        nparts = int(spark.sparkContext.defaultParallelism)
        assets = _entry._rendered_assets(
            spark, SF_DIR, "video",
            lambda aid, n: render_media_mjpeg(aid, 1 + n % 3,
                                              1 + n % 4, 1 + n % 2),
            nparts=nparts)
        return decode_media(assets).count()

    def x_paragraph_dedup():
        # r06 paragraph-dedup kernel (RefinedWeb line-wise policy):
        # md5-keyed duplicate-paragraph agg + anti-join + per-doc
        # array_sort reassembly — tracked per-round like the other
        # dedup kernels (r06 verdict item 8)
        from incubator_hugegraph_spark.data.dedup import (
            paragraph_dedup, word_window_paragraphs)
        paras = word_window_paragraphs(
            docs.select("doc_id", "text"), words=16)
        return paragraph_dedup(paras, min_docs=2, sep="|").count()

    def x_image_neardup():
        # r06 perceptual image near-dup: real PNG render + decode +
        # dHash + chunked-Hamming bucket join (same planted-group
        # builder the driver query uses)
        import __spark_entry__ as _entry
        from incubator_hugegraph_spark.data.dedup import (
            hamming_near_pairs)
        from incubator_hugegraph_spark.data.multimodal import image_dhash
        assets = _entry._planted_image_assets(spark, SF_DIR)
        return hamming_near_pairs(image_dhash(assets), max_hamming=3,
                                  hash_col="dhash",
                                  id_col="asset_id").count()

    def x_stream_window():
        import uuid
        from incubator_hugegraph_spark.streaming.events import (
            run_stream_window_agg)
        return run_stream_window_agg(
            spark, f"{SF_DIR}/events.parquet",
            name="bsw_" + uuid.uuid4().hex[:8]).count()

    def x_stream_cms():
        import uuid
        from incubator_hugegraph_spark.streaming.events import (
            run_stream_heavy_hitters)
        return run_stream_heavy_hitters(
            spark, f"{SF_DIR}/events.parquet",
            name="bsc_" + uuid.uuid4().hex[:8]).count()

    # incremental-WCC streaming fold (r05 verdict item 8): the
    # foreachBatch cost of folding micro-batches of edges into the
    # component state — the backfill path a 100 TB edge stream takes.
    # The edge files are written ONCE (untimed, below) so the timed
    # section is readStream → fold → fixpoint only.
    import tempfile as _tf
    _wcc_dir = _tf.mkdtemp(prefix="bench_swcc_")
    (graph.adj("OUT", ["interacted"]).select("src", "dst").distinct()
     .repartition(4).write.mode("overwrite")
     .parquet(f"{_wcc_dir}/edges"))

    def x_stream_wcc():
        # profiled r09 (verdict item 4): ~7.3 s = 4 micro-batches x
        # ~1.5 s of per-batch orchestration (pairs collect + remap
        # join + localCheckpoint + O(|state|) snapshot write — the
        # state is 1,500 rows here, so the cost is fixed per-batch
        # scheduling, not data) + 0.5 s Structured-Streaming engine
        # overhead (manual 4-batch fold 9.3 s cold vs streamed
        # 9.8 s, same process). Amortizes at real batch sizes; wcc
        # keeps full snapshots by design (mutating state). No cheap
        # win; flat r06-r08 confirms.
        import uuid
        from incubator_hugegraph_spark.streaming.incremental import (
            incremental_wcc_stream)
        q, get_state = incremental_wcc_stream(
            spark, f"{_wcc_dir}/edges",
            f"{_wcc_dir}/ckpt_{uuid.uuid4().hex[:8]}",
            max_files_per_trigger=1)
        q.awaitTermination()
        return get_state().count()

    # engine='dist' twins of B3-B9 (round-3 verdict item 6): the B
    # numbers exercise the auto→RamTable tier at this SF; these pin the
    # DISTRIBUTED plans — the 100 TB path — so their round-over-round
    # regression is measured, not just the kernel tier's.
    def b3_dist():
        return bfs(graph, cust100, depth=3, direction="OUT",
                   engine="dist").count()

    def b4_dist():
        return multi_node_shortest_path(graph, mnsp_ids, max_depth=3,
                                        direction="OUT",
                                        engine="dist").count()

    def b5_dist():
        return jaccard_top_batch(graph, cust100, top=20,
                                 engine="dist").count()

    def b6_dist():
        return page_rank(graph, alpha=0.15, max_times=20,
                         precision=1e-4, engine="dist").count()

    def b7_dist():
        return wcc(graph, engine="dist").count()

    def b8_dist():
        return triangle_count(graph, engine="dist").count()

    def b9_dist():
        return fusiform_similarity(graph, "customer", direction="OUT",
                                   min_neighbors=2, alpha=0.8,
                                   min_similars=1, top=20,
                                   engine="dist").count()

    # persisted IVF+PQ serving path (r09): the index builds ONCE
    # (untimed, the index-once/query-many regime) and the timed
    # section is probe -> ADC shortlist -> exact re-rank
    _pq_dir = _tf.mkdtemp(prefix="bench_pq_")
    from incubator_hugegraph_spark.data.ann_index import (
        ivf_pq_index_topk, write_ivf_pq_index)
    write_ivf_pq_index(emb, f"{_pq_dir}/pq", n_cells=16, m_sub=8,
                       n_codes=16)
    _pq_qvecs = [(int(r["vec_id"]), [float(x) for x in r["embedding"]])
                 for r in emb.filter(F.col("vec_id") <= 4).collect()]

    def x_ann_pq():
        return ivf_pq_index_topk(spark, f"{_pq_dir}/pq", _pq_qvecs,
                                 10, n_probe=4, rerank=96).count()

    # maintenance-path twin (r11, r10 verdict item 6): build → 3
    # streaming appends → compact_index, ALL untimed (index
    # maintenance, not query work); the timed section is the same
    # probe against the COMPACTED index, pinning the files/cell
    # 1+B → 1 probe-latency claim in the driver record instead of
    # pytest alone
    _pqc_dir = _tf.mkdtemp(prefix="bench_pqc_")
    from incubator_hugegraph_spark.data.ann_index import (
        append_ivf_pq_index, compact_index)
    write_ivf_pq_index(emb, f"{_pqc_dir}/pq", n_cells=16, m_sub=8,
                       n_codes=16)
    for _b in range(3):
        append_ivf_pq_index(
            emb.filter(F.col("vec_id") % 3 == _b)
            .select((F.col("vec_id") + 1_000_000 * (_b + 1))
                    .alias("vec_id"), "embedding"),
            f"{_pqc_dir}/pq", batch_id=_b)
    compact_index(spark, f"{_pqc_dir}/pq")

    def x_ann_pq_compacted():
        return ivf_pq_index_topk(spark, f"{_pqc_dir}/pq", _pq_qvecs,
                                 10, n_probe=4, rerank=96).count()

    extra: dict[str, float] = {}
    for name, fn in [("x_cypher", x_cypher), ("x_gremlin", x_gremlin),
                     ("x_minhash_lsh", x_minhash), ("x_ann_np", x_ann),
                     ("x_ann_ivf", x_ann_ivf), ("x_ann_pq", x_ann_pq),
                     ("x_ann_pq_compacted", x_ann_pq_compacted),
                     ("x_bpe", x_bpe), ("x_chunks", x_chunks),
                     ("x_media_decode", x_media_decode),
                     ("x_mjpeg_decode", x_mjpeg_decode),
                     ("x_paragraph_dedup", x_paragraph_dedup),
                     ("x_image_neardup", x_image_neardup),
                     ("x_stream_window", x_stream_window),
                     ("x_stream_cms", x_stream_cms),
                     ("x_stream_wcc", x_stream_wcc),
                     ("b3_dist", b3_dist), ("b4_dist", b4_dist),
                     ("b5_dist", b5_dist), ("b6_dist", b6_dist),
                     ("b7_dist", b7_dist), ("b8_dist", b8_dist),
                     ("b9_dist", b9_dist)]:
        # best-of-2, same rationale as the B suite; the *_dist twins
        # (the 100 TB path — their regression matters most) and the
        # drift-prone x_minhash_lsh get best-of-3 (r04 verdict items
        # 3/8: b7_dist sat 8.55 vs an 8.70 baseline inside a ±30%
        # noise band — one unlucky rep would read as a breach)
        n_reps = 3 if name.endswith("_dist") or name == "x_minhash_lsh" \
            else 2
        reps = []
        for _ in range(n_reps):
            t0 = time.monotonic()
            fn()
            reps.append(round(time.monotonic() - t0, 3))
            free_scratch(spark)
        all_reps[name] = reps
        extra[name] = min(reps)
        print(f"  {name}: {extra[name]}s {reps}", file=sys.stderr)

    total = round(sum(timings.values()), 3)
    print(json.dumps({"metric": "bench_total_wall", "value": total,
                      "unit": "sec", "queries": timings,
                      "extra": extra, "reps": all_reps, "sf": _sf(SF_DIR)}))


if __name__ == "__main__":
    main()
