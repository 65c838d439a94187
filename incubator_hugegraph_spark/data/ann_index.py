"""Persisted ANN indexes with partition-pruned query reads (r07).

`ivf_topk` / `lsh_ann_topk` recompute their bucket structure per
call — right for one-shot jobs, wrong for the index-once/query-many
regime a 100 TB corpus lives in. This module is the write-side
counterpart the similarity-module docstrings promise: the bucket
table lands as parquet PARTITIONED BY its bucket key, and the query
path computes the query's buckets DRIVER-SIDE (the centroid table /
hyperplane signatures are tiny, pure Python) so the scan carries a
partition filter — Spark reads n_probe cells (IVF) or the queries'
buckets (LSH) and never the corpus. The pruning is plan-visible
(PartitionFilters on the scan; asserted in tests) and the results
are row-identical to the in-memory kernels by construction: the
SAME _assign_cells/plane functions, the same (sim desc, id asc)
re-rank.

Index parameters (dim, n_planes, n_tables) persist in a `meta`
side-file at build time and are REREAD at query time — a query can
never silently hash with different planes than the index was built
with (review r07: the in-memory kernel gained exactly this guard in
r06 for the dim-mismatch silent-collapse failure).

r09 adds the PRODUCT-QUANTIZATION tier on top of IVF
(write_ivf_pq_index / ivf_pq_index_topk): candidates in the probed
cells are scored from m_sub-byte codes + a per-query driver-side
lookup table (asymmetric distance, Jégou et al. TPAMI 2011) before
the exact re-rank touches any full vector — the memory-bounded
candidate-scoring shape a 100 TB embedding store needs between
partition pruning and exact re-rank.

Reference behavior parity: none — the reference (hugegraph) has no
vector tier; this serves the training-data-pipeline brief.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from incubator_hugegraph_spark.data.similarity import (
    _N_PLANES,
    _N_TABLES,
    _assign_cells,
    _to_double,
    _topk_per_query,
    SALT_TOPK_MIN_CORPUS,
    cosine,
    kmeans_centroids,
    lsh_buckets,
    plane,
)


def _write_ivf_base(emb: DataFrame, path: str, n_cells: int,
                    id_col: str, vec_col: str, n_iters: int,
                    caller: str, checkpoint: bool = False,
                    dim: int | None = None):
    """THE shared vectors/centroids persist block of write_ivf_index
    and write_ivf_pq_index (r09 review: the batch=-1 layout and the
    PINNED static overwrite — the subtle r08 stale-partition fix —
    must exist exactly once). Returns (assigned, cents, dim);
    ``checkpoint`` materializes the corpus-wide cell assignment
    BEFORE the vectors write so a caller that consumes it again
    (the PQ code pass) computes it once.

    batch=-1 marks the initial build; appends add batch=<id>
    partitions at the SAME depth (parquet partition discovery
    requires uniform directory structure). cell stays the FIRST
    level, so probe pruning is unaffected. Overwrite mode is PINNED
    static (review r08): "mode(overwrite)" alone inherits the
    session's partitionOverwriteMode, and under a dynamic session
    conf (common in insertInto ingest pipelines) a rebuild at a
    previously-appended path would keep stale batch=N partitions —
    the exact hazard the LSH build fix closed."""
    base = emb.select(F.col(id_col).alias("id"),
                      _to_double(vec_col).alias("v"))
    if dim is None:
        # callers that already probed the corpus (PQ's divisibility
        # check) pass dim in — no second first() job (r09 review)
        row = emb.select(vec_col).first()
        if row is None:
            raise ValueError(f"{caller}: empty corpus")
        dim = len(row[0])
    cents = kmeans_centroids(base, n_cells, dim, n_iters)
    assigned = _assign_cells(base, cents).select("id", "v", "cell")
    if checkpoint:
        assigned = assigned.localCheckpoint()
    (assigned.withColumn("batch", F.lit(-1))
     .write.mode("overwrite")
     .option("partitionOverwriteMode", "static")
     .partitionBy("cell", "batch")
     .parquet(f"{path}/vectors"))
    cents.write.mode("overwrite").parquet(f"{path}/centroids")
    return assigned, cents, dim


def write_ivf_index(emb: DataFrame, path: str, n_cells: int = 16,
                    id_col: str = "vec_id",
                    vec_col: str = "embedding",
                    n_iters: int = 0) -> None:
    """Build and persist an IVF index: vectors assigned to their
    nearest centroid land under ``path``/vectors partitioned by
    `cell` (one directory per inverted list — the layout that makes
    a probe a partition-pruned read); centroids land beside them
    (``path``/centroids, n_cells rows — driver-sized forever).
    Same deterministic centroids and the SAME _assign_cells kernel
    as ivf_topk, so indexed queries reproduce the in-memory kernel
    row-for-row."""
    _, _, dim = _write_ivf_base(emb, path, n_cells, id_col, vec_col,
                                n_iters, "write_ivf_index")
    emb.sparkSession.createDataFrame([(dim,)], "dim int") \
        .write.mode("overwrite").parquet(f"{path}/meta")


def _read_meta(spark: SparkSession, path: str) -> dict | None:
    """Read the index meta side-file; None when absent (an index
    persisted before the meta file existed — callers fall back to
    inference/defaults instead of failing with an opaque
    PATH_NOT_FOUND, review r07)."""
    try:
        row = spark.read.parquet(f"{path}/meta").first()
        return dict(row.asDict()) if row is not None else None
    except Exception:
        return None


def _cos_py(a: list[float], b: list[float]) -> float:
    """Driver-side cosine, shared by every probe path (r09 review:
    the tie-break-sensitive probe idiom must not fork)."""
    import math
    num = sum(x * y for x, y in zip(a, b))
    den = math.sqrt(sum(x * x for x in a)) \
        * math.sqrt(sum(x * x for x in b))
    return num / den if den > 0 else 0.0


def _probe_cells_driver(cents: list, query_vecs: list,
                        n_probe: int):
    """Rank every query's n_probe nearest cells DRIVER-SIDE — the
    shared probe of ivf_index_topk and ivf_pq_index_topk (same
    tie-break as ivf_topk's F.asc("cell"): raw cell value, never a
    string key). Returns (probe_cells set, [(qid, qv, cells)])."""
    probe_cells: set = set()
    q_probe = []
    for qid, qv in query_vecs:
        qv = [float(x) for x in qv]
        ranked = sorted(((_cos_py(qv, cv), cell) for cell, cv in cents),
                        key=lambda t: (-t[0], t[1]))[:n_probe]
        cells = [cell for _, cell in ranked]
        probe_cells.update(cells)
        q_probe.append((qid, qv, cells))
    return probe_cells, q_probe


def ivf_index_topk(spark: SparkSession, path: str,
                   query_ids: list[int] | None = None, k: int = 10,
                   n_probe: int = 4,
                   query_vecs: list[tuple[int, list[float]]]
                   | None = None) -> DataFrame:
    """Query a persisted IVF index: the centroid table (n_cells rows)
    collects to the driver, each query's n_probe nearest cells are
    chosen THERE, and the vector scan carries
    `cell IN (<probed cells>)` — a PartitionFilter, so Spark lists
    and reads only those directories. Exact cosine re-rank within
    the probed cells; row-identical to ivf_topk under the same
    build configuration. Returns (query_id, neighbor_id, sim).

    Pass EXACTLY ONE of ``query_ids`` (by-id lookup — one unpruned
    pass over the vectors, fine for parity checks, wrong as the
    steady-state serving path) or ``query_vecs`` [(id, vector), ...]
    (zero corpus IO — the 100 TB query path)."""
    if (query_ids is None) == (query_vecs is None):
        raise ValueError(
            "ivf_index_topk: pass exactly one of query_ids/query_vecs")
    meta = _read_meta(spark, path)
    cents = [(r["cell"], list(r["cv"])) for r in
             spark.read.parquet(f"{path}/centroids").collect()]
    # meta-less (pre-r07) indexes: the centroid table carries the dim
    dim = int(meta["dim"]) if meta else len(cents[0][1])
    vectors = spark.read.parquet(f"{path}/vectors")
    if query_vecs is None:
        query_vecs = [(r["id"], list(r["v"])) for r in
                      (vectors.filter(F.col("id").isin(query_ids))
                       .select("id", "v").collect())]
    for qid, qv in query_vecs:
        if len(qv) != dim:
            raise ValueError(
                f"ivf_index_topk: query {qid} is {len(qv)}-dim but "
                f"the index was built at dim={dim}")
    probe_cells, q_probe = _probe_cells_driver(cents, query_vecs,
                                               n_probe)
    if not q_probe:
        return (vectors.select(F.col("id").alias("query_id"),
                               F.col("id").alias("neighbor_id"),
                               F.lit(0.0).alias("sim")).limit(0))
    # the IN-list on the PARTITION column is the whole point: the
    # file index prunes to |probe_cells| directories before any IO.
    # one (query, probed cell) row each → plain equi-join on the
    # partition column (hash join), not a nested-loop array probe.
    # cell rides the id column's type (long — review r07: an int
    # schema rejected snowflake/hash-style ids at query time).
    pruned = vectors.filter(F.col("cell").isin(*probe_cells))
    qdf = spark.createDataFrame(
        [(qid, qv, c) for qid, qv, cells in q_probe for c in cells],
        "query_id long, qv array<double>, cell long")
    cand = (pruned.join(F.broadcast(qdf), on="cell")
            .filter(F.col("id") != F.col("query_id")))
    scored = cand.withColumn(
        "sim", F.round(cosine(F.col("qv"), F.col("v")), 6))
    probe = pruned.limit(SALT_TOPK_MIN_CORPUS).count()
    return _topk_per_query(scored, k, max_candidates=probe)


def write_lsh_index(emb: DataFrame, path: str, dim: int,
                    id_col: str = "vec_id",
                    vec_col: str = "embedding",
                    n_planes: int = _N_PLANES,
                    n_tables: int = _N_TABLES,
                    store_vectors: bool = True) -> None:
    """Persist the hyperplane-LSH bucket table partitioned by
    (table, bucket) — the write-side index lsh_buckets' docstring
    describes: a query reads its buckets' directories, never the
    corpus. Build parameters land in a `meta` side-file the query
    path rereads, so query-time plane recomputation can never drift
    from the build.

    ``store_vectors`` picks the storage/IO tradeoff (review r07:
    the default duplicates every vector once per table —
    n_tables × corpus on disk):
      True  — vectors ride the bucket rows; a query's re-rank reads
              ONLY the pruned directories (zero extra IO, n_tables×
              storage).
      False — buckets store (id, table, bucket) only (≈1× storage)
              plus one (id, v) side table; the re-rank fetches
              candidate vectors with an id IN-list semi-filter —
              one bounded pass over the side table per query batch
              (parquet row-group stats skip non-matching groups)."""
    sig = lsh_buckets(emb, dim, id_col, vec_col, n_planes, n_tables)
    cols = ["id", "v", "table", "bucket"] if store_vectors \
        else ["id", "table", "bucket"]
    # batch=-1 marks the initial build (same uniform-depth rule as
    # the IVF layout); appends add batch=<id> at the same level
    # Build writes are PINNED to static overwrite (review r08, twice):
    # a BUILD must wipe the whole table, but "mode(overwrite)" alone
    # inherits the session's partitionOverwriteMode — under a dynamic
    # session conf a rebuild at a previously-appended path keeps stale
    # batch=N partitions, and the re-rank join on id then duplicates /
    # mis-scores candidates. Only append_* may use dynamic mode.
    (sig.select(*cols).withColumn("batch", F.lit(-1))
     .write.mode("overwrite")
     .option("partitionOverwriteMode", "static")
     .partitionBy("table", "bucket", "batch")
     .parquet(f"{path}/buckets"))
    if not store_vectors:
        (emb.select(F.col(id_col).alias("id"),
                    _to_double(vec_col).alias("v"))
         .withColumn("batch", F.lit(-1))
         .write.mode("overwrite")
         .option("partitionOverwriteMode", "static")
         .partitionBy("batch")
         .parquet(f"{path}/vectors"))
    spark = emb.sparkSession
    spark.createDataFrame(
        [(dim, n_planes, n_tables, store_vectors)],
        "dim int, n_planes int, n_tables int, store_vectors boolean") \
        .write.mode("overwrite").parquet(f"{path}/meta")


def lsh_index_topk(spark: SparkSession, path: str,
                   query_vecs: list[tuple[int, list[float]]],
                   k: int) -> DataFrame:
    """Query a persisted LSH index with explicit (query_id, vector)
    pairs: each query's per-table bucket is computed DRIVER-SIDE from
    the plane family recorded in the index's meta file (dim and
    plane counts are validated against every query vector — a
    mismatched vector raises instead of silently hashing into the
    wrong buckets, review r07), and the scan filter
    `(table, bucket) IN (...)` prunes to at most |Q|·L directories.
    Exact cosine re-rank within candidates; same (sim desc, id asc)
    order as lsh_ann_topk. Returns (query_id, neighbor_id, sim)."""
    meta = _read_meta(spark, path)
    if meta is None:
        raise ValueError(
            f"lsh_index_topk: no meta side-file under {path} — "
            "pre-r07 LSH indexes did not record their plane family; "
            "rebuild with write_lsh_index (plane drift between build "
            "and query silently empties results, so no guessing)")
    dim, n_planes, n_tables = (int(meta["dim"]), int(meta["n_planes"]),
                               int(meta["n_tables"]))
    store_vectors = bool(meta["store_vectors"])
    for qid, qv in query_vecs:
        if len(qv) != dim:
            raise ValueError(
                f"lsh_index_topk: query {qid} is {len(qv)}-dim but "
                f"the index was built at dim={dim}")
    planes = [[plane(t * n_planes + p, dim) for p in range(n_planes)]
              for t in range(n_tables)]

    def bucket_of(qv: list[float], t: int) -> int:
        sig = 0
        for p in range(n_planes):
            d = sum(x * y for x, y in zip(qv, planes[t][p]))
            if d >= 0:
                sig |= 1 << p
        return sig

    rows = []
    for qid, qv in query_vecs:
        qv = [float(x) for x in qv]
        for t in range(n_tables):
            rows.append((qid, qv, t, bucket_of(qv, t)))
    buckets = spark.read.parquet(f"{path}/buckets")
    if not rows:
        return (buckets.select(F.col("id").alias("query_id"),
                               F.col("id").alias("neighbor_id"),
                               F.lit(0.0).alias("sim")).limit(0))
    qdf = spark.createDataFrame(
        rows, "query_id long, qv array<double>, table int, bucket int")
    # struct-IN on the two partition columns → directory-level pruning
    keys = {(t, b) for _, _, t, b in rows}
    cond = F.struct(F.col("table"), F.col("bucket")).isin(
        *[F.struct(F.lit(t), F.lit(b)) for t, b in keys])
    pruned = buckets.filter(cond)
    cand = (pruned.join(F.broadcast(qdf), on=["table", "bucket"])
            .filter(F.col("id") != F.col("query_id"))
            .dropDuplicates(["query_id", "id"]))
    if not store_vectors:
        vectors = spark.read.parquet(f"{path}/vectors")
        # the documented id IN-list: candidate ids collect to the
        # driver while bounded, so the side-table scan carries a
        # pushed id filter (parquet row-group stats skip) — past the
        # bound, fall back to the plain join (one full pass over the
        # 1x side table; review r07: the docstring promised the
        # IN-list but the code always took the full pass)
        cand = cand.localCheckpoint()  # consumed twice below
        cid = [r["id"] for r in
               cand.select("id").distinct().limit(100_001).collect()]
        if len(cid) <= 100_000:
            vectors = vectors.filter(F.col("id").isin(cid))
        cand = cand.join(vectors, on="id")
    scored = cand.withColumn(
        "sim", F.round(cosine(F.col("qv"), F.col("v")), 6))
    probe = pruned.limit(SALT_TOPK_MIN_CORPUS).count()
    return _topk_per_query(scored, k, max_candidates=probe)


def append_ivf_index(emb_batch: DataFrame, path: str,
                     id_col: str = "vec_id",
                     vec_col: str = "embedding",
                     batch_id: int | None = None) -> None:
    """Fold a batch of NEW vectors into a persisted IVF index —
    index maintenance under ingest (the foreachBatch body for a
    streaming corpus): the batch is assigned against the FROZEN
    persisted centroids (same _assign_cells kernel, so an appended
    index is bit-identical to one built in a single shot with the
    same centroid set) and APPENDED to the cell directories.
    Dynamic-partition append touches only the batch's cells; the
    centroid and meta side-files are immutable after build. Periodic
    re-clustering (centroid drift) is a full rebuild by design —
    cheap relative to the corpus scan it needs anyway.

    ``batch_id`` makes the write IDEMPOTENT under foreachBatch's
    at-least-once replay (review r07: a plain append duplicates
    every vector when a batch re-runs after a driver crash, silently
    corrupting top-k): rows land under an extra batch=<id> partition
    level and a replayed batch dynamically OVERWRITES only its own
    partitions. Streaming callers must pass the micro-batch id;
    None = plain append (one-shot backfills only)."""
    spark = emb_batch.sparkSession
    meta = _read_meta(spark, path)
    if meta and "m_sub" in meta:
        # misuse door (r09 review wave 2): this append writes only
        # vectors/, but a PQ index's shortlist reads codes/ — the
        # appended vectors would be PERMANENTLY invisible to
        # ivf_pq_index_topk while ivf_index_topk still returned
        # them: silently wrong top-k, the worst failure shape
        raise ValueError(
            f"append_ivf_index: {path} is a PQ index (codes would "
            "desynchronize from vectors) — use append_ivf_pq_index, "
            "the codes-aware append")
    if _replay_of_compacted(spark, path, batch_id, emb_batch, id_col):
        return  # genuine replay of a batch compact_index folded
    base = emb_batch.select(F.col(id_col).alias("id"),
                            _to_double(vec_col).alias("v"))
    cents = spark.read.parquet(f"{path}/centroids")
    dim = int(meta["dim"]) if meta else \
        len(cents.select("cv").first()[0])
    # whole-batch guard, not a first-row sample (review r07: a
    # mixed-dim batch passed the old .first() check and null-padded
    # its way into the lowest cell)
    bad = base.filter(F.size("v") != dim).count()
    if bad:
        raise ValueError(
            f"append_ivf_index: {bad} batch vectors are not "
            f"{dim}-dim (index build dim)")
    assigned = _assign_cells(base, cents).select("id", "v", "cell")
    _append_partitioned(assigned, f"{path}/vectors", ["cell"],
                        batch_id)


def append_ivf_pq_index(emb_batch: DataFrame, path: str,
                        id_col: str = "vec_id",
                        vec_col: str = "embedding",
                        batch_id: int | None = None) -> None:
    """Fold a batch of NEW vectors into a persisted IVF+PQ index —
    the codes-aware append (r09): the batch is assigned against the
    FROZEN persisted centroids AND encoded against the FROZEN
    persisted codebooks (the same _pq_encode kernel the build uses),
    so vectors/ and codes/ stay synchronized and an appended index
    answers queries identically to a one-shot build with the same
    centroid/codebook set. Same ``batch_id`` idempotence contract as
    append_ivf_index (batch=<id> dynamic partition overwrite under
    foreachBatch's at-least-once replay); codebook drift is a full
    rebuild by design, like centroid drift."""
    spark = emb_batch.sparkSession
    meta = _read_meta(spark, path)
    if not meta or "m_sub" not in meta:
        raise ValueError(
            f"append_ivf_pq_index: {path} is not a PQ index — use "
            "append_ivf_index, or build with write_ivf_pq_index")
    if _replay_of_compacted(spark, path, batch_id, emb_batch, id_col):
        return  # genuine replay of a batch compact_index folded
    dim, m_sub = int(meta["dim"]), int(meta["m_sub"])
    residual = bool(meta.get("residual") or False)
    d_sub = dim // m_sub
    base = emb_batch.select(F.col(id_col).alias("id"),
                            _to_double(vec_col).alias("v"))
    bad = base.filter(F.size("v") != dim).count()
    if bad:
        raise ValueError(
            f"append_ivf_pq_index: {bad} batch vectors are not "
            f"{dim}-dim (index build dim)")
    cents = spark.read.parquet(f"{path}/centroids")
    books = spark.read.parquet(f"{path}/codebooks")
    assigned = _assign_cells(base, cents) \
        .select("id", "v", "cell").localCheckpoint()
    # codes FIRST (r09 review wave 3): the two writes are not
    # atomic, and the failure modes are asymmetric — an orphan codes
    # row (crash before the vectors write) drops harmlessly at the
    # exact re-rank's inner join on id, while an orphan VECTORS row
    # would be permanently invisible to the codes-driven shortlist
    # (silently wrong top-k). With batch_id the replay overwrites
    # both partitions anyway; batch_id=None (one-shot backfills)
    # relies on this ordering alone, so it fails safe.
    codes = _pq_encode(_pq_quant_target(assigned, cents, residual),
                       books, m_sub, d_sub)
    _append_partitioned(codes, f"{path}/codes", ["cell"], batch_id)
    _append_partitioned(assigned, f"{path}/vectors", ["cell"],
                        batch_id)


def _pq_quant_target(assigned: DataFrame, cents: DataFrame,
                     residual: bool) -> DataFrame:
    """Quantization target per vector: the vector itself, or
    (residual scheme) v − centroid[cell] — elementwise zip_with
    against the broadcast centroid table, the exact dot(q, centroid)
    re-entering at query time. Shared by build and append so the two
    can never quantize differently."""
    if residual:
        return (assigned.join(F.broadcast(cents), on="cell")
                .select("id", "cell", "v",
                        F.zip_with("v", "cv", lambda a, b: a - b)
                        .alias("q")))
    return assigned.select("id", "cell", "v", F.col("v").alias("q"))


def _pq_encode(quant: DataFrame, books: DataFrame, m_sub: int,
               d_sub: int) -> DataFrame:
    """Code assignment in ONE exploded pass (not m_sub sequential
    id-joins): (id, s, subvector) rows x broadcast books, argmax
    cosine per (id, s) with the _assign_cells tie-break (best
    similarity, then lowest code), then fold back to one codes array
    per vector. One shuffle regardless of m_sub. Shared by
    write_ivf_pq_index and append_ivf_pq_index — an appended index
    must encode bit-identically to a one-shot build."""
    sub_all = quant.select(
        "id", "cell",
        F.sqrt(F.aggregate(F.transform("v", lambda x: x * x),
                           F.lit(0.0), lambda a, x: a + x))
        .alias("vnorm"),
        F.explode(F.array(*[
            F.struct(F.lit(s).alias("s"),
                     F.slice("q", s * d_sub + 1, d_sub).alias("sv"))
            for s in range(m_sub)])).alias("x")) \
        .select("id", "cell", "vnorm", "x.s",
                F.col("x.sv").alias("sv"))
    asg = (sub_all.join(F.broadcast(books), on="s")
           .withColumn("d", cosine(F.col("sv"), F.col("cv"))))
    w = Window.partitionBy("id", "s").orderBy(F.desc("d"),
                                              F.asc("code"))
    picked = (asg.withColumn("__rn", F.row_number().over(w))
              .filter(F.col("__rn") == 1)
              .select("id", "cell", "vnorm", "s", "code"))
    return (picked.groupBy("id", "cell")
            .agg(F.first("vnorm").alias("vnorm"),
                 F.transform(
                     F.array_sort(F.collect_list(
                         F.struct("s", "code"))),
                     lambda x: x["code"].cast("int")).alias("codes"))
            .select("id", "codes", "vnorm", "cell"))


def _compacted_batches(spark: SparkSession, path: str) -> set[int]:
    """Batch ids already folded into the batch=-1 base by
    compact_index — recorded so a replayed foreachBatch id cannot
    re-append rows the base now holds (dynamic overwrite of batch=N
    would no longer be idempotent once N's rows live under
    batch=-1). Cheap: existence check first, one tiny parquet read
    only on indexes that were ever compacted."""
    import os
    p = f"{path}/compacted"
    if not os.path.isdir(p):
        return set()
    return {int(r["batch"]) for r in spark.read.parquet(p).collect()}


def _batch_fingerprint(df: DataFrame, id_col: str) -> tuple[int, int]:
    """Order-independent content fingerprint of a batch's id set:
    (distinct-id count, bitwise XOR of xxhash64(id)). XOR, not sum —
    overflow-free under ANSI mode and partitioning-independent."""
    row = (df.select(F.col(id_col).cast("string").alias("i")).distinct()
           .agg(F.count(F.lit(1)).alias("n"),
                F.bit_xor(F.xxhash64("i")).alias("h")).collect()[0])
    return int(row["n"] or 0), int(row["h"] or 0)


def _replay_of_compacted(spark: SparkSession, path: str,
                         batch_id: int | None,
                         batch_df: DataFrame | None = None,
                         id_col: str = "vec_id") -> bool:
    """True = this append is a genuine REPLAY of a batch compact_index
    already folded — skip it (the base holds its rows). Advice r10:
    id membership alone cannot tell a replay from batch-id REUSE (a
    fresh stream checkpoint restarts ids at 0; its first appends
    would be silently discarded), so compact_index records a content
    fingerprint per folded batch (``compacted_fp`` side-file) and
    this guard compares the incoming batch against it — mismatch
    RAISES instead of dropping data. Indexes compacted before the
    fingerprint protocol warn and keep the skip (such an index is
    bound to one stream checkpoint lineage)."""
    if batch_id is None or \
            int(batch_id) not in _compacted_batches(spark, path):
        return False
    import os
    import warnings
    rec = None
    fp_dir = f"{path}/compacted_fp"
    if os.path.isdir(fp_dir):
        rows = (spark.read.parquet(fp_dir)
                .filter(F.col("batch") == int(batch_id)).collect())
        if rows:
            rec = (int(rows[0]["n"]), int(rows[0]["h"]))
    if rec is None:
        warnings.warn(
            f"append to {path}: batch_id {batch_id} is marked "
            "compacted but carries no content fingerprint (index "
            "compacted before the fingerprint protocol) — treating "
            "it as an engine replay and skipping; this index is "
            "bound to one stream checkpoint lineage",
            stacklevel=3)
        return True
    if batch_df is None:
        return True
    got = _batch_fingerprint(batch_df, id_col)
    if got != rec:
        raise ValueError(
            f"append to {path}: batch_id {batch_id} was already "
            f"folded by compact_index but the incoming batch differs "
            f"(fingerprint {got} != recorded {rec}) — this is "
            "batch-id REUSE (e.g. a new stream checkpoint restarting "
            "at 0), and skipping it would silently discard the "
            "batch; use fresh batch ids or a new index path")
    return True


def _heal_swap(path: str, sub: str) -> None:
    """Complete or roll back a crashed two-rename table swap (advice
    r10): compact_index swaps ``{sub}`` via ``{sub}.compact`` →
    rename({sub}, {sub}.old) → rename({sub}.compact, {sub}) →
    rm({sub}.old). A crash between the two renames leaves NO live
    table — every query fails and a naive re-run of compact_index
    would skip the table (no batch dirs found). Run at the top of
    compact_index: roll FORWARD when the rewritten table exists (it
    was fully written before the first rename), roll BACK otherwise,
    and clear stale siblings when the live table is present."""
    import os
    import shutil
    p = f"{path}/{sub}"
    tmp, old = p + ".compact", p + ".old"
    if os.path.isdir(p):
        # live table present: siblings are stale (a superseded .old
        # after a crash before its rm, or a .compact from a crash
        # before the first rename — re-derived by this run anyway)
        shutil.rmtree(old, ignore_errors=True)
        shutil.rmtree(tmp, ignore_errors=True)
        return
    if os.path.isdir(tmp):
        # crash between the two renames: the rewrite was complete
        os.rename(tmp, p)
        shutil.rmtree(old, ignore_errors=True)
    elif os.path.isdir(old):
        # defensive: no rewritten table to roll forward to
        os.rename(old, p)


def compact_index(spark: SparkSession, path: str) -> None:
    """Rewrite accumulated ``batch=N`` append partitions into the
    static ``batch=-1`` base (optimization r10; the r09 verdict's
    remaining ANN scale finding): every append adds one partition
    per cell (IVF/PQ) or per (table, bucket) (LSH) per batch, so a
    long ingest leaves cells × batches small files — double
    listing/open cost on every probe (guide §6). Compaction reads
    each table once and rewrites it as one file set under batch=-1,
    preserving the partition layout the probe pruning depends on;
    query results are row-identical (same rows, same columns — the
    probe filters on cell/table/bucket, never on batch). Handles all
    three index kinds: IVF (vectors), PQ (codes AND vectors), LSH
    (buckets + the store_vectors=False side table).

    The folded batch ids are recorded in a ``compacted`` side-file
    and the append_* doors no-op on a replayed compacted id, so
    foreachBatch's at-least-once replay stays idempotent across a
    compaction. Crash-window design (review r10 — the first cut had
    two holes here):

    - Only batch ids present in EVERY table of the index are folded
      and marked. A half-appended batch (crash between the codes and
      vectors writes — the exact window the codes-first append order
      exists for) keeps its batch=N partitions and stays unmarked,
      so the healing replay still overwrites them and completes the
      missing table; marking it would have turned that replay into a
      no-op and lost the batch's vectors permanently.
    - The side-file is APPENDED (new ids as a new parquet file, old
      files untouched) BEFORE any table swap. Every interleaving is
      then safe: marked-but-not-yet-folded rows still live under
      their batch=N partitions (read path unions all batches — no
      loss, and the no-op replay is correct because the rows exist);
      a crash between the two PQ table swaps leaves codes folded and
      vectors under batch=N — no duplicate, because the replay
      already no-ops. A later compaction folds whatever remains.

    Each table is rewritten to a sibling dir and swapped in with two
    renames (local fs, checked up front — same contract as the
    streaming snapshot protocol); run compaction in a maintenance
    window, or use a table format with atomic commit (Iceberg/Delta
    rewrite_data_files) at production scale."""
    import os
    import re
    import shutil

    if re.match(r"^[a-zA-Z][a-zA-Z0-9+.-]*://", path):
        # same fail-LOUD rule as streaming's _require_local_dir: the
        # swap below is os.rename, which would die midway on ANY URI
        # (os.* does not resolve even file:// schemes — review r10)
        # after the expensive rewrite already ran
        raise ValueError(
            f"compact_index: {path!r} is not a plain local path — "
            "the table swap uses local filesystem renames")
    meta = _read_meta(spark, path)
    if meta is None:
        raise ValueError(
            f"compact_index: no meta side-file under {path} — not a "
            "persisted index (or built before the meta protocol)")
    if "m_sub" in meta:
        # PQ: codes first — mirrors the append's fail-safe write
        # order (an orphan codes row drops at the re-rank id-join; an
        # orphan vectors row would be invisible to the shortlist)
        tables = [("codes", ["cell"]), ("vectors", ["cell"])]
    elif "n_planes" in meta:
        tables = [("buckets", ["table", "bucket"])]
        if not bool(meta.get("store_vectors", True)):
            tables.append(("vectors", []))
    else:
        tables = [("vectors", ["cell"])]

    # heal a crashed previous swap FIRST (advice r10): a crash
    # between the two renames leaves no live {sub} dir — queries fail
    # and the batch walk below would silently skip the table
    for sub, _ in tables:
        _heal_swap(path, sub)

    def _batch_ids(sub: str) -> set[int]:
        # partition values are directory names on the (guaranteed
        # local) index — a filesystem walk, not a Spark scan of the
        # very small files compaction exists to reduce (review r10)
        out: set[int] = set()
        for root, dirs, _ in os.walk(f"{path}/{sub}"):
            out |= {int(d[6:]) for d in dirs
                    if d.startswith("batch=") and d[6:].lstrip("-")
                    .isdigit() and int(d[6:]) >= 0}
        return out

    per_table = [_batch_ids(sub) for sub, _ in tables]
    already = _compacted_batches(spark, path)
    complete = set.intersection(*per_table)
    # residue of an earlier crash between two table swaps: a batch
    # already marked compacted (i.e. it WAS complete when marked) may
    # survive as batch=N in only one table — safe to fold, and
    # required, or it would never leave the intersection-gated path
    # (review r10)
    fold_ids = complete | (already & set.union(*per_table))
    if not fold_ids:
        return
    new_ids = sorted(complete - already)
    if new_ids:
        # content fingerprints FIRST (advice r10: they let the append
        # doors tell a genuine replay from batch-id reuse), then the
        # replay-guard marker; both append-only — committed part
        # files are never rewritten, so a crash anywhere after leaves
        # the guards intact (duplicate ids collapse in the set read;
        # a marker without a fingerprint degrades to the warn path)
        sub0 = tables[0][0]
        (spark.read.parquet(f"{path}/{sub0}")
         .filter(F.col("batch").isin(new_ids))
         .select("batch", F.col("id").cast("string").alias("i"))
         .distinct()
         .groupBy("batch")
         .agg(F.count(F.lit(1)).alias("n"),
              F.bit_xor(F.xxhash64("i")).alias("h"))
         .write.mode("append").parquet(f"{path}/compacted_fp"))
        spark.createDataFrame([(b,) for b in new_ids], "batch int") \
            .write.mode("append").parquet(f"{path}/compacted")
    fold = sorted(fold_ids)
    for (sub, parts), tbl_ids in zip(tables, per_table):
        if not (tbl_ids & fold_ids):
            continue  # nothing of this table folds — skip the rewrite
        p = f"{path}/{sub}"
        tmp, old = p + ".compact", p + ".old"
        df = spark.read.parquet(p)
        cols = [c for c in df.columns if c != "batch"]
        folded_rows = (df.filter(F.col("batch").isin([-1] + fold))
                       .select(*cols).withColumn("batch", F.lit(-1)))
        # incomplete batches keep their batch=N partitions so the
        # healing replay's dynamic overwrite stays idempotent
        kept_rows = df.filter(~F.col("batch").isin([-1] + fold)) \
            .select(*cols, "batch")
        (folded_rows.unionByName(kept_rows)
         .write.mode("overwrite")
         .option("partitionOverwriteMode", "static")
         .partitionBy(*parts, "batch")
         .parquet(tmp))
        shutil.rmtree(old, ignore_errors=True)
        os.rename(p, old)
        os.rename(tmp, p)
        shutil.rmtree(old)


def _append_partitioned(df: DataFrame, path: str, parts: list[str],
                        batch_id: int | None) -> None:
    """THE shared batch-append write (r09: four verbatim copies
    across the IVF/LSH/PQ appends risked the same drift the build
    writes had): batch=-1 plain append for one-shot backfills, or
    batch=<id> DYNAMIC partition overwrite so a replayed foreachBatch
    id idempotently overwrites only its own partitions (at-least-once
    delivery, review r07). Builds must NOT use this — they pin
    static overwrite (see _write_ivf_base)."""
    b = F.lit(-1 if batch_id is None else int(batch_id))
    w = df.withColumn("batch", b).write.partitionBy(*parts, "batch")
    if batch_id is None:
        w.mode("append").parquet(path)
    else:
        (w.mode("overwrite")
         .option("partitionOverwriteMode", "dynamic")
         .parquet(path))


def write_ivf_pq_index(emb: DataFrame, path: str, n_cells: int = 16,
                       m_sub: int = 8, n_codes: int = 16,
                       id_col: str = "vec_id",
                       vec_col: str = "embedding",
                       n_iters: int = 0,
                       residual: bool = False) -> None:
    """Build and persist an IVF index with PRODUCT-QUANTIZATION codes
    (r09, the memory-bounded candidate-scoring tier a 100 TB
    embedding store wants between the partition-pruned probe and the
    exact re-rank): alongside the full vectors (same layout as
    write_ivf_index — ``path``/vectors partitioned by cell), each
    vector's dim is split into ``m_sub`` contiguous subspaces and
    each subvector is quantized to its nearest entry of a per-
    subspace ``n_codes``-entry codebook (trained with the SAME
    deterministic kmeans_centroids kernel, per subspace, on the
    subvectors). The codes table (``path``/codes: id, codes
    array<int>, vnorm — m_sub smallints + one double per vector, vs
    dim doubles) is ALSO partitioned by cell, so a probe scores its
    candidates from a table ~dim/m_sub× smaller than the vectors —
    the asymmetric-distance (ADC) pass of Jégou et al., "Product
    Quantization for Nearest Neighbor Search" (TPAMI 2011). The
    exact per-vector norm rides the code row, so the approximate
    cosine is adot/(|q|·|v|) with only the dot approximated.
    Codebooks (m_sub × n_codes rows) and meta land beside the data,
    driver-sized forever.

    ``residual`` (r09, the IVF-ADC scheme of the same paper §IV):
    codes quantize the RESIDUAL v − centroid[cell] instead of v.
    dot(q, v) = dot(q, c_cell) + dot(q, r); the first term is exact
    (computed driver-side per probed cell from the tiny centroid
    table) and only the residual dot is table-approximated, so the
    approximation error drops by roughly the energy the centroid
    explains. Residual codebooks are shared across cells (standard
    IVF-PQ). Recorded in meta; the query path follows it
    automatically."""
    if m_sub < 1 or n_codes < 1:
        raise ValueError("write_ivf_pq_index: m_sub/n_codes >= 1")
    row = emb.select(vec_col).first()
    if row is None:
        raise ValueError("write_ivf_pq_index: empty corpus")
    dim = len(row[0])
    if dim % m_sub:
        raise ValueError(
            f"write_ivf_pq_index: dim={dim} not divisible by "
            f"m_sub={m_sub}")
    d_sub = dim // m_sub
    # checkpoint=True: the corpus-wide cell assignment is consumed
    # by the vectors write AND the code pass below — materialize it
    # once, BEFORE the write (r09 review)
    assigned, _cents, _ = _write_ivf_base(
        emb, path, n_cells, id_col, vec_col, n_iters,
        "write_ivf_pq_index", checkpoint=True, dim=dim)
    spark = emb.sparkSession
    # per-subspace codebooks: the SAME deterministic kmeans kernel as
    # the cell layer, applied to the F.slice'd subvectors (n_iters=0
    # = first n_codes ids' subvectors, the oracle-reproducible
    # config); books are driver-sized (m_sub x n_codes rows). Codes
    # are DENSIFIED to 0..n-1 per subspace (r09 review: the kernel
    # labels centroids with seed-row IDS — dense only when vec_ids
    # start at 0 with no gaps; snowflake-style ids would truncate in
    # the int cast below and blow the query-side lookup range)
    quant = _pq_quant_target(assigned, _cents, residual)
    if n_iters == 0:
        # the n_iters=0 codebook is EXACTLY the first n_codes ids'
        # (residual) subvectors — one TakeOrdered + driver-side
        # slicing instead of m_sub corpus-wide jobs fetching the
        # same rows (r09 review wave 3); bit-identical to the
        # kmeans_centroids path below by construction
        seeds = (quant.orderBy("id").limit(n_codes)
                 .select("q").collect())
        books = spark.createDataFrame(
            [(s, c, list(r["q"][s * d_sub:(s + 1) * d_sub]))
             for s in range(m_sub) for c, r in enumerate(seeds)],
            "s int, code int, cv array<double>")
    else:
        import functools
        books = functools.reduce(
            lambda a, b: a.unionByName(b),
            [kmeans_centroids(
                quant.select("id",
                             F.slice("q", s * d_sub + 1, d_sub)
                             .alias("v")),
                n_codes, d_sub, n_iters)
             .select(F.lit(s).alias("s"),
                     (F.row_number().over(Window.orderBy("cell")) - 1)
                     .alias("code"),
                     "cv")
             for s in range(m_sub)]).localCheckpoint()
    codes = _pq_encode(quant, books, m_sub, d_sub)
    (codes.withColumn("batch", F.lit(-1))
     .write.mode("overwrite")
     .option("partitionOverwriteMode", "static")
     .partitionBy("cell", "batch")
     .parquet(f"{path}/codes"))
    books.write.mode("overwrite").parquet(f"{path}/codebooks")
    spark.createDataFrame(
        [(dim, m_sub, n_codes, n_cells, residual)],
        "dim int, m_sub int, n_codes int, n_cells int, "
        "residual boolean") \
        .write.mode("overwrite").parquet(f"{path}/meta")


def ivf_pq_index_topk(spark: SparkSession, path: str,
                      query_vecs: list[tuple[int, list[float]]],
                      k: int = 10, n_probe: int = 4,
                      rerank: int = 64) -> DataFrame:
    """Query a persisted IVF+PQ index: probe cells are chosen
    driver-side from the centroid table (same partition-pruned
    `cell IN (...)` scan as ivf_index_topk), then candidates are
    scored ASYMMETRICALLY from the codes table alone — per query a
    (m_sub × n_codes) lookup table lut[s][c] = dot(q_s, codebook
    [s][c]) is computed on the driver (tiny, pure Python) and the
    approximate cosine is a JVM-side array program:
    aggregate(zip_with(codes, lut, (c, l) -> l[c])) / (|q|·vnorm) —
    no Python in the row path, and the scan reads m_sub ints + one
    double per candidate instead of dim doubles. The top ``rerank``
    per query by approximate score then re-rank EXACTLY against the
    full vectors (id-join restricted to the probed cells), rounded
    and ordered exactly like ivf_index_topk — so with ``rerank``
    covering the true top-k the result is row-identical to the
    unquantized probe (the oracle gate), while the candidate-scoring
    memory/IO is bounded by the code size, not the vector size.
    Returns (query_id, neighbor_id, sim)."""
    import math

    meta = _read_meta(spark, path)
    if meta is None or "m_sub" not in meta:
        raise ValueError(
            f"ivf_pq_index_topk: {path} has no PQ meta — build with "
            "write_ivf_pq_index")
    dim, m_sub = int(meta["dim"]), int(meta["m_sub"])
    d_sub = dim // m_sub
    cents = [(r["cell"], list(r["cv"])) for r in
             spark.read.parquet(f"{path}/centroids").collect()]
    books: dict[tuple[int, int], list[float]] = {
        (int(r["s"]), int(r["code"])): list(r["cv"])
        for r in spark.read.parquet(f"{path}/codebooks").collect()}
    # codes are DENSIFIED 0..n-1 per subspace at build (r09 review:
    # the kmeans kernel labels centroids with seed-row IDS, which are
    # dense only by fixture luck — snowflake-style ids would blow the
    # range() below and truncate in the persisted int codes), so
    # 1+max is the actual book size even when the corpus had fewer
    # vectors than the requested n_codes
    n_codes = 1 + max(c for _, c in books)
    for qid, qv in query_vecs:
        if len(qv) != dim:
            raise ValueError(
                f"ivf_pq_index_topk: query {qid} is {len(qv)}-dim "
                f"but the index was built at dim={dim}")
    if rerank < k:
        raise ValueError(
            f"ivf_pq_index_topk: rerank={rerank} < k={k} would "
            "silently truncate every query's result")
    residual = bool(meta.get("residual") or False)
    cent_of = dict(cents)
    probe_cells, q_probe = _probe_cells_driver(cents, query_vecs,
                                               n_probe)
    cell_rows = []
    meta_rows = []
    for qid, qv, cells in q_probe:
        qnorm = math.sqrt(sum(x * x for x in qv))
        lut = [[sum(x * y for x, y in
                    zip(qv[s * d_sub:(s + 1) * d_sub], books[(s, c)]))
                for c in range(n_codes)] for s in range(m_sub)]
        meta_rows.append((qid, qv, lut, qnorm))
        for c in cells:
            # residual scheme: dot(q, v) = dot(q, centroid[cell])
            # (EXACT, driver-side) + the table-approximated residual
            # dot — per (query, probed cell), one scalar
            qcdot = sum(x * y for x, y in zip(qv, cent_of[c])) \
                if residual else 0.0
            cell_rows.append((qid, c, qcdot))
    codes = spark.read.parquet(f"{path}/codes")
    vectors = spark.read.parquet(f"{path}/vectors")
    if not cell_rows:
        return (vectors.select(F.col("id").alias("query_id"),
                               F.col("id").alias("neighbor_id"),
                               F.lit(0.0).alias("sim")).limit(0))
    # two broadcast tables (r09 review wave 2): the (m_sub x n_codes)
    # LUT and qv ride ONCE per query in qmeta; the per-(query, cell)
    # table carries only the probe scalar — not n_probe duplicated
    # LUT copies (at m_sub=32/n_codes=256/n_probe=32 that redundancy
    # alone is ~2 MB per query)
    qcells = spark.createDataFrame(
        cell_rows, "query_id long, cell long, qcdot double")
    qmeta = spark.createDataFrame(
        meta_rows, "query_id long, qv array<double>, "
                   "lut array<array<double>>, qnorm double")
    pruned_codes = codes.filter(F.col("cell").isin(*probe_cells))
    # ADC: one element_at per subspace, folded JVM-side; qcdot is 0
    # for the plain scheme and the exact query-centroid dot for the
    # residual scheme. Zero-norm rows score 0.0, never DIVIDE_BY_ZERO
    # (the r06 zero-norm convention every scoring path follows).
    adot = F.aggregate(
        F.zip_with("codes", "lut",
                   lambda c, l: F.element_at(l, c + F.lit(1))),
        F.lit(0.0), lambda a, x: a + x)
    den = F.col("qnorm") * F.col("vnorm")
    approx = (pruned_codes.join(F.broadcast(qcells), on="cell")
              .join(F.broadcast(qmeta), on="query_id")
              .filter(F.col("id") != F.col("query_id"))
              .withColumn("sim", F.when(
                  den > 0, (F.col("qcdot") + adot) / den)
                  .otherwise(F.lit(0.0))))
    probe = pruned_codes.limit(SALT_TOPK_MIN_CORPUS).count()
    # the shortlist rides the SAME salted two-phase top-k as the
    # final rank — one query's candidate set approaching the corpus
    # must never become a single-partition sort here either
    shortlist = (_topk_per_query(approx, rerank, max_candidates=probe)
                 .select("query_id",
                         F.col("neighbor_id").alias("id")))
    qmap = qmeta.select("query_id", "qv")
    pruned_vecs = vectors.filter(F.col("cell").isin(*probe_cells)) \
        .select("id", "v")
    cand = (shortlist.join(F.broadcast(qmap), on="query_id")
            .join(pruned_vecs, on="id"))
    scored = cand.withColumn(
        "sim", F.round(cosine(F.col("qv"), F.col("v")), 6))
    return _topk_per_query(scored, k, max_candidates=probe)


def append_lsh_index(emb_batch: DataFrame, path: str,
                     id_col: str = "vec_id",
                     vec_col: str = "embedding",
                     batch_id: int | None = None) -> None:
    """Fold a batch of NEW vectors into a persisted LSH index — the
    LSH twin of append_ivf_index: signatures are computed with the
    plane family recorded in the index's meta file (so an appended
    index is bit-identical to a one-shot build over the union) and
    land under the same (table, bucket) partitions. ``batch_id``
    makes the write idempotent under foreachBatch's at-least-once
    replay via batch=<id> dynamic partition overwrite; None = plain
    append (one-shot backfills only)."""
    spark = emb_batch.sparkSession
    meta = _read_meta(spark, path)
    if meta is None:
        raise ValueError(
            f"append_lsh_index: no meta side-file under {path} — "
            "the plane family must come from the build, rebuild with "
            "write_lsh_index")
    if _replay_of_compacted(spark, path, batch_id, emb_batch, id_col):
        return  # genuine replay of a batch compact_index folded
    dim, n_planes, n_tables = (int(meta["dim"]), int(meta["n_planes"]),
                               int(meta["n_tables"]))
    store_vectors = bool(meta["store_vectors"])
    base = emb_batch.select(F.col(id_col).alias("id"),
                            _to_double(vec_col).alias("v"))
    bad = base.filter(F.size("v") != dim).count()
    if bad:
        raise ValueError(
            f"append_lsh_index: {bad} batch vectors are not "
            f"{dim}-dim (index build dim)")
    sig = lsh_buckets(emb_batch, dim, id_col, vec_col,
                      n_planes, n_tables)
    cols = ["id", "v", "table", "bucket"] if store_vectors \
        else ["id", "table", "bucket"]
    _append_partitioned(sig.select(*cols), f"{path}/buckets",
                        ["table", "bucket"], batch_id)
    if not store_vectors:
        _append_partitioned(base, f"{path}/vectors", [], batch_id)
