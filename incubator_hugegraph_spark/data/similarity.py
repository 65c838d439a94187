"""Embedding similarity search over an `array<float>` column.

- cosine_topk: brute-force exact top-k for an explicit query set —
  the correctness baseline. Cross join is (|Q| × |N|); fine when Q is
  a bounded query batch (broadcast the queries, never the corpus).
- lsh_ann_topk: the scale path — random-hyperplane LSH buckets
  (deterministic planes derived from murmur3, no RNG state), candidate
  = same-bucket vectors, exact cosine re-rank within candidates.
  At 100 TB the corpus-side signature is computed once and bucketed on
  write; a query touches one bucket per table instead of the corpus.
- ivf_topk: IVF-style alternative — k-means-lite centroids picked
  deterministically (first C ids), vectors assigned to nearest
  centroid at build; queries probe the nearest `n_probe` cells.

All vector math is `zip_with`/`aggregate` Column expressions in
double precision (JVM codegen) — no Python in the scoring loop.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def _to_double(col) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return F.transform(c, lambda x: x.cast("double"))


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y),
                       F.lit(0.0), lambda acc, x: acc + x)


def norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(F.transform(a, lambda x: x * x),
                              F.lit(0.0), lambda acc, x: acc + x))


def cosine(a: Column, b: Column) -> Column:
    # zero-norm guard (code review r06): a zero vector — including a
    # centroid kmeans AVERAGES to zero from antipodal members — must
    # score 0.0, not abort the job with ANSI DIVIDE_BY_ZERO. Same
    # convention as label_centroid_stats and the numpy kernel twin.
    den = norm(a) * norm(b)
    return F.when(den > 0, dot(a, b) / den).otherwise(F.lit(0.0))


def cosine_topk(emb: DataFrame, query_ids: list[int], k: int,
                id_col: str = "vec_id",
                vec_col: str = "embedding") -> DataFrame:
    """Exact top-k cosine neighbors for each query id (self excluded).
    Returns (query_id, neighbor_id, sim) — deterministic by
    (rounded sim desc, neighbor id asc)."""
    base = emb.select(F.col(id_col).alias("neighbor_id"),
                      _to_double(vec_col).alias("v"))
    q = (emb.filter(F.col(id_col).isin(query_ids))
         .select(F.col(id_col).alias("query_id"),
                 _to_double(vec_col).alias("qv")))
    scored = (base.crossJoin(F.broadcast(q))
              .filter(F.col("neighbor_id") != F.col("query_id"))
              .withColumn("sim", F.round(cosine(F.col("qv"), F.col("v")), 6)))
    w = Window.partitionBy("query_id").orderBy(F.desc("sim"),
                                               F.asc("neighbor_id"))
    return (scored.withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") <= k)
            .select("query_id", "neighbor_id", "sim"))


# Multi-table random-hyperplane LSH: L independent tables of b planes.
# A true near neighbor at angle θ shares a table's bucket with
# probability (1-θ/π)^b; missing ALL L tables has probability
# (1-(1-θ/π)^b)^L → recall rises with L at linear candidate cost.
# THE TRADEOFF IS GOVERNED BY THE TARGET SIMILARITY (similarity
# review r06): the defaults below are tuned for the low-similarity
# fixture geometry (top-10 sims 0.24-0.40, where b=4/L=24 gives ~96%
# recall at a HIGH candidate rate — measured ~78% of the corpus);
# hyperplane LSH only pays at scale when true neighbors are
# high-similarity (near-dup: sim ≥ 0.9 → p_bit ≈ 0.86, so b=16/L=32
# gives ~94% recall while a random pair collides with prob
# ~0.5^16·32 ≈ 5e-4 — candidates ≈ 0.05% of the corpus). For
# low-similarity ANN at 100 TB use ivf_topk, which bounds candidates
# by n_probe/n_cells regardless of the similarity regime.
_N_PLANES = 4
_N_TABLES = 24


def plane_component(p: int, j: int) -> float:
    """Deterministic pseudo-random plane component in [-1, 1),
    computed driver-side (xorshift-style integer mix → exact double).
    Exactly reproducible anywhere — the DuckDB oracle embeds the same
    decimal literals (x/2^31 is exact in double for x < 2^32, and
    repr() round-trips)."""
    x = (p * 2654435761 + j * 40503 + 12345) & 0xFFFFFFFF
    x = (x * 2654435761 + 1) & 0xFFFFFFFF
    x = ((x ^ (x >> 16)) * 2246822519) & 0xFFFFFFFF
    x ^= x >> 13
    return x / 2147483648.0 - 1.0


def plane(p: int, dim: int) -> list[float]:
    """One hyperplane's components as plain floats."""
    return [plane_component(p, j) for j in range(dim)]


def lsh_signature(vec: Column, dim: int, n_planes: int = _N_PLANES,
                  plane_offset: int = 0) -> Column:
    """Bit-packed random-hyperplane signature (int). ``plane_offset``
    selects an independent plane family (one per LSH table). Planes
    are literal arrays — constant-folded, nothing recomputed per row
    beyond the dot products."""
    sig = F.lit(0)
    for p in range(n_planes):
        w = F.lit(plane(plane_offset + p, dim))
        d = F.aggregate(F.zip_with(vec, w, lambda x, y: x * y),
                        F.lit(0.0), lambda acc, x: acc + x)
        sig = sig + F.when(d >= 0, F.lit(1 << p)).otherwise(F.lit(0))
    return sig


def lsh_buckets(emb: DataFrame, dim: int, id_col: str = "vec_id",
                vec_col: str = "embedding", n_planes: int = _N_PLANES,
                n_tables: int = _N_TABLES) -> DataFrame:
    """(id, v, table, bucket): one row per LSH table. At scale this is
    the write-side index: persisted partitioned by (table, bucket) so a
    query reads L buckets, never the corpus."""
    base = emb.select(F.col(id_col).alias("id"),
                      _to_double(vec_col).alias("v"))
    row = base.select(F.size("v").alias("n")).first()
    if row is not None and row["n"] != dim:
        # a wrong dim would NULL-pad zip_with and silently collapse
        # every vector into bucket 0 of every table (review r06)
        raise ValueError(
            f"lsh dim={dim} but vectors are {row['n']}-dimensional")
    tb = F.explode(F.array(*[
        F.struct(F.lit(t).alias("table"),
                 lsh_signature(F.col("v"), dim, n_planes,
                               plane_offset=t * n_planes).alias("bucket"))
        for t in range(n_tables)])).alias("tb")
    return base.select("id", "v", tb).select("id", "v", "tb.table",
                                             "tb.bucket")


# Below this many corpus rows the worst-case per-query candidate set
# (== the corpus) fits one window task comfortably, so the salted
# pre-phase is pure overhead (A/B at sf0.1, round 7: salted 1.81 s vs
# plain 1.57 s on x_ann_ivf, bit-identical output).  Above it — the
# 100 TB regime — the two-phase plan is mandatory: a plain
# Window.partitionBy(query_id) puts one query's whole candidate set
# in one task.
SALT_TOPK_MIN_CORPUS = 1_000_000


def _topk_per_query(scored: DataFrame, k: int,
                    id_col: str = "id",
                    max_candidates: int | None = None) -> DataFrame:
    """Two-phase bounded top-k re-rank (shared by the ANN paths): a
    salted local rank caps any single task at ~candidates/32 rows,
    then the final rank sees ≤ 32·k rows per query — never the
    corpus-sized single-partition sort a plain
    Window.partitionBy(query_id) becomes when one query's candidate
    set approaches the corpus (review r06). Same (sim desc, id asc)
    order in both phases, so the output is bit-identical to the
    single-window form.

    ``max_candidates`` — an upper bound on any single query's
    candidate count (callers pass the corpus size).  When it is known
    to be under SALT_TOPK_MIN_CORPUS the salt phase is skipped: one
    window task over < 1M rows is cheaper than an extra shuffle
    (A/B-measured r07; output identical either way)."""
    w2 = Window.partitionBy("query_id") \
        .orderBy(F.desc("sim"), F.asc(id_col))
    if max_candidates is not None and max_candidates < SALT_TOPK_MIN_CORPUS:
        return (scored
                .withColumn("__rn", F.row_number().over(w2))
                .filter(F.col("__rn") <= k)
                .select("query_id", F.col(id_col).alias("neighbor_id"),
                        "sim"))
    n_salt = 32
    w1 = Window.partitionBy("query_id", "__salt") \
        .orderBy(F.desc("sim"), F.asc(id_col))
    return (scored
            .withColumn("__salt", F.pmod(F.hash(id_col), F.lit(n_salt)))
            .withColumn("__r1", F.row_number().over(w1))
            .filter(F.col("__r1") <= k)
            .withColumn("__rn", F.row_number().over(w2))
            .filter(F.col("__rn") <= k)
            .select("query_id", F.col(id_col).alias("neighbor_id"),
                    "sim"))


def lsh_ann_topk(emb: DataFrame, query_ids: list[int], k: int, dim: int,
                 id_col: str = "vec_id", vec_col: str = "embedding",
                 n_planes: int = _N_PLANES,
                 n_tables: int = _N_TABLES) -> DataFrame:
    """Approximate top-k: candidates = union over L tables of
    same-bucket vectors; exact cosine re-rank on the deduped set.
    Returns (query_id, neighbor_id, sim)."""
    # sig is consumed twice, but NOT checkpointed (measured, round 3:
    # a wash at sf0.01 and harmful at scale): the query-side consumer
    # filters to |Q| ids, which Catalyst pushes below the projection
    # pass — its recompute is |Q|-sized, while a checkpoint would
    # materialize the n_tables× corpus WITH vectors. Contrast
    # dedup.minhash_lsh_pairs, where both consumers are corpus-wide.
    sig = lsh_buckets(emb, dim, id_col, vec_col, n_planes, n_tables)
    q = (sig.filter(F.col("id").isin(query_ids))
         .select(F.col("id").alias("query_id"), F.col("v").alias("qv"),
                 "table", "bucket"))
    cand = (sig.join(F.broadcast(q), on=["table", "bucket"])
            .filter(F.col("id") != F.col("query_id"))
            .select("query_id", "qv", "id", "v")
            .dropDuplicates(["query_id", "id"]))
    scored = cand.withColumn(
        "sim", F.round(cosine(F.col("qv"), F.col("v")), 6))
    # a query's deduped candidate set is bounded by the corpus; the
    # probe is limit-bounded so a derived (non-parquet) frame pays at
    # most a 1M-row scan, never a full corpus count (review r07) —
    # the gate only needs the boolean "under the threshold"
    probe = emb.limit(SALT_TOPK_MIN_CORPUS).count()
    return _topk_per_query(scored, k, max_candidates=probe)


def kmeans_centroids(base: DataFrame, n_cells: int, dim: int,
                     n_iters: int) -> DataFrame:
    """Lloyd's k-means over (id, v) rows, entirely in Column programs:
    assign = broadcast crossJoin + argmax cosine; update = per-cell
    element-wise mean (one groupBy with ``dim`` avg aggregates —
    JVM-side, no Python in the row path). Deterministic GIVEN A
    FIXED INPUT PARTITIONING: seed centroids are the first n_cells
    vectors by id, ties break on the lower cell id, fixed ``n_iters``
    rounds (no convergence RNG) — but for n_iters >= 1 the centroid
    F.avg partial-sum order follows the partitioning, so an
    assignment whose two best cosines differ by < 1 ulp can flip
    across different partition layouts (review r06; the oracle pins
    n_iters=0, which is exactly reproducible).
    Returns (cell, cv). Empty cells keep their previous centroid."""
    cents = (base.orderBy("id").limit(n_cells)
             .select(F.col("id").alias("cell"), F.col("v").alias("cv")))
    for _ in range(n_iters):
        assigned = (base.crossJoin(F.broadcast(cents))
                    .withColumn("d", cosine(F.col("v"), F.col("cv"))))
        w = Window.partitionBy("id").orderBy(F.desc("d"), F.asc("cell"))
        assigned = (assigned.withColumn("__rn", F.row_number().over(w))
                    .filter(F.col("__rn") == 1).select("cell", "v"))
        means = assigned.groupBy("cell").agg(
            F.array(*[F.avg(F.col("v")[i]) for i in range(dim)])
            .alias("mv"))
        cents = (cents.join(means, on="cell", how="left")
                 .select("cell", F.coalesce("mv", "cv").alias("cv")))
    return cents


def _assign_cells(base: DataFrame, cents: DataFrame) -> DataFrame:
    """Assign every (id, v) row to its nearest centroid — THE
    assignment idiom shared by ivf_topk, kmeans_cluster_stats and
    ann_index.write_ivf_index (review r07: three verbatim copies
    meant a tie-break tweak in one would silently break the
    oracle-gated parity of the others). Broadcast crossJoin +
    argmax cosine, ties to the lower cell id. Returns
    (id, v, cell, d) with d = the winning cosine."""
    assigned = (base.crossJoin(F.broadcast(cents))
                .withColumn("d", cosine(F.col("v"), F.col("cv"))))
    w = Window.partitionBy("id").orderBy(F.desc("d"), F.asc("cell"))
    return (assigned.withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") == 1).select("id", "v", "cell", "d"))


def ivf_topk(emb: DataFrame, query_ids: list[int], k: int,
             n_cells: int = 16, n_probe: int = 4,
             id_col: str = "vec_id", vec_col: str = "embedding",
             n_iters: int = 0) -> DataFrame:
    """IVF ANN: centroids = deterministic seeds (first n_cells by id)
    refined by ``n_iters`` Lloyd's rounds (0 = seeds only, the
    oracle-mirrored configuration). Vectors are assigned to their
    nearest centroid; queries probe the n_probe nearest cells and
    re-rank exactly. Returns (query_id, neighbor_id, sim)."""
    base = emb.select(F.col(id_col).alias("id"),
                      _to_double(vec_col).alias("v"))
    row = emb.select(vec_col).first()
    if row is None:  # empty corpus → empty result, not a TypeError
        return base.select(F.col("id").alias("query_id"),
                           F.col("id").alias("neighbor_id"),
                           F.lit(0.0).alias("sim")).limit(0)
    dim = len(row[0])
    cents = kmeans_centroids(base, n_cells, dim, n_iters)
    # not checkpointed: the query-side consumer's isin filter pushes
    # below the window (partitioned by id), so its recompute is
    # |Q|-sized — same measured rationale as lsh_ann_topk above
    assigned = _assign_cells(base, cents).select("id", "v", "cell")
    q = (assigned.filter(F.col("id").isin(query_ids))
         .select(F.col("id").alias("query_id"), F.col("v").alias("qv")))
    qcells = (q.crossJoin(F.broadcast(cents))
              .withColumn("d", cosine(F.col("qv"), F.col("cv"))))
    w_probe = Window.partitionBy("query_id").orderBy(F.desc("d"),
                                                     F.asc("cell"))
    qcells = (qcells.withColumn("__rn", F.row_number().over(w_probe))
              .filter(F.col("__rn") <= n_probe)
              .select("query_id", "qv", "cell"))
    cand = (assigned.join(F.broadcast(qcells), on="cell")
            .filter(F.col("id") != F.col("query_id")))
    scored = cand.withColumn(
        "sim", F.round(cosine(F.col("qv"), F.col("v")), 6))
    # candidates per query ≤ corpus; limit-bounded probe as in
    # lsh_ann_topk (review r07)
    probe = emb.limit(SALT_TOPK_MIN_CORPUS).count()
    return _topk_per_query(scored, k, max_candidates=probe)


def kmeans_cluster_stats(emb: DataFrame, n_cells: int = 8,
                         n_iters: int = 1, id_col: str = "vec_id",
                         vec_col: str = "embedding") -> DataFrame:
    """Embedding clustering for corpus curation (domain balancing /
    diversity sampling): deterministic Lloyd's k-means
    (kmeans_centroids — seeded by the first n_cells ids, argmax
    cosine, fixed rounds), then per-cluster stats.

    Returns (cell, size, mean_sim): members per cluster and the mean
    member→centroid cosine (rounded — assignment cohesion). At scale
    the assign step is a broadcast crossJoin against n_cells
    centroids (O(|N|·C) map-side, no shuffle) and the stats are one
    groupBy(cell) — the same shape that holds for IVF index builds
    on a 100 TB corpus."""
    base = emb.select(F.col(id_col).alias("id"),
                      _to_double(vec_col).alias("v"))
    row = emb.select(vec_col).first()
    if row is None:  # empty corpus → empty result, not a TypeError
        return base.select(F.lit(0).alias("cell"),
                           F.lit(0).cast("long").alias("size"),
                           F.lit(0.0).alias("mean_sim")).limit(0)
    dim = len(row[0])
    cents = kmeans_centroids(base, n_cells, dim, n_iters)
    assigned = _assign_cells(base, cents)
    return (assigned.groupBy("cell")
            .agg(F.count(F.lit(1)).alias("size"),
                 F.round(F.avg(F.round(F.col("d"), 6)), 4)
                 .alias("mean_sim")))


def cosine_topk_np(emb: DataFrame, query_ids: list[int], k: int,
                   id_col: str = "vec_id",
                   vec_col: str = "embedding") -> DataFrame:
    """Brute-force exact top-k via Arrow-batched numpy (mapInPandas) —
    the compute-bound scale path for wide corpora, same contract and
    ORACLE as cosine_topk.

    Shape: the bounded query matrix is closed over (broadcast with the
    serialized task); each Arrow batch scores |batch| × |Q| cosines as
    64 vectorized ops and emits only its LOCAL top-k rows per query
    (selected by the global (sim desc, id asc) order, so no global
    winner can be dropped); one final window reduces
    (#batches × k × |Q|) rows to the exact top-k. The corpus is
    touched once, map-side; the only shuffle carries k·|Q| rows per
    batch.

    Bit-parity: dot/norm accumulate as an explicit LEFT FOLD over
    dimensions (a Python loop of vectorized adds), reproducing
    F.aggregate's ((0+x₁)+x₂)+… order and therefore the DuckDB
    list_reduce oracle, double-for-double."""
    import numpy as np
    import pandas as pd

    from incubator_hugegraph_spark.ram import _round_half_up6

    q_rows = (emb.filter(F.col(id_col).isin(query_ids))
              .select(id_col, vec_col).collect())
    q_ids = np.array([r[0] for r in q_rows], dtype=np.int64)
    qm = np.array([list(r[1]) for r in q_rows], dtype=np.float64)
    n_q, dim = qm.shape if len(q_rows) else (0, 0)

    def _fold_dot(M: "np.ndarray", v: "np.ndarray") -> "np.ndarray":
        acc = np.zeros(M.shape[0])
        for j in range(M.shape[1]):          # left fold == F.aggregate
            acc = acc + M[:, j] * v[j]
        return acc

    def _fold_norm(M: "np.ndarray") -> "np.ndarray":
        acc = np.zeros(M.shape[0])
        for j in range(M.shape[1]):
            acc = acc + M[:, j] * M[:, j]
        return np.sqrt(acc)

    q_norm = _fold_norm(qm) if n_q else np.empty(0)

    def score(batches):
        for pdf in batches:
            if len(pdf) == 0 or n_q == 0:
                continue
            ids = pdf[id_col].to_numpy(dtype=np.int64)
            M = np.array([list(v) for v in pdf[vec_col]],
                         dtype=np.float64)
            m_norm = _fold_norm(M)
            out_q, out_n, out_s = [], [], []
            for qi in range(n_q):
                # zero-norm guard, mirroring the Column cosine():
                # sim is 0.0 when either norm is 0 (numpy would emit
                # nan/inf and a RuntimeWarning instead of matching)
                den = m_norm * q_norm[qi]
                with np.errstate(divide="ignore", invalid="ignore"):
                    sims = np.where(den > 0,
                                    _fold_dot(M, qm[qi]) / den, 0.0)
                mask = ids != q_ids[qi]
                cand_ids, cand_sims = ids[mask], sims[mask]
                # select on the ROUNDED sim — the global order
                # tie-breaks equal rounded sims by id asc, so
                # selecting on raw sims could drop a smaller-id tied
                # winner (HALF_UP round-6 == F.round, ram.py; import
                # hoisted out of the per-query loop — review r06)
                cand_sims = _round_half_up6(cand_sims)
                take = min(k, len(cand_ids))
                order = np.lexsort((cand_ids, -cand_sims))[:take]
                out_q.append(np.full(take, q_ids[qi]))
                out_n.append(cand_ids[order])
                out_s.append(cand_sims[order])
            yield pd.DataFrame({
                "query_id": np.concatenate(out_q),
                "neighbor_id": np.concatenate(out_n),
                "sim": np.concatenate(out_s)})

    scored = emb.select(id_col, vec_col).mapInPandas(
        score, "query_id long, neighbor_id long, sim double")
    w = Window.partitionBy("query_id").orderBy(F.desc("sim"),
                                               F.asc("neighbor_id"))
    return (scored.withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") <= k)
            .select("query_id", "neighbor_id", "sim"))


def label_centroid_stats(emb: DataFrame, vec_col: str = "embedding",
                         label_col: str = "label") -> DataFrame:
    """Per-class centroid cohesion — the embedding-curation QC table:
    (label, n, centroid_norm, mean_cos) with mean_cos the average
    cosine(member, class centroid). Tight classes → mean_cos near 1;
    a low value flags label noise before training.

    Scale shape: one posexplode pass (rows × dim) feeding a
    per-(label, dim) average — the aggregate is labels × dim rows,
    map-side combined; the centroid table (|labels| rows) broadcasts
    back and the member cosines ride the scan (zip_with/aggregate
    Column fold, no shuffle beyond the final per-label agg)."""
    v = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    dims = (emb.select(F.col(label_col).alias("lbl"),
                       F.posexplode(v).alias("i", "x"))
            .groupBy("lbl", "i").agg(F.avg("x").alias("c")))
    cent = (dims.groupBy("lbl")
            .agg(F.transform(
                F.array_sort(F.collect_list(F.struct("i", "c"))),
                lambda s: s["c"]).alias("cvec")))
    j = emb.select(F.col(label_col).alias("lbl"), v.alias("v")) \
        .join(F.broadcast(cent), on="lbl")
    # a degenerate class can average to the zero vector (antipodal
    # members): guard the norm product so ANSI mode doesn't divide
    # by zero — cohesion of a zero centroid is 0 by definition here
    denom = norm(F.col("v")) * norm(F.col("cvec"))
    guarded = F.when(denom > 0,
                     dot(F.col("v"), F.col("cvec")) / denom) \
        .otherwise(F.lit(0.0))
    return (j.select("lbl", guarded.alias("cos"))
            .groupBy("lbl")
            .agg(F.count(F.lit(1)).alias("n"),
                 F.round(F.avg("cos"), 6).alias("mean_cos"))
            .select(F.col("lbl").alias(label_col), "n", "mean_cos"))
