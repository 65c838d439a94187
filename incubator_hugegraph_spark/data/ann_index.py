"""Persisted ANN indexes with partition-pruned query reads (r07).

`ivf_topk` / `lsh_ann_topk` recompute their bucket structure per
call — right for one-shot jobs, wrong for the index-once/query-many
regime a 100 TB corpus lives in. This module is the write-side
counterpart the similarity-module docstrings promise: the bucket
table lands as parquet PARTITIONED BY its bucket key, and the query
path computes the query's buckets DRIVER-SIDE (the centroid table /
hyperplane signatures are tiny, pure Python) so the scan carries a
partition filter — Spark reads n_probe cells (IVF) or L buckets
(LSH) and never the corpus. The pruning is plan-visible
(`InMemoryFileIndex` selects the matching directories; asserted via
inputFiles() in tests) and the results are row-identical to the
in-memory kernels by construction: same centroids, same planes, same
(sim desc, id asc) re-rank.

Reference behavior parity: none — the reference (hugegraph) has no
vector tier; this serves the training-data-pipeline brief.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from incubator_hugegraph_spark.data.similarity import (
    _N_PLANES,
    _N_TABLES,
    _to_double,
    _topk_per_query,
    SALT_TOPK_MIN_CORPUS,
    cosine,
    kmeans_centroids,
    lsh_buckets,
    plane,
)


def write_ivf_index(emb: DataFrame, path: str, n_cells: int = 16,
                    id_col: str = "vec_id",
                    vec_col: str = "embedding",
                    n_iters: int = 0) -> None:
    """Build and persist an IVF index: vectors assigned to their
    nearest centroid land under ``path``/vectors partitioned by
    `cell` (one directory per inverted list — the layout that makes
    a probe a partition-pruned read); centroids land beside them
    (``path``/centroids, n_cells rows — driver-sized forever).
    Same deterministic centroids as ivf_topk (first n_cells ids +
    ``n_iters`` Lloyd rounds), so indexed queries reproduce the
    in-memory kernel row-for-row."""
    base = emb.select(F.col(id_col).alias("id"),
                      _to_double(vec_col).alias("v"))
    row = emb.select(vec_col).first()
    if row is None:
        raise ValueError("write_ivf_index: empty corpus")
    dim = len(row[0])
    cents = kmeans_centroids(base, n_cells, dim, n_iters)
    from pyspark.sql.window import Window
    assigned = (base.crossJoin(F.broadcast(cents))
                .withColumn("d", cosine(F.col("v"), F.col("cv"))))
    w = Window.partitionBy("id").orderBy(F.desc("d"), F.asc("cell"))
    assigned = (assigned.withColumn("__rn", F.row_number().over(w))
                .filter(F.col("__rn") == 1).select("id", "v", "cell"))
    (assigned.write.mode("overwrite").partitionBy("cell")
     .parquet(f"{path}/vectors"))
    cents.write.mode("overwrite").parquet(f"{path}/centroids")


def ivf_index_topk(spark: SparkSession, path: str,
                   query_ids: list[int], k: int,
                   n_probe: int = 4) -> DataFrame:
    """Query a persisted IVF index: the centroid table (n_cells rows)
    collects to the driver, each query's n_probe nearest cells are
    chosen THERE, and the vector scan carries
    `cell IN (<probed cells>)` — a PartitionFilter, so Spark lists
    and reads only those directories. Exact cosine re-rank within
    the probed cells; row-identical to ivf_topk under the same
    build configuration. Returns (query_id, neighbor_id, sim)."""
    import math

    cents = [(r["cell"], list(r["cv"])) for r in
             spark.read.parquet(f"{path}/centroids").collect()]
    vectors = spark.read.parquet(f"{path}/vectors")
    qrows = (vectors.filter(F.col("id").isin(query_ids))
             .select("id", "v").collect())

    def cos(a: list[float], b: list[float]) -> float:
        num = sum(x * y for x, y in zip(a, b))
        den = math.sqrt(sum(x * x for x in a)) \
            * math.sqrt(sum(x * x for x in b))
        return num / den if den > 0 else 0.0

    probe_cells: set = set()
    q_probe = []
    for r in qrows:
        qv = list(r["v"])
        ranked = sorted(((cos(qv, cv), cell) for cell, cv in cents),
                        key=lambda t: (-t[0], t[1]))[:n_probe]
        cells = [cell for _, cell in ranked]
        probe_cells.update(cells)
        q_probe.append((r["id"], qv, cells))
    if not q_probe:
        return (vectors.select(F.col("id").alias("query_id"),
                               F.col("id").alias("neighbor_id"),
                               F.lit(0.0).alias("sim")).limit(0))
    # the IN-list on the PARTITION column is the whole point: the
    # file index prunes to |probe_cells| directories before any IO
    pruned = vectors.filter(F.col("cell").isin(*probe_cells))
    # one (query, probed cell) row each → plain equi-join on the
    # partition column (hash join), not a nested-loop array probe
    qdf = spark.createDataFrame(
        [(qid, qv, c) for qid, qv, cells in q_probe for c in cells],
        "query_id long, qv array<double>, cell int")
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
                    n_tables: int = _N_TABLES) -> None:
    """Persist the hyperplane-LSH bucket table partitioned by
    (table, bucket) — the write-side index lsh_buckets' docstring
    describes: a query reads L directories, never the corpus. The
    planes are pure functions of (table, plane, dim) shared with the
    in-memory kernel, so the driver can recompute any query's bucket
    without touching the index."""
    sig = lsh_buckets(emb, dim, id_col, vec_col, n_planes, n_tables)
    (sig.write.mode("overwrite").partitionBy("table", "bucket")
     .parquet(f"{path}/buckets"))


def lsh_index_topk(spark: SparkSession, path: str, dim: int,
                   query_vecs: list[tuple[int, list[float]]], k: int,
                   n_planes: int = _N_PLANES,
                   n_tables: int = _N_TABLES) -> DataFrame:
    """Query a persisted LSH index with explicit (query_id, vector)
    pairs: each query's per-table bucket is computed DRIVER-SIDE from
    the shared plane functions, and the scan filter
    `(table, bucket) IN (...)` prunes to at most |Q|·L directories.
    Exact cosine re-rank within candidates; same (sim desc, id asc)
    order as lsh_ann_topk. Returns (query_id, neighbor_id, sim)."""
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
    scored = cand.withColumn(
        "sim", F.round(cosine(F.col("qv"), F.col("v")), 6))
    probe = pruned.limit(SALT_TOPK_MIN_CORPUS).count()
    return _topk_per_query(scored, k, max_candidates=probe)
