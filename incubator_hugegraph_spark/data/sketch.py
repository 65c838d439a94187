"""Frequency sketches for training-data pipelines: count-min sketch
and heavy hitters.

Beyond-reference scope (the brief's "novel sketch" slot): at 100 TB,
exact per-key frequency tables can be as large as the corpus, while a
count-min sketch is a FIXED d×w counter grid regardless of scale —
the standard streaming-frequency structure (Cormode & Muthukrishnan,
"An Improved Data Stream Summary: The Count-Min Sketch and its
Applications", J. Algorithms 2005). Build = one explode + groupBy
with map-side partial aggregation (one shuffle of at most d×w
groups); estimation joins the broadcast-sized sketch.

Determinism / oracle parity: the d row-hash functions are md5-prefix
hashes (data/dedup.portable_hash28) salted with the row index, so a
DuckDB oracle reproduces the sketch — and therefore the estimates —
bit-for-bit. Estimates are the classic min-over-rows upper bound:
est(k) ≥ true(k), with overestimation bounded by ε·N at the usual
(ε = e/w, δ = e^-d) guarantees.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from incubator_hugegraph_spark.data.dedup import portable_hash28

#: default grid: 4 rows × 1024 buckets ≈ 4K counters total
_D, _W = 4, 1024


def _bucket(key_col, row: int, w: int):
    return portable_hash28(F.concat(F.lit(f"r{row}:"), key_col)) % w


def count_min(df: DataFrame, key_col: str, d: int = _D,
              w: int = _W) -> DataFrame:
    """Build the sketch: (row, bucket, cnt), at most d×w rows. One
    explode + one groupBy (partial agg map-side) — the sketch size is
    independent of |df|."""
    k = F.col(key_col).cast("string")
    rb = F.explode(F.array(*[
        F.struct(F.lit(r).alias("row"),
                 _bucket(k, r, w).alias("bucket"))
        for r in range(d)])).alias("rb")
    return (df.select(rb).select("rb.row", "rb.bucket")
            .groupBy("row", "bucket")
            .agg(F.count(F.lit(1)).alias("cnt")))


def cm_estimate(cms: DataFrame, keys: DataFrame, key_col: str,
                d: int = _D, w: int = _W) -> DataFrame:
    """(key, est) for every row of ``keys``: est = min over the d rows
    of the key's bucket counter. The sketch is broadcast (≤ d×w
    rows); keys stream through."""
    k = F.col(key_col).cast("string")
    probes = keys.select(
        k.alias("key"),
        F.explode(F.array(*[
            F.struct(F.lit(r).alias("row"),
                     _bucket(k, r, w).alias("bucket"))
            for r in range(d)])).alias("rb")) \
        .select("key", "rb.row", "rb.bucket")
    # LEFT join + coalesce 0: the sketch table is SPARSE (only
    # touched buckets have rows), so an empty bucket is count 0 and
    # must participate in the min — an inner join silently dropped
    # never-seen keys from the output, or worse returned a colliding
    # hot bucket's count when only SOME of a key's d buckets were
    # empty (code review r06; the min-over-d-rows estimate is the
    # entire point of the d hash rows)
    return (probes.join(F.broadcast(cms), on=["row", "bucket"],
                        how="left")
            .withColumn("cnt", F.coalesce("cnt", F.lit(0)))
            .groupBy("key").agg(F.min("cnt").alias("est")))


def heavy_hitters(df: DataFrame, key_col: str, threshold: float,
                  d: int = _D, w: int = _W) -> DataFrame:
    """Keys whose count-min ESTIMATE is ≥ threshold × |df| —
    (key, est, est_frac).

    Candidates come from a MAP-SIDE pigeonhole pre-filter (r03 advice
    fix — the old distinct-keys candidate pass shuffled every key in
    the corpus): a key with total count ≥ θ·N must count ≥ θ·N/P
    inside at least one of the P partitions, so each partition emits
    only its locally-frequent keys (≤ P/θ candidates overall — tracks
    hitters, not keys). No false negatives: a true heavy hitter
    always survives the pre-filter, and est ≥ true count. The
    per-partition counter is bounded by that partition's distinct
    keys (the standard local-heavy-hitter working set). Estimate-only
    hitters (collision-inflated keys below θ·N true count) can be
    pruned — at d×w = 5×1024 per-sketch resolution that requires
    adversarial collision pileup."""
    cms = count_min(df, key_col, d, w)
    return hitters_from_cms(cms, df, key_col, threshold, d, w)


def hitters_from_cms(cms: DataFrame, df: DataFrame, key_col: str,
                     threshold: float, d: int = _D,
                     w: int = _W) -> DataFrame:
    """Heavy-hitter estimation given an already-built sketch — shared
    by the batch path (heavy_hitters) and the streaming path
    (streaming/events.run_stream_heavy_hitters, whose sketch is the
    stateful-aggregation sink). Candidates come from the map-side
    pigeonhole pre-filter over ``df`` (see heavy_hitters)."""
    import pandas as pd
    total = df.count()
    nparts = max(df.rdd.getNumPartitions(), 1)
    local_min = threshold * total / nparts

    def local_candidates(batches):
        from collections import Counter
        c: Counter = Counter()
        for pdf in batches:
            c.update(pdf["key"].astype(str))
        yield pd.DataFrame(
            {"key": [k for k, n in c.items() if n >= local_min]})

    keys = (df.select(F.col(key_col).cast("string").alias("key"))
            .mapInPandas(local_candidates, "key string")
            .distinct())
    est = cm_estimate(cms, keys, "key", d, w)
    return (est.filter(F.col("est") >= threshold * total)
            .select("key", "est",
                    F.round(F.col("est") / total, 6).alias("est_frac")))


def kmv_distinct(df: DataFrame, key_col: str, k: int = 256) -> DataFrame:
    """K-minimum-values distinct-count estimate (Bar-Yossef et al.,
    "Counting distinct elements in a data stream", RANDOM 2002):
    hash every key into [0, 1), keep the k smallest values; with m_k
    the k-th minimum, distinct ≈ (k-1)/m_k. One row out:
    (k_used, kth_min, distinct_est).

    Scale: the only corpus pass is hash+distinct; the k smallest is a
    TakeOrdered (per-partition top-k, no full sort). Exact below k
    distinct keys (the estimator degenerates to the true count).
    md5-prefix hashing keeps it bit-reproducible in a SQL oracle."""
    h = (portable_hash28(F.col(key_col).cast("string"))
         .cast("double") / F.lit(float(1 << 28))).alias("h")
    # NULL keys hash to NULL and would sort FIRST under orderBy asc,
    # entering the k-min set as a phantom value (streaming review r06)
    mins = (df.filter(F.col(key_col).isNotNull())
            .select(h).distinct().orderBy("h").limit(k)
            .agg(F.count(F.lit(1)).alias("k_used"),
                 F.max("h").alias("kth_min")))
    return mins.select(
        "k_used", F.round("kth_min", 9).alias("kth_min"),
        F.when(F.col("k_used") < k,
               F.col("k_used").cast("double"))
        .otherwise(F.round((F.col("k_used") - 1) / F.col("kth_min"), 3))
        .alias("distinct_est"))
