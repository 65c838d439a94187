"""Deterministic sampling / splitting for training-data pipelines.

Both primitives key on md5 of the id, NOT on `rand()` or row order:
the assignment of a document is a pure function of its id, so splits
are reproducible across runs, partitionings, and engines (the DuckDB
oracle reproduces them bit-for-bit), and re-ingesting a document can
never migrate it between train and test — the leakage property a
training pipeline actually needs.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

# 6 hex chars → 24 bits of hash; plenty for split ratios while staying
# exactly representable in a double (no rounding disagreement between
# engines on the threshold compare)
_HASH_DENOM = float(16 ** 6)


def hash_unit(col: Column, salt: str | None = None) -> Column:
    """md5-derived uniform value in [0, 1) — deterministic per id.
    ``salt`` makes families of hash decisions INDEPENDENT: the three
    sampling primitives previously shared the unsalted digest, so
    domain_sample(0.5) followed by hash_split left val/test EMPTY
    (every survivor had u < 0.5 — similarity review r06)."""
    c = col.cast("string") if salt is None \
        else F.concat(F.lit(salt + ":"), col.cast("string"))
    return (F.conv(F.substring(F.md5(c), 1, 6), 16, 10)
            .cast("double") / F.lit(_HASH_DENOM))


def _require_ids(df: DataFrame, id_col: str) -> DataFrame:
    """NULL ids would silently fall through every hash-range compare
    (all landing in the last split / dropped by filters — review
    r06): fail loudly at execution instead. The check RIDES the id
    column itself (when/raise_error) — a separate dropped check
    column gets pruned by Catalyst and never fires."""
    return df.withColumn(
        id_col,
        F.when(F.col(id_col).isNull(), F.raise_error(
            F.lit(f"{id_col} must not be NULL for hash sampling"))
            .cast(df.schema[id_col].dataType))
        .otherwise(F.col(id_col)))


def hash_split(df: DataFrame, ratios: dict[str, float],
               id_col: str = "doc_id") -> DataFrame:
    """Assign every row to a named split by cumulative hash ranges.

    ratios e.g. {"train": 0.9, "val": 0.05, "test": 0.05} (must sum to
    ~1; the last split absorbs the remainder). Pure projection — no
    shuffle, scales to any size. Returns the input plus `split`."""
    names = list(ratios)
    df = _require_ids(df, id_col)
    u = hash_unit(F.col(id_col), salt="split")
    expr = F.lit(names[-1])
    acc = 0.0
    bounds = []
    for nm in names[:-1]:
        acc += ratios[nm]
        bounds.append((nm, acc))
    for nm, b in reversed(bounds):
        expr = F.when(u < F.lit(b), F.lit(nm)).otherwise(expr)
    return df.withColumn("split", expr)


def stratified_sample(df: DataFrame, strata_col: str, n_per_stratum: int,
                      id_col: str = "doc_id") -> DataFrame:
    """Deterministic quota sample: the ``n_per_stratum`` rows with the
    smallest id-hash per stratum (ties broken by id). One shuffle on
    the stratum key; skewed strata cost what their size costs — the
    hash order makes the sample stable under re-partitioning."""
    w = Window.partitionBy(strata_col).orderBy(
        hash_unit(F.col(id_col), salt="strat"), F.col(id_col))
    return (df.withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") <= n_per_stratum).drop("__rn"))


def pack_sequences(docs: DataFrame, seq_len: int = 2048,
                   n_buckets: int = 4096,
                   text_col: str = "text",
                   id_col: str = "doc_id") -> DataFrame:
    """Pretraining sequence packing: documents are concatenated in
    id order into one token stream cut every ``seq_len`` tokens.
    Returns (id, n_tokens, seq_id, offset) — the sequence each doc
    STARTS in and its token offset there (a doc may straddle into the
    following sequences, as concat-and-cut packing does).

    Scale shape: a naive ``SUM() OVER (ORDER BY id)`` is a
    single-partition window. This is the standard TWO-PHASE prefix
    sum instead: per-bucket token totals (one tiny aggregate,
    #buckets rows) are prefix-summed and joined back (broadcast), and
    the expensive window runs per bucket — every partition-sized
    piece of the cumsum is independent, so the op scales to any
    corpus while producing the exact global cumsum."""
    from incubator_hugegraph_spark.functions.text import token_count

    # bucket by UNIFORM ID RANGES, not id//bucket_size: sparse id
    # spaces (snowflake/timestamp ids) would otherwise mint ~|N|
    # buckets and the prefix window would degenerate to the
    # corpus-scale single-partition sort this design avoids (review
    # r06). (max-min)/target ranges bound #buckets regardless of id
    # density; one cheap min/max agg.
    lo, hi = docs.agg(F.min(id_col), F.max(id_col)).first()
    if lo is None:
        lo, hi = 0, 0
    span = max(1, int(hi) - int(lo) + 1)
    t = docs.select(F.col(id_col).alias("id"),
                    token_count(F.col(text_col)).alias("n_tokens"),
                    ((F.col(id_col) - F.lit(int(lo)))
                     * F.lit(n_buckets) / F.lit(span))
                    .cast("long").alias("__b"))
    per_bucket = (t.groupBy("__b")
                  .agg(F.sum("n_tokens").alias("__bsum")))
    w_prefix = Window.orderBy("__b") \
        .rowsBetween(Window.unboundedPreceding, -1)
    prefix = per_bucket.select(
        "__b", F.coalesce(F.sum("__bsum").over(w_prefix), F.lit(0))
        .alias("__prev_buckets"))  # #buckets rows — trivially small
    w_local = Window.partitionBy("__b").orderBy("id") \
        .rowsBetween(Window.unboundedPreceding, -1)
    return (t.join(F.broadcast(prefix), on="__b")
            .withColumn("__start",
                        F.col("__prev_buckets")
                        + F.coalesce(F.sum("n_tokens").over(w_local),
                                     F.lit(0)))
            .select("id", "n_tokens",
                    (F.col("__start") / seq_len).cast("long")
                    .alias("seq_id"),
                    (F.col("__start") % seq_len).alias("offset")))


def domain_sample(df: DataFrame, fractions: dict[str, float],
                  domain_col: str = "source",
                  id_col: str = "doc_id") -> DataFrame:
    """Deterministic per-domain subsampling toward a target mixture
    (the resampling step of domain-weighting recipes a la DoReMi /
    The Pile): keep a row iff hash_unit(id) < fractions[domain];
    domains absent from the map keep everything. Assignment is a
    pure function of the id — reproducible across runs and engines,
    stable under repartitioning, one filter projection at any scale
    (same posture as hash_split: no shuffle, no state). Compute the
    fractions driver-side from target weights w_d and corpus counts
    n_d as f_d = min(1, w_d * N_target / n_d)."""
    df = _require_ids(df, id_col)
    u = hash_unit(F.col(id_col), salt="domain")
    expr = F.lit(1.0)
    for dom, frac in sorted(fractions.items()):
        expr = F.when(F.col(domain_col) == dom,
                      F.lit(float(frac))).otherwise(expr)
    return df.filter(u < expr)


def token_budget_sample(docs: DataFrame, budget: int,
                        score_col: str = "score",
                        n_bins: int = 1024,
                        text_col: str = "text",
                        id_col: str = "doc_id") -> DataFrame:
    """Quality-ranked selection under a TOKEN BUDGET — the "take the
    best documents until we have N training tokens" step every
    curated-pretraining recipe ends with: rank by ``score_col``
    (descending, id-tiebroken), accumulate token counts, keep the
    greedy prefix whose cumulative count stays under ``budget``.

    Returns every doc with (id, n_tokens, score, cum_before, keep) so
    callers can inspect the cut line; ``keep`` marks docs STARTING
    before the budget is exhausted (the crossing doc is included —
    greedy-prefix semantics).

    Scale shape: the naive ``SUM() OVER (ORDER BY score DESC)`` is a
    single-partition global window. Here the exact cumsum comes from
    the same TWO-PHASE pattern as ``pack_sequences``, but bucketed by
    SCORE RANGE (fixed-width bins over the observed [min,max], one
    scalar aggregate): per-bin totals prefix-sum (tiny, broadcast),
    the expensive window runs per bin. Bins only partition the sort
    order — exactness is unconditional; a pathologically point-massed
    score distribution degrades one bin's window (raise ``n_bins`` or
    pre-discretize the score)."""
    from incubator_hugegraph_spark.functions.text import token_count

    allrows = docs.select(
        F.col(id_col).alias("id"),
        token_count(F.col(text_col)).alias("n_tokens"),
        F.col(score_col).cast("double").alias("score"))
    # UNSCORED docs stay in the output as keep=false / cum_before
    # null rows — the contract promises EVERY doc so callers can
    # audit the cut line; silently dropping them miscounted the
    # rejected set (review r06)
    unscored = allrows.filter(F.col("score").isNull()).select(
        "id", "n_tokens", "score",
        F.lit(None).cast("bigint").alias("cum_before"),
        F.lit(False).alias("keep"))
    t = allrows.filter(F.col("score").isNotNull())
    lo, hi = t.agg(F.min("score"), F.max("score")).head()
    if lo is None:
        # empty input (or every score null) — return the empty result
        # with the declared schema instead of a None-comparison
        # TypeError (code review r06: an upstream filter wiping the
        # corpus aborted the pipeline with an unrelated error)
        return t.select(
            "id", "n_tokens", "score",
            F.lit(0).cast("bigint").alias("cum_before"),
            F.lit(False).alias("keep")).unionByName(unscored)
    width = (hi - lo) / n_bins if hi > lo else 1.0
    # DESCENDING bin index so bin order == score-desc order
    t = t.withColumn(
        "__b", F.least(F.lit(n_bins - 1), F.greatest(F.lit(0), F.floor(
            (F.lit(hi) - F.col("score")) / F.lit(width)).cast("int"))))
    per_bin = t.groupBy("__b").agg(F.sum("n_tokens").alias("__bsum"))
    w_prefix = Window.orderBy("__b") \
        .rowsBetween(Window.unboundedPreceding, -1)
    prefix = per_bin.select(
        "__b", F.coalesce(F.sum("__bsum").over(w_prefix), F.lit(0))
        .alias("__prev"))
    w_local = Window.partitionBy("__b") \
        .orderBy(F.col("score").desc(), "id") \
        .rowsBetween(Window.unboundedPreceding, -1)
    return (t.join(F.broadcast(prefix), on="__b")
            .withColumn("cum_before",
                        F.col("__prev")
                        + F.coalesce(F.sum("n_tokens").over(w_local),
                                     F.lit(0)))
            .select("id", "n_tokens", "score", "cum_before",
                    (F.col("cum_before") < budget).alias("keep"))
            .unionByName(unscored))


def global_shuffle(df: DataFrame, n_shards: int = 8,
                   seed: str = "epoch0",
                   id_col: str = "doc_id") -> DataFrame:
    """Deterministic seeded global shuffle + sharding for training
    ingestion (the "shuffle the corpus every epoch" step): each doc
    gets a pseudorandom sort key ``ord = md5(seed:id)`` and a shard
    from a prefix of the same digest. Consuming order is (shard, ord).

    Pure projection — the query plans ZERO shuffles. The physical
    data movement happens once, at write time, as
    ``repartition(n_shards, "shard").sortWithinPartitions("ord")``:
    per-shard local order is what data loaders actually consume, and
    it avoids the global ORDER BY range-sampling pass that a total
    sort of 100 TB would cost. Changing ``seed`` re-permutes the
    corpus per epoch with no data movement until write. Assignment is
    a pure function of (seed, id): reproducible across runs,
    partitionings, and engines — same leakage-safety rationale as
    hash_split."""
    h = F.md5(F.concat(F.lit(seed + ":"), F.col(id_col).cast("string")))
    return df.select(
        id_col,
        (F.conv(F.substring(h, 1, 6), 16, 10).cast("bigint")
         % n_shards).alias("shard"),
        h.alias("ord"))


def _hashed_bigram_buckets(docs: DataFrame, n_buckets: int,
                           id_col: str, text_col: str) -> DataFrame:
    """(id, bucket, c): hashed word-bigram counts per doc. The bucket
    hash is md5-prefix mod n_buckets — engine-portable (the DuckDB
    oracle reproduces it bit-for-bit), unlike murmur/xxhash."""
    from incubator_hugegraph_spark.functions.text import tokenize
    toks = docs.select(F.col(id_col).alias("id"),
                       tokenize(text_col).alias("t"))
    bg = toks.select("id", F.explode(F.expr(
        "zip_with(slice(t, 1, greatest(size(t)-1, 0)),"
        "         slice(t, 2, greatest(size(t)-1, 0)),"
        "         (a, b) -> concat(a, '_', b))")).alias("bg"))
    bucket = (F.conv(F.substring(F.md5(F.col("bg")), 1, 6), 16, 10)
              .cast("bigint") % n_buckets)
    return (bg.select("id", bucket.alias("b"))
            .groupBy("id", "b").agg(F.count(F.lit(1)).alias("c")))


def dsir_weights(docs: DataFrame, target: DataFrame,
                 n_buckets: int = 4096, id_col: str = "doc_id",
                 text_col: str = "text") -> DataFrame:
    """DSIR importance weights (Xie et al. 2023, arXiv:2302.03169):
    score every raw doc by how target-like its hashed n-gram profile
    is. Features are hashed word-bigram counts; both corpora get
    add-1-smoothed bucket unigram models; a doc's log-importance
    weight is sum_b c_db * (log p_target(b) - log p_raw(b)).
    Selection = keep the top-weight docs (the resampling step of the
    paper collapses to top-k under a deterministic gate).

    Returns (id, w) for every raw doc, w rounded to 4 (summation-
    order ulp convention).

    100 TB shape: two corpus passes (bucket counts, then the weight
    sum), the models are n_buckets rows each — broadcast to the
    per-doc join; no all-pairs, no driver-side corpus state. The
    target corpus is typically tiny (a quality reference set), so its
    pass is cheap."""
    raw_b = _hashed_bigram_buckets(docs, n_buckets, id_col, text_col)
    tgt_b = _hashed_bigram_buckets(target, n_buckets, id_col, text_col)
    raw_counts = raw_b.groupBy("b").agg(F.sum("c").alias("cr"))
    tgt_counts = tgt_b.groupBy("b").agg(F.sum("c").alias("ct"))
    # every doc bucket exists in raw_counts (raw spans the corpus);
    # target-absent buckets smooth to count 0
    model = (raw_counts.join(tgt_counts, on="b", how="left")
             .select("b", "cr", F.coalesce("ct", F.lit(0)).alias("ct")))
    totals = model.agg(F.sum("cr").alias("nr"), F.sum("ct").alias("nt"))
    model = (model.crossJoin(F.broadcast(totals))
             .select("b", (
                 F.log((F.col("ct") + 1)
                       / (F.col("nt") + F.lit(float(n_buckets))))
                 - F.log((F.col("cr") + 1)
                         / (F.col("nr") + F.lit(float(n_buckets)))))
                 .alias("lr")))
    w = (raw_b.join(F.broadcast(model), on="b")
         .groupBy("id").agg(F.round(F.sum(F.col("c") * F.col("lr")), 4)
                            .alias("w")))
    return (docs.select(F.col(id_col).alias("id"))
            .join(w, on="id", how="left")
            .select("id", F.coalesce("w", F.lit(0.0)).alias("w")))


def chunk_docs(docs: DataFrame, chunk_tokens: int = 64,
               overlap: int = 8, text_col: str = "text",
               id_col: str = "doc_id") -> DataFrame:
    """Fixed-size token chunking with overlap — the RAG / embedding
    pipeline splitter: each doc becomes chunks of ``chunk_tokens``
    tokens whose starts step by ``chunk_tokens - overlap`` (so
    consecutive chunks share ``overlap`` tokens); the tail chunk may
    be shorter. Returns (id, chunk_ix, chunk, n_tokens).

    Pure narrow Column program — tokenize once, explode the start
    positions, slice+join. NO shuffle anywhere: chunking is
    embarrassingly parallel and rides the corpus scan."""
    if overlap >= chunk_tokens:
        raise ValueError("chunk_docs: overlap must be < chunk_tokens")
    from incubator_hugegraph_spark.functions.text import tokenize
    stride = chunk_tokens - overlap
    toks = tokenize(F.col(text_col))
    starts = F.sequence(
        F.lit(1), F.greatest(F.size(toks) - overlap, F.lit(1)),
        F.lit(stride))
    out = (docs
           .select(F.col(id_col).alias("id"), toks.alias("__t"),
                   F.explode(starts).alias("__s"))
           .select("id",
                   ((F.col("__s") - 1) / stride).cast("long")
                   .alias("chunk_ix"),
                   F.array_join(F.slice("__t", F.col("__s"),
                                        chunk_tokens), " ")
                   .alias("chunk"),
                   F.size(F.slice("__t", F.col("__s"), chunk_tokens))
                   .cast("long").alias("n_tokens")))
    return out.filter(F.col("n_tokens") > 0)
