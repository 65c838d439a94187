"""Document deduplication: exact, normalized, n-gram Jaccard,
MinHash+LSH, SimHash.

Scale design (the point of each variant):
- exact/normalized: one hash-groupBy shuffle — works at any scale.
- ngram_jaccard_pairs: exact pairwise verification through a
  shingle-inverted-index join — the join key is the shingle, so only
  docs sharing a shingle ever meet. Correct but worst-case quadratic
  on hot shingles → this is the ORACLE/verify kernel, not the scale
  path.
- minhash_lsh: the 100 TB path. shingles → 64 minhashes → 16 bands of
  4 → band-bucket join → candidate pairs (near-linear), then exact
  verification with ngram jaccard on candidates only.
- simhash: 64-bit fingerprint; near-dup = hamming ≤ k via 4×16-bit
  chunk banding (a pair within hamming ≤ 3 shares ≥1 exact chunk).

All hash functions are Spark-deterministic (murmur3 `hash`,
`xxhash64`) with fixed seeds; LSH results are reproducible run-to-run.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from incubator_hugegraph_spark.functions.text import (WS_SPLIT_RE,
                                                      tokenize)
from incubator_hugegraph_spark.graph import spread_small_input

# 64 minhash permutations h_i(x) = (a_i·x + b_i) mod P (Carter-Wegman).
# P = 2^31-1 (Mersenne) keeps a·h+b < 2^63 — no int64 overflow under
# ANSI mode: h,a < 2^31 → a·h < 2^62.
_P = (1 << 31) - 1
_N_HASHES = 64
_BANDS = 16
_ROWS = _N_HASHES // _BANDS


def _det_coeffs(n: int) -> list[tuple[int, int]]:
    # deterministic LCG-derived coefficients (no RNG state)
    coeffs, x = [], 0x9E3779B97F4A7C15
    for _ in range(n):
        x = (x * 6364136223846793005 + 1442695040888963407) % (1 << 64)
        a = (x % (_P - 1)) + 1
        x = (x * 6364136223846793005 + 1442695040888963407) % (1 << 64)
        b = x % _P
        coeffs.append((a, b))
    return coeffs


_COEFFS = _det_coeffs(_N_HASHES)


def exact_dedup(docs: DataFrame, text_col: str = "text",
                id_col: str = "doc_id") -> DataFrame:
    """Exact dedup groups: (hash, keeper, n_dups) per duplicated text;
    keeper = min id. One groupBy shuffle."""
    return (docs.select(F.md5(F.col(text_col)).alias("text_hash"), id_col)
            .groupBy("text_hash")
            .agg(F.min(id_col).alias("keeper"),
                 F.count(F.lit(1)).alias("n_docs"))
            .filter(F.col("n_docs") > 1))


def normalize_text(col) -> F.Column:
    """lower → collapse non-alphanumeric runs to single space → trim."""
    c = F.col(col) if isinstance(col, str) else col
    return F.trim(F.regexp_replace(F.lower(c), r"[^a-z0-9]+", " "))


def normalized_dedup(docs: DataFrame, text_col: str = "text",
                     id_col: str = "doc_id") -> DataFrame:
    """Near-exact dedup on normalized text (case/punct/whitespace
    insensitive): (keeper, n_docs) per normalized group."""
    return (docs.select(F.md5(normalize_text(text_col)).alias("norm_hash"),
                        id_col)
            .groupBy("norm_hash")
            .agg(F.min(id_col).alias("keeper"),
                 F.count(F.lit(1)).alias("n_docs")))


def word_shingles(docs: DataFrame, n: int = 3, text_col: str = "text",
                  id_col: str = "doc_id",
                  distinct: bool = True) -> DataFrame:
    """(id, shingle) word n-grams — distinct per doc by default (the
    set semantics every dedup consumer wants); ``distinct=False``
    keeps multiplicity (intra-doc repetition metrics). JVM-side
    only."""
    # NOTE (measured, round 3): the corpus fixture arrives as one
    # parquet split, serializing the tokenize+explode pass — but
    # force-repartitioning here made the END-TO-END LSH pipeline ~25%
    # SLOWER at sf0.1 (21.9s → 27.7s cold): the pass runs twice per
    # pipeline and the added shuffle + RDD-plan materialization cost
    # more than the single-core scan saves. At 100 TB the input has
    # thousands of splits and the question is moot; leave the plan to
    # Catalyst/AQE.
    toks = tokenize(F.col(text_col))
    sh = F.when(
        F.size(toks) >= n,
        F.transform(F.sequence(F.lit(1), F.size(toks) - (n - 1)),
                    lambda i: F.array_join(F.slice(toks, i, n), " "))
    ).otherwise(F.array().cast("array<string>"))
    out = docs.select(F.col(id_col).alias("id"),
                      F.explode(sh).alias("shingle"))
    return out.distinct() if distinct else out


def ngram_jaccard_pairs(docs: DataFrame, n: int = 3, threshold: float = 0.3,
                        text_col: str = "text",
                        id_col: str = "doc_id") -> DataFrame:
    """All doc pairs with word-n-gram Jaccard ≥ threshold
    (d1 < d2, exact — inverted-index join). Returns
    (d1, d2, jaccard)."""
    from incubator_hugegraph_spark.graph import checkpointed
    # consumed three times (both join sides + the size table):
    # materialize the shingle inverted index once
    sh = checkpointed(word_shingles(docs, n, text_col, id_col))
    cnt = sh.groupBy("id").agg(F.count(F.lit(1)).alias("n_sh"))
    a = sh.select(F.col("id").alias("d1"), "shingle")
    b = sh.select(F.col("id").alias("d2"), "shingle")
    inter = (a.join(b, on="shingle")
             .filter(F.col("d1") < F.col("d2"))
             .groupBy("d1", "d2").agg(F.count(F.lit(1)).alias("inter")))
    return (inter
            .join(cnt.select(F.col("id").alias("d1"),
                             F.col("n_sh").alias("n1")), on="d1")
            .join(cnt.select(F.col("id").alias("d2"),
                             F.col("n_sh").alias("n2")), on="d2")
            .withColumn("jaccard", F.col("inter")
                        / (F.col("n1") + F.col("n2") - F.col("inter")))
            .filter(F.col("jaccard") >= threshold)
            .select("d1", "d2", F.round("jaccard", 6).alias("jaccard")))


def portable_hash28(col) -> F.Column:
    """28-bit hash both Spark and DuckDB compute identically:
    first 7 hex chars of md5 as an integer. Spark:
    conv(substr(md5(x),1,7),16,10); DuckDB: ('0x'||substr(md5(x),1,7))
    ::BIGINT. Used when a query must hash-match a SQL oracle;
    murmur3/xxhash64 stay the default (cheaper) scale path."""
    c = F.col(col) if isinstance(col, str) else col
    return F.conv(F.substring(F.md5(c), 1, 7), 16, 10).cast("long")


def portable_hash60(col) -> F.Column:
    """60-bit md5-prefix hash (15 hex chars), portable to DuckDB."""
    c = F.col(col) if isinstance(col, str) else col
    return F.conv(F.substring(F.md5(c), 1, 15), 16, 10).cast("long")


def minhash_signatures(docs: DataFrame, n: int = 3, text_col: str = "text",
                       id_col: str = "doc_id",
                       portable: bool = False) -> DataFrame:
    """(id, sig array<long>[64]): minhash over shingle hashes.
    One shuffle (groupBy id); the 64 mins are one aggregation pass.
    ``portable=True`` swaps murmur3 for the md5-prefix hash so a
    DuckDB oracle can reproduce the signature bit-for-bit."""
    sh = word_shingles(docs, n, text_col, id_col)
    if portable:
        h = sh.withColumn("h", portable_hash28("shingle"))
    else:
        h = sh.withColumn("h", (F.hash("shingle").cast("long")
                                .bitwiseAND(F.lit((1 << 32) - 1))) % _P)
    # NOTE (measured): the 64 permutation-mins as one Column aggregate
    # disable whole-stage codegen (generated method over the JIT
    # limit), but the interpreted partial-agg still beat an
    # Arrow-batched numpy partial-min pass end-to-end at every tested
    # SF — the Arrow round-trip dominates below ~10M shingle rows.
    # Revisit the mapInPandas variant only for corpora where the
    # shingle table is billions of rows per executor.
    mins = [F.min((F.col("h") * a + b) % _P).alias(f"m{i}")
            for i, (a, b) in enumerate(_COEFFS)]
    agg = h.groupBy("id").agg(*mins)
    return agg.select("id", F.array(*[f"m{i}" for i in range(_N_HASHES)])
                      .alias("sig"))


def band_rows(sig: DataFrame, portable: bool = False) -> DataFrame:
    """Signature table → LSH band rows (id, band, bucket): _BANDS rows
    per doc, bucket = the band's row slice (string key portable to a
    SQL oracle, or the cheaper murmur3 key)."""
    if portable:
        bucket_of = lambda bi: F.concat_ws(  # noqa: E731
            "_", *[F.col("sig")[bi * _ROWS + r].cast("string")
                   for r in range(_ROWS)])
    else:
        bucket_of = lambda bi: F.hash(  # noqa: E731
            *[F.col("sig")[bi * _ROWS + r] for r in range(_ROWS)]) \
            .cast("string")
    return sig.select(
        "id",
        F.explode(F.array(*[
            F.struct(F.lit(bi).alias("band"),
                     bucket_of(bi).alias("bucket"))
            for bi in range(_BANDS)])).alias("bb")) \
        .select("id", "bb.band", "bb.bucket")


def verify_pairs(cand: DataFrame, docs: DataFrame, n: int = 3,
                 threshold: float = 0.3, text_col: str = "text",
                 id_col: str = "doc_id") -> DataFrame:
    """Exact-jaccard verification of candidate (d1, d2) pairs: the
    shingle inverted index is rebuilt from just the docs appearing in
    a candidate pair, and the pair join is semi-filtered to candidates
    before grouping — at scale the verify cost tracks |candidates|,
    not the corpus (the whole point of LSH). The threshold filter runs
    on the UNROUNDED ratio (rounding only for output), matching the
    oracle's unrounded filter bit-exactly."""
    from incubator_hugegraph_spark.graph import checkpointed
    in_cand = (cand.select(F.col("d1").alias("cid"))
               .union(cand.select(F.col("d2").alias("cid"))).distinct())
    sub = docs.join(F.broadcast(in_cand),
                    on=F.col(id_col) == F.col("cid"), how="left_semi")
    # consumed three times below (s1, s2, cnt) — materialize the
    # candidate-restricted shingle table once (bounded by the
    # candidate set, not the corpus)
    sh = checkpointed(word_shingles(sub, n, text_col, id_col))
    cnt = sh.groupBy("id").agg(F.count(F.lit(1)).alias("n_sh"))
    # per-pair intersection via (doc, shingle)-keyed joins: row volume
    # is Σ_cand |shingles(d1)| — linear in candidates × doc size. A
    # shingle-keyed inverted-index join would instead square on hot
    # shingles (boilerplate n-grams), the exact blowup LSH avoids.
    s1 = sh.select(F.col("id").alias("d1"), "shingle")
    s2 = sh.select(F.col("id").alias("d2"), "shingle")
    inter = (cand.join(s1, on="d1")
             .join(s2, on=["d2", "shingle"], how="left_semi")
             .groupBy("d1", "d2").agg(F.count(F.lit(1)).alias("inter")))
    out = (inter
           .join(cnt.select(F.col("id").alias("d1"),
                            F.col("n_sh").alias("n1")), on="d1")
           .join(cnt.select(F.col("id").alias("d2"),
                            F.col("n_sh").alias("n2")), on="d2")
           .withColumn("jaccard", F.col("inter")
                       / (F.col("n1") + F.col("n2") - F.col("inter")))
           .filter(F.col("jaccard") >= threshold)
           .select("d1", "d2", F.round("jaccard", 6).alias("jaccard")))
    # expose the verify-side checkpoint handle so long-running callers
    # (the streaming snapshot driver) can free it once the result is
    # materialized — a localCheckpoint's blocks otherwise linger until
    # JVM GC notices (r11; one leaked per micro-batch on the neardup
    # streams). Batch callers may ignore it: GC reclamation is the
    # pre-r11 behavior.
    out._fold_scratch = [sh]
    return out




def minhash_lsh_pairs(docs: DataFrame, n: int = 3, threshold: float = 0.3,
                      text_col: str = "text",
                      id_col: str = "doc_id",
                      portable: bool = False) -> DataFrame:
    """MinHash-LSH near-dup pairs, exact-verified: shingle → minhash →
    band buckets → bucket join (candidates) → exact jaccard filter.
    Returns (d1, d2, jaccard) — a subset of ngram_jaccard_pairs with
    high recall at a fraction of the comparisons. ``portable=True``
    uses the md5-prefix shingle hash + string band keys so the DuckDB
    oracle reproduces the exact candidate set."""
    from incubator_hugegraph_spark.graph import checkpointed
    # byte-sized spread (r11, r10 verdict item 1): a fewer-splits-
    # than-needed corpus is round-robined to ceil(bytes/128MB)
    # partitions — identity for the sub-MB bench fixtures (the r10
    # defaultParallelism fan-out put 32 concurrent explode+agg tasks
    # on one shared heap and read 36-47 s on the driver vs 8 s
    # unspread) and for real many-split corpora; it engages only for
    # the mid-size single-file case it was built for.
    docs = spread_small_input(docs)
    # the band table self-joins (l × r): without materialization the
    # whole shingle→minhash chain executes once PER SIDE. One eager
    # checkpoint of the signature table (|docs| rows × 64 longs —
    # vector-sized, never corpus-sized) halves the cold pipeline
    # (measured sf0.1: 21.9s → 12.4s).
    sig = checkpointed(
        minhash_signatures(docs, n, text_col, id_col, portable=portable))
    bands = band_rows(sig, portable)
    l = bands.select(F.col("id").alias("d1"), "band", "bucket")
    r = bands.select(F.col("id").alias("d2"), "band", "bucket")
    cand = (l.join(r, on=["band", "bucket"])
            .filter(F.col("d1") < F.col("d2"))
            .select("d1", "d2").distinct())
    return verify_pairs(cand, docs, n, threshold, text_col, id_col)


def simhash(docs: DataFrame, text_col: str = "text",
            id_col: str = "doc_id", portable: bool = False) -> DataFrame:
    """(id, simhash long): SimHash over token hash bits — per-bit
    weighted majority, all in Column expressions (the bit sums are one
    aggregation over exploded tokens). Default: 64-bit xxhash64.
    ``portable=True``: 60-bit md5-prefix hash (DuckDB-reproducible)."""
    n_bits = 60 if portable else 64
    toks = docs.select(F.col(id_col).alias("id"),
                       F.explode(tokenize(F.col(text_col))).alias("tok"))
    if portable:
        toks = toks.withColumn("h", portable_hash60("tok"))
    else:
        toks = toks.withColumn("h", F.xxhash64("tok"))
    bit_sums = [
        F.sum(F.when(F.shiftright(F.col("h"), b).bitwiseAND(F.lit(1)) == 1,
                     1).otherwise(-1)).alias(f"b{b}")
        for b in range(n_bits)]
    agg = toks.groupBy("id").agg(*bit_sums)
    fp = F.lit(0).cast("long")
    for b in range(n_bits):
        fp = fp + F.when(F.col(f"b{b}") > 0,
                         F.lit(1).cast("long") * (1 << b) if b < 63
                         else F.lit(-(1 << 63)).cast("long")) \
            .otherwise(F.lit(0).cast("long"))
    return agg.select("id", fp.alias("simhash"))


def _hamming_chunks(hashes: DataFrame, hash_col: str, id_col: str,
                    chunk_width: int) -> DataFrame:
    """(id, h, chunk, val) — the 4-band explode both Hamming joins
    share."""
    mask = (1 << chunk_width) - 1
    return (hashes.select(
        F.col(id_col).alias("id"), F.col(hash_col).alias("h"),
        F.explode(F.array(*[
            F.struct(F.lit(c).alias("chunk"),
                     F.shiftrightunsigned(hash_col, c * chunk_width)
                     .bitwiseAND(F.lit(mask)).alias("val"))
            for c in range(4)])).alias("cc"))
        .select("id", "h", "cc.chunk", "cc.val"))


#: Default per-(chunk,val) bucket cap shared by hamming_near_pairs
#: and hamming_cross_pairs. A
#: 16-bit chunk of a CONTENT hash spreads a healthy corpus across
#: 65k buckets; a bucket this hot means a degenerate fingerprint
#: (flat images, digital silence, empty text) — the perceptual
#: analogue of a stopword. Far above anything a real near-dup
#: cluster produces, so the cap never fires on honest data (capped
#: ≡ uncapped, equivalence-tested); when it does fire, the quadratic
#: bucket it removes would have melted one reducer anyway.
HAMMING_MAX_BUCKET = 100_000


def hamming_cross_pairs(left: DataFrame, right: DataFrame,
                        max_hamming: int = 3,
                        hash_col: str = "simhash",
                        id_col: str = "id",
                        chunk_width: int = 16,
                        max_bucket: int | None = HAMMING_MAX_BUCKET,
                        ) -> DataFrame:
    """CROSS-CORPUS Hamming near-pairs (train × bench decontamination
    for fingerprinted media/text): every (left id, right id) pair
    within hamming ≤ max_hamming of their 64-bit fingerprints —
    banded on 4 chunks (pigeonhole-exact at ≤ 3), verified by
    bit_count(xor). Like cross_neardup for MinHash, the work is
    per-side fingerprints + one bucket join: no left×left or
    right×right pairs are ever formed. Returns (d1 from left,
    d2 from right, hamming)."""
    if max_hamming > 3:
        # 4-band pigeonhole is only exact to 3 — a larger threshold
        # would SILENTLY drop pairs spread across all four chunks
        raise ValueError(
            f"max_hamming={max_hamming} > 3 breaks the 4-chunk "
            "pigeonhole (pairs would be silently missed)")
    l = (_hamming_chunks(left, hash_col, id_col, chunk_width)
         .select(F.col("id").alias("d1"), F.col("h").alias("s1"),
                 "chunk", "val"))
    r = (_hamming_chunks(right, hash_col, id_col, chunk_width)
         .select(F.col("id").alias("d2"), F.col("h").alias("s2"),
                 "chunk", "val"))
    if max_bucket is not None:
        # same stop-hash policy as hamming_near_pairs (review r07 —
        # the guard was self-join-only, leaving the decontamination
        # leg open to a |train_degenerate| x |bench_degenerate| hot
        # bucket): drop a (chunk,val) bucket when EITHER side exceeds
        # the cap; a pair is lost only when every chunk it shares is
        # degenerate on one of its sides.
        l_ok = (l.groupBy("chunk", "val")
                .agg(F.count(F.lit(1)).alias("__n"))
                .filter(F.col("__n") <= max_bucket)
                .select("chunk", "val"))
        r_ok = (r.groupBy("chunk", "val")
                .agg(F.count(F.lit(1)).alias("__n"))
                .filter(F.col("__n") <= max_bucket)
                .select("chunk", "val"))
        l = (l.join(l_ok, on=["chunk", "val"], how="left_semi")
             .join(r_ok, on=["chunk", "val"], how="left_semi"))
        r = (r.join(r_ok, on=["chunk", "val"], how="left_semi")
             .join(l_ok, on=["chunk", "val"], how="left_semi"))
    return (l.join(r, on=["chunk", "val"])
            .select("d1", "d2", "s1", "s2").distinct()
            .withColumn("hamming", F.bit_count(
                F.col("s1").bitwiseXOR(F.col("s2"))))
            .filter(F.col("hamming") <= max_hamming)
            .select("d1", "d2", "hamming"))


def hamming_near_pairs(hashes: DataFrame, max_hamming: int = 3,
                       hash_col: str = "simhash",
                       id_col: str = "id",
                       chunk_width: int = 16,
                       max_bucket: int | None = HAMMING_MAX_BUCKET,
                       ) -> DataFrame:
    """Generic chunked-Hamming near-pair join over a 64-bit-packed
    fingerprint column: band on 4 chunks of ``chunk_width`` bits
    (pigeonhole — any pair within hamming ≤ 3 shares at least one
    chunk, so ≤ 3 keeps the bucket join EXACT, never approximate),
    then verify true hamming via bit_count(xor). Serves SimHash text
    fingerprints, image dHashes and audio fingerprints alike. Scale:
    the only shuffle is the 4×|rows| chunk-bucket join — no all-pairs
    anywhere.

    ``max_bucket`` (review r06): buckets with more members than this
    are dropped BEFORE the self-join — the same stop-hash policy as
    video_neardup_pairs' ``max_df``. Without it, a degenerate
    fingerprint shared by N rows (flat images, silent audio) forms an
    N² hot bucket on one reducer. A pair is lost only if EVERY chunk
    it shares is degenerate — i.e. both members carry a
    stopword-grade fingerprint. ``None`` disables the guard (exact
    pigeonhole semantics; the DuckDB oracles mirror this on fixtures
    where no bucket can reach the default cap)."""
    if max_hamming > 3:
        raise ValueError(
            f"max_hamming={max_hamming} > 3 breaks the 4-chunk "
            "pigeonhole (pairs would be silently missed)")
    chunks = _hamming_chunks(hashes, hash_col, id_col, chunk_width)
    if max_bucket is not None:
        ok = (chunks.groupBy("chunk", "val")
              .agg(F.count(F.lit(1)).alias("__n"))
              .filter(F.col("__n") <= max_bucket)
              .select("chunk", "val"))
        chunks = chunks.join(ok, on=["chunk", "val"])
    l = chunks.select(F.col("id").alias("d1"),
                      F.col("h").alias("s1"), "chunk", "val")
    r = chunks.select(F.col("id").alias("d2"),
                      F.col("h").alias("s2"), "chunk", "val")
    return (l.join(r, on=["chunk", "val"])
            .filter(F.col("d1") < F.col("d2"))
            .select("d1", "d2", "s1", "s2").distinct()
            .withColumn("hamming", F.bit_count(
                F.col("s1").bitwiseXOR(F.col("s2"))))
            .filter(F.col("hamming") <= max_hamming)
            .select("d1", "d2", "hamming"))


def simhash_near_pairs(docs: DataFrame, max_hamming: int = 3,
                       text_col: str = "text",
                       id_col: str = "doc_id",
                       portable: bool = False) -> DataFrame:
    """Near-dup pairs by SimHash hamming distance ≤ max_hamming
    (requires ≤ 3 for the 4-chunk pigeonhole to be exact): band on
    4 chunks (16-bit, or 15-bit for the 60-bit portable hash),
    verify hamming via bit_count(xor) — the shared
    hamming_near_pairs join."""
    sh = simhash(docs, text_col, id_col, portable=portable)
    return hamming_near_pairs(sh, max_hamming, hash_col="simhash",
                              id_col="id",
                              chunk_width=15 if portable else 16)


def embedding_neardup_pairs(emb: DataFrame, threshold: float = 0.9,
                            dim: int = 64, id_col: str = "vec_id",
                            vec_col: str = "embedding") -> DataFrame:
    """Near-duplicate pairs by embedding cosine ≥ ``threshold`` —
    the semantic-dedup leg next to the lexical kernels above:
    LSH-bucketed candidates (pairs sharing a bucket in ANY of the L
    hyperplane tables, near-linear at corpus scale), then exact cosine
    verification. The threshold filter runs on the UNROUNDED cosine;
    rounding is output-only (same oracle-parity rule as
    minhash_lsh_pairs). Returns (d1, d2, sim)."""
    from incubator_hugegraph_spark.data.similarity import (
        cosine, lsh_buckets)
    from incubator_hugegraph_spark.graph import checkpointed
    # self-joined below — materialize the bucket table once instead of
    # running the hyperplane-projection pass per join side
    sig = checkpointed(lsh_buckets(emb, dim, id_col, vec_col))
    lhs = sig.select(F.col("id").alias("d1"), F.col("v").alias("v1"),
                     "table", "bucket")
    rhs = sig.select(F.col("id").alias("d2"), F.col("v").alias("v2"),
                     "table", "bucket")
    cand = (lhs.join(rhs, on=["table", "bucket"])
            .filter(F.col("d1") < F.col("d2"))
            .dropDuplicates(["d1", "d2"]))
    return (cand.withColumn("sim", cosine(F.col("v1"), F.col("v2")))
            .filter(F.col("sim") >= threshold)
            .select("d1", "d2", F.round("sim", 6).alias("sim")))


def embedding_cross_neardup(train: DataFrame, bench: DataFrame,
                            threshold: float = 0.9, dim: int = 64,
                            id_col: str = "vec_id",
                            vec_col: str = "embedding") -> DataFrame:
    """SEMANTIC train×bench decontamination (r07 — fills the
    embedding cell of the cross-corpus matrix next to cross_neardup's
    MinHash text leg and hamming_cross_pairs' fingerprint leg):
    (train id, bench id) pairs with cosine ≥ ``threshold``, with the
    LSH recall contract of the in-memory kernels — candidates are
    limited to pairs colliding in ≥1 (table, bucket) of the shared
    plane family, so a qualifying pair that shares no bucket is
    missed (approximate recall < 1 by construction; review r08).
    Buckets are joined ONLY across sides — no train×train or
    bench×bench candidates are ever formed, so the work is per-side
    signatures + one cross bucket join regardless of how internally
    duplicated the training corpus is. Exact cosine verification on
    the unrounded value within candidates; rounding is output-only.
    Returns (train_id, bench_id, sim)."""
    from incubator_hugegraph_spark.data.similarity import (
        cosine, lsh_buckets)
    lhs = (lsh_buckets(train, dim, id_col, vec_col)
           .select(F.col("id").alias("train_id"),
                   F.col("v").alias("v1"), "table", "bucket"))
    rhs = (lsh_buckets(bench, dim, id_col, vec_col)
           .select(F.col("id").alias("bench_id"),
                   F.col("v").alias("v2"), "table", "bucket"))
    cand = (lhs.join(rhs, on=["table", "bucket"])
            .dropDuplicates(["train_id", "bench_id"]))
    return (cand.withColumn("sim", cosine(F.col("v1"), F.col("v2")))
            .filter(F.col("sim") >= threshold)
            .select("train_id", "bench_id",
                    F.round("sim", 6).alias("sim")))


def pair_components(pairs: DataFrame, a: str = "d1",
                    b: str = "d2", max_rounds: int = 50) -> DataFrame:
    """Connected components of an undirected pair set → (id, keeper)
    with keeper = min member id. The grouping step of a dedup
    pipeline: near-dup PAIRS (minhash_lsh_pairs / simhash_near_pairs /
    embedding_neardup_pairs) become KEEP/DROP decisions only after
    transitive closure — A~B, B~C must collapse to one keeper even
    when A~C was never compared.

    Min-label propagation over the pair graph (same loop shape as
    algorithms/wcc.py): the node set is only the docs that appear in
    ≥1 pair (a small fraction of the corpus at production thresholds),
    so rounds are cheap; diameter of near-dup clusters is tiny in
    practice (they are quasi-cliques), so this converges in a few
    rounds. Deterministic: component representative is the min id."""
    from incubator_hugegraph_spark.graph import checkpointed
    # checkpointed, not persisted: consumed once per propagation
    # round, and the pair plan (LSH join) must not be re-embedded in
    # every round's plan
    und = checkpointed(
        pairs.select(F.col(a).alias("x"), F.col(b).alias("y"))
        .unionByName(pairs.select(F.col(b).alias("x"),
                                  F.col(a).alias("y")))
        .distinct())
    comp = (und.select(F.col("x").alias("id")).distinct()
            .withColumn("keeper", F.col("id")))
    comp = checkpointed(comp)
    for _ in range(max_rounds):
        nbr_min = (und.join(comp, on=und.y == comp.id)
                   .groupBy("x").agg(F.min("keeper").alias("nbr_keeper"))
                   .withColumnRenamed("x", "id"))
        new = (comp.withColumnRenamed("keeper", "old")
               .join(nbr_min, on="id", how="left")
               .select("id", "old",
                       F.least("old", F.coalesce("nbr_keeper", "old"))
                       .alias("keeper")))
        new = checkpointed(new)
        changed = (new.filter(F.col("keeper") != F.col("old"))
                   .limit(1).count())
        comp = new.select("id", "keeper")
        if changed == 0:
            break
    und.unpersist()
    return comp


def dedup_clusters(docs: DataFrame, n: int = 3, threshold: float = 0.3,
                   text_col: str = "text", id_col: str = "doc_id",
                   portable: bool = False) -> DataFrame:
    """End-to-end near-dup clustering: MinHash-LSH pairs → transitive
    closure → (keeper, doc_id, cluster_size). One row per clustered
    doc (docs with no near-dup are not listed — at 100 TB emitting
    the untouched majority would dwarf the result)."""
    prs = minhash_lsh_pairs(docs, n, threshold, text_col, id_col,
                            portable=portable)
    comp = pair_components(prs.select("d1", "d2"))
    sizes = comp.groupBy("keeper").agg(
        F.count(F.lit(1)).alias("cluster_size"))
    return (comp.join(sizes, on="keeper")
            .select("keeper", F.col("id").alias(id_col), "cluster_size"))


def semantic_dedup(emb: DataFrame, n_cells: int = 16,
                   threshold: float = 0.95, id_col: str = "vec_id",
                   vec_col: str = "embedding",
                   n_iters: int = 0) -> DataFrame:
    """SemDeDup (Abbas et al. 2023, arXiv:2303.09540): cluster the
    embedding corpus with deterministic k-means, compute pairwise
    cosine WITHIN each cluster only, and drop every doc that has a
    semantic duplicate (cos > threshold) with a smaller id — the
    keep-lowest-id representative rule makes the prune deterministic
    and non-iterative (no transitive closure: each doc is judged
    against its own epsilon-ball, exactly the paper's policy).

    Returns (id, cell) for the SURVIVING docs.

    100 TB shape: the only all-pairs work is per-cluster (O(sum c_i^2),
    bounded by choosing n_cells ~ corpus/expected_cluster_size); the
    centroid table is broadcast for assignment (map-side argmax, no
    shuffle) and the pair join shuffles on the cell key only. This is
    the scale rationale the paper itself gives for clustering before
    comparing. Similarities are rounded to 6 decimals before the
    threshold compare so the decision is ulp-stable across engines."""
    from incubator_hugegraph_spark.data.similarity import (
        _to_double, cosine, kmeans_centroids)
    from pyspark.sql.window import Window

    base = emb.select(F.col(id_col).alias("id"),
                      _to_double(vec_col).alias("v"))
    row = emb.select(vec_col).first()
    if row is None:  # empty corpus → empty result, not a TypeError
        return base.select("id", F.lit(0).alias("cell")).limit(0)
    dim = len(row[0])
    cents = kmeans_centroids(base, n_cells, dim, n_iters)
    assigned = (base.crossJoin(F.broadcast(cents))
                .withColumn("d", cosine(F.col("v"), F.col("cv"))))
    w = Window.partitionBy("id").orderBy(F.desc("d"), F.asc("cell"))
    assigned = (assigned.withColumn("__rn", F.row_number().over(w))
                .filter(F.col("__rn") == 1).select("id", "v", "cell"))
    a = assigned.select(F.col("id").alias("ai"), F.col("v").alias("av"),
                        "cell")
    b = assigned.select(F.col("id").alias("bi"), F.col("v").alias("bv"),
                        "cell")
    dropped = (a.join(b, on="cell")
               .filter(F.col("ai") > F.col("bi"))
               .filter(F.round(cosine(F.col("av"), F.col("bv")), 6)
                       > threshold)
               .select(F.col("ai").alias("id")).distinct())
    return (assigned.join(dropped, on="id", how="left_anti")
            .select("id", "cell"))


def cross_neardup(train: DataFrame, bench: DataFrame, n: int = 3,
                  threshold: float = 0.3, text_col: str = "text",
                  id_col: str = "doc_id",
                  portable: bool = False) -> DataFrame:
    """Fuzzy decontamination: MinHash-LSH near-dup pairs ACROSS two
    corpora (train × benchmark) with exact-jaccard verification — the
    near-duplicate complement of decontaminate()'s exact n-gram
    overlap (the GPT-3/Lee-et-al. train-vs-eval dedup step). Returns
    (train_id, bench_id, jaccard ≥ threshold).

    Ids must be disjoint across the two inputs (any split of one
    corpus satisfies this; asserted in tests). Scale shape: each
    side's signature table is vector-sized and checkpointed once; the
    band join is train×bench WITHIN shared buckets only (never
    all-pairs, and no train×train work at all — the advantage over
    running minhash_lsh_pairs on the union); exact verification is
    candidate-restricted, identical to the within-corpus path."""
    from incubator_hugegraph_spark.graph import checkpointed
    sig_t = checkpointed(
        minhash_signatures(train, n, text_col, id_col, portable=portable))
    sig_b = checkpointed(
        minhash_signatures(bench, n, text_col, id_col, portable=portable))
    bt = band_rows(sig_t, portable) \
        .select(F.col("id").alias("d1"), "band", "bucket")
    bb = band_rows(sig_b, portable) \
        .select(F.col("id").alias("d2"), "band", "bucket")
    cand = (bt.join(bb, on=["band", "bucket"])
            .select("d1", "d2").distinct())
    both = train.select(id_col, text_col) \
        .unionByName(bench.select(id_col, text_col))
    return verify_pairs(cand, both, n, threshold, text_col, id_col) \
        .select(F.col("d1").alias("train_id"),
                F.col("d2").alias("bench_id"), "jaccard")


def dedup_keep_best(docs: DataFrame, n: int = 3, threshold: float = 0.3,
                    score_col: str = "n_chars",
                    text_col: str = "text", id_col: str = "doc_id",
                    portable: bool = False) -> DataFrame:
    """The KEEP decision over near-dup clusters: within each
    connected component keep the best-scoring member (``score_col``
    desc, ties → min id) — the keep-longest / keep-highest-quality
    policy production dedup pipelines apply after clustering.
    Returns (keeper, kept_doc, score) — one row per cluster.

    Scale: rides dedup_clusters (pair-restricted components); the
    rank window partitions by keeper, so its working set is one
    cluster at a time, never the corpus."""
    from pyspark.sql.window import Window
    clusters = dedup_clusters(docs, n, threshold, text_col, id_col,
                              portable=portable)
    # join/select on id_col, not a hardcoded 'doc_id' — dedup_clusters
    # names its id column after id_col (code review r06: a non-default
    # id_col raised UNRESOLVED_USING_COLUMN_FOR_JOIN)
    joined = clusters.join(
        docs.select(F.col(id_col), F.col(score_col).alias("score")),
        on=id_col)
    w = Window.partitionBy("keeper").orderBy(F.desc("score"), id_col)
    return (joined.withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") == 1)
            .select("keeper", F.col(id_col).alias("kept_doc"),
                    "score"))


def split_paragraphs(docs: DataFrame, sep_regex: str = r"\n{2,}",
                     text_col: str = "text",
                     id_col: str = "doc_id") -> DataFrame:
    """(id, para_idx, para) — regex split + posexplode, trimmed,
    empties dropped. The natural splitter for corpora with real
    paragraph structure (RefinedWeb removes duplicated paragraphs
    and lines the same way)."""
    return (docs.select(
                id_col,
                F.posexplode(F.split(F.col(text_col), sep_regex))
                 .alias("para_idx", "para"))
            .withColumn("para", F.trim("para"))
            .filter(F.length("para") > 0))


def word_window_paragraphs(docs: DataFrame, words: int = 16,
                           text_col: str = "text",
                           id_col: str = "doc_id") -> DataFrame:
    """Pseudo-paragraph splitter for FLAT corpora (no newline
    structure): consecutive fixed-size word windows. One narrow
    JVM-side projection — split → sequence → transform(slice) →
    posexplode — zero Python, zero shuffle."""
    w = F.split(F.col(text_col), WS_SPLIT_RE)
    k = F.greatest(F.ceil(F.size(w) / F.lit(words)).cast("int"),
                   F.lit(1))
    paras = F.transform(
        F.sequence(F.lit(0), k - 1),
        lambda i: F.array_join(
            F.slice(w, i * words + 1, words), " "))
    return (docs.select(id_col,
                        F.posexplode(paras).alias("para_idx", "para"))
            .filter(F.length("para") > 0))


def paragraph_dedup(paras: DataFrame, min_docs: int = 2,
                    sep: str = "\n\n",
                    id_col: str = "doc_id") -> DataFrame:
    """Paragraph-level exact dedup (RefinedWeb / MassiveText line
    dedup): a paragraph appearing in >= min_docs DISTINCT documents
    is removed from EVERY document; each document's text reassembles
    from its surviving paragraphs in original order. Input is a
    splitter's (id, para_idx, para) stream; returns
    (id, clean_text, n_kept, n_removed) — documents whose every
    paragraph was boilerplate survive with clean_text = ''.

    Scale: the duplicated-paragraph set is keyed by md5 (narrow join
    key, never the text); one agg shuffle to find it, one anti-join,
    one per-doc re-agg — the reassembly sorts WITHIN each doc's
    collected struct array (array_sort on (para_idx, para)), so no
    global sort and no window over the corpus."""
    p = paras.withColumn("__ph", F.md5("para"))
    dup = (p.groupBy("__ph")
           .agg(F.countDistinct(id_col).alias("__nd"))
           .filter(F.col("__nd") >= min_docs)
           .select("__ph"))
    totals = p.groupBy(id_col).agg(F.count(F.lit(1)).alias("__total"))
    kept = p.join(dup, on="__ph", how="left_anti")
    rebuilt = (kept.groupBy(id_col)
               .agg(F.array_join(
                        F.transform(
                            F.array_sort(F.collect_list(
                                F.struct("para_idx", "para"))),
                            lambda s: s["para"]),
                        sep).alias("clean_text"),
                    F.count(F.lit(1)).alias("n_kept")))
    return (totals.join(rebuilt, on=id_col, how="left")
            .select(id_col,
                    F.coalesce("clean_text", F.lit("")).alias("clean_text"),
                    F.coalesce("n_kept", F.lit(0)).alias("n_kept"),
                    (F.col("__total") - F.coalesce("n_kept", F.lit(0)))
                    .alias("n_removed")))
