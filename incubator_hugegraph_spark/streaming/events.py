"""Event analytics: sessionization + tumbling-window aggregation,
and Structured Streaming ingestion into graph edges.

The batch forms (used by the oracle gate) and the streaming forms
share semantics: gap-based sessions (30 min default) and epoch-aligned
tumbling windows. Streaming adds watermarks for late data and a
foreachBatch MERGE into the edges table — the reference's
GraphTransaction commit path becomes an idempotent micro-batch append
(SURVEY §2.J stretch).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

GAP_MS = 30 * 60 * 1000


_SCHEMA_CACHE: dict = {}


def _read_stream(spark: SparkSession, events_path: str,
                 max_files_per_trigger: int | None = None) -> DataFrame:
    """File-source readStream over the events parquet. The file source
    wants a directory basePath; a single-file path is read via its
    parent dir + exact-name glob. Nano timestamps (read as long via
    nanosAsLong, like the batch path) floor to µs — exact integer div,
    matching DuckDB."""
    import os
    # session-global on purpose: get_spark() already sets it and the
    # driver fixture needs it to read at all; setting the SAME value
    # here only covers sessions built elsewhere (no toggle-back — a
    # lazy stream would read the conf at execution, after a restore)
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    # schema is read once per (path, mtime): keyed on the directory's
    # mtime so a rewritten/evolved path re-reads footers instead of
    # silently reusing a stale schema (streaming review r06), while
    # repeat stream starts over an unchanged path stay cheap
    try:
        mtime = os.path.getmtime(events_path)
    except OSError:
        mtime = None
    cache_key = (events_path, mtime)
    schema = _SCHEMA_CACHE.get(cache_key)
    if schema is None:
        schema = spark.read.parquet(events_path).schema
        _SCHEMA_CACHE[cache_key] = schema
    if os.path.isfile(events_path):
        # FileStreamSource pins basePath to the path when it is not a
        # glob, then rejects it for not being a directory — make the
        # last character a one-element character class so the path
        # globs to exactly the same file.
        events_path = events_path[:-1] + f"[{events_path[-1]}]"
    reader = spark.readStream.schema(schema)
    if max_files_per_trigger is not None:
        # admission control — respected by availableNow: one file per
        # micro-batch, which is how tests force cross-batch state
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    stream = reader.parquet(events_path)
    dt = dict(stream.dtypes).get("ts")
    if dt == "bigint":
        stream = stream.withColumn(
            "ts", F.timestamp_micros(F.expr("ts div 1000")))
    elif dt == "timestamp_ntz":
        # withWatermark rejects NTZ event time; session tz is UTC so the
        # cast is value-preserving.
        stream = stream.withColumn("ts", F.col("ts").cast("timestamp"))
    return stream


def sessionize(events: DataFrame, gap_ms: int = GAP_MS) -> DataFrame:
    """Gap-based sessions per user (batch form): a new session starts
    when the gap to the previous event exceeds ``gap_ms``. Returns
    (user_id, session_id, n_events, session_start, session_end).
    One shuffle on user_id; both window functions share the frame."""
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap_us = gap_ms * 1000
    flagged = events.withColumn(
        "new_s",
        F.when(F.lag("ts").over(w).isNull()
               | ((F.unix_micros("ts") - F.unix_micros(F.lag("ts").over(w)))
                  > gap_us), 1).otherwise(0))
    sess = flagged.withColumn(
        "session_id",
        F.sum("new_s").over(w.rowsBetween(Window.unboundedPreceding, 0)))
    return (sess.groupBy("user_id", "session_id")
            .agg(F.count(F.lit(1)).alias("n_events"),
                 F.min("ts").alias("session_start"),
                 F.max("ts").alias("session_end")))


def window_agg(events: DataFrame, duration: str = "1 hour") -> DataFrame:
    """Tumbling-window aggregation per event_type (batch form —
    epoch-aligned, identical to date_trunc for whole-hour windows).
    Returns (event_type, window_start, n_events, sum_value, avg_value)."""
    return (events
            .groupBy("event_type",
                     F.window("ts", duration).getField("start")
                     .alias("window_start"))
            .agg(F.count(F.lit(1)).alias("n_events"),
                 F.round(F.sum("value"), 2).alias("sum_value"),
                 F.round(F.avg("value"), 4).alias("avg_value")))


def stream_window_agg(spark: SparkSession, events_path: str,
                      duration: str = "1 hour",
                      watermark: str = "2 hours"):
    """Streaming form of window_agg: file-source readStream +
    watermark for late rows. Returns the streaming DataFrame (caller
    attaches a writeStream sink)."""
    stream = _read_stream(spark, events_path)
    return (stream
            .withWatermark("ts", watermark)
            .groupBy("event_type", F.window("ts", duration))
            .agg(F.count(F.lit(1)).alias("n_events"),
                 F.sum("value").alias("sum_value"),
                 F.avg("value").alias("avg_value")))


def run_stream_window_agg(spark: SparkSession, events_path: str,
                          duration: str = "1 hour",
                          name: str = "stream_window_agg") -> DataFrame:
    """Execute the STREAMING windowed aggregation end-to-end and
    return the final result as a batch DataFrame: file-source
    readStream → watermarked tumbling window → memory sink, driven by
    an availableNow trigger (process-everything-then-stop — the batch
    parity mode). Output mode is ``complete`` so the trailing windows
    the watermark has not closed yet are still emitted; on a live
    unbounded stream the same query runs in ``append`` mode and emits
    each window once its watermark passes.

    This is the gate that proves the streaming plan computes the same
    answer as the batch plan (and the DuckDB oracle)."""
    agg = stream_window_agg(spark, events_path, duration)
    q = (agg.select(F.col("event_type"),
                    F.col("window").getField("start").alias("window_start"),
                    "n_events", "sum_value", "avg_value")
         .writeStream.format("memory").queryName(name)
         .outputMode("complete").trigger(availableNow=True).start())
    q.awaitTermination()
    return (spark.table(name)
            .select("event_type", "window_start", "n_events",
                    F.round("sum_value", 2).alias("sum_value"),
                    F.round("avg_value", 4).alias("avg_value")))


def stream_sessionize(spark: SparkSession, events_path: str,
                      gap_ms: int = GAP_MS):
    """CUSTOM STATEFUL streaming operator: cross-batch gap
    sessionization via ``applyInPandasWithState`` (the
    applyInPandasWithState pattern SURVEY §7.2 M7 calls for — state
    Spark's built-in session_window cannot express when the session id
    must be a stable per-user ordinal).

    Per user_id the state carries (session ordinal, last event µs,
    session start µs, event count); each micro-batch folds its events
    in (ts, event_id) order into that state and emits every session it
    touched (update semantics — a session still open at the batch
    boundary is re-emitted, finalized, by a later batch). On an
    availableNow run over a static file the emitted set IS the batch
    ``sessionize`` result. Returns the streaming DataFrame."""
    import pandas as pd  # noqa: F401 (arrow batches)

    stream = _read_stream(spark, events_path) \
        .select("user_id", "ts", "event_id")
    gap_us = gap_ms * 1000

    def fold(key, pdf_iter, state):
        import pandas as pd
        if state.exists:
            sid, last, start, n = state.get
        else:
            sid, last, start, n = 0, None, None, 0
        done = []
        # applyInPandasWithState delivers the group's batch as ARROW
        # CHUNKS (maxRecordsPerBatch rows each) in arbitrary order —
        # sorting each chunk independently is NOT a global sort when
        # a key's batch spans chunks (review r06). Concat, sort once.
        chunks = [c for c in pdf_iter if len(c)]
        if chunks:
            whole = pd.concat(chunks) if len(chunks) > 1 else chunks[0]
            whole = whole.sort_values(["ts", "event_id"])
        else:
            whole = None
        if whole is not None:
            for ts in whole["ts"]:
                t = ts.value // 1000  # ns → µs (exact)
                if last is not None and t < last:
                    # LATE cross-batch event (the file source orders
                    # micro-batches by file mtime, not event time): a
                    # t older than the state frontier would drag
                    # session_end backwards and corrupt gap decisions
                    # (review r06) — drop it, the watermark semantic.
                    # Batch≡stream equality therefore requires input
                    # files in per-user event-time order (availableNow
                    # over one file always satisfies this).
                    continue
                if last is None or t - last > gap_us:
                    if last is not None:
                        done.append((key[0], sid, n, start, last))
                    sid, start, n = sid + 1, t, 1
                else:
                    n += 1
                last = t
        if last is not None:  # the open session, emitted as an update
            done.append((key[0], sid, n, start, last))
        state.update((sid, last, start, n))
        yield pd.DataFrame(
            done, columns=["user_id", "session_id", "n_events",
                           "start_us", "end_us"])

    from pyspark.sql.streaming.state import GroupStateTimeout
    out = stream.groupBy("user_id").applyInPandasWithState(
        fold,
        outputStructType=("user_id bigint, session_id bigint, "
                          "n_events bigint, start_us bigint, end_us bigint"),
        stateStructType=("sid bigint, last_ts bigint, start_ts bigint, "
                         "n bigint"),
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout)
    return out.select(
        "user_id", "session_id", "n_events",
        F.timestamp_micros(F.col("start_us")).alias("session_start"),
        F.timestamp_micros(F.col("end_us")).alias("session_end"))


def run_stream_sessionize(spark: SparkSession, events_path: str,
                          gap_ms: int = GAP_MS,
                          name: str = "stream_sessionize") -> DataFrame:
    """Drive stream_sessionize with an availableNow trigger into a
    memory sink and return the batch result. Updates supersede earlier
    emissions of the same (user, session): keep the last per key."""
    q = (stream_sessionize(spark, events_path, gap_ms)
         .writeStream.format("memory").queryName(name)
         .outputMode("update").trigger(availableNow=True).start())
    q.awaitTermination()
    t = spark.table(name)
    w = Window.partitionBy("user_id", "session_id") \
        .orderBy(F.desc("n_events"))
    return (t.withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") == 1).drop("__rn"))


def stream_events_to_edges(spark: SparkSession, events_path: str,
                           checkpoint_dir: str, out_dir: str,
                           max_files_per_trigger: int | None = None):
    """Structured Streaming ingestion: events → `interacted`-shaped
    edge rows (consecutive distinct users per event_type), written per
    micro-batch via foreachBatch (idempotent by micro-batch id — the
    replacement for the reference's transactional commit path,
    GraphTransaction.commit). Returns the StreamingQuery.

    Consecutive-pair derivation needs per-key ordering ACROSS batches:
    applyInPandasWithState carries the last-seen user per event_type,
    so the first event of batch N pairs with the last event of batch
    N-1 — the streamed edge set equals the batch lag-window derivation
    for any chop that respects per-key event-time order (cross-batch
    LATE events are dropped like a watermark would, never mis-paired
    — review r06)."""
    from pyspark.sql.streaming.state import GroupStateTimeout

    from incubator_hugegraph_spark.functions.ids import splice_id

    stream = _read_stream(spark, events_path, max_files_per_trigger) \
        .select("event_type", "ts", "event_id", "user_id")

    def fold(key, pdf_iter, state):
        import pandas as pd
        if state.exists:
            prev, last_us = state.get
        else:
            prev, last_us = None, None
        out = []
        # concat the group's arrow chunks, then ONE global sort (the
        # per-chunk sort was not a global order when a key's batch
        # spans maxRecordsPerBatch — review r06; edges per event_type
        # routinely exceed one chunk)
        chunks = [c for c in pdf_iter if len(c)]
        if chunks:
            whole = pd.concat(chunks) if len(chunks) > 1 else chunks[0]
            whole = whole.sort_values(["ts", "event_id"])
            for uid, eid, ts in zip(whole["user_id"], whole["event_id"],
                                    whole["ts"]):
                t = ts.value // 1000
                if last_us is not None and t < last_us:
                    # LATE cross-batch event: pairing it AFTER later
                    # events produces edges the batch lag-window never
                    # derives (review r06) — drop, watermark semantic.
                    # Batch≡stream equality requires files in per-key
                    # event-time order.
                    continue
                if prev is not None and prev != uid:
                    out.append((splice_id("customer", prev),
                                splice_id("customer", uid),
                                "interacted", str(eid)))
                prev, last_us = uid, t
        if prev is not None:
            state.update((int(prev), int(last_us)))
        yield pd.DataFrame(
            out, columns=["src", "dst", "label", "sort_values"])

    edges = stream.groupBy("event_type").applyInPandasWithState(
        fold,
        outputStructType=("src string, dst string, label string, "
                          "sort_values string"),
        stateStructType="last_user bigint, last_us bigint",
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout)

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        # one partition directory PER MICRO-BATCH, overwritten in
        # place: a batch replayed after a crash (files written, offset
        # not committed) rewrites the same directory instead of
        # appending duplicates — this is what makes the sink
        # idempotent by micro-batch id (review r06; the reference's
        # transactional GraphTransaction.commit analogue)
        batch_df.write.mode("overwrite") \
            .parquet(f"{out_dir}/__bid={batch_id}")

    return (edges.writeStream
            .foreachBatch(sink)
            .option("checkpointLocation", checkpoint_dir)
            .trigger(availableNow=True)
            .start())


def read_streamed_edges(spark: SparkSession, out_dir: str) -> DataFrame:
    """Read the stream_events_to_edges sink output (drops the __bid
    batch-partition housekeeping column)."""
    return spark.read.parquet(out_dir).drop("__bid")


def stream_dedup(spark: SparkSession, events_path: str,
                 checkpoint_dir: str, out_dir: str,
                 keys: list[str] | None = None,
                 watermark: str = "1 hour",
                 max_files_per_trigger: int | None = None):
    """Streaming ingestion dedup: drop re-delivered events by key
    (default ``event_id``) across micro-batches.

    `dropDuplicatesWithinWatermark` keeps per-key state only until the
    watermark passes the key's first-seen event time, so state is
    bounded by (arrival rate × watermark) instead of the whole stream
    history — the property that makes exactly-once ingestion of an
    at-least-once feed viable at 100 TB. Duplicates arriving within
    ``watermark`` of the original are dropped; older re-deliveries are
    the source's responsibility. Returns the StreamingQuery
    (availableNow trigger, parquet sink)."""
    stream = _read_stream(spark, events_path, max_files_per_trigger)
    dd = (stream.withWatermark("ts", watermark)
          .dropDuplicatesWithinWatermark(keys or ["event_id"]))
    return (dd.writeStream.format("parquet")
            .option("checkpointLocation", checkpoint_dir)
            .option("path", out_dir)
            .trigger(availableNow=True)
            .start())


def stream_enrich(spark: SparkSession, events_path: str,
                  dim: DataFrame, on: str = "user_id",
                  duration: str = "1 hour",
                  watermark: str = "2 hours"):
    """STREAM-STATIC ENRICHMENT: the events stream joined to a static
    dimension table (the classic fact-stream x dim pattern — user →
    segment here), then watermarked window aggregation per enriched
    key. The static side is explicitly broadcast: at scale the dim is
    cardinality-bound (users, not events) and the join must ride the
    stream map-side — a shuffled stream-static join would re-shuffle
    every micro-batch. Spark re-reads the static side per micro-batch,
    so dim updates between batches are picked up (slowly-changing-dim
    refresh for free)."""
    stream = _read_stream(spark, events_path)
    enriched = stream.join(F.broadcast(dim), on=on, how="left")
    return (enriched
            .withWatermark("ts", watermark)
            .groupBy("segment", F.window("ts", duration))
            .agg(F.count(F.lit(1)).alias("n_events"),
                 F.sum("value").alias("sum_value")))


def run_stream_enrich(spark: SparkSession, events_path: str,
                      dim: DataFrame, on: str = "user_id",
                      duration: str = "1 hour",
                      name: str = "stream_enrich") -> DataFrame:
    """Execute the stream-static enrichment end-to-end (availableNow
    + memory sink, complete mode — the batch-parity harness used by
    every streaming gate here) and return the final table."""
    agg = stream_enrich(spark, events_path, dim, on, duration)
    q = (agg.select("segment",
                    F.col("window").getField("start").alias("window_start"),
                    "n_events", "sum_value")
         .writeStream.format("memory").queryName(name)
         .outputMode("complete").trigger(availableNow=True).start())
    q.awaitTermination()
    return (spark.table(name)
            .select("segment", "window_start", "n_events",
                    F.round("sum_value", 2).alias("sum_value")))


def window_topk(events: DataFrame, duration: str = "1 hour",
                k: int = 3) -> DataFrame:
    """Per-window top-k event types by count (batch form). Ties break
    by event_type asc — deterministic, oracle-checkable. The rank
    window partitions by window_start, so its input is the already-
    aggregated (window, type) table — bounded by windows × types,
    never corpus-sized."""
    counts = (events
              .groupBy(F.window("ts", duration).getField("start")
                       .alias("window_start"), "event_type")
              .agg(F.count(F.lit(1)).alias("n_events")))
    w = Window.partitionBy("window_start") \
        .orderBy(F.desc("n_events"), "event_type")
    return (counts
            .withColumn("rank", F.row_number().over(w).cast("long"))
            .filter(F.col("rank") <= k)
            .select("window_start", "event_type", "n_events", "rank"))


def stream_window_topk(spark: SparkSession, events_path: str,
                       duration: str = "1 hour",
                       watermark: str = "2 hours"):
    """Streaming half of window_topk: the watermarked windowed COUNT
    is the incremental stateful aggregation; ranking happens after
    the sink (run_stream_window_topk) because rank-over-window is not
    an incremental operator — and should not be: the count table is
    bounded (windows × event types), so the two-tier split keeps the
    unbounded work in streaming state and the tiny rank in batch."""
    stream = _read_stream(spark, events_path)
    return (stream
            .withWatermark("ts", watermark)
            .groupBy(F.window("ts", duration), "event_type")
            .agg(F.count(F.lit(1)).alias("n_events")))


def run_stream_window_topk(spark: SparkSession, events_path: str,
                           duration: str = "1 hour", k: int = 3,
                           name: str = "stream_topk") -> DataFrame:
    """End-to-end streaming top-k: readStream → watermark + windowed
    count → availableNow → memory sink, then rank the bounded count
    table. Output equals the batch window_topk row-for-row."""
    agg = stream_window_topk(spark, events_path, duration)
    q = (agg.select(F.col("window").getField("start")
                    .alias("window_start"), "event_type", "n_events")
         .writeStream.format("memory").queryName(name)
         .outputMode("complete").trigger(availableNow=True).start())
    q.awaitTermination()
    w = Window.partitionBy("window_start") \
        .orderBy(F.desc("n_events"), "event_type")
    return (spark.table(name)
            .withColumn("rank", F.row_number().over(w).cast("long"))
            .filter(F.col("rank") <= k)
            .select("window_start", "event_type", "n_events", "rank"))


def value_histogram(events: DataFrame, lo: float = 0.0,
                    hi: float = 500.0, bins: int = 20,
                    value_col: str = "value") -> DataFrame:
    """Fixed-bin histogram of a numeric column — the bounded-state
    quantile/distribution primitive (bins are FIXED by spec, so the
    state is `bins + 2` counters regardless of corpus size, the
    per-partition partials merge by addition, and the batch and
    streaming forms are identical aggregations). Bin i covers
    [lo + i·w, lo + (i+1)·w); -1 and `bins` are the under/overflow
    bins. Returns (bin, lo_edge, n) for non-empty bins."""
    return (events
            .select(_hist_bin(value_col, lo, hi, bins).alias("bin"))
            .groupBy("bin").agg(F.count(F.lit(1)).alias("n"))
            .select("bin", _hist_lo_edge(lo, hi, bins), "n"))


def _hist_bin(value_col: str, lo: float, hi: float, bins: int):
    """The ONE bin expression both the batch and streaming histogram
    forms use (review r06 — two hand-maintained copies of the
    boundary arithmetic can drift and break the parity the twins
    exist to prove)."""
    w = (hi - lo) / bins
    return (F.when(F.col(value_col) < lo, F.lit(-1))
            .when(F.col(value_col) >= hi, F.lit(bins))
            .otherwise(F.floor((F.col(value_col) - lo) / w)
                       .cast("int")))


def _hist_lo_edge(lo: float, hi: float, bins: int):
    w = (hi - lo) / bins
    return F.round(F.lit(lo) + F.col("bin") * w, 6).alias("lo_edge")


def run_stream_value_histogram(spark: SparkSession, events_path: str,
                               lo: float = 0.0, hi: float = 500.0,
                               bins: int = 20,
                               name: str = "stream_hist") -> DataFrame:
    """Streaming twin: the same fixed-bin aggregation as an unwindowed
    streaming groupBy (state = bins+2 rows, complete mode). Proves the
    histogram is micro-batch-invariant — counters merge by addition no
    matter how the input is chopped."""
    stream = _read_stream(spark, events_path)
    agg = (stream.select(_hist_bin("value", lo, hi, bins).alias("bin"))
           .groupBy("bin").agg(F.count(F.lit(1)).alias("n")))
    q = (agg.writeStream.format("memory").queryName(name)
         .outputMode("complete").trigger(availableNow=True).start())
    q.awaitTermination()
    return (spark.table(name)
            .select("bin", _hist_lo_edge(lo, hi, bins), "n"))


def run_stream_heavy_hitters(spark: SparkSession, events_path: str,
                             threshold: float = 0.05,
                             key_col: str = "event_type",
                             name: str = "stream_cms") -> DataFrame:
    """Streaming count-min heavy hitters: the d×w counter grid builds
    as an UNWINDOWED stateful aggregation over the per-event cell
    explosions — state is at most d×w rows and the partials merge by
    addition, so the sketch is micro-batch-invariant (the property
    that makes CMS a streaming structure). Estimation then runs on
    the bounded sink table exactly like the batch path (shared
    hitters_from_cms); the candidate pre-filter scans the source
    batch-side here — on a live stream that side is itself a bounded
    per-trigger pass."""
    from incubator_hugegraph_spark.data.sketch import (count_min,
                                                       hitters_from_cms)
    stream = _read_stream(spark, events_path)
    # the grid build IS data/sketch.count_min (pure transforms work
    # on a streaming DataFrame) — one maintained sketch layout, so
    # the streaming sketch can never drift from the probe hashing in
    # hitters_from_cms/cm_estimate (review r06)
    agg = count_min(stream, key_col)
    q = (agg.writeStream.format("memory").queryName(name)
         .outputMode("complete").trigger(availableNow=True).start())
    q.awaitTermination()
    return hitters_from_cms(spark.table(name),
                            spark.read.parquet(events_path),
                            key_col, threshold)


def run_stream_kmv_distinct(spark: SparkSession, events_path: str,
                            key_col: str = "user_id", k: int = 256,
                            name: str = "stream_kmv") -> DataFrame:
    """Streaming K-minimum-values distinct count: a stateful fold
    carrying the k smallest hashes (state = exactly k doubles —
    KMV's mergeability is what makes it a stream sketch). One global
    group by construction: the k-min set is a SINGLE k-sized object,
    so the state op is deliberately single-key (zero data skew risk —
    per-partition minima are folded into it batch by batch, and k
    values is driver-trivial); parallelism lives in the upstream
    hash projection. Same output row as the batch kmv_distinct, same
    oracle."""
    from pyspark.sql.streaming.state import GroupStateTimeout

    from incubator_hugegraph_spark.data.dedup import portable_hash28

    stream = _read_stream(spark, events_path)
    hashed = stream.filter(F.col(key_col).isNotNull()).select(
        (portable_hash28(F.col(key_col).cast("string"))
         .cast("double") / F.lit(float(1 << 28))).alias("h"),
        F.lit(1).alias("g"))

    def prereduce(pdf_iter):
        # map-side k-min BEFORE the single-key shuffle: without it
        # every row of every micro-batch lands on one state task
        # (review r06 — the docstring promised per-partition minima
        # and the code shipped the whole stream). ≤ k rows per arrow
        # batch leave each partition.
        import pandas as pd
        for pdf in pdf_iter:
            if len(pdf):
                # k smallest DISTINCT hashes — raw rows repeat hot
                # keys, and k duplicate rows can cover far fewer than
                # k distinct values (KMV needs distinct minima)
                yield pdf.drop_duplicates("h").nsmallest(k, "h")

    hashed = hashed.mapInPandas(prereduce, "h double, g int")

    def fold(key, pdf_iter, state):
        import pandas as pd
        mins = sorted(state.get[0]) if state.exists else []
        for pdf in pdf_iter:
            for h in pdf["h"]:
                mins.append(float(h))
            mins = sorted(set(mins))[:k]
        state.update((mins,))
        yield pd.DataFrame({"k_used": [len(mins)],
                            "kth_min": [mins[-1] if mins else None]})

    out = hashed.groupBy("g").applyInPandasWithState(
        fold, outputStructType="k_used long, kth_min double",
        stateStructType="mins array<double>",
        outputMode="update", timeoutConf=GroupStateTimeout.NoTimeout)
    q = (out.writeStream.format("memory").queryName(name)
         .outputMode("update").trigger(availableNow=True).start())
    q.awaitTermination()
    # updates supersede: the k-min set only grows (k_used ↑) and then
    # only improves (kth_min ↓), so the final state is the row with
    # max k_used and, among those, minimal kth_min
    last = spark.table(name) \
        .orderBy(F.desc("k_used"), F.asc("kth_min")).limit(1)
    return last.select(
        "k_used", F.round("kth_min", 9).alias("kth_min"),
        F.when(F.col("k_used") < k, F.col("k_used").cast("double"))
        .otherwise(F.round((F.col("k_used") - 1) / F.col("kth_min"), 3))
        .alias("distinct_est"))


def _z_outlier_filter(events: DataFrame, stats: DataFrame,
                      z: float) -> DataFrame:
    """Shared z-score tail of the batch and streaming outlier forms
    (one maintained copy — the twins exist to prove parity, so their
    filter must be literally the same code)."""
    return (events.join(F.broadcast(stats), on="event_type")
            .filter(F.col("__sd") > 0)
            .withColumn("__z", (F.col("value") - F.col("__mu"))
                        / F.col("__sd"))
            .filter(F.abs("__z") >= z)
            .select("event_id", "event_type", "value",
                    F.round("__z", 4).alias("zscore")))


def value_outliers(events: DataFrame, z: float = 3.0) -> DataFrame:
    """Per-type z-score outliers — the monitoring pass an event
    pipeline runs before trusting aggregates: events whose value sits
    ≥ z sample standard deviations from their type's mean. Returns
    (event_id, event_type, value, zscore).

    Scale: one map-side-combined per-type moment aggregate (|types|
    rows → broadcast) joined back onto the scan — no window over the
    corpus, no second shuffle."""
    stats = (events.groupBy("event_type")
             .agg(F.avg("value").alias("__mu"),
                  F.stddev_samp("value").alias("__sd")))
    return _z_outlier_filter(events, stats, z)


def run_stream_value_outliers(spark: SparkSession, events_path: str,
                              z: float = 3.0,
                              name: str = "stream_outliers") -> DataFrame:
    """Streaming twin of value_outliers, same two-tier split as the
    top-k: the per-type moment table (count/sum/sum-of-squares —
    additive, |types| state rows) builds as an unwindowed stateful
    aggregation; the z-score filter then rides a batch pass with the
    bounded moments broadcast. Emitting outliers mid-stream against
    HALF-built moments would flag different rows per chop — the
    two-tier form is what makes the result micro-batch-invariant."""
    stream = _read_stream(spark, events_path)
    # n = count(value), not count(1): the moments must skip nulls
    # exactly like the batch avg/stddev_samp, or nullable values skew
    # mu/sd and different rows cross the z boundary (review r06)
    agg = (stream.groupBy("event_type")
           .agg(F.count("value").alias("n"),
                F.sum("value").alias("s"),
                F.sum(F.col("value") * F.col("value")).alias("ss")))
    q = (agg.writeStream.format("memory").queryName(name)
         .outputMode("complete").trigger(availableNow=True).start())
    q.awaitTermination()
    # variance clamped at 0: near-constant values can make
    # ss - s²/n a tiny NEGATIVE number by FP cancellation → sqrt NaN,
    # and Spark orders NaN > 0, so the sd filter would pass and flag
    # EVERY event of the type (review r06). n>1 guard mirrors
    # stddev_samp's NULL for single-sample groups (and avoids ANSI
    # div-by-zero on n-1).
    var = F.greatest((F.col("ss") - F.col("s") * F.col("s")
                      / F.col("n")) / (F.col("n") - 1), F.lit(0.0))
    stats = (spark.table(name)
             .select("event_type",
                     (F.col("s") / F.col("n")).alias("__mu"),
                     F.when(F.col("n") > 1, F.sqrt(var)).alias("__sd")))
    return _z_outlier_filter(spark.read.parquet(events_path), stats, z)


def click_to_purchase(events: DataFrame,
                      within_minutes: int = 30) -> DataFrame:
    """Batch form of the attribution join: each click paired with the
    SAME user's purchases in (click_ts, click_ts + within]. Returns
    (user_id, click_id, purchase_id, gap_s). One keyed shuffle per
    side; the time predicate bounds the per-user fanout."""
    # NTZ-safe (UTC session): unix_micros rejects TIMESTAMP_NTZ
    ts = F.col("ts").cast("timestamp")
    c = events.filter(F.col("event_type") == "click") \
        .select("user_id", F.col("event_id").alias("click_id"),
                ts.alias("cts"))
    p = events.filter(F.col("event_type") == "purchase") \
        .select("user_id", F.col("event_id").alias("purchase_id"),
                ts.alias("pts"))
    out = (c.join(p, on="user_id")
           .filter((F.col("pts") > F.col("cts"))
                   & (F.col("pts") <= F.col("cts")
                      + F.expr(f"INTERVAL {within_minutes} MINUTES"))))
    return out.select(
        "user_id", "click_id", "purchase_id",
        (F.unix_micros("pts") - F.unix_micros("cts")).alias("gap_us"))


def run_stream_click_to_purchase(spark: SparkSession, events_path: str,
                                 within_minutes: int = 30,
                                 name: str = "stream_ssj") -> DataFrame:
    """STREAM-STREAM inner join (the Structured Streaming capability
    the other streaming ops don't exercise): two watermarked streams
    over the same source joined on user + an event-time range
    condition. The range bound is what lets Spark EVICT join state —
    a click older than the watermark minus the interval can never
    match a future purchase, so per-side buffers stay bounded; an
    unbounded-condition stream join would grow state forever.
    availableNow + append mode; output equals the batch join."""
    s1 = _read_stream(spark, events_path) \
        .filter(F.col("event_type") == "click") \
        .select("user_id", F.col("event_id").alias("click_id"),
                F.col("ts").alias("cts")) \
        .withWatermark("cts", "2 hours")
    s2 = _read_stream(spark, events_path) \
        .filter(F.col("event_type") == "purchase") \
        .select(F.col("user_id").alias("p_user"),
                F.col("event_id").alias("purchase_id"),
                F.col("ts").alias("pts")) \
        .withWatermark("pts", "2 hours")
    j = s1.join(
        s2, F.expr(f"""user_id = p_user AND pts > cts
                       AND pts <= cts + INTERVAL {within_minutes}
                       MINUTES"""), "inner")
    q = (j.select("user_id", "click_id", "purchase_id",
                  (F.unix_micros("pts") - F.unix_micros("cts"))
                  .alias("gap_us"))
         .writeStream.format("memory").queryName(name)
         .outputMode("append").trigger(availableNow=True).start())
    q.awaitTermination()
    return spark.table(name)
