"""Multimodal (image/audio/video) column handling.

Assets are opaque `binary` columns + typed metadata, processed with
Arrow-batched `mapInPandas` kernels — the Spark-side plumbing (schema,
partition sizing, UDF signatures, batch shapes) is real and tested;
the actual codec work is STUBBED (this container has no image/audio
libraries) behind `_decode_stub`, which produces deterministic fake
features so pipelines are testable end-to-end.

Scale notes: binary payloads dominate partition size — size
`spark.sql.files.maxPartitionBytes` for ~128 MB of payload per task
and keep metadata in separate (pruned) columns so metadata-only
queries never read the bytes. `mapInPandas` streams batches, so one
task never materializes a partition of blobs at once.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

ASSET_SCHEMA = T.StructType([
    T.StructField("asset_id", T.LongType(), False),
    T.StructField("modality", T.StringType(), False),  # image|audio|video
    T.StructField("mime", T.StringType(), True),
    T.StructField("payload", T.BinaryType(), True),
    T.StructField("meta", T.MapType(T.StringType(), T.StringType()), True),
])

FEATURE_SCHEMA = T.StructType([
    T.StructField("asset_id", T.LongType(), False),
    T.StructField("modality", T.StringType(), False),
    T.StructField("n_bytes", T.LongType(), False),
    T.StructField("width", T.IntegerType(), True),
    T.StructField("height", T.IntegerType(), True),
    T.StructField("duration_ms", T.LongType(), True),
    T.StructField("feature", T.ArrayType(T.FloatType()), True),
])


def _decode_stub(payload: bytes, modality: str) -> dict:
    """Deterministic fake decode. A real build would dispatch to
    PIL/libav here; raising NotImplementedError is the other accepted
    stub mode — we pick the deterministic fake so batch shape and
    downstream schema stay testable."""
    n = len(payload or b"")
    if modality == "image":
        side = max(1, int(n ** 0.5))
        return {"width": side, "height": side, "duration_ms": None}
    if modality in ("audio", "video"):
        return {"width": None, "height": None, "duration_ms": n * 8}
    return {"width": None, "height": None, "duration_ms": None}


def _feature_stub(payload: bytes, dim: int = 8) -> list[float]:
    """Deterministic fake embedding: byte-histogram projection."""
    n = len(payload or b"")
    if n == 0:
        return [0.0] * dim
    acc = [0] * dim
    for i, byte in enumerate(payload[:4096]):
        acc[i % dim] += byte
    return [round(a / (255.0 * max(1, min(n, 4096) / dim)), 6) for a in acc]


def extract_features(assets: DataFrame, dim: int = 8) -> DataFrame:
    """mapInPandas feature extraction: one Arrow batch in, one out.
    Returns FEATURE_SCHEMA rows."""
    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            meta = [_decode_stub(p, m) for p, m in
                    zip(pdf["payload"], pdf["modality"])]
            out = pd.DataFrame({
                "asset_id": pdf["asset_id"],
                "modality": pdf["modality"],
                "n_bytes": [len(p or b"") for p in pdf["payload"]],
                "width": [m["width"] for m in meta],
                "height": [m["height"] for m in meta],
                "duration_ms": [m["duration_ms"] for m in meta],
                "feature": [_feature_stub(p, dim) for p in pdf["payload"]],
            })
            yield out
    return assets.mapInPandas(run, FEATURE_SCHEMA)


def resize_images(assets: DataFrame, max_side: int) -> DataFrame:
    """Image resize kernel — STUB: the transform is a payload
    pass-through that records the requested size in meta (no codec in
    this container); the partitioning/batching plumbing is the real
    shape a PIL-based kernel drops into."""
    return (assets
            .withColumn("meta", F.map_concat(
                F.coalesce("meta", F.create_map().cast(
                    "map<string,string>")),
                F.create_map(F.lit("resize_to"),
                             F.lit(str(max_side))))))


def sample_frames(assets: DataFrame, every_ms: int) -> DataFrame:
    """Video frame sampling — STUB emitting deterministic frame index
    rows from the fake duration; one row per sampled frame."""
    feats = extract_features(assets.filter(F.col("modality") == "video"))
    return (feats
            .withColumn("frame_idx", F.explode(
                F.sequence(F.lit(0),
                           F.greatest(F.floor(F.col("duration_ms")
                                              / every_ms), F.lit(0)))))
            .select("asset_id", "frame_idx",
                    (F.col("frame_idx") * every_ms).alias("ts_ms")))


def docs_as_assets(docs: DataFrame) -> DataFrame:
    """Adapter: treat the documents fixture's text bytes as binary
    payloads (deterministic test corpus for the multimodal path)."""
    return docs.select(
        F.col("doc_id").alias("asset_id"),
        F.when(F.col("doc_id") % 3 == 0, "image")
         .when(F.col("doc_id") % 3 == 1, "audio")
         .otherwise("video").alias("modality"),
        F.lit("application/octet-stream").alias("mime"),
        F.encode("text", "utf-8").alias("payload"),
        F.create_map(F.lit("source"), F.col("source")).alias("meta"))
