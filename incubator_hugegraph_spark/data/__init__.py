"""Large-scale training-data pipeline operators (beyond-reference,
SURVEY §7.2 M6): deduplication, embedding similarity search, text
analysis, multimodal column handling — over the driver's
documents/embeddings/events tables.

These reuse the engine's join/set kernels; everything is Column
expressions or Arrow-batched pandas UDFs (never row-at-a-time
Python)."""
