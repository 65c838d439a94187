"""Streaming subsystem (beyond-reference: the OLTP reference has no
streaming operators — SURVEY §2.J). Structured Streaming ingestion of
the `events` table into graph edges, plus the batch-equivalent
session/window analytics the streaming queries share."""
