"""Text analyzers + text-analysis functions.

The reference ships 8 pluggable word-segmentation analyzers for its
SEARCH index (core/analyzer/*.java, AnalyzerFactory.java; interface
Analyzer.java:24 ``segment()``). Our default analyzer is a
lowercasing non-alphanumeric split — declared in every DuckDB oracle
so both sides agree. CJK-capable analyzers would plug in as a
pandas_udf behind the same ``tokenize`` signature.

All functions here are pure Column expressions (JVM-side, inside
whole-stage codegen) — no Python row loop anywhere.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

TOKEN_SPLIT_RE = r"[^a-z0-9]+"


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def tokenize(col: Column | str) -> Column:
    """lower → split on non-alphanumeric runs → drop empties."""
    toks = F.split(F.lower(_c(col)), TOKEN_SPLIT_RE)
    return F.filter(toks, lambda t: t != "")


def token_count(col: Column | str) -> Column:
    return F.size(tokenize(col))


def distinct_token_count(col: Column | str) -> Column:
    return F.size(F.array_distinct(tokenize(col)))
