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


# --------------------------------------------------------------------
# Analyzer plugin registry — AnalyzerFactory.java / Analyzer.java:24
# (``segment()``). The reference ships 8 JVM segmenters (Ansj, HanLP,
# IK, Jcseg, Jieba, MMSeg4J, SmartCN, word); ours are callables
# Column -> Column(array<string>). Column-expression analyzers stay
# inside whole-stage codegen; heavyweight/CJK segmenters register a
# pandas_udf behind the same signature (Arrow-batched — never a
# row-at-a-time Python UDF).
# --------------------------------------------------------------------
_ANALYZERS: dict[str, object] = {}


def register_analyzer(name: str, fn) -> None:
    """Register a tokenizer: fn(Column) -> Column(array<string>)."""
    _ANALYZERS[name] = fn


def analyzer(name: str):
    try:
        return _ANALYZERS[name]
    except KeyError:
        raise ValueError(
            f"unknown analyzer {name!r}; registered: "
            f"{sorted(_ANALYZERS)}") from None


def segment(col: Column | str, name: str = "word") -> Column:
    """Tokenize ``col`` with the named analyzer (reference:
    Analyzer.segment)."""
    return analyzer(name)(_c(col))


def _bigram_analyzer(col: Column) -> Column:
    """Character-bigram segmentation — the standard CJK fallback when
    no dictionary segmenter is available (and a stand-in showing how a
    pandas_udf analyzer plugs in). Pure Column expressions here since
    bigrams don't need Python."""
    s = F.regexp_replace(F.lower(col), r"\s+", "")
    n = F.length(s)
    return F.when(n < 2, F.array(s)).otherwise(
        F.transform(F.sequence(F.lit(1), n - 1),
                    lambda i: s.substr(i, F.lit(2))))


register_analyzer("word", tokenize)
register_analyzer("bigram", _bigram_analyzer)
