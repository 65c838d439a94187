"""Condition algebra → Spark Column expressions.

Mirrors the reference's Condition trees (AND/OR over relations),
core/backend/query/Condition.java:54-131 (RelationType enum) and the
gremlin Text predicates (core/traversal/optimize/Text.java:1-32,
ConditionP.java:1-54). Each helper returns a plain pyspark Column, so
the whole tree stays inside Catalyst — predicate pushdown,
DNF-flattening (ConditionQueryFlatten.java:46-195) and range merging
are Catalyst built-ins (SURVEY §4.1); we add nothing imperative.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from incubator_hugegraph_spark.functions.text import tokenize


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


class P:
    """Relation predicates (Condition.java RelationType)."""

    @staticmethod
    def eq(col, v) -> Column: return _c(col) == v

    @staticmethod
    def neq(col, v) -> Column: return _c(col) != v

    @staticmethod
    def gt(col, v) -> Column: return _c(col) > v

    @staticmethod
    def gte(col, v) -> Column: return _c(col) >= v

    @staticmethod
    def lt(col, v) -> Column: return _c(col) < v

    @staticmethod
    def lte(col, v) -> Column: return _c(col) <= v

    @staticmethod
    def between(col, lo, hi) -> Column:
        """GTE+LT conjunction — the reference's range-condition merge
        (ConditionQueryFlatten.optimizeRelations)."""
        return (_c(col) >= lo) & (_c(col) < hi)

    @staticmethod
    def within(col, values: list) -> Column:  # IN
        return _c(col).isin(values)

    @staticmethod
    def without(col, values: list) -> Column:  # NOT_IN
        return ~_c(col).isin(values)

    @staticmethod
    def prefix(col, p: str) -> Column:  # id PREFIX scan
        return _c(col).startswith(p)

    @staticmethod
    def text_contains(col, word: str) -> Column:
        """Analyzer-based word match (TEXT_CONTAINS): the reference
        tokenizes the property and matches whole words
        (GraphIndexTransaction.doSearchIndex :529-548). Default
        analyzer = whitespace/punct split (declared in every oracle)."""
        return F.array_contains(tokenize(_c(col)), word)

    @staticmethod
    def text_contains_any(col, words: list[str]) -> Column:
        return F.arrays_overlap(
            tokenize(_c(col)),
            F.array(*[F.lit(w) for w in words]))

    @staticmethod
    def contains(col, v) -> Column:  # collection property CONTAINS
        return F.array_contains(_c(col), v)

    @staticmethod
    def contains_key(col, k: str) -> Column:  # map CONTAINS_KEY
        return F.array_contains(F.map_keys(_c(col)), k)

    @staticmethod
    def contains_value(col, v) -> Column:  # map CONTAINS_VALUE
        return F.array_contains(F.map_values(_c(col)), v)


def and_(*conds: Column) -> Column:
    out = conds[0]
    for c in conds[1:]:
        out = out & c
    return out


def or_(*conds: Column) -> Column:
    out = conds[0]
    for c in conds[1:]:
        out = out | c
    return out
