"""Id splicing — PRIMARY_KEY id strategy.

The reference splices label + primary-key values into the vertex id
(SplicingIdGenerator.splicing, used from
core/backend/tx/GraphTransaction.java:1536-1543). We use a printable
``label!pk1!pk2`` form so ids stay DuckDB-comparable; '!' inside
values is escaped. Pure Column expressions — JVM-side, codegen-able.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from incubator_hugegraph_spark.schema import ID_DELIM


def _escape_col(col: Column) -> Column:
    # escape the ESCAPE CHAR FIRST, then both delimiters — without the
    # backslash pass, values ('a\\', 'b!c') and ('a!b\\', 'c') encode
    # to the same spliced string and two distinct identities collapse.
    # '>' (the EdgeId splice delimiter, EdgeId.java) is escaped too, so
    # a pk/sort value containing '>' can never make the 4-part EdgeId
    # concat key ambiguous — mirroring the reference's escaping of the
    # IDS_SPLITOR in every component (SplicingIdGenerator.concat).
    # NULL values render as 'None' like the driver-side str(None) —
    # concat_ws otherwise SKIPS nulls, collapsing distinct composite
    # identities ((NULL,'b') vs ('b',NULL)) and diverging from
    # splice_id (review r06).
    c = F.coalesce(col.cast("string"), F.lit("None"))
    c = F.regexp_replace(c, r"\\", r"\\\\")
    c = F.regexp_replace(c, r"!", r"\\!")
    return F.regexp_replace(c, r">", r"\\>")


def _escape(v) -> str:
    from incubator_hugegraph_spark.schema import escape_id_value
    return escape_id_value(v)


def splice_id_col(label: str, *pk_cols: Column | str) -> Column:
    """``concat_ws('!', label, pk...)`` with '\\' and '!' escaped in
    values (escape char first — see _escape_col)."""
    parts = [F.lit(label)]
    for c in pk_cols:
        parts.append(_escape_col(F.col(c) if isinstance(c, str) else c))
    return F.concat_ws(ID_DELIM, *parts)


def splice_id(label: str, *pk_values) -> str:
    """Driver/Python-side form of splice_id_col (same escaping) — for
    code that builds ids inside pandas UDFs or fixtures."""
    return ID_DELIM.join([label] + [_escape(v) for v in pk_values])


def id_prefix(label: str) -> str:
    """Prefix for IdPrefixQuery-style scans over a label's id range
    (core/backend/query/IdPrefixQuery.java)."""
    return label + ID_DELIM


# EdgeId sort-values encoding — ONE encoder for every write surface
# (REST edge door, file ingestion, Cypher CREATE, Gremlin addE), so a
# logical edge gets the same EdgeId quadruple no matter which surface
# wrote it and upserts/lookups dedupe across surfaces. The reference
# concats sort values with NAME_SPLITOR '!' and splices the EdgeId
# with '>' (SplicingIdGenerator.java:47-48, EdgeId.java) — we keep the
# same pair, with '!' AND '>' escaped inside values exactly like
# splice_id (see _escape), so neither delimiter ever appears raw in
# sort_values / spliced vertex ids and EdgeId strings stay unambiguous
# to parse (escape-aware parsers split on unescaped '>' only).

SORT_VALUES_SEP = ID_DELIM  # '!' — distinct from the '>' EdgeId splice


def encode_sort_values(values) -> str:
    """Python-side sort-values encoder (REST/Cypher/Gremlin writes)."""
    return SORT_VALUES_SEP.join(_escape(v) for v in values)


def sort_values_col(cols) -> Column:
    """Column-side twin of encode_sort_values (file ingestion)."""
    parts = [_escape_col(F.col(c) if isinstance(c, str) else c)
             for c in cols]
    return F.concat_ws(SORT_VALUES_SEP, *parts) if parts else F.lit("")
