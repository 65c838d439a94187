"""Schema registry: PropertyKey / VertexLabel / EdgeLabel / IndexLabel.

Mirrors the reference's explicit (schema-full) model:
  - PropertyKey: core/schema/PropertyKey.java:45 (data type +
    cardinality, core/type/define/DataType.java:33-46,
    Cardinality.java:24-40)
  - VertexLabel: core/schema/VertexLabel.java:51-134 (properties,
    primaryKeys, nullableKeys, idStrategy, ttl)
  - EdgeLabel: core/schema/EdgeLabel.java:48-130 (links, frequency,
    sortKeys)
  - IndexLabel: core/schema/IndexLabel.java / IndexType.java:22-41 —
    SECONDARY/RANGE/SHARD are represented but compile to no-ops
    (Catalyst predicate pushdown + Parquet stats subsume them);
    SEARCH compiles to a tokenized array column; UNIQUE compiles to a
    write-time groupBy check.

The registry compiles labels to Spark StructTypes, validates writes,
and derives PRIMARY_KEY ids by splicing label + pk values the way
SplicingIdGenerator does (core/backend/tx/GraphTransaction.java:1536-1543).
Persistence is a JSON side file instead of the reference's
SchemaTransaction store (core/backend/tx/SchemaTransaction.java).
"""

from __future__ import annotations

import json
from dataclasses import dataclass, field
from enum import Enum

from pyspark.sql import types as T

# core/type/define/DataType.java:33-46 → Spark SQL types (SURVEY §1.2)
DATA_TYPES: dict[str, T.DataType] = {
    "BOOLEAN": T.BooleanType(),
    "BYTE": T.ByteType(),
    "INT": T.IntegerType(),
    "LONG": T.LongType(),
    "FLOAT": T.FloatType(),
    "DOUBLE": T.DoubleType(),
    "TEXT": T.StringType(),
    "BLOB": T.BinaryType(),
    "DATE": T.TimestampType(),
    "UUID": T.StringType(),
    "OBJECT": T.BinaryType(),
}


class Cardinality(str, Enum):
    """core/type/define/Cardinality.java:24-40."""

    SINGLE = "SINGLE"
    LIST = "LIST"  # duplicates allowed → ArrayType
    SET = "SET"    # distinct → ArrayType + array_distinct on write


class IdStrategy(str, Enum):
    """core/type/define/IdStrategy.java:20-32."""

    AUTOMATIC = "AUTOMATIC"
    PRIMARY_KEY = "PRIMARY_KEY"
    CUSTOMIZE_STRING = "CUSTOMIZE_STRING"
    CUSTOMIZE_NUMBER = "CUSTOMIZE_NUMBER"
    CUSTOMIZE_UUID = "CUSTOMIZE_UUID"


class Frequency(str, Enum):
    """core/type/define/Frequency.java:24-26."""

    SINGLE = "SINGLE"
    MULTIPLE = "MULTIPLE"  # multi-edges distinguished by sortKeys


class IndexType(str, Enum):
    """core/type/define/IndexType.java:22-41."""

    SECONDARY = "SECONDARY"
    RANGE = "RANGE"
    SEARCH = "SEARCH"
    SHARD = "SHARD"
    UNIQUE = "UNIQUE"


# Splicing delimiter: the reference uses ''-style escaped joins
# (core/backend/id/SplicingIdGenerator.java); we use a printable '!'
# for DuckDB-comparable ids and escape literal '!' in values.
ID_DELIM = "!"


def escape_id_value(v) -> str:
    """THE id-component escaper — one definition for every surface
    (schema splice, functions/ids column twin, REST/Cypher/Gremlin
    writes). Escape char first, then both delimiters: '!' (vertex pk /
    sort-value splice, NAME_SPLITOR) and '>' (EdgeId splice) —
    mirroring the reference's escaping of the splice chars in every
    component (SplicingIdGenerator.concat, EdgeId.asString)."""
    return (str(v).replace("\\", "\\\\").replace("!", "\\!")
            .replace(">", "\\>"))


def splice_id(label: str, *pk_values: str) -> str:
    """PRIMARY_KEY id derivation (driver-side helper; column version in
    functions/ids.py). GraphTransaction.java:1536-1543."""
    return ID_DELIM.join([label] + [escape_id_value(v) for v in pk_values])


def has_unescaped(s: str, ch: str) -> bool:
    """True when `ch` appears in `s` NOT preceded by an odd number of
    backslashes — i.e. as a raw delimiter rather than an
    escape_id_value-escaped character. Engine-spliced ids carry only
    escaped delimiters ('\\>', '\\!'), so this is the validity test
    for user-supplied ids entering EdgeId-splice positions."""
    bs = 0
    for c in s:
        if c == "\\":
            bs += 1
            continue
        if c == ch and bs % 2 == 0:
            return True
        bs = 0
    return False


def id_splice_safe(s: str) -> tuple[bool, str]:
    """Can `s` sit in an EdgeId splice position without corrupting the
    4-part key? Two hazards (code review r06): a raw unescaped '>'
    (reads as a delimiter), and a TRAILING odd backslash run (escapes
    the splice delimiter the concat appends after it — 'a\\' + '>' +
    label parses the label's first char as escaped). Returns
    (ok, reason)."""
    if has_unescaped(s, ">"):
        return False, "raw '>' is the EdgeId splice delimiter"
    if (len(s) - len(s.rstrip("\\"))) % 2 == 1:
        return False, ("a trailing unpaired backslash would escape "
                       "the EdgeId splice delimiter")
    return True, ""


@dataclass(frozen=True)
class PropertyKey:
    name: str
    data_type: str = "TEXT"
    cardinality: Cardinality = Cardinality.SINGLE

    def spark_type(self) -> T.DataType:
        base = DATA_TYPES[self.data_type]
        if self.cardinality in (Cardinality.LIST, Cardinality.SET):
            return T.ArrayType(base)
        return base


@dataclass(frozen=True)
class VertexLabel:
    name: str
    properties: tuple[str, ...] = ()
    primary_keys: tuple[str, ...] = ()
    nullable_keys: tuple[str, ...] = ()
    id_strategy: IdStrategy = IdStrategy.PRIMARY_KEY
    ttl_ms: int = 0  # core/schema/VertexLabel.java:130-132
    enable_label_index: bool = True


@dataclass(frozen=True)
class EdgeLabel:
    name: str
    source_label: str
    target_label: str
    properties: tuple[str, ...] = ()
    sort_keys: tuple[str, ...] = ()
    nullable_keys: tuple[str, ...] = ()
    frequency: Frequency = Frequency.SINGLE
    ttl_ms: int = 0


@dataclass(frozen=True)
class IndexLabel:
    name: str
    base_type: str  # 'VERTEX' | 'EDGE'
    base_value: str  # label name
    index_type: IndexType
    fields: tuple[str, ...] = ()


@dataclass
class GraphSchema:
    """In-memory schema registry (SchemaManager facade,
    core/schema/SchemaManager.java)."""

    property_keys: dict[str, PropertyKey] = field(default_factory=dict)
    vertex_labels: dict[str, VertexLabel] = field(default_factory=dict)
    edge_labels: dict[str, EdgeLabel] = field(default_factory=dict)
    index_labels: dict[str, IndexLabel] = field(default_factory=dict)

    # -- builders ---------------------------------------------------
    def property_key(self, name: str, data_type: str = "TEXT",
                     cardinality: Cardinality = Cardinality.SINGLE) -> PropertyKey:
        pk = PropertyKey(name, data_type, cardinality)
        self.property_keys[name] = pk
        return pk

    def vertex_label(self, name: str, **kw) -> VertexLabel:
        vl = VertexLabel(name, **{k: tuple(v) if isinstance(v, list) else v
                                  for k, v in kw.items()})
        self._check_props(vl.properties)
        if vl.id_strategy == IdStrategy.PRIMARY_KEY and not vl.primary_keys:
            raise ValueError(f"vertex label {name}: PRIMARY_KEY strategy "
                             "requires primary_keys")
        # key subsets validate HERE, where the mistake is (review r06
        # — the reference's builders do the same; a pk outside the
        # declared properties previously failed far away with a bare-
        # label spliced id or an AnalysisException inside a write plan)
        for kind, keys in (("primary_keys", vl.primary_keys),
                           ("nullable_keys", vl.nullable_keys)):
            extra = set(keys or ()) - set(vl.properties or ())
            if extra:
                raise ValueError(
                    f"vertex label {name}: {kind} {sorted(extra)} not "
                    "in declared properties")
        self.vertex_labels[name] = vl
        return vl

    def edge_label(self, name: str, source_label: str, target_label: str,
                   **kw) -> EdgeLabel:
        el = EdgeLabel(name, source_label, target_label,
                       **{k: tuple(v) if isinstance(v, list) else v
                          for k, v in kw.items()})
        self._check_props(el.properties)
        for lbl in (source_label, target_label):
            if lbl not in self.vertex_labels:
                raise ValueError(f"edge label {name}: unknown vertex label {lbl}")
        if el.frequency == Frequency.MULTIPLE and not el.sort_keys:
            raise ValueError(f"edge label {name}: MULTIPLE frequency requires "
                             "sort_keys (EdgeLabel.java:52)")
        for kind, keys in (("sort_keys", el.sort_keys),
                           ("nullable_keys", el.nullable_keys)):
            extra = set(keys or ()) - set(el.properties or ()) \
                - set(el.sort_keys or ())
            if extra:
                raise ValueError(
                    f"edge label {name}: {kind} {sorted(extra)} not in "
                    "declared properties")
        self.edge_labels[name] = el
        return el

    def index_label(self, name: str, base_type: str, base_value: str,
                    index_type: IndexType, fields: tuple[str, ...]) -> IndexLabel:
        il = IndexLabel(name, base_type, base_value, index_type, tuple(fields))
        self.index_labels[name] = il
        return il

    def _check_props(self, props: tuple[str, ...]) -> None:
        for p in props:
            if p not in self.property_keys:
                raise ValueError(f"undeclared property key: {p}")

    # -- schema-link pruning (GraphTransaction.optimizeQuery
    #    :1553-1589): which edge labels can link a given vertex label —
    #    lets traversers skip scans Catalyst can't know are empty.
    def edge_labels_from(self, vertex_label: str) -> list[str]:
        return [n for n, e in self.edge_labels.items()
                if e.source_label == vertex_label]

    def edge_labels_to(self, vertex_label: str) -> list[str]:
        return [n for n, e in self.edge_labels.items()
                if e.target_label == vertex_label]

    # -- compile ----------------------------------------------------
    def struct_type(self, label: str, kind: str = "VERTEX") -> T.StructType:
        """Typed StructType for a label's property columns."""
        obj = (self.vertex_labels if kind == "VERTEX" else self.edge_labels)[label]
        fields = []
        if kind == "VERTEX":
            fields.append(T.StructField("id", T.StringType(), False))
        else:
            fields.extend([T.StructField("src", T.StringType(), False),
                           T.StructField("dst", T.StringType(), False),
                           T.StructField("sort_values", T.StringType(), True)])
        for p in obj.properties:
            pk = self.property_keys[p]
            fields.append(T.StructField(p, pk.spark_type(),
                                        p in obj.nullable_keys))
        fields.append(T.StructField("expired_at", T.TimestampType(), True))
        return T.StructType(fields)

    # -- persistence ------------------------------------------------
    def to_json(self) -> str:
        def enc(o):
            if isinstance(o, Enum):
                return o.value
            return o.__dict__
        return json.dumps({
            "property_keys": {k: v.__dict__ for k, v in self.property_keys.items()},
            "vertex_labels": {k: v.__dict__ for k, v in self.vertex_labels.items()},
            "edge_labels": {k: v.__dict__ for k, v in self.edge_labels.items()},
            "index_labels": {k: v.__dict__ for k, v in self.index_labels.items()},
        }, default=enc, indent=1)

    @classmethod
    def from_json(cls, text: str) -> "GraphSchema":
        raw = json.loads(text)
        s = cls()
        for k, v in raw.get("property_keys", {}).items():
            s.property_keys[k] = PropertyKey(
                v["name"], v["data_type"], Cardinality(v["cardinality"]))
        for k, v in raw.get("vertex_labels", {}).items():
            s.vertex_labels[k] = VertexLabel(
                v["name"], tuple(v["properties"]), tuple(v["primary_keys"]),
                tuple(v["nullable_keys"]), IdStrategy(v["id_strategy"]),
                v["ttl_ms"], v["enable_label_index"])
        for k, v in raw.get("edge_labels", {}).items():
            s.edge_labels[k] = EdgeLabel(
                v["name"], v["source_label"], v["target_label"],
                tuple(v["properties"]), tuple(v["sort_keys"]),
                tuple(v["nullable_keys"]), Frequency(v["frequency"]), v["ttl_ms"])
        for k, v in raw.get("index_labels", {}).items():
            s.index_labels[k] = IndexLabel(
                v["name"], v["base_type"], v["base_value"],
                IndexType(v["index_type"]), tuple(v["fields"]))
        return s
