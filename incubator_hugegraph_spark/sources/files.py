"""Mapping-driven graph ingestion from CSV / JSON / parquet files.

The reference feeds graphs through the batch REST doors
(api/api/graph/VertexAPI.java / EdgeAPI.java batch POST — the shapes
`rest.py` mirrors) and, in its ecosystem, through mapping-spec bulk
loading (the public hugegraph-loader struct format: per-input
vertex/edge mappings with id / source / target field selections and a
field→property rename map). This module is the Spark-native bulk
path: each mapping compiles to ONE declarative DataFrame program over
``spark.read.<format>`` — format decoding, column pruning and filter
pushdown stay in the scan; the id splice and props packing are narrow
Column expressions, so loading shuffles NOTHING (the optional merge
into an existing graph is the batch upsert's single keyed shuffle,
operators/mutate.py).

Mapping shapes (loader-struct-compatible subset)::

    vertex: {"label": "person",
             "input": {"path": ..., "format": "csv"|"json"|"parquet",
                       "header": True, "schema": "name string, age int"},
             "id": ["name"],              # splice columns; or omit to
                                          # use the schema PRIMARY_KEY
             "field_mapping": {"col": "prop"},   # file col → property
             "selected": [...], "ignored": [...]}

    edge:   {"label": "knows",
             "source_label": "person", "source": ["src_name"],
             "target_label": "person", "target": ["dst_name"],
             "sort_keys": ["since"],     # optional sort_values
             "input": {...}, "field_mapping"/"selected"/"ignored"}

At 100 TB: csv/json/parquet file sources are split-parallel; an
explicit ``schema`` DDL avoids the extra inference pass (CSV
inference scans the data once — fine locally, wasteful at scale, so
pass a schema there).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from incubator_hugegraph_spark.functions.ids import (splice_id_col,
                                                     sort_values_col)
from incubator_hugegraph_spark.graph import PropertyGraph
from incubator_hugegraph_spark.schema import GraphSchema
from incubator_hugegraph_spark.sources.tpch import _props_map


def _read(spark: SparkSession, inp: dict) -> DataFrame:
    fmt = str(inp.get("format", "parquet")).lower()
    path = inp["path"]
    if fmt == "csv":
        r = spark.read.option(
            "header", "true" if inp.get("header", True) else "false")
        if inp.get("schema"):
            return r.schema(inp["schema"]).csv(path)
        return r.option("inferSchema", "true").csv(path)
    if fmt in ("json", "jsonl"):
        r = spark.read
        if inp.get("schema"):
            r = r.schema(inp["schema"])
        return r.json(path)
    if fmt == "parquet":
        return spark.read.parquet(path)
    raise ValueError(f"files source: unsupported format {fmt!r} "
                     f"(csv / json / parquet)")


def _mapped(df: DataFrame, mapping: dict) -> DataFrame:
    for src, dst in (mapping.get("field_mapping") or {}).items():
        df = df.withColumnRenamed(src, dst)
    return df


def _prop_cols(df: DataFrame, mapping: dict, consumed: list[str]) -> list:
    cols = mapping.get("selected") or [c for c in df.columns
                                       if c not in consumed]
    ignored = set(mapping.get("ignored") or [])
    return [c for c in cols if c not in ignored and c not in consumed]


def load_vertices(spark: SparkSession, mapping: dict,
                  schema: GraphSchema | None = None) -> DataFrame:
    """One vertex mapping → canonical (id, label, props, expired_at)
    rows. ``id`` columns splice with the label (the PRIMARY_KEY id
    form, core/backend/id/IdGenerator.java splice semantics); when
    omitted, the label's schema PRIMARY_KEY columns are used."""
    label = mapping["label"]
    df = _mapped(_read(spark, mapping["input"]), mapping)
    id_fields = mapping.get("id")
    if not id_fields and schema is not None:
        vl = schema.vertex_labels.get(label)
        if vl is not None and vl.primary_keys:
            id_fields = list(vl.primary_keys)
    if not id_fields:
        raise ValueError(f"vertex mapping for {label!r} needs 'id' "
                         f"columns or a schema PRIMARY_KEY")
    if isinstance(id_fields, str):
        id_fields = [id_fields]
    props = _prop_cols(df, mapping, [])
    return df.select(
        splice_id_col(label, *id_fields).alias("id"),
        F.lit(label).alias("label"),
        _props_map(df, props).alias("props"),
        F.lit(None).cast("timestamp").alias("expired_at"))


def load_edges(spark: SparkSession, mapping: dict) -> DataFrame:
    """One edge mapping → canonical (src, dst, label, sort_values,
    props, expired_at) rows. Source/target columns splice with their
    endpoint labels; ``sort_keys`` become the EdgeId sort_values
    discriminator (multi-edge frequency)."""
    label = mapping["label"]
    df = _mapped(_read(spark, mapping["input"]), mapping)
    src_f = mapping["source"]
    dst_f = mapping["target"]
    src_f = [src_f] if isinstance(src_f, str) else list(src_f)
    dst_f = [dst_f] if isinstance(dst_f, str) else list(dst_f)
    from incubator_hugegraph_spark.functions.ids import sort_values_col
    sort_keys = mapping.get("sort_keys") or []
    sort_vals = sort_values_col(sort_keys)
    consumed = src_f + dst_f
    props = _prop_cols(df, mapping, consumed)
    return df.select(
        splice_id_col(mapping["source_label"], *src_f).alias("src"),
        splice_id_col(mapping["target_label"], *dst_f).alias("dst"),
        F.lit(label).alias("label"),
        sort_vals.alias("sort_values"),
        _props_map(df, props).alias("props"),
        F.lit(None).cast("timestamp").alias("expired_at"))


def build_graph_from_mappings(spark: SparkSession, spec: dict,
                              schema: GraphSchema | None = None
                              ) -> PropertyGraph:
    """Assemble a PropertyGraph from a mapping spec
    ({"vertices": [...], "edges": [...]}). Typed per-label views are
    registered from the same mapped frames (id + typed property
    columns), so property access and Cypher/Gremlin work exactly as
    on the parquet fixture graph."""
    vparts, vviews = [], {}
    for m in spec.get("vertices", []):
        v = load_vertices(spark, m, schema)
        vparts.append(v)
        raw = _mapped(_read(spark, m["input"]), m)
        # SAME id derivation as load_vertices (review r06: the view
        # previously skipped the schema PRIMARY_KEY fallback, so a
        # mapping without 'id' gave every view row the bare label
        # string as its id while the canonical table spliced pks)
        id_fields = m.get("id")
        if not id_fields and schema is not None:
            vl = schema.vertex_labels.get(m["label"])
            if vl is not None and vl.primary_keys:
                id_fields = list(vl.primary_keys)
        id_fields = id_fields or []
        id_fields = [id_fields] if isinstance(id_fields, str) \
            else list(id_fields)
        props = _prop_cols(raw, m, [])
        vviews[m["label"]] = raw.select(
            splice_id_col(m["label"], *id_fields).alias("id"),
            *[F.col(c) for c in props])
    eparts, eviews = [], {}
    for m in spec.get("edges", []):
        eparts.append(load_edges(spark, m))
        raw = _mapped(_read(spark, m["input"]), m)
        src_f = m["source"] if not isinstance(m["source"], str) \
            else [m["source"]]
        dst_f = m["target"] if not isinstance(m["target"], str) \
            else [m["target"]]
        props = _prop_cols(raw, m, list(src_f) + list(dst_f))
        # the view's sort_values must match the canonical encoding
        # (review r06: a hardcoded '' made multi-edge view rows
        # unjoinable against the canonical table's encoded keys)
        sk = m.get("sort_keys") or []
        eviews[m["label"]] = raw.select(
            splice_id_col(m["source_label"], *src_f).alias("src"),
            splice_id_col(m["target_label"], *dst_f).alias("dst"),
            (sort_values_col(sk) if sk else F.lit(""))
            .alias("sort_values"),
            *[F.col(c) for c in props])
    if not vparts:
        raise ValueError("mapping spec has no vertex mappings")
    vertices = vparts[0]
    for p in vparts[1:]:
        vertices = vertices.unionByName(p)
    if eparts:
        edges = eparts[0]
        for p in eparts[1:]:
            edges = edges.unionByName(p)
    else:
        edges = vertices.sparkSession.createDataFrame(
            [], "src string, dst string, label string, "
                "sort_values string, props map<string,string>, "
                "expired_at timestamp")
    return PropertyGraph(spark=spark, vertices=vertices, edges=edges,
                         schema=schema, vertex_views=vviews,
                         edge_views=eviews)
