"""Fluent Gremlin-style traversal DSL compiling to DataFrame plans.

The reference's primary query surface is the Gremlin step language,
executed by the embedded TinkerPop runtime with storage-touching steps
overridden (SURVEY §2.L; compliance contract
test/tinkerpop/ProcessBasicSuite.java:110-198). This module is the
Python analogue of the step families that suite pins — each step is a
pure DataFrame transformation, so the whole traversal stays one
Catalyst plan (pushdown/pruning free, SURVEY §4.1) until a terminal
action:

    g = G(graph)
    (g.V().hasLabel("part").has("size", GP.gte(45))
       .in_("contains").dedup().count())

Step → Spark mapping (suite family in parens):
- V/E, hasLabel/hasId/has (filter): `filter` on id/label/props —
  HugeGraphStepStrategy's has-folding is Catalyst pushdown here.
- out/in/both, outE/inE/bothE, inV/outV/otherV (map/flatMap):
  adjacency joins against the dual-row adj view (HugeVertexStep).
  Multiplicity is preserved (Gremlin flatMap semantics): one
  traverser per edge traversed, collapsed only by dedup().
- values/id_/label_ (map), dedup, limit/range_/tail, order_by,
  groupCount, count/sum_/mean_/max_/min_ (sideEffect/agg), fold.
- repeat(...).times equivalent `repeat(step, n)` plus
  `repeat_emit` (emit-before/after union of rounds) and
  `repeat_until` (per-traverser loop exit, depth+capacity guarded)
  (branch), union, path/simplePath/cyclicPath (filter: path
  predicates on the carried vertex trail, `array_contains`-style
  checks in Column space).
- sack (withSack/sack: per-traverser accumulator column), tree
  (prefix aggregation), subgraph (edge-induced PropertyGraph), math
  (Column-compiled arithmetic), mid-traversal V_, project
  (named columns), group (key + value aggregation).
- sample(n)/coin(p): deterministic hash-ranked/hash-gated selection
  (the reproducible form of Gremlin sample()/coin(), matching the
  `gremlin_sample` query).
- filter_/not_/and_/or_ (filter): anonymous-child predicates — the
  child runs scoped per traverser on the local() ordinal machinery
  and survival is one semi-/anti-join on the ordinal hit set (never
  a per-row subquery; reducer children emit per-origin, so
  filter_(outE().count().is_(gte(n))) is a degree gate).
- elementMap/valueMap (map): flat id+label+props projections;
  constant/identity.
- addV/addE/property/drop (write steps): the reference's TinkerPop
  data-entry API, compiled onto the batch mutate layer
  (operators/mutate.py — upserts shuffle once on the identity key,
  drop anti-joins; typed views refresh; builders flush on the first
  non-builder step or iterate()).

Path semantics: the traversal carries the VERTEX trail (`path`
array<string>) through element steps; edge hops (outE→inV) append
only the resolved far vertex. This is what simplePath/cyclicPath
need; full TinkerPop path objects (mixed vertex/edge entries, `as()`
labels) are out of scope — SURVEY §2.L maps those to column
aliasing; step LABELS themselves are supported: as_()/select()/
where_label() carry the labeled ids as extra columns through hops.

Determinism note: Gremlin iterators are unordered; wherever an order
matters (limit/range_/tail/sample) we fix lexicographic id order so
results are reproducible and oracle-checkable — same deviation rule
as SURVEY §7.4#4.

At 100 TB the plans are the same shape as the operator library's:
frontier joins are broadcast when small, the path column exists only
when a path step is used downstream (Catalyst prunes it otherwise —
it is SELECTed away by count()/values()).
"""

from __future__ import annotations

import re
from functools import reduce
from typing import Callable

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from incubator_hugegraph_spark.graph import BOTH, IN, OUT, PropertyGraph


def _typed(c: Column, v) -> Column:
    """Props are map<string,string>; compare through the value's
    Python type (mirrors the typed per-label views)."""
    if isinstance(v, bool):
        return c.cast("boolean")
    if isinstance(v, (int, float)):
        return c.cast("double")
    return c


class GP:
    """Gremlin value predicates (P.gt(…) etc.) — each returns a
    Column→Column closure applied by has()/where()."""

    @staticmethod
    def eq(v): return lambda c: _typed(c, v) == v

    @staticmethod
    def neq(v): return lambda c: _typed(c, v) != v

    @staticmethod
    def gt(v): return lambda c: _typed(c, v) > v

    @staticmethod
    def gte(v): return lambda c: _typed(c, v) >= v

    @staticmethod
    def lt(v): return lambda c: _typed(c, v) < v

    @staticmethod
    def lte(v): return lambda c: _typed(c, v) <= v

    @staticmethod
    def within(*vs): return lambda c: c.isin(list(vs))

    @staticmethod
    def without(*vs): return lambda c: ~c.isin(list(vs))

    @staticmethod
    def between(lo, hi):
        """[lo, hi) — Gremlin P.between."""
        return lambda c: (_typed(c, lo) >= lo) & (_typed(c, hi) < hi)

    @staticmethod
    def inside(lo, hi):
        """(lo, hi) exclusive — Gremlin P.inside."""
        return lambda c: (_typed(c, lo) > lo) & (_typed(c, hi) < hi)

    @staticmethod
    def outside(lo, hi):
        return lambda c: (_typed(c, lo) < lo) | (_typed(c, hi) > hi)

    @staticmethod
    def text_contains(word: str):
        """Text.contains word match (analyzer semantics, §2.B)."""
        from incubator_hugegraph_spark.functions.text import tokenize
        return lambda c: F.array_contains(tokenize(c), word.lower())


def _pred(key_col: Column, value) -> Column:
    if callable(value):
        return value(key_col)
    return _typed(key_col, value) == value


def _align_branches(a: "Traversal", b: "Traversal"):
    """Make two same-kind branch traversals union-compatible: V-kind
    reduces to the hop shape (one branch may carry attached element
    columns the other lacks); value-kind with diverging types coerces
    both to string (Gremlin value streams are heterogeneous)."""
    if a.kind == "V":
        # keep carried columns (__sack/__as_*/__loops) present in BOTH
        # branches — reducing to (id, path) stripped a live sack or
        # step label and later steps crashed (review r06)
        shared = [c for c in a._carries() if c in b.df.columns]
        return tuple(t._new(t.df.select("id", "path", *shared),
                            attached=False)
                     for t in (a, b))
    if a.kind == "value":
        ta = a.df.schema["value"].dataType
        tb = b.df.schema["value"].dataType
        if ta != tb:
            return tuple(t._new(t.df.select(
                F.col("value").cast("string").alias("value")))
                for t in (a, b))
    return a, b


class Traversal:
    """Immutable traversal: every step returns a new Traversal whose
    ``df`` is the accumulated DataFrame plan."""

    def __init__(self, graph: PropertyGraph, df: DataFrame, kind: str,
                 attached: bool, sort: list | None = None):
        self.graph = graph
        self.df = df          # V: (id, path [,label,props]) / E / value
        self.kind = kind      # 'V' | 'E' | 'value'
        self._attached = attached  # V-kind: label/props columns present
        self._sort = sort     # explicit order_by sort columns, if any
        self._side: dict[str, DataFrame] = {}  # store()/aggregate() bags

    # -- plumbing ------------------------------------------------------

    def _new(self, df: DataFrame, kind: str | None = None,
             attached: bool | None = None,
             sort: list | None | str = "keep") -> "Traversal":
        t = type(self)(self.graph, df,
                       kind if kind is not None else self.kind,
                       self._attached if attached is None else attached,
                       self._sort if sort == "keep" else sort)
        t._side = self._side
        # statically-known edge labels of an E frame (set by
        # outE/inE/bothE(label…)); lets write steps validate against
        # the schema without a driver-side distinct job
        t._static_elabels = getattr(self, "_static_elabels", None)
        return t

    def _prop_col(self, key: str) -> Column:
        """props[key], cast through the schema registry's PropertyKey
        type when declared (the reference compares and orders property
        values through PropertyKey.dataType the same way)."""
        c = F.col("props")[key]
        sch = getattr(self.graph, "schema", None)
        pks = getattr(sch, "property_keys", {}) if sch is not None else {}
        if key in pks:
            return c.cast(pks[key].spark_type())
        return c

    def _elem(self) -> "Traversal":
        """Attach label/props to V-kind traversers (lazy: adjacency
        hops carry only (id, path); the vertex join happens when a
        step needs element data)."""
        if self.kind != "V" or self._attached:
            return self
        v = self.graph.vertices.select("id", "label", "props")
        return self._new(self.df.join(v, on="id"), attached=True)

    def _require(self, *kinds: str) -> None:
        if self.kind not in kinds:
            raise TypeError(f"step not applicable to {self.kind}-kind "
                            f"traversal (needs {kinds})")

    # -- filter steps --------------------------------------------------

    def hasLabel(self, *labels: str) -> "Traversal":
        t = self._elem()
        return t._new(t.df.filter(F.col("label").isin(list(labels))))

    def hasId(self, *ids: str) -> "Traversal":
        self._require("V", "E")
        col = F.col("id") if self.kind == "V" else F.col("eid")
        return self._new(self.df.filter(col.isin(list(ids))))

    def has(self, key: str, value=None) -> "Traversal":
        """has(key, value/predicate) filters on the property;
        has(key) alone is the EXISTENCE form (TinkerPop HasStep with
        no predicate)."""
        t = self._elem() if self.kind == "V" else self
        if value is None:
            return t._new(t.df.filter(
                F.col("props")[key].isNotNull()))
        return t._new(t.df.filter(_pred(F.col("props")[key], value)))

    def hasNot(self, key: str) -> "Traversal":
        """Elements WITHOUT the property (TinkerPop hasNot)."""
        t = self._elem() if self.kind == "V" else self
        return t._new(t.df.filter(F.col("props")[key].isNull()))

    def where(self, fn: Callable[[DataFrame], Column]) -> "Traversal":
        return self._new(self.df.filter(fn(self.df)))

    def dedup(self) -> "Traversal":
        if self.kind == "value":
            return self._new(self.df.dropDuplicates(["value"]))
        if self.kind == "prop":
            # property traverser identity = (element, key) (r06:
            # the barrier partitioned by a nonexistent eid column)
            return self._new(self.df.dropDuplicates(["id", "key"]))
        # one row per element, keeping the MIN path (dropDuplicates
        # would keep an arbitrary traverser's path — nondeterministic
        # if path()/simplePath() follows)
        key = "id" if self.kind == "V" else "eid"
        w = Window.partitionBy(key).orderBy("path")
        return self._new(self.df.withColumn("__rn", F.row_number().over(w))
                         .filter(F.col("__rn") == 1).drop("__rn"))

    def simplePath(self) -> "Traversal":
        self._require("V")
        return self._new(self.df.filter(
            F.size(F.array_distinct("path")) == F.size("path")))

    def cyclicPath(self) -> "Traversal":
        self._require("V")
        return self._new(self.df.filter(
            F.size(F.array_distinct("path")) < F.size("path")))

    # -- traversal-predicate filters (filter/not/and/or) ---------------
    #
    # TinkerPop filter(__.x()), not(__.x()), and(...), or(...): an
    # anonymous child runs per traverser; the traverser survives by
    # whether the child emits anything. Implemented on the local()
    # ordinal machinery: tag each traverser, run the child scoped, and
    # semi-/anti-join the surviving ordinals — one join per predicate,
    # never a per-row subquery. Same bounded-stream caveat as local()
    # (the tagging window is global).

    def _sub_filter(self, subs: list, keep: str) -> "Traversal":
        sort = [*self._sort_cols()]
        if "path" in self.df.columns:
            sort.append(F.col("path"))
        tagged = self.df.withColumn(
            "__loc", F.row_number().over(Window.orderBy(*sort)))
        hit_sets = []
        for sub in subs:
            lt = _LocalTraversal(self.graph, tagged, self.kind,
                                 self._attached, self._sort)
            lt._side = self._side
            lt._loc_base = tagged.select("__loc").distinct()
            out = sub(lt)
            if not isinstance(out, Traversal):
                raise TypeError("traversal predicate must end in a "
                                "traversal step")
            hit_sets.append(out.df.select("__loc").distinct())
        if keep == "exists":
            kept = tagged.join(hit_sets[0], on="__loc", how="left_semi")
        elif keep == "absent":
            kept = tagged.join(hit_sets[0], on="__loc", how="left_anti")
        elif keep == "all":
            kept = tagged
            for h in hit_sets:
                kept = kept.join(h, on="__loc", how="left_semi")
        else:  # any
            from functools import reduce as _reduce
            union = _reduce(lambda a, b: a.unionByName(b), hit_sets) \
                .distinct()
            kept = tagged.join(union, on="__loc", how="left_semi")
        return self._new(kept.drop("__loc"))

    def filter_(self, sub: Callable[["Traversal"], "Traversal"]
                ) -> "Traversal":
        """filter(__.child) / where(__.child): keep traversers whose
        child emits at least one row. Reducers inside the child emit
        per-origin (local() contract), so
        ``filter_(lambda t: t.outE().count().is_(GP.gte(2)))`` is
        a per-vertex degree gate."""
        return self._sub_filter([sub], "exists")

    def not_(self, sub: Callable[["Traversal"], "Traversal"]
             ) -> "Traversal":
        """not(__.child): keep traversers whose child emits nothing."""
        return self._sub_filter([sub], "absent")

    def and_(self, *subs: Callable[["Traversal"], "Traversal"]
             ) -> "Traversal":
        """and(a, b, …): every child must emit (chained semi-joins)."""
        return self._sub_filter(list(subs), "all")

    def or_(self, *subs: Callable[["Traversal"], "Traversal"]
            ) -> "Traversal":
        """or(a, b, …): at least one child must emit (union of hit
        sets, one semi-join)."""
        return self._sub_filter(list(subs), "any")

    def coin(self, p: float) -> "Traversal":
        """coin(p): deterministic biased coin — keeps the traverser
        when its element id hashes under p (the reproducible form,
        same convention as sample())."""
        keep = (F.pmod(F.xxhash64(self._order_col()), F.lit(1_000_000))
                < int(p * 1_000_000))
        return self._new(self.df.filter(keep))

    def identity(self) -> "Traversal":
        return self

    # -- adjacency steps ----------------------------------------------

    def _carries(self) -> list[str]:
        return [c for c in self.df.columns
                if c.startswith("__as_")
                or c in ("__sack", "__loc", "__loops")]

    def _hop(self, direction: str, labels: tuple[str, ...]) -> "Traversal":
        self._require("V")
        adj = self.graph.adj(direction, list(labels) or None) \
            .select(F.col("src").alias("id"), "dst")
        carry = self._carries()
        stepped = (self.df.select("id", "path", *carry).join(adj, on="id")
                   .select(F.col("dst").alias("id"),
                           F.concat(F.col("path"), F.array(F.col("dst")))
                           .alias("path"), *carry))
        # an order().by(prop) spec references columns the hop
        # projection drops — keeping it crashed a later limit/tail
        # (review r06); TinkerPop ordering doesn't survive a hop
        # anyway (the hop's output is a new traverser stream)
        return self._new(stepped, attached=False, sort=None)

    def out(self, *labels: str) -> "Traversal":
        return self._hop(OUT, labels)

    def in_(self, *labels: str) -> "Traversal":
        return self._hop(IN, labels)

    def both(self, *labels: str) -> "Traversal":
        return self._hop(BOTH, labels)

    def _hopE(self, direction: str, labels: tuple[str, ...]) -> "Traversal":
        self._require("V")
        adj = self.graph.adj(direction, list(labels) or None)
        carry = self._carries()
        e = (self.df.select(F.col("id").alias("anchor"), "path", *carry)
             .join(adj, on=F.col("anchor") == adj.src)
             .select("anchor", F.col("dst").alias("other"),
                     F.col("label"), F.col("sort_values"), F.col("dir"),
                     "path", *carry))
        # edge identity mirrors EdgeId splicing in the edge's PHYSICAL
        # orientation (src>label>sort>dst, core/backend/id/EdgeId.java
        # :31-38) — an anchor-oriented id gave the same edge two
        # different ids via bothE (dedup counted it twice) and inE
        # rows never matched hasId() (review r06)
        phys_src = F.when(F.col("dir") == "OUT",
                          F.col("anchor")).otherwise(F.col("other"))
        phys_dst = F.when(F.col("dir") == "OUT",
                          F.col("other")).otherwise(F.col("anchor"))
        eid = F.concat_ws(">>", phys_src, "label", "sort_values",
                          phys_dst)
        edges = self.graph.edges.select(
            F.col("src").alias("__psrc"), F.col("dst").alias("__pdst"),
            F.col("label").alias("__plbl"),
            F.col("sort_values").alias("__psort"), "props")
        # re-attach props through the PHYSICAL orientation recorded by
        # the adj view's dir column (an OR-match would duplicate rows
        # when both a→b and b→a physical edges exist)
        cond = ((F.col("label") == F.col("__plbl"))
                & (F.col("sort_values") == F.col("__psort"))
                & (phys_src == F.col("__psrc"))
                & (phys_dst == F.col("__pdst")))
        df = (e.join(edges, on=cond)
              .select("anchor", "other", "label", "sort_values", "props",
                      "dir", "path", eid.alias("eid"), *carry))
        t = self._new(df, kind="E")
        t._static_elabels = tuple(labels) if labels else None
        return t

    def outE(self, *labels: str) -> "Traversal":
        return self._hopE(OUT, labels)

    def inE(self, *labels: str) -> "Traversal":
        return self._hopE(IN, labels)

    def bothE(self, *labels: str) -> "Traversal":
        return self._hopE(BOTH, labels)

    def otherV(self) -> "Traversal":
        """The vertex at the far end of the traversed edge."""
        self._require("E")
        df = self.df.select(
            F.col("other").alias("id"),
            F.concat(F.col("path"), F.array(F.col("other"))).alias("path"),
            *self._carries())
        return self._new(df, kind="V", attached=False)

    def _edge_end(self, head: bool) -> "Traversal":
        """The edge's physical head (inV) or tail (outV) vertex —
        direction-independent TinkerPop semantics (review r06: both
        were aliased to otherV, so outE().outV() returned the far
        vertex instead of the anchor). The E frame's dir column
        records the physical orientation."""
        self._require("E")
        if head:
            col = F.when(F.col("dir") == "OUT",
                         F.col("other")).otherwise(F.col("anchor"))
        else:
            col = F.when(F.col("dir") == "OUT",
                         F.col("anchor")).otherwise(F.col("other"))
        df = self.df.select(
            col.alias("id"),
            F.concat(F.col("path"), F.array(col)).alias("path"),
            *self._carries())
        return self._new(df, kind="V", attached=False)

    def inV(self) -> "Traversal":
        return self._edge_end(head=True)

    def outV(self) -> "Traversal":
        return self._edge_end(head=False)

    # -- map steps -----------------------------------------------------

    def _loc_carry(self) -> list[str]:
        """Inside local() the origin ordinal must ride along the
        value-producing map steps; outside it the value stream stays
        single-column (oracle-stable schema)."""
        return ["__loc"] if "__loc" in self.df.columns else []

    def values(self, key: str) -> "Traversal":
        """Property values, typed through the schema registry.
        Elements MISSING the property emit no traverser (TinkerPop
        PropertiesStep; a NULL-valued traverser leaked into counts/
        dedup/aggregates — semantics review r06)."""
        t = self._elem() if self.kind == "V" else self
        return t._new(t.df.select(t._prop_col(key).alias("value"),
                                  *t._loc_carry())
                      .filter(F.col("value").isNotNull()),
                      kind="value", sort=None)

    def id_(self) -> "Traversal":
        self._require("V", "E")
        col = "id" if self.kind == "V" else "eid"
        return self._new(self.df.select(F.col(col).alias("value"),
                                        *self._loc_carry()),
                         kind="value")

    def label_(self) -> "Traversal":
        t = self._elem() if self.kind == "V" else self
        return t._new(t.df.select(F.col("label").alias("value"),
                                  *t._loc_carry()),
                      kind="value")

    def path(self) -> "Traversal":
        self._require("V")
        return self._new(self.df.select(
            F.array_join("path", ">").alias("value"),
            *self._loc_carry()), kind="value")

    def path_by(self, key: str) -> "Traversal":
        """path().by('prop') — the vertex trail projected through a
        property (TinkerPop path by-modulation, one modulator applied
        to every path element). Resolution is set-oriented: tag each
        traverser with an ordinal, posexplode the trail, ONE join
        against (id → props[key]), re-aggregate in position order —
        no driver loop, no per-element lookup. Missing properties
        render as '' (position-preserving; TinkerPop would throw).
        The tagging window is global — same bounded-stream caveat as
        range_/tail/local."""
        self._require("V")
        sort = [*self._sort_cols(), F.col("path")]
        tagged = self.df.withColumn(
            "__loc", F.row_number().over(Window.orderBy(*sort)))
        ex = tagged.select(
            "__loc", F.posexplode("path").alias("__p", "__vid"))
        props = self.graph.vertices.select(
            F.col("id").alias("__vid"), F.col("props")[key].alias("__v"))
        resolved = (
            ex.join(props, on="__vid", how="left")
            .groupBy("__loc")
            .agg(F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(
                        F.struct(F.col("__p"),
                                 F.coalesce("__v", F.lit(""))
                                 .alias("__v")))),
                    lambda s: s["__v"]), ">").alias("value")))
        out = (tagged.select("__loc", *self._loc_carry())
               .join(resolved, on="__loc").drop("__loc"))
        return self._new(out, kind="value")

    def as_(self, label: str) -> "Traversal":
        """Step label (Gremlin as()): records the CURRENT element id
        under the label; later where_label()/select() refer back to
        it. Labels ride the traversal as extra columns, so every hop
        carries them at zero shuffle cost."""
        self._require("V", "E")
        col = F.col("id") if self.kind == "V" else F.col("eid")
        return self._new(self.df.withColumn(f"__as_{label}", col))

    def where_label(self, op: str, label: str) -> "Traversal":
        """Gremlin where(P.eq('a')/P.neq('a')): compare the current
        element to a step label."""
        self._require("V", "E")
        cur = F.col("id") if self.kind == "V" else F.col("eid")
        ref = F.col(f"__as_{label}")
        cond = (cur == ref) if op == "eq" else (cur != ref)
        return self._new(self.df.filter(cond))

    def select(self, *labels: str, by: list | None = None) -> DataFrame:
        """Terminal select('a', 'b'): one column per step label (the
        labeled elements' ids). ``by`` modulators project each label
        through a property instead ('id'/'label'/None pass through)
        — TinkerPop round-robins the by() list across the labels."""
        if not by:
            return self.df.select(*[F.col(f"__as_{lab}").alias(lab)
                                    for lab in labels])
        pks = getattr(self.graph.schema, "property_keys", {}) \
            if self.graph.schema is not None else {}
        df = self.df
        outs = []
        for i, lab in enumerate(labels):
            key = by[i % len(by)]
            if key in (None, "id"):
                outs.append(F.col(f"__as_{lab}").alias(lab))
                continue
            v = self.graph.vertices.select(
                F.col("id").alias(f"__sid_{lab}"),
                F.col("label").alias(f"__sl_{lab}"),
                F.col("props").alias(f"__sp_{lab}"))
            df = df.join(v, on=F.col(f"__as_{lab}")
                         == F.col(f"__sid_{lab}"), how="left")
            if key == "label":
                outs.append(F.col(f"__sl_{lab}").alias(lab))
            else:
                c = F.col(f"__sp_{lab}")[key]
                if key in pks:
                    c = c.cast(pks[key].spark_type())
                outs.append(c.alias(lab))
        return df.select(*outs)

    def project(self, *selectors: tuple[str, str] | str) -> DataFrame:
        """Terminal project('a','b').by(...).by(...): one named column
        per selector. Each selector is (name, source) — source is a
        property key, 'id', or 'label' (the by() modulators of the
        text surface collapse into these pairs)."""
        t = self._elem() if self.kind == "V" else self
        cols = []
        for sel in selectors:
            name, src = sel if isinstance(sel, tuple) else (sel, sel)
            if src == "id":
                cols.append((F.col("id") if t.kind == "V"
                             else F.col("eid")).alias(name))
            elif src == "label":
                cols.append(F.col("label").alias(name))
            else:
                cols.append((t._prop_col(src) if t.kind == "V"
                             else F.col("props")[src]).alias(name))
        return t.df.select(*cols)

    def valueMap(self, *keys: str) -> "Traversal":
        """Element id + props map (all keys, or the selected subset)
        as a value-kind row per element."""
        t = self._elem() if self.kind == "V" else self
        idc = F.col("id") if t.kind == "V" else F.col("eid")
        props = F.col("props") if not keys else F.map_filter(
            F.col("props"), lambda k, _: k.isin(list(keys)))
        return t._new(t.df.select(idc.alias("id"),
                                  props.alias("value")), kind="value",
                      sort=None)

    def elementMap(self, *keys: str) -> "Traversal":
        """elementMap(): id + label + props (or the selected prop
        subset) as one map-valued row per element (TinkerPop 3.4+'s
        preferred flat projection)."""
        t = self._elem() if self.kind == "V" else self
        idc = F.col("id") if t.kind == "V" else F.col("eid")
        props = F.col("props") if not keys else F.map_filter(
            F.col("props"), lambda k, _: k.isin(list(keys)))
        value = F.map_concat(
            F.create_map(F.lit("id"), idc, F.lit("label"),
                         F.col("label")), props)
        return t._new(t.df.select(idc.alias("id"), value.alias("value")),
                      kind="value", sort=None)

    def properties(self, *keys: str) -> "Traversal":
        """properties([keys…]): one PROPERTY traverser per present
        property of each element (TinkerPop PropertiesStep) — rows
        carry the owning element id plus (key, value); ``key_()`` /
        ``value_()`` project them and the generic barriers apply per
        property traverser. A narrow explode of the (filtered) props
        map — no shuffle. Values surface as the props map's string
        encoding (the same raw form valueMap exposes)."""
        t = self._elem() if self.kind == "V" else self
        idc = F.col("id") if t.kind == "V" else F.col("eid")
        props = F.col("props") if not keys else F.map_filter(
            F.col("props"), lambda k, _: k.isin(list(keys)))
        return t._new(
            t.df.select(idc.alias("id"),
                        F.explode(props).alias("key", "value"),
                        *t._loc_carry()),
            kind="prop", sort=None)

    def hasKey(self, *keys: str) -> "Traversal":
        """hasKey(k…): keep property traversers whose key matches
        (TinkerPop HasStep over properties())."""
        self._require("prop")
        return self._new(self.df.filter(F.col("key").isin(list(keys))))

    def hasValue(self, *values) -> "Traversal":
        """hasValue(v…): keep property traversers whose value matches
        — typed through the value's Python type, same convention as
        has()."""
        self._require("prop")
        conds = [_typed(F.col("value"), v) == v for v in values]
        return self._new(self.df.filter(reduce(lambda a, b: a | b,
                                               conds)))

    def key_(self) -> "Traversal":
        """key(): the property traverser's key (TinkerPop KeyStep)."""
        self._require("prop")
        return self._new(self.df.select(F.col("key").alias("value"),
                                        *self._loc_carry()),
                         kind="value")

    def value_(self) -> "Traversal":
        """value(): the property traverser's value (ValueStep)."""
        self._require("prop")
        return self._new(self.df.select("value", *self._loc_carry()),
                         kind="value")

    def map_(self, step: Callable[["Traversal"], "Traversal"]
             ) -> "Traversal":
        """map(child): the child runs scoped per traverser and the
        FIRST child result becomes the traverser's new value
        (TinkerPop MapStep is 1:1; traversers whose child is empty
        drop). Compiled as local(child → scoped limit 1) — the same
        per-traverser window machinery, no extra shuffle beyond the
        child's own plan."""
        return self.local(lambda t: step(t).limit(1))

    def flatMap_(self, step: Callable[["Traversal"], "Traversal"]
                 ) -> "Traversal":
        """flatMap(child): child per traverser, ALL results emitted —
        barriers inside the child scope per traverser (TinkerPop
        FlatMapStep); without internal barriers this equals plain
        step chaining."""
        return self.local(step)

    def constant(self, v) -> "Traversal":
        """constant(v): replace every traverser's value with v."""
        return self._new(self.df.select(F.lit(v).alias("value"),
                                        *self._loc_carry()),
                         kind="value", sort=None)

    def is_(self, value) -> "Traversal":
        """Gremlin is(): filter the current VALUE stream."""
        self._require("value")
        return self._new(self.df.filter(_pred(F.col("value"), value)))

    # -- sack / tree / subgraph / math / mid-traversal V --------------
    # (the ProcessBasicSuite stragglers, test/tinkerpop/
    # ProcessBasicSuite.java:110-198)

    _SACK_OPS = {"sum": lambda s, v: s + v,
                 "minus": lambda s, v: s - v,
                 "mult": lambda s, v: s * v,
                 "div": lambda s, v: s / v,
                 "max": F.greatest, "min": F.least,
                 "assign": lambda s, v: v}

    def sack_(self, op: str | None = None,
              by: str | None = None) -> "Traversal":
        """TinkerPop sack(): per-traverser accumulator. ``sack_()``
        emits the sack as a value stream; ``sack_(op, by_prop)``
        updates it from the current element's property (sack(mult)
        .by('weight') ⇒ sack_('mult', 'weight')). The sack rides the
        traversal as one extra column — hops carry it at zero shuffle
        cost (the same design as step labels)."""
        if "__sack" not in self.df.columns:
            raise TypeError("sack: traversal has no sack — start with "
                            "g.withSack(init)")
        if op is None:
            return self._new(self.df.select(F.col("__sack").alias("value")),
                             kind="value", sort=None)
        if op not in self._SACK_OPS:
            raise ValueError(f"sack: unknown operator {op!r}")
        if by is None:
            raise ValueError("sack: sack_(op) needs a by-property")
        t = self._elem() if self.kind == "V" else self
        val = t._prop_col(by) if t.kind == "V" else \
            F.col("props")[by].cast("double")
        upd = self._SACK_OPS[op](F.col("__sack"), val.cast("double"))
        return t._new(t.df.withColumn("__sack", upd))

    def store(self, key: str, by: str | None = None) -> "Traversal":
        """sideEffect store('x')[.by(prop)]: records the current value
        stream into a named bag (duplicates kept — TinkerPop BulkSet);
        ``cap('x')`` emits it. In batch evaluation store's lazy and
        aggregate's eager collection see the same full traverser set,
        so the two collapse to one operator (documented deviation —
        the distinction is an execution-order detail that only shows
        through mid-loop cap(), which TinkerPop itself discourages).
        ProcessBasicSuite.java:110-198 pins the family."""
        t = self
        if by is not None:
            if self.kind == "value":
                raise TypeError("store: by() needs an element stream")
            t = self._elem() if self.kind == "V" else self
            val = t._prop_col(by) if t.kind == "V" else F.col("props")[by]
        else:
            val = t._order_col()
        out = t._new(t.df)
        out._side = dict(t._side)
        # by(prop) on an element missing the property contributes
        # nothing to the bag (the values()-emits-nothing rule) — a
        # NULL row silently vanished at cap()'s collect_list, leaving
        # the side-effect table and the bag disagreeing on
        # cardinality (semantics review r06; TinkerPop throws here —
        # skip is our documented placeholder posture)
        out._side[key] = (t.df.select(val.alias("value"))
                          .filter(F.col("value").isNotNull()))
        return out

    def aggregate(self, key: str, by: str | None = None) -> "Traversal":
        """sideEffect aggregate('x') — see store(): the eager/lazy
        distinction collapses under batch evaluation."""
        return self.store(key, by)

    def cap(self, key: str) -> "Traversal":
        """cap('x'): emit the side-effect bag as ONE traverser
        carrying the whole collection (sorted array — deterministic
        stand-in for TinkerPop's unordered BulkSet)."""
        if key not in self._side:
            raise KeyError(f"cap: no side-effect {key!r}")
        df = self._side[key].agg(
            F.array_sort(F.collect_list("value")).alias("value"))
        return self._new(df, kind="value", attached=False, sort=None)

    def barrier(self) -> "Traversal":
        """barrier(): a no-op here — Spark batch evaluation is already
        bulk-synchronous at every shuffle boundary; TinkerPop's
        bulking/stalling is an execution-strategy detail with no
        result-semantics impact."""
        return self

    def local(self, step: Callable[["Traversal"], "Traversal"]
              ) -> "Traversal":
        """branch local(child): the child runs scoped per incoming
        traverser — barriers inside (count/limit/range/tail/dedup/
        fold/sum/mean/max/min/sample) apply per-traverser, not
        globally: local(out().limit(1)) is first-neighbor-per-vertex;
        local(outE().count()) is per-vertex degree, emitting 0 for
        edge-less vertices (TinkerPop CountLocalStep contract).
        Implemented by tagging each traverser with an ordinal and
        running the child on a scoped subclass whose barrier steps
        partition by it; the tagging window is global — the same
        bounded-stream caveat as range_/tail."""
        sort = [*self._sort_cols()]
        if "path" in self.df.columns:
            sort.append(F.col("path"))
        w = Window.orderBy(*sort)
        tagged = self.df.withColumn("__loc", F.row_number().over(w))
        lt = _LocalTraversal(self.graph, tagged, self.kind,
                             self._attached, self._sort)
        lt._side = self._side
        lt._loc_base = tagged.select("__loc").distinct()
        out = step(lt)
        if not isinstance(out, Traversal):
            raise TypeError("local: the child must end in a traversal "
                            "step (reducers return traversals inside "
                            "local)")
        res = Traversal(self.graph, out.df.drop("__loc"), out.kind,
                        out._attached, out._sort)
        res._side = out._side
        return res

    def tree(self) -> DataFrame:
        """Terminal tree(): the traversers' paths aggregated into a
        prefix tree, flattened set-orientedly as one row per DISTINCT
        path prefix — (path, parent, element, depth). Two traversers
        reaching one vertex through different prefixes yield distinct
        tree nodes (TinkerPop tree identity). Pure
        transform/explode/distinct — no driver recursion."""
        self._require("V")
        pfx = F.transform(F.sequence(F.lit(1), F.size("path")),
                          lambda i: F.slice(F.col("path"), F.lit(1), i))
        rows = self.df.select(F.explode(pfx).alias("p"))
        return (rows.select(
            F.array_join("p", ">").alias("path"),
            F.element_at("p", -1).alias("element"),
            (F.size("p") - 1).alias("depth"),
            F.when(F.size("p") > 1,
                   F.array_join(F.slice(F.col("p"), F.lit(1),
                                        F.size("p") - 1), ">"))
            .alias("parent"))
            .distinct())

    def subgraph(self) -> PropertyGraph:
        """Terminal subgraph(): the edge-induced subgraph of the
        current E-stream as a fully functional PropertyGraph (the
        TinkerPop subgraph() side-effect; the reference exposes it via
        SubgraphStrategy). Distinct physical edges + their endpoint
        vertices; all operators/algorithms run on the result
        unchanged."""
        self._require("E")
        phys_src = F.when(F.col("dir") == "OUT",
                          F.col("anchor")).otherwise(F.col("other"))
        phys_dst = F.when(F.col("dir") == "OUT",
                          F.col("other")).otherwise(F.col("anchor"))
        e = (self.df.select(phys_src.alias("src"), phys_dst.alias("dst"),
                            "label", "sort_values", "props")
             .dropDuplicates(["src", "dst", "label", "sort_values"]))
        ids = (e.select(F.col("src").alias("id"))
               .unionByName(e.select(F.col("dst").alias("id"))).distinct())
        v = self.graph.vertices.join(ids, on="id", how="left_semi")
        return PropertyGraph(self.graph.spark, v, e,
                             schema=self.graph.schema)

    _MATH_FNS = {"abs": F.abs, "ceil": F.ceil, "floor": F.floor,
                 "sqrt": F.sqrt, "exp": F.exp, "log": F.log,
                 "sin": F.sin, "cos": F.cos, "tan": F.tan,
                 "signum": F.signum}

    def math_(self, expr: str) -> "Traversal":
        """TinkerPop math() over the value stream: `_` is the current
        value; + - * / % with normal precedence, parentheses, and the
        one-arg functions abs/ceil/floor/sqrt/exp/log/sin/cos/tan/
        signum. Compiles to one Column expression — stays in
        whole-stage codegen."""
        self._require("value")
        col = _compile_math(expr, F.col("value").cast("double"))
        return self._new(self.df.select(
            F.round(col, 6).alias("value")))

    def V_(self, *ids: str) -> "Traversal":
        """Mid-traversal V(): each incoming traverser continues to
        every vertex (or the given ids) — TinkerPop's cartesian
        restart; path and carried labels/sack are preserved. The id
        list compiles to a pushed IN filter; the unrestricted form is
        an explicit cross join (as in Gremlin, where mid-traversal
        V() is a deliberate full restart)."""
        self._require("V", "E")
        v = self.graph.vertices.select(F.col("id").alias("__nv"))
        if ids:
            v = v.filter(F.col("__nv").isin(list(ids)))
        carry = self._carries()
        df = (self.df.select("path", *carry).crossJoin(v)
              .select(F.col("__nv").alias("id"),
                      F.concat(F.col("path"), F.array(F.col("__nv")))
                      .alias("path"), *carry))
        return self._new(df, kind="V", attached=False)

    def inject(self, *values) -> "Traversal":
        """Append literal values to the value stream."""
        self._require("value")
        lit = self.df.sparkSession.createDataFrame(
            [(v,) for v in values], self.df.schema)
        return self._new(self.df.unionByName(lit))

    # -- branch steps --------------------------------------------------

    def choose(self, pred: Callable[[DataFrame], Column],
               then_step: Callable[["Traversal"], "Traversal"],
               else_step: Callable[["Traversal"], "Traversal"]
               ) -> "Traversal":
        """Per-traverser branch: rows satisfying ``pred`` flow through
        ``then_step``, the rest through ``else_step`` (union of the two
        filtered branch plans — still one Catalyst tree)."""
        # NULL predicate (e.g. has() on a missing property) takes the
        # ELSE branch like TinkerPop — bare filter(pred)/filter(~pred)
        # dropped such traversers from BOTH branches (review r06;
        # branch() already coalesces)
        p = F.coalesce(pred(self.df), F.lit(False))
        a = then_step(self._new(self.df.filter(p)))
        b = else_step(self._new(self.df.filter(~p)))
        # reducing terminals inside a branch yield DataFrames — wrap
        # like branch()/union() (semantics review r06)
        a, b = [x if isinstance(x, Traversal) else self._new(
            x.select(F.col(x.columns[0]).alias("value")),
            kind="value", attached=False, sort=None) for x in (a, b)]
        if a.kind != b.kind:
            raise TypeError(f"choose branches disagree: {a.kind}/{b.kind}")
        a, b = _align_branches(a, b)
        return a._new(a.df.unionByName(b.df))

    def branch(self, selector: Callable[[DataFrame], Column],
               options: list[tuple],
               none: Callable[["Traversal"], "Traversal"] | None = None,
               any_step: Callable[["Traversal"], "Traversal"] | None
               = None) -> "Traversal":
        """``branch(fn).option(v, step)…`` — N-way per-traverser
        dispatch (TinkerPop BranchStep; the reference pins it through
        the tinkerpop suite, test/tinkerpop/ProcessBasicSuite.java).
        ``selector`` maps the traverser DataFrame to a token Column;
        each ``(value, step)`` option takes the traversers whose token
        equals the value (typed through the same coercion as has());
        ``none`` takes the traversers matching NO option value
        (Pick.none); ``any_step`` additionally takes EVERY traverser
        (Pick.any). Compiles to filtered branch plans unioned into one
        Catalyst tree — the N-way generalization of choose(); adds no
        shuffle beyond the branch steps themselves."""
        if not options and none is None and any_step is None:
            raise ValueError("branch: no options")
        tok = selector(self.df)
        conds = [_typed(tok, v) == F.lit(v) for v, _ in options]
        parts = [step(self._new(self.df.filter(c)))
                 for (_, step), c in zip(options, conds)]
        if none is not None:
            hit = reduce(lambda a, b: a | b, conds, F.lit(False))
            parts.append(none(self._new(
                self.df.filter(~F.coalesce(hit, F.lit(False))))))
        if any_step is not None:
            parts.append(any_step(self))
        # a reducing terminal inside an option (count()/sum()/…)
        # yields a DataFrame — in TinkerPop that's a barrier emitting
        # one traverser, so wrap it back into a value stream
        parts = [p if isinstance(p, Traversal) else self._new(
            p.select(F.col(p.columns[0]).alias("value")),
            kind="value", attached=False, sort=None) for p in parts]
        kinds = {p.kind for p in parts}
        if len(kinds) != 1:
            raise TypeError(f"branch options disagree on kind: {kinds}")
        first = parts[0]
        for p in parts[1:]:
            first, p = _align_branches(first, p)
            first = first._new(first.df.unionByName(p.df))
        return first

    def coalesce(self, *steps: Callable[["Traversal"], "Traversal"]
                 ) -> "Traversal":
        """TinkerPop coalesce is PER-TRAVERSER: each incoming
        traverser takes the FIRST child that yields output FOR IT
        (the old form picked the first globally-non-empty branch, so
        one vertex with a 'knows' edge silenced every edge-less
        vertex's fallback — semantics review r06). Children run on
        the local() ordinal machinery; unsatisfied traversers
        anti-join forward to the next child. Fully lazy — no
        per-branch count() action."""
        if not steps:
            raise ValueError("coalesce: no branches")
        sort = [*self._sort_cols()]
        if "path" in self.df.columns:
            sort.append(F.col("path"))
        w = Window.orderBy(*sort)
        remaining = self.df.withColumn("__loc", F.row_number().over(w))
        parts: list[Traversal] = []
        for step in steps:
            lt = _LocalTraversal(self.graph, remaining, self.kind,
                                 self._attached, self._sort)
            lt._side = self._side
            lt._loc_base = remaining.select("__loc").distinct()
            out = step(lt)
            if not isinstance(out, Traversal):
                raise TypeError("coalesce: children must end in a "
                                "traversal step")
            parts.append(out)
            hit = out.df.select("__loc").distinct()
            remaining = remaining.join(hit, on="__loc",
                                       how="left_anti")
        kinds = {p.kind for p in parts}
        if len(kinds) != 1:
            raise TypeError(f"coalesce branches disagree on kind: "
                            f"{kinds}")
        first = parts[0]
        for p in parts[1:]:
            first, p = _align_branches(first, p)
            first = first._new(first.df.unionByName(p.df))
        res = Traversal(self.graph, first.df.drop("__loc"), first.kind,
                        first._attached, first._sort)
        res._side = first._side
        return res

    def optional(self, step: Callable[["Traversal"], "Traversal"]
                 ) -> "Traversal":
        """Per-traverser: step's result where it yields output, the
        incoming traverser unchanged where it doesn't."""
        return self.coalesce(step, lambda t: t)

    def repeat(self, step: Callable[["Traversal"], "Traversal"],
               times: int) -> "Traversal":
        """repeat(...).times(n) — bounded unrolled loop (the
        reference's RepeatStep is also bounded by max depth). The
        body sees the completed-iteration count as the hidden
        ``__loops`` column (TinkerPop ``loops()`` — usable in body
        filters, e.g. ``t.where(lambda df: F.col('__loops') < 2)``);
        dropped on exit, as TinkerPop resets the counter."""
        t = self
        for i in range(times):
            t = step(t._new(t.df.withColumn("__loops", F.lit(i))))
        return t._new(t.df.drop("__loops"))

    def repeat_emit(self, step: Callable[["Traversal"], "Traversal"],
                    times: int, emit_first: bool = False) -> "Traversal":
        """repeat(...).emit().times(n): the union of every round's
        traversers (TinkerPop emit-after semantics; ``emit_first``
        gives emit-before, which also emits the incoming traversers).
        One Catalyst plan — the per-round frontiers union up. The
        body sees ``__loops`` (see repeat())."""
        t = self
        outs: list[Traversal] = [self] if emit_first else []
        for i in range(times):
            t = step(t._new(t.df.withColumn("__loops", F.lit(i))))
            outs.append(t._new(t.df.drop("__loops")))
        first = outs[0]
        for p in outs[1:]:
            first, p = _align_branches(first, p)
            first = first._new(first.df.unionByName(p.df))
        return first

    def repeat_until(self, step: Callable[["Traversal"], "Traversal"],
                     until: Callable[[DataFrame], Column],
                     max_times: int = 32,
                     capacity: int = 10_000_000,
                     emit: bool = False) -> "Traversal":
        """repeat(...).until(pred): traversers satisfying ``until``
        leave the loop; the rest take another step. Bounded by
        ``max_times`` (the reference's RepeatStep is likewise depth-
        guarded; TinkerPop's unbounded until() on a cyclic graph
        doesn't terminate either) and by ``capacity`` live traversers
        per round — Gremlin repeat has NO path dedup, so a cyclic
        subgraph multiplies traversers without bound; the guard turns
        that divergence into the reference's CapacityExceeded instead
        of a melted cluster (HugeTraverser.checkCapacity posture).
        Emitted = the union of the stopped traversers across rounds.

        repeat(X).until(P) is DO-WHILE in TinkerPop (until-after
        syntax): the first step runs BEFORE the first predicate
        check, so a start traverser already satisfying P still takes
        one step (r03 advice fix — the while-do form would emit it
        with zero steps).

        ``emit=True`` is the repeat(X).emit().until(P) combination:
        every round's traversers are emitted (TinkerPop emit-after),
        not just the ones the predicate stops — the continuing set
        still leaves the loop on P, so termination is unchanged."""
        from incubator_hugegraph_spark.graph import (CapacityExceeded,
                                                     checkpointed)
        # do-while: step precedes the first check; the until predicate
        # additionally sees the completed-iteration count as __loops
        # (TinkerPop until(loops().is(n)) spelling:
        # lambda df: F.col("__loops") >= n)
        t = step(self._new(self.df.withColumn("__loops", F.lit(0))))
        done: list[Traversal] = []
        for r in range(max_times):
            t = t._elem() if t.kind == "V" else t  # preds may need props
            t = t._new(t.df.withColumn("__loops", F.lit(r + 1)))
            # per-round lineage cut — without it the k-round
            # filter/join chain builds an O(k)-deep plan and each
            # round's emptiness probe re-executes it from the source
            # (the iterate_hygiene lesson from the BFS kernel)
            t = t._new(checkpointed(t.df))
            # NULL predicate (missing property) = NOT satisfied →
            # keep looping; bare filter(p)/filter(~p) dropped such
            # traversers from BOTH sets (semantics review r06, same
            # class as the choose() fix)
            pred = F.coalesce(until(t.df), F.lit(False))
            if emit:
                done.append(t._new(t.df.drop("__loops")))
            else:
                done.append(
                    t._new(t.df.filter(pred).drop("__loops")))
            t = t._new(t.df.filter(~pred))
            n = t.df.count()
            if n == 0:
                break
            if n > capacity:
                raise CapacityExceeded(
                    f"repeat/until: {n} live traversers > capacity "
                    f"{capacity} (cyclic expansion?)")
            t = step(t)
        else:
            # loop exhausted max_times: traversers still running are
            # dropped (TinkerPop would keep looping; the guard is the
            # documented deviation)
            pass
        first = done[0]
        for p in done[1:]:
            first, p = _align_branches(first, p)
            first = first._new(first.df.unionByName(p.df))
        return first

    def union(self, *steps: Callable[["Traversal"], "Traversal"]
              ) -> "Traversal":
        parts = [step(self) for step in steps]
        # a reducing terminal inside a branch (count()/sum_()/…)
        # yields a DataFrame — wrap it back into a value stream, the
        # same barrier-emits-one-traverser rule branch() applies
        # (semantics review r06: AttributeError on .kind)
        parts = [p if isinstance(p, Traversal) else self._new(
            p.select(F.col(p.columns[0]).alias("value")),
            kind="value", attached=False, sort=None) for p in parts]
        kinds = {p.kind for p in parts}
        if len(kinds) != 1:
            raise TypeError(f"union branches disagree on kind: {kinds}")
        first = parts[0]
        for p in parts[1:]:
            first, p = _align_branches(first, p)
            first = first._new(first.df.unionByName(p.df))
        return first

    # -- order / range / sample ---------------------------------------

    def _order_col(self) -> Column:
        if self.kind == "prop":
            # property traversers order/sample/group by their full
            # (element, key, value) identity (review r06: KeyError)
            return F.concat_ws("\x1f", F.col("id"), F.col("key"),
                               F.col("value").cast("string"))
        return F.col({"V": "id", "E": "eid", "value": "value"}[self.kind])

    def order_by(self, key: str | None = None,
                 asc: bool = True) -> "Traversal":
        """order().by(...) — typed by the schema registry; the id is
        always the final tie-break so downstream limit/range_/tail
        stay deterministic. Elements MISSING the property sort first
        ascending (Spark NULLS FIRST) — TinkerPop's
        ElementValueComparator throws instead; sorting them is the
        same documented placeholder posture as path().by() (review
        r06)."""
        return self.order_by_specs([(key, asc)])

    def order_by_specs(self, specs: list) -> "Traversal":
        """Multi-key TinkerPop ordering — order().by(a).by(b, desc)…
        as [(key, asc), …]; keys compare earlier-by-first like the
        reference's ChainedComparator, id is the final tie-break."""
        t = self._elem() if (self.kind == "V"
                             and any(k for k, _ in specs)) else self
        spec = [((t._order_col() if k is None else t._prop_col(k)), a)
                for k, a in specs]
        spec.append((t._order_col(), True))
        return t._new(t.df.orderBy(*t._spec_cols(spec)), sort=spec)

    @staticmethod
    def _spec_cols(spec: list, reverse: bool = False) -> list:
        """(column, asc) pairs → SortOrder list, optionally reversed
        (tail = first-n under the inverted order)."""
        return [c.asc() if (a != reverse) else c.desc() for c, a in spec]

    def _sort_cols(self, reverse: bool = False) -> list:
        spec = self._sort if self._sort is not None \
            else [(self._order_col(), True)]
        return self._spec_cols(spec, reverse)

    def limit(self, n: int) -> "Traversal":
        """First n under the explicit order (after order_by) or under
        deterministic id order — Spark plans TakeOrderedAndProject."""
        return self._new(self.df.orderBy(*self._sort_cols()).limit(n))

    def range_(self, lo: int, hi: int) -> "Traversal":
        w = Window.orderBy(*self._sort_cols())
        return self._new(self.df.withColumn("__rn", F.row_number().over(w))
                         .filter((F.col("__rn") > lo)
                                 & (F.col("__rn") <= hi)).drop("__rn"))

    def tail(self, n: int) -> "Traversal":
        w = Window.orderBy(*self._sort_cols(reverse=True))
        return self._new(self.df.withColumn("__rn", F.row_number().over(w))
                         .filter(F.col("__rn") <= n).drop("__rn"))

    def sample(self, n: int) -> "Traversal":
        """Deterministic hash-ranked sample (reproducible coin/sample)."""
        w = Window.orderBy(F.xxhash64(self._order_col()),
                           self._order_col())
        return self._new(self.df.withColumn("__rn", F.row_number().over(w))
                         .filter(F.col("__rn") <= n).drop("__rn"))

    # -- terminal aggregations (return DataFrames) --------------------

    def count(self) -> DataFrame:
        return self.df.agg(F.count(F.lit(1)).alias("cnt"))

    def group(self, key: str | None = None, agg: str = "collect",
              value_key: str | None = None) -> DataFrame:
        """group().by(key).by(valueAgg): (key, value). ``key`` is a
        property name, 'label', or None (the element id); ``agg`` is
        count / sum / mean / min / max / collect (sorted id or
        value list — Gremlin's default group-into-lists, made
        deterministic). ``value_key`` names the property the numeric
        aggs and collect read (defaults to the element id for
        collect)."""
        t = self._elem() if self.kind == "V" else self
        if key is None:
            kcol = t._order_col()
        elif key == "label":
            kcol = F.col("label")
        else:
            kcol = (t._prop_col(key) if t.kind == "V"
                    else F.col("props")[key])
        if value_key is None:
            vcol = t._order_col()
        elif t.kind == "V":
            vcol = t._prop_col(value_key)
        else:
            vcol = F.col("props")[value_key]
        if agg == "collect":
            acol = F.array_sort(F.collect_list(vcol))
        elif agg == "count":
            acol = F.count(F.lit(1))
        else:
            f = {"sum": F.sum, "mean": F.avg,
                 "min": F.min, "max": F.max}[agg]
            acol = F.round(f(vcol.cast("double")), 6)
        # elements missing the group-key property are SKIPPED (no
        # NULL-key group; TinkerPop throws — skip is the documented
        # placeholder posture, and it keeps count vs collect
        # cardinalities consistent; semantics review r06)
        return (t.df.filter(kcol.isNotNull())
                .groupBy(kcol.alias("key"))
                .agg(acol.alias("value")))

    def groupCount(self, key: str | None = None) -> DataFrame:
        """(key, cnt); key=None groups by the current element id
        (groupCount()), key='label' by label (…by(T.label)), else by
        the named property (…by('prop'))."""
        if key is None:
            col = self._order_col().alias("key")
            return self.df.groupBy(col).agg(F.count(F.lit(1)).alias("cnt"))
        t = self._elem() if self.kind == "V" else self
        col = F.col("label") if key == "label" else F.col("props")[key]
        # missing-property elements skipped — see group() (review r06)
        return (t.df.filter(col.isNotNull())
                .groupBy(col.alias("key"))
                .agg(F.count(F.lit(1)).alias("cnt")))

    def _num(self) -> Column:
        self._require("value")
        return F.col("value").cast("double")

    # the numeric reducers emit NO traverser for an empty stream
    # (TinkerPop reducing-barrier contract; a phantom one-row NULL
    # aggregate leaked — semantics review r06). count()/fold() keep
    # their own defined empty results (0 / []).

    def sum_(self) -> DataFrame:
        return (self.df.agg(F.round(F.sum(self._num()), 6)
                            .alias("value"))
                .filter(F.col("value").isNotNull()))

    def mean_(self) -> DataFrame:
        return (self.df.agg(F.round(F.avg(self._num()), 6)
                            .alias("value"))
                .filter(F.col("value").isNotNull()))

    def max_(self) -> DataFrame:
        return (self.df.agg(F.max(self._num()).alias("value"))
                .filter(F.col("value").isNotNull()))

    def min_(self) -> DataFrame:
        return (self.df.agg(F.min(self._num()).alias("value"))
                .filter(F.col("value").isNotNull()))

    def fold(self) -> DataFrame:
        """Single-row sorted array of the current values."""
        self._require("value")
        return self.df.agg(F.array_sort(F.collect_list("value"))
                           .alias("value"))

    # -- write steps (addV/addE/property/drop) -------------------------
    #
    # The reference's Gremlin surface is also its primary data-entry
    # API (g.addV('person').property('name', …) — the TinkerPop
    # GraphTraversalSource write steps, executed there through
    # GraphTransaction). Here they compile onto the same batch mutate
    # layer as the Cypher write clauses (operators/mutate.py):
    # upserts shuffle once on the identity key, DELETE anti-joins.
    # Mutations rebind graph.vertices/graph.edges and refresh typed
    # views; readers holding old DataFrames keep the old snapshot.

    def property(self, key: str, value) -> "Traversal":
        """g.V(…).property(k, v): set the property on every current
        vertex traverser (one batch upsert — the TinkerPop
        PropertyStep on matched elements). Schema-strict like the
        Cypher SET path when the traversal is label-homogeneous.
        E-kind traversals (g.V().outE().property(k, v)) rewrite the
        matched physical edges' maps in place — the edge twin of the
        vertex upsert, keyed on the EdgeId quadruple (r05, parity
        with Cypher SET on relationship variables)."""
        if self.kind == "E":
            g = self.graph
            sch = getattr(g, "schema", None)
            if sch is not None and getattr(sch, "edge_labels", None):
                # schema-strict like the Cypher rel-SET path
                # (undeclared keys rejected; sort keys are immutable,
                # they ARE the edge's identity). Labels come from the
                # outE/inE step's STATIC argument when present — no
                # Spark job; only a label-unconstrained frame pays one
                # tiny distinct collect
                static = getattr(self, "_static_elabels", None)
                labs = list(static) if static else \
                    [r[0] for r in
                     self.df.select("label").distinct().collect()]
                for lab in labs:
                    el = sch.edge_labels.get(lab)
                    if el is None or not getattr(el, "properties", None):
                        continue
                    if key in set(getattr(el, "sort_keys", ()) or ()):
                        raise ValueError(
                            f"gremlin: sort key {key!r} of edge label "
                            f"{lab!r} is immutable (part of the edge "
                            "id)")
                    if key not in el.properties:
                        raise ValueError(
                            f"gremlin: property {key!r} is not "
                            f"declared for edge label {lab!r}")
            keys = (self.df.select(
                F.concat_ws(
                    ">",
                    F.when(F.col("dir") == "OUT", F.col("anchor"))
                    .otherwise(F.col("other")),
                    F.col("label"), F.col("sort_values"),
                    F.when(F.col("dir") == "OUT", F.col("other"))
                    .otherwise(F.col("anchor"))).alias("__k"))
                .distinct().withColumn("__hit", F.lit(True)))
            newval = F.map_concat(
                F.map_filter("props", lambda k, _v: k != F.lit(key)),
                F.create_map(F.lit(key), F.lit(str(value))))
            g.edges = (g.edges
                       .withColumn("__k", F.concat_ws(
                           ">", "src", "label", "sort_values", "dst"))
                       .join(keys, on="__k", how="left")
                       .withColumn("props",
                                   F.when(F.col("__hit").isNotNull(),
                                          newval)
                                   .otherwise(F.col("props")))
                       .drop("__k", "__hit"))
            if hasattr(g, "refresh_edge_views"):
                g.refresh_edge_views()
            # keep the in-flight traverser's props column consistent
            return self._new(self.df.withColumn(
                "props", F.map_concat(
                    F.map_filter("props", lambda k, _v: k != F.lit(key)),
                    F.create_map(F.lit(key), F.lit(str(value))))))
        self._require("V")
        from incubator_hugegraph_spark.operators.mutate import (
            upsert_vertices)
        g = self.graph
        t = self._elem()
        delta = (t.df.select(
            "id", "label",
            F.create_map(F.lit(key), F.lit(str(value))).alias("props"),
            F.lit(None).cast("timestamp").alias("expired_at"))
            .dropDuplicates(["id"]))
        g.vertices = upsert_vertices(g.vertices, delta)
        g.refresh_vertex_views()
        # element data is stale — re-attach lazily from the new table
        return self._new(self.df.select("id", "path", *self._carries()),
                         attached=False)

    def addE(self, label: str) -> "_AddE":
        """g.V(…).addE(label).to(target_id)[.property(k, v)…]: one new
        edge per incoming vertex traverser. ``to()``/``from_()`` take
        a vertex id (the anchored batch form); the builder flushes on
        iterate() or any further traversal step."""
        self._require("V")
        return _AddE(self, label)

    def drop(self) -> "Traversal":
        """drop(): remove the current elements from the graph —
        V-kind cascades to incident edges (the reference removes owner
        + both stored edge rows), E-kind removes the physical edges.
        Returns an empty traversal (TinkerPop drop filters all)."""
        g = self.graph
        if self.kind == "V":
            ids = self.df.select("id").distinct()
            g.edges = (g.edges
                       .join(ids.withColumnRenamed("id", "src"),
                             on="src", how="left_anti")
                       .join(ids.withColumnRenamed("id", "dst"),
                             on="dst", how="left_anti"))
            g.vertices = g.vertices.join(ids, on="id", how="left_anti")
            g.refresh_vertex_views()
            g.refresh_edge_views()  # the cascade dropped edges (r06)
            return self._new(self.df.filter(F.lit(False)))
        if self.kind == "E":
            # eid is anchor-oriented; rebuild the physical edge key
            keys = (self.df.select(
                F.concat_ws(
                    ">",
                    F.when(F.col("dir") == "OUT", F.col("anchor"))
                    .otherwise(F.col("other")),
                    F.col("label"), F.col("sort_values"),
                    F.when(F.col("dir") == "OUT", F.col("other"))
                    .otherwise(F.col("anchor"))).alias("__k"))
                .distinct())
            cur = g.edges.withColumn(
                "__k", F.concat_ws(">", "src", "label", "sort_values",
                                   "dst"))
            g.edges = cur.join(keys, on="__k", how="left_anti") \
                .drop("__k")
            g.refresh_edge_views()  # typed views are stale (r06)
            return self._new(self.df.filter(F.lit(False)))
        raise TypeError("drop: value streams cannot be dropped")

    # -- terminal accessors -------------------------------------------

    def iterate(self) -> "Traversal":
        """TinkerPop iterate(): exhaust the traversal for its side
        effects. Writes here apply eagerly at the step (batch
        semantics), so this is the no-op terminal that keeps the
        reference's idiomatic `…property(k, v).iterate()` chains
        valid."""
        return self

    def toDF(self) -> DataFrame:
        if self.kind == "V":
            return self._elem().df.select("id", "label", "props")
        if self.kind == "E":
            return self.df.select("eid", "anchor", "other", "label",
                                  "sort_values", "props")
        return self.df

    def toList(self) -> list:
        return [r[0] for r in self.toDF().collect()]

    def explain(self, mode: str = "formatted") -> str:
        """TinkerPop ``explain()`` terminal step. The reference answers
        it with the TraversalExplanation strategy trace (ProcessBasicSuite
        registers ExplainTest; HugeGraph's strategies live in
        hugegraph-server/hugegraph-core/.../optimize/HugeGraphStepStrategy.java).
        Here the traversal 'strategies' ARE Catalyst rules, so the
        faithful analogue is the compiled Spark plan: the returned
        string shows pushed filters, pruned columns, join strategies
        and WholeStageCodegen spans — exactly what the reference's
        trace shows about has()-folding and step substitution.
        ``mode`` is any Spark explain mode (simple/extended/formatted/
        cost/codegen)."""
        from incubator_hugegraph_spark.plans import explain_string
        return explain_string(self.df, mode)

    def profile(self) -> DataFrame:
        """TinkerPop ``profile()`` terminal step (ProcessBasicSuite
        registers ProfileTest): EXECUTES the traversal once and returns
        per-operator metrics — the TraversalMetrics analogue built from
        Spark SQL metrics, one row per physical operator in execution
        order with its output-row count. Spark populates metrics only
        after an action, so this runs the plan (same contract as
        TinkerPop: profile() iterates the traversal). The plan-tree
        walk is driver-side metadata only — never data."""
        from incubator_hugegraph_spark.plans import profile_metrics
        df = self.toDF() if self.kind in ("V", "E") else self.df
        return profile_metrics(df)


class _LocalTraversal(Traversal):
    """Child scope of local(): barrier steps partition by the origin
    ordinal ``__loc``, and the reducing steps (count/sum/mean/max/min/
    fold) return VALUE-KIND TRAVERSALS — one result per origin
    traverser — instead of the outer class's terminal DataFrames."""

    _loc_base: DataFrame | None = None

    def _new(self, df: DataFrame, kind: str | None = None,
             attached: bool | None = None,
             sort: list | None | str = "keep") -> "Traversal":
        t = super()._new(df, kind, attached, sort)
        t._loc_base = self._loc_base
        return t

    def _loc_w(self, reverse: bool = False):
        return Window.partitionBy("__loc") \
            .orderBy(*self._sort_cols(reverse))

    def limit(self, n: int) -> "Traversal":
        return self._new(
            self.df.withColumn("__rn", F.row_number().over(self._loc_w()))
            .filter(F.col("__rn") <= n).drop("__rn"))

    def range_(self, lo: int, hi: int) -> "Traversal":
        return self._new(
            self.df.withColumn("__rn", F.row_number().over(self._loc_w()))
            .filter((F.col("__rn") > lo) & (F.col("__rn") <= hi))
            .drop("__rn"))

    def tail(self, n: int) -> "Traversal":
        return self._new(
            self.df.withColumn(
                "__rn", F.row_number().over(self._loc_w(reverse=True)))
            .filter(F.col("__rn") <= n).drop("__rn"))

    def sample(self, n: int) -> "Traversal":
        w = Window.partitionBy("__loc").orderBy(
            F.xxhash64(self._order_col()), self._order_col())
        return self._new(self.df.withColumn("__rn", F.row_number().over(w))
                         .filter(F.col("__rn") <= n).drop("__rn"))

    def dedup(self) -> "Traversal":
        if self.kind == "value":
            return self._new(self.df.dropDuplicates(["__loc", "value"]))
        if self.kind == "prop":
            # property traverser identity = (element, key) — the
            # fallback referenced a nonexistent eid/path (semantics
            # review r06; outer dedup was fixed, the local override
            # was not)
            return self._new(
                self.df.dropDuplicates(["__loc", "id", "key"]))
        key = "id" if self.kind == "V" else "eid"
        w = Window.partitionBy("__loc", key).orderBy("path")
        return self._new(self.df.withColumn("__rn", F.row_number().over(w))
                         .filter(F.col("__rn") == 1).drop("__rn"))

    def _loc_agg(self, acol: Column) -> "Traversal":
        return self._new(self.df.groupBy("__loc").agg(acol.alias("value")),
                         kind="value", attached=False, sort=None)

    def count(self) -> "Traversal":  # type: ignore[override]
        counts = self.df.groupBy("__loc") \
            .agg(F.count(F.lit(1)).alias("value"))
        assert self._loc_base is not None
        base = (self._loc_base.join(counts, on="__loc", how="left")
                .select("__loc",
                        F.coalesce("value", F.lit(0)).alias("value")))
        return self._new(base, kind="value", attached=False, sort=None)

    def sum_(self) -> "Traversal":  # type: ignore[override]
        return self._loc_agg(F.round(F.sum(self._num()), 6))

    def mean_(self) -> "Traversal":  # type: ignore[override]
        return self._loc_agg(F.round(F.avg(self._num()), 6))

    def max_(self) -> "Traversal":  # type: ignore[override]
        return self._loc_agg(F.max(self._num()))

    def min_(self) -> "Traversal":  # type: ignore[override]
        return self._loc_agg(F.min(self._num()))

    def fold(self) -> "Traversal":  # type: ignore[override]
        self._require("value")
        vt = self.df.schema["value"].dataType.simpleString()
        folded = self.df.groupBy("__loc").agg(
            F.array_sort(F.collect_list("value")).alias("value"))
        assert self._loc_base is not None
        base = (self._loc_base.join(folded, on="__loc", how="left")
                .select("__loc",
                        F.coalesce("value", F.array().cast(f"array<{vt}>"))
                        .alias("value")))
        return self._new(base, kind="value", attached=False, sort=None)


class _MathParser:
    """Recursive-descent arithmetic for the math() step."""

    _TOK = re.compile(
        r"\s*(\d+\.\d+|\d+|[+\-*/%()]|[A-Za-z_][A-Za-z0-9_]*)")

    def __init__(self, expr: str, cur: Column):
        self.toks = self._TOK.findall(expr)
        if "".join(self.toks).replace(" ", "") != expr.replace(" ", ""):
            raise SyntaxError(f"math: cannot tokenize {expr!r}")
        self.i, self.cur = 0, cur

    def peek(self) -> str | None:
        return self.toks[self.i] if self.i < len(self.toks) else None

    def take(self) -> str:
        t = self.peek()
        if t is None:
            raise SyntaxError("math: unexpected end of expression")
        self.i += 1
        return t

    def expr(self) -> Column:
        c = self.term()
        while self.peek() in ("+", "-"):
            op = self.take()
            c = c + self.term() if op == "+" else c - self.term()
        return c

    def term(self) -> Column:
        c = self.atom()
        while self.peek() in ("*", "/", "%"):
            op = self.take()
            r = self.atom()
            c = {"*": c * r, "/": c / r, "%": c % r}[op]
        return c

    def atom(self) -> Column:
        t = self.take()
        if t == "(":
            c = self.expr()
            if self.take() != ")":
                raise SyntaxError("math: unbalanced parentheses")
            return c
        if t == "_":
            return self.cur
        if t in Traversal._MATH_FNS:
            if self.take() != "(":
                raise SyntaxError(f"math: {t} needs parentheses")
            c = Traversal._MATH_FNS[t](self.expr())
            if self.take() != ")":
                raise SyntaxError("math: unbalanced parentheses")
            return c
        try:
            return F.lit(float(t))
        except ValueError:
            raise SyntaxError(f"math: bad token {t!r}") from None


def _compile_math(expr: str, cur: Column) -> Column:
    p = _MathParser(expr, cur)
    c = p.expr()
    if p.peek() is not None:
        raise SyntaxError(f"math: trailing input at {p.peek()!r}")
    return c


class _AddV:
    """Builder for ``g.addV(label).property(k, v)…`` — properties
    accumulate until the first non-property step (or iterate()), then
    ONE vertex is created through the batch mutate layer and the
    builder becomes a V-kind traversal seeded at the new id (TinkerPop
    addV returns the created-vertex traverser)."""

    def __init__(self, g: "G", label: str):
        self._g = g
        self._label = label
        self._props: dict = {}
        self._t: Traversal | None = None

    def property(self, key: str, value) -> "_AddV":
        if self._t is not None:
            raise TypeError("addV: property() after the create flushed")
        self._props[key] = value
        return self

    def _flush(self) -> Traversal:
        if self._t is not None:
            return self._t
        from incubator_hugegraph_spark.operators.mutate import (
            gen_vertex_id, upsert_vertices)
        graph = self._g.graph
        props = {k: str(v) for k, v in self._props.items()}
        vid = gen_vertex_id(graph.schema, self._label, props,
                            graph=graph)
        batch = graph.spark.createDataFrame(
            [(vid, self._label, props, None)],
            "id string, label string, props map<string,string>, "
            "expired_at timestamp")
        graph.vertices = upsert_vertices(graph.vertices, batch)
        graph.refresh_vertex_views({self._label})
        seed = graph.vertices.filter(F.col("id") == vid) \
            .select("id", "label", "props") \
            .withColumn("path", F.array(F.col("id")))
        self._t = Traversal(graph, seed, "V", attached=True)
        return self._t

    def iterate(self) -> Traversal:
        return self._flush()

    def __getattr__(self, name):
        # any traversal step flushes the create and delegates
        return getattr(self._flush(), name)


class _AddE:
    """Builder for ``….addE(label).to(vid)[.from_(vid)]
    [.property(k, v)…]`` — one edge per incoming vertex traverser,
    flushed through upsert_edges on the first non-builder step."""

    def __init__(self, t: Traversal, label: str):
        self._src_t = t
        self._label = label
        self._to: str | None = None
        self._from: str | None = None
        self._props: dict = {}
        self._t: Traversal | None = None

    def to(self, vid: str) -> "_AddE":
        self._to = self._check_endpoint(vid)
        return self

    def from_(self, vid: str) -> "_AddE":
        self._from = self._check_endpoint(vid)
        return self

    @staticmethod
    def _check_endpoint(vid: str) -> str:
        # endpoint ids land verbatim in the 4-part EdgeId splice —
        # a raw '>' or a trailing unpaired backslash would corrupt it
        # (code review r06; same rule as the REST edge door)
        from incubator_hugegraph_spark.schema import id_splice_safe
        ok, why = id_splice_safe(str(vid))
        if not ok:
            raise ValueError(f"Invalid edge endpoint id {vid!r}: {why}")
        return str(vid)

    def property(self, key: str, value) -> "_AddE":
        if self._t is not None:
            raise TypeError("addE: property() after the create flushed")
        self._props[key] = value
        return self

    def _flush(self) -> Traversal:
        if self._t is not None:
            return self._t
        from incubator_hugegraph_spark.operators.mutate import (
            upsert_edges)
        graph = self._src_t.graph
        sch = getattr(graph, "schema", None)
        el = sch.edge_labels.get(self._label) if sch else None
        sv = ""
        if el is not None and el.sort_keys:
            missing = [k for k in el.sort_keys if k not in self._props]
            if missing:
                # sort keys are part of the edge's IDENTITY — a
                # missing one would encode sv='' and collapse two
                # distinct edges onto one EdgeId (review r06; same
                # rule as the REST edge door)
                raise ValueError(
                    f"addE: the sort key {missing[0]!r} of edge label "
                    f"{self._label!r} is missing")
            from incubator_hugegraph_spark.functions.ids import (
                encode_sort_values)
            sv = encode_sort_values(
                self._props[k] for k in el.sort_keys)
        kvs = []
        for k, v in self._props.items():
            kvs += [F.lit(k), F.lit(str(v))]
        pm = F.create_map(*kvs) if kvs \
            else F.create_map().cast("map<string,string>")
        src = F.lit(self._from) if self._from is not None else F.col("id")
        dst = F.lit(self._to) if self._to is not None else F.col("id")
        if self._to is None and self._from is None:
            raise TypeError("addE: needs to() or from_()")
        batch = (self._src_t.df.select(
            src.alias("src"), dst.alias("dst"),
            F.lit(self._label).alias("label"),
            F.lit(sv).alias("sort_values"), pm.alias("props"),
            F.lit(None).cast("timestamp").alias("expired_at"))
            .dropDuplicates(["src", "dst"]))
        graph.edges = upsert_edges(graph.edges, batch)
        graph.edge_views.pop(self._label, None)
        eid = F.concat_ws(">>", "src", "label", "sort_values", "dst")
        df = batch.select(
            F.col("src").alias("anchor"), F.col("dst").alias("other"),
            "label", "sort_values", "props", F.lit("OUT").alias("dir"),
            F.array("src", "dst").alias("path"), eid.alias("eid"))
        self._t = Traversal(graph, df, "E", attached=True)
        return self._t

    def iterate(self) -> Traversal:
        return self._flush()

    def __getattr__(self, name):
        return getattr(self._flush(), name)


class G:
    """Traversal source — ``G(graph).V()`` / ``.E()``; ``withSack``
    seeds the per-traverser accumulator (TinkerPop
    GraphTraversalSource.withSack); ``addV`` starts a vertex-create
    builder (write steps §2.L map family)."""

    def __init__(self, graph: PropertyGraph, sack_init=None):
        self.graph = graph
        self._sack_init = sack_init

    def withSack(self, init) -> "G":
        return G(self.graph, sack_init=init)

    def addV(self, label: str) -> _AddV:
        return _AddV(self, label)

    def _seed_sack(self, df: DataFrame) -> DataFrame:
        if self._sack_init is None:
            return df
        return df.withColumn(
            "__sack", F.lit(self._sack_init).cast("double"))

    def V(self, *ids: str) -> Traversal:
        v = self.graph.vertices.select("id", "label", "props")
        if ids:
            v = v.filter(F.col("id").isin(list(ids)))
        df = self._seed_sack(v.withColumn("path", F.array(F.col("id"))))
        return Traversal(self.graph, df, "V", attached=True)

    def E(self, *labels: str) -> Traversal:
        e = self.graph.edges
        if labels:
            e = e.filter(F.col("label").isin(list(labels)))
        eid = F.concat_ws(">>", "src", "label", "sort_values", "dst")
        df = e.select(F.col("src").alias("anchor"),
                      F.col("dst").alias("other"), "label", "sort_values",
                      "props", F.lit("OUT").alias("dir"),
                      F.array("src", "dst").alias("path"),
                      eid.alias("eid"))
        return Traversal(self.graph, self._seed_sack(df), "E",
                         attached=True)
