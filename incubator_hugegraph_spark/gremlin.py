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
- repeat(...).times equivalent `repeat(step, n)` (branch), union,
  path/simplePath/cyclicPath (filter: path predicates on the carried
  vertex trail, `array_contains`-style checks in Column space).
- sample(n): deterministic hash-ranked sample (the reproducible form
  of Gremlin sample()/coin(), matching the `gremlin_sample` query).

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
        return tuple(t._new(t.df.select("id", "path"), attached=False)
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

    # -- plumbing ------------------------------------------------------

    def _new(self, df: DataFrame, kind: str | None = None,
             attached: bool | None = None,
             sort: list | None | str = "keep") -> "Traversal":
        return Traversal(self.graph, df,
                         kind if kind is not None else self.kind,
                         self._attached if attached is None else attached,
                         self._sort if sort == "keep" else sort)

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

    def has(self, key: str, value) -> "Traversal":
        t = self._elem() if self.kind == "V" else self
        return t._new(t.df.filter(_pred(F.col("props")[key], value)))

    def where(self, fn: Callable[[DataFrame], Column]) -> "Traversal":
        return self._new(self.df.filter(fn(self.df)))

    def dedup(self) -> "Traversal":
        if self.kind == "value":
            return self._new(self.df.dropDuplicates(["value"]))
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

    # -- adjacency steps ----------------------------------------------

    def _carries(self) -> list[str]:
        return [c for c in self.df.columns if c.startswith("__as_")]

    def _hop(self, direction: str, labels: tuple[str, ...]) -> "Traversal":
        self._require("V")
        adj = self.graph.adj(direction, list(labels) or None) \
            .select(F.col("src").alias("id"), "dst")
        carry = self._carries()
        stepped = (self.df.select("id", "path", *carry).join(adj, on="id")
                   .select(F.col("dst").alias("id"),
                           F.concat(F.col("path"), F.array(F.col("dst")))
                           .alias("path"), *carry))
        return self._new(stepped, attached=False)

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
        # edge identity mirrors EdgeId splicing (owner>label>sort>other,
        # core/backend/id/EdgeId.java:31-38)
        eid = F.concat_ws(">>", "anchor", "label", "sort_values", "other")
        edges = self.graph.edges.select(
            F.col("src").alias("__psrc"), F.col("dst").alias("__pdst"),
            F.col("label").alias("__plbl"),
            F.col("sort_values").alias("__psort"), "props")
        # re-attach props through the PHYSICAL orientation recorded by
        # the adj view's dir column (an OR-match would duplicate rows
        # when both a→b and b→a physical edges exist)
        phys_src = F.when(F.col("dir") == "OUT",
                          F.col("anchor")).otherwise(F.col("other"))
        phys_dst = F.when(F.col("dir") == "OUT",
                          F.col("other")).otherwise(F.col("anchor"))
        cond = ((F.col("label") == F.col("__plbl"))
                & (F.col("sort_values") == F.col("__psort"))
                & (phys_src == F.col("__psrc"))
                & (phys_dst == F.col("__pdst")))
        df = (e.join(edges, on=cond)
              .select("anchor", "other", "label", "sort_values", "props",
                      "path", eid.alias("eid"), *carry))
        return self._new(df, kind="E")

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

    inV = otherV   # after outE, the far vertex IS the in-vertex
    outV = otherV  # after inE, symmetric

    # -- map steps -----------------------------------------------------

    def values(self, key: str) -> "Traversal":
        """Property values, typed through the schema registry."""
        t = self._elem() if self.kind == "V" else self
        return t._new(t.df.select(t._prop_col(key).alias("value")),
                      kind="value", sort=None)

    def id_(self) -> "Traversal":
        self._require("V", "E")
        col = "id" if self.kind == "V" else "eid"
        return self._new(self.df.select(F.col(col).alias("value")),
                         kind="value")

    def label_(self) -> "Traversal":
        t = self._elem() if self.kind == "V" else self
        return t._new(t.df.select(F.col("label").alias("value")),
                      kind="value")

    def path(self) -> "Traversal":
        self._require("V")
        return self._new(self.df.select(
            F.array_join("path", ">").alias("value")), kind="value")

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

    def select(self, *labels: str) -> DataFrame:
        """Terminal select('a', 'b'): one column per step label (the
        labeled elements' ids)."""
        return self.df.select(*[F.col(f"__as_{lab}").alias(lab)
                                for lab in labels])

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

    def is_(self, value) -> "Traversal":
        """Gremlin is(): filter the current VALUE stream."""
        self._require("value")
        return self._new(self.df.filter(_pred(F.col("value"), value)))

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
        a = then_step(self._new(self.df.filter(pred(self.df))))
        b = else_step(self._new(self.df.filter(~pred(self.df))))
        if a.kind != b.kind:
            raise TypeError(f"choose branches disagree: {a.kind}/{b.kind}")
        a, b = _align_branches(a, b)
        return a._new(a.df.unionByName(b.df))

    def coalesce(self, *steps: Callable[["Traversal"], "Traversal"]
                 ) -> "Traversal":
        """First branch that yields any traverser (checked in order —
        each check is one count() action, so use for bounded branch
        lists, the Gremlin pattern)."""
        last = None
        for step in steps:
            last = step(self)
            if last.df.limit(1).count() > 0:
                return last
        if last is None:
            raise ValueError("coalesce: no branches")
        return last

    def optional(self, step: Callable[["Traversal"], "Traversal"]
                 ) -> "Traversal":
        """step's result if non-empty, else the incoming traversers."""
        return self.coalesce(step, lambda t: t)

    def repeat(self, step: Callable[["Traversal"], "Traversal"],
               times: int) -> "Traversal":
        """repeat(...).times(n) — bounded unrolled loop (the
        reference's RepeatStep is also bounded by max depth)."""
        t = self
        for _ in range(times):
            t = step(t)
        return t

    def union(self, *steps: Callable[["Traversal"], "Traversal"]
              ) -> "Traversal":
        parts = [step(self) for step in steps]
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
        return F.col({"V": "id", "E": "eid", "value": "value"}[self.kind])

    def order_by(self, key: str | None = None,
                 asc: bool = True) -> "Traversal":
        """order().by(...) — typed by the schema registry; the id is
        always the final tie-break so downstream limit/range_/tail
        stay deterministic."""
        t = self._elem() if (key and self.kind == "V") else self
        col = t._order_col() if key is None else t._prop_col(key)
        spec = [(col, asc), (t._order_col(), True)]
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

    def groupCount(self, key: str | None = None) -> DataFrame:
        """(key, cnt); key=None groups by the current element id
        (groupCount()), key='label' by label (…by(T.label)), else by
        the named property (…by('prop'))."""
        if key is None:
            col = self._order_col().alias("key")
            return self.df.groupBy(col).agg(F.count(F.lit(1)).alias("cnt"))
        t = self._elem() if self.kind == "V" else self
        col = F.col("label") if key == "label" else F.col("props")[key]
        return (t.df.groupBy(col.alias("key"))
                .agg(F.count(F.lit(1)).alias("cnt")))

    def _num(self) -> Column:
        self._require("value")
        return F.col("value").cast("double")

    def sum_(self) -> DataFrame:
        return self.df.agg(F.round(F.sum(self._num()), 6).alias("value"))

    def mean_(self) -> DataFrame:
        return self.df.agg(F.round(F.avg(self._num()), 6).alias("value"))

    def max_(self) -> DataFrame:
        return self.df.agg(F.max(self._num()).alias("value"))

    def min_(self) -> DataFrame:
        return self.df.agg(F.min(self._num()).alias("value"))

    def fold(self) -> DataFrame:
        """Single-row sorted array of the current values."""
        self._require("value")
        return self.df.agg(F.array_sort(F.collect_list("value"))
                           .alias("value"))

    # -- terminal accessors -------------------------------------------

    def toDF(self) -> DataFrame:
        if self.kind == "V":
            return self._elem().df.select("id", "label", "props")
        if self.kind == "E":
            return self.df.select("eid", "anchor", "other", "label",
                                  "sort_values", "props")
        return self.df

    def toList(self) -> list:
        return [r[0] for r in self.toDF().collect()]


class G:
    """Traversal source — ``G(graph).V()`` / ``.E()``."""

    def __init__(self, graph: PropertyGraph):
        self.graph = graph

    def V(self, *ids: str) -> Traversal:
        v = self.graph.vertices.select("id", "label", "props")
        if ids:
            v = v.filter(F.col("id").isin(list(ids)))
        df = v.withColumn("path", F.array(F.col("id")))
        return Traversal(self.graph, df, "V", attached=True)

    def E(self, *labels: str) -> Traversal:
        e = self.graph.edges
        if labels:
            e = e.filter(F.col("label").isin(list(labels)))
        eid = F.concat_ws(">>", "src", "label", "sort_values", "dst")
        df = e.select(F.col("src").alias("anchor"),
                      F.col("dst").alias("other"), "label", "sort_values",
                      "props", F.array("src", "dst").alias("path"),
                      eid.alias("eid"))
        return Traversal(self.graph, df, "E", attached=True)
