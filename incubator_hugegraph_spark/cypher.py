"""openCypher MATCH subset → DataFrame plans (SURVEY §3.3).

The reference exposes Cypher by translating it to Gremlin with the
openCypher-for-Gremlin library (api/api/cypher/CypherAPI.java:49-110;
api/opencypher/CypherOpProcessor.java:124-145 — CypherAst.parse →
gremlin steps). Our engine's declarative entry is Spark SQL over the
typed views; this module closes the remaining gap: a reference user's
actual Cypher read queries run verbatim, parsed here and compiled to
the same DataFrame joins the traverser operators use.

Supported grammar (the read-only core the reference's CypherApiTest
exercises — pattern match, property predicates, aggregation,
ordering):

    MATCH (a:label)-[:rel]->(b:label)-[:rel2]->(c) ...
    [WHERE a.prop <op> literal [AND ...]]
    RETURN [DISTINCT] item [AS alias] [, ...]
    [ORDER BY alias|item [ASC|DESC], ...] [SKIP n] [LIMIT n]

- Node: (var), (var:label). Relationship: -[:label]->, <-[:label]-,
  -[:label]- (BOTH), -[]-> (any label); multiple hops chain in one
  pattern; multiple comma-separated patterns join on shared vars.
- WHERE: comparisons =, <>, <, <=, >, >=, CONTAINS (word match,
  analyzer semantics), IN [..]; conjunctions with AND. Operands:
  var.prop, var (the vertex id), literals (number / 'string').
- RETURN items: var (→ its id), var.prop, id(var), label(var),
  count(x), count(DISTINCT x), sum/avg/min/max(var.prop), count(*).
  Aggregates trigger an implicit GROUP BY over the non-aggregated
  items (Cypher's aggregation rule).

Properties are typed through the schema registry (same rule as the
Gremlin DSL). The compiled plan is ordinary joins/filters/aggregates —
Catalyst pushes predicates into the scans exactly as §4.1 requires.
Writes (CREATE/SET/DELETE) are out of scope: mutation is the batch
MERGE surface (operators/mutate.py).
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from incubator_hugegraph_spark.graph import PropertyGraph

_TOKEN_RE = re.compile(r"""
    \s*(?:
      (?P<arrow><-|->|--|-|\[|\]|\(|\)|,|:|\.)
    | (?P<kw>(?i:MATCH|WHERE|RETURN|DISTINCT|ORDER|BY|SKIP|LIMIT|AND|ASC
              |DESC|AS|IN|CONTAINS|STARTS|WITH|NOT|IS|NULL|COUNT|SUM|AVG
              |MIN|MAX|ID|LABEL)\b)
    | (?P<num>-?\d+(?:\.\d+)?)
    | (?P<str>'(?:[^'\\]|\\.)*')
    | (?P<cmp><>|<=|>=|=|<|>|\*)
    | (?P<name>[A-Za-z_][A-Za-z0-9_]*)
    )""", re.X)


def _tokenize(q: str) -> list[tuple[str, str]]:
    out, i = [], 0
    q = q.strip()
    while i < len(q):
        m = _TOKEN_RE.match(q, i)
        if not m or m.end() == i:
            raise SyntaxError(f"cypher: cannot tokenize at {q[i:i+20]!r}")
        for g in ("arrow", "kw", "num", "str", "cmp", "name"):
            v = m.group(g)
            if v is not None:
                out.append((g if g != "kw" else v.upper(), v))
                break
        i = m.end()
    out.append(("EOF", ""))
    return out


@dataclass
class _Rel:
    src: str
    dst: str
    label: str | None
    direction: str  # OUT / IN / BOTH relative to src


@dataclass
class _Query:
    nodes: dict[str, str | None] = field(default_factory=dict)  # var→label
    rels: list[_Rel] = field(default_factory=list)
    where: list[tuple] = field(default_factory=list)
    returns: list[tuple] = field(default_factory=list)
    distinct: bool = False
    order: list[tuple] = field(default_factory=list)  # (expr, asc)
    skip: int = 0
    limit: int | None = None


class _Parser:
    def __init__(self, toks: list[tuple[str, str]]):
        self.toks, self.i = toks, 0

    def peek(self) -> tuple[str, str]:
        return self.toks[self.i]

    def next(self, *want: str) -> tuple[str, str]:
        t = self.toks[self.i]
        if want and t[0] not in want:
            raise SyntaxError(f"cypher: expected {want}, got {t}")
        self.i += 1
        return t

    def accept(self, kind: str) -> bool:
        if self.peek()[0] == kind:
            self.i += 1
            return True
        return False

    def _name(self) -> str:
        """Identifier — keywords double as identifiers where the
        grammar expects a name (the fixture's own vertex label is
        `order`)."""
        t = self.next()
        if t[0] == "name" or t[0].isalpha() and t[0].isupper():
            return t[1]
        raise SyntaxError(f"cypher: expected name, got {t}")

    # ---- pattern ----------------------------------------------------

    def parse(self) -> _Query:
        q = _Query()
        self.next("MATCH")
        self._pattern(q)
        if self.accept("WHERE"):
            q.where.append(self._condition())
            while self.accept("AND"):
                q.where.append(self._condition())
        self.next("RETURN")
        q.distinct = self.accept("DISTINCT")
        q.returns.append(self._return_item())
        while self.peek()[1] == ",":
            self.next()
            q.returns.append(self._return_item())
        if self.accept("ORDER"):
            self.next("BY")
            while True:
                expr = self._operand()
                asc = True
                if self.accept("DESC"):
                    asc = False
                else:
                    self.accept("ASC")
                q.order.append((expr, asc))
                if self.peek()[1] != ",":
                    break
                self.next()
        if self.accept("SKIP"):
            q.skip = int(self.next("num")[1])
        if self.accept("LIMIT"):
            q.limit = int(self.next("num")[1])
        self.next("EOF")
        return q

    def _expect_val(self, val: str) -> None:
        t = self.next()
        if t[1] != val:
            raise SyntaxError(f"cypher: expected {val!r}, got {t[1]!r}")

    def _pattern(self, q: _Query) -> None:
        prev = self._node(q)
        while True:
            t = self.peek()[1]
            if t == ",":
                self.next()
                prev = self._node(q)
                continue
            if t in ("-", "<-"):
                head = self.next()[1]
                label = None
                self._expect_val("[")
                if self.peek()[0] == "name":  # optional rel var, unused
                    self.next()
                if self.peek()[1] == ":":
                    self.next()
                    label = self._name()
                self._expect_val("]")
                tail = self.next("arrow")[1]  # -> or -
                if head == "-" and tail == "->":
                    direction = "OUT"
                elif head == "<-" and tail == "-":
                    direction = "IN"
                elif head == "-" and tail == "-":
                    direction = "BOTH"
                else:
                    raise SyntaxError(
                        f"cypher: bad relationship {head}[..]{tail}")
                nxt = self._node(q)
                q.rels.append(_Rel(prev, nxt, label, direction))
                prev = nxt
                continue
            break

    def _node(self, q: _Query) -> str:
        self.next("arrow")  # (
        var = self._name()
        label = None
        if self.peek()[1] == ":":
            self.next()
            label = self._name()
        self.next("arrow")  # )
        if var not in q.nodes or q.nodes[var] is None:
            q.nodes[var] = label
        return var

    # ---- expressions ------------------------------------------------

    def _operand(self):
        t = self.peek()
        if (t[0] in ("COUNT", "SUM", "AVG", "MIN", "MAX", "ID", "LABEL")
                and self.toks[self.i + 1][1] == "("):
            fn = self.next()[0]
            self.next("arrow")  # (
            if fn == "COUNT" and self.peek()[1] == "*":
                self.next()
                self.next("arrow")
                return ("agg", "COUNT", None, False)
            distinct = self.accept("DISTINCT")
            inner = self._operand()
            self.next("arrow")  # )
            if fn in ("ID", "LABEL"):
                return (fn.lower(), inner)
            return ("agg", fn, inner, distinct)
        if t[0] == "num":
            self.next()
            v = t[1]
            return ("lit", float(v) if "." in v else int(v))
        if t[0] == "str":
            self.next()
            return ("lit", t[1][1:-1])
        if t[0] == "name" or (t[0].isalpha() and t[0].isupper()
                              and t[0] != "EOF"):
            var = self._name()
            if self.peek()[1] == ".":
                self.next()
                prop = self._name()
                return ("prop", var, prop)
            return ("var", var)
        raise SyntaxError(f"cypher: bad operand {t}")

    def _condition(self):
        left = self._operand()
        t = self.peek()
        if t[0] == "cmp":
            op = self.next()[1]
            return ("cmp", op, left, self._operand())
        if t[0] == "CONTAINS":
            self.next()
            return ("contains", left, self._operand())
        if t[0] == "IN":
            self.next()
            self.next("arrow")  # [
            vals = []
            while self.peek()[1] != "]":
                vals.append(self._operand()[1])
                if self.peek()[1] == ",":
                    self.next()
            self.next("arrow")  # ]
            return ("in", left, vals)
        raise SyntaxError(f"cypher: bad condition at {t}")

    def _return_item(self):
        expr = self._operand()
        alias = None
        if self.accept("AS"):
            alias = self._name()
        return (expr, alias)


# ---------------------------------------------------------------------


def _default_alias(expr) -> str:
    kind = expr[0]
    if kind == "var":
        return expr[1]
    if kind == "prop":
        return f"{expr[1]}_{expr[2]}"
    if kind in ("id", "label"):
        return f"{kind}_{_default_alias(expr[1])}"
    if kind == "agg":
        inner = "star" if expr[2] is None else _default_alias(expr[2])
        return f"{expr[1].lower()}_{inner}"
    return "expr"


class CypherEngine:
    """Compiles the MATCH subset onto a PropertyGraph."""

    def __init__(self, graph: PropertyGraph):
        self.graph = graph
        self._typed_cols: dict[str, set[str]] = {}

    def _prop(self, var: str, prop: str) -> Column:
        if prop in self._typed_cols.get(var, ()):
            return F.col(f"__c_{var}_{prop}")  # typed view column
        c = F.col(f"__p_{var}")[prop]
        pks = getattr(self.graph.schema, "property_keys", {}) \
            if self.graph.schema is not None else {}
        if prop in pks:
            return c.cast(pks[prop].spark_type())
        return c

    def _col(self, expr) -> Column:
        kind = expr[0]
        if kind == "var":
            return F.col(expr[1])
        if kind == "prop":
            return self._prop(expr[1], expr[2])
        if kind == "id":
            return self._col(expr[1])
        if kind == "label":
            return F.col(f"__l_{expr[1][1]}")
        if kind == "lit":
            return F.lit(expr[1])
        raise SyntaxError(f"cypher: cannot compile {expr}")

    def _filter(self, cond) -> Column:
        kind = cond[0]
        if kind == "cmp":
            _, op, l, r = cond
            lc, rc = self._col(l), self._col(r)
            return {"=": lc == rc, "<>": lc != rc, "<": lc < rc,
                    "<=": lc <= rc, ">": lc > rc, ">=": lc >= rc}[op]
        if kind == "contains":
            from incubator_hugegraph_spark.functions.text import tokenize
            _, l, r = cond
            return F.array_contains(tokenize(self._col(l)),
                                    str(r[1]).lower())
        if kind == "in":
            _, l, vals = cond
            return self._col(l).isin(vals)
        raise SyntaxError(f"cypher: cannot compile condition {cond}")

    def run(self, query: str) -> DataFrame:
        q = _Parser(_tokenize(query)).parse()
        g = self.graph
        # assemble the pattern: one column per node var (its id), plus
        # per-var property columns. LABELED vars compile against the
        # TYPED per-label view, so `WHERE p.size >= 45` is a plain
        # typed-column predicate that reaches the parquet scan
        # (PushedFilters) and the scan reads only referenced columns —
        # the generic props-map fallback (unlabeled vars) evaluates
        # the map build per row and blocks both. At 100 TB this is the
        # difference between a pruned column scan and a full read.
        self._typed_cols = {}
        df: DataFrame | None = None

        def node_df(var: str) -> DataFrame:
            label = q.nodes.get(var)
            if label and label in getattr(g, "vertex_views", {}):
                view = g.view(label)
                props = [c for c in view.columns if c != "id"]
                self._typed_cols[var] = set(props)
                return view.select(
                    F.col("id").alias(var),
                    F.lit(label).alias(f"__l_{var}"),
                    *[F.col(c).alias(f"__c_{var}_{c}") for c in props])
            v = g.vertices.select(
                F.col("id").alias(var),
                F.col("label").alias(f"__l_{var}"),
                F.col("props").alias(f"__p_{var}"))
            if label:
                v = v.filter(F.col(f"__l_{var}") == label)
            return v

        def rel_scan_labels(rel: _Rel) -> list[str] | None:
            """Schema-link pruning (GraphTransaction.optimizeQuery
            :1553-1589 — semantic pruning Catalyst can't derive): an
            unlabeled relationship between labeled endpoints scans
            only the edge labels the schema allows between them; an
            infeasible (label, endpoints) combination scans nothing.
            The '__none__' sentinel keeps the plan shape while the
            pushed isin([]) filter empties the scan."""
            sch = g.schema
            if sch is None or not getattr(sch, "edge_labels", None):
                return [rel.label] if rel.label else None
            sl, dl = q.nodes.get(rel.src), q.nodes.get(rel.dst)

            def links(e) -> bool:
                fwd = ((sl is None or e.source_label == sl)
                       and (dl is None or e.target_label == dl))
                rev = ((sl is None or e.target_label == sl)
                       and (dl is None or e.source_label == dl))
                if rel.direction == "OUT":
                    return fwd
                if rel.direction == "IN":
                    return rev
                return fwd or rev
            cands = [n for n, e in sch.edge_labels.items()
                     if (rel.label is None or n == rel.label) and links(e)]
            if rel.label is None and len(cands) == len(sch.edge_labels):
                return None  # nothing pruned — keep the unfiltered view
            return cands or ["__none__"]

        bound: set[str] = set()
        if q.rels:
            for rel in q.rels:
                adj = g.adj(rel.direction, rel_scan_labels(rel)) \
                    .select(F.col("src").alias(rel.src),
                            F.col("dst").alias(rel.dst))
                if df is None:
                    df = node_df(rel.src).join(adj, on=rel.src)
                    bound.add(rel.src)
                elif rel.src in bound and rel.dst in bound:
                    # closing edge of a cyclic pattern: equi-join on
                    # both endpoints (a semi-join would also do; the
                    # inner join keeps Cypher's match multiplicity)
                    df = df.join(adj, on=[rel.src, rel.dst])
                    continue
                elif rel.src in bound:
                    df = df.join(adj, on=rel.src)
                elif rel.dst in bound:
                    df = df.join(adj, on=rel.dst)
                    rel = _Rel(rel.dst, rel.src, rel.label, rel.direction)
                else:
                    df = df.crossJoin(node_df(rel.src).join(adj, on=rel.src))
                    bound.add(rel.src)
                if rel.dst not in bound:
                    df = df.join(node_df(rel.dst), on=rel.dst)
                    bound.add(rel.dst)
        for var in q.nodes:
            if var not in bound:
                nd = node_df(var)
                df = nd if df is None else df.crossJoin(nd)
                bound.add(var)
        assert df is not None, "cypher: empty pattern"

        for cond in q.where:
            df = df.filter(self._filter(cond))

        # RETURN: aggregation iff any agg item present
        items = [(expr, alias or _default_alias(expr))
                 for expr, alias in q.returns]
        has_agg = any(e[0] == "agg" for e, _ in items)
        if has_agg:
            keys = [(e, a) for e, a in items if e[0] != "agg"]
            aggs = []
            for e, a in items:
                if e[0] != "agg":
                    continue
                _, fn, inner, distinct = e
                if fn == "COUNT" and inner is None:
                    aggs.append(F.count(F.lit(1)).alias(a))
                    continue
                c = self._col(inner)
                if fn == "COUNT":
                    aggs.append((F.countDistinct(c) if distinct
                                 else F.count(c)).alias(a))
                else:
                    c = c.cast("double")
                    f = {"SUM": F.sum, "AVG": F.avg,
                         "MIN": F.min, "MAX": F.max}[fn]
                    aggs.append(F.round(f(c), 6).alias(a))
            df = df.groupBy(*[self._col(e).alias(a) for e, a in keys]) \
                .agg(*aggs) if keys else df.agg(*aggs)
        else:
            df = df.select(*[self._col(e).alias(a) for e, a in items])
        if q.distinct:
            df = df.dropDuplicates()

        if q.order:
            out_names = {a for _, a in items}

            def ocol(expr) -> Column:
                if expr[0] == "var" and expr[1] in out_names:
                    return F.col(expr[1])
                if expr[0] == "prop" and f"{expr[1]}_{expr[2]}" in out_names:
                    return F.col(f"{expr[1]}_{expr[2]}")
                return self._col(expr)
            df = df.orderBy(*[ocol(e).asc() if asc else ocol(e).desc()
                              for e, asc in q.order])
        if q.skip:
            df = df.offset(q.skip)
        if q.limit is not None:
            df = df.limit(q.limit)
        return df


def cypher(graph: PropertyGraph, query: str) -> DataFrame:
    """Run a Cypher MATCH query against the graph."""
    return CypherEngine(graph).run(query)
