"""Gremlin text queries → the fluent DSL (the `POST /gremlin` surface).

The reference evaluates Gremlin-groovy scripts in the embedded
GremlinServer (api/api/gremlin/GremlinAPI.java:41-88). Arbitrary
groovy is out of scope (our Python API is the scripting surface —
SURVEY §2.K), but the overwhelmingly common payload is a single
method-chain traversal string. This module parses exactly that form
and compiles it onto gremlin.Traversal, so a reference user's actual
query strings run verbatim:

    eval_gremlin(graph, "g.V().hasLabel('part')"
                        ".has('size', gte(45)).in('contains')"
                        ".dedup().count()")

Supported chain grammar:
    g.V(ids…) | g.E(labels…)
    .hasLabel/.hasId/.has(key, literal | P-predicate)
    .out/.in/.both/.outE/.inE/.bothE(labels…) .inV()/.outV()/.otherV()
    .values(key) .id() .label() .valueMap(keys…) .elementMap(keys…)
    .path() .filter(__.…) .not(__.…) .and(__.…, __.…) .or(__.…, __.…)
    .constant(v) .coin(p) .identity()
    g.addV(label).property(k,v)… .V(id).addE(label).to(id).from(id)
    .property(k,v) .drop()
    .as('x') … .select('x', 'y')   (step labels)
    .dedup() .simplePath() .cyclicPath()
    .order().by(key[, incr|decr|asc|desc]) .limit(n) .range(a, b)
    .tail(n) .sample(n) .is(P) .inject(v…)
    .repeat(__.…).times(n)  .union(__.…, __.…)
    .choose(__.has(...), __.…, __.…)  .coalesce(__.…, …)
    .optional(__.…)
    .count() .sum() .mean() .min() .max() .fold()
    .groupCount([.by(key | label)])
P-predicates: eq,neq,gt,gte,lt,lte,within,without,between,inside,
outside,textContains. Anonymous traversals start with `__.`.

Java/groovy niceties NOT handled: lambdas/closures, `as()/select()`
step labels, arithmetic, variable bindings — those are the cases the
reference itself delegates to a full groovy engine.
"""

from __future__ import annotations

import re

from incubator_hugegraph_spark.gremlin import G, GP, Traversal
from incubator_hugegraph_spark.graph import PropertyGraph

_TOKENS = re.compile(r"""
    \s*(?:
      (?P<str>'(?:[^'\\]|\\.)*'|"(?:[^"\\]|\\.)*")
    | (?P<num>-?\d+(?:\.\d+)?)
    | (?P<bool>true|false)
    | (?P<anon>__)
    | (?P<name>[A-Za-z_][A-Za-z0-9_]*)
    | (?P<punc>[().,])
    )""", re.X)

_PREDICATES = {"eq", "neq", "gt", "gte", "lt", "lte", "within",
               "without", "between", "inside", "outside",
               "textContains"}

#: gremlin step name → DSL method (identity where omitted)
_STEP_ALIAS = {"in": "in_", "id": "id_", "label": "label_",
               "is": "is_", "range": "range_", "as": "as_",
               "sum": "sum_", "mean": "mean_", "min": "min_",
               "max": "max_", "math": "math_", "V": "V_",
               "from": "from_", "key": "key_", "value": "value_"}

_ORDER_DESC = {"decr", "desc"}


def _tokenize(q: str):
    out, i = [], 0
    q = q.strip()
    while i < len(q):
        m = _TOKENS.match(q, i)
        if not m or m.end() == i:
            raise SyntaxError(f"gremlin: cannot tokenize at {q[i:i+20]!r}")
        for g in ("str", "num", "bool", "anon", "name", "punc"):
            if m.group(g) is not None:
                out.append((g, m.group(g)))
                break
        i = m.end()
    out.append(("eof", ""))
    return out


class _Pred:
    """Parsed P-predicate with provenance (name + literal args) —
    callable like the GP closures, but steps that need the label form
    (where(eq('x'))) can inspect it."""

    def __init__(self, name: str, vals: list, fn):
        self.name, self.vals, self.fn = name, vals, fn

    def __call__(self, c):
        return self.fn(c)


class _Chain:
    """One parsed method chain: [(step, [args…]), …]. Args are
    literals, GP predicates, or nested _Chain (anonymous
    traversals)."""

    def __init__(self, steps):
        self.steps = steps


class _P:
    def __init__(self, toks):
        self.toks, self.i = toks, 0

    def peek(self):
        return self.toks[self.i]

    def take(self, kind=None, val=None):
        t = self.toks[self.i]
        if (kind and t[0] != kind) or (val and t[1] != val):
            raise SyntaxError(f"gremlin: expected {kind or val}, got {t}")
        self.i += 1
        return t

    def chain(self) -> _Chain:
        steps = []
        head = self.take("name")[1] if self.peek()[0] == "name" \
            else self.take("anon")[1]
        if head not in ("g", "__"):
            raise SyntaxError(f"gremlin: chain must start with g/__, "
                              f"got {head!r}")
        while self.peek() == ("punc", "."):
            self.take()
            name = self.take("name")[1]
            self.take("punc", "(")
            args = []
            while self.peek() != ("punc", ")"):
                args.append(self._arg())
                if self.peek() == ("punc", ","):
                    self.take()
            self.take("punc", ")")
            steps.append((name, args))
        return _Chain(steps)

    def _arg(self):
        t = self.peek()
        if t[0] == "str":
            self.take()
            return t[1][1:-1]
        if t[0] == "num":
            self.take()
            return float(t[1]) if "." in t[1] else int(t[1])
        if t[0] == "bool":
            self.take()
            return t[1] == "true"
        if t[0] == "anon":
            return self.chain()
        if t[0] == "name":
            if t[1] in _PREDICATES:
                self.take()
                self.take("punc", "(")
                vals = []
                while self.peek() != ("punc", ")"):
                    vals.append(self._arg())
                    if self.peek() == ("punc", ","):
                        self.take()
                self.take("punc", ")")
                fn = getattr(GP, "text_contains"
                             if t[1] == "textContains" else t[1])
                return _Pred(t[1], vals, fn(*vals))
            # bare identifiers: order modifiers etc. pass through;
            # T./Pick./Order./Scope. namespaces collapse to the member
            # (groovy static imports make both spellings common)
            self.take()
            if t[1] in ("T", "Pick", "Order", "Scope", "Column") \
                    and self.peek() == ("punc", "."):
                self.take()
                return ("ident", self.take("name")[1])
            return ("ident", t[1])
        raise SyntaxError(f"gremlin: bad argument {t}")


def _until_pred(chain: _Chain):
    """Compile an until() anonymous traversal to a row predicate —
    the filter forms TinkerPop loops actually use: __.has(k, v),
    __.hasLabel(l...), __.hasId(id...)."""
    from pyspark.sql import functions as F

    from incubator_hugegraph_spark.gremlin import _pred
    if len(chain.steps) != 1:
        raise SyntaxError("gremlin: until() supports one has-filter")
    sname, sargs = chain.steps[0]
    if sname == "has" and len(sargs) == 2:
        k, v = sargs
        return lambda df: _pred(F.col("props")[k], v)
    if sname == "hasLabel":
        return lambda df: F.col("label").isin(list(sargs))
    if sname == "hasId":
        return lambda df: F.col("id").isin(list(sargs))
    raise SyntaxError(
        "gremlin: until() supports __.has(k,v)/hasLabel/hasId")


def _selector(chain: _Chain):
    """Compile a branch() selector anonymous traversal to a token
    Column — the forms TinkerPop branch queries actually use:
    __.values(k), __.label(), __.id()."""
    from pyspark.sql import functions as F
    if len(chain.steps) != 1:
        raise SyntaxError("gremlin: branch() selector must be a "
                          "single __.values/label/id step")
    sname, sargs = chain.steps[0]
    if sname == "values" and len(sargs) == 1:
        key = sargs[0]
        return lambda df: F.col("props")[key]
    if sname == "label":
        return lambda df: F.col("label")
    if sname == "id":
        return lambda df: F.col("id")
    raise SyntaxError(
        "gremlin: branch() selector supports __.values(k)/label()/id()")


def _apply(chain: _Chain, t: Traversal) -> object:
    """Apply parsed steps to a traversal; returns a Traversal or, for
    terminal aggregations, a DataFrame."""
    steps = list(chain.steps)
    i = 0
    while i < len(steps):
        name, args = steps[i]
        from incubator_hugegraph_spark.gremlin import _AddE, _AddV
        if not isinstance(t, (Traversal, _AddV, _AddE)):
            raise SyntaxError(
                f"gremlin: step {name}() after a terminal aggregation")
        if name == "repeat":
            body = args[0]
            emit = False
            n = None
            until_chain = None
            j = i + 1
            while j < len(steps) and steps[j][0] in ("emit", "times",
                                                     "until"):
                sname, sargs = steps[j]
                if sname == "emit":
                    emit = True
                elif sname == "times":
                    n = int(sargs[0])
                else:
                    until_chain = sargs[0]
                j += 1
            if until_chain is not None:
                kw = {"emit": emit}
                if n is not None:
                    # times(n) caps the loop even with until() —
                    # previously silently ignored (review r06)
                    kw["max_times"] = n
                t = t.repeat_until(lambda x: _apply(body, x),
                                   _until_pred(until_chain), **kw)
            elif n is None:
                raise SyntaxError(
                    "gremlin: repeat(...) needs .times(n) or .until(...)")
            elif emit:
                t = t.repeat_emit(lambda x: _apply(body, x), n)
            else:
                t = t.repeat(lambda x: _apply(body, x), n)
            i = j
            continue
        if name == "order":
            specs = []
            j = i + 1
            while j < len(steps) and steps[j][0] == "by":
                by_args = steps[j][1]
                key = by_args[0] if by_args and isinstance(
                    by_args[0], str) else None
                asc = True
                for a in by_args:
                    if isinstance(a, tuple) and a[0] == "ident" \
                            and a[1] in _ORDER_DESC:
                        asc = False
                specs.append((key, asc))
                j += 1
            t = t.order_by_specs(specs) if specs else t.order_by()
            i = j
            continue
        if name == "path" and i + 1 < len(steps) \
                and steps[i + 1][0] == "by":
            by_args = steps[i + 1][1]
            if not (by_args and isinstance(by_args[0], str)):
                raise SyntaxError("gremlin: path().by() takes a "
                                  "property name")
            t = t.path_by(by_args[0])
            i += 2
            continue
        if name == "group":
            # group().by(key).by(__.values('p').mean()) / .by(count())
            key = None
            agg, value_key = "collect", None
            j = i + 1
            if j < len(steps) and steps[j][0] == "by":
                ba = steps[j][1]
                if ba and isinstance(ba[0], str):
                    key = ba[0]
                elif ba and isinstance(ba[0], tuple):
                    key = ba[0][1]  # T.label
                j += 1
            if j < len(steps) and steps[j][0] == "by":
                ba = steps[j][1]
                if ba and isinstance(ba[0], _Chain):
                    sub = ba[0].steps
                    for sname, sargs in sub:
                        if sname == "values" and sargs:
                            value_key = sargs[0]
                        elif sname in ("mean", "sum", "min", "max",
                                       "count"):
                            agg = sname
                        else:
                            raise SyntaxError(
                                "gremlin: group value-by supports "
                                "__.values(k).mean/sum/min/max or "
                                "__.count()")
                elif ba and isinstance(ba[0], str):
                    # .by('name') value-by: collect that property's
                    # values — previously silently ignored and the
                    # group collected element ids (review r06)
                    value_key = ba[0]
                elif ba:
                    raise SyntaxError(
                        "gremlin: group value-by takes a property "
                        "name or a __ sub-chain")
                j += 1
            t = t.group(key, agg, value_key)
            i = j
            continue
        if name == "groupCount":
            key = None
            if i + 1 < len(steps) and steps[i + 1][0] == "by":
                by_args = steps[i + 1][1]
                if by_args and isinstance(by_args[0], str):
                    key = by_args[0]
                elif by_args and isinstance(by_args[0], tuple):
                    key = by_args[0][1]  # T.label etc. → 'label'
                i += 1
            t = t.groupCount(key)
            i += 1
            continue
        if name == "project":
            # project('a','b').by('name').by('size') — by() modulators
            # pair up with the names in order; a missing by() defaults
            # to the name itself as the property key
            names = [a for a in args if isinstance(a, str)]
            sels = []
            j = i + 1
            for nm in names:
                if j < len(steps) and steps[j][0] == "by":
                    by_args = steps[j][1]
                    src = by_args[0] if by_args else nm
                    if isinstance(src, tuple):
                        src = src[1]  # T.id / T.label idents
                    sels.append((nm, src))
                    j += 1
                else:
                    sels.append((nm, nm))
            t = t.project(*sels)
            i = j
            continue
        if name == "select":
            labels = [a for a in args if isinstance(a, str)]
            bys = []
            j = i + 1
            while j < len(steps) and steps[j][0] == "by":
                ba = steps[j][1]
                b = ba[0] if ba else None
                if isinstance(b, tuple):
                    b = b[1]  # T.id / T.label
                bys.append(b)
                j += 1
            t = t.select(*labels, by=bys or None)
            i = j
            continue
        if name == "sack":
            # sack() emits; sack(op).by('prop') updates (op is a bare
            # identifier: sum/minus/mult/div/max/min/assign)
            if not args:
                t = t.sack_()
                i += 1
                continue
            op = args[0][1] if isinstance(args[0], tuple) else args[0]
            by = None
            if i + 1 < len(steps) and steps[i + 1][0] == "by":
                by_args = steps[i + 1][1]
                by = by_args[0] if by_args else None
                i += 1
            t = t.sack_(op, by)
            i += 1
            continue
        if name in ("not", "filter", "and", "or") or (
                name == "where" and args
                and isinstance(args[0], _Chain)):
            # traversal-predicate family: not(__.x)/filter(__.x)/
            # where(__.x)/and(__.a, __.b)/or(__.a, __.b)
            subs = [a for a in args if isinstance(a, _Chain)]
            if not subs:
                raise SyntaxError(f"gremlin: {name}() takes __.…")
            fns = [(lambda c: lambda x: _apply(c, x))(c) for c in subs]
            if name == "not":
                t = t.not_(fns[0])
            elif name == "and":
                t = t.and_(*fns)
            elif name == "or":
                t = t.or_(*fns)
            else:  # filter / where
                t = t.filter_(fns[0])
            i += 1
            continue
        if name == "where":
            # where(eq('a')) / where(neq('a')): the STEP-LABEL form
            # (TinkerPop P with a string refers back to an as() label)
            if (len(args) == 1 and isinstance(args[0], _Pred)
                    and args[0].name in ("eq", "neq")
                    and len(args[0].vals) == 1
                    and isinstance(args[0].vals[0], str)):
                t = t.where_label(args[0].name, args[0].vals[0])
                i += 1
                continue
            raise SyntaxError(
                "gremlin: where() supports eq('label')/neq('label')")
        if name in ("store", "aggregate"):
            # store('x')[.by('prop')] / aggregate('x')[.by('prop')]
            key = args[0]
            by = None
            if i + 1 < len(steps) and steps[i + 1][0] == "by":
                by_args = steps[i + 1][1]
                by = by_args[0] if by_args else None
                i += 1
            t = t.store(key, by)
            i += 1
            continue
        if name in ("local", "map", "flatMap"):
            sub = args[0]
            if not isinstance(sub, _Chain):
                raise SyntaxError(f"gremlin: {name}() takes __.…")
            fn = {"local": t.local, "map": t.map_,
                  "flatMap": t.flatMap_}[name]
            t = fn(lambda x: _apply(sub, x))
            i += 1
            continue
        if name == "branch":
            sel_chain = args[0]
            if not isinstance(sel_chain, _Chain):
                raise SyntaxError("gremlin: branch() takes __.…")
            t = t._elem() if t.kind == "V" else t  # selector needs props
            sel = _selector(sel_chain)
            options: list[tuple] = []
            none_s = any_s = None
            j = i + 1
            while j < len(steps) and steps[j][0] == "option":
                key, sub = steps[j][1]
                if not isinstance(sub, _Chain):
                    raise SyntaxError("gremlin: option(v, __.…)")
                mk = (lambda c: lambda x: _apply(c, x))(sub)
                if isinstance(key, tuple) and key[0] == "ident":
                    if key[1] == "none":
                        none_s = mk
                    elif key[1] == "any":
                        any_s = mk
                    else:
                        raise SyntaxError(
                            f"gremlin: option({key[1]}) — only "
                            f"Pick.none/Pick.any idents are supported")
                else:
                    options.append((key, mk))
                j += 1
            if j == i + 1:
                raise SyntaxError("gremlin: branch() needs .option(…)")
            t = t.branch(sel, options, none=none_s, any_step=any_s)
            i = j
            continue
        if name in ("union", "choose", "coalesce", "optional"):
            subs = [a for a in args if isinstance(a, _Chain)]
            if name == "union":
                t = t.union(*[(lambda c: lambda x: _apply(c, x))(c)
                              for c in subs])
            elif name == "optional":
                t = t.optional(lambda x: _apply(subs[0], x))
            elif name == "coalesce":
                t = t.coalesce(*[(lambda c: lambda x: _apply(c, x))(c)
                                 for c in subs])
            else:  # choose(predChain, then, else)
                t = t._elem()  # predicate needs props attached
                pred_chain = subs[0]
                if len(pred_chain.steps) != 1 \
                        or pred_chain.steps[0][0] != "has":
                    raise SyntaxError(
                        "gremlin: choose() supports a __.has(...) "
                        "predicate branch")
                pk, pv = pred_chain.steps[0][1]
                from incubator_hugegraph_spark.gremlin import _pred
                from pyspark.sql import functions as F
                t = t.choose(
                    lambda df: _pred(F.col("props")[pk], pv),
                    lambda x: _apply(subs[1], x),
                    lambda x: _apply(subs[2], x))
            i += 1
            continue
        method = _STEP_ALIAS.get(name, name)
        if not hasattr(t, method):
            raise SyntaxError(f"gremlin: unsupported step {name}()")
        plain = [a for a in args if not isinstance(a, (_Chain, tuple))]
        t = getattr(t, method)(*plain)
        i += 1
    return t


def eval_gremlin(graph: PropertyGraph, query: str):
    """Parse and run a Gremlin method-chain string. Returns the
    resulting DataFrame (terminal aggregations) or the traversal's
    element/value DataFrame otherwise."""
    p = _P(_tokenize(query))
    chain = p.chain()
    p.take("eof")
    steps = list(chain.steps)
    gsrc = G(graph)
    if steps and steps[0][0] == "withSack":
        gsrc = gsrc.withSack(steps[0][1][0])
        steps = steps[1:]
    if not steps or steps[0][0] not in ("V", "E", "addV"):
        raise SyntaxError("gremlin: query must start with "
                          "g[.withSack(x)].V()/.E()/.addV()")
    src, args = steps[0]
    # seed ids may arrive as numbers (g.V(1)) — stringify instead of
    # silently dropping them, which turned a point lookup into a
    # FULL-GRAPH scan (review r06); engine ids are strings
    seeds = [a if isinstance(a, str) else str(a)
             for a in args if not isinstance(a, (tuple, _Chain))]
    t = getattr(gsrc, src)(*seeds)
    out = _apply(_Chain(steps[1:]), t)
    from incubator_hugegraph_spark.gremlin import _AddE, _AddV
    if isinstance(out, (_AddV, _AddE)):
        out = out.iterate()  # unterminated write chain — flush
    if isinstance(out, Traversal):
        return out.toDF()
    return out
