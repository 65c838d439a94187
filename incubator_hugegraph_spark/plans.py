"""Plan introspection shared by the query surfaces.

The reference exposes TinkerPop ``explain()``/``profile()`` through
its Gremlin runtime (test/tinkerpop/ProcessBasicSuite.java registers
ExplainTest/ProfileTest) and openCypher's EXPLAIN/PROFILE keywords
through the Cypher translation layer
(api/opencypher/CypherOpProcessor.java). Here both surfaces compile
to Spark DataFrames, so the faithful analogues are Catalyst's plan
string and the executed plan's SQL metrics — this module holds the
two helpers so Gremlin and Cypher return identical shapes.

Both helpers are driver-side METADATA walks: the plan tree is tiny
and never carries data, so there is no scale concern. ``profile``
does execute the query once — that is the profile() contract (the
reference's TraversalMetrics also iterates the traversal).
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def explain_string(df: DataFrame, mode: str = "formatted") -> str:
    """The Catalyst plan for ``df`` as a string — pushed filters,
    pruned columns, join strategies, codegen spans. ``mode`` is any
    Spark explain mode (simple/extended/formatted/cost/codegen)."""
    jvm = df.sparkSession._jvm
    return jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), mode)


def profile_metrics(df: DataFrame) -> DataFrame:
    """Execute ``df`` once and return per-physical-operator metrics:
    (step, depth, operator, rows) in execution order, rows =
    numOutputRows where Spark collects it. AQE-aware: descends
    AdaptiveSparkPlan final plans and QueryStage wrappers (whose
    children() is empty — the subtree hangs off .plan())."""
    df.collect()
    rows, stack = [], [(df._jdf.queryExecution().executedPlan(), 0)]
    while stack:
        node, depth = stack.pop()
        name = node.nodeName()
        mets, it = {}, node.metrics().iterator()
        while it.hasNext():
            kv = it.next()
            mets[kv._1()] = int(kv._2().value())
        rows.append((len(rows), depth, name, mets.get("numOutputRows")))
        if name.startswith("AdaptiveSparkPlan"):
            stack.append((node.executedPlan(), depth + 1))
            continue
        if name.endswith("QueryStage"):
            stack.append((node.plan(), depth + 1))
            continue
        ch = node.children()
        for i in range(ch.size() - 1, -1, -1):
            stack.append((ch.apply(i), depth + 1))
    return df.sparkSession.createDataFrame(
        rows, "step int, depth int, operator string, rows long")
