#!/usr/bin/env python
"""Per-round timing of the page_rank loop at $SPARK_GRAFT_SF_DIR."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from incubator_hugegraph_spark.session import get_spark  # noqa: E402
from incubator_hugegraph_spark.sources.tpch import build_graph  # noqa: E402
from incubator_hugegraph_spark.graph import (  # noqa: E402
    OUT, balanced, checkpointed, no_aqe)
from incubator_hugegraph_spark.algorithms.pagerank import (  # noqa: E402
    vector_partitions)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main():
    spark = get_spark("profile-pr")
    graph = build_graph(spark, SF_DIR)
    graph.vertices = graph.vertices.persist()
    graph.edges = graph.edges.persist()
    graph.vertices.count()
    graph.edges.count()

    t0 = time.monotonic()
    e = graph.adj(OUT, None).select("src", "dst")
    e = balanced(e, "dst").persist()
    deg = e.groupBy("src").agg(F.count(F.lit(1)).alias("deg"))
    n = graph.vertices.count()
    print(f"n_vertices={n}  setup_adj={time.monotonic()-t0:.2f}s",
          file=sys.stderr)
    t0 = time.monotonic()
    ranks = checkpointed(
        graph.vertices.select("id")
        .join(deg.withColumnRenamed("src", "id"), on="id", how="left")
        .withColumn("rank", F.lit(1.0 / n))
        .repartition(vector_partitions(n, spark)))
    print(f"vector_init={time.monotonic()-t0:.2f}s "
          f"parts={ranks.rdd.getNumPartitions()}", file=sys.stderr)
    alpha = 0.15
    with no_aqe(spark):
        for t in range(10):
            t0 = time.monotonic()
            contrib = (e.join(F.broadcast(ranks), on=e.src == ranks.id)
                       .select(F.col("dst").alias("id"),
                               (F.col("rank") / F.col("deg")).alias("msg")))
            incoming = contrib.groupBy("id").agg(F.sum("msg").alias("inc"))
            new = (ranks.select("id", "deg", F.col("rank").alias("old"))
                   .join(F.broadcast(incoming), on="id", how="left")
                   .select("id", "deg", "old",
                           (F.lit(alpha / n) + F.lit(1.0 - alpha)
                            * F.coalesce(F.col("inc"), F.lit(0.0)))
                           .alias("rank")))
            new = checkpointed(new, eager=False)
            t1 = time.monotonic()
            tot = new.agg(F.sum("rank").alias("total"))
            row = (new.crossJoin(F.broadcast(tot))
                   .agg(F.first("total").alias("total"),
                        F.sum(F.abs(
                            F.col("rank")
                            + (F.lit(1.0) - F.col("total"))
                            / F.lit(float(n))
                            - F.col("old"))).alias("changed"))
                   .collect()[0])
            t2 = time.monotonic()
            total, changed = row["total"], row["changed"]
            comp = (1.0 - total) / n
            ranks = new.select(
                "id", "deg", (F.col("rank") + F.lit(comp)).alias("rank"))
            print(f"round {t}: build={t1-t0:.3f}s action={t2-t1:.3f}s "
                  f"changed={changed:.2e}", file=sys.stderr)


if __name__ == "__main__":
    main()
