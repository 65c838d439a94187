"""PySpark-native analytics engine with the query capabilities of
Apache HugeGraph (incubating).

The reference (/root/reference) is a TinkerPop OLTP property-graph
server; this package re-expresses its data model, condition-query
layer, 27 REST traversers and 18 OLAP job algorithms as idiomatic
PySpark DataFrame programs (see SURVEY.md for the operator-by-operator
mapping), plus the large-scale training-data operators (dedup, ANN,
text analysis) a 100 TB pipeline needs.

Everything here is DataFrame-first: logical plans are declared with
the pyspark.sql API so Catalyst/Tungsten pick the physical strategy;
iterative graph algorithms are driver-side loops over joins with
checkpoint hygiene (the GraphFrames pattern).
"""

# Memory-residency tuning must run in EVERY process that imports the
# package — the driver and each forked Python worker (codec/udf paths
# import their module, which imports the package): freed pages are
# discarded host-side on this host class and refault at 7-11 MB/s
# under pressure (see _alloc.py).
import incubator_hugegraph_spark._alloc  # noqa: F401  (side effect)

from incubator_hugegraph_spark.cypher import cypher
from incubator_hugegraph_spark.graph import PropertyGraph
from incubator_hugegraph_spark.gremlin import G, GP
from incubator_hugegraph_spark.schema import (
    Cardinality,
    EdgeLabel,
    GraphSchema,
    IdStrategy,
    PropertyKey,
    VertexLabel,
)
from incubator_hugegraph_spark.session import get_spark

__all__ = [
    "Cardinality",
    "G",
    "GP",
    "cypher",
    "EdgeLabel",
    "GraphSchema",
    "IdStrategy",
    "PropertyGraph",
    "PropertyKey",
    "VertexLabel",
    "get_spark",
]

__version__ = "0.1.0"
