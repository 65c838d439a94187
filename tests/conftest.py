from __future__ import annotations

import os

import pytest

from incubator_hugegraph_spark.session import get_spark
from incubator_hugegraph_spark.sources.tpch import build_graph

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


def pytest_configure(config):
    config.addinivalue_line(
        "markers", "slow: generated large-N tests (~1 min each)")


@pytest.fixture(scope="session")
def spark():
    os.environ.setdefault("SPARK_GRAFT_CPUS", "8")
    spark = get_spark("hugegraph-spark-tests")
    yield spark


@pytest.fixture(scope="session")
def graph(spark):
    g = build_graph(spark, SF_DIR)
    g.vertices = g.vertices.persist()
    g.edges = g.edges.persist()
    return g


@pytest.fixture(scope="session")
def duck():
    import duckdb

    con = duckdb.connect()
    for t in ["region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"]:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
    return con
