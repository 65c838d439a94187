"""Sources/sinks (SURVEY §2.A): the pluggable-backend abstraction of
the reference (RocksDB/HBase/Cassandra/… modules) collapses to Parquet
DataFrames; tpch.py derives the fixture property graph."""
