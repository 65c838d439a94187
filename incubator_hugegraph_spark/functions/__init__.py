"""Scalar-function surface (SURVEY §2.I): id splicing, text predicates,
condition algebra. The reference has no scalar-function library — its
predicate algebra (Condition.java) and analyzers are what we mirror."""
