"""Hot-key (skew) mitigation helpers.

AQE's skew-join handling (enabled in session.py) re-splits oversized
shuffle partitions at runtime, which covers most sort-merge skew. The
explicit salting form here is for the cases AQE cannot rebalance: a
single hot KEY whose rows land in one shuffle block (AQE splits
partitions, not keys), or plans where the skewed join sits behind a
stage boundary AQE will not re-plan. The reference faces the same
problem as super-vertices (HugeTraverser's degree guards); here the
fix is to spread the hot key across reducers instead of capping it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(skewed: DataFrame, other: DataFrame, on: list[str],
                salts: int = 16, how: str = "inner") -> DataFrame:
    """Join with the hot-key spread: the SKEWED side gets a
    deterministic salt in [0, salts) (hash of the whole row — stable
    under replay/retries, unlike a random salt), the other side is
    replicated ``salts`` times, and the join keys on (key…, salt).
    A key with N rows now occupies ``salts`` reducers at N/salts
    each instead of melting one.

    Cost model: the other side's shuffle volume multiplies by
    ``salts`` — use when `other` is too big to broadcast but far
    smaller than the skewed side (the classic mid-size dimension),
    and size ``salts`` to the hot key's excess, not higher.
    Row-preserving for ``inner`` and ``left`` joins; ``right``/
    ``full``/``semi``/``anti`` are REJECTED — the other side is
    replicated ``salts`` times, so any join type that emits unmatched
    other-side rows would emit them ``salts`` times (review r06)."""
    if not on:
        raise ValueError("salted_join: need join keys")
    if how not in ("inner", "left", "left_outer", "leftouter"):
        raise ValueError(
            f"salted_join: how={how!r} is not row-preserving under "
            "replication — only inner/left joins are supported")
    # pmod, not abs(x) % n: abs(Long.MIN_VALUE) is still negative in
    # Java two's complement, and a negative salt matches no replica —
    # that row silently vanished from the join (review r06)
    salt = F.pmod(F.xxhash64(*[F.col(c) for c in skewed.columns]),
                  F.lit(salts)).alias("__salt")
    a = skewed.select("*", salt)
    b = other.withColumn(
        "__salt", F.explode(F.array(*[F.lit(i) for i in range(salts)])))
    return a.join(b, on=[*on, "__salt"], how=how).drop("__salt")
