"""spread_small_input byte-sizing (optimization r11, r10 verdict item
1): the spread must be sized by input bytes (ceil(bytes/target),
capped at the session's slots), return sub-target inputs untouched,
and skip shuffle-derived plans via the STRUCTURAL ShuffleExchangeLike
probe (advice r10: the string regex breaks silently across renderer
changes)."""

import pytest
from pyspark.sql import functions as F

from incubator_hugegraph_spark.graph import (_plan_has_shuffle,
                                             spread_small_input)


@pytest.fixture(scope="module")
def small_parquet(spark, tmp_path_factory):
    p = str(tmp_path_factory.mktemp("spread") / "small")
    spark.range(200).select(F.col("id"),
                            F.lit("x").alias("t")) \
        .coalesce(1).write.mode("overwrite").parquet(p)
    return p


@pytest.fixture(scope="module")
def mb_parquet(spark, tmp_path_factory):
    # ~1.5 MB on disk in one split: 3000 rows x ~500B of incompressible
    # hex noise
    p = str(tmp_path_factory.mktemp("spread") / "mb")
    (spark.range(3000)
     .select("id", F.sha2(F.concat_ws("_", *[
         (F.col("id") * F.lit(i)).cast("string") for i in range(8)]), 512)
         .alias("t"))
     .withColumn("t", F.concat(*[F.sha2(F.concat(F.col("t"),
                                                 F.lit(str(i))), 512)
                                 for i in range(4)]))
     .coalesce(1).write.mode("overwrite").parquet(p))
    return p


def test_sub_target_input_is_identity(spark, small_parquet):
    df = spark.read.parquet(small_parquet)
    assert spread_small_input(df) is df


def test_byte_sized_spread_engages_and_preserves_rows(spark, mb_parquet):
    df = spark.read.parquet(mb_parquet)
    assert df.rdd.getNumPartitions() == 1
    out = spread_small_input(df, target_bytes=256 * 1024)
    cap = int(spark.sparkContext.defaultParallelism)
    n = out.rdd.getNumPartitions()
    assert 2 <= n <= cap
    # partition count tracks bytes/target, not the slot count (unless
    # capped): a 2x target must halve the split count (±1 rounding)
    out2 = spread_small_input(df, target_bytes=512 * 1024)
    n2 = out2.rdd.getNumPartitions()
    if n < cap:
        assert n2 <= -(-n // 2) + 1
    # identity on content
    assert out.count() == df.count()
    assert (out.select("id").exceptAll(df.select("id")).count() == 0)


def test_shuffle_derived_input_untouched(spark, mb_parquet):
    df = spark.read.parquet(mb_parquet).repartition(2)
    assert spread_small_input(df, target_bytes=1024) is df


def test_structural_shuffle_probe(spark, small_parquet):
    scan = spark.read.parquet(small_parquet)
    assert not _plan_has_shuffle(scan)
    assert _plan_has_shuffle(scan.repartition(2))
    assert _plan_has_shuffle(scan.groupBy("t").count())
    # broadcast-only plans must NOT read as shuffles (the spread
    # exists for broadcast-semi-joined scans, review r10 wave 2)
    ids = spark.range(10).select(F.concat(F.lit("k"), "id").alias("t"))
    j = scan.join(F.broadcast(ids), on="t", how="left_semi")
    assert not _plan_has_shuffle(j)
