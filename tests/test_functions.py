"""Salted-join equivalence: salting must never change join semantics."""

from __future__ import annotations

from pyspark.sql import functions as F

from iceberg_metadata_pipeline_spark.functions.skew import (
    salted_join,
    salted_join_hot_keys,
)


def _skewed_pair(spark):
    left = spark.range(20_000).select(
        F.when(F.col("id") % 4 != 0, F.lit(7)).otherwise(F.col("id") % 100).alias("k"),
        F.col("id").alias("payload"),
    )
    right = spark.range(200).select(
        (F.col("id") % 100).alias("k"), (F.col("id") * 10).alias("r_val")
    )
    return left, right


def _fingerprint(df):
    return df.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("payload").alias("sp"),
        F.sum("r_val").alias("sr"),
    ).collect()[0]


def test_salted_inner_join_equals_plain(spark):
    left, right = _skewed_pair(spark)
    plain = _fingerprint(left.join(right, ["k"]))
    salted = _fingerprint(salted_join(left, right, ["k"], n_salts=8))
    assert tuple(plain) == tuple(salted)


def test_salted_left_join_equals_plain(spark):
    left, right = _skewed_pair(spark)
    # make some left keys unmatched
    right = right.filter(F.col("k") < 50)
    plain = _fingerprint(left.join(right, ["k"], "left"))
    salted = _fingerprint(salted_join(left, right, ["k"], n_salts=8, how="left"))
    assert tuple(plain) == tuple(salted)


def test_hot_key_salting_equals_plain(spark):
    left, right = _skewed_pair(spark)
    hot = spark.createDataFrame([(7,)], "k long")
    plain = _fingerprint(left.join(right, ["k"]))
    salted = _fingerprint(salted_join_hot_keys(left, right, ["k"], hot, n_salts=16))
    assert tuple(plain) == tuple(salted)
