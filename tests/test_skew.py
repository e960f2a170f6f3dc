"""salted_join must be result-identical to the plain join and must
actually spread a hot key across salts."""

from __future__ import annotations

from pyspark.sql import functions as F


def test_salted_join_matches_plain(spark):
    from mcp_vector_search_spark.operators.skew import salted_join

    # 90% of fact rows carry the hot key 7
    fact = spark.range(0, 5000).select(
        F.when(F.col("id") % 10 < 9, 7).otherwise(F.col("id") % 10).alias("k"),
        F.col("id").alias("payload"),
    )
    dim = spark.createDataFrame(
        [(i, f"d{i}") for i in range(10)], "k long, label string"
    )
    plain = {(r.k, r.payload, r.label) for r in fact.join(dim, "k").collect()}
    salted = {
        (r.k, r.payload, r.label)
        for r in salted_join(fact, dim, ["k"], n_salts=8).collect()
    }
    assert salted == plain
    assert len(salted) == 5000


def test_salt_spreads_hot_key(spark):
    from mcp_vector_search_spark.operators.skew import salted_join  # noqa: F401

    fact = spark.range(0, 1000).select(
        F.lit(7).alias("k"), F.col("id").alias("payload")
    )
    salts = (
        fact.withColumn(
            "_salt", F.pmod(F.xxhash64(*[F.col(c) for c in fact.columns]), F.lit(8))
        )
        .select("_salt")
        .distinct()
        .count()
    )
    assert salts == 8


def test_salted_left_join(spark):
    from mcp_vector_search_spark.operators.skew import salted_join

    fact = spark.createDataFrame([(1, "a"), (2, "b")], "k long, v string")
    dim = spark.createDataFrame([(1, "d1")], "k long, label string")
    got = {
        (r.k, r.v, r.label)
        for r in salted_join(fact, dim, ["k"], n_salts=4, how="left").collect()
    }
    assert got == {(1, "a", "d1"), (2, "b", None)}
