"""Skew handling: salted repartition must balance the Zipf host
distribution that plain key-repartitioning cannot."""

from pyspark.sql import functions as F

from rdf_tabular_spark.operators.skew import (partition_sizes,
                                              salted_repartition,
                                              two_stage_count)
from rdf_tabular_spark.sources.pages import synth_pages


def test_salted_repartition_balances_zipf_hosts(spark):
    pages = synth_pages(spark, 2000).select(
        "url", F.regexp_extract("url", r"https://([^/]+)/", 1).alias("host"))
    pages = pages.persist()
    n_parts = 8

    plain = pages.repartition(n_parts, F.col("host"))
    plain_sizes = partition_sizes(plain)
    salted = salted_repartition(pages, "host", n_parts, spread_col="url")
    salted_sizes = partition_sizes(salted)

    total = sum(plain_sizes)
    assert total == sum(salted_sizes) == 2000
    mean = total / n_parts
    # the Zipf head (host0000 ~ a third of rows) makes some plain partition
    # dominate; salting must bring the max close to the mean
    assert max(salted_sizes) < max(plain_sizes)
    assert max(salted_sizes) <= 1.5 * mean, (plain_sizes, salted_sizes)
    pages.unpersist()


def test_two_stage_count_matches_plain_groupby(spark):
    pages = synth_pages(spark, 500).select(
        F.regexp_extract("url", r"https://([^/]+)/", 1).alias("host"), "url")
    expect = {r["host"]: r["n"] for r in
              pages.groupBy("host").agg(F.count("*").alias("n")).collect()}
    got = {r["host"]: r["n"] for r in
           two_stage_count(pages, "host", spread_col="url").collect()}
    assert got == expect


def test_salted_key_spreads_within_bound(spark):
    from pyspark.sql import functions as F
    from rdf_tabular_spark.operators.skew import salted_key
    df = spark.createDataFrame([("h", f"u{i}") for i in range(50)],
                               "host string, url string")
    out = df.select(salted_key(F.col("host"), F.col("url"), salt=4)
                    .alias("k"))
    keys = {r["k"] for r in out.collect()}
    assert keys <= {f"h#{i}" for i in range(4)}
    assert len(keys) > 1        # content hash actually spreads
