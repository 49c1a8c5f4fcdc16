"""Skew handling: salted repartitioning for hot keys (north_rule: "salted
repartitioning for skewed hosts/predicates").

Web corpora are Zipf-distributed over hosts; predicates concentrate on
rdf:type-like hot keys. A plain ``repartition(key)`` routes every row of a
hot key to ONE task — the straggler that stalls a 1000-executor stage. The
salt spreads each key over ``salt`` buckets; per-key aggregations then run
in two stages (partial per salted bucket, final per key), which is exactly
how the graph store's pred_bucket salting works (sinks/graph_store.py).

Determinism: the spread is derived ONLY from row content (``spread_col`` if
given, else a hash over every column). Hashing nondeterministic values like
``monotonically_increasing_id()`` / ``spark_partition_id()`` inside a
shuffle key is the SPARK-23207 class bug — a partial stage recompute after
a fetch failure reassigns rows to different buckets and the retried shuffle
can drop or duplicate rows. Content hashes survive retries.

AQE's skewJoin handles skewed JOINS automatically (enabled in
session.get_spark); this operator is for skewed partitioning/aggregation,
which AQE does not rebalance.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

DEFAULT_SALT = 16


def _spread(df: DataFrame, key: str, salt: int,
            spread_col: str | None) -> Column:
    """Deterministic per-row spread in [0, salt): hash of ``spread_col`` if
    given, else of EVERY column — identical input row → identical bucket on
    every (re)execution, so shuffle retries are safe."""
    if spread_col is not None:
        return F.pmod(F.xxhash64(F.col(spread_col)), F.lit(salt))
    return F.pmod(F.xxhash64(*[F.col(c) for c in df.columns]), F.lit(salt))


def salted_key(key: Column, spread_from: Column,
               salt: int = DEFAULT_SALT) -> Column:
    """key → 'key#<0..salt-1>' with the spread hashed from row content
    (``spread_from`` — e.g. the page url under a host key)."""
    spread = F.pmod(F.xxhash64(key, spread_from), F.lit(salt))
    return F.concat(key, F.lit("#"), spread.cast("string"))


def salted_repartition(df: DataFrame, key: str, num_partitions: int,
                       salt: int = DEFAULT_SALT,
                       spread_col: str | None = None) -> DataFrame:
    """Repartition by (key, spread) so hot keys occupy ``salt`` partitions.

    ``spread_col``: column to derive the spread from (e.g. the page url
    under a host key); defaults to a hash of all columns.
    """
    return (df.withColumn("_salt", _spread(df, key, salt, spread_col))
            .repartition(num_partitions, F.col(key), F.col("_salt"))
            .drop("_salt"))


def two_stage_count(df: DataFrame, key: str, salt: int = DEFAULT_SALT,
                    spread_col: str | None = None) -> DataFrame:
    """Skew-proof per-key count: partial count per (key, salt bucket), then
    final sum per key. Two small shuffles instead of one skewed one."""
    partial = (df.withColumn("_salt", _spread(df, key, salt, spread_col))
               .groupBy(key, "_salt").agg(F.count("*").alias("_n")))
    return partial.groupBy(key).agg(F.sum("_n").alias("n"))


def partition_sizes(df: DataFrame) -> list[int]:
    """Diagnostic: rows per partition (driver-collected — small)."""
    return (df.withColumn("_pid", F.spark_partition_id())
            .groupBy("_pid").count().orderBy("_pid")
            .rdd.map(lambda r: r["count"]).collect())
