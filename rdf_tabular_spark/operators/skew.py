"""Skew handling: salted repartitioning for hot keys (north_rule: "salted
repartitioning for skewed hosts/predicates").

Web corpora are Zipf-distributed over hosts; predicates concentrate on
rdf:type-like hot keys. A plain ``repartition(key)`` routes every row of a
hot key to ONE task — the straggler that stalls a 1000-executor stage. The
salt spreads each key over ``salt`` buckets; per-key aggregations then run
in two stages (partial per salted bucket, final per key), which is exactly
how the graph store's pred_bucket salting works (sinks/graph_store.py).

AQE's skewJoin handles skewed JOINS automatically (enabled in
session.get_spark); this operator is for skewed partitioning/aggregation,
which AQE does not rebalance.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

DEFAULT_SALT = 16


def salted_key(key: Column, salt: int = DEFAULT_SALT) -> Column:
    """key → 'key#<0..salt-1>' with a deterministic per-row spread.

    The spread hash uses the full row only implicitly — xxhash64 over a
    per-row monotonic id would break determinism, so callers pass a spread
    column when they need a stable salt; default spreads by random-ish
    hash of the key combined with spark_partition_id (cheap, stable within
    a run, uniform across buckets).
    """
    spread = F.pmod(F.xxhash64(key, F.spark_partition_id(),
                               F.monotonically_increasing_id()), F.lit(salt))
    return F.concat(key, F.lit("#"), spread.cast("string"))


def salted_repartition(df: DataFrame, key: str, num_partitions: int,
                       salt: int = DEFAULT_SALT,
                       spread_col: str | None = None) -> DataFrame:
    """Repartition by (key, spread) so hot keys occupy ``salt`` partitions.

    ``spread_col``: deterministic column to derive the spread from (e.g. the
    page url under a host key); defaults to a uniform per-row spread.
    """
    if spread_col is not None:
        spread = F.pmod(F.xxhash64(F.col(spread_col)), F.lit(salt))
    else:
        spread = F.pmod(F.xxhash64(F.col(key), F.spark_partition_id(),
                                   F.monotonically_increasing_id()), F.lit(salt))
    return (df.withColumn("_salt", spread)
            .repartition(num_partitions, F.col(key), F.col("_salt"))
            .drop("_salt"))


def two_stage_count(df: DataFrame, key: str, salt: int = DEFAULT_SALT,
                    spread_col: str | None = None) -> DataFrame:
    """Skew-proof per-key count: partial count per (key, salt bucket), then
    final sum per key. Two small shuffles instead of one skewed one."""
    spread = (F.pmod(F.xxhash64(F.col(spread_col)), F.lit(salt))
              if spread_col else
              F.pmod(F.xxhash64(F.col(key), F.spark_partition_id(),
                                F.monotonically_increasing_id()), F.lit(salt)))
    partial = (df.withColumn("_salt", spread)
               .groupBy(key, "_salt").agg(F.count("*").alias("_n")))
    return partial.groupBy(key).agg(F.sum("_n").alias("n"))


def partition_sizes(df: DataFrame) -> list[int]:
    """Diagnostic: rows per partition (driver-collected — small)."""
    return (df.withColumn("_pid", F.spark_partition_id())
            .groupBy("_pid").count().orderBy("_pid")
            .rdd.map(lambda r: r["count"]).collect())
