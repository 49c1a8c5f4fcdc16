"""SparkSession helpers: package shipping + tuned defaults.

On a real cluster the package arrives via ``spark-submit --py-files
rdf_tabular_spark.zip``; for interactive/driver-launched sessions,
``ensure_package_on_executors`` zips this package once and registers it with
``SparkContext.addPyFile`` so Arrow-UDF kernels unpickle on executors
regardless of the driver's cwd.
"""

from __future__ import annotations

import os
import tempfile
import zipfile

from pyspark.sql import SparkSession

_SHIPPED: set[int] = set()


def package_zip_path() -> str:
    """Build a zip of this package for --py-files/addPyFile.

    Rebuilt whenever any source file is newer than the cached zip —
    a stale cache across sessions would ship old code to executors.
    """
    pkg_dir = os.path.dirname(os.path.abspath(__file__))
    out = os.path.join(tempfile.gettempdir(), "rdf_tabular_spark_pkg.zip")
    src_mtime = max(
        os.path.getmtime(os.path.join(root, fn))
        for root, _dirs, files in os.walk(pkg_dir)
        for fn in files if fn.endswith(".py"))
    if not os.path.exists(out) or os.path.getmtime(out) < src_mtime:
        tmp = out + ".tmp"
        with zipfile.ZipFile(tmp, "w", zipfile.ZIP_DEFLATED) as zf:
            for root, _dirs, files in os.walk(pkg_dir):
                for fn in files:
                    if not fn.endswith(".py"):
                        continue
                    full = os.path.join(root, fn)
                    rel = os.path.join("rdf_tabular_spark", os.path.relpath(full, pkg_dir))
                    zf.write(full, rel)
        os.replace(tmp, out)
    return out


def ensure_package_on_executors(spark: SparkSession) -> None:
    pkg_dir = os.path.dirname(os.path.abspath(__file__))
    if ".zip" in pkg_dir:
        # already running FROM a --py-files zip: spark-submit distributed it
        return
    sc = spark.sparkContext
    key = id(sc)
    if key in _SHIPPED:
        return
    sc.addPyFile(package_zip_path())
    _SHIPPED.add(key)


def shipped(df):
    """Canonical pre-kernel guard: ensure the package zip is on the
    executors, return the DataFrame for chaining —
    ``shipped(df).mapInPandas(...)``. Every Python-kernel launch site
    (mapInPandas / mapInArrow / applyInPandas) must call this or
    :func:`ensure_package_on_executors` first; a lint test
    (tests/test_plans.py) enforces the invariant so new kernels can't
    forget it."""
    ensure_package_on_executors(df.sparkSession)
    return df


def get_spark(app_name: str = "rdf-tabular-spark", master: str | None = None,
              shuffle_partitions: int | None = None) -> SparkSession:
    """Opinionated session: AQE + skew-join on, Arrow enabled."""
    b = SparkSession.builder.appName(app_name)
    if master:
        b = b.master(master)
    b = (b.config("spark.sql.adaptive.enabled", "true")
          .config("spark.sql.adaptive.skewJoin.enabled", "true")
          .config("spark.sql.execution.arrow.pyspark.enabled", "true"))
    if shuffle_partitions:
        b = b.config("spark.sql.shuffle.partitions", str(shuffle_partitions))
    spark = b.getOrCreate()
    ensure_package_on_executors(spark)
    return spark
