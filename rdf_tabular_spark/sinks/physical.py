"""Physical storage seam for the graph store (round 5, r4 verdict task 6).

The graph store's SEMANTICS (immutable batches, manifests, retractions,
compaction, snapshot time travel, lineage) are format-independent; this
module isolates the PHYSICAL layer — manifest read/write + file layout —
behind :class:`StorageLayout` so a table-format backend can replace the
hand-rolled parquet+JSON implementation without touching store logic.

Default backend: :class:`ParquetManifestLayout`, the layout the store has
always written::

    <root>/_manifests/<batch_id>.json          one JSON manifest per batch
    <root>/data/batch=<id>/pred_bucket=*/...   partitioned parquet data
    <root>/retractions/batch=<id>/...          retraction key sets

Iceberg mapping (documented here because the sandbox has no network — the
runtime jar cannot be fetched via ``spark.jars.packages``; probing
repo1.maven.org fails at connect. On a real cluster,
:class:`IcebergLayout` is the integration point):

| graph store concept                  | Iceberg equivalent                 |
|--------------------------------------|------------------------------------|
| ``_manifests/<id>.json`` commit       | snapshot commit (manifest list)    |
| ``materialize`` idempotent batch      | append snapshot + ``wap.id``-style |
|                                       | idempotency key in snapshot summary|
| retraction batch (term-keyed rows)    | equality-delete file on the same   |
|                                       | key columns                        |
| ``compact`` (rewrite + shadow)        | ``rewrite_data_files`` action; the |
|                                       | shadow list = replaced data files  |
| ``expire_snapshots`` / ``vacuum``     | ``expire_snapshots`` procedure     |
| ``snapshots_as_of`` time travel       | ``VERSION AS OF``/``TIMESTAMP AS   |
|                                       | OF`` reads                         |
| ``pred_bucket`` salted partitioning   | partition spec                     |
|                                       | ``bucket(N, pred), bucket(M, subj)``|
| per-batch ``lineage`` dict            | snapshot summary properties        |

To enable on a cluster with the jar available::

    spark = (SparkSession.builder
        .config("spark.jars.packages",
                "org.apache.iceberg:iceberg-spark-runtime-4.0_2.13:1.8.0")
        .config("spark.sql.extensions",
                "org.apache.iceberg.spark.extensions"
                ".IcebergSparkSessionExtensions")
        .config("spark.sql.catalog.graft",
                "org.apache.iceberg.spark.SparkCatalog")
        .config("spark.sql.catalog.graft.type", "hadoop")
        .config("spark.sql.catalog.graft.warehouse", "<root>")
        .getOrCreate())

then ``set_layout(IcebergLayout("graft"))``.
"""

from __future__ import annotations

import json
import os
from typing import Optional


class StorageLayout:
    """Physical-layer interface: manifest IO + data-file layout. Every
    path the graph store touches goes through one of these methods."""

    # --- manifests ---------------------------------------------------------
    def manifest_dir(self, root: str) -> str:
        raise NotImplementedError

    def read_manifests(self, root: str) -> list[dict]:
        raise NotImplementedError

    def read_manifest(self, root: str, batch_id: str) -> dict:
        raise NotImplementedError

    def write_manifest(self, root: str, batch_id: str,
                       manifest: dict) -> None:
        """MUST be atomic: a crashed writer never leaves a half manifest
        visible (Iceberg: the snapshot commit's atomic swap)."""
        raise NotImplementedError

    # --- data layout -------------------------------------------------------
    def data_path(self, root: str, batch_id: str) -> str:
        raise NotImplementedError

    def retraction_path(self, root: str, batch_id: str) -> str:
        raise NotImplementedError


class ParquetManifestLayout(StorageLayout):
    """The store's native layout: JSON manifests + partitioned parquet,
    atomic via ``os.replace`` of a temp file (object stores: PUT-if-absent
    or a commit service stands in)."""

    def manifest_dir(self, root: str) -> str:
        return os.path.join(root, "_manifests")

    def read_manifests(self, root: str) -> list[dict]:
        mdir = self.manifest_dir(root)
        if not os.path.isdir(mdir):
            return []
        out = []
        for fn in os.listdir(mdir):
            if fn.endswith(".json"):
                with open(os.path.join(mdir, fn)) as f:
                    out.append(json.load(f))
        return out

    def read_manifest(self, root: str, batch_id: str) -> dict:
        with open(os.path.join(self.manifest_dir(root),
                               f"{batch_id}.json")) as f:
            return json.load(f)

    def write_manifest(self, root: str, batch_id: str,
                       manifest: dict) -> None:
        mdir = self.manifest_dir(root)
        os.makedirs(mdir, exist_ok=True)
        tmp = os.path.join(mdir, f".{batch_id}.json.tmp")
        with open(tmp, "w") as f:
            json.dump(manifest, f, indent=2)
        os.replace(tmp, os.path.join(mdir, f"{batch_id}.json"))

    def data_path(self, root: str, batch_id: str) -> str:
        return os.path.join(root, "data", f"batch={batch_id}")

    def retraction_path(self, root: str, batch_id: str) -> str:
        return os.path.join(root, "retractions", f"batch={batch_id}")


class IcebergLayout(StorageLayout):
    """Iceberg backend stub — the documented integration point (module
    docstring carries the full concept mapping). Instantiating it without
    the Iceberg runtime on the session classpath raises immediately with
    the enablement recipe, so a misconfigured cluster fails loudly at
    setup, not mid-write."""

    def __init__(self, catalog: str = "graft",
                 spark: Optional["object"] = None):
        self.catalog = catalog
        if spark is not None:
            jars = spark.conf.get("spark.jars.packages", "")
            ext = spark.conf.get("spark.sql.extensions", "")
            if "iceberg" not in (jars + ext).lower():
                raise RuntimeError(
                    "IcebergLayout needs the Iceberg Spark runtime on the "
                    "classpath — add spark.jars.packages="
                    "org.apache.iceberg:iceberg-spark-runtime-4.0_2.13:"
                    "<version> and the IcebergSparkSessionExtensions "
                    "(see rdf_tabular_spark/sinks/physical.py docstring)")

    def _todo(self):
        raise NotImplementedError(
            "Iceberg runtime jar is not available in this sandbox (no "
            "network to repo1.maven.org); see the module docstring of "
            "rdf_tabular_spark/sinks/physical.py for the full store-to-"
            "Iceberg concept mapping and the enablement recipe")

    def manifest_dir(self, root):
        self._todo()

    def read_manifests(self, root):
        self._todo()

    def read_manifest(self, root, batch_id):
        self._todo()

    def write_manifest(self, root, batch_id, manifest):
        self._todo()

    def data_path(self, root, batch_id):
        self._todo()

    def retraction_path(self, root, batch_id):
        self._todo()


_LAYOUT: StorageLayout = ParquetManifestLayout()


def get_layout() -> StorageLayout:
    return _LAYOUT


def set_layout(layout: StorageLayout) -> StorageLayout:
    """Swap the store's physical backend (returns the previous one)."""
    global _LAYOUT
    prev, _LAYOUT = _LAYOUT, layout
    return prev
