"""StorageLayout seam (r5): the graph store's physical layer routes
through physical.get_layout(), a custom layout actually receives the
calls, and the Iceberg stub fails loudly with the enablement recipe."""

import json
import os

import pytest

from rdf_tabular_spark.sinks import physical as P


def test_default_layout_is_parquet_manifest():
    assert isinstance(P.get_layout(), P.ParquetManifestLayout)


def test_parquet_layout_atomic_manifest_roundtrip(tmp_path):
    lay = P.ParquetManifestLayout()
    root = str(tmp_path)
    lay.write_manifest(root, "b1", {"batch_id": "b1", "status": "committed"})
    assert lay.read_manifest(root, "b1")["status"] == "committed"
    assert [m["batch_id"] for m in lay.read_manifests(root)] == ["b1"]
    # no temp residue after the atomic swap
    assert all(not f.startswith(".") for f in
               os.listdir(lay.manifest_dir(root)))
    assert lay.data_path(root, "b1").endswith("data/batch=b1")
    assert lay.retraction_path(root, "b1").endswith("retractions/batch=b1")


def test_store_routes_through_swapped_layout(spark, tmp_path):
    """materialize + read-back over a RECORDING layout: every physical
    touch goes through the seam, none bypasses it."""
    from rdf_tabular_spark.sinks.graph_store import materialize, read_graph

    calls = []

    class Recording(P.ParquetManifestLayout):
        def write_manifest(self, root, batch_id, manifest):
            calls.append(("write_manifest", batch_id))
            super().write_manifest(root, batch_id, manifest)

        def read_manifests(self, root):
            calls.append(("read_manifests",))
            return super().read_manifests(root)

        def data_path(self, root, batch_id):
            calls.append(("data_path", batch_id))
            return super().data_path(root, batch_id)

    prev = P.set_layout(Recording())
    try:
        df = spark.createDataFrame(
            [("s", "p", "o", False, None, None, "u", 0)],
            "subj string, pred string, obj string, obj_is_iri boolean, "
            "obj_datatype string, obj_lang string, table_url string, "
            "source_num long")
        root = str(tmp_path / "store")
        m = materialize(df, root, "b1")
        assert m["n_triples"] == 1
        assert read_graph(spark, root).count() == 1
        assert ("write_manifest", "b1") in calls
        assert ("data_path", "b1") in calls
        assert ("read_manifests",) in calls
    finally:
        P.set_layout(prev)


def test_iceberg_stub_raises_with_recipe():
    lay = P.IcebergLayout()
    with pytest.raises(NotImplementedError, match="Iceberg runtime jar"):
        lay.manifest_dir("/x")
    with pytest.raises(NotImplementedError, match="concept mapping"):
        lay.write_manifest("/x", "b", {})


def test_iceberg_layout_rejects_unconfigured_session(spark):
    with pytest.raises(RuntimeError, match="spark.jars.packages"):
        P.IcebergLayout(spark=spark)
