"""JSONL pages source: round-trip identity with the pages table and
end-to-end compatibility with the triple pipeline."""

import os

from pyspark.sql import functions as F

from rdf_tabular_spark.sources.jsonl import read_pages_jsonl, write_pages_jsonl
from rdf_tabular_spark.sources.pages import DOC_PAGE_META, pages_from_documents

SF_DIR = "/root/testdata/sf0.001"


def _pages(spark, n=40):
    docs = (spark.read.parquet(f"{SF_DIR}/documents.parquet")
            .filter(f"doc_id < {n}"))
    return pages_from_documents(docs)


def test_jsonl_roundtrip_byte_identical(spark, tmp_path):
    path = os.path.join(str(tmp_path), "dump")
    orig = _pages(spark).cache()
    write_pages_jsonl(orig, path)
    back = read_pages_jsonl(spark, path)
    # JSON reads are nullable; compare names and types
    assert [(f.name, f.dataType) for f in back.schema] \
        == [(f.name, f.dataType) for f in orig.schema]
    a = {r["url"]: r for r in orig.collect()}
    b = {r["url"]: r for r in back.collect()}
    assert a.keys() == b.keys()
    for u in a:
        assert bytes(b[u]["html"]) == bytes(a[u]["html"])  # byte-identical
        assert b[u]["text"] == a[u]["text"]
        assert b[u]["warc_ts"] == a[u]["warc_ts"]
        assert b[u]["lang"] == a[u]["lang"]
    orig.unpersist()


def test_jsonl_pages_to_triples(spark, tmp_path):
    from rdf_tabular_spark.web import pages_to_triples
    path = os.path.join(str(tmp_path), "dump")
    write_pages_jsonl(_pages(spark), path)
    triples = pages_to_triples(read_pages_jsonl(spark, path), minimal=True,
                               default_meta=DOC_PAGE_META)
    assert triples.count() == 40 * 4
    # decode stays JVM-side: no Python stage before the Arrow kernel
    direct = pages_to_triples(_pages(spark), minimal=True,
                              default_meta=DOC_PAGE_META)
    assert (sorted(map(tuple, triples.select("subj", "pred", "obj").collect()))
            == sorted(map(tuple, direct.select("subj", "pred", "obj").collect())))
