"""WARC source: archives → pages table, byte-identical html/text, gzip and
truncation tolerance, end-to-end into the triple pipeline."""

import gzip
import os

from rdf_tabular_spark.sources.pages import DOC_PAGE_META, pages_from_documents
from rdf_tabular_spark.sources.warc import (parse_warc_bytes, read_warc,
                                            write_warc)

SF_DIR = "/root/testdata/sf0.001"


def _pages_rows(spark, n=20):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet") \
        .filter(f"doc_id < {n}")
    return [(r["url"], r["warc_ts"], bytes(r["html"]), r["text"], r["lang"])
            for r in pages_from_documents(docs).collect()]


def test_warc_roundtrip_plain_and_gzip(spark, tmp_path):
    rows = _pages_rows(spark)
    plain = str(tmp_path / "a.warc")
    gz = str(tmp_path / "b.warc.gz")
    write_warc(rows, plain)
    write_warc(rows, gz, compress=True)

    for path in (plain, gz):
        got = {r["url"]: r for r in read_warc(spark, path).collect()}
        assert len(got) == len(rows)
        for url, ts, html, text, _lang in rows:
            g = got[url]
            assert bytes(g["html"]) == html          # byte-identical payload
            assert g["text"] == text                 # same extraction rule
            assert g["warc_ts"] == ts


def test_warc_skips_non_response_and_truncation(tmp_path):
    rows = _rows = [("http://h/1",
                     __import__("datetime").datetime(2024, 1, 2),
                     b"<p>x</p>", "x", "und")]
    p = str(tmp_path / "t.warc")
    write_warc(rows, p)
    raw = open(p, "rb").read()
    # warcinfo record is skipped; truncating mid-record keeps earlier ones
    assert len(parse_warc_bytes(raw)) == 1
    assert parse_warc_bytes(raw[:len(raw) - 30]) == []  # response truncated
    assert parse_warc_bytes(raw + b"garbage") == parse_warc_bytes(raw)


def test_warc_to_triples_end_to_end(spark, tmp_path):
    """Raw archive → pages → stage-1+2 triples matches the parquet path."""
    from rdf_tabular_spark.web import pages_to_triples
    rows = _pages_rows(spark, n=10)
    p = str(tmp_path / "c.warc.gz")
    write_warc(rows, p, compress=True)
    pages = read_warc(spark, p)
    triples = pages_to_triples(pages, minimal=True,
                               default_meta=DOC_PAGE_META)
    got = {(r["subj"], r["pred"], r["obj"]) for r in triples.collect()}
    assert len(got) == 10 * 4  # 4 cell triples per single-row page
    assert any(p.endswith("#lang") for _, p, _ in got)


def test_extract_cli_accepts_warc(spark, tmp_path):
    """jobs/extract.py --warc runs the full pipeline from a raw archive
    (in-process main(), no spark-submit needed for the arg plumbing)."""
    import json as _json
    from rdf_tabular_spark.jobs.extract import main
    rows = _pages_rows(spark, n=8)
    warc = str(tmp_path / "seg.warc.gz")
    write_warc(rows, warc, compress=True)
    out = str(tmp_path / "graph")
    manifest = main(["--warc", warc, "--out", out, "--batch-id", "w1",
                     "--no-canonicalize"])
    assert manifest["status"] == "committed"
    assert manifest["n_triples"] > 0
