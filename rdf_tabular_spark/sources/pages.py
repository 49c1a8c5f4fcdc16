"""Deterministic synthetic Common-Crawl-style pages table.

Input-table shape per BASELINE.json input_hint:
(url:string, warc_ts:timestamp, html:binary, text:string, lang:string).

No external data: pages are synthesized distributively (spark.range →
mapInPandas) from seeded word lists. Each page embeds a data table as HTML
(with a CSVW metadata <script>) plus prose and schema.org microdata; ``text``
is the output of the SAME extraction rule the pipeline uses
(html_extract.extract_page), making the byte-identical-text invariant
end-to-end checkable. Host distribution is Zipf-skewed to exercise the salted
repartition path.
"""

from __future__ import annotations

import datetime
import json
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import (BinaryType, StringType, StructField, StructType,
                               TimestampType)

from .html_extract import extract_page

PAGES_SCHEMA = StructType([
    StructField("url", StringType(), False),
    StructField("warc_ts", TimestampType(), False),
    StructField("html", BinaryType(), False),
    StructField("text", StringType(), False),
    StructField("lang", StringType(), False),
])

# seeded vocabularies (deterministic; used for data AND the entity dictionary)
SPECIES = ["Celtis australis", "Liquidambar styraciflua", "Robinia pseudoacacia",
           "Quercus rubra", "Acer platanoides", "Tilia cordata", "Platanus acerifolia",
           "Fraxinus excelsior", "Ginkgo biloba", "Ulmus americana", "Pinus sylvestris",
           "Betula pendula", "Fagus sylvatica", "Carpinus betulus", "Sorbus aucuparia",
           "Prunus serrulata"]
STREETS = ["ADDISON AV", "EMERSON ST", "BRYANT ST", "UNIVERSITY AV", "HAMILTON AV",
           "MIDDLEFIELD RD", "WAVERLEY ST", "COWPER ST", "RAMONA ST", "FOREST AV",
           "CHANNING AV", "LYTTON AV", "HIGH ST", "ALMA ST", "EL CAMINO REAL", "PAGE MILL RD"]
CYCLES = ["Large Tree Routine Prune", "Young Tree Training", "Hazard Removal",
          "Crown Reduction", "Deadwood Removal", "Structural Prune", "Palm Prune",
          "Root Prune"]
LANGS = ["en", "en", "en", "en", "de", "fr", "es", "it"]

_META_TEMPLATE = {
    "@context": ["http://www.w3.org/ns/csvw", {"@language": "en"}],
    "url": "",
    "tableSchema": {
        "columns": [
            {"name": "GID", "title": "GID", "datatype": "string", "required": True},
            {"name": "on_street", "title": "On Street", "datatype": "string"},
            {"name": "species", "title": "Species", "datatype": "string"},
            {"name": "trim_cycle", "title": "Trim Cycle", "datatype": "string"},
            {"name": "inventory_date", "title": "Inventory Date",
             "datatype": {"base": "date", "format": "M/d/yyyy"}},
            {"name": "dbh", "title": "DBH", "datatype": "integer"},
        ],
        "primaryKey": "GID",
        "aboutUrl": "#gid-{GID}",
    },
}

N_HOSTS_DEFAULT = 1000
ZIPF_S = 1.5


def _u(ids: np.ndarray, salt: int) -> np.ndarray:
    """Deterministic uniform [0,1) per id (Knuth multiplicative hash)."""
    x = (ids.astype(np.uint64) * np.uint64(2654435761) + np.uint64(salt * 0x9E3779B9)) & np.uint64(0xFFFFFFFF)
    x ^= x >> np.uint64(16)
    x = (x * np.uint64(0x45D9F3B)) & np.uint64(0xFFFFFFFF)
    x ^= x >> np.uint64(16)
    return x.astype(np.float64) / float(1 << 32)


def _zipf_rank(u: np.ndarray, n: int, s: float = ZIPF_S) -> np.ndarray:
    """Inverse-CDF Zipf-ish rank in [0, n): rank ~ u^(-1/(s-1)) - 1."""
    r = np.floor(np.power(1.0 - u, -1.0 / (s - 1.0)) - 1.0).astype(np.int64)
    return np.clip(r, 0, n - 1)


def build_page_html(page_id: int, host: str, rows: list[list[str]], lang: str,
                    with_microdata: bool) -> str:
    meta = dict(_META_TEMPLATE)
    meta_json = json.dumps(meta, ensure_ascii=False)
    cells = "\n".join(
        "<tr>" + "".join(f"<td>{c}</td>" for c in r) + "</tr>" for r in rows
    )
    micro = ""
    if with_microdata:
        sp = rows[0][2] if rows else "Tree"
        micro = (f'<div itemscope itemtype="http://schema.org/Place">'
                 f'<span itemprop="name">{rows[0][1] if rows else "street"}</span>'
                 f'<span itemprop="containsPlace">{sp}</span></div>')
    return (
        "<html><head><title>Tree inventory page {pid}</title>"
        '<script type="application/csvw+json">{meta}</script></head>'
        "<body><h1>Street tree operations {pid}</h1>"
        "<p>Municipal tree maintenance records published by {host}.</p>"
        '<table id="data"><tr><th>GID</th><th>On Street</th><th>Species</th>'
        "<th>Trim Cycle</th><th>Inventory Date</th><th>DBH</th></tr>"
        "{cells}</table>{micro}"
        "<p>Records: {n}. Data quality verified.</p></body></html>"
    ).format(pid=page_id, meta=meta_json, host=host, cells=cells, micro=micro, n=len(rows))


def _page_rows(page_id: int, n_rows: int) -> list[list[str]]:
    out = []
    for j in range(n_rows):
        k = page_id * 7 + j
        date = "%d/%d/%d" % (1 + (k * 5) % 12, 1 + (k * 11) % 28, 2005 + k % 20)
        out.append([
            str(page_id * 100 + j),
            STREETS[k % len(STREETS)],
            SPECIES[(k * 3) % len(SPECIES)],
            CYCLES[(k * 5) % len(CYCLES)],
            date,
            str(5 + (k * 13) % 60),
        ])
    return out


def synth_pages(spark: SparkSession, n_pages: int, seed: int = 42,
                n_hosts: int = N_HOSTS_DEFAULT, partitions: int | None = None,
                dup_fraction: float = 0.12) -> DataFrame:
    """→ deterministic pages DataFrame. ``dup_fraction`` of pages are
    near-duplicates of an earlier page (same table, different prose host) to
    exercise dedup/canonicalization."""
    base_ts = datetime.datetime(2024, 1, 1)
    rng_seed = seed

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids = pdf["id"].to_numpy()
            u_host = _u(ids, rng_seed)
            u_rows = _u(ids, rng_seed + 1)
            u_lang = _u(ids, rng_seed + 2)
            u_dup = _u(ids, rng_seed + 3)
            host_ranks = _zipf_rank(u_host, n_hosts)
            out = {k: [] for k in ("url", "warc_ts", "html", "text", "lang")}
            for i, pid in enumerate(ids):
                pid = int(pid)
                is_dup = pid > 10 and u_dup[i] < dup_fraction
                content_id = (pid % 10) if is_dup else pid  # dup of an early page
                host = f"host{int(host_ranks[i]):04d}.example.org"
                url = f"https://{host}/trees/page-{pid}"
                n_rows = 3 + int(u_rows[i] * 9)
                rows = _page_rows(content_id, n_rows if not is_dup else 3 + (content_id % 10))
                lang = LANGS[int(u_lang[i] * len(LANGS))]
                html = build_page_html(content_id, host, rows, lang,
                                       with_microdata=(pid % 3 == 0))
                out["url"].append(url)
                out["warc_ts"].append(base_ts + datetime.timedelta(seconds=pid % 86400))
                out["html"].append(html.encode("utf-8"))
                out["text"].append(extract_page(html).text)
                out["lang"].append(lang)
            yield pd.DataFrame(out)

    from ..session import ensure_package_on_executors
    ensure_package_on_executors(spark)
    rng = spark.range(0, n_pages, numPartitions=partitions or max(8, n_pages // 20000))
    return rng.mapInPandas(gen, schema=PAGES_SCHEMA)


DOC_PAGE_META = {
    "url": "http://pages.example.org/",
    "tableSchema": {
        "columns": [
            {"name": "doc_id", "title": "doc_id"},
            {"name": "lang", "title": "lang"},
            {"name": "source", "title": "source"},
            {"name": "n_chars", "title": "n_chars"},
        ],
        "aboutUrl": "#doc-{doc_id}",
    },
}


def doc_page_url(doc_id: int) -> str:
    return f"http://pages.example.org/doc/{doc_id}"


def pages_from_documents(docs: DataFrame) -> DataFrame:
    """documents(doc_id, text, lang, source, n_chars) → pages table whose HTML
    embeds one single-row data table per document.

    This is the oracle-checkable web fixture: the expected triples of
    ``pages_to_triples`` over these pages are computable in plain SQL from
    the documents table (see queries.kg_pages_triples), so the whole
    HTML-build → extract → CSVW-kernel path is verified end-to-end by the
    DuckDB cross-check. Narrow Arrow stage, deterministic, no external data.
    """
    base_ts = datetime.datetime(2024, 1, 1)

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {k: [] for k in ("url", "warc_ts", "html", "text", "lang")}
            for did, text, lang, source, n_chars in zip(
                    pdf["doc_id"], pdf["text"], pdf["lang"], pdf["source"], pdf["n_chars"]):
                did = int(did)
                url = doc_page_url(did)
                # schema.org JSON-LD block (stage 1d coverage): every value
                # is a deterministic function of the documents row, so the
                # expected triples are plain SQL (queries.kg_jsonld_triples)
                jld = json.dumps({
                    "@context": "http://schema.org/",
                    "@id": f"{url}#jld",
                    "@type": "Article",
                    "headline": f"doc {did}",
                    "wordCount": int(n_chars),
                    "inLanguage": {"@value": str(lang), "@language": str(lang)},
                    "author": {"@id": f"{url}#author", "name": str(source)},
                }, ensure_ascii=False)
                html = (
                    "<html><head><title>Doc {d}</title>"
                    # canonical groups of 5 (publisher-declared dedup tier)
                    # + robots directives on every 7th-ish page — both are
                    # deterministic functions of doc_id, so the head-meta
                    # and canonical-group oracles are plain SQL
                    '<link rel="canonical" href="/doc/{canon}">'
                    '<meta name="robots" content="{robots}">'
                    '<meta property="og:title" content="Doc {d}">'
                    '<meta property="og:locale" content="{l}">'
                    '<script type="application/ld+json">{jld}</script>'
                    "</head><body>"
                    "<h1>Document {d}</h1>"
                    "<table><tr><th>doc_id</th><th>lang</th><th>source</th><th>n_chars</th></tr>"
                    "<tr><td>{d}</td><td>{l}</td><td>{s}</td><td>{n}</td></tr></table>"
                    '<div itemscope itemid="{u}#item" itemtype="http://schema.org/CreativeWork">'
                    '<span itemprop="name">doc {d}</span>'
                    '<span itemprop="inLanguage">{l}</span></div>'
                    "{link}<p>{t}</p></body></html>"
                ).format(d=did, l=lang, s=source, n=int(n_chars), t=text, u=url,
                         jld=jld, canon=did - did % 5,
                         robots=("noindex,nofollow" if did % 7 == 3
                                 else "index,follow"),
                         # parent link — gives the link graph the same tree
                         # shape the SQL oracle already predicts; the anchor
                         # text is the parent's microdata name, so the
                         # anchor-aggregation oracle is SQL-computable too
                         link=(f'<a href="/doc/{did // 2}">doc {did // 2}</a>'
                               if did > 0 else ""))
                out["url"].append(url)
                out["warc_ts"].append(base_ts + datetime.timedelta(seconds=did % 86400))
                out["html"].append(html.encode("utf-8"))
                out["text"].append(extract_page(html).text)
                out["lang"].append(str(lang))
            yield pd.DataFrame(out)

    from ..session import ensure_package_on_executors
    ensure_package_on_executors(docs.sparkSession)
    return docs.mapInPandas(gen, schema=PAGES_SCHEMA)


def entity_dictionary() -> dict[str, str]:
    """Deterministic broadcast entity dictionary: surface form → canonical IRI
    (species + streets) for stage-2 mention detection / link scoring."""
    ents = {}
    for i, s in enumerate(SPECIES):
        ents[s] = f"https://kg.example.org/entity/species/{i:03d}"
    for i, s in enumerate(STREETS):
        ents[s] = f"https://kg.example.org/entity/street/{i:03d}"
    return ents
