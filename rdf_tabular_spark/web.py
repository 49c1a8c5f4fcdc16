"""Web-scale KG-construction pipeline over Common-Crawl-style pages.

north_rule stages:
  1. pages(url, warc_ts, html, text, lang) → virtual rows (sources/html_extract)
  2. CSVW mapping rules → triples (this module) + mention detection /
     entity-link scoring against a broadcast entity dictionary
  3. canonicalization: MinHash-LSH blocking + connected components
     (operators/minhash.py, operators/components.py)
  4. materialize deduplicated triples into partitioned graph tables
     (sinks/graph_store.py)

All per-row logic runs inside Arrow-batched mapInPandas kernels; stages 1+2
fuse into ONE narrow pass over the pages table (no shuffle until the
canonicalization groupBy), which is what survives a 10^12-document scan:
the cost is a single read of the html column + CPU, embarrassingly parallel.
"""

from __future__ import annotations

import json
from typing import Iterator, Optional

import pandas as pd
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .csvw.model import load_metadata
from .operators.triples import (TRIPLE_SCHEMA, TripleKernel,
                                compile_mapping)
from .session import ensure_package_on_executors

KG_MENTIONS = "https://kg.example.org/ontology#mentions"
KG_RELATED = "https://kg.example.org/ontology#relatedTo"

# executor-global cache: metadata JSON string → compiled TripleKernel
_KERNEL_CACHE: dict[str, TripleKernel] = {}


def _kernel_for_meta(meta_json: str, minimal: bool) -> TripleKernel:
    key = f"{minimal}:{meta_json}"
    k = _KERNEL_CACHE.get(key)
    if k is None:
        raw = json.loads(meta_json)
        table = load_metadata(raw, base=raw.get("url") or "http://page.invalid/")
        mapping = compile_mapping(table, minimal=minimal)
        k = _KERNEL_CACHE[key] = TripleKernel(mapping)
    return k


def pages_to_triples(pages: DataFrame, minimal: bool = True,
                     default_meta: Optional[dict] = None,
                     header_rows: int = 1) -> DataFrame:
    """Stages 1+2 fused: html → virtual rows → triples, one Arrow pass.

    Per-page CSVW metadata comes from the embedded
    ``<script type="application/csvw+json">`` block (falling back to
    ``default_meta``); kernels are compiled once per distinct metadata
    document and reused across pages (cache hit ≈ always at web scale).
    """
    spark = pages.sparkSession
    ensure_package_on_executors(spark)
    default_meta_json = json.dumps(default_meta) if default_meta else None

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from .sources.html_extract import extract_page, _decode
        cols = ["subj", "pred", "obj", "obj_is_iri", "obj_datatype", "obj_lang"]
        for pdf in batches:
            out: list[tuple] = []
            urls: list[str] = []
            srcs: list[int] = []
            for url, html in zip(pdf["url"], pdf["html"]):
                page = extract_page(_decode(html))
                _emit_table_triples(page, url, default_meta_json, minimal,
                                    header_rows, out, urls, srcs)
            res = pd.DataFrame(out, columns=cols)
            res["table_url"] = pd.Series(urls, dtype="object")
            res["source_num"] = pd.Series(srcs, dtype="int64")
            yield res

    return pages.mapInPandas(kernel, schema=TRIPLE_SCHEMA)


RDF_TYPE = "http://www.w3.org/1999/02/22-rdf-syntax-ns#type"


def _emit_table_triples(page, url: str, default_meta_json: Optional[str],
                        minimal: bool, header_rows: int,
                        out: list, urls: list, srcs: list) -> None:
    """Shared per-page CSVW-table emission (single source of truth for the
    single-facet and fused kernels)."""
    meta_json = page.csvw_meta or default_meta_json
    if meta_json is None:
        return
    tk = _kernel_for_meta(meta_json, minimal)
    for t in page.tables:
        for i, row in enumerate(t.rows):
            if i < header_rows:
                continue
            ts = tk.row_triples(row, i - header_rows + 1, i + 1, url=url)
            out.extend(ts)
            urls.extend([url] * len(ts))
            srcs.extend([i + 1] * len(ts))


def _emit_microdata_triples(page, url: str,
                            out: list, urls: list, srcs: list) -> None:
    """Shared per-page microdata emission — mirrors the Column projection in
    :func:`microdata_to_triples` exactly (pred vocab resolution, skolem ids,
    per-(item,type,url) dedup == the projection's distinct, and NULL
    obj_is_iri for a NULL value, matching ``rlike`` null semantics).
    Multiset parity between this and the projection path is CI-tested."""
    import hashlib
    import re
    iri_re = re.compile(r"^https?://")
    vocab_re = re.compile(r"^(.*/)[^/]*$")
    uh = None
    seen_types: set[tuple] = set()
    n_md = 0
    for item in page.microdata:
        iid = item.item_id
        if iid.startswith("_:"):
            if uh is None:
                uh = hashlib.sha1(url.encode()).hexdigest()[:10]
            iid = f"_:md-{uh}-{item.item_id[2:]}"
        m = vocab_re.match(item.itemtype or "")
        vocab = m.group(1) if m else ""
        for prop, value in item.props:
            pred = prop if iri_re.match(prop) else (vocab or url + "#") + prop
            out.append((iid, pred, value,
                        None if value is None else bool(iri_re.match(value)),
                        None, None))
            n_md += 1
        if item.itemtype and (iid, item.itemtype) not in seen_types:
            seen_types.add((iid, item.itemtype))
            out.append((iid, RDF_TYPE, item.itemtype, True, None, None))
            n_md += 1
    urls.extend([url] * n_md)
    srcs.extend([0] * n_md)


def _emit_jsonld_triples(page, url: str,
                         out: list, urls: list, srcs: list) -> None:
    """Shared per-page JSON-LD emission — same expansion as
    :func:`pages_to_jsonld_triples` (sources/jsonld.expand_jsonld), with
    ``source_num`` = block index offset by -1..: blocks use negative
    source_nums (-1, -2, ...) so they never collide with table source rows
    or the microdata 0 sentinel."""
    from .sources.jsonld import expand_jsonld
    for i, block in enumerate(page.jsonld):
        ts = expand_jsonld(block, url)
        out.extend(ts)
        urls.extend([url] * len(ts))
        srcs.extend([-(i + 1)] * len(ts))


def _emit_rdfa_triples(page, url: str,
                       out: list, urls: list, srcs: list) -> None:
    """Shared per-page RDFa-lite emission — same subject resolution and
    IRI detection as :func:`rdfa_to_triples` (set-parity CI-tested);
    ``source_num`` 0 like the microdata facet."""
    import hashlib
    import re as _re
    seen_types = set()
    for item in page.rdfa:
        subj = item.subject
        if subj.startswith("_:"):
            uh = hashlib.sha1(url.encode()).hexdigest()[:10]
            subj = f"_:ra-{uh}-{item.subject[2:]}"
        elif subj.startswith("#"):
            subj = url + subj
        for prop, value in item.props:
            out.append((subj, prop, value,
                        bool(_re.match(r"https?://", value)), None, None))
            urls.append(url)
            srcs.append(0)
        for t in item.types.split():
            if (subj, t) in seen_types:
                continue
            seen_types.add((subj, t))
            out.append((subj, RDF_TYPE, t, True, None, None))
            urls.append(url)
            srcs.append(0)


def pages_to_combined_triples(pages: DataFrame, minimal: bool = True,
                              default_meta: Optional[dict] = None,
                              header_rows: int = 1,
                              respect_noindex: bool = False) -> DataFrame:
    """Stages 1+1b+1d+1e+2 in ONE Arrow pass: each page's HTML is parsed
    ONCE and the CSVW-table triples, the microdata triples, the embedded
    JSON-LD triples, and the RDFa-lite triples are all emitted from the
    same ``extract_page`` result.

    The separate operators (:func:`pages_to_triples`,
    :func:`microdata_to_triples`) parse every page twice — two full scans
    of the corpus and two HTML parses per page, plus a distinct-shuffle
    for the microdata type triples. At 10^12 documents stage 1 is the
    dominant cost, so the pipeline uses this fused kernel; the separate
    operators remain the oracle-checked single-facet tiers, and
    set-parity between the two paths is CI-tested
    (test_web_pipeline.test_combined_parity). The in-kernel per-page type
    dedup is equivalent to the projection's distinct over
    (item_id, itemtype, url): skolemized item ids are url-scoped and the
    distinct includes the url."""
    spark = pages.sparkSession
    ensure_package_on_executors(spark)
    default_meta_json = json.dumps(default_meta) if default_meta else None

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from .sources.html_extract import extract_page, _decode
        cols = ["subj", "pred", "obj", "obj_is_iri", "obj_datatype", "obj_lang"]
        for pdf in batches:
            out: list[tuple] = []
            urls: list[str] = []
            srcs: list[int] = []
            for url, html in zip(pdf["url"], pdf["html"]):
                page = extract_page(_decode(html))
                # robots compliance INSIDE the one parse — a pre-filter
                # would cost a second full parse pass + a semi-join
                if respect_noindex and _page_noindex(page):
                    continue
                _emit_table_triples(page, url, default_meta_json, minimal,
                                    header_rows, out, urls, srcs)
                _emit_microdata_triples(page, url, out, urls, srcs)
                _emit_jsonld_triples(page, url, out, urls, srcs)
                _emit_rdfa_triples(page, url, out, urls, srcs)
            res = pd.DataFrame(out, columns=cols)
            res["table_url"] = pd.Series(urls, dtype="object")
            res["source_num"] = pd.Series(srcs, dtype="int64")
            yield res

    return pages.mapInPandas(kernel, schema=TRIPLE_SCHEMA)


def microdata_to_triples(pages: DataFrame) -> DataFrame:
    """Stage 1b: schema.org microdata items → triples.

    Property IRIs resolve against the item's vocabulary (itemtype base, e.g.
    http://schema.org/), itemtype becomes an rdf:type triple, and values that
    look like IRIs stay IRIs. Narrow: extraction is the same Arrow kernel as
    the table path (sources/html_extract.pages_to_microdata), this is a pure
    projection on top.
    """
    from .sources.html_extract import pages_to_microdata
    md = pages_to_microdata(pages)
    vocab = F.regexp_extract("itemtype", r"^(.*/)[^/]*$", 1)
    pred = F.when(F.col("prop").rlike("^https?://"), F.col("prop")) \
        .otherwise(F.concat(F.when(vocab == "", F.concat(F.col("url"), F.lit("#")))
                            .otherwise(vocab), F.col("prop")))
    obj_is_iri = F.col("value").rlike("^https?://")
    props = md.select(
        F.col("item_id").alias("subj"), pred.alias("pred"),
        F.col("value").alias("obj"), obj_is_iri.alias("obj_is_iri"),
        F.lit(None).cast("string").alias("obj_datatype"),
        F.lit(None).cast("string").alias("obj_lang"),
        F.col("url").alias("table_url"),
        F.lit(0).cast("long").alias("source_num"))
    types = (md.filter(F.col("itemtype") != "")
             .select("item_id", "itemtype", "url").distinct()
             .select(F.col("item_id").alias("subj"),
                     F.lit(RDF_TYPE).alias("pred"),
                     F.col("itemtype").alias("obj"),
                     F.lit(True).alias("obj_is_iri"),
                     F.lit(None).cast("string").alias("obj_datatype"),
                     F.lit(None).cast("string").alias("obj_lang"),
                     F.col("url").alias("table_url"),
                     F.lit(0).cast("long").alias("source_num")))
    return props.unionByName(types)


def rdfa_to_triples(pages: DataFrame) -> DataFrame:
    """Stage 1d: RDFa-lite scopes → triples (the fourth structured-data
    facet next to tables, microdata, and JSON-LD).

    Predicates and types arrive already vocab/prefix-expanded from the
    parser; here fragment subjects (``#x``) resolve against the page url,
    each typeof token becomes one rdf:type triple, and values that look
    like IRIs stay IRIs.  Pure projection over the Arrow kernel
    (sources/html_extract.pages_to_rdfa) — same narrow discipline as
    :func:`microdata_to_triples`.
    """
    from .sources.html_extract import pages_to_rdfa
    rd = pages_to_rdfa(pages)
    subj = F.when(F.col("subject").startswith("#"),
                  F.concat(F.col("url"), F.col("subject"))) \
        .otherwise(F.col("subject"))
    obj_is_iri = F.col("value").rlike("^https?://")
    props = rd.filter(F.col("prop").isNotNull()).select(
        subj.alias("subj"), F.col("prop").alias("pred"),
        F.col("value").alias("obj"), obj_is_iri.alias("obj_is_iri"),
        F.lit(None).cast("string").alias("obj_datatype"),
        F.lit(None).cast("string").alias("obj_lang"),
        F.col("url").alias("table_url"),
        F.lit(0).cast("long").alias("source_num"))
    types = (rd.filter(F.col("typeof") != "")
             .select(subj.alias("subj"),
                     F.explode(F.split("typeof", " ")).alias("obj"), "url")
             .distinct()
             .select("subj", F.lit(RDF_TYPE).alias("pred"), "obj",
                     F.lit(True).alias("obj_is_iri"),
                     F.lit(None).cast("string").alias("obj_datatype"),
                     F.lit(None).cast("string").alias("obj_lang"),
                     F.col("url").alias("table_url"),
                     F.lit(0).cast("long").alias("source_num")))
    return props.unionByName(types)


def link_entities(triples: DataFrame, entity_dict: dict[str, str],
                  min_score: float = 0.5) -> DataFrame:
    """Stage 2b: mention detection + link scoring against a broadcast
    entity dictionary → (subj, kg:mentions, entity_iri) triples.

    The dictionary ships once per executor via broadcast (north_rule:
    "batched mention detection and entity-link scoring against a broadcast
    entity dictionary"); scoring is token-set Jaccard with an exact-match
    fast path, vectorized over Arrow batches. Narrow — no shuffle.
    """
    spark = triples.sparkSession
    ensure_package_on_executors(spark)
    bc = spark.sparkContext.broadcast(entity_dict)

    literals = triples.filter(~F.col("obj_is_iri") & F.col("obj").isNotNull())

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        ents: dict[str, str] = bc.value
        # token inverted index for fuzzy candidates, built once per task
        inv: dict[str, list[str]] = {}
        tokset: dict[str, frozenset] = {}
        for surface in ents:
            toks = frozenset(surface.lower().split())
            tokset[surface] = toks
            for t in toks:
                inv.setdefault(t, []).append(surface)
        cols = ["subj", "pred", "obj", "obj_is_iri", "obj_datatype", "obj_lang",
                "table_url", "source_num"]
        for pdf in batches:
            out: list[tuple] = []
            for subj, obj, turl, snum in zip(pdf["subj"], pdf["obj"],
                                             pdf["table_url"], pdf["source_num"]):
                iri = ents.get(obj)
                score = 1.0 if iri is not None else 0.0
                if iri is None:
                    otoks = frozenset(str(obj).lower().split())
                    cands: set[str] = set()
                    for t in otoks:
                        cands.update(inv.get(t, ()))
                    best, best_s = None, 0.0
                    for c in cands:
                        ct = tokset[c]
                        s = len(otoks & ct) / len(otoks | ct)
                        if s > best_s:
                            best, best_s = c, s
                    if best is not None and best_s >= min_score:
                        iri, score = ents[best], best_s
                if iri is not None:
                    out.append((subj, KG_MENTIONS, iri, True, None, None, turl, int(snum)))
            yield pd.DataFrame(out, columns=cols)

    # NB: no dropDuplicates here — dedup happens once, at materialization
    # (stage 4), so the only shuffles in the whole pipeline are the
    # canonicalization groupBys and the final dedup.
    return literals.mapInPandas(kernel, schema=TRIPLE_SCHEMA)


def link_entities_distributed(triples: DataFrame,
                              entities: DataFrame) -> DataFrame:
    """Stage 2b scale tier: entity dictionary as a DataFrame
    (surface: string, iri: string) instead of a driver broadcast dict —
    for dictionaries too large to broadcast (100M+ entities).

    Exact-surface tier only: one equi-join, which Catalyst broadcasts when
    the dictionary is small and shuffles (AQE skew-handled) when it is not.
    The fuzzy tier at this scale becomes MinHash blocking over surfaces —
    the same operators/minhash.py machinery as canonicalization.
    """
    literals = triples.filter(~F.col("obj_is_iri") & F.col("obj").isNotNull())
    hit = literals.join(entities, literals.obj == entities.surface)
    return hit.select(
        "subj", F.lit(KG_MENTIONS).alias("pred"),
        F.col("iri").alias("obj"), F.lit(True).alias("obj_is_iri"),
        F.lit(None).cast("string").alias("obj_datatype"),
        F.lit(None).cast("string").alias("obj_lang"),
        "table_url", "source_num")


LINKS_SCHEMA = "src string, dst string"


def _robots_directives(page) -> set:
    robots = next((v for k, v in page.meta if k == "robots"), "")
    return {d.strip().lower() for d in robots.split(",") if d.strip()}


def _page_nofollow(page) -> bool:
    return "nofollow" in _robots_directives(page)


def _page_noindex(page) -> bool:
    return "noindex" in _robots_directives(page)


def pages_to_links(pages: DataFrame,
                   respect_nofollow: bool = False) -> DataFrame:
    """Stage 1c: hyperlink graph extraction — ``<a href>`` targets resolved
    against the page URL → ``(src, dst)`` edges (the Common-Crawl link
    graph, the input to host-level PageRank / centrality).

    Same single-parse Arrow kernel family as table/microdata extraction
    (html_extract collects hrefs in the one pass both front-ends share);
    relative hrefs resolve via RFC 3986 urljoin. Narrow — no shuffle;
    dedup/aggregation is the consumer's choice.

    ``respect_nofollow=True`` drops every edge whose SOURCE page declares
    ``<meta name="robots" content="...nofollow...">`` — the page-level
    crawler-compliance contract — inside the same parse (no extra scan,
    no join against the head-meta table).
    """
    spark = pages.sparkSession
    ensure_package_on_executors(spark)

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from urllib.parse import urljoin

        from .sources.html_extract import _decode, extract_page
        for pdf in batches:
            src, dst = [], []
            for url, html in zip(pdf["url"], pdf["html"]):
                page = extract_page(_decode(html))
                if respect_nofollow and _page_nofollow(page):
                    continue
                for href in page.links:
                    src.append(url)
                    dst.append(urljoin(url, href))
            yield pd.DataFrame({"src": src, "dst": dst})

    return pages.mapInPandas(kernel, schema=LINKS_SCHEMA)


ANCHORS_SCHEMA = "src string, dst string, anchor string"


def pages_to_anchors(pages: DataFrame) -> DataFrame:
    """Stage 1c variant keeping the visible anchor text per ``<a href>`` —
    ``(src, dst, anchor)``. Anchor text is the classic external naming
    signal for entity canonicalization (how OTHER pages refer to a target),
    aggregated downstream per dst. Same single-parse kernel, narrow, no
    shuffle; unclosed anchors (no text boundary) are skipped, matching
    PageContent.anchors semantics."""
    spark = pages.sparkSession
    ensure_package_on_executors(spark)

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from urllib.parse import urljoin

        from .sources.html_extract import _decode, extract_page
        for pdf in batches:
            src, dst, anchor = [], [], []
            for url, html in zip(pdf["url"], pdf["html"]):
                for href, text in extract_page(_decode(html)).anchors:
                    src.append(url)
                    dst.append(urljoin(url, href))
                    anchor.append(text)
            yield pd.DataFrame({"src": src, "dst": dst, "anchor": anchor})

    return pages.mapInPandas(kernel, schema=ANCHORS_SCHEMA)


def anchor_labels(anchors: DataFrame, min_refs: int = 1) -> DataFrame:
    """Stage 2d: aggregated anchor text → ``rdfs:label`` triples — the
    web's external naming signal (how OTHER pages call a target) promoted
    into the KG. Per dst the majority anchor wins (count desc, anchor asc
    tie-break); empty anchors are ignored.

    Shape: one groupBy (dst, anchor) with map-side partial counts, then a
    per-dst row_number window — partition key is the full URL space, so
    the window never concentrates; both exchanges hash on dst."""
    from pyspark.sql import Window

    counted = (anchors.where(F.col("anchor") != "")
               .groupBy("dst", "anchor")
               .agg(F.count("*").alias("n_refs")))
    w = Window.partitionBy("dst").orderBy(F.desc("n_refs"), "anchor")
    best = (counted.withColumn("rn", F.row_number().over(w))
            .where((F.col("rn") == 1) & (F.col("n_refs") >= min_refs)))
    return best.select(
        F.col("dst").alias("subj"),
        F.lit("http://www.w3.org/2000/01/rdf-schema#label").alias("pred"),
        F.col("anchor").alias("obj"))


def pages_to_jsonld_triples(pages: DataFrame) -> DataFrame:
    """Stage 1d: embedded JSON-LD (``<script type="application/ld+json">``,
    the dominant structured-data carrier on the real web) → triples.

    The shared page parser captures script bodies in the same single pass
    as tables / microdata / links; ``sources.jsonld.expand_jsonld`` walks
    each block with JSON-LD-subset semantics mirroring the reference's
    common-property expansion (metadata.rb:806-839) — @context vocab /
    prefixes / @language, @graph, @id resolution against the page URL,
    @type, nested nodes as deterministic per-page bnodes, @value objects,
    xsd-typed scalars. Malformed blocks emit nothing (crawl robustness).

    Narrow Arrow stage, no shuffle; output is TRIPLE_SCHEMA with
    ``table_url`` = page url and ``source_num`` = negative block index
    (-1, -2, ... — never colliding with table source rows or the
    microdata 0 sentinel, and identical to the fused kernel's numbering),
    so the store / canonicalization stages downstream are shared verbatim.
    """
    spark = pages.sparkSession
    ensure_package_on_executors(spark)

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from .sources.html_extract import _decode, extract_page
        for pdf in batches:
            out: list[tuple] = []
            urls: list[str] = []
            srcs: list[int] = []
            for url, html in zip(pdf["url"], pdf["html"]):
                _emit_jsonld_triples(extract_page(_decode(html)), url,
                                     out, urls, srcs)
            cols = ["subj", "pred", "obj", "obj_is_iri", "obj_datatype",
                    "obj_lang"]
            res = pd.DataFrame(out, columns=cols)
            res["table_url"] = pd.Series(urls, dtype="object")
            res["source_num"] = pd.Series(srcs, dtype="int64")
            yield res

    return pages.mapInPandas(kernel, schema=TRIPLE_SCHEMA)


HEAD_META_SCHEMA = ("url string, title string, canonical string, "
                    "noindex boolean, nofollow boolean")


def pages_to_head_meta(pages: DataFrame) -> DataFrame:
    """Stage 1e: head metadata per page — ``(url, title, canonical,
    noindex, nofollow)``.

    ``canonical`` is the ``<link rel="canonical" href>`` target resolved
    RFC 3986-style against the page URL (NULL when the page declares
    none); ``noindex``/``nofollow`` come from the ``<meta name="robots">``
    directive list (comma-separated, case-insensitive — the de-facto
    crawler contract). Canonical-URL grouping is the FIRST dedup tier of
    a real crawl (publisher-declared duplicates, zero similarity compute)
    and robots directives are the first curation gate; both need only
    this narrow single-parse stage — no shuffle.
    """
    spark = pages.sparkSession
    ensure_package_on_executors(spark)

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from urllib.parse import urljoin

        from .sources.html_extract import _decode, extract_page
        for pdf in batches:
            rows = []
            for url, html in zip(pdf["url"], pdf["html"]):
                page = extract_page(_decode(html))
                directives = _robots_directives(page)
                rows.append((url, page.title,
                             urljoin(url, page.canonical)
                             if page.canonical else None,
                             "noindex" in directives,
                             "nofollow" in directives))
            yield pd.DataFrame(rows, columns=["url", "title", "canonical",
                                              "noindex", "nofollow"])

    return pages.mapInPandas(kernel, schema=HEAD_META_SCHEMA)


OG_NS = "https://ogp.me/ns#"


def pages_to_og_triples(pages: DataFrame) -> DataFrame:
    """Stage 1f: OpenGraph metadata (RDFa-lite ``<meta property="og:*"
    content>``, the third major structured-data carrier after JSON-LD and
    microdata) → triples: ``(page-url, https://ogp.me/ns#<local>,
    content)`` literals.

    Same single-parse capture list as the robots/description metas; the
    subject is the page URL itself (OpenGraph describes the page). Narrow
    Arrow stage, TRIPLE_SCHEMA output, ``source_num`` = position within
    the page's og tags."""
    spark = pages.sparkSession
    ensure_package_on_executors(spark)

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from .sources.html_extract import _decode, extract_page
        cols = [f.name for f in TRIPLE_SCHEMA]
        for pdf in batches:
            rows = []
            for url, html in zip(pdf["url"], pdf["html"]):
                n = 0
                for k, v in extract_page(_decode(html)).meta:
                    if k.startswith("og:"):
                        n += 1
                        rows.append((url, OG_NS + k[3:], v, False,
                                     None, None, url, n))
            yield pd.DataFrame(rows, columns=cols)

    return pages.mapInPandas(kernel, schema=TRIPLE_SCHEMA)


def canonical_groups(head_meta: DataFrame) -> DataFrame:
    """Publisher-declared dedup: pages grouped by their effective canonical
    URL (declared target, else self) → ``(canonical, n_pages,
    representative)``. One keyed shuffle with map-side partial aggs; the
    representative is the canonical member itself when crawled, else the
    lexical-min member (deterministic under retries)."""
    eff = head_meta.select(
        F.coalesce("canonical", "url").alias("canonical"), "url")
    return (eff.groupBy("canonical")
            .agg(F.count("*").cast("long").alias("n_pages"),
                 F.min(F.when(F.col("url") == F.col("canonical"),
                              F.col("url"))).alias("self_member"),
                 F.min("url").alias("min_member"))
            .select("canonical", "n_pages",
                    F.coalesce("self_member", "min_member")
                    .alias("representative")))


def host_link_graph(links: DataFrame) -> DataFrame:
    """Aggregate page-level edges to the host graph →
    ``(src_host, dst_host, n_links)`` — one shuffle on the host pair with
    map-side partial counts; self-loops (intra-host navigation) kept, the
    consumer filters. Host extraction is a JVM-side regexp."""
    host = r"^[a-z][a-z0-9+.-]*://([^/?#]+)"
    return (links
            .select(F.regexp_extract("src", host, 1).alias("src_host"),
                    F.regexp_extract("dst", host, 1).alias("dst_host"))
            .groupBy("src_host", "dst_host")
            .agg(F.count("*").cast("long").alias("n_links")))


def comention_pmi(docs: DataFrame, entities: list[str],
                  id_col: str = "doc_id", text_col: str = "text",
                  min_pairs: int = 2) -> DataFrame:
    """Stage 2c relation mining: entities co-mentioned in one document are
    candidate relation edges, scored by pointwise mutual information →
    ``(ent_a, ent_b, n_ab, pmi)`` with ``pmi = ln(n_ab·N / (n_a·n_b))``.

    Scale design: mention detection is a narrow explode+isin against the
    vocabulary-sized dictionary (no join), ONE distinct shuffle on
    ``(doc, ent)``, and pair generation is a *doc-keyed* self-join — the
    fan-out per document is bounded by mentions-per-doc², never corpus-wide.
    Entity marginals are vocabulary-sized and broadcast onto the pair
    aggregate. ``min_pairs`` prunes the long noise tail before the joins.
    """
    ments = (docs.select(F.col(id_col).alias("doc"),
                         F.explode(F.split(F.trim(F.col(text_col)), r"\s+"))
                         .alias("ent"))
             .filter(F.col("ent").isin(list(entities)))
             .distinct())
    n_docs = docs.count()
    marg = ments.groupBy("ent").agg(F.count("*").alias("n"))
    left = ments.select("doc", F.col("ent").alias("ent_a"))
    right = ments.select("doc", F.col("ent").alias("ent_b"))
    pairs = (left.join(right, "doc")
             .filter(F.col("ent_a") < F.col("ent_b"))
             .groupBy("ent_a", "ent_b").agg(F.count("*").alias("n_ab"))
             .filter(F.col("n_ab") >= min_pairs))
    ma = F.broadcast(marg.select(F.col("ent").alias("ent_a"),
                                 F.col("n").alias("n_a")))
    mb = F.broadcast(marg.select(F.col("ent").alias("ent_b"),
                                 F.col("n").alias("n_b")))
    pmi = F.round(F.log((F.col("n_ab").cast("double") * F.lit(float(n_docs)))
                        / (F.col("n_a").cast("double")
                           * F.col("n_b").cast("double"))), 4)
    return (pairs.join(ma, "ent_a").join(mb, "ent_b")
            .select("ent_a", "ent_b", "n_ab", pmi.alias("pmi")))


def comention_triples(docs: DataFrame, entities: dict[str, str],
                      min_pmi: float = 0.0, min_pairs: int = 2,
                      id_col: str = "doc_id",
                      text_col: str = "text") -> DataFrame:
    """Materialize positive-PMI co-mention edges as KG triples
    ``(entity_iri_a, kg:relatedTo, entity_iri_b)`` — the corpus-statistics
    enrichment layer on top of stage 2's per-page mention triples."""
    scored = comention_pmi(docs, list(entities), id_col, text_col, min_pairs)
    iri = F.create_map(*[F.lit(x) for kv in entities.items() for x in kv])
    return (scored.filter(F.col("pmi") >= min_pmi)
            .select(iri[F.col("ent_a")].alias("subj"),
                    F.lit(KG_RELATED).alias("pred"),
                    iri[F.col("ent_b")].alias("obj"),
                    F.lit(True).alias("obj_is_iri"),
                    F.lit(None).cast("string").alias("obj_datatype"),
                    F.lit(None).cast("string").alias("obj_lang"),
                    F.lit(None).cast("string").alias("table_url"),
                    F.lit(None).cast("long").alias("source_num")))


def _local_name(col):
    """IRI → page-agnostic local name (after last '#' or '/')."""
    return F.element_at(F.split(F.element_at(F.split(col, "#"), -1), "/"), -1)


def subject_profiles(triples: DataFrame) -> DataFrame:
    """Stage 3a: per-subject content profile for similarity blocking.

    Tokens are local-name(pred)=obj so that the same logical record extracted
    from two different page URLs (different absolute pred/subj IRIs) yields
    near-identical profiles. One groupBy shuffle on subj.
    """
    toks = (triples
            .filter(~F.col("obj_is_iri"))
            .select("subj", F.concat_ws("=", _local_name(F.col("pred")), F.col("obj")).alias("tok")))
    return (toks.groupBy("subj")
            .agg(F.concat_ws("|", F.array_sort(F.collect_list("tok"))).alias("profile")))


def canonicalize_subjects(triples: DataFrame, num_perm: int = 64,
                          num_bands: int = 8, threshold: float = 0.9,
                          max_bucket: int = 500,
                          releases: list | None = None,
                          min_band_matches: int = 2):
    """Stage 3: MinHash-LSH blocking + connected components → canonical ids.

    → (rewritten_triples, mapping(id, canonical_id)). Canonical id = lexical
    min of the cluster (deterministic). Only clustered subjects enter the
    mapping, so the rewrite is a broadcast join against the full stream.

    The mapping is materialized eagerly (localCheckpoint — it is tiny: only
    clustered subjects), so every persist upstream of it (profiles,
    member_map, sigs, LSH bands) is released before returning. The one
    persist that must outlive the call — ``triples``, scanned again by the
    caller's terminal action over the rewrite — is appended to ``releases``
    for the caller to unpersist (long-lived drivers would otherwise
    accumulate storage memory across batches); with ``releases=None`` it is
    left cached.
    """
    from .operators.components import canonical_mapping, rewrite_triples
    from .operators.minhash import minhash_signatures, signature_similarity_edges

    # Persist at every DAG-reuse boundary: ``triples`` feeds both the profile
    # aggregation and the final rewrite join — without the persist the whole
    # pages→triples extraction would run twice; ``sigs`` feeds the band join
    # (2 sides) and the verification join (2 more) — 4 recomputes of the
    # signature kernel otherwise. All persists are small relative to the
    # corpus (triples are post-extraction; sigs are id + k longs).
    from pyspark.sql.window import Window

    triples = triples.persist()
    if releases is not None:
        releases.append(triples)

    # Exact-first cascade: a web corpus is dominated by page-level duplicates
    # whose subjects have IDENTICAL profiles. Feeding those to LSH makes every
    # band bucket quadratic in the duplicate count (k identical signatures →
    # k²/2 candidate pairs × bands — the blowup that stalls the stage at
    # scale). One window pass tags every subject with its group's min-subject
    # representative (the identical-profile group IS a connected component —
    # no pairwise edges needed), and MinHash-LSH runs only over DISTINCT
    # profiles (the rep rows), where near-dup buckets are genuinely small.
    # A window (ONE shuffle of the profiles table) replaces the former
    # groupBy + re-join on the profile string (two shuffles, the long
    # profile strings crossing the wire twice — measured 1.9s → 0.2s at
    # 148k subjects, and the saving is a full shuffle of the corpus at
    # scale).
    member_map = (subject_profiles(triples)
                  .withColumn("rep", F.min("subj").over(
                      Window.partitionBy("profile")))
                  .persist())
    reps = (member_map.filter(F.col("subj") == F.col("rep"))
            .select("subj", "profile"))

    sigs = minhash_signatures(reps, "subj", "profile", num_perm=num_perm,
                              token_sep="|").persist()
    _owned = [member_map, sigs]
    try:
        # min_band_matches default 2: web-corpus profiles draw from small
        # vocabularies, so single-band collisions between genuinely
        # different records dominate the candidate set (measured: 3M pairs
        # for 1.3k true edges at 20k pages, and the verify join then
        # shuffles 64-long sig arrays per pair — 60 s of a 78 s stage).
        # Requiring 2 of 8 matching bands keeps recall ≥0.93 at the 0.9
        # threshold and cuts candidates ~50x. Recall-sensitive callers can
        # pass min_band_matches=1 to restore exhaustive banding (~8% more
        # recall at J=0.9, at the measured candidate-set cost above).
        edges = signature_similarity_edges(sigs, num_bands=num_bands,
                                           threshold=threshold,
                                           max_bucket=max_bucket,
                                           releases=_owned,
                                           min_band_matches=min_band_matches)
        rep_mapping = canonical_mapping(edges)  # rep → canonical (near-dup tier)
        mapping = (member_map
                   .join(rep_mapping, member_map.rep == rep_mapping.id, "left")
                   .select(F.col("subj").alias("id"),
                           F.coalesce("canonical_id", "rep").alias("canonical_id"))
                   .filter(F.col("id") != F.col("canonical_id")))
        # materialize the (tiny) mapping now so everything upstream of it can
        # be dropped from storage before this function returns
        mapping = mapping.localCheckpoint(eager=True)
    finally:
        for df in _owned:
            df.unpersist()
    return rewrite_triples(triples, mapping), mapping


def web_pipeline(spark: SparkSession, pages: DataFrame, out_root: str,
                 batch_id: str, entity_dict: Optional[dict[str, str]] = None,
                 canonicalize: bool = True, default_meta: Optional[dict] = None,
                 include_microdata: bool = True,
                 incremental_canonical: bool = False,
                 respect_noindex: bool = False) -> dict:
    """Full stage 1→4 run over a pages batch; returns the commit manifest.

    ``incremental_canonical``: subject identity becomes GLOBAL across
    batches — each batch's local mapping is union-find-merged into the
    store's persistent canonical map (snapshot-swapped parquet,
    ``graph_store.save_canonical_map``) and the batch's triples are
    rewritten with the MERGED map before materializing, so a duplicate
    first seen in batch 1 canonicalizes batch 9's subjects too (A~B in
    batch 1 + B~C in batch 2 ⇒ C→A, though no batch saw A with C).
    Already-materialized batches keep their committed ids; the map is the
    query-time source of truth, and an offline compaction can rewrite old
    batches — the Iceberg maintenance-job split.
    """
    from .sinks.graph_store import materialize, processed_batches
    if batch_id in processed_batches(out_root):
        return materialize(pages.limit(0).sparkSession.createDataFrame([], TRIPLE_SCHEMA),
                           out_root, batch_id)  # no-op resume hit
    held: list = []
    if include_microdata:
        # fused single-parse kernel: tables + microdata + JSON-LD from ONE
        # scan, robots-noindex compliance checked inside the same parse
        triples = pages_to_combined_triples(pages, default_meta=default_meta,
                                            respect_noindex=respect_noindex)
    else:
        triples = pages_to_triples(pages, default_meta=default_meta)
        if respect_noindex:
            keep = pages_to_head_meta(pages).where("not noindex") \
                .select("url")
            triples = triples.join(
                keep, triples["table_url"] == keep["url"], "left_semi")
    if entity_dict:
        # branch point: the mention scan AND the final union both read the
        # base triples — without a persist, link_entities' lineage re-runs
        # the whole HTML extraction a second time inside the union
        triples = triples.persist()
        held.append(triples)
        mentions = link_entities(triples, entity_dict)
        triples = triples.unionByName(mentions)
    if incremental_canonical and not canonicalize:
        raise ValueError(
            "incremental_canonical requires canonicalize=True — the global "
            "map can only grow from a batch that was canonicalized")
    pending_map_commit = False
    if canonicalize:
        triples, mapping = canonicalize_subjects(triples, releases=held)
        if incremental_canonical:
            from .operators.components import merge_mappings, rewrite_triples
            from .sinks.graph_store import (load_canonical_map,
                                            write_canonical_map_version)
            old = load_canonical_map(spark, out_root)
            merged = mapping if old is None else merge_mappings([old, mapping])
            # write the map version now, commit its CURRENT pointer only
            # AFTER materialize commits the batch — a crash in between must
            # not leave the global map referencing a batch that never landed
            path = write_canonical_map_version(merged, out_root, batch_id)
            pending_map_commit = True
            if old is not None:
                # batch-local canonicals that joined a pre-existing cluster
                # map on to the global canonical: one more broadcast rewrite,
                # reading the map back from its snapshot (truncates lineage)
                triples = rewrite_triples(triples,
                                          spark.read.parquet(path))
    lineage = {"source": "pages", "n_pages": None, "batch_id": batch_id,
               "stages": ["extract+map", "link" if entity_dict else None,
                          ("canonicalize-incremental" if incremental_canonical
                           else "canonicalize") if canonicalize else None,
                          "materialize"]}
    try:
        manifest = materialize(triples, out_root, batch_id, lineage=lineage)
        if pending_map_commit:
            from .sinks.graph_store import commit_canonical_map
            commit_canonical_map(out_root, batch_id)
        return manifest
    finally:
        # free per-batch caches so storage memory stays flat across batches
        for df in held:
            df.unpersist()


def disambiguate_mentions(docs: DataFrame, candidates: DataFrame,
                          text_col: str = "text",
                          id_col: str = "doc_id") -> DataFrame:
    """Stage 2c: context-scored entity disambiguation → one
    ``(doc, surface, entity, score, n_candidates)`` row per detected
    mention.

    ``link_entities`` resolves a surface against ONE dictionary entry;
    real dictionaries are ambiguous ("jaguar" → car ∨ cat).  The classic
    fix (Mihalcea & Csomai 2007 wikify-style) scores each candidate by
    overlap between the document's tokens and the candidate's CONTEXT
    bag (e.g. neighbor labels from the KG), then argmaxes per mention —
    deterministic tie-break on the entity IRI so reruns publish the same
    links.

    Scale shape: ``candidates`` (surface, entity, context) is
    dictionary-sized → broadcast; the containment join fans each doc out
    only by its matching surfaces' candidate counts; scoring is one
    ``array_intersect`` Column expression (distinct-token semantics, the
    cross-engine-stable choice); the argmax is one window keyed on
    (doc, surface).  One keyed shuffle total.
    """
    d = docs.select(F.col(id_col).alias("doc"),
                    F.split(F.lower(F.col(text_col)), r"\s+").alias("dtoks"),
                    F.lower(F.col(text_col)).alias("ltext"))
    c = candidates.select(F.lower(F.col("surface")).alias("surface"),
                          "entity",
                          F.split(F.lower(F.col("context")), r"\s+")
                          .alias("ctoks"))
    scored = (d.join(F.broadcast(c),
                     F.col("ltext").contains(F.col("surface")))
              .select("doc", "surface", "entity",
                      F.round(F.size(F.array_intersect("dtoks", "ctoks"))
                              .cast("double") / F.size("ctoks"), 6)
                      .alias("score")))
    w = Window.partitionBy("doc", "surface")
    ranked = scored.select(
        "doc", "surface", "entity", "score",
        F.row_number().over(w.orderBy(F.col("score").desc(),
                                      F.col("entity").asc())).alias("_rn"),
        F.count("*").over(w).alias("n_candidates"))
    return (ranked.where(F.col("_rn") == 1)
            .select(F.col("doc").alias(id_col), "surface", "entity",
                    "score", F.col("n_candidates").cast("long")
                    .alias("n_candidates")))


def disambiguate_sql(docs_sql: str, candidates_sql: str,
                     text_expr: str = "text",
                     id_expr: str = "doc_id") -> str:
    """DuckDB oracle for :func:`disambiguate_mentions` — list_intersect
    carries the same distinct-element semantics as array_intersect."""
    return f"""
with d as (select {id_expr} as doc,
                  string_split_regex(lower({text_expr}), '\\s+') as dtoks,
                  lower({text_expr}) as ltext
           from ({docs_sql})),
c as (select lower(surface) as surface, entity,
             string_split_regex(lower(context), '\\s+') as ctoks
      from ({candidates_sql})),
scored as (
  select doc, surface, entity,
         round(len(list_intersect(list_distinct(dtoks),
                                  list_distinct(ctoks)))::double
               / len(ctoks), 6) as score
  from d join c on contains(ltext, surface)),
ranked as (
  select doc, surface, entity, score,
         row_number() over (partition by doc, surface
                            order by score desc, entity asc) as rn,
         count(*) over (partition by doc, surface) as n_candidates
  from scored)
select doc as doc_id, surface, entity, score,
       n_candidates::bigint as n_candidates
from ranked where rn = 1
"""
