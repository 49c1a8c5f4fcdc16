"""JSON row serialization (reference: reader.rb:260-270 to_json, :276-382
to_hash).

Two shapes:
- ``rows_to_json``: distributed JSON-lines DataFrame (one JSON object per CSV
  row) — the scale path (write.text gives sharded JSON-lines output).
- ``table_to_json_dict`` / ``group_to_json_dict``: driver-assembled single
  document matching the reference's ``to_json`` byte-for-byte structure (test
  oracle; metadata-sized gather, never used on the data path).
"""

from __future__ import annotations

import json
from typing import Iterator, Optional

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import LongType, StringType, StructField, StructType

from ..csvw.model import Resolver, Table, TableGroup
from ..csvw.uri_template import URITemplate
from ..operators.triples import TableMapping, TripleKernel, compile_mapping
from ..sources.csv_source import read_header, read_rows

JSON_ROWS_SCHEMA = StructType([
    StructField("rownum", LongType(), False),
    StructField("row_json", StringType(), False),
])


class JsonRowKernel(TripleKernel):
    """Row → JSON object (reference: reader.rb:354-369)."""

    def __init__(self, mapping: TableMapping):
        super().__init__(mapping)
        # row-level resource: the schema/table-inherited aboutUrl — the
        # subject cells use unless overridden; exposed as the row "url"
        self.row_about: Optional[URITemplate] = (
            URITemplate(mapping.row_about_template) if mapping.row_about_template else None)

    def row_json(self, values: list[Optional[str]], row_num: int, source_num: int) -> dict:
        values = list(values) + [None] * (len(self.cols) - len(values))
        bindings: dict = {"_row": row_num, "_sourceRow": source_num}
        cell_vals = []
        for cc, raw in zip(self.cols, values):
            vals, binding, _errs = self._coerce_cell(raw, cc.plan)
            cell_vals.append(vals)
            bindings[cc.plan.name] = binding

        r: dict = {}
        if self.row_about is not None:
            url = self.ctx.expand_iri(self.row_about.expand(
                {**bindings, "_name": "", "_column": 0, "_sourceColumn": 0}), document_relative=True)
            if not url.startswith("_:"):
                r["url"] = url
        r["rownum"] = row_num

        for cc, vals in zip(self.cols, cell_vals):
            cp = cc.plan
            if cp.virtual:  # reference: reader.rb:364 — virtual excluded from JSON
                continue
            # same single-dict discipline as TripleKernel.row_triples:
            # templates only read, reserved slots cannot collide
            b = bindings
            b["_name"] = cc.name_decoded
            b["_column"] = cp.number
            b["_sourceColumn"] = cp.source_number
            if cc.value_t is not None:
                r[cp.name] = self.ctx.expand_iri(cc.value_t.expand(b), document_relative=True)
            elif cp.separator:
                r[cp.name] = [cv.lexical for cv in vals]
            else:
                r[cp.name] = vals[0].lexical if vals else None

        # extra source cells → auto "_col.N" keys (reference reader.rb:366
        # over the auto columns of metadata.rb:1664; same guard as the RDF
        # path, operators/triples.py — only without virtual columns)
        if len(values) > len(self.cols) and not any(
                cc.plan.virtual for cc in self.cols):
            for idx in range(len(self.cols), len(values)):
                v = (values[idx] or "").strip()
                if v:
                    r[f"_col.{idx + 1}"] = v
        return r


def rows_to_json(rows_df: DataFrame, mapping: TableMapping) -> DataFrame:
    """Distributed JSON-lines: one JSON object per row (narrow, no shuffle)."""
    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        k = JsonRowKernel(mapping)
        for pdf in batches:
            out_rows = []
            nums = []
            for values, row_num, source_num in zip(pdf["values"], pdf["row_num"], pdf["source_num"]):
                obj = k.row_json(list(values), int(row_num), int(source_num))
                out_rows.append(json.dumps(obj, ensure_ascii=False))
                nums.append(int(row_num))
            yield pd.DataFrame({"rownum": pd.Series(nums, dtype="int64"),
                                "row_json": out_rows})
    from ..session import ensure_package_on_executors
    ensure_package_on_executors(rows_df.sparkSession)
    return rows_df.mapInPandas(kernel, schema=JSON_ROWS_SCHEMA)


#: Guard for the driver-assembled single-document paths: the reference's
#: ``to_json``/``to_atd`` output is ONE document, which only exists on the
#: driver — at web scale that OOMs. Above this row count the document
#: builders refuse and point at :func:`write_json_rows`.
MAX_DOCUMENT_ROWS = 1_000_000


def write_json_rows(df: DataFrame, path: str,
                    column: str = "row_json") -> None:
    """Distributed JSONL sink — the scale escape hatch for the document
    builders: one JSON object per line via ``write.text`` (sharded,
    executor-side, nothing ever gathers on the driver). Line order across
    shards is not defined (inherent to a distributed write); consumers
    needing row order sort on the object's ``rownum``."""
    from pyspark.sql import functions as F
    df.select(F.col(column).alias("value")) \
      .write.mode("overwrite").text(path)


def _collect_document_rows(rows_df: DataFrame, max_rows: int,
                           what: str) -> list:
    """Driver gather for the single-document sinks, guarded: fetches at
    most ``max_rows + 1`` rows (the limit is pushed into the plan, so an
    oversized table never materializes driver-side) and refuses loudly
    when the table exceeds the cap."""
    collected = rows_df.limit(max_rows + 1).collect()
    if len(collected) > max_rows:
        raise ValueError(
            f"{what}: table exceeds {max_rows} rows — a single JSON "
            f"document must fit on the driver. Use "
            f"sinks.json_rows.write_json_rows(...) for distributed "
            f"JSON-lines output, or raise max_rows explicitly.")
    return collected


def _flatten_common_value(v):
    if isinstance(v, dict) and ("@id" in v or "@value" in v):
        return v.get("@value") or v.get("@id")
    return v


def table_to_json_dict(spark: SparkSession, table: Table, resolver: Resolver,
                       prov: bool = False,
                       filenames: list[str] | None = None,
                       max_rows: int = MAX_DOCUMENT_ROWS) -> dict:
    """Reference-shaped table document (reader.rb:338-369).

    ``prov`` adds the provenance keys of reader.rb:371-379: a
    ``distribution.downloadURL`` (the table url) and ``describedBy`` (the
    metadata document url(s) that described this table) — the reference
    emits them unless ``noProv``; the spec JSON goldens compare without
    them, so they are opt-in here."""
    from ..pipeline import ensure_columns_from_data, merge_embedded_titles
    path = resolver(table.url)
    titles, _ = read_header(path, table.dialect)
    if titles:
        merge_embedded_titles(table, titles)
    ensure_columns_from_data(table, path)
    mapping = compile_mapping(table)
    doc: dict = {"url": table.url}
    for prop, value in table.common_properties():
        vals = value if isinstance(value, list) else [value]
        vals = [_flatten_common_value(v) for v in vals]
        doc[prop] = vals[0] if len(vals) == 1 else vals
    rows_df = rows_to_json(read_rows(spark, path, table.dialect), mapping)
    collected = sorted(
        _collect_document_rows(rows_df, max_rows, f"to_json({table.url})"),
        key=lambda r: r["rownum"])
    doc["row"] = [json.loads(r["row_json"]) for r in collected]
    if prov:
        doc["distribution"] = {"downloadURL": table.url}
        if filenames:
            doc["describedBy"] = filenames[0] if len(filenames) == 1 \
                else list(filenames)
    return doc


def group_to_json_dict(spark: SparkSession, group: TableGroup, resolver: Resolver,
                       prov: bool = False,
                       filenames: list[str] | None = None,
                       max_rows: int = MAX_DOCUMENT_ROWS) -> dict:
    tables = []
    doc = {"tables": tables}
    for prop, value in group.common_properties():
        vals = value if isinstance(value, list) else [value]
        vals = [_flatten_common_value(v) for v in vals]
        doc[prop] = vals[0] if len(vals) == 1 else vals
    for t in group.tables:
        # W3C csv2json §4.2: a table whose suppressOutput is true is
        # omitted from the output document (the reference's to_hash,
        # reader.rb:284-296, iterates every resource without the check —
        # we follow the W3C-final behavior, consistent with the RDF path
        # which both already suppress)
        if t.suppress_output:
            continue
        tables.append(table_to_json_dict(spark, t, resolver, prov=prov,
                                         filenames=filenames,
                                         max_rows=max_rows))
    return doc


def csvw_to_json(spark: SparkSession, source, base: str = "",
                 resolver: Resolver = lambda u: u, prov: bool = False,
                 headers=None,
                 max_rows: int = MAX_DOCUMENT_ROWS) -> dict:
    from ..csvw.merge import merge_metadata
    from ..csvw.model import Dialect, embedded_table_from_header, load_metadata
    from ..pipeline import discover_metadata
    filenames: list[str] = []
    if isinstance(source, dict) or (isinstance(source, str) and source.endswith((".json", ".jsonld"))):
        meta = load_metadata(
            source,
            base=base or (source if isinstance(source, str) else ""),
            resolver=resolver)
        if isinstance(source, str):
            filenames = [base or source]
    else:
        url = base or source
        # Content-Type header=absent (reader.rb:60-63) — same injection
        # as pipeline.csvw_to_triples, so both entry points read the
        # identical response identically
        absent_doc = None
        if headers is not None:
            from ..discovery import header_absent
            if header_absent(headers(url) or {}):
                absent_doc = {"@context": "http://www.w3.org/ns/csvw",
                              "url": url, "dialect": {"header": False}}
        found = discover_metadata(url, resolver, headers=headers)
        if found or absent_doc:
            docs = ([absent_doc] if absent_doc else []) \
                + [d for d, _ in found]
            merged = merge_metadata(*docs)
            meta = load_metadata(merged,
                                 base=found[0][1] if found else url,
                                 resolver=resolver)
            filenames = [u for _, u in found]
            if isinstance(meta, TableGroup):
                table = meta.for_table(url)
                if table is None and len(meta.tables) == 1:
                    table = meta.tables[0]
                if table is not None:
                    meta = table
        else:
            dialect = Dialect()
            titles, _ = read_header(resolver(url) if (base or "://" in str(source)) else source, dialect)
            meta = embedded_table_from_header(titles, url, dialect)
    if isinstance(meta, TableGroup):
        return group_to_json_dict(spark, meta, resolver, prov=prov,
                                  filenames=filenames, max_rows=max_rows)
    if meta.suppress_output:
        # same W3C csv2json §4.2 rule as the group path: a suppressed
        # table (bare-Table metadata, or a group narrowed to one table)
        # is omitted — emit the empty-tables document shape
        return {"tables": []}
    return table_to_json_dict(spark, meta, resolver, prov=prov,
                              filenames=filenames, max_rows=max_rows)
