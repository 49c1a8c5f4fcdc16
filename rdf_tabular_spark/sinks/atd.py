"""S8 ATD sink: "annotated tabular data" debug serialization.

Mirrors the reference's ``to_atd`` shapes (reference: reader.rb:387-448;
metadata.rb:1280-1286 TableGroup, :1323-1331 Table, :1473-1485 Column,
:1596-1606 Cell, :1734-1743 Row). @ids are fragment IRIs on the table url
(``#table``, ``#col=N``, ``#row=N``, ``#cell=R,C``) — the reference leaves
ids nil for anonymous nodes; we skolemize deterministically so the output
is stable and joinable.

Spark shape: per-row ATD objects (cells, coerced values, errors) are built
inside ONE distributed Arrow kernel over the dialect-parsed rows DF (same
source as the triple kernel) and serialized to JSON strings; the driver
collects only those strings and assembles the nested document — the same
split as the S7 JSON sink (rows distributed, assembly driver-side). ATD is
a debug format for small tables; the collect is the document, not the data
path.
"""

from __future__ import annotations

import json
from typing import Iterator, Optional

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import LongType, StringType, StructField, StructType

from ..csvw.model import Resolver, Table, TableGroup, default_resolver, load_metadata
from ..operators.triples import TableMapping, TripleKernel, compile_mapping
from ..sources.csv_source import read_header, read_rows

ATD_ROWS_SCHEMA = StructType([
    StructField("rownum", LongType(), False),
    StructField("row_json", StringType(), False),
])


def rows_to_atd_rows(rows_df: DataFrame, mapping: TableMapping, url: str,
                     tid: str) -> DataFrame:
    """Distributed per-row ATD objects → (rownum, row_json). Narrow Arrow
    stage; all cell coercion runs on executors."""
    import pandas as pd

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        k = TripleKernel(mapping)
        for pdf in batches:
            nums, out = [], []
            for values, row_num, source_num in zip(
                    pdf["values"], pdf["row_num"], pdf["source_num"]):
                row_num, source_num = int(row_num), int(source_num)
                rid = f"{url}#row={source_num}"
                cells = []
                vals_list = list(values) + [None] * (len(k.cols) - len(values))
                for cc, raw in zip(k.cols, vals_list):
                    vals, _binding, errors = k._coerce_cell(raw, cc.plan)
                    cells.append({
                        "@id": f"{url}#cell={source_num},{cc.plan.number}",
                        "@type": "Cell",
                        "column": f"{url}#col={cc.plan.number}",
                        "row": rid,
                        "stringValue": raw if raw is not None else "",
                        "value": ([v.lexical for v in vals] if cc.plan.separator
                                  else (vals[0].lexical if vals else None)),
                        # reference Cell#errors (metadata.rb:1576-1607):
                        # datatype mismatches + required violations
                        "errors": errors,
                    })
                nums.append(row_num)
                out.append(json.dumps({
                    "@id": rid, "@type": "Row", "table": tid,
                    "number": row_num, "sourceNumber": source_num,
                    "cells": cells,
                }, ensure_ascii=False))
            yield pd.DataFrame({"rownum": pd.Series(nums, dtype="int64"),
                                "row_json": out})

    from ..session import ensure_package_on_executors
    ensure_package_on_executors(rows_df.sparkSession)
    return rows_df.mapInPandas(kernel, schema=ATD_ROWS_SCHEMA)


def _table_atd(spark: SparkSession, table: Table, resolver: Resolver,
               max_rows: Optional[int] = None) -> dict:
    from ..pipeline import merge_embedded_titles
    path = resolver(table.url)
    titles, _notes = read_header(path, table.dialect)
    if titles:
        merge_embedded_titles(table, titles)
    url = table.url
    tid = table.id or url + "#table"
    columns = [{
        "@id": f"{url}#col={c.number}",
        "@type": "Column",
        "table": tid,
        "number": c.number,
        "sourceNumber": c.number,
        "cells": [],
        "virtual": bool(c.virtual),
        "name": c.name,
        "title": c.title_values,
    } for c in table.schema.columns]

    mapping = compile_mapping(table, minimal=True)
    rows_df = read_rows(spark, path, table.dialect)
    atd_rows = rows_to_atd_rows(rows_df, mapping, url, tid)
    from .json_rows import MAX_DOCUMENT_ROWS, _collect_document_rows
    collected = sorted(
        _collect_document_rows(atd_rows,
                               MAX_DOCUMENT_ROWS if max_rows is None
                               else max_rows,
                               f"to_atd({url})"),
        key=lambda r: r["rownum"])
    out_rows = [json.loads(r["row_json"]) for r in collected]
    col_idx = {f"{url}#col={c.number}": i
               for i, c in enumerate(table.schema.columns)}
    for row in out_rows:
        for cell in row["cells"]:
            columns[col_idx[cell["column"]]]["cells"].append(cell["@id"])
    return {
        "@id": tid,
        "@type": "AnnotatedTable",
        "columns": columns,
        "rows": out_rows,
        "url": url,
    }


def csvw_to_atd(spark: SparkSession, source, base: str = "",
                resolver: Resolver = default_resolver,
                max_rows: Optional[int] = None) -> dict:
    """Metadata (or CSV) → ATD dict (reference entry: Reader#to_atd)."""
    meta = load_metadata(source, base=base, resolver=resolver) \
        if isinstance(source, (dict,)) or str(source).endswith((".json", ".jsonld")) \
        else None
    if meta is None:
        from ..csvw.model import Dialect, embedded_table_from_header
        url = base or source
        dialect = Dialect()
        titles, _ = read_header(resolver(url) if base else source, dialect)
        meta = embedded_table_from_header(titles, url, dialect)
    if isinstance(meta, TableGroup):
        return {
            "@id": meta.id,
            "@type": "AnnotatedTableGroup",
            "resources": [_table_atd(spark, t, resolver,
                                     max_rows=max_rows)
                          for t in meta.tables],
        }
    return _table_atd(spark, meta, resolver, max_rows=max_rows)
