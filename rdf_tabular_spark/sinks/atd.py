"""S8 ATD sink: "annotated tabular data" debug serialization.

Mirrors the reference's ``to_atd`` shapes (reference: reader.rb:387-448;
metadata.rb:1280-1286 TableGroup, :1323-1331 Table, :1473-1485 Column,
:1596-1606 Cell, :1734-1743 Row). @ids are fragment IRIs on the table url
(``#table``, ``#col=N``, ``#row=N``, ``#cell=R,C``) — the reference leaves
ids nil for anonymous nodes; we skolemize deterministically so the output
is stable and joinable.

Spark shape: rows/cells come from ONE pass over the dialect-parsed rows DF
(same source as the triple kernel) collected per table — ATD is a debug
format for small tables, not a data path; the per-row work is still
executed distributed, only the final assembly is driver-side.
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import SparkSession

from ..csvw.model import Resolver, Table, TableGroup, default_resolver, load_metadata
from ..operators.triples import TripleKernel, compile_mapping
from ..sources.csv_source import read_header, read_rows


def _table_atd(spark: SparkSession, table: Table, resolver: Resolver) -> dict:
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
    kernel = TripleKernel(mapping)
    rows_df = read_rows(spark, path, table.dialect).orderBy("source_num")
    out_rows = []
    for r in rows_df.collect():
        row_num, source_num = int(r["row_num"]), int(r["source_num"])
        rid = f"{url}#row={source_num}"
        cells = []
        values = list(r["values"]) + [None] * (len(kernel.cols) - len(r["values"]))
        for cc, raw in zip(kernel.cols, values):
            vals, _binding = kernel._coerce_cell(raw, cc.plan)
            cid = f"{url}#cell={source_num},{cc.plan.number}"
            cell = {
                "@id": cid,
                "@type": "Cell",
                "column": f"{url}#col={cc.plan.number}",
                "row": rid,
                "stringValue": raw if raw is not None else "",
                "value": ([v.lexical for v in vals] if cc.plan.separator
                          else (vals[0].lexical if vals else None)),
                "errors": [],
            }
            cells.append(cell)
            columns[cc.plan.number - 1]["cells"].append(cid)
        out_rows.append({
            "@id": rid,
            "@type": "Row",
            "table": tid,
            "number": row_num,
            "sourceNumber": source_num,
            "cells": cells,
        })
    return {
        "@id": tid,
        "@type": "AnnotatedTable",
        "columns": columns,
        "rows": out_rows,
        "url": url,
    }


def csvw_to_atd(spark: SparkSession, source, base: str = "",
                resolver: Resolver = default_resolver) -> dict:
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
            "resources": [_table_atd(spark, t, resolver) for t in meta.tables],
        }
    return _table_atd(spark, meta, resolver)
