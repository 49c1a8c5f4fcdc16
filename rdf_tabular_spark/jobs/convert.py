"""spark-submit entry point: convert a CSVW source (metadata document or
bare CSV/TSV/HTML) to triples or JSON — the Spark counterpart of the
reference's CLI converter (rdf-tabular script/parse:12-25, which routes a
Reader to an RDF writer or ``to_json``):

    spark-submit --py-files "$ZIP" rdf_tabular_spark/jobs/convert.py \\
        --in data.csv-metadata.json --to nt --out out/nt \\
        [--base http://example.org/data.csv-metadata.json] [--minimal]

Output formats:
  nt      N-Triples, sharded (the bulk interchange format)
  nq      N-Quads (graph label = table_url, the per-statement provenance)
  ttl     subject-grouped Turtle
  rdfxml  subject-grouped RDF/XML (legacy toolchains)
  trig    named-graph TriG (one graph block per table_url)
  json    the reference-shaped SINGLE JSON document (reader.rb to_json) —
          assembled on the driver, guarded by --max-doc-rows
  jsonl   distributed JSON-lines (one row object per line, executor-side
          write, no driver gather) — the 100-TB escape hatch for `json`
"""

from __future__ import annotations

import argparse
import json
import sys


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description="convert CSVW to RDF/JSON")
    p.add_argument("--in", dest="src", required=True,
                   help="metadata .json or CSV/TSV/HTML path/url")
    p.add_argument("--to", choices=("nt", "nq", "ttl", "trig", "rdfxml",
                                    "json", "jsonl"),
                   default="nt")
    p.add_argument("--out", required=True,
                   help="output dir (nt/ttl/jsonl) or file path (json)")
    p.add_argument("--base", default="",
                   help="IRI the source is considered published at")
    p.add_argument("--minimal", action="store_true",
                   help="minimal mode (cell triples only)")
    p.add_argument("--max-doc-rows", type=int, default=None,
                   help="row cap for the driver-assembled json document")
    p.add_argument("--shuffle-partitions", type=int, default=None)
    return p


def main(argv: list[str] | None = None) -> dict:
    args = build_parser().parse_args(argv)
    from pyspark.sql import SparkSession

    b = SparkSession.builder.appName("csvw-convert")
    if args.shuffle_partitions:
        b = b.config("spark.sql.shuffle.partitions",
                     str(args.shuffle_partitions))
    spark = b.getOrCreate()
    from rdf_tabular_spark.session import ensure_package_on_executors
    ensure_package_on_executors(spark)

    if args.to in ("nt", "nq", "ttl", "trig", "rdfxml"):
        from rdf_tabular_spark.pipeline import csvw_to_triples
        triples = csvw_to_triples(spark, args.src, base=args.base,
                                  minimal=args.minimal).persist()
        # count the cached input once instead of re-scanning the written
        # output (nt lines == triples; ttl groups by subject so the
        # summary reports triples either way)
        n = triples.count()
        if args.to == "nt":
            from rdf_tabular_spark.sinks.ntriples import write_ntriples
            write_ntriples(triples, args.out)
        elif args.to == "nq":
            from rdf_tabular_spark.sinks.ntriples import write_nquads
            write_nquads(triples, args.out)
        elif args.to == "trig":
            from rdf_tabular_spark.sinks.turtle_sink import write_trig
            write_trig(triples, args.out)
        elif args.to == "rdfxml":
            from rdf_tabular_spark.sinks.rdfxml import write_rdfxml
            write_rdfxml(triples, args.out)
        else:
            from rdf_tabular_spark.sinks.turtle_sink import write_turtle
            write_turtle(triples, args.out)
        triples.unpersist()
        summary = {"out": args.out, "to": args.to, "n_triples": n}
    elif args.to == "json":
        from rdf_tabular_spark.sinks.json_rows import csvw_to_json
        kwargs = {}
        if args.max_doc_rows is not None:
            kwargs["max_rows"] = args.max_doc_rows
        doc = csvw_to_json(spark, args.src, base=args.base, **kwargs)
        with open(args.out, "w") as f:
            json.dump(doc, f, indent=1)
        summary = {"out": args.out, "to": "json",
                   "n_rows": sum(len(t.get("row", []))
                                 for t in doc.get("tables", [doc]))}
    else:  # jsonl — distributed, never gathers on the driver
        from rdf_tabular_spark.csvw.merge import merge_metadata
        from rdf_tabular_spark.csvw.model import (Dialect, TableGroup,
                                                  embedded_table_from_header,
                                                  load_metadata)
        from rdf_tabular_spark.operators.triples import compile_mapping
        from rdf_tabular_spark.pipeline import (discover_metadata,
                                                ensure_columns_from_data,
                                                merge_embedded_titles)
        from rdf_tabular_spark.sinks.json_rows import (rows_to_json,
                                                       write_json_rows)
        from rdf_tabular_spark.sources.csv_source import (read_header,
                                                          read_rows)
        # same source resolution as the other output modes: metadata
        # documents load directly (base defaults to the document's own
        # location so relative table urls resolve); bare CSVs go through
        # metadata discovery, falling back to the embedded header
        base = args.base or args.src
        if args.src.endswith((".json", ".jsonld")):
            meta = load_metadata(args.src, base=base)
        else:
            found = discover_metadata(base, lambda u: u)
            if found:
                merged = merge_metadata(*[d for d, _ in found])
                meta = load_metadata(merged, base=found[0][1])
                if isinstance(meta, TableGroup):
                    t = meta.for_table(base)
                    if t is None and len(meta.tables) == 1:
                        t = meta.tables[0]
                    if t is not None:
                        meta = t
            else:
                dialect = Dialect()
                titles, _ = read_header(args.src, dialect)
                meta = embedded_table_from_header(titles, base, dialect)
        tables = meta.tables if isinstance(meta, TableGroup) else [meta]
        n = 0
        for i, table in enumerate(tables):
            path = table.url
            titles, _ = read_header(path, table.dialect)
            if titles:
                merge_embedded_titles(table, titles)
            ensure_columns_from_data(table, path)
            mapping = compile_mapping(table)
            jdf = rows_to_json(read_rows(spark, path, table.dialect),
                               mapping).persist()
            n += jdf.count()  # rows == lines; no output re-scan
            out = args.out if len(tables) == 1 \
                else f"{args.out}/table={i}"
            write_json_rows(jdf, out)
            jdf.unpersist()
        summary = {"out": args.out, "to": "jsonl", "n_lines": n}
    print(json.dumps(summary))
    return summary


if __name__ == "__main__":
    main(sys.argv[1:])
