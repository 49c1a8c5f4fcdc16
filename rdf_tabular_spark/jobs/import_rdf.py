"""spark-submit entry point: load serialized RDF into a graph store.

The inverse of jobs/export.py — interchange formats in, the store's
partitioned parquet layout out, with the same idempotent batch commit +
lineage the extraction pipeline gets (a re-run of a crashed import is a
no-op once its batch id is committed):

    spark-submit --py-files "$ZIP" rdf_tabular_spark/jobs/import_rdf.py \\
        --in s3://exports/graph-nt --format nt \\
        --store s3://kg/graph --batch-id import-2024-06-01

Formats: ``nt`` (line-splittable — parallel at byte-range granularity),
``ttl`` (file-granular — see sources/turtle_source.py header for why).
"""

from __future__ import annotations

import argparse
import json
import sys


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description="import RDF into a graph store")
    p.add_argument("--in", dest="src", required=True)
    p.add_argument("--format", choices=("nt", "nq", "ttl", "trig", "rdfxml"),
                   default="nt")
    p.add_argument("--store", required=True)
    p.add_argument("--batch-id", required=True)
    p.add_argument("--strict", action="store_true",
                   help="fail on the first malformed statement/document "
                        "instead of skipping it")
    p.add_argument("--shuffle-partitions", type=int, default=None)
    return p


def main(argv: list[str] | None = None) -> dict:
    args = build_parser().parse_args(argv)
    from pyspark.sql import SparkSession

    b = SparkSession.builder.appName("kg-import")
    if args.shuffle_partitions:
        b = b.config("spark.sql.shuffle.partitions",
                     str(args.shuffle_partitions))
    spark = b.getOrCreate()
    from rdf_tabular_spark.session import ensure_package_on_executors
    ensure_package_on_executors(spark)
    from rdf_tabular_spark.sinks.graph_store import materialize

    if args.format == "nt":
        from rdf_tabular_spark.sources.ntriples_source import read_ntriples
        triples = read_ntriples(spark, args.src, strict=args.strict)
    elif args.format == "nq":
        from rdf_tabular_spark.sources.ntriples_source import read_nquads
        triples = read_nquads(spark, args.src, strict=args.strict)
    elif args.format == "trig":
        from rdf_tabular_spark.sources.turtle_source import read_trig
        triples = read_trig(spark, args.src, strict=args.strict)
    elif args.format == "rdfxml":
        from rdf_tabular_spark.sources.rdfxml_source import read_rdfxml
        triples = read_rdfxml(spark, args.src, strict=args.strict)
    else:
        from rdf_tabular_spark.sources.turtle_source import read_turtle
        triples = read_turtle(spark, args.src, strict=args.strict)

    manifest = materialize(
        triples, args.store, args.batch_id,
        lineage={"job": "import_rdf", "source": args.src,
                 "format": args.format})
    summary = {"store": args.store, "batch_id": args.batch_id,
               "n_triples": manifest.get("n_triples")}
    print(json.dumps(summary))
    return summary


if __name__ == "__main__":
    main(sys.argv[1:])
