"""spark-submit entry point: serialize a graph store to an RDF format.

The store's parquet layout is the processing format; interchange happens
here (reference counterpart: script/parse picks an RDF.rb writer by
extension — rdf-tabular script/parse:16-25):

    spark-submit --py-files "$ZIP" rdf_tabular_spark/jobs/export.py \\
        --store s3://kg/graph --format nt --out s3://exports/graph-nt \\
        [--as-of 2024-06-01T00:00:00] [--predicate <IRI>]

Formats: ``nt`` (one statement per line — the bulk format), ``nq``
(N-Quads, graph = per-statement provenance), ``ttl`` (subject-grouped
Turtle — the readable one), ``trig`` (named-graph TriG), ``rdfxml``
(legacy-toolchain RDF/XML). ``--predicate``
exports one predicate's triples via the partition-pruned read path.
"""

from __future__ import annotations

import argparse
import json
import sys


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description="export a graph store to RDF")
    p.add_argument("--store", required=True)
    p.add_argument("--format", choices=("nt", "nq", "ttl", "trig", "rdfxml"),
                   default="nt")
    p.add_argument("--out", required=True)
    p.add_argument("--as-of", default=None)
    p.add_argument("--predicate", default=None,
                   help="export only this predicate (pruned scan)")
    p.add_argument("--void", metavar="DATASET_IRI", default=None,
                   help="also export a VoID self-description of the "
                        "exported graph (dataset node = DATASET_IRI) as "
                        "N-Triples under <out>-void; distinct counts use "
                        "HyperLogLog (the 10^12-triple mode)")
    p.add_argument("--shuffle-partitions", type=int, default=None)
    return p


def main(argv: list[str] | None = None) -> dict:
    args = build_parser().parse_args(argv)
    from pyspark.sql import SparkSession

    b = SparkSession.builder.appName("kg-export")
    if args.shuffle_partitions:
        b = b.config("spark.sql.shuffle.partitions",
                     str(args.shuffle_partitions))
    spark = b.getOrCreate()
    from rdf_tabular_spark.session import ensure_package_on_executors
    ensure_package_on_executors(spark)
    from rdf_tabular_spark.sinks.graph_store import (read_graph,
                                                     read_predicate,
                                                     snapshots_as_of)

    batches = snapshots_as_of(args.store, args.as_of) if args.as_of else None
    if args.predicate:
        g = read_predicate(spark, args.store, args.predicate,
                           batches=batches)
    else:
        g = read_graph(spark, args.store, batches=batches)
    # the store schema is a superset of the triple schema (adds
    # support/bucket/batch columns); the sinks select what they serialize
    if args.format == "nt":
        from rdf_tabular_spark.sinks.ntriples import write_ntriples
        write_ntriples(g, args.out)
    elif args.format == "nq":
        from rdf_tabular_spark.sinks.ntriples import write_nquads
        write_nquads(g, args.out)
    elif args.format == "trig":
        from rdf_tabular_spark.sinks.turtle_sink import write_trig
        write_trig(g, args.out)
    elif args.format == "rdfxml":
        from rdf_tabular_spark.sinks.rdfxml import write_rdfxml
        write_rdfxml(g, args.out)
    else:
        from rdf_tabular_spark.sinks.turtle_sink import write_turtle
        write_turtle(g, args.out)
    n = spark.read.text(args.out).count()
    summary = {"out": args.out, "format": args.format, "n_lines": n}
    if args.void:
        from rdf_tabular_spark.operators.void import void_description
        from rdf_tabular_spark.sinks.ntriples import write_ntriples
        write_ntriples(void_description(g, args.void, exact=False),
                       args.out + "-void")
        summary["void_out"] = args.out + "-void"
    print(json.dumps(summary))
    return summary


if __name__ == "__main__":
    main(sys.argv[1:])
