"""spark-submit entry point: continuous incremental near-dedup of a
growing document corpus against its accumulated MinHash band store.

Cluster invocation (north_rule: "run via spark-submit --py-files"):

    ZIP=$(python -c "from rdf_tabular_spark.session import package_zip_path;
                     print(package_zip_path())")
    spark-submit --master <cluster> --py-files "$ZIP" \\
        rdf_tabular_spark/jobs/dedup_stream.py \\
        --in s3://crawl/docs/ --out s3://corpus/kept \\
        --band-store s3://corpus/bands --checkpoint s3://corpus/ckpt \\
        [--continuous]

Each micro-batch near-dedups against every earlier epoch's bands
(streaming/ingest.stream_docs_dedup_incremental: batch bands join stored
bands — old x old never forms), writes survivors under ``out/epoch=N``
and their bands under ``band-store/epoch=N``. Per-epoch overwrite +
epoch<current store reads make replays idempotent; re-running with the
same --checkpoint resumes where the stream left off. Default is one
availableNow drain (a scheduled catch-up run); --continuous keeps the
query running for a long-lived ingestion driver.
"""

from __future__ import annotations

import argparse
import json
import sys


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        description="streaming incremental near-dedup")
    p.add_argument("--in", dest="src", required=True,
                   help="documents parquet dir (doc_id, text, lang, "
                        "source, n_chars) — the stream source")
    p.add_argument("--out", required=True,
                   help="kept-documents output root (epoch=N partitions)")
    p.add_argument("--band-store", required=True,
                   help="accumulated MinHash band table root")
    p.add_argument("--checkpoint", required=True)
    p.add_argument("--continuous", action="store_true",
                   help="keep the stream running instead of one "
                        "availableNow drain")
    p.add_argument("--max-files-per-trigger", type=int, default=None)
    p.add_argument("--shuffle-partitions", type=int, default=None)
    return p


def main(argv: list[str] | None = None) -> dict:
    args = build_parser().parse_args(argv)
    from pyspark.sql import SparkSession

    b = (SparkSession.builder.appName("dedup-stream")
         .config("spark.sql.adaptive.enabled", "true"))
    if args.shuffle_partitions:
        b = b.config("spark.sql.shuffle.partitions",
                     str(args.shuffle_partitions))
    spark = b.getOrCreate()
    from rdf_tabular_spark.streaming.ingest import (
        stream_docs_dedup_incremental)

    q = stream_docs_dedup_incremental(
        spark, args.src, args.out, args.checkpoint, args.band_store,
        available_now=not args.continuous,
        max_files_per_trigger=args.max_files_per_trigger)
    if args.continuous:
        q.awaitTermination()
        return {}
    q.awaitTermination()
    kept = spark.read.parquet(args.out)
    summary = {"out": args.out, "band_store": args.band_store,
               "n_kept": kept.count(),
               "n_epochs": kept.select("epoch").distinct().count()}
    print(json.dumps(summary))
    return summary


if __name__ == "__main__":
    main(sys.argv[1:])
