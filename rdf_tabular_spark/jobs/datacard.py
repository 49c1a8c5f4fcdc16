"""spark-submit entry point: corpus profile ("data card") for a documents
table.

Named ``datacard`` (not ``profile``) deliberately: spark-submit prepends
the job script's directory to sys.path, so a jobs/profile.py would
shadow the stdlib ``profile`` module and break cProfile inside pyspark
itself.

    spark-submit --py-files rdf_tabular_spark.zip \\
        -m rdf_tabular_spark.jobs.datacard \\
        --in s3://corpus/docs.parquet --out card.json

One JSON document summarizing the corpus the way a training-data review
wants it: size, language mix, length quantiles, quality/readability
bands, exact-duplicate rate, per-source token share and drift (total-
variation divergence vs the corpus word distribution).  Every statistic
reuses an oracle-checked operator; only vocabulary-sized aggregates ever
reach the driver.
"""

from __future__ import annotations

import argparse
import json
import sys


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--in", dest="src", required=True,
                   help="documents parquet (doc_id, text, ...)")
    p.add_argument("--out", default=None,
                   help="write the JSON card here (default: stdout only)")
    p.add_argument("--text-col", default="text")
    p.add_argument("--lang-col", default=None,
                   help="use this column for the language mix instead of "
                        "the marker-word language identifier")
    p.add_argument("--source-col", default=None,
                   help="per-source share + drift section (e.g. 'source')")
    p.add_argument("--shuffle-partitions", type=int, default=None)
    return p


def main(argv: list[str] | None = None) -> dict:
    args = build_parser().parse_args(argv)
    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    b = (SparkSession.builder.appName("corpus-profile")
         .config("spark.sql.adaptive.enabled", "true"))
    if args.shuffle_partitions:
        b = b.config("spark.sql.shuffle.partitions",
                     str(args.shuffle_partitions))
    spark = b.getOrCreate()
    from rdf_tabular_spark.operators.text import (fingerprint,
                                                  flesch_reading_ease_milli,
                                                  lang_id, quality_score,
                                                  source_divergence,
                                                  token_count)
    from rdf_tabular_spark.session import ensure_package_on_executors
    ensure_package_on_executors(spark)

    docs = spark.read.parquet(args.src)
    t = F.col(args.text_col)
    lang = (F.col(args.lang_col) if args.lang_col else lang_id(t)) \
        .alias("lang")

    # one enriched pass: every per-doc metric is a narrow projection, so
    # a single cache covers all the aggregates below
    enriched = docs.select(
        t.alias("_text"), lang,
        token_count(t).alias("n_tokens"),
        F.length(t).alias("n_chars"),
        quality_score(t).alias("quality"),
        flesch_reading_ease_milli(t).alias("flesch_milli"),
        fingerprint(t).alias("fp")).persist()

    totals = enriched.agg(
        F.count("*").alias("n_docs"),
        F.sum("n_tokens").alias("n_tokens"),
        F.sum("n_chars").alias("n_chars")).first()
    card: dict = {"input": args.src,
                  "n_docs": int(totals["n_docs"]),
                  "n_tokens": int(totals["n_tokens"] or 0),
                  "n_chars": int(totals["n_chars"] or 0)}

    card["languages"] = {r["lang"]: r["n"] for r in
                         enriched.groupBy("lang")
                         .agg(F.count("*").alias("n"))
                         .orderBy(F.desc("n"), "lang").collect()}

    qs = enriched.agg(*[
        F.expr(f"percentile(n_tokens, {q})").alias(f"p{int(q * 100)}")
        for q in (0.1, 0.5, 0.9, 0.99)]).first()
    card["token_quantiles"] = {k: float(qs[k]) for k in qs.asDict()}

    card["quality"] = {
        "mean": round(float(enriched.agg(F.avg("quality")).first()[0] or 0),
                      4),
        "below_half": enriched.filter("quality < 0.5").count(),
    }
    card["readability"] = {
        "median_flesch_milli": int(enriched.agg(
            F.expr("percentile(flesch_milli, 0.5)")).first()[0] or 0),
    }

    n_distinct_fp = enriched.select("fp").distinct().count()
    card["exact_dup_rate"] = round(
        1.0 - n_distinct_fp / card["n_docs"], 6) if card["n_docs"] else 0.0

    if args.source_col:
        div = source_divergence(docs, strat_col=args.source_col,
                                text_col=args.text_col)
        card["sources"] = {
            r[args.source_col]: {"n_tokens": int(r["n_tokens"]),
                                 "tv_micro": int(r["tv_micro"])}
            for r in div.orderBy(F.desc("n_tokens"),
                                 args.source_col).collect()}

    enriched.unpersist()
    out = json.dumps(card, sort_keys=True)
    if args.out:
        with open(args.out, "w") as fh:
            fh.write(out + "\n")
    print(out)
    return card


if __name__ == "__main__":
    main(sys.argv[1:])
