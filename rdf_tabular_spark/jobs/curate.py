"""spark-submit entry point for the training-data curation pipeline.

Composes the curation tier end-to-end over a documents parquet
(``doc_id, text, lang, ...``), with per-stage metrics in one JSON line:

  0. line cleaning (``--c4-lines``) — C4 per-line rules (terminal
     punctuation, min words, javascript/lorem/brace markers); documents
     emptied by the filter are dropped
  1. quality gate — Gopher rules + language-ID agreement + exact dedup
     (operators/curate.curation_report; first failing rule is the reason)
  2. near-dedup (``--near-dedup``) — MinHash signatures → LSH candidate
     pairs → exact n-gram Jaccard verification → connected components →
     drop non-representatives. The quadratic verifier touches only LSH
     candidates, the drop set broadcasts into one anti-join: the document
     payload never shuffles (SURVEY §2.9 composition).
  3. decontamination (``--benchmark``) — drop documents sharing ≥ K word
     n-grams with a benchmark parquet (text column)
  4. PII scrub (``--scrub-pii``) — emails/phones/IPs masked in the text
  5. sequence packing (``--pack-budget``) — (grp, seq_no) assignment for
     ~budget-token training sequences

Usage::

  spark-submit --py-files rdf_tabular_spark.zip -m rdf_tabular_spark.jobs.curate \\
      --in /data/documents.parquet --out /data/curated \\
      --near-dedup --scrub-pii --pack-budget 2048

Every stage is a narrow transformation or a single keyed shuffle;
stage-wise counts land in the printed report so a 100 TB run shows where
documents were lost without a second pass over the data.
"""

from __future__ import annotations

import argparse
import json
import sys


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description="curate a document corpus")
    p.add_argument("--in", dest="src", required=True,
                   help="documents parquet (doc_id, text, lang)")
    p.add_argument("--out", required=True, help="curated output parquet")
    p.add_argument("--blocklist", default=None,
                   help="parquet of blocked domains (column `domain`); "
                        "docs whose url host is on/under one are dropped "
                        "before any text-level stage")
    p.add_argument("--url-col", default="url",
                   help="URL column for --blocklist (default: url)")
    p.add_argument("--c4-lines", action="store_true",
                   help="C4 line-level cleaning before the quality gate "
                        "(terminal punctuation, min words, boilerplate "
                        "markers); docs left with no lines are dropped")
    p.add_argument("--c4-min-words", type=int, default=3)
    p.add_argument("--near-dedup", action="store_true",
                   help="MinHash-LSH + Jaccard-verified near-dup removal")
    p.add_argument("--jaccard", type=float, default=0.5,
                   help="verified-pair Jaccard threshold (default 0.5)")
    p.add_argument("--num-perm", type=int, default=64)
    p.add_argument("--num-bands", type=int, default=16)
    p.add_argument("--benchmark", default=None,
                   help="benchmark parquet (text) for decontamination")
    p.add_argument("--contam-ngrams", type=int, default=8,
                   help="shared word-3-gram count that flags contamination")
    p.add_argument("--scrub-pii", action="store_true")
    p.add_argument("--host-boilerplate", type=float, default=None,
                   metavar="FRAC", dest="host_boilerplate",
                   help="strip lines repeating across >= FRAC of a host's "
                        "pages (host-scoped template removal, min 2 pages "
                        "of evidence); requires --host-col")
    p.add_argument("--host-col", default="source",
                   help="column holding the page host for "
                        "--host-boilerplate (default: source)")
    p.add_argument("--bm25-terms", default=None, metavar="T1,T2,...",
                   help="topic-relevance gate: keep documents whose Okapi "
                        "BM25 score against these query terms is >= "
                        "--bm25-min (targeted-corpus builds)")
    p.add_argument("--bm25-min", type=float, default=0.1,
                   help="minimum BM25 score for --bm25-terms (default 0.1)")
    p.add_argument("--readability-band", default=None, metavar="LO:HI",
                   help="keep documents whose Flesch reading ease (milli-"
                        "units, e.g. 30000:90000) falls inside the band — "
                        "a shuffle-free per-row gate after the quality "
                        "pass; counts land in the report")
    p.add_argument("--mixture-weights", default=None, metavar="JSON",
                   help='target domain mixture, e.g. \'{"en": 0.6, '
                        '"fr": 0.4}\' — per-stratum keep rates are computed '
                        "so expected kept volume per stratum = weight x "
                        "--mixture-budget; unweighted strata are dropped")
    p.add_argument("--mixture-budget", type=int, default=None,
                   help="total size budget (in --mixture-size-col units) "
                        "the mixture weights apportion")
    p.add_argument("--mixture-col", default="lang",
                   help="stratum column for --mixture-weights "
                        "(default: lang)")
    p.add_argument("--mixture-size-col", default="n_chars",
                   help="per-doc size column the budget counts "
                        "(default: n_chars)")
    p.add_argument("--pack-budget", type=int, default=None,
                   help="pack kept docs into ~N-token sequences")
    p.add_argument("--chunk-size", type=int, default=None,
                   help="emit sliding-window chunks of N tokens instead "
                        "of whole documents (RAG/embedding prep; "
                        "mutually exclusive with --pack-budget)")
    p.add_argument("--chunk-overlap", type=int, default=16)
    p.add_argument("--report", default=None,
                   help="also write the JSON report to this path")
    p.add_argument("--pipeline", default=None, metavar="CONFIG.json",
                   help="declarative stage config (Dolma-style): a JSON "
                        'file {"stages": [{"stage": "c4_lines", ...}, '
                        '...]} selecting stages + parameters instead of '
                        "individual flags. Stages run in the pipeline's "
                        "fixed order (blocklist, c4_lines, quality, "
                        "near_dedup, decontaminate, scrub_pii, pack) "
                        "regardless of list order; the parsed config is "
                        "recorded in the report for reproducibility")
    p.add_argument("--shuffle-partitions", type=int, default=None)
    return p


# pipeline-config stage name → (argv field assignments from stage params)
_PIPELINE_STAGES = {
    "blocklist": {"path": "blocklist", "url_col": "url_col"},
    "c4_lines": {"_flag": "c4_lines", "min_words": "c4_min_words"},
    "quality": {},          # always runs; present for explicitness
    "near_dedup": {"_flag": "near_dedup", "jaccard": "jaccard",
                   "num_perm": "num_perm", "num_bands": "num_bands"},
    "decontaminate": {"path": "benchmark", "ngrams": "contam_ngrams"},
    "scrub_pii": {"_flag": "scrub_pii"},
    "readability": {"band": "readability_band"},
    "bm25": {"terms": "bm25_terms", "min_score": "bm25_min"},
    "host_boilerplate": {"frac": "host_boilerplate",
                         "host_col": "host_col"},
    "mixture": {"weights": "mixture_weights", "budget": "mixture_budget",
                "col": "mixture_col", "size_col": "mixture_size_col"},
    "pack": {"budget": "pack_budget"},
    "chunk": {"size": "chunk_size", "overlap": "chunk_overlap"},
}


def apply_pipeline_config(args, config: dict) -> list[str]:
    """Translate a ``{"stages": [...]}`` config onto the argv fields —
    one declarative file instead of a flag soup; unknown stages or
    parameters fail loudly (a silently-skipped curation stage is a
    corpus-quality incident). Returns the ordered stage names."""
    stages = config.get("stages")
    if not isinstance(stages, list):
        raise ValueError('pipeline config needs a "stages" list')
    seen = []
    for entry in stages:
        if not isinstance(entry, dict) or "stage" not in entry:
            raise ValueError(f'each stage needs a "stage" key: {entry!r}')
        name = entry["stage"]
        mapping = _PIPELINE_STAGES.get(name)
        if mapping is None:
            raise ValueError(
                f"unknown stage {name!r} (known: {sorted(_PIPELINE_STAGES)})")
        if name in seen:
            raise ValueError(f"duplicate stage {name!r}")
        seen.append(name)
        if "_flag" in mapping:
            setattr(args, mapping["_flag"], True)
        for param, value in entry.items():
            if param == "stage":
                continue
            if param not in mapping:
                raise ValueError(
                    f"unknown parameter {param!r} for stage {name!r} "
                    f"(known: {sorted(k for k in mapping if k != '_flag')})")
            setattr(args, mapping[param], value)
        # flag-less stages carrying a required value: presence of the
        # stage itself enables them via their path/budget field
    return seen


def main(argv: list[str] | None = None) -> dict:
    args = build_parser().parse_args(argv)
    pipeline_stages = None
    if args.pipeline:
        with open(args.pipeline) as f:
            pipeline_config = json.load(f)
        pipeline_stages = apply_pipeline_config(args, pipeline_config)
    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    b = (SparkSession.builder.appName("corpus-curate")
         .config("spark.sql.adaptive.enabled", "true"))
    if args.shuffle_partitions:
        b = b.config("spark.sql.shuffle.partitions",
                     str(args.shuffle_partitions))
    spark = b.getOrCreate()
    from rdf_tabular_spark.operators import curate as C
    from rdf_tabular_spark.session import ensure_package_on_executors
    ensure_package_on_executors(spark)

    docs = spark.read.parquet(args.src)
    report: dict = {"input": args.src, "n_input": docs.count()}
    if pipeline_stages is not None:
        report["pipeline_stages"] = pipeline_stages

    # -1. domain blocklist — cheapest gate, runs before anything touches text
    if args.blocklist:
        from rdf_tabular_spark.operators.urls import filter_blocked_domains
        bl = spark.read.parquet(args.blocklist)
        n_before = report["n_input"]
        docs = filter_blocked_domains(docs, bl, key="doc_id",
                                      url_col=args.url_col)
        report["blocklist_dropped"] = n_before - docs.count()

    # 0. line-level cleaning (C4 rules) before any document-level decision
    if args.c4_lines:
        cleaned = C.c4_clean_lines(docs, min_words=args.c4_min_words)
        stats = cleaned.agg(F.sum("n_removed").alias("rm"),
                            F.sum((F.col("n_kept") == 0).cast("long"))
                            .alias("empty")).first()
        report["c4_lines_removed"] = int(stats["rm"] or 0)
        report["c4_docs_emptied"] = int(stats["empty"] or 0)
        docs = (docs.drop("text")
                .join(cleaned.filter(F.col("n_kept") > 0)
                      .select("doc_id", F.col("clean_text").alias("text")),
                      "doc_id"))

    # 0.5 host-scoped boilerplate removal — template lines die before any
    # document-level statistic (they would otherwise pollute quality
    # scores, shingles, and packing alike)
    if args.host_boilerplate is not None:
        from rdf_tabular_spark.operators.text import remove_host_boilerplate
        if args.host_col not in docs.columns:
            raise ValueError(f"--host-boilerplate needs column "
                             f"{args.host_col!r} (set --host-col)")
        cleaned = remove_host_boilerplate(
            docs, host_col=args.host_col, min_frac=args.host_boilerplate)
        report["boilerplate_lines_removed"] = int(
            cleaned.agg(F.sum("n_removed")).first()[0] or 0)
        docs = (docs.drop("text")
                .join(cleaned.select("doc_id",
                                     F.col("clean_text").alias("text")),
                      "doc_id"))

    # 1. quality gate (gopher + langid + exact dedup) — one decision pass
    decisions = C.curation_report(docs).persist()
    report["reasons"] = {r["reason"]: r["n"] for r in
                         decisions.groupBy("reason")
                         .agg(F.count("*").alias("n")).collect()}
    kept = docs.join(decisions.filter("keep").select("doc_id"), "doc_id")

    # 1.5 readability band — another shuffle-free per-row gate
    if args.readability_band:
        from rdf_tabular_spark.operators.text import flesch_reading_ease_milli
        try:
            lo, hi = (int(x) for x in args.readability_band.split(":"))
        except ValueError:
            raise ValueError("--readability-band must be LO:HI in "
                             "milli-units, e.g. 30000:90000")
        n_before = kept.count()
        kept = kept.withColumn(
            "_fm", flesch_reading_ease_milli(F.col("text")))
        kept = kept.filter((F.col("_fm") >= lo) & (F.col("_fm") <= hi)) \
            .drop("_fm")
        report["readability_dropped"] = n_before - kept.count()

    # 1.6 BM25 topic-relevance gate — corpus stats come from the CURRENT
    # survivor set (relevance is relative to what's left)
    if args.bm25_terms:
        from rdf_tabular_spark.operators.text import bm25_scores
        terms = tuple(t for t in args.bm25_terms.split(",") if t)
        if not terms:
            raise ValueError("--bm25-terms needs at least one term")
        n_before = kept.count()
        scores = bm25_scores(kept, terms)
        keep_ids = scores.filter(
            F.col("score") >= args.bm25_min).select("doc_id")
        kept = kept.join(keep_ids, "doc_id", "left_semi")
        report["bm25_dropped"] = n_before - kept.count()

    # 2. near-dedup over the survivors only
    if args.near_dedup:
        from rdf_tabular_spark.operators import minhash as MH
        from rdf_tabular_spark.operators.components import canonical_mapping
        from rdf_tabular_spark.operators.text import word_ngrams
        sigs = MH.minhash_signatures(
            kept.select(F.col("doc_id").cast("string").alias("doc_id"),
                        "text"),
            "doc_id", "text", num_perm=args.num_perm)
        pairs = MH.lsh_candidate_pairs(sigs, num_bands=args.num_bands)
        grams = kept.select(F.col("doc_id").cast("string").alias("id"),
                            word_ngrams(F.col("text"), 3).alias("g"))
        jac = (F.size(F.array_intersect("ga", "gb")).cast("double")
               / F.size(F.array_union("ga", "gb")))
        verified = (pairs
                    .join(grams.withColumnsRenamed({"id": "a", "g": "ga"}),
                          on="a")
                    .join(grams.withColumnsRenamed({"id": "b", "g": "gb"}),
                          on="b")
                    .filter(jac >= args.jaccard)
                    .select("a", "b"))
        mapping = canonical_mapping(verified)
        drop = (mapping.filter(F.col("id") != F.col("canonical_id"))
                .select(F.col("id").cast(docs.schema["doc_id"].dataType)
                        .alias("doc_id")))
        n_drop = drop.count()
        report["near_dup_dropped"] = n_drop
        kept = kept.join(F.broadcast(drop), "doc_id", "left_anti")

    # 3. benchmark decontamination
    if args.benchmark:
        bench = spark.read.parquet(args.benchmark)
        flags = C.flag_contamination(kept, bench, n=3)
        contaminated = flags.filter(
            F.col("n_overlap") >= args.contam_ngrams).select("doc_id")
        n_contam = contaminated.count()
        report["contaminated_dropped"] = n_contam
        kept = kept.join(F.broadcast(contaminated), "doc_id", "left_anti")

    # 4. PII scrub (text rewritten in place, counts reported)
    if args.scrub_pii:
        counts = C.pii_counts(F.col("text"))
        totals = kept.agg(*[F.sum(c).alias(k)
                            for k, c in counts.items()]).first()
        report["pii_masked"] = {k: int(totals[k] or 0) for k in counts}
        kept = kept.withColumn("text", C.scrub_pii(F.col("text")))

    # 4.5 token-budget mixture sampling over everything that survived the
    # quality/dedup gates — the last selection decision before packing
    if args.mixture_weights and args.mixture_budget:
        weights = (args.mixture_weights
                   if isinstance(args.mixture_weights, dict)
                   else json.loads(args.mixture_weights))
        if not weights or any(not isinstance(v, (int, float)) or v < 0
                              for v in weights.values()):
            raise ValueError(
                "--mixture-weights must map strata to non-negative numbers")
        n_before = kept.count()
        kept = C.mixture_sample(kept, "doc_id", args.mixture_col,
                                {k: float(v) for k, v in weights.items()},
                                args.mixture_budget,
                                size_col=args.mixture_size_col)
        report["mixture_dropped"] = n_before - kept.count()
        report["mixture_kept_volume"] = {
            r[args.mixture_col]: int(r["vol"])
            for r in kept.groupBy(args.mixture_col)
            .agg(F.sum(args.mixture_size_col).alias("vol")).collect()}

    # 5. sequence packing
    if args.pack_budget and args.chunk_size:
        raise ValueError("--pack-budget and --chunk-size are mutually "
                         "exclusive output shapes")
    if args.pack_budget:
        packed = C.pack_sequences(kept, budget=args.pack_budget)
        kept = kept.join(packed.select("doc_id", "grp", "seq_no", "n_tok"),
                         "doc_id")
        report["n_sequences"] = (kept.select("grp", "seq_no")
                                 .distinct().count())
    elif args.chunk_size:
        from rdf_tabular_spark.operators.text import chunk_documents
        kept = chunk_documents(kept, size=args.chunk_size,
                               overlap=args.chunk_overlap)
        report["n_chunks"] = kept.count()

    kept.write.mode("overwrite").parquet(args.out)
    decisions.unpersist()
    report["n_kept"] = spark.read.parquet(args.out).count()
    report["out"] = args.out
    print(json.dumps(report))
    if args.report:
        with open(args.report, "w") as f:
            json.dump(report, f, indent=2)
    return report


if __name__ == "__main__":
    main(sys.argv[1:])
