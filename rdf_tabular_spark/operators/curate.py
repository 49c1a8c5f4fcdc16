"""Training-data curation operators: PII redaction, deterministic
hash-based sampling, token-budget sequence packing, and benchmark
decontamination.

These are the corpus-preparation steps that sit between raw extraction
(sources/pages.py, sources/warc.py) and training: scrub identifying
strings, downsample per-language strata to a target mixture, pack
variable-length documents into fixed token-budget training sequences, and
drop documents that overlap an evaluation benchmark (Brown et al. 2020
§C / Gao et al. 2020 use the same n-gram-overlap definition).

Scale notes (100 TB):
- PII scrub and sampling are pure Column expressions — one codegen stage,
  no shuffle, column-pruned scan; they stream at parquet-scan speed.
- ``pack_sequences`` partitions the corpus into ``n_groups`` hash groups
  and runs an independent prefix-sum window per group: one shuffle on the
  group key, and parallelism = n_groups (set it to a small multiple of
  the cluster's cores; packing quality is unaffected because every group
  packs greedily in stable doc order). A single global window would
  serialize the corpus through one task — the classic window trap.
- ``flag_contamination`` broadcasts the benchmark shingle set (evaluation
  suites are tiny relative to a crawl) so the probe is a map-side
  hash-join against the exploded document shingles; one groupBy on doc_id
  re-aggregates.  No quadratic stage anywhere.

All hashing is md5-based so every step is reproducible bit-for-bit in the
DuckDB oracles (queries.py) — same recipe as operators/skew.py.

Reference parity: the reference pipeline (rdf-tabular) stops at triple
emission; these operators are the §2.9 training-data extensions the
SURVEY scopes on top of it, not ports.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from . import text as T

# --- PII patterns ----------------------------------------------------------
# Each pattern is valid and equivalent under Java regex (Spark) and RE2
# (DuckDB): no backreferences, no lookaround, only greedy quantifiers whose
# leftmost-first (Java) and leftmost-longest (RE2) matches coincide.
PII_EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PII_IPV4_RE = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"
PII_PHONE_RE = r"\+?\d[\d -]{7,13}\d"

EMAIL_TOKEN = "[EMAIL]"
IP_TOKEN = "[IP]"
PHONE_TOKEN = "[PHONE]"

# Scrub order matters and is part of the contract: emails first (they may
# contain digit runs a later pass would mangle), then IPv4 (dotted quads
# would otherwise be eaten by the phone pattern), then phones.
PII_PASSES = ((PII_EMAIL_RE, EMAIL_TOKEN),
              (PII_IPV4_RE, IP_TOKEN),
              (PII_PHONE_RE, PHONE_TOKEN))


def pii_counts(col: Column) -> dict[str, Column]:
    """Per-document match counts, keyed n_emails/n_ips/n_phones.

    Counts are taken against the *progressively scrubbed* text in pass
    order, exactly like :func:`scrub_pii` — so n_phones never counts a
    digit run that the IP pass already consumed.
    """
    out: dict[str, Column] = {}
    cur = col
    for (pat, tok), key in zip(PII_PASSES, ("n_emails", "n_ips", "n_phones")):
        out[key] = F.regexp_count(cur, F.lit(pat)).cast("long")
        cur = F.regexp_replace(cur, pat, tok)
    return out


def scrub_pii(col: Column) -> Column:
    """Replace emails → [EMAIL], IPv4 → [IP], phone runs → [PHONE].

    One codegen stage of chained ``regexp_replace`` — no UDF, no shuffle.
    """
    cur = col
    for pat, tok in PII_PASSES:
        cur = F.regexp_replace(cur, pat, tok)
    return cur


# --- deterministic hash sampling ------------------------------------------

HASH_SPACE = 1 << 32  # md5 32-bit prefix


def hash_u32(col: Column) -> Column:
    """Uniform deterministic 32-bit hash of a key column (md5 prefix).

    Stable across runs, partitionings, and engines (DuckDB:
    ``('0x' || substr(md5(x), 1, 8))::bigint``) — the property
    ``F.rand`` lacks and sampling for reproducible corpora needs.
    """
    return F.conv(F.substring(F.md5(col.cast("string")), 1, 8), 16, 10) \
            .cast("long")


def stratified_sample(df: DataFrame, key: str, strata: str,
                      rates: dict[str, float],
                      default_rate: float = 0.0) -> DataFrame:
    """Keep each row iff hash_u32(key) < rate[stratum] * 2^32.

    Exact expected per-stratum rates with zero coordination: a pure filter,
    no shuffle, no sampling state, repeatable under retries/speculative
    execution (unlike ``df.sample`` whose output depends on partition
    layout). Rates express a target language/domain mixture.
    """
    thresholds = {s: int(r * HASH_SPACE) for s, r in rates.items()}
    thr: Column = F.lit(int(default_rate * HASH_SPACE))
    for s, t in sorted(thresholds.items()):
        thr = F.when(F.col(strata) == s, F.lit(t)).otherwise(thr)
    return df.where(hash_u32(F.col(key)) < thr)


def mixture_sample(df: DataFrame, key: str, strata: str,
                   weights: dict[str, float], budget: int,
                   size_col: str = "n_chars") -> DataFrame:
    """Token-budget mixture sampling: per-stratum keep rates are COMPUTED
    so the expected kept volume of stratum ``s`` is ``weights[s] * budget``
    (capped at the stratum's full size) — the DoReMi/Pile-style "hit a
    target domain mixture under a total token budget" pass, where
    :func:`stratified_sample` takes the rates as given.

    rate_s = min(1, weights[s] * budget / volume_s); keep iff
    hash_u32(key) < floor(rate_s * 2^32). One aggregation pass for the
    per-stratum volumes (map-side partial agg over a handful of domains) +
    a broadcast join of the tiny rate table back onto the stream — then a
    pure deterministic filter: no sampling state, retry-reproducible,
    identical output at any partitioning. Strata absent from ``weights``
    are dropped (weight 0).
    """
    w: Column = F.lit(None).cast("double")
    for s, v in sorted(weights.items()):
        w = F.when(F.col(strata) == s, F.lit(float(v))).otherwise(w)
    rates = (df.groupBy(strata)
             .agg(F.sum(size_col).cast("double").alias("_vol"))
             .withColumn("_w", w)
             # filter BEFORE least: Spark's least skips nulls, so an
             # unweighted stratum would otherwise get rate 1.0, not 0
             .where(F.col("_w").isNotNull())
             .withColumn("_rate", F.least(
                 F.lit(1.0), F.col("_w") * F.lit(float(budget)) / F.col("_vol")))
             .select(strata, F.floor(F.col("_rate") * F.lit(float(HASH_SPACE)))
                     .cast("long").alias("_thr")))
    return (df.join(F.broadcast(rates), strata)
            .where(hash_u32(F.col(key)) < F.col("_thr"))
            .drop("_thr"))


def cap_per_source(df: DataFrame, key: str = "doc_id",
                   source: str = "source", max_docs: int = 10) -> DataFrame:
    """Domain-frequency capping: keep at most ``max_docs`` rows per source
    (host/domain), chosen by deterministic md5 rank — the anti-over-
    representation pass web-corpus pipelines run so one mega-host cannot
    dominate the training mixture (cf. RefinedWeb, Penedo et al. 2023
    §3.1 url-level filtering; C4's per-domain heuristics).

    The md5 ordering is a reproducible uniform shuffle WITHIN each source
    (retry- and partitioning-stable, like :func:`stratified_sample`), so
    the kept subset is an unbiased sample of the host rather than its
    first ``max_docs`` rows in crawl order. One shuffle on the source key;
    hot hosts are exactly the rows the cap discards, so the window state
    per key is bounded by crawl skew, and AQE skew-split applies to the
    exchange."""
    rank = F.row_number().over(
        Window.partitionBy(source)
              .orderBy(F.md5(F.col(key).cast("string")), F.col(key)))
    return (df.withColumn("_cap_rank", rank)
              .where(F.col("_cap_rank") <= max_docs)
              .drop("_cap_rank"))


def c4_clean_lines(df: DataFrame, key: str = "doc_id",
                   text_col: str = "text",
                   min_words: int = 3) -> DataFrame:
    """C4-style line-level cleaning (Raffel et al. 2020 §2.2) →
    ``(key, clean_text, n_kept, n_removed)``.

    Keeps only lines that end in a terminal punctuation mark, carry at
    least ``min_words`` words, and contain neither "javascript" /
    "lorem ipsum" (case-insensitive) nor a curly brace. All rules are
    higher-order array Column expressions over the line split — one
    narrow codegen stage, no shuffle, no Python; the page-level
    "fewer than N sentences" rule is a downstream ``n_kept`` filter.
    """
    lines = F.split(F.col(text_col), "\n")

    def _keep(line: Column) -> Column:
        low = F.lower(line)
        return (line.rlike('[.!?"]$')
                & (F.size(F.split(F.trim(line), r"\s+")) >= min_words)
                & ~low.contains("javascript")
                & ~low.contains("lorem ipsum")
                & ~line.contains("{"))

    kept = F.filter(lines, _keep)
    return df.select(
        F.col(key),
        F.concat_ws("\n", kept).alias("clean_text"),
        F.size(kept).cast("long").alias("n_kept"),
        (F.size(lines) - F.size(kept)).cast("long").alias("n_removed"))


# --- sequence packing ------------------------------------------------------

def pack_sequences(df: DataFrame, key: str = "doc_id",
                   text_col: str = "text", budget: int = 512,
                   n_groups: int = 64) -> DataFrame:
    """Assign each document to a training sequence of ~``budget`` tokens.

    Greedy in-order packing inside ``n_groups`` independent hash groups:
    ``grp = hash_u32(key) % n_groups``; within a group, docs are laid out
    in stable ``key`` order and a doc starts sequence
    ``floor(exclusive_prefix_tokens / budget)``. Output columns:
    (key, grp, seq_no, n_tok).

    Each group's window runs in its own task — parallelism scales with
    n_groups, so pick n_groups ≫ cores at cluster scale. Packing quality
    (fill fraction) is independent of n_groups because each group packs
    densely; only the *number* of partially-filled tail sequences grows
    with n_groups (one per group), which is negligible for any real
    corpus.
    """
    n_tok = T.token_count(F.col(text_col)).cast("long")
    grp = F.pmod(hash_u32(F.col(key)), F.lit(n_groups)).cast("int")
    staged = df.select(F.col(key), grp.alias("grp"), n_tok.alias("n_tok"))
    w = (Window.partitionBy("grp").orderBy(key)
         .rowsBetween(Window.unboundedPreceding, -1))
    prefix = F.coalesce(F.sum("n_tok").over(w), F.lit(0))
    return staged.select(
        key, "grp",
        F.floor(prefix / F.lit(budget)).cast("long").alias("seq_no"),
        "n_tok")


# --- fused curation decision -----------------------------------------------

def curation_report(docs: DataFrame, key: str = "doc_id",
                    text_col: str = "text",
                    lang_col: str = "lang") -> DataFrame:
    """Per-document keep/reject decision for the training corpus, with the
    first failing rule as the reason: Gopher quality rules → language-ID
    agreement with the labeled language → exact-duplicate removal
    (min-key representative wins). Returns (key, keep, reason).

    The lang check only fires for languages the n-gram model can predict
    (text.LANG_ORDER) — out-of-model languages pass through rather than
    being rejected wholesale.

    One codegen stage for the quality + lang rules; the duplicate rule
    adds a single window shuffle on the md5 fingerprint (same key exact
    dedup shuffles on — at scale the two stages share the partitioning).
    """
    pred = T.lang_id(F.col(text_col))
    lang_known = F.col(lang_col).isin(*T.LANG_ORDER)
    fp = F.md5(F.col(text_col))
    w = Window.partitionBy(fp)
    is_dup = F.col(key) != F.min(key).over(w)
    reason = (F.when(~T.gopher_pass(F.col(text_col)), F.lit("gopher"))
              .when(lang_known & (pred != F.col(lang_col)),
                    F.lit("lang_mismatch"))
              .when(is_dup, F.lit("duplicate"))
              .otherwise(F.lit("keep")))
    return (docs.select(F.col(key), reason.alias("reason"))
            .withColumn("keep", F.col("reason") == "keep"))


# --- benchmark decontamination ---------------------------------------------

def _gram_tables(docs: DataFrame, benchmark: DataFrame, key: str,
                 text_col: str, n: int, dedup_bench: bool = True):
    """Shared shingle preamble of the decontamination probes: the
    benchmark's exploded n-gram stream (optionally distinct) and the
    per-document (key, gram) stream."""
    bench_col = benchmark.columns[0]
    bench_grams = benchmark.select(
        F.explode(T.word_ngrams(F.col(bench_col), n)).alias("gram"))
    if dedup_bench:
        bench_grams = bench_grams.distinct()
    doc_grams = docs.select(
        F.col(key),
        F.explode(T.word_ngrams(F.col(text_col), n)).alias("gram"))
    return bench_grams, doc_grams


def _overlap_result(docs: DataFrame, key: str, hits: DataFrame) -> DataFrame:
    """Shared tail: re-attach overlap counts to every input doc, zeros
    included, plus the boolean flag."""
    return (docs.select(key)
            .join(hits, key, "left")
            .select(F.col(key),
                    F.coalesce(F.col("n_overlap"), F.lit(0)).alias("n_overlap"))
            .withColumn("contaminated", F.col("n_overlap") > 0))


def flag_contamination(docs: DataFrame, benchmark: DataFrame,
                       key: str = "doc_id", text_col: str = "text",
                       n: int = 3) -> DataFrame:
    """Count distinct word n-gram overlaps between each document and a
    benchmark corpus; a single shared shingle marks the doc contaminated
    (the conservative Brown et al. 2020 §C definition at n=3; raise n for
    looser matching).

    ``benchmark`` is a one-column DataFrame of benchmark *texts*; its
    shingle set is broadcast (eval suites are ≤ millions of shingles), so
    the probe is a map-side join on the exploded doc shingles followed by
    one doc-key aggregation. Returns (key, n_overlap, contaminated) for
    every input doc, zeros included.
    """
    bench_grams, doc_grams = _gram_tables(docs, benchmark, key, text_col, n)
    hits = (doc_grams.join(F.broadcast(bench_grams), "gram")
            .groupBy(key)
            .agg(F.count("*").alias("n_overlap")))
    return _overlap_result(docs, key, hits)


def flag_contamination_bloom(docs: DataFrame, benchmark: DataFrame,
                             key: str = "doc_id", text_col: str = "text",
                             n: int = 3, m: int = 1 << 20,
                             k: int = 2) -> DataFrame:
    """Bloom-filter benchmark decontamination — the memory-bounded variant
    of :func:`flag_contamination` for benchmark sets too large to
    broadcast verbatim (union of every eval suite at 10^9+ shingles).

    The Bloom filter is represented by its set-bit positions: for each of
    ``k`` salted md5 hash functions, the distinct values ``h_i(gram) % m``
    over the benchmark shingles (≤ m rows per hash regardless of benchmark
    size — the broadcast is bounded by the filter geometry, never the
    data). A document shingle *hits* iff ALL k positions are set — exactly
    Bloom membership: zero false negatives, false-positive rate
    ``(1 - e^{-kN/m})^k``. Deterministic md5 hashing keeps the filter
    bit-for-bit reproducible in the DuckDB oracle.

    Plan shape: the benchmark is shingled ONCE — all k position columns
    are computed in a single pass and folded into one distinct (i, h)
    bits table (≤ k·m rows by construction, persisted so the k broadcast
    builds read it from cache instead of re-running the 10^9-shingle
    explode+distinct per hash) — then k broadcast LEFT SEMI joins on the
    hashed-position columns + one doc-key aggregation, the same
    single-shuffle shape as the exact probe. Hash-position dedup makes a
    gram-level distinct redundant, so the benchmark stream skips it.
    Returns ``(key, n_overlap, contaminated)`` with approximate (never
    under-counted) overlap counts, zeros included.
    """
    bench_grams, doc_grams = _gram_tables(docs, benchmark, key, text_col, n,
                                          dedup_bench=False)

    def pos(i: int) -> Column:
        return hash_u32(F.concat(F.lit(f"{i}#"), F.col("gram"))) % m

    bits_long = (bench_grams
                 .select(F.explode(F.array(*[
                     F.struct(F.lit(i).alias("i"), pos(i).alias("h"))
                     for i in range(k)])).alias("b"))
                 .select("b.i", "b.h")
                 .distinct()
                 .persist())
    for i in range(k):
        bits = (bits_long.where(F.col("i") == i)
                .select(F.col("h").alias(f"h{i}")))
        doc_grams = (doc_grams.withColumn(f"h{i}", pos(i))
                     .join(F.broadcast(bits), f"h{i}", "semi"))
    hits = doc_grams.groupBy(key).agg(F.count("*").alias("n_overlap"))
    return _overlap_result(docs, key, hits)
