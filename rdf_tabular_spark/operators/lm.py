"""N-gram language-model scoring and importance weighting for corpus
curation.

Two paper-backed selection signals a web-scale training-data pipeline
runs after dedup/quality filtering:

* **CCNet-style perplexity filtering** (Wenzek et al., 2020): score every
  document by the perplexity of an n-gram LM trained on a trusted target
  corpus; keep the low-perplexity head/middle. KenLM is replaced here by
  a Laplace-smoothed word-bigram model expressed entirely in DataFrame
  ops — count tables are plain aggregations, the model is a broadcast
  join, and scoring is one narrow pass over exploded bigrams.
* **DSIR importance resampling** (Xie et al., 2023): weight each raw
  document by ``sum_t log p_target(f(t)) - log p_raw(f(t))`` over hashed
  unigram features and keep the top-weighted documents. The two feature
  distributions are tiny (``n_buckets`` rows) broadcast tables.

Scale design (10^12 docs):

* Model tables are capped top-K by ``(count desc, key asc)`` — a
  deterministic exact top-K over the *count table* (orders of magnitude
  smaller than the corpus), so the fitted model always broadcasts.
* Scoring is explode → broadcast-join → per-doc aggregation: one shuffle
  on the doc key, no global state. DSIR selection is a global top-N via
  ``orderBy().limit()`` (TakeOrderedAndProject — per-partition heaps, no
  full sort); at a fixed selection *rate* you would instead broadcast a
  weight threshold from a quantile sketch.
* Log-probabilities are quantized to integer micro-nats
  (``round(ln(p) * 1e6)``) *before* summation: per-doc scores are exact
  integers, reproducible across partition orders and engines —
  floating-point summation order can never flip a result.

Cross-engine contract (the DuckDB oracles in ``queries.py`` replay every
step): Laplace probabilities are ratios of exact integers, IEEE division
then ``ln`` then half-away-from-zero rounding to micro-nats — identical
in Spark and DuckDB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from . import text as T
from .curate import hash_u32

MICRO = 1_000_000  # quantization: 1 micro-nat


def _top_k(counts: DataFrame, count_col: str, key_col: str,
           k: int | None) -> DataFrame:
    """Deterministic exact top-K of a count table by (count desc, key asc).

    ``orderBy().limit(k)`` plans as TakeOrderedAndProject (per-partition
    heaps + driver merge) — equivalent to ``row_number() <= k`` under the
    same total order, without the single-partition global-window trap.
    Ties break lexically so both engines keep identical rows.
    """
    if k is None:
        return counts
    return counts.orderBy(F.col(count_col).desc(), F.col(key_col).asc()) \
                 .limit(k)


def fit_bigram_lm(ref: DataFrame, text_col: str = "text",
                  max_unigrams: int | None = 4096,
                  max_bigrams: int | None = 16384,
                  ) -> tuple[DataFrame, DataFrame]:
    """Count tables of a word-bigram LM over a trusted reference corpus.

    Returns ``(unigrams, bigrams)``: ``(w, c1)`` head counts and
    ``(g, c12)`` bigram counts (``g`` is the space-joined bigram string),
    each capped deterministic top-K so the model broadcasts regardless of
    corpus size. Both tables count every occurrence (``word_ngrams_all``,
    not the distinct shingle variant).
    """
    toks = T.tokens(F.col(text_col))
    uni = (ref.select(F.explode(toks).alias("w"))
           .groupBy("w").agg(F.count("*").alias("c1")))
    big = (ref.select(F.explode(T.word_ngrams_all(F.col(text_col), 2))
                      .alias("g"))
           .groupBy("g").agg(F.count("*").alias("c12")))
    return _top_k(uni, "c1", "w", max_unigrams), \
        _top_k(big, "c12", "g", max_bigrams)


def lm_score(docs: DataFrame, unigrams: DataFrame, bigrams: DataFrame,
             vocab_size: int, key: str = "doc_id",
             text_col: str = "text") -> DataFrame:
    """Per-document mean bigram negative log-likelihood in micro-nats.

    Laplace smoothing: ``P(w2|w1) = (c12 + 1) / (c1 + V)`` with ``V =
    vocab_size`` (the kept-unigram count, computed driver-side — it is a
    model constant, not data). Unseen heads fall back to the uniform
    ``1/V`` floor. Per-bigram NLL is quantized to integer micro-nats
    before the doc-level sum, so scores are exact integers.

    Output: ``(key, n_bigrams, nll_micro, avg_nll_micro)`` for every doc
    with ≥ 1 bigram; ``avg_nll_micro`` is integer division (both positive,
    truncation == floor). CCNet keeps docs below a perplexity cutoff —
    i.e. ``avg_nll_micro <= threshold``.
    """
    grams = docs.select(
        F.col(key),
        F.explode(T.word_ngrams_all(F.col(text_col), 2)).alias("g"))
    grams = grams.withColumn("w1", F.substring_index(F.col("g"), " ", 1))
    scored = (grams
              .join(F.broadcast(bigrams), "g", "left")
              .join(F.broadcast(unigrams.withColumnRenamed("w", "w1")),
                    "w1", "left")
              .withColumn(
                  "nll",
                  -F.round(F.log(
                      (F.coalesce(F.col("c12"), F.lit(0)) + F.lit(1))
                      / (F.coalesce(F.col("c1"), F.lit(0))
                         + F.lit(vocab_size))) * MICRO, 0).cast("long")))
    return (scored.groupBy(key)
            .agg(F.count("*").alias("n_bigrams"),
                 F.sum("nll").alias("nll_micro"))
            .withColumn("avg_nll_micro",
                        F.expr("nll_micro div n_bigrams")))


def fit_feature_dist(docs: DataFrame, n_buckets: int = 4096,
                     text_col: str = "text") -> DataFrame:
    """Hashed-unigram feature distribution (DSIR §2.2): bucket = md5-u32
    of the token mod ``n_buckets``; returns ``(bucket, c)`` occurrence
    counts. ``n_buckets`` rows — always broadcastable."""
    toks = T.tokens(F.col(text_col))
    return (docs.select(F.explode(toks).alias("w"))
            .select((hash_u32(F.col("w")) % n_buckets).alias("bucket"))
            .groupBy("bucket").agg(F.count("*").alias("c")))


def importance_weights(docs: DataFrame, target: DataFrame, raw: DataFrame,
                       target_total: int, raw_total: int,
                       n_buckets: int = 4096, key: str = "doc_id",
                       text_col: str = "text") -> DataFrame:
    """Per-document DSIR log importance weight in micro-nats.

    ``target`` / ``raw`` are :func:`fit_feature_dist` tables with their
    corpus-wide token totals (driver-side model constants). Per-token
    weight ``ln p_hat_target(b) - ln p_hat_raw(b)`` under Laplace
    smoothing, quantized to micro-nats per token then summed — exact
    integers. Output: ``(key, n_toks, logw_micro)``.
    """
    toks = (docs
            .select(F.col(key),
                    F.explode(T.tokens(F.col(text_col))).alias("w"))
            .select(F.col(key),
                    (hash_u32(F.col("w")) % n_buckets).alias("bucket")))
    t = F.coalesce(F.col("ct"), F.lit(0)) + F.lit(1)
    r = F.coalesce(F.col("cr"), F.lit(0)) + F.lit(1)
    lw = F.round((F.log(t / F.lit(float(target_total + n_buckets)))
                  - F.log(r / F.lit(float(raw_total + n_buckets))))
                 * MICRO, 0).cast("long")
    scored = (toks
              .join(F.broadcast(target.withColumnRenamed("c", "ct")),
                    "bucket", "left")
              .join(F.broadcast(raw.withColumnRenamed("c", "cr")),
                    "bucket", "left")
              .withColumn("lw", lw))
    return (scored.groupBy(key)
            .agg(F.count("*").alias("n_toks"),
                 F.sum("lw").alias("logw_micro")))


def importance_sample(docs: DataFrame, target: DataFrame, raw: DataFrame,
                      target_total: int, raw_total: int, n: int,
                      n_buckets: int = 4096, key: str = "doc_id",
                      text_col: str = "text") -> DataFrame:
    """Top-``n`` documents by DSIR weight (ties broken by key asc).

    ``orderBy().limit(n)`` plans as TakeOrderedAndProject — per-partition
    heaps + driver merge of n·n_partitions candidates, never a full sort.
    For rate-based selection at scale, broadcast a threshold from a
    quantile sketch over ``logw_micro`` instead.
    """
    w = importance_weights(docs, target, raw, target_total, raw_total,
                           n_buckets, key, text_col)
    return (w.orderBy(F.col("logw_micro").desc(), F.col(key).asc())
            .limit(n))


def ppl_buckets(scored: DataFrame, docs: DataFrame, n_buckets: int = 3,
                key: str = "doc_id", lang_col: str = "lang") -> DataFrame:
    """CCNet head/middle/tail perplexity bucketing (Wenzek et al. 2020
    §4.4): within each language, rank documents by LM score and cut the
    ranking into ``n_buckets`` equal-size tiers — 'head' (most fluent,
    kept for LM training), 'middle', 'tail' (usually dropped or routed to
    extra filtering).

    ``scored`` is :func:`lm_score` output (integer ``avg_nll_micro``, so
    ordering is exact, no float ties); ``docs`` supplies the language
    column. The cut is NTILE over (lang) ordered by (avg_nll_micro, key)
    — the key tie-break makes the assignment total and deterministic, and
    NTILE's fill rule (first ``n mod k`` tiles get the extra row) is the
    ANSI behavior both engines implement identically.

    Scale: one hash Exchange on lang + an in-partition sort; languages
    sort in parallel but EACH language is a single sort partition — the
    honest CCNet shape (their pipeline globally sorts per language too).
    For a 10^12-doc corpus, swap the exact NTILE for broadcast tercile
    thresholds from ``approx_percentile(avg_nll_micro, [1/3, 2/3])`` per
    language: same decisions away from the boundary, no single-partition
    sort. The exact form is kept here because it is the oracle-checkable
    one.
    """
    from pyspark.sql import Window
    labels = ["head", "middle", "tail"] + [
        f"tier{i}" for i in range(4, n_buckets + 1)]
    w = Window.partitionBy(lang_col).orderBy(
        F.col("avg_nll_micro").asc(), F.col(key).asc())
    tiled = (scored.join(docs.select(key, lang_col), key)
             .withColumn("tile", F.ntile(n_buckets).over(w)))
    bucket = F.lit(labels[0])
    for i in range(2, n_buckets + 1):
        bucket = F.when(F.col("tile") == i, F.lit(labels[i - 1])) \
            .otherwise(bucket)
    return tiled.select(key, lang_col, "avg_nll_micro",
                        bucket.alias("bucket"))
