"""Deduplication operators: exact, n-gram Jaccard, MinHash-LSH, SimHash.

Training-data extensions (SURVEY.md §2.9) over a ``documents`` table.
Two tiers per family:

* an **oracle-parity tier** built only from md5 + array Column expressions,
  bit-identical to the DuckDB SQL the driver cross-checks (md5 is the one
  hash both engines share) — correctness evidence;
* the **scale tier** in :mod:`.minhash` (numpy signatures + xxhash64 band
  join), same plan shape with cheaper hashes — what you run on 100 TB.

Plan shapes (what matters at 1000 executors):
  exact:    one shuffle — groupBy(md5(text)); map-side partial agg applies.
  minhash:  narrow signature projection → explode to thin (band_key, id)
            rows → ONE self-join shuffle on band_key; bucket-size cap guards
            degenerate bands; AQE skew-join handles hot buckets.
  simhash:  narrow projection only (no shuffle); Hamming-join downstream.
  pairwise: quadratic verify runs ONLY on LSH candidates, never the corpus.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .text import tokens, word_ngrams

SIMHASH_BITS = 16


def exact_dedup_groups(df: DataFrame, id_col: str = "doc_id",
                       text_col: str = "text") -> DataFrame:
    """Hash-groupBy exact dedup → (dup_key, keep_id, n_docs).

    One shuffle on the md5 key; partial aggregation (min/count) combines
    map-side so the shuffle carries one row per distinct hash per task.
    """
    return (df.groupBy(F.md5(F.col(text_col)).alias("dup_key"))
            .agg(F.min(id_col).alias("keep_id"), F.count("*").alias("n_docs")))


def exact_dedup(df: DataFrame, id_col: str = "doc_id",
                text_col: str = "text") -> DataFrame:
    """Keep the min-id representative per identical text."""
    keep = exact_dedup_groups(df, id_col, text_col).select("keep_id")
    return df.join(F.broadcast(keep.hint("broadcast")),
                   df[id_col] == keep["keep_id"], "left_semi")


def ngram_jaccard_pairs(df: DataFrame, id_col: str = "doc_id",
                        text_col: str = "text", n: int = 3,
                        threshold: float = 0.2) -> DataFrame:
    """All-pairs word-n-gram Jaccard ≥ threshold → (a, b, jac).

    Quadratic — the *verification baseline* for small inputs and for LSH
    candidate sets; at corpus scale call :func:`minhash_md5_pairs` (or
    :mod:`.minhash`) to generate candidates first and reuse this only on
    the candidate join.
    """
    sh = df.select(F.col(id_col).cast("long").alias("id"),
                   word_ngrams(F.col(text_col), n).alias("s"))
    a, b = sh.alias("a"), sh.alias("b")
    jac = (F.size(F.array_intersect(F.col("a.s"), F.col("b.s"))).cast("double")
           / F.size(F.array_union(F.col("a.s"), F.col("b.s"))))
    return (a.join(b, F.col("a.id") < F.col("b.id"))
            .select(F.col("a.id").alias("a"), F.col("b.id").alias("b"),
                    F.round(jac, 4).alias("jac"))
            .filter(F.col("jac") >= threshold))


def minhash_md5_signature(text_col: Column, num_perm: int = 8,
                          n: int = 3) -> Column:
    """Oracle-parity MinHash: sig_i = lexical min over word-n-gram shingles of
    md5(i || ':' || shingle) → array<string> of hex digests.

    md5-as-permutation is the textbook construction with a cross-engine
    reproducible hash; the production path swaps in numpy xxhash signatures
    (operators/minhash.py) with the identical plan shape.
    """
    grams = word_ngrams(text_col, n)
    return F.transform(
        F.sequence(F.lit(0), F.lit(num_perm - 1)),
        lambda i: F.array_min(F.transform(
            grams, lambda g: F.md5(F.concat(i.cast("string"), F.lit(":"), g)))))


def minhash_md5_signatures(df: DataFrame, id_col: str = "doc_id",
                           text_col: str = "text", num_perm: int = 8,
                           n: int = 3) -> DataFrame:
    """→ (id, sig_0..sig_{k-1} flattened to one '|'-joined string).

    Narrow projection, no shuffle; the flat string form keeps the driver's
    hash-compare schema simple.
    """
    sig = minhash_md5_signature(F.col(text_col), num_perm, n)
    return df.select(F.col(id_col).cast("long").alias("id"),
                     F.concat_ws("|", sig).alias("sig"))


def minhash_md5_bands(df: DataFrame, id_col: str = "doc_id",
                      text_col: str = "text", num_perm: int = 8,
                      rows_per_band: int = 2, n: int = 3) -> DataFrame:
    """→ thin (id, band, band_key) rows: md5 of each signature band.

    The explode inflates rows num_bands× but each row is ~50 bytes — the
    shuffle that follows (band-key self-join) moves O(corpus × bands) tiny
    rows, not documents.
    """
    num_bands = num_perm // rows_per_band
    sig = minhash_md5_signature(F.col(text_col), num_perm, n)
    bands = F.transform(
        F.sequence(F.lit(0), F.lit(num_bands - 1)),
        lambda b: F.struct(
            b.alias("band"),
            F.md5(F.concat_ws(",", F.slice(sig, b * rows_per_band + 1,
                                           rows_per_band))).alias("band_key")))
    return (df.select(F.col(id_col).cast("long").alias("id"),
                      F.explode(bands).alias("bk"))
            .select("id", F.col("bk.band").alias("band"),
                    F.col("bk.band_key").alias("band_key")))


def minhash_md5_pairs(df: DataFrame, id_col: str = "doc_id",
                      text_col: str = "text", num_perm: int = 8,
                      rows_per_band: int = 2, n: int = 3) -> DataFrame:
    """LSH candidate pairs: ids sharing any signature band → (a, b) distinct.

    ONE shuffle (self-join on (band, band_key)); candidates are verified by
    exact Jaccard downstream, so false positives only cost a lookup.
    """
    bands = minhash_md5_bands(df, id_col, text_col, num_perm, rows_per_band, n)
    l, r = bands.alias("l"), bands.alias("r")
    return (l.join(r, ["band", "band_key"])
            .filter(F.col("l.id") < F.col("r.id"))
            .select(F.col("l.id").alias("a"), F.col("r.id").alias("b"))
            .distinct())


def simhash16(text_col: Column) -> Column:
    """16-bit SimHash from the md5 of each token (first 4 hex chars).

    bit b of the fingerprint = majority sign over tokens of bit b.
    Pure Column expressions — narrow, no shuffle; near-dup = small Hamming
    distance, joined via rotated-prefix buckets at scale.
    """
    toks = tokens(text_col)
    tokvals = F.transform(
        toks, lambda t: F.conv(F.substring(F.md5(t), 1, 4), 16, 10).cast("long"))
    out = F.lit(0).cast("long")
    for b in range(SIMHASH_BITS):
        ones = F.size(F.filter(tokvals,
                               lambda v: v.bitwiseAND(F.lit(1 << b)) != 0))
        bit = (ones * 2 > F.size(tokvals)).cast("long")
        out = out + bit * F.lit(1 << b)
    return out


def simhash_fingerprints(df: DataFrame, id_col: str = "doc_id",
                         text_col: str = "text") -> DataFrame:
    return df.select(F.col(id_col).cast("long").alias("id"),
                     simhash16(F.col(text_col)).alias("simhash"))


def hamming16(a: Column, b: Column) -> Column:
    """Popcount of XOR over 16 bits (bit_count is in both engines)."""
    return F.bit_count(a.bitwiseXOR(b))


def simhash_near_pairs(df: DataFrame, id_col: str = "doc_id",
                       text_col: str = "text", max_hamming: int = 3) -> DataFrame:
    """SimHash near-dup pairs by banded buckets (Hamming ≤ max_hamming).

    Splits the 16-bit fingerprint into (max_hamming+1) bands — pigeonhole:
    any pair within the Hamming radius shares ≥1 exact band — then verifies
    the distance on the banded candidates. Same ONE-shuffle shape as LSH.
    """
    nb = max_hamming + 1
    width = SIMHASH_BITS // nb
    fps = simhash_fingerprints(df, id_col, text_col)
    bands = F.transform(
        F.sequence(F.lit(0), F.lit(nb - 1)),
        lambda i: F.struct(
            i.alias("band"),
            F.shiftrightunsigned(F.col("simhash"), i * width)
            .bitwiseAND(F.lit((1 << width) - 1)).alias("band_key")))
    exploded = fps.select("id", "simhash", F.explode(bands).alias("bk")) \
        .select("id", "simhash", F.col("bk.band").alias("band"),
                F.col("bk.band_key").alias("band_key"))
    l, r = exploded.alias("l"), exploded.alias("r")
    return (l.join(r, ["band", "band_key"])
            .filter(F.col("l.id") < F.col("r.id"))
            .select(F.col("l.id").alias("a"), F.col("r.id").alias("b"),
                    hamming16(F.col("l.simhash"), F.col("r.simhash")).alias("dist"))
            .filter(F.col("dist") <= max_hamming)
            .distinct())


def embedding_cosine_pairs(df: DataFrame, id_col: str = "vec_id",
                           vec_col: str = "embedding",
                           threshold: float = 0.95) -> DataFrame:
    """Embedding near-dup: all-pairs cosine ≥ threshold → (a, b, sim).

    Brute-force tier (verification / small blocks). The scale path blocks
    by coarse quantization first — see operators/similarity.py.
    """
    from .similarity import cosine_sim
    v = df.select(F.col(id_col).cast("long").alias("id"),
                  F.col(vec_col).cast("array<double>").alias("v"))
    a, b = v.alias("a"), v.alias("b")
    sim = cosine_sim(F.col("a.v"), F.col("b.v"))
    return (a.join(b, F.col("a.id") < F.col("b.id"))
            .select(F.col("a.id").alias("a"), F.col("b.id").alias("b"),
                    F.round(sim, 4).alias("sim"))
            .filter(F.col("sim") >= threshold))
