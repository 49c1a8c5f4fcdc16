"""MinHash-LSH near-duplicate blocking — Spark-native shuffle plan, numpy-
vectorized signatures.

Generic over any (id, text) DataFrame; used for (a) subject canonicalization
blocking in the KG pipeline (north_rule stage 3) and (b) document near-dup
detection in the training-data ops.

Plan shape (what matters at 100 TB):
  signatures: narrow Arrow stage (numpy, O(n_rows · num_perm))
  banding:    explode to (band, band_hash, id) — num_bands× row inflation of a
              THIN table (3 cols), then ONE shuffle: self-join on
              (band, band_hash) with id< id to form candidate pairs.
  verify:     exact Jaccard on the candidates only (second shuffle is a join
              back to the token sets, broadcast when one side is small).
AQE skew-join handles hot buckets; a bucket-size cap guards degenerate bands.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (ArrayType, LongType, StringType, StructField,
                               StructType)

_MERSENNE = (1 << 61) - 1


def _perm_params(num_perm: int, seed: int) -> tuple[np.ndarray, np.ndarray]:
    rng = np.random.RandomState(seed)
    a = rng.randint(1, _MERSENNE, size=num_perm, dtype=np.int64)
    b = rng.randint(0, _MERSENNE, size=num_perm, dtype=np.int64)
    return a, b


def _shingle_hashes_vec(text: str, k: int) -> np.ndarray:
    """Vectorized shingle hashing via byte-window dot products."""
    b = np.frombuffer(text.encode("utf-8"), dtype=np.uint8)
    if len(b) < k:
        b = np.pad(b, (0, k - len(b)), constant_values=0)
    windows = np.lib.stride_tricks.sliding_window_view(b, k).astype(np.uint64)
    weights = np.power(np.uint64(31), np.arange(k, dtype=np.uint64),
                       dtype=np.uint64)
    return (windows * weights).sum(axis=1, dtype=np.uint64)


def _md5_u64(s: str) -> int:
    """Token → uint64 = first 8 bytes (big-endian) of md5. C-implemented
    (faster than a pure-Python FNV byte loop) and reproducible in the DuckDB
    oracle as ('0x' || substring(md5(t), 1, 16))::ubigint."""
    import hashlib
    return int.from_bytes(hashlib.md5(s.encode("utf-8")).digest()[:8], "big")


def minhash_signatures(df: DataFrame, id_col: str, text_col: str,
                       num_perm: int = 64, shingle_k: int = 5,
                       seed: int = 1, token_sep: str | None = None) -> DataFrame:
    """→ (id, sig: array<long>) — narrow Arrow stage, no shuffle.

    ``token_sep``: shingle at TOKEN granularity (split on the separator)
    instead of character k-shingles. For structured profiles
    (field=value|field=value|...) char shingles make every record look
    alike (shared field names and small vocabularies push Jaccard ≈ 0.85
    between genuinely different records), which floods every LSH bucket and
    makes the candidate join quadratic in corpus size; token shingles keep
    distinct records dissimilar so buckets stay small.
    """
    a_params, b_params = _perm_params(num_perm, seed)

    schema = StructType([
        StructField("id", StringType(), False),
        StructField("sig", ArrayType(LongType()), False),
    ])

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        a = a_params.astype(np.uint64)
        b = b_params.astype(np.uint64)
        m = np.uint64(_MERSENNE)
        for pdf in batches:
            ids, sigs = [], []
            for rid, text in zip(pdf[id_col], pdf[text_col]):
                s = str(text or "")
                if token_sep is not None:
                    toks = [t for t in s.split(token_sep) if t]
                    sh = np.unique(np.array(
                        [_md5_u64(t) for t in toks] or [0], dtype=np.uint64))
                else:
                    sh = np.unique(_shingle_hashes_vec(s, shingle_k))
                # (a*x + b) mod p, min over shingles, per permutation
                vals = (sh[None, :] * a[:, None] + b[:, None]) % m
                sig = vals.min(axis=1).astype(np.int64)
                ids.append(str(rid))
                sigs.append(sig.tolist())
            yield pd.DataFrame({"id": ids, "sig": sigs})

    from ..session import ensure_package_on_executors
    ensure_package_on_executors(df.sparkSession)
    return df.mapInPandas(kernel, schema=schema)


def lsh_bands(sig_df: DataFrame, num_bands: int = 16) -> DataFrame:
    """(id, sig) → (id, band, band_hash): thin exploded table for the
    bucket join. Pure Column expressions (codegen), no Python."""
    num_perm = None  # derived per row with slice
    rows_per_band = F.floor(F.size("sig") / num_bands).cast("int")
    bands = F.transform(
        F.sequence(F.lit(0), F.lit(num_bands - 1)),
        lambda b: F.struct(
            b.alias("band"),
            F.xxhash64(F.concat_ws(",", F.transform(
                F.slice("sig", b * rows_per_band + 1, rows_per_band),
                lambda x: x.cast("string")))).alias("band_hash"),
        ),
    )
    return (sig_df.select("id", F.explode(bands).alias("bh"))
            .select("id", F.col("bh.band").alias("band"), F.col("bh.band_hash").alias("band_hash")))


def lsh_candidate_pairs(sig_df: DataFrame, num_bands: int = 16,
                        max_bucket: int = 2000,
                        releases: list | None = None,
                        min_band_matches: int = 1) -> DataFrame:
    """→ distinct (a, b) candidate pairs, a < b. One shuffle (self-join on
    band keys); degenerate buckets (> max_bucket ids) are dropped with the cap
    logged into the plan rather than silently exploding quadratically.

    ``min_band_matches``: require the pair to collide in at least this many
    bands (the count falls out of the same join — no extra shuffle). With
    r-row bands, P(k of b bands match) falls off as C(b,k)·J^rk, so k=2
    cuts low-similarity accidental collisions ~50-100x while keeping
    recall at the threshold ≳0.93 — the difference between a 3M-pair and a
    40k-pair verification join on a corpus whose profiles draw from small
    vocabularies (measured on the 20k-page scenario).

    The FILTERED band table is persisted — the self-join's two sides would
    otherwise each recompute the bucket-size window AND the signature
    kernel's whole upstream lineage (persisting upstream of the window
    still leaves the window+filter running twice, once per join side —
    a full extra pass over the band table at scale)."""
    bands = lsh_bands(sig_df, num_bands)
    # prune oversized buckets before the quadratic pair join
    sized = bands.withColumn(
        "bucket_n", F.count("*").over(
            __import__("pyspark.sql.window", fromlist=["Window"]).Window
            .partitionBy("band", "band_hash")))
    bands = sized.filter(F.col("bucket_n") <= max_bucket).drop("bucket_n") \
        .persist()
    if releases is not None:
        releases.append(bands)  # caller unpersists after its terminal action
    left = bands.alias("l")
    right = bands.alias("r")
    hits = (left.join(right, on=["band", "band_hash"])
            .filter(F.col("l.id") < F.col("r.id"))
            .select(F.col("l.id").alias("a"), F.col("r.id").alias("b")))
    if min_band_matches > 1:
        return (hits.groupBy("a", "b").agg(F.count("*").alias("_nb"))
                .filter(F.col("_nb") >= min_band_matches).drop("_nb"))
    return hits.distinct()


#: verified-cascade broadcast budget: below this many candidate pairs the
#: pair set broadcasts into the signature scans (two broadcast joins, the
#: 64-long sig arrays never shuffle); above it, shuffle joins. ~50 B/pair
#: keeps the broadcast well under executor memory at the cap.
BROADCAST_PAIRS_MAX = 1_000_000


def signature_similarity_edges(sig_df: DataFrame, num_bands: int = 16,
                               threshold: float = 0.5,
                               max_bucket: int = 2000,
                               releases: list | None = None,
                               min_band_matches: int = 1) -> DataFrame:
    """Candidate pairs verified by estimated Jaccard (matching minhash
    fraction) ≥ threshold → (a, b, sim) edges.

    Size-adaptive verification (r5): the candidate set is persisted and
    counted once; below :data:`BROADCAST_PAIRS_MAX` it BROADCASTS into
    the two signature lookups, so the signature table (the wide side —
    64 longs per row) is scanned narrowly instead of shuffled twice
    (measured 5.5 s → 2.7 s on the 20k-page scenario at 491k pairs).
    Above the cap the original shuffle joins run — at that size the
    pair set is the big side and broadcasting it would be the bug.

    ``releases``: optional list that receives every DataFrame persisted
    inside — the caller unpersists them after its terminal action so storage
    memory doesn't accumulate across batches in a long-lived driver."""
    pairs = lsh_candidate_pairs(sig_df, num_bands, max_bucket, releases,
                                min_band_matches).persist()
    if releases is not None:
        releases.append(pairs)
    n_pairs = pairs.count()
    sigs = sig_df.select(F.col("id"), F.col("sig"))
    sim = (F.size(F.filter(F.zip_with("sig_a", "sig_b", lambda x, y: x == y),
                           lambda eq: eq)) / F.size("sig_a"))
    if n_pairs <= BROADCAST_PAIRS_MAX:
        j1 = (sigs.join(F.broadcast(pairs), sigs["id"] == pairs["a"])
              .select("a", "b", F.col("sig").alias("sig_a")))
        joined = (sigs.join(F.broadcast(j1), sigs["id"] == j1["b"])
                  .select("a", "b", "sig_a", F.col("sig").alias("sig_b")))
    else:
        joined = (pairs
                  .join(sigs.withColumnsRenamed({"id": "a", "sig": "sig_a"}),
                        on="a")
                  .join(sigs.withColumnsRenamed({"id": "b", "sig": "sig_b"}),
                        on="b"))
    return (joined.withColumn("sim", sim)
            .filter(F.col("sim") >= threshold)
            .select("a", "b", "sim"))
