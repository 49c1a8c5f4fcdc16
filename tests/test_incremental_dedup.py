"""Incremental (cross-snapshot) near-dedup: band store + batch-vs-store join.

The continuous-ingestion tier of MinHash-LSH dedup (operators/dedup.py):
the accumulated corpus is represented by its thin (id, band, band_key)
band table; each arriving batch computes its own bands and joins against
the store — old x old never forms. Generalizes the reference's one-shot
row dedup (rdf-tabular processes a table per run) to a corpus that grows
batch by batch.
"""
import re

import pytest
from pyspark.sql import functions as F

from rdf_tabular_spark.operators import dedup as D

# three near-identical docs (shared 3-gram shingles) + one distinct one;
# long enough that every doc has shingles.
_BASE = "the quick brown fox jumps over the lazy dog again and again"
_DOCS = [
    (1, _BASE),                                # old corpus
    (2, "totally unrelated content about spark shuffles and parquet files"),
    (11, _BASE + " exactly"),                  # new batch: near-dup of 1
    (12, _BASE),                               # new batch: dup of 1 and 11
    (13, "fresh novel text that matches nothing else in the corpus today"),
]


def _frames(spark):
    df = spark.createDataFrame(_DOCS, "doc_id long, text string")
    return df.filter("doc_id < 10"), df.filter("doc_id >= 10")


def test_incremental_pairs_only_cross_snapshot(spark):
    old, new = _frames(spark)
    old_bands = D.minhash_md5_bands(old)
    pairs = D.incremental_md5_pairs(new, old_bands)
    got = {(r["new_id"], r["old_id"]) for r in pairs.collect()}
    # both near-dups of doc 1 collide with the store; nothing pairs with
    # doc 2, and no new x new or old x old rows appear in the output shape
    assert got == {(11, 1), (12, 1)}


def test_incremental_keep_drops_store_hits_and_intra_batch(spark):
    old, new = _frames(spark)
    old_bands = D.minhash_md5_bands(old)
    kept = D.incremental_keep(new, old_bands)
    assert [r["doc_id"] for r in kept.orderBy("doc_id").collect()] == [13]


def test_incremental_keep_without_store_dedups_batch_only(spark):
    _, new = _frames(spark)
    empty = D.minhash_md5_bands(new).limit(0)
    kept = D.incremental_keep(new, empty)
    # 11 survives as the min-id of the intra-batch near-dup group {11, 12}
    assert [r["doc_id"] for r in kept.orderBy("doc_id").collect()] == [11, 13]


def test_band_store_roundtrip_and_pruned_read(spark, tmp_path):
    old, new = _frames(spark)
    store = str(tmp_path / "bands")
    D.write_band_store(D.minhash_md5_bands(old), store)
    back = D.read_band_store(spark, store)
    direct = D.minhash_md5_bands(old)
    assert (sorted(map(tuple, back.collect()))
            == sorted(map(tuple, direct.collect())))
    # the store is partitioned by band: a band-restricted read must prune
    plan = back.filter(F.col("band") == 0)._jdf.queryExecution() \
        .executedPlan().toString()
    assert re.search(r"PartitionFilters: \[.*band", plan)
    # appending a second batch accumulates (the ingestion contract)
    new_bands = D.minhash_md5_bands(new)
    D.write_band_store(new_bands, store)
    assert (D.read_band_store(spark, store).count()
            == back.count() + new_bands.count())

    pairs = D.incremental_md5_pairs(new, D.read_band_store(spark, store)
                                    .filter("id < 10"))
    assert {(r["new_id"], r["old_id"]) for r in pairs.collect()} \
        == {(11, 1), (12, 1)}


def test_stream_docs_dedup_incremental(spark, tmp_path):
    """Streaming face: each micro-batch dedups against the accumulated band
    store; survivors and their bands land per-epoch (replay-idempotent)."""
    import os
    from rdf_tabular_spark.streaming.ingest import (
        stream_docs_dedup_incremental)

    tmp = str(tmp_path)
    in_dir, out_dir = os.path.join(tmp, "in"), os.path.join(tmp, "out")
    ckpt, store = os.path.join(tmp, "ckpt"), os.path.join(tmp, "bands")
    ddl = "doc_id long, text string, lang string, source string, n_chars long"

    def doc(i, text):
        return (i, text, "en", "src", len(text))

    # drop 1: one near-dup pair inside the batch
    spark.createDataFrame([doc(1, _BASE), doc(2, _BASE + " exactly"),
                           doc(3, _DOCS[1][1])], ddl) \
        .write.mode("append").parquet(in_dir)
    q = stream_docs_dedup_incremental(spark, in_dir, out_dir, ckpt, store)
    q.awaitTermination(120)
    kept1 = sorted(r["doc_id"]
                   for r in spark.read.parquet(out_dir).collect())
    assert kept1 == [1, 3]  # 2 shadowed by 1 inside the batch

    # drop 2: a near-dup of epoch 1's survivor + a novel doc
    spark.createDataFrame([doc(11, _BASE), doc(12, _DOCS[4][1])], ddl) \
        .write.mode("append").parquet(in_dir)
    q = stream_docs_dedup_incremental(spark, in_dir, out_dir, ckpt, store)
    q.awaitTermination(120)
    kept2 = sorted(r["doc_id"]
                   for r in spark.read.parquet(out_dir).collect())
    assert kept2 == [1, 3, 12]  # 11 collides with stored doc 1


def test_dedup_stream_job(spark, tmp_path):
    """jobs/dedup_stream.py: the spark-submit surface for the streaming
    incremental tier — one availableNow drain dedups, reports, resumes."""
    import os
    from rdf_tabular_spark.jobs.dedup_stream import main

    tmp = str(tmp_path)
    ddl = "doc_id long, text string, lang string, source string, n_chars long"
    spark.createDataFrame(
        [(1, _BASE, "en", "s", 10), (2, _BASE + " exactly", "en", "s", 10)],
        ddl).write.mode("append").parquet(os.path.join(tmp, "in"))
    args = ["--in", os.path.join(tmp, "in"), "--out", os.path.join(tmp, "o"),
            "--band-store", os.path.join(tmp, "b"),
            "--checkpoint", os.path.join(tmp, "c")]
    s1 = main(args)
    assert s1["n_kept"] == 1 and s1["n_epochs"] == 1
    # second drop: near-dup of the stored survivor + a novel doc
    spark.createDataFrame(
        [(11, _BASE, "en", "s", 10), (12, _DOCS[4][1], "en", "s", 10)],
        ddl).write.mode("append").parquet(os.path.join(tmp, "in"))
    s2 = main(args)
    assert s2["n_kept"] == 2 and s2["n_epochs"] == 2
    kept = {r["doc_id"] for r in
            spark.read.parquet(os.path.join(tmp, "o")).collect()}
    assert kept == {1, 12}


# --- exact repeated-substring dedup (round 5) -------------------------------

def test_repeated_substring_spans_and_scrub(spark):
    """Lee-et-al-style exact substring dedup: a shared 10-token run is
    found as ONE merged span per document (overlapping shingles collapse),
    unshared documents pass through untouched, and the scrub rebuilds
    text without the span."""
    from rdf_tabular_spark.operators.dedup import (
        repeated_substring_spans, scrub_repeated_substrings)
    docs = spark.createDataFrame([
        (1, "a b c d e f g h unique one two three"),
        (2, "x y a b c d e f g h z w q r s t"),
        (3, "totally different words only here nothing shared at all ok"),
        (4, "pad pad a b c d e f g h i j k l m n o p"),
    ], "doc_id long, text string")
    spans = {(r["doc_id"], r["span_start"], r["span_end"])
             for r in repeated_substring_spans(docs, k=8).collect()}
    assert spans == {(1, 1, 8), (2, 3, 10), (4, 3, 10)}
    out = {r["doc_id"]: (r["clean_text"], r["n_removed"])
           for r in scrub_repeated_substrings(docs, k=8).collect()}
    assert out[1] == ("unique one two three", 8)
    assert out[2] == ("x y z w q r s t", 8)
    assert out[3][1] == 0 and out[3][0].startswith("totally different")
    assert out[4] == ("pad pad i j k l m n o p", 8)
    # fully-covered document -> empty clean_text, everything removed
    twin = spark.createDataFrame(
        [(1, "p q r s t u v w"), (2, "p q r s t u v w")],
        "doc_id long, text string")
    scrubbed = {r["doc_id"]: (r["clean_text"], r["n_removed"])
                for r in scrub_repeated_substrings(twin, k=8).collect()}
    assert scrubbed[1] == ("", 8) and scrubbed[2] == ("", 8)


def test_repeated_substring_no_all_pairs_plan(spark):
    """Plan audit: the detection is ONE count-distinct aggregation + a
    semi-ish hash join + a window — no cartesian, no doc-list collect."""
    from rdf_tabular_spark import queries as Q
    from tests.test_plans import plan_of
    p = plan_of(Q.queries()["dedup_substring_spans"](
        spark, "/root/testdata/sf0.001"))
    assert "CartesianProduct" not in p and "collect_list" not in p
    assert "HashAggregate" in p and "Window" in p


def test_scrub_min_span_tokens_keeps_short_matches(spark):
    """Production knob: min_span_tokens only scrubs long merged runs —
    a 10-token shared run survives a 12-token floor, and is removed at
    the default floor."""
    from rdf_tabular_spark.operators.dedup import scrub_repeated_substrings
    docs = spark.createDataFrame([
        (1, "a b c d e f g h i j tail1 x1"),
        (2, "a b c d e f g h i j tail2 x2"),
    ], "doc_id long, text string")
    strict = {r["doc_id"]: r["n_removed"] for r in
              scrub_repeated_substrings(docs, k=8).collect()}
    assert strict == {1: 10, 2: 10}
    lenient = {r["doc_id"]: (r["clean_text"], r["n_removed"]) for r in
               scrub_repeated_substrings(docs, k=8,
                                         min_span_tokens=12).collect()}
    assert lenient[1] == ("a b c d e f g h i j tail1 x1", 0)
    assert lenient[2][1] == 0


def test_substring_spans_invariants(spark):
    """Structural invariants on real data (sf0.001 documents): merged
    spans never overlap within a document, every span is at least k
    tokens, and scrub token accounting is exact (n_removed = total
    tokens - kept tokens, clean_text word count = kept)."""
    from rdf_tabular_spark.operators.dedup import (
        repeated_substring_spans, scrub_repeated_substrings)
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet") \
        .select("doc_id", "text")
    k = 8
    spans = repeated_substring_spans(docs, k=k).collect()
    by_doc = {}
    for r in spans:
        assert r["span_end"] - r["span_start"] + 1 >= k
        by_doc.setdefault(r["doc_id"], []).append(
            (r["span_start"], r["span_end"]))
    assert by_doc, "fixture should contain repeated shingles"
    for d, ss in by_doc.items():
        ss.sort()
        for (s1, e1), (s2, e2) in zip(ss, ss[1:]):
            assert s2 > e1, (d, ss)     # strictly disjoint after merge
    texts = {r["doc_id"]: r["text"] for r in docs.collect()}
    out = scrub_repeated_substrings(docs, k=k).collect()
    assert {r["doc_id"] for r in out} == set(texts)
    import re
    for r in out:
        total = len(re.split(r"\s+", texts[r["doc_id"]]))
        kept = len(r["clean_text"].split()) if r["clean_text"] else 0
        assert r["n_removed"] == total - kept
        covered = sum(e - s + 1 for s, e in by_doc.get(r["doc_id"], []))
        assert r["n_removed"] == covered
