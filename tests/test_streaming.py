"""Structured Streaming ingest tests: incremental pages → triples with
checkpoint resume, and the watermarked per-host rate aggregation."""

import os

import pytest

from rdf_tabular_spark.sources.pages import DOC_PAGE_META, pages_from_documents
from rdf_tabular_spark.streaming.ingest import (stream_pages_to_triples,
                                                triples_rate_per_host)

SF_DIR = "/root/testdata/sf0.001"


def _write_batch(spark, tmp, name, lo, hi):
    docs = (spark.read.parquet(f"{SF_DIR}/documents.parquet")
            .filter(f"doc_id >= {lo} and doc_id < {hi}"))
    pages_from_documents(docs).write.mode("append") \
        .parquet(os.path.join(tmp, "pages_in"))


def test_stream_ingest_and_resume(spark, tmp_path):
    tmp = str(tmp_path)
    in_dir = os.path.join(tmp, "pages_in")
    out_dir = os.path.join(tmp, "triples_out")
    ckpt = os.path.join(tmp, "ckpt")

    _write_batch(spark, tmp, "b1", 0, 40)
    q = stream_pages_to_triples(spark, in_dir, out_dir, ckpt,
                                default_meta=DOC_PAGE_META)
    q.awaitTermination(120)
    n1 = spark.read.parquet(out_dir).count()
    assert n1 == 40 * 4  # 4 cell triples per single-row page

    # append a second batch; re-running with the same checkpoint processes
    # ONLY the new files (exactly-once file accounting)
    _write_batch(spark, tmp, "b2", 40, 100)
    q = stream_pages_to_triples(spark, in_dir, out_dir, ckpt,
                                default_meta=DOC_PAGE_META)
    q.awaitTermination(120)
    out = spark.read.parquet(out_dir)
    assert out.count() == 100 * 4
    # no duplicates: every (subj, pred) pair appears exactly once
    assert out.select("subj", "pred").distinct().count() == 100 * 4


def test_stream_rate_per_host(spark, tmp_path):
    """Append-mode windowed aggregation emits a window only once the
    watermark passes its end — the second batch (later event times)
    finalizes the first 1-minute window."""
    tmp = str(tmp_path)
    in_dir = os.path.join(tmp, "pages_in")
    out = os.path.join(tmp, "rates")
    ckpt = os.path.join(tmp, "rates_ckpt")

    _write_batch(spark, tmp, "b1", 0, 50)  # warc_ts = 00:00:00 .. 00:00:49
    q = triples_rate_per_host(spark, in_dir, out, ckpt,
                              default_meta=DOC_PAGE_META,
                              watermark="0 seconds")
    q.awaitTermination(120)

    _write_batch(spark, tmp, "b2", 50, 100)  # event time advances to 00:01:39
    q = triples_rate_per_host(spark, in_dir, out, ckpt,
                              default_meta=DOC_PAGE_META,
                              watermark="0 seconds")
    q.awaitTermination(120)

    rows = spark.read.parquet(out).collect()
    # window [00:00, 00:01) closed: docs 0-59, 4 triples each
    assert [(r["host"], r["n_triples"]) for r in rows] == \
        [("pages.example.org", 60 * 4)]


def test_stream_dedup_exact_cross_batch(spark, tmp_path):
    """applyInPandasWithState custom stateful operator: the first page per
    distinct text is emitted; duplicates within a batch, in later batches,
    and across a checkpointed restart are all dropped."""
    import pandas as pd
    from rdf_tabular_spark.streaming.ingest import stream_dedup_exact
    import datetime

    tmp = str(tmp_path)
    in_dir = os.path.join(tmp, "pages_in")
    out_dir = os.path.join(tmp, "dedup_out")
    ckpt = os.path.join(tmp, "ckpt")
    ts = datetime.datetime(2024, 1, 1)

    def page(url, text):
        return (url, ts, text.encode(), text, "en")

    cols = ["url", "warc_ts", "html", "text", "lang"]
    from rdf_tabular_spark.sources.pages import PAGES_SCHEMA
    # batch 1: A twice (intra-batch dup), B once
    spark.createDataFrame(
        [page("http://h/1", "textA"), page("http://h/2", "textA"),
         page("http://h/3", "textB")], PAGES_SCHEMA) \
        .write.mode("append").parquet(in_dir)
    q = stream_dedup_exact(spark, in_dir, out_dir, ckpt)
    q.awaitTermination(120)
    out1 = {r["url"]: r["text"] for r in spark.read.parquet(out_dir).collect()}
    assert out1 == {"http://h/1": "textA", "http://h/3": "textB"}

    # batch 2 after restart: A again (cross-batch dup, must be dropped by
    # checkpointed state) + new C
    spark.createDataFrame(
        [page("http://h/4", "textA"), page("http://h/5", "textC")],
        PAGES_SCHEMA).write.mode("append").parquet(in_dir)
    q = stream_dedup_exact(spark, in_dir, out_dir, ckpt)
    q.awaitTermination(120)
    out2 = {r["url"]: r["text"] for r in spark.read.parquet(out_dir).collect()}
    assert out2 == {"http://h/1": "textA", "http://h/3": "textB",
                    "http://h/5": "textC"}


def test_stream_curate_pages(spark, tmp_path):
    """Streaming curation: stateless PII scrub + quality decision per
    micro-batch, exactly-once across a restart, and batch-path parity of
    the decision columns."""
    from pyspark.sql import functions as F

    from rdf_tabular_spark.streaming.ingest import stream_curate_pages

    tmp = str(tmp_path)
    in_dir = os.path.join(tmp, "pages_in")
    out_dir = os.path.join(tmp, "curated_out")
    ckpt = os.path.join(tmp, "ckpt_cur")

    _write_batch(spark, tmp, "b1", 0, 40)
    q = stream_curate_pages(spark, in_dir, out_dir, ckpt)
    q.awaitTermination(120)
    out1 = spark.read.parquet(out_dir)
    assert out1.count() == 40
    assert {"text", "n_emails", "n_ips", "n_phones", "reason",
            "keep"} <= set(out1.columns)

    _write_batch(spark, tmp, "b2", 40, 70)
    q = stream_curate_pages(spark, in_dir, out_dir, ckpt)
    q.awaitTermination(120)
    out = spark.read.parquet(out_dir)
    assert out.count() == 70
    assert out.select("url").distinct().count() == 70

    # decision parity with the batch operator over the SAME pages table
    # (the streaming input is extracted page text, not raw doc text; page
    # texts are all distinct so the batch duplicate rule never fires and
    # the reason sets are comparable)
    from rdf_tabular_spark.operators.curate import curation_report
    docs = (spark.read.parquet(f"{SF_DIR}/documents.parquet")
            .filter("doc_id < 70"))
    batch = {r["url"]: r["reason"]
             for r in curation_report(pages_from_documents(docs),
                                      key="url").collect()}
    stream = {r["url"]: r["reason"] for r in out.collect()}
    assert all(v != "duplicate" for v in batch.values())
    assert stream == batch
    assert "lang_mismatch" in set(batch.values())  # rules really fire


def test_stream_ntriples_to_store_exactly_once(spark, tmp_path):
    """Streaming RDF ingest: nt files -> graph store with manifest-
    idempotent epoch commits; a re-run with the same checkpoint ingests
    only NEW files, and the committed manifests carry stream lineage."""
    import glob
    import json

    from rdf_tabular_spark.sinks.graph_store import read_graph
    from rdf_tabular_spark.streaming.ingest import stream_ntriples_to_store

    tmp = str(tmp_path)
    in_dir = os.path.join(tmp, "nt_in")
    store = os.path.join(tmp, "graph")
    ckpt = os.path.join(tmp, "ckpt")
    os.makedirs(in_dir)
    with open(os.path.join(in_dir, "a.nt"), "w") as f:
        for i in range(30):
            f.write(f"<http://s/{i}> <http://p> \"v{i}\" .\n")

    q = stream_ntriples_to_store(spark, in_dir, store, ckpt)
    q.awaitTermination(120)
    assert read_graph(spark, store).count() == 30

    # second drop: only the new file lands, as a new epoch batch
    with open(os.path.join(in_dir, "b.nt"), "w") as f:
        for i in range(30, 45):
            f.write(f"<http://s/{i}> <http://p> \"v{i}\" .\n")
    q = stream_ntriples_to_store(spark, in_dir, store, ckpt)
    q.awaitTermination(120)
    g = read_graph(spark, store)
    assert g.count() == 45
    assert g.select("subj").distinct().count() == 45

    manifests = sorted(glob.glob(os.path.join(store, "_manifests",
                                              "stream-*.json")))
    assert len(manifests) >= 2
    with open(manifests[0]) as f:
        m = json.load(f)
    assert m["lineage"]["source"] == "stream"


def test_stream_pages_to_store_end_to_end(spark, tmp_path):
    """Continuous KG construction: pages stream -> stage 1-2 extraction ->
    store commits with epoch lineage; a second crawl drop lands as a new
    epoch batch and the store query sees both."""
    import glob
    import json

    from rdf_tabular_spark.sinks.graph_store import read_graph
    from rdf_tabular_spark.streaming.ingest import stream_pages_to_store

    tmp = str(tmp_path)
    in_dir = os.path.join(tmp, "pages_in")
    store = os.path.join(tmp, "graph")
    ckpt = os.path.join(tmp, "ckpt")
    _write_batch(spark, tmp, "b1", 0, 20)

    q = stream_pages_to_store(spark, in_dir, store, ckpt,
                              default_meta=DOC_PAGE_META)
    q.awaitTermination(180)
    n1 = read_graph(spark, store).count()
    assert n1 > 0

    _write_batch(spark, tmp, "b2", 20, 30)
    q = stream_pages_to_store(spark, in_dir, store, ckpt,
                              default_meta=DOC_PAGE_META)
    q.awaitTermination(180)
    g = read_graph(spark, store)
    assert g.count() > n1

    manifests = sorted(glob.glob(os.path.join(store, "_manifests",
                                              "crawl-*.json")))
    assert len(manifests) >= 2
    with open(manifests[0]) as f:
        m = json.load(f)
    assert m["lineage"]["source"] == "stream-pages"


def test_stream_minhash_pairs_cross_batch(spark, tmp_path):
    """Stateful streaming near-dedup: near-identical pages pair even when
    they arrive in different micro-batches across a checkpointed restart;
    dissimilar pages never pair."""
    import datetime

    from rdf_tabular_spark.sources.pages import PAGES_SCHEMA
    from rdf_tabular_spark.streaming.ingest import stream_minhash_pairs

    tmp = str(tmp_path)
    in_dir = os.path.join(tmp, "pages_in")
    out_dir = os.path.join(tmp, "pairs_out")
    ckpt = os.path.join(tmp, "ckpt")
    ts = datetime.datetime(2024, 1, 1)

    base = ("the quick brown fox jumps over the lazy dog while the "
            "cat sleeps on the warm mat near the door")
    near = base.replace("warm", "cold")
    other = ("completely unrelated text about spark shuffles and "
             "partition pruning in distributed query engines at scale")

    def page(url, text):
        return (url, ts, text.encode(), text, "en")

    # batch 1: base + an unrelated doc — no pairs yet
    spark.createDataFrame(
        [page("http://h/a", base), page("http://h/x", other)],
        PAGES_SCHEMA).write.mode("append").parquet(in_dir)
    q = stream_minhash_pairs(spark, in_dir, out_dir, ckpt, threshold=0.5)
    q.awaitTermination(120)
    out1 = spark.read.parquet(out_dir).collect()
    assert out1 == []

    # batch 2 after restart: the near-dup arrives — the cross-batch pair
    # must emit from checkpointed bucket state
    spark.createDataFrame(
        [page("http://h/b", near)], PAGES_SCHEMA) \
        .write.mode("append").parquet(in_dir)
    q = stream_minhash_pairs(spark, in_dir, out_dir, ckpt, threshold=0.5)
    q.awaitTermination(120)
    pairs = {(r["a"], r["b"]) for r in spark.read.parquet(out_dir).collect()}
    assert pairs == {("http://h/a", "http://h/b")}
    sims = [r["est_sim"] for r in spark.read.parquet(out_dir).collect()]
    assert all(s >= 0.5 for s in sims)

    # replaying the same batch (idempotent restart, no new files) adds nothing
    q = stream_minhash_pairs(spark, in_dir, out_dir, ckpt, threshold=0.5)
    q.awaitTermination(120)
    again = {(r["a"], r["b"]) for r in spark.read.parquet(out_dir).collect()}
    assert again == pairs


def test_stream_sessionize_event_time_timeout(spark, tmp_path):
    """Event-time session windows (applyInPandasWithState +
    EventTimeTimeout): an in-stream gap closes a session immediately;
    quiescent sessions close once the watermark passes end + gap; state
    and watermark survive a checkpointed restart."""
    import datetime

    from rdf_tabular_spark.streaming.ingest import stream_sessionize

    tmp = str(tmp_path)
    in_dir = os.path.join(tmp, "events_in")
    out_dir = os.path.join(tmp, "sessions_out")
    ckpt = os.path.join(tmp, "ckpt")

    def ev(eid, hh, mm, uid, val):
        return (eid, datetime.datetime(2024, 1, 1, hh, mm), uid, "click", val)

    schema = ("event_id long, ts timestamp, user_id long, "
              "event_type string, value double")
    # batch 1 — user 1: 10:00 + 10:10 (one session), then 12:00 (gap > 30m
    # closes session 1 inline); user 2: 10:05 (stays open)
    spark.createDataFrame(
        [ev(0, 10, 0, 1, 1.0), ev(1, 10, 10, 1, 2.0),
         ev(2, 12, 0, 1, 4.0), ev(3, 10, 5, 2, 8.0)],
        schema).write.mode("append").parquet(in_dir)
    q = stream_sessionize(spark, in_dir, out_dir, ckpt)
    q.awaitTermination(120)
    got1 = {(r["user_id"], r["n_events"], r["sum_value"])
            for r in spark.read.parquet(out_dir).collect()}
    assert (1, 2, 3.0) in got1            # the inline-closed session

    # batch 2 after restart: a 23:00 event (user 3) pushes the watermark
    # (1h delay) to 22:00 — past both open sessions' end + gap, so the
    # event-time timeout emits them
    spark.createDataFrame([ev(4, 23, 0, 3, 16.0)], schema) \
        .write.mode("append").parquet(in_dir)
    q = stream_sessionize(spark, in_dir, out_dir, ckpt)
    q.awaitTermination(120)
    rows = spark.read.parquet(out_dir).collect()
    got2 = {(r["user_id"], r["n_events"], r["sum_value"]) for r in rows}
    assert got2 == {(1, 2, 3.0),          # u1 session 1
                    (1, 1, 4.0),          # u1 session 2 (timed out)
                    (2, 1, 8.0)}          # u2 (timed out)
    base = datetime.datetime(2024, 1, 1).timestamp()
    s1 = next(r for r in rows if r["user_id"] == 1 and r["n_events"] == 2)
    assert s1["start_us"] == int((base + 10 * 3600) * 1e6)
    assert s1["end_us"] == int((base + 10 * 3600 + 600) * 1e6)


def test_stream_sessionize_matches_batch_query(spark, tmp_path):
    """The streaming and batch faces of sessionization must agree: after a
    sentinel event pushes the watermark past every real session, the
    streamed session set equals queries.events_sessionize over the same
    events (bounds integer-exact, sums to 4 decimals)."""
    import datetime

    from pyspark.sql import functions as F

    from rdf_tabular_spark import queries as Q
    from rdf_tabular_spark.streaming.ingest import stream_sessionize

    tmp = str(tmp_path)
    in_dir = os.path.join(tmp, "events_in")
    out_dir = os.path.join(tmp, "sessions_out")
    ckpt = os.path.join(tmp, "ckpt")

    sf_dir = "/root/testdata/sf0.001"
    ev = spark.read.parquet(f"{sf_dir}/events.parquet") \
        .select("event_id", F.col("ts").cast("timestamp").alias("ts"),
                "user_id", "event_type", "value")
    ev.write.mode("append").parquet(in_dir)
    q = stream_sessionize(spark, in_dir, out_dir, ckpt)
    q.awaitTermination(180)
    # sentinel (user -1) far past every real event: watermark sweep closes
    # all remaining open sessions on the restarted run
    spark.createDataFrame(
        [(10**9, datetime.datetime(2030, 1, 1), -1, "x", 0.0)],
        "event_id long, ts timestamp, user_id long, "
        "event_type string, value double").write.mode("append").parquet(in_dir)
    q = stream_sessionize(spark, in_dir, out_dir, ckpt)
    q.awaitTermination(180)

    streamed = {(r["user_id"], r["start_us"], r["end_us"], r["n_events"],
                 round(r["sum_value"], 4))
                for r in spark.read.parquet(out_dir).collect()
                if r["user_id"] != -1}
    batch = {(r["user_id"], r["start_us"], r["end_us"], r["n_events"],
              round(r["sum_value"], 4))
             for r in Q.queries()["events_sessionize"](spark, sf_dir).collect()}
    assert streamed == batch


def test_stream_pages_to_store_combined_facets(spark, tmp_path):
    """combined=True streams the fused three-facet kernel (tables +
    microdata + JSON-LD) with in-kernel robots compliance — the stream
    path and the batch path share the exact stage, so per-facet subjects
    all land in the store and noindex pages (doc_id % 7 == 3) emit
    nothing."""
    from rdf_tabular_spark.sinks.graph_store import read_graph
    from rdf_tabular_spark.streaming.ingest import stream_pages_to_store

    tmp = str(tmp_path)
    in_dir = os.path.join(tmp, "pages_in")
    store = os.path.join(tmp, "graph")
    ckpt = os.path.join(tmp, "ckpt")
    _write_batch(spark, tmp, "b1", 0, 21)

    q = stream_pages_to_store(spark, in_dir, store, ckpt,
                              default_meta=DOC_PAGE_META,
                              combined=True, respect_noindex=True)
    q.awaitTermination(180)
    subs = {r.subj for r in
            read_graph(spark, store).select("subj").distinct().collect()}
    base = "http://pages.example.org/doc/"
    assert f"{base}4#doc-4" in subs      # CSVW table facet
    assert f"{base}4#jld" in subs        # JSON-LD facet
    assert any(s == f"{base}0#item" for s in subs)   # microdata facet
    # robots: doc 3 (and 10, 17) are noindex — no facet emits for them
    assert not any(f"/doc/3#" in s for s in subs)
    assert not any(f"/doc/10#" in s for s in subs)
