"""Physical-plan audits: lock in the plan properties that matter at 100 TB
(predicate pushdown, column pruning, broadcast joins, shuffle-free narrow
stages). A regression here costs more at scale than any logic bug."""

import contextlib
import io
import re

from pyspark.sql import functions as F

from rdf_tabular_spark import queries as Q

SF = "/root/testdata/sf0.001"


def plan_of(df, mode="formatted"):
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain(mode)
    return buf.getvalue()


def test_join_order_revenue_broadcasts_and_pushes_filter(spark):
    p = plan_of(Q.queries()["join_order_revenue"](spark, SF))
    assert "BroadcastHashJoin" in p, "dim join must broadcast, not shuffle"
    assert "EqualTo(c_mktsegment,BUILDING)" in p, \
        "segment filter must reach the parquet scan (PushedFilters)"


def test_agg_pricing_summary_prunes_columns(spark):
    p = plan_of(Q.queries()["agg_pricing_summary"](spark, SF))
    m = re.search(r"ReadSchema: struct<([^>]*)>", p)
    cols = {c.split(":")[0] for c in m.group(1).split(",")}
    assert cols == {"l_quantity", "l_extendedprice", "l_returnflag",
                    "l_linestatus"}, f"scan reads too much: {cols}"
    assert p.count("HashAggregate") >= 2, "partial (map-side) agg missing"


def test_text_quality_prunes_columns(spark):
    p = plan_of(Q.queries()["text_quality"](spark, SF))
    m = re.search(r"ReadSchema: struct<([^>]*)>", p)
    cols = {c.split(":")[0] for c in m.group(1).split(",")}
    assert cols == {"doc_id", "text"}


def test_pages_to_triples_is_shuffle_free(spark):
    """Stages 1+2 must stay narrow — one Arrow pass over the pages table;
    any Exchange here would shuffle the whole corpus at 10^12 docs."""
    from rdf_tabular_spark.sources.pages import DOC_PAGE_META, pages_from_documents
    from rdf_tabular_spark.web import pages_to_triples
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    triples = pages_to_triples(pages_from_documents(docs), minimal=True,
                               default_meta=DOC_PAGE_META)
    p = plan_of(triples)
    assert "Exchange" not in p, "pages->triples must not shuffle"


def test_filter_pushdown_reaches_scan(spark):
    df = (spark.read.parquet(f"{SF}/lineitem.parquet")
          .filter(F.col("l_quantity") > 45).select("l_orderkey"))
    p = plan_of(df)
    assert "GreaterThan(l_quantity,45" in p


def test_exact_dedup_single_shuffle(spark):
    from rdf_tabular_spark.operators.dedup import exact_dedup_groups
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    p = plan_of(exact_dedup_groups(docs))
    # one Exchange node (the groupBy); partial aggregation before it
    # (formatted mode prints each node twice: tree + detail section)
    assert len(re.findall(r"\(\d+\) Exchange", p)) == 1
    assert len(re.findall(r"\(\d+\) HashAggregate", p)) == 2


def test_lsh_candidate_pairs_single_shuffle_of_bands(spark):
    """The band self-join is THE shuffle of the dedup path: the thin
    (id, band, band_hash) table is exchanged; signatures must not be."""
    from rdf_tabular_spark.operators.minhash import (lsh_candidate_pairs,
                                                     minhash_signatures)
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    sigs = minhash_signatures(docs, "doc_id", "text", num_perm=16,
                              token_sep=" ")
    p = plan_of(lsh_candidate_pairs(sigs, num_bands=4))
    # the self-join keys are the thin band columns; no Exchange may carry
    # the 16-long sig arrays (at tiny SF AQE may broadcast one side — fine,
    # broadcast of the thin band table is also sig-free)
    assert "band_hash" in p
    for keys in re.findall(r"Exchange hashpartitioning\(([^)]*)\)", p):
        assert "sig" not in keys, f"sig arrays shuffled: {keys}"


def test_ann_lsh_bucket_topk_no_shuffle(spark):
    """Bucketed ANN is a broadcast + partition-local filter + TakeOrdered:
    zero Exchange nodes (the limit collapses to TakeOrderedAndProject)."""
    p = plan_of(Q.queries()["ann_lsh_bucket_topk"](spark, SF))
    assert "Exchange hashpartitioning" not in p, "bucketed ANN must not shuffle"
    assert "TakeOrderedAndProject" in p
    assert "BroadcastNestedLoopJoin" in p or "BroadcastHashJoin" in p


def test_exact_dedup_no_forced_broadcast(spark):
    """The keep-id table is ~one row per distinct doc — forcing a broadcast
    OOMs at corpus scale; the join strategy must be left to AQE."""
    from rdf_tabular_spark.operators.dedup import exact_dedup
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    p = plan_of(exact_dedup(docs), mode="extended")
    assert "ResolvedHint" not in p and "broadcast" not in p.split(
        "== Physical Plan ==")[0].lower()


def test_stream_dedup_uses_flatmapgroups_with_state(spark, tmp_path):
    """The streaming dedup must compile to the stateful operator (one
    shuffle on the dup key + per-key state), not a stateless projection."""
    import os
    from rdf_tabular_spark.sources.pages import PAGES_SCHEMA
    from rdf_tabular_spark.streaming.ingest import stream_dedup_exact
    import datetime
    ts = datetime.datetime(2024, 1, 1)
    spark.createDataFrame([("http://h/1", ts, b"x", "x", "en")],
                          PAGES_SCHEMA) \
        .write.parquet(os.path.join(str(tmp_path), "in"))
    q = stream_dedup_exact(spark, os.path.join(str(tmp_path), "in"),
                           os.path.join(str(tmp_path), "out"),
                           os.path.join(str(tmp_path), "ckpt"))
    q.awaitTermination(120)
    batch = spark.read.parquet(os.path.join(str(tmp_path), "out"))
    assert batch.count() == 1
    # the stateful operator appears in the recent progress plan description
    prog = q.recentProgress
    assert prog, "query produced no progress"
    import json as _json
    assert "FlatMapGroupsInPandasWithState" in _json.dumps(
        [p["stateOperators"] for p in prog]) or any(
        p["stateOperators"] for p in prog), \
        "no stateful operator ran in the streaming plan"


def test_graph_store_read_predicate_prunes_buckets(spark, tmp_path):
    """The salted pred_bucket scheme confines one predicate to SALT of the
    64 partitions; read_predicate must turn that into PartitionFilters
    (scan 25% of the store) and still return exactly the pred's triples."""
    from rdf_tabular_spark.sinks.graph_store import materialize, read_predicate
    from rdf_tabular_spark.sources.pages import DOC_PAGE_META, pages_from_documents
    from rdf_tabular_spark.web import pages_to_triples
    docs = spark.read.parquet(f"{SF}/documents.parquet").limit(50)
    triples = pages_to_triples(pages_from_documents(docs), minimal=True,
                               default_meta=DOC_PAGE_META)
    root = str(tmp_path / "store")
    materialize(triples, root, "b1")
    pred = triples.select("pred").first()["pred"]
    df = read_predicate(spark, root, pred)
    p = plan_of(df)
    assert re.search(r"PartitionFilters: \[.*pred_bucket", p), \
        "pred_bucket pruning must reach the scan"
    assert "EqualTo(pred," in p, "pred equality must be pushed"
    from rdf_tabular_spark.sinks.graph_store import read_graph
    expected = read_graph(spark, root).filter(F.col("pred") == pred).count()
    assert df.count() == expected > 0


def test_ivf_partitioned_store_prunes_cells(spark, tmp_path):
    """IVF-on-disk: probing 2 cells must produce a cell-pruned scan."""
    from rdf_tabular_spark.operators.similarity import (ivf_index,
                                                        ivf_read_cells,
                                                        ivf_write_partitioned)
    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    assigned, _ = ivf_index(emb, k=4)
    path = str(tmp_path / "ivf")
    ivf_write_partitioned(assigned, path)
    df = ivf_read_cells(spark, path, [0, 1])
    p = plan_of(df)
    assert re.search(r"PartitionFilters: \[.*cell", p)
    assert df.count() == assigned.filter(F.col("cell").isin([0, 1])).count()


def test_combined_triples_is_shuffle_free(spark):
    """The fused stage 1+1b+2 kernel must stay narrow like the single-facet
    path — one Arrow pass, no Exchange (the separate microdata projection
    used to cost a distinct shuffle for type triples)."""
    from rdf_tabular_spark.sources.pages import DOC_PAGE_META, pages_from_documents
    from rdf_tabular_spark.web import pages_to_combined_triples
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    triples = pages_to_combined_triples(pages_from_documents(docs),
                                        minimal=True,
                                        default_meta=DOC_PAGE_META)
    p = plan_of(triples)
    assert "Exchange" not in p, "fused pages->triples must not shuffle"


def test_dedup_corpus_near_drop_set_broadcasts(spark):
    """The corpus-dedup anti-join must broadcast the (tiny) drop set so the
    document payload never shuffles."""
    p = plan_of(Q.queries()["dedup_corpus_near"](spark, SF))
    assert "BroadcastHashJoin" in p and "LeftAnti" in p, p[:500]


def test_read_subject_pushes_filters(spark, tmp_path):
    """Subject point-lookup: both the subj_bucket equality (row-group
    stats pruning) and the subj equality must reach the parquet scan."""
    import pyspark.sql.functions as SF
    from rdf_tabular_spark.sinks.graph_store import materialize, read_subject
    triples = (spark.range(200).select(
        SF.concat(SF.lit("http://s/"), SF.col("id")).alias("subj"),
        SF.lit("http://p/x").alias("pred"),
        SF.col("id").cast("string").alias("obj"),
        SF.lit(False).alias("obj_is_iri"),
        SF.lit(None).cast("string").alias("obj_datatype"),
        SF.lit(None).cast("string").alias("obj_lang"),
        SF.lit("http://t").alias("table_url"),
        SF.lit(1).cast("long").alias("source_num")))
    root = str(tmp_path / "store")
    materialize(triples, root, "b1")
    got = read_subject(spark, root, "http://s/7")
    p = plan_of(got)
    assert "PushedFilters" in p and "subj_bucket" in p and \
        "EqualTo(subj,http://s/7)" in p, p[-2000:]
    rows = got.collect()
    assert len(rows) == 1 and rows[0]["obj"] == "7"


def test_pii_scrub_shuffle_free_and_pruned(spark):
    """PII redaction is a pure codegen stage: no Exchange, scan reads only
    (doc_id, text) — it must stream at parquet-scan speed at 100 TB."""
    p = plan_of(Q.queries()["text_pii_scrub"](spark, SF))
    assert "Exchange" not in p, "pii scrub must not shuffle"
    m = re.search(r"ReadSchema: struct<([^>]*)>", p)
    cols = {c.split(":")[0] for c in m.group(1).split(",")}
    assert cols == {"doc_id", "text"}


def test_stratified_sample_is_pure_filter(spark):
    """Hash sampling must stay a narrow filter — no shuffle, no sample
    operator with partition-dependent state."""
    p = plan_of(Q.queries()["sample_stratified"](spark, SF))
    assert "Exchange" not in p
    assert "Sample" not in p, "must use the deterministic hash filter"


def test_pack_sequences_single_group_shuffle(spark):
    """Packing shuffles ONCE on the hash group key; the window runs per
    group (parallelism = n_groups), never as one global window."""
    p = plan_of(Q.queries()["pack_sequences"](spark, SF))
    assert len(re.findall(r"\(\d+\) Exchange", p)) == 1, p
    assert "SinglePartition" not in p, \
        "global window would serialize the corpus through one task"
    assert "Window" in p


def test_decontaminate_broadcasts_benchmark(spark):
    """The benchmark shingle set is the small side — it must broadcast;
    shuffling the exploded doc shingles against it would move the whole
    corpus' n-grams."""
    p = plan_of(Q.queries()["text_decontaminate"](spark, SF))
    assert "BroadcastHashJoin" in p


def test_property_table_single_subject_shuffle(spark):
    """The pivot must use the explicit property list (no distinct-values
    pre-job) and shuffle once on subj with map-side partial aggregation."""
    p = plan_of(Q.queries()["kg_property_table"](spark, SF))
    assert len(re.findall(r"\(\d+\) Exchange", p)) == 1, p
    # string max pivot compiles to SortAggregate; partial + final = 2 nodes
    assert len(re.findall(r"\(\d+\) (?:Hash|Sort)Aggregate", p)) == 2


def test_pred_stats_partial_aggregates(spark):
    """Vocabulary-sized distinct-count profile: partial aggregation must
    run before the exchange so only per-partition distincts move."""
    p = plan_of(Q.queries()["kg_pred_stats"](spark, SF))
    assert len(re.findall(r"\(\d+\) HashAggregate", p)) >= 2
    assert len(re.findall(r"\(\d+\) Exchange", p)) <= 2, p


def test_span_stats_grams_never_shuffle(spark):
    """Duplicated-span detection moves only (key, md5) through every
    Exchange; the k-token window strings themselves must stay inside the
    narrow stage that hashes them."""
    p = plan_of(Q.queries()["dedup_span_stats"](spark, SF))
    for keys in re.findall(r"Exchange hashpartitioning\(([^)]*)\)", p):
        assert "gram" not in keys, f"gram strings shuffled: {keys}"


def test_bgp_constant_filters_push_to_scan(spark, tmp_path):
    """A BGP pattern's constant predicate must reach the parquet scan as a
    pushed filter — at 10^12 triples a pattern scan that reads the full
    graph is wrong."""
    from rdf_tabular_spark.operators.bgp import bgp_match
    path = str(tmp_path / "t")
    spark.createDataFrame(
        [("s", "type", "Person"), ("s", "name", "ada")],
        "subj string, pred string, obj string").write.parquet(path)
    t = spark.read.parquet(path)
    p = plan_of(bgp_match(t, [("?x", "type", "Person"), ("?x", "name", "?n")]))
    assert "EqualTo(pred,type)" in p, "constant pred must push down"
    assert "EqualTo(pred,name)" in p
    assert "EqualTo(obj,Person)" in p, "constant obj must push down"


def test_bgp_broadcast_pattern_avoids_shuffle_join(spark):
    from rdf_tabular_spark.operators.bgp import bgp_match
    t = spark.createDataFrame([("a", "mentions", "e"), ("e", "label", "l")],
                              "subj string, pred string, obj string")
    p = plan_of(bgp_match(t, [("?d", "mentions", "?e"),
                              ("?e", "label", "?n")],
                          broadcast_patterns=[1]))
    assert "BroadcastHashJoin" in p
    assert "SortMergeJoin" not in p


def test_pagerank_contrib_has_partial_aggregation(spark):
    """The per-iteration contribution sum must map-side combine — at scale
    the edge→dst shuffle carries one partial per (partition, dst), not one
    row per edge."""
    from rdf_tabular_spark.operators.graph import pagerank
    e = spark.createDataFrame([("a", "b"), ("b", "a"), ("c", "a")],
                              "src string, dst string")
    p = plan_of(pagerank(e, n_iter=1))
    assert p.count("HashAggregate") >= 2


def test_bgp_filter_pushes_into_pattern_scan(spark, tmp_path):
    """A FILTER equality on a bound variable must reach the parquet scan of
    the pattern that binds it — the filter is declared post-join but
    Catalyst pushes it below; at 10^12 triples this is the difference
    between scanning one language and scanning the graph."""
    from rdf_tabular_spark.operators.bgp import bgp_match
    path = str(tmp_path / "t")
    spark.createDataFrame(
        [("s", "inLanguage", "en"), ("s", "name", "x")],
        "subj string, pred string, obj string").write.parquet(path)
    t = spark.read.parquet(path)
    p = plan_of(bgp_match(t, [("?i", "name", "?n"),
                              ("?i", "inLanguage", "?lang")],
                          filters=["lang = 'en'"]))
    assert "EqualTo(obj,en)" in p, "FILTER must push into the scan"


def test_bgp_match_store_prunes_per_pattern(spark, tmp_path):
    """BGP over the graph store: every constant-predicate pattern leg must
    scan through read_predicate's pred_bucket PartitionFilters, and the
    result must equal the unpruned bgp_match over the full store read."""
    from rdf_tabular_spark.operators.bgp import bgp_match
    from rdf_tabular_spark.sinks.graph_store import (bgp_match_store,
                                                     materialize, read_graph)
    from rdf_tabular_spark.sources.pages import pages_from_documents
    from rdf_tabular_spark.web import microdata_to_triples
    docs = spark.read.parquet(f"{SF}/documents.parquet").limit(50)
    triples = microdata_to_triples(pages_from_documents(docs))
    root = str(tmp_path / "store")
    materialize(triples, root, "b1")
    pats = [("?d", "http://schema.org/name", "?name"),
            ("?d", "http://schema.org/inLanguage", "?lang")]
    df = bgp_match_store(spark, root, pats)
    p = plan_of(df)
    assert len(re.findall(r"PartitionFilters: \[.*pred_bucket", p)) == 2, \
        "both pattern legs must carry pred_bucket pruning"
    expected = sorted(map(tuple, bgp_match(
        read_graph(spark, root).select("subj", "pred", "obj"),
        pats).collect()))
    assert sorted(map(tuple, df.collect())) == expected
    assert len(expected) == 50


def test_derive_batch_rule_materialization(spark, tmp_path):
    """CONSTRUCT → store round trip: the derived batch commits with rule
    lineage, is idempotent, and its triples answer subsequent BGPs
    together with the extracted ones."""
    from rdf_tabular_spark.operators.bgp import ask
    from rdf_tabular_spark.sinks.graph_store import (derive_batch,
                                                     materialize,
                                                     read_graph)
    from rdf_tabular_spark.sources.pages import pages_from_documents
    from rdf_tabular_spark.web import microdata_to_triples
    docs = spark.read.parquet(f"{SF}/documents.parquet").limit(30)
    triples = microdata_to_triples(pages_from_documents(docs))
    root = str(tmp_path / "store")
    materialize(triples, root, "b1")

    NAME = "http://schema.org/name"
    m = derive_batch(
        spark, root,
        patterns=[("?s", NAME, "?n")],
        template=[("?s", "http://example.org/voc#label", "?n")],
        batch_id="rule1", rule_id="name-to-label")
    assert m["status"] == "committed" and m["n_triples"] == 30
    assert m["lineage"]["source"] == "rule"
    assert m["lineage"]["rule_id"] == "name-to-label"
    # idempotent resubmission
    m2 = derive_batch(spark, root, patterns=[("?s", NAME, "?n")],
                      template=[("?s", "http://example.org/voc#label", "?n")],
                      batch_id="rule1")
    assert m2["n_triples"] == 30
    # derived triples live in the same graph and answer queries
    g = read_graph(spark, root).select("subj", "pred", "obj")
    assert g.count() == triples.count() + 30
    assert ask(g, [("?s", "http://example.org/voc#label", "?n"),
                   ("?s", NAME, "?n")])
    # statistics-driven planning end-to-end: counts include the rule batch
    # and feed the join order without changing results
    from rdf_tabular_spark.sinks.graph_store import (bgp_match_store,
                                                     predicate_counts)
    pc = predicate_counts(spark, root)
    assert pc["http://example.org/voc#label"] == 30
    pats = [("?s", NAME, "?n"),
            ("?s", "http://example.org/voc#label", "?n")]
    with_stats = sorted(map(tuple, bgp_match_store(
        spark, root, pats, pred_counts=pc).collect()))
    without = sorted(map(tuple, bgp_match_store(spark, root, pats).collect()))
    assert with_stats == without and len(with_stats) == 30


def test_bucketed_star_bgp_no_exchange(spark, tmp_path):
    """Star BGP over the subject-bucketed table tier must plan with ZERO
    Exchange operators — both pattern legs read pre-partitioned and
    pre-sorted on the shared subject variable. This validates the
    co-location claim the BGP module's scale notes make."""
    from rdf_tabular_spark.operators.bgp import bgp_match
    from rdf_tabular_spark.sinks.graph_store import write_bucketed_table
    from rdf_tabular_spark.sources.pages import pages_from_documents
    from rdf_tabular_spark.web import microdata_to_triples
    docs = spark.read.parquet(f"{SF}/documents.parquet").limit(40)
    triples = microdata_to_triples(pages_from_documents(docs))
    write_bucketed_table(triples, "t_bgp_bucketed", n_buckets=8)
    try:
        b = spark.table("t_bgp_bucketed")
        pats = [("?s", "http://schema.org/name", "?n"),
                ("?s", "http://schema.org/inLanguage", "?l")]
        prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        try:
            q = bgp_match(b, pats)
            p = plan_of(q)
            assert "Exchange" not in p, "bucketed star BGP must not shuffle"
            assert q.count() == 40
        finally:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        # parity with the unbucketed path
        plain = sorted(map(tuple, bgp_match(
            triples.select("subj", "pred", "obj"), pats).collect()))
        assert sorted(map(tuple, bgp_match(b, pats).collect())) == plain
    finally:
        spark.sql("drop table if exists t_bgp_bucketed")


def test_bgp_match_store_quads_bind_source_document(spark, tmp_path):
    """GRAPH quads over the store: the graph position binds table_url (the
    extracting page), constant-pred legs STILL prune, and within-document
    joins behave like the ad-hoc quad relation."""
    from pyspark.sql import functions as F
    from rdf_tabular_spark.operators.bgp import bgp_match
    from rdf_tabular_spark.sinks.graph_store import (bgp_match_store,
                                                     materialize, read_graph)
    from rdf_tabular_spark.sources.pages import pages_from_documents
    from rdf_tabular_spark.web import microdata_to_triples
    docs = spark.read.parquet(f"{SF}/documents.parquet").limit(40)
    triples = microdata_to_triples(pages_from_documents(docs))
    root = str(tmp_path / "store")
    materialize(triples, root, "b1")
    pats = [("?g", "?d", "http://schema.org/name", "?name"),
            ("?g", "?d", "http://schema.org/inLanguage", "?lang")]
    df = bgp_match_store(spark, root, pats)
    p = plan_of(df)
    assert len(re.findall(r"PartitionFilters: \[.*pred_bucket", p)) == 2, \
        "quad legs must keep pred_bucket pruning"
    rows = df.collect()
    assert len(rows) == 40
    assert all(r.g.startswith("http://") for r in rows)
    expected = sorted(map(tuple, bgp_match(
        read_graph(spark, root).withColumn("graph", F.col("table_url"))
        .select("graph", "subj", "pred", "obj"), pats).collect()))
    assert sorted(map(tuple, rows)) == expected


def test_bgp_subselect_broadcasts_inner(spark):
    """The subquery's one-row-per-group aggregate must broadcast onto the
    outer bindings — shuffling the outer binding stream on the group key
    would add a corpus-sized exchange at 10^12 triples."""
    p = plan_of(Q.queries()["kg_bgp_subselect"](spark, SF))
    assert "BroadcastHashJoin" in p
    # the outer->inner join itself must not introduce a hash-partition
    # exchange on the group key (lang)
    assert not re.search(r"Exchange hashpartitioning\(lang", p), \
        "subselect join shuffled the outer bindings"


def test_sameas_rewrite_broadcasts_mapping(spark):
    """The sameAs canonical map covers only terms in sameAs statements —
    a sliver of the graph — so both rewrite joins must broadcast; an
    Exchange of the triple stream on subj/obj would shuffle the corpus."""
    p = plan_of(Q.queries()["kg_sameas_canonical"](spark, SF))
    assert p.count("BroadcastHashJoin") >= 2
    assert not re.search(r"Exchange hashpartitioning\((subj|obj)", p), \
        "sameas rewrite shuffled the triple stream"


def test_retraction_read_broadcasts_delete_set(spark, tmp_path):
    """Retraction subtraction must reach the plan as a broadcast anti-join
    of the edit-sized delete set — never a shuffle of the data stream."""
    from pyspark.sql import functions as F

    from rdf_tabular_spark.sinks.graph_store import (materialize,
                                                     read_graph,
                                                     retract_batch)
    root = str(tmp_path / "g")
    rows = [(f"s{i}", "p", f"o{i}") for i in range(200)]
    df = spark.createDataFrame(rows, "subj string, pred string, obj string") \
        .select("subj", "pred", "obj", F.lit(True).alias("obj_is_iri"),
                F.lit(None).cast("string").alias("obj_datatype"),
                F.lit(None).cast("string").alias("obj_lang"),
                F.lit("t").alias("table_url"),
                F.lit(0).cast("long").alias("source_num"))
    materialize(df, root, "b1")
    retract_batch(spark, root, "r1", spark.createDataFrame(
        [("s1", "p", "o1")], "subj string, pred string, obj string"))
    p = plan_of(read_graph(spark, root))
    assert "BroadcastHashJoin" in p and "LeftAnti" in p
    assert not re.search(r"Exchange hashpartitioning\(subj", p), \
        "retraction read shuffled the data stream"


def test_semantic_dedup_pairs_joins_on_cell_only(spark):
    """SemDeDup's scale contract: the within-cluster self-join exchanges on
    the CELL key only — at k sized to executor memory no partition ever
    holds more than one cluster's quadratic block. The argmin assignment
    is a projection (no exchange of its own beyond the join's)."""
    from rdf_tabular_spark.operators.dedup import semantic_dedup_pairs
    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    p = plan_of(semantic_dedup_pairs(emb, k=8, threshold=0.4, dim=64))
    # the self-join must key on cell — as a shuffled hash join at scale, or
    # (at tiny SF, where stats let one side broadcast) a broadcast join
    # whose keys are still the cell
    key_lines = re.findall(r"(?:Left|Right) keys \[\d+\]: \[([^\]]*)\]", p)
    assert key_lines, "expected a keyed self-join"
    for keys in key_lines:
        assert keys.startswith("cell#"), keys
    # no exchange may ever carry the raw vectors
    for keys in re.findall(r"Exchange hashpartitioning\(([^)]*)\)", p):
        assert "cell" in keys and "embedding" not in keys, keys


def test_lm_score_broadcasts_model_tables(spark):
    """The fitted LM is broadcast (caps bound it regardless of corpus
    size); the only shuffle on the scoring path is the doc-key
    aggregation — a shuffle join on the gram key would move the whole
    corpus' bigrams."""
    p = plan_of(Q.queries()["text_perplexity"](spark, SF))
    assert p.count("BroadcastHashJoin") >= 2, p[:800]


def test_importance_sample_take_ordered(spark):
    """DSIR top-N selection must plan as TakeOrderedAndProject
    (per-partition heaps), never a global Sort; the two feature
    distributions broadcast."""
    p = plan_of(Q.queries()["sample_importance"](spark, SF))
    assert "TakeOrderedAndProject" in p, p[:800]
    assert p.count("BroadcastHashJoin") >= 2


def test_bloom_probe_broadcasts_bit_sets(spark):
    """Bloom decontamination probes via broadcast LEFT SEMI joins on the
    hashed positions — the bit sets are bounded by filter geometry."""
    p = plan_of(Q.queries()["text_decontaminate_bloom"](spark, SF))
    assert "LeftSemi" in p
    assert p.count("BroadcastHashJoin") >= 2


def test_every_python_kernel_site_ships_the_package():
    """Structural lint: every mapInPandas / mapInArrow / applyInPandas
    launch site in the package must be preceded (within the same file,
    ≤ 60 lines above) by a self-ship call — ensure_package_on_executors
    or session.shipped — or executors running from spark-submit without
    the repo on sys.path fail to import the kernel's closures. This
    pins the bug class instead of each instance (several kernel sites
    shipped without it before the guard existed)."""
    import pathlib
    pkg = pathlib.Path(__file__).resolve().parents[1] / "rdf_tabular_spark"
    launch = re.compile(r"\.(mapInPandas|mapInArrow|applyInPandas)\(")
    ship = re.compile(r"ensure_package_on_executors|shipped\(")
    missing = []
    for path in sorted(pkg.rglob("*.py")):
        lines = path.read_text().splitlines()
        for i, line in enumerate(lines):
            if not launch.search(line):
                continue
            window = "\n".join(lines[max(0, i - 60):i + 1])
            if not ship.search(window):
                missing.append(f"{path.name}:{i + 1}")
    assert not missing, f"kernel sites without a self-ship call: {missing}"


def test_comention_pair_join_keys_on_doc(spark):
    """Co-mention pair generation must self-join on the DOC key (fan-out
    bounded per document) and the marginals must broadcast — a shuffle
    join on the entity key would move corpus-sized mention lists."""
    from rdf_tabular_spark.web import comention_pmi
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    p = plan_of(comention_pmi(docs, ["spark", "customer", "vector"],
                              min_pairs=2))
    assert "BroadcastHashJoin" in p, "marginals must broadcast"
    key_lines = re.findall(r"(?:Left|Right) keys \[\d+\]: \[([^\]]*)\]", p)
    doc_keyed = [k for k in key_lines if k.startswith("doc#")]
    assert doc_keyed, f"expected a doc-keyed self-join, got {key_lines}"
    # the mention-filter isin must evaluate before the distinct shuffle:
    # no Exchange may carry the raw text column
    for keys in re.findall(r"Exchange hashpartitioning\(([^)]*)\)", p):
        assert "text" not in keys, keys


def test_edit_verified_pairs_scans_candidates_only(spark):
    """The Levenshtein verify tier must join texts by id equality onto the
    banded candidate set — never a cartesian / all-pairs text comparison."""
    from rdf_tabular_spark.operators.dedup import edit_verified_pairs
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    p = plan_of(edit_verified_pairs(docs, min_sim=0.5))
    assert "CartesianProduct" not in p and "BroadcastNestedLoopJoin" not in p
    assert "levenshtein" in p.lower()


def test_latest_snapshot_single_shuffle_partial_maxby(spark):
    """Recrawl dedup must be ONE keyed shuffle with map-side partial
    max_by — a row_number window (shuffle + sort, no combine) regresses
    at crawl scale."""
    from rdf_tabular_spark.operators.dedup import latest_snapshot
    from rdf_tabular_spark.sources.pages import pages_from_documents
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    p = plan_of(latest_snapshot(pages_from_documents(docs)))
    assert len(re.findall(r"\(\d+\) Exchange", p)) == 1
    assert "partial_max_by" in p, "map-side combine missing"
    assert "Window" not in p


def test_pages_to_anchors_is_narrow(spark):
    """Anchor extraction is stage 1c: one Arrow pass, no shuffle."""
    from rdf_tabular_spark.sources.pages import pages_from_documents
    from rdf_tabular_spark.web import pages_to_anchors
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    p = plan_of(pages_to_anchors(pages_from_documents(docs)))
    assert "Exchange" not in p


def test_tfidf_prunes_columns_and_partial_aggs(spark):
    """TF-IDF reads only (doc_id, text); both keyed counts combine
    map-side before their exchanges."""
    from rdf_tabular_spark.operators.text import tfidf_top_terms
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    p = plan_of(tfidf_top_terms(docs))
    m = re.search(r"ReadSchema: struct<([^>]*)>", p)
    cols = {c.split(":")[0] for c in m.group(1).split(",")}
    assert cols == {"doc_id", "text"}
    assert "partial_count" in p, "map-side combine missing on tf/df aggs"


def test_sessionize_single_exchange(spark):
    """Sessionization: the (user, session) groupBy must reuse the lag
    window's user_id hash partitioning — exactly ONE Exchange; a second
    shuffle on (user, session) would double the clickstream's network cost."""
    p = plan_of(Q.queries()["events_sessionize"](spark, SF))
    assert len(re.findall(r"\(\d+\) Exchange", p)) == 1


def test_triangle_counts_no_cartesian(spark):
    """Degree-oriented wedge joins must stay equi-keyed — a cartesian or
    nested-loop join here is the super-node wedge explosion the
    orientation exists to prevent."""
    p = plan_of(Q.queries()["graph_triangles"](spark, SF))
    assert "CartesianProduct" not in p
    assert "BroadcastNestedLoopJoin" not in p


def test_neighbor_jaccard_no_cartesian_and_prunes(spark):
    p = plan_of(Q.queries()["kg_related_pages"](spark, SF))
    assert "CartesianProduct" not in p
    assert "BroadcastNestedLoopJoin" not in p
    m = re.search(r"ReadSchema: struct<([^>]*)>", p)
    cols = {c.split(":")[0] for c in m.group(1).split(",")}
    assert cols == {"doc_id"}, f"edge build reads too much: {cols}"


def test_classifier_margin_is_one_narrow_stage(spark):
    """The model gate is a projection — any Exchange means the linear
    scorer stopped being a map-side stage."""
    p = plan_of(Q.queries()["text_quality_classifier"](spark, SF))
    assert "Exchange" not in p
    m = re.search(r"ReadSchema: struct<([^>]*)>", p)
    cols = {c.split(":")[0] for c in m.group(1).split(",")}
    assert cols == {"doc_id", "text"}


def test_ppl_buckets_single_window_exchange_on_lang(spark):
    """After the LM-scoring aggregation, the CCNet cut adds exactly one
    hash Exchange keyed on lang for the NTILE window (plus the score
    groupBy's own exchange upstream) — no global single-partition sort."""
    p = plan_of(Q.queries()["corpus_ppl_buckets"](spark, SF))
    assert "SinglePartition" not in p, "NTILE must not collapse to one task"
    assert re.search(r"hashpartitioning\(lang", p), \
        "per-language window exchange missing"


def test_join_supplier_profit_broadcasts_all_dims(spark):
    """Q9 shape: three dim sides (part filtered, supplier, nation) all
    broadcast; the p_type prefix filter reaches the part scan; the only
    Exchange is the final (n_name, p_brand) groupBy."""
    p = plan_of(Q.queries()["join_supplier_profit"](spark, SF))
    assert p.count("BroadcastHashJoin") >= 3, "all dim joins must broadcast"
    assert "StringStartsWith(p_type,SMALL)" in p, \
        "brand-prefix filter must reach the part scan (PushedFilters)"
    assert len(re.findall(r"\(\d+\) Exchange", p)) == 1, \
        "only the final groupBy may shuffle"


def test_ann_cosine_batch_topk_one_scan_one_shuffle(spark):
    """Batch ANN: the query frame broadcasts (one corpus scan scores every
    query) and the only hash Exchange is the per-query window key — scored
    thin rows, never embedding arrays."""
    import re
    p = plan_of(Q.queries()["ann_cosine_batch_topk"](spark, SF))
    assert "BroadcastNestedLoopJoin" in p or "BroadcastHashJoin" in p, \
        "query frame must broadcast"
    assert len(re.findall(r"\(\d+\) Exchange\b", p)) == 1, \
        "batch ANN must shuffle once (the per-query window key)"
    assert re.search(r"hashpartitioning\(query_id", p)
    for keys in re.findall(r"hashpartitioning\(([^)]*)\)", p):
        assert "embedding" not in keys, f"embedding arrays shuffled: {keys}"
    # map-side top-k: WindowGroupLimit prunes to k rows per query per
    # partition BEFORE the Exchange, so the shuffle carries ~k·|Q| rows
    # per task, not the scored corpus
    assert "WindowGroupLimit" in p


def test_incremental_dedup_thin_shuffles(spark):
    """Incremental batch-vs-store dedup: every Exchange carries band/id
    columns only — document text never crosses the wire, and the anti-join
    id projections broadcast."""
    import re
    p = plan_of(Q.queries()["dedup_incremental_keep"](spark, SF))
    for keys in re.findall(r"hashpartitioning\(([^)]*)\)", p):
        assert "text" not in keys, f"document text shuffled: {keys}"
    assert "BroadcastHashJoin" in p, \
        "survivor anti-joins must broadcast the thin id sets"


def test_characteristic_sets_narrow_shuffles(spark):
    """Characteristic sets: the object column must never shuffle — both
    exchanges carry only subj / predicate-set keys."""
    p = plan_of(Q.queries()["kg_characteristic_sets"](spark, SF))
    for keys in re.findall(r"hashpartitioning\(([^)]*)\)", p):
        assert "obj" not in keys, f"object column shuffled: {keys}"
    assert p.count("HashAggregate") >= 4, \
        "both aggs must have map-side partials"


def test_er_blocked_joins_vocab_not_rows(spark):
    """Blocked ER: the Levenshtein join inputs are the distinct-name aggs
    (vocabulary-sized), so only brand/name/cnt columns move — never the
    other part attributes — and the scan reads just the two key columns."""
    p = plan_of(Q.queries()["er_blocked_part_names"](spark, SF))
    m = re.search(r"ReadSchema: struct<([^>]*)>", p)
    cols = {c.split(":")[0] for c in m.group(1).split(",")}
    assert cols == {"p_brand", "p_name"}, f"scan reads too much: {cols}"
    assert p.count("HashAggregate") >= 2, \
        "name-vocabulary agg must precede the pair join"


def test_skipgram_single_keyed_selfjoin(spark):
    """Skip-gram pairs: every exchange is keyed on the walk identity or the
    output pair — node payloads ride along, never become the only key."""
    p = plan_of(Q.queries()["graph_skipgram_pairs"](spark, SF))
    assert "CartesianProduct" not in p
    assert p.count("HashAggregate") >= 2, "pair count needs map-side partial"


def n_exchanges(p):
    # formatted mode prints each node twice (tree + details); count the
    # details header, once per physical Exchange node
    return len(re.findall(r"\(\d+\) Exchange", p))


def test_fuse_majority_payload_free_shuffles(spark):
    """Fusion: exactly two keyed exchanges — the vote count (with map-side
    partial) and the per-attribute window — and no join or cartesian
    anywhere."""
    p = plan_of(Q.queries()["kg_fused_triples"](spark, SF))
    assert n_exchanges(p) == 2, "fusion must be two keyed shuffles"
    assert p.count("HashAggregate") >= 2, "vote count needs map-side partial"
    assert "Join" not in p and "CartesianProduct" not in p


def test_reify_statements_single_exchange(spark):
    """Reification: the distinct is the only exchange; the 4x explode is a
    narrow projection (Generate) after it."""
    from rdf_tabular_spark.operators.fusion import reify_statements
    from rdf_tabular_spark.sources.pages import DOC_PAGE_META, pages_from_documents
    from rdf_tabular_spark.web import pages_to_triples
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    t = pages_to_triples(pages_from_documents(docs), minimal=True,
                         default_meta=DOC_PAGE_META)
    p = plan_of(reify_statements(t))
    assert n_exchanges(p) == 1, "only the distinct may shuffle"
    assert "Generate" in p, "explode must stay narrow"


def test_hearst_single_vocab_shuffle(spark):
    """Hearst extraction: regexp work is all narrow; the only exchange keys
    on the extracted-pair vocabulary (the aggregate), and the scan reads
    only doc_id + text."""
    p = plan_of(Q.queries()["kg_hearst_pairs"](spark, SF))
    # 2 = pair-vocabulary agg + countDistinct's second phase — extraction
    # itself contributes none
    assert n_exchanges(p) == 2, "extraction itself must not shuffle"
    m = re.search(r"ReadSchema: struct<([^>]*)>", p)
    cols = {c.split(":")[0] for c in m.group(1).split(",")}
    assert cols == {"doc_id", "text"}, f"scan reads too much: {cols}"


def test_bpe_pairs_vocab_first(spark):
    """BPE pair stats: corpus collapses to the word vocabulary before the
    pair expansion — two exchanges total, both aggs with map-side
    partials, text column only in the scan."""
    p = plan_of(Q.queries()["text_bpe_pairs"](spark, SF))
    assert n_exchanges(p) == 2
    assert p.count("HashAggregate") >= 4, "both aggs need map-side partials"
    m = re.search(r"ReadSchema: struct<([^>]*)>", p)
    cols = {c.split(":")[0] for c in m.group(1).split(",")}
    assert cols == {"text"}, f"scan reads too much: {cols}"


def test_readability_shuffle_free(spark):
    """Readability: pure per-row regexp_count projection — zero exchanges,
    pruned scan."""
    p = plan_of(Q.queries()["text_readability"](spark, SF))
    assert "Exchange" not in p, "readability must stay narrow"
    m = re.search(r"ReadSchema: struct<([^>]*)>", p)
    cols = {c.split(":")[0] for c in m.group(1).split(",")}
    assert cols == {"doc_id", "text"}, f"scan reads too much: {cols}"


def test_neighbor_sample_single_window_shuffle(spark):
    """GraphSAGE fan-out: distinct + one src-keyed window — two exchanges
    total, no join."""
    p = plan_of(Q.queries()["graph_neighbor_sample"](spark, SF))
    assert n_exchanges(p) <= 2
    assert "Join" not in p


def test_sage_features_layer_budget(spark):
    """Two-layer mean aggregation: each layer is one edge join + one keyed
    agg — the standard 2-shuffle-per-layer budget; no cartesian, and the
    feature scan reads only doc_id + n_chars."""
    p = plan_of(Q.queries()["graph_sage_features"](spark, SF))
    assert "CartesianProduct" not in p
    ms = re.findall(r"ReadSchema: struct<([^>]*)>", p)
    cols = {c.split(":")[0] for m in ms for c in m.split(",")}
    assert cols == {"doc_id", "n_chars"}, f"scan reads too much: {cols}"


def test_edge_split_no_shuffle_beyond_distinct(spark):
    """Link-prediction split: the md5-bucket assignment is a pure
    projection — the dedup distinct is the only exchange."""
    p = plan_of(Q.queries()["graph_edge_split"](spark, SF))
    assert n_exchanges(p) <= 1
    assert "Join" not in p


def test_host_boilerplate_vocab_keyed_and_broadcast_totals(spark):
    """Boilerplate detection: counts key on the per-host line vocabulary
    and the page totals come back via a broadcast join — never a
    sort-merge on the line table."""
    p = plan_of(Q.queries()["text_host_boilerplate"](spark, SF))
    assert "BroadcastHashJoin" in p
    assert "SortMergeJoin" not in p


def test_keyphrases_single_vocab_agg(spark):
    """Keyphrases: narrow split+explode, one aggregation keyed on the
    phrase vocabulary, text-only scan."""
    p = plan_of(Q.queries()["text_keyphrases"](spark, SF))
    assert n_exchanges(p) == 1
    m = re.search(r"ReadSchema: struct<([^>]*)>", p)
    cols = {c.split(":")[0] for c in m.group(1).split(",")}
    assert cols == {"text"}, f"scan reads too much: {cols}"


def test_pred_profiles_single_vocab_agg(spark):
    """Value profiling: one map-side-combined aggregation keyed on the
    predicate local name — a single exchange."""
    p = plan_of(Q.queries()["kg_pred_profiles"](spark, SF))
    assert n_exchanges(p) == 1
    assert p.count("HashAggregate") >= 2, "needs a map-side partial"


def test_schema_drift_joins_summaries_not_triples(spark):
    """Schema drift: the FULL-OUTER join (never broadcastable in Spark —
    both sides need null-extension) must run on the two aggregated
    characteristic-set summaries keyed on ``cs``, never on raw triple
    rows: the join-side exchanges carry only the cs key."""
    p = plan_of(Q.queries()["kg_schema_drift"](spark, SF))
    assert "FullOuter" in p
    assert "hashpartitioning(cs" in p, "join must key on the cs summary"
    for keys in re.findall(r"hashpartitioning\(([^)]*)\)", p):
        assert "obj" not in keys, f"object column shuffled: {keys}"
