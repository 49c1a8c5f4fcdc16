"""End-to-end spark-submit packaging test: the cluster invocation path
(--py-files zip + jobs/extract.py) must work from a clean cwd with no
repo on sys.path — exactly how a real cluster launches it."""

import json
import os
import subprocess

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SPARK_SUBMIT = "/opt/spark/bin/spark-submit"


@pytest.mark.skipif(not os.path.exists(SPARK_SUBMIT), reason="no spark-submit")
def test_spark_submit_extract_job(tmp_path):
    import sys
    sys.path.insert(0, REPO)
    from rdf_tabular_spark.session import package_zip_path
    zip_path = package_zip_path()

    out_root = str(tmp_path / "graph")
    cmd = [SPARK_SUBMIT, "--master", "local[4]",
           "--conf", "spark.ui.enabled=false",
           "--py-files", zip_path,
           os.path.join(REPO, "rdf_tabular_spark", "jobs", "extract.py"),
           "--synth", "120", "--out", out_root, "--batch-id", "t1",
           "--entity-dict", "--no-canonicalize", "--shuffle-partitions", "8"]
    env = dict(os.environ)
    env.pop("PYTHONPATH", None)
    res = subprocess.run(cmd, cwd=str(tmp_path), env=env,
                         capture_output=True, text=True, timeout=420)
    assert res.returncode == 0, res.stderr[-3000:]
    manifest = json.loads(res.stdout.strip().splitlines()[-1])
    assert manifest["status"] == "committed"
    assert manifest["n_triples"] > 0
    assert os.path.exists(os.path.join(out_root, "_manifests", "t1.json"))

    # resume: second run with the same batch-id must be a committed no-op
    res2 = subprocess.run(cmd, cwd=str(tmp_path), env=env,
                          capture_output=True, text=True, timeout=420)
    assert res2.returncode == 0, res2.stderr[-3000:]
    manifest2 = json.loads(res2.stdout.strip().splitlines()[-1])
    assert manifest2["n_triples"] == manifest["n_triples"]


def test_extract_job_compact_after(spark, tmp_path):
    """--compact-after N: once the store holds >= N live batches the job
    compacts them and expires the inputs — Iceberg-style maintenance from
    inside the ingestion job (in-process; the spark-submit surface is
    covered above)."""
    import sys
    sys.path.insert(0, REPO)
    from rdf_tabular_spark.jobs.extract import main
    from rdf_tabular_spark.sinks.graph_store import live_batches

    out_root = str(tmp_path / "graph")
    base = ["--out", out_root, "--no-canonicalize",
            "--shuffle-partitions", "8", "--compact-after", "2"]
    m1 = main(["--synth", "60", "--batch-id", "c1", *base])
    assert "compacted_into" not in m1          # only one live batch so far
    m2 = main(["--synth", "80", "--batch-id", "c2", *base])
    assert m2["compacted_into"] == "compact-c1-c2"
    assert live_batches(out_root) == {"compact-c1-c2"}
    assert m2["compaction_n_triples"] > 0
    # expiry ran: input data dirs are gone, ids stay resume-skipped
    import os as _os
    assert not _os.path.isdir(_os.path.join(out_root, "data", "batch=c1"))
    m1_again = main(["--synth", "60", "--batch-id", "c1", *base])
    assert m1_again["status"] == "expired"     # resubmission skipped


def test_extract_job_head_meta_and_noindex(spark, tmp_path):
    """--head-meta writes (title, canonical, robots) + canonical groups as
    side outputs; --respect-noindex drops robots-noindex pages BEFORE
    triple extraction (doc fixture: noindex on doc_id % 7 == 3, canonical
    groups of 5)."""
    import sys
    sys.path.insert(0, REPO)
    from rdf_tabular_spark.jobs.extract import main
    from rdf_tabular_spark.sources.pages import pages_from_documents

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet") \
        .limit(70)
    pages_dir = str(tmp_path / "pages")
    pages_from_documents(docs).write.parquet(pages_dir)
    out_root = str(tmp_path / "graph")
    m = main(["--pages", pages_dir, "--out", out_root, "--batch-id", "h1",
              "--no-canonicalize", "--shuffle-partitions", "8",
              "--head-meta", "--respect-noindex"])
    # --head-meta audits ALL crawled pages (incl. the ten noindex ones:
    # doc_ids 3, 10, ..., 66); only TRIPLES respect the robots directive
    assert m["n_head_meta"] == 70
    hm = spark.read.parquet(os.path.join(m["meta_dir"], "head"))
    assert hm.count() == 70 and hm.where("noindex").count() == 10
    assert {r.canonical for r in
            hm.where("url like '%/doc/12'").collect()} \
        == {"http://pages.example.org/doc/10"}
    cg = spark.read.parquet(os.path.join(m["meta_dir"], "canonical_groups"))
    # groups of 5 over 0..69 = 14 groups, each base crawled = representative
    assert cg.count() == 14
    rep = {r.canonical: r.representative for r in cg.collect()}
    assert rep["http://pages.example.org/doc/10"] \
        == "http://pages.example.org/doc/10"
    # noindexed pages contributed no triples to the store (doc pages embed
    # no CSVW script, so store subjects come from microdata + JSON-LD)
    from rdf_tabular_spark.sinks.graph_store import read_graph
    subs = {r.subj for r in
            read_graph(spark, out_root).select("subj").distinct().collect()}
    assert "http://pages.example.org/doc/3#jld" not in subs
    assert "http://pages.example.org/doc/3#item" not in subs
    assert "http://pages.example.org/doc/4#jld" in subs
    assert "http://pages.example.org/doc/4#item" in subs


def test_query_job_bgp_and_path(spark, tmp_path):
    """jobs/query.py: extract a store in-process, then run a BGP (with
    FILTER + MINUS) and a property path against it via the job's main()
    (the spark-submit packaging surface is covered by the extract test —
    query.py uses the same zip/session machinery)."""
    import sys
    sys.path.insert(0, REPO)
    from rdf_tabular_spark.jobs.extract import main as extract_main
    from rdf_tabular_spark.jobs.query import main as query_main

    out_root = str(tmp_path / "graph")
    extract_main(["--synth", "90", "--out", out_root, "--batch-id", "q1",
                  "--no-canonicalize", "--shuffle-partitions", "8"])

    res = query_main([
        "--store", out_root,
        "--bgp", "?s <http://schema.org/name> ?n",
        "--show", "3"])
    assert res["columns"] == ["s", "n"]
    assert res["n_rows"] > 0
    assert len(res["sample"]) == 3

    # MINUS removes everything that also has a containsPlace triple
    res_minus = query_main([
        "--store", out_root,
        "--bgp", "?s <http://schema.org/name> ?n",
        "--minus", "?s <http://schema.org/containsPlace> ?p"])
    assert res_minus["n_rows"] < res["n_rows"] or res_minus["n_rows"] == 0

    # ASK: early-out boolean
    res_ask = query_main([
        "--store", out_root, "--ask",
        "--bgp", "?s <http://schema.org/name> ?n"])
    assert res_ask == {"ask": True}
    res_ask2 = query_main([
        "--store", out_root, "--ask",
        "--bgp", "?s <http://schema.org/noSuchPred> ?n"])
    assert res_ask2 == {"ask": False}

    # ORDER BY + LIMIT: top-k bindings without a full sort
    res_top = query_main([
        "--store", out_root,
        "--bgp", "?s <http://schema.org/name> ?n",
        "--order-by", "n:desc", "--limit", "2"])
    assert res_top["n_rows"] == 2
    names = [r["n"] for r in res_top["sample"]]
    assert names == sorted(names, reverse=True)

    # CONSTRUCT --derive-batch-id: rule batch lands in the store
    res_rule = query_main([
        "--store", out_root,
        "--bgp", "?s <http://schema.org/name> ?n",
        "--construct", "?s <http://example.org/voc#label> ?n",
        "--derive-batch-id", "r1", "--rule-id", "name-label"])
    assert res_rule["status"] == "committed"
    assert res_rule["lineage"]["rule_id"] == "name-label"
    res_after = query_main([
        "--store", out_root, "--ask",
        "--bgp", "?s <http://example.org/voc#label> ?n"])
    assert res_after == {"ask": True}

    # property path: name|containsPlace endpoints, written to parquet
    out = str(tmp_path / "res")
    res_path = query_main([
        "--store", out_root,
        "--path", "<http://schema.org/name>|<http://schema.org/containsPlace>",
        "--out", out])
    assert res_path["n_rows"] >= res["n_rows"]
    assert spark.read.parquet(out).columns == ["src", "dst"]


def test_export_job_formats(spark, tmp_path):
    """jobs/export.py: store -> N-Triples and Turtle, with --predicate
    using the pruned read path."""
    import sys
    sys.path.insert(0, REPO)
    from rdf_tabular_spark.jobs.export import main as export_main
    from rdf_tabular_spark.jobs.extract import main as extract_main

    out_root = str(tmp_path / "graph")
    extract_main(["--synth", "60", "--out", out_root, "--batch-id", "e1",
                  "--no-canonicalize", "--shuffle-partitions", "8"])

    nt = str(tmp_path / "nt")
    res = export_main(["--store", out_root, "--format", "nt", "--out", nt])
    assert res["n_lines"] > 0
    line = spark.read.text(nt).first()["value"]
    assert line.endswith(" .") and line.count(" ") >= 3

    ttl = str(tmp_path / "ttl")
    res2 = export_main(["--store", out_root, "--format", "ttl",
                        "--out", ttl,
                        "--predicate", "http://schema.org/name"])
    assert 0 < res2["n_lines"] <= res["n_lines"]

    # --void: HLL self-description rides along as N-Triples
    nt2 = str(tmp_path / "nt2")
    res3 = export_main(["--store", out_root, "--format", "nt",
                        "--out", nt2, "--void", "http://ex.org/ds"])
    void_lines = [r["value"] for r in
                  spark.read.text(res3["void_out"]).collect()]
    assert any("void#Dataset" in ln for ln in void_lines)
    trip = [ln for ln in void_lines
            if "<http://ex.org/ds> <http://rdfs.org/ns/void#triples>" in ln]
    assert len(trip) == 1 and f'"{res["n_lines"]}"' in trip[0]
    assert any("void#propertyPartition" in ln for ln in void_lines)
    blocks = [r["value"] for r in spark.read.text(ttl).collect()]
    assert all("schema.org/name" in b or not b.startswith("<")
               for b in blocks if b)

    # trig: the store's table_url provenance becomes named-graph blocks
    trig = str(tmp_path / "trig")
    res4 = export_main(["--store", out_root, "--format", "trig",
                        "--out", trig])
    trig_text = "\n".join(r["value"]
                          for r in spark.read.text(trig).collect())
    assert "{" in trig_text and "}" in trig_text


def test_import_job_roundtrip(spark, tmp_path):
    """jobs/import_rdf.py: export a store to nt AND ttl, import each into
    a fresh store — same triple count both ways (interchange closure),
    idempotent on batch-id re-run."""
    import sys
    sys.path.insert(0, REPO)
    from rdf_tabular_spark.jobs.export import main as export_main
    from rdf_tabular_spark.jobs.extract import main as extract_main
    from rdf_tabular_spark.jobs.import_rdf import main as import_main
    from rdf_tabular_spark.sinks.graph_store import read_graph

    out_root = str(tmp_path / "graph")
    m = extract_main(["--synth", "60", "--out", out_root, "--batch-id",
                      "i1", "--no-canonicalize", "--shuffle-partitions",
                      "8"])
    n_src = m["n_triples"]

    for fmt in ("nt", "ttl"):
        dump = str(tmp_path / f"dump_{fmt}")
        export_main(["--store", out_root, "--format", fmt, "--out", dump])
        store2 = str(tmp_path / f"graph_{fmt}")
        res = import_main(["--in", dump, "--format", fmt,
                           "--store", store2, "--batch-id", "b1"])
        assert res["n_triples"] == n_src, fmt
        assert read_graph(spark, store2).count() == n_src
        # idempotent resume: the same batch-id is a committed no-op
        res2 = import_main(["--in", dump, "--format", fmt,
                            "--store", store2, "--batch-id", "b1"])
        assert res2["n_triples"] == n_src


def test_query_job_values_bind_exists_infer(spark, tmp_path):
    """jobs/query.py new algebra flags: --values restricts+extends,
    --bind computes, --exists semi-joins, --infer-rdfs commits an
    entailment batch."""
    import sys
    sys.path.insert(0, REPO)
    from rdf_tabular_spark.jobs.extract import main as extract_main
    from rdf_tabular_spark.jobs.query import main as query_main

    out_root = str(tmp_path / "graph")
    extract_main(["--synth", "90", "--out", out_root, "--batch-id", "v1",
                  "--no-canonicalize", "--shuffle-partitions", "8"])

    base = query_main([
        "--store", out_root,
        "--bgp", "?s <http://schema.org/name> ?n"])

    # --values: restrict ?n to one known name and extend with a label
    known = base["sample"][0]["n"]
    res_v = query_main([
        "--store", out_root,
        "--bgp", "?s <http://schema.org/name> ?n",
        "--values", json.dumps({"columns": ["n", "tag"],
                                "rows": [[known, "hit"]]})])
    assert res_v["columns"] == ["s", "n", "tag"]
    assert res_v["n_rows"] >= 1
    assert all(r["n"] == known and r["tag"] == "hit"
               for r in res_v["sample"])

    # --bind + --filter over the bind var
    res_b = query_main([
        "--store", out_root,
        "--bgp", "?s <http://schema.org/name> ?n",
        "--bind", "n_len=length(n)", "--filter", "n_len > 0"])
    assert res_b["columns"] == ["s", "n", "n_len"]
    assert res_b["n_rows"] == base["n_rows"]

    # --exists: dual of minus — the two partition the base rows
    res_e = query_main([
        "--store", out_root,
        "--bgp", "?s <http://schema.org/name> ?n",
        "--exists", "?s <http://schema.org/containsPlace> ?p"])
    res_m = query_main([
        "--store", out_root,
        "--bgp", "?s <http://schema.org/name> ?n",
        "--minus", "?s <http://schema.org/containsPlace> ?p"])
    assert res_e["n_rows"] + res_m["n_rows"] == base["n_rows"]

    # --infer-rdfs: seed a subclass statement, entail, verify via ASK
    from pyspark.sql import functions as F
    from rdf_tabular_spark.sinks.graph_store import materialize
    typ = "http://www.w3.org/1999/02/22-rdf-syntax-ns#type"
    sub = "http://www.w3.org/2000/01/rdf-schema#subClassOf"
    schema_rows = spark.createDataFrame(
        [("http://schema.org/Place", sub, "http://example.org/Thing")],
        ["subj", "pred", "obj"]).select(
        "subj", "pred", "obj", F.lit(True).alias("obj_is_iri"),
        F.lit(None).cast("string").alias("obj_datatype"),
        F.lit(None).cast("string").alias("obj_lang"),
        F.lit("seed").alias("table_url"),
        F.lit(0).cast("long").alias("source_num"))
    materialize(schema_rows, out_root, "schema1")
    res_i = query_main(["--store", out_root, "--infer-rdfs",
                        "--derive-batch-id", "rdfs1"])
    assert res_i["status"] == "committed"
    assert res_i["lineage"]["rule_id"] == "rdfs"
    res_ask = query_main([
        "--store", out_root, "--ask",
        "--bgp", f"?s <{typ}> <http://example.org/Thing>"])
    assert res_ask == {"ask": (res_i["n_triples"] > 0)}


def test_query_job_graph_quads(spark, tmp_path):
    """4-term CLI patterns: ?g binds the source document; a constant graph
    term scopes the query to one document."""
    import sys
    sys.path.insert(0, REPO)
    from rdf_tabular_spark.jobs.extract import main as extract_main
    from rdf_tabular_spark.jobs.query import main as query_main

    out_root = str(tmp_path / "graph")
    extract_main(["--synth", "60", "--out", out_root, "--batch-id", "g1",
                  "--no-canonicalize", "--shuffle-partitions", "8"])
    res = query_main([
        "--store", out_root,
        "--bgp", "?g ?s <http://schema.org/name> ?n"])
    assert res["columns"] == ["g", "s", "n"]
    assert res["n_rows"] > 0
    one_graph = res["sample"][0]["g"]
    res_scoped = query_main([
        "--store", out_root,
        "--bgp", f"<{one_graph}> ?s <http://schema.org/name> ?n"])
    assert 0 < res_scoped["n_rows"] < res["n_rows"]


def test_convert_cli_formats(tmp_path):
    """jobs/convert.py: CSVW source -> nt / json / jsonl (the reference's
    script/parse counterpart). jsonl is the distributed escape hatch."""
    import json as _json
    from rdf_tabular_spark.jobs.convert import main as convert_main

    src = tmp_path / "d.csv"
    src.write_text("id,name\n1,alice\n2,bob\n")
    meta = tmp_path / "d.csv-metadata.json"
    meta.write_text(_json.dumps({
        "@context": "http://www.w3.org/ns/csvw", "url": str(src),
        "tableSchema": {"aboutUrl": "http://example.org/p/{id}",
                        "columns": [{"name": "id", "titles": "id"},
                                    {"name": "name", "titles": "name"}]}}))

    s1 = convert_main(["--in", str(meta), "--to", "nt",
                       "--out", str(tmp_path / "nt"), "--minimal"])
    assert s1["n_triples"] == 4  # 2 rows x 2 cells

    s2 = convert_main(["--in", str(meta), "--to", "json",
                       "--out", str(tmp_path / "doc.json")])
    doc = _json.loads((tmp_path / "doc.json").read_text())
    assert [r["name"] for r in doc["row"]] == ["alice", "bob"]
    assert s2["n_rows"] == 2

    s3 = convert_main(["--in", str(meta), "--to", "jsonl",
                       "--out", str(tmp_path / "rows")])
    assert s3["n_lines"] == 2
    import os
    lines = []
    for fn in os.listdir(tmp_path / "rows"):
        if fn.startswith("part-"):
            lines += [_json.loads(line) for line
                      in open(tmp_path / "rows" / fn) if line.strip()]
    assert sorted(r["name"] for r in lines) == ["alice", "bob"]

    import pytest as _pytest
    with _pytest.raises(ValueError, match="write_json_rows"):
        convert_main(["--in", str(meta), "--to", "json",
                      "--out", str(tmp_path / "doc2.json"),
                      "--max-doc-rows", "1"])

    # quad-bearing formats: nq carries table_url as the 4th term, trig
    # wraps each table's statements in one named-graph block
    s4 = convert_main(["--in", str(meta), "--to", "nq",
                       "--out", str(tmp_path / "nq"), "--minimal"])
    assert s4["n_triples"] == 4
    nq_text = "".join(open(tmp_path / "nq" / fn).read()
                      for fn in os.listdir(tmp_path / "nq")
                      if fn.startswith("part-"))
    assert f"<{src}>" in nq_text.splitlines()[0]  # graph term present

    s5 = convert_main(["--in", str(meta), "--to", "trig",
                       "--out", str(tmp_path / "trig"), "--minimal"])
    assert s5["n_triples"] == 4
    trig_text = "".join(open(tmp_path / "trig" / fn).read()
                        for fn in os.listdir(tmp_path / "trig")
                        if fn.startswith("part-"))
    assert trig_text.startswith(f"<{src}> {{")


def test_convert_cli_jsonl_relative_url_and_bare_csv(tmp_path):
    """Regression (r4 review): the jsonl branch must resolve RELATIVE
    table urls against the metadata document's location (the normal CSVW
    form) and accept a bare CSV via discovery / embedded header."""
    import json as _json
    from rdf_tabular_spark.jobs.convert import main as convert_main

    (tmp_path / "d.csv").write_text("id,name\n1,alice\n")
    (tmp_path / "d.csv-metadata.json").write_text(_json.dumps({
        "@context": "http://www.w3.org/ns/csvw", "url": "d.csv",
        "tableSchema": {"columns": [{"name": "id", "titles": "id"},
                                    {"name": "name", "titles": "name"}]}}))

    # metadata with a RELATIVE url — resolved against the metadata path
    s1 = convert_main(["--in", str(tmp_path / "d.csv-metadata.json"),
                       "--to", "jsonl", "--out", str(tmp_path / "r1")])
    assert s1["n_lines"] == 1

    # bare CSV: sibling {url}-metadata.json discovered
    s2 = convert_main(["--in", str(tmp_path / "d.csv"),
                       "--to", "jsonl", "--out", str(tmp_path / "r2")])
    assert s2["n_lines"] == 1

    # bare CSV with no metadata anywhere: embedded header only
    (tmp_path / "plain.csv").write_text("h1,h2\nv1,v2\n")
    s3 = convert_main(["--in", str(tmp_path / "plain.csv"),
                       "--to", "jsonl", "--out", str(tmp_path / "r3")])
    assert s3["n_lines"] == 1
    import os
    rows = []
    for fn in os.listdir(tmp_path / "r3"):
        if fn.startswith("part-"):
            rows += [_json.loads(line)
                     for line in open(tmp_path / "r3" / fn) if line.strip()]
    assert rows[0]["h1"] == "v1" and rows[0]["h2"] == "v2"


def test_query_job_sparql_term_graph(spark, tmp_path):
    """jobs/query.py --sparql --term-graph: the store's term columns
    (obj_lang / obj_datatype) render to N-Triples shape so LANG /
    DATATYPE / sameTerm work from the CLI surface."""
    import sys
    sys.path.insert(0, REPO)
    from pyspark.sql import functions as F

    from rdf_tabular_spark.jobs.query import main as query_main
    from rdf_tabular_spark.sinks.graph_store import materialize

    rows = [
        ("http://d/1", "http://schema.org/name", "doc one",
         False, None, "en"),
        ("http://d/1", "http://schema.org/name", "le doc",
         False, None, "fr"),
        ("http://d/1", "http://schema.org/wordCount", "42", False,
         "http://www.w3.org/2001/XMLSchema#integer", None),
    ]
    df = spark.createDataFrame(
        rows, "subj string, pred string, obj string, obj_is_iri boolean, "
              "obj_datatype string, obj_lang string") \
        .withColumn("table_url", F.lit("http://d/")) \
        .withColumn("source_num", F.lit(0).cast("long"))
    root = str(tmp_path / "termstore")
    materialize(df, root, "b1")

    res = query_main([
        "--store", root, "--term-graph",
        "--sparql",
        'SELECT ?s (STR(?n) AS ?name) (LANG(?n) AS ?lg) WHERE '
        '{ ?s <http://schema.org/name> ?n . '
        'FILTER LANGMATCHES(LANG(?n), "en") }'])
    assert res["n_rows"] == 1
    assert res["sample"][0]["name"] == "doc one"
    assert res["sample"][0]["lg"] == "en"

    # without --term-graph the same query fails loudly, not silently
    import pytest as _pytest
    from rdf_tabular_spark.sparql import SparqlError
    with _pytest.raises(SparqlError, match="term_graph=True"):
        query_main([
            "--store", root, "--sparql",
            'SELECT ?s WHERE { ?s <http://schema.org/name> ?n . '
            'FILTER(LANG(?n) = "en") }'])


def test_extract_job_links_side_output(spark, tmp_path):
    """--links writes the page-level edge set and the host aggregate as
    side outputs and records the count in the manifest."""
    from rdf_tabular_spark.jobs.extract import main
    out = str(tmp_path / "store")
    m = main(["--synth", "40", "--out", out, "--batch-id", "lk1",
              "--no-canonicalize", "--links"])
    assert m["n_links"] >= 0 and m["links_dir"].endswith("links/lk1")
    edges = spark.read.parquet(os.path.join(out, "links", "lk1", "edges"))
    hosts = spark.read.parquet(os.path.join(out, "links", "lk1", "hosts"))
    assert set(edges.columns) == {"src", "dst"}
    assert set(hosts.columns) == {"src_host", "dst_host", "n_links"}
    assert hosts.count() >= 0


def test_extract_job_anchors_side_output(spark, tmp_path):
    """--anchors writes (src, dst, anchor) rows under links/<batch>/anchors."""
    from rdf_tabular_spark.jobs.extract import main
    out = str(tmp_path / "store")
    m = main(["--synth", "40", "--out", out, "--batch-id", "an1",
              "--no-canonicalize", "--anchors"])
    assert m["anchors_dir"].endswith("links/an1/anchors")
    anchors = spark.read.parquet(os.path.join(out, "links", "an1", "anchors"))
    assert set(anchors.columns) == {"src", "dst", "anchor"}
    assert anchors.count() >= 0


def test_extract_job_robots_filter(spark, tmp_path):
    """--robots PARQUET drops Disallow-matched pages before extraction
    (post-hoc compliance): /doc/1-prefixed pages emit no triples."""
    import sys
    sys.path.insert(0, REPO)
    from rdf_tabular_spark.jobs.extract import main
    from rdf_tabular_spark.sinks.graph_store import read_graph
    from rdf_tabular_spark.sources.pages import pages_from_documents

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet") \
        .limit(25)
    pages_dir = str(tmp_path / "pages")
    pages_from_documents(docs).write.parquet(pages_dir)
    robots_dir = str(tmp_path / "robots")
    spark.createDataFrame(
        [("pages.example.org", "User-agent: *\nDisallow: /doc/1")],
        "host string, robots_txt string").write.parquet(robots_dir)
    out_root = str(tmp_path / "graph")
    main(["--pages", pages_dir, "--out", out_root, "--batch-id", "r1",
          "--no-canonicalize", "--shuffle-partitions", "8",
          "--robots", robots_dir])
    subs = {r.subj for r in
            read_graph(spark, out_root).select("subj").distinct().collect()}
    # doc 1 and 10-19 are Disallow-matched; doc 2 and 20-24 survive
    assert "http://pages.example.org/doc/2#jld" in subs
    assert "http://pages.example.org/doc/20#jld" in subs
    assert not any("/doc/1#" in s or "/doc/12#" in s for s in subs)


def test_extract_job_shacl_gate(spark, tmp_path):
    """--shapes SHAPES.json: the committed batch is validated against the
    SHACL-lite shapes graph; the violation report + summary land as parquet
    side outputs and the manifest carries the count."""
    import json as _json
    import os as _os
    import sys
    sys.path.insert(0, REPO)
    from rdf_tabular_spark.jobs.extract import main

    shapes = [{
        "shape_id": "https://kg.example.org/shapes/PlaceShape",
        "target_class": "http://schema.org/Place",
        "properties": [
            {"path": "http://schema.org/name", "min_count": 1},     # conforms
            {"path": "http://schema.org/headline", "min_count": 1},  # fires
        ],
    }]
    shapes_path = tmp_path / "shapes.json"
    shapes_path.write_text(_json.dumps(shapes))
    out_root = str(tmp_path / "graph")
    m = main(["--synth", "40", "--batch-id", "s1", "--out", out_root,
              "--no-canonicalize", "--shuffle-partitions", "8",
              "--shapes", str(shapes_path)])
    # every Place item has a name but no headline → exactly one minCount
    # violation per typed focus node (only some synth pages carry microdata)
    from pyspark.sql import functions as F
    from rdf_tabular_spark.operators.shacl import RDF_TYPE
    from rdf_tabular_spark.sinks.graph_store import read_graph
    n_places = (read_graph(spark, out_root, batches=["s1"])
                .filter((F.col("pred") == RDF_TYPE)
                        & (F.col("obj") == "http://schema.org/Place"))
                .select("subj").distinct().count())
    assert n_places > 0
    assert m["n_shacl_violations"] == n_places
    rep = spark.read.parquet(_os.path.join(m["shacl_dir"], "report"))
    assert {r["constraint"] for r in rep.collect()} == {"minCount"}
    assert {r["path"] for r in rep.collect()} == \
        {"http://schema.org/headline"}
    summ = spark.read.parquet(_os.path.join(m["shacl_dir"], "summary"))
    row = summ.collect()[0]
    assert row["n_violations"] == n_places and row["n_focus"] == n_places


def test_shapes_from_json_rejects_typos(spark):
    from rdf_tabular_spark.operators.shacl import shapes_from_json
    import pytest as _pytest
    with _pytest.raises(ValueError, match="unknown keys"):
        shapes_from_json([{"shape_id": "s", "properties": [
            {"path": "p", "minCount": 1}]}])   # camelCase typo
    with _pytest.raises(ValueError, match="node_kind"):
        shapes_from_json([{"shape_id": "s", "properties": [
            {"path": "p", "node_kind": "Blank"}]}])
