"""Edge semantics of the curation operators (operators/curate.py); the
DuckDB parity of the full pipeline is covered by test_queries_oracle."""

from pyspark.sql import Row
from pyspark.sql import functions as F

from rdf_tabular_spark.operators import curate as C


def _scrub(spark, text):
    df = spark.createDataFrame([Row(text=text)])
    counts = C.pii_counts(F.col("text"))
    row = df.select(C.scrub_pii(F.col("text")).alias("clean"),
                    *[v.alias(k) for k, v in counts.items()]).head()
    return row


def test_scrub_order_ip_before_phone(spark):
    # the dotted quad must become [IP], not be half-eaten by the phone pass
    r = _scrub(spark, "server 10.20.30.40 dial +1 555-123-4567 now")
    assert r["clean"] == "server [IP] dial [PHONE] now"
    assert (r["n_emails"], r["n_ips"], r["n_phones"]) == (0, 1, 1)


def test_scrub_email_keeps_digits_intact(spark):
    r = _scrub(spark, "mail bob123456789@corp.example.com please")
    assert r["clean"] == "mail [EMAIL] please"
    assert r["n_emails"] == 1 and r["n_phones"] == 0


def test_scrub_empty_and_clean_text(spark):
    assert _scrub(spark, "")["clean"] == ""
    r = _scrub(spark, "no pii here at all")
    assert r["clean"] == "no pii here at all"
    assert (r["n_emails"], r["n_ips"], r["n_phones"]) == (0, 0, 0)


def test_pack_sequences_respects_budget_boundaries(spark):
    # 4 docs of 3 tokens in one group, budget 5: prefix sums 0,3,6,9 ->
    # seq_no 0,0,1,1 (greedy in-order; a doc starts the sequence its
    # exclusive prefix falls in)
    docs = spark.createDataFrame(
        [Row(doc_id=i, text="a b c") for i in range(4)])
    out = C.pack_sequences(docs, budget=5, n_groups=1) \
           .orderBy("doc_id").collect()
    assert [r["seq_no"] for r in out] == [0, 0, 1, 1]
    assert all(r["grp"] == 0 for r in out)
    assert all(r["n_tok"] == 3 for r in out)


def test_pack_sequences_groups_pack_independently(spark):
    docs = spark.createDataFrame(
        [Row(doc_id=i, text="w " * 10) for i in range(40)])
    out = C.pack_sequences(docs, budget=20, n_groups=4).collect()
    grps = {r["grp"] for r in out}
    assert grps <= set(range(4)) and len(grps) > 1
    # within every group the seq_no sequence is 0,0,1,1,... in doc order
    by_grp = {}
    for r in sorted(out, key=lambda r: r["doc_id"]):
        by_grp.setdefault(r["grp"], []).append(r["seq_no"])
    for seqs in by_grp.values():
        assert seqs == sorted(seqs)
        assert seqs[0] == 0


def test_stratified_sample_rate_one_and_zero(spark):
    docs = spark.createDataFrame(
        [Row(doc_id=i, lang="en" if i % 2 else "de") for i in range(100)])
    kept = C.stratified_sample(docs, "doc_id", "lang", {"en": 1.0}) \
            .collect()
    assert all(r["lang"] == "en" for r in kept)  # default rate 0 drops de
    assert len(kept) == 50  # rate 1.0 keeps every en row


def test_contamination_zero_overlap_rows_present(spark):
    docs = spark.createDataFrame(
        [Row(doc_id=0, text="alpha beta gamma delta"),
         Row(doc_id=1, text="totally different words here")])
    bench = spark.createDataFrame([Row(text="alpha beta gamma")])
    out = {r["doc_id"]: r for r in C.flag_contamination(docs, bench).collect()}
    assert out[0]["contaminated"] and out[0]["n_overlap"] == 1
    assert not out[1]["contaminated"] and out[1]["n_overlap"] == 0
