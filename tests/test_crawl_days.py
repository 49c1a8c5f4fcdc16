"""Two-crawl-day integration: the real extraction path feeding the store's
time-travel surface — day-1 pages materialize, day-2 brings new pages plus
a retraction, and diff_snapshots/--diff-since report exactly the day-2
delta. Ties together web.pages_to_triples, graph_store.materialize,
SPARQL UPDATE, and the diff read path the way an operator of a daily
crawl would run them."""

import time as _t

from pyspark.sql import functions as F

from rdf_tabular_spark.sinks.graph_store import (diff_snapshots, materialize,
                                                 read_graph, update_store)
from rdf_tabular_spark.sources.pages import synth_pages
from rdf_tabular_spark.web import pages_to_triples


def _stamp():
    _t.sleep(1.1)  # committed_at is second-granularity
    s = _t.strftime("%Y-%m-%dT%H:%M:%SZ", _t.gmtime())
    _t.sleep(1.1)
    return s


def test_two_crawl_days_diff(spark, tmp_path):
    root = str(tmp_path / "graph")
    pages = synth_pages(spark, 30).persist()

    # day 1: first 20 pages
    day1 = pages_to_triples(pages.limit(20)).persist()
    materialize(day1, root, "day1")
    t1 = _stamp()

    # day 2: the 10 new pages, plus one editorial retraction
    day1_urls = [r["url"] for r in pages.limit(20).select("url").collect()]
    day2_pages = pages.filter(~F.col("url").isin(day1_urls))
    day2 = pages_to_triples(day2_pages).persist()
    materialize(day2, root, "day2")
    victim = day1.filter(~F.col("obj_is_iri")
                         & F.col("obj_datatype").isNull()
                         & F.col("obj_lang").isNull()).first()
    update_store(spark, root, "fix1",
                 "DELETE DATA { <%s> <%s> \"%s\" }"
                 % (victim["subj"], victim["pred"], victim["obj"]))
    t2 = _stamp()

    diff = diff_snapshots(spark, root, t1, t2).persist()
    added = diff.filter("change = 'added'")
    removed = diff.filter("change = 'removed'")

    # additions are exactly day 2's distinct statements not already in day 1
    key = ["subj", "pred", "obj", "obj_is_iri", "obj_datatype", "obj_lang"]
    day2_new = (day2.select(*key).distinct()
                .exceptAll(day1.select(*key).distinct()))
    assert added.count() == day2_new.count() > 0
    # the one removal is the retracted statement
    rem = removed.collect()
    assert len(rem) == 1
    assert (rem[0]["subj"], rem[0]["pred"], rem[0]["obj"]) == \
        (victim["subj"], victim["pred"], victim["obj"])

    # the live graph agrees end-to-end: day1 + day2 - retraction
    live = read_graph(spark, root).select(*key).distinct().count()
    base = (day1.select(*key).distinct()
            .unionByName(day2.select(*key).distinct()).distinct().count())
    assert live == base - 1
    for df in (pages, day1, day2, diff):
        df.unpersist()
