"""Head-metadata extraction (stage 1e): title / canonical / robots capture
on both parser front-ends, urljoin resolution, canonical grouping."""

from rdf_tabular_spark.sources.html_extract import extract_page

HTML = ('<html><head><title>My &amp; Page</title>'
        '<link rel="canonical" href="/real-page">'
        '<link rel="stylesheet" href="/style.css">'
        '<meta name="ROBOTS" content="NOINDEX, follow">'
        '<meta name="description" content="d">'
        '<meta charset="utf-8">'
        "</head><body><p>body text</p></body></html>")


def test_parser_head_capture_both_frontends():
    fast = extract_page(HTML)
    slow = extract_page("<!-- fallback -->" + HTML)
    for pc in (fast, slow):
        assert pc.title == "My & Page"
        assert pc.canonical == "/real-page"
        assert ("robots", "NOINDEX, follow") in pc.meta
        assert ("description", "d") in pc.meta
        # charset-only meta (no name) is not captured
        assert all(k for k, _ in pc.meta)
        # head content stays out of visible text
        assert pc.text == "body text"


def test_parser_first_canonical_and_title_win():
    pc = extract_page('<html><head><title>A</title><title>B</title>'
                      '<link rel="canonical" href="/one">'
                      '<link rel="canonical" href="/two"></head>'
                      "<body>x</body></html>")
    assert pc.title == "A"
    assert pc.canonical == "/one"


def test_parser_no_head_meta_defaults():
    pc = extract_page("<html><body>x</body></html>")
    assert pc.title == "" and pc.canonical is None and pc.meta == []


def test_pages_to_head_meta(spark):
    from rdf_tabular_spark.web import pages_to_head_meta
    pages = spark.createDataFrame(
        [("http://h.org/a/b", HTML.encode()),
         ("http://h.org/plain", b"<html><body>y</body></html>")],
        "url string, html binary")
    got = {r.url: (r.title, r.canonical, r.noindex, r.nofollow)
           for r in pages_to_head_meta(pages).collect()}
    # relative canonical resolves against the page url; robots directives
    # are case-insensitive and whitespace-tolerant
    assert got["http://h.org/a/b"] == ("My & Page", "http://h.org/real-page",
                                       True, False)
    assert got["http://h.org/plain"] == ("", None, False, False)


def test_canonical_groups_representative(spark):
    from rdf_tabular_spark.web import canonical_groups
    hm = spark.createDataFrame(
        [("http://h/canon", None, False),      # canonical member crawled
         ("http://h/dup1", "http://h/canon", False),
         ("http://h/dup2", "http://h/canon", False),
         ("http://h/z1", "http://h/gone", False),   # target never crawled
         ("http://h/z2", "http://h/gone", False),
         ("http://h/solo", None, False)],
        "url string, canonical string, noindex boolean")
    got = {r.canonical: (r.n_pages, r.representative)
           for r in canonical_groups(hm).collect()}
    assert got["http://h/canon"] == (3, "http://h/canon")
    # uncrawled canonical target: lexical-min member represents the group
    assert got["http://h/gone"] == (2, "http://h/z1")
    assert got["http://h/solo"] == (1, "http://h/solo")


def test_head_meta_plan_is_narrow(spark):
    from rdf_tabular_spark.web import pages_to_head_meta
    pages = spark.createDataFrame([("http://h/x", b"<html></html>")],
                                  "url string, html binary")
    plan = pages_to_head_meta(pages)._jdf.queryExecution() \
        .executedPlan().toString()
    assert "Exchange" not in plan


def test_og_meta_capture_and_triples(spark):
    from rdf_tabular_spark.web import OG_NS, pages_to_og_triples
    html = ('<html><head><meta property="og:title" content="T">'
            '<meta property="og:image" content="http://h/i.png">'
            '<meta name="robots" content="noindex">'
            "</head><body>x</body></html>").encode()
    pages = spark.createDataFrame([("http://h/p", html)],
                                  "url string, html binary")
    got = {(r.subj, r.pred, r.obj) for r in
           pages_to_og_triples(pages).collect()}
    # og:* properties only — the robots <meta name> is not an og triple
    assert got == {("http://h/p", OG_NS + "title", "T"),
                   ("http://h/p", OG_NS + "image", "http://h/i.png")}


def test_links_respect_nofollow(spark):
    from rdf_tabular_spark.web import pages_to_links
    follow = ('<html><head><meta name="robots" content="index,follow">'
              '</head><body><a href="/a">a</a></body></html>').encode()
    nofollow = ('<html><head><meta name="robots" content="index, NOFOLLOW">'
                '</head><body><a href="/b">b</a></body></html>').encode()
    pages = spark.createDataFrame(
        [("http://h/f", follow), ("http://h/n", nofollow)],
        "url string, html binary")
    assert {r.src for r in pages_to_links(pages).collect()} \
        == {"http://h/f", "http://h/n"}       # default keeps everything
    assert {r.src for r in
            pages_to_links(pages, respect_nofollow=True).collect()} \
        == {"http://h/f"}


def test_canonical_rel_token_list_and_case():
    for rel in ("canonical alternate", "CANONICAL", "Alternate CanonicaL"):
        pc = extract_page(f'<html><head><link rel="{rel}" href="/c">'
                          "</head><body>x</body></html>")
        assert pc.canonical == "/c", rel
    pc = extract_page('<html><head><link rel="canonicalx" href="/c">'
                      "</head><body>x</body></html>")
    assert pc.canonical is None
