"""Property-based parity fuzz: the regex fast tokenizer must produce
byte-identical PageContent to html.parser on ARBITRARY input (falling back
whenever it cannot model a construct). This is the invariant the
north_rule's "byte-identical extracted text per url" rests on."""

from hypothesis import given, settings, strategies as st

from rdf_tabular_spark.sources import html_extract as H

# fragments chosen to hit tokenizer edge cases: stray '<', quoted '>',
# entities, self-closing, comments/doctype (fallback triggers), nesting
_FRAGMENTS = st.sampled_from([
    "text", "a & b", "&amp;", "&lt;x&gt;", "<", ">", "< ", "<>",
    "<p>", "</p>", "<br>", "<div/>", "<table>", "</table>",
    "<tr><td>1</td></tr>", "<td>", "</td>", "<th>h</th>",
    '<a href="x">', '<a title="q>z">', "<a title='s'>", "</a>",
    "<!-- c -->", "<!DOCTYPE html>", "<?pi?>", "<![CDATA[x]]>",
    "<script>var a=1;</script>", "<style>.c{}</style>",
    '<script type="application/csvw+json">{"url":"u"}</script>',
    # CDATA semantics: entities stay raw, '<' is data inside script
    '<script type="application/ld+json">{"a": "x &amp; y"}</script>',
    '<script type="application/ld+json">{"a": "1 < 2", "b": "<b>"}</script>',
    "<script>if (a < b && c) {}</script>",
    '<title>T &amp; t</title>', '<link rel="canonical" href="/c">',
    '<meta name="robots" content="noindex">',
    '<meta property="og:title" content="O&amp;G">',
    '<div itemscope itemtype="http://schema.org/Thing">',
    '<span itemprop="name">n</span>', "</div>", "</span>",
    "\n", "  ", "é", "züm", "<h1>T</h1>", "<TABLE>", "</TABLE>",
    "<td >", "<p x=1 y=2>", "<p x>", "<p =>",
    # RDFa-lite states: vocab/prefix declarations, typeof scopes,
    # property values from attributes and text content, CURIEs
    '<div vocab="http://schema.org/">', '<div prefix="ex: http://e/">',
    '<div typeof="Article" resource="#a">', '<div typeof="Person">',
    '<span property="name">N</span>', '<b property="ex:rank" content="3">',
    '<link property="inLanguage" href="http://l/en">',
    '<meta property="wordCount" content="9">',
    '<i property="x">', "</i>", '<span typeof="A B">',
])


def _slow_parse(html: str) -> H.PageContent:
    p = H._PageParser()
    p.feed(html)
    p.close()
    return H.PageContent(
        tables=p.tables,
        csvw_meta=p.csvw_meta.strip() if p.csvw_meta else None,
        text="\n".join(p.text_parts),
        microdata=p.micro,
        links=p.links,
        anchors=p.anchors,
        jsonld=p.jsonld,
        title=p.title,
        canonical=p.canonical,
        meta=p.meta,
        rdfa=p.rdfa)


@settings(max_examples=300, deadline=None, derandomize=True)
@given(st.lists(_FRAGMENTS, min_size=0, max_size=20))
def test_fast_tokenizer_parity_fuzz(parts):
    html = "".join(parts)
    fast = H.extract_page(html)
    slow = _slow_parse(html)
    assert fast.text == slow.text, html
    assert fast.csvw_meta == slow.csvw_meta, html
    assert [t.rows for t in fast.tables] == [t.rows for t in slow.tables], html
    assert [(m.item_id, m.itemtype, m.props) for m in fast.microdata] == \
           [(m.item_id, m.itemtype, m.props) for m in slow.microdata], html
    assert fast.links == slow.links, html
    assert fast.anchors == slow.anchors, html
    assert fast.jsonld == slow.jsonld, html
    assert fast.title == slow.title, html
    assert fast.canonical == slow.canonical, html
    assert fast.meta == slow.meta, html
    assert [(r.subject, r.types, r.props) for r in fast.rdfa] == \
           [(r.subject, r.types, r.props) for r in slow.rdfa], html


@settings(max_examples=300, deadline=None, derandomize=True)
@given(st.text(alphabet="<>/=&;\"'ab1 \n\t!-?", max_size=80))
def test_fast_tokenizer_parity_raw_fuzz(html):
    """Raw character soup — maximally malformed markup."""
    fast = H.extract_page(html)
    slow = _slow_parse(html)
    assert fast.text == slow.text, repr(html)
    assert [t.rows for t in fast.tables] == [t.rows for t in slow.tables], \
        repr(html)
