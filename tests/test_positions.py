"""Source-range (position) goldens — translated from reference
ksoup-test/.../nodes/PositionTest.kt. Positions render as the
reference's ``line,col:pos`` strings via engine.positions.SourceMap.

Implicit ranges follow the reference exactly (round 2): synthesized
elements get zero-width ranges at the triggering token, unclosed
elements get zero-width end ranges at EOF, and attribute name/value
ranges ride `Attributes.source_range` (tracksAttributes* in
test_positions_attrs.py)."""

from ksoup_ray.engine import parser as KP
from ksoup_ray.engine.dom import CDataNode, Comment, DataNode, TextNode
from ksoup_ray.engine.positions import SourceMap


def _fmt(span):
    return "imp" if span is None else f"{span[0]}-{span[1]}"


def _track_elements(root):
    out = []
    for el in root.stream():
        out.append(f"{el.tag_name()}:{_fmt(el.span)}~{_fmt(el.end_span)}")
    return "; ".join(out)


def _track_nodes(root):
    out = []
    for node in root.node_stream():
        if isinstance(node, TextNode):
            out.append(f"#text:{_fmt(node.span)}")
        elif hasattr(node, "tag"):
            out.append(f"{node.tag_name()}:{_fmt(node.span)}"
                       f"~{_fmt(node.end_span)}")
    return "; ".join(out)


def test_tracks_position():
    content = ("<p id=1\n class=foo>\n<span>Hello\n &reg;\n there &copy."
               "</span> now.\n <!-- comment --> ")
    doc = KP.parse(content)
    sm = SourceMap(content)

    html = doc.expect_first("html")
    body = doc.body()
    p = doc.expect_first("p")
    span = doc.expect_first("span")
    text = span.child_nodes()[0]
    now = span.next_sibling()
    comment = now.next_sibling()
    assert isinstance(text, TextNode)
    assert isinstance(now, TextNode)
    assert isinstance(comment, Comment)

    # implicit elements: zero-width ranges (PositionTest.kt:44-52)
    assert html.span == (0, 0) and body.span == (0, 0)
    assert html.end_span == body.end_span

    assert sm.fmt_range(p.span) == "1,1:0-2,12:19"
    # implicit close at EOF: "6,19:83-6,19:83" (PositionTest.kt:58)
    assert p.end_span == (83, 83)
    assert sm.fmt_range(p.end_span) == "6,19:83-6,19:83"
    assert p.end_span == html.end_span

    p_start = sm.line_col(p.span[0])
    assert p.span[0] == 0 and p_start == (1, 1)
    p_end = sm.line_col(p.span[1])
    assert p.span[1] == 19 and p_end == (2, 12)

    assert sm.fmt_pos(span.span[0]) == "3,1:20"
    assert sm.fmt_pos(span.span[1]) == "3,7:26"
    assert sm.fmt_range(span.end_span) == "5,14:52-5,21:59"

    assert text.get_whole_text() == "Hello\n ®\n there ©."
    text_orig = "Hello\n &reg;\n there &copy."
    assert text.span[1] - text.span[0] == len(text_orig)
    assert sm.fmt_pos(text.span[0]) == "3,7:26"
    assert sm.fmt_pos(text.span[1]) == "5,14:52"

    assert sm.fmt_pos(comment.span[0]) == "6,2:66"
    assert sm.fmt_pos(comment.span[1]) == "6,18:82"


def test_tracks_expected_popped_elements():
    html = ("<html><head><meta></head><body><img><p>One</p>"
            "<p>Two</p></body></html>")
    doc = KP.parse(html)
    assert _track_elements(doc.expect_first("html")) == (
        "html:0-6~63-70; head:6-12~18-25; meta:12-18~12-18; "
        "body:25-31~56-63; img:31-36~31-36; p:36-39~42-46; p:46-49~52-56")
    texts = [n for n in doc.node_stream() if isinstance(n, TextNode)]
    assert "; ".join(f"#text:{_fmt(t.span)}" for t in texts) == \
        "#text:39-42; #text:49-52"


def test_tracks_implicit_popped_elements():
    html = "<meta><img><p>One<p>Two<p>Three"
    doc = KP.parse(html)
    # explicit starts tracked; implicit closes zero-width at the
    # closing trigger (next <p> start / EOF)
    assert _track_elements(doc.expect_first("html")) == (
        "html:0-0~31-31; head:0-0~6-6; meta:0-6~0-6; body:6-6~31-31; "
        "img:6-11~6-11; p:11-14~17-17; p:17-20~23-23; p:23-26~31-31")
    assert doc.expect_first("meta").end_span is not None


def test_tracks_markup():
    html = ("<!doctype\nhtml>\n<title>ksoup &copy;\n2022</title><body>\n"
            "<![CDATA[\n<ksoup>\n]]>")
    doc = KP.parse(html)
    sm = SourceMap(html)

    doctype = doc.child_nodes()[0]
    assert doctype.node_name() == "#doctype"
    assert sm.fmt_range(doctype.span) == "1,1:0-2,6:15"

    title = doc.expect_first("title")
    title_text = title.child_nodes()[0]
    assert title.text() == "ksoup ©\n2022"
    assert title_text.get_whole_text() == title.text()
    assert sm.fmt_range(title.span) == "3,1:16-3,8:23"
    assert sm.fmt_range(title_text.span) == "3,8:23-4,5:40"

    cdata = doc.body().child_nodes()[1]
    assert isinstance(cdata, CDataNode)
    assert cdata.get_whole_text() == "\n<ksoup>\n"
    assert sm.fmt_range(cdata.span) == "5,1:55-7,4:76"


def test_tracks_data_nodes():
    html = "<head>\n<script>foo;\nbar()\n5 <= 4;</script>"
    doc = KP.parse(html)
    sm = SourceMap(html)
    script = doc.expect_first("script")
    assert sm.fmt_range(script.span) == "2,1:7-2,9:15"
    data = script.child_nodes()[0]
    assert isinstance(data, DataNode)
    assert sm.fmt_range(data.span) == "2,9:15-4,8:33"


def test_tracks_xml():
    xml = ('<?xml version="1.0" encoding="utf-8"?>\n<!doctype html>\n'
           "<rss url=foo>\nXML\n</rss>\n<!-- comment -->")
    doc = KP.parse_xml(xml)
    sm = SourceMap(xml)

    decl = doc.child_nodes()[0]
    # deviation: the reference excludes the bogus-comment's closing `>`
    # (1,39:38); this engine spans the full `<?...?>` markup
    assert sm.fmt_pos(decl.span[0]) == "1,1:0"

    doctype = doc.child_nodes()[2]
    assert sm.fmt_range(doctype.span) == "2,1:39-2,16:54"

    rss = doc.first_element_child()
    assert sm.fmt_range(rss.span) == "3,1:55-3,14:68"
    assert sm.fmt_range(rss.end_span) == "5,1:73-5,7:79"

    text = rss.child_nodes()[0]
    assert isinstance(text, TextNode)
    assert sm.fmt_range(text.span) == "3,14:68-5,1:73"

    comment = rss.next_sibling().next_sibling()
    assert isinstance(comment, Comment)
    assert sm.fmt_range(comment.span) == "6,1:80-6,17:96"


def test_tracks_table_moved_text():
    html = "<table>foo<tr>bar<td>baz</td>qux</tr>coo</table>"
    doc = KP.parse(html)
    texts = [n for n in doc.node_stream() if isinstance(n, TextNode)]
    assert [t.get_whole_text() for t in texts] == \
        ["foo", "bar", "baz", "qux", "coo"]
    assert "; ".join(f"#text:{_fmt(t.span)}" for t in texts) == \
        "#text:7-10; #text:14-17; #text:21-24; #text:29-32; #text:37-40"


def test_tracks_closing_html_tags_in_xml():
    xml = "<p>One</p><title>Two</title><data>Three</data>"
    doc = KP.parse_xml(xml)
    for el in doc.children():
        assert el.span is not None
        assert el.end_span is not None


def test_tracks_closing_heading_tags():
    html = "<h1>One</h1><h2>Two</h2><h10>Ten</h10>"
    doc = KP.parse(html)
    sm = SourceMap(html)
    for el in doc.body().children():
        assert el.span is not None
        assert el.end_span is not None
    h2 = doc.expect_first("h2")
    assert sm.fmt_range(h2.span) == "1,13:12-1,17:16"
    assert sm.fmt_range(h2.end_span) == "1,20:19-1,25:24"


def test_tracks_after_p_self_close():
    html = "foo<p/>bar &amp; 2"
    doc = KP.parse(html)
    assert _track_nodes(doc.body()) == \
        "body:0-0~18-18; #text:0-3; p:3-7~3-7; #text:7-18"


def test_tracks_first_textnode():
    html = "foo<p></p>bar<p></p><div><b>baz</b></div>"
    doc = KP.parse(html)
    assert _track_nodes(doc.body()) == (
        "body:0-0~41-41; #text:0-3; p:3-6~6-10; #text:10-13; "
        "p:13-16~16-20; div:20-25~35-41; b:25-28~31-35; #text:28-31")


def test_fast_p_run_spans_match_generic():
    """The paragraph fast path must stamp the same element spans as the
    generic machine."""
    from ksoup_ray.engine import treebuilder as TB
    html = '<div><p>one</p><p class="c">two</p><p>three</p></div>'
    orig = TB._fast_p_run
    try:
        TB._fast_p_run = lambda tb: None
        ref = KP.parse(html)
    finally:
        TB._fast_p_run = orig
    fast = KP.parse(html)
    assert _track_elements(fast.expect_first("html")) == \
        _track_elements(ref.expect_first("html"))
