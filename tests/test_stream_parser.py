"""StreamParserTest — translated from reference
ksoup-test/.../parser/StreamParserTest.kt. The Reader-closed backdoor
maps to StreamParser.closed plus direct tokenizer-position checks."""

import gzip

import pytest

from ksoup_ray.engine.dom import Element
from ksoup_ray.engine.streamparser import StreamParser

RES = "/root/reference/ksoup-test/testResources"


def track_seen(el, seen):
    seen.append(el.tag_name()
                + ("#" + el.id() if el.has_attr("id") else "")
                + ("[" + el.own_text() + "]" if el.own_text() else "")
                + ("+" if el.next_element_sibling() is not None else "")
                + ";")


def basic():
    return StreamParser().parse("<div>One</div><div><p>Two</div>", "")


def test_can_stream():
    html = ("<title>Test</title></head><div id=1>D1</div><div id=2>D2"
            "<p id=3><span>P One</p><p id=4>P Two</p></div><div id=5>D3"
            "<p id=6>P three</p>")
    with StreamParser().parse(html, "") as parser:
        seen = []
        for el in parser.stream():
            track_seen(el, seen)
        assert "".join(seen) == (
            "title[Test];head+;div#1[D1]+;span[P One];p#3+;p#4[P Two];"
            "div#2[D2]+;p#6[P three];div#5[D3];body;html;#root;")


def test_can_stream_xml():
    html = ("<outmost><DIV id=1>D1</DIV><div id=2>D2<p id=3><span>P One"
            "</p><p id=4>P Two</p></div><div id=5>D3<p id=6>P three</p>")
    with StreamParser(xml=True).parse(html, "") as parser:
        seen = []
        for el in parser.stream():
            track_seen(el, seen)
        assert "".join(seen) == (
            "DIV#1[D1]+;span[P One];p#3+;p#4[P Two];div#2[D2]+;"
            "p#6[P three];div#5[D3];outmost;#root;")


def test_can_iterate():
    html = ("<title>Test</title></head><div id=1>D1</div><div id=2>D2"
            "<p id=3><span>P One</p><p id=4>P Two</p></div><div id=5>D3"
            "<p id=6>P three</p>")
    parser = StreamParser().parse(html, "")
    seen = []
    for el in parser:
        track_seen(el, seen)
    assert "".join(seen) == (
        "title[Test];head+;div#1[D1]+;span[P One];p#3+;p#4[P Two];"
        "div#2[D2]+;p#6[P three];div#5[D3];body;html;#root;")


def test_can_reuse():
    parser = StreamParser()
    parser.parse("<p>One<p>Two", "")
    seen = []
    for el in parser.stream():
        track_seen(el, seen)
    assert "".join(seen) == "head+;p[One]+;p[Two];body;html;#root;"

    seen2 = []
    parser.parse("<div>Three<div>Four</div></div>", "")
    for el in parser.stream():
        track_seen(el, seen2)
    assert "".join(seen2) == "head+;div[Four];div[Three];body;html;#root;"

    # re-run without a new parse should be empty
    seen3 = []
    for el in parser.stream():
        track_seen(el, seen3)
    assert seen3 == []


def test_can_stop_and_complete_and_reuse():
    parser = StreamParser()
    parser.parse("<p>One<p>Two", "")
    p = parser.expect_first("p")
    assert p.text() == "One"
    parser.stop()
    it = iter(parser)
    with pytest.raises(StopIteration):
        next(it)
    assert parser.select_next("p") is None
    completed = parser.complete()
    ps = completed.select("p")
    assert [e.text() for e in ps] == ["One", "Two"]
    # can reuse
    parser.parse("<div>DIV", "")
    div = parser.expect_first("div")
    assert div.text() == "DIV"


def test_select():
    html = "<title>One</title><p id=1>P One</p><p id=2>P Two</p>"
    parser = StreamParser().parse(html, "")
    title = parser.expect_first("title")
    assert title.text() == "One"
    partial = title.owner_document()
    assert partial is not None
    # one P, no text yet — title was emitted on P head
    ps = partial.select("p")
    assert len(ps) == 1 and ps[0].text() == ""
    assert partial is parser.document()
    assert parser.select_first("title") is title
    assert parser.expect_next("p").text() == "P One"
    assert parser.expect_next("p").text() == "P Two"
    assert parser.select_next("p") is None


def test_can_remove_from_dom():
    html = "<div>One</div><div>DESTROY</div><div>Two</div>"
    parser = StreamParser().parse(html, "")
    for el in parser.stream():
        if el.own_text() == "DESTROY":
            el.remove()
    doc = parser.document()
    divs = doc.select("div")
    assert len(divs) == 2
    assert [d.text() for d in divs] == ["One", "Two"]


def test_can_select_with_has():
    parser = basic()
    el = parser.expect_next("div:has(p)")
    assert el.text() == "Two"


def test_can_select_with_sibling():
    parser = basic()
    el = parser.expect_next("div:first-of-type")
    assert el.text() == "One"
    assert parser.select_next("div:first-of-type") is None


def test_can_loop_on_select_next():
    streamer = StreamParser().parse("<div><p>One<p>Two<p>Thr</div>", "")
    count = 0
    while True:
        e = streamer.select_next("p")
        if e is None:
            break
        assert len(e.text()) == 3
        e.remove()
        count += 1
    assert count == 3
    assert streamer.document().select("p") == []
    assert streamer.closed  # read to the end


def test_works_with_xml_parser():
    streamer = StreamParser(xml=True).parse(
        "<div><p>One</p><p>Two</p><p>Thr</p></div>", "")
    count = 0
    while True:
        e = streamer.select_next("p")
        if e is None:
            break
        assert len(e.text()) == 3
        e.remove()
        count += 1
    assert count == 3
    assert streamer.document().select("p") == []
    assert streamer.closed


def test_closed_on_stream_drained():
    streamer = basic()
    assert not streamer.closed
    count = sum(1 for _ in streamer.stream())
    assert count == 7
    assert streamer.closed


def test_closed_on_iterator_drained():
    streamer = basic()
    count = sum(1 for _ in streamer)
    assert count == 7
    assert streamer.closed


def test_closed_on_complete():
    streamer = basic()
    streamer.complete()
    assert streamer.closed


def test_closed_on_context_manager():
    with basic() as streamer:
        assert not streamer.closed
    assert streamer.closed


def test_does_not_read_past_parse():
    streamer = basic()
    div = streamer.expect_first("div")
    # the sibling div exists (head seen) but its children do not yet
    sib = div.next_element_sibling()
    assert sib is not None
    assert sib.tag_name() == "div"
    assert len(sib.child_nodes()) == 0
    # the tokenizer must be positioned at "<p>" — not yet consumed
    tkz = streamer.tree_builder.tokeniser
    assert tkz.s[tkz.pos:].startswith("<p>Two")


def test_can_parse_large_file():
    content = gzip.decompress(
        open(f"{RES}/htmltests/large.html.gz", "rb").read()).decode()
    streamer = StreamParser().parse(content, "")
    last = None
    while True:
        e = streamer.select_next("p")
        if e is None:
            break
        last = e
    assert last is not None and last.text().startswith("VESTIBULUM")
    assert streamer.closed


def test_can_stream_fragment():
    html = ("<tr id=1><td>One</td><tr id=2><td>Two</td></tr>"
            "<tr id=3><td>Three</td></tr>")
    context = Element("table")
    with StreamParser().parse_fragment(html, context, "") as parser:
        seen = []
        for el in parser.stream():
            track_seen(el, seen)
        assert "".join(seen) == (
            "td[One];tr#1+;td[Two];tr#2+;td[Three];tr#3;tbody;table;"
            "#root;")
        assert parser.closed


def test_can_iterate_fragment():
    html = ("<tr id=1><td>One</td><tr id=2><td>Two</td></tr>"
            "<tr id=3><td>Three</td></tr>")
    context = Element("table")
    with StreamParser().parse_fragment(html, context, "") as parser:
        seen = []
        for el in parser:
            track_seen(el, seen)
        assert "".join(seen) == (
            "td[One];tr#1+;td[Two];tr#2+;td[Three];tr#3;tbody;table;"
            "#root;")
        assert parser.closed


def test_can_select_and_complete_fragment():
    html = ("<tr id=1><td>One</td><tr id=2><td>Two</td></tr>"
            "<tr id=3><td>Three</td></tr>")
    context = Element("table")
    with StreamParser().parse_fragment(html, context, "") as parser:
        first = parser.expect_next("td")
        assert first.own_text() == "One"
        assert parser.expect_next("td").own_text() == "Two"
        assert parser.expect_next("td").own_text() == "Three"
        assert parser.select_next("td") is None
        nodes = parser.complete_fragment()
        assert len(nodes) == 1           # the inferred tbody
        tbody = nodes[0]
        assert tbody.node_name() == "tbody"
        trs = tbody.child_nodes()
        assert len(trs) == 3
        assert trs[0].child_nodes()[0] is first
        assert parser.document() is first.owner_document()


def test_can_stream_fragment_xml():
    html = ("<tr id=1><td>One</td></tr><tr id=2><td>Two</td></tr>"
            "<tr id=3><td>Three</td></tr>")
    with StreamParser(xml=True).parse_fragment(html, None, "") as parser:
        seen = []
        for el in parser.stream():
            track_seen(el, seen)
        assert "".join(seen) == \
            "td[One];tr#1+;td[Two];tr#2+;td[Three];tr#3;#root;"
        assert parser.closed
        nodes = parser.complete_fragment()
        assert len(nodes) == 3
        assert nodes[0].node_name() == "tr"


def test_eof_spans_match_parse_entry_point():
    """StreamParser.complete() must stamp the same implicit zero-width
    EOF end ranges as Parser.parse — positions output is identical
    between the two documented-equivalent entry points (round-3
    advice item)."""
    from ksoup_ray.engine import parser as KP

    for html in ["<div><p>hello", "<div><span>x</span>",
                 "<ul><li>a<li>b", "plain text only", ""]:
        d1 = KP.parse(html)
        d2 = StreamParser().parse(html, "").complete()
        for n1, n2 in zip(d1.node_stream(), d2.node_stream()):
            assert n1.node_name() == n2.node_name()
            assert getattr(n1, "end_span", None) == \
                getattr(n2, "end_span", None), (html, n1.node_name())
        assert d1.end_span == d2.end_span


def test_eof_spans_match_xml_entry_point():
    from ksoup_ray.engine import parser as KP

    html = "<root><open><leaf>t"
    d1 = KP.parse_xml(html)
    d2 = StreamParser(xml=True).parse(html, "").complete()
    for n1, n2 in zip(d1.node_stream(), d2.node_stream()):
        assert getattr(n1, "end_span", None) == \
            getattr(n2, "end_span", None), n1.node_name()
