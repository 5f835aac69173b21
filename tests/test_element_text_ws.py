"""ElementTest tranche — text()/wholeText whitespace semantics, sibling
navigation, class DOM methods, formatting. Translated from reference
ksoup-test/.../nodes/ElementTest.kt (testNormalisesText:98 through
testIndentLevel:479, testHasText:920, dataset:930, textNodes:1069)."""

import pytest

from ksoup_ray.engine import parser as KP
from ksoup_ray.engine.dom import Attributes, Element, TextNode
from ksoup_ray.engine.treebuilder import PRESERVE_CASE


def _strip_newlines(s: str) -> str:
    out = []
    for line in s.split("\n"):
        out.append(line.lstrip(" "))
    return "".join(out)


def test_normalises_text():
    h = "<p>Hello<p>There.</p> \n <p>Here <b>is</b> \n s<b>om</b>e text."
    assert KP.parse(h).text() == "Hello There. Here is some text."


def test_keeps_pre_text():
    h = "<p>Hello \n \n there.</p> <div><pre>  What's \n\n  that?</pre>"
    assert KP.parse(h).text() == "Hello there.   What's \n\n  that?"


def test_keeps_pre_text_in_code():
    h = "<pre><code>code\n\ncode</code></pre>"
    doc = KP.parse(h)
    assert doc.text() == "code\n\ncode"
    assert doc.body().html() == "<pre><code>code\n\ncode</code></pre>"


def test_keeps_pre_text_at_depth():
    h = "<pre><code><span><b>code\n\ncode</b></span></code></pre>"
    doc = KP.parse(h)
    assert doc.text() == "code\n\ncode"
    assert doc.body().html() == \
        "<pre><code><span><b>code\n\ncode</b></span></code></pre>"


def test_does_not_wrap_blocks_in_pre():
    h = "<pre><span><foo><div>TEST\n TEST</div></foo></span></pre>"
    doc = KP.parse(h)
    assert doc.whole_text() == "TEST\n TEST"
    assert doc.body().html() == h


def test_br_has_space():
    doc = KP.parse("<p>Hello<br>there</p>")
    assert doc.text() == "Hello there"
    assert doc.select("p")[0].own_text() == "Hello there"
    doc = KP.parse("<p>Hello <br> there</p>")
    assert doc.text() == "Hello there"


def test_br_has_space_case_sensitive():
    doc = KP.parse("<p>Hello<br>there<BR>now</p>", settings=PRESERVE_CASE)
    assert doc.text() == "Hello there now"
    assert doc.select("p")[0].own_text() == "Hello there now"
    doc = KP.parse("<p>Hello <br> there <BR> now</p>")
    assert doc.text() == "Hello there now"


def test_text_has_spaces_after_block():
    doc = KP.parse("<div>One</div><div>Two</div><span>Three</span>"
                   "<p>Fou<i>r</i></p>")
    assert doc.text() == "One Two Three Four"
    assert doc.whole_text() == "OneTwoThreeFour"
    assert KP.parse("<span>One</span><span>Two</span>").text() == "OneTwo"


def test_whole_text():
    doc = KP.parse("<p> Hello\nthere &nbsp;  </p>")
    assert doc.whole_text() == " Hello\nthere \xa0  "
    doc = KP.parse("<p>Hello  \n  there</p>")
    assert doc.whole_text() == "Hello  \n  there"
    doc = KP.parse("<p>Hello  <div>\n  there</div></p>")
    assert doc.whole_text() == "Hello  \n  there"


def test_whole_text_runs():
    doc = KP.parse("<div><p id=1></p><p id=2> </p><p id=3>.  </p>")
    assert doc.expect_first("#1").whole_text() == ""
    assert doc.expect_first("#2").whole_text() == " "
    assert doc.expect_first("#3").whole_text() == ".  "


def test_button_text_has_space():
    doc = KP.parse("<html><button>Reply</button><button>All</button></html>")
    assert doc.body().text() == "Reply All"
    assert doc.body().whole_text() == "ReplyAll"


def test_get_siblings():
    doc = KP.parse("<div><p>Hello<p id=1>there<p>this<p>is<p>an"
                   "<p id=last>element</div>")
    p = doc.get_element_by_id("1")
    assert p.text() == "there"
    assert p.previous_element_sibling().text() == "Hello"
    assert p.next_element_sibling().text() == "this"
    assert p.first_element_sibling().text() == "Hello"
    assert p.last_element_sibling().text() == "element"
    assert p.last_element_sibling().next_element_sibling() is None
    assert p.first_element_sibling().previous_element_sibling() is None


def test_next_element_sibling():
    doc = KP.parse("<p>One</p>Two<p>Three</p>")
    el = doc.expect_first("p")
    assert el.previous_element_sibling() is None
    nxt = el.next_element_sibling()
    assert nxt is not None and nxt.text() == "Three"
    assert nxt.next_element_sibling() is None


def test_prev_element_sibling():
    doc = KP.parse("<p>One</p>Two<p>Three</p>")
    el = doc.expect_first("p:contains(Three)")
    assert el.next_element_sibling() is None
    prev = el.previous_element_sibling()
    assert prev is not None and prev.text() == "One"
    assert prev.previous_element_sibling() is None


def test_get_siblings_with_duplicate_content():
    doc = KP.parse("<div><p>Hello<p id=1>there<p>this<p>this<p>is<p>an"
                   "<p id=last>element</div>")
    p = doc.get_element_by_id("1")
    assert p.text() == "there"
    assert p.previous_element_sibling().text() == "Hello"
    assert p.next_element_sibling().text() == "this"
    assert p.next_element_sibling().next_element_sibling().text() == "this"
    assert p.next_element_sibling().next_element_sibling() \
        .next_element_sibling().text() == "is"
    assert p.first_element_sibling().text() == "Hello"
    assert p.last_element_sibling().text() == "element"


def test_first_element_sibling_on_orphan():
    p = Element("p")
    assert p.first_element_sibling() is p
    assert p.last_element_sibling() is p


def test_first_and_last_siblings():
    doc = KP.parse("<div><p>One<p>Two<p>Three")
    div = doc.expect_first("div")
    one, two, three = div.child(0), div.child(1), div.child(2)
    assert one.first_element_sibling() is one
    assert two.first_element_sibling() is one
    assert three.last_element_sibling() is three
    assert two.last_element_sibling() is three
    assert one.previous_element_sibling() is None
    assert three.next_element_sibling() is None


def test_get_parents():
    doc = KP.parse("<div><p>Hello <span>there</span></div>")
    span = doc.select("span")[0]
    parents = span.parents()
    assert [p.tag_name() for p in parents] == ["p", "div", "body", "html"]
    assert Element("p").parents() == []


def test_element_sibling_index():
    doc = KP.parse("<div><p>One</p>...<p>Two</p>...<p>Three</p>")
    ps = doc.select("p")
    assert [p.element_sibling_index() for p in ps] == [0, 1, 2]


def test_element_sibling_index_same_content():
    doc = KP.parse("<div><p>One</p>...<p>One</p>...<p>One</p>")
    ps = doc.select("p")
    assert [p.element_sibling_index() for p in ps] == [0, 1, 2]


def test_class_dom_methods():
    doc = KP.parse("<div><span class=' mellow yellow '>Hello "
                   "<b>Yellow</b></span></div>")
    span = doc.get_elements_by_attribute("class")[0]
    assert span.attr("class") == " mellow yellow "
    assert span.has_class("mellow")
    assert span.has_class("yellow")
    classes = span.class_names()
    assert sorted(classes) == ["mellow", "yellow"]
    assert doc.attr("class") == ""
    assert doc.class_names() == []
    assert not doc.has_class("mellow")


def test_has_class_dom_methods():
    attribs = Attributes()
    el = Element("a", None, attribs)
    for val, cls, expect in [
        ("toto", "toto", True), (" toto", "toto", True),
        ("toto ", "toto", True), ("\ttoto ", "toto", True),
        ("  toto ", "toto", True), ("ab", "toto", False),
        ("     ", "toto", False), ("tototo", "toto", False),
        ("raulpismuth  ", "raulpismuth", True),
        (" abcd  raulpismuth efgh ", "raulpismuth", True),
        (" abcd efgh raulpismuth", "raulpismuth", True),
        (" abcd efgh raulpismuth ", "raulpismuth", True),
    ]:
        attribs.put("class", val)
        assert el.has_class(cls) is expect, (val, cls)


def test_class_updates():
    doc = KP.parse("<div class='mellow yellow'></div>")
    div = doc.select("div")[0]
    div.add_class("green")
    assert div.attr("class") == "mellow yellow green"
    div.remove_class("red")  # noop
    div.remove_class("yellow")
    assert div.attr("class") == "mellow green"
    div.toggle_class("green").toggle_class("red")
    assert div.attr("class") == "mellow red"


def test_outer_html():
    doc = KP.parse("<div title='Tags &amp;c.'><img src=foo.png>"
                   "<p><!-- comment -->Hello<p>there")
    assert _strip_newlines(doc.outer_html()) == (
        '<html><head></head><body><div title="Tags &amp;c.">'
        '<img src="foo.png"><p><!-- comment -->Hello</p>'
        "<p>there</p></div></body></html>")


def test_inner_html():
    doc = KP.parse("<div>\n <p>Hello</p> </div>")
    assert doc.get_elements_by_tag("div")[0].html() == "<p>Hello</p>"


def test_format_html():
    doc = KP.parse("<title>Format test</title><div><p>Hello "
                   "<span>ksoup <span>users</span></span></p>"
                   "<p>Good.</p></div>")
    assert doc.html() == (
        "<html>\n <head>\n  <title>Format test</title>\n </head>\n"
        " <body>\n  <div>\n   <p>Hello <span>ksoup "
        "<span>users</span></span></p>\n   <p>Good.</p>\n  </div>\n"
        " </body>\n</html>")


def test_format_outline():
    doc = KP.parse("<title>Format test</title><div><p>Hello "
                   "<span>ksoup <span>users</span></span></p>"
                   "<p>Good.</p></div>")
    doc.output_settings.outline = True
    assert doc.html() == (
        "<html>\n <head>\n  <title>Format test</title>\n </head>\n"
        " <body>\n  <div>\n   <p>\n    Hello \n    <span>\n"
        "     ksoup \n     <span>users</span>\n    </span>\n   </p>\n"
        "   <p>Good.</p>\n  </div>\n </body>\n</html>")


def test_set_indent():
    doc = KP.parse("<div><p>Hello\nthere</p></div>")
    doc.output_settings.indent_amount = 0
    assert doc.html() == (
        "<html>\n<head></head>\n<body>\n<div>\n<p>Hello there</p>\n"
        "</div>\n</body>\n</html>")


def test_not_pretty():
    doc = KP.parse("<div>   \n<p>Hello\n there\n</p></div>")
    doc.output_settings.pretty_print = False
    assert doc.html() == ("<html><head></head><body><div>   \n<p>Hello\n"
                          " there\n</p></div></body></html>")
    div = doc.select("div")[0]
    assert div.html() == "   \n<p>Hello\n there\n</p>"


def test_has_text():
    doc = KP.parse("<div><p>Hello</p><p></p></div>")
    div = doc.select("div")[0]
    ps = doc.select("p")
    assert div.has_text()
    assert ps[0].has_text()
    assert not ps[1].has_text()


def test_dataset():
    doc = KP.parse("<div id=1 data-name=ksoup class=new "
                   "data-package=tag>Hello</div><p id=2>Hello</p>")
    div = doc.select("div")[0]
    dataset = div.attributes().dataset()
    assert dataset["name"] == "ksoup"
    assert dataset["package"] == "tag"
    assert len(dataset) == 2


def test_get_text_nodes():
    doc = KP.parse("<p>One <span>Two</span> Three <br> Four</p>")
    text_nodes = doc.select("p")[0].text_nodes()
    assert len(text_nodes) == 3
    assert text_nodes[0].get_whole_text() == "One "
    assert text_nodes[1].get_whole_text() == " Three "
    assert text_nodes[2].get_whole_text() == " Four"
    assert len(KP.parse("<p>One</p>").select("br")) == 0
