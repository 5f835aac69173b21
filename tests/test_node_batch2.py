"""NodeTest tranche 2 — recursive base URI, abs: edge protocols,
forEachNode, childNodesCopy, clone ownership, first/last child
(reference ksoup-test/.../nodes/NodeTest.kt remainder)."""

from ksoup_ray.engine import parser as KP
from ksoup_ray.engine.dom import Attributes, Element, TextNode
from ksoup_ray.engine.tags import (NAMESPACE_HTML, NAMESPACE_SVG,
                                   value_of as tag_value_of)


def _strip(s: str) -> str:
    return "".join(line.lstrip(" ") for line in s.split("\n"))


def test_set_base_uri_is_recursive():
    doc = KP.parse("<div><p></p></div>")
    base = "https://ksoup.org"
    doc.set_base_uri(base)
    assert doc.base_uri() == base
    assert doc.select("div")[0].base_uri() == base
    assert doc.select("p")[0].base_uri() == base


def test_handles_abs_prefix_on_has_attr():
    doc = KP.parse("<a id=1 href='/foo'>One</a> "
                   "<a id=2 href='https://ksoup.org/'>Two</a>")
    one = doc.select("#1")[0]
    two = doc.select("#2")[0]
    assert not one.has_attr("abs:href")
    assert one.has_attr("href")
    assert one.abs_url("href") == ""
    assert two.has_attr("abs:href")
    assert two.has_attr("href")
    assert two.abs_url("href") == "https://ksoup.org/"


def test_handle_abs_on_file_uris():
    doc = KP.parse("<a href='password'>One/a>"
                   "<a href='/var/log/messages'>Two</a>", "file:/etc/")
    els = doc.select("a")
    assert els[0].abs_url("href") == "file:/etc/password"
    assert els[1].abs_url("href") == "file:/var/log/messages"


def test_handle_abs_on_localhost_file_uris():
    doc = KP.parse("<a href='password'>One/a>"
                   "<a href='/var/log/messages'>Two</a>",
                   "file:///localhost/etc/")
    one = doc.select("a")[0]
    assert one.abs_url("href") == "file://localhost/etc/password"


def test_handles_abs_on_unknown_protocols():
    for url in ("mailto:example@example.com", "tel:867-5309"):
        attr = Attributes().put("href", url)
        no_base = Element(tag_value_of("a"), None, attr)
        assert no_base.abs_url("href") == url
        with_base = Element(tag_value_of("a"), "http://example.com/", attr)
        assert with_base.abs_url("href") == url


def test_for_each_node():
    doc = KP.parse("<div><p>Hello</p></div><div>There</div>"
                   "<div id=1>Gone<p></div>")

    def action(node):
        if isinstance(node, TextNode):
            if node.text() == "There":
                node.set_text("There Now")
                node.after("<p>Another")
        elif node.attr("id") == "1":
            node.remove()

    doc.for_each_node(action)
    assert _strip(doc.body().html()) == (
        "<div><p>Hello</p></div><div>There Now<p>Another</p></div>")


def test_child_nodes_copy():
    doc = KP.parse("<div id=1>Text 1 <p>One</p> Text 2 <p>Two<p>Three"
                   "</div><div id=2>")
    div1 = doc.select("#1")[0]
    div2 = doc.select("#2")[0]
    div_children = div1.child_nodes_copy()
    assert len(div_children) == 5
    tn1 = div1.child_nodes()[0]
    tn2 = div_children[0]
    tn2.set_text("Text 1 updated")
    assert tn1.text() == "Text 1 "
    div2.insert_children(-1, div_children)
    assert _strip(doc.body().html()) == (
        '<div id="1">Text 1 <p>One</p> Text 2 <p>Two</p><p>Three</p></div>'
        '<div id="2">Text 1 updated<p>One</p> Text 2 <p>Two</p>'
        "<p>Three</p></div>")


def test_changing_attribute_value_replaces_case_insensitive():
    doc = KP.parse('<INPUT id="foo" NAME="foo" VALUE="">')
    el = doc.select("#foo")[0]
    el.set_attr("value", "bar")
    matches = [(k, v) for k, v in el.attributes()
               if k.lower() == "value"]
    assert matches == [("value", "bar")]


def test_cloned_nodes_have_owner_docs_and_independent_settings():
    doc = KP.parse("<div>Text</div><div>Two</div>")
    doc.output_settings.pretty_print = False
    div = doc.select_first("div")
    text = div.child_nodes()[0]
    assert isinstance(text, TextNode)
    text_clone = text.clone()
    doc_clone = text_clone.owner_document()
    assert doc_clone is not None
    assert doc_clone.output_settings.pretty_print is False
    assert doc_clone is not doc
    doc.output_settings.pretty_print = True
    assert doc.output_settings.pretty_print is True
    assert doc_clone.output_settings.pretty_print is False
    # clone's owner doc holds only the cloned node, not normalized
    assert len(doc_clone.child_nodes()) == 1
    assert doc_clone.child_nodes()[0] is text_clone


def test_first_and_last_child():
    doc = KP.parse("<div>One <span>Two</span> <a href></a> Three</div>")
    div = doc.select_first("div")
    a = doc.select_first("a")
    first = div.first_child()
    assert isinstance(first, TextNode) and first.text() == "One "
    assert first.get_whole_text() == "One "
    last = div.last_child()
    assert isinstance(last, TextNode) and last.get_whole_text() == " Three"
    assert a.first_child() is None
    assert a.last_child() is None
    first_el = div.first_element_child()
    assert first_el.tag_name() == "span"
    last_el = div.last_element_child()
    assert last_el.tag_name() == "a"
    assert a.first_element_child() is None
    assert a.last_element_child() is None
    assert first_el.first_element_child() is None
    assert first_el.last_element_child() is None


def test_svg_element_is():
    doc = KP.parse("<div><svg><path>1,2,3</path></svg></div>")
    svg = doc.expect_first("svg")
    assert svg.name_is("svg")
    assert not svg.element_is("svg", NAMESPACE_HTML)
    assert svg.element_is("svg", NAMESPACE_SVG)
