"""NodeTest tranche — translated from reference
ksoup-test/.../nodes/NodeTest.kt (handlesBaseUri:18 through
supportsClone:368 selections)."""

from ksoup_ray.engine import parser as KP
from ksoup_ray.engine.dom import Attributes, Element, TextNode


def _strip(s: str) -> str:
    return "".join(line.lstrip(" ") for line in s.split("\n"))


def test_handles_base_uri():
    attribs = Attributes()
    attribs.put("relHref", "/foo")
    attribs.put("absHref", "http://bar/qux")
    no_base = Element("a", "", attribs)
    assert no_base.abs_url("relHref") == ""
    assert no_base.abs_url("absHref") == "http://bar/qux"
    with_base = Element("a", "http://foo/", attribs)
    assert with_base.abs_url("relHref") == "http://foo/foo"
    assert with_base.abs_url("absHref") == "http://bar/qux"
    assert with_base.abs_url("noval") == ""
    dodgy = Element("a", "wtf://no-such-protocol/", attribs)
    assert dodgy.abs_url("absHref") == "http://bar/qux"
    assert dodgy.abs_url("relHref") == "wtf://no-such-protocol/foo"


def test_handles_abs_prefix():
    doc = KP.parse("<a href=/foo>Hello</a>", "https://ksoup.org/")
    a = doc.select("a")[0]
    assert a.attr("href") == "/foo"
    assert a.attr("abs:href") == "https://ksoup.org/foo"


def test_handles_abs_on_image():
    doc = KP.parse('<p><img src="/rez/osi_logo.png" /></p>',
                   "https://ksoup.org/")
    img = doc.select("img")[0]
    assert img.attr("abs:src") == "https://ksoup.org/rez/osi_logo.png"
    assert img.abs_url("src") == img.attr("abs:src")


def test_literal_abs_prefix():
    doc = KP.parse("<a abs:href='odd'>One</a>")
    el = doc.select("a")[0]
    assert el.has_attr("abs:href")
    assert el.attr("abs:href") == "odd"


def test_handles_abs_on_protocoless_absolute_uris():
    doc1 = KP.parse("<a href='//example.net/foo'>One</a>",
                    "http://example.com/")
    doc2 = KP.parse("<a href='//example.net/foo'>One</a>",
                    "https://example.com/")
    assert doc1.select("a")[0].abs_url("href") == "http://example.net/foo"
    assert doc2.select("a")[0].abs_url("href") == "https://example.net/foo"


def test_abs_handles_relative_query():
    doc = KP.parse("<a href='?foo'>One</a> <a href='bar.html?foo'>Two</a>",
                   "https://ksoup.org/path/file?bar")
    assert doc.select("a")[0].abs_url("href") == \
        "https://ksoup.org/path/file?foo"
    assert doc.select("a")[1].abs_url("href") == \
        "https://ksoup.org/path/bar.html?foo"


def test_abs_handles_dot_from_index():
    doc = KP.parse("<a href='./one/two.html'>One</a>", "http://example.com")
    assert doc.select("a")[0].abs_url("href") == \
        "http://example.com/one/two.html"


def test_remove():
    doc = KP.parse("<p>One <span>two</span> three</p>")
    p = doc.select("p")[0]
    p.child_nodes()[0].remove()
    assert p.text() == "two three"
    assert _strip(p.html()) == "<span>two</span> three"


def test_remove_on_orphan_is_noop():
    node = Element("div")
    assert node.parent() is None
    node.remove()
    assert node.parent() is None


def test_replace():
    doc = KP.parse("<p>One <span>two</span> three</p>")
    p = doc.select("p")[0]
    insert = Element("em").set_text("foo")
    p.child_nodes()[1].replace_with(insert)
    assert p.html() == "One <em>foo</em> three"


def test_owner_document():
    doc = KP.parse("<p>Hello")
    p = doc.select("p")[0]
    assert p.owner_document() is doc
    assert doc.owner_document() is doc
    assert doc.parent() is None


def test_root():
    doc = KP.parse("<div><p>Hello")
    p = doc.select("p")[0]
    assert p.root() is doc
    assert doc.root() is doc
    standalone = Element("p")
    assert standalone.parent() is None
    assert standalone.root() is standalone
    assert standalone.owner_document() is None


def test_before_node_and_html():
    doc = KP.parse("<p>One <b>two</b> three</p>")
    new_node = Element("em")
    new_node.append_text("four")
    doc.select("b")[0].before(new_node)
    assert _strip(doc.body().html()) == \
        "<p>One <em>four</em><b>two</b> three</p>"
    doc.select("b")[0].before_html("<i>five</i>")
    assert _strip(doc.body().html()) == \
        "<p>One <em>four</em><i>five</i><b>two</b> three</p>"


def test_before_shuffle():
    doc = KP.parse("<div><p>One<p>Two<p>Three</div>")
    div = doc.select("div")[0]
    p1, p2, p3 = doc.select("p")
    p2.before(p1)
    p3.before(p2)
    assert div.text() == "One Two Three"
    p2.before(p1)
    p1.before(p3)
    assert div.text() == "Three One Two"


def test_after_node_and_html():
    doc = KP.parse("<p>One <b>two</b> three</p>")
    new_node = Element("em")
    new_node.append_text("four")
    doc.select("b")[0].after(new_node)
    assert _strip(doc.body().html()) == \
        "<p>One <b>two</b><em>four</em> three</p>"
    doc.select("b")[0].after_html("<i>five</i>")
    assert _strip(doc.body().html()) == \
        "<p>One <b>two</b><i>five</i><em>four</em> three</p>"


def test_after_shuffle():
    doc = KP.parse("<div><p>One<p>Two<p>Three</div>")
    div = doc.select("div")[0]
    p1, p2, p3 = doc.select("p")
    p1.after(p2)
    p2.after(p3)
    assert div.text() == "One Two Three"
    p3.after(p1)
    p1.after(p2)
    assert div.text() == "Three One Two"


def test_unwrap():
    doc = KP.parse("<div>One <span>Two <b>Three</b></span> Four</div>")
    span = doc.select("span")[0]
    two_text = span.child_nodes()[0]
    node = span.unwrap()
    assert _strip(doc.body().html()) == \
        "<div>One Two <b>Three</b> Four</div>"
    assert isinstance(node, TextNode)
    assert node.get_whole_text() == "Two "
    assert node is two_text
    assert node.parent() is doc.select("div")[0]


def test_unwrap_no_children():
    doc = KP.parse("<div>One <span></span> Two</div>")
    span = doc.select("span")[0]
    node = span.unwrap()
    assert _strip(doc.body().html()) == "<div>One  Two</div>"
    assert node is None


def test_orphan_node_returns_null_for_sibling_elements():
    node = Element("p")
    assert node.sibling_index == 0
    assert node.sibling_nodes() == []
    assert node.previous_sibling() is None
    assert node.next_sibling() is None
    assert node.sibling_elements() == []
    assert node.previous_element_sibling() is None
    assert node.next_element_sibling() is None


def test_node_is_not_a_sibling_of_itself():
    doc = KP.parse("<div><p>One<p>Two<p>Three</div>")
    p2 = doc.select("p")[1]
    assert p2.text() == "Two"
    nodes = p2.sibling_nodes()
    assert len(nodes) == 2
    assert nodes[0].outer_html() == "<p>One</p>"
    assert nodes[1].outer_html() == "<p>Three</p>"


def test_supports_clone():
    doc = KP.parse("<div class=foo>Text</div>")
    el = doc.select("div")[0]
    assert el.has_class("foo")
    el_clone = el.clone()
    assert el_clone.has_class("foo")
    assert el_clone.text() == "Text"
    el.remove_class("foo")
    el.set_text("None")
    assert not el.has_class("foo")
    assert el_clone.has_class("foo")
    assert el.text() == "None"
    assert el_clone.text() == "Text"
