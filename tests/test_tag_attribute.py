"""TagTest + AttributeTest + AttributeParseTest tranches — translated
from the reference's parser/TagTest.kt, nodes/AttributeTest.kt and
parser/AttributeParseTest.kt."""

import pytest

from ksoup_ray.engine import parser as KP
from ksoup_ray.engine import tags
from ksoup_ray.engine.dom import Attributes, is_boolean_attribute
from ksoup_ray.engine.parser import parse_xml
from ksoup_ray.engine.treebuilder import PRESERVE_CASE


# --- TagTest ---------------------------------------------------------------

def test_tag_is_case_sensitive():
    p1 = tags.value_of("P", preserve_case=True)
    p2 = tags.value_of("p", preserve_case=True)
    assert p1 != p2


def test_tag_can_be_insensitive():
    script1 = tags.value_of("script")
    script2 = tags.value_of("SCRIPT")
    assert script1 is script2


def test_tag_trims():
    p1 = tags.value_of("p", preserve_case=True)
    p2 = tags.value_of(" p ", preserve_case=True)
    assert p1 == p2


def test_tag_equality():
    p1 = tags.value_of("p")
    p2 = tags.value_of("p")
    assert p1 == p2
    assert p1 is p2


def test_div_semantics():
    div = tags.value_of("div")
    assert div.is_block
    assert div.format_as_block


def test_p_semantics():
    p = tags.value_of("p")
    assert p.is_block
    assert not p.format_as_block


def test_img_semantics():
    img = tags.value_of("img")
    assert img.is_inline
    assert img.is_self_closing()
    assert not img.is_block


def test_default_semantics():
    foo = tags.value_of("FOO", preserve_case=True)  # not defined
    foo2 = tags.value_of("FOO", preserve_case=True)
    assert foo == foo2
    assert foo.is_inline
    assert foo.format_as_block


def test_value_of_checks_not_empty():
    with pytest.raises(ValueError):
        tags.value_of(" ")


def test_known_tags():
    assert tags.is_known_tag("div")
    assert not tags.is_known_tag("explain")


def test_known_svg_namespace():
    svg_html = tags.value_of("svg")  # defaults to html ns: not known
    svg = tags.value_of("svg", tags.NAMESPACE_SVG)
    assert svg_html.namespace == tags.NAMESPACE_HTML
    assert svg.namespace == tags.NAMESPACE_SVG
    assert not svg_html.is_block  # generated
    assert svg.is_block  # known


def test_unknown_tag_namespace():
    foo_html = tags.value_of("foo")
    foo = tags.value_of("foo", tags.NAMESPACE_SVG)
    assert foo_html.namespace == tags.NAMESPACE_HTML
    assert foo.namespace == tags.NAMESPACE_SVG
    assert not foo_html.is_block
    assert not foo.is_block


# --- AttributeTest ---------------------------------------------------------

def test_attribute_html():
    attrs = Attributes().put("key", "value &")
    assert attrs.html() == ' key="value &amp;"'


def test_supplementary_character_in_attribute_key_and_value():
    s = chr(135361)
    attrs = Attributes().put(s, "A" + s + "B")
    assert attrs.html() == f' {s}="A{s}B"'


def test_boolean_attributes_are_empty_string_values():
    doc = KP.parse("<div hidden>")
    attributes = doc.body().children()[0].attributes()
    assert attributes.get("hidden") == ""
    key, value = next(iter(attributes))
    assert key == "hidden"
    assert value == ""
    assert not attributes.has_declared_value("hidden")
    assert is_boolean_attribute(key)


def test_has_declared_value():
    attrs = Attributes()
    attrs.put("one", "")
    attrs.put("two", None)
    attrs.put("thr", "thr")
    assert attrs.has_declared_value("one")
    assert not attrs.has_declared_value("two")
    assert attrs.has_declared_value("thr")


def test_set_value_to_none_renders_bare():
    attrs = Attributes().put("one", None)
    assert attrs.html() == " one"


def test_boolean_attributes_not_case_sensitive():
    assert is_boolean_attribute("required")
    assert is_boolean_attribute("REQUIRED")
    assert is_boolean_attribute("rEQUIREd")
    assert not is_boolean_attribute("random string")

    html = "<a href=autofocus REQUIRED>One</a>"
    doc = KP.parse(html)
    assert doc.select_first("a").outer_html() == \
        '<a href="autofocus" required>One</a>'
    doc2 = KP.parse(html, settings=PRESERVE_CASE)
    assert doc2.select_first("a").outer_html() == \
        '<a href="autofocus" REQUIRED>One</a>'


# --- AttributeParseTest ----------------------------------------------------

def test_parses_rough_attribute_string():
    html = ("<a id=\"123\" class=\"baz = 'bar'\" style = 'border: 2px'"
            "qux zim foo = 12 mux=18 />")
    # <id=123>, <class=baz = 'bar'>, <style=border: 2px>, <qux>, <zim>,
    # <foo=12>, <mux=18>
    el = KP.parse(html).get_elements_by_tag("a")[0]
    attr = el.attributes()
    assert attr.size() == 7
    assert attr.get("id") == "123"
    assert attr.get("class") == "baz = 'bar'"
    assert attr.get("style") == "border: 2px"
    assert attr.get("qux") == ""
    assert attr.get("zim") == ""
    assert attr.get("foo") == "12"
    assert attr.get("mux") == "18"


def test_handles_newlines_and_returns():
    html = "<a\r\nfoo='bar\r\nqux'\r\nbar\r\n=\r\ntwo>One</a>"
    el = KP.parse(html).select("a")[0]
    assert el.attributes().size() == 2
    assert el.attr("foo") == "bar\r\nqux"
    assert el.attr("bar") == "two"


def test_parses_empty_string():
    el = KP.parse("<a />").get_elements_by_tag("a")[0]
    attrs = el.attributes()
    assert attrs is None or attrs.size() == 0


def test_can_start_with_eq():
    el = KP.parse("<a =empty />").get_elements_by_tag("a")[0]
    attr = el.attributes()
    assert attr.size() == 1
    assert attr.has_key("=empty")
    assert attr.get("=empty") == ""


def test_strict_attribute_unescapes():
    html = ("<a id=1 href='?foo=bar&mid&lt=true'>One</a> "
            "<a id=2 href='?foo=bar&lt;qux&lg=1'>Two</a>")
    els = KP.parse(html).select("a")
    assert els[0].attr("href") == "?foo=bar&mid&lt=true"
    assert els[-1].attr("href") == "?foo=bar<qux&lg=1"


def test_more_attribute_unescapes():
    html = "<a href='&wr_id=123&mid-size=true&ok=&wr'>Check</a>"
    els = KP.parse(html).select("a")
    assert els[0].attr("href") == "&wr_id=123&mid-size=true&ok=&wr"


def test_parses_boolean_attributes():
    html = '<a normal="123" boolean empty=""></a>'
    el = KP.parse(html).select("a")[0]
    assert el.attr("normal") == "123"
    assert el.attr("boolean") == ""
    assert el.attr("empty") == ""
    assert el.attributes().size() == 3
    assert el.outer_html() == html  # vets boolean syntax


def test_drops_slash_from_attribute_name():
    html = "<img /onerror='doMyJob'/>"
    doc = KP.parse(html)
    assert doc.select("img[onerror]"), \
        "SelfClosingStartTag ignores last character"
    assert doc.body().html() == '<img onerror="doMyJob">'
    doc = parse_xml(html)
    assert doc.html() == '<img onerror="doMyJob" />'
