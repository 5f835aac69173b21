"""ElementTest tranche 3 — remaining reference cases: boolean attrs,
relative URLs, traverse/filter/forEach lambdas, reparenting,
cssSelector edge cases, getElementsMatching validation (reference
ksoup-test/.../nodes/ElementTest.kt)."""

import re

import pytest

from ksoup_ray.engine import parser as KP
from ksoup_ray.engine.dom import Document, Element
from ksoup_ray.engine.elements import CONTINUE, REMOVE



def _strip(s: str) -> str:
    return "".join(line.lstrip(" ") for line in s.split("\n"))


REFERENCE = ("<div id=div1><p>Hello</p><p>Another <b>element</b></p>"
             "<div id=div2><img src=foo.png></div></div>")


def test_set_id():
    doc = KP.parse("<div id=Boo>")
    el = doc.select_first("div")
    el.set_id("Foo")
    assert el.id() == "Foo"


def test_get_namespaced_elements_by_tag():
    doc = KP.parse("<div><abc:def id=1>Hello</abc:def></div>")
    els = doc.get_elements_by_tag("abc:def")
    assert len(els) == 1
    assert els[0].id() == "1"
    assert els[0].tag_name() == "abc:def"


def test_get_elements_with_attribute_dash():
    doc = KP.parse("<meta http-equiv=content-type value=utf8 id=1> "
                   "<meta name=foo content=bar id=2> "
                   "<div http-equiv=content-type value=utf8 id=3>")
    meta = doc.select("meta[http-equiv=content-type], meta[charset]")
    assert len(meta) == 1 and meta[0].id() == "1"


def test_add_boolean_attribute():
    div = Element("div", "")
    div.set_attr("true", True)
    div.set_attr("false", "value")
    div.set_attr("false", False)
    assert div.has_attr("true")
    assert div.attr("true") == ""
    assert div.attributes_size() == 1
    assert not div.has_attr("false")
    assert div.outer_html() == "<div true></div>"


def test_set_html_title():
    doc = KP.parse("<html><head id=2><title id=1></title></head></html>")
    title = doc.get_element_by_id("1")
    title.set_html("good")
    assert title.html() == "good"
    title.set_html("<i>bad</i>")
    assert title.html() == "&lt;i&gt;bad&lt;/i&gt;"
    head = doc.get_element_by_id("2")
    head.set_html("<title><i>bad</i></title>")
    assert head.html() == "<title>&lt;i&gt;bad&lt;/i&gt;</title>"


def test_parentless_to_string():
    doc = KP.parse("<img src='foo'>")
    img = doc.select("img")[0]
    assert img.outer_html() == '<img src="foo">'
    img.remove()
    assert img.outer_html() == '<img src="foo">'


def test_orphan_div_to_string():
    orphan = Element("div").set_id("foo").set_text("Hello")
    assert orphan.outer_html() == '<div id="foo">\n Hello\n</div>'


def test_html_contains_outer():
    doc = KP.parse("<title>Check</title> <div>Hello there</div>")
    doc.output_settings.indent_amount = 0
    title_outer = "".join(e.outer_html() for e in doc.select("title"))
    div_outer = "".join(e.outer_html() for e in doc.select("div"))
    assert title_outer in doc.html()
    assert div_outer in doc.html()


def test_manipulate_text_nodes():
    doc = KP.parse("<p>One <span>Two</span> Three <br> Four</p>")
    p = doc.select("p")[0]
    text_nodes = p.text_nodes()
    text_nodes[1].set_text(" three-more ")
    text_nodes[2].split_text(3).set_text("-ur")
    assert p.text() == "One Two three-more Fo-ur"
    assert p.own_text() == "One three-more Fo-ur"
    assert len(p.text_nodes()) == 4  # grew because of split


def test_get_data_nodes():
    doc = KP.parse("<script>One Two</script> <style>Three Four</style> "
                   "<p>Fix Six</p>")
    script = doc.select("script")[0]
    style = doc.select("style")[0]
    p = doc.select("p")[0]
    assert [d.get_whole_data() for d in script.data_nodes()] == ["One Two"]
    assert [d.get_whole_data() for d in style.data_nodes()] == ["Three Four"]
    assert p.data_nodes() == []


def test_relative_urls():
    html = ("<body><a href='./one.html'>One</a> <a href='two.html'>two</a> "
            "<a href='../three.html'>Three</a> "
            "<a href='//example2.com/four/'>Four</a> "
            "<a href='https://example2.com/five/'>Five</a> <a>Six</a> "
            "<a href=''>Seven</a>")
    doc = KP.parse(html, "http://example.com/bar/")
    els = doc.select("a")
    assert els[0].abs_url("href") == "http://example.com/bar/one.html"
    assert els[1].abs_url("href") == "http://example.com/bar/two.html"
    assert els[2].abs_url("href") == "http://example.com/three.html"
    assert els[3].abs_url("href") == "http://example2.com/four/"
    assert els[4].abs_url("href") == "https://example2.com/five/"
    assert els[5].abs_url("href") == ""
    assert els[6].abs_url("href") == "http://example.com/bar/"


def test_relative_idn_urls():
    idn = "https://www.测试.测试/"
    idn_foo = idn + "foo.html?bar"
    doc = KP.parse("<a href=''>One</a><a href='/bar.html?qux'>Two</a>",
                   idn_foo)
    els = doc.select("a")
    assert els[0].abs_url("href") == idn_foo
    assert els[1].abs_url("href") == "https://www.测试.测试/bar.html?qux"


def test_append_must_correctly_move_children_inside_one_parent_element():
    doc = Document("")
    body = doc.append_element("body")
    body.append_element("div1")
    body.append_element("div2")
    div3 = body.append_element("div3")
    div3.set_text("Check")
    div4 = body.append_element("div4")
    body.insert_children(0, [div3, div4])
    result = re.sub(r"\s+", "", doc.outer_html())
    assert result == ("<body><div3>Check</div3><div4></div4>"
                      "<div1></div1><div2></div2></body>")


def test_element_by_tag_name():
    a = Element("P")
    assert a.tag_name() == "P"


def test_class_names_and_attribute_name_is_case_insensitive():
    doc = KP.parse("<p Class='SomeText AnotherText'>One</p>")
    p = doc.select("p")[0]
    assert p.class_name() == "SomeText AnotherText"
    assert "SomeText" in p.class_names()
    assert "AnotherText" in p.class_names()
    for cls in ("SomeText", "sometext", "AnotherText", "anothertext"):
        assert p.has_class(cls)
    p1 = doc.select(".SomeText")[0]
    for q in (".sometext", "[class=SomeText AnotherText]",
              "[Class=SomeText AnotherText]", "[class=sometext anothertext]",
              "[class^=sometext]", "[class$=nothertext]",
              "[class$=AnotherText]"):
        assert doc.select(q)[0] is p1, q
    assert p1.text() == "One"


def test_traverse_lambda():
    doc = KP.parse("<div><p>One<p>Two<p>Three")
    div = doc.select_first("div")
    counter = [0]

    def visit(node, depth):
        counter[0] += 1

    div.traverse(visit)
    assert counter[0] == 7


def test_filter_call_returns_element():
    doc = KP.parse("<div><p>One<p>Two<p>Three")
    div = doc.select_first("div")

    class Keep:
        def head(self, node, depth):
            return CONTINUE

        def tail(self, node, depth):
            return CONTINUE

    assert div.filter(Keep()) is div


def test_filter_as_lambda():
    doc = KP.parse("<div><p>One<p id=2>Two<p>Three")
    doc.filter(lambda node, depth:
               REMOVE if node.attr("id") == "2" else CONTINUE)
    assert _strip(doc.body().html()) == "<div><p>One</p><p>Three</p></div>"


def test_for_each():
    doc = KP.parse("<div><p>Hello</p></div><div>There</div>"
                   "<div id=1>Gone<p></div>")

    def action(el):
        if el.id() == "1":
            el.remove()
        elif el.text() == "There":
            el.set_text("There Now")
            el.append_html("<p>Another</p>")

    doc.for_each(action)
    assert _strip(doc.body().html()) == (
        "<div><p>Hello</p></div><div>There Now<p>Another</p></div>")


def test_reparent_separate_nodes():
    doc = KP.parse("<div><p>One<p>Two")
    new1 = Element("p").set_text("Three")
    new2 = Element("p").set_text("Four")
    doc.body().insert_children(-1, [new1, new2])
    assert _strip(doc.body().html()) == (
        "<div><p>One</p><p>Two</p></div><p>Three</p><p>Four</p>")
    doc.body().insert_children(0, [new1, new2])
    assert _strip(doc.body().html()) == (
        "<p>Three</p><p>Four</p><div><p>One</p><p>Two</p></div>")
    doc.body().insert_children(0, [new2.clone(), new1.clone()])
    assert _strip(doc.body().html()) == (
        "<p>Four</p><p>Three</p><p>Three</p><p>Four</p>"
        "<div><p>One</p><p>Two</p></div>")
    doc.body().append_child(new1)
    assert _strip(doc.body().html()) == (
        "<p>Four</p><p>Three</p><p>Four</p><div><p>One</p><p>Two</p></div>"
        "<p>Three</p>")


def test_expect_first_message():
    doc = KP.parse("<p>One</p><p>Two <span>Three</span> <span>Four</span>")
    p = doc.expect_first("P")
    with pytest.raises(ValueError, match=re.escape(
            "No elements matched the query 'span.doesNotExist' "
            "on element 'p'.")):
        p.expect_first("span.doesNotExist")


def test_expect_first_message_doc():
    doc = KP.parse("<p>One</p><p>Two <span>Three</span> <span>Four</span>")
    with pytest.raises(ValueError, match=re.escape(
            "No elements matched the query 'span.doesNotExist' "
            "in the document.")):
        doc.expect_first("span.doesNotExist")


def test_insert_children_validation():
    doc = KP.parse(REFERENCE)
    div = doc.expect_first("div")
    with pytest.raises(ValueError, match="Insert position out of bounds."):
        div.insert_children(20, [Element("div")])


def test_css_selector_no_doc():
    el = Element("div")
    el.set_id("one")
    assert el.css_selector() == "#one"


def test_css_selector_no_parent():
    el = Element("div")
    assert el.css_selector() == "div"


def test_css_selector_doesnt_stack_overflow():
    element = Element("element")
    root = element
    for i in range(5000):
        elem2 = Element(f"element{i}")
        element.append_child(elem2)
        element = elem2
    selector = element.css_selector()
    assert selector.startswith("element > element0 >")
    assert selector.endswith("8 > element4999")
    found = root.select(selector)
    assert len(found) == 1 and found[0] is element


def test_css_selector_with_bracket():
    doc = KP.parse("<div class='a[foo]'>One</div><div class='b[bar]'>Two</div>")
    div = doc.expect_first("div")
    selector = div.css_selector()
    assert selector == "html > body > div.a\\[foo\\]"
    selected = doc.select(selector)
    assert len(selected) == 1 and selected[0] is div


def test_css_selector_unbalanced():
    doc = KP.parse("<div class='a(foo'>One</div><div class='a-bar'>Two</div>")
    div = doc.expect_first("div")
    selector = div.css_selector()
    assert selector == "html > body > div.a\\(foo"
    selected = doc.select(selector)
    assert len(selected) == 1 and selected[0] is div


def test_css_selector_with_asterisk():
    doc = KP.parse("<div class='vds-items_flex-end "
                   "[&amp;_>_*:first-child]:vds-pt_0'>One</div>"
                   "<div class='vds-items_flex-end'>Two</div>")
    div = doc.expect_first("div")
    selector = div.css_selector()
    assert selector == ("html > body > div.vds-items_flex-end."
                        "\\[\\&_\\>_\\*\\:first-child\\]\\:vds-pt_0")
    selected = doc.select(selector)
    assert len(selected) == 1 and selected[0] is div


def test_css_selector_with_pipe():
    doc = KP.parse("<div><span class='|'>One</div>")
    span = doc.expect_first("div span")
    selector = span.css_selector()
    assert selector == "html > body > div > span.\\|"
    selected = doc.select(selector)
    assert [e.own_text() for e in selected] == ["One"]


def test_get_elements_by_attribute_value_matching_pattern():
    doc = KP.parse("<a href=1one></a><a href=2one></a><a href=else</a>")
    els = doc.get_elements_by_attribute_value_matching("href", r"^\d\w+")
    assert len(els) == 2
    assert els[0].attr("href") == "1one"
    assert els[1].attr("href") == "2one"


def test_get_elements_by_attribute_value_matching_validation():
    doc = KP.parse(REFERENCE)
    with pytest.raises((re.error, ValueError)):
        doc.get_elements_by_attribute_value_matching("key", r"\x")


def test_get_elements_matching_text():
    doc = KP.parse("<div id=1>One</div><div>Two</div>")
    els = doc.body().get_elements_matching_text(r"O\w+")
    assert len(els) == 2
    assert els[0].normal_name() == "body"
    assert els[1].id() == "1"


def test_get_elements_matching_text_validation():
    doc = KP.parse(REFERENCE)
    with pytest.raises((re.error, ValueError)):
        doc.get_elements_matching_text(r"\x")


def test_get_elements_matching_own_text_validation():
    doc = KP.parse(REFERENCE)
    with pytest.raises((re.error, ValueError)):
        doc.get_elements_matching_own_text(r"\x")


def test_outer_html_string():
    doc = KP.parse("<div>One</div>")
    assert doc.body().outer_html() == (
        "<body>\n <div>\n  One\n </div>\n</body>")
