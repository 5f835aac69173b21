"""Element.cssSelector() and the named getElementsBy* family —
translated from reference ksoup-test/.../nodes/ElementTest.kt
(testCssPath:1216, testCssPathDuplicateIds:1229, cssSelectorEscaped:1243,
cssEscapedAmp:1264, elementsByTagName:41, testGetElementById:69,
testGetElementsWithClass:310, testGetElementsWithAttribute:323,
testGetElementsWithAttributeValue:348)."""

import re

from ksoup_ray.engine import parser as KP

REFERENCE = ("<div id=div1><p>Hello</p><p>Another <b>element</b></p>"
             "<div id=div2><img src=foo.png></div></div>")


def test_css_path():
    doc = KP.parse('<div id="id1">A</div><div>B</div>'
                   '<div class="c1 c2">C</div>')
    div_a, div_b, div_c = doc.select("div")
    assert div_a.css_selector() == "#id1"
    assert div_b.css_selector() == "html > body > div:nth-child(2)"
    assert div_c.css_selector() == "html > body > div.c1.c2"
    assert doc.select(div_a.css_selector())[0] is div_a
    assert doc.select(div_b.css_selector())[0] is div_b
    assert doc.select(div_c.css_selector())[0] is div_c


def test_css_path_duplicate_ids():
    doc = KP.parse("<article><div id=dupe>A</div><div id=dupe>B</div>"
                   "<div id=dupe class=c1>")
    div_a, div_b, div_c = doc.select("div")
    assert div_a.css_selector() == \
        "html > body > article > div:nth-child(1)"
    assert div_b.css_selector() == \
        "html > body > article > div:nth-child(2)"
    assert div_c.css_selector() == "html > body > article > div.c1"
    assert doc.select(div_a.css_selector())[0] is div_a
    assert doc.select(div_b.css_selector())[0] is div_b
    assert doc.select(div_c.css_selector())[0] is div_c


def test_css_selector_escaped():
    doc = KP.parse("<p\\p>One</p\\p> <p id='one.two'>Two</p> "
                   "<p class='one.two:three/four'>Three</p>")
    one = doc.expect_first("p\\\\p")
    ps = doc.select("p")
    two, three = ps[0], ps[1]
    assert one.css_selector() == "html > body > p\\\\p"
    assert doc.expect_first(one.css_selector()) is one
    assert two.css_selector() == "#one\\.two"
    assert doc.expect_first(two.css_selector()) is two
    assert three.css_selector() == \
        "html > body > p.one\\.two\\:three\\/four"
    assert doc.expect_first(three.css_selector()) is three


def test_css_escaped_amp():
    doc = KP.parse("<p class='\\&'>One</p>")
    one = doc.expect_first(".\\\\\\&")
    assert one.text() == "One"
    q = one.css_selector()
    assert q == "html > body > p.\\\\\\&"
    assert doc.expect_first(q) is one


def test_css_selector_escaped_class():
    doc = KP.parse("<div class='B\\&W\\?'><div class=test>Text</div></div>")
    el = doc.expect_first(".test")
    assert el.text() == "Text"
    q = el.css_selector()
    assert q == "html > body > div.B\\\\\\&W\\\\\\? > div.test"
    assert doc.expect_first(q) is el


def test_elements_by_tag_name():
    doc = KP.parse(REFERENCE)
    divs = doc.get_elements_by_tag("div")
    assert [d.id() for d in divs] == ["div1", "div2"]
    ps = doc.get_elements_by_tag("p")
    assert len(ps) == 2
    assert ps[0].child_nodes()[0].get_whole_text() == "Hello"
    assert ps[1].child_nodes()[0].get_whole_text() == "Another "
    assert doc.get_elements_by_tag("P") == ps
    imgs = doc.get_elements_by_tag("img")
    assert imgs[0].attr("src") == "foo.png"
    assert doc.get_elements_by_tag("wtf") == []


def test_namespaced_elements_by_tag():
    doc = KP.parse("<div><abc:def id=1>Hello</abc:def></div>")
    els = doc.get_elements_by_tag("abc:def")
    assert len(els) == 1
    assert els[0].id() == "1"
    assert els[0].tag_name() == "abc:def"


def test_get_element_by_id():
    doc = KP.parse(REFERENCE)
    assert doc.get_element_by_id("div1").id() == "div1"
    assert doc.get_element_by_id("none") is None
    doc2 = KP.parse("<div id=1><div id=2><p>Hello "
                    "<span id=2>world!</span></p></div></div>")
    div2 = doc2.get_element_by_id("2")
    assert div2.tag_name() == "div"
    span = div2.children()[0].get_element_by_id("2")
    assert span.tag_name() == "span"


def test_get_elements_with_class():
    doc = KP.parse("<div class='mellow yellow'><span class=mellow>Hello "
                   "<b class='yellow'>Yellow!</b></span><p>Empty</p></div>")
    els = doc.get_elements_by_class("mellow")
    assert [e.tag_name() for e in els] == ["div", "span"]
    els2 = doc.get_elements_by_class("yellow")
    assert [e.tag_name() for e in els2] == ["div", "b"]
    assert doc.get_elements_by_class("solo") == []


def test_get_elements_with_attribute():
    doc = KP.parse("<div style='bold'><p title=qux><p><b style></b></p></div>")
    els = doc.get_elements_by_attribute("style")
    assert [e.tag_name() for e in els] == ["div", "b"]
    assert doc.get_elements_by_attribute("class") == []


def test_get_elements_with_attribute_value():
    doc = KP.parse("<div style='bold'><p><p><b style></b></p></div>")
    els = doc.get_elements_by_attribute_value("style", "bold")
    assert [e.tag_name() for e in els] == ["div"]
    assert doc.get_elements_by_attribute_value("style", "none") == []


def test_get_elements_misc_variants():
    doc = KP.parse("<div data-x=alpha><p data-y=beta>one two</p>"
                   "<p>three</p><span>four</span></div>")
    assert [e.tag_name() for e in
            doc.get_elements_by_attribute_starting("data-")] == ["div", "p"]
    assert [e.attr("data-y") for e in
            doc.get_elements_by_attribute_value_starting("data-y", "be")] \
        == ["beta"]
    assert len(doc.get_elements_by_attribute_value_ending("data-x", "pha")) \
        == 1
    assert len(doc.get_elements_by_attribute_value_containing("data-x",
                                                              "lph")) == 1
    assert len(doc.get_elements_by_attribute_value_not("data-x",
                                                       "alpha")) > 0
    assert [e.attr("data-x") for e in
            doc.get_elements_by_attribute_value_matching(
                "data-x", re.compile(r"^al.*a$"))] == ["alpha"]
    # like jsoup, the #root Document element is included when it matches
    assert [e.tag_name() for e in doc.get_elements_containing_text("four")] \
        == ["#root", "html", "body", "div", "span"]
    assert [e.tag_name() for e in
            doc.get_elements_containing_own_text("three")] == ["p"]
    assert [e.tag_name() for e in
            doc.get_elements_matching_own_text(r"^three$")] == ["p"]
    ps = doc.select_first("div").get_elements_by_index_equals(1)
    assert [e.tag_name() for e in ps] == ["p"]
    assert len(doc.get_all_elements()) == 8  # incl. the #root Document


def test_get_elements_by_index_bounds():
    doc = KP.parse("<div><p>a</p><p>b</p><span>c</span></div>")
    d = doc.select_first("div")
    assert [e.text() for e in d.get_elements_by_index_less_than(1)] \
        == ["a"]
    assert [e.text() for e in d.get_elements_by_index_greater_than(1)] \
        == ["c"]
