"""ElementTest query/attribute tranche — translated from reference
ksoup-test/.../nodes/ElementTest.kt (is/closest/eval, children shadow
list, class case-insensitivity, attr removal, siblings, appendTo)."""

from ksoup_ray.engine import parser as KP
from ksoup_ray.engine.dom import Attributes, Element
from ksoup_ray.engine.elements import Elements
from ksoup_ray.engine.select import parse_query


def _strip(s: str) -> str:
    return "".join(line.lstrip(" ") for line in s.split("\n"))


def test_chained_remove_attributes():
    doc = KP.parse("<a one two three four>Text</a>")
    a = doc.select("a")[0]
    (a.remove_attr("zero").remove_attr("one").remove_attr("two")
      .remove_attr("three").remove_attr("four").remove_attr("five"))
    assert a.outer_html() == "<a>Text</a>"


def test_looped_remove_attributes():
    doc = KP.parse("<a one two three four>Text</a><p foo>Two</p>")
    for el in doc.get_all_elements():
        el.clear_attributes()
    assert doc.body().html() == "<a>Text</a>\n<p>Two</p>"


def test_is():
    doc = KP.parse("<div><p>One <a class=big>Two</a> Three</p><p>Another</p>")
    p = doc.select("p")[0]
    assert p.css_is("p")
    assert not p.css_is("div")
    assert p.css_is("p:has(a)")
    assert not p.css_is("a")  # does not descend
    assert p.css_is("p:first-child")
    assert not p.css_is("p:last-child")
    assert p.css_is("*")
    assert p.css_is("div p")
    q = doc.select("p")[-1]
    assert q.css_is("p")
    assert q.css_is("p ~ p")
    assert q.css_is("p + p")
    assert q.css_is("p:last-child")
    assert not q.css_is("p a")
    assert not q.css_is("a")


def test_eval_methods():
    doc = KP.parse("<div><p>One <a class=big>Two</a> Three</p><p>Another</p>")
    from ksoup_ray.engine.select import select_first
    p = select_first(parse_query("p"), doc)
    assert p.own_text() == "One Three"
    assert p.css_is(parse_query("p"))
    a_eval = parse_query("a")
    assert not p.css_is(a_eval)
    a = select_first(a_eval, p)
    assert a.closest(parse_query("div:has( > p)")).tag_name() == "div"
    body = p.closest(parse_query("body"))
    assert body.node_name() == "body"


def test_closest():
    html = """<article>
  <div id=div-01>Here is div-01
    <div id=div-02>Here is div-02
      <div id=div-03>Here is div-03</div>
    </div>
  </div>
</article>"""
    doc = KP.parse(html)
    el = doc.select_first("#div-03")
    assert el.text() == "Here is div-03"
    assert el.id() == "div-03"
    assert el.closest("#div-02").id() == "div-02"
    assert el.closest("div div") is el  # closest div in a div is itself
    assert el.closest("article > div").id() == "div-01"
    assert el.closest(":not(div)").tag_name() == "article"
    assert el.closest("p") is None


def test_children_elements():
    html = ("<div><p><a>One</a></p><p><a>Two</a></p>Three</div>"
            "<span>Four</span><foo></foo><img>")
    doc = KP.parse(html)
    div = doc.select("div")[0]
    p = doc.select("p")[0]
    span = doc.select("span")[0]
    foo = doc.select("foo")[0]
    img = doc.select("img")[0]
    children = div.children()
    assert len(children) == 2
    assert children[0].outer_html() == "<p><a>One</a></p>"
    assert children[1].outer_html() == "<p><a>Two</a></p>"
    assert len(div.child_nodes()) == 3
    assert div.child_nodes()[2].outer_html() == "Three"
    assert len(p.children()) == 1
    assert Elements(p.children()).text() == "One"
    assert len(span.children()) == 0
    assert len(span.child_nodes()) == 1
    assert span.child_nodes()[0].outer_html() == "Four"
    assert len(foo.children()) == 0
    assert len(foo.child_nodes()) == 0
    assert len(img.children()) == 0
    assert len(img.child_nodes()) == 0


def test_shadow_elements_are_updated():
    html = ("<div><p><a>One</a></p><p><a>Two</a></p>Three</div>"
            "<span>Four</span><foo></foo><img>")
    doc = KP.parse(html)
    div = doc.select("div")[0]
    els = div.children()
    nodes = div.child_nodes()
    assert len(els) == 2
    assert len(nodes) == 3
    p3 = Element("p").set_text("P3")
    p4 = Element("p").set_text("P4")
    div.insert_children(1, [p3])
    div.insert_children(3, [p4])
    els2 = div.children()
    assert len(els) == 2  # first list should not have changed
    assert len(els2) == 4
    assert div.html() == ("<p><a>One</a></p>\n"
                          "<p>P3</p>\n"
                          "<p><a>Two</a></p>\n"
                          "<p>P4</p>Three")
    assert els2[1].text() == "P3"
    assert els2[3].text() == "P4"
    p3.after_html("<span>Another</span")
    els3 = div.children()
    assert len(els3) == 5
    assert els3[2].tag_name() == "span"
    assert els3[2].text() == "Another"
    assert div.html() == ("<p><a>One</a></p>\n"
                          "<p>P3</p><span>Another</span>\n"
                          "<p><a>Two</a></p>\n"
                          "<p>P4</p>Three")


def test_class_names_and_attribute_name_case_insensitive():
    doc = KP.parse("<p Class='SomeText AnotherText'>One</p>")
    p = doc.select("p")[0]
    assert p.class_name() == "SomeText AnotherText"
    assert "SomeText" in p.class_names()
    assert "AnotherText" in p.class_names()
    assert p.has_class("SomeText")
    assert p.has_class("sometext")
    assert p.has_class("AnotherText")
    assert p.has_class("anothertext")
    p1 = doc.select(".SomeText")[0]
    for q in (".sometext", "[class=SomeText AnotherText]",
              "[Class=SomeText AnotherText]", "[class=sometext anothertext]",
              "[class^=sometext]", "[class$=nothertext]",
              "[class$=AnotherText]"):
        assert doc.select(q)[0] is p1, q
    assert p1.text() == "One"


def test_append_to():
    parent_doc = KP.parse("<div class='a'></div>")
    parent = parent_doc.body()
    child_doc = KP.parse("<div class='b'></div><p>Two</p>")
    div = child_doc.select("div")[0]
    p = child_doc.select("p")[0]
    assert div.append_to(parent) is div
    assert p.append_to(div) is p
    assert parent_doc.body().html() == \
        '<div class="a"></div>\n<div class="b">\n <p>Two</p>\n</div>'
    assert child_doc.body().html() == ""  # got moved out


def test_normalizes_nbsp_in_text():
    escaped = "You can't always get what you&nbsp;want."
    with_nbsp = "You can't always get what you\xa0want."
    doc = KP.parse("<p>" + escaped)
    p = doc.select("p")[0]
    assert p.text() == "You can't always get what you want."
    assert p.outer_html() == f"<p>{escaped}</p>"
    assert p.text_nodes()[0].get_whole_text() == with_nbsp
    matched = doc.select("p:contains(get what you want)")[0]
    assert matched.node_name() == "p"
    assert matched.css_is(":containsOwn(get what you want)")


def test_normalizes_invisibles_in_text():
    escaped = "This­is&#x200b;one­long­word"
    decoded = "This­is​one­long­word"
    doc = KP.parse("<p>" + escaped)
    p = doc.select("p")[0]
    doc.output_settings.charset = "ISO-8859-1"
    assert p.text() == "Thisisonelongword"
    assert p.outer_html() == f"<p>{escaped}</p>"
    assert p.text_nodes()[0].get_whole_text() == decoded
    matched = doc.select("p:contains(Thisisonelongword)")[0]
    assert matched.node_name() == "p"
    assert matched.css_is(":containsOwn(Thisisonelongword)")


def test_remove_before_index():
    doc = KP.parse("<html><body><div><p>before1</p><p>before2</p><p>XXX</p>"
                   "<p>after1</p><p>after2</p></div></body></html>")
    body = doc.select("body")[0]
    x_elem = body.select("p:matchesOwn(XXX)")[0]
    for p in x_elem.parent().get_elements_by_index_less_than(
            x_elem.element_sibling_index()):
        p.remove()
    assert _strip(body.outer_html()) == \
        "<body><div><p>XXX</p><p>after1</p><p>after2</p></div></body>"


def test_remove_after_index():
    doc = KP.parse("<html><body><div><p>before1</p><p>before2</p><p>XXX</p>"
                   "<p>after1</p><p>after2</p></div></body></html>")
    body = doc.select("body")[0]
    x_elem = body.select("p:matchesOwn(XXX)")[0]
    for p in x_elem.parent().get_elements_by_index_greater_than(
            x_elem.element_sibling_index()):
        p.remove()
    assert _strip(body.outer_html()) == \
        "<body><div><p>before1</p><p>before2</p><p>XXX</p></div></body>"


def test_whitespace_class_element():
    attribs = Attributes()
    el = Element("a", None, attribs)
    attribs.put("class", "abc ")
    assert not el.has_class("ab")


def test_next_element_sibling_after_clone():
    html = ('<!DOCTYPE html><html lang="en"><head></head><body>'
            "<div>Initial element</div></body></html>")
    expected_text = "New element"
    clone_expect = "New element in clone"
    original = KP.parse(html)
    clone = original.clone()
    original_element = original.body().child(0)
    original_element.after_html(f"<div>{expected_text}</div>")
    assert original_element.next_element_sibling().text() == expected_text
    assert original_element.next_sibling().text() == expected_text
    clone_element = clone.body().child(0)
    clone_element.after_html(f"<div>{clone_expect}</div>")
    assert clone_element.next_element_sibling().text() == clone_expect
    assert clone_element.next_sibling().text() == clone_expect


def test_removing_empty_class_attribute_when_last_class_removed():
    doc = KP.parse('<img class="one two" />')
    img = doc.select("img")[0]
    img.remove_class("one")
    img.remove_class("two")
    assert 'class=""' not in doc.body().html()


def test_boolean_attribute_output():
    doc = KP.parse("<img src=foo noshade='' nohref async=async "
                   "autofocus=false>")
    img = doc.select_first("img")
    assert img.outer_html() == \
        '<img src="foo" noshade nohref async autofocus="false">'


def test_text_has_space_after_block_tags():
    doc = KP.parse("<div>One</div>Two")
    assert doc.text() == "One Two"


def test_text_has_space_between_div_and_center_tags():
    doc = KP.parse("<div>One</div><div>Two</div><center>Three</center>"
                   "<center>Four</center>")
    assert doc.text() == "One Two Three Four"


def test_next_element_siblings():
    doc = KP.parse("<ul id='ul'>"
                   "<li id='a'>a</li>"
                   "<li id='b'>b</li>"
                   "<li id='c'>c</li>"
                   "</ul> Not An Element but a node"
                   "<div id='div'>"
                   "<li id='d'>d</li>"
                   "</div>")
    element = doc.get_element_by_id("a")
    sibs = element.next_element_siblings()
    assert len(sibs) == 2
    assert sibs[0].id() == "b"
    assert sibs[1].id() == "c"
    assert [s.id() for s in doc.get_element_by_id("b")
            .next_element_siblings()] == ["c"]
    assert doc.get_element_by_id("c").next_element_siblings() == []
    ul_sibs = doc.get_element_by_id("ul").next_element_siblings()
    assert len(ul_sibs) == 1
    assert ul_sibs[0].id() == "div"
    assert doc.get_element_by_id("div").next_element_siblings() == []


def test_previous_element_siblings():
    doc = KP.parse("<ul id='ul'>"
                   "<li id='a'>a</li>"
                   "<li id='b'>b</li>"
                   "<li id='c'>c</li>"
                   "</ul>"
                   "<div id='div'>"
                   "<li id='d'>d</li>"
                   "</div>")
    assert [s.id() for s in doc.get_element_by_id("b")
            .previous_element_siblings()] == ["a"]
    assert doc.get_element_by_id("a").previous_element_siblings() == []
    assert [s.id() for s in doc.get_element_by_id("c")
            .previous_element_siblings()] == ["b", "a"]
    assert doc.get_element_by_id("ul").previous_element_siblings() == []


def test_clear_attributes():
    el = Element("a").set_attr("href", "http://example.com") \
        .set_text("Hello")
    assert el.outer_html() == '<a href="http://example.com">Hello</a>'
    el2 = el.clear_attributes()
    assert el2 is el
    assert el2.outer_html() == "<a>Hello</a>"


def test_remove_attr_chain():
    el = (Element("a").set_attr("href", "http://example.com")
          .set_attr("id", "1").set_text("Hello"))
    assert el.outer_html() == '<a href="http://example.com" id="1">Hello</a>'
    el2 = el.remove_attr("href")
    assert el2 is el
    assert el2.outer_html() == '<a id="1">Hello</a>'


def test_root():
    el = Element("a")
    el.append_html("<span>Hello</span>")
    assert el.outer_html() == "<a><span>Hello</span></a>"
    span = el.select_first("span")
    assert span is not None
    assert span.root() is el
    doc = KP.parse("<div><p>One<p>Two<p>Three")
    div = doc.select_first("div")
    assert div.root() is doc
    assert div.owner_document() is doc
