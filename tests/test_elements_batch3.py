"""ElementsTest tranche 3 — wrap/unwrap, DOM-aware list mutation
(set/remove/retain/replace), class-with-hyphen (reference
ksoup-test/.../select/ElementsTest.kt remainder)."""

from ksoup_ray.engine import parser as KP
from ksoup_ray.engine.elements import Elements


def _strip(s: str) -> str:
    return "".join(line.lstrip(" ") for line in s.split("\n"))


def _els(doc, q):
    return Elements(doc.select(q))


def test_wrap_div():
    doc = KP.parse("<p><b>This</b> is <b>ksoup</b>.</p> "
                   "<p>How do you like it?</p>")
    _els(doc, "p").wrap("<div></div>")
    assert doc.body().html() == (
        "<div>\n <p><b>This</b> is <b>ksoup</b>.</p>\n</div>\n"
        "<div>\n <p>How do you like it?</p>\n</div>")


def test_unwrap_p():
    doc = KP.parse("<p><a>One</a> Two</p> Three <i>Four</i> "
                   "<p>Fix <i>Six</i></p>")
    _els(doc, "p").unwrap()
    assert _strip(doc.body().html()) == \
        "<a>One</a> Two Three <i>Four</i> Fix <i>Six</i>"


def test_unwrap_keeps_space():
    doc = KP.parse("<p>One <span>two</span> <span>three</span> four</p>")
    _els(doc, "span").unwrap()
    assert doc.body().html() == "<p>One two three four</p>"


def test_nodes_empty():
    doc = KP.parse("<p>")
    assert _els(doc, "form").text_nodes() == []


def test_class_with_hyphen():
    doc = KP.parse("<p class='tab-nav'>Check</p>")
    els = doc.get_elements_by_class("tab-nav")
    assert len(els) == 1
    assert els[0].text() == "Check"


def test_set_element_by_index():
    doc = KP.parse("<p>One<p>Two<p>Three")
    new_p = doc.create_element("p").set_text("New").set_attr("id", "new")
    ps = _els(doc, "p")
    two = ps[1]
    old = ps.set_at(1, new_p)
    assert old is two
    assert ps[1] is new_p
    assert doc.body().html() == \
        '<p>One</p>\n<p id="new">New</p>\n<p>Three</p>'


def test_remove_element_by_index():
    doc = KP.parse("<p>One<p>Two<p>Three")
    ps = _els(doc, "p")
    two = ps[1]
    assert two in ps
    old = ps.remove_at(1)
    assert old is two
    assert len(ps) == 2
    assert two not in ps
    assert doc.body().html() == "<p>One</p>\n<p>Three</p>"


def test_remove_element_by_object():
    doc = KP.parse("<p>One<p>Two<p>Three")
    ps = _els(doc, "p")
    two = ps[1]
    assert ps.remove_element(two)
    assert len(ps) == 2
    assert two not in ps
    assert doc.body().html() == "<p>One</p>\n<p>Three</p>"


def test_remove_element_object_noops():
    doc = KP.parse("<p>One<p>Two<p>Three")
    orig_html = doc.html()
    new_p = doc.create_element("p").set_text("New")
    ps = _els(doc, "p")
    size = len(ps)
    assert not ps.remove_element(new_p)
    assert doc.html() == orig_html
    assert len(ps) == size


def test_remove_all():
    doc = KP.parse("<p>One<p>Two<p>Three<p>Four</p><div>Div")
    ps = _els(doc, "p")
    assert len(ps) == 4
    mid_ps = doc.select("p:gt(0):lt(3)")  # Two and Three
    assert len(mid_ps) == 2
    assert ps.remove_all(mid_ps)
    assert len(ps) == 2
    assert len(mid_ps) == 2
    divs = doc.select("div")
    assert len(divs) == 1
    assert not ps.remove_all(divs)
    assert len(ps) == 2
    assert doc.body().html() == \
        "<p>One</p>\n<p>Four</p>\n<div>\n Div\n</div>"


def test_retain_all():
    doc = KP.parse("<p>One<p>Two<p>Three<p>Four</p><div>Div")
    ps = _els(doc, "p")
    assert len(ps) == 4
    mid_ps = Elements(doc.select("p:gt(0):lt(3)"))
    assert len(mid_ps) == 2
    assert ps.retain_all(mid_ps)
    assert len(ps) == 2
    assert len(mid_ps) == 2
    assert doc.body().html() == \
        "<p>Two</p>\n<p>Three</p>\n<div>\n Div\n</div>"
    ps_again = doc.select("p")
    assert not mid_ps.retain_all(ps_again)
    assert doc.body().html() == \
        "<p>Two</p>\n<p>Three</p>\n<div>\n Div\n</div>"


def test_remove_if_removes_from_dom():
    doc = KP.parse("<p>One<p>Two<p>Three<p>Four")
    ps = _els(doc, "p")
    assert ps.remove_if(lambda el: "Two" in el.text())
    assert len(ps) == 3
    assert doc.body().html() == "<p>One</p>\n<p>Three</p>\n<p>Four</p>"


def test_remove_if_supports_concurrent_read():
    doc = KP.parse("<p>One<p>Two<p>Three<p>Four")
    ps = _els(doc, "p")
    assert len(ps) == 4
    assert ps.remove_if(lambda el: el in ps)
    assert len(ps) == 0
    assert doc.body().html() == ""


def test_replace_all():
    doc = KP.parse("<p>One<p>Two<p>Three<p>Four")
    ps = _els(doc, "p")
    assert len(ps) == 4

    def to_div(el):
        div = doc.create_element("div")
        div.set_text(el.text())
        return div

    ps.replace_all(to_div)
    for p in ps:
        assert p.tag_name() == "div"
    assert doc.body().html() == (
        "<div>\n One\n</div>\n<div>\n Two\n</div>\n<div>\n Three\n</div>\n"
        "<div>\n Four\n</div>")
