"""ElementsTest tranche — translated from reference
ksoup-test/.../select/ElementsTest.kt."""

from ksoup_ray.engine import parser as KP
from ksoup_ray.engine.elements import Elements


def _strip(s: str) -> str:
    return "".join(line.lstrip(" ") for line in s.split("\n"))


def sel(html, q):
    return Elements(KP.parse(html).select(q))


def test_filter():
    h = ("<p>Excl</p><div class=headline><p>Hello</p><p>There</p></div>"
         "<div class=headline><h1>Headline</h1></div>")
    els = Elements(KP.parse(h).select(".headline")).select("p")
    assert len(els) == 2
    assert els[0].text() == "Hello"
    assert els[1].text() == "There"


def test_attributes():
    h = "<p title=foo><p title=bar><p class=foo><p class=bar>"
    doc = KP.parse(h)
    with_title = Elements(doc.select("p[title]"))
    assert len(with_title) == 2
    assert with_title.has_attr("title")
    assert not with_title.has_attr("class")
    assert with_title.attr("title") == "foo"
    with_title.remove_attr("title")
    assert len(with_title) == 2
    assert doc.select("p[title]") == []
    ps = Elements(doc.select("p")).set_attr("style", "classy")
    assert len(ps) == 4
    assert ps.last().attr("style") == "classy"
    assert ps.last().attr("class") == "bar"


def test_has_attr():
    ps = sel("<p title=foo><p title=bar><p class=foo><p class=bar>", "p")
    assert ps.has_attr("class")
    assert not ps.has_attr("style")


def test_has_abs_attr():
    doc = KP.parse("<a id=1 href='/foo'>One</a> "
                   "<a id=2 href='https://ksoup.org'>Two</a>")
    assert not Elements(doc.select("#1")).has_attr("abs:href")
    assert Elements(doc.select("#2")).has_attr("abs:href")
    assert Elements(doc.select("a")).has_attr("abs:href")


def test_attr():
    ps = sel("<p title=foo><p title=bar><p class=foo><p class=bar>", "p")
    assert ps.attr("class") == "foo"


def test_abs_attr():
    doc = KP.parse("<a id=1 href='/foo'>One</a> "
                   "<a id=2 href='https://ksoup.org'>Two</a>")
    assert Elements(doc.select("#1")).attr("abs:href") == ""
    assert Elements(doc.select("#2")).attr("abs:href") == \
        "https://ksoup.org"
    assert Elements(doc.select("a")).attr("abs:href") == \
        "https://ksoup.org"


def test_classes():
    doc = KP.parse("<div><p class='mellow yellow'></p>"
                   "<p class='red green'></p>")
    els = Elements(doc.select("p"))
    assert els.has_class("red")
    assert not els.has_class("blue")
    els.add_class("blue")
    els.remove_class("yellow")
    els.toggle_class("mellow")
    assert els[0].attr("class") == "blue"
    assert els[1].attr("class") == "red green blue mellow"


def test_has_class_case_insensitive():
    els = sel("<p Class=One>One <p class=Two>Two <p CLASS=THREE>THREE",
              "p")
    one, two, thr = els[0], els[1], els[2]
    assert one.has_class("One") and one.has_class("ONE")
    assert two.has_class("TWO") and two.has_class("Two")
    assert thr.has_class("ThreE") and thr.has_class("three")


def test_text():
    assert sel("<div><p>Hello<p>there<p>world</div>", "div > *") \
        .text() == "Hello there world"


def test_has_text():
    doc = KP.parse("<div><p>Hello</p></div><div><p></p></div>")
    assert Elements(doc.select("div")).has_text()
    assert not Elements(doc.select("div + div")).has_text()


def test_html():
    divs = sel("<div><p>Hello</p></div><div><p>There</p></div>", "div")
    assert divs.html() == "<p>Hello</p>\n<p>There</p>"


def test_set_html():
    doc = KP.parse("<p>One</p><p>Two</p><p>Three</p>")
    ps = Elements(doc.select("p"))
    ps.prepend("<b>Bold</b>").append("<i>Ital</i>")
    assert _strip(ps[1].outer_html()) == "<p><b>Bold</b>Two<i>Ital</i></p>"
    ps.set_html("<span>Gone</span>")
    assert _strip(ps[1].outer_html()) == "<p><span>Gone</span></p>"


def test_eq():
    h = "<p>Hello<p>there<p>world"
    doc = KP.parse(h)
    assert Elements(doc.select("p")).eq(1).text() == "there"
    assert doc.select("p:eq(1)")[0].text() == "there"


def test_is():
    h = "<p>Hello<p title=foo>there<p>world"
    doc = KP.parse(h)
    ps = Elements(doc.select("p"))
    assert ps.is_("[title=foo]")
    assert not ps.is_("[title=bar]")


def test_parents():
    doc = KP.parse("<div><p>Hello</p></div><p>There</p>")
    parents = Elements(doc.select("p")).parents()
    assert [e.tag_name() for e in parents] == ["div", "body", "html"]


def test_not():
    doc = KP.parse("<div id=1><p>One</p></div> "
                   "<div id=2><p><span>Two</span></p></div>")
    div1 = Elements(doc.select("div")).not_(":has(p > span)")
    assert len(div1) == 1
    assert div1.first().id() == "1"
    div2 = Elements(doc.select("div")).not_("#1")
    assert len(div2) == 1
    assert div2.first().id() == "2"


def test_tag_name_set():
    doc = KP.parse("<p>Hello <i>there</i> <i>now</i></p>")
    Elements(doc.select("i")).tag_name("em")
    assert doc.select("p")[0].html() == "Hello <em>there</em> <em>now</em>"


def test_traverse():
    doc = KP.parse("<div><p>Hello</p></div><div>There</div>")
    accum = []

    class Visitor:
        def head(self, node, depth):
            accum.append(f"<{node.node_name()}>")

        def tail(self, node, depth):
            accum.append(f"</{node.node_name()}>")

    from ksoup_ray.engine.elements import traverse
    traverse(Visitor(), doc.select("div"))
    assert "".join(accum) == ("<div><p><#text></#text></p></div>"
                              "<div><#text></#text></div>")


def test_forms():
    doc = KP.parse("<form id=1><input name=q></form>"
                   "<div /><form id=2><input name=f></form>")
    els = Elements(doc.select("form, div"))
    assert len(els) == 3
    forms = els.forms()
    assert [f.id() for f in forms] == ["1", "2"]


def test_each_text():
    doc = KP.parse("<div><p>1<p>2<p>3<p>4<p>5<p>6</div>"
                   "<div><p>7<p>8<p>9<p>10<p>11<p>12<p></p></div>")
    div_text = Elements(doc.select("div")).each_text()
    assert len(div_text) == 2
    assert div_text[0] == "1 2 3 4 5 6"
    assert div_text[1] == "7 8 9 10 11 12"
    p_text = Elements(doc.select("p")).each_text()
    assert len(doc.select("p")) == 13
    assert len(p_text) == 12  # last <p></p> is empty
    assert p_text[0] == "1"
    assert p_text[11] == "12"


def test_each_attr():
    doc = KP.parse('<div><a href="/foo">1</a><a href="http://example.com'
                   '/bar">2</a><a href="" >3</a><a>4</a>',
                   "http://example.com")
    hrefs = Elements(doc.select("a")).each_attr("href")
    assert len(hrefs) == 3  # 3 elements with href, 4 total
    assert hrefs[0] == "/foo"
    assert hrefs[1] == "http://example.com/bar"
    abs_ = Elements(doc.select("a")).each_attr("abs:href")
    assert len(abs_) == 3
    assert abs_[0] == "http://example.com/foo"
    assert abs_[1] == "http://example.com/bar"
