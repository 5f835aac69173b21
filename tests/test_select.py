"""CSS selector goldens from reference select/SelectorTest.kt + CssTest.kt."""

from ksoup_ray.engine import parser as P


def ids(doc, q):
    return [e.id() for e in doc.select(q)]


def test_by_tag():
    # SelectorTest.kt:19
    doc = P.parse("<div id=1><div id=2><p>Hello</p></div></div>"
                  "<div id=3>")
    els = doc.select("div")
    assert len(els) == 3
    assert els[0].id() == "1"
    assert els[1].id() == "2"
    assert els[2].id() == "3"


def test_by_id():
    doc = P.parse("<div><p id=foo>Hello</p><p id=foo>Foo two!</p></div>")
    els = doc.select("#foo")
    assert len(els) == 2
    assert els[0].text() == "Hello"
    assert els[1].text() == "Foo two!"


def test_by_class():
    doc = P.parse("<p id=0 class='ONE two'><p id=1 class='one'>"
                  "<p id=2 class='two'>")
    els = doc.select("P.One")
    assert len(els) == 2
    assert els[0].id() == "0"
    assert els[1].id() == "1"


def test_by_attribute():
    h = ("<div Title=Foo /><div Title=Bar /><div Style=Qux />"
         "<div title=Balim /><div title=SLIM />"
         "<div data-name='with spaces'/>")
    doc = P.parse(h)
    assert len(doc.select("[title]")) == 4
    assert len(doc.select("[TITLE]")) == 4
    assert len(doc.select("[title=foo]")) == 1
    assert len(doc.select("[title=FOO]")) == 1
    assert len(doc.select("[style]")) == 1
    assert len(doc.select("[^titl]")) == 4
    # SelectorTest.kt:100 — scoped to div (bare != matches attr-less els too)
    assert len(doc.select("div[title!=bar]")) == 5
    assert len(doc.select("[title^=ba]")) == 2
    assert len(doc.select("[title$=im]")) == 2
    assert len(doc.select("[title*=li]")) == 2
    assert len(doc.select("[data-name='with spaces']")) == 1


def test_all_elements():
    doc = P.parse("<div><p>Hello</p><p><b>there</b></p></div>")
    assert len(doc.select("*")) >= 6  # html head body div p p b


def test_descendant_and_child():
    doc = P.parse('<div id=1><p id=2><span id=3>x</span></p></div>')
    assert ids(doc, "div span") == ["3"]
    assert ids(doc, "div > p") == ["2"]
    assert ids(doc, "div > span") == []


def test_combined():
    doc = P.parse('<div id=outer class=x><div id=inner>'
                  '<p class=hl>one</p><p>two</p></div></div>')
    assert [e.class_name() for e in doc.select("div.x > div p.hl")] == ["hl"]
    els = doc.select("div.x p.hl")
    assert [e.text() for e in els] == ["one"]


def test_sibling_combinators():
    doc = P.parse("<div><p id=1>One</p><p id=2>Two</p><p id=3>Three</p></div>")
    assert ids(doc, "p + p") == ["2", "3"]
    assert ids(doc, "#1 ~ p") == ["2", "3"]
    assert ids(doc, "#1 + #3") == []


def test_or_groups():
    doc = P.parse("<p id=1>a</p><span id=2>b</span><div id=3>c</div>")
    assert set(ids(doc, "p, span")) == {"1", "2"}
    assert set(ids(doc, "p,span,div")) == {"1", "2", "3"}
    # or-precedence with combinator: "body p, span"
    assert set(ids(doc, "body > p, span")) == {"1", "2"}


def test_pseudo_index():
    doc = P.parse("<div><p id=0>0</p><p id=1>1</p><p id=2>2</p></div>")
    assert ids(doc, "p:lt(2)") == ["0", "1"]
    assert ids(doc, "p:gt(0)") == ["1", "2"]
    assert ids(doc, "p:eq(1)") == ["1"]


def test_nth_child():
    doc = P.parse("<ul><li id=a><li id=b><li id=c><li id=d></ul>")
    assert ids(doc, "li:nth-child(odd)") == ["a", "c"]
    assert ids(doc, "li:nth-child(even)") == ["b", "d"]
    assert ids(doc, "li:nth-child(2n+1)") == ["a", "c"]
    assert ids(doc, "li:nth-child(1)") == ["a"]
    assert ids(doc, "li:nth-last-child(1)") == ["d"]
    assert ids(doc, "li:first-child") == ["a"]
    assert ids(doc, "li:last-child") == ["d"]


def test_nth_of_type():
    doc = P.parse("<div><p id=1></p><span id=s></span><p id=2></p></div>")
    assert ids(doc, "p:nth-of-type(2)") == ["2"]
    assert ids(doc, "p:first-of-type") == ["1"]
    assert ids(doc, "p:last-of-type") == ["2"]
    assert ids(doc, "span:only-of-type") == ["s"]


def test_has():
    doc = P.parse("<div id=1><p><span>x</span></p></div><div id=2><p>y</p></div>")
    assert ids(doc, "div:has(span)") == ["1"]
    assert ids(doc, "div:has(p)") == ["1", "2"]
    assert ids(doc, "p:has(> span)") == [""]


def test_not():
    doc = P.parse("<div id=1 class=x></div><div id=2></div>")
    assert ids(doc, "div:not(.x)") == ["2"]


def test_contains():
    doc = P.parse("<div id=1>The quick</div><div id=2>brown fox</div>")
    assert ids(doc, "div:contains(quick)") == ["1"]
    assert ids(doc, "div:contains(QUICK)") == ["1"]
    assert ids(doc, "div:containsOwn(fox)") == ["2"]


def test_matches():
    doc = P.parse("<div id=1>100</div><div id=2>abc</div>")
    assert ids(doc, "div:matches(\\d+)") == ["1"]
    assert ids(doc, "div:matches((?i)ABC)") == ["2"]


def test_empty_root():
    doc = P.parse("<div id=1></div><div id=2>x</div>")
    assert ids(doc, "div:empty") == ["1"]
    assert doc.select_first(":root").tag_name() == "html"


def test_escaped_identifiers():
    # SelectorTest.kt:28-55
    doc = P.parse('<p class="one.two">One</p>')
    assert len(doc.select("p.one\\.two")) == 1
    doc2 = P.parse('<p id="i.d">One</p>')
    assert len(doc2.select("#i\\.d")) == 1


def test_namespaced_tags():
    doc = P.parse("<svg><text id=t>x</text></svg><p id=p>y</p>")
    assert len(doc.select("*|text")) == 1
    assert doc.select_first("svg > text").id() == "t"


def test_select_within():
    doc = P.parse("<div id=out><div id=in><p>x</p></div><p>y</p></div>")
    inner = doc.select_first("#in")
    assert len(inner.select("p")) == 1


def test_is():
    doc = P.parse("<div id=1><p>x</p></div><span id=2></span>")
    assert ids(doc, ":is(div, span)") == ["1", "2"]


def test_attribute_quoted_value():
    doc = P.parse('<a href="http://example.com/">x</a>')
    assert len(doc.select('a[href="http://example.com/"]')) == 1
    assert len(doc.select("a[href='http://example.com/']")) == 1


def test_elements_not():
    from ksoup_ray.engine.select import filter_out
    doc = P.parse("<p id=1 class=x></p><p id=2></p><p id=3 class=x></p>")
    all_p = doc.select("p")
    out = doc.select("p.x")
    rest = filter_out(all_p, out)
    assert [e.id() for e in rest] == ["2"]
