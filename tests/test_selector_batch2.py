"""SelectorTest tranche 2 — translated from reference
ksoup-test/.../select/SelectorTest.kt (testByTag:19 through
testSupportsLeadingCombinator:462, plus contains/matches/not/empty
batches)."""

from ksoup_ray.engine import parser as KP


def ids(els):
    return [e.id() for e in els]


def own_texts(els):
    return [e.own_text() for e in els]


def test_by_tag():
    els = KP.parse("<div id=1><div id=2><p>Hello</p></div></div>"
                   "<DIV id=3>").select("DIV")
    assert ids(els) == ["1", "2", "3"]
    none = KP.parse("<div id=1><div id=2><p>Hello</p></div></div>"
                    "<div id=3>").select("span")
    assert none == []


def test_by_escaped_tag():
    doc = KP.parse("<p.p>One</p.p> <p\\p>Two</p\\p>")
    assert doc.expect_first("p\\.p").text() == "One"
    assert doc.expect_first("p\\\\p").text() == "Two"


def test_by_id():
    els = KP.parse("<div><p id=foo>Hello</p><p id=foo>Foo two!</p>"
                   "</div>").select("#foo")
    assert own_texts(els) == ["Hello", "Foo two!"]
    assert KP.parse("<div id=1></div>").select("#foo") == []


def test_by_escaped_id():
    doc = KP.parse("<p id='i.d'>One</p> <p id='i\\d'>Two</p> "
                   "<p id='one-two/three'>Three</p>")
    assert doc.expect_first("#i\\.d").text() == "One"
    assert doc.expect_first("#i\\\\d").text() == "Two"
    assert doc.expect_first("p#one-two\\/three").text() == "Three"


def test_by_class():
    els = KP.parse("<p id=0 class='ONE two'><p id=1 class='one'>"
                   "<p id=2 class='two'>").select("P.One")
    assert ids(els) == ["0", "1"]
    assert KP.parse("<div class='one'></div>").select(".foo") == []
    els2 = KP.parse("<div class='One-Two' id=1></div>").select(".one-two")
    assert ids(els2) == ["1"]


def test_by_escaped_class():
    doc = KP.parse("<p class='one.two#three'>One</p>")
    assert own_texts(doc.select("p.one\\.two\\#three")) == ["One"]


def test_by_class_case_insensitive():
    html = ("<p Class=foo>One <p Class=Foo>Two <p class=FOO>Three "
            "<p class=farp>Four")
    els_class = KP.parse(html).select("P.Foo")
    els_attr = KP.parse(html).select("p[class=foo]")
    assert len(els_attr) == len(els_class)
    assert own_texts(els_class) == ["One", "Two", "Three"]


def test_by_attribute():
    h = ("<div Title=Foo /><div Title=Bar /><div Style=Qux />"
         "<div title=Balim /><div title=SLIM />"
         "<div data-name='with spaces'/>")
    doc = KP.parse(h)
    assert len(doc.select("[title]")) == 4
    assert len(doc.select("[TITLE=foo]")) == 1
    assert len(doc.select('[title="foo"]')) == 1
    assert len(doc.select('[title="Foo"]')) == 1
    data_name = doc.select('[data-name="with spaces"]')
    assert len(data_name) == 1
    assert data_name[0].attr("data-name") == "with spaces"
    not_ = doc.select("div[title!=bar]")
    assert len(not_) == 5
    assert not_[0].attr("title") == "Foo"
    starts = doc.select("[title^=ba]")
    assert [e.attr("title") for e in starts] == ["Bar", "Balim"]
    ends = doc.select("[title$=im]")
    assert [e.attr("title") for e in ends] == ["Balim", "SLIM"]
    contains = doc.select("[title*=i]")
    assert [e.attr("title") for e in contains] == ["Balim", "SLIM"]


def test_namespaced_tag():
    doc = KP.parse("<div><abc:def id=1>Hello</abc:def></div> "
                   "<abc:def class=bold id=2>There</abc:def>")
    assert ids(doc.select("abc|def")) == ["1", "2"]
    assert ids(doc.select(".bold")) == ["2"]
    assert ids(doc.select("abc|def.bold")) == ["2"]
    assert ids(doc.select("abc|def:contains(e)")) == ["1", "2"]


def test_by_attribute_starting():
    doc = KP.parse("<div id=1 ATTRIBUTE data-name=ksoup>Hello</div>"
                   "<p data-val=5 id=2>There</p><p id=3>No</p>")
    with_data = doc.select("[^data-]")
    assert ids(with_data) == ["1", "2"]
    assert ids(doc.select("p[^data-]")) == ["2"]
    assert len(doc.select("[^attrib]")) == 1


def test_by_attribute_regex():
    doc = KP.parse("<p><img src=foo.png id=1><img src=bar.jpg id=2>"
                   "<img src=qux.JPEG id=3><img src=old.gif><img></p>")
    assert ids(doc.select("img[src~=(?i)\\.(png|jpe?g)]")) == \
        ["1", "2", "3"]


def test_by_attribute_regex_character_class():
    doc = KP.parse("<p><img src=foo.png id=1><img src=bar.jpg id=2>"
                   "<img src=qux.JPEG id=3><img src=old.gif id=4></p>")
    assert ids(doc.select("img[src~=[o]]")) == ["1", "4"]


def test_by_attribute_regex_combined():
    doc = KP.parse("<div><table class=x><td>Hello</td></table></div>")
    els = doc.select("div table[class~=x|y]")
    assert len(els) == 1
    assert els[0].text() == "Hello"


def test_combined_with_contains():
    doc = KP.parse("<p id=1>One</p><p>Two +</p><p>Three +</p>")
    els = doc.select("p#1 + :contains(+)")
    assert len(els) == 1
    assert els[0].text() == "Two +"
    assert els[0].tag_name() == "p"


def test_all_elements():
    doc = KP.parse("<div><p>Hello</p><p><b>there</b></p></div>")
    assert len(doc.select("*")) == 8
    all_under_div = doc.select("div *")
    assert len(all_under_div) == 3
    assert all_under_div[0].tag_name() == "p"


def test_all_with_class():
    doc = KP.parse("<p class=first>One<p class=first>Two<p>Three")
    assert len(doc.select("*.first")) == 2


def test_group_or():
    h = ("<div title=foo /><div title=bar /><div /><p></p><img />"
         "<span title=qux>")
    doc = KP.parse(h)
    els = doc.select("p,div,[title]")
    assert len(els) == 5
    assert els[0].tag_name() == "div" and els[0].attr("title") == "foo"
    assert els[1].tag_name() == "div" and els[1].attr("title") == "bar"
    assert els[2].tag_name() == "div" and els[2].attr("title") == ""
    assert not els[2].has_attr("title")
    assert els[3].tag_name() == "p"
    assert els[4].tag_name() == "span"


def test_group_or_attribute():
    h = "<div id=1 /><div id=2 /><div title=foo /><div title=bar />"
    els = KP.parse(h).select("[id],[title=foo]")
    assert len(els) == 3
    assert els[0].id() == "1"
    assert els[1].id() == "2"
    assert els[2].attr("title") == "foo"


def test_descendant():
    h = ("<div class=head><p class=first>Hello</p><p>There</p></div>"
         "<p>None</p>")
    doc = KP.parse(h)
    root = doc.get_elements_by_class("HEAD")[0]
    els = root.select(".head p")
    assert [e.text() for e in els] == ["Hello", "There"]
    p = root.select("p.first")
    assert [e.text() for e in p] == ["Hello"]
    assert root.select("p .first") == []
    assert root.select("body div.head") == []


def test_and():
    h = ("<div id=1 class='foo bar' title=bar name=qux>"
         "<p class=foo title=bar>Hello</p></div")
    doc = KP.parse(h)
    div = doc.select("div.foo")
    assert len(div) == 1 and div[0].tag_name() == "div"
    p = doc.select("div .foo")
    assert len(p) == 1 and p[0].tag_name() == "p"
    div2 = doc.select("div#1.foo.bar[title=bar][name=qux]")
    assert len(div2) == 1 and div2[0].tag_name() == "div"
    p2 = doc.select("div *.foo")
    assert len(p2) == 1 and p2[0].tag_name() == "p"


def test_deeper_descendant():
    h = ("<div class=head><p><span class=first>Hello</div>"
         "<div class=head><p class=first><span>Another</span>"
         "<p>Again</div>")
    doc = KP.parse(h)
    root = doc.get_elements_by_class("head")[0]
    els = root.select("div p .first")
    assert len(els) == 1
    assert els[0].text() == "Hello"
    assert els[0].tag_name() == "span"
    assert root.select("body p .first") == []


def test_parent_child_element():
    h = "<div id=1><div id=2><div id = 3></div></div></div><div id=4></div>"
    doc = KP.parse(h)
    divs = doc.select("div > div")
    assert ids(divs) == ["2", "3"]
    assert ids(doc.select("div#1 > div")) == ["2"]


def test_parent_with_class_child():
    h = ("<h1 class=foo><a href=1 /></h1><h1 class=foo>"
         "<a href=2 class=bar /></h1><h1><a href=3 /></h1>")
    doc = KP.parse(h)
    assert len(doc.select("h1 > a")) == 3
    assert doc.select("h1 > a")[0].tag_name() == "a"
    assert len(doc.select("h1.foo > a")) == 2
    assert len(doc.select("h1.foo > a.bar")) == 1


def test_parent_child_star():
    h = ("<div id=1><p>Hello<p><b>there</b></p></div>"
         "<div id=2><span>Hi</span></div>")
    doc = KP.parse(h)
    div_childs = doc.select("div > *")
    assert [e.tag_name() for e in div_childs] == ["p", "p", "span"]


def test_multi_child_descent():
    h = ("<div id=foo><h1 class=bar>"
         "<a href=http://example.com/>One</a></h1></div>")
    els = KP.parse(h).select("div#foo > h1.bar > a[href*=example]")
    assert len(els) == 1 and els[0].tag_name() == "a"


def test_case_insensitive():
    doc = KP.parse("<dIv tItle=bAr><div>")
    assert len(doc.select("DiV")) == 2
    assert len(doc.select("DiV[TiTLE]")) == 1
    assert len(doc.select("DiV[TiTLE=BAR]")) == 1
    assert len(doc.select("DiV[TiTLE=BARBARELLA]")) == 0


def test_adjacent_siblings():
    doc = KP.parse("<ol><li>One<li>Two<li>Three</ol>")
    sibs = doc.select("li + li")
    assert [e.text() for e in sibs] == ["Two", "Three"]


def test_adjacent_siblings_with_id():
    doc = KP.parse("<ol><li id=1>One<li id=2>Two<li id=3>Three</ol>")
    sibs = doc.select("li#1 + li#2")
    assert [e.text() for e in sibs] == ["Two"]


def test_not_adjacent():
    doc = KP.parse("<ol><li id=1>One<li id=2>Two<li id=3>Three</ol>")
    assert doc.select("li#1 + li#3") == []


def test_mix_combinator():
    doc = KP.parse("<div class=foo><ol><li>One<li>Two<li>Three</ol></div>")
    sibs = doc.select("body > div.foo li + li")
    assert [e.text() for e in sibs] == ["Two", "Three"]


def test_mix_combinator_group():
    doc = KP.parse("<div class=foo><ol><li>One<li>Two<li>Three</ol></div>")
    els = doc.select(".foo > ol, ol > li + li")
    assert len(els) == 3
    assert els[0].tag_name() == "ol"
    assert els[1].text() == "Two"
    assert els[2].text() == "Three"


def test_general_siblings():
    doc = KP.parse("<ol><li id=1>One<li id=2>Two<li id=3>Three</ol>")
    els = doc.select("#1 ~ #3")
    assert [e.text() for e in els] == ["Three"]


def test_characters_in_id_and_class():
    doc = KP.parse("<div><p id='a1-foo_bar'>One</p>"
                   "<p class='b2-qux_bif'>Two</p></div>")
    assert doc.get_element_by_id("a1-foo_bar").text() == "One"
    assert doc.get_elements_by_class("b2-qux_bif")[0].text() == "Two"
    assert doc.select("#a1-foo_bar")[0].text() == "One"
    assert doc.select(".b2-qux_bif")[0].text() == "Two"


def test_supports_leading_combinator():
    doc = KP.parse("<div><p><span>One</span><span>Two</span></p></div>")
    p = doc.select("div > p")[0]
    spans = p.select("> span")
    assert len(spans) == 2
    assert spans[0].text() == "One"
    doc = KP.parse("<div id=1><div id=2><div id=3></div></div></div>")
    from ksoup_ray.engine.select import select_in_roots
    div = select_in_roots(" > div", doc.select("div"))[0]
    assert div.id() == "2"


def test_pseudo_less_than():
    doc = KP.parse("<div><p>One</p><p>Two</p><p>Three</>p></div>"
                   "<div><p>Four</p>")
    ps = doc.select("div p:lt(2)")
    assert [e.text() for e in ps] == ["One", "Two", "Four"]


def test_pseudo_greater_than():
    doc = KP.parse("<div><p>One</p><p>Two</p><p>Three</p></div>"
                   "<div><p>Four</p>")
    ps = doc.select("div p:gt(0)")
    assert [e.text() for e in ps] == ["Two", "Three"]


def test_pseudo_equals():
    doc = KP.parse("<div><p>One</p><p>Two</p><p>Three</>p></div>"
                   "<div><p>Four</p>")
    ps = doc.select("div p:eq(0)")
    assert [e.text() for e in ps] == ["One", "Four"]
    ps2 = doc.select("div:eq(0) p:eq(0)")
    assert [e.text() for e in ps2] == ["One"]


def test_pseudo_between():
    doc = KP.parse("<div><p>One</p><p>Two</p><p>Three</>p></div>"
                   "<div><p>Four</p>")
    ps = doc.select("div p:gt(0):lt(2)")
    assert [e.text() for e in ps] == ["Two"]


def test_pseudo_combined():
    doc = KP.parse("<div class='foo'><p>One</p><p>Two</p></div>"
                   "<div><p>Three</p><p>Four</p></div>")
    ps = doc.select("div.foo p:gt(0)")
    assert [e.text() for e in ps] == ["Two"]


def test_pseudo_has():
    doc = KP.parse("<div id=0><p><span>Hello</span></p></div> "
                   "<div id=1><span class=foo>There</span></div> "
                   "<div id=2><p>Not</p></div>")
    divs1 = doc.select("div:has(span)")
    assert ids(divs1) == ["0", "1"]
    divs2 = doc.select("div:has([class])")
    assert ids(divs2) == ["1"]
    divs3 = doc.select("div:has(span, p)")
    assert ids(divs3) == ["0", "1", "2"]
    els1 = doc.body().select(":has(p)")
    assert [e.tag_name() for e in els1] == ["body", "div", "div"]
    els2 = doc.select(":has(> span)")
    assert [e.tag_name() for e in els2] == ["p", "div"]


def test_contains_own():
    doc = KP.parse("<p id=1>Hello <b>there</b> igor</p>")
    ps = doc.select("p:containsOwn(Hello IGOR)")
    assert len(ps) == 1
    assert ps[0].id() == "1"
    assert doc.select("p:containsOwn(there)") == []
    doc2 = KP.parse("<p>Hello <b>there</b> IGOR</p>")
    assert len(doc2.select("p:containsOwn(igor)")) == 1


def test_matches():
    doc = KP.parse("<p id=1>The quick brown fox</p>"
                   "<p id=2>There is a warm house</p>"
                   "<p id=3>the quick brown fox</p>")
    assert doc.select("p:matches(The rain)") == []
    assert ids(doc.select("p:matches(The quick)")) == ["1"]
    assert ids(doc.select("p:matches((?i)the quick)")) == ["1", "3"]


def test_matches_own():
    doc = KP.parse("<p id=1>Hello <b>there</b> now</p>")
    ps = doc.select("p:matchesOwn((?i)hello now)")
    assert ids(ps) == ["1"]
    assert doc.select("p:matchesOwn(there)") == []


def test_not_paras():
    doc = KP.parse("<div id=1><p>One</p></div> <div id=2><p><span>Two"
                   "</span></p></div> <div id=3>Three</div>")
    el1 = doc.select("div:not(:has(p span))")
    assert ids(el1) == ["1", "3"]
    el2 = doc.select("div:not([id=1])")
    assert ids(el2) == ["2", "3"]


def test_not_all():
    doc = KP.parse("<p>Two</p> <p><span>Three</span></p>")
    el1 = doc.body().select(":not(p)")
    assert [e.tag_name() for e in el1] == ["body", "span"]


def test_not_class():
    doc = KP.parse("<div class=left>One</div><div class=right id=1>"
                   "<p>Two</p></div>")
    assert ids(doc.select("div:not(.left)")) == ["1"]


def test_handles_commas_in_selector():
    doc = KP.parse("<p name='1,2'>One</p><div>Two</div>"
                   "<ol><li>123</li><li>Text</li></ol>")
    ps = doc.select("[name=1,2]")
    assert len(ps) == 1
    lis = doc.select("li:matches(\\d+)")
    assert len(lis) == 1
    assert lis[0].text() == "123"


def test_select_supplementary_character():
    s = chr(135361)
    doc = KP.parse(f"<div k{s}='{s}'>^{s}$/div>")
    assert doc.select(f"div[k{s}]")[0].tag_name() == "div"
    assert doc.select(f"div:containsOwn(^{s}$)")[0].tag_name() == "div"


def test_empty_pseudo():
    doc = KP.parse("<p>One</p> <p></p> <p><!-- --></p>")
    assert len(doc.select("p:empty")) == 2


def test_match_text():
    doc = KP.parse("<p>One<br>Two</p>")
    doc.output_settings.pretty_print = False
    orig_html = doc.html()
    one = doc.select("p:matchText:first-child")
    assert one[0].text() == "One"
    two = doc.select("p:matchText:last-child")
    assert two[0].text() == "Two"
    assert doc.html() == orig_html
    assert "".join(e.text() for e in
                   doc.select("p:matchText + br + *")) == "Two"


def test_split_on_br():
    doc = KP.parse("<div><p>One<br>Two<br>Three</p></div>")
    els = doc.select("p:matchText")
    assert len(els) == 3
    assert els[0].text() == "One"
    assert els[1].text() == "Two"


def test_nth_last_child_with_no_parent():
    from ksoup_ray.engine.dom import Element
    el = Element("p").append_text("Orphan")
    assert el.select("p:nth-last-child(1)") == []
