"""SelectorTest tranche 3 — namespaced wildcards, :has nesting/siblings,
whole-text pseudos, attribute edge cases, leading combinators and memo
reuse (reference ksoup-test/.../select/SelectorTest.kt remainder)."""

from ksoup_ray.engine import parser as KP
from ksoup_ray.engine import select as S


def ids(els):
    return [e.id() for e in els]


def own_texts(els):
    return [e.own_text() for e in els]


# --- namespaced / wildcard tags (SelectorTest.kt:131-181, :953-1000) ---

def test_wildcard_namespaced_tag():
    doc = KP.parse("<div><abc:def id=1>Hello</abc:def></div> "
                   "<abc:def class=bold id=2>There</abc:def>")
    assert ids(doc.select("*|def")) == ["1", "2"]
    assert ids(doc.select(".bold")) == ["2"]
    assert ids(doc.select("*|def.bold")) == ["2"]
    assert ids(doc.select("*|def:contains(e)")) == ["1", "2"]


def test_namespaced_wildcard_tag():
    doc = KP.parse("<p>One</p> <ac:p id=2>Two</ac:p> "
                   "<ac:img id=3>Three</ac:img>")
    assert ids(doc.select("ac|*")) == ["2", "3"]


def test_wildcard_namespaced_xml_tag():
    doc = KP.parse_xml("<div><Abc:Def id=1>Hello</Abc:Def></div> "
                       "<Abc:Def class=bold id=2>There</abc:def>")
    assert ids(doc.select("*|Def")) == ["1", "2"]
    assert ids(doc.select(".bold")) == ["2"]
    assert ids(doc.select("*|Def.bold")) == ["2"]


def test_wildcard_namespaced_case_variations():
    doc = KP.parse_xml("<One:Two>One</One:Two><three:four>Two</three:four>")
    els1 = doc.select("One|Two")
    els2 = doc.select("one|two")
    els3 = doc.select("Three|Four")
    els4 = doc.select("three|Four")
    assert els1 == els2
    assert els3 == els4
    assert "".join(e.text() for e in els1) == "One"
    assert "".join(e.text() for e in els3) == "Two"


def test_xml_wildcard_namespace():
    doc = KP.parse_xml("<ns1:MyXmlTag>1111</ns1:MyXmlTag>"
                       "<ns2:MyXmlTag>2222</ns2:MyXmlTag>")
    sel = doc.select("*|MyXmlTag")
    assert len(sel) == 2
    assert sel[0].text() == "1111"
    assert sel[1].text() == "2222"


def test_wildcard_namespace_matches_no_namespace():
    doc = KP.parse_xml("<package><meta>One</meta><opf:meta>Two</opf:meta>"
                       "</package>")
    metas = doc.select("meta")
    assert len(metas) == 1 and metas[0].text() == "One"
    ns = doc.select("*|meta")
    assert [e.text() for e in ns] == ["One", "Two"]


MIXED = '<html xmlns:n="urn:ns"><n:mixedCase>text</n:mixedCase></html>'
LOWER = '<html xmlns:n="urn:ns"><n:lowercase>text</n:lowercase></html>'


def test_html_mixed_case_simple_name():
    assert len(KP.parse(MIXED).select("mixedCase")) == 0


def test_html_mixed_case_wildcard_name():
    assert len(KP.parse(MIXED).select("*|mixedCase")) == 1


def test_html_lowercase_simple_name():
    assert len(KP.parse(LOWER).select("lowercase")) == 0


def test_html_lowercase_wildcard_name():
    assert len(KP.parse(LOWER).select("*|lowercase")) == 1


def test_xml_mixed_case_simple_name():
    assert len(KP.parse_xml(MIXED).select("mixedCase")) == 0


def test_xml_mixed_case_wildcard_name():
    assert len(KP.parse_xml(MIXED).select("*|mixedCase")) == 1


def test_xml_lowercase_simple_name():
    assert len(KP.parse_xml(LOWER).select("lowercase")) == 0


def test_xml_lowercase_wildcard_name():
    assert len(KP.parse_xml(LOWER).select("*|lowercase")) == 1


# --- :has nesting and sibling subqueries (SelectorTest.kt:553-585) ---

def test_nested_has():
    doc = KP.parse("<div><p><span>One</span></p></div> <div><p>Two</p></div>")
    divs = doc.select("div:has(p:has(span))")
    assert len(divs) == 1 and divs[0].text() == "One"
    divs = doc.select("div:has(p:matches((?i)two))")
    assert len(divs) == 1
    assert divs[0].tag_name() == "div" and divs[0].text() == "Two"
    divs = doc.select("div:has(p:contains(two))")
    assert len(divs) == 1 and divs[0].text() == "Two"


def test_has_sibling():
    doc = KP.parse("<h1 id=1>One</h1> <h2>Two</h2> <h1>Three</h1>")
    assert ids(doc.select("h1:has(+h2)")) == ["1"]
    assert ids(doc.select("h1:has(~h1)")) == ["1"]
    doc = KP.parse("<div id=1><p><i>One</i><i>Two</p><p><i>Three</p></div> "
                   "<div><p><i>Four</div>")
    assert ids(doc.select("div:has(p:has(i:has(~i)))")) == ["1"]


def test_div_has_span_preceding():
    doc = KP.parse("<div><span>abc</span><a>def</a></div>")
    els = doc.select("div:has(span + a)")
    assert len(els) == 1 and els[0].normal_name() == "div"


def test_div_has_div_preceding():
    doc = KP.parse("<div id=1>\n<div 1><span>hello</span></div>\n"
                   "<div 2><span>there</span></div>\n\n</div>")
    els = doc.select("div:has(>div + div)")
    assert len(els) == 1
    assert els[0].normal_name() == "div" and els[0].id() == "1"


def test_nested_multi_has():
    doc = KP.parse("<html><head></head><body><div id=o>"
                   "<div id=i1><span id=s1>hello</span></div>"
                   "<div id=i2><span id=s2>world</span></div>"
                   "</div></body></html>")
    els = doc.select("div:has(> div:has(> span) + div:has(> span))")
    assert ids(els) == ["o"]


def test_root_immediate_parent_subquery():
    doc = KP.parse("<p id=0><span>A</p> <p id=1><b><i><span>B</p> "
                   "<p id=2><i>C</p>\n")
    assert ids(doc.select("p:has(> span, > i)")) == ["0", "2"]


# --- contains/matches family (SelectorTest.kt various) ---

def test_pseudo_contains():
    doc = KP.parse("<div><p>The Rain.</p> <p class=light>The <i>RAIN</i>."
                   "</p> <p>Rain, the.</p></div>")
    assert len(doc.select("p:contains(Rain)")) == 3
    ps2 = doc.select("p:contains(the rain)")
    assert len(ps2) == 2
    assert ps2[0].html() == "The Rain."
    assert ps2[-1].html() == "The <i>RAIN</i>."
    ps3 = doc.select("p:contains(the Rain):has(i)")
    assert len(ps3) == 1 and ps3[0].class_name() == "light"
    assert len(doc.select(".light:contains(rain)")) == 1
    assert len(doc.select(":contains(rain)")) == 8
    assert len(doc.select(":contains(RAIN)")) == 8


def test_pseudo_contains_with_parentheses():
    doc = KP.parse("<div><p id=1>This (is good)</p><p id=2>This is bad)</p>")
    assert ids(doc.select("p:contains(this (is good))")) == ["1"]
    assert ids(doc.select("p:contains(this is bad\\))")) == ["2"]


def test_contains_whole_text():
    doc = KP.parse("<div><p> ksoup\n The <i>HTML</i> Parser</p>"
                   "<p>ksoup The HTML Parser</div>")
    ps = doc.select("p")
    es1 = doc.select("p:containsWholeText( ksoup\n The HTML Parser)")
    es2 = doc.select("p:containsWholeText(ksoup The HTML Parser)")
    assert len(es1) == 1 and es1[0] is ps[0]
    assert len(es2) == 1 and es2[0] is ps[1]
    assert len(doc.select("div:containsWholeText(ksoup the html parser)")) == 0
    assert len(doc.select("div:containsWholeText(ksoup\n the html parser)")) == 0
    doc = KP.parse("<div><p></p><p> </p><p>.  </p>")
    blanks = doc.select("p:containsWholeText(  )")
    assert len(blanks) == 1 and blanks[0].whole_text() == ".  "


def test_contains_whole_own_text():
    doc = KP.parse("<div><p> ksoup\n The <i>HTML</i> Parser</p>"
                   "<p>ksoup The HTML Parser<br></div>")
    ps = doc.select("p")
    es1 = doc.select("p:containsWholeOwnText( ksoup\n The  Parser)")
    es2 = doc.select("p:containsWholeOwnText(ksoup The HTML Parser\n)")
    assert len(es1) == 1 and es1[0] is ps[0]
    assert len(es2) == 1 and es2[0] is ps[1]
    assert len(doc.select(
        "div:containsWholeOwnText(ksoup the html parser)")) == 0
    assert len(doc.select("div:containsWholeOwnText(ksoup\n the  parser)")) == 0
    doc = KP.parse("<div><p></p><p> </p><p>.  </p>")
    blanks = doc.select("p:containsWholeOwnText(  )")
    assert len(blanks) == 1 and blanks[0].whole_text() == ".  "


def test_matches_whole_text():
    doc = KP.parse("<p id=1>Hello <b>there</b>\n now</p><p id=2> </p>"
                   "<p id=3></p>")
    assert ids(doc.select("p:matchesWholeText((?i)hello there\n now)")) == ["1"]
    assert len(doc.select("p:matchesWholeText(there\n now)")) == 1
    assert len(doc.select("p:matchesWholeText(There\n now)")) == 0
    assert ids(doc.select("p:matchesWholeText(^\\s+$)")) == ["2"]
    assert ids(doc.select("p:matchesWholeText(^$)")) == ["3"]


def test_matches_whole_own_text():
    doc = KP.parse("<p id=1>Hello <b>there</b>\n now</p><p id=2> </p>"
                   "<p id=3><i>Text</i></p>")
    assert ids(doc.select("p:matchesWholeOwnText((?i)hello \n now)")) == ["1"]
    assert len(doc.select("p:matchesWholeOwnText(there\n now)")) == 0
    assert ids(doc.select("p:matchesWholeOwnText(^\\s+$)")) == ["2"]
    assert ids(doc.select("p:matchesWholeOwnText(^$)")) == ["3"]


def test_contains_data():
    doc = KP.parse("<p>function</p><script>FUNCTION</script>"
                   "<style>item</style><span><!-- comments --></span>")
    body = doc.body()
    d1 = S.select(":containsData(function)", body)
    d2 = S.select("script:containsData(function)", body)
    d3 = S.select("span:containsData(comments)", body)
    d4 = S.select(":containsData(o)", body)
    d5 = S.select("style:containsData(ITEM)", body)
    assert len(d1) == 2            # body and script
    assert len(d2) == 1 and d1[-1] is d2[0]
    assert d2[0].outer_html() == "<script>FUNCTION</script>"
    assert len(d3) == 1 and d3[0].tag_name() == "span"
    assert [e.tag_name() for e in d4] == ["body", "script", "span"]
    assert len(d5) == 1


def test_contains_with_quote():
    doc = KP.parse("<p>One'One</p><p>One'Two</p>")
    els = doc.select("p:contains(One\\'One)")
    assert len(els) == 1 and els[0].text() == "One'One"


def test_contains_text_query_is_normalized():
    doc = KP.parse("<p><p id=1>Hello  there now<em>!</em>")
    a = doc.select("p:contains(Hello   there  now!)")
    b = doc.select(":containsOwn(hello   there  now)")
    c = doc.select("p:contains(Hello there now)")
    d = doc.select(":containsOwn(hello There now)")
    e = doc.select("p:contains(HelloThereNow)")
    assert len(a) == 1
    assert a == b == c == d
    assert len(e) == 0 and a != e


def test_match_text_attributes():
    doc = KP.parse("<div><p class=one>One<br>Two<p class=two>Three<br>Four")
    els = doc.select("p.two:matchText:last-child")
    assert len(els) == 1 and els[0].text() == "Four"


def test_find_between_span():
    doc = KP.parse("<p><span>One</span> Two <span>Three</span>")
    els = doc.select("span ~ p:matchText")
    assert len(els) == 1 and els[0].text() == "Two"


# --- attribute edge cases ---

def test_select_class_with_space():
    doc = KP.parse('<div class="value">class without space</div>\n'
                   '<div class="value ">class with space</div>')
    found = doc.select("div[class=value ]")
    assert [e.text() for e in found] == ["class without space",
                                        "class with space"]
    found = doc.select('div[class="value "]')
    assert [e.text() for e in found] == ["class without space",
                                        "class with space"]
    assert len(doc.select('div[class="value\\ "]')) == 0


def test_attribute_with_brackets():
    doc = KP.parse("<div data='End]'>One</div> "
                   "<div data='[Another)]]'>Two</div>")
    assert doc.select("div[data='End]']")[0].text() == "One"
    assert doc.select("div[data='[Another)]]']")[0].text() == "Two"
    assert doc.select('div[data="End]"]')[0].text() == "One"
    assert doc.select('div[data="[Another)]]"]')[0].text() == "Two"


def test_starts_with_begins_with_space():
    doc = KP.parse('<small><a href=" mailto:abc@def.net">(abc@def.net)'
                   "</a></small>")
    assert len(doc.select("a[href^=' mailto']")) == 1


def test_ends_with_ends_with_spaces():
    doc = KP.parse('<small><a href=" mailto:abc@def.net ">(abc@def.net)'
                   "</a></small>")
    assert len(doc.select("a[href$='.net ']")) == 1


def test_empty_attribute_prefix():
    doc = KP.parse("<p one>One<p one two>Two<p>Three")
    assert own_texts(doc.select("[^]")) == ["One", "Two"]
    assert own_texts(doc.select("p:not([^])")) == ["Three"]


# --- structure / combinators ---

def test_select_first_with_and():
    doc = KP.parse("<p>One<p class=foo>Two<p>Three")
    assert doc.select_first("p.foo").text() == "Two"


def test_select_first_with_or():
    doc = KP.parse("<p>One<p>Two<p>Three<div>Four")
    assert doc.select_first("p, div").text() == "One"


def test_select_same_elements():
    doc = KP.parse("<div>one</div><div>one</div>")
    els = doc.select("div")
    assert len(els) == 2
    sub = S.select_in_roots(":contains(one)", list(els))
    assert len(sub) == 2


def test_trim_selector():
    doc = KP.parse("<p><span>Hello")
    els = doc.select(" p span ")
    assert len(els) == 1 and els[0].text() == "Hello"


def test_child_elements():
    doc = KP.parse("<body><span id=1>One <span id=2>Two</span></span></body>")
    outer = doc.select_first("span")
    span = outer.select_first("span")
    inner = outer.select_first("* span")
    assert outer.id() == "1" and span.id() == "1" and inner.id() == "2"
    assert outer is span and outer is not inner


def test_select_first_level_children_only():
    doc = KP.parse("<div><span>One <span>Two</span></span> "
                   "<span>Three <span>Four</span></span>")
    div = doc.select_first("div")
    assert div is not None
    spans = div.select(":root > span")
    assert [e.text() for e in spans] == ["One Two", "Three Four"]


def test_parent_from_specified_descender():
    doc = KP.parse("<ul id=outer><li>Foo</li><li>Bar "
                   "<ul id=inner><li>Baz</li><li>Qux</li></ul> </li></ul>")
    ul = doc.expect_first("#outer")
    assert len(ul.children()) == 2
    li1 = ul.expect_first("> li:nth-child(1)")
    assert li1.own_text() == "Foo"
    assert li1.select("ul") == []
    li2 = ul.expect_first("> li:nth-child(2)")
    assert li2.own_text() == "Bar"
    inner_lis = li2.select("ul > li")
    assert own_texts(inner_lis) == ["Baz", "Qux"]
    assert li2.select("ul li") == inner_lis


def test_or_after_class():
    doc = KP.parse("<div id=parent><span class=child></span>"
                   "<span class=child></span><span class=child></span></div>")
    q = "#parent [class*=child], .some-other-selector .nested"
    assert S.sexpr(q) == (
        "(Or (And (Parent (Id '#parent'))"
        "(AttributeWithValueContaining '[class*=child]'))"
        "(And (Class '.nested')(Parent (Class '.some-other-selector'))))")
    assert len(doc.select(q)) == 3


def test_blank_text_nodes_are_considered_empty():
    doc = KP.parse("<li id=1>\n </li><li id=2></li><li id=3> </li>"
                   "<li id=4>One</li><li id=5><span></li>")
    assert ids(doc.select("li:empty")) == ["1", "2", "3"]
    assert ids(doc.select("li:not(:empty)")) == ["4", "5"]


def test_selector_exception_message():
    err = S.SelectorParseError("%&")
    assert str(err) == "%&"


def test_evaluator_memos_are_reset():
    # pre-parsed evaluator reused across documents must not leak memos
    ev = S.QueryParser("p ~ p").parse()
    doc1 = KP.parse("<p>One<p>Two<p>Three")
    doc2 = KP.parse("<p>One2<p>Two2<p>Three2")
    s1 = S.select(ev, doc1)
    assert len(s1) == 2 and s1[0].text() == "Two"
    s2 = S.select(ev, doc2)
    assert len(s2) == 2 and s2[0].text() == "Two2"
