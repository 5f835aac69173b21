"""TokenQueueTest tranche — translated from reference
ksoup-test/.../parser/TokenQueueTest.kt."""

import re

import pytest

from ksoup_ray.engine import parser as KP
from ksoup_ray.engine.select import SelectorParseError, TokenQueue


def test_chomp_balanced():
    tq = TokenQueue(":contains(one (two) three) four")
    pre = tq.consume_to("(")
    guts = tq.chomp_balanced("(", ")")
    remainder = tq.remainder()
    assert pre == ":contains"
    assert guts == "one (two) three"
    assert remainder == " four"


def test_chomp_escaped_balanced():
    tq = TokenQueue(":contains(one (two) \\( \\) \\) three) four")
    pre = tq.consume_to("(")
    guts = tq.chomp_balanced("(", ")")
    remainder = tq.remainder()
    assert pre == ":contains"
    assert guts == "one (two) \\( \\) \\) three"
    assert TokenQueue.unescape(guts) == "one (two) ( ) ) three"
    assert remainder == " four"


def test_chomp_balanced_matches_as_much_as_possible():
    tq = TokenQueue("unbalanced(something(or another)) else")
    tq.consume_to("(")
    match = tq.chomp_balanced("(", ")")
    assert match == "something(or another)"


def test_unescape():
    assert TokenQueue.unescape("one \\( \\) \\\\") == "one ( ) \\"


def test_unescape_2():
    assert TokenQueue.unescape("\\\\\\&") == "\\&"


def test_escape_css_identifier():
    assert TokenQueue.escape_css_identifier("one#two.three/four\\five") == \
        "one\\#two\\.three\\/four\\\\five"


def test_chomp_to_ignore_case():
    t = "<textarea>one < two </TEXTarea>"
    tq = TokenQueue(t)
    data = tq.chomp_to_ignore_case("</textarea")
    assert data == "<textarea>one < two "
    tq = TokenQueue("<textarea> one two < three </oops>")
    data = tq.chomp_to_ignore_case("</textarea")
    assert data == "<textarea> one two < three </oops>"


def test_add_first():
    tq = TokenQueue("One Two")
    tq.consume_word()
    tq.add_first("Three")
    assert tq.remainder() == "Three Two"


def test_consume_to_ignore_second_call():
    t = "<textarea>one < two </TEXTarea> third </TEXTarea>"
    tq = TokenQueue(t)
    data = tq.chomp_to_ignore_case("</textarea>")
    assert data == "<textarea>one < two "
    data = tq.chomp_to_ignore_case("</textarea>")
    assert data == " third "


def _validate_nested_quotes(html, selector):
    els = KP.parse(html).select(selector)
    assert els and els[0].css_selector() == "#identifier"


def test_nested_quotes():
    _validate_nested_quotes(
        '<html><body><a id="identifier" onclick="func(\'arg\')" />'
        "</body></html>",
        "a[onclick*=\"('arg\"]")
    _validate_nested_quotes(
        '<html><body><a id="identifier" onclick=func(\'arg\') />'
        "</body></html>",
        "a[onclick*=\"('arg\"]")
    _validate_nested_quotes(
        "<html><body><a id=\"identifier\" onclick='func(\"arg\")' />"
        "</body></html>",
        "a[onclick*='(\"arg']")
    _validate_nested_quotes(
        '<html><body><a id="identifier" onclick=func("arg") />'
        "</body></html>",
        "a[onclick*='(\"arg']")


def test_chomp_balanced_error_on_mismatched_marker():
    tq = TokenQueue("unbalanced(something(or another)) else")
    tq.consume_to("(")
    with pytest.raises(SelectorParseError) as e:
        tq.chomp_balanced("(", "+")
    assert "Did not find balanced marker at " \
           "'something(or another)) else'" in str(e.value)


def test_quoted_pattern():
    doc = KP.parse("<div>\\) foo1</div><div>( foo2</div><div>1) foo3</div>")
    assert doc.select("div:matches(" + re.escape("\\)") + ")")[0] \
        .child_nodes()[0].outer_html() == "\n\\) foo1"
    assert doc.select("div:matches(" + re.escape("(") + ")")[0] \
        .child_nodes()[0].outer_html() == "\n( foo2"
    assert doc.select("div:matches(" + re.escape("1)") + ")")[0] \
        .child_nodes()[0].outer_html() == "\n1) foo3"


def test_consume_escaped_tag():
    q = TokenQueue("p\\\\p p\\.p p\\:p p\\!p")
    assert q.consume_element_selector() == "p\\p"
    assert q.consume_whitespace()
    assert q.consume_element_selector() == "p.p"
    assert q.consume_whitespace()
    assert q.consume_element_selector() == "p:p"
    assert q.consume_whitespace()
    assert q.consume_element_selector() == "p!p"
    assert q.is_empty()


def test_consume_escaped_id():
    q = TokenQueue("i\\.d i\\\\d")
    assert q.consume_css_identifier() == "i.d"
    assert q.consume_whitespace()
    assert q.consume_css_identifier() == "i\\d"
    assert q.is_empty()
