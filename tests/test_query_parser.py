"""QueryParserTest tranche — translated from reference
ksoup-test/.../select/QueryParserTest.kt (parse-tree shape via
EvaluatorDebug.sexpr goldens + toString round-trips)."""

import pytest

from ksoup_ray.engine import parser as KP
from ksoup_ray.engine.elements import Elements
from ksoup_ray.engine.select import SelectorParseError, parse_query, sexpr


def test_consume_sub_query():
    doc = KP.parse(
        "<html><head>h</head><body>"
        "<li><strong>l1</strong></li>"
        "<a><li><strong>l2</strong></li></a>"
        "<p><strong>yes</strong></p>"
        "</body></html>")
    # selecting immediate from body
    assert Elements(doc.body().select(">p>strong,>li>strong")).text() == \
        "l1 yes"
    assert Elements(doc.select("body>p>strong,body>*>li>strong")).text() == \
        "l2 yes"
    assert Elements(doc.select("body>*>li>strong,body>p>strong")).text() == \
        "l2 yes"
    assert Elements(doc.select("body>p>strong,body>*>li>strong")).text() == \
        "l2 yes"


def test_immediate_parent_run():
    assert sexpr("div > p > bold.brass") == \
        "(ImmediateParentRun (Tag 'div')(Tag 'p')" \
        "(And (Tag 'bold')(Class '.brass')))"


def test_or_gets_correct_precedence():
    # "a b, c d, e f" evals to (a AND b) OR (c AND d) OR (e AND f)
    assert sexpr("a b, c d, e f") == (
        "(Or (And (Tag 'b')(Parent (Tag 'a')))"
        "(And (Tag 'd')(Parent (Tag 'c')))"
        "(And (Tag 'f')(Parent (Tag 'e'))))")


def test_parses_multi_correctly():
    assert sexpr(".foo.qux[attr=bar] > ol.bar, ol > li + li") == (
        "(Or (And (Tag 'li')(ImmediatePreviousSibling "
        "(ImmediateParentRun (Tag 'ol')(Tag 'li'))))"
        "(ImmediateParentRun (And (AttributeWithValue '[attr=bar]')"
        "(Class '.foo')(Class '.qux'))(And (Tag 'ol')(Class '.bar'))))")


def test_exception_on_unclosed_attribute():
    with pytest.raises(SelectorParseError):
        parse_query('section > a[href="]')


def test_parses_single_quote_in_contains():
    with pytest.raises(SelectorParseError):
        parse_query("p:contains(One \" One)")


def test_except_on_empty_selector():
    with pytest.raises(SelectorParseError):
        parse_query("")


def test_ok_on_spaces_fore_and_aft():
    parsed = parse_query(" span div  ")
    assert repr(parsed) == "span div"


def test_structural_evaluators_to_string():
    q = "a:not(:has(span.foo)) b d > e + f ~ g"
    parsed = parse_query(q)
    assert repr(parsed) == q
    assert sexpr(q) == (
        "(And (Tag 'g')(PreviousSibling (And (Tag 'f')"
        "(ImmediatePreviousSibling (ImmediateParentRun (And (Tag 'd')"
        "(Parent (And (Tag 'b')(Parent (And (Tag 'a')(Not (Has "
        "(And (Tag 'span')(Class '.foo')))))))))(Tag 'e'))))))")


def test_parses_or_after_attribute():
    assert sexpr("#parent [class*=child], .some-other-selector .nested") == (
        "(Or (And (Parent (Id '#parent'))"
        "(AttributeWithValueContaining '[class*=child]'))"
        "(And (Class '.nested')(Parent (Class '.some-other-selector'))))")
    assert sexpr("#parent [class*=child], .some-other-selector") == (
        "(Or (Class '.some-other-selector')(And (Parent (Id '#parent'))"
        "(AttributeWithValueContaining '[class*=child]')))")
    assert sexpr("#el[class*=child], .some-other-selector") == (
        "(Or (Class '.some-other-selector')(And (Id '#el')"
        "(AttributeWithValueContaining '[class*=child]')))")
    assert sexpr("#parent [class*=child], .some-other-selector .nested") == (
        "(Or (And (Parent (Id '#parent'))"
        "(AttributeWithValueContaining '[class*=child]'))"
        "(And (Class '.nested')(Parent (Class '.some-other-selector'))))")
