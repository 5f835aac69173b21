"""Differential tests for the bulk paragraph-run fast path
(treebuilder._fast_p_run): every input must parse to the identical DOM
(outer_html + text + text-node spans) with the fast path enabled and
disabled — the fast path is a pure optimization, never a semantic
change."""

import pytest

from ksoup_ray.engine import parser as KP
from ksoup_ray.engine import treebuilder as TB
from ksoup_ray.engine.dom import TextNode

CASES = [
    # plain runs (the case the fast path accelerates)
    "<p>one</p><p>two</p><p>three</p>",
    '<p class="a">one</p><p class="b c">two</p><p>three</p>',
    "<div><p>one</p><p>two</p></div><p>after</p>",
    # whitespace / blank bodies (frameset_ok semantics)
    "<p> </p><p>\t\n</p><p>x</p>",
    "<p>lead</p>   <p>gap</p>",
    # entity in text → must fall back mid-run
    "<p>a&amp;b</p><p>plain</p>",
    "<p>plain</p><p>a&nbsp;b</p><p>tail</p>",
    # nested markup inside p → fallback
    "<p>one <b>bold</b> two</p><p>plain</p>",
    "<p>one</p><p><span>x</span></p><p>two</p>",
    # end-tag variants
    "<p>one</p ><p>two</p\t>",
    "<p>one</p attr=x><p>two</p>",  # attrs on end tag: parse error path
    # open-tag variants the fast path must skip (then recover)
    "<p>one</p><p id=2>two</p><p>three</p>",
    "<p>one</p><P>upper</P><p>three</p>",
    '<p>one</p><p class=unquoted>two</p>',
    "<p>one</p><p class=\"e&amp;e\">two</p>",
    # unclosed / implied ends
    "<p>one<p>two<p>three",
    "<p>one</p><p>two",
    "<p></p><p>empty</p>",
    # p interacting with blocks / formatting elements
    "<b><p>bold-open</p><p>two</p></b>",
    "<p>one</p><b>x</b><p>two</p><p>three</p>",
    "<button><p>in-button</p><p>two</p></button>",
    "<table><tr><td><p>cell</p><p>two</p></td></tr></table>",
    # foster parenting region: fast path must not engage
    "<table><p>fostered</p><p>two</p><tr><td>x</td></tr></table>",
    # pre is not p
    "<pre>  keep  </pre><p>one</p><p>two</p>",
    # nulls and CRs → fallback
    "<p>a\x00b</p><p>two</p>",
    "<p>a\rb</p><p>two</p>",
    "<p>crlf\r\n</p><p>two</p>",
    # self-closing p (error-recovery path)
    "<p/>one<p>two</p>",
    # script/rcdata neighbors
    "<p>one</p><script>var x='</p>';</script><p>two</p>",
    "<p>one</p><title>t</title><p>two</p>",
]


def _spans(doc):
    out = []
    for n in doc.node_stream():
        if isinstance(n, TextNode):
            out.append((n.get_whole_text(), n.span))
    return out


def _parse_both(html):
    orig = TB._fast_p_run
    try:
        TB._fast_p_run = lambda tb: None
        ref = KP.parse(html)
    finally:
        TB._fast_p_run = orig
    fast = KP.parse(html)
    return ref, fast


def _attr_ranges(doc):
    out = []
    for el in doc.select("*"):
        attrs = el.attributes()
        if attrs is None:
            continue
        for k, _ in attrs:
            out.append((el.tag_name(), k, attrs.source_range(k)))
    return out


@pytest.mark.parametrize("html", CASES)
def test_fast_p_run_differential(html):
    ref, fast = _parse_both(html)
    assert fast.outer_html() == ref.outer_html()
    assert fast.text() == ref.text()
    assert _spans(fast) == _spans(ref)
    assert _attr_ranges(fast) == _attr_ranges(ref)
    assert fast.parse_errors == ref.parse_errors


def test_fast_p_run_attr_source_ranges():
    """The fast path must stamp attribute name/value source ranges
    identically to the generic path (round-3 advice item)."""
    html = '<p>a</p><p class="x">b</p><p class="yy zz">c</p>'
    ref, fast = _parse_both(html)
    assert _attr_ranges(fast) == _attr_ranges(ref)
    p2 = fast.select("p")[1]
    assert p2.attributes().source_range("class") == (11, 16, 18, 19)


def test_fast_p_run_random_soup():
    import random
    rng = random.Random(42)
    frags = ["<p>", "</p>", "<p class=\"x\">", "text ", "&amp;", "<b>",
             "</b>", "<div>", "</div>", " ", "<table>", "</table>",
             "<li>", "zz</p>", "<p", ">", "\x00", "&#65;"]
    for _ in range(200):
        html = "".join(rng.choice(frags) for _ in range(rng.randint(3, 40)))
        ref, fast = _parse_both(html)
        assert fast.outer_html() == ref.outer_html(), html
        assert _spans(fast) == _spans(ref), html


def test_fast_p_run_max_nodes_guard():
    html = "<p>x</p>" * 200
    ref, fast = _parse_both(html)
    assert fast.outer_html() == ref.outer_html()
    doc = KP.parse(html, max_nodes=50)
    assert doc.truncated
