"""Property-based invariants (hypothesis) — complements the translated
reference goldens with randomized coverage:

* serialization fixed point: parse∘serialize is idempotent after one
  round (with pretty-print off);
* StreamParser.complete() builds the identical DOM to parse();
* Element.cssSelector() round-trips to exactly that element;
* fragment parse + re-serialize is stable;
* CharacterReader consumes the exact input sequence.
"""

from hypothesis import assume, given, settings, strategies as st

from ksoup_ray.engine import parser as KP
from ksoup_ray.engine.charreader import EOF, CharacterReader
from ksoup_ray.engine.streamparser import StreamParser

# HTML-ish soup alphabet: tag chars, specials, whitespace, entities
_soup = st.text(
    alphabet=("abcdefghijklmnop <>&\"'=/!-;#" "\t\n"),
    min_size=0, max_size=120)

_tags = st.sampled_from(
    ["div", "p", "span", "b", "i", "table", "td", "li", "a", "h1",
     "section", "pre", "script", "style", "title", "svg", "template"])


@st.composite
def _html_docs(draw):
    """Generate small structurally-interesting documents."""
    n = draw(st.integers(1, 8))
    parts = []
    for _ in range(n):
        kind = draw(st.integers(0, 3))
        if kind == 0:
            parts.append(draw(_soup))
        elif kind == 1:
            t = draw(_tags)
            parts.append(f"<{t}>")
        elif kind == 2:
            t = draw(_tags)
            parts.append(f"</{t}>")
        else:
            t = draw(_tags)
            attr = draw(st.sampled_from(
                ["", " id=x", ' class="a b"', " data-k='v'", " checked"]))
            parts.append(f"<{t}{attr}>{draw(_soup)}</{t}>")
    return "".join(parts)


def _flat(doc):
    doc.output_settings.pretty_print = False
    return doc.outer_html()


@settings(max_examples=150, deadline=None)
@given(_html_docs())
def test_serialization_fixed_point(html):
    # fixed point from the SECOND round: the reference's
    # CommentStartDash drops a leading dash (TokeniserState.kt:1069-
    # 1097, matched here), so round one can still normalize
    once = _flat(KP.parse(html))
    twice = _flat(KP.parse(once))
    thrice = _flat(KP.parse(twice))
    assert thrice == twice


@settings(max_examples=100, deadline=None)
@given(_html_docs())
def test_stream_parser_complete_equals_parse(html):
    direct = _flat(KP.parse(html))
    streamed = _flat(StreamParser().parse(html, "").complete())
    assert streamed == direct


@settings(max_examples=100, deadline=None)
@given(_html_docs())
def test_xml_serialization_fixed_point(xml):
    once = _flat(KP.parse_xml(xml))
    twice = _flat(KP.parse_xml(once))
    assert _flat(KP.parse_xml(twice)) == twice


@settings(max_examples=75, deadline=None)
@given(_html_docs())
def test_css_selector_roundtrip(html):
    doc = KP.parse(html)
    # body can be absent (EOF trapped in nested templates — reference
    # deviation, HtmlTreeBuilderState.kt:69)
    body = doc.select_first("body")
    assume(body is not None)
    for el in list(body.stream())[:20]:
        sel = el.css_selector()
        found = doc.select(sel)
        assert len(found) == 1 and found[0] is el, sel


@settings(max_examples=100, deadline=None)
@given(st.text(max_size=200))
def test_character_reader_consumes_exact_sequence(s):
    r = CharacterReader(s)
    out = []
    while not r.is_empty():
        out.append(r.consume())
    assert "".join(out) == s
    assert r.consume() == EOF


@settings(max_examples=100, deadline=None)
@given(_html_docs())
def test_fragment_parse_is_stable(html):
    def rt(h):
        d = KP.parse_body_fragment(h, "")
        d.output_settings.pretty_print = False
        return d.body().html()
    once = rt(html)
    twice = rt(once)
    assert rt(twice) == twice  # see comment-dash note above


def test_foster_parent_to_root_known_non_idempotent():
    """Foster parenting with no <table> on the stack inserts into the
    stack ROOT (reference HtmlTreeBuilder insertInFosterParent
    fallback) — producing <h2> as a direct <html> child, which
    re-parses into body. Inherently non-idempotent in the reference
    too; pinned here as documentation, with the 2nd round stable."""
    h = "<template<tbody<p<h2>"
    doc = KP.parse(h)
    doc.output_settings.pretty_print = False
    once = doc.outer_html()
    assert once == ("<html><head><template><tbody><h2></h2></tbody>"
                    "</template></head><p></p></html>")
    twice = _flat(KP.parse(once))
    thrice = _flat(KP.parse(twice))
    # converges at round three (h2 first escapes the template's table
    # mode via foster fallback, then settles into body)
    assert _flat(KP.parse(thrice)) == thrice


@settings(max_examples=150, deadline=None)
@given(_html_docs())
def test_text_fast_path_equals_exact_walk(html):
    """Element.text()'s single-collapse fast path must equal the exact
    reference-algorithm walk (the built-in fallback) on every document."""
    doc = KP.parse(html)
    # Document.text() is body-only by definition (Document.kt), so
    # compare per element, not the #root (stream() yields self first)
    from ksoup_ray.engine.dom import Document
    for el in list(doc.stream())[:15]:
        if isinstance(el, Document):
            continue
        assert el.text() == el._text_exact(), el.tag_name()


@settings(max_examples=200, deadline=None)
@given(st.text(min_size=0, max_size=80))
def test_entities_escape_unescape_roundtrip(s):
    """unescape(escape(x)) == x for every escape mode under UTF-8
    (escaping is injective on the char level; surrogate halves are not
    valid input)."""
    from ksoup_ray.engine import entities as E
    assume(not any(0xD800 <= ord(c) <= 0xDFFF for c in s))
    for mode in (E.ESCAPE_XHTML, E.ESCAPE_BASE, E.ESCAPE_EXTENDED):
        esc = E.escape(s, mode, "html", "UTF-8")
        assert E.unescape(esc) == s, (mode, esc)


@settings(max_examples=100, deadline=None)
@given(_html_docs())
def test_cleaner_output_only_safelisted_tags(html):
    """The safety contract that IS invariant: every element in the
    cleaned output's body is safelisted. (Stronger claims fail for
    structural reasons shared with the reference: string idempotence
    converges over rounds as adjacent text nodes merge, and
    isValid(clean(x)) breaks when copied text re-parses with foster
    parenting, e.g. bare text inside <table>.)"""
    from ksoup_ray.engine import parser as P2
    from ksoup_ray.engine.parser import clean
    from ksoup_ray.engine.safety import Safelist
    for preset in (Safelist.none, Safelist.simple_text, Safelist.basic,
                   Safelist.basic_with_images, Safelist.relaxed):
        sl = preset()
        out = clean(html, sl)
        body = P2.parse(out).body()
        for el in body.stream():
            if el is body:
                continue
            assert sl.is_safe_tag(el.normal_name()),                 (preset.__name__, el.normal_name(), out)
