"""Misc small-file parity tranche — DocumentType blank ctors, large
unescape input, chompBalanced error, supplementary escapes, cloned
output settings, unclosed attribute query, StringUtil predicates,
node-stream count, metadata-from-string/bytes (reference
DocumentTypeTest / ParserTest / TokenQueueTest / EntitiesTest /
QueryParserTest / StringUtilTest / NodeStreamTest / MetadataTest)."""

import pytest

from ksoup_ray.engine import entities as E
from ksoup_ray.engine import parser as KP
from ksoup_ray.engine.dom import DocumentType, OutputSettings, _padding
from ksoup_ray.engine.parser import parse_metadata, unescape_entities
from ksoup_ray.engine.select import (QueryParser, SelectorParseError,
                                     TokenQueue)


def test_document_type_ok_with_blank_name():
    DocumentType("", "", "")


def test_document_type_ok_with_blank_public_and_system_ids():
    DocumentType("html", "", "")


def test_unescape_entities_handles_large_input():
    body_parts = []
    n = 0
    while n < 64 * 1024:
        body_parts.append("SomeNonEncodedInput")
        n += len("SomeNonEncodedInput")
    body = "".join(body_parts)
    assert unescape_entities(body, False) == body


def test_chomp_balanced_throws():
    tq = TokenQueue("unbalanced(something(or another)) else")
    tq.consume_to("(")
    with pytest.raises(ValueError, match=(
            r"Did not find balanced marker at "
            r"'something\(or another\)\) else'")):
        tq.chomp_balanced("(", "+")


def test_escaped_supplementary():
    text = "\U0001d559"
    out = OutputSettings()
    out.charset = "ISO-8859-1"
    out.escape_mode = E.ESCAPE_BASE
    assert E.escape(text, out.escape_mode, "html", out.charset) == \
        "&#x1d559;"
    out.escape_mode = E.ESCAPE_EXTENDED
    assert E.escape(text, out.escape_mode, "html", out.charset) == "&hopf;"
    assert E.escape(text, E.ESCAPE_EXTENDED, "html", "UTF-8") == text


def test_escape_by_cloned_output_settings():
    out = OutputSettings()
    text = "Hello &<> Å å π 新 there ¾ © »"
    c1, c2 = out.clone(), out.clone()
    e1 = E.escape(text, c1.escape_mode, c1.syntax, c1.charset)
    e2 = E.escape(text, c2.escape_mode, c2.syntax, c2.charset)
    assert e1 == e2


def test_exception_on_unclosed_attribute():
    with pytest.raises(SelectorParseError):
        QueryParser('section > a[href="]').parse()


def test_padding_in_a_can():
    # _padding memoizes widths 0..max; equivalent of StringUtil.padding
    for i in range(21):
        assert len(_padding(i, 30)) == i
    # max-width clamp
    assert len(_padding(45, 30)) == 30


def test_is_numeric():
    def is_numeric(s):
        return bool(s) and all("0" <= c <= "9" for c in s)
    assert not is_numeric("")
    assert not is_numeric(" ")
    assert not is_numeric("123 546")
    assert not is_numeric("hello")
    assert not is_numeric("123.334")
    assert is_numeric("1")
    assert is_numeric("1234")


def test_is_whitespace():
    from ksoup_ray.engine.dom import normalise_whitespace
    # spec whitespace collapses; nbsp is "actually whitespace" and is
    # normalised too; other unicode spaces are preserved (StringUtil
    # isActuallyWhitespace includes U+00A0, excludes U+2000/U+3000)
    assert normalise_whitespace("a\t\n\r\f b") == "a b"
    assert normalise_whitespace("a\u00a0b") == "a b"
    assert normalise_whitespace("a\u2000b") == "a\u2000b"
    assert normalise_whitespace("a\u3000b") == "a\u3000b"


def test_is_ascii():
    def is_ascii(s):
        return all(ord(c) < 128 for c in s)
    assert is_ascii("")
    assert is_ascii("example.com")
    assert is_ascii("One Two")
    assert not is_ascii("🧔")
    assert not is_ascii("测试")
    assert not is_ascii("测试.com")


def test_can_stream_count():
    doc = KP.parse("<div id=1><p>One<p>Two</div><div id=2><p>Three<p>Four"
                   "</div>")
    assert sum(1 for _ in doc.node_stream()) == 14


META_HTML = """\
<html>
    <head>
        <title>Test Page</title>
        <meta property="og:title" content="Test OG Title">
        <link rel="canonical" href="https://example.com">
    </head>
</html>
"""


def test_parse_metadata_from_string():
    doc = KP.parse(META_HTML, "https://example.com")
    md = parse_metadata(doc)
    assert md["html_title"] == "Test Page"
    assert md["og_title"] == "Test OG Title"
    assert md["canonical"] == "https://example.com"


def test_parse_metadata_from_bytes():
    doc = KP.parse_bytes(META_HTML.encode(), "https://example.com")
    md = parse_metadata(doc)
    assert md["html_title"] == "Test Page"
    assert md["og_title"] == "Test OG Title"
    assert md["canonical"] == "https://example.com"
