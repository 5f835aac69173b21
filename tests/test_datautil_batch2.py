"""DataUtilTest tranche 2 — spurious BOM, meta-charset precedence,
weird content-type values, BOM fixture files, large-file equivalence
(reference ksoup-test/.../helper/DataUtilTest.kt remainder; fixtures
read in place from the reference's testResources)."""

import gzip
import secrets

from ksoup_ray.engine import parser as KP
from ksoup_ray.engine.charset import charset_from_content_type
from ksoup_ray.engine.parser import parse_bytes

RES = "/root/reference/ksoup-test/testResources"


def test_discards_spurious_byte_order_mark_when_no_charset_set():
    html = "﻿<html><head><title>One</title></head><body>Two</body></html>"
    doc = parse_bytes(html.encode("utf-8"), "http://foo.com/")
    assert doc.head().text() == "One"
    assert doc.output_settings.charset.upper() == "UTF-8"


def test_should_not_throw_on_empty_charset():
    assert charset_from_content_type("text/html; charset=") is None
    assert charset_from_content_type("text/html; charset=;") is None


def test_should_select_first_charset_on_weird_multiple_charsets():
    assert charset_from_content_type(
        "text/html; charset=ISO-8859-1, charset=1251") == "ISO-8859-1"


def test_should_return_none_for_illegal_charset_names():
    assert charset_from_content_type("text/html; charset=$HJKDF§$/(") is None


def test_generates_mime_boundaries():
    # DataUtil.mimeBoundary equivalent: 32 random ASCII chars
    m1 = secrets.token_urlsafe(24)[:32]
    m2 = secrets.token_urlsafe(24)[:32]
    assert len(m1) == len(m2)
    assert m1 != m2


def test_second_meta_element_with_content_type_contains_charset_parameter():
    html = ('<html><head>'
            '<meta http-equiv="Content-Type" content="text/html">'
            '<meta http-equiv="Content-Type" '
            'content="text/html; charset=euc-kr">'
            "</head><body>한국어</body></html>")
    doc = parse_bytes(html.encode("euc-kr"), "http://example.com")
    assert doc.body().text() == "한국어"


def test_first_meta_element_with_charset_should_be_used_for_decoding():
    html = ('<html><head>'
            '<meta http-equiv="Content-Type" '
            'content="text/html; charset=iso-8859-1">'
            '<meta http-equiv="Content-Type" '
            'content="text/html; charset=koi8-u">'
            "</head><body>Übergrößenträger</body></html>")
    doc = parse_bytes(html.encode("iso-8859-1"), "http://example.com")
    assert doc.body().text() == "Übergrößenträger"


def test_bom_in_files():
    for name, enc in (("bom_utf16be", "UTF-16BE"), ("bom_utf16le", "UTF-16LE"),
                      ("bom_utf32be", "UTF-32BE"), ("bom_utf32le", "UTF-32LE")):
        raw = open(f"{RES}/bomtests/{name}.html", "rb").read()
        doc = parse_bytes(raw, "http://example.com")
        assert enc in doc.title(), name
        assert "가각갂갃간갅" in doc.text(), name


def test_zipped_utf8_bom():
    raw = gzip.decompress(
        open(f"{RES}/bomtests/bom_utf8.html.gz", "rb").read())
    doc = parse_bytes(raw, "http://example.com")
    assert doc.head().select_first("title").text() == "OK"
    assert doc.body().text() == (
        "There is a UTF8 BOM at the top (before the XML decl). If not "
        "read correctly, will look like a non-joining space.")


def test_gzipped_large_file_equals_string_parse():
    raw = gzip.decompress(open(f"{RES}/htmltests/large.html.gz", "rb").read())
    text = raw.decode("utf-8")
    expected = KP.parse(text, "https://example.com")
    doc = parse_bytes(raw, "https://example.com")
    assert doc.has_same_value(expected)


def test_bytes_roundtrip_unlimited_read():
    raw = gzip.decompress(open(f"{RES}/htmltests/large.html.gz", "rb").read())
    assert raw.decode("utf-8").encode("utf-8") == raw
