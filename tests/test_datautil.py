"""DataUtilTest tranche — translated from reference
ksoup-test/.../helper/DataUtilTest.kt. File/gzip loading maps to our
byte-level decode pipeline (SURVEY §2.1: per-file gzip is replaced by
the Parquet codec at scale; here gunzip happens in the test to drive
the same decode + parse goldens). Reference fixtures are read in place."""

import gzip

from ksoup_ray.engine import parser as KP
from ksoup_ray.engine.charset import charset_from_content_type, decode_html
from ksoup_ray.engine.elements import Elements
from ksoup_ray.engine.parser import parse_bytes

RES = "/root/reference/ksoup-test/testResources"


def test_charset_from_content_type():
    assert charset_from_content_type("text/html;charset=utf-8 ") == "utf-8"
    assert charset_from_content_type("text/html; charset=UTF-8") == "UTF-8"
    assert charset_from_content_type(
        "text/html; charset=ISO-8859-1") == "ISO-8859-1"
    assert charset_from_content_type("text/html") is None
    assert charset_from_content_type(None) is None
    assert charset_from_content_type("text/html;charset=Unknown") is None


def test_quoted_charset():
    assert charset_from_content_type(
        'text/html; charset="utf-8"') == "utf-8"
    assert charset_from_content_type(
        'text/html;charset="UTF-8"') == "UTF-8"
    assert charset_from_content_type(
        'text/html; charset="ISO-8859-1"') == "ISO-8859-1"
    assert charset_from_content_type(
        'text/html; charset="Unsupported"') is None
    assert charset_from_content_type(
        "text/html; charset='UTF-8'") == "UTF-8"


def test_should_not_throw_on_empty_charset():
    assert charset_from_content_type("text/html; charset=") is None
    assert charset_from_content_type("text/html; charset=;") is None


def test_should_select_first_charset_on_weird_multiple_charsets():
    assert charset_from_content_type(
        "text/html; charset=ISO-8859-1, charset=1251") == "ISO-8859-1"


def test_should_correct_charset_for_duplicate_charset_string():
    assert charset_from_content_type(
        "text/html; charset=charset=iso-8859-1") == "iso-8859-1"


def test_should_return_none_for_illegal_charset_names():
    assert charset_from_content_type("text/html; charset=$HJKDF§$/(") is None


def test_discards_spurious_byte_order_mark():
    html = "﻿<html><head><title>One</title></head><body>Two</body></html>"
    doc = parse_bytes(html.encode("utf-8"), "http://foo.com/",
                      charset="UTF-8")
    assert doc.head().text() == "One"


def test_discards_spurious_bom_when_no_charset_set():
    html = "﻿<html><head><title>One</title></head><body>Two</body></html>"
    doc = parse_bytes(html.encode("utf-8"), "http://foo.com/")
    assert doc.head().text() == "One"
    assert doc.output_settings.charset.upper().replace("UTF8", "UTF-8") \
        in ("UTF-8", "UTF-8-SIG")


def test_wrong_meta_charset_fallback():
    html = "<html><head><meta charset=iso-8></head><body></body></html>"
    doc = parse_bytes(html.encode("utf-8"), "http://example.com")
    assert doc.outer_html() == ("<html>\n"
                                " <head>\n"
                                '  <meta charset="iso-8">\n'
                                " </head>\n"
                                " <body></body>\n"
                                "</html>")


def test_second_meta_element_with_content_type_contains_charset():
    html = ("<html><head>"
            '<meta http-equiv="Content-Type" content="text/html">'
            '<meta http-equiv="Content-Type" '
            'content="text/html; charset=euc-kr">'
            "</head><body>한국어</body></html>")
    doc = parse_bytes(html.encode("euc-kr"), "http://example.com")
    assert doc.body().text() == "한국어"


def test_first_meta_element_with_charset_used_for_decoding():
    html = ("<html><head>"
            '<meta http-equiv="Content-Type" '
            'content="text/html; charset=iso-8859-1">'
            '<meta http-equiv="Content-Type" '
            'content="text/html; charset=koi8-u">'
            "</head><body>Übergrößenträger</body></html>")
    doc = parse_bytes(html.encode("iso-8859-1"), "http://example.com")
    assert doc.body().text() == "Übergrößenträger"


def test_supports_bom_in_files():
    for name, label in (("bom_utf16be.html", "UTF-16BE"),
                        ("bom_utf16le.html", "UTF-16LE"),
                        ("bom_utf32be.html", "UTF-32BE"),
                        ("bom_utf32le.html", "UTF-32LE")):
        raw = open(f"{RES}/bomtests/{name}", "rb").read()
        doc = parse_bytes(raw, "http://example.com")
        assert label in doc.title(), name
        assert "가각갂갃간갅" in doc.text(), name


def test_supports_utf8_bom():
    raw = open(f"{RES}/bomtests/bom_utf8.html", "rb").read()
    doc = parse_bytes(raw, "http://example.com")
    assert Elements(doc.head().select("title")).text() == "OK"


def test_no_extra_null_bytes():
    b = ('<html><head><meta charset="UTF-8"></head><body>'
         "<div><u>ü</u>ü</div></body></html>").encode("utf-8")
    doc = parse_bytes(b)
    assert "\x00" not in doc.outer_html()


def test_supports_zipped_utf8_bom():
    raw = gzip.decompress(
        open(f"{RES}/bomtests/bom_utf8.html.gz", "rb").read())
    doc = parse_bytes(raw, "http://example.com")
    assert Elements(doc.head().select("title")).text() == "OK"
    assert doc.body().text() == (
        "There is a UTF8 BOM at the top (before the XML decl). If not "
        "read correctly, will look like a non-joining space.")


def test_supports_xml_charset_declaration():
    encoding = "iso-8859-1"
    soup = ('<?xml version="1.0" encoding="iso-8859-1"?>'
            '<!DOCTYPE html PUBLIC "-//W3C//DTD XHTML 1.0 Strict//EN" '
            '"http://www.w3.org/TR/xhtml1/DTD/xhtml1-strict.dtd">'
            '<html xmlns="http://www.w3.org/1999/xhtml" lang="en" '
            'xml:lang="en">Hellö Wörld!</html>').encode(encoding)
    doc = parse_bytes(soup)
    assert doc.body().text() == "Hellö Wörld!"


def test_loads_gzip_file():
    raw = gzip.decompress(
        open(f"{RES}/htmltests/gzip.html.gz", "rb").read())
    doc = parse_bytes(raw)
    assert doc.title() == "Gzip test"
    assert doc.select_first("p").text() == "This is a gzipped HTML file."


def test_loads_z_gzip_file():
    raw = gzip.decompress(
        open(f"{RES}/htmltests/gzip.html.z", "rb").read())
    doc = parse_bytes(raw)
    assert doc.title() == "Gzip test"
    assert doc.select_first("p").text() == "This is a gzipped HTML file."


def test_handles_fake_gzip_file():
    # .gz extension but plain content: sniff the magic, fall back to raw
    raw = open(f"{RES}/htmltests/fake-gzip.html.gz", "rb").read()
    if raw[:2] == b"\x1f\x8b":
        raw = gzip.decompress(raw)
    doc = parse_bytes(raw)
    assert doc.title() == "This is not gzipped"
    assert doc.select_first("p").text() == "And should still be readable."


def test_string_vs_bytes_parse():
    raw = gzip.decompress(
        open(f"{RES}/htmltests/large.html.gz", "rb").read())
    text, _ = decode_html(raw)
    expected = KP.parse(text, "https://example.com")
    doc = parse_bytes(raw, "https://example.com")
    assert doc.has_same_value(expected)
