"""ParseTest (integration) tranche 2 — html5 meta charset files, broken
charset quote, xwiki large-page fixtures (reference
ksoup-test/.../integration/ParseTest.kt remainder; fixtures read in
place from the reference's testResources)."""

import gzip

from ksoup_ray.engine import parser as KP
from ksoup_ray.engine.parser import parse_bytes

RES = "/root/reference/ksoup-test/testResources"


def test_html5_charset():
    # <meta charset="gb2312"> drives the decode
    raw = open(f"{RES}/htmltests/meta-charset-1.html", "rb").read()
    doc = parse_bytes(raw, "http://example.com/")
    assert doc.output_settings.charset.upper() in ("GBK", "GB2312")
    assert doc.text() == "新"
    # no charset anywhere: falls back to utf8, which mis-decodes
    raw = open(f"{RES}/htmltests/meta-charset-2.html", "rb").read()
    doc = parse_bytes(raw, "http://example.com")
    assert doc.output_settings.charset.upper() == "UTF-8"
    assert doc.text() != "新"
    # utf8 content, no charset: fallback is correct
    raw = open(f"{RES}/htmltests/meta-charset-3.html", "rb").read()
    doc = parse_bytes(raw, "http://example.com/")
    assert doc.output_settings.charset.upper() == "UTF-8"
    assert doc.text() == "新"


def test_broken_html5_charset_with_a_single_double_quote():
    raw = ('<html>\n<head><meta charset=UTF-8"></head>\n<body></body>\n'
           "</html>").encode()
    doc = parse_bytes(raw, "http://example.com/")
    assert doc.output_settings.charset.upper() == "UTF-8"


def test_xwiki_expanded():
    # huge illegal character reference: parse tree must stay correct and
    # the reference must NOT be treated as a valid entity
    raw = gzip.decompress(
        open(f"{RES}/htmltests/xwiki-edit.html.gz", "rb").read())
    doc = parse_bytes(raw, "https://localhost/", charset="UTF-8",
                      track_errors=True)
    assert doc.select("#xwikiplatformversion")[0].text() == \
        "XWiki Jetty HSQLDB 12.1-SNAPSHOT"
    assert len(doc.error_list) == 0
    want = ('<a class="list-group-item" data-id="userdirectory" '
            'href="/xwiki/bin/admin/XWiki/XWikiPreferences?editor='
            "globaladmin&amp;RIGHTHERERIGHTHERERIGHTHERERIGHTHERE")
    assert doc.select("[data-id=userdirectory]")[0] \
        .outer_html().startswith(want)


def test_wiki_expanded_from_string():
    html = gzip.decompress(
        open(f"{RES}/htmltests/xwiki-edit.html.gz", "rb").read()).decode()
    doc = KP.parse(html)
    assert doc.select("#xwikiplatformversion")[0].text() == \
        "XWiki Jetty HSQLDB 12.1-SNAPSHOT"
    want = ('<a class="list-group-item" data-id="userdirectory" '
            'href="/xwiki/bin/admin/XWiki/XWikiPreferences?editor='
            "globaladmin&amp;RIGHTHERERIGHTHERERIGHTHERERIGHTHERE")
    assert doc.select("[data-id=userdirectory]")[0] \
        .outer_html().startswith(want)


def test_wiki_from_string():
    html = gzip.decompress(
        open(f"{RES}/htmltests/xwiki-1324.html.gz", "rb").read()).decode()
    doc = KP.parse(html)
    assert doc.select("#xwikiplatformversion")[0].text() == \
        "XWiki Jetty HSQLDB 12.1-SNAPSHOT"
    want = ('<a class="list-group-item" data-id="userdirectory" '
            'href="/xwiki/bin/admin/XWiki/XWikiPreferences?editor='
            'globaladmin&amp;section=userdirectory" '
            'title="Customize the user directory live table.">'
            "User Directory</a>")
    assert doc.select("[data-id=userdirectory]")[0].outer_html() == want


def test_file_parse_no_charset_method():
    raw = gzip.decompress(
        open(f"{RES}/htmltests/xwiki-1324.html.gz", "rb").read())
    doc = parse_bytes(raw)
    assert doc.select("#xwikiplatformversion")[0].text() == \
        "XWiki Jetty HSQLDB 12.1-SNAPSHOT"
