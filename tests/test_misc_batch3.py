"""Final stray parity cases — doctype whitespace, th reinsertion,
H2O clean, gzip fixtures (GithubIssue19/20), custom Safelist subclass
(reference HtmlParserTest / GzipTest / issues / SafelistExtensionTest)."""

import base64
import gzip

from ksoup_ray.engine import parser as KP
from ksoup_ray.engine.safety import Safelist

RES = "/root/reference/ksoup-test/testResources"


def test_handles_whitespace_in_doctype():
    html = ('<!DOCTYPE html\n      PUBLIC "-//W3C//DTD XHTML 1.0 '
            'Transitional//EN"\n      '
            '"http://www.w3.org/TR/xhtml1/DTD/xhtml1-transitional.dtd">')
    doc = KP.parse(html)
    assert doc.child_nodes()[0].outer_html() == (
        '<!DOCTYPE html PUBLIC "-//W3C//DTD XHTML 1.0 Transitional//EN" '
        '"http://www.w3.org/TR/xhtml1/DTD/xhtml1-transitional.dtd">')


def test_reinsertion_mode_for_th_cells():
    body = ("<body> <table> <tr> <th> <table><tr><td></td></tr></table> "
            "<div> <table><tr><td></td></tr></table> </div> <div></div> "
            "<div></div> <div></div> </th> </tr> </table> </body>")
    doc = KP.parse(body)
    assert len(doc.body().children()) == 1


def test_h2o():
    html = "H<sub>2</sub>O"
    assert KP.clean(html, Safelist.basic()) == "H<sub>2</sub>O"
    assert KP.parse(html).text() == "H2O"


def test_read_gzip_fixture():
    raw = gzip.decompress(
        open(f"{RES}/htmltests/large.html.gz", "rb").read())
    assert raw.lstrip().lower().startswith(b"<html>")


def test_issue19_attribute_mix_charset():
    header = "data:image/png;base64,"
    raw = gzip.decompress(
        open(f"{RES}/htmltests/issue19.html.gz", "rb").read())
    doc = KP.parse_bytes(raw, "http://example.com")
    checked = 0
    for img in doc.select("img"):
        attr = img.attr("src")
        if not attr.startswith(header):
            continue
        src = attr[len(header):]
        assert len(src) % 4 == 0, "Base64 length not a multiple of 4"
        assert base64.b64decode(src)
        checked += 1
    assert checked > 0


def test_issue20_duplicate_elements():
    raw = gzip.decompress(
        open(f"{RES}/htmltests/issue20.html.gz", "rb").read())
    doc = KP.parse(raw.decode("utf-8", errors="replace"))
    element = doc.body().select("div[class=firs l]")[0]
    titles = element.select("div[class=dtit]")
    contents = element.select("div[class=img]")
    assert len(titles) == 6
    assert len(contents) == 6


class OpenSafelist(Safelist):
    """Passes tags and attributes starting with "open" (reference
    SafelistExtensionTest custom subclass)."""

    def is_safe_tag(self, tag):
        if tag.startswith("open"):
            return True
        return super().is_safe_tag(tag)

    def is_safe_attribute(self, tag_name, el, key, value):
        if key.startswith("open"):
            return True
        return super().is_safe_attribute(tag_name, el, key, value)


def _strip(s):
    return "".join(line.lstrip(" ") for line in s.split("\n"))


def test_can_customize_safe_tests():
    open_safelist = OpenSafelist(Safelist.relaxed())
    safelist = Safelist.relaxed()
    html = "<p><opentag openattr>Hello</opentag></p>"
    open_clean = KP.clean(html, open_safelist)
    clean = KP.clean(html, safelist)
    assert _strip(open_clean) == '<p><opentag openattr="">Hello</opentag></p>'
    assert clean == "<p>Hello</p>"
