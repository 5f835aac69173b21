"""CleanerTest tranche — translated from reference
ksoup-test/.../safety/CleanerTest.kt (simpleBehaviourTest:20 through
handlesAllPseudoTag:300 and selected later cases)."""

from ksoup_ray.engine import parser as KP
from ksoup_ray.engine.safety import Cleaner, Safelist


def _strip(s: str) -> str:
    return "".join(line.lstrip(" ") for line in s.split("\n"))


def clean(h, sl=None, base=""):
    return KP.clean(h, sl, base)


def test_simple_behaviour():
    h = ("<div><p class=foo><a href='http://evil.com'>Hello "
         "<b id=bar>there</b>!</a></div>")
    assert _strip(clean(h, Safelist.simple_text())) == \
        "Hello <b>there</b>!"


def test_simple_behaviour_2():
    assert _strip(clean("Hello <b>there</b>!", Safelist.simple_text())) == \
        "Hello <b>there</b>!"


def test_basic_behaviour():
    h = ("<div><p><a href='javascript:sendAllMoney()'>Dodgy</a> "
         "<A HREF='http://nice.com'>Nice</a></p>"
         "<blockquote>Hello</blockquote>")
    assert _strip(clean(h, Safelist.basic())) == (
        '<p><a rel="nofollow">Dodgy</a> <a href="http://nice.com" '
        'rel="nofollow">Nice</a></p><blockquote>Hello</blockquote>')


def test_basic_with_images():
    h = ("<div><p><img src='http://example.com/' alt=Image></p>"
         "<p><img src='ftp://ftp.example.com'></p></div>")
    assert _strip(clean(h, Safelist.basic_with_images())) == \
        '<p><img src="http://example.com/" alt="Image"></p><p><img></p>'


def test_relaxed():
    h = "<h1>Head</h1><table><tr><td>One<td>Two</td></tr></table>"
    assert _strip(clean(h, Safelist.relaxed())) == (
        "<h1>Head</h1><table><tbody><tr><td>One</td><td>Two</td></tr>"
        "</tbody></table>")


def test_remove_tags():
    h = ("<div><p><A HREF='HTTP://nice.com'>Nice</a></p>"
         "<blockquote>Hello</blockquote>")
    assert _strip(clean(h, Safelist.basic().remove_tags("a"))) == \
        "<p>Nice</p><blockquote>Hello</blockquote>"


def test_remove_attributes():
    h = ("<div><p>Nice</p><blockquote cite='http://example.com/"
         "quotations'>Hello</blockquote>")
    assert _strip(clean(h, Safelist.basic()
                        .remove_attributes("blockquote", "cite"))) == \
        "<p>Nice</p><blockquote>Hello</blockquote>"


def test_all_attributes():
    h = ("<div class=foo data=true><p class=bar>Text</p></div>"
         "<blockquote cite='https://example.com'>Foo")
    sl = Safelist.relaxed()
    sl.add_attributes(":all", "class")
    sl.add_attributes("div", "data")
    assert _strip(clean(h, sl)) == (
        '<div class="foo" data="true"><p class="bar">Text</p></div>'
        '<blockquote cite="https://example.com">Foo</blockquote>')
    sl.remove_attributes(":all", "class", "cite")
    assert _strip(clean(h, sl)) == \
        '<div data="true"><p>Text</p></div><blockquote>Foo</blockquote>'


def test_remove_protocols_all():
    h = "<a href='any://example.com'>Link</a>"
    sl = Safelist.relaxed()
    assert clean(h, sl) == "<a>Link</a>"
    sl.remove_protocols("a", "href", "ftp", "http", "https", "mailto")
    assert clean(h, sl) == '<a href="any://example.com">Link</a>'


def test_remove_enforced_attributes():
    h = ("<div><p><A HREF='http://nice.com'>Nice</a></p>"
         "<blockquote>Hello</blockquote>")
    assert _strip(clean(h, Safelist.basic()
                        .remove_enforced_attribute("a", "rel"))) == (
        '<p><a href="http://nice.com">Nice</a></p>'
        '<blockquote>Hello</blockquote>')


def test_remove_protocols():
    h = "<p>Contact me <a href='mailto:info@example.com'>here</a></p>"
    assert _strip(clean(h, Safelist.basic()
                        .remove_protocols("a", "href", "ftp",
                                          "mailto"))) == \
        '<p>Contact me <a rel="nofollow">here</a></p>'


def test_safelisted_protocol_retained():
    sl = Safelist.none().add_tags("a").add_attributes("a", "href") \
        .add_protocols("a", "href", "something")
    assert _strip(clean('<a href="SOMETHING://x"></a>', sl)) == \
        '<a href="SOMETHING://x"></a>'


def test_drop_comments():
    assert clean("<p>Hello<!-- no --></p>", Safelist.relaxed()) == \
        "<p>Hello</p>"


def test_drop_xml_proc():
    assert clean('<?import namespace="xss"><p>Hello</p>',
                 Safelist.relaxed()) == "<p>Hello</p>"


def test_drop_script():
    assert clean("<SCRIPT SRC=//ha.ckers.org/.j>"
                 "<SCRIPT>alert(/XSS/.source)</SCRIPT>",
                 Safelist.relaxed()) == ""


def test_drop_image_script():
    assert clean("<IMG SRC=\"javascript:alert('XSS')\">",
                 Safelist.relaxed()) == "<img>"


def test_clean_javascript_href():
    assert clean("<A HREF=\"javascript:document.location="
                 "'http://www.google.com/'\">XSS</A>",
                 Safelist.relaxed()) == "<a>XSS</a>"


def test_clean_anchor_protocol():
    valid = '<a href="#valid">Valid anchor</a>'
    invalid = '<a href="#anchor with spaces">Invalid anchor</a>'
    assert clean(valid, Safelist.relaxed()) == "<a>Valid anchor</a>"
    assert clean(invalid, Safelist.relaxed()) == "<a>Invalid anchor</a>"
    with_anchor = Safelist.relaxed().add_protocols("a", "href", "#")
    assert clean(valid, with_anchor) == valid
    assert clean(invalid, with_anchor) == "<a>Invalid anchor</a>"


def test_drops_unknown_tags():
    assert clean("<p><custom foo=true>Test</custom></p>",
                 Safelist.relaxed()) == "<p>Test</p>"


def test_handles_empty_attributes():
    assert clean("<img alt=\"\" src= unknown=''>",
                 Safelist.basic_with_images()) == '<img alt="">'


def test_is_valid_body_html():
    ok = ("<p>Test <b><a href='http://example.com/' rel='nofollow'>OK"
          "</a></b></p>")
    ok1 = "<p>Test <b><a href='http://example.com/'>OK</a></b></p>"
    nok1 = "<p><script></script>Not <b>OK</b></p>"
    nok2 = "<p align=right>Test Not <b>OK</b></p>"
    nok3 = "<!-- comment --><p>Not OK</p>"
    nok4 = "<html><head>Foo</head><body><b>OK</b></body></html>"
    nok5 = ("<p>Test <b><a href='http://example.com/' rel='nofollowme'>"
            "OK</a></b></p>")
    nok6 = "<p>Test <b><a href='http://example.com/'>OK</b></p>"
    nok7 = "</div>What"
    assert KP.is_valid(ok, Safelist.basic())
    assert KP.is_valid(ok1, Safelist.basic())
    assert not KP.is_valid(nok1, Safelist.basic())
    assert not KP.is_valid(nok2, Safelist.basic())
    assert not KP.is_valid(nok3, Safelist.basic())
    assert not KP.is_valid(nok4, Safelist.basic())
    assert not KP.is_valid(nok5, Safelist.basic())
    assert not KP.is_valid(nok6, Safelist.basic())
    assert not KP.is_valid(ok, Safelist.none())
    assert not KP.is_valid(nok7, Safelist.basic())


def test_is_valid_document():
    ok = "<html><head></head><body><p>Hello</p></body><html>"
    nok = ("<html><head><script>woops</script><title>Hello</title>"
           "</head><body><p>Hello</p></body><html>")
    cleaner = Cleaner(Safelist.relaxed())
    assert cleaner.is_valid(KP.parse(ok))
    assert not cleaner.is_valid(KP.parse(nok))
    assert not Cleaner(Safelist.none()).is_valid(KP.parse(ok))


def test_resolves_relative_links():
    html = "<a href='/foo'>Link</a><img src='/bar'>"
    assert clean(html, Safelist.basic_with_images(),
                 "http://example.com/") == (
        '<a href="http://example.com/foo" rel="nofollow">Link</a>'
        '<img src="http://example.com/bar">')


def test_preserves_relative_links_if_configured():
    html = "<a href='/foo'>Link</a><img src='/bar'> " \
           "<img src='javascript:alert()'>"
    assert clean(html, Safelist.basic_with_images()
                 .preserve_relative_links_(True),
                 "http://example.com/") == \
        '<a href="/foo" rel="nofollow">Link</a><img src="/bar"> <img>'


def test_drops_unresolvable_relative_links():
    assert clean("<a href='/foo'>Link</a>", Safelist.basic()) == \
        '<a rel="nofollow">Link</a>'


def test_drops_concealed_js_protocol_with_relative_links():
    sl = Safelist.basic().preserve_relative_links_(True)
    html = "<a href=\"&#0013;ja&Tab;va&Tab;script&#0010;:alert(1)\">Link</a>"
    assert clean(html, sl, "https://") == '<a rel="nofollow">Link</a>'
    colon = "<a href=\"ja&Tab;va&Tab;script&colon;alert(1)\">Link</a>"
    assert clean(colon, sl, "https://") == '<a rel="nofollow">Link</a>'


def test_drops_concealed_js_protocol_without_relative_links():
    sl = Safelist.basic().preserve_relative_links_(False)
    html = "<a href=\"ja&Tab;vas&#0013;cript:alert(1)\">Link</a>"
    assert clean(html, sl, "https://") == '<a rel="nofollow">Link</a>'


def test_handles_custom_protocols():
    html = "<img src='cid:12345' /> <img src='data:gzzt' />"
    assert clean(html, Safelist.basic_with_images()) == "<img> <img>"
    assert clean(html, Safelist.basic_with_images()
                 .add_protocols("img", "src", "cid", "data")) == \
        '<img src="cid:12345"> <img src="data:gzzt">'


def test_handles_all_pseudo_tag():
    html = "<p class='foo' src='bar'><a class='qux'>link</a></p>"
    sl = Safelist().add_attributes(":all", "class") \
        .add_attributes("p", "style").add_tags("p", "a")
    assert clean(html, sl) == '<p class="foo"><a class="qux">link</a></p>'


def test_adds_tag_on_attributes_if_not_set():
    html = "<p class='foo' src='bar'>One</p>"
    sl = Safelist().add_attributes("p", "class")
    assert clean(html, sl) == '<p class="foo">One</p>'
