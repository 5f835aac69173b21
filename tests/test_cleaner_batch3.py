"""CleanerTest tranche 3 — protocols, concealed javascript, output
settings, framesets, case-sensitive elements (reference
ksoup-test/.../safety/CleanerTest.kt remainder)."""

import pytest

from ksoup_ray.engine import parser as KP
from ksoup_ray.engine.dom import OutputSettings
from ksoup_ray.engine.safety import Cleaner, Safelist


def _strip(s: str) -> str:
    return "".join(line.lstrip(" ") for line in s.split("\n"))


def test_safelisted_protocol_should_be_retained():
    safelist = (Safelist.none().add_tags("a")
                .add_attributes("a", "href")
                .add_protocols("a", "href", "something"))
    assert _strip(KP.clean('<a href="SOMETHING://x"></a>', safelist)) == \
        '<a href="SOMETHING://x"></a>'


def test_drops_concealed_javascript_protocol_when_relative_links_enabled():
    safelist = Safelist.basic().preserve_relative_links_(True)
    html = '<a href="&#0013;ja&Tab;va&Tab;script&#0010;:alert(1)">Link</a>'
    assert KP.clean(html, safelist, "https://") == \
        '<a rel="nofollow">Link</a>'
    colon = '<a href="ja&Tab;va&Tab;script&colon;alert(1)">Link</a>'
    assert KP.clean(colon, safelist, "https://") == \
        '<a rel="nofollow">Link</a>'


def test_drops_concealed_javascript_protocol_when_relative_links_disabled():
    safelist = Safelist.basic().preserve_relative_links_(False)
    html = '<a href="ja&Tab;vas&#0013;cript:alert(1)">Link</a>'
    assert KP.clean(html, safelist, "https://") == \
        '<a rel="nofollow">Link</a>'


def test_supply_output_settings():
    os_ = OutputSettings()
    os_.pretty_print = False
    os_.escape_mode = "extended"
    os_.charset = "ISO-8859-1"
    html = "<div><p>&bernou;</p></div>"
    custom = KP.clean(html, Safelist.relaxed(), "http://foo.com/",
                      output_settings=os_)
    default = KP.clean(html, Safelist.relaxed(), "http://foo.com/")
    assert custom != default
    assert custom == "<div><p>&Bscr;</p></div>"
    assert default == "<div>\n <p>ℬ</p>\n</div>"
    os_.escape_mode = "base"
    custom2 = KP.clean(html, Safelist.relaxed(), "http://foo.com/",
                       output_settings=os_)
    assert custom2 == "<div><p>&#x212c;</p></div>"


def test_handles_framesets():
    dirty = ("<html><head><script></script><noscript></noscript></head>"
             '<frameset><frame src="foo" /><frame src="foo" />'
             "</frameset></html>")
    assert KP.clean(dirty, Safelist.basic()) == ""
    dirty_doc = KP.parse(dirty)
    clean_doc = Cleaner(Safelist.basic()).clean(dirty_doc)
    assert clean_doc is not None
    assert len(clean_doc.body().child_nodes()) == 0


def test_cleans_international_text():
    assert KP.clean("привет", Safelist.none()) == "привет"


def test_script_tag_in_safelist():
    safelist = Safelist.relaxed()
    safelist.add_tags("script")
    assert KP.is_valid("Hello<script>alert('Doh')</script>World !",
                       safelist)


def test_bails_if_removing_protocol_thats_not_set():
    w = Safelist.none()
    w.add_attributes("a", "href")
    with pytest.raises(ValueError):
        w.remove_protocols("a", "href", "javascript")


def test_handles_control_characters_after_tag_name():
    html = "<a/\x06>"
    assert KP.clean(html, Safelist.basic()) == '<a rel="nofollow"></a>'


def test_handles_attributes_with_no_value():
    assert KP.clean("<a href>Clean</a>", Safelist.basic()) == \
        '<a rel="nofollow">Clean</a>'


def test_handles_no_href_attribute():
    dirty = "<a>One</a> <a href>Two</a>"
    relaxed_with_anchor = Safelist.relaxed().add_protocols("a", "href", "#")
    assert KP.clean(dirty, relaxed_with_anchor) == "<a>One</a> <a>Two</a>"


def test_handles_nested_quotes_in_attribute():
    orig = "<div style=\"font-family: 'Calibri'\">Will (not) fail</div>"
    allow = Safelist.relaxed().add_attributes("div", "style")
    assert _strip(KP.clean(orig, allow)) == orig
    assert KP.is_valid(orig, allow)


def test_cleans_case_sensitive_elements():
    html = ("<svg><feMerge baseFrequency=2><feMergeNode kernelMatrix=1 />"
            "<feMergeNode><clipPath /></feMergeNode><feMergeNode />")
    expected = ('<svg>\n <feMerge baseFrequency="2">\n'
                '  <feMergeNode kernelMatrix="1" />\n  <feMergeNode>\n'
                "   <clipPath />\n  </feMergeNode>\n  <feMergeNode />\n"
                " </feMerge>\n</svg>")
    for preserve_case in (True, False):
        tags = ["svg", "feMerge", "feMergeNode", "clipPath"]
        attrs = ["kernelMatrix", "baseFrequency"]
        if not preserve_case:
            tags = [t.lower() for t in tags]
            attrs = [a.lower() for a in attrs]
        safelist = Safelist.none().add_tags(*tags) \
            .add_attributes(":all", *attrs)
        assert KP.clean(html, safelist) == expected, preserve_case


def test_preserves_source_position_through_clean():
    """PositionTest preservesSourcePositionViaUserData: cleaned
    elements keep the original source ranges and attribute ranges."""
    from ksoup_ray.engine.positions import SourceMap
    html = "<script>xss</script>\n <p id=1>Hello</p>"
    orig = KP.parse(html)
    p = orig.expect_first("p")
    sm = SourceMap(html)
    assert sm.fmt_range(p.span) == "2,2:22-2,10:30"
    assert sm.fmt_range(orig.span) == "1,1:0-1,1:0"
    assert sm.fmt_range(orig.end_span) == "2,19:39-2,19:39"
    attr_rng = p.attributes().source_range("id")
    ns, ne, vs, ve = attr_rng
    assert (f"{sm.fmt_pos(ns)}-{sm.fmt_pos(ne)}="
            f"{sm.fmt_pos(vs)}-{sm.fmt_pos(ve)}") == \
        "2,5:25-2,7:27=2,8:28-2,9:29"
    clean_doc = Cleaner(
        Safelist.relaxed().add_attributes("p", "id")).clean(orig)
    clean_p = clean_doc.expect_first("p")
    assert clean_p.id() == "1"
    assert clean_p.span == p.span
    assert clean_p.end_span == p.end_span
    assert clean_p.attributes().source_range("id") == attr_rng
