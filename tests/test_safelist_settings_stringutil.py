"""SafelistTest + ParserSettingsTest + StringUtilTest tranches —
translated from the reference's safety/SafelistTest.kt,
parser/ParserSettingsTest.kt and internal/StringUtilTest.kt."""

import pytest

from ksoup_ray.engine import parser as KP
from ksoup_ray.engine.dom import Attributes, _padding, normalise_whitespace
from ksoup_ray.engine.safety import Safelist
from ksoup_ray.engine.treebuilder import ParseSettings
from ksoup_ray.engine.urlutil import resolve

TEST_TAG = "testTag"
TEST_ATTRIBUTE = "testAttribute"
TEST_SCHEME = "valid-scheme"
TEST_VALUE = TEST_SCHEME + "://testValue"


# --- SafelistTest ----------------------------------------------------------

def test_copy_constructor_no_side_effect_on_tags():
    safelist1 = Safelist().add_tags(TEST_TAG)
    safelist2 = Safelist(safelist1)
    safelist1.add_tags("invalidTag")
    assert not safelist2.is_safe_tag("invalidTag")


def test_copy_constructor_no_side_effect_on_enforced_attributes():
    safelist1 = Safelist().add_enforced_attribute(
        TEST_TAG, TEST_ATTRIBUTE, TEST_VALUE)
    safelist2 = Safelist(safelist1)
    safelist1.add_enforced_attribute(TEST_TAG, TEST_ATTRIBUTE, "invalidValue")
    for value in safelist2.enforced.get(TEST_TAG, {}).values():
        assert value != "invalidValue"


def test_copy_constructor_no_side_effect_on_protocols():
    from ksoup_ray.engine.dom import Element
    invalid_scheme = "invalid-scheme"
    safelist1 = (Safelist()
                 .add_attributes(TEST_TAG, TEST_ATTRIBUTE)
                 .add_protocols(TEST_TAG, TEST_ATTRIBUTE, TEST_SCHEME))
    safelist2 = Safelist(safelist1)
    safelist1.add_protocols(TEST_TAG, TEST_ATTRIBUTE, invalid_scheme)
    invalid_el = Element(TEST_TAG.lower())
    invalid_el.set_attr(TEST_ATTRIBUTE, f"{invalid_scheme}://someValue")
    assert not safelist2.is_safe_attribute(
        TEST_TAG, invalid_el, TEST_ATTRIBUTE,
        f"{invalid_scheme}://someValue")


def test_noscript_is_blocked():
    with pytest.raises(ValueError) as e:
        Safelist().add_tags("NOSCRIPT")
    assert "unsupported" in str(e.value)


# --- ParserSettingsTest ----------------------------------------------------

def test_case_support():
    both_on = ParseSettings(True, True)
    both_off = ParseSettings(False, False)
    tag_on = ParseSettings(True, False)
    attr_on = ParseSettings(False, True)
    assert both_on.normalize_tag("IMG") == "IMG"
    assert both_on.normalize_attr("ID") == "ID"
    assert both_off.normalize_tag("IMG") == "img"
    assert both_off.normalize_attr("ID") == "id"
    assert tag_on.normalize_tag("IMG") == "IMG"
    assert tag_on.normalize_attr("ID") == "id"
    assert attr_on.normalize_tag("IMG") == "img"
    assert attr_on.normalize_attr("ID") == "ID"


def test_attribute_case_normalization():
    settings = ParseSettings(False, False)
    assert settings.normalize_attr("HIDDEN") == "hidden"


def test_attributes_case_normalization():
    attributes = Attributes()
    attributes.put("ITEM", "1")
    attributes.normalize()
    assert next(iter(attributes))[0] == "item"


# --- StringUtilTest --------------------------------------------------------

def test_padding():
    assert _padding(0, 30) == ""
    assert _padding(1, 30) == " "
    assert _padding(2, 30) == "  "
    assert _padding(15, 30) == " " * 15
    assert _padding(45, 30) == " " * 30  # taps out at the max width
    assert _padding(0, -1) == ""
    assert _padding(20, -1) == " " * 20
    assert _padding(21, -1) == " " * 21
    assert _padding(30, -1) == " " * 30
    assert _padding(45, -1) == " " * 45
    assert _padding(0, 0) == ""
    assert _padding(21, 0) == ""
    assert len(_padding(20, 5)) == 5


def test_is_blank():
    from ksoup_ray.engine.dom import TextNode
    assert TextNode("").is_blank()
    assert TextNode("      ").is_blank()
    assert TextNode("   \r\n  ").is_blank()
    assert not TextNode("hello").is_blank()
    assert not TextNode("   hello   ").is_blank()
    assert not TextNode(" ").is_blank()  # nbsp is NOT blank


def test_normalise_whitespace():
    assert normalise_whitespace("    \r \n \r\n") == " "
    assert normalise_whitespace("   hello   \r \n  there    \n") == \
        " hello there "
    assert normalise_whitespace("hello") == "hello"
    assert normalise_whitespace("hello\nthere") == "hello there"


def test_normalise_whitespace_handles_high_surrogates():
    test_71540_chars = "\U0001a6b2か゚  1"
    expected = "\U0001a6b2か゚ 1"
    assert normalise_whitespace(test_71540_chars) == expected
    assert KP.parse(test_71540_chars).text() == expected


def test_resolves_relative_urls():
    assert resolve("http://example.com", "./one/two?three") == \
        "http://example.com/one/two?three"
    assert resolve("http://example.com?one", "./one/two?three") == \
        "http://example.com/one/two?three"
    assert resolve("http://example.com", "./one/two?three#four") == \
        "http://example.com/one/two?three#four"
    assert resolve("http://example.com/", "https://example.com/one") == \
        "https://example.com/one"
    assert resolve("http://example.com/two/", "../one/two.html") == \
        "http://example.com/one/two.html"
    assert resolve("https://example.com/", "//example2.com/one") == \
        "https://example2.com/one"
    assert resolve("https://example.com:8080", "./one") == \
        "https://example.com:8080/one"
    assert resolve("http://example.com/", "https://example2.com/one") == \
        "https://example2.com/one"
    assert resolve("wrong", "https://example.com/one") == \
        "https://example.com/one"
    assert resolve("https://example.com/one", "") == \
        "https://example.com/one"
    assert resolve("https://example.com/one/two/", "../two.c") == \
        "https://example.com/one/two.c"
    assert resolve("https://example.com/one/two", "../two.c") == \
        "https://example.com/two.c"
    assert resolve("wrong", "also wrong") == ""
    assert resolve("ftp://example.com/two/", "../one") == \
        "ftp://example.com/one"
    assert resolve("ftp://example.com/one/", "./two.c") == \
        "ftp://example.com/one/two.c"
    assert resolve("ftp://example.com/one/", "two.c") == \
        "ftp://example.com/one/two.c"
    # rfc3986 section 5.4.2
    base = "http://example.com/b/c/d;p?q"
    assert resolve(base, "../../../g") == "http://example.com/g"
    assert resolve(base, "../../../../g") == "http://example.com/g"
    assert resolve(base, "/./g") == "http://example.com/g"
    assert resolve(base, "/../g") == "http://example.com/g"
    assert resolve(base, "g.") == "http://example.com/b/c/g."
    assert resolve(base, ".g") == "http://example.com/b/c/.g"
    assert resolve(base, "g..") == "http://example.com/b/c/g.."
    assert resolve(base, "..g") == "http://example.com/b/c/..g"
    assert resolve(base, "./../g") == "http://example.com/b/g"
    assert resolve(base, "./g/.") == "http://example.com/b/c/g/"
    assert resolve(base, "g/./h") == "http://example.com/b/c/g/h"
    assert resolve(base, "g/../h") == "http://example.com/b/c/h"
    assert resolve(base, "g;x=1/./y") == "http://example.com/b/c/g;x=1/y"
    assert resolve(base, "g;x=1/../y") == "http://example.com/b/c/y"
    assert resolve(base, "g?y/./x") == "http://example.com/b/c/g?y/./x"
    assert resolve(base, "g?y/../x") == "http://example.com/b/c/g?y/../x"
    assert resolve(base, "g#s/./x") == "http://example.com/b/c/g#s/./x"
    assert resolve(base, "g#s/../x") == "http://example.com/b/c/g#s/../x"


def test_strips_control_chars_from_urls():
    assert resolve("\nhttps://\texample.com/", "\r\nfo\to:ba\br") == "foo:bar"


def test_allows_space_in_url():
    assert resolve("https://example.com/example/", "../foo bar/") == \
        "https://example.com/foo bar/"
