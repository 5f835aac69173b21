"""Entity escape/unescape goldens from reference nodes/EntitiesTest.kt."""

from ksoup_ray.engine import entities as E
from ksoup_ray.engine import parser as P


def test_escape():
    # EntitiesTest.kt:12 (escape test, per mode)
    text = "Hello &<> Å å π 新 there ¾ © »"
    esc_base = E.escape(text, E.ESCAPE_BASE, "html", "ascii")
    assert esc_base == ("Hello &amp;&lt;&gt; &Aring; &aring; &#x3c0; "
                       "&#x65b0; there &frac34; &copy; &raquo;")
    esc_full_utf = E.escape(text, E.ESCAPE_EXTENDED, "html", "UTF-8")
    assert esc_full_utf == "Hello &amp;&lt;&gt; Å å π 新 there ¾ © »"
    esc_xhtml_ascii = E.escape(text, E.ESCAPE_XHTML, "html", "ascii")
    assert esc_xhtml_ascii == ("Hello &amp;&lt;&gt; &#xc5; &#xe5; &#x3c0; "
                               "&#x65b0; there &#xbe; &#xa9; &#xbb;")


def test_escape_supplementary():
    # EntitiesTest.kt escapeSupplementaryCharacter
    text = "𝕙"  # MATHEMATICAL DOUBLE-STRUCK SMALL H, U+1D559
    assert E.escape(text, E.ESCAPE_BASE, "html", "ascii") == "&#x1d559;"
    assert E.escape(text, E.ESCAPE_EXTENDED, "html", "ascii") == "&hopf;"
    assert E.escape(text, E.ESCAPE_EXTENDED, "html", "UTF-8") == "𝕙"


def test_unescape():
    # EntitiesTest.kt unescape
    text = ("Hello &AElig; &amp;&LT&gt; &reg &angst &angst; &#960; "
            "&#960 &#x65B0; there &! &frac34; &copy; &COPY;")
    assert E.unescape(text) == \
        "Hello Æ &<> ® &angst Å π π 新 there &! ¾ © ©"


def test_strict_unescape():
    # EntitiesTest.kt:117 strictUnescape — in attributes, no lax matching
    text = "Hello &amp= &amp;"
    assert E.unescape(text, strict=True) == "Hello &amp= &"
    assert E.unescape(text) == "Hello &= &"


def test_case_sensitive():
    unescaped = "Ü ü & &"
    assert E.escape(unescaped, E.ESCAPE_EXTENDED, "html", "ascii") == \
        "&Uuml; &uuml; &amp; &amp;"
    escaped = "&Uuml; &uuml; &amp; &AMP"
    assert E.unescape(escaped) == "Ü ü & &"


def test_quote_replacements():
    escaped = "&#92; &#36;"
    assert E.unescape(escaped) == "\\ $"


def test_letter_digit_entities():
    # EntitiesTest letterDigitEntities
    doc = P.parse("<p>&sup1;&sup2;&sup3;&frac14;&frac12;&frac34;</p>")
    doc.output_settings.charset = "ascii"
    p = doc.select_first("p")
    assert p.html() == "&sup1;&sup2;&sup3;&frac14;&frac12;&frac34;"
    assert p.text() == "¹²³¼½¾"


def test_no_spurious_decodes():
    s = "http://www.foo.com?a=1&num_rooms=1&children=0&int=VA&b=2"
    assert E.unescape(s) == s


def test_unescapes_in_doc():
    doc = P.parse("<p>&notit; &notin; &#x1f4a9;</p>")
    assert doc.text() == "&notit; ∉ 💩"


def test_win1252_extensions():
    for i, cp in enumerate(E.WIN1252_EXTENSIONS):
        assert E.unescape(f"&#{0x80 + i};") == chr(cp)


def test_not_missing_supplementals():
    text = "&npolint; &qfr;"
    assert E.unescape(text) == "⨔ 𝔮"


def test_multi_codepoint_entities():
    # EntitiesTest.kt:195 emoji/multipoint
    assert E.unescape("&NotNestedGreaterGreater;") == "⪢̸"


def test_escape_mode_nbsp():
    assert E.escape("a\xa0b", E.ESCAPE_BASE, "html", "UTF-8") == "a&nbsp;b"
    assert E.escape("a\xa0b", E.ESCAPE_XHTML, "xml", "UTF-8") == "a&#xa0;b"


def test_attr_vs_text_escapes():
    doc = P.parse('<p title="<a> \'b\'">&lt;a&gt;</p>')
    out = doc.select_first("p").outer_html()
    # < not escaped in html attr, " would be; text < escaped
    assert out == "<p title=\"<a> 'b'\">&lt;a&gt;</p>"
