"""EntitiesTest tranche 2 — the remaining reference cases
(nodes/EntitiesTest.kt: escape with latin-1, unescapeMultiChars:56,
getByName:80, notMissingMultis:98, caseSensitive:126,
quoteReplacements:138, letterDigitEntities:145, noSpuriousDecodes:158,
escapesGtInXmlAttributesButNotInHtml:164, controlCharacters:177,
emoji:195)."""

from ksoup_ray.engine import entities as E
from ksoup_ray.engine import parser as P


def test_escape_latin1_modes():
    text = "Hello &<> Å å π 新 there ¾ © » ' \""
    esc_base = E.escape(text, E.ESCAPE_BASE, "html", "ISO-8859-1")
    assert esc_base == ("Hello &amp;&lt;&gt; Å å &#x3c0; &#x65b0; there "
                        "¾ © » &apos; &quot;")
    esc_full = E.escape(text, E.ESCAPE_EXTENDED, "html", "ISO-8859-1")
    assert esc_full == ("Hello &amp;&lt;&gt; Å å &pi; &#x65b0; there "
                        "¾ © » &apos; &quot;")
    esc_xhtml = E.escape(text, E.ESCAPE_XHTML, "html", "ISO-8859-1")
    assert esc_xhtml == ("Hello &amp;&lt;&gt; Å å &#x3c0; &#x65b0; there "
                         "¾ © » &#x27; &quot;")
    esc_utf_full = E.escape(text, E.ESCAPE_EXTENDED, "html", "UTF-8")
    assert esc_utf_full == "Hello &amp;&lt;&gt; Å å π 新 there ¾ © » " \
        "&apos; &quot;"
    esc_utf_min = E.escape(text, E.ESCAPE_XHTML, "html", "UTF-8")
    assert esc_utf_min == "Hello &amp;&lt;&gt; Å å π 新 there ¾ © » " \
        "&#x27; &quot;"
    # round trips
    for esc in (esc_base, esc_full, esc_xhtml, esc_utf_full, esc_utf_min):
        assert E.unescape(esc) == text


def test_escape_defaults():
    text = "Hello &<> Å å π 新 there ¾ © » ' \""
    assert E.escape(text) == ("Hello &amp;&lt;&gt; Å å π 新 there ¾ © » "
                              "&apos; &quot;")


def test_unescape_multi_chars():
    text = "&NestedGreaterGreater; &nGg; &nGt; &nGtv; &Gt; &gg;"
    un = "≫ ⋙̸ ≫⃒ ≫̸ ≫ ≫"
    assert E.unescape(text) == un
    escaped = E.escape(un, E.ESCAPE_EXTENDED, "html", "ISO-8859-1")
    assert escaped == "&Gt; &Gg;&#x338; &Gt;&#x20d2; &Gt;&#x338; &Gt; &Gt;"
    assert E.unescape(escaped) == un


def test_xhtml_mode_mappings():
    assert E.XHTML_NAMES["amp"] == "&"
    assert E.XHTML_NAMES["gt"] == ">"
    assert E.XHTML_NAMES["lt"] == "<"
    assert E.XHTML_NAMES["quot"] == '"'
    assert E.REVERSE_XHTML[38] == "amp"
    assert E.REVERSE_XHTML[62] == "gt"
    assert E.REVERSE_XHTML[60] == "lt"
    assert E.REVERSE_XHTML[34] == "quot"


def test_get_by_name():
    assert E.codepoints_for_name("nGt") == "≫⃒"
    assert E.codepoints_for_name("fjlig") == "fj"
    assert E.codepoints_for_name("gg") == "≫"
    assert E.codepoints_for_name("copy") == "©"


def test_not_missing_multis():
    assert E.unescape("&nparsl;") == "⫽⃥"


def test_not_missing_supplementals():
    assert E.unescape("&npolint; &qfr;") == "⨔ \U0001d52e"


def test_case_sensitive():
    unescaped = "Ü ü & &"
    assert E.escape(unescaped, E.ESCAPE_EXTENDED, "html", "ISO-8859-1") == \
        "Ü ü &amp; &amp;"
    assert E.unescape("&Uuml; &uuml; &amp; &AMP") == "Ü ü & &"


def test_quote_replacements():
    assert E.unescape("&#92; &#36;") == "\\ $"


def test_letter_digit_entities():
    doc = P.parse("<p>&sup1;&sup2;&sup3;&frac14;&frac12;&frac34;</p>")
    doc.output_settings.charset = "ISO-8859-1"
    p = doc.select("p")[0]
    assert p.html() == "¹²³¼½¾"
    assert p.text() == "¹²³¼½¾"
    doc.output_settings.charset = "UTF-8"
    assert p.html() == "¹²³¼½¾"


def test_no_spurious_decodes():
    s = "http://www.foo.com?a=1&num_rooms=1&children=0&int=VA&b=2"
    assert E.unescape(s) == s


def test_escapes_gt_in_xml_attributes_but_not_in_html():
    doc = P.parse("<a title='<p>One</p>'>One</a>")
    element = doc.select("a")[0]
    doc.output_settings.escape_mode = E.ESCAPE_BASE
    assert element.outer_html() == '<a title="<p>One</p>">One</a>'
    doc.output_settings.escape_mode = E.ESCAPE_XHTML
    assert element.outer_html() == '<a title="&lt;p>One&lt;/p>">One</a>'


def test_control_characters_are_escaped():
    inp = '<a foo="&#x1b;esc&#x7;bell">Text &#x1b; &#x7;</a>'
    doc = P.parse(inp)
    assert doc.body().html() == inp
    xml = P.parse_xml(inp)
    assert xml.html() == inp


def test_parse_html_encoded_emoji_multipoint():
    # surrogate pair as two numeric refs
    assert P.unescape_entities("&#55357;&#56495;", False) == "\U0001f4af"


def test_parse_html_encoded_emoji():
    assert P.unescape_entities("&#128175;", False) == "\U0001f4af"
