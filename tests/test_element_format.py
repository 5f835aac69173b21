"""ElementTest pretty-print / serialization tranche — translated from
reference ksoup-test/.../nodes/ElementTest.kt (format group)."""

from ksoup_ray.engine import parser as KP
from ksoup_ray.engine.dom import OutputSettings


def test_indent_level():
    # deep to test default and extended max padding
    divs = "<div>" * 40 + "Foo"
    doc = KP.parse(divs)
    settings = doc.output_settings
    assert settings.max_padding_width == 30
    html = doc.html()
    assert (" " * 30 + "<div>\n"
            + " " * 30 + "Foo\n"
            + " " * 30 + "</div>") in html
    settings.max_padding_width = 32
    html = doc.html()
    assert (" " * 32 + "<div>\n"
            + " " * 32 + "Foo\n"
            + " " * 32 + "</div>") in html
    settings.max_padding_width = -1
    html = doc.html()
    assert (" " * 41 + "<div>\n"
            + " " * 42 + "Foo\n"
            + " " * 41 + "</div>") in html


def test_not_pretty_with_en_dash_body():
    html = "<div><span>1:15</span>&ndash;<span>2:15</span>&nbsp;p.m.</div>"
    doc = KP.parse(html)
    doc.output_settings.pretty_print = False
    assert doc.body().html() == \
        "<div><span>1:15</span>–<span>2:15</span>&nbsp;p.m.</div>"


def test_pretty_with_en_dash_body():
    html = "<div><span>1:15</span>&ndash;<span>2:15</span>&nbsp;p.m.</div>"
    doc = KP.parse(html)
    assert doc.body().html() == \
        "<div>\n <span>1:15</span>–<span>2:15</span>&nbsp;p.m.\n</div>"


def test_pretty_and_outline_with_en_dash_body():
    html = "<div><span>1:15</span>&ndash;<span>2:15</span>&nbsp;p.m.</div>"
    doc = KP.parse(html)
    doc.output_settings.outline = True
    assert doc.body().html() == ("<div>\n <span>1:15</span>\n –\n"
                                 " <span>2:15</span>\n &nbsp;p.m.\n</div>")


def test_basic_formats():
    html = ("<span>0</span>.<div><span>1</span>-<span>2</span>"
            "<p><span>3</span>-<span>4</span><div>5</div>")
    doc = KP.parse(html)
    assert doc.body().html() == (
        "<span>0</span>.\n"
        "<div>\n"
        " <span>1</span>-<span>2</span>\n"
        " <p><span>3</span>-<span>4</span></p>\n"
        " <div>\n"
        "  5\n"
        " </div>\n"
        "</div>")


def test_empty_element_format_html():
    # don't put newlines into empty blocks
    doc = KP.parse("<section><div></div></section>")
    assert doc.select("section")[0].outer_html() == \
        "<section>\n <div></div>\n</section>"


def test_no_indent_on_script_and_style():
    # don't newline+indent closing </script> and </style> tags
    doc = KP.parse("<script>one\ntwo</script>\n<style>three\nfour</style>")
    assert doc.head().html() == \
        "<script>one\ntwo</script>\n<style>three\nfour</style>"


def test_container_output():
    doc = KP.parse("<title>Hello there</title> <div><p>Hello</p>"
                   "<p>there</p></div> <div>Another</div>")
    assert doc.select("title")[0].outer_html() == "<title>Hello there</title>"
    assert doc.select("div")[0].outer_html() == \
        "<div>\n <p>Hello</p>\n <p>there</p>\n</div>"
    assert doc.select("body")[0].html() == \
        "<div>\n <p>Hello</p>\n <p>there</p>\n</div>\n<div>\n Another\n</div>"


def _output_settings_variants():
    s1 = OutputSettings()
    s1.indent_amount = 4
    s2 = OutputSettings()
    s2.indent_amount = 1
    s3 = OutputSettings()
    s3.indent_amount = 4
    s3.outline = True
    s4 = OutputSettings()
    s4.pretty_print = False
    return [s1, s2, s3, s4]


def test_pretty_serialization_round_trips():
    # repeated html() + parse() must not accumulate spaces / newlines
    for settings in _output_settings_variants():
        doc = KP.parse("<div>\nFoo\n<p>\nBar\nqux</p></div>\n"
                       "<script>\n alert('Hello!');\n</script>")
        doc.output_settings = settings
        html = doc.html()
        doc2 = KP.parse(html)
        doc2.output_settings = settings
        assert doc2.html() == html


def test_pretty_print_scripts_does_not_grow_on_repeat():
    doc = KP.parse("<div>\nFoo\n<p>\nBar\nqux</p></div>\n"
                   "<script>\n alert('Hello!');\n</script>")
    settings = doc.output_settings
    settings.pretty_print = True
    settings.outline = True
    settings.indent_amount = 4
    html = doc.html()
    doc2 = KP.parse(html)
    doc2.output_settings = settings
    assert doc2.html() == html


def test_element_br_text():
    html = "<p>Hello<br>World</p>"
    doc = KP.parse(html)
    doc.output_settings.pretty_print = False
    p = doc.select("p")[0]
    assert p.outer_html() == html
    assert p.text() == "Hello World"
    assert p.whole_text() == "Hello\nWorld"


def test_wrap_text_after_br():
    doc = KP.parse("<p>Hello<br>there<br>now.</p>")
    assert doc.body().html() == "<p>Hello<br>\n there<br>\n now.</p>"


def test_prettyprint_br_in_block():
    doc = KP.parse("<div><br> </div>")
    assert doc.body().html() == "<div>\n <br>\n</div>"


def test_prettyprint_br_when_not_first_child():
    doc = KP.parse("<div><p><br>Foo</p><br></div>")
    assert doc.body().html() == ("<div>\n"
                                 " <p><br>\n"
                                 "  Foo</p>\n"
                                 " <br>\n"
                                 "</div>")


def test_preformat_flows_to_child_text_nodes():
    html = ("<div><pre>One\n<span>\nTwo</span>\n <span>  \nThree</span>\n"
            " <span>Four <span>Five</span>\n  Six\n</pre>")
    doc = KP.parse(html)
    doc.output_settings.indent_amount = 2
    doc.output_settings.pretty_print = True
    div = doc.select_first("div")
    assert div is not None
    expect = ("<div>\n"
              "  <pre>One\n"
              "<span>\n"
              "Two</span>\n"
              " <span>  \n"
              "Three</span>\n"
              " <span>Four <span>Five</span>\n"
              "  Six\n"
              "</span></pre>\n"
              "</div>")
    assert div.outer_html() == expect
    expect_text = "One\n\nTwo\n   \nThree\n Four Five\n  Six\n"
    assert div.whole_text() == expect_text
    expect_own = "One\n\n \n "
    assert div.children()[0].whole_own_text() == expect_own


def test_inline_in_block_should_indent():
    html = ("<div>One <span>Hello</span><span>!</span></div>"
            "<div>\n<span>There</span></div><div> <span>Now</span></div>")
    doc = KP.parse(html)
    assert doc.body().html() == (
        "<div>\n"
        " One <span>Hello</span><span>!</span>\n"
        "</div>\n"
        "<div>\n"
        " <span>There</span>\n"
        "</div>\n"
        "<div>\n"
        " <span>Now</span>\n"
        "</div>")


def test_span_runs_maintain_space():
    doc = KP.parse("<p><span>One</span>\n<span>Two</span>\n"
                   "<span>Three</span></p>")
    text = "One Two Three"
    body = doc.body()
    assert body.text() == text
    p = doc.expect_first("p")
    html = p.html()
    p.set_html(html)
    assert body.text() == text
    assert body.html() == \
        "<p><span>One</span> <span>Two</span> <span>Three</span></p>"


def test_doctype_is_pretty_printed():
    doc1 = KP.parse("<!--\nlicense\n-->\n \n<!doctype html>\n<html>")
    doc2 = KP.parse("\n  <!doctype html><html>")
    doc3 = KP.parse("<!doctype html>\n<html>")
    doc4 = KP.parse("\n<!doctype html>\n<html>")
    doc5 = KP.parse("\n<!--\n comment \n -->  <!doctype html>\n<html>")
    doc6 = KP.parse("<!--\n comment \n -->  <!doctype html>\n<html>")
    assert doc1.html() == ("<!--\nlicense\n-->\n<!doctype html>\n<html>\n"
                           " <head></head>\n <body></body>\n</html>")
    doc1.output_settings.pretty_print = False
    assert doc1.html() == ("<!--\nlicense\n--><!doctype html>\n"
                           "<html><head></head><body></body></html>")
    for doc in (doc2, doc3, doc4):
        assert doc.html() == ("<!doctype html>\n<html>\n <head></head>\n"
                              " <body></body>\n</html>")
    for doc in (doc5, doc6):
        assert doc.html() == ("<!--\n comment \n -->\n<!doctype html>\n"
                              "<html>\n <head></head>\n <body></body>\n"
                              "</html>")


def test_textnode_in_block_indent():
    html = "<div>\n{{ msg }} \n </div>\n<div>\n{{ msg }} \n </div>"
    doc = KP.parse(html)
    assert doc.body().html() == \
        "<div>\n {{ msg }}\n</div>\n<div>\n {{ msg }}\n</div>"


def test_strip_trailing():
    doc = KP.parse("<p> This <span>is </span>fine. </p>")
    assert doc.body().html() == "<p>This <span>is </span>fine.</p>"


def test_element_indent_and_space_trims():
    html = ("<body><div> <p> One Two </p> <a>  Hello </a><p>\n"
            "Some text \n</p>\n </div>")
    doc = KP.parse(html)
    assert doc.body().html() == ("<div>\n"
                                 " <p>One Two</p><a> Hello </a>\n"
                                 " <p>Some text</p>\n"
                                 "</div>")


def test_div_a_inlineable():
    doc = KP.parse("<body><div> <a>Text</a>")
    assert doc.body().html() == "<div>\n <a>Text</a>\n</div>"


def test_no_dangling_space_after_custom_element():
    doc = KP.parse("<bar><p/>\n</bar>")
    assert doc.body().html() == "<bar>\n <p></p>\n</bar>"
    doc = KP.parse("<foo>\n  <bar />\n</foo>")
    assert doc.body().html() == "<foo>\n <bar />\n</foo>"


def test_span_in_block_trims():
    doc = KP.parse("<p>Lorem ipsum</p>\n<span>Thanks</span>")
    assert doc.body().html() == "<p>Lorem ipsum</p><span>Thanks</span>"


def test_ruby_inline():
    html = "<ruby>T<rp>(</rp><rtc>!</rtc><rt>)</rt></ruby>"
    doc = KP.parse(html)
    assert doc.body().html() == html


def test_nested_format_as_inline_prints_as_block():
    h = """<table>
            <tr>
                <td>
                    <p style="display:inline;">A</p>
                    <p style="display:inline;">B</p>
                </td>
            </tr>
        </table>"""
    doc = KP.parse(h)
    assert doc.body().html() == (
        "<table>\n"
        " <tbody>\n"
        "  <tr>\n"
        "   <td>\n"
        '    <p style="display:inline;">A</p>\n'
        '    <p style="display:inline;">B</p></td>\n'
        "  </tr>\n"
        " </tbody>\n"
        "</table>")
