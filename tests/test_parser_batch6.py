"""HtmlParserTest tranche 6 — textarea / script / whitespace /
known-empty group, translated from reference HtmlParserTest.kt."""

from ksoup_ray.engine import parser as KP
from ksoup_ray.engine.dom import DataNode
from ksoup_ray.engine.elements import Elements
from ksoup_ray.engine.safety import Safelist
from ksoup_ray.engine.treebuilder import PRESERVE_CASE


def _strip(s: str) -> str:
    return "".join(line.lstrip(" ") for line in s.split("\n"))


def test_parses_unterminated_textarea():
    doc = KP.parse("<body><p><textarea>one<p>two")
    t = doc.select("textarea")[0]
    assert t.text() == "one"
    assert doc.select("p")[1].text() == "two"


def test_parses_unterminated_option():
    doc = KP.parse("<body><p><select><option>One<option>Two</p><p>Three</p>")
    options = doc.select("option")
    assert len(options) == 2
    assert options[0].text() == "One"
    assert options[-1].text() == "TwoThree"


def test_handles_escaped_data():
    doc = KP.parse("<div title='Surf &amp; Turf'>Reef &amp; Beef</div>")
    div = doc.get_elements_by_tag("div")[0]
    assert div.attr("title") == "Surf & Turf"
    assert div.text() == "Reef & Beef"


def test_handles_data_only_tags():
    tels = KP.parse("<style>font-family: bold</style>") \
        .get_elements_by_tag("style")
    assert tels[0].data() == "font-family: bold"
    assert tels[0].text() == ""
    s = ("<p>Hello</p><script>obj.insert('<a rel=\"none\" />');\n"
         "i++;</script><p>There</p>")
    doc = KP.parse(s)
    assert doc.text() == "Hello There"
    assert doc.body().data() == "obj.insert('<a rel=\"none\" />');\ni++;"


def test_handles_text_after_data():
    h = "<html><body>pre <script>inner</script> aft</body></html>"
    doc = KP.parse(h)
    assert _strip(doc.html()) == ("<html><head></head><body>pre "
                                  "<script>inner</script> aft</body></html>")


def test_handles_text_area():
    doc = KP.parse("<textarea>Hello</textarea>")
    els = Elements(doc.select("textarea"))
    assert els.text() == "Hello"
    assert els.value() == "Hello"


def test_preserves_space_in_textarea():
    doc = KP.parse("<textarea>\n\tOne\n\tTwo\n\tThree\n</textarea>")
    expect = "One\n\tTwo\n\tThree"  # leading/trailing dropped for authors
    el = doc.select("textarea")[0]
    assert el.text() == expect
    assert el.value() == expect
    assert el.html() == expect
    assert el.outer_html() == f"<textarea>\n\t{expect}\n</textarea>"


def test_preserves_space_in_script():
    doc = KP.parse("<script>\nOne\n\tTwo\n\tThree\n</script>")
    expect = "\nOne\n\tTwo\n\tThree\n"
    el = doc.select("script")[0]
    assert el.data() == expect
    assert el.html() == "One\n\tTwo\n\tThree"
    assert el.outer_html() == f"<script>{expect}</script>"


def test_handles_known_empty_noframes():
    h = "<html><head><noframes /><meta name=foo></head><body>One</body></html>"
    doc = KP.parse(h)
    assert _strip(doc.html()) == (
        '<html><head><noframes></noframes><meta name="foo"></head>'
        "<body>One</body></html>")


def test_handles_known_empty_style():
    h = "<html><head><style /><meta name=foo></head><body>One</body></html>"
    doc = KP.parse(h)
    assert _strip(doc.html()) == (
        '<html><head><style></style><meta name="foo"></head>'
        "<body>One</body></html>")


def test_handles_known_empty_title():
    h = "<html><head><title /><meta name=foo></head><body>One</body></html>"
    doc = KP.parse(h)
    assert _strip(doc.html()) == (
        '<html><head><title></title><meta name="foo"></head>'
        "<body>One</body></html>")


def test_handles_known_empty_iframe():
    h = "<p>One</p><iframe id=1 /><p>Two"
    doc = KP.parse(h)
    assert _strip(doc.html()) == (
        '<html><head></head><body><p>One</p><iframe id="1"></iframe>'
        "<p>Two</p></body></html>")


def test_no_implicit_form_for_textareas():
    doc = KP.parse("<textarea>One</textarea>")
    assert doc.body().html() == "<textarea>One</textarea>"


def test_self_closing_textarea_doesnt_leave_droppings():
    doc = KP.parse("<div><div><textarea/></div></div>")
    assert "&lt;" not in doc.body().html()
    assert "&gt;" not in doc.body().html()
    assert _strip(doc.body().html()) == \
        "<div><div><textarea></textarea></div></div>"


def test_no_spurious_space():
    doc = KP.parse("Just<a>One</a><a>Two</a>")
    assert doc.body().html() == "Just<a>One</a><a>Two</a>"
    assert doc.body().text() == "JustOneTwo"


def test_u_newlines():
    html = "t<u>es</u>t <b>on</b> <i>f</i><u>ir</u>e"
    clean = KP.clean(html, Safelist.basic())
    assert clean == "t<u>es</u>t <b>on</b> <i>f</i><u>ir</u>e"
    doc = KP.parse(html)
    assert doc.text() == "test on fire"


def test_script_in_data_node():
    doc = KP.parse("<script>Hello</script><style>There</style>")
    assert isinstance(doc.select_first("script").child_nodes()[0], DataNode)
    assert isinstance(doc.select_first("style").child_nodes()[0], DataNode)
    doc = KP.parse("<SCRIPT>Hello</SCRIPT><STYLE>There</STYLE>",
                   settings=PRESERVE_CASE)
    assert isinstance(doc.select_first("script").child_nodes()[0], DataNode)
    assert isinstance(doc.select_first("style").child_nodes()[0], DataNode)


def test_textarea_value():
    html = "<TEXTAREA>YES YES</TEXTAREA>"
    doc = KP.parse(html)
    assert doc.select_first("textarea").value() == "YES YES"
    doc = KP.parse(html, settings=PRESERVE_CASE)
    assert doc.select_first("textarea").value() == "YES YES"


def test_preserve_whitespace_in_head():
    html = ("\n<!doctype html>\n<html>\n<head>\n<title>Hello</title>\n"
            "</head>\n<body>\n<p>One</p>\n</body>\n</html>\n")
    doc = KP.parse(html)
    doc.output_settings.pretty_print = False
    assert doc.outer_html() == (
        "<!doctype html>\n<html>\n<head>\n<title>Hello</title>\n</head>\n"
        "<body>\n<p>One</p>\n</body>\n</html>\n")


def test_preserves_tabs():
    html = "<pre>One\tTwo</pre><span>\tThree\tFour</span>"
    doc = KP.parse(html)
    pre = doc.select_first("pre")
    span = doc.select_first("span")
    assert pre.text() == "One\tTwo"
    assert span.text() == "Three Four"
    assert span.whole_text() == "\tThree\tFour"
    assert doc.body().text() == "One\tTwo Three Four"
    assert doc.body().html() == "<pre>One\tTwo</pre><span> Three Four</span>"
    doc.output_settings.pretty_print = False
    assert doc.body().html() == html


def test_large_textarea_contents():
    text_content = "".join("\n<text>foo</text>\n" for _ in range(2001))
    doc = KP.parse(f"<textarea>{text_content}</textarea>")
    textarea = doc.expect_first("textarea")
    assert textarea.whole_text() == text_content
