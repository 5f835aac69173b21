"""HtmlParserTest tranche 4 — misnesting/adoption/CDATA group,
translated from reference ksoup-test/.../parser/HtmlParserTest.kt."""

from ksoup_ray.engine import parser as KP
from ksoup_ray.engine.dom import CDataNode, DataNode, TextNode
from ksoup_ray.engine.dom import normalise_whitespace


def _strip(s: str) -> str:
    return "".join(line.lstrip(" ") for line in s.split("\n"))


def test_handles_cdata():
    h = "<div id=1><![CDATA[<html>\n <foo><&amp;]]></div>"
    doc = KP.parse(h)
    div = doc.get_element_by_id("1")
    assert div.text() == "<html>\n <foo><&amp;"
    assert len(div.children()) == 0
    assert div.child_node_size() == 1


def test_round_trips_cdata():
    h = "<div id=1><![CDATA[\n<html>\n <foo><&amp;]]></div>"
    doc = KP.parse(h)
    div = doc.get_element_by_id("1")
    assert div.text() == "<html>\n <foo><&amp;"
    assert len(div.children()) == 0
    assert div.child_node_size() == 1
    assert div.outer_html() == \
        '<div id="1"><![CDATA[\n<html>\n <foo><&amp;]]>\n</div>'
    cdata = div.text_nodes()[0]
    assert isinstance(cdata, CDataNode)
    assert cdata.text() == "\n<html>\n <foo><&amp;"


def test_handles_cdata_across_buffer():
    cdata = ""
    while len(cdata) <= 2048:
        cdata += "A suitable amount of CData.\n"
    doc = KP.parse(f"<div><![CDATA[{cdata}]]></div>")
    div = doc.select_first("div")
    node = div.text_nodes()[0]
    assert isinstance(node, CDataNode)
    assert node.text() == cdata


def test_handles_cdata_in_script():
    html = ('<script type="text/javascript">//<![CDATA[\n\n'
            "  foo();\n//]]></script>")
    doc = KP.parse(html)
    data = "//<![CDATA[\n\n  foo();\n//]]>"
    script = doc.select_first("script")
    assert script.text() == ""  # in script data section, not cdata
    assert script.data() == data
    assert script.outer_html() == html
    data_node = script.child_nodes()[0]
    assert isinstance(data_node, DataNode)
    assert data_node.get_whole_data() == data


def test_handles_unclosed_cdata_at_eof():
    doc = KP.parse("<![CDATA[]]")
    assert doc.body().child_node_size() == 1


def test_handle_cdata_in_text():
    h = "<p>One <![CDATA[Two <&]]> Three</p>"
    doc = KP.parse(h)
    p = doc.select_first("p")
    nodes = p.child_nodes()
    assert nodes[0].get_whole_text() == "One "
    assert nodes[1].get_whole_text() == "Two <&"
    assert isinstance(nodes[1], CDataNode)
    assert nodes[2].get_whole_text() == " Three"
    assert p.outer_html() == h


def test_cdata_nodes_are_text_nodes():
    h = "<p>One <![CDATA[ Two <& ]]> Three</p>"
    doc = KP.parse(h)
    p = doc.select_first("p")
    nodes = p.text_nodes()
    assert nodes[0].text() == "One "
    assert nodes[1].text() == " Two <& "
    assert nodes[2].text() == " Three"


def test_handles_invalid_start_tags():
    h = "<div>Hello < There <&amp;></div>"
    doc = KP.parse(h)
    assert doc.select("div")[0].text() == "Hello < There <&>"


def test_handles_unknown_tags():
    h = "<div><foo title=bar>Hello<foo title=qux>there</foo></div>"
    doc = KP.parse(h)
    foos = doc.select("foo")
    assert len(foos) == 2
    assert foos[0].attr("title") == "bar"
    assert foos[-1].attr("title") == "qux"
    assert foos[-1].text() == "there"


def test_handles_unknown_inline_tags():
    h = "<p><cust>Test</cust></p><p><cust><cust>Test</cust></cust></p>"
    doc = KP.parse_body_fragment(h)
    assert _strip(doc.body().html()) == h


def test_handles_unknown_namespace_tags():
    h = ("<foo:bar id='1' /><abc:def id=2>Foo<p>Hello</p></abc:def>"
         "<foo:bar>There</foo:bar>")
    doc = KP.parse(h)
    assert _strip(doc.body().html()) == (
        '<foo:bar id="1" /><abc:def id="2">Foo<p>Hello</p></abc:def>'
        "<foo:bar>There</foo:bar>")


def test_handles_misnested_tags_b_i():
    # whatwg: <b><i></b></i>
    h = "<p>1<b>2<i>3</b>4</i>5</p>"
    doc = KP.parse(h)
    assert doc.body().html() == "<p>1<b>2<i>3</i></b><i>4</i>5</p>"


def test_handles_misnested_tags_b_p():
    # whatwg: <b><p></b></p>
    h = "<b>1<p>2</b>3</p>"
    doc = KP.parse(h)
    assert doc.body().html() == "<b>1</b>\n<p><b>2</b>3</p>"


def test_handles_misnested_a_in_divs():
    h = "<a href='#1'><div><div><a href='#2'>child</a></div</div></a>"
    w = ('<a href="#1"></a> <div> <a href="#1"></a> <div> '
         '<a href="#1"></a><a href="#2">child</a> </div> </div>')
    doc = KP.parse(h)
    assert normalise_whitespace(doc.body().html()) == \
        normalise_whitespace(w)


def test_reconstruct_formatting_elements():
    h = "<p><b class=one>One <i>Two <b>Three</p><p>Hello</p>"
    doc = KP.parse(h)
    assert doc.body().html() == (
        '<p><b class="one">One <i>Two <b>Three</b></i></b></p>\n'
        '<p><b class="one"><i><b>Hello</b></i></b></p>')


def test_reconstruct_formatting_elements_in_table():
    h = ("<p><b>One</p> <table><tr><td><p><i>Three<p>Four</i></td></tr>"
         "</table> <p>Five</p>")
    doc = KP.parse(h)
    want = ("<p><b>One</b></p><b><table><tbody><tr><td><p><i>Three</i></p>"
            "<p><i>Four</i></p></td></tr></tbody></table><p>Five</p></b>")
    assert _strip(doc.body().html()) == want


def test_handles_unclosed_rawtext_at_eof():
    cases = [
        ("<style>Data", "Data"),
        ("<style>Data</st", "Data</st"),
        ("<style>Data</style>", "Data"),
        ("<style>Data</style", "Data</style"),
        ("<style>Data</-style", "Data</-style"),
        ("<style>Data</style-", "Data</style-"),
        ("<style>Data</style--", "Data</style--"),
    ]
    for html, want in cases:
        assert KP.parse(html).select("style")[0].data() == want, html


def test_nested_anchor_adoption():
    html = "<a>\n<b>\n<div>\n<a>test</a>\n</div>\n</b>\n</a>"
    doc = KP.parse(html)
    assert _strip(doc.body().html()) == \
        "<a> <b> </b></a><b><div><a> </a><a>test</a></div></b>"
