"""HtmlParserTest tranche 5 — templates / fragments / ruby / foreign
content, translated from reference HtmlParserTest.kt."""

from ksoup_ray.engine import parser as KP
from ksoup_ray.engine.dom import Document, Element
from ksoup_ray.engine.elements import Elements
from ksoup_ray.engine.tags import (
    NAMESPACE_HTML,
    NAMESPACE_MATHML,
    NAMESPACE_SVG,
)


def _strip(s: str) -> str:
    return "".join(line.lstrip(" ") for line in s.split("\n"))


def _html_ns(el):
    assert el.tag.namespace == NAMESPACE_HTML


def _svg_ns(el):
    assert el.tag.namespace == NAMESPACE_SVG


def _math_ns(el):
    assert el.tag.namespace == NAMESPACE_MATHML


def test_fragment():
    # a script tag at the start of a body fragment goes into the body
    html = ("<script type=\"text/javascript\">console.log('foo');</script>\n"
            '<div id="somecontent">some content</div>\n'
            "<script type=\"text/javascript\">console.log('bar');</script>")
    body = KP.parse_body_fragment(html)
    assert body.body().html() == (
        "<script type=\"text/javascript\">console.log('foo');</script>\n"
        '<div id="somecontent">\n'
        " some content\n"
        "</div>\n"
        "<script type=\"text/javascript\">console.log('bar');</script>")


def test_template_inside_table():
    raw = open("/root/reference/ksoup-test/testResources/htmltests/"
               "table-polymer-template.html", "rb").read()
    doc = KP.parse_bytes(raw, charset="UTF-8")
    doc.output_settings.pretty_print = True
    templates = doc.body().get_elements_by_tag("template")
    assert templates
    for template in templates:
        assert len(template.child_nodes()) > 1


def test_parse_fragment_on_created_document():
    nodes = KP.parse_fragment("<h2>text</h2>", Element("p"), "")
    assert len(nodes) == 1
    node = nodes[0]
    assert node.node_name() == "h2"
    assert node.parent().outer_html() == "<p>\n <h2>text</h2></p>"


def test_nested_p_fragments():
    nodes = KP.parse_fragment("<p></p><a></a>", Element("p"), "")
    assert len(nodes) == 2
    node = nodes[0]
    # mis-nested because fragment forced into the element, OK
    assert node.parent().outer_html() == "<p>\n <p></p><a></a></p>"


def test_template_in_head():
    html = ("<head><template id=1><meta name=tmpl></template>"
            "<title>Test</title><style>One</style></head><body><p>Two</p>")
    doc = KP.parse(html)
    want = ('<html><head><template id="1"><meta name="tmpl"></template>'
            "<title>Test</title><style>One</style></head>"
            "<body><p>Two</p></body></html>")
    assert _strip(doc.html()) == want
    template = Elements(doc.select("template#1"))
    template.select("meta").set_attr("content", "Yes")
    template.unwrap()
    want = ('<html><head><meta name="tmpl" content="Yes"><title>Test</title>'
            "<style>One</style></head><body><p>Two</p></body></html>")
    assert _strip(doc.html()) == want


def test_nested_template_in_body():
    html = ("<body><template id=1><table><tr><template id=2><td>One</td>"
            "<td>Two</td></template></tr></template></body>")
    doc = KP.parse(html)
    want = ('<html><head></head><body><template id="1"><table><tbody><tr>'
            '<template id="2"><td>One</td><td>Two</td></template></tr>'
            "</tbody></table></template></body></html>")
    assert _strip(doc.html()) == want

    tmpl_row = doc.select_first("template#2")
    tmpl_row.append_child(tmpl_row.clone())
    Elements(doc.select("template")).unwrap()
    want = ("<html><head></head><body><table><tbody><tr><td>One</td>"
            "<td>Two</td><td>One</td><td>Two</td></tr></tbody></table>"
            "</body></html>")
    assert _strip(doc.html()) == want


def test_can_select_into_template():
    doc = KP.parse("<body><div><template><p>Hello</p>")
    want = ("<html><head></head><body><div><template><p>Hello</p>"
            "</template></div></body></html>")
    assert _strip(doc.html()) == want
    p = doc.select_first("div p")
    p1 = doc.select_first("template :containsOwn(Hello)")
    assert p.normal_name() == "p"
    assert p is p1


def test_table_row_fragment():
    doc = KP.parse("<body><table></table></body")
    table = doc.select_first("table")
    table.set_html("<tr><td><img></td></tr>")
    assert _strip(table.html()) == "<tbody><tr><td><img></td></tr></tbody>"
    assert _strip(doc.body().html()) == \
        "<table><tbody><tr><td><img></td></tr></tbody></table>"


def test_template_table_row_fragment():
    doc = KP.parse("<body><table><template></template></table></body")
    tmpl = doc.select_first("template")
    tmpl.set_html("<tr><td><img></td></tr>")
    assert _strip(tmpl.html()) == "<tr><td><img></td></tr>"
    tmpl.unwrap()
    assert _strip(doc.html()) == ("<html><head></head><body><table><tr>"
                                  "<td><img></td></tr></table></body></html>")


def test_template_not_in_table_row_fragment():
    doc = KP.parse("<body><template></template></body")
    tmpl = doc.select_first("template")
    tmpl.set_html("<tr><td><img></td></tr>")
    assert _strip(tmpl.html()) == "<tr><td><img></td></tr>"
    tmpl.unwrap()
    assert _strip(doc.html()) == ("<html><head></head><body><tr><td><img>"
                                  "</td></tr></body></html>")


def test_template_fragment():
    html = ('<template id="lorem-ipsum"><tr><td>Lorem</td><td>Ipsum</td>'
            "</tr></template>")
    frag = KP.parse_body_fragment(html)
    assert _strip(frag.body().html()) == html


def test_template_inferred_form():
    doc = KP.parse("<template><isindex action>")
    assert _strip(doc.head().html()) == (
        "<template><form><hr><label>This is a searchable index. "
        'Enter search keywords: <input name="isindex"></label><hr>'
        "</form></template>")


def test_supports_ruby():
    html = ("<ruby><rbc><rb>10</rb><rb>31</rb><rb>2002</rb></rbc>"
            "<rtc><rt>Month</rt><rt>Day</rt><rt>Year</rt></rtc>"
            "<rtc><rt>Expiration Date</rt><rp>(*)</rtc></ruby>")
    doc = KP.parse(html, track_errors=True)
    assert len(doc.error_list) == 3  # 3 errors from rb in rtc as undefined
    ruby = doc.expect_first("ruby")
    assert _strip(ruby.outer_html()) == (
        "<ruby><rbc><rb>10</rb><rb>31</rb><rb>2002</rb></rbc>"
        "<rtc><rt>Month</rt><rt>Day</rt><rt>Year</rt></rtc>"
        "<rtc><rt>Expiration Date</rt><rp>(*)</rp></rtc></ruby>")


def test_ruby_rp_rt_implicit_close():
    html = "<ruby><rp>(<rt>Hello<rt>Hello<rp>)</ruby>\n"
    doc = KP.parse(html, track_errors=True)
    assert len(doc.error_list) == 0
    ruby = doc.expect_first("ruby")
    assert _strip(ruby.outer_html()) == \
        "<ruby><rp>(</rp><rt>Hello</rt><rt>Hello</rt><rp>)</rp></ruby>"


def test_ruby_scope_error():
    html = "<ruby><div><rp>Hello"
    doc = KP.parse(html, track_errors=True)
    assert len(doc.error_list) == 2
    ruby = doc.expect_first("ruby")
    assert _strip(ruby.outer_html()) == \
        "<ruby><div><rp>Hello</rp></div></ruby>"


def test_svg_parse():
    html = ("<div><svg viewBox=2><foreignObject><p>One</p>"
            "</foreignObject></svg></div>")
    doc = KP.parse(html)
    div = doc.expect_first("div")
    _html_ns(div)
    svg = doc.expect_first("svg")
    assert svg.attributes().has_key("viewBox")
    _svg_ns(svg)
    _svg_ns(doc.expect_first("foreignObject"))
    _html_ns(doc.expect_first("p"))
    assert div.html() == ('<svg viewBox="2">\n'
                          " <foreignObject>\n"
                          "  <p>One</p>\n"
                          " </foreignObject>\n"
                          "</svg>")


def test_math_parse_text():
    html = ("<div><math><mi><p>One</p><svg><text>Blah</text></svg></mi>"
            "<ms></ms></div>")
    doc = KP.parse(html)
    _html_ns(doc.expect_first("div"))
    _math_ns(doc.expect_first("math"))
    _math_ns(doc.expect_first("mi"))
    _html_ns(doc.expect_first("p"))
    _svg_ns(doc.expect_first("svg"))
    _svg_ns(doc.expect_first("text"))
    _math_ns(doc.expect_first("ms"))
    assert doc.expect_first("div").html() == ("<math>\n"
                                              " <mi>\n"
                                              "  <p>One</p>\n"
                                              "  <svg>\n"
                                              "   <text>Blah</text>\n"
                                              "  </svg></mi><ms></ms>\n"
                                              "</math>")


def test_math_svg_style():
    html = ("<style><img></style><math><svg><style><img></img></style>"
            "</svg></math>")
    doc = KP.parse(html)
    html_style = doc.expect_first("style")
    _html_ns(html_style)
    assert html_style.data() == "<img>"  # data (textish), not an element
    svg_style = doc.expect_first("svg style")
    _math_ns(svg_style)  # inherited math ns: not an HTML integration point
    style_img = svg_style.expect_first("img")
    _html_ns(style_img)  # img is foreign-to-html
    _math_ns(doc.expect_first("svg"))
    _math_ns(doc.expect_first("math"))


def test_math_annotation_svg():
    doc = KP.parse("<math><svg>")  # not in annotation: svg in math ns
    _math_ns(doc.expect_first("math"))
    _math_ns(doc.expect_first("svg"))
    doc2 = KP.parse("<math><annotation-xml><svg>")  # svg in svg ns
    _math_ns(doc2.expect_first("math"))
    _math_ns(doc2.expect_first("annotation-xml"))
    _svg_ns(doc2.expect_first("svg"))


def test_math_html_integration_point():
    doc = KP.parse("<math><div>Hello")
    _math_ns(doc.expect_first("math"))
    _html_ns(doc.expect_first("div"))
    doc2 = KP.parse("<math><divv>Hello")
    _math_ns(doc2.expect_first("math"))
    _math_ns(doc2.expect_first("divv"))
    doc3 = KP.parse("<math><annotation-xml><divv>Hello")
    _math_ns(doc3.expect_first("math"))
    _math_ns(doc3.expect_first("annotation-xml"))
    _math_ns(doc3.expect_first("divv"))
    doc4 = KP.parse("<math><annotation-xml encoding=text/html><divv>Hello")
    _math_ns(doc4.expect_first("math"))
    _math_ns(doc4.expect_first("annotation-xml"))
    _html_ns(doc4.expect_first("divv"))
