"""PositionTest attribute-range tranche — attribute name/value source
offsets, dedup interaction, implicit values, document-level tracks
(reference ksoup-test/.../nodes/PositionTest.kt tracksAttributes*,
tracksDocument, tracksFrag, updateKeyMaintainsRange*)."""

from ksoup_ray.engine import parser as KP
from ksoup_ray.engine.dom import Document, Element, LeafNode, TextNode
from ksoup_ray.engine.positions import SourceMap
from ksoup_ray.engine.treebuilder import ParseSettings


def _attr_positions(el):
    out = []
    attrs = el.attributes()
    if attrs is None:
        return ""
    for k, _v in attrs:
        rng = attrs.source_range(k)
        assert rng is not None, k
        ns, ne, vs, ve = rng
        out.append(f"{k}:{ns}-{ne}={vs}-{ve}; ")
    return "".join(out)


def _node_positions(node):
    def fmt(s):
        return f"{s[0]}-{s[1]}"
    if isinstance(node, TextNode):
        return f"#text:{fmt(node.span)}; "
    if isinstance(node, LeafNode) or not isinstance(node, Element):
        return f"{node.node_name()}:{fmt(node.span)}; "
    return f"{node.tag_name()}:{fmt(node.span)}~{fmt(node.end_span)}; "


def _stream_positions(root, with_attrs=True):
    out = []
    for node in root.node_stream():
        if node.span is None:
            continue
        out.append(_node_positions(node))
        if with_attrs and isinstance(node, Element) and not \
                isinstance(node, LeafNode):
            out.append(_attr_positions(node))
    return "".join(out)


def test_tracks_attributes_across_lines():
    html = "<div one=\"Hello\nthere\" \nid=1 \nclass=\nfoo\nattr5>Text"
    doc = KP.parse(html)
    div = doc.expect_first("div")
    attrs = div.attributes()
    track = []
    for k, v in attrs:
        rng = attrs.source_range(k)
        assert rng is not None
        ns, ne, vs, ve = rng
        if v == "":
            assert vs == ve  # implicit value range
        else:
            assert vs < ve
        track.append(f"{k}:{ns}-{ne}={vs}-{ve}; ")
    assert attrs.get("class") == "foo"
    sm = SourceMap(html)
    ns, ne, vs, ve = attrs.source_range("class")
    assert (f"{sm.fmt_pos(ns)}-{sm.fmt_pos(ne)}="
            f"{sm.fmt_pos(vs)}-{sm.fmt_pos(ve)}") == \
        "4,1:30-4,6:35=5,1:37-5,4:40"
    assert "".join(track) == ("one:5-8=10-21; id:24-26=27-28; "
                              "class:30-35=37-40; attr5:41-46=46-46; ")


def test_track_attribute_position_in_first_element():
    html = "<html lang=en class=dark><p hidden></p></html>"
    doc = KP.parse(html)
    assert _stream_positions(doc.expect_first("html")) == (
        "html:0-25~39-46; lang:6-10=11-13; class:14-19=20-24; "
        "head:25-25~25-25; body:25-25~46-46; p:25-35~35-39; "
        "hidden:28-34=34-34; ")
    xml_doc = KP.parse_xml(html)
    assert _stream_positions(xml_doc.expect_first("html")) == (
        "html:0-25~39-46; lang:6-10=11-13; class:14-19=20-24; "
        "p:25-35~35-39; hidden:28-34=34-34; ")


def test_track_attribute_position_with_case():
    pom = ('<project xmlns="http://maven.apache.org/POM/4.0.0" '
           'xmlns:xsi="http://www.w3.org/2001/XMLSchema-instance" '
           'xsi:schemaLocation="http://maven.apache.org/POM/4.0.0 '
           'http://maven.apache.org/xsd/maven-4.0.0.xsd">\n'
           "    <modelVersion>4.0.0</modelVersion>")
    doc = KP.parse(pom)
    assert _stream_positions(doc.expect_first("project")) == (
        "project:0-204~243-243; xmlns:9-14=16-49; xmlns:xsi:51-60=62-103; "
        "xsi:schemalocation:105-123=125-202; #text:204-209; "
        "modelversion:209-223~228-243; #text:223-228; ")
    xml_doc = KP.parse_xml(pom)
    assert _stream_positions(xml_doc.expect_first("project")) == (
        "project:0-204~243-243; xmlns:9-14=16-49; xmlns:xsi:51-60=62-103; "
        "xsi:schemaLocation:105-123=125-202; #text:204-209; "
        "modelVersion:209-223~228-243; #text:223-228; ")
    xml_lc = KP.parse_xml(pom)  # default xml preserves; force lowercase
    from ksoup_ray.engine.xmlbuilder import XmlTreeBuilder
    tb = XmlTreeBuilder(ParseSettings(False, False))
    xml_lc = tb.parse(pom)
    assert _stream_positions(xml_lc.expect_first("project")) == (
        "project:0-204~243-243; xmlns:9-14=16-49; xmlns:xsi:51-60=62-103; "
        "xsi:schemalocation:105-123=125-202; #text:204-209; "
        "modelversion:209-223~228-243; #text:223-228; ")


def test_track_attributes_positions_dedupes():
    html = "<p id=1 id=2 Id=3 Id=4 id=5 Id=6>"
    html_doc = KP.parse(html)
    html_uc = KP.parse(html, settings=ParseSettings(True, True))
    xml_doc = KP.parse_xml(html)
    from ksoup_ray.engine.xmlbuilder import XmlTreeBuilder
    xml_lc = XmlTreeBuilder(ParseSettings(False, False)).parse(html)
    assert _attr_positions(html_doc.expect_first("p")) == "id:3-5=6-7; "
    assert _attr_positions(html_uc.expect_first("p")) == \
        "id:3-5=6-7; Id:13-15=16-17; "
    assert _attr_positions(xml_doc.expect_first("p")) == \
        "id:3-5=6-7; Id:13-15=16-17; "
    assert _attr_positions(xml_lc.expect_first("p")) == "id:3-5=6-7; "


def test_track_attributes_positions_directional_dedupes():
    html = "<p Id=1 id=2 Id=3 Id=4 id=5 Id=6>"
    html_doc = KP.parse(html)
    html_uc = KP.parse(html, settings=ParseSettings(True, True))
    xml_doc = KP.parse_xml(html)
    from ksoup_ray.engine.xmlbuilder import XmlTreeBuilder
    xml_lc = XmlTreeBuilder(ParseSettings(False, False)).parse(html)
    assert _attr_positions(html_doc.expect_first("p")) == "id:3-5=6-7; "
    assert _attr_positions(html_uc.expect_first("p")) == \
        "Id:3-5=6-7; id:8-10=11-12; "
    assert _attr_positions(xml_doc.expect_first("p")) == \
        "Id:3-5=6-7; id:8-10=11-12; "
    assert _attr_positions(xml_lc.expect_first("p")) == "id:3-5=6-7; "


def test_tracks_frag():
    html = "<h1 id=1>One</h1>\n<h2 id=2>Two</h2><h10>Ten</h10>"
    shell = Document.create_shell("")
    nodes = KP.parse_fragment(html, shell.body(), "")
    track = []
    for node in nodes:
        for descend in node.node_stream():
            if descend.span is None:
                continue
            track.append(_node_positions(descend))
            if isinstance(descend, Element) and not \
                    isinstance(descend, LeafNode):
                track.append(_attr_positions(descend))
    assert "".join(track) == (
        "h1:0-9~12-17; id:4-6=7-8; #text:9-12; #text:17-18; "
        "h2:18-27~30-35; id:22-24=25-26; #text:27-30; "
        "h10:35-40~43-49; #text:40-43; ")


def test_update_key_maintains_range_lc():
    html = "<p xsi:CLASS=On>One</p>"
    doc = KP.parse(html)
    p = doc.expect_first("p")
    attrs = p.attributes()
    rng = attrs.source_range("xsi:class")
    assert rng == (3, 12, 13, 15)
    sm = SourceMap(html)
    ns, ne, vs, ve = rng
    assert (f"{sm.fmt_pos(ns)}-{sm.fmt_pos(ne)}="
            f"{sm.fmt_pos(vs)}-{sm.fmt_pos(ve)}") == \
        "1,4:3-1,13:12=1,14:13-1,16:15"
    attrs.rename("xsi:class", "class")
    assert attrs.source_range("class") == (3, 12, 13, 15)
    assert attrs.get("class") == "On"


def test_update_key_maintains_range_uc():
    html = "<p xsi:CLASS=On>One</p>"
    doc = KP.parse_xml(html)
    p = doc.expect_first("p")
    attrs = p.attributes()
    assert attrs.source_range("xsi:CLASS") == (3, 12, 13, 15)
    attrs.rename("xsi:CLASS", "class")
    assert attrs.source_range("class") == (3, 12, 13, 15)


def test_tracks_document():
    html = "<!doctype html><title>Foo</title><p>Bar."
    doc = KP.parse(html)
    track = []
    for node in doc.node_stream():
        if node.span is None:
            continue
        if isinstance(node, Element):
            track.append(f"{node.node_name() if node.node_name().startswith('#') else node.tag_name()}:"
                         f"{node.span[0]}-{node.span[1]}~"
                         f"{node.end_span[0]}-{node.end_span[1]}; ")
        else:
            track.append(f"{node.node_name()}:{node.span[0]}-"
                         f"{node.span[1]}; ")
    assert "".join(track) == (
        "#document:0-0~40-40; #doctype:0-15; html:15-15~40-40; "
        "head:15-15~33-33; title:15-22~25-33; #text:22-25; "
        "body:33-33~40-40; p:33-36~40-40; #text:36-40; ")


def test_tracks_document_xml():
    html = "<!doctype html><title>Foo</title><p>Bar."
    doc = KP.parse_xml(html)
    track = []
    for node in doc.node_stream():
        if node.span is None:
            continue
        if isinstance(node, Element):
            track.append(f"{node.node_name() if node.node_name().startswith('#') else node.tag_name()}:"
                         f"{node.span[0]}-{node.span[1]}~"
                         f"{node.end_span[0]}-{node.end_span[1]}; ")
        else:
            track.append(f"{node.node_name()}:{node.span[0]}-"
                         f"{node.span[1]}; ")
    assert "".join(track) == (
        "#document:0-0~40-40; #doctype:0-15; title:15-22~25-33; "
        "#text:22-25; p:33-36~40-40; #text:36-40; ")


def test_parser_track_defaults():
    # reference gates position tracking behind setTrackPosition; this
    # engine stamps ranges unconditionally (they are part of the
    # extraction pipeline's per-document output contract)
    doc = KP.parse("<p>One")
    assert doc.expect_first("p").span is not None
    xml = KP.parse_xml("<p>One</p>")
    assert xml.expect_first("p").span is not None
