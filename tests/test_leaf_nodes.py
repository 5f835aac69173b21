"""DataNodeTest + CommentTest + DocumentTypeTest + LeafNodeTest +
NodeStreamTest tranches — translated from the reference's nodes/ test
files of the same names."""

from ksoup_ray.engine import parser as KP
from ksoup_ray.engine.dom import (
    Comment,
    DataNode,
    DocumentType,
    Element,
    OutputSettings,
    TextNode,
    XmlDeclaration,
)
from ksoup_ray.engine.elements import CONTINUE, STOP, filter_traverse
from ksoup_ray.engine.parser import parse_xml
from tests.test_node_iterator import assert_contents, track_seen


def _xml_head(node) -> str:
    out = OutputSettings()
    out.syntax = "xml"
    accum = []
    node.outer_html_head(accum, 0, out)
    return "".join(accum)


# --- DataNodeTest ----------------------------------------------------------

def test_xml_output_script_with_cdata():
    node = DataNode("//<![CDATA[\nscript && <> data]]>")
    node.parent_node = Element("script")
    assert _xml_head(node) == "//<![CDATA[\nscript && <> data]]>"


def test_xml_output_script_without_cdata():
    node = DataNode("script && <> data")
    node.parent_node = Element("script")
    assert _xml_head(node) == "//<![CDATA[\nscript && <> data\n//]]>"


def test_xml_output_style_with_cdata():
    node = DataNode("/*<![CDATA[*/\nstyle && <> data]]>")
    node.parent_node = Element("style")
    assert _xml_head(node) == "/*<![CDATA[*/\nstyle && <> data]]>"


def test_xml_output_style_without_cdata():
    node = DataNode("style && <> data")
    node.parent_node = Element("style")
    assert _xml_head(node) == "/*<![CDATA[*/\nstyle && <> data\n/*]]>*/"


def test_xml_output_other_with_cdata():
    node = DataNode("<![CDATA[other && <> data]]>")
    node.parent_node = Element("other")
    assert _xml_head(node) == "<![CDATA[other && <> data]]>"


def test_xml_output_other_without_cdata():
    node = DataNode("other && <> data")
    node.parent_node = Element("other")
    assert _xml_head(node) == "<![CDATA[other && <> data]]>"


def test_xml_output_orphan_without_cdata():
    node = DataNode("other && <> data")
    assert _xml_head(node) == "<![CDATA[other && <> data]]>"


def test_recognize_packed():
    node = DataNode(
        "eval(function(p,a,c,k,e,r){e=String;if(!''.replace(/^/,String))"
        "{while(c--)r[c]=k[c]||c;k=[function(e){return r[e]}];"
        "e=function(){return'\\w+'};c=1};while(c--)if(k[c])"
        "p=p.replace(new RegExp('\\b'+e(c)+'\\b','g'),k[c]);return p}"
        "('0.1(\"2 3\")',4,4,'console|log|Hello|World'.split('|'),0,{}))")
    node.parent_node = Element("script")
    assert node.is_packed


def test_unpack_packed():
    node = DataNode(
        "eval(function(p,a,c,k,e,r){}('0.1(\"2 3\")',4,4,"
        "'console|log|Hello|World'.split('|'),0,{}))")
    node.parent_node = Element("script")
    assert node.is_packed
    assert node.get_unpacked_data() == 'console.log("Hello World")'


# --- CommentTest -----------------------------------------------------------

COMMENT = Comment(" This is one heck of a comment! ")
DECL = Comment("?xml encoding='ISO-8859-1'?")


def test_comment_node_name():
    assert COMMENT.node_name() == "#comment"


def test_comment_get_data():
    assert COMMENT.get_data() == " This is one heck of a comment! "


def test_comment_to_string():
    assert COMMENT.outer_html() == "<!-- This is one heck of a comment! -->"
    doc = KP.parse("<div><!-- comment--></div>")
    assert doc.body().html() == "<div>\n <!-- comment-->\n</div>"
    doc = KP.parse("<p>One<!-- comment -->Two</p>")
    assert doc.body().html() == "<p>One<!-- comment -->Two</p>"
    assert doc.text() == "OneTwo"


def test_comment_html_no_pretty():
    doc = KP.parse("<!-- a simple comment -->")
    doc.output_settings.pretty_print = False
    assert doc.html() == ("<!-- a simple comment -->"
                          "<html><head></head><body></body></html>")
    c1 = doc.child_nodes()[0]
    assert isinstance(c1, Comment)
    assert c1.outer_html() == "<!-- a simple comment -->"


def test_comment_stable_indent_in_block():
    html = "<div><!-- comment --> Text</div><p><!-- comment --> Text</p>"
    doc = KP.parse(html)
    out = doc.body().html()
    assert out == ("<div>\n"
                   " <!-- comment --> Text\n"
                   "</div>\n"
                   "<p><!-- comment --> Text</p>")
    doc2 = KP.parse(out)
    assert doc2.body().html() == out


def test_comment_clone():
    c1 = COMMENT.clone()
    assert c1 is not COMMENT
    assert c1.get_data() == COMMENT.get_data()
    c1.set_data("New")
    assert c1.get_data() == "New"
    assert c1.get_data() != COMMENT.get_data()


def test_is_xml_declaration():
    assert not COMMENT.is_xml_declaration()
    assert DECL.is_xml_declaration()


def test_as_xml_declaration():
    decl = DECL.as_xml_declaration()
    assert decl is not None
    assert isinstance(decl, XmlDeclaration)


# --- DocumentTypeTest ------------------------------------------------------

def test_doctype_blank_name_ok():
    DocumentType("", "", "")
    DocumentType("html", "", "")


def test_doctype_outer_html_generation():
    html5 = DocumentType("html", "", "")
    assert html5.outer_html() == "<!doctype html>"
    public_doctype = DocumentType("html", "-//IETF//DTD HTML//", "")
    assert public_doctype.outer_html() == \
        '<!DOCTYPE html PUBLIC "-//IETF//DTD HTML//">'
    system_doctype = DocumentType(
        "html", "",
        "http://www.ibm.com/data/dtd/v11/ibmxhtml1-transitional.dtd")
    assert system_doctype.outer_html() == (
        '<!DOCTYPE html SYSTEM '
        '"http://www.ibm.com/data/dtd/v11/ibmxhtml1-transitional.dtd">')
    combo = DocumentType("notHtml", "--public", "--system")
    assert combo.outer_html() == \
        '<!DOCTYPE notHtml PUBLIC "--public" "--system">'
    assert combo.name == "notHtml"
    assert combo.public_id == "--public"
    assert combo.system_id == "--system"


def _html_doctype_output(src):
    return KP.parse(src).child_nodes()[0].outer_html()


def _xml_doctype_output(src):
    return parse_xml(src).child_nodes()[0].outer_html()


def test_doctype_round_trip():
    base = "<!DOCTYPE html>"
    assert _html_doctype_output(base) == "<!doctype html>"
    assert _xml_doctype_output(base) == base
    public_doc = ('<!DOCTYPE html PUBLIC "-//W3C//DTD XHTML 1.0 '
                  'Transitional//EN" '
                  '"http://www.w3.org/TR/xhtml1/DTD/'
                  'xhtml1-transitional.dtd">')
    assert _html_doctype_output(public_doc) == public_doc
    assert _xml_doctype_output(public_doc) == public_doc
    system_doc = '<!DOCTYPE html SYSTEM "exampledtdfile.dtd">'
    assert _html_doctype_output(system_doc) == system_doc
    assert _xml_doctype_output(system_doc) == system_doc
    legacy_doc = '<!DOCTYPE html SYSTEM "about:legacy-compat">'
    assert _html_doctype_output(legacy_doc) == legacy_doc
    assert _xml_doctype_output(legacy_doc) == legacy_doc


# --- LeafNodeTest ----------------------------------------------------------

def _has_any_attributes(node):
    found = [False]

    def head(n, depth):
        if n.has_attributes():
            found[0] = True
            return STOP
        return CONTINUE

    filter_traverse(head, node)
    return found[0]


def test_does_not_get_attributes_too_easily():
    # we must not materialize attribute maps on nodes as a side effect
    body = "<p>One <!-- Two --> Three<![CDATA[Four]]></p>"
    doc = KP.parse(body)
    html = doc.children()[0]
    assert not _has_any_attributes(html)
    doc.outer_html()
    assert not _has_any_attributes(html)
    els = doc.select("p")
    p = els[0]
    assert len(els) == 1
    assert not _has_any_attributes(html)
    els = doc.select("p.none")
    assert not _has_any_attributes(html)
    assert p.id() == ""
    assert not p.has_class("Foobs")
    assert not _has_any_attributes(html)
    p.add_class("Foobs")
    assert p.has_class("Foobs")
    assert _has_any_attributes(html)
    assert _has_any_attributes(p)
    attributes = p.attributes()
    assert attributes.has_key("class")
    p.clear_attributes()
    assert not _has_any_attributes(p)
    assert not _has_any_attributes(html)
    assert not attributes.has_key("class")


# --- NodeStreamTest --------------------------------------------------------

STREAM_HTML = "<div id=1><p>One<p>Two</div><div id=2><p>Three<p>Four</div>"


def test_can_stream():
    doc = KP.parse(STREAM_HTML)
    seen = []
    for node in doc.node_stream():
        track_seen(node, seen)
    assert "".join(seen) == \
        "#root;html;head;body;div#1;p;One;p;Two;div#2;p;Three;p;Four;"


def test_can_stream_count():
    doc = KP.parse(STREAM_HTML)
    assert sum(1 for _ in doc.node_stream()) == 14


def test_can_find_first():
    doc = KP.parse(STREAM_HTML)
    first = next(iter(doc.node_stream()), None)
    assert first is doc


def test_can_filter_stream():
    doc = KP.parse(STREAM_HTML)
    seen = []
    for node in filter(lambda n: isinstance(n, TextNode), doc.node_stream()):
        track_seen(node, seen)
    assert "".join(seen) == "One;Two;Three;Four;"


def test_can_remove_via_stream():
    html = ("<div id=1><p>One<p>Two</div><div id=2><p>Three<p>Four</div>"
            "<div id=3><p>Five")
    doc = KP.parse(html)
    for node in [n for n in doc.node_stream()
                 if isinstance(n, Element)
                 and n.attr("id") in ("1", "2")]:
        node.remove()
    assert_contents(doc, "#root;html;head;body;div#3;p;Five;")


def test_element_stream():
    doc = KP.parse(STREAM_HTML)
    seen = []
    for el in doc.stream():
        track_seen(el, seen)
    assert "".join(seen) == "#root;html;head;body;div#1;p;p;div#2;p;p;"
