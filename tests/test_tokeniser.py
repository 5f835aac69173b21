"""TokeniserTest tranche — translated from reference
ksoup-test/.../parser/TokeniserTest.kt. The reference drives a 2 KB
ring-buffer boundary (CharacterReader.BufferSize); our reader holds the
whole document, but the same large inputs exercise the bulk-scan fast
paths, so the goldens carry over with BUFFER_SIZE = 2048."""

from ksoup_ray.engine import parser as KP
from ksoup_ray.engine.dom import CDataNode, Comment, TextNode
from ksoup_ray.engine.elements import Elements
from ksoup_ray.engine.entities import WIN1252_EXTENSIONS
from ksoup_ray.engine.treebuilder import PRESERVE_CASE

BUFFER_SIZE = 2048  # reference CharacterReader.BufferSize


def test_buffer_up_in_attribute_val():
    for quote in ('"', "'", ""):
        preamble = f"<img src={quote}"
        tail = "b" * 46
        fill = "a" * (BUFFER_SIZE - len(preamble))
        html = preamble + fill + "X" + tail + quote + ">\n"
        doc = KP.parse(html)
        src = Elements(doc.select("img")).attr("src")
        assert "X" in src, f"Handles for quote {quote}"
        assert tail in src


def test_handle_super_large_tag_names():
    tag = ""
    while len(tag) < BUFFER_SIZE:
        tag += "LargeTagName"
    html = f"<{tag}>One</{tag}>"
    doc = KP.parse(html, settings=PRESERVE_CASE)
    els = doc.select(tag)
    assert len(els) == 1
    el = els[0]
    assert el.text() == "One"
    assert el.tag_name() == tag


def test_handle_super_large_attribute_name():
    attr_name = ""
    while len(attr_name) < BUFFER_SIZE:
        attr_name += "LargAttributeName"
    html = f"<p {attr_name}=foo>One</p>"
    doc = KP.parse(html)
    els = doc.get_elements_by_attribute(attr_name.lower())
    assert len(els) == 1
    el = els[0]
    assert el.text() == "One"
    key, value = next(iter(el.attributes()))
    assert key == attr_name.lower()
    assert value == "foo"


def test_handle_large_text():
    text = ""
    while len(text) < BUFFER_SIZE:
        text += "A Large Amount of Text"
    doc = KP.parse(f"<p>{text}</p>")
    els = doc.select("p")
    assert len(els) == 1
    assert els[0].text() == text


def test_handle_large_comment():
    comment = ""
    while len(comment) < BUFFER_SIZE:
        comment += "Quite a comment "
    doc = KP.parse(f"<p><!-- {comment} --></p>")
    els = doc.select("p")
    assert len(els) == 1
    child = els[0].child_nodes()[0]
    assert isinstance(child, Comment)
    assert child.get_data() == f" {comment} "


def test_handle_large_cdata():
    cdata = ""
    while len(cdata) < BUFFER_SIZE:
        cdata += "Quite a lot of CDATA <><><><>"
    doc = KP.parse(f"<p><![CDATA[{cdata}]]></p>")
    els = doc.select("p")
    assert len(els) == 1
    el = els[0]
    child = el.child_nodes()[0]
    assert isinstance(child, TextNode)
    assert el.text() == cdata
    assert child.get_whole_text() == cdata


def test_handle_large_title():
    title = ""
    while len(title) < BUFFER_SIZE:
        title += "Quite a long title"
    doc = KP.parse(f"<title>{title}</title>")
    els = doc.select("title")
    assert len(els) == 1
    el = els[0]
    child = el.child_nodes()[0]
    assert isinstance(child, TextNode)
    assert el.text() == title
    assert child.get_whole_text() == title
    assert doc.title() == title


def test_cp1252_entities():
    assert KP.parse("&#0128;").text() == "€"
    assert KP.parse("&#0130;").text() == "‚"
    assert KP.parse("&#x80;").text() == "€"


def test_cp1252_entities_produce_error():
    doc = KP.parse("<html><body>&#0128;</body></html>", track_errors=True)
    assert doc.text() == "€"
    assert any("character" in e.lower() or "reference" in e.lower()
               for e in doc.error_list)


def test_cp1252_substitution_table():
    for i, mapped in enumerate(WIN1252_EXTENSIONS):
        s = bytes([i + 0x80]).decode("windows-1252", errors="replace")
        assert len(s) == 1
        if s[0] == "�":
            continue
        assert ord(s[0]) == mapped, f"At: {i}"


def test_can_parse_very_long_bogus_comment():
    comment_data = ""
    while len(comment_data) < BUFFER_SIZE:
        comment_data += "blah blah blah blah "
    doc = KP.parse(f"<html><body><!{comment_data}></body></html>")
    comment_node = doc.body().child_nodes()[0]
    assert isinstance(comment_node, Comment)
    assert comment_node.get_data() == comment_data


def test_can_parse_cdata_ending_at_edge_of_buffer():
    cdata_start = "<![CDATA["
    buf_len = BUFFER_SIZE - len(cdata_start) - 1
    cdata_contents = "x" * buf_len
    doc = KP.parse(cdata_start + cdata_contents + "]]>")
    cdata_node = doc.body().child_nodes()[0]
    assert isinstance(cdata_node, CDataNode)
    assert cdata_node.text() == cdata_contents
