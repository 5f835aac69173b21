"""HtmlTreeBuilderStateTest + XmlTreeBuilderTest remainder — constant
tag-set hygiene and nested anchor adoption (reference
parser/HtmlTreeBuilderStateTest.kt, parser/XmlTreeBuilderTest.kt)."""

from ksoup_ray.engine import parser as KP
from ksoup_ray.engine import treebuilder as TB
from ksoup_ray.engine.tags import is_known_tag


def _constant_sets():
    """The tree builder's tag-search constants (frozensets here; the
    reference uses sorted arrays + binary search)."""
    return [(name, val) for name, val in vars(TB).items()
            if name.startswith("C_") and isinstance(val, frozenset)]


def test_constant_arrays_exist():
    consts = _constant_sets()
    # reference has 40 sorted arrays; our frozenset dispatch tables
    # cover the same tag groups (count differs: set-union folding)
    assert len(consts) >= 25


def test_tag_searches_are_known_tags():
    skip = {"input"}  # InBodyStartInputAttribs holds attr names too (ref)
    unknown = []
    for name, const in _constant_sets():
        if "attrib" in name.lower():
            continue
        for tag_name in const:
            if not is_known_tag(tag_name):
                unknown.append((name, tag_name))
    assert unknown == [], unknown


def test_nested_anchor_elements_01():
    html = ("<html>\n  <body>\n    <a href='#1'>\n        <div>\n"
            "          <a href='#2'>child</a>\n        </div>\n"
            "    </a>\n  </body>\n</html>")
    assert KP.parse(html).outer_html() == (
        "<html>\n <head></head>\n <body>\n"
        '  <a href="#1"> </a>\n  <div>\n'
        '   <a href="#1"> </a><a href="#2">child</a>\n  </div>\n'
        " </body>\n</html>")


def test_nested_anchor_elements_02():
    html = ("<html>\n  <body>\n    <a href='#1'>\n      <div>\n"
            "        <div>\n          <a href='#2'>child</a>\n"
            "        </div>\n      </div>\n    </a>\n  </body>\n</html>")
    assert KP.parse(html).outer_html() == (
        "<html>\n <head></head>\n <body>\n"
        '  <a href="#1"> </a>\n  <div>\n   <a href="#1"> </a>\n   <div>\n'
        '    <a href="#1"> </a><a href="#2">child</a>\n   </div>\n'
        "  </div>\n </body>\n</html>")


def test_supply_parser_to_ksoup_class():
    xml = "<doc><val>One<val>Two</val></bar>Three</doc>"
    doc = KP.parse_xml(xml, "http://foo.com/")
    assert "".join(line.lstrip(" ") for line in doc.html().split("\n")) == \
        "<doc><val>One<val>Two</val>Three</val></doc>"


def test_xml_parse_defaults_to_xml_output_syntax():
    doc = KP.parse_xml("x")
    assert doc.output_settings.syntax == "xml"
