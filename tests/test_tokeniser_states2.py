"""TokeniserStateTest tranche 2 — doctype public/system identifier
whitespace matrix and out-of-spec angle brackets (reference
ksoup-test/.../parser/TokeniserStateTest.kt; the buffer-boundary
unconsume cases are N/A — this engine scans the full string, no ring
buffer)."""

from ksoup_ray.engine import parser as KP

WHITESPACE = ["\t", "\n", "\r", "\f", " "]
QUOTE = ['"', "'"]


def _strip(s: str) -> str:
    return "".join(line.lstrip(" ") for line in s.split("\n"))


def test_public_identifiers_with_whitespace():
    expected = '<!DOCTYPE html PUBLIC "-//W3C//DTD HTML 4.0//EN">'
    for q in QUOTE:
        for ws in WHITESPACE:
            htmls = [
                f"<!DOCTYPE html{ws}PUBLIC {q}-//W3C//DTD HTML 4.0//EN{q}>",
                f"<!DOCTYPE html {ws}PUBLIC {q}-//W3C//DTD HTML 4.0//EN{q}>",
                f"<!DOCTYPE html PUBLIC{ws}{q}-//W3C//DTD HTML 4.0//EN{q}>",
                f"<!DOCTYPE html PUBLIC {ws}{q}-//W3C//DTD HTML 4.0//EN{q}>",
                f"<!DOCTYPE html PUBLIC {q}-//W3C//DTD HTML 4.0//EN{q}{ws}>",
                f"<!DOCTYPE html PUBLIC{q}-//W3C//DTD HTML 4.0//EN{q}{ws}>",
            ]
            for html in htmls:
                doc = KP.parse(html)
                assert doc.child_nodes()[0].outer_html() == expected, html


def test_system_identifiers_with_whitespace():
    expected = ('<!DOCTYPE html SYSTEM '
                '"http://www.w3.org/TR/REC-html40/strict.dtd">')
    url = "http://www.w3.org/TR/REC-html40/strict.dtd"
    for q in QUOTE:
        for ws in WHITESPACE:
            htmls = [
                f"<!DOCTYPE html{ws}SYSTEM {q}{url}{q}>",
                f"<!DOCTYPE html {ws}SYSTEM {q}{url}{q}>",
                f"<!DOCTYPE html SYSTEM{ws}{q}{url}{q}>",
                f"<!DOCTYPE html SYSTEM {ws}{q}{url}{q}>",
                f"<!DOCTYPE html SYSTEM {q}{url}{q}{ws}>",
                f"<!DOCTYPE html SYSTEM{q}{url}{q}{ws}>",
            ]
            for html in htmls:
                doc = KP.parse(html)
                assert doc.child_nodes()[0].outer_html() == expected, html


def test_public_and_system_identifiers_with_whitespace():
    expected = ('<!DOCTYPE html PUBLIC "-//W3C//DTD HTML 4.0//EN" '
                '"http://www.w3.org/TR/REC-html40/strict.dtd">')
    url = "http://www.w3.org/TR/REC-html40/strict.dtd"
    for q in QUOTE:
        for ws in WHITESPACE:
            htmls = [
                f"<!DOCTYPE html PUBLIC {q}-//W3C//DTD HTML 4.0//EN{q}"
                f"{ws}{q}{url}{q}>",
                f"<!DOCTYPE html PUBLIC {q}-//W3C//DTD HTML 4.0//EN{q}"
                f"{q}{url}{q}>",
            ]
            for html in htmls:
                doc = KP.parse(html)
                assert doc.child_nodes()[0].outer_html() == expected, html


def test_handles_less_in_tag_than_as_new_tag():
    # out of spec, but clear author intent
    doc = KP.parse("<p\n<p<div id=one <span>Two")
    assert _strip(doc.body().html()) == \
        '<p></p><p></p><div id="one"><span>Two</span></div>'


def test_opening_angle_bracket_instead_of_attribute_recovers():
    doc = KP.parse("<html <", track_errors=True)
    assert len(doc.error_list) >= 1


def test_malformed_self_closing_tag_recovers():
    doc = KP.parse("<html /ouch", track_errors=True)
    assert len(doc.error_list) >= 1


def test_opening_angle_bracket_in_tag_name_recovers():
    doc = KP.parse("<html<", track_errors=True)
    assert len(doc.error_list) >= 1
