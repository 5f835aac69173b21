"""TokeniserStateTest.kt translations — edge transitions of the 67-state
machine (expected strings verbatim from the reference)."""

import re

from ksoup_ray.engine import parser as P

WS = ["\t", "\n", "\r", "\f", " "]


def strip_newlines(text: str) -> str:
    return re.sub(r"\n\s*", "", text)


def test_character_reference_in_rcdata():
    doc = P.parse("<textarea>You&I</textarea>")
    assert doc.select_first("textarea").text() == "You&I"


def test_before_tag_name():
    for c in WS:
        doc = P.parse(f"<div{c}>test</div>")
        assert doc.select_first("div").text() == "test"


def test_end_tag_open():
    assert P.parse("<div>hello world</").select_first("div").text() == \
        "hello world</"
    assert P.parse("<div>hello world</div>").select_first("div").text() == \
        "hello world"
    assert P.parse("<div>fake</></div>").select_first("div").text() == "fake"
    assert P.parse("<div>fake</?</div>").select_first("div").text() == "fake"


def test_rcdata_lessthan_sign():
    assert P.parse("<textarea><fake></textarea>") \
        .select_first("textarea").text() == "<fake>"
    assert P.parse("<textarea><open") \
        .select_first("textarea").text() == ""
    assert P.parse("<textarea>hello world</?fake</textarea>") \
        .select_first("textarea").text() == "hello world</?fake"


def test_rcdata_end_tag_name():
    for c in WS:
        doc = P.parse(f"<textarea>data</textarea{c}>")
        assert doc.select_first("textarea").text() == "data"


def test_comment_end_coverage():
    html = ("<html><head></head><body><img src=foo>"
            "<!-- <table><tr><td></table> --! --- --><p>Hello</p>"
            "</body></html>")
    doc = P.parse(html)
    comment = doc.body().child_nodes()[1]
    assert comment.get_data() == " <table><tr><td></table> --! --- "
    p = doc.body().child(1)
    assert p.child_nodes()[0].get_whole_text() == "Hello"


def test_comment_end_bang_coverage():
    html = ("<html><head></head><body><img src=foo>"
            "<!-- <table><tr><td></table> --!---!><p>Hello</p>"
            "</body></html>")
    doc = P.parse(html)
    comment = doc.body().child_nodes()[1]
    assert comment.get_data() == " <table><tr><td></table> --!-"


def test_handles_less_in_tag_as_new_tag():
    # TokeniserStateTest.kt:189 — out of spec, clear author intent
    doc = P.parse("<p\n<p<div id=one <span>Two")
    assert strip_newlines(doc.body().html()) == \
        '<p></p><p></p><div id="one"><span>Two</span></div>'


def test_rcdata_null():
    doc = P.parse("<title>One \x00Two</title>")
    assert doc.title() == "One �Two"


def test_plaintext():
    doc = P.parse("<div>One<plaintext><div>Two</plaintext>\x00no < Return")
    assert strip_newlines(doc.outer_html()) == (
        "<html><head></head><body><div>One<plaintext>&lt;div&gt;Two"
        "&lt;/plaintext&gt;�no &lt; Return</plaintext></div>"
        "</body></html>")


def test_null_in_tag():
    doc = P.parse("<di\x00v>One</di\x00v>Two")
    assert doc.body().html() == "<di�v>\n One\n</di�v>Two"


def test_attribute_val_unquoted():
    doc = P.parse("<p name=foo&lt;bar>")
    assert doc.select_first("p").attr("name") == "foo<bar"
    doc = P.parse("<p foo=")
    assert doc.body().html() == "<p foo></p>"
