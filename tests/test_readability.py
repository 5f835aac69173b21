"""Readability-style main-content extraction (stages/readability.py):
text-density scoring with a link penalty — tag-agnostic boilerplate
removal, the Boilerpipe/jusText operator class."""

import pyarrow as pa
import pytest

from ksoup_ray.stages.readability import (main_content_bytes,
                                          main_content_of)
from ksoup_ray.engine import parser as P


def _mc(html: str) -> str:
    return main_content_of(P.parse(html, ""))


def test_nav_farm_loses_to_article_div():
    html = ("<body><nav><a href=a>home</a> <a href=b>about us</a> "
            "<a href=c>contact page now</a></nav>"
            "<div id=c><p>real article text</p><p>second para</p></div>"
            "</body>")
    assert _mc(html) == "real article text second para"


def test_tag_agnostic_link_farm_div_loses():
    # both blocks are <div>: only density can tell them apart
    html = ("<div class=side><a>one link</a><a>two link</a>"
            "<a>three link</a><a>four link</a><a>five link</a></div>"
            "<div class=art>short body prose wins anyway</div>")
    assert _mc(html) == "short body prose wins anyway"


def test_naive_body_text_would_differ():
    html = ("<body><nav><a href=x>more 0</a> <a href=y>more 1</a></nav>"
            "<div><p>content here</p></div></body>")
    doc = P.parse(html, "")
    assert main_content_of(doc) == "content here"
    assert doc.body().text() != "content here"   # nav junk included


def test_no_links_deepest_tiebreak():
    # body/div/p all carry the same mass -> deepest (the <p>) wins,
    # and its text equals the whole content anyway
    assert _mc("<div><p>only text</p></div>") == "only text"


def test_multi_para_container_beats_single_para():
    html = "<div><p>alpha beta</p><p>gamma delta</p></div>"
    assert _mc(html) == "alpha beta gamma delta"


def test_script_style_comments_carry_no_mass():
    html = ("<div><script>var x='lots of text that must not count';"
            "</script><style>p{x}</style><!-- comment mass -->"
            "<p>tiny</p></div>"
            "<div><a>link text longer than tiny</a></div>")
    assert _mc(html) == "tiny"


def test_empty_and_degenerate():
    assert main_content_bytes(b"") == ""
    assert main_content_bytes(b"<html><body></body></html>") == ""
    assert main_content_bytes(b"<p>x</p>") == "x"


def test_whole_page_inside_anchor_still_returns_something():
    # everything negative: max score is still well-defined and text()
    # of the winner is returned (no crash, deterministic)
    html = "<body><a href=x>all of it is a link</a></body>"
    out = _mc(html)
    assert isinstance(out, str)


def test_synth_parity_sample():
    from ksoup_ray.sources.synth import render_page
    for doc_id in (0, 1, 3, 7, 10, 17, 24, 31):
        _, raw, expected = render_page(
            doc_id, " ".join(f"w{i}" for i in range(5 + doc_id)), "en")
        assert main_content_bytes(raw) == expected


def test_ray_stage_end_to_end(ray_session):
    import ray.data as rd
    from ksoup_ray.stages.readability import extract_main_content
    rows = [{"url": f"u{i}",
             "html": (f"<body><nav><a href=x>more {i}</a></nav>"
                      f"<div><p>doc {i} body text</p></div>"
                      f"</body>").encode()}
            for i in range(8)]
    out = extract_main_content(rd.from_items(rows), concurrency=1,
                               batch_size=4).to_pandas()
    assert sorted(out["main_text"]) == sorted(
        f"doc {i} body text" for i in range(8))
