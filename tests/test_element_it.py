"""ElementIT — stress/overflow tests (reference
ksoup-test/.../nodes/ElementIT.kt): fast bulk reparenting and
no-recursion guarantees on deep DOMs."""

import time

from ksoup_ray.engine import parser as KP
from ksoup_ray.engine.dom import Document, Element

ROWS = 50000      # reference uses 300k; scaled for CI wall-time, same
                  # complexity class assertion (runtime bound is linear)
DEPTH = 20000     # reference 50k; recursion would die far earlier


def test_fast_reparent():
    html = "".join(f"<p>El-{i}</p>" for i in range(1, ROWS + 1))
    doc = KP.parse(html)
    start = time.time()
    wrapper = Element("div")
    child_nodes = doc.body().child_nodes()
    wrapper.insert_children(0, list(child_nodes))
    runtime = time.time() - start
    assert len(wrapper.child_nodes()) == ROWS
    assert len(doc.body().child_nodes()) == 0  # all moved
    doc.body().empty().append_child(wrapper)
    actual = doc.body().children()[0]
    assert actual is wrapper
    assert actual.children()[0].text() == "El-1"
    assert actual.children()[ROWS - 1].text() == f"El-{ROWS}"
    assert runtime <= 20


def test_fast_reparent_existing_content():
    html = "".join(f"<p>El-{i}</p>" for i in range(1, ROWS + 1))
    doc = KP.parse(html)
    start = time.time()
    wrapper = Element("div")
    wrapper.append_html("<p>Prior Content</p>")
    wrapper.append_html("<p>End Content</p>")
    assert len(wrapper.child_nodes()) == 2
    child_nodes = doc.body().child_nodes()
    wrapper.insert_children(1, list(child_nodes))
    runtime = time.time() - start
    assert len(wrapper.child_nodes()) == ROWS + 2
    assert len(doc.body().child_nodes()) == 0
    doc.body().empty().append_child(wrapper)
    actual = doc.body().children()[0]
    assert actual is wrapper
    assert actual.children()[0].text() == "Prior Content"
    assert actual.children()[1].text() == "El-1"
    assert actual.children()[ROWS].text() == f"El-{ROWS}"
    assert actual.children()[ROWS + 1].text() == "End Content"
    assert runtime <= 20


def test_has_text_no_overflow():
    doc = Document("https://example.com/")
    el = doc.body()
    for _ in range(DEPTH + 1):
        el = el.append_element("p")
    assert not doc.has_text()
    el.set_text("Hello")
    assert doc.has_text()
    assert doc.text() == el.text()


def test_data_no_overflow():
    doc = Document("https://example.com/")
    el = doc.body()
    for _ in range(DEPTH + 1):
        el = el.append_element("p")
    script = el.append_element("script")
    script.set_text("script")  # script holds data nodes, not text
    assert not script.has_text()
    assert script.data() == "script"
    assert doc.data() == el.data()


def test_parents_no_overflow():
    doc = Document("https://example.com/")
    el = doc.body()
    for _ in range(DEPTH + 1):
        el = el.append_element("p")
    parents = el.parents()
    assert len(parents) == DEPTH + 2  # p chain + html and body
    assert el.owner_document() is doc


def test_wrap_no_overflow():
    doc = Document("https://example.com/")
    el = doc.body().append_element("p")
    wrap_html = "<div>" * (DEPTH + 1)
    el.wrap(wrap_html)
    html = doc.body().html()
    assert html.startswith("<div>")
    assert len(el.parents()) == DEPTH + 3
