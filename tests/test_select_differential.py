"""Query-engine differential — an INDEPENDENT naive matcher (straight
recursive definitions, no cost ordering, no memos) compared against
the optimized evaluator engine over randomized documents and queries.
Any divergence is a bug in one of the two; the naive side is small
enough to eyeball."""

import random

from ksoup_ray.engine import parser as KP
from ksoup_ray.engine.dom import Element

TAGS = ["div", "p", "span", "b", "a", "li", "ul", "section", "h1"]
CLASSES = ["x", "y", "z"]


def _gen_doc(rng):
    parts = []
    for i in range(rng.randint(5, 40)):
        t = rng.choice(TAGS)
        bits = [t]
        if rng.random() < 0.4:
            bits.append(f'id=i{rng.randint(0, 30)}')
        if rng.random() < 0.5:
            bits.append(f'class="{" ".join(rng.sample(CLASSES, rng.randint(1, 2)))}"')
        if rng.random() < 0.3:
            bits.append(f'data-k="{rng.randint(0, 3)}"')
        parts.append(f'<{" ".join(bits)}>t{i}')
        if rng.random() < 0.5:
            parts.append(f"</{t}>")
    return KP.parse("".join(parts))


# --- the naive matchers -------------------------------------------------

def n_tag(name):
    return lambda el: el.normal_name() == name


def n_id(v):
    return lambda el: el.id() == v


def n_class(c):
    return lambda el: c in el.class_names()


def n_attr(k):
    return lambda el: el.has_attr(k)


def n_attr_val(k, v):
    return lambda el: el.has_attr(k) and el.attr(k) == v


def n_descendant(anc_pred, el_pred):
    def f(el):
        if not el_pred(el):
            return False
        p = el.parent()
        while isinstance(p, Element):
            if anc_pred(p):
                return True
            p = p.parent()
        return False
    return f


def n_child(parent_pred, el_pred):
    def f(el):
        p = el.parent()
        return el_pred(el) and isinstance(p, Element) and parent_pred(p)
    return f


def n_adjacent(prev_pred, el_pred):
    def f(el):
        prev = el.previous_element_sibling()
        return el_pred(el) and prev is not None and prev_pred(prev)
    return f


def n_general_sibling(prev_pred, el_pred):
    def f(el):
        if not el_pred(el):
            return False
        prev = el.previous_element_sibling()
        while prev is not None:
            if prev_pred(prev):
                return True
            prev = prev.previous_element_sibling()
        return False
    return f


def n_first_child(pred):
    def f(el):
        p = el.parent()
        return pred(el) and isinstance(p, Element) and \
            p.children()[0] is el
    return f


def n_not(pred, inner):
    return lambda el: pred(el) and not inner(el)


def _gen_query(rng):
    """Returns (css_string, naive_predicate)."""
    def simple():
        kind = rng.randint(0, 4)
        if kind == 0:
            t = rng.choice(TAGS)
            return t, n_tag(t)
        if kind == 1:
            v = f"i{rng.randint(0, 30)}"
            return f"#{v}", n_id(v)
        if kind == 2:
            c = rng.choice(CLASSES)
            return f".{c}", n_class(c)
        if kind == 3:
            return "[data-k]", n_attr("data-k")
        v = str(rng.randint(0, 3))
        return f"[data-k={v}]", n_attr_val("data-k", v)

    def compound():
        t = rng.choice(TAGS)
        c = rng.choice(CLASSES)
        return f"{t}.{c}", lambda el, _t=t, _c=c: (
            el.normal_name() == _t and _c in el.class_names())

    def unit():
        return compound() if rng.random() < 0.3 else simple()

    kind = rng.randint(0, 5)
    if kind == 0:
        return unit()
    a_css, a_pred = unit()
    b_css, b_pred = unit()
    if kind == 1:
        return f"{a_css} {b_css}", n_descendant(a_pred, b_pred)
    if kind == 2:
        return f"{a_css} > {b_css}", n_child(a_pred, b_pred)
    if kind == 3:
        return f"{a_css} + {b_css}", n_adjacent(a_pred, b_pred)
    if kind == 4:
        return f"{a_css} ~ {b_css}", n_general_sibling(a_pred, b_pred)
    return f"{a_css}:not({b_css})", n_not(a_pred, b_pred)


def test_select_differential_random():
    rng = random.Random(20260817)
    checked = 0
    for _ in range(300):
        doc = _gen_doc(rng)
        all_els = list(doc.stream())
        for _ in range(8):
            css, pred = _gen_query(rng)
            engine = doc.select(css)
            naive = [el for el in all_els
                     if isinstance(el, Element) and pred(el)]
            assert list(engine) == naive, (css, doc.outer_html()[:400])
            checked += 1
    assert checked == 2400


def test_select_differential_first_child():
    rng = random.Random(7)
    for _ in range(100):
        doc = _gen_doc(rng)
        all_els = list(doc.stream())
        t = rng.choice(TAGS)
        css = f"{t}:first-child"
        engine = doc.select(css)
        naive = [el for el in all_els if n_first_child(n_tag(t))(el)]
        assert list(engine) == naive, (css, doc.outer_html()[:400])


def n_last_child(pred):
    def f(el):
        p = el.parent()
        return pred(el) and isinstance(p, Element) and \
            p.children()[-1] is el
    return f


def n_nth_child(n, pred):
    def f(el):
        p = el.parent()
        if not (pred(el) and isinstance(p, Element)):
            return False
        kids = p.children()
        return len(kids) >= n and kids[n - 1] is el
    return f


def n_empty(pred):
    def f(el):
        for child in el.child_nodes():
            name = child.node_name()
            if name == "#text":
                if child.get_whole_text() != "":
                    return False
            elif name not in ("#comment", "#doctype"):
                return False
        return pred(el)
    return f


def n_contains(sub, pred):
    sub = sub.lower()
    return lambda el: pred(el) and sub in el.text().lower()


def n_attr_starts(k, v):
    return lambda el: el.has_attr(k) and el.attr(k).startswith(v)


def n_attr_ends(k, v):
    return lambda el: el.has_attr(k) and el.attr(k).endswith(v)


def n_attr_contains(k, v):
    return lambda el: el.has_attr(k) and v in el.attr(k)


def test_select_differential_extended_forms():
    rng = random.Random(99)
    cases = 0
    for _ in range(200):
        doc = _gen_doc(rng)
        all_els = [e for e in doc.stream() if isinstance(e, Element)]
        t = rng.choice(TAGS)
        probes = [
            (f"{t}:last-child", n_last_child(n_tag(t))),
            (f"{t}:nth-child(2)", n_nth_child(2, n_tag(t))),
            (f"{t}:empty", n_empty(n_tag(t))),
            (f"{t}:contains(t1)", n_contains("t1", n_tag(t))),
            ('[class^="x"]', n_attr_starts("class", "x")),
            ('[class$="z"]', n_attr_ends("class", "z")),
            ('[class*="y"]', n_attr_contains("class", "y")),
        ]
        for css, pred in probes:
            engine = list(doc.select(css))
            naive = [el for el in all_els if pred(el)]
            assert engine == naive, (css, doc.outer_html()[:400])
            cases += 1
    assert cases == 1400
