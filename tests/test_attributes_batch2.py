"""AttributesTest / AttributeTest tranche 2 — iterator semantics,
internal keys, boolean collapsing, equality/clone (reference
ksoup-test/.../nodes/AttributesTest.kt, AttributeTest.kt). Java's
mutable-iterator cases are adapted to the Python surface (rename /
remove / dict-iteration rules)."""

import pytest

from ksoup_ray.engine import parser as KP
from ksoup_ray.engine.dom import Attributes


def _build(*pairs):
    a = Attributes()
    for k, v in pairs:
        a.put(k, v)
    return a


def test_html():
    a = _build(("Tot", "a&p"), ("Hello", "There"), ("data-name", "Ksoup"))
    assert a.size() == 3
    assert a.has_key("Tot") and a.has_key("Hello") and a.has_key("data-name")
    assert not a.has_key("tot")
    assert a.has_key_ignore_case("tot")
    assert a.get_ignore_case("hEllo") == "There"
    dataset = a.dataset()
    assert dataset == {"name": "Ksoup"}
    assert a.get("tot") == ""
    assert a.get("Tot") == "a&p"
    assert a.get_ignore_case("tot") == "a&p"
    assert a.html() == ' Tot="a&amp;p" Hello="There" data-name="Ksoup"'


def test_iterator_removable():
    a = _build(("Tot", "a&p"), ("Hello", "There"), ("data-name", "Ksoup"))
    assert a.has_key("Tot")
    a.remove("Tot")
    assert a.size() == 2
    assert a.get("Hello") == "There"
    assert not a.has_key("Tot")


def test_iterator_updateable():
    a = _build(("Tot", "a&p"), ("Hello", "There"))
    assert not a.has_key("Foo")
    a.rename("Tot", "Foo")
    a.rename("Hello", "Bar")
    a.put("Bar", "Qux")
    assert a.get("Foo") == "a&p"
    assert a.get("Bar") == "Qux"
    assert not a.has_key("Tot") and not a.has_key("Hello")


def test_iterator_has_next():
    a = _build(("Tot", "1"), ("Hello", "2"), ("data-name", "3"))
    seen = 0
    for _k, v in a:
        seen += 1
        assert v == str(seen)
    assert seen == 3


def test_iterator():
    datas = [("Tot", "raul"), ("Hello", "pismuth"), ("data-name", "Ksoup")]
    a = _build(*datas)
    assert list(a) == datas


def test_iterator_skips_internal():
    a = Attributes()
    a.put("One", "One")
    a.put(Attributes.internal_key("baseUri"), "example.com")
    a.put("Two", "Two")
    a.put(Attributes.internal_key("another"), "example.com")
    assert [k for k, _ in a] == ["One", "Two"]


def test_iterator_exhausted_raises():
    a = _build(("One", "one"), ("Two", "two"))
    it = iter(a)
    assert next(it)[0] == "One" and next(it)[0] == "Two"
    with pytest.raises(StopIteration):
        next(it)


def test_list_skips_internal():
    a = Attributes()
    a.put("One", "One")
    a.put(Attributes.internal_key("baseUri"), "example.com")
    a.put("Two", "Two")
    a.put(Attributes.internal_key("another"), "example.com")
    assert a.as_list() == [("One", "One"), ("Two", "Two")]


def test_html_skips_internals():
    a = Attributes()
    a.put("One", "One")
    a.put(Attributes.internal_key("baseUri"), "example.com")
    a.put("Two", "Two")
    a.put(Attributes.internal_key("another"), "example.com")
    assert a.html() == ' One="One" Two="Two"'


def test_iterator_empty():
    a = Attributes()
    assert list(a) == []


def test_iterator_remove():
    doc = KP.parse("<div 1=1 2=2 3=3 4=4>")
    el = doc.expect_first("div")
    attrs = el.attributes()
    seen = 0
    for k, _v in list(attrs):
        seen += 1
        attrs.remove(k)
    assert seen == 4
    assert attrs.size() == 0
    assert el.attributes_size() == 0


def test_iterator_remove_concurrent_raises():
    # Java throws ConcurrentModificationException; Python dict iteration
    # raises RuntimeError on mutation mid-iteration — same contract
    doc = KP.parse("<div 1=1 2=2 3=3 4=4>")
    el = doc.expect_first("div")
    attrs = el.attributes()
    with pytest.raises(RuntimeError):
        for k, _v in attrs:
            el.remove_attr(k)


def test_remove_case_sensitive():
    a = _build(("Tot", "a&p"), ("tot", "one"), ("Hello", "There"),
               ("hello", "There"), ("data-name", "Ksoup"))
    assert a.size() == 5
    a.remove("Tot")
    a.remove("Hello")
    assert a.size() == 3
    assert a.has_key("tot")
    assert not a.has_key("Tot")


def test_set_key_consistency():
    a = _build(("a", "a"))
    for k, _v in list(a):
        a.rename(k, "b")
    assert not a.has_key("a")
    assert a.has_key("b")


def test_boolean_declared_values():
    ats = _build(("a", "a"), ("B", "b"), ("c", None))
    assert ats.has_declared_value("a")
    assert not ats.has_declared_value("A")
    assert ats.has_declared_value_ignore_case("A")
    assert not ats.has_declared_value("c")
    assert not ats.has_declared_value("C")
    assert not ats.has_declared_value_ignore_case("C")


def test_size_when_has_internal():
    a = _build(("One", "One"), ("Two", "Two"))
    assert a.size() == 2
    a.put(Attributes.internal_key("baseUri"), "example.com")
    a.put(Attributes.internal_key("another"), "example.com")
    a.put(Attributes.internal_key("last"), "example.com")
    a.remove(Attributes.internal_key("last"))
    # deviation from AttributesTest.kt:testSizeWhenHasInternal — the
    # reference counts internals in size() but flags it as a bug
    # (Attributes.kt:319 "todo - exclude internal attributes"); we
    # implement the intended semantics (internals never counted)
    assert a.size() == 2
    assert len(a.as_list()) == 2


def test_booleans_collapse():
    # unknown=null, and known like async=null/""/async collapse
    el = KP.parse('<a foo bar="" async=async qux=qux defer=deferring '
                  'ismap inert="">').select_first("a")
    assert el.attributes().html() == (
        ' foo bar="" async qux="qux" defer="deferring" ismap inert')


def test_boolean_null_attributes_consistent():
    a = _build(("key", None))
    assert a.html() == " key"


def test_boolean_empty_string():
    a = _build(("checked", ""))
    assert a.html() == " checked"


def test_boolean_case_insensitive():
    a = _build(("checked", "CHECKED"))
    assert a.html() == " checked"


def test_equals_is_order_insensitive():
    one = _build(("Key1", "Val1"), ("Key2", "Val2"), ("Key3", None))
    two = _build(("Key1", "Val1"), ("Key2", "Val2"), ("Key3", None))
    three = _build(("Key2", "Val2"), ("Key3", None), ("Key1", "Val1"))
    four = _build(("Key1", "Val1"), ("Key2", "Val2"), ("Key3", None),
                  ("Key4", "Val4"))
    assert one == one.clone()
    assert one == two == three
    assert three == three.clone()
    assert four == four.clone()
    assert one != four


def test_clone_attributes():
    one = _build(("Key1", "Val1"), ("Key2", "Val2"), ("Key3", None))
    two = one.clone()
    assert two.size() == 3
    assert two.get("Key2") == "Val2"
    assert one == two
    two.put("Key4", "Val4")
    assert two.size() == 4 and one.size() == 3
    assert one != two


# --- AttributeTest.kt remainder ---

def test_supplementary_character_in_attribute_key_and_value():
    s = chr(135361)
    a = _build((s, f"A{s}B"))
    assert a.html() == f' {s}="A{s}B"'
    el = KP.parse(f"<p {s}='A{s}B'>").select_first("p")
    assert el.attributes().html() == f' {s}="A{s}B"'


def test_boolean_attributes_are_not_case_sensitive():
    from ksoup_ray.engine.dom import is_boolean_attribute
    from ksoup_ray.engine.treebuilder import ParseSettings
    assert is_boolean_attribute("required")
    assert is_boolean_attribute("REQUIRED")
    assert is_boolean_attribute("rEQUIREd")
    assert not is_boolean_attribute("random string")
    html = "<a href=autofocus REQUIRED>One</a>"
    doc = KP.parse(html)
    assert doc.select_first("a").outer_html() == \
        '<a href="autofocus" required>One</a>'
    doc2 = KP.parse(html, settings=ParseSettings(True, True))
    assert doc2.select_first("a").outer_html() == \
        '<a href="autofocus" REQUIRED>One</a>'


# --- Attribute object view (AttributeTest.kt remainder) ---

def test_validates_keys_not_empty():
    from ksoup_ray.engine.dom import Attribute
    with pytest.raises(ValueError):
        Attribute(" ", "Check")


def test_validates_keys_not_empty_via_set():
    from ksoup_ray.engine.dom import Attribute
    attr = Attribute("One", "Check")
    with pytest.raises(ValueError):
        attr.set_key(" ")


def test_setters_on_orphan_attribute():
    from ksoup_ray.engine.dom import Attribute
    attr = Attribute("one", "two")
    attr.set_key("three")
    old_val = attr.set_value("four")
    assert old_val == "two"
    assert attr.key == "three"
    assert attr.value == "four"
    assert attr.parent is None


def test_has_value():
    from ksoup_ray.engine.dom import Attribute
    a1 = Attribute("one", "")
    a2 = Attribute("two", None)
    a3 = Attribute("thr", "thr")
    assert a1.has_declared_value()
    assert not a2.has_declared_value()
    assert a3.has_declared_value()


def test_can_set_value_to_none():
    from ksoup_ray.engine.dom import Attribute
    attr = Attribute("one", "val")
    old = attr.set_value(None)
    assert attr.html() == "one"
    assert old == "val"
    old = attr.set_value("foo")
    assert old == ""  # string, not None
