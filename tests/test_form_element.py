"""FormElement control association + form-data assembly — jsoup's
FormElementTest semantics over the reference's FormElement node type
(reference nodes/FormElement.kt:18; the formData helper itself was
dropped in the reference's network-module split, so jsoup's public
behavior is the spec here)."""

from ksoup_ray.engine import parser as KP
from ksoup_ray.engine.dom import FormElement


def _form(html):
    doc = KP.parse(html)
    forms = doc.forms()
    assert forms, "no form parsed"
    return forms[0]


def test_has_associated_controls():
    # jsoup FormElementTest#hasAssociatedControls
    html = ("<body /><form id=1><button id=1><fieldset id=2 />"
            "<input id=3><keygen id=4><object id=5><output id=6>"
            "<select id=7><option></select><textarea id=8><p id=9>")
    form = _form(html)
    # submittable descendants (input/keygen/object/select/textarea)
    # UNION parse-linked form-listed controls (button/fieldset/output
    # arrive via the nodeListener linking) — FormElement.kt:28-37
    names = sorted(e.normal_name() for e in form.elements())
    assert names == ["button", "fieldset", "input", "keygen", "object",
                     "output", "select", "textarea"]


def test_creates_form_data():
    html = ("<form><input name='one' value='two'>"
            "<select name='three'><option value='not'>"
            "<option value='four' selected><option value='five' selected>"
            "</select><textarea name=six>seven</textarea>"
            "<input name='seven' type='radio' value='on' checked>"
            "<input name='eight' type='checkbox' checked>"
            "<input name='nine' type='checkbox' value='unset'>"
            "<input name='ten' value='text' disabled>"
            "<input name='eleven' value='text' type='button'>"
            "</form>")
    data = _form(html).form_data()
    assert data == [("one", "two"), ("three", "four"), ("three", "five"),
                    ("six", "seven"), ("seven", "on"), ("eight", "on")]


def test_formdata_uses_first_option_when_none_selected():
    data = _form("<form><select name=s><option value=a>A"
                 "<option value=b>B</select></form>").form_data()
    assert data == [("s", "a")]


def test_formdata_checkbox_defaults_on():
    data = _form("<form><input type=checkbox name=c checked></form>") \
        .form_data()
    assert data == [("c", "on")]


def test_formdata_skips_unnamed_and_image():
    data = _form("<form><input value=x>"
                 "<input type=image name=i value=y>"
                 "<input name=k value=v></form>").form_data()
    assert data == [("k", "v")]


def test_controls_linked_across_parse_moves():
    """Inputs fostered out of a table inside the form stay associated
    (the parse-time linking FormElement.kt keeps)."""
    html = ("<html><body><form id=f><table>"
            "<input name=foo value=bar>"
            "<tr><td><input name=baz value=qux></td></tr>"
            "</table></form></body></html>")
    form = _form(html)
    data = dict(form.form_data())
    assert data == {"foo": "bar", "baz": "qux"}


def test_removed_linked_control_drops_out():
    html = "<form><input name=a value=1><input name=b value=2></form>"
    form = _form(html)
    el = form.select_first("input[name=a]")
    el.remove()
    assert dict(form.form_data()) == {"b": "2"}


def test_form_is_form_element_instance():
    assert isinstance(_form("<form><input name=x></form>"), FormElement)


def test_textarea_value_is_text():
    data = _form("<form><textarea name=t>line one</textarea></form>") \
        .form_data()
    assert data == [("t", "line one")]
