"""Element.text()/wholeText/ownText goldens translated from the reference
nodes/ElementTest.kt — the byte-identical target of the pipeline."""

from ksoup_ray.engine import parser as P


REFERENCE = ("<div id=div1><p>Hello</p><p>Another <b>element</b></p>"
             "<div id=div2><img src=foo.png></div></div>")


def test_get_text():
    # ElementTest.kt:83
    doc = P.parse(REFERENCE)
    assert doc.text() == "Hello Another element"
    assert doc.select("p")[1].text() == "Another element"


def test_get_child_text():
    # ElementTest.kt:90
    doc = P.parse("<p>Hello <b>there</b> now")
    p = doc.select_first("p")
    assert p.text() == "Hello there now"
    assert p.own_text() == "Hello now"


def test_normalises_text():
    doc = P.parse("<p>Hello<p>There.</p> \n <p>Here <b>is</b> \n s<b>om</b>e text.")
    assert doc.text() == "Hello There. Here is some text."


def test_keeps_pre_text():
    doc = P.parse("<p>Hello \n \n there.</p> <div><pre>  What's \n\n  that?</pre>")
    # ElementTest.kt:107-109 (verbatim: three spaces before What's)
    assert doc.text() == "Hello there.   What's \n\n  that?"


def test_keeps_pre_text_in_code():
    doc = P.parse("<pre><code>code\n\ncode</code></pre>")
    assert doc.text() == "code\n\ncode"
    assert doc.body().whole_text() == "code\n\ncode"


def test_br_has_space():
    # ElementTest.kt:137
    doc = P.parse("<p>Hello<br>there</p>")
    assert doc.text() == "Hello there"
    assert doc.select_first("p").own_text() == "Hello there"
    doc = P.parse("<p>Hello <br> there</p>")
    assert doc.text() == "Hello there"


def test_whole_text_br():
    doc = P.parse("<p>Hello<br>there</p>")
    assert doc.body().whole_text() == "Hello\nthere"


def test_text_has_spaces_after_block():
    # ElementTest.kt:159
    doc = P.parse("<div>One</div><div>Two</div><span>Three</span>"
                  "<p>Fou<i>r</i></p>")
    assert doc.text() == "One Two Three Four"
    assert doc.body().whole_text() == "OneTwoThreeFour"
    assert P.parse("<span>One</span><span>Two</span>").text() == "OneTwo"


def test_whole_text():
    # ElementTest.kt:169
    doc = P.parse("<p> Hello\nthere &nbsp;  </p>")
    assert doc.body().whole_text() == " Hello\nthere \xa0  "
    doc = P.parse("<p>Hello  \n  there</p>")
    assert doc.body().whole_text() == "Hello  \n  there"
    doc = P.parse("<p>Hello  <div>\n  there</div></p>")
    assert doc.body().whole_text() == "Hello  \n  there"


def test_whole_text_runs():
    # ElementTest.kt:179
    doc = P.parse("<div><p id=1></p><p id=2> </p><p id=3>.  </p>")
    assert doc.select_first("#1").whole_text() == ""
    assert doc.select_first("#2").whole_text() == " "
    assert doc.select_first("#3").whole_text() == ".  "


def test_button_text_has_space():
    # ElementTest.kt:192
    doc = P.parse("<html><button>Reply</button><button>All</button></html>")
    assert doc.body().text() == "Reply All"
    assert doc.body().whole_text() == "ReplyAll"


def test_text_has_space_after_block_tags():
    # ElementTest.kt:1775
    assert P.parse("<div>One</div>Two").text() == "One Two"


def test_text_space_div_center():
    # ElementTest.kt:1781
    doc = P.parse("<div>One</div><div>Two</div><center>Three</center>"
                  "<center>Four</center>")
    assert doc.text() == "One Two Three Four"


def test_nbsp_collapses_in_text():
    doc = P.parse("<p>a&nbsp;&nbsp;b</p>")
    assert doc.text() == "a b"
    assert doc.body().whole_text() == "a\xa0\xa0b"


def test_invisible_chars_dropped_in_text():
    # zero-width space U+200B and soft hyphen U+00AD dropped
    doc = P.parse("<p>a​b­c</p>")
    assert doc.text() == "abc"


def test_own_text_br_space():
    doc = P.parse("<p>Hello <b>there</b> <br> now</p>")
    p = doc.select_first("p")
    assert p.own_text() == "Hello now"


def test_get_text_nodes():
    # ElementTest.kt:1069
    doc = P.parse("<p>One <span>Two</span> Three <br> Four</p>")
    tn = doc.select_first("p").text_nodes()
    assert len(tn) == 3
    assert tn[0].text() == "One "
    assert tn[1].text() == " Three "
    assert tn[2].text() == " Four"
    assert len(doc.select_first("br").text_nodes()) == 0


def test_script_not_in_text():
    doc = P.parse("<p>One</p><script>var x</script><style>p{}</style><p>Two</p>")
    assert doc.text() == "One Two"


def test_data():
    doc = P.parse("<script>var x = 1;</script>")
    assert doc.select_first("script").data() == "var x = 1;"


def test_textarea_preserves():
    doc = P.parse("<textarea> one\n two </textarea>")
    t = doc.select_first("textarea")
    # preserve-whitespace inside, but Element.text() trims ends
    assert t.text() == "one\n two"


def test_title_preserve_in_whole():
    doc = P.parse("<title> A  B </title>")
    # title is preserve-whitespace inside; text() trims ends
    assert doc.select_first("title").text() == "A  B"
    # Document.title() normalizes + trims
    assert doc.title() == "A B"


def test_has_text():
    doc = P.parse("<div><p>One</p><p></p><p>  </p></div>")
    ps = doc.select("p")
    assert ps[0].has_text()
    assert not ps[1].has_text()
    assert not ps[2].has_text()
