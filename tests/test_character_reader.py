"""CharacterReaderTest — translated from reference
ksoup-test/.../parser/CharacterReaderTest.kt. Ring-buffer boundary
cases (RefillPoint, mark loss across bufferUp) are structurally N/A —
the reader holds the decoded string; generated inputs still use the
BUFFER_SIZE constant so the same shapes are exercised."""

import gzip

import pytest

from ksoup_ray.engine.charreader import (BUFFER_SIZE, EOF, CharacterReader)

RES = "/root/reference/ksoup-test/testResources"


def test_read_mix_special_char():
    input_ = "ä<a>ä</a>"
    r = CharacterReader(input_)
    for index, char in enumerate(input_):
        assert r.pos() == index
        assert r.consume() == char


def test_special_character_reader():
    s1 = "Hello &amp;&lt;&gt; Å å π 新 there ¾ © »"
    s2 = "Übergrößenträger"
    assert str(CharacterReader(s1)) == s1
    assert str(CharacterReader(s2)) == s2


def test_utf8_reader():
    text = "𪚲か゚  1"
    assert str(CharacterReader(text)) == text


def test_str_reader():
    text = "Abccdddd  1"
    assert str(CharacterReader(text)) == text


def test_consume():
    r = CharacterReader("one")
    assert r.pos() == 0
    assert r.current() == "o"
    assert r.consume() == "o"
    assert r.pos() == 1
    assert r.current() == "n"
    assert r.pos() == 1
    assert r.consume() == "n"
    assert r.consume() == "e"
    assert r.is_empty()
    assert r.consume() == EOF
    assert r.is_empty()
    assert r.consume() == EOF


def test_unconsume():
    r = CharacterReader("one")
    assert r.consume() == "o"
    assert r.current() == "n"
    r.unconsume()
    assert r.current() == "o"
    assert r.consume() == "o"
    assert r.consume() == "n"
    assert r.consume() == "e"
    assert r.is_empty()
    r.unconsume()
    assert not r.is_empty()
    assert r.current() == "e"
    assert r.consume() == "e"
    assert r.is_empty()
    assert r.consume() == EOF
    r.unconsume()  # read past, so have to eat again
    assert r.is_empty()
    r.unconsume()
    assert not r.is_empty()
    assert r.consume() == "e"
    assert r.is_empty()
    assert r.consume() == EOF
    assert r.is_empty()
    # unconsume all remaining characters
    for _ in range(4):
        r.unconsume()
    with pytest.raises(IOError):
        r.unconsume()


def test_mark():
    r = CharacterReader("one")
    r.consume()
    r.mark()
    assert r.pos() == 1
    assert r.consume() == "n"
    assert r.consume() == "e"
    assert r.is_empty()
    r.rewind_to_mark()
    assert r.pos() == 1
    assert r.consume() == "n"
    assert not r.is_empty()
    assert r.pos() == 2


def test_rewind_to_mark_invalid():
    r = CharacterReader("nothing")
    with pytest.raises(IOError):
        r.rewind_to_mark()


def test_consume_to_end():
    input_ = "one two three"
    r = CharacterReader(input_)
    assert r.consume_to_end() == input_
    assert r.is_empty()


def test_next_index_of_char():
    r = CharacterReader("blah blah")
    assert r.next_index_of("x") == -1
    assert r.next_index_of("h") == 3
    assert r.consume_to("h") == "bla"
    r.consume()
    assert r.next_index_of("l") == 2
    assert r.consume_to_end() == " blah"
    assert r.next_index_of("x") == -1


def test_next_index_of_string():
    r = CharacterReader("One Two something Two Three Four")
    assert r.next_index_of("Foo") == -1
    assert r.next_index_of("Two") == 4
    assert r.consume_to("something") == "One Two "
    assert r.next_index_of("Two") == 10
    assert r.consume_to_end() == "something Two Three Four"
    assert r.next_index_of("Two") == -1


def test_next_index_of_unmatched():
    r = CharacterReader("<[[one]]")
    assert r.next_index_of("]]>") == -1


def test_consume_to_char():
    r = CharacterReader("One Two Three")
    assert r.consume_to("T") == "One "
    assert r.consume_to("T") == ""  # on Two
    assert r.consume() == "T"
    assert r.consume_to("T") == "wo "
    assert r.consume() == "T"
    assert r.consume_to("T") == "hree"  # consume to end


def test_consume_to_string():
    r = CharacterReader("One Two Two Four")
    assert r.consume_to("Two") == "One "
    assert r.consume() == "T"
    assert r.consume_to("Two") == "wo "
    assert r.consume() == "T"
    parts = []
    while True:
        part = r.consume_to("Qux")
        parts.append(part)
        if not part:
            break
    assert "".join(parts) == "wo Four"


def test_advance():
    r = CharacterReader("One Two Three")
    assert r.consume() == "O"
    r.advance()
    assert r.consume() == "e"


def test_consume_to_any():
    r = CharacterReader("One &bar; qux")
    assert r.consume_to_any("&", ";") == "One "
    assert r.matches("&")
    assert r.matches("&bar;")
    assert r.consume() == "&"
    assert r.consume_to_any("&", ";") == "bar"
    assert r.consume() == ";"
    assert r.consume_to_any("&", ";") == " qux"


def test_consume_letter_sequence():
    r = CharacterReader("One &bar; qux")
    assert r.consume_letter_sequence() == "One"
    assert r.consume_to("bar;") == " &"
    assert r.consume_letter_sequence() == "bar"
    assert r.consume_to_end() == "; qux"


def test_consume_letter_then_digit_sequence():
    r = CharacterReader("One12 Two &bar; qux")
    assert r.consume_letter_then_digit_sequence() == "One12"
    assert r.consume() == " "
    assert r.consume_letter_then_digit_sequence() == "Two"
    assert r.consume_to_end() == " &bar; qux"


def test_matches():
    r = CharacterReader("One Two Three")
    assert r.matches("O")
    assert r.matches("One Two Three")
    assert r.matches("One")
    assert not r.matches("one")
    assert r.consume() == "O"
    assert not r.matches("One")
    assert r.matches("ne Two Three")
    assert not r.matches("ne Two Three Four")
    assert r.consume_to_end() == "ne Two Three"
    assert not r.matches("ne")
    assert r.is_empty()


def test_matches_ignore_case():
    r = CharacterReader("One Two Three")
    assert r.matches_ignore_case("O")
    assert r.matches_ignore_case("o")
    assert r.matches("O")
    assert not r.matches("o")
    assert r.matches_ignore_case("One Two Three")
    assert r.matches_ignore_case("ONE two THREE")
    assert r.matches_ignore_case("One")
    assert r.matches_ignore_case("one")
    assert r.consume() == "O"
    assert not r.matches_ignore_case("One")
    assert r.matches_ignore_case("NE Two Three")
    assert not r.matches_ignore_case("ne Two Three Four")
    assert r.consume_to_end() == "ne Two Three"
    assert not r.matches_ignore_case("ne")


def test_contains_ignore_case():
    r = CharacterReader("One TWO three")
    assert r.contains_ignore_case("two")
    assert r.contains_ignore_case("three")
    # weird one: does not find mixed-case 'One' (consistent-case scan)
    assert not r.contains_ignore_case("one")


def _buffer_buster(content):
    parts = []
    n = 0
    while n < BUFFER_SIZE:
        parts.append(content)
        n += len(content)
    return "".join(parts)


def test_contains_ignore_case_buffer():
    html = ("<p><p><p></title><p></TITLE><p>" +
            _buffer_buster("Foo Bar Qux ") + "<foo><bar></title>")
    r = CharacterReader(html)
    assert r.contains_ignore_case("</title>")
    assert not r.contains_ignore_case("</not>")
    assert not r.contains_ignore_case("</not>")
    assert r.contains_ignore_case("</title>")
    r.consume_to("</title>")
    assert r.contains_ignore_case("</title>")
    r.consume_to("<p>")
    assert r.matches("<p>")
    assert r.contains_ignore_case("</title>")
    assert not r.contains_ignore_case("</not>")
    r.consume_to("</TITLE>")
    r.consume_to("<p>")
    assert r.matches("<p>")
    # the remaining "</title>" IS visible here (no buffer underrun in
    # this engine — whole string is resident; reference returns false
    # until a bufferUp)
    r.consume_to("<foo>")
    assert r.matches("<foo>")
    assert r.contains_ignore_case("</TITLE>")
    assert r.contains_ignore_case("</title>")


def test_matches_any():
    scan = (" ", "\n", "\t")
    r = CharacterReader("One\nTwo\tThree")
    assert not r.matches_any(*scan)
    assert r.consume_to_any(*scan) == "One"
    assert r.matches_any(*scan)
    assert r.consume() == "\n"
    assert not r.matches_any(*scan)
    r.consume_to_end()
    assert r.is_empty()
    assert not r.matches_any(*scan)


def test_matches_digit():
    r = CharacterReader("42")
    r.consume_to_end()
    assert r.is_empty()
    assert not r.matches_digit()
    r.unconsume()
    assert r.matches_digit()


def test_caches_strings():
    r = CharacterReader(
        "Check\tCheck\tCheck\tCHOKE\tA string that is longer than 16 chars")
    one = r.consume_to("\t")
    r.consume()
    two = r.consume_to("\t")
    r.consume()
    three = r.consume_to("\t")
    r.consume()
    four = r.consume_to("\t")
    r.consume()
    five = r.consume_to("\t")
    assert one == two == three == "Check"
    assert four == "CHOKE"
    assert one is two
    assert two is three
    assert three is not four
    assert four is not five
    assert five == "A string that is longer than 16 chars"


def test_range_equals():
    r = CharacterReader("Check\tCheck\tCheck\tCHOKE")
    assert r.range_equals(0, 5, "Check")
    assert not r.range_equals(0, 5, "CHOKE")
    assert not r.range_equals(0, 5, "Chec")
    assert r.range_equals(6, 5, "Check")
    assert not r.range_equals(6, 5, "Chuck")
    assert r.range_equals(12, 5, "Check")
    assert not r.range_equals(12, 5, "Cheeky")
    assert r.range_equals(18, 5, "CHOKE")
    assert not r.range_equals(18, 5, "CHIKE")


def test_empty():
    r = CharacterReader("One")
    assert r.match_consume("One")
    assert r.is_empty()
    r = CharacterReader("Two")
    assert r.consume_to_end() == "Two"


def test_consume_to_nonexistent_end_when_at_end():
    r = CharacterReader("<!")
    assert r.match_consume("<!")
    assert r.is_empty()
    assert r.consume_to(">") == ""
    assert r.is_empty()


def test_not_empty_at_buffer_split_point():
    length = BUFFER_SIZE * 12
    r = CharacterReader("!" * (length + 1))
    for pos in range(length):
        assert r.pos() == pos
        assert not r.is_empty()
        assert r.consume() == "!"
        assert r.pos() == pos + 1
        assert not r.is_empty()
    assert r.consume() == "!"
    assert r.is_empty()
    assert r.consume() == EOF


def test_buffer_up():
    note = "HelloThere"
    loop_count = 64
    s = (note + "!") * loop_count
    r = CharacterReader(s)
    for _ in range(loop_count):
        assert r.consume_to("!") == note
        assert r.current() == "!"
        r.advance()
    assert r.is_empty()


def test_can_enable_and_disable_line_number_tracking():
    r = CharacterReader("Hello!")
    assert not r.is_track_newlines()
    r.track_newlines(True)
    assert r.is_track_newlines()
    r.track_newlines(False)
    assert not r.is_track_newlines()


def test_can_track_newlines():
    parts = ["<foo>\n<bar>\n<qux>\n"]
    n = len(parts[0])
    while n < BUFFER_SIZE:
        parts.append("Lorem ipsum dolor sit amet, consectetur "
                     "adipiscing elit.")
        n += len(parts[-1])
    parts.append("[foo]\n[bar]")
    content = "".join(parts)
    foo_pos = content.index("[foo]")

    no_track = CharacterReader(content)
    assert not no_track.is_track_newlines()
    assert no_track.pos() == 0
    assert no_track.line_number() == 1
    assert no_track.column_number() == 1
    no_track.consume_to("<qux>")
    assert no_track.pos() == 12
    assert no_track.line_number() == 1
    assert no_track.column_number() == 13
    assert no_track.pos_line_col() == "1:13"
    while not no_track.matches("[foo]"):
        no_track.consume_to("[foo]")
    assert no_track.pos() == foo_pos
    assert no_track.line_number() == 1
    assert no_track.column_number() == no_track.pos() + 1

    track = CharacterReader(content)
    track.track_newlines(True)
    assert track.is_track_newlines()
    assert track.pos() == 0
    assert track.line_number() == 1
    assert track.column_number() == 1
    track.consume_to("\n")
    assert track.line_number() == 1
    assert track.column_number() == 6
    track.consume()
    assert track.line_number() == 2
    assert track.column_number() == 1
    assert track.consume_to("\n") == "<bar>"
    assert track.line_number() == 2
    assert track.column_number() == 6
    assert track.consume_to("<qux>") == "\n"
    assert track.pos() == 12
    assert track.line_number() == 3
    assert track.column_number() == 1
    assert track.pos_line_col() == "3:1"
    assert track.consume_to("\n") == "<qux>"
    assert track.pos_line_col() == "3:6"
    while not track.matches("[foo]"):
        track.consume_to("[foo]")
    assert track.pos() == foo_pos
    assert track.line_number() == 4
    assert track.column_number() == foo_pos - content.index("<qux>\n") - 5
    track.consume_to("\n")
    assert track.line_number() == 4
    track.consume_to("[bar]")
    assert track.line_number() == 5
    assert track.pos_line_col() == "5:1"
    track.consume_to_end()
    assert track.pos_line_col() == "5:6"


def test_counts_columns_over_buffer_when_no_newlines():
    parts = []
    n = 0
    while n < BUFFER_SIZE * 4:
        parts.append("Lorem ipsum dolor sit amet, consectetur "
                     "adipiscing elit.")
        n += len(parts[-1])
    content = "".join(parts)
    r = CharacterReader(content)
    r.track_newlines(True)
    assert r.pos_line_col() == "1:1"
    seen = []
    while not r.is_empty():
        seen.append(r.consume())
    assert "".join(seen) == content
    assert r.pos() == len(content)
    assert r.column_number() == r.pos() + 1
    assert r.line_number() == 1


def test_line_numbers_agree_with_editor():
    content = gzip.decompress(
        open(f"{RES}/htmltests/large.html.gz", "rb").read()).decode()
    r = CharacterReader(content)
    r.track_newlines(True)
    scan = "<p>VESTIBULUM"  # near the end of the file
    while not r.matches(scan):
        r.consume_to(scan)
    assert r.pos() == 280218
    assert r.line_number() == 1002
    assert r.column_number() == 1
    r.consume_to(" ")
    assert r.line_number() == 1002
    assert r.column_number() == 14


def test_consume_double_quoted_attribute_consumes_thru_single_quote():
    r = CharacterReader("He'llo\" >")
    assert r.consume_attribute_quoted(False) == "He'llo"
    assert r.consume() == '"'


def test_consume_single_quoted_attribute_consumes_thru_double_quote():
    r = CharacterReader("He\"llo' >")
    assert r.consume_attribute_quoted(True) == 'He"llo'
    assert r.consume() == "'"


def test_consume_double_quoted_attribute_to_amp():
    r = CharacterReader("He'llo &copy;\" >")
    assert r.consume_attribute_quoted(False) == "He'llo "
    assert r.consume() == "&"


def test_consume_single_quoted_attribute_to_amp():
    r = CharacterReader("He\"llo &copy;' >")
    assert r.consume_attribute_quoted(True) == 'He"llo '
    assert r.consume() == "&"


def test_consume_data_and_tag_name():
    r = CharacterReader("one &amp; two <p>Hello</p>")
    assert r.consume_data() == "one "
    r.consume()
    assert r.consume_data() == "amp; two "
    r.consume()
    assert r.consume_tag_name() == "p"
    assert r.consume() == ">"
    assert r.consume_raw_data() == "Hello"


def test_hex_and_digit_sequences():
    r = CharacterReader("1a2F;99x")
    assert r.consume_hex_sequence() == "1a2F"
    r.consume()
    assert r.consume_digit_sequence() == "99"
    assert r.matches_letter()
    assert r.matches_ascii_alpha()
