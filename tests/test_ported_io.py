"""ReaderTest — translated from reference
ksoup-test/.../ported/io/ReaderTest.kt over the compat shims in
engine/io.py (StringReader / BufferedReader / InputSourceReader)."""

import pytest

from ksoup_ray.engine.io import (DEFAULT_BUFFER_SIZE, BufferedReader,
                                 InputSourceReader, Reader, StringReader)


def _readers(input_str):
    yield StringReader(input_str)
    yield BufferedReader(StringReader(input_str))
    yield BufferedReader(InputSourceReader(input_str.encode("utf-8")))
    yield BufferedReader(InputSourceReader(input_str.encode("utf-8")),
                         DEFAULT_BUFFER_SIZE)


def test_spurious_byte_reader():
    html = "﻿<html><head><title>One</title></head><body>Two</body></html>"
    # InputSourceReader strips the BOM during decode (DataUtil chain);
    # the reference's raw reader preserves it — parse output is what
    # must agree, and the BOM never reaches the DOM either way
    r = BufferedReader(InputSourceReader(html.encode("utf-8")))
    decoded = html.lstrip("﻿")
    for ch in decoded:
        assert chr(r.read()) == ch
    r1 = BufferedReader(InputSourceReader(html.encode("utf-8")))
    assert r1.read_string(len(decoded)) == decoded
    r2 = BufferedReader(InputSourceReader(html.encode("utf-8")))
    r2.skip(1)
    assert r2.read_string(len(decoded) - 1) == decoded[1:]


def test_char_reader_mark_skip_reset():
    for reader in _readers("abcdefghijklm"):
        reader.mark(1111)
        buf = [""] * 3
        assert reader.read(buf, 0, 3) == 3
        assert "".join(buf) == "abc"
        reader.reset()
        assert reader.read(buf, 0, 3) == 3
        assert "".join(buf) == "abc"
        reader.mark(1111)
        assert reader.read(buf, 0, 3) == 3
        assert "".join(buf) == "def"
        reader.reset()
        assert reader.read(buf, 0, 3) == 3
        assert "".join(buf) == "def"
        reader.mark(1111)
        assert reader.read(buf, 0, 3) == 3
        assert "".join(buf) == "ghi"
        reader.reset()
        assert reader.read(buf, 0, 3) == 3
        assert "".join(buf) == "ghi"
        reader.mark(1111)
        assert reader.read(buf, 0, 3) == 3
        assert "".join(buf) == "jkl"
        reader.reset()
        assert reader.read(buf, 0, 3) == 3
        assert "".join(buf) == "jkl"
        reader.mark(1111)
        assert reader.read(buf, 0, 3) == 1
        assert "".join(buf) == "mkl"  # only one char overwritten
        reader.reset()
        assert reader.read(buf, 0, 3) == 1
        assert "".join(buf) == "mkl"


def test_char_sequence():
    for reader in _readers("abcdefghijklmnopqrstuvwxyz"):
        for ch in "abcdefghijklmnopqrstuvwxyz":
            assert chr(reader.read()) == ch


def test_large_char_sequence():
    data = "abcdefghijklmnopqrstuvwxyz" * 137
    for reader in _readers(data):
        for ch in data:
            assert chr(reader.read()) == ch
        assert reader.read() == -1


def test_char_array_read():
    data = "abcdefghijklmnopqrstuvwxyz"
    for reader in _readers(data):
        buf = [""] * 7
        assert reader.read(buf, 0, 7) == 7
        assert "".join(buf) == data[0:7]
        buf = [""] * 7
        assert reader.read(buf, 0, 7) == 7
        assert "".join(buf) == data[7:14]
        buf = [""] * 12
        assert reader.read(buf, 0, 12) == 12
        assert "".join(buf) == data[14:26]


def test_markable_char_reader():
    for reader in _readers("abcdefghijklmnopqrstuvwxyz"):
        assert chr(reader.read()) == "a"
        assert chr(reader.read()) == "b"
        reader.mark(100)
        assert chr(reader.read()) == "c"
        assert chr(reader.read()) == "d"
        reader.reset()
        assert chr(reader.read()) == "c"
        assert chr(reader.read()) == "d"
        assert chr(reader.read()) == "e"


def test_skip_char_reader():
    for reader in _readers("abcdefghijklmnopqrstuvwxyz"):
        assert chr(reader.read()) == "a"
        assert chr(reader.read()) == "b"
        reader.skip(3)
        assert chr(reader.read()) == "f"
        assert chr(reader.read()) == "g"
        assert chr(reader.read()) == "h"
        reader.skip(2)
        assert chr(reader.read()) == "k"
        assert chr(reader.read()) == "l"
        assert chr(reader.read()) == "m"


def test_markable_skip_reader():
    for reader in _readers("abcdefghijklmnopqrstuvwxyz"):
        assert chr(reader.read()) == "a"
        assert chr(reader.read()) == "b"
        assert chr(reader.read()) == "c"
        reader.skip(2)
        reader.mark(100)
        assert chr(reader.read()) == "f"
        assert chr(reader.read()) == "g"
        assert chr(reader.read()) == "h"
        reader.reset()
        for ch in "fghijk":
            assert chr(reader.read()) == ch


def _mix_char_reader(data):
    for reader in _readers(data):
        for ch in data:
            buf = [""]
            assert reader.read(buf, 0, 1) == 1
            assert buf[0] == ch
        buf = [" "]
        assert reader.read(buf, 0, 1) == -1
        assert buf[0] == " "


def test_mix_char_reader():
    _mix_char_reader("ä<a>ä</a>")


def test_mix_char_reader_korean():
    _mix_char_reader("한국어")


def test_mix_char_reader_korean_large():
    _mix_char_reader("한국어" * 2000)


def test_mix_char_reader_umlauts():
    _mix_char_reader("Übergrößenträger")


def test_supplementary_mix():
    _mix_char_reader("ABCあ💩" * 29)


def test_input_source_reader_charset():
    raw = "Übergrößenträger".encode("iso-8859-1")
    r = InputSourceReader(raw, charset="iso-8859-1")
    assert r.read_string(16) == "Übergrößenträger"
    assert r.charset.lower().replace("-", "") in ("iso88591", "latin1")


def test_reader_close_context_manager():
    with StringReader("ab") as r:
        assert chr(r.read()) == "a"
        assert not r.is_closed()
    assert r.is_closed()


def test_parse_accepts_reader():
    from ksoup_ray.engine import parser as KP
    from ksoup_ray.engine.streamparser import StreamParser
    doc = KP.parse(StringReader("<p>One</p>"))
    assert doc.expect_first("p").text() == "One"
    sp = StreamParser().parse(
        BufferedReader(InputSourceReader(b"<p>Two</p>")), "")
    assert sp.complete().expect_first("p").text() == "Two"
