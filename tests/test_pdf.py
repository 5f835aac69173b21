"""From-scratch PDF parser/writer (engine/pdf.py): round trips, foreign
hand-built PDFs exercising operators the writer never emits, damage
resilience, and the Ray-side stage plumbing."""

import zlib

import pyarrow as pa
import pytest

from ksoup_ray.engine.pdf import (PdfDocument, PdfError, extract_pdf_pages,
                                  extract_pdf_text, write_text_pdf)


# ---------------------------------------------------------------- round trip

@pytest.mark.parametrize("text", [
    "",
    "one line",
    "a\nb\nc",
    "parens (nested (deep)) and \\ backslash",
    "operators as text: BT ET Tj TJ Td T* Tm",
    "tab\there bell\x07 and del\x7f",
    "latin-1: café naïve ümlaut ±°",
    "unicode: 日本語 — ειρήνη 🎉",
    "\n".join(f"line {i}" for i in range(203)),
    "\n\n\n",
    "trailing newline\n",
    "double  spaces   kept",
])
def test_roundtrip_exact(text):
    assert extract_pdf_text(write_text_pdf(text)) == text


def test_roundtrip_uncompressed():
    t = "plain\nstreams"
    assert extract_pdf_text(write_text_pdf(t, compress=False)) == t


def test_pagination_closed_form():
    text = "\n".join(str(i) for i in range(100))
    pages = extract_pdf_pages(write_text_pdf(text, lines_per_page=40))
    assert [len(p["lines"]) for p in pages] == [40, 40, 20]
    assert pages[1]["text"].splitlines()[0] == "40"
    # every line carries the pen position where it started
    x, y, first = pages[0]["lines"][0]
    assert (x, y) == (72.0, 756.0)
    assert first == "0"


def test_empty_text_is_one_empty_line():
    pages = extract_pdf_pages(write_text_pdf(""))
    assert len(pages) == 1
    assert pages[0]["lines"] == [(72.0, 756.0, "")]


# ------------------------------------------------------- foreign-built PDFs

def _wrap_pdf(objs: dict[int, bytes], root: int = 1) -> bytes:
    """Assemble object dict -> classic-xref PDF (test scaffolding)."""
    buf = bytearray(b"%PDF-1.4\n")
    offsets = {}
    for n in sorted(objs):
        offsets[n] = len(buf)
        buf += b"%d 0 obj\n" % n + objs[n] + b"\nendobj\n"
    xref = len(buf)
    size = max(objs) + 1
    buf += b"xref\n0 %d\n0000000000 65535 f \n" % size
    for n in range(1, size):
        buf += b"%010d 00000 n \n" % offsets.get(n, 0)
    buf += b"trailer\n<< /Size %d /Root %d 0 R >>\nstartxref\n%d\n%%%%EOF\n" \
        % (size, root, xref)
    return bytes(buf)


def _stream_obj(content: bytes, extra: bytes = b"") -> bytes:
    return (b"<< /Length %d %s>>\nstream\n" % (len(content), extra)
            + content + b"\nendstream")


def _one_page(content: bytes, *, kids_nested: bool = False) -> bytes:
    objs = {
        1: b"<< /Type /Catalog /Pages 2 0 R >>",
        3: b"<< /Type /Page /Parent 2 0 R /Contents 4 0 R >>",
        4: _stream_obj(content),
    }
    if kids_nested:
        objs[2] = b"<< /Type /Pages /Kids [5 0 R] /Count 1 >>"
        objs[5] = b"<< /Type /Pages /Kids [3 0 R] /Count 1 /Parent 2 0 R >>"
    else:
        objs[2] = b"<< /Type /Pages /Kids [3 0 R] /Count 1 >>"
    return _wrap_pdf(objs)


def test_tj_array_with_kerning():
    pdf = _one_page(b"BT [(Hel) -20 (lo) 5 ( wor) (ld)] TJ ET")
    assert extract_pdf_text(pdf) == "Hello world"


def test_quote_operators_advance_lines():
    pdf = _one_page(b"BT 12 TL (first) Tj (second) ' 1 2 (third) \" ET")
    assert extract_pdf_text(pdf) == "first\nsecond\nthird"


def test_tm_and_td_moves_break_lines():
    content = (b"BT 1 0 0 1 72 700 Tm (top) Tj "
               b"0 -14 Td (mid) Tj 10 -14 TD (low) Tj ET")
    pages = extract_pdf_pages(_one_page(content))
    assert pages[0]["text"] == "top\nmid\nlow"
    assert pages[0]["lines"][0][:2] == (72.0, 700.0)
    assert pages[0]["lines"][1][:2] == (72.0, 686.0)
    assert pages[0]["lines"][2][:2] == (82.0, 672.0)


def test_octal_and_escape_sequences():
    pdf = _one_page(rb"BT (oct \101\102\103 paren \( bs \\ nl \n) Tj ET")
    assert extract_pdf_text(pdf) == "oct ABC paren ( bs \\ nl \n"


def test_hex_string_and_utf16():
    hx = (b"\xfe\xff" + "héllo ✓".encode("utf-16-be")).hex().encode()
    pdf = _one_page(b"BT <" + hx + b"> Tj ET")
    assert extract_pdf_text(pdf) == "héllo ✓"


def test_hex_string_odd_digits_padded():
    # <48656C6C6F2> -> "Hello " with the odd nibble zero-padded (0x20)
    pdf = _one_page(b"BT <48656C6C6F2> Tj ET")
    assert extract_pdf_text(pdf) == "Hello "


def test_multiple_content_streams_concatenate():
    objs = {
        1: b"<< /Type /Catalog /Pages 2 0 R >>",
        2: b"<< /Type /Pages /Kids [3 0 R] /Count 1 >>",
        3: b"<< /Type /Page /Parent 2 0 R /Contents [4 0 R 5 0 R] >>",
        4: _stream_obj(b"BT 10 TL (part one) Tj"),
        5: _stream_obj(b"T* (part two) Tj ET"),
    }
    assert extract_pdf_text(_wrap_pdf(objs)) == "part one\npart two"


def test_nested_kids_page_tree():
    pdf = _one_page(b"BT (nested) Tj ET", kids_nested=True)
    assert extract_pdf_text(pdf) == "nested"


def test_flate_and_asciihex_filter_chain():
    raw = b"BT (chained) Tj ET"
    comp = zlib.compress(raw)
    body = comp.hex().encode() + b">"
    objs = {
        1: b"<< /Type /Catalog /Pages 2 0 R >>",
        2: b"<< /Type /Pages /Kids [3 0 R] /Count 1 >>",
        3: b"<< /Type /Page /Parent 2 0 R /Contents 4 0 R >>",
        4: _stream_obj(body, b"/Filter [/ASCIIHexDecode /FlateDecode] "),
    }
    assert extract_pdf_text(_wrap_pdf(objs)) == "chained"


def test_indirect_length_falls_back_to_endstream_scan():
    objs = {
        1: b"<< /Type /Catalog /Pages 2 0 R >>",
        2: b"<< /Type /Pages /Kids [3 0 R] /Count 1 >>",
        3: b"<< /Type /Page /Parent 2 0 R /Contents 4 0 R >>",
        4: (b"<< /Length 5 0 R >>\nstream\nBT (indirect) Tj ET"
            b"\nendstream"),
        5: b"18",
    }
    assert extract_pdf_text(_wrap_pdf(objs)) == "indirect"


def test_comments_and_whitespace_tolerated():
    pdf = _one_page(b"% leading comment\nBT\n(spread)\nTj\nET % trailing")
    assert extract_pdf_text(pdf) == "spread"


def test_strings_that_look_like_operators_stay_text():
    pdf = _one_page(b"BT (BT) Tj ( ) Tj (ET) Tj ET")
    assert extract_pdf_text(pdf) == "BT ET"


def test_unknown_operators_consume_operands():
    content = (b"BT /F1 11 Tf 0.5 g 1 0 0 1 10 10 cm "
               b"(kept) Tj /GS1 gs (also) Tj ET")
    assert extract_pdf_text(_one_page(content)) == "keptalso"


# -------------------------------------------------------------- damage paths

def test_not_a_pdf_raises():
    with pytest.raises(PdfError):
        extract_pdf_text(b"GIF89a not a pdf")
    with pytest.raises(PdfError):
        extract_pdf_text(b"")


def test_broken_xref_still_parses():
    pdf = bytearray(write_text_pdf("resilient\ntext"))
    i = pdf.rindex(b"startxref")
    pdf[i:] = b"startxref\n999999\n%%EOF\n"   # lie about the xref offset
    assert extract_pdf_text(bytes(pdf)) == "resilient\ntext"


def test_missing_page_tree_falls_back_to_flat_scan():
    objs = {
        2: b"<< /Type /Page /Contents 3 0 R >>",
        3: _stream_obj(b"BT (orphan) Tj ET"),
    }
    pdf = _wrap_pdf(objs, root=9)            # root points nowhere
    assert extract_pdf_text(pdf) == "orphan"


def test_truncated_flate_stream_raises_pdferror():
    pdf = write_text_pdf("x" * 5000)
    cut = pdf[:pdf.index(b"endstream") - 40]
    tail = b"\nendstream\nendobj\n"
    with pytest.raises(PdfError):
        PdfDocument(cut + tail).extract_text()


# ------------------------------------------------------------- Ray plumbing

def test_pdf_stage_over_dataset(ray_session):
    import ray.data as rd
    from ksoup_ray.functions.multimodal import PdfExtract, synth_pdf_batch

    ds = rd.from_arrow(pa.table({
        "doc_id": pa.array([1, 2], pa.int64()),
        "text": ["alpha beta gamma delta epsilon zeta eta theta iota",
                 ""],
    }))
    out = ds.map_batches(synth_pdf_batch, batch_format="pyarrow") \
        .map_batches(PdfExtract, batch_format="pyarrow",
                     fn_constructor_kwargs={"unwrap_lines": True},
                     concurrency=(1, 2)) \
        .to_pandas().sort_values("doc_id")
    assert list(out["pdf_text"]) == [
        "alpha beta gamma delta epsilon zeta eta theta iota", ""]
    assert list(out["n_lines"]) == [2, 1]    # 9 words -> 2 lines of <=8
    assert list(out["n_pages"]) == [1, 1]
