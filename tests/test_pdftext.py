"""PDF text extraction: conformance on the reference corpus's real
PDFs (three wild academic/slide files — TeX, dvips, and Office
producers), content-stream machine unit paths, and totality."""

import glob
import zlib

import numpy as np

from unfurl_spark.functions.pdftext import (
    _run_text_machine,
    pdf_text,
    pdf_text_blocks,
)

FIXTURES = sorted(glob.glob(
    "/root/reference/packages/test/fixtures/*pdf*/body"))


def _fixture(name_part: str) -> bytes:
    for f in FIXTURES:
        if name_part in f:
            with open(f, "rb") as fh:
                return fh.read()
    raise AssertionError(f"fixture {name_part} missing")


def test_real_pdf_tex_producer():
    txt = pdf_text(_fixture("moral-fn"))
    assert "The Moral Character of Cryptographic Work" in txt
    assert "Phillip Rogaway" in txt
    # ligature mapping: \x0c → fi in TeX OT1 fonts
    assert "configures" in txt and "field" in txt
    assert len(txt) > 100_000  # full paper, not just the first page


def test_real_pdf_dvips_word_gaps():
    txt = pdf_text(_fixture("mihalcea"))
    # this producer kerns per word with NO literal spaces — the
    # font-size-scaled Td heuristic must reconstruct the gaps
    assert "TextRank: Bringing Order into Texts" in txt
    assert "Department of Computer Science" in txt


def test_real_pdf_slides():
    txt = pdf_text(_fixture("Liang"))
    assert "WebKit" in txt
    assert "Liang Chen" in txt


def test_text_machine_operators():
    content = (b"BT /F1 12 Tf (Hello) Tj 0 -14 Td (world) Tj ET "
               b"BT [(k) -50 (ern) -300 (gap)] TJ ET")
    txt = _run_text_machine(content)
    assert txt.splitlines() == ["Hello", "world", "kern gap"]


def test_string_escapes_and_hex():
    content = rb"BT (a\(b\)c \\ \101 line\nbreak) Tj <48454C4C4F> Tj ET"
    txt = _run_text_machine(content)
    assert "a(b)c \\ A line" in txt
    assert "HELLO" in txt


def test_uncompressed_and_flate_streams():
    raw = b"BT (plain) Tj ET"
    pdf = (b"%PDF-1.4\n1 0 obj\n<< /Length "
           + str(len(raw)).encode() + b" >>\nstream\n"
           + raw + b"\nendstream\nendobj\n%%EOF")
    assert pdf_text(pdf) == "plain"
    fl = zlib.compress(b"BT (flate) Tj ET")
    pdf2 = (b"%PDF-1.4\n1 0 obj\n<< /Filter /FlateDecode >>\nstream\n"
            + fl + b"\nendstream\nendobj\n%%EOF")
    assert pdf_text(pdf2) == "flate"


def test_totality_on_garbage():
    rng = np.random.default_rng(5)
    assert pdf_text_blocks(b"") == []
    assert pdf_text_blocks(b"not a pdf") == []
    assert pdf_text_blocks(
        bytes(rng.integers(0, 256, 4096, dtype=np.uint8))) == []
    # truncated real pdf: must not raise
    data = _fixture("moral-fn")
    for cut in (100, 1000, len(data) // 2):
        pdf_text_blocks(data[:cut])
    # mutated
    buf = bytearray(data[:20000])
    for _ in range(50):
        buf[rng.integers(0, len(buf))] = rng.integers(0, 256)
        pdf_text_blocks(bytes(buf))


def test_cid_garbage_gated():
    # a stream of high-bit CID bytes must be dropped, not emitted
    body = b"BT (\x03\x07\x01\x02\x05\x04\x06\x08\x0e\x10) Tj ET"
    pdf = (b"%PDF-1.4\n1 0 obj\n<< /Length "
           + str(len(body)).encode() + b" >>\nstream\n"
           + body + b"\nendstream\nendobj\n%%EOF")
    assert pdf_text(pdf) == ""


def test_page_boilerplate_stripped():
    from unfurl_spark.functions.pdftext import strip_page_boilerplate

    pages = []
    for i in range(4):
        pages.append("\n".join([
            "Running Header: My Paper",
            f"unique content line {i} alpha beta",
            f"more body text {i} gamma delta",
            str(i + 1),  # bare page number
        ]))
    out = strip_page_boilerplate(pages)
    joined = "\n\n".join(out)
    assert "Running Header" not in joined
    assert "unique content line 2" in joined
    assert "\n3\n" not in joined and not joined.endswith("\n4")
    # 1-2 page docs: no repetition evidence, nothing stripped
    assert strip_page_boilerplate(pages[:2]) == pages[:2]


def test_real_pdf_boilerplate_pass_keeps_content():
    txt = pdf_text(_fixture("moral-fn"))
    # body survives the layout pass
    assert "configures" in txt and "Phillip Rogaway" in txt


def test_cr_is_newline_but_tex_fl_survives():
    """0x0D doubles as carriage return AND the OT1 'fl' ligature: map it
    to 'fl' only between letters (the TeX shape); a CR elsewhere is an
    EOL (PDF 7.3.4.2), never a spliced 'fl'."""
    assert _run_text_machine(rb"BT (in\015uence) Tj ET") == "influence"
    txt = _run_text_machine(rb"BT (line1\015line2) Tj ET")
    assert "fl" not in txt and "line1" in txt and "line2" in txt


def test_page_number_strip_only_at_block_edges():
    from unfurl_spark.functions.pdftext import strip_page_boilerplate
    blocks = [
        "Heading\nOn Liberty by Mill\ndid\n2020 was a year\niv",
        "Heading\nMill wrote more\ncivil\nanother line here\nv",
        "Heading\nfinal page prose\nmix\nclosing words\nvi",
    ]
    out = strip_page_boilerplate(blocks)
    joined = "\n".join(out)
    # interior one-word roman-lookalike lines survive ...
    assert "did" in joined and "civil" in joined and "mix" in joined
    # ... while the bare roman page numbers at the block edge are gone
    assert "\niv" not in joined and "\nvi" not in joined


def test_flags_key_not_mistaken_for_flate():
    # /Flags starts with /Fl but is NOT a Flate filter: the stream is
    # uncompressed and must extract, not die in zlib
    raw = b"BT (unfiltered) Tj ET"
    pdf = (b"%PDF-1.4\n1 0 obj\n<< /Flags 4 /Length "
           + str(len(raw)).encode() + b" >>\nstream\n"
           + raw + b"\nendstream\nendobj\n%%EOF")
    assert pdf_text(pdf) == "unfiltered"


def test_fl_abbreviation_is_flate():
    fl = zlib.compress(b"BT (abbrev) Tj ET")
    pdf = (b"%PDF-1.4\n1 0 obj\n<< /Filter [ /Fl ] >>\nstream\n"
           + fl + b"\nendstream\nendobj\n%%EOF")
    assert pdf_text(pdf) == "abbrev"
