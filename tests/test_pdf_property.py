"""Property-based tests (hypothesis) for the round-4 PDF decoders:
LZW round-trip, PNG predictor round-trip, ToUnicode CMap decode."""

import pytest

try:
    from hypothesis import given, settings
    from hypothesis import strategies as st
except ImportError:  # pragma: no cover
    pytest.skip("hypothesis unavailable", allow_module_level=True)

from mmore_spark.sources.registry import (
    _pdf_cmap,
    _pdf_decode_shown,
    _pdf_lzw_decode,
    _png_unpredict,
)
from tests.test_sources import _lzw_encode


@settings(max_examples=60, deadline=None)
@given(st.binary(min_size=0, max_size=600))
def test_lzw_roundtrip(data):
    assert _pdf_lzw_decode(_lzw_encode(data)) == data


def test_lzw_decoder_widens_at_511():
    """Pin the decoder's EarlyChange=1 widening boundary independently of
    the shared test encoder (a mirrored off-by-one passed round-trips in
    round 4): emit literal codes with a hand-rolled bit writer, switching
    to 10-bit exactly when the decoder's table reaches 511 entries — the
    rule pdfminer/pdf.js/Ghostscript implement. Codes 1..253 after the
    clear are 9-bit (table 258→510); from code 254 on they are 10-bit."""
    literals = [(i * 37 + 11) % 256 for i in range(400)]
    bits = [(256, 9)]
    table_size = 258
    width = 9
    for i, lit in enumerate(literals):
        bits.append((lit, width))
        if i > 0:  # decoder appends starting with the second code
            table_size += 1
        if table_size + 1 >= (1 << width) and width < 12:
            width += 1
    bits.append((257, width))
    acc = nbits = 0
    out = bytearray()
    for code, wd in bits:
        acc = (acc << wd) | code
        nbits += wd
        while nbits >= 8:
            out.append((acc >> (nbits - 8)) & 0xFF)
            nbits -= 8
    if nbits:
        out.append((acc << (8 - nbits)) & 0xFF)
    assert _pdf_lzw_decode(bytes(out)) == bytes(literals)


def test_aes128_fips_and_nist_vectors():
    """The stdlib AES-128 inverse cipher against published vectors:
    FIPS-197 appendix C.1 and NIST SP800-38A CBC block 1."""
    from mmore_spark.sources.aes128 import decrypt_block

    key = bytes.fromhex("000102030405060708090a0b0c0d0e0f")
    ct = bytes.fromhex("69c4e0d86a7b0430d8cdb78070b4c55a")
    assert decrypt_block(key, ct).hex() == \
        "00112233445566778899aabbccddeeff"
    key2 = bytes.fromhex("2b7e151628aed2a6abf7158809cf4f3c")
    iv = bytes.fromhex("000102030405060708090a0b0c0d0e0f")
    ct2 = bytes.fromhex("7649abac8119b246cee98e9b12e9197d")
    got = bytes(x ^ y for x, y in zip(decrypt_block(key2, ct2), iv))
    assert got.hex() == "6bc1bee22e409f96e93d7e117393172a"


@settings(max_examples=30, deadline=None)
@given(st.binary(min_size=16, max_size=16), st.binary(min_size=16, max_size=16))
def test_aes128_block_roundtrip(key, block):
    from mmore_spark.sources.aes128 import decrypt_block
    from tests.test_sources import _aes_encrypt_block

    assert decrypt_block(key, _aes_encrypt_block(key, block)) == block


def _png_predict_forward(data: bytes, columns: int, ftypes) -> bytes:
    """Apply PNG row filters forward (the inverse of _png_unpredict)."""
    out = bytearray()
    prev = bytes(columns)
    rows = [data[i:i + columns] for i in range(0, len(data), columns)]
    for ri, row in enumerate(rows):
        row = row.ljust(columns, b"\x00")
        ft = ftypes[ri % len(ftypes)]
        out.append(ft)
        filt = bytearray()
        for j in range(columns):
            left = row[j - 1] if j >= 1 else 0
            up = prev[j]
            ul = prev[j - 1] if j >= 1 else 0
            if ft == 0:
                pred = 0
            elif ft == 1:
                pred = left
            elif ft == 2:
                pred = up
            elif ft == 3:
                pred = (left + up) // 2
            else:
                p = left + up - ul
                pa, pb, pc = abs(p - left), abs(p - up), abs(p - ul)
                pred = left if pa <= pb and pa <= pc else (up if pb <= pc else ul)
            filt.append((row[j] - pred) & 0xFF)
        out += filt
        prev = row
    return bytes(out)


@settings(max_examples=60, deadline=None)
@given(
    st.binary(min_size=1, max_size=256),
    st.integers(min_value=1, max_value=16),
    st.lists(st.integers(min_value=0, max_value=4), min_size=1, max_size=5),
)
def test_png_predictor_roundtrip(data, columns, ftypes):
    padded = data + b"\x00" * ((-len(data)) % columns)
    filtered = _png_predict_forward(padded, columns, ftypes)
    assert _png_unpredict(filtered, columns) == padded


@settings(max_examples=40, deadline=None)
@given(st.dictionaries(
    st.integers(min_value=0, max_value=0xFFFF),
    st.text(alphabet=st.characters(min_codepoint=0x20, max_codepoint=0x7E),
            min_size=1, max_size=3),
    min_size=1, max_size=20,
))
def test_cmap_bfchar_roundtrip(mapping):
    """Arbitrary 2-byte code → BMP-text mappings survive the CMap text
    form and decode shown strings code-by-code."""
    lines = "\n".join(
        f"<{code:04X}> <{''.join(f'{ord(ch):04X}' for ch in dst)}>"
        for code, dst in mapping.items())
    text = ("begincmap\n1 begincodespacerange\n<0000> <FFFF>\n"
            "endcodespacerange\n"
            f"{len(mapping)} beginbfchar\n{lines}\nendbfchar\nendcmap")
    font = _pdf_cmap(text.encode("ascii"))
    assert font is not None and font[0] == 2
    codes = list(mapping)
    raw = b"".join(c.to_bytes(2, "big") for c in codes)
    assert _pdf_decode_shown(raw, font) == "".join(mapping[c] for c in codes)


@settings(max_examples=40, deadline=None)
@given(st.dictionaries(
    st.characters(min_codepoint=0x20, max_codepoint=0x2FA0),
    st.integers(min_value=1, max_value=0xFFFE),
    min_size=1, max_size=50))
def test_ttf_cmap4_inversion_roundtrip(char_to_gid):
    """Property: any format-4 cmap built from a char→gid map inverts to
    a gid→char map covering every pair whose gid is unambiguous (two
    chars may share a gid — the inverse keeps the first by code order,
    matching the parser's setdefault)."""
    from mmore_spark.sources.registry import _ttf_gid_to_unicode
    from tests.test_sources import _make_ttf_cmap4

    g2u = _ttf_gid_to_unicode(_make_ttf_cmap4(char_to_gid))
    assert g2u is not None
    expect = {}
    for c in sorted(char_to_gid):
        expect.setdefault(char_to_gid[c], c)
    assert g2u == expect
