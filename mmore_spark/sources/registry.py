"""Per-format processor registry + routing (SURVEY.md §2.1/§2.10).

Reference: a plugin registry where the first processor whose ``accepts()``
matches the file extension wins (/root/reference/src/mmore/process/
processors/base.py:40-85), and the dispatcher buckets files by processor
class before batching (dispatcher.py:181-201).

Spark mapping: files arrive as a ``binaryFile`` scan (path, content);
routing is a NATIVE derived ``format`` column (extension → processor
name — the whole dispatch table is one ``element_at(map, ext)``
expression); each format's parser is an Arrow-batched function applied
per format partition.  Every registered format parses for REAL with the
stdlib: txt/md/html directly; eml via ``email``; xlsx/docx/pptx via
zipfile+ElementTree OOXML; csv/tsv via pandas; pdf via a content-stream
tokenizer (FlateDecode text + image XObjects); wav/mp3/mp4 via container
parsing (PCM decode, MPEG frame headers, ISO-BMFF boxes).  Only media
SAMPLE decoding (pixels / audio frames / ASR transcripts) needs absent
codec libraries — per-file NotImplementedError from the container
validators keeps failures isolated in the ``error`` column.

The parsed output is the mmore text+modalities contract: text with
``<attachment>`` placeholders + ordered media refs → spans.
"""

from __future__ import annotations

import re
from typing import Callable, Iterator

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql import types as T

from ..corpus.generator import ATTACHMENT_TAG

# parser(path, payload bytes) -> (text_with_tags, [(kind, media_ref)])
Parser = Callable[[str, bytes], tuple[str, list[tuple[str, str]]]]


def parse_txt(path: str, payload: bytes) -> tuple[str, list]:
    """TXT processor (txt_processor.py:38-59): decode + light cleaning."""
    text = payload.decode("utf-8", errors="replace")
    text = re.sub(r"[ \t]+", " ", text).strip()
    return text, []


_MD_IMG = re.compile(r"!\[[^\]]*\]\(([^)]*)\)")


def parse_md(path: str, payload: bytes) -> tuple[str, list]:
    """Markdown processor (md_processor.py:49-167): image refs become
    ``<attachment>`` placeholders, refs collected in reading order."""
    text = payload.decode("utf-8", errors="replace")
    refs = [(("image", m.group(1))) for m in _MD_IMG.finditer(text)]
    return _MD_IMG.sub(ATTACHMENT_TAG, text), refs


_HTML_IMG = re.compile(r"<img[^>]*src=[\"']([^\"']*)[\"'][^>]*>", re.I)
_HTML_TAG = re.compile(r"<[^>]+>")


_HTML_ATT_SENTINEL = "\x00ATT\x00"


class _HTMLToMd:
    """Structural html→markdown-lite conversion (stdlib HTMLParser),
    mirroring the reference's markdownify pass (html_processor.py:7,
    33-110): headings → ``#``, list items → ``- ``, anchors →
    ``[text](href)``, tables → markdown tables, script/style dropped,
    inline images → attachment sentinel in reading order."""

    _BLOCK_ENDS = {"p", "div", "section", "article", "header", "footer",
                   "blockquote", "ul", "ol", "li", "tr", "title"}

    def __init__(self) -> None:
        from html.parser import HTMLParser

        self.blocks: list[str] = []
        self.buf: list[str] = []
        self.refs: list[tuple[str, str]] = []
        self.skip = 0
        self.heading = 0
        self.list_item = False
        self.table_rows: list[list[str]] | None = None
        self.cell: list[str] | None = None
        self.a_hrefs: list[str] = []

        outer = self

        class P(HTMLParser):
            def handle_starttag(self, tag, attrs):
                outer.start(tag, dict(attrs))

            def handle_startendtag(self, tag, attrs):
                outer.start(tag, dict(attrs))

            def handle_endtag(self, tag):
                outer.end(tag)

            def handle_data(self, data):
                outer.data(data)

        self.parser = P(convert_charrefs=True)

    def _sink(self) -> list[str]:
        return self.cell if self.cell is not None else self.buf

    def _flush(self) -> None:
        text = re.sub(r"\s+", " ", "".join(self.buf)).strip()
        self.buf = []
        if text:
            if self.heading:
                text = "#" * self.heading + " " + text
            elif self.list_item:
                text = "- " + text
            self.blocks.append(text)

    def start(self, tag: str, a: dict) -> None:
        if tag in ("script", "style"):
            self.skip += 1
        elif tag == "img":
            self.refs.append(("image", a.get("src", "")))
            self._sink().append(f" {_HTML_ATT_SENTINEL} ")
        elif tag in ("h1", "h2", "h3", "h4", "h5", "h6"):
            self._flush()
            self.heading = int(tag[1])
        elif tag == "li":
            self._flush()
            self.list_item = True
        elif tag == "br":
            self._flush()
        elif tag == "table":
            self._flush()
            self.table_rows = []
        elif tag == "tr" and self.table_rows is not None:
            self.table_rows.append([])
        elif tag in ("td", "th") and self.table_rows is not None:
            self.cell = []
        elif tag == "a":
            href = a.get("href") or ""
            self.a_hrefs.append(href)
            if href:
                self._sink().append("[")

    def end(self, tag: str) -> None:
        if tag in ("script", "style"):
            self.skip = max(0, self.skip - 1)
        elif tag in ("h1", "h2", "h3", "h4", "h5", "h6"):
            self._flush()
            self.heading = 0
        elif tag == "li":
            self._flush()
            self.list_item = False
        elif tag in ("td", "th") and self.cell is not None:
            if self.table_rows and self.table_rows[-1] is not None:
                self.table_rows[-1].append(
                    re.sub(r"\s+", " ", "".join(self.cell)).strip())
            self.cell = None
        elif tag == "table" and self.table_rows is not None:
            rows = [r for r in self.table_rows if r]
            self.table_rows = None
            lines = []
            for r in rows:
                lines.append("| " + " | ".join(r) + " |")
                if len(lines) == 1:
                    lines.append("|" + " --- |" * len(r))
            if lines:
                self.blocks.append("\n".join(lines))
        elif tag == "a" and self.a_hrefs:
            href = self.a_hrefs.pop()
            if href:
                self._sink().append(f"]({href})")
        elif tag in self._BLOCK_ENDS:
            self._flush()

    def data(self, d: str) -> None:
        if not self.skip:
            self._sink().append(d)

    def run(self, text: str) -> str:
        self.parser.feed(text)
        self.parser.close()
        self._flush()
        return "\n\n".join(self.blocks)


def parse_html(path: str, payload: bytes) -> tuple[str, list]:
    """HTML processor (html_processor.py:33-110, markdownify pass):
    structural html→markdown-lite — headings, list items, anchors and
    tables keep their shape (tables feed the table-aware chunker), image
    tags → placeholders.  The placeholder travels as a non-tag sentinel
    (round-3 bug: a literal ``<attachment>`` was eaten by tag handling
    and the media span lost its position in the span sequence)."""
    conv = _HTMLToMd()
    text = conv.run(payload.decode("utf-8", errors="replace"))
    return text.replace(_HTML_ATT_SENTINEL, ATTACHMENT_TAG), conv.refs


def _clean_py(text: str) -> str:
    """Python twin of operators.taggers.clean_text (the reference's
    exact cleantext flag slice, process/utils.py:28-57): strip control
    chars, collapse horizontal whitespace, and substitute emails with
    the literal email@email.com — the ONLY replacement the reference
    enables (URLs/case/line breaks untouched)."""
    text = re.sub(r"[\x00-\x08\x0b\x0c\x0e-\x1f]", "", text)
    text = re.sub(r"[ \t]+", " ", text)
    text = re.sub(r"\S+@\S+\.\S+", "email@email.com", text)
    return text.strip()


def parse_eml(path: str, payload: bytes) -> tuple[str, list]:
    """EML processor (eml_processor.py:44-110), stdlib ``email``:
    From/To/Subject/Date header lines + cleaned text/plain parts; image/*
    parts become ``<attachment>`` placeholders with ordered refs."""
    import email
    from email import policy

    msg = email.message_from_bytes(payload, policy=policy.default)
    parts: list[str] = []
    refs: list[tuple[str, str]] = []
    for h in ("From", "To", "Subject", "Date"):
        parts.append(_clean_py(f"{h}: {msg.get(h, '')}"))
    n_img = 0
    for part in msg.walk():
        ctype = part.get_content_type()
        if ctype == "text/plain":
            try:
                cleaned = _clean_py(part.get_content())
            except Exception:
                continue
            if cleaned.strip():
                parts.append(cleaned)
        elif ctype.startswith("image/"):
            refs.append(("image", f"{path}#image{n_img}"))
            parts.append(ATTACHMENT_TAG)
            n_img += 1
    return "\n".join(parts), refs


_XLSX_NS = "{http://schemas.openxmlformats.org/spreadsheetml/2006/main}"
_XLSX_RNS = "{http://schemas.openxmlformats.org/officeDocument/2006/relationships}"
_PKG_RNS = "{http://schemas.openxmlformats.org/package/2006/relationships}"


def _xlsx_cell_col(ref: str) -> int:
    """'B3' → 0-based column index 1."""
    col = 0
    for ch in ref:
        if not ch.isalpha():
            break
        col = col * 26 + (ord(ch.upper()) - ord("A") + 1)
    return col - 1


def _xlsx_grid(ws_xml: bytes, shared: list[str]) -> list[list]:
    """Worksheet XML → row-major cell grid (openpyxl-free)."""
    import xml.etree.ElementTree as ET

    root = ET.fromstring(ws_xml)
    grid: list[list] = []
    for row in root.iter(f"{_XLSX_NS}row"):
        cells: list = []
        for c in row.iter(f"{_XLSX_NS}c"):
            ref = c.get("r", "")
            col = _xlsx_cell_col(ref) if ref else len(cells)
            ctype = c.get("t", "n")
            v = c.find(f"{_XLSX_NS}v")
            if ctype == "inlineStr":
                t = c.find(f"{_XLSX_NS}is/{_XLSX_NS}t")
                val = t.text if t is not None else None
            elif v is None or v.text is None:
                val = None
            elif ctype == "s":
                val = shared[int(v.text)]
            elif ctype == "str":
                val = v.text
            elif ctype == "b":
                val = bool(int(v.text))
            else:
                f = float(v.text)
                val = int(f) if f.is_integer() else f
            while len(cells) < col:
                cells.append(None)
            cells.append(val)
        grid.append(cells)
    width = max((len(r) for r in grid), default=0)
    return [r + [None] * (width - len(r)) for r in grid]


def parse_xlsx(path: str, payload: bytes) -> tuple[str, list]:
    """Spreadsheet processor (spreadsheet_processor.py:47-112) without
    openpyxl: zipfile + xml.etree parse of the OOXML parts, then the
    reference's exact text shape — per sheet ``"Sheet: {name}\\n" +
    df.to_string(index=False)`` with the first row as header."""
    import io
    import xml.etree.ElementTree as ET
    import zipfile

    import pandas as pd

    zf = zipfile.ZipFile(io.BytesIO(payload))
    shared: list[str] = []
    if "xl/sharedStrings.xml" in zf.namelist():
        root = ET.fromstring(zf.read("xl/sharedStrings.xml"))
        for si in root.iter(f"{_XLSX_NS}si"):
            shared.append("".join(t.text or "" for t in si.iter(f"{_XLSX_NS}t")))
    rels = {}
    for rel in ET.fromstring(zf.read("xl/_rels/workbook.xml.rels")).iter(
        f"{_PKG_RNS}Relationship"
    ):
        rels[rel.get("Id")] = rel.get("Target").lstrip("/")
    text = ""
    for sheet in ET.fromstring(zf.read("xl/workbook.xml")).iter(f"{_XLSX_NS}sheet"):
        target = rels[sheet.get(f"{_XLSX_RNS}id")]
        if not target.startswith("xl/"):
            target = f"xl/{target}"
        grid = _xlsx_grid(zf.read(target), shared)
        header, data = (grid[0], grid[1:]) if grid else ([], [])
        df = pd.DataFrame(data, columns=header)
        text += f"Sheet: {sheet.get('name')}\n"
        text += df.to_string(index=False) + "\n\n"
    return text.strip(), []


_W_NS = "{http://schemas.openxmlformats.org/wordprocessingml/2006/main}"
_A_NS = "{http://schemas.openxmlformats.org/drawingml/2006/main}"
_P_NS = "{http://schemas.openxmlformats.org/presentationml/2006/main}"


def _rels(zf, rels_path: str) -> dict[str, str]:
    import xml.etree.ElementTree as ET

    if rels_path not in zf.namelist():
        return {}
    return {
        rel.get("Id"): rel.get("Target")
        for rel in ET.fromstring(zf.read(rels_path)).iter(f"{_PKG_RNS}Relationship")
    }


def parse_docx(path: str, payload: bytes) -> tuple[str, list]:
    """DOCX processor (docx_processor.py:50-133) without mammoth: zipfile +
    ElementTree over word/document.xml — paragraph runs concatenated in
    document order, Heading styles rendered as markdown headings and
    ``w:tbl`` tables as markdown tables (the reference's html→markdown
    path does both), inline images replaced by ``<attachment>`` with refs
    resolved through the relationship part.  Unknown containers (w:sdt
    and friends) are walked recursively so wrapped paragraphs still
    extract."""
    import io
    import xml.etree.ElementTree as ET
    import zipfile

    zf = zipfile.ZipFile(io.BytesIO(payload))
    rels = _rels(zf, "word/_rels/document.xml.rels")
    root = ET.fromstring(zf.read("word/document.xml"))
    paras: list[str] = []
    refs: list[tuple[str, str]] = []

    def runs(p) -> str:
        parts: list[str] = []
        for el in p.iter():
            if el.tag == f"{_W_NS}t" and el.text:
                parts.append(el.text)
            elif el.tag == f"{_A_NS}blip":
                rid = el.get(f"{_XLSX_RNS}embed")
                target = rels.get(rid, "")
                refs.append(("image", f"{path}#{target.rsplit('/', 1)[-1]}"))
                parts.append(ATTACHMENT_TAG)
        return "".join(parts).strip()

    def paragraph(p) -> None:
        text = runs(p)
        if not text:
            return
        style = p.find(f"{_W_NS}pPr/{_W_NS}pStyle")
        sval = style.get(f"{_W_NS}val", "") if style is not None else ""
        m = re.fullmatch(r"Heading([1-6])", sval)
        if m:
            text = "#" * int(m.group(1)) + " " + text
        paras.append(text)

    def table(tbl) -> None:
        lines: list[str] = []
        for ri, tr in enumerate(tbl.findall(f"{_W_NS}tr")):
            cells = [" ".join(filter(None, (runs(p) for p in
                                            tc.iter(f"{_W_NS}p"))))
                     for tc in tr.findall(f"{_W_NS}tc")]
            lines.append("| " + " | ".join(cells) + " |")
            if ri == 0:
                lines.append("|" + " --- |" * len(cells))
        if lines:
            paras.append("\n".join(lines))

    def emit(el) -> None:
        if el.tag == f"{_W_NS}p":
            paragraph(el)
        elif el.tag == f"{_W_NS}tbl":
            table(el)
        else:
            for ch in el:
                emit(ch)

    body = root.find(f"{_W_NS}body")
    for child in (body if body is not None else root):
        emit(child)
    return "\n\n".join(paras), refs


def _pptx_shape_top(shape) -> int:
    off = shape.find(f".//{_A_NS}off")
    if off is not None and off.get("y", "").lstrip("-").isdigit():
        return int(off.get("y"))
    return 1 << 62  # no explicit position → sort last (deterministic)


def parse_pptx(path: str, payload: bytes) -> tuple[str, list]:
    """PPTX processor (pptx_processor.py:45-116) without python-pptx:
    slides in presentation order, shapes sorted by vertical position,
    text frames cleaned, pictures → ``<attachment>`` placeholders, then
    notes-slide paragraphs."""
    import io
    import xml.etree.ElementTree as ET
    import zipfile

    zf = zipfile.ZipFile(io.BytesIO(payload))
    pres_rels = _rels(zf, "ppt/_rels/presentation.xml.rels")
    pres = ET.fromstring(zf.read("ppt/presentation.xml"))
    all_text: list[str] = []
    refs: list[tuple[str, str]] = []
    for sld in pres.iter(f"{_P_NS}sldId"):
        target = pres_rels.get(sld.get(f"{_XLSX_RNS}id"), "")
        slide_path = "ppt/" + target.lstrip("/").removeprefix("ppt/")
        slide_rels = _rels(
            zf, slide_path.rsplit("/", 1)[0] + "/_rels/"
            + slide_path.rsplit("/", 1)[-1] + ".rels")
        slide = ET.fromstring(zf.read(slide_path))
        tree = slide.find(f"{_P_NS}cSld/{_P_NS}spTree")
        shapes = []
        for shape in list(tree) if tree is not None else []:
            if shape.tag in (f"{_P_NS}sp", f"{_P_NS}pic"):
                shapes.append((_pptx_shape_top(shape), len(shapes), shape))
        for _top, _i, shape in sorted(shapes, key=lambda s: (s[0], s[1])):
            if shape.tag == f"{_P_NS}sp":
                body = shape.find(f"{_P_NS}txBody")
                if body is None:
                    continue
                lines = []
                for para in body.iter(f"{_A_NS}p"):
                    lines.append("".join(
                        t.text or "" for t in para.iter(f"{_A_NS}t")))
                cleaned = _clean_py("\n".join(lines))
                if cleaned.strip():
                    all_text.append(cleaned)
            else:  # picture
                blip = shape.find(f".//{_A_NS}blip")
                rid = blip.get(f"{_XLSX_RNS}embed") if blip is not None else None
                target = slide_rels.get(rid, "")
                refs.append(("image", f"{path}#{target.rsplit('/', 1)[-1]}"))
                all_text.append(ATTACHMENT_TAG)
        # notes slide paragraphs (pptx_processor.py:103-109)
        notes_rel = next(
            (t for t in slide_rels.values() if "notesSlide" in t), None)
        if notes_rel:
            notes_path = "ppt/" + notes_rel.lstrip("/").replace("../", "")
            if notes_path in zf.namelist():
                notes = ET.fromstring(zf.read(notes_path))
                for para in notes.iter(f"{_A_NS}p"):
                    cleaned = _clean_py(
                        "".join(t.text or "" for t in para.iter(f"{_A_NS}t")))
                    if cleaned.strip():
                        all_text.append(cleaned)
    return "\n".join(all_text), refs


def parse_csv(path: str, payload: bytes) -> tuple[str, list]:
    """CSV/TSV branch of the spreadsheet processor
    (spreadsheet_processor.py:96-112): pandas read + to_string."""
    import io

    import pandas as pd

    sep = "\t" if path.lower().endswith(".tsv") else ","
    df = pd.read_csv(io.BytesIO(payload), sep=sep)
    return df.to_string(index=False), []


def _pdf_literal(data: bytes, i: int) -> tuple[str, int]:
    """Decode a PDF literal string starting at ``data[i] == '('``; returns
    (text, index past the closing paren).  Handles balanced nesting and
    the standard backslash escapes incl. octal (PDF 32000-1 §7.3.4.2)."""
    assert data[i:i + 1] == b"("
    out = bytearray()
    depth = 1
    i += 1
    esc = {"n": b"\n", "r": b"\r", "t": b"\t", "b": b"\b", "f": b"\f",
           "(": b"(", ")": b")", "\\": b"\\"}
    while i < len(data) and depth:
        c = data[i:i + 1]
        if c == b"\\":
            nxt = data[i + 1:i + 2].decode("latin-1", "replace")
            if nxt in esc:
                out += esc[nxt]
                i += 2
            # `nxt and`: a truncated literal ending in a lone backslash has
            # nxt == '' and `'' in "..."` is True — would reach int('', 8)
            elif nxt and nxt in "01234567":  # octal only: \8 \9 fall through
                oct_s = ""
                j = i + 1
                while j < len(data) and len(oct_s) < 3 and data[j:j + 1] in b"01234567":
                    oct_s += data[j:j + 1].decode()
                    j += 1
                out.append(int(oct_s, 8) & 0xFF)
                i = j
            elif nxt in ("\r", "\n"):  # line continuation: drop \ + EOL
                i += 2
                if nxt == "\r" and data[i:i + 1] == b"\n":
                    i += 1
            else:  # unknown escape: spec says drop the backslash, KEEP the char
                out += data[i + 1:i + 2]
                i += 2
        elif c == b"(":
            depth += 1
            out += c
            i += 1
        elif c == b")":
            depth -= 1
            if depth:
                out += c
            i += 1
        else:
            out += c
            i += 1
    return out.decode("latin-1", "replace"), i


_PDF_OP_RE = re.compile(rb"[A-Za-z'\"*]+")

# sentinel an XObject draw (`/Name Do`) leaves in the extracted text; parse_pdf
# maps sentinels to image modalities in reading order
_PDF_XOBJ_SENTINEL = "\x00XOBJ\x00"


_PDF_NAME_RE = re.compile(rb"/([^\s/<>()\[\]{}%]*)")

# font value: (code width in bytes, {code: unicode string}) from ToUnicode
_PdfFont = tuple  # (int, dict[int, str])


# A /Subtype /Type0 (composite/CID) font with NO ToUnicode CMap: its
# string bytes are opaque CID codes — decoding them latin-1 would emit
# mojibake, so shown strings drop entirely (the page then degrades to a
# media span at the document level; VERDICT r04 #1).
_CID_OPAQUE: "_PdfFont" = (0, None)


def _pdf_decode_shown(raw: bytes, font: "_PdfFont | None") -> str:
    """Decode the raw bytes of one shown string: through the active font's
    ToUnicode CMap when there is one (CID text — codes are 1- or 2-byte
    units, unmapped codes drop like a .notdef glyph), else latin-1 (simple
    fonts, the pre-round-4 behavior).  ``_CID_OPAQUE`` fonts (Type0
    without ToUnicode) drop their strings — opaque CID codes, not text."""
    if font is None:
        return raw.decode("latin-1", "replace")
    w, mp = font
    if mp is None:
        return ""
    return "".join(
        mp.get(int.from_bytes(raw[k:k + w], "big"), "")
        for k in range(0, len(raw) - w + 1, w)
    )


def _pdf_text_from_content(content: bytes,
                           fonts: "dict[str, _PdfFont] | None" = None) -> str:
    """Extract shown text from one content stream: literal/hex strings fed
    to Tj / ' / \" / TJ, with Td/TD/T*/'/\" treated as line breaks; ``Do``
    (XObject draw) leaves a sentinel so embedded images keep their reading-
    order position in the span sequence.  ``fonts`` maps resource names to
    ToUnicode CMaps; ``/Fx ... Tf`` switches the active font so CID hex
    (or literal) strings decode through the right map.  Name tokens are
    consumed as NAMES — an operand like ``/TD`` must not be mistaken for
    the TD operator."""
    out: list[str] = []
    pending: list[str] = []
    cur_font: "_PdfFont | None" = None
    last_name = ""

    def flush(newline: bool) -> None:
        if pending:
            out.append("".join(pending))
            pending.clear()
        if newline and out and not out[-1].endswith("\n"):
            out.append("\n")

    i, n = 0, len(content)
    while i < n:
        c = content[i:i + 1]
        if c == b"(":
            s, i = _pdf_literal(content, i)
            # _pdf_literal is latin-1 (byte-transparent): recover raw bytes
            pending.append(_pdf_decode_shown(s.encode("latin-1"), cur_font))
        elif c == b"/":
            m = _PDF_NAME_RE.match(content, i)
            last_name = m.group(1).decode("latin-1", "replace") if m else ""
            i = m.end() if m else i + 1
        elif c == b"<" and content[i + 1:i + 2] != b"<":
            j = content.find(b">", i)
            if j == -1:
                break
            hx = content[i + 1:j].translate(None, b" \r\n\t")
            if len(hx) % 2:
                hx += b"0"
            try:
                pending.append(_pdf_decode_shown(bytes.fromhex(hx.decode()),
                                                 cur_font))
            except ValueError:
                pass
            i = j + 1
        elif c.isalpha() or c in (b"'", b'"'):
            m = _PDF_OP_RE.match(content, i)
            op = m.group() if m else b""
            if op in (b"Td", b"TD", b"T*", b"'", b'"'):
                flush(newline=True)
            elif op in (b"Tj", b"TJ"):
                flush(newline=False)
            elif op == b"Tf":  # /Name size Tf — select font
                cur_font = fonts.get(last_name) if fonts else None
            elif op == b"Do":  # XObject draw — possible embedded image
                flush(newline=False)
                out.append(_PDF_XOBJ_SENTINEL)
            else:
                pending.clear()  # strings not followed by a show op
            i = m.end() if m else i + 1
        else:
            i += 1
    flush(newline=False)
    return "".join(out)


def _pdf_cmap(data: bytes) -> "_PdfFont | None":
    """Parse a ToUnicode CMap stream (PDF 32000-1 §9.10.3): code width
    from the first codespacerange, mappings from bfchar pairs and bfrange
    runs (both the start-offset and the per-code array form).  Destination
    hex is UTF-16BE.  Returns (width, {code: str}) or None."""
    if not data:
        return None
    mcs = re.search(rb"begincodespacerange(.*?)endcodespacerange", data,
                    re.DOTALL)
    width = 2
    if mcs:
        mfirst = re.search(rb"<([0-9A-Fa-f]+)>", mcs.group(1))
        if mfirst:
            width = max(1, len(mfirst.group(1)) // 2)

    def uni(hexs: bytes) -> str:
        try:
            return bytes.fromhex(hexs.decode()).decode("utf-16-be", "replace")
        except ValueError:
            return ""

    mp: dict[int, str] = {}
    for sec in re.finditer(rb"beginbfchar(.*?)endbfchar", data, re.DOTALL):
        for a, b in re.findall(rb"<([0-9A-Fa-f]+)>\s*<([0-9A-Fa-f]+)>",
                               sec.group(1)):
            mp[int(a, 16)] = uni(b)
    for sec in re.finditer(rb"beginbfrange(.*?)endbfrange", data, re.DOTALL):
        body = sec.group(1)
        for lo, hi, arr in re.findall(
                rb"<([0-9A-Fa-f]+)>\s*<([0-9A-Fa-f]+)>\s*\[((?:\s*<[0-9A-Fa-f]+>)+)\s*\]",
                body):
            dsts = re.findall(rb"<([0-9A-Fa-f]+)>", arr)
            for k, d in enumerate(dsts):
                mp[int(lo, 16) + k] = uni(d)
        for lo, hi, d0 in re.findall(
                rb"<([0-9A-Fa-f]+)>\s*<([0-9A-Fa-f]+)>\s*<([0-9A-Fa-f]+)>",
                body):
            lo_i, hi_i = int(lo, 16), int(hi, 16)
            base = int(d0, 16)
            w = len(d0) // 2
            for k in range(hi_i - lo_i + 1):
                mp[lo_i + k] = uni(
                    b"%0*X" % (w * 2, base + k))
    return (width, mp) if mp else None


def _pdf_balanced_dict(data: bytes, start: int) -> bytes:
    """Return the balanced ``<< ... >>`` slice beginning at ``start``."""
    depth, i, n = 0, start, len(data)
    while i < n:
        if data[i:i + 2] == b"<<":
            depth += 1
            i += 2
        elif data[i:i + 2] == b">>":
            depth -= 1
            i += 2
            if depth == 0:
                return data[start:i]
        else:
            i += 1
    return data[start:n]


def _ttf_gid_to_unicode(font: bytes) -> "dict[int, str] | None":
    """Invert an embedded TrueType's ``cmap`` table (unicode → glyph id,
    formats 4 and 12; best of the (3,10)/(3,1)/(0,x) encodings) into
    glyph id → unicode.  For an Identity-H CIDFontType2 with
    /CIDToGIDMap /Identity, CID == GID, so this recovers text from CID
    PDFs that ship no ToUnicode CMap (the last text-bearing case short
    of OCR; the reference reaches the same mapping through pymupdf's
    font machinery, pdf_processor.py:190-258)."""
    import struct

    try:
        if len(font) < 12:
            return None
        num_tables = struct.unpack(">H", font[4:6])[0]
        cmap_off = None
        for i in range(num_tables):
            rec = font[12 + 16 * i:28 + 16 * i]
            if len(rec) < 16:
                return None
            tag, _chk, off, _ln = struct.unpack(">4sIII", rec)
            if tag == b"cmap":
                cmap_off = off
                break
        if cmap_off is None or cmap_off + 4 > len(font):
            return None
        n_sub = struct.unpack(">H", font[cmap_off + 2:cmap_off + 4])[0]
        best, best_rank = None, -1
        for i in range(n_sub):
            rec = font[cmap_off + 4 + 8 * i:cmap_off + 12 + 8 * i]
            if len(rec) < 8:
                break
            p, e, off = struct.unpack(">HHI", rec)
            rank = {(3, 10): 4, (3, 1): 3}.get((p, e), 2 if p == 0 else 0)
            if rank > best_rank:
                best_rank, best = rank, cmap_off + off
        if best is None or best + 2 > len(font):
            return None
        fmt = struct.unpack(">H", font[best:best + 2])[0]
        out: dict[int, str] = {}
        if fmt == 4:
            segx2 = struct.unpack(">H", font[best + 6:best + 8])[0]
            segc = segx2 // 2
            ends = struct.unpack(f">{segc}H", font[best + 14:best + 14 + segx2])
            so = best + 16 + segx2  # skip reservedPad
            starts = struct.unpack(f">{segc}H", font[so:so + segx2])
            deltas = struct.unpack(f">{segc}h", font[so + segx2:so + 2 * segx2])
            iro_base = so + 2 * segx2
            iros = struct.unpack(f">{segc}H", font[iro_base:iro_base + segx2])
            for s in range(segc):
                for c in range(starts[s], min(ends[s], 0xFFFE) + 1):
                    if iros[s] == 0:
                        g = (c + deltas[s]) & 0xFFFF
                    else:
                        addr = iro_base + 2 * s + iros[s] + 2 * (c - starts[s])
                        if addr + 2 > len(font):
                            continue
                        g = struct.unpack(">H", font[addr:addr + 2])[0]
                        if g:
                            g = (g + deltas[s]) & 0xFFFF
                    if g:
                        out.setdefault(g, chr(c))
        elif fmt == 12:
            n_groups = struct.unpack(">I", font[best + 12:best + 16])[0]
            for i in range(min(n_groups, 1 << 20)):
                rec = font[best + 16 + 12 * i:best + 28 + 12 * i]
                if len(rec) < 12:
                    break
                sc, ec, sg = struct.unpack(">III", rec)
                for j in range(min(ec - sc + 1, 1 << 16)):
                    if sc + j <= 0x10FFFF:
                        out.setdefault(sg + j, chr(sc + j))
        else:
            return None
        return out or None
    except (struct.error, ValueError, OverflowError):
        return None


def _pdf_type0_font_cmap(fobj: bytes, bodies: "dict[int, bytes]",
                         stream_raws: "dict[int, bytes]"
                         ) -> "_PdfFont | None":
    """Recover a code→unicode map for a Type0 font WITHOUT ToUnicode:
    /Encoding /Identity-H makes string bytes 2-byte CIDs, a
    CIDFontType2 descendant with /CIDToGIDMap /Identity (or absent —
    Identity is the default, PDF 32000-1 §9.7.4.2) makes CID == GID, and
    the embedded /FontFile2 TrueType's inverted cmap maps GID → unicode.
    Returns the same (width, map) shape the ToUnicode path produces."""
    if not re.search(rb"/Encoding\s*/Identity-H\b", fobj):
        return None
    mdesc = re.search(rb"/DescendantFonts\s*\[?\s*(\d+)\s+\d+\s+R", fobj)
    if not mdesc:
        return None
    desc = bodies.get(int(mdesc.group(1)), b"")
    mgid = re.search(rb"/CIDToGIDMap\s*/(\w+)", desc)
    if mgid and mgid.group(1) != b"Identity":
        return None
    # CIDToGIDMap may also be an embedded STREAM of 2-byte big-endian
    # GIDs indexed by CID (PDF 32000-1 §9.7.4.3) — compose it with the
    # inverted cmap below
    mgid_ref = re.search(rb"/CIDToGIDMap\s+(\d+)\s+\d+\s+R", desc)
    gidmap = stream_raws.get(int(mgid_ref.group(1))) if mgid_ref else None
    mfd = re.search(rb"/FontDescriptor\s+(\d+)\s+\d+\s+R", desc)
    if not mfd:
        return None
    fd = bodies.get(int(mfd.group(1)), b"")
    mff = re.search(rb"/FontFile2\s+(\d+)\s+\d+\s+R", fd)
    if not mff:
        return None
    prog = stream_raws.get(int(mff.group(1)))
    if not prog:
        return None
    g2u = _ttf_gid_to_unicode(prog)
    if not g2u:
        return None
    if gidmap:
        c2u = {}
        for cid in range(len(gidmap) // 2):
            gid = int.from_bytes(gidmap[2 * cid:2 * cid + 2], "big")
            if gid in g2u:
                c2u.setdefault(cid, g2u[gid])
        return (2, c2u) if c2u else None
    return (2, g2u)


def _pdf_resources_fonts(body: bytes, bodies: "dict[int, bytes]",
                         stream_raws: "dict[int, bytes]"
                         ) -> "dict[str, _PdfFont]":
    """Resolve a page's font resources to ToUnicode CMaps: /Resources
    (inline or ref) → /Font (inline or ref) → per-name font object →
    /ToUnicode stream → parsed CMap.  Simple fonts without a usable
    ToUnicode are omitted (their strings keep the latin-1 path); Type0
    fonts without one map to ``_CID_OPAQUE`` (strings drop)."""
    def dict_of(container: bytes, key: bytes) -> bytes:
        mref = re.search(key + rb"\s+(\d+)\s+\d+\s+R", container)
        if mref:
            return bodies.get(int(mref.group(1)), b"")
        minl = re.search(key + rb"\s*<<", container)
        if minl:
            return _pdf_balanced_dict(container, minl.end() - 2)
        return b""

    res = dict_of(body, rb"/Resources")
    fnt = dict_of(res, rb"/Font")
    fonts: dict[str, _PdfFont] = {}
    for mname in re.finditer(rb"/([^\s/<>()\[\]{}%]+)\s+(\d+)\s+\d+\s+R", fnt):
        name = mname.group(1).decode("latin-1")
        if name == "Font":
            continue
        fobj = bodies.get(int(mname.group(2)), b"")
        mtu = re.search(rb"/ToUnicode\s+(\d+)\s+\d+\s+R", fobj)
        cmap = _pdf_cmap(stream_raws.get(int(mtu.group(1)), b"")) \
            if mtu else None
        if cmap:
            fonts[name] = cmap
        elif re.search(rb"/Subtype\s*/Type0\b", fobj):
            # composite font without a usable ToUnicode: try inverting
            # the embedded TrueType's cmap (Identity-H, CID == GID);
            # failing that, mark opaque so strings drop instead of
            # decoding as latin-1 mojibake
            fonts[name] = (_pdf_type0_font_cmap(fobj, bodies, stream_raws)
                           or _CID_OPAQUE)
    return fonts


def _pdf_lzw_decode(data: bytes, early: int = 1) -> bytes:
    """PDF LZWDecode (PDF 32000-1 §7.4.4): MSB-first bit stream, variable
    code width 9→12, code 256 = clear table, 257 = EOD, ``early`` (the
    /EarlyChange default 1) widens one code before the table fills."""
    out = bytearray()
    table: list[bytes] = [bytes([i]) for i in range(256)] + [b"", b""]
    width, prev = 9, None
    acc = nbits = 0
    for byte in data:
        acc = (acc << 8) | byte
        nbits += 8
        while nbits >= width:
            code = (acc >> (nbits - width)) & ((1 << width) - 1)
            nbits -= width
            if code == 256:
                table = [bytes([i]) for i in range(256)] + [b"", b""]
                width, prev = 9, None
                continue
            if code == 257:
                return bytes(out)
            if prev is None:
                entry = table[code]
            elif code < len(table):
                entry = table[code]
                table.append(prev + entry[:1])
            else:
                entry = prev + prev[:1]
                table.append(entry)
            out += entry
            prev = entry
            # Standard rule (pdfminer/pdf.js/Ghostscript): with EarlyChange=1
            # the decoder widens when the NEXT table entry would need more
            # bits, i.e. at table sizes 511/1023/2047 — one earlier than the
            # table-full point the naive reading suggests.
            if len(table) + early >= (1 << width) and width < 12:
                width += 1
    return bytes(out)


def _png_unpredict(data: bytes, columns: int, colors: int = 1,
                   bpc: int = 8) -> bytes:
    """Undo PNG row predictors (/Predictor ≥ 10 on FlateDecode, common on
    object/xref streams): each row is a filter-type byte + ``columns``
    samples; types 0-4 = None/Sub/Up/Average/Paeth."""
    bpp = max(1, colors * bpc // 8)
    rowlen = columns * bpp
    out = bytearray()
    prev = bytearray(rowlen)
    i, n = 0, len(data)
    while i + 1 <= n:
        ft = data[i]
        row = bytearray(data[i + 1:i + 1 + rowlen])
        i += 1 + rowlen
        for j in range(len(row)):
            left = row[j - bpp] if j >= bpp else 0
            up = prev[j] if j < len(prev) else 0
            ul = prev[j - bpp] if j >= bpp else 0
            if ft == 1:
                row[j] = (row[j] + left) & 0xFF
            elif ft == 2:
                row[j] = (row[j] + up) & 0xFF
            elif ft == 3:
                row[j] = (row[j] + (left + up) // 2) & 0xFF
            elif ft == 4:
                p = left + up - ul
                pa, pb, pc = abs(p - left), abs(p - up), abs(p - ul)
                pred = left if pa <= pb and pa <= pc else (up if pb <= pc else ul)
                row[j] = (row[j] + pred) & 0xFF
        out += row
        prev = row
    return bytes(out)


def _pdf_decode_stream(head: bytes, raw: bytes) -> bytes | None:
    """Run a stream's /Filter chain (name or array) with the stdlib:
    FlateDecode (+ PNG predictors from /DecodeParms), LZWDecode,
    ASCIIHexDecode, ASCII85Decode.  Returns None for undecodable filters
    (DCT, JPX, Crypt...) — per-file isolation upstream."""
    import base64
    import zlib

    mf = re.search(rb"/Filter\s*(\[[^\]]*\]|/[A-Za-z0-9]+)", head)
    if not mf:
        return raw
    names = re.findall(rb"/([A-Za-z0-9]+)", mf.group(1))
    mp = re.search(rb"/(?:DecodeParms|DP)\s*<<", head)
    parms = _pdf_balanced_dict(head, mp.end() - 2) if mp else b""
    for name in names:
        try:
            if name in (b"FlateDecode", b"Fl"):
                raw = zlib.decompress(raw)
            elif name in (b"LZWDecode", b"LZW"):
                me = re.search(rb"/EarlyChange\s+(\d+)", parms)
                raw = _pdf_lzw_decode(raw, int(me.group(1)) if me else 1)
            elif name in (b"ASCIIHexDecode", b"AHx"):
                hx = raw.split(b">")[0].translate(None, b" \t\r\n\f\v")
                if len(hx) % 2:
                    hx += b"0"
                raw = bytes.fromhex(hx.decode("ascii"))
            elif name in (b"ASCII85Decode", b"A85"):
                a85 = raw.strip()
                if a85.startswith(b"<~"):
                    a85 = a85[2:]
                if a85.endswith(b"~>"):
                    a85 = a85[:-2]
                raw = base64.a85decode(a85, ignorechars=b" \t\r\n\f\v")
            elif name in (b"RunLengthDecode", b"RL"):
                out = bytearray()
                i = 0
                while i < len(raw):
                    ln = raw[i]
                    if ln == 128:  # EOD
                        break
                    if ln < 128:
                        out += raw[i + 1:i + 2 + ln]
                        i += 2 + ln
                    else:
                        out += raw[i + 1:i + 2] * (257 - ln)
                        i += 2
                raw = bytes(out)
            else:
                return None  # DCTDecode, JPXDecode, Crypt...
        except Exception:
            return None
        mpred = re.search(rb"/Predictor\s+(\d+)", parms)
        if name in (b"FlateDecode", b"Fl", b"LZWDecode", b"LZW") and mpred:
            pred = int(mpred.group(1))
            if pred >= 10:
                mc = re.search(rb"/Columns\s+(\d+)", parms)
                mcol = re.search(rb"/Colors\s+(\d+)", parms)
                mb = re.search(rb"/BitsPerComponent\s+(\d+)", parms)
                raw = _png_unpredict(
                    raw, int(mc.group(1)) if mc else 1,
                    int(mcol.group(1)) if mcol else 1,
                    int(mb.group(1)) if mb else 8)
            elif pred != 1:
                return None  # TIFF predictor 2: unsupported
    return raw


# PDF 32000-1 §7.6.3 standard security handler password padding
_PDF_PAD = bytes([
    0x28, 0xBF, 0x4E, 0x5E, 0x4E, 0x75, 0x8A, 0x41, 0x64, 0x00, 0x4E, 0x56,
    0xFF, 0xFA, 0x01, 0x08, 0x2E, 0x2E, 0x00, 0xB6, 0xD0, 0x68, 0x3E, 0x80,
    0x2F, 0x0C, 0xA9, 0xFE, 0x64, 0x53, 0x69, 0x7A])


def _rc4(key: bytes, data: bytes) -> bytes:
    """Plain RC4 (KSA + PRGA) — the stdlib has no RC4; ~40 lines of
    arithmetic is all PDF R2/R3 encryption needs."""
    s = list(range(256))
    j = 0
    for i in range(256):
        j = (j + s[i] + key[i % len(key)]) & 0xFF
        s[i], s[j] = s[j], s[i]
    out = bytearray()
    i = j = 0
    for b in data:
        i = (i + 1) & 0xFF
        j = (j + s[i]) & 0xFF
        s[i], s[j] = s[j], s[i]
        out.append(b ^ s[(s[i] + s[j]) & 0xFF])
    return bytes(out)


def _pdf_str_value(body: bytes, name: bytes) -> bytes:
    """Raw bytes of a dict entry that is a PDF string (literal or hex)."""
    m = re.search(rb"/" + name + rb"\s*", body)
    if not m:
        return b""
    i = m.end()
    if body[i:i + 1] == b"(":
        s, _ = _pdf_literal(body, i)
        return s.encode("latin-1")
    if body[i:i + 1] == b"<":
        j = body.find(b">", i)
        hx = body[i + 1:j].translate(None, b" \r\n\t")
        return bytes.fromhex(hx.decode("ascii"))
    return b""


def _pdf_decrypt_setup(payload: bytes, bodies: "dict[int, bytes]"):
    """Detect /Encrypt and, for the RC4 standard handler (R2/R3) with an
    EMPTY user password — the common owner-locked case — return a
    ``decrypt(objnum, gen, data)`` callable (PDF 32000-1 §7.6.2-7.6.3:
    file key from O/P/ID, per-object RC4 key from objnum/gen).  V4
    /AESV2 is handled via the stdlib cipher (aes128.py); AES-256
    (V5/R6) and a real user password raise per file."""
    import hashlib
    import struct

    m = re.search(rb"/Encrypt\s+(\d+)\s+\d+\s+R", payload)
    if not m:
        return None
    enc = bodies.get(int(m.group(1)), b"")
    if not re.search(rb"/Filter\s*/Standard\b", enc):
        raise NotImplementedError("pdf: non-standard security handler")
    mv = re.search(rb"/V\s+(\d+)", enc)
    v = int(mv.group(1)) if mv else 0
    aes = False
    if v == 4:
        if re.search(rb"/CFM\s*/AESV2\b", enc):
            aes = True  # AES-128-CBC via the stdlib cipher (aes128.py)
        elif not re.search(rb"/CFM\s*/V2\b", enc):
            raise NotImplementedError("pdf: unsupported V4 crypt filter")
    elif v > 4:
        raise NotImplementedError(
            "pdf: AES-256 (V5/R6) uses the SHA-2 handler — unsupported")
    mr = re.search(rb"/R\s+(\d+)", enc)
    r = int(mr.group(1)) if mr else 2
    # /Length must come from the TOP-LEVEL encrypt dict (bits), never from
    # a /CF crypt-filter sub-dict (whose /Length is in BYTES and may appear
    # first — PDF dict key order is arbitrary).  Strip the balanced /CF
    # dictionary before matching.
    enc_top = enc
    mcf = re.search(rb"/CF\s*<<", enc_top)
    if mcf:
        i, depth = mcf.end(), 1
        while depth and i < len(enc_top) - 1:
            if enc_top[i:i + 2] == b"<<":
                depth += 1
                i += 2
            elif enc_top[i:i + 2] == b">>":
                depth -= 1
                i += 2
            else:
                i += 1
        enc_top = enc_top[:mcf.start()] + enc_top[i:]
    ml = re.search(rb"/Length\s+(\d+)", enc_top)
    n = (int(ml.group(1)) if ml else 40) // 8
    if aes:
        n = 16  # AES-128 (/AESV2) keys are always 128-bit
    o_entry = _pdf_str_value(enc, b"O")
    u_entry = _pdf_str_value(enc, b"U")
    p_val = int(re.search(rb"/P\s+(-?\d+)", enc).group(1))
    mid = re.search(rb"/ID\s*\[\s*<([0-9A-Fa-f]+)>", payload)
    id0 = bytes.fromhex(mid.group(1).decode("ascii")) if mid else b""

    digest = hashlib.md5(_PDF_PAD + o_entry[:32]
                         + struct.pack("<i", p_val) + id0).digest()
    if r >= 3:
        for _ in range(50):
            digest = hashlib.md5(digest[:n]).digest()
    key = digest[:n]
    if r == 2:
        ok = _rc4(key, _PDF_PAD) == u_entry[:32]
    else:
        d = _rc4(key, hashlib.md5(_PDF_PAD + id0).digest())
        for i in range(1, 20):
            d = _rc4(bytes(b ^ i for b in key), d)
        ok = d == u_entry[:16]
    if not ok:
        raise NotImplementedError(
            "pdf: password-protected (non-empty user password)")

    def decrypt(num: int, gen: int, data: bytes) -> bytes:
        salt = b"sAlT" if aes else b""  # §7.6.2 step (b): AES adds sAlT
        k = hashlib.md5(key + struct.pack("<i", num)[:3]
                        + struct.pack("<i", gen)[:2] + salt).digest()
        k = k[:min(n + 5, 16)]
        if aes:
            from .aes128 import cbc_decrypt

            return cbc_decrypt(k, data)
        return _rc4(k, data)

    return decrypt


def _pdf_objstm_objects(head: bytes, raw: bytes) -> "dict[int, bytes]":
    """Expand a /Type /ObjStm object stream (PDF 1.5 §7.5.7): the first
    /First bytes hold N ``objnum offset`` pairs; the rest holds the
    serialized objects back-to-back.  Returns objnum → body bytes so page
    trees and font dicts stored in object streams stay resolvable."""
    m_n = re.search(rb"/N\s+(\d+)", head)
    m_f = re.search(rb"/First\s+(\d+)", head)
    if not (m_n and m_f) or raw is None:
        return {}
    n, first = int(m_n.group(1)), int(m_f.group(1))
    pairs = re.findall(rb"(\d+)\s+(\d+)", raw[:first])[:n]
    out: dict[int, bytes] = {}
    for idx, (num, off) in enumerate(pairs):
        start = first + int(off)
        end = first + int(pairs[idx + 1][1]) if idx + 1 < len(pairs) else len(raw)
        out[int(num)] = raw[start:end]
    return out


def _pdf_collect_bodies(payload: bytes,
                        obj_headers: list[tuple[int, int, int, int]],
                        extra: "dict[int, bytes] | None" = None
                        ) -> tuple[dict[int, bytes], dict[int, int]]:
    """objnum → body bytes for every top-level object, merged with
    object-stream-embedded bodies (``extra``, offset-ordered after the
    top-level set for the file-order page fallback)."""
    bodies: dict[int, bytes] = {}
    obj_offset: dict[int, int] = {}
    for off, num, hend, _gen in obj_headers:
        end = payload.find(b"endobj", hend)
        bodies.setdefault(num, payload[hend:end if end != -1 else len(payload)])
        obj_offset.setdefault(num, off)
    if extra:
        base = len(payload)
        for k, (num, body) in enumerate(extra.items()):
            bodies.setdefault(num, body)
            obj_offset.setdefault(num, base + k)
    return bodies, obj_offset


def _pdf_resolve_pages(bodies: dict[int, bytes],
                       obj_offset: dict[int, int]
                       ) -> tuple[list[int], dict[int, list[int]]]:
    """Resolve the page tree — /Type /Catalog → /Pages /Kids → /Page,
    with /Contents as a direct ref or an ARRAY of refs (PDF 32000-1
    §7.7.3.3; the reference's pdf_processor.py walks real pages, so a
    page with a multi-stream /Contents array must stay ONE page, ADVICE
    r03).  Returns (ordered page objnums, page objnum → content objnums);
    order follows the /Kids tree when walkable, else file order."""
    page_objs: dict[int, list[int]] = {}
    root = None
    for num, body in bodies.items():
        if re.search(rb"/Type\s*/Page\b", body):
            arr = re.search(rb"/Contents\s*\[([^\]]*)\]", body)
            if arr:
                refs = [int(x) for x in re.findall(rb"(\d+)\s+\d+\s+R", arr.group(1))]
            else:
                one = re.search(rb"/Contents\s+(\d+)\s+\d+\s+R", body)
                refs = [int(one.group(1))] if one else []
            page_objs[num] = refs
        elif root is None and re.search(rb"/Type\s*/Catalog\b", body):
            mr = re.search(rb"/Pages\s+(\d+)\s+\d+\s+R", body)
            if mr:
                root = int(mr.group(1))

    # page order: the /Kids tree when walkable, else file order
    order: list[int] = []

    def walk(num: int, depth: int, seen: set[int]) -> None:
        if num in seen or depth > 64:
            return
        seen.add(num)
        if num in page_objs:
            order.append(num)
            return
        body = bodies.get(num)
        if body is None:
            return
        mk = re.search(rb"/Kids\s*\[([^\]]*)\]", body)
        if mk:
            for x in re.findall(rb"(\d+)\s+\d+\s+R", mk.group(1)):
                walk(int(x), depth + 1, seen)

    if root is not None:
        walk(root, 0, set())
    if not order:
        order = sorted(page_objs, key=lambda n: obj_offset.get(n, 0))
    return order, page_objs


def _pdf_group_texts(order: list[int], owner: dict[int, int],
                     extracted: list[tuple[int, int | None, str]]
                     ) -> list[str]:
    """Group extracted content-stream texts into page texts.

    Falls back to the historical stream≈page assumption when no page tree
    is resolvable (page-object-free fragments — the synthesized
    round-trip corpus lands here).  Text-bearing streams not referenced
    by any page (form XObjects, annotation appearances) attach to the
    page of the nearest PRECEDING page-owned stream, preserving reading
    order."""
    import bisect

    assigned = sorted((off, owner[num]) for off, num, _t in extracted
                      if num in owner)
    if not order or not assigned:
        # no resolvable page tree (or none of its content refs match a
        # text-bearing stream): historical one-stream≈one-page behavior
        return [t for _off, _num, t in extracted]
    page_texts: list[list[str]] = [[] for _ in order]
    a_offs = [a for a, _pi in assigned]
    for off, num, t in extracted:
        if num in owner:
            page_texts[owner[num]].append(t)
        else:
            k = bisect.bisect_right(a_offs, off) - 1
            page_texts[assigned[k][1] if k >= 0 else assigned[0][1]].append(t)
    # multiple /Contents streams of one page concatenate as a single
    # logical stream (whitespace-separated per spec) — join with \n
    return ["\n".join(ts) for ts in page_texts if ts]


def parse_pdf(path: str, payload: bytes) -> tuple[str, list]:
    """Minimal PDF text extraction with stdlib only (the reference's
    pdf_processor.py:190-326 uses pymupdf/marker — absent here): decode
    FlateDecode/uncompressed content streams via zlib and replay the text
    show operators.  Embedded images (``/Subtype /Image`` XObject streams)
    become ``<attachment>`` modalities WITHOUT decoding pixels — the
    reading-order position comes from the content stream's ``Do`` draws
    (reference: pdf_processor.py emits image spans interleaved with text).
    Covers simply-encoded text PDFs; round 4 adds /Type /ObjStm expansion
    (PDF 1.5 compressed-xref files keep their page tree resolvable),
    ToUnicode CMap decoding (CID-encoded text WITH a ToUnicode map
    extracts correctly), and the LZW / ASCIIHex / ASCII85 filters plus
    PNG predictors on Flate/LZW (_pdf_decode_stream).  CID text WITHOUT
    ToUnicode recovers through the embedded TrueType's inverted cmap
    when /FontFile2 is present (_pdf_type0_font_cmap); documents with NO
    extractable text (image-only/scanned pages, unrecoverable CID fonts)
    degrade to one page-image media span per page instead of raising;
    encrypted files with a real user password still raise per file
    (isolated by the Arrow stage's error column)."""
    import bisect

    # object map: (offset, objnum) per "N G obj" header — lets each content
    # stream be attributed to its owning object so /Page /Contents can be
    # resolved (ADVICE r03: one page commonly holds a /Contents ARRAY of
    # several streams; a marker per stream split such pages)
    # gen travels WITH the header so the per-object decryption key for a
    # stream always uses the generation of the revision that physically
    # contains it (ADVICE r04: a global objnum→gen map could pair an old
    # body with a newer revision's gen in incrementally-updated files)
    obj_headers = [(m.start(), int(m.group(1)), m.end(), int(m.group(2)))
                   for m in re.finditer(rb"(\d+)\s+(\d+)\s+obj\b", payload)]
    obj_offsets = [o for o, _n, _e, _g in obj_headers]

    # encryption must be resolved BEFORE stream decode (RC4 wraps the
    # filtered bytes); the /Encrypt dict is always a top-level object
    bodies0, _ = _pdf_collect_bodies(payload, obj_headers)
    decrypt = _pdf_decrypt_setup(payload, bodies0)

    # pass 1 — scan every stream: (offset, objnum, head, decoded bytes)
    streams: list[tuple[int, int | None, bytes, bytes | None]] = []
    n_images = 0
    # (?<!end): 'endstream\n' contains 'stream\n' — matching it would open a
    # spurious window spanning into the next object and duplicate its text
    for m in re.finditer(rb"(?<!end)stream\r?\n", payload):
        start = m.end()
        end = payload.find(b"endstream", start)
        if end == -1:
            continue
        dict_start = payload.rfind(b"<<", 0, m.start())
        head = payload[dict_start:m.start()] if dict_start != -1 else b""
        # /Length is authoritative when it's a direct int (PDF 32000-1
        # §7.3.8.2) — EOL heuristics are ambiguous when the deflate data
        # itself ends in 0x0d/0x0a (~1% of compressed payloads)
        raw = None
        m_len = re.search(rb"/Length\s+(\d+)(?!\s+\d+\s+R)", head)
        if m_len:
            length = int(m_len.group(1))
            cand = payload[start:start + length]
            if re.match(rb"(\r\n|\r|\n)?endstream",
                        payload[start + length:start + length + 11]):
                raw = cand
        if raw is None:  # no usable /Length: window + strip exactly ONE EOL
            raw = payload[start:end]
            if raw.endswith(b"\r\n"):
                raw = raw[:-2]
            elif raw.endswith((b"\n", b"\r")):
                raw = raw[:-1]
        if re.search(rb"/Subtype\s*/Image\b", head):
            n_images += 1  # image XObject: keep the ref, never the pixels
            continue
        k = bisect.bisect_right(obj_offsets, m.start()) - 1
        objnum = obj_headers[k][1] if k >= 0 else None
        if decrypt is not None and objnum is not None:
            raw = decrypt(objnum, obj_headers[k][3], raw)
        raw = _pdf_decode_stream(head, raw)
        streams.append((m.start(), objnum, head, raw))

    # pass 2 — structure: ObjStm expansion, page tree, per-page fonts
    stream_raws: dict[int, bytes] = {}
    objstm_extra: dict[int, bytes] = {}
    for _off, objnum, head, raw in streams:
        if raw is None:
            continue
        if objnum is not None:
            stream_raws.setdefault(objnum, raw)
        if re.search(rb"/Type\s*/ObjStm\b", head):
            objstm_extra.update(_pdf_objstm_objects(head, raw))
    bodies, obj_offset = _pdf_collect_bodies(payload, obj_headers, objstm_extra)
    order, page_objs = _pdf_resolve_pages(bodies, obj_offset)
    owner: dict[int, int] = {}
    for pi, pnum in enumerate(order):
        for c in page_objs.get(pnum, []):
            owner.setdefault(c, pi)
    page_fonts: list[dict | None] = [None] * len(order)

    def fonts_for(pi: int) -> dict | None:
        if page_fonts[pi] is None:
            page_fonts[pi] = _pdf_resources_fonts(
                bodies.get(order[pi], b""), bodies, stream_raws)
        return page_fonts[pi] or None

    # structural streams are never page text, even if their bytes happen
    # to contain BT/Do: object/xref streams and ToUnicode CMap targets
    non_content: set[int] = set()
    for _off, objnum, head, _raw in streams:
        if objnum is not None and re.search(rb"/Type\s*/(ObjStm|XRef)\b", head):
            non_content.add(objnum)
    for body in bodies.values():
        for tu in re.findall(rb"/ToUnicode\s+(\d+)\s+\d+\s+R", body):
            non_content.add(int(tu))
        # embedded font programs and CID→GID map streams are binary that
        # can contain "BT"/"Do" byte runs by chance — never replay them
        # as page content
        for ff in re.findall(
                rb"/(?:FontFile2?3?|CIDToGIDMap)\s+(\d+)\s+\d+\s+R", body):
            non_content.add(int(ff))

    # pass 3 — replay text shows with the owning page's font CMaps
    extracted: list[tuple[int, int | None, str]] = []  # (offset, objnum, text)
    for off, objnum, _head, raw in streams:
        if raw is None or (b"BT" not in raw and b"Do" not in raw):
            continue  # undecodable, or neither text show nor XObject draw
        if objnum in non_content:
            continue
        pi = owner.get(objnum)
        t = _pdf_text_from_content(
            raw, fonts_for(pi) if pi is not None else None).strip()
        if t:
            extracted.append((off, objnum, t))
    texts = _pdf_group_texts(order, owner, extracted)
    # pages join with the reference's pagination markers
    # (pdf_processor.py:211-256, ``\n\n{page}----\n\n``) so the downstream
    # pagination parse recovers per-page paragraph_starts; single-page
    # documents stay marker-free
    parts: list[str] = []
    for pi, t in enumerate(texts):
        if pi:
            parts.append(f"\n\n{{{pi - 1}}}----\n\n")
        parts.append(t)
    text = "".join(parts)
    # map Do-draw sentinels to image modalities in reading order: the first
    # n_images sentinels become attachments (extra Do's are form XObjects —
    # dropped); images never drawn in content still surface, appended last
    refs: list[tuple[str, str]] = []
    pieces = text.split(_PDF_XOBJ_SENTINEL)
    rebuilt = [pieces[0]]
    for piece in pieces[1:]:
        if len(refs) < n_images:
            refs.append(("image", f"{path}#image{len(refs)}"))
            rebuilt.append(ATTACHMENT_TAG)
        rebuilt.append(piece)
    while len(refs) < n_images:
        refs.append(("image", f"{path}#image{len(refs)}"))
        rebuilt.append("\n" + ATTACHMENT_TAG)
    text = "".join(rebuilt)
    if not text.strip():
        if not obj_headers:
            raise NotImplementedError("pdf: no objects — not a parseable PDF")
        # Graceful degradation (VERDICT r04 #1): a structurally-valid PDF
        # with no extractable text — scanned/image-only pages, CID text
        # without a ToUnicode CMap, undecodable content filters — yields
        # one page-image media span PER PAGE instead of an error row.  The
        # reference's fast path still extracts page images for such files
        # (pdf_processor.py:258-326); the OCR-class accurate path needs
        # absent models.  Pages join with the same pagination markers as
        # the text path so paragraph/pagination parsing stays uniform.
        n_pages = len(order) if order else 1
        refs = [("image", f"{path}#page{pi}") for pi in range(n_pages)]
        parts = []
        for pi in range(n_pages):
            if pi:
                parts.append(f"\n\n{{{pi - 1}}}----\n\n")
            parts.append(ATTACHMENT_TAG)
        return "".join(parts), refs
    return re.sub(r"[ \t]+", " ", text).strip(), refs


def parse_wav(path: str, payload: bytes) -> tuple[str, list]:
    """Media processor, WAV branch (media_processor.py:141-210): the
    reference transcribes with Whisper (absent here); the PCM container is
    parsed FOR REAL with the stdlib (operators/multimodal.decode_wav) so a
    corrupt file fails per-file, and the audio becomes an attachment span —
    feature extraction (duration/rate/RMS) runs downstream over the binary
    column."""
    from ..operators.multimodal import decode_wav

    decode_wav(payload)  # validates header + PCM width; raises per file
    return ATTACHMENT_TAG, [("audio", path)]


def parse_mp3(path: str, payload: bytes) -> tuple[str, list]:
    """Media processor, MP3 branch: REAL stdlib frame-header walk
    (operators/multimodal.decode_mp3_meta — duration/bitrate/rate/
    channels); decoding + ASR (the reference's Whisper transcript) still
    needs absent libraries, so text is the attachment placeholder."""
    from ..operators.multimodal import decode_mp3_meta

    decode_mp3_meta(payload)  # validates the container; raises per file
    return ATTACHMENT_TAG, [("audio", path)]


def parse_mp4(path: str, payload: bytes) -> tuple[str, list]:
    """Media processor, MP4 branch: REAL stdlib ISO-BMFF box walk
    (operators/multimodal.decode_mp4_meta — moov/mvhd timescale +
    duration); frame decoding still needs absent codecs."""
    from ..operators.multimodal import decode_mp4_meta

    decode_mp4_meta(payload)  # validates the container; raises per file
    return ATTACHMENT_TAG, [("video", path)]


# extension → (processor name, parser).  Order/shape mirrors the reference
# extension whitelist (run_process.py:110-133).
REGISTRY: dict[str, tuple[str, Parser]] = {
    "txt": ("TextProcessor", parse_txt),
    "md": ("MarkdownProcessor", parse_md),
    "html": ("HTMLProcessor", parse_html),
    "htm": ("HTMLProcessor", parse_html),
    "pdf": ("PDFProcessor", parse_pdf),
    "docx": ("DOCXProcessor", parse_docx),
    "pptx": ("PPTXProcessor", parse_pptx),
    "xlsx": ("SpreadsheetProcessor", parse_xlsx),
    "csv": ("SpreadsheetProcessor", parse_csv),
    "tsv": ("SpreadsheetProcessor", parse_csv),
    "eml": ("EMLProcessor", parse_eml),
    "wav": ("MediaProcessor", parse_wav),
    "mp4": ("MediaProcessor", parse_mp4),
    "mp3": ("MediaProcessor", parse_mp3),
}

PARSED_SCHEMA = T.StructType([
    T.StructField("doc_id", T.StringType()),
    T.StructField("file_path", T.StringType()),
    T.StructField("processor_type", T.StringType()),
    T.StructField("text", T.StringType()),
    T.StructField("modalities", T.ArrayType(T.StructType([
        T.StructField("kind", T.StringType()),
        T.StructField("media_ref", T.StringType()),
    ]))),
    T.StructField("error", T.StringType()),
])


def route_format(df: DataFrame, path_col: str = "path") -> DataFrame:
    """Native routing column: extension → processor name (the dispatch
    table as one map literal; unknown extensions → NULL → unrouted)."""
    mapping = F.create_map(
        *[F.lit(x) for pair in ((ext, name) for ext, (name, _p) in REGISTRY.items())
          for x in pair]
    )
    ext = F.lower(F.element_at(F.split(F.col(path_col), r"\."), -1))
    return df.withColumn("format", ext).withColumn(
        "processor_type", F.element_at(mapping, ext)
    )


def scan_and_parse(spark: SparkSession, glob: str,
                   only_paths: "DataFrame | None" = None) -> DataFrame:
    """binaryFile scan → route → per-format Arrow parse stage.

    Per-file failures land in the ``error`` column instead of failing the
    job (the reference's per-file try/except contract,
    pdf_processor.py:107-111).  ``only_paths`` (a ``file_path`` column)
    left-semi-joins the scan BEFORE the parse stage — the incremental
    process verb's skip set: pruned files never reach the (dominant)
    Python parse; their bytes are still listed by the scan, which a
    mtime-partitioned layout or pathGlobFilter would also prune at the
    file index when the corpus layout allows."""
    files = spark.read.format("binaryFile").load(glob).select(
        F.col("path"), F.col("content")
    )
    if only_paths is not None:
        files = files.join(
            only_paths.select(F.col("file_path").alias("path")),
            "path", "left_semi")
    routed = route_format(files).filter(F.col("processor_type").isNotNull())

    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import hashlib

        import pandas as pd

        for pdf in batches:
            rows = []
            for path, content, fmt, ptype in zip(
                pdf["path"], pdf["content"], pdf["format"], pdf["processor_type"]
            ):
                payload = bytes(content) if content is not None else b""
                try:
                    text, refs = REGISTRY[fmt][1](path, payload)
                    err = None
                except Exception as e:  # per-file failure isolation
                    text, refs, err = "", [], f"{type(e).__name__}: {e}"
                rows.append({
                    "doc_id": hashlib.md5(path.encode()).hexdigest(),
                    "file_path": path,
                    "processor_type": ptype,
                    "text": text,
                    "modalities": refs,
                    "error": err,
                })
            yield pd.DataFrame(rows, columns=[f.name for f in PARSED_SCHEMA.fields])

    return routed.mapInPandas(run, schema=PARSED_SCHEMA)


def to_documents(parsed: DataFrame) -> DataFrame:
    """Parsed rows → engine documents table (doc_id, spans, …)."""
    from ..functions.spans import spans_from_text

    ok = parsed.filter(F.col("error").isNull())
    return ok.select(
        "doc_id",
        spans_from_text(F.col("text"), F.col("modalities")).alias("spans"),
        "file_path",
        "processor_type",
    )
