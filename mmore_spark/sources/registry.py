"""Per-format processor registry + routing (SURVEY.md §2.1/§2.10).

Reference: a plugin registry where the first processor whose ``accepts()``
matches the file extension wins (/root/reference/src/mmore/process/
processors/base.py:40-85), and the dispatcher buckets files by processor
class before batching (dispatcher.py:181-201).

Spark mapping: files arrive as a ``binaryFile`` scan (path, content);
routing is a NATIVE derived ``format`` column (extension → processor
name — the whole dispatch table is one ``element_at(map, ext)``
expression); each format's parser is an Arrow-batched function applied
per format partition.  Heavy parsers (pdf/docx/media) need libraries not
present in this container — they are registered as stubs that raise
NotImplementedError, while ``txt``/``md``/``html-lite`` parse for real, so
the routing plan and the Arrow plumbing are fully exercised.

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


def parse_html(path: str, payload: bytes) -> tuple[str, list]:
    """HTML processor (html_processor.py:33-110): strip markup, image
    tags → placeholders."""
    text = payload.decode("utf-8", errors="replace")
    refs = [("image", m.group(1)) for m in _HTML_IMG.finditer(text)]
    text = _HTML_IMG.sub(ATTACHMENT_TAG, text)
    text = _HTML_TAG.sub(" ", text)
    return re.sub(r"\s+", " ", text).strip(), refs


def _clean_py(text: str) -> str:
    """Python twin of operators.taggers.clean_text (native approximation of
    the reference's cleantext wrapper, process/utils.py:28-57): strip
    control chars, collapse horizontal whitespace, mask emails/urls."""
    text = re.sub(r"[\x00-\x08\x0b\x0c\x0e-\x1f]", "", text)
    text = re.sub(r"[ \t]+", " ", text)
    text = re.sub(r"\S+@\S+\.\S+", "<EMAIL>", text)
    text = re.sub(r"https?://\S+", "<URL>", text)
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


def parse_csv(path: str, payload: bytes) -> tuple[str, list]:
    """CSV/TSV branch of the spreadsheet processor
    (spreadsheet_processor.py:96-112): pandas read + to_string."""
    import io

    import pandas as pd

    sep = "\t" if path.lower().endswith(".tsv") else ","
    df = pd.read_csv(io.BytesIO(payload), sep=sep)
    return df.to_string(index=False), []


def _stub(kind: str) -> Parser:
    def parser(path: str, payload: bytes):
        raise NotImplementedError(
            f"{kind} parsing requires libraries absent from this container "
            f"(reference: {kind}_processor); register a real parser via "
            f"REGISTRY[...]."
        )

    return parser


# extension → (processor name, parser).  Order/shape mirrors the reference
# extension whitelist (run_process.py:110-133).
REGISTRY: dict[str, tuple[str, Parser]] = {
    "txt": ("TextProcessor", parse_txt),
    "md": ("MarkdownProcessor", parse_md),
    "html": ("HTMLProcessor", parse_html),
    "htm": ("HTMLProcessor", parse_html),
    "pdf": ("PDFProcessor", _stub("pdf")),
    "docx": ("DOCXProcessor", _stub("docx")),
    "pptx": ("PPTXProcessor", _stub("pptx")),
    "xlsx": ("SpreadsheetProcessor", parse_xlsx),
    "csv": ("SpreadsheetProcessor", parse_csv),
    "tsv": ("SpreadsheetProcessor", parse_csv),
    "eml": ("EMLProcessor", parse_eml),
    "mp4": ("MediaProcessor", _stub("media")),
    "mp3": ("MediaProcessor", _stub("media")),
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


def scan_and_parse(spark: SparkSession, glob: str) -> DataFrame:
    """binaryFile scan → route → per-format Arrow parse stage.

    Per-file failures land in the ``error`` column instead of failing the
    job (the reference's per-file try/except contract,
    pdf_processor.py:107-111)."""
    files = spark.read.format("binaryFile").load(glob).select(
        F.col("path"), F.col("content")
    )
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
