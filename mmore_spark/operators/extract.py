"""Batched mention detection + triple extraction (SURVEY.md §2.6).

Reference flow: prompt | llm | output_parser per document
(/root/reference/src/mmore/process/post_processor/ner/ner.py:18-31,
extractor.py:53,92-120).  The LLM emits ``##``-separated records
``("entity"<|>NAME<|>TYPE<|>DESC)`` /
``("relationship"<|>SRC<|>TGT<|>DESC<|>STRENGTH)`` terminated by
``<|COMPLETE|>`` (_prompts.py:3-126); the parser builds a per-doc
undirected graph (output_parser.py:48-143).

Spark shape: ONE Arrow-batched stage (``mapInPandas``) per the
north_rule's "no per-row Python": extractor + parser run vectorized over
pandas batches; the result explodes into ``mentions`` and ``triples``
DataFrames.  The extractor is pluggable (the reference's LLM seam,
rag/llm.py) — the default is a deterministic rule extractor over the
closed corpus vocabulary, emitting the SAME delimited record format so the
parser semantics below are exercised end-to-end.

Parser semantics ported exactly, including the quirks:
  * the tag attr includes literal double quotes ('"entity"',
    output_parser.py:49,84);
  * names/types are UPPERCASED then cleaned (html-unescape + control-char
    strip, output_parser.py:16-24,55-56,90-91); descriptions cleaned only;
  * entity dedup within a doc: description set-union, keep non-empty type
    (output_parser.py:59-70);
  * relationship endpoints auto-created with empty type
    (output_parser.py:99-110);
  * duplicate undirected edge: weight accumulates, descriptions set-union
    (output_parser.py:112-121);
  * weight quirk: ``isinstance(str, numbers.Number)`` is always False
    (output_parser.py:94-98) ⇒ every record contributes exactly 1.0.
"""

from __future__ import annotations

import html
import re
from typing import Callable, Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..corpus import vocab
from ..corpus.oracle import entity_description

TUPLE_DELIM = "<|>"      # ner/extractor.py:20
RECORD_DELIM = "##"      # ner/extractor.py:21
COMPLETION_TAG = "<|COMPLETE|>"  # ner/extractor.py:22
_CONTROL_RE = re.compile(r"[\x00-\x1f\x7f-\x9f]")
_PAREN_RE = re.compile(r"^\(|\)$")


def clean_str(s: str) -> str:
    """Port of output_parser._clean_str (output_parser.py:16-24)."""
    return _CONTROL_RE.sub("", html.unescape(s.strip()))


def parse_records(raw: str) -> tuple[list[dict], list[dict]]:
    """Parse one document's delimited records → (entities, edges).

    Pure-Python twin of the reference parser, dict-based instead of
    networkx (graphs-as-tables, SURVEY.md §1.3).
    """
    nodes: dict[str, dict] = {}
    edges: dict[tuple[str, str], dict] = {}
    for record in raw.split(RECORD_DELIM):
        record = _PAREN_RE.sub("", record.strip())
        attrs = record.split(TUPLE_DELIM)
        if attrs[0] == '"entity"' and len(attrs) >= 4:
            name = clean_str(attrs[1].upper())
            etype = clean_str(attrs[2].upper())
            desc = clean_str(attrs[3])
            if name in nodes:
                node = nodes[name]
                node["descriptions"] = node["descriptions"] | {desc}
                if etype != "":
                    node["entity_type"] = etype
            else:
                nodes[name] = {"entity_type": etype, "descriptions": {desc}}
        if attrs[0] == '"relationship"' and len(attrs) >= 5:
            source = clean_str(attrs[1].upper())
            target = clean_str(attrs[2].upper())
            desc = clean_str(attrs[3])
            weight = 1.0  # quirk: parse of attrs[-1] never fires (see module doc)
            for endpoint in (source, target):
                if endpoint not in nodes:
                    nodes[endpoint] = {"entity_type": "", "descriptions": {""}}
            key = (min(source, target), max(source, target))  # nx.Graph: unordered
            if key in edges:
                e = edges[key]
                e["weight"] += weight
                e["preds"] = e["preds"] | {desc}
            else:
                edges[key] = {"weight": weight, "preds": {desc}}
    entities = [
        {"entity_name": n, "entity_type": v["entity_type"],
         "descriptions": sorted(v["descriptions"])}
        for n, v in nodes.items()
    ]
    triples = [
        {"subj": s, "obj": o, "pred": sorted(e["preds"]), "weight": e["weight"]}
        for (s, o), e in edges.items()
    ]
    return entities, triples


# --------------------------------------------------------------------------
# Deterministic rule extractor (the pluggable "LLM")
# --------------------------------------------------------------------------

_EXTRACTOR_CACHE: list | None = None


def _compiled_templates():
    """Compile ONE combined regex for all relation templates (alternation
    of per-template branches, each with alias-alternation capture groups)
    so extraction is a single scan per document instead of 12.  Compiled
    once per executor (the reference's model-caching pattern,
    pdf_processor.py:37-68)."""
    global _EXTRACTOR_CACHE
    if _EXTRACTOR_CACHE is not None:
        return _EXTRACTOR_CACHE
    alias_type: dict[str, str] = {}
    for etype, clusters in vocab.ALIAS_CLUSTERS.items():
        for cluster in clusters:
            for alias in cluster:
                alias_type[alias] = etype
    # longest-first so "Acme Corporation" wins over a would-be prefix
    alternation = "|".join(re.escape(a) for a in sorted(alias_type, key=len, reverse=True))
    branches = []
    group_info: dict[int, tuple[str, float]] = {}  # subj group idx -> (pred, weight)
    gi = 1
    for tmpl, _st, _ot, pred, weight in vocab.RELATION_TEMPLATES:
        head, rest = tmpl.split("{s}")
        mid, tail = rest.split("{o}")
        branches.append(
            re.escape(head) + f"({alternation})" + re.escape(mid)
            + f"({alternation})" + re.escape(tail)
        )
        group_info[gi] = (pred, weight)
        gi += 2
    combined = re.compile("|".join(f"(?:{b})" for b in branches))
    _EXTRACTOR_CACHE = (combined, group_info, alias_type)
    return _EXTRACTOR_CACHE


def rule_extract_re(text: str) -> str:
    """Reference implementation via the combined regex — kept as the
    parity baseline for ``rule_extract`` (tests assert byte-equality)."""
    combined, group_info, alias_type = _compiled_templates()
    records: list[str] = []
    for m in combined.finditer(text):
        gi = m.lastindex - 1 if m.lastindex % 2 == 0 else m.lastindex
        # lastindex is the highest matched group; subj group is the odd one
        subj, obj = m.group(gi), m.group(gi + 1)
        pred, weight = group_info[gi]
        for name in (subj, obj):
            etype = alias_type[name]
            records.append(
                f'("entity"{TUPLE_DELIM}{name}{TUPLE_DELIM}{etype}'
                f"{TUPLE_DELIM}{entity_description(name, etype)})"
            )
        records.append(
            f'("relationship"{TUPLE_DELIM}{subj}{TUPLE_DELIM}{obj}'
            f"{TUPLE_DELIM}{pred}{TUPLE_DELIM}{weight})"
        )
    return RECORD_DELIM.join(records) + (RECORD_DELIM + COMPLETION_TAG if records else "")


_FAST_CACHE: tuple | None = None


def _fast_tables():
    """Literal-scan tables for the exact finditer emulation below.

    The combined pattern is an ordered alternation of branches, each of
    shape ``escape(head) (ALT) escape(mid) (ALT) escape(tail)`` with ALT =
    all aliases sorted longest-first.  Two structural facts make a literal
    emulation exact: (1) at a FIXED position, at most one alias of a given
    length can match (slice equality), so trying length groups in
    descending order reproduces the alternation's longest-first ordered
    choice; (2) every branch requires its ``mid`` as a mandatory literal,
    so candidate match starts are derived from ``str.find(mid)`` hits."""
    global _FAST_CACHE
    if _FAST_CACHE is not None:
        return _FAST_CACHE
    _combined, group_info, alias_type = _compiled_templates()
    # aliases grouped by length; lengths descending == alternation order
    # (ties within a length cannot both match at one position)
    by_len: dict[int, set[str]] = {}
    for a in alias_type:
        by_len.setdefault(len(a), set()).add(a)
    lens_desc = sorted(by_len, reverse=True)
    from ..corpus import vocab as _v

    branches = []
    for gi_idx, (tmpl, _st, _ot, _pred, _weight) in zip(
            sorted(group_info), _v.RELATION_TEMPLATES):
        head, rest = tmpl.split("{s}")
        mid, tail = rest.split("{o}")
        branches.append((head, mid, tail, group_info[gi_idx]))
    _FAST_CACHE = (branches, by_len, lens_desc, alias_type)
    return _FAST_CACHE


def _branch_next(text: str, pos: int, head: str, mid: str, tail: str,
                 by_len: dict, lens_desc: list):
    """Leftmost match of one branch at or after ``pos`` — the regex
    ``search`` twin: returns (start, end, subj, obj) or None."""
    hl, ml = len(head), len(mid)
    # candidate starts: subj alias must end exactly where a mid occurrence
    # begins; gather (start) for every (mid hit, alias length) pair
    starts = []
    i = text.find(mid, pos + hl + 1)
    while i != -1:
        for L in lens_desc:
            p = i - L - hl
            if p >= pos and text[p + hl:i] in by_len[L] and text[p:p + hl] == head:
                starts.append(p)
        i = text.find(mid, i + 1)
    for p in sorted(set(starts)):
        # emulate the branch at position p with regex backtracking order:
        # subj aliases longest-first, then obj aliases longest-first
        sbase = p + hl
        for Ls in lens_desc:
            if text[sbase:sbase + Ls] not in by_len[Ls]:
                continue
            q = sbase + Ls
            if not text.startswith(mid, q):
                continue
            r = q + ml
            for Lo in lens_desc:
                obj = text[r:r + Lo]
                if obj in by_len[Lo] and text.startswith(tail, r + Lo):
                    return (p, r + Lo + len(tail), text[sbase:q], obj)
    return None


def rule_extract(text: str) -> str:
    """Mention detection + record emission in the reference's delimited
    format (the deterministic stand-in for the LLM call).

    Byte-identical to ``rule_extract_re`` (pytest parity suite) but ~100×
    faster: the combined alternation regex backtracks through ~300 alias
    alternatives at every text position (~4.5 ms/doc measured); this scans
    for each template's literal mid with C-speed ``str.find`` and only
    then emulates the regex's ordered-choice semantics around the hit."""
    branches, by_len, lens_desc, alias_type = _fast_tables()
    records: list[str] = []
    n = len(branches)
    UNSET = ()
    nexts: list = [UNSET] * n
    pos = 0
    while True:
        best = None
        best_j = -1
        for j in range(n):
            m = nexts[j]
            if m is UNSET or (m is not None and m[0] < pos):
                head, mid, tail, _pw = branches[j]
                m = _branch_next(text, pos, head, mid, tail, by_len, lens_desc)
                nexts[j] = m
            if m is not None and (best is None or m[0] < best[0]):
                best, best_j = m, j
        if best is None:
            break
        _p, end, subj, obj = best
        pred, weight = branches[best_j][3]
        for name in (subj, obj):
            etype = alias_type[name]
            records.append(
                f'("entity"{TUPLE_DELIM}{name}{TUPLE_DELIM}{etype}'
                f"{TUPLE_DELIM}{entity_description(name, etype)})"
            )
        records.append(
            f'("relationship"{TUPLE_DELIM}{subj}{TUPLE_DELIM}{obj}'
            f"{TUPLE_DELIM}{pred}{TUPLE_DELIM}{weight})"
        )
        pos = end
    return RECORD_DELIM.join(records) + (RECORD_DELIM + COMPLETION_TAG if records else "")


# --------------------------------------------------------------------------
# Spark stage
# --------------------------------------------------------------------------

MENTIONS_SCHEMA = T.StructType([
    T.StructField("doc_id", T.StringType()),
    T.StructField("entity_name", T.StringType()),
    T.StructField("entity_type", T.StringType()),
    T.StructField("descriptions", T.ArrayType(T.StringType())),
])
TRIPLES_SCHEMA = T.StructType([
    T.StructField("doc_id", T.StringType()),
    T.StructField("subj", T.StringType()),
    T.StructField("obj", T.StringType()),
    T.StructField("pred", T.ArrayType(T.StringType())),
    T.StructField("weight", T.DoubleType()),
])
_COMBINED_SCHEMA = T.StructType([
    T.StructField("doc_id", T.StringType()),
    T.StructField("entities", T.ArrayType(T.StructType(MENTIONS_SCHEMA.fields[1:]))),
    T.StructField("triples", T.ArrayType(T.StructType(TRIPLES_SCHEMA.fields[1:]))),
])

Extractor = Callable[[str], str]


def extract_combined(df: DataFrame, text_col: str = "text",
                     extractor: Extractor | None = None) -> DataFrame:
    """(doc_id, text) → (doc_id, entities, triples) via one Arrow stage."""
    extract = extractor or rule_extract

    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import pandas as pd

        for pdf in batches:
            ents_col, trips_col = [], []
            for text in pdf[text_col]:
                entities, triples = parse_records(extract(text or ""))
                ents_col.append(
                    [(e["entity_name"], e["entity_type"], e["descriptions"]) for e in entities]
                )
                trips_col.append(
                    [(t["subj"], t["obj"], t["pred"], t["weight"]) for t in triples]
                )
            yield pd.DataFrame(
                {"doc_id": pdf["doc_id"], "entities": ents_col, "triples": trips_col}
            )

    return df.select("doc_id", text_col).mapInPandas(run, schema=_COMBINED_SCHEMA)


def extract_mentions_triples_chunked(documents: DataFrame,
                                     chunk_size: int = 512,
                                     table_mode: str = "single_row",
                                     extractor: Extractor | None = None
                                     ) -> tuple[DataFrame, DataFrame]:
    """Reference postprocess ordering: chunker THEN extraction on chunks
    (run_postprocess pipeline, SURVEY.md §3.2), with the cross-chunk
    per-doc merge done relationally — set unions are associative and
    weights additive, so the result equals doc-level extraction whenever
    no relation sentence straddles a chunk boundary (the sentence chunker
    never splits inside a sentence; tests assert exact equality)."""
    from ..functions.spans import media_refs, render_text
    from .chunker import chunk_stage

    base = documents.select(
        "doc_id",
        render_text("spans").alias("text"),
        media_refs("spans").alias("modalities"),
    )
    chunks = chunk_stage(base, chunk_size, table_mode)
    mentions_c, triples_c = extract_mentions_triples(
        chunks.select("doc_id", "text"), "text", extractor
    )
    mentions = (
        mentions_c.groupBy("doc_id", "entity_name")
        .agg(
            F.max("entity_type").alias("entity_type"),  # '' loses to any type
            F.array_sort(F.array_distinct(F.flatten(F.collect_list("descriptions"))))
            .alias("descriptions"),
        )
    )
    triples = (
        triples_c.groupBy(
            "doc_id",
            F.least("subj", "obj").alias("subj"),
            F.greatest("subj", "obj").alias("obj"),
        )
        .agg(
            F.array_sort(F.array_distinct(F.flatten(F.collect_list("pred")))).alias("pred"),
            F.sum("weight").alias("weight"),
        )
    )
    return mentions, triples


def extract_mentions_triples(df: DataFrame, text_col: str = "text",
                             extractor: Extractor | None = None
                             ) -> tuple[DataFrame, DataFrame]:
    """Full stage: returns (mentions_df, triples_df).

    The combined frame is computed once; explode is a narrow op so Catalyst
    pipelines it with the Arrow stage — reuse via cache is the caller's
    call (plans/pipeline.py persists it between the two explodes).
    """
    combined = extract_combined(df, text_col, extractor)
    mentions = combined.select("doc_id", F.explode("entities").alias("e")).select(
        "doc_id",
        F.col("e.entity_name").alias("entity_name"),
        F.col("e.entity_type").alias("entity_type"),
        F.col("e.descriptions").alias("descriptions"),
    )
    triples = combined.select("doc_id", F.explode("triples").alias("t")).select(
        "doc_id",
        F.col("t.subj").alias("subj"),
        F.col("t.obj").alias("obj"),
        F.col("t.pred").alias("pred"),
        F.col("t.weight").alias("weight"),
    )
    return mentions, triples
