"""End-to-end over the DERIVED corpus (driver testdata → interleaved docs
→ full KG pipeline): P/R vs the plant_py golden, i.e. the exact flow the
driver's entry() exercises."""

import duckdb

from mmore_spark.corpus import vocab
from mmore_spark.corpus.derive import derived_documents, plant_py, text2_sql
from mmore_spark.plans.pipeline import build_graph
from mmore_spark.sqlgen import DUCK

SF_DIR = "/root/testdata/sf0.001"


def test_duckdb_text2_matches_python():
    con = duckdb.connect()
    con.sql(f"CREATE VIEW documents AS SELECT * FROM '{SF_DIR}/documents.parquet'")
    rows = con.sql(f"SELECT doc_id, text, {text2_sql(DUCK)} AS t2 FROM documents").fetchall()
    for doc_id, text, t2 in rows:
        sent = plant_py(doc_id)[0]
        assert t2 == f"{text}. {sent}"


def test_derived_pipeline_pr(spark):
    docs = derived_documents(spark, SF_DIR)
    _, canonical_triples, entities, _ = build_graph(docs)

    canon = vocab.canonical_of()
    golden = {}
    con = duckdb.connect()
    ids = [r[0] for r in con.sql(
        f"SELECT doc_id FROM '{SF_DIR}/documents.parquet'").fetchall()]
    for doc_id in ids:
        _sent, subj, _st, pred, obj, _ot = plant_py(doc_id)
        s = canon.get(subj.upper(), (subj.upper(),))[0]
        o = canon.get(obj.upper(), (obj.upper(),))[0]
        golden[str(doc_id)] = (min(s, o), max(s, o), pred)

    # map pipeline canonical names (elected) → golden canonical via membership
    member_to_golden = {}
    for head, members in vocab.canonical_of().items():
        member_to_golden[head] = members[0]
    pred_rows = canonical_triples.collect()
    got = {}
    for r in pred_rows:
        s = member_to_golden.get(r["subj"], r["subj"])
        o = member_to_golden.get(r["obj"], r["obj"])
        got.setdefault(r["doc_id"], []).append((min(s, o), max(s, o), tuple(r["pred"])))

    hits = 0
    for doc_id, (gs, go, gp) in golden.items():
        cands = got.get(doc_id, [])
        if any(s == gs and o == go and gp in preds for s, o, preds in cands):
            hits += 1
    recall = hits / len(golden)
    precision = hits / max(1, sum(len(v) for v in got.values()))
    assert recall >= 0.95, recall
    assert precision >= 0.95, precision
    assert entities.count() > 0
