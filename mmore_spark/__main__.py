"""CLI mirroring the reference's verbs (``mmore process --config-file``,
``mmore postprocess``; run_process.py / run_pp.py):

    python -m mmore_spark process    --config-file process.yaml
    python -m mmore_spark postprocess --config-file pp.yaml --input out/
    python -m mmore_spark ingest     --staging st/ --output out/ \
                                     --checkpoint ck/

``ingest`` is the streaming surface (the reference's job-queue analog,
run_index_api.py): drain whatever is staged, exactly-once, resumable.

Under spark-submit the same module is the application script:

    spark-submit --py-files mmore_spark.zip -m ... (or scripts/submit.sh
    for the KG pipeline path).
"""

from __future__ import annotations

import argparse
import json


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(prog="mmore_spark")
    sub = p.add_subparsers(dest="cmd", required=True)
    sp = sub.add_parser("process", help="crawl + route + parse data_path")
    sp.add_argument("--config-file", required=True)
    sp.add_argument("--no-incremental", action="store_true",
                    help="reprocess every file even when previous results "
                         "exist (default: reuse files with mtime <= their "
                         "previous processed_at, as the reference does)")
    sq = sub.add_parser("postprocess", help="apply a pp_modules chain")
    sq.add_argument("--config-file", required=True)
    sq.add_argument("--input", required=True,
                    help="parquet of processed samples (process output)")
    sq.add_argument("--no-incremental", action="store_true",
                    help="re-run the module chain for every row even when "
                         "previous postprocess results exist (required "
                         "after changing pp_modules)")
    si = sub.add_parser(
        "ingest", help="drain staged documents once (AvailableNow) and "
                       "append newly-extracted triples, exactly-once")
    si.add_argument("--staging", required=True,
                    help="directory the documents-table parquet is staged to")
    si.add_argument("--output", required=True, help="triples output table")
    si.add_argument("--checkpoint", required=True,
                    help="streaming checkpoint (reruns pick up NEW files)")
    a = p.parse_args(argv)

    from .plans import config as C
    from .session import get_spark

    spark = get_spark(f"mmore-{a.cmd}")
    spark.sparkContext.setLogLevel("ERROR")
    if a.cmd == "ingest":
        from .streaming.ingest import stream_extract_triples

        c = stream_extract_triples(spark, a.staging, a.output, a.checkpoint)
        print(json.dumps({"cmd": "ingest", **c}))
        return 0
    cfg = C.load_config(a.config_file)
    if a.cmd == "process":
        m: dict = {}
        out = C.run_process(spark, cfg, incremental=not a.no_incremental,
                            metrics=m)
        errors = out.filter("error IS NOT NULL").count()
        print(json.dumps({"cmd": "process", "rows": out.count(),
                          "errors": errors, **m}))
    else:
        df = spark.read.parquet(a.input)
        m = {}
        out = C.run_postprocess(df, cfg, incremental=not a.no_incremental,
                                metrics=m)
        print(json.dumps({"cmd": "postprocess", "rows": out.count(),
                          "columns": out.columns, **m}))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
