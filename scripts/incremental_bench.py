"""Incremental process-verb probe (round 5): run `run_process` twice on
the same file tree and once more after touching a small fraction — the
reuse matrix must make the no-change rerun near-free relative to the
first full parse, and the touched rerun proportional to the touched set.

Usage: python scripts/incremental_bench.py [n_files] [touched]
Prints one JSON line.
"""

import json
import os
import shutil
import sys
import time

sys.path.insert(0, ".")

from mmore_spark.plans import config as CFG  # noqa: E402
from mmore_spark.session import get_spark  # noqa: E402


def main() -> int:
    n_files = int(sys.argv[1]) if len(sys.argv) > 1 else 300
    touched = int(sys.argv[2]) if len(sys.argv) > 2 else 20

    spark = get_spark("incremental-bench", master="local[32]",
                      extra_conf={"spark.sql.shuffle.partitions": "32"})
    spark.sparkContext.setLogLevel("ERROR")

    base = "/tmp/incremental_bench"
    shutil.rmtree(base, ignore_errors=True)
    data = os.path.join(base, "data")
    os.makedirs(data)

    def pdf_bytes(text: str) -> bytes:
        import zlib

        content = ("BT 72 720 Td (" + text.replace("(", "").replace(")", "")
                   + ") Tj ET").encode()
        comp = zlib.compress(content)
        return (b"%PDF-1.4\n1 0 obj << /Length " + str(len(comp)).encode()
                + b" /Filter /FlateDecode >>\nstream\n" + comp
                + b"\nendstream\nendobj\n%%EOF\n")

    # PDFs, not txt: the parse stage must be the dominant per-file cost
    # or fixed overheads (listing, joins, the output write) mask the
    # reuse win this probe exists to measure
    for i in range(n_files):
        with open(os.path.join(data, f"d{i:05d}.pdf"), "wb") as f:
            f.write(pdf_bytes(f"doc {i} " + ("content " * 120000)))

    cfg = {"data_path": data,
           "dispatcher_config": {"output_path": os.path.join(base, "out")}}

    def run(**kw):
        m: dict = {}
        t0 = time.time()
        out = CFG.run_process(spark, cfg, metrics=m, **kw)
        rows = out.count()
        return round(time.time() - t0, 2), rows, m

    w_full, rows_full, _ = run(incremental=False)
    w_noop, rows_noop, m_noop = run()
    future = time.time() + 60
    for i in range(touched):
        p = os.path.join(data, f"d{i:05d}.pdf")
        with open(p, "wb") as f:
            f.write(pdf_bytes(f"edited doc {i} " + ("fresh " * 120000)))
        os.utime(p, (future, future))
    w_touch, rows_touch, m_touch = run()

    print(json.dumps({
        "n_files": n_files, "touched": touched,
        "wall_full_s": w_full, "wall_noop_s": w_noop,
        "wall_touched_s": w_touch,
        "noop_speedup": round(w_full / w_noop, 2),
        "noop_metrics": m_noop, "touched_metrics": m_touch,
        "rows": [rows_full, rows_noop, rows_touch],
    }))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
