"""north_rule guard: no per-row Python anywhere in the hot path.

Scans the engine source for row-at-a-time constructs; allowed Python
boundaries are mapInPandas / pandas_udf / applyInPandas (Arrow-batched)
only."""

import pathlib
import re

SRC = pathlib.Path(__file__).resolve().parent.parent / "mmore_spark"

FORBIDDEN = [
    (re.compile(r"\bF\.udf\s*\("), "row-at-a-time F.udf"),
    (re.compile(r"\bfunctions\.udf\s*\("), "row-at-a-time udf"),
    (re.compile(r"@udf\b"), "row-at-a-time @udf"),
    (re.compile(r"\.rdd\b"), "RDD access"),
    (re.compile(r"\bflatMap\s*\("), "RDD flatMap"),
    (re.compile(r"\bmapPartitions\s*\("), "RDD mapPartitions"),
    (re.compile(r"\.collect\(\)\s*\n?\s*for\b"), "driver-side loop over collect"),
]


def test_no_row_level_python():
    offenders = []
    for path in SRC.rglob("*.py"):
        text = path.read_text()
        lines = text.splitlines()
        for pat, label in FORBIDDEN:
            for m in pat.finditer(text):
                line = text[: m.start()].count("\n") + 1
                context = "\n".join(lines[max(0, line - 2): line])
                if "guard-ok:" in context:
                    continue  # explicitly justified (dimension-scale data)
                offenders.append(f"{path.name}:{line} {label}")
    assert not offenders, offenders
