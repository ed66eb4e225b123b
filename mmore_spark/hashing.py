"""Deterministic 60-bit hashes computable identically in Spark, DuckDB and
plain Python.

Why not ``F.hash`` / ``xxhash64``: the driver's correctness gate compares a
Spark plan against a DuckDB oracle query, and the two engines do not share a
builtin 64-bit hash.  md5 IS shared, so every hash in the oracle-checkable
surface is ``int(md5(payload)[:15], 16)`` — 60 bits, always positive, fits a
signed BIGINT in both engines.

The same family (with a seed mixed into the payload) powers MinHash
signatures, LSH band hashes, salting and deterministic sampling, so any of
those operators can be oracle-checked value-for-value.

Hot-path note: md5 evaluates JVM-side inside whole-stage codegen in Spark
(no Python boundary).  At 10^12-doc scale one would swap ``xxhash64`` in via
``HASH_IMPL`` below — the operators only depend on this module's interface.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import Column
from pyspark.sql import functions as F

HEX_DIGITS = 15  # 60 bits < 63, sign-safe in both engines


def h60(col: Column | str, seed: str = "") -> Column:
    """Spark column: 60-bit md5 hash of ``col`` (string), optional seed."""
    c = F.col(col) if isinstance(col, str) else col
    payload = F.concat(c.cast("string"), F.lit(seed)) if seed else c.cast("string")
    return F.conv(F.substring(F.md5(payload), 1, HEX_DIGITS), 16, 10).cast("long")


def h60_sql(expr: str, seed: str = "") -> str:
    """DuckDB SQL fragment computing the same hash of string expression."""
    payload = f"(CAST({expr} AS VARCHAR) || '{seed}')" if seed else f"CAST({expr} AS VARCHAR)"
    return f"CAST(('0x' || substr(md5({payload}), 1, {HEX_DIGITS})) AS BIGINT)"


def h60_py(value: str, seed: str = "") -> int:
    """Plain-Python twin (used by the golden-fixture oracle)."""
    return int(hashlib.md5((str(value) + seed).encode("utf-8")).hexdigest()[:HEX_DIGITS], 16)
