"""Safe higher-order-function lambdas for PySpark.

PySpark names the SQL lambda variable after the PYTHON parameter name.
Two lambdas with the same parameter name in one expression tree — nested
OR siblings (Catalyst collapses projections, so `withColumn` chains and
`when/otherwise` branches count) — can silently resolve to the wrong
binding, producing corrupted values that vary run-to-run (observed twice
in this repo: nondeterministic MinHash signatures, flaky ER match edges).

``fresh`` wraps a column-function into a lambda whose parameter name is
globally unique, so no two HOF lambdas built through it can ever collide.
"""

from __future__ import annotations

import itertools
from typing import Callable

from pyspark.sql import Column

_COUNTER = itertools.count()


def fresh(fn: Callable[[Column], Column]) -> Callable:
    """1-arg HOF lambda with a unique parameter name."""
    name = f"uv{next(_COUNTER)}x"
    return eval(f"lambda {name}: _fn({name})", {"_fn": fn})  # noqa: S307


def fresh2(fn: Callable[[Column, Column], Column]) -> Callable:
    """2-arg HOF lambda (e.g. transform with index) with unique names."""
    a = f"uv{next(_COUNTER)}x"
    b = f"uv{next(_COUNTER)}x"
    return eval(f"lambda {a}, {b}: _fn({a}, {b})", {"_fn": fn})  # noqa: S307
