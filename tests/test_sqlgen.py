"""Dual-dialect SQL builder primitives."""

import re

import pytest

from mmore_spark.sqlgen import rx_escape


def test_rx_escape_matches_literal_exactly():
    for lit in ["Acme Corp.", "March 4, 2024", "a+b (c) {d}", "x|y*z"]:
        assert re.fullmatch(rx_escape(lit), lit)
        assert not re.search(rx_escape(lit), lit.replace(lit[-1], "\x01"))


def test_rx_escape_rejects_unrepresentable():
    """'^' / ']' / '\\' cannot be char-class-escaped portably — generation
    must fail loudly instead of diverging at query time (ADVICE r01)."""
    for ch in "^]\\":
        with pytest.raises(ValueError):
            rx_escape(f"x{ch}y")
