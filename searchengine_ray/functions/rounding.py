"""Deterministic rounding shared by the Ray pipelines and the DuckDB oracles.

Python's ``round`` is banker's rounding while DuckDB's ``round`` is
half-away-from-zero; summation order across engines can also differ in the
last ulp.  Every float column that is compared against a DuckDB oracle is
therefore rounded with an explicit half-up rule that both sides implement
identically: ``floor(x * 10^d + 0.5) / 10^d`` (valid for the non-negative
scores/ratios we emit).
"""

from __future__ import annotations

import numpy as np

__all__ = ["round_half_up", "sql_round_half_up"]


def round_half_up(x, decimals: int = 4):
    """Vectorized half-up rounding for non-negative floats."""
    scale = 10.0**decimals
    return np.floor(np.asarray(x, dtype=np.float64) * scale + 0.5) / scale


def sql_round_half_up(expr: str, decimals: int = 4) -> str:
    """The same rounding rule as a DuckDB SQL expression."""
    scale = 10**decimals
    return f"(floor(({expr}) * {scale} + 0.5) / {scale})"
