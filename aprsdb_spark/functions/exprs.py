"""Engine-portable column expressions shared across query modules."""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def rnd(col: Column | str, n: int = 2) -> Column:
    """Portable round-half-up: floor(x * 10^n + 0.5) / 10^n.

    Spark's round() converts the double through its shortest decimal
    string (BigDecimal.valueOf) and applies HALF_UP; DuckDB rounds on the
    binary value. The two disagree on repr-half-way doubles (e.g.
    1084237.255). This floor form is the same IEEE op sequence on both
    engines -> bit-identical results. SQL twin: sql_rnd().

    Only aggregate outputs need rounding at all (parallel accumulation
    order perturbs low bits); row-level arithmetic over identical inputs
    is already bit-identical across engines — don't round it.
    """
    p = 10**n
    c = F.col(col) if isinstance(col, str) else col
    return F.floor(c * p + F.lit(0.5)) / p


def sql_rnd(expr: str, n: int = 2) -> str:
    """DuckDB twin of rnd() for oracle SQL strings."""
    p = 10**n
    return f"FLOOR(({expr}) * {p} + 0.5) / {p}"
