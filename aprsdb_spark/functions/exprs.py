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


def scalarize(df: "DataFrame") -> "DataFrame":  # noqa: F821 - hinted lazily
    """Serialize every non-scalar output column so result frames survive
    row-wise canonicalization in pandas (sort_values chokes on ndarray
    cells: `TypeError: unhashable type`).

    array<string> -> concat_ws(',') (readable, join-stable for the
    fixture domains, which never contain ','); any other array / struct /
    map -> to_json; binary -> hex. Scalar columns pass through untouched.
    Apply as the FINAL projection of a registered query — the plan
    underneath (the thing under test) is unchanged.

    Null conventions (deliberate, mirrored by each qid's oracle SQL):
    a NULL array serializes to NULL here (the when(isNotNull) guard),
    while the hand-rolled h_str_parse_tnc2 path serializes NULL paths to
    '' via COALESCE — each oracle encodes its own query's convention, so
    the two never mix within one qid. Also note concat_ws DROPS null
    ELEMENTS: ['a', null] and ['a'] serialize identically. Fixture
    arrays contain no null elements; a new qid whose arrays can must use
    to_json instead.
    """
    from pyspark.sql.types import ArrayType, BinaryType, MapType, StringType, StructType

    cols = []
    for f in df.schema.fields:
        c = F.col(f.name)
        if isinstance(f.dataType, ArrayType) and isinstance(f.dataType.elementType, StringType):
            c = F.when(c.isNotNull(), F.concat_ws(",", c))
        elif isinstance(f.dataType, (ArrayType, MapType, StructType)):
            c = F.to_json(c)
        elif isinstance(f.dataType, BinaryType):
            c = F.hex(c)
        cols.append(c.alias(f.name))
    return df.select(*cols)


def floordiv(col: Column | str, m: int) -> Column:
    """Sign-safe integer FLOOR division, engine-portable by construction
    (the canonical form the r9/r10 div-sign parity preconditions point
    at): q = x div m, minus 1 when the remainder is negative. Measured
    ground truth behind it: Spark `div` truncates toward zero, and
    DuckDB 1.0.0's integer `//` ALSO truncates ((-5)//2 = -2) even
    though its float `//` floors — exactly the kind of per-engine,
    per-type fine print a bucketing key must not depend on. Both
    twins apply the identical correction on top of truncation, so the
    result is floor(x/m) for any sign of x, with no double-precision
    detour and no subtraction that can overflow at LONG_MIN (the
    residue-subtraction form fails there). Requires m > 0.
    SQL twin: sql_floordiv().

    Use this (not bare `div`, not `(x / m) cast long`) wherever a
    bucketing key's column is not provably non-negative."""
    if m <= 0:
        raise ValueError(f"floordiv modulus must be positive, got {m}")
    c = F.col(col) if isinstance(col, str) else col
    q = F.call_function("div", c, F.lit(m))
    return F.when((c % m) < 0, q - 1).otherwise(q)


def sql_floordiv(expr: str, m: int) -> str:
    """DuckDB twin of floordiv() — same truncating-div-plus-correction
    lowering, so the two engines cannot disagree on signed keys."""
    if m <= 0:
        raise ValueError(f"floordiv modulus must be positive, got {m}")
    return (
        f"(CASE WHEN (({expr}) % {m}) < 0 THEN (({expr}) // {m}) - 1 "
        f"ELSE (({expr}) // {m}) END)"
    )
