"""Engine-deterministic numeric helpers.

Why this exists: the driver's correctness gate hash-compares Spark
results against a DuckDB oracle. Two engines summing doubles in
different orders differ by ulps, and even on IDENTICAL doubles their
``round(x, n)`` implementations disagree at half-boundaries (Spark
rounds via exact BigDecimal, DuckDB via scaled ``std::round``) —
money data lands on ``.xxx5`` boundaries constantly.

Deterministic recipe used across the suite:
  1. aggregate money in DECIMAL (exact, order-independent);
  2. cast the exact decimal to double (unique nearest double);
  3. for ratios/avgs, derive with IEEE ops in a FIXED textual order
     (identical in the SQL oracle), then quantize with
     ``floor(x * 10^s) / 10^s`` — floor is a single well-defined IEEE
     operation, immune to the round()-algorithm divergence.

``fixed()`` is safe whenever both engines hold bit-identical inputs;
for genuinely order-dependent float sums (e.g. embedding centroids)
it still shrinks the mismatch window to ~1e-9 per value.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def dec(col: Column | str, scale: int = 2, precision: int = 18) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return c.cast(f"decimal({precision},{scale})")


def dsum(col: Column | str, scale: int = 2) -> Column:
    """Exact decimal sum, surfaced as double (order-independent)."""
    return F.sum(dec(col, scale)).cast("double")


def fixed(col: Column, scale: int = 4) -> Column:
    """Deterministic fixed-point quantization: floor(x*10^s)/10^s.

    Identical IEEE ops in both engines → identical output doubles.
    """
    factor = F.lit(float(10**scale))
    return F.floor(col * factor).cast("double") / factor


def davg(col: Column | str, scale_in: int = 2, scale_out: int = 4) -> Column:
    """Deterministic average: exact decimal sum / count, quantized.

    Mirror in SQL as:
      floor(CAST(sum(CAST(x AS DECIMAL(18,s))) AS DOUBLE)
            / count(x) * 10^s_out) / 10^s_out
    """
    c = F.col(col) if isinstance(col, str) else col
    return fixed(dsum(c, scale_in) / F.count(c), scale_out)


def sql_dsum(expr: str, scale: int = 2) -> str:
    return f"CAST(sum(CAST({expr} AS DECIMAL(18,{scale}))) AS DOUBLE)"


def sql_fixed(expr: str, scale: int = 4) -> str:
    factor = float(10**scale)
    return f"floor(({expr}) * {factor!r}) / {factor!r}"


def sql_davg(expr: str, scale_in: int = 2, scale_out: int = 4) -> str:
    return sql_fixed(f"{sql_dsum(expr, scale_in)} / count({expr})", scale_out)
