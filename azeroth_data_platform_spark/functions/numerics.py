"""Deterministic distributed numerics.

Floating-point addition is not associative, so a plain ``SUM(double)`` on a
cluster depends on partition merge order — results wobble in the last ulps
run-to-run and engine-to-engine. Every analytic here that feeds a
reproducibility-sensitive output (gold tables, oracle-checked queries)
accumulates through fixed-point decimals instead: decimal addition is exact
and associative, so the result is bit-identical regardless of partitioning,
AQE decisions, or executor count. The final cast back to double is a single
correctly-rounded conversion.

Variance/stddev additionally move to *integer space* (price × 10^decimals,
an exact integer for fixed-point inputs) so the sum-of-squares stays an
exact integer-valued decimal; summing squares at fractional scale would
need a scale the int128/BigDecimal→double conversion can no longer round
identically across engines (verified empirically: decimal(38,8) sums
diverge in the last ulp between Spark and DuckDB; decimal(18,0) squares do
not).

Domain note: the reference stores prices as integer copper
(/root/reference/data_pipeline/utils/database.py:17-18), i.e. decimals=0;
the driver's TPC-H-ish corpus carries 2-decimal doubles, i.e. decimals=2.

This costs a few % over native double sums and buys reproducible gold
tables at 100 TB — the right trade for an analytics store of record.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Money-like inputs: driver test data carries <= 2 decimals; 4 gives
# headroom. DECIMAL(28,4) leaves 24 integer digits — a sum over 1e18 rows
# of 1e6-sized values still fits.
MONEY_SCALE = 4


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def dec(col: Column | str, scale: int = MONEY_SCALE) -> Column:
    """Cast to a wide fixed-point decimal (exact for inputs with <= `scale` decimals)."""
    return _c(col).cast(f"decimal(28,{scale})")


def dsum(col: Column | str, scale: int = MONEY_SCALE) -> Column:
    """Deterministic sum: exact decimal accumulation, double result."""
    return F.sum(dec(col, scale)).cast("double")


def davg(col: Column | str, scale: int = MONEY_SCALE) -> Column:
    """Deterministic mean: exact decimal sum / count, in double arithmetic."""
    c = _c(col)
    return F.sum(dec(c, scale)).cast("double") / F.count(c)


def int_units(col: Column | str, decimals: int = 2) -> Column:
    """Exact integer representation of a <=`decimals`-decimal value (×10^decimals).

    decimal(18,0) keeps x² within decimal(37,0) — under Spark's 38-digit cap
    without precision-loss rules kicking in.
    """
    return (
        (_c(col).cast(f"decimal(28,{decimals})") * F.lit(10**decimals)).cast("decimal(18,0)")
    )


def int_units_sql(x: str, decimals: int = 2) -> str:
    return f"CAST(CAST({x} AS DECIMAL(28,{decimals})) * {10 ** decimals} AS DECIMAL(18,0))"


def dstddev_samp(col: Column | str, decimals: int = 2) -> Column:
    """Deterministic sample stddev via exact integer-space sums.

    sqrt((Σx² − (Σx)²/n) / (n−1)) with x in integer units, both sums exact,
    evaluated in double, rescaled back. NULL for n < 2 (matches
    stddev_samp / DuckDB stddev). The textbook-formula cancellation costs
    ~2-3 digits on clustered data — fine in double for analytics.
    """
    c = _c(col)
    x0 = int_units(c, decimals)
    n = F.count(c).cast("double")
    sx = F.sum(x0).cast("double")
    sxx = F.sum(x0 * x0).cast("double")
    var = (sxx - sx * sx / n) / (n - F.lit(1.0))
    scale = float(10**decimals)
    return F.when(
        F.count(c) >= 2, F.sqrt(F.greatest(var, F.lit(0.0))) / F.lit(scale)
    ).otherwise(F.lit(None).cast("double"))


def dstddev_samp_sql(x: str, decimals: int = 2) -> str:
    """ANSI-SQL rendering of :func:`dstddev_samp` for the DuckDB oracle."""
    x0 = int_units_sql(x, decimals)
    n = f"CAST(COUNT({x}) AS DOUBLE)"
    sx = f"CAST(SUM({x0}) AS DOUBLE)"
    sxx = f"CAST(SUM({x0} * {x0}) AS DOUBLE)"
    var = f"(({sxx}) - ({sx}) * ({sx}) / ({n})) / (({n}) - 1.0)"
    return (
        f"CASE WHEN COUNT({x}) >= 2 THEN SQRT(GREATEST({var}, 0.0)) / {float(10 ** decimals)}"
        f" ELSE NULL END"
    )


def dsum_sql(x: str, scale: int = MONEY_SCALE) -> str:
    """ANSI-SQL rendering of :func:`dsum`."""
    return f"CAST(SUM(CAST({x} AS DECIMAL(28,{scale}))) AS DOUBLE)"


def davg_sql(x: str, scale: int = MONEY_SCALE) -> str:
    """ANSI-SQL rendering of :func:`davg`."""
    return f"CAST(SUM(CAST({x} AS DECIMAL(28,{scale}))) AS DOUBLE) / COUNT({x})"


# --- portable log2 ----------------------------------------------------------
#
# Spark (JVM StrictMath-adjacent) and DuckDB (C libm) disagree in the last
# ulp on every transcendental (log2/ln/pow — verified empirically over 1e6
# integer inputs), so any hash-exact score involving logarithms must compute
# them from IEEE add/mul only, identically in both engines: integer msb via
# the binary-string length, then a FIXED degree-6 polynomial on the mantissa
# t = x/2^msb − 1 ∈ [0,1). Max abs error 5.1e-6 bits — noise for quality
# filtering, and deterministically the SAME noise everywhere.

# np.polyfit(t, log2(1+t), 6) over [0,1); highest degree first. FROZEN:
# changing these changes every score built on plog2.
PLOG2_COEFFS = (
    -0.024825826873615914,
    0.11790579312137135,
    -0.27235379330706044,
    0.4538565492818334,
    -0.7169869440427554,
    1.4423954888313009,
    5.065204756932284e-06,
)


def plog2_sql(x: str, duck: bool = False) -> str:
    """Portable log2 of an integer-valued SQL expression ≥ 1 (exact up to
    2^53). Emits the identical arithmetic in Spark SQL and DuckDB SQL —
    bit-identical results by construction."""
    msb = f"(length(bin({x})) - 1)"
    pow2 = (
        f"(CAST(1 AS BIGINT) << CAST({msb} AS INTEGER))"
        if duck
        else f"shiftleft(CAST(1 AS BIGINT), CAST({msb} AS INT))"
    )
    t = f"(CAST({x} AS DOUBLE) / CAST({pow2} AS DOUBLE) - 1.0)"
    poly = repr(PLOG2_COEFFS[0])
    for c in PLOG2_COEFFS[1:]:
        sign = "+" if c >= 0 else "-"
        poly = f"({poly}) * {t} {sign} {repr(abs(c))}"
    return f"(CAST({msb} AS DOUBLE) + ({poly}))"
