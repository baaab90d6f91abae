"""Vector math over array<float> embedding columns — engine-portable.

Dot products are emitted as explicit unrolled sums (deterministic
left-associated double arithmetic, identical in any engine) rather than a
library call whose accumulation order is implementation-defined. At 64
dims the unrolled expression stays inside whole-stage codegen — no UDF, no
Python, no Arrow hop.

For much larger dims, swap in a Pandas-UDF batch kernel (numpy dot) — the
plumbing stays the same; only bit-reproducibility across engines is traded
away.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

EMBED_DIM = 64


def _spark_el(col: str, i: int) -> str:
    return f"CAST(element_at({col}, {i}) AS DOUBLE)"


def _duck_el(col: str, i: int) -> str:
    return f"CAST({col}[{i}] AS DOUBLE)"


def dot_sql(a: str, b: str, dim: int = EMBED_DIM, duck: bool = False) -> str:
    """Unrolled Σ aᵢ·bᵢ (1-based element access in both engines)."""
    el = _duck_el if duck else _spark_el
    return " + ".join(f"{el(a, i)} * {el(b, i)}" for i in range(1, dim + 1))


def cosine_sql(a: str, b: str, dim: int = EMBED_DIM, duck: bool = False) -> str:
    """Cosine similarity; NULL when either vector is all-zero (NULLIF guard
    keeps ANSI mode from raising DIVIDE_BY_ZERO)."""
    return (
        f"({dot_sql(a, b, dim, duck)}) / "
        f"NULLIF(SQRT({dot_sql(a, a, dim, duck)}) * SQRT({dot_sql(b, b, dim, duck)}), 0.0)"
    )


def cosine(a: str, b: str, dim: int = EMBED_DIM) -> Column:
    return F.expr(cosine_sql(a, b, dim))


def norm_sql(a: str, dim: int = EMBED_DIM, duck: bool = False) -> str:
    """‖a‖ — precompute once per vector before a pairwise join: cosine then
    costs one dot product per pair instead of three."""
    return f"SQRT({dot_sql(a, a, dim, duck)})"


def cosine_with_norms_sql(
    a: str, b: str, norm_a: str, norm_b: str, dim: int = EMBED_DIM, duck: bool = False
) -> str:
    """Cosine using precomputed norms. Bit-identical to :func:`cosine_sql`
    (same expressions over the same data, evaluated once instead of per
    pair), so oracle parity is preserved."""
    return f"({dot_sql(a, b, dim, duck)}) / NULLIF({norm_a} * {norm_b}, 0.0)"
