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


# --- named-dims projection: the whole-stage-codegen-friendly layout --------
#
# A 36-plane LSH bucket projection inlines ~2,300 element_at terms into ONE
# generated Java method (whole-stage codegen cannot split expression code
# bound to local variables), blowing janino's 64 KB method limit — the stage
# then silently runs interpreted (~5-10× slower). Two properties fix it
# without changing a single output bit:
#
#   1. Bind each dimension to a NAMED column once (an inner Project).
#      Downstream chains then reference attributes — in generated code a
#      plain local variable, ~2 bytes of bytecode per use instead of a
#      repeated element_at/cast blob. CollapseProject will not inline the
#      dims back (each is non-cheap and consumed dozens of times).
#   2. Make the dims NON-NULLABLE via COALESCE(x, 0.0): Add/Multiply codegen
#      over nullable doubles emits ~5 lines of null-propagation per node;
#      over non-nullable doubles it is one line. Embedding arrays contain no
#      NULLs in this engine's data contract, so the value is unchanged (and
#      the DuckDB oracles, which see the same NULL-free data, agree).
#
# tests/test_codegen_compiles.py pins compilation by running the bucketed
# operators under spark.sql.codegen.fallback=false.


def dim_names(prefix: str, dim: int = EMBED_DIM) -> list[str]:
    """Column names of a named-dims projection: `{prefix}1` … `{prefix}dim`."""
    return [f"{prefix}{i}" for i in range(1, dim + 1)]


def dim_exprs(col: str, prefix: str, dim: int = EMBED_DIM) -> list[Column]:
    """One non-nullable DOUBLE column per dimension of `col` (see module
    comment above — identical values to CAST(element_at(col, i) AS DOUBLE)
    on NULL-free embedding data, but codegen-sized)."""
    return [
        F.expr(f"COALESCE(CAST(element_at({col}, {i}) AS DOUBLE), 0.0)").alias(
            f"{prefix}{i}"
        )
        for i in range(1, dim + 1)
    ]


def dims_dot_sql(prefix_a: str, prefix_b: str, dim: int = EMBED_DIM) -> str:
    """Unrolled Σ aᵢ·bᵢ over two named-dims projections — the same
    left-associated double arithmetic as :func:`dot_sql`, referencing
    attributes instead of element_at (bit-identical values)."""
    return " + ".join(f"{prefix_a}{i} * {prefix_b}{i}" for i in range(1, dim + 1))


def dims_norm_sql(prefix: str, dim: int = EMBED_DIM) -> str:
    """‖a‖ over a named-dims projection (bit-identical to :func:`norm_sql`)."""
    return f"SQRT({dims_dot_sql(prefix, prefix, dim)})"


def dims_cosine_sql(
    prefix_a: str, prefix_b: str, norm_a: str, norm_b: str, dim: int = EMBED_DIM
) -> str:
    """Cosine with precomputed norms over two named-dims projections —
    bit-identical to :func:`cosine_with_norms_sql`."""
    return f"({dims_dot_sql(prefix_a, prefix_b, dim)}) / NULLIF({norm_a} * {norm_b}, 0.0)"
