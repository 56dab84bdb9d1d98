"""Vector math over array<float> embedding columns — JVM-side only.

All products run on integer-quantized components (round(x * 1e6) as long):
integer sums are associative, so results are independent of partition/fold
order AND bit-identical across engines — the property the DuckDB oracle
comparison needs. The final cosine is a couple of IEEE-correctly-rounded
double ops (sqrt, divide) over identical integers, hence also identical.

At 64 dims and |x| < 1, quantized dot terms stay < 2^47 — no overflow.
Everything uses `aggregate`/`zip_with` higher-order functions: per-row,
codegen'd, no UDF, no Python in the loop.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

SCALE = 1_000_000


def quantize(col: Column | str, scale: int = SCALE) -> Column:
    # float -> double BEFORE scaling: float*int stays float and its rounding
    # is engine-dependent; double math is identical everywhere.
    c = F.col(col) if isinstance(col, str) else col
    return F.transform(c, lambda x: F.round(x.cast("double") * scale).cast("long"))


def dot_q(a: Column, b: Column) -> Column:
    """Exact integer dot product of two quantized vectors."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0).cast("long"), lambda acc, x: acc + x
    )


def norm_q(a: Column) -> Column:
    """Euclidean norm of a quantized vector (double; exact radicand)."""
    return F.sqrt(dot_q(a, a).cast("double"))


def cosine_q(a: Column, b: Column) -> Column:
    """Cosine similarity from quantized vectors: int dot / (norm * norm).
    Deterministic to the last bit given identical inputs. Zero vectors get
    NULL (try_divide) instead of an ANSI-mode divide-by-zero job failure;
    NULLs sort last under desc in both engines."""
    return F.try_divide(dot_q(a, b).cast("double"), norm_q(a) * norm_q(b))
