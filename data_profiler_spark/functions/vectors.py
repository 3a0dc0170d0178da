"""Dense-vector math over ``array<float>`` columns as Catalyst expressions.

No UDFs: ``zip_with`` + ``aggregate`` fold element-wise products JVM-side in
index order (deterministic double accumulation, so an external oracle that
also folds in index order produces bit-identical results). This is the
baseline path for embedding similarity search; the batch/top-k drivers live
in operators/similarity.py.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _as_double(col: Column) -> Column:
    return col.cast("array<double>")


def dot(a: Column, b: Column) -> Column:
    """Σ aᵢ·bᵢ, folded left-to-right in index order."""
    return F.aggregate(
        F.zip_with(_as_double(a), _as_double(b), lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def l2_norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(_as_double(a), F.lit(0.0), lambda acc, x: acc + x * x)
    )


def cosine_similarity(a: Column, b: Column) -> Column:
    """dot/(‖a‖·‖b‖); null-safe on zero norms via nullif."""
    return dot(a, b) / F.nullif(l2_norm(a) * l2_norm(b), F.lit(0.0))
