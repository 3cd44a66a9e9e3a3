"""Production vector math: Arrow-batched numpy scoring.

The oracle-deterministic path in ``catalog/vectors.py`` folds dot
products sequentially with ``F.aggregate(F.zip_with(...))`` so scores
are bit-identical to DuckDB's ``list_reduce`` — but Spark interprets
higher-order functions per element, which makes ANN/semantic-dedup
scoring CPU-bound at 100 TB (the round-1 verdict's one design flag).

This module is the scale path behind the same ``(Column, Column) →
Column`` signature: a vectorized ``pandas_udf`` that stacks each Arrow
batch into one contiguous float64 matrix and computes every dot product
of the batch with a single BLAS-backed ``einsum`` call — thousands of
rows per Python invocation, no per-element interpretation. Results
differ from the sequential fold only in the last ulp (~1e-16 relative;
numpy uses pairwise/SIMD-blocked summation), so catalog queries built
on it round scores to 9 decimals on BOTH engines.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf


@pandas_udf("double")
def _dot_fast(a, b):  # type: ignore[no-untyped-def]
    import numpy as np
    import pandas as pd

    if len(a) == 0:
        return pd.Series([], dtype="float64")
    A = np.stack(a.to_numpy())
    B = np.stack(b.to_numpy())
    return pd.Series(np.einsum("ij,ij->i", A, B))


@pandas_udf("double")
def _cosine_fast(a, b):  # type: ignore[no-untyped-def]
    import numpy as np
    import pandas as pd

    if len(a) == 0:
        return pd.Series([], dtype="float64")
    A = np.stack(a.to_numpy())
    B = np.stack(b.to_numpy())
    num = np.einsum("ij,ij->i", A, B)
    den = np.sqrt(np.einsum("ij,ij->i", A, A) * np.einsum("ij,ij->i", B, B))
    return pd.Series(num / den)


def dot_fast(a: Column, b: Column) -> Column:
    """Batch-vectorized dot product (production path; last-ulp drift vs
    the sequential fold — round before cross-engine comparison)."""
    return _dot_fast(a, b)


def cosine_fast(a: Column, b: Column) -> Column:
    """Batch-vectorized cosine similarity (production path)."""
    return _cosine_fast(a, b)


def norm_fast(a: Column) -> Column:
    return F.sqrt(_dot_fast(a, a))
