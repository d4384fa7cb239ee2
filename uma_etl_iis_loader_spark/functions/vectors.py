"""Vector kit for embedding columns (`array<float>`/`array<double>`).

All JVM-side higher-order functions (`zip_with` + `aggregate`) — the dot
product never leaves whole-stage codegen, so brute-force scoring scales with
executor count. For 100 TB-scale ANN, the LSH/IVF operators in
``operators/similarity.py`` bucket first so the pairwise work is bounded.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F


def _as_col(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def dot(a: Column | str, b: Column | str) -> Column:
    a, b = _as_col(a), _as_col(b)
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def norm(a: Column | str) -> Column:
    a = _as_col(a)
    return F.sqrt(
        F.aggregate(
            a,
            F.lit(0.0),
            lambda acc, x: acc + x.cast("double") * x.cast("double"),
        )
    )


def cosine(a: Column | str, b: Column | str) -> Column:
    """Cosine similarity; 0.0 when either vector has zero norm."""
    d = dot(a, b)
    na, nb = norm(a), norm(b)
    return F.when((na > 0) & (nb > 0), d / (na * nb)).otherwise(F.lit(0.0))


_cosine_arrow_udf = None


def cosine_arrow(a: Column | str, b: Column | str) -> Column:
    """Arrow-batched cosine over paired vector columns.

    Semantically identical to ``cosine`` (zero-norm → 0.0) but vectorized
    in numpy: use on the hot path when pair counts are large — the
    column-expression fold is interpreted per element (~µs/element), this
    is one einsum per Arrow batch. (Lazily built: pandas_udf needs an
    active session to parse its return type.)
    """
    global _cosine_arrow_udf
    if _cosine_arrow_udf is None:

        @F.pandas_udf("double")
        def _udf(x: pd.Series, y: pd.Series) -> pd.Series:
            av = np.stack([np.asarray(v, dtype=np.float64) for v in x])
            bv = np.stack([np.asarray(v, dtype=np.float64) for v in y])
            dots = np.einsum("ij,ij->i", av, bv)
            denom = np.linalg.norm(av, axis=1) * np.linalg.norm(bv, axis=1)
            out = np.where(
                denom > 0, dots / np.where(denom == 0, 1.0, denom), 0.0
            )
            return pd.Series(out)

        _cosine_arrow_udf = _udf
    return _cosine_arrow_udf(_as_col(a), _as_col(b))


def l2_distance(a: Column | str, b: Column | str) -> Column:
    a, b = _as_col(a), _as_col(b)
    return F.sqrt(
        F.aggregate(
            F.zip_with(
                a, b, lambda x, y: (x.cast("double") - y.cast("double")) ** 2
            ),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
    )
