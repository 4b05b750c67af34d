"""Embedding-vector column expressions (array<float|double>).

Dot products / norms / cosine via ``zip_with`` + ``aggregate`` — JVM-side
higher-order functions, no Python. These power the ANN similarity-search
and embedding near-dup operators (SURVEY training-data additions).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(
            a, F.lit(0.0), lambda acc, v: acc + v.cast("double") * v.cast("double")
        )
    )


def cosine(a: Column, b: Column) -> Column:
    """Cosine similarity; null-safe-ish: 0 when either norm is 0."""
    d = dot(a, b)
    na, nb = norm(a), norm(b)
    return F.when((na == 0) | (nb == 0), F.lit(0.0)).otherwise(d / (na * nb))


def l2_distance(a: Column, b: Column) -> Column:
    return F.sqrt(
        F.aggregate(
            F.zip_with(a, b, lambda x, y: (x.cast("double") - y.cast("double")) ** 2),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
    )


def cosine_arrow(a: Column, b: Column) -> Column:
    """Row-wise cosine via an Arrow-batched numpy kernel (einsum over the
    stacked batch). Same semantics as :func:`cosine` (0 when either norm is
    0, nulls propagate) but vectorized — the HOF form evaluates its lambdas
    interpreted per element, measured ~50x slower on bulk scoring
    (BENCH/BASELINE.md, minhash section). Use this in verification /
    scoring hot paths; keep :func:`cosine` for oracle-checkable plans."""
    import numpy as np
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    # no type hints: `from __future__ import annotations` stringifies them
    # and pyspark's hint inference can't resolve the closure-local `pd`
    @pandas_udf("double", functionType=200)  # SQL_SCALAR_PANDAS_UDF
    def _cos(av, bv):
        null = (av.isna() | bv.isna()).to_numpy()
        vals = np.zeros(len(av), dtype=np.float64)
        if (~null).any():
            A = np.array(av[~null].tolist(), dtype=np.float64)
            B = np.array(bv[~null].tolist(), dtype=np.float64)
            dots = np.einsum("ij,ij->i", A, B)
            denom = np.linalg.norm(A, axis=1) * np.linalg.norm(B, axis=1)
            vals[~null] = np.where(denom > 0, dots / np.where(denom == 0, 1.0, denom), 0.0)
        # nullable Float64 so null inputs yield SQL NULL, not NaN (NaN sorts
        # ABOVE every value in Spark — a NaN would pass >= threshold filters)
        return pd.Series(pd.array(vals, dtype="Float64")).mask(null)

    return _cos(a, b)


def unit(a: Column) -> Column:
    """L2-normalize (returns array<double>); zero vector passes through.

    The norm is threaded in as a zip_with argument (``array_repeat``
    evaluates it once per row): a free ``norm(a)`` inside the per-element
    lambda would re-run the O(d) aggregate per element — O(d^2)/row
    (higher-order functions evaluate interpreted, no subexpression
    elimination)."""
    return F.zip_with(
        a,
        F.array_repeat(norm(a), F.size(a)),
        lambda x, nn: F.when(nn == 0, x.cast("double")).otherwise(
            x.cast("double") / nn
        ),
    )
