"""Small shared Spark-side helpers."""

from __future__ import annotations

from pyspark.sql import DataFrame


def schema_with(df: DataFrame, *extra: str) -> str:
    """DDL schema string of ``df`` plus appended ``"name type"`` fields —
    the mapInPandas output-schema idiom used across the Arrow kernels
    (single definition so quoting/duplicate-name fixes land everywhere)."""
    base = ", ".join(f"{f.name} {f.dataType.simpleString()}" for f in df.schema.fields)
    return ", ".join([base, *extra]) if extra else base


def box_wkb_udf():
    """Pandas UDF encoding rect corners (x, y, xmax, ymax) as WKB polygon
    boxes — the single cell-geometry encoder shared by gridding._finalize
    and the overlay emit_wkb paths. Defined WITHOUT type hints and with an
    explicit SCALAR functionType: this module uses ``from __future__ import
    annotations``, which turns hints into strings pandas_udf may fail to
    resolve (CLAUDE.md gotcha)."""
    import pandas as pd
    from pyspark.sql.functions import pandas_udf
    from pyspark.sql.types import BinaryType

    from pygridmap_spark.core import wkb

    def _box(x, y, x1, y1):
        return pd.Series(
            [wkb.encode_box(a, b, c, d) for a, b, c, d in zip(x, y, x1, y1)],
            dtype=object,
        )

    return pandas_udf(_box, returnType=BinaryType(), functionType=200)


def grouped_rows_sorted(df: DataFrame, keys: list[str], row_fn, schema: str) -> DataFrame:
    """Grouped one-row-per-group reduce with per-BATCH (not per-group)
    Arrow overhead — the scale path for ``groupBy(keys).applyInPandas``
    when groups are numerous and the reducer emits a single row each.

    ``FlatMapGroupsInPandas`` pays a fixed ~1-4 ms per GROUP (per-group
    Arrow round-trip + pandas frame construction), which is serial within
    a task: 100k dissolve groups cost minutes of pure overhead however
    cheap the kernel. This helper hash-repartitions on ``keys``, sorts
    within partitions (groups become contiguous), and streams batches
    through ``mapInPandas``: group boundaries are found with one numpy
    compare per key, ``row_fn(sub_pdf) -> dict`` is called per group on a
    zero-copy slice, and ONE output frame is built per input batch.

    Memory contract: identical to ``applyInPandas`` — the carry across a
    batch boundary holds at most one (the largest) group; outputs buffer
    one row per group per batch. Key semantics match Spark's ``groupBy``
    exactly: null keys are one group, all NaN doubles are one group
    DISTINCT from the null group, and int64 keys compare exactly. The
    latter two need care because Arrow-to-pandas coerces long-with-null
    columns to float64 (keys above 2^53 would collide) and folds NULL and
    NaN doubles together: each key column therefore ships as a
    (coalesced value, is-null flag) pair — the coalesced column is
    non-null, so integers stay int64 through Arrow — and the exact,
    nullable key column is reconstructed per batch for ``row_fn``.

    ``row_fn`` must return a plain dict of scalars covering every field in
    ``schema`` (including the key columns, read from the slice)."""
    import numpy as np
    import pandas as pd
    from pyspark.sql import functions as F
    from pyspark.sql import types as T
    from pyspark.sql.types import _parse_datatype_string

    fields = [f.name for f in _parse_datatype_string(schema).fields]

    def _sentinel(dt):
        # Any in-domain constant works: the is-null flag disambiguates a
        # genuine sentinel-valued key from a NULL key.
        if isinstance(
            dt,
            (
                T.ByteType,
                T.ShortType,
                T.IntegerType,
                T.LongType,
                T.FloatType,
                T.DoubleType,
                T.DecimalType,
            ),
        ):
            return F.lit(0).cast(dt)
        if isinstance(dt, T.StringType):
            return F.lit("")
        if isinstance(dt, T.BooleanType):
            return F.lit(False)
        if isinstance(dt, T.BinaryType):
            return F.lit(b"")
        if isinstance(dt, T.TimestampType):
            return F.timestamp_seconds(F.lit(0))
        if isinstance(dt, T.DateType):
            return F.to_date(F.lit("1970-01-01"))
        raise TypeError(f"grouped_rows_sorted: unsupported key type {dt}")

    nk = len(keys)
    gv = [f"__gv{i}__" for i in range(nk)]
    gn = [f"__gn{i}__" for i in range(nk)]
    clash = (set(gv) | set(gn)) & set(df.columns)
    if clash:
        raise ValueError(f"grouped_rows_sorted: reserved column names in input: {sorted(clash)}")
    key_types = {f.name: f.dataType for f in df.schema.fields}
    proj = df.select(
        *[F.col(c) for c in df.columns if c not in keys],
        *[F.coalesce(F.col(k), _sentinel(key_types[k])).alias(gv[i]) for i, k in enumerate(keys)],
        *[F.col(k).isNull().alias(gn[i]) for i, k in enumerate(keys)],
    )

    def _run(batches):
        carry = None
        for batch in batches:
            if carry is not None and len(carry):
                batch = pd.concat([carry, batch], ignore_index=True)
                carry = None
            n = len(batch)
            if not n:
                continue
            change = np.zeros(n, dtype=bool)
            change[0] = True
            for i in range(nk):
                v = batch[gv[i]].to_numpy()
                g = batch[gn[i]].to_numpy()
                neq = np.asarray(v[1:] != v[:-1], dtype=bool)
                if v.dtype.kind == "f":
                    # groupBy puts every NaN in ONE group (normalized NaN).
                    neq &= ~(np.isnan(v[1:]) & np.isnan(v[:-1]))
                change[1:] |= neq | (g[1:] != g[:-1])
            # Exact nullable key columns for row_fn (idempotent: carry rows
            # re-run this on the next batch's concat frame).
            for i, k in enumerate(keys):
                col = batch[gv[i]]
                flags = batch[gn[i]].to_numpy()
                if flags.any():
                    col = col.astype(object)
                    col[flags] = None
                batch[k] = col
            view = batch.drop(columns=gv + gn)
            starts = np.flatnonzero(change)
            out: dict[str, list] = {f: [] for f in fields}
            for i in range(len(starts) - 1):
                row = row_fn(view.iloc[starts[i] : starts[i + 1]])
                for f in fields:
                    out[f].append(row[f])
            carry = batch.iloc[starts[-1] :]
            if out[fields[0]]:
                yield pd.DataFrame(out)
        if carry is not None and len(carry):
            row = row_fn(carry.drop(columns=gv + gn))
            yield pd.DataFrame({f: [row[f]] for f in fields})

    part = proj.repartition(*[F.col(c) for c in gv + gn]).sortWithinPartitions(*gv, *gn)
    return part.mapInPandas(_run, schema)
