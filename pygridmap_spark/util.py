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
    one row per group per batch. Null keys group together (pandas NaN/None
    both treated as the null group, matching Spark's groupBy).

    ``row_fn`` must return a plain dict of scalars covering every field in
    ``schema`` (including the key columns, read from the slice)."""
    import numpy as np
    import pandas as pd
    from pyspark.sql import functions as F
    from pyspark.sql.types import _parse_datatype_string

    fields = [f.name for f in _parse_datatype_string(schema).fields]

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
            for k in keys:
                v = batch[k].to_numpy()
                isna = pd.isna(v)
                neq = np.asarray(v[1:] != v[:-1], dtype=bool)
                change[1:] |= neq & ~(isna[1:] & isna[:-1])
            starts = np.flatnonzero(change)
            out: dict[str, list] = {f: [] for f in fields}
            for i in range(len(starts) - 1):
                row = row_fn(batch.iloc[starts[i] : starts[i + 1]])
                for f in fields:
                    out[f].append(row[f])
            carry = batch.iloc[starts[-1] :]
            if out[fields[0]]:
                yield pd.DataFrame(out)
        if carry is not None and len(carry):
            row = row_fn(carry)
            yield pd.DataFrame({f: [row[f]] for f in fields})

    part = df.repartition(*[F.col(k) for k in keys]).sortWithinPartitions(*keys)
    return part.mapInPandas(_run, schema)
