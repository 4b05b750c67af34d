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


def _key_sentinel(dt):
    """Any in-domain constant works: the is-null flag disambiguates a
    genuine sentinel-valued key from a NULL key."""
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

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
    raise TypeError(f"grouped_*_sorted: unsupported key type {dt}")


def _project_keys(df: DataFrame, keys: list[str]):
    """Encode each key column as a (coalesced value, is-null flag) pair so
    int64 keys stay exact through Arrow (long-with-null coerces to float64,
    colliding above 2^53) and NULL stays distinct from NaN. Returns
    (projected df, value col names, flag col names)."""
    from pyspark.sql import functions as F

    nk = len(keys)
    gv = [f"__gv{i}__" for i in range(nk)]
    gn = [f"__gn{i}__" for i in range(nk)]
    clash = (set(gv) | set(gn)) & set(df.columns)
    if clash:
        raise ValueError(
            f"grouped_*_sorted: reserved column names in input: {sorted(clash)}"
        )
    key_types = {f.name: f.dataType for f in df.schema.fields}
    proj = df.select(
        *[F.col(c) for c in df.columns if c not in keys],
        *[
            F.coalesce(F.col(k), _key_sentinel(key_types[k])).alias(gv[i])
            for i, k in enumerate(keys)
        ],
        *[F.col(k).isNull().alias(gn[i]) for i, k in enumerate(keys)],
    )
    return proj, gv, gn


def _group_starts(batch, gv: list[str], gn: list[str]):
    """Boolean start-of-group mask over a key-sorted batch — one numpy
    compare per key column. groupBy semantics: every NaN is ONE group
    (normalized), distinct from the NULL group (the flag column)."""
    import numpy as np

    n = len(batch)
    change = np.zeros(n, dtype=bool)
    change[0] = True
    for v_col, g_col in zip(gv, gn):
        v = batch[v_col].to_numpy()
        g = batch[g_col].to_numpy()
        neq = np.asarray(v[1:] != v[:-1], dtype=bool)
        if v.dtype.kind == "f":
            neq &= ~(np.isnan(v[1:]) & np.isnan(v[:-1]))
        change[1:] |= neq | (g[1:] != g[:-1])
    return np.flatnonzero(change)


def _restore_keys(batch, keys: list[str], gv: list[str], gn: list[str]):
    """Reconstruct the exact, nullable key columns in-place (idempotent:
    carry rows re-run this on the next batch's concat frame)."""
    for i, k in enumerate(keys):
        col = batch[gv[i]]
        flags = batch[gn[i]].to_numpy()
        if flags.any():
            col = col.astype(object)
            col[flags] = None
        batch[k] = col
    return batch.drop(columns=gv + gn)


def _shuffle_partitions(df: DataFrame) -> int:
    """The session's configured shuffle parallelism — what the grouped
    exchanges would use with AQE coalescing off. Conf-derived (the value
    a cluster deployment tunes), never a local-mode constant."""
    return int(df.sparkSession.conf.get("spark.sql.shuffle.partitions"))


def grouped_rows_sorted(
    df: DataFrame, keys: list[str], row_fn, schema: str, pin_partitions: bool = True
) -> DataFrame:
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
    import pandas as pd
    from pyspark.sql import functions as F
    from pyspark.sql.types import _parse_datatype_string

    fields = [f.name for f in _parse_datatype_string(schema).fields]
    proj, gv, gn = _project_keys(df, keys)

    def _run(batches):
        carry = None
        for batch in batches:
            if carry is not None and len(carry):
                batch = pd.concat([carry, batch], ignore_index=True)
                carry = None
            if not len(batch):
                continue
            view = _restore_keys(batch, keys, gv, gn)
            starts = _group_starts(batch, gv, gn)
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

    # Explicit partition count (the session's configured shuffle
    # parallelism): without it AQE's byte-based coalescing collapses a
    # small-BYTES exchange to one partition and serializes the Python
    # kernel — these helpers exist precisely for frames whose cost is
    # per-row kernel compute, which bytes do not proxy. The pinned count
    # comes from conf (cluster-tuned), not a local constant.
    # ``pin_partitions=False`` opts back into AQE's byte-based coalescing
    # for kernels whose per-row cost IS proxied by exchanged bytes (e.g.
    # the s2 cell dissolve: work ~ cells, cells ~ bytes): a small frame
    # then runs as one or two tasks instead of paying the per-task Python
    # fee across the full shuffle width, while a large frame still splits
    # by size.
    if pin_partitions:
        part = proj.repartition(_shuffle_partitions(df), *[F.col(c) for c in gv + gn])
    else:
        part = proj.repartition(*[F.col(c) for c in gv + gn])
    return part.sortWithinPartitions(*gv, *gn).mapInPandas(_run, schema)


def grouped_frames_sorted(
    df: DataFrame,
    keys: list[str],
    frame_fn,
    schema: str,
    order_by: list[str] | tuple[str, ...] = (),
) -> DataFrame:
    """Grouped MULTI-row transform with per-BATCH Arrow overhead — the
    scale path for ``groupBy(keys).applyInPandas`` when groups are
    numerous and the kernel emits 0+ rows per group (a per-group filter,
    expansion, or order-dependent rewrite).

    Same machinery and key semantics as :func:`grouped_rows_sorted` (see
    its docstring: sentinel-coalesced key pairs keep int64 exact through
    Arrow and NULL distinct from NaN; the carry across a batch boundary
    holds at most the largest group). Additions:

    - ``order_by``: extra columns appended to the within-partition sort,
      so order-dependent kernels (trajectory simplification, sequence
      scans) see each group's rows in a deterministic order without a
      second sort inside the kernel.
    - ``frame_fn(sub_pdf) -> pd.DataFrame`` returns the group's OUTPUT
      rows (columns must cover ``schema``; extra columns are dropped).
      All group outputs of an input batch are concatenated into ONE
      Arrow frame — the per-batch fee, not a per-group one."""
    import pandas as pd
    from pyspark.sql import functions as F
    from pyspark.sql.types import _parse_datatype_string

    fields = [f.name for f in _parse_datatype_string(schema).fields]
    proj, gv, gn = _project_keys(df, keys)
    order_cols = list(order_by)

    def _run(batches):
        carry = None
        for batch in batches:
            if carry is not None and len(carry):
                batch = pd.concat([carry, batch], ignore_index=True)
                carry = None
            if not len(batch):
                continue
            view = _restore_keys(batch, keys, gv, gn)
            starts = _group_starts(batch, gv, gn)
            outs = []
            for i in range(len(starts) - 1):
                sub = frame_fn(view.iloc[starts[i] : starts[i + 1]])
                if sub is not None and len(sub):
                    outs.append(sub[fields])
            carry = batch.iloc[starts[-1] :]
            if outs:
                yield pd.concat(outs, ignore_index=True)
        if carry is not None and len(carry):
            sub = frame_fn(carry.drop(columns=gv + gn))
            if sub is not None and len(sub):
                yield sub[fields].reset_index(drop=True)

    # see grouped_rows_sorted: explicit conf-derived count so AQE's
    # byte-based coalescing cannot serialize the per-row Python kernel
    part = proj.repartition(
        _shuffle_partitions(df), *[F.col(c) for c in gv + gn]
    ).sortWithinPartitions(*gv, *gn, *order_cols)
    return part.mapInPandas(_run, schema)
