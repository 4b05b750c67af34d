"""Similarity search over embedding columns (array<float>).

- `cosine_topk_bruteforce`: exact top-k, HOF expressions (zip_with/
  aggregate) — the DuckDB-oracle-checkable baseline.
- `cosine_topk_bruteforce_np`: exact top-k, Arrow matmul kernel with
  per-batch candidate cut — the bulk path (also oracle-gated).
- `with_hyperplane_signature` + `cosine_topk_lsh`: random-hyperplane LSH
  (seeded plane matrix in the UDF closure, one matmul + sign-pack per
  batch); bucket equi-join + multiprobe — beats the O(N*Q) scan when the
  corpus is large.
- `train_ivf_centroids` / `with_ivf_list` / `cosine_topk_ivf`: IVF coarse
  quantizer — the partition-pruned scale path (corpus written partitioned
  by ivf_list; queries probe nprobe lists).
- `quantize_embeddings` / `cosine_topk_quantized`: int8 codes at 1/4 the
  scan bytes, optional exact float rerank of the shortlist.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from pygridmap_spark.functions import vectors as V


def cosine_topk_bruteforce(
    corpus: DataFrame,
    queries: DataFrame,
    k: int,
    corpus_id: str = "vec_id",
    query_id: str = "query_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact cosine top-k: (query_id, vec_id, cosine, rank). Ties break on
    ascending corpus id (deterministic)."""
    q = queries.select(F.col(query_id), F.col(vec_col).alias("_qv"))
    c = corpus.select(F.col(corpus_id), F.col(vec_col).alias("_cv"))
    scored = c.crossJoin(F.broadcast(q)).withColumn(
        "cosine", V.cosine(F.col("_qv"), F.col("_cv"))
    )
    w = Window.partitionBy(query_id).orderBy(F.col("cosine").desc(), F.col(corpus_id).asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(query_id, corpus_id, "cosine", "rank")
    )



def _collect_query_matrix(queries: DataFrame, query_id: str, vec_col: str):
    """(ids, normalized (q, d) matrix) of the non-null query vectors."""
    qrows = queries.filter(F.col(vec_col).isNotNull()).select(query_id, vec_col).collect()
    if not qrows:
        return [], None
    Q = np.array([np.asarray(r[1], dtype=np.float64) for r in qrows])
    qn = np.linalg.norm(Q, axis=1)
    Q[qn > 0] /= qn[qn > 0, None]
    Q[qn == 0] = 0.0  # zero-norm query scores 0 against everything
    return [r[0] for r in qrows], Q


def _matmul_shortlist_scan(
    corpus: DataFrame,
    corpus_id: str,
    value_col: str,
    q_ids,
    Qt,
    shortlist: int,
    schema: str,
) -> DataFrame:
    """One normalized matmul per Arrow batch over ``value_col`` (float or
    int8-code vectors — normalization makes any per-vector scale cancel),
    cut to the per-batch ``shortlist`` best per query KEEPING score ties at
    the boundary (so a later global tie-break on ascending id stays exact).
    NULL vectors are excluded."""
    import pandas as pd
    from typing import Iterator

    def _score(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for batch in batches:
            batch = batch[batch[value_col].notna()]
            if not len(batch):
                continue
            C = np.array(batch[value_col].tolist(), dtype=np.float64)
            cn = np.linalg.norm(C, axis=1)
            C[cn > 0] /= cn[cn > 0, None]
            C[cn == 0] = 0.0
            scores = C @ Qt  # (n_batch, n_queries)
            ids = batch[corpus_id].to_numpy()
            n = scores.shape[0]
            qarr = np.asarray(q_ids)
            if n > shortlist:
                # per-query kth threshold in ONE partition pass (axis=0),
                # ties at the boundary kept — no Python loop over queries
                kth = np.partition(scores, n - shortlist, axis=0)[n - shortlist]
                qidx, cidx = np.nonzero((scores >= kth[None, :]).T)
            else:
                qidx, cidx = np.divmod(np.arange(n * len(q_ids)), n)
            yield pd.DataFrame(
                {
                    q_col: qarr[qidx],
                    corpus_id: ids[cidx],
                    "cosine": scores[cidx, qidx],
                }
            )

    q_col = schema.split(" ", 1)[0]
    return corpus.select(corpus_id, value_col).mapInPandas(_score, schema)


def cosine_topk_bruteforce_np(
    corpus: DataFrame,
    queries: DataFrame,
    k: int,
    corpus_id: str = "vec_id",
    query_id: str = "query_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact cosine top-k via an Arrow/numpy matmul kernel — the bulk path.

    The query set is collected to the driver (queries are small by contract
    — this is the same broadcast assumption as the HOF variant) and shipped
    in the UDF closure as a normalized (q, d) matrix. Each Arrow batch of
    corpus vectors is normalized and scored with ONE matmul, then cut to
    the per-batch top-k candidates per query (keeping all score ties at the
    boundary, so the global tie-break on ascending corpus id stays exact).
    Only ~k*q rows per batch reach the final window — the shuffle carries
    candidates, not the corpus. Semantics identical to
    :func:`cosine_topk_bruteforce` (zero-norm vectors score 0; ties break
    on ascending corpus id), with one documented divergence: NULL
    embeddings are EXCLUDED on both sides (the HOF baseline emits
    null-cosine rows for them, which rank last anyway)."""
    q_ids, Q = _collect_query_matrix(queries, query_id, vec_col)
    qid_type = dict(queries.dtypes)[query_id]
    cid_type = dict(corpus.dtypes)[corpus_id]
    schema = f"{query_id} {qid_type}, {corpus_id} {cid_type}, cosine double"
    if not q_ids:
        return corpus.sparkSession.createDataFrame([], schema).withColumn(
            "rank", F.lit(1)
        ).limit(0)
    cand = _matmul_shortlist_scan(corpus, corpus_id, vec_col, q_ids, Q.T, k, schema)
    w = Window.partitionBy(query_id).orderBy(F.col("cosine").desc(), F.col(corpus_id).asc())
    return (
        cand.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(query_id, corpus_id, "cosine", "rank")
    )


def with_hyperplane_signature(
    df: DataFrame, vec_col: str = "embedding", planes: int = 16, seed: int = 42
) -> DataFrame:
    """Append a ``signature`` long: bit p = sign(dot(vec, plane_p)).

    Plane normals are seeded numpy (deterministic across runs/executors),
    shipped in the UDF closure; one matmul + sign-pack per Arrow batch.
    Round 1 embedded each plane as a per-element literal array and computed
    the dot with interpreted zip_with/aggregate lambdas — correct, but the
    plan grows O(planes x dim) literal nodes (breaks down at dim >= 1k) and
    the HOF path is ~50x slower than Arrow numpy on bulk input. Same
    signatures (sign of the same dot products; dot >= 0 maps to bit 1,
    including exact zeros, e.g. the null/zero vector)."""
    import pandas as pd
    from typing import Iterator

    first = df.filter(F.col(vec_col).isNotNull()).select(vec_col).first()
    if first is None:  # empty/all-null input: keep the schema contract
        return df.withColumn("signature", F.lit(0).cast("long"))
    dim = len(first[0])
    rng = np.random.default_rng(seed)
    planes_t = rng.standard_normal((planes, dim)).T  # (dim, planes)
    weights = (1 << np.arange(planes, dtype=np.uint64)).astype(np.uint64)
    from pygridmap_spark.util import schema_with

    schema = schema_with(df, "signature long")

    def _sig(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for batch in batches:
            if not len(batch):
                continue
            vec = batch[vec_col]
            null = vec.isna().to_numpy()
            sigs = np.zeros(len(batch), dtype=np.uint64)
            if (~null).any():
                X = np.array(vec[~null].tolist(), dtype=np.float64)
                bits = (X @ planes_t) >= 0  # (n, planes)
                sigs[~null] = (bits.astype(np.uint64) * weights).sum(axis=1)
            out = batch.copy()
            out["signature"] = sigs.astype(np.int64)
            yield out

    return df.mapInPandas(_sig, schema)


def cosine_topk_lsh(
    corpus: DataFrame,
    queries: DataFrame,
    k: int,
    corpus_id: str = "vec_id",
    query_id: str = "query_id",
    vec_col: str = "embedding",
    planes: int = 12,
    seed: int = 42,
    multiprobe_bits: int = 1,
) -> DataFrame:
    """Approximate cosine top-k via hyperplane-LSH bucket equi-join.

    Queries probe their own bucket plus every bucket at Hamming distance
    <= multiprobe_bits (all combinations of flipped sign bits) — the
    recall/latency dial; probe count grows as C(planes, b), so keep
    multiprobe_bits <= 2 in practice. Results are exact cosines over the
    candidate set."""
    import itertools

    c = with_hyperplane_signature(
        corpus.select(F.col(corpus_id), F.col(vec_col).alias("_cv")), "_cv", planes, seed
    )
    q = with_hyperplane_signature(
        queries.select(F.col(query_id), F.col(vec_col).alias("_qv")), "_qv", planes, seed
    )
    masks = [0]
    for b in range(1, multiprobe_bits + 1):
        for combo in itertools.combinations(range(planes), b):
            masks.append(sum(1 << p for p in combo))
    probes = F.array(
        *[F.col("signature").bitwiseXOR(F.lit(m)) for m in masks]
    )
    qp = q.withColumn("signature", F.explode(probes))
    # multiprobe makes a (query, corpus) pair reachable through several
    # probed buckets — dedup the candidate ids BEFORE scoring so the Arrow
    # cosine kernel runs once per pair, not once per probe route (up to
    # C(planes, b)+1 x less kernel work; identical output, since _qv/_cv
    # are functionally dependent on the ids)
    scored = (
        qp.join(c, "signature")
        .dropDuplicates([query_id, corpus_id])
        .withColumn("cosine", V.cosine_arrow(F.col("_qv"), F.col("_cv")))
    )
    w = Window.partitionBy(query_id).orderBy(F.col("cosine").desc(), F.col(corpus_id).asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(query_id, corpus_id, "cosine", "rank")
    )


# ---------------------------------------------------------------------------
# IVF (inverted-file) ANN — the coarse-quantizer scale path
# ---------------------------------------------------------------------------


def train_ivf_centroids(
    corpus: DataFrame,
    nlist: int,
    vec_col: str = "embedding",
    sample_size: int = 50_000,
    iters: int = 10,
    seed: int = 42,
):
    """k-means coarse quantizer trained driver-side on a RANDOM corpus
    sample (standard IVF practice — FAISS trains on a sample too; the full
    corpus never leaves the executors). A plain ``limit`` would take the
    first partitions' rows, which on sorted/clustered lake tables (by
    language, time, topic) trains every centroid on one cluster — so each
    row gets a seeded random priority and the sample is the global top-m by
    priority. Spark plans ``orderBy(rand).limit(m)`` as
    TakeOrderedAndProject: a per-partition partial top-m then one driver
    merge — ONE pass over the corpus, no full-sort shuffle and, unlike a
    Bernoulli ``sample()``, no prior full-scan ``count()`` job to derive a
    fraction (at 100 TB that count is a whole extra job before training).
    Returns a unit-normalized (nlist, dim) numpy array; deterministic for a
    fixed seed and input partitioning."""
    import numpy as np

    vecs = corpus.filter(F.col(vec_col).isNotNull()).select(vec_col)
    rows = (
        vecs.withColumn("_prio", F.rand(seed))
        .orderBy("_prio")
        .limit(sample_size)
        .select(vec_col)
        .collect()
    )
    if not rows:
        raise ValueError("empty corpus: cannot train IVF centroids")
    X = np.array([np.asarray(r[0], dtype=np.float64) for r in rows])
    nlist = min(nlist, len(X))
    norms = np.linalg.norm(X, axis=1)
    X[norms > 0] /= norms[norms > 0, None]
    rng = np.random.default_rng(seed)
    cents = X[rng.choice(len(X), size=nlist, replace=False)].copy()
    for _ in range(iters):
        # cosine k-means: assign by max dot against unit centroids
        cn = np.linalg.norm(cents, axis=1)
        cents[cn > 0] /= cn[cn > 0, None]
        assign = (X @ cents.T).argmax(axis=1)
        for c in range(nlist):
            members = X[assign == c]
            if len(members):
                cents[c] = members.mean(axis=0)
    cn = np.linalg.norm(cents, axis=1)
    cents[cn > 0] /= cn[cn > 0, None]
    return cents


def with_ivf_list(df: DataFrame, centroids, vec_col: str = "embedding") -> DataFrame:
    """Append ``ivf_list`` (argmax-cosine centroid id) via one Arrow matmul
    per batch; NULL embeddings get list -1 (never probed). At scale this is
    the partitioning key: write the corpus bucketed/partitioned by ivf_list
    and queries prune to nprobe lists."""
    import numpy as np
    import pandas as pd
    from typing import Iterator

    C = np.asarray(centroids, dtype=np.float64).T  # (dim, nlist)
    from pygridmap_spark.util import schema_with

    schema = schema_with(df, "ivf_list int")

    def _assign(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for batch in batches:
            if not len(batch):
                continue
            null = batch[vec_col].isna().to_numpy()
            lists = np.full(len(batch), -1, dtype=np.int32)
            if (~null).any():
                X = np.array(batch[vec_col][~null].tolist(), dtype=np.float64)
                n = np.linalg.norm(X, axis=1)
                X[n > 0] /= n[n > 0, None]
                lists[~null] = (X @ C).argmax(axis=1).astype(np.int32)
            out = batch.copy()
            out["ivf_list"] = lists
            yield out

    return df.mapInPandas(_assign, schema)


def cosine_topk_ivf(
    corpus: DataFrame,
    queries: DataFrame,
    k: int,
    nlist: int = 64,
    nprobe: int = 8,
    corpus_id: str = "vec_id",
    query_id: str = "query_id",
    vec_col: str = "embedding",
    centroids=None,
    sample_size: int = 50_000,
    seed: int = 42,
) -> DataFrame:
    """Approximate cosine top-k via IVF: corpus rows live in their nearest
    centroid's list; each query probes its ``nprobe`` nearest lists and
    scores only those candidates exactly (Arrow numpy kernel).

    Plan shape at 100 TB: the corpus-side assignment is one map pass (and
    would be precomputed + partitioned-by in a real lake table, making the
    probe join partition-pruned); the join is a plain equi-join on
    ``ivf_list`` against a broadcast-size probe frame; exact scoring runs
    on ~nprobe/nlist of the corpus. Recall/latency dial = nprobe."""
    import numpy as np

    if centroids is None:
        centroids = train_ivf_centroids(
            corpus, nlist, vec_col, sample_size=sample_size, seed=seed
        )
    c = with_ivf_list(
        corpus.select(F.col(corpus_id), F.col(vec_col).alias("_cv")), centroids, "_cv"
    )
    qp = _probe_frame(queries, centroids, nprobe, query_id, vec_col)
    if qp is None:
        qid_type = dict(queries.dtypes)[query_id]
        cid_type = dict(corpus.dtypes)[corpus_id]
        return corpus.sparkSession.createDataFrame(
            [], f"{query_id} {qid_type}, {corpus_id} {cid_type}, cosine double, rank int"
        )
    return _score_probed(c, qp, k, corpus_id, query_id)


def _probe_frame(queries: DataFrame, centroids, nprobe: int, query_id: str, vec_col: str):
    """(query, query_vec, probed ivf_list) dimension frame — the query side
    of every IVF search (driver-side argsort over the tiny centroid
    matrix). None when there are no non-null queries."""
    import numpy as np

    qrows = queries.filter(F.col(vec_col).isNotNull()).select(query_id, vec_col).collect()
    if not qrows:
        return None
    Q = np.array([np.asarray(r[1], dtype=np.float64) for r in qrows])
    qn = np.linalg.norm(Q, axis=1)
    Q[qn > 0] /= qn[qn > 0, None]
    probes = np.argsort(-(Q @ np.asarray(centroids).T), axis=1)[:, : min(nprobe, len(centroids))]
    probe_rows = [
        (r[0], r[1], int(pl))
        for r, plist in zip(qrows, probes)
        for pl in plist
    ]
    return queries.sparkSession.createDataFrame(
        probe_rows,
        f"{query_id} {dict(queries.dtypes)[query_id]}, _qv {dict(queries.dtypes)[vec_col]}, ivf_list int",
    )


def _score_probed(c: DataFrame, qp: DataFrame, k: int, corpus_id: str, query_id: str) -> DataFrame:
    """Equi-join the assigned corpus with the broadcast probe frame, score
    candidates with the Arrow cosine kernel, cut top-k per query."""
    scored = c.join(F.broadcast(qp), "ivf_list").withColumn(
        "cosine", V.cosine_arrow(F.col("_qv"), F.col("_cv"))
    )
    w = Window.partitionBy(query_id).orderBy(F.col("cosine").desc(), F.col(corpus_id).asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(query_id, corpus_id, "cosine", "rank")
    )


def write_ivf_index(
    corpus: DataFrame,
    centroids,
    path: str,
    corpus_id: str = "vec_id",
    vec_col: str = "embedding",
    mode: str = "overwrite",
) -> None:
    """Materialize the corpus PARTITIONED BY its IVF list — the lake-table
    form of the index. At 100 TB the assignment map-pass runs once at write
    time; every later search's probed lists become PartitionFilters on this
    tree (pruned at file listing — ~nprobe/nlist of the bytes are ever
    touched, asserted in tests via the executed plan)."""
    assigned = with_ivf_list(
        corpus.select(F.col(corpus_id), F.col(vec_col).alias("_cv")), centroids, "_cv"
    )
    assigned.write.mode(mode).partitionBy("ivf_list").parquet(path)


def cosine_topk_ivf_indexed(
    spark,
    path: str,
    queries: DataFrame,
    centroids,
    k: int,
    nprobe: int = 8,
    corpus_id: str = "vec_id",
    query_id: str = "query_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Search a :func:`write_ivf_index` tree. The union of all probed lists
    is pushed as an ``ivf_list IN (...)`` predicate on the partition column
    (PartitionFilters: unprobed lists are never listed or scanned); the
    per-query refinement is the same broadcast probe equi-join as
    :func:`cosine_topk_ivf` — identical output for identical centroids
    (pinned in tests)."""
    index = spark.read.parquet(path)
    qp = _probe_frame(queries, centroids, nprobe, query_id, vec_col)
    if qp is None:
        qid_type = dict(queries.dtypes)[query_id]
        # corpus id type from the index itself — hardcoding long would give
        # the empty frame a different schema than the non-empty path for
        # string-id corpora
        cid_type = dict(index.dtypes)[corpus_id]
        return spark.createDataFrame(
            [], f"{query_id} {qid_type}, {corpus_id} {cid_type}, cosine double, rank int"
        )
    probed = sorted({r["ivf_list"] for r in qp.select("ivf_list").distinct().collect()})
    c = index.filter(F.col("ivf_list").isin(probed))
    return _score_probed(c, qp, k, corpus_id, query_id)


# ---------------------------------------------------------------------------
# int8 embedding quantization — scan-IO reduction for huge corpora
# ---------------------------------------------------------------------------


def quantize_embeddings(
    df: DataFrame, vec_col: str = "embedding", out_prefix: str = "q"
) -> DataFrame:
    """Symmetric per-vector int8 quantization: ``{out_prefix}_codes``
    (array<tinyint>, v ~= code * scale) + ``{out_prefix}_scale`` (float).
    A 100 TB float32 embedding column becomes ~25 TB on disk/scan — the
    standard first move before ANN over a web-scale corpus. NULL vectors
    get null codes."""
    import pandas as pd
    from typing import Iterator

    from pygridmap_spark.util import schema_with

    schema = schema_with(
        df, f"{out_prefix}_codes array<tinyint>", f"{out_prefix}_scale float"
    )

    def _quant(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for batch in batches:
            if not len(batch):
                continue
            codes, scales = [], []
            for v in batch[vec_col]:
                if v is None or (hasattr(v, "__len__") and len(v) == 0):
                    codes.append(None)
                    scales.append(None)
                    continue
                x = np.asarray(v, dtype=np.float64)
                m = np.abs(x).max()
                s = m / 127.0 if m > 0 else 1.0
                codes.append(np.clip(np.round(x / s), -127, 127).astype(np.int8))
                scales.append(np.float32(s))
            out = batch.copy()
            out[f"{out_prefix}_codes"] = codes
            out[f"{out_prefix}_scale"] = scales
            yield out

    return df.mapInPandas(_quant, schema)


def cosine_topk_quantized(
    corpus_q: DataFrame,
    queries: DataFrame,
    k: int,
    corpus_id: str = "vec_id",
    query_id: str = "query_id",
    vec_col: str = "embedding",
    codes_col: str = "q_codes",
    rerank: int | None = None,
    rerank_corpus: DataFrame | None = None,
) -> DataFrame:
    """Top-k over int8-quantized embeddings (cosine is scale-invariant, so
    the per-vector scale cancels and scoring is one int8 matmul per batch —
    the same shared kernel as the float path). With ``rerank`` (>= k) and
    ``rerank_corpus`` (the float table), the quantized pass shortlists
    ``rerank`` candidates per query and exact float cosine re-scores only
    those — full precision at a quarter of the scan bytes WHEN the margin
    holds (a true top-k member quantized below the rerank-th quantized
    score is lost; int8 cosine error is ~1e-2, so rerank >= 3-5x k is a
    comfortable margin in practice)."""
    if rerank is not None and rerank < k:
        raise ValueError(f"rerank ({rerank}) must be >= k ({k})")
    q_ids, Q = _collect_query_matrix(queries, query_id, vec_col)
    qid_type = dict(queries.dtypes)[query_id]
    cid_type = dict(corpus_q.dtypes)[corpus_id]
    schema = f"{query_id} {qid_type}, {corpus_id} {cid_type}, cosine double"
    if not q_ids:
        return corpus_q.sparkSession.createDataFrame([], schema).withColumn(
            "rank", F.lit(1)
        ).limit(0)
    shortlist = rerank or k
    cand = _matmul_shortlist_scan(
        corpus_q, corpus_id, codes_col, q_ids, Q.T, shortlist, schema
    )
    w = Window.partitionBy(query_id).orderBy(F.col("cosine").desc(), F.col(corpus_id).asc())
    short = (
        cand.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= shortlist)
        .select(query_id, corpus_id, "cosine", "rank")
    )
    if rerank is None or rerank_corpus is None:
        return short.filter(F.col("rank") <= k)
    # exact float rerank over the shortlist only
    qdf = short.sparkSession.createDataFrame(
        [(qid, [float(v) for v in Q[i]]) for i, qid in enumerate(q_ids)],
        f"{query_id} {qid_type}, _qv array<double>",
    )
    exact = (
        short.select(query_id, corpus_id)
        .join(rerank_corpus.select(corpus_id, F.col(vec_col).alias("_cv")), corpus_id)
        .join(F.broadcast(qdf), query_id)
        .withColumn("cosine", V.cosine_arrow(F.col("_qv"), F.col("_cv")))
    )
    return (
        exact.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(query_id, corpus_id, "cosine", "rank")
    )
