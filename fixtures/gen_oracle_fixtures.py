#!/usr/bin/env python
"""Oracle fixtures for the xxhash64-free twins of the LSH dedup operators.

DuckDB has no crc32/splitmix64, so the per-doc signature kernels
(minhash_signatures, simhash) cannot be expressed in oracle SQL. This
script re-derives the signatures with an INDEPENDENT implementation (plain
per-doc loops over DuckDB-fetched text — not the engine's flat
reduceat-batch kernels) and writes them to parquet; the oracle SQL then
performs the ENTIRE downstream pipeline — banding / pigeonhole blocking,
candidate self-join, exact Jaccard / Hamming verification, thresholding —
in DuckDB from these per-doc signatures. What stays un-oracled is exactly
the hash arithmetic itself, which the bijection/estimator property tests
pin in pytest.

Fixture rows are keyed by (doc_id, md5(text)): the documents table differs
per scale factor, and the md5 join makes the oracle self-select the rows
for whatever SF the driver mounted (no rows match -> loud row-count
mismatch, never a silent pass).

Deterministic; regenerate with `python fixtures/gen_oracle_fixtures.py`.
"""
from __future__ import annotations

import hashlib
import os
import re
import zlib

import duckdb
import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

M64 = (1 << 64) - 1
SFS = ("0.001", "0.01", "0.1")
OUT_DIR = os.path.dirname(os.path.abspath(__file__))


def splitmix64_u64(h: np.ndarray) -> np.ndarray:
    h = (h.astype(np.uint64) + np.uint64(0x9E3779B97F4A7C15)) & np.uint64(M64)
    h = (h ^ (h >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
    h = (h ^ (h >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
    return h ^ (h >> np.uint64(31))


def mh_seeds(k: int) -> np.ndarray:
    state = 0x9E3779B97F4A7C15
    out = np.empty(k, dtype=np.uint64)
    for i in range(k):
        state = (state * 6364136223846793005 + 1442695040888963407) & M64
        out[i] = state
    return out


_NORM = re.compile(r"[^a-z0-9]+")
_POS_MULT = [
    np.uint64(((0x9E3779B97F4A7C15 * (2 * j + 1)) | 1) & M64) for j in range(3)
]
_SEEDS = mh_seeds(64)


def minhash_doc(text: str):
    """(signature int64[64], shingles int64[...]) or None when < 3 tokens."""
    toks = _NORM.sub(" ", text.lower()).split()
    n_sh = len(toks) - 2
    if n_sh < 1:
        return None
    th = np.fromiter((zlib.crc32(t.encode("utf-8")) for t in toks), dtype=np.uint64)
    acc = th[:n_sh] * _POS_MULT[0]
    for j in (1, 2):
        acc = acc ^ (th[j : j + n_sh] * _POS_MULT[j])
    shingles = np.unique(splitmix64_u64(acc))
    sig = np.empty(64, dtype=np.uint64)
    for i in range(64):
        sig[i] = splitmix64_u64(shingles ^ _SEEDS[i]).min()
    return sig.astype(np.int64), shingles.astype(np.int64)


def simhash_doc(text: str) -> int:
    """Unsigned 64-bit simhash (lower().split() tokens, crc32+splitmix64,
    per-bit majority) as a Python int."""
    toks = text.lower().split()
    if not toks:
        return 0
    h = splitmix64_u64(
        np.fromiter((zlib.crc32(t.encode("utf-8")) for t in toks), dtype=np.uint64)
    )
    sim = 0
    n = len(toks)
    for b in range(64):
        ones = int(((h >> np.uint64(b)) & np.uint64(1)).sum())
        if 2 * ones > n:
            sim |= 1 << b
    return sim


def to_i64(u: int) -> int:
    return u - (1 << 64) if u >= (1 << 63) else u


def hyperplane_sigs(con, sf: str, planes: int = 10, seed: int = 42):
    """(vec_id, emb_md5, signature) rows — independent twin of
    similarity.with_hyperplane_signature (same seeded-numpy planes by
    contract; the md5 key is computed IN DuckDB over the same
    CAST(embedding AS VARCHAR) rendering the oracle join uses)."""
    rows = con.execute(
        f"""SELECT vec_id, md5(CAST(embedding AS VARCHAR)) AS emb_md5, embedding
            FROM read_parquet('/root/testdata/sf{sf}/embeddings.parquet')
            WHERE embedding IS NOT NULL ORDER BY vec_id"""
    ).fetchall()
    X = np.array([r[2] for r in rows], dtype=np.float64)
    rng = np.random.default_rng(seed)
    planes_t = rng.standard_normal((planes, X.shape[1])).T
    bits = (X @ planes_t) >= 0
    weights = (1 << np.arange(planes, dtype=np.uint64)).astype(np.uint64)
    sigs = (bits.astype(np.uint64) * weights).sum(axis=1).astype(np.int64)
    return [(r[0], r[1], int(s)) for r, s in zip(rows, sigs)]


def main() -> None:
    con = duckdb.connect()
    mh_rows = {k: [] for k in ("sf", "doc_id", "text_md5", "is_mutated", "signature", "shingles")}
    sh_rows = {k: [] for k in ("sf", "doc_id", "text_md5", "simhash", "c0", "c1", "c2", "c3")}
    hp_rows = {k: [] for k in ("sf", "vec_id", "emb_md5", "signature")}
    seen_keys = set()
    seen_emb_keys = set()
    for sf in SFS:
        docs = con.execute(
            f"SELECT doc_id, text FROM read_parquet('/root/testdata/sf{sf}/documents.parquet') ORDER BY doc_id"
        ).fetchall()
        for doc_id, text in docs:
            md5 = hashlib.md5(text.encode("utf-8")).hexdigest()
            key = (doc_id, md5)
            # the md5 join must be unambiguous across SFs
            assert key not in seen_keys, f"duplicate fixture key {key}"
            seen_keys.add(key)
            # --- minhash (base + the driver query's %7 mutated twin) ---
            for out_id, t, mut in [(doc_id, text, 0)] + (
                [(doc_id + 1_000_000, text + " tail", 1)] if doc_id % 7 == 0 else []
            ):
                mh = minhash_doc(t)
                if mh is None:
                    continue
                sig, sh = mh
                mh_rows["sf"].append(sf)
                mh_rows["doc_id"].append(out_id)
                mh_rows["text_md5"].append(md5)
                mh_rows["is_mutated"].append(mut)
                mh_rows["signature"].append(sig.tolist())
                mh_rows["shingles"].append(sh.tolist())
            # --- simhash (dupes share the text; oracle derives them) ---
            u = simhash_doc(text)
            sh_rows["sf"].append(sf)
            sh_rows["doc_id"].append(doc_id)
            sh_rows["text_md5"].append(md5)
            sh_rows["simhash"].append(to_i64(u))
            for i in range(4):
                sh_rows[f"c{i}"].append((u >> (16 * i)) & 0xFFFF)
        for vec_id, emb_md5, sig in hyperplane_sigs(con, sf):
            key = (vec_id, emb_md5)
            assert key not in seen_emb_keys, f"duplicate embedding fixture key {key}"
            seen_emb_keys.add(key)
            hp_rows["sf"].append(sf)
            hp_rows["vec_id"].append(vec_id)
            hp_rows["emb_md5"].append(emb_md5)
            hp_rows["signature"].append(sig)
        print(f"sf{sf}: {len(docs)} docs")

    mh_table = pa.table(
        {
            "sf": pa.array(mh_rows["sf"], pa.string()),
            "doc_id": pa.array(mh_rows["doc_id"], pa.int64()),
            "text_md5": pa.array(mh_rows["text_md5"], pa.string()),
            "is_mutated": pa.array(mh_rows["is_mutated"], pa.int32()),
            "signature": pa.array(mh_rows["signature"], pa.list_(pa.int64())),
            "shingles": pa.array(mh_rows["shingles"], pa.list_(pa.int64())),
        }
    )
    pq.write_table(mh_table, os.path.join(OUT_DIR, "minhash_docs.parquet"))
    sh_table = pa.table(
        {
            "sf": pa.array(sh_rows["sf"], pa.string()),
            "doc_id": pa.array(sh_rows["doc_id"], pa.int64()),
            "text_md5": pa.array(sh_rows["text_md5"], pa.string()),
            "simhash": pa.array(sh_rows["simhash"], pa.int64()),
            **{f"c{i}": pa.array(sh_rows[f"c{i}"], pa.int64()) for i in range(4)},
        }
    )
    pq.write_table(sh_table, os.path.join(OUT_DIR, "simhash_docs.parquet"))
    hp_table = pa.table(
        {
            "sf": pa.array(hp_rows["sf"], pa.string()),
            "vec_id": pa.array(hp_rows["vec_id"], pa.int64()),
            "emb_md5": pa.array(hp_rows["emb_md5"], pa.string()),
            "signature": pa.array(hp_rows["signature"], pa.int64()),
        }
    )
    pq.write_table(hp_table, os.path.join(OUT_DIR, "hyperplane_sigs.parquet"))
    print(
        "wrote", len(mh_rows["doc_id"]), "minhash rows,",
        len(sh_rows["doc_id"]), "simhash rows,",
        len(hp_rows["vec_id"]), "hyperplane rows",
    )


if __name__ == "__main__":
    main()
