"""End-to-end job coverage: dedup_pipeline with every opt-in stage on,
run twice against the same --output to pin the lineage resume contract
(second run must serve checkpoints, not recompute)."""

import json
import os
import sys

import pytest


@pytest.fixture()
def pipeline_env(spark, tmp_path):
    """documents + benchmark parquet at tiny scale."""
    src = "/root/testdata/sf0.001/documents.parquet"
    bench = str(tmp_path / "bench.parquet")
    spark.read.parquet(src).filter("doc_id % 29 = 0").select("doc_id", "text").write.parquet(bench)
    return src, bench, str(tmp_path / "work")


def _run(argv):
    sys.path.insert(0, "/root/repo/jobs")
    import importlib

    import dedup_pipeline

    importlib.reload(dedup_pipeline)
    old = sys.argv
    sys.argv = ["dedup_pipeline.py"] + argv
    try:
        dedup_pipeline.main()
    finally:
        sys.argv = old


def test_dedup_pipeline_all_stages_and_resume(pipeline_env, capsys, spark, monkeypatch):
    # the job ends with spark.stop(); getOrCreate hands it the shared test
    # session, so neutralize stop for the duration of the run
    monkeypatch.setattr(type(spark), "stop", lambda self: None)
    src, bench, out = pipeline_env
    argv = [
        "--input", src, "--output", out,
        "--line-dedup-min-docs", "5",
        "--max-dup-line-frac", "0.9",
        "--benchmark", bench, "--contamination-ngram", "3",
        "--sample-fractions", "src0=1.0,src1=1.0,src2=1.0,src3=0.5",
        "--pack-max-tokens", "1024",
    ]
    _run(argv)
    line1 = [l for l in capsys.readouterr().out.splitlines() if l.startswith("dedup_pipeline:")][-1]

    # every stage checkpoint has a manifest; the training-ready tail exists
    stages = ["s1_gated", "s2_exact", "s3_pairs", "s4_survivors", "s5_training_ready"]
    mtimes = {}
    for st in stages:
        mf = os.path.join(out, st, "_lineage.json")
        assert os.path.exists(mf), st
        mtimes[st] = os.path.getmtime(mf)
        json.load(open(mf))  # valid json

    # packed output carries the packing coordinates
    import duckdb

    cols = duckdb.sql(
        f"SELECT * FROM read_parquet('{out}/s5_training_ready/*.parquet') LIMIT 1"
    ).columns
    for c in ("seq_id", "seq_offset", "n_seqs", "shard"):
        assert c in cols

    # second run: identical params -> every checkpoint reused (manifest
    # untouched) and identical counts reported
    _run(argv)
    line2 = [l for l in capsys.readouterr().out.splitlines() if l.startswith("dedup_pipeline:")][-1]
    assert line1 == line2
    for st in stages:
        assert os.path.getmtime(os.path.join(out, st, "_lineage.json")) == mtimes[st], (
            f"{st} was rewritten on resume"
        )


def test_dedup_pipeline_param_change_recomputes(pipeline_env, spark, monkeypatch):
    monkeypatch.setattr(type(spark), "stop", lambda self: None)
    src, bench, out = pipeline_env
    base = ["--input", src, "--output", out]
    _run(base)
    m1 = os.path.getmtime(os.path.join(out, "s1_gated", "_lineage.json"))
    # changed parameter -> stage identity differs -> recompute, not reuse
    _run(base + ["--min-tokens", "7"])
    m2 = os.path.getmtime(os.path.join(out, "s1_gated", "_lineage.json"))
    assert m2 > m1


def test_dedup_pipeline_pack_with_custom_id_col(pipeline_env, spark, tmp_path, monkeypatch):
    """--pack-max-tokens with a non-default --id-col (review finding: the
    pack window used to order by the literal 'doc_id' and raise)."""
    monkeypatch.setattr(type(spark), "stop", lambda self: None)
    src, _, _ = pipeline_env
    renamed = str(tmp_path / "renamed.parquet")
    spark.read.parquet(src).withColumnRenamed("doc_id", "page_id").write.parquet(renamed)
    out = str(tmp_path / "work_idcol")
    _run([
        "--input", renamed, "--output", out,
        "--id-col", "page_id", "--pack-max-tokens", "1024",
    ])
    import duckdb

    cols = duckdb.sql(
        f"SELECT * FROM read_parquet('{out}/s5_training_ready/*.parquet') LIMIT 1"
    ).columns
    assert {"page_id", "seq_id", "seq_offset", "n_seqs"} <= set(cols)


def test_package_pyfiles_zip_imports(tmp_path):
    """The --py-files artifact must be importable standalone (what an
    executor does with it) and deterministic."""
    import hashlib
    import subprocess
    import sys as _sys

    sys.path.insert(0, "/root/repo/jobs")
    import package_pyfiles as PP

    z1 = str(tmp_path / "a.zip")
    z2 = str(tmp_path / "b.zip")
    n1 = PP.build(z1)
    n2 = PP.build(z2)
    assert n1 == n2 > 20
    h = lambda p: hashlib.sha256(open(p, "rb").read()).hexdigest()  # noqa: E731
    assert h(z1) == h(z2)  # reproducible artifact
    # import the package from the zip alone in a clean interpreter
    code = (
        "import sys; sys.path.insert(0, %r); "
        "import pygridmap_spark.functions.urls as U; "
        "import pygridmap_spark.operators.dedup; "
        "print(len(U.DEFAULT_SUFFIXES))" % z1
    )
    out = subprocess.run(
        [_sys.executable, "-c", code], capture_output=True, text=True,
        env={"PATH": os.environ.get("PATH", "")},
    )
    assert out.returncode == 0, out.stderr
    assert out.stdout.strip() == "14"


def test_pages_pipeline_geo_zone_stage(spark, tmp_path, monkeypatch):
    """pages_pipeline --geo-zones end-to-end: the per-zone rollup carries
    the fused geodesic statistics (area-true density, centroid label
    point) and the density column is exactly n_pages / area_km2 * 1e6."""
    import numpy as np
    import pandas as pd

    from pygridmap_spark.core import wkb as WKB

    monkeypatch.setattr(type(spark), "stop", lambda self: None)
    # two sizeable zones (bounding caps well under the quarter-sphere
    # fail-closed guard) inside the synthetic lat/lon range
    rings = [
        np.array([[-70.0, -30.0], [-5.0, -30.0], [-5.0, 30.0], [-70.0, 30.0]]),
        np.array([[10.0, -30.0], [75.0, -30.0], [75.0, 30.0], [10.0, 30.0]]),
    ]
    zdir = str(tmp_path / "zones")
    spark.createDataFrame(
        pd.DataFrame(
            {
                "poly_id": [0, 1],
                "wkb": [WKB.encode_multipolygon([[r]]) for r in rings],
            }
        )
    ).write.parquet(zdir)
    out = str(tmp_path / "pp")
    sys.path.insert(0, "/root/repo/jobs")
    import importlib

    import pages_pipeline

    importlib.reload(pages_pipeline)
    old = sys.argv
    sys.argv = [
        "pages_pipeline.py", "--synthetic", "4000", "--output", out,
        "--geo-zones", zdir, "--geo-level", "8",
    ]
    try:
        pages_pipeline.main()
    finally:
        sys.argv = old
    zs = spark.read.parquet(os.path.join(out, "stage_zone_stats")).toPandas()
    assert len(zs) == 2
    assert {
        "poly_id", "n_pages", "n_domains", "area_km2",
        "centroid_lon", "centroid_lat", "pages_per_mkm2",
    } <= set(zs.columns)
    # density is exactly the rollup divided by the exact geodesic area
    for _, r in zs.iterrows():
        assert r["n_pages"] > 0 and r["area_km2"] > 0
        # the PSL default "*" rule makes unlisted-TLD hosts registrable:
        # synthetic .example domains must COUNT, not collapse to NULL
        assert r["n_domains"] > 0
        assert r["pages_per_mkm2"] == pytest.approx(
            r["n_pages"] / r["area_km2"] * 1e6, rel=1e-12
        )
        # centroid label point lands inside the zone's lon/lat span
        lo = rings[int(r["poly_id"])][:, 0]
        assert lo.min() < r["centroid_lon"] < lo.max()
        assert -40.0 < r["centroid_lat"] < 40.0


def test_pages_pipeline_scrub_stage(spark, tmp_path, monkeypatch):
    """--scrub: PII stat columns + text_redacted persist through the
    stage_encoded checkpoint; the original text column is untouched."""
    monkeypatch.setattr(type(spark), "stop", lambda self: None)
    out = str(tmp_path / "pp_scrub")
    sys.path.insert(0, "/root/repo/jobs")
    import importlib

    import pages_pipeline

    importlib.reload(pages_pipeline)
    old = sys.argv
    sys.argv = [
        "pages_pipeline.py", "--synthetic", "3000", "--output", out,
        "--scrub",
    ]
    try:
        pages_pipeline.main()
    finally:
        sys.argv = old
    enc = spark.read.parquet(os.path.join(out, "stage_encoded"))
    assert {"n_emails", "n_ipv4", "n_phones", "has_pii", "text_redacted"} \
        <= set(enc.columns)
    from pygridmap_spark.sources import pages as P

    orig = P.pages(spark, 3000).select("url", "text")
    back = enc.select("url", "text")
    assert back.exceptAll(orig).count() == 0  # text byte-identical
