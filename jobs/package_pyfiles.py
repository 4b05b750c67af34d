#!/usr/bin/env python
"""Build the --py-files artifact for cluster submission:

    python jobs/package_pyfiles.py [out.zip]
    spark-submit --py-files pygridmap_spark.zip jobs/dedup_pipeline.py ...

Plain stdlib zip of the package source (sources only — no tests, no
caches); executors unpack it onto sys.path. Deterministic: entries are
sorted and timestamps zeroed, so the artifact hash is reproducible for
lineage/identity checks.
"""

from __future__ import annotations

import os
import sys
import zipfile

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
PKG = "pygridmap_spark"


def build(out_path: str) -> int:
    n = 0
    with zipfile.ZipFile(out_path, "w", zipfile.ZIP_DEFLATED) as zf:
        for dirpath, dirnames, filenames in sorted(os.walk(os.path.join(ROOT, PKG))):
            dirnames[:] = sorted(d for d in dirnames if d != "__pycache__")
            for fn in sorted(filenames):
                if not fn.endswith(".py"):
                    continue
                full = os.path.join(dirpath, fn)
                arc = os.path.relpath(full, ROOT)
                info = zipfile.ZipInfo(arc, date_time=(1980, 1, 1, 0, 0, 0))
                info.compress_type = zipfile.ZIP_DEFLATED
                with open(full, "rb") as fh:
                    zf.writestr(info, fh.read())
                n += 1
    return n


if __name__ == "__main__":
    out = sys.argv[1] if len(sys.argv) > 1 else os.path.join(ROOT, f"{PKG}.zip")
    n = build(out)
    print(f"{out}: {n} files")
