#!/usr/bin/env python
"""Build ``engine.zip`` for ``spark-submit --py-files engine.zip`` (E5 /
north rule: cluster launch packaging).

Zips the ``pagerank_barrierfree_openmp_dynamic_spark`` package (sources only,
no caches) so every executor can import the kernels; the job entrypoint
``jobs/run_pagerank.py`` ships separately as the primary file:

    python scripts/make_zip.py [out.zip]
    spark-submit --py-files engine.zip jobs/run_pagerank.py --pages ... --output ...
"""

from __future__ import annotations

import os
import sys
import zipfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
PKG = "pagerank_barrierfree_openmp_dynamic_spark"


def build(out_path: str) -> int:
    n = 0
    with zipfile.ZipFile(out_path, "w", zipfile.ZIP_DEFLATED) as zf:
        for root, dirs, files in os.walk(os.path.join(REPO, PKG)):
            dirs[:] = [d for d in dirs if d != "__pycache__"]
            for f in sorted(files):
                if not f.endswith(".py"):
                    continue
                full = os.path.join(root, f)
                zf.write(full, os.path.relpath(full, REPO))
                n += 1
    return n


if __name__ == "__main__":
    out = sys.argv[1] if len(sys.argv) > 1 else os.path.join(REPO, "engine.zip")
    n = build(out)
    print(f"{out}: {n} modules")
