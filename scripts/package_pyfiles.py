"""Build the --py-files zip of geo_polygonize_spark.

Usage: python scripts/package_pyfiles.py [dist/geo_polygonize_spark.zip]

The zip contains the package sources only (no tests, no bytecode) and
is what ``spark-submit --py-files`` ships to the driver and executors;
scripts/submit_pipeline.py is the matching application entrypoint.
"""

from __future__ import annotations

import os
import sys
import zipfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
PKG = os.path.join(REPO, "geo_polygonize_spark")


def build(out_path: str) -> str:
    os.makedirs(os.path.dirname(os.path.abspath(out_path)) or ".", exist_ok=True)
    with zipfile.ZipFile(out_path, "w", zipfile.ZIP_DEFLATED) as zf:
        for root, dirs, files in os.walk(PKG):
            dirs[:] = [d for d in dirs if d != "__pycache__"]
            for fn in sorted(files):
                if not fn.endswith(".py"):
                    continue
                full = os.path.join(root, fn)
                rel = os.path.relpath(full, REPO)
                zf.write(full, rel)
    return out_path


if __name__ == "__main__":
    out = sys.argv[1] if len(sys.argv) > 1 else os.path.join(
        REPO, "dist", "geo_polygonize_spark.zip"
    )
    print(build(out))
