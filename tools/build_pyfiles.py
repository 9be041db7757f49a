#!/usr/bin/env python3
"""Package the library for ``spark-submit --py-files`` (north rule).

Produces ``dist/ldcc_spark.zip`` containing the
``language_diversity_common_crawler_spark`` package at the archive root, so
executors can import it after Spark places the zip on sys.path.
"""

from __future__ import annotations

import os
import zipfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
PKG = "language_diversity_common_crawler_spark"
OUT = os.path.join(REPO, "dist", "ldcc_spark.zip")


def main() -> str:
    os.makedirs(os.path.dirname(OUT), exist_ok=True)
    with zipfile.ZipFile(OUT, "w", zipfile.ZIP_DEFLATED) as zf:
        for root, _dirs, files in os.walk(os.path.join(REPO, PKG)):
            if "__pycache__" in root:
                continue
            for f in sorted(files):
                if not f.endswith(".py"):
                    continue
                full = os.path.join(root, f)
                zf.write(full, os.path.relpath(full, REPO))
    print(OUT)
    return OUT


if __name__ == "__main__":
    main()
