"""North-rule packaging: the crawl job must run via ``spark-submit
--py-files`` (BASELINE.json north_rule: "run via spark-submit --py-files
on a multi-executor cluster").

This test executes the REAL deployment shape end-to-end in the sandbox:
``tools/build_pyfiles.py`` packages the library, the entry script is
copied to a neutral directory (so its repo-relative ``sys.path`` insert
points away from the repo and the package can only come from the zip),
and ``spark-submit --master local[4] --py-files dist/ldcc_spark.zip``
runs one committed crawl round against sf0.001 testdata.
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import zipfile

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SPARK_SUBMIT = shutil.which(
    "spark-submit", path=os.environ.get("PATH", "") + os.pathsep + "/opt/spark/bin"
)


def test_pyfiles_zip_contents(tmp_path):
    """The zip places the package at the archive root (importable once
    Spark adds it to sys.path) and ships no bytecode."""
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "build_pyfiles.py")],
        capture_output=True, text=True, cwd=REPO, check=True,
    ).stdout.strip()
    with zipfile.ZipFile(out) as zf:
        names = zf.namelist()
    assert "language_diversity_common_crawler_spark/__init__.py" in names
    assert "language_diversity_common_crawler_spark/frontier/crawl.py" in names
    assert all(n.endswith(".py") for n in names)
    assert all(not n.startswith("tools/") and not n.startswith("tests/")
               for n in names)


@pytest.mark.skipif(SPARK_SUBMIT is None, reason="spark-submit not on PATH")
def test_spark_submit_pyfiles_end_to_end(tmp_path):
    """One committed crawl round through real spark-submit --py-files,
    with the package importable ONLY from the zip."""
    zip_path = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "build_pyfiles.py")],
        capture_output=True, text=True, cwd=REPO, check=True,
    ).stdout.strip()
    # neutral cwd + copied script: submit_crawl.py's sys.path insert
    # resolves to tmp_path's parent, never the repo root
    script = tmp_path / "submit_crawl.py"
    shutil.copy(os.path.join(REPO, "tools", "submit_crawl.py"), script)
    ckpt = tmp_path / "ckpt"
    env = dict(os.environ,
               SPARK_GRAFT_SF_DIR="/root/testdata/sf0.001",
               SPARK_GRAFT_CPUS="4")
    # PYTHONPATH could leak the repo package to the driver; strip it so
    # the only import source is the --py-files zip
    env.pop("PYTHONPATH", None)
    proc = subprocess.run(
        [SPARK_SUBMIT, "--master", "local[4]",
         "--py-files", zip_path,
         str(script), "--local", "--rounds", "1", "--budget", "3",
         "--ckpt", str(ckpt)],
        capture_output=True, text=True, cwd=tmp_path, timeout=420, env=env,
    )
    assert proc.returncode == 0, proc.stderr[-4000:]
    assert "round 1: scheduled=" in proc.stdout
    with open(ckpt / "MANIFEST-0001.json") as f:
        man = json.load(f)
    assert man["round"] == 1
    assert man["n_scheduled"] > 0
