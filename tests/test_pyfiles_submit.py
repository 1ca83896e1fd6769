"""spark-submit --py-files packaging (north rule: "run under
spark-submit --py-files on N and 4N executors").

The deliverable artifact is dist/gocrawl_spark.zip
(tools/make_pyfiles.py). This test proves the zip is COMPLETE and
self-contained: the same deterministic crawl digest must come out of

  (a) a plain repo-path run, and
  (b) spark-submit --py-files <zip> from a directory where the
      package is NOT importable from disk — every module resolves
      from the zip on the driver and the executors.
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _digest_direct() -> dict:
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "crawl_once.py"), "4"],
        capture_output=True, text=True, check=True, timeout=600,
    )
    return json.loads(out.stdout.strip().splitlines()[-1])


def _digest_pyfiles(zip_path: str) -> dict:
    stage = tempfile.mkdtemp(prefix="pyfiles_")
    script = os.path.join(stage, "crawl_once.py")
    shutil.copy(os.path.join(REPO, "tools", "crawl_once.py"), script)
    env = {
        k: v for k, v in os.environ.items() if k != "PYTHONPATH"
    }
    out = subprocess.run(
        [
            "spark-submit",
            "--master", "local[4]",
            "--conf", "spark.ui.enabled=false",
            "--py-files", zip_path,
            script, "4",
        ],
        capture_output=True, text=True, check=True, timeout=600,
        cwd=stage, env=env,
    )
    shutil.rmtree(stage, ignore_errors=True)
    return json.loads(out.stdout.strip().splitlines()[-1])


def test_pyfiles_zip_is_complete_and_equivalent():
    zip_path = os.path.join(REPO, "dist", "gocrawl_spark.zip")
    subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "make_pyfiles.py")],
        check=True, timeout=120,
    )
    a = _digest_direct()
    b = _digest_pyfiles(zip_path)
    assert a["seen_digest"] == b["seen_digest"]
    assert a["articles_digest"] == b["articles_digest"]
    assert a["pages_digest"] == b["pages_digest"]
    assert a["rounds"] == b["rounds"]
    assert a["n_seen"] == b["n_seen"] > 0
