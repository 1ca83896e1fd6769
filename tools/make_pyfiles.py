"""Package the engine for cluster submission (north rule: "run under
spark-submit --py-files on N and 4N executors").

    python tools/make_pyfiles.py            # → dist/gocrawl_spark.zip
    spark-submit --master <cluster> \\
        --py-files dist/gocrawl_spark.zip \\
        tools/crawl_once.py 8 /path/to/sf_dir

The zip carries the pure-Python package only (no binary deps beyond
the cluster's pyspark/pandas/pyarrow); executors import it from the
shipped archive, so no code needs to pre-exist on the workers.
"""

from __future__ import annotations

import os
import sys
import zipfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main() -> str:
    dist = os.path.join(REPO, "dist")
    os.makedirs(dist, exist_ok=True)
    out = os.path.join(dist, "gocrawl_spark.zip")
    pkg = os.path.join(REPO, "gocrawl_spark")
    with zipfile.ZipFile(out, "w", zipfile.ZIP_DEFLATED) as z:
        for root, _dirs, files in os.walk(pkg):
            if "__pycache__" in root:
                continue
            for f in sorted(files):
                if not f.endswith(".py"):
                    continue
                full = os.path.join(root, f)
                z.write(full, os.path.relpath(full, REPO))
    print(out)
    return out


if __name__ == "__main__":
    main()
    sys.exit(0)
