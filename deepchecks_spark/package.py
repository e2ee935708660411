"""Build the --py-files artifact: zips the package so a cluster job runs

    spark-submit --py-files dist/deepchecks_spark.zip job.py

(the north rule's packaging requirement). Usage:
    python -m deepchecks_spark.package [dist_dir]
"""

from __future__ import annotations

import os
import sys
import zipfile


def build_zip(dist_dir: str = "dist") -> str:
    pkg_root = os.path.dirname(os.path.abspath(__file__))
    repo_root = os.path.dirname(pkg_root)
    os.makedirs(os.path.join(repo_root, dist_dir), exist_ok=True)
    out = os.path.join(repo_root, dist_dir, "deepchecks_spark.zip")
    with zipfile.ZipFile(out, "w", zipfile.ZIP_DEFLATED) as zf:
        for root, _, files in os.walk(pkg_root):
            if "__pycache__" in root:
                continue
            for f in sorted(files):
                if not f.endswith(".py"):
                    continue
                p = os.path.join(root, f)
                arc = os.path.join("deepchecks_spark", os.path.relpath(p, pkg_root))
                zf.write(p, arc)
    return out


if __name__ == "__main__":
    print(build_zip(sys.argv[1] if len(sys.argv) > 1 else "dist"))
