"""Build the ``--py-files`` artifact for cluster submission.

The north rule's deployment path is ``spark-submit --py-files`` on a
multi-executor cluster: executors' Python workers must be able to import
``linkorgs_software_spark``, so the package ships as one zip. The same
artifact is what ``bench.py --scaling`` ships to its ``local-cluster``
executor JVMs via ``sc.addPyFile`` (the programmatic equivalent).

Usage:
    python tools/package_pyfiles.py [dest.zip]       # default /tmp/linkorgs_pkg.zip
    spark-submit --py-files /tmp/linkorgs_pkg.zip your_job.py
"""

from __future__ import annotations

import os
import sys
import zipfile

PKG = "linkorgs_software_spark"


def make_pyfiles_zip(dest: str | None = None) -> str:
    """Zip the package (py files only) for --py-files / addPyFile; returns path."""
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    dest = dest or os.path.join("/tmp", "linkorgs_pkg.zip")
    with zipfile.ZipFile(dest, "w") as zf:
        for dirpath, _dirs, files in os.walk(os.path.join(root, PKG)):
            for f in files:
                if f.endswith(".py"):
                    path = os.path.join(dirpath, f)
                    zf.write(path, os.path.relpath(path, root))
    return dest


if __name__ == "__main__":
    print(make_pyfiles_zip(sys.argv[1] if len(sys.argv) > 1 else None))
