"""Build the ``--py-files`` artifact for cluster submission.

The north-star deployment shape is ``spark-submit --py-files
dist/pyradiomics_spark.zip job.py`` on a multi-executor cluster: the
package is pure Python (kernels are numpy inside Arrow UDFs), so one zip
on every executor's PYTHONPATH is the whole install — no wheels, no
native builds, no cluster-side pip.

Usage:
    python tools/make_pyfiles.py            # → dist/pyradiomics_spark.zip
    python tools/make_pyfiles.py /tmp/x.zip

The artifact is self-contained (stdlib + pyspark/pyarrow/pandas/numpy,
which spark-submit environments already carry); tests/test_packaging.py
proves a bare interpreter can import and configure the engine from the
zip alone, and that a live session accepts it via ``addPyFile``.
"""

from __future__ import annotations

import os
import sys
import zipfile


def build(out: str = "dist/pyradiomics_spark.zip") -> str:
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    out_path = out if os.path.isabs(out) else os.path.join(root, out)
    os.makedirs(os.path.dirname(out_path), exist_ok=True)
    pkg = os.path.join(root, "pyradiomics_spark")
    with zipfile.ZipFile(out_path, "w", zipfile.ZIP_DEFLATED) as z:
        for dirpath, dirnames, filenames in os.walk(pkg):
            dirnames[:] = [d for d in dirnames if d != "__pycache__"]
            for f in sorted(filenames):
                if f.endswith(".py"):
                    full = os.path.join(dirpath, f)
                    z.write(full, os.path.relpath(full, root))
    return out_path


if __name__ == "__main__":
    print(build(*sys.argv[1:]))
