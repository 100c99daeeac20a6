"""Worker-side packaging (verdict r12 item 4 / What's-missing #4).

The engine's Arrow-batched operators (``pandas_udf`` / ``mapInPandas``
/ ``applyInPandas`` closures in isoforest scoring, multimodal decode,
GEMM cell assignment, ...) reference this package from code that runs
in the PYTHON WORKERS, so the package must be importable there — not
just in the driver process. Running the driver from the repo root makes
that true by accident (the workers inherit the CWD on local mode); from
any other working directory the first Arrow batch dies with
``ModuleNotFoundError`` in the worker.

``ship_package(spark)`` closes that gap the standard Spark way: build a
zip of the package's source tree (stdlib ``zipfile`` — no pip, no
build backend needed at runtime; ``pyproject.toml`` exists for a real
wheel when a deployment wants one) and register it with
``SparkContext.addPyFile``, which distributes it to every executor and
prepends it to the workers' ``sys.path``. On a real cluster the same
call ships the code to every executor's work dir; the equivalent
spark-submit spelling is ``--py-files dist/<pkg>.zip``.

The zip is built under ``<repo>/.build/`` and refreshed only when a
packaged source file is newer than the existing archive; ``addPyFile``
runs once per SparkContext (re-adding the same path is at best a noisy
warning). Both entry surfaces (``__spark_entry__``, ``bench.py``) call
``ship_package`` so the driver contract holds from ANY working
directory.
"""

from __future__ import annotations

import os
import zipfile

_PKG_DIR = os.path.dirname(os.path.abspath(__file__))
_PKG_NAME = os.path.basename(_PKG_DIR)
_SHIPPED_ATTR = "_aspes_pkg_shipped"


def package_zip() -> str:
    """Build (or refresh) the importable package zip and return its
    path. Pure stdlib: walks the package tree, writes every ``.py``
    under its package-relative arcname (so the zip root IS the import
    root), atomically replaces the previous archive. Skipped when the
    existing zip is newer than every source file."""
    build_dir = os.path.join(os.path.dirname(_PKG_DIR), ".build")
    os.makedirs(build_dir, exist_ok=True)
    out = os.path.join(build_dir, f"{_PKG_NAME}.zip")

    sources: list[tuple[str, str]] = []
    for root, dirs, files in os.walk(_PKG_DIR):
        dirs[:] = [d for d in dirs if d != "__pycache__"]
        for f in sorted(files):
            if f.endswith(".py"):
                full = os.path.join(root, f)
                rel = os.path.relpath(full, os.path.dirname(_PKG_DIR))
                sources.append((full, rel))
    if os.path.exists(out):
        newest = max(os.path.getmtime(f) for f, _ in sources)
        if os.path.getmtime(out) >= newest:
            return out
    tmp = f"{out}.tmp"
    with zipfile.ZipFile(tmp, "w", zipfile.ZIP_DEFLATED) as zf:
        for full, rel in sources:
            zf.write(full, rel)
    os.replace(tmp, out)
    return out


def ship_package(spark) -> None:
    """Register the package zip with the session's SparkContext (once
    per context) so worker-side UDF closures can import it regardless
    of the driver's working directory."""
    sc = spark.sparkContext
    if getattr(sc, _SHIPPED_ATTR, False):
        return
    sc.addPyFile(package_zip())
    setattr(sc, _SHIPPED_ATTR, True)
