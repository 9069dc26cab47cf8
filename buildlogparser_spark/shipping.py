"""Ship the package to executor Python workers.

Stateless operators are pure JVM expressions and need nothing. The stateful
operators (``applyInPandas``) pickle rule objects by reference, so executor
Python workers must be able to ``import buildlogparser_spark`` — true under
``spark-submit --py-files buildlogparser_spark.zip`` on a cluster, but not
for an ad-hoc driver session started from another cwd. ``ensure_shipped``
makes any session self-sufficient: zip the package once and ``addPyFile`` it.
"""

from __future__ import annotations

import os
import tempfile
import zipfile

from pyspark.sql import SparkSession

_SHIPPED_SESSIONS: set[int] = set()


def package_zip(dest_dir: str | None = None) -> str:
    """Build buildlogparser_spark.zip (also used for spark-submit --py-files)."""
    pkg_dir = os.path.dirname(os.path.abspath(__file__))
    root = os.path.dirname(pkg_dir)
    dest_dir = dest_dir or tempfile.gettempdir()
    zip_path = os.path.join(dest_dir, "buildlogparser_spark.zip")
    with zipfile.ZipFile(zip_path, "w", zipfile.ZIP_DEFLATED) as zf:
        for dirpath, _dirnames, filenames in os.walk(pkg_dir):
            if "__pycache__" in dirpath:
                continue
            for fn in filenames:
                if fn.endswith(".py"):
                    full = os.path.join(dirpath, fn)
                    zf.write(full, os.path.relpath(full, root))
    return zip_path


def ensure_shipped(spark: SparkSession) -> None:
    key = id(spark)
    if key in _SHIPPED_SESSIONS:
        return
    spark.sparkContext.addPyFile(package_zip())
    _SHIPPED_SESSIONS.add(key)
