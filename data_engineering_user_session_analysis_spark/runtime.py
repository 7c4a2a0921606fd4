"""Worker-side import bootstrap.

Operators that ship Python closures to executors (mapInPandas /
pandas UDFs) reference module-level helpers, so the Python *workers*
must be able to import this package.  The driver process's
``sys.path`` does not propagate to workers; the portable mechanism —
local mode and real clusters alike — is ``SparkContext.addPyFile``
with a zip of the package, which Spark distributes and prepends to
every worker's ``sys.path``.
"""

from __future__ import annotations

import os
import tempfile
import zipfile

_SHIPPED: set[int] = set()


def materialize(df, eager: bool = True):
    """Materialize an intermediate DataFrame, cutting its lineage.

    Default (no checkpoint dir configured): ``localCheckpoint`` —
    blocks live on the executors, released by the ContextCleaner when
    the reference dies.  That is the right call in local mode and for
    short-lived intra-query intermediates, but it SEVERS LINEAGE
    without durability: on a real cluster, losing an executor after
    the checkpoint kills the job instead of recomputing, and the
    blocks pin executor storage for as long as the reference lives.

    Escape hatch for cluster reality: when the session has a
    checkpoint directory configured (``SparkContext.setCheckpointDir``
    — reliable storage, e.g. HDFS/object store), the same call sites
    transparently use reliable ``DataFrame.checkpoint`` instead, which
    survives executor loss at the cost of a write to that directory.
    The choice is the deployment's, made once at session setup, not
    per call site.
    """
    if df.sparkSession.sparkContext.getCheckpointDir() is not None:
        return df.checkpoint(eager=eager)
    return df.localCheckpoint(eager=eager)


def ensure_worker_imports(spark) -> None:
    """Idempotently ship this package to the session's Python workers."""
    key = id(spark)
    if key in _SHIPPED:
        return
    pkg_dir = os.path.dirname(os.path.abspath(__file__))
    pkg_name = os.path.basename(pkg_dir)
    zip_path = os.path.join(
        tempfile.gettempdir(), f"{pkg_name}-{os.getpid()}.zip"
    )
    if not os.path.exists(zip_path):
        with zipfile.ZipFile(zip_path, "w") as zf:
            for root, _dirs, files in os.walk(pkg_dir):
                for fn in files:
                    if fn.endswith(".py"):
                        full = os.path.join(root, fn)
                        rel = os.path.join(
                            pkg_name, os.path.relpath(full, pkg_dir)
                        )
                        zf.write(full, rel)
    spark.sparkContext.addPyFile(zip_path)
    _SHIPPED.add(key)
