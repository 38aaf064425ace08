"""Session-scoped scratch directories for query-internal materializations.

Queries that must materialize an intermediate table (MERGE snapshots,
streaming sink output) previously created a per-call tempdir and deleted it
in ``finally`` — which forced an eager ``collect()`` round-trip through the
driver to keep the result alive past cleanup. At scale that is the exact
anti-pattern this engine bans (driver materialization of distributed data).

``scratch_dir`` hands out directories under one process-lifetime root that
is removed at interpreter exit, so queries can return a *lazy*
``spark.read.parquet`` over their materialized output: no driver round-trip
at any scale, and the data outlives the query call for the harness to
consume.
"""

from __future__ import annotations

import atexit
import shutil
import tempfile

_ROOT: str | None = None


def scratch_dir(prefix: str) -> str:
    """A fresh directory that lives until process exit."""
    global _ROOT
    if _ROOT is None:
        _ROOT = tempfile.mkdtemp(prefix="dep_spark_scratch_")
        atexit.register(shutil.rmtree, _ROOT, ignore_errors=True)
    return tempfile.mkdtemp(prefix=prefix, dir=_ROOT)
