"""Process-scoped scratch directories for queries that materialize
intermediate tables (snapshot tables, encrypted round-trips).

Every call still returns a FRESH directory — snapshot version counters
and overwrite semantics depend on starting empty — but all of them live
under one per-process root that is removed at interpreter exit, so
repeated invocations (bench runs each query 3x; the driver re-runs the
registry) cannot accumulate orphaned copies in /tmp across the run.
"""

from __future__ import annotations

import atexit
import shutil
import tempfile

_ROOT: str | None = None


def scratch_dir(prefix: str) -> str:
    """A fresh scratch directory under the process-scoped, exit-cleaned
    root. Drop-in replacement for ``tempfile.mkdtemp(prefix=...)``."""
    global _ROOT
    if _ROOT is None:
        _ROOT = tempfile.mkdtemp(prefix="pme_scratch_")
        atexit.register(shutil.rmtree, _ROOT, ignore_errors=True)
    return tempfile.mkdtemp(prefix=prefix, dir=_ROOT)
