"""Per-process scratch root for operators that must materialize
intermediate files (sink round-trip queries, streaming availableNow
replay).

One ``mkdtemp`` per process, removed at interpreter exit, with a
unique numbered subdirectory per request — repeated correctness/bench
runs therefore clean up after themselves instead of accumulating
unbounded ``sparkgraft_*`` litter in $TMPDIR (round-5 advice).  The
subdirectory is unique per call because streaming checkpoints must
NEVER be reused across queries (a new query resuming a stale
checkpoint replays the wrong state), and because sink round-trip
queries are lazy — the returned DataFrame reads the path after the
builder returns, so a later build must not overwrite an earlier one.
"""

from __future__ import annotations

import atexit
import itertools
import os
import shutil
import tempfile

_root: str | None = None
_counter = itertools.count()


def scratch_dir(name: str) -> str:
    """A fresh, process-lifetime scratch directory ``<root>/<name>-<n>``."""
    global _root
    if _root is None:
        _root = tempfile.mkdtemp(prefix="sparkgraft_scratch_")
        atexit.register(shutil.rmtree, _root, ignore_errors=True)
    path = os.path.join(_root, f"{name}-{next(_counter)}")
    os.makedirs(path, exist_ok=True)
    return path
