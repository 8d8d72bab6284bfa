"""Session-scoped scratch directories (ADVICE r6 #2).

The lifecycle queries (q58/q59/q60/q64), streaming sinks/state
(st08/st14/st16, the chunk loader, applyInPandasWithState state dirs)
and the materialized ANN indexes (s11/s13/s19/s20) all need real
on-disk locations per invocation. A bare ``tempfile.mkdtemp`` per call
leaks: repeated gate/bench/probe runs accumulate unbounded table
copies under /tmp. Every scratch dir now lands under ONE per-process
root that an ``atexit`` hook removes after the JVM is gone — the same
scoped discipline ``scoped_persist`` applies to executor storage.

Dirs remain unique per invocation (``mkdtemp`` inside the root), so
concurrent queries in one process never collide, and a stable path
(the ANN index, keyed by fixture + applicationId) can opt into exit
cleanup via :func:`cleanup_at_exit` without becoming per-invocation.
"""

from __future__ import annotations

import atexit
import shutil
import tempfile

_SCRATCH_ROOT: str | None = None
_EXIT_PATHS: set[str] = set()


def scratch_dir(prefix: str) -> str:
    """A fresh private directory under the per-process scratch root.

    Equivalent to ``tempfile.mkdtemp(prefix=...)`` except the result
    is removed (recursively, errors ignored — Spark may hold late
    file handles on some platforms) when the process exits.
    """
    global _SCRATCH_ROOT
    if _SCRATCH_ROOT is None:
        _SCRATCH_ROOT = tempfile.mkdtemp(prefix="fsmr_scratch_")
        atexit.register(shutil.rmtree, _SCRATCH_ROOT, ignore_errors=True)
    return tempfile.mkdtemp(prefix=prefix, dir=_SCRATCH_ROOT)


def _remove_quietly(path: str) -> None:
    import os

    if os.path.isdir(path):
        shutil.rmtree(path, ignore_errors=True)
    else:
        try:
            os.remove(path)
        except OSError:
            pass


def cleanup_at_exit(path: str) -> str:
    """Register a STABLE path (one that must survive across
    invocations within the process, e.g. a materialized ANN index or
    the per-app package zip) for removal at process exit — dir or
    file. Idempotent per path."""
    if path not in _EXIT_PATHS:
        _EXIT_PATHS.add(path)
        atexit.register(_remove_quietly, path)
    return path
