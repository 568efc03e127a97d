"""Process-lifetime staged lake fixtures for queries whose PRODUCTION
premise is "this table already exists" (r7 verdict items #1 and #7).

Two registered query families measure incremental / maintained-index
cost: the archive-side MinHash signature+band index
(incremental_minhash_novelty_indexed) and the pre-staged corpus
snapshot the ExactSubstr rewrite commits onto
(excision_rewrite_incremental). In production those structures are
built once by ingest and AMORTIZED across every daily run; a benchmark
query that rebuilds them per call measures the bootstrap, not the
daily cost. This cache makes the amortization real inside one process:
the FIRST call per (fixture, sf_dir) builds the structure into a temp
directory; every later call — including bench repetitions 2..N, whose
MEDIAN is the recorded number — reads it as a pre-existing table. The
staging is therefore visible in rep 1 and excluded from the reported
median, which is exactly the production shape and is stated in each
query's docstring.

Keyed by (name, abspath(sf_dir)) so different scale factors never
share a fixture; cleaned up atexit. No cross-process sharing — the
driver, pytest, and bench each build their own copy.
"""

from __future__ import annotations

import atexit
import os
import shutil
import tempfile
import threading
from collections.abc import Callable

_STAGED: dict[tuple[str, str], str] = {}
# Concurrent first calls for the SAME fixture (test sweeps now overlap
# independent queries in a thread pool — guide §2.6) must not both
# build: per-key double-checked locking; distinct keys never contend.
_STAGED_LOCKS: dict[tuple[str, str], threading.Lock] = {}
_LOCKS_GUARD = threading.Lock()


def _cleanup() -> None:
    for d in _STAGED.values():
        shutil.rmtree(d, ignore_errors=True)


atexit.register(_cleanup)


def staged_dir(name: str, sf_dir: str, build: Callable[[str], None]) -> str:
    """Return the fixture directory for (name, sf_dir), building it
    with ``build(dir)`` on first use (thread-safe: one build per key).
    A failed build never caches."""
    key = (name, os.path.abspath(sf_dir))
    d = _STAGED.get(key)
    if d is not None and os.path.isdir(d):
        return d
    with _LOCKS_GUARD:
        lock = _STAGED_LOCKS.setdefault(key, threading.Lock())
    with lock:
        d = _STAGED.get(key)
        if d is not None and os.path.isdir(d):
            return d
        d = tempfile.mkdtemp(prefix=f"staged_{name}_")
        try:
            build(d)
        except BaseException:
            shutil.rmtree(d, ignore_errors=True)
            raise
        _STAGED[key] = d
        return d
