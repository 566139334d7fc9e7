"""Session-scoped materialization of write-once physical layouts.

Several operators build a physical layout once and query it many
times: the margin (neighbor-cache) tables in 1-D time / 2-D plane /
sphere geometry [lsd:src/lsd/table.py neighbor-cache machinery —
UNVERIFIED], the pre-computed xmatch mapping
[lsd:src/lsd/join_ops.py — UNVERIFIED], and the FITS import fixture.
Before round 4 each kept its own module-global ``{(session, sf_dir):
path}`` dict; the round-3 ADVICE flagged the consequences: the
tempdirs were never cleaned, the caches were NOT invalidated by
``registry.clear_plan_cache`` (a changed table at the same sf_dir
could serve a stale layout), and the dicts were not thread-safe.

This module is the single replacement:

- ``materialized(spark, kind, sf_dir, build_fn)`` — one build per
  (session-uuid, sf_dir, kind), guarded by a lock; concurrent
  builders race benignly (both write identical content to distinct
  tempdirs; first registration wins, the loser's dir is removed at
  clear time).
- ``clear_materialized()`` — drops every cache entry AND removes
  every tempdir. ``registry.clear_plan_cache`` calls it, so the one
  documented invalidation point now covers physical layouts too;
  it also runs at interpreter exit (atexit).

At 100 TB the "cache" is of course a real warehouse path (the layout
IS the table); this machinery only stands in for that registry at
test scale.
"""

from __future__ import annotations

import atexit
import shutil
import tempfile
import threading
from typing import Callable

from lsd_spark.catalog import session_key

_CACHE: dict[tuple[str, str, str], str] = {}
_TMPDIRS: set[str] = set()
_LOCK = threading.RLock()


def materialized(
    spark,
    kind: str,
    sf_dir: str,
    build_fn: Callable[[str], str],
    prefix: str = "lsd_mat_",
) -> str:
    """Return the path of layout `kind` for (session, sf_dir),
    building it exactly once per session. ``build_fn(tmpdir)``
    receives a fresh private tempdir and returns the path it wrote
    (typically ``tmpdir + "/<name>"``)."""
    key = (session_key(spark), sf_dir, kind)
    with _LOCK:
        path = _CACHE.get(key)
    if path is not None:
        return path
    base = tempfile.mkdtemp(prefix=prefix)
    path = build_fn(base)  # runs Spark jobs: outside the lock
    with _LOCK:
        winner = _CACHE.setdefault(key, path)
        _TMPDIRS.add(base)
    return winner


def clear_materialized() -> None:
    """Invalidate every materialized layout and remove its files.
    Called by ``lsd_spark.registry.clear_plan_cache`` and atexit."""
    with _LOCK:
        _CACHE.clear()
        for d in _TMPDIRS:
            shutil.rmtree(d, ignore_errors=True)
        _TMPDIRS.clear()


atexit.register(clear_materialized)
