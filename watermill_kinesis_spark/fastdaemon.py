"""Worker daemon entry point: the stock ``pyspark.daemon`` manager plus
a backport of CPython 3.12's zipimport cache-invalidation guard.

``pyspark.worker`` calls ``importlib.invalidate_caches()`` once per task
(inside ``setup_spark_files``) so that files shipped with ``addPyFile``
become importable. On CPython 3.11, ``zipimport.zipimporter
.invalidate_caches`` re-parses the archive's ENTIRE central directory
unconditionally; Spark puts two zips (pyspark.zip, py4j.zip) on every
worker's ``sys.path``, so each Python task pays a full re-parse of both
— measured ~115-150 ms of fixed latency per task on this machine,
independent of task size (profiled via worker-side step timing: the
whole per-task overhead of a trivial warm mapInPandas pass was
``setup_spark_files``, and inside it 100% ``importlib
.invalidate_caches``). CPython 3.12+ re-reads the directory only when
the archive changed; this wrapper adds the same guard — stat the
archive and skip the re-read while ``(mtime_ns, size)`` are unchanged —
so a task pays two ``stat()`` calls instead of two directory parses.
Pure fast-path backport: a genuinely modified archive still invalidates
exactly as before, and non-zip path entries are untouched.

Activated by ``spark.python.daemon.module`` (see ``session.get_spark``);
the daemon primes the stamps once at boot so even a freshly forked
worker's first task takes the fast path, then hands off to the stock
manager loop.
"""

from __future__ import annotations

import os
import zipimport

_orig_invalidate = zipimport.zipimporter.invalidate_caches


def _invalidate_caches_if_changed(self):
    try:
        st = os.stat(self.archive)
        stamp = (st.st_mtime_ns, st.st_size)
    except OSError:
        stamp = None
    if stamp is not None and getattr(self, "_wm_zip_stamp", None) == stamp:
        return
    _orig_invalidate(self)
    self._wm_zip_stamp = stamp


def install() -> None:
    """Idempotently install the guard on ``zipimport.zipimporter``."""
    if zipimport.zipimporter.invalidate_caches is not _invalidate_caches_if_changed:
        zipimport.zipimporter.invalidate_caches = _invalidate_caches_if_changed


install()


if __name__ == "__main__":
    import importlib

    from pyspark.daemon import manager

    # prime: populate every live zipimporter's directory cache and
    # stamp under the guard, in the daemon, BEFORE any worker forks —
    # forked workers inherit the stamped importers, so their first
    # task already skips the re-parse
    importlib.invalidate_caches()
    manager()
