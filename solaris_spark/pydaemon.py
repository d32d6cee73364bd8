"""Custom PySpark worker daemon (``spark.python.daemon.module``) that removes
two fixed per-task costs of the stock ``pyspark.daemon`` reuse loop.

Measured on this host (Spark 4.1.2, local[32], reused workers): a Python task
whose UDF body runs 1.6 ms still takes ~320 ms wall.  Worker-side phase
timing attributes it to:

1. ``setup_spark_files`` → ``importlib.invalidate_caches()`` — ~250 ms/task.
   The worker's sys.path carries several zipimporter entries (pyspark.zip,
   py4j-*.zip, and one spark jar), and CPython's
   ``zipimporter.invalidate_caches`` re-reads the whole zip central
   directory; with one cached zipimporter per package subpath that is ~15
   re-reads of multi-MB directories on EVERY task.
2. The daemon child loop's unconditional full ``gc.collect()`` between tasks
   — ~60 ms with numpy/pandas/pyarrow imported (the collector walks the
   entire import graph each time).

Neither cost scales down with task size, so short tasks (the common case for
fine-grained mapInPandas stages: 128 tasks × a few ms of real work) are
~40× pure overhead.  Fixes, both semantics-preserving:

1. ``setup_spark_files`` is replaced with a version that skips
   ``importlib.invalidate_caches()`` while the (files-dir, python-includes)
   tuple is unchanged since the previous task in this worker.  The
   invalidation exists so files added via ``sc.addPyFile``/``addFile``
   become importable mid-job; when the include list changes we still
   invalidate.  Plain directories on sys.path (the usual case for changed
   code) do not need it at all: ``FileFinder`` re-stats the directory mtime
   per import on its own.  Only a ZIP include whose *content* changed
   in-place under an unchanged name would be missed — Spark file names are
   immutable per SparkContext, so that case cannot occur.
2. The inter-task collect becomes: cheap ``gc.collect()`` over only the
   objects allocated since the last task (everything older is in the
   permanent generation via ``gc.freeze()``), plus a periodic full
   unfreeze-collect-freeze sweep every ``_FULL_GC_EVERY`` tasks so a live-
   then-dead frozen object cannot leak for the worker's lifetime.

Activated by ``session.get_spark`` via
``spark.python.daemon.module=solaris_spark.pydaemon`` — a documented Spark
configuration (`Configuration: spark.python.daemon.module`).  Everything
else delegates to the stock ``pyspark.daemon`` (same fork model, same
socket protocol, same signal handling).
"""

from __future__ import annotations

import gc
import importlib
import os

import pyspark.daemon as _daemon
import pyspark.worker as _worker
from pyspark.serializers import read_int
from pyspark.worker_util import add_path, utf8_deserializer

_FULL_GC_EVERY = 32

_last_files_state: tuple | None = None


def _setup_spark_files(infile) -> None:
    """Drop-in for ``pyspark.worker_util.setup_spark_files`` that only pays
    ``importlib.invalidate_caches()`` when the Spark-files state changed."""
    global _last_files_state
    spark_files_dir = utf8_deserializer.loads(infile)

    from pyspark.core.files import SparkFiles

    SparkFiles._root_directory = spark_files_dir
    SparkFiles._is_running_on_worker = True

    add_path(spark_files_dir)  # *.py files that were added will be copied here
    num_python_includes = read_int(infile)
    includes = tuple(
        utf8_deserializer.loads(infile) for _ in range(num_python_includes))
    for filename in includes:
        add_path(os.path.join(spark_files_dir, filename))

    state = (spark_files_dir, includes)
    if state != _last_files_state:
        importlib.invalidate_caches()
        _last_files_state = state


class _GcShim:
    """Stands in for the ``gc`` module inside ``pyspark.daemon``'s child
    loop: frozen-generation collect per task, full sweep every N tasks."""

    def __init__(self) -> None:
        self._tasks = 0

    def collect(self, generation: int = 2) -> int:
        self._tasks += 1
        if self._tasks % _FULL_GC_EVERY == 0:
            gc.unfreeze()
            n = gc.collect(generation)
            gc.freeze()
            return n
        # cheap: only objects allocated since the previous task's freeze
        n = gc.collect(generation)
        gc.freeze()
        return n


_worker.setup_spark_files = _setup_spark_files
_daemon.worker_main = _worker.main  # rebind in case daemon captured it early
_daemon.gc = _GcShim()

# Freeze the daemon's import-time object graph before any fork so the first
# per-task collect in every child is already cheap (children inherit the
# permanent generation through fork).
gc.freeze()

manager = _daemon.manager

if __name__ == "__main__":
    manager()
