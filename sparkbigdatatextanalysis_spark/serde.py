"""Pickle-by-value registration for modules that ship code to Python
workers.

Executor Python workers inherit neither the driver's ``sys.path`` edits
nor its working directory, so a closure that cloudpickle serializes *by
reference* (``import sparkbigdatatextanalysis_spark.streaming.monitor``)
dies in the worker with ``ModuleNotFoundError`` whenever the driver was
started from any cwd other than the repo root. Registering the module
with ``cloudpickle.register_pickle_by_value`` makes every function the
module defines travel as bytecode inside the task closure instead — the
worker needs no importable copy of the package at all.

Every module whose functions reach a Python worker (``mapInPandas``,
``applyInPandas``, ``applyInPandasWithState``, ``pandas_udf``) MUST call
:func:`ship_by_value` on itself at import time; the subprocess
regression test ``tests/test_worker_portability.py`` runs Arrow-stage
queries with driver cwd=/tmp to keep this honest.
"""

from __future__ import annotations

import sys
from types import ModuleType


def ship_by_value(module: ModuleType | str) -> None:
    """Register ``module`` (or the module named by a ``__name__``
    string) so cloudpickle serializes its functions by value
    (best-effort: a failed registration leaves the import-path
    fallback, which still works when the driver cwd is the repo root).
    Call sites pass their own ``__name__`` --
    ``ship_by_value(__name__)`` -- one self-documenting line per
    worker-shipping module."""
    try:
        from pyspark import cloudpickle

        if isinstance(module, str):
            module = sys.modules[module]
        cloudpickle.register_pickle_by_value(module)
    except Exception:  # pragma: no cover - best-effort
        pass
