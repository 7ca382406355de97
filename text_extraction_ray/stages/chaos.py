"""Fault-injection stages for validating Ray-level recovery (north_rule:
"any ray job submit run resumes mid-crawl").

At 100 TB a multi-hour job WILL lose workers (preemption, OOM kills, node
loss).  Ray Data's actor pools restart dead actors (``max_restarts=-1``,
``max_task_retries=-1`` by default for map actors) and re-run the lost
batch; the engine's stages are pure per-batch functions, so a retried batch
is byte-identical.  ``CrashOnce`` makes that contract testable: it wraps any
stage class and hard-kills (``os._exit``) the first worker that processes a
batch, exactly once per marker file.

This module (not a test file) hosts the wrapper because a RESTARTED actor
unpickles its constructor state in a fresh worker process that can only
import classes by module path — a class defined inside a pytest module is
importable by the first worker (cloudpickle in-band) but NOT by the
replacement worker, which turns the restart into an infinite
ModuleNotFoundError loop.  Library placement is therefore load-bearing, and
the wrapper doubles as a chaos stage for cluster burn-in runs.
"""

from __future__ import annotations

import os

import pyarrow as pa


class CrashOnce:
    """Wrap a batch-stage class; the first worker to see a batch dies hard.

    ``os._exit(1)`` — not an exception — so Ray sees a SYSTEM_ERROR worker
    death, not an application error it would surface to the driver.  A
    marker file (on a filesystem shared by all workers; tests use tmp_path)
    coordinates so exactly one crash fires per run regardless of pool size.
    """

    def __init__(self, marker: str, inner: str = "Extractor") -> None:
        # Inner stage resolved by name so the constructor args stay
        # plain strings (always re-pickleable on actor restart).
        from . import extract as _extract

        self._inner = getattr(_extract, inner)()
        self._marker = marker

    def __call__(self, batch: pa.Table) -> pa.Table:
        if not os.path.exists(self._marker):
            try:
                with open(self._marker, "x") as f:
                    f.write(str(os.getpid()))
                os._exit(1)  # hard-kill this worker mid-batch
            except FileExistsError:
                pass  # another worker crashed first; proceed normally
        return self._inner(batch)
