"""Chaos-injection hook for in-round task-retry testing.

The crawl's idempotence claims (seen-insert re-execution, the
hash_bucket_aggregate sidecar contract, attempts-write atomicity) are
only real if a Ray task retried MID-ROUND — the routine failure mode at
cluster scale — reproduces the clean run bit-for-bit. This module is
the one test-only seam that forces that path: a crawl config can carry
``extra["fault_inject"] = (point_name, sentinel_dir)`` and the tagged
stage calls :func:`maybe_inject_fault`, which SIGKILLs its own worker
process exactly once per sentinel dir. Ray observes a worker death (a
system failure, not an application exception) and transparently
retries the task — the genuine retry path, not a simulated one.

Cost when disabled: one ``None`` check per batch. The sentinel file is
created with O_EXCL so concurrent tasks race to at most one kill; it
lives on the local filesystem, which is exactly right for the
single-node test harness (a multi-node chaos run would pin the point
to one node or use a shared mount).
"""

from __future__ import annotations

import os
import signal


def maybe_inject_fault(spec, point: str) -> None:
    """SIGKILL the current worker once if ``spec`` targets ``point``.

    ``spec`` is ``None`` (production: no-op) or ``(want_point,
    sentinel_dir)``. The first task to create
    ``<sentinel_dir>/<point>.tripped`` (atomic via O_EXCL) dies
    immediately; every later execution — including the retry of the
    killed task itself — sees the sentinel and proceeds normally.
    """
    if not spec:
        return
    want, d = spec
    if want != point:
        return
    try:
        fd = os.open(os.path.join(d, f"{point}.tripped"),
                     os.O_CREAT | os.O_EXCL | os.O_WRONLY, 0o644)
    except FileExistsError:
        return
    os.close(fd)
    os.kill(os.getpid(), signal.SIGKILL)


def fault_tripped(spec_or_dir, point: str) -> bool:
    """Did the ``point`` fault fire? (test assertion helper)"""
    d = spec_or_dir[1] if isinstance(spec_or_dir, tuple) else spec_or_dir
    return os.path.exists(os.path.join(d, f"{point}.tripped"))
