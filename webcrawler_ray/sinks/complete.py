"""Set-completeness protocol for byte-format sinks (.warc.gz /
.jsonl.gz): per-file writes are atomic (tmp+rename) but the FILE SET is
not — only a ``_SUCCESS`` marker written AFTER the full sink pass
proves a directory is a complete archive set (the
``sinks/partitioned.py`` rule, shared here so every byte sink follows
one implementation instead of hand-rolled copies)."""

from __future__ import annotations

import os

MARKER = "_SUCCESS"


def is_complete(out_dir: str) -> bool:
    return os.path.exists(os.path.join(out_dir, MARKER))


def write_complete_set(out_dir: str, suffix: str, write_fn):
    """Clear stale ``suffix`` files (and any marker), run ``write_fn()``
    (which must materialize its writes before returning), then write the
    marker — ONLY if at least one output file exists, so an empty write
    never produces a marker that suppresses regeneration while readers
    have nothing to read. Returns write_fn's result."""
    os.makedirs(out_dir, exist_ok=True)
    marker = os.path.join(out_dir, MARKER)
    if os.path.exists(marker):
        os.unlink(marker)
    if os.path.isdir(out_dir):
        for f in os.listdir(out_dir):
            if f.endswith(suffix) or f.endswith(".tmp"):
                os.unlink(os.path.join(out_dir, f))
    result = write_fn()
    if any(f.endswith(suffix) for f in os.listdir(out_dir)):
        with open(marker, "w") as fh:
            fh.write("")
    return result


def ensure_complete_set(out_dir: str, suffix: str, write_fn):
    """Regenerate via ``write_complete_set`` unless the marker proves a
    complete prior set; returns write_fn's result or None if skipped."""
    if is_complete(out_dir):
        return None
    return write_complete_set(out_dir, suffix, write_fn)
