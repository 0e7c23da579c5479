"""Resumable hash-partitioned Parquet sink — the output layout a
100 TB job needs: one directory per key-range partition, each with its
own ``_SUCCESS`` marker, so a failed/killed run re-executes ONLY the
partitions that never finished (never one giant file, never a restart
from zero). Same marker protocol as the crawl's per-round checkpoints
(`pipelines/crawl.py`).

Scale shape: one shuffle (hash-partition by the key) and one write task
per partition; each task writes into a private tmp dir and finishes
with an atomic rename + marker, so partial output from a killed task is
invisible to readers and to the resume scan.
"""

from __future__ import annotations

import os
import shutil

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from ..functions.urls import stable_hash64_batch


def _part_hash(tbl: pa.Table, key: str, num_partitions: int) -> np.ndarray:
    col = tbl.column(key)
    if pa.types.is_integer(col.type):
        v = col.to_numpy(zero_copy_only=False).astype(np.uint64)
        h = v * np.uint64(0x9E3779B97F4A7C15)
        return (h % np.uint64(num_partitions)).astype(np.int64)
    return (stable_hash64_batch([str(x) for x in col.to_pylist()])
            % num_partitions).astype(np.int64)


def write_partitioned(ds, out_dir: str, key: str,
                      num_partitions: int = 16) -> dict:
    """Write ``ds`` as ``out_dir/part=i/`` Parquet partitions keyed by
    ``stable_hash(key) % num_partitions``, skipping partitions whose
    ``_SUCCESS`` marker already exists (resume after a kill). Returns
    ``{"written": [...], "skipped": [...]}``. Deterministic layout:
    re-running a finished sink is a no-op."""
    os.makedirs(out_dir, exist_ok=True)
    done = [p for p in range(num_partitions)
            if os.path.exists(os.path.join(out_dir, f"part={p}",
                                           "_SUCCESS"))]
    todo = sorted(set(range(num_partitions)) - set(done))
    if not todo:
        return {"written": [], "skipped": done}
    todo_set = frozenset(todo)

    def add_part(t: pa.Table) -> pa.Table:
        h = _part_hash(t, key, num_partitions)
        t = t.append_column("__part", pa.array(h, pa.int64()))
        # rows of already-finished partitions drop BEFORE the shuffle
        return t.filter(pa.array(np.isin(h, todo)))

    def write_group(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({"part": pa.array([], pa.int64()),
                             "rows": pa.array([], pa.int64())})
        p = int(t.column("__part")[0].as_py())
        assert p in todo_set
        pdir = os.path.join(out_dir, f"part={p}")
        tmp = pdir + ".tmp"
        shutil.rmtree(tmp, ignore_errors=True)
        os.makedirs(tmp)
        pq.write_table(t.drop_columns(["__part"]),
                       os.path.join(tmp, "part.parquet"))
        with open(os.path.join(tmp, "_SUCCESS"), "w") as f:
            f.write("ok")
        shutil.rmtree(pdir, ignore_errors=True)  # leftover partials
        os.rename(tmp, pdir)
        return pa.table({"part": pa.array([p], pa.int64()),
                         "rows": pa.array([t.num_rows], pa.int64())})

    summary = (ds.map_batches(add_part, batch_format="pyarrow")
                 .groupby("__part")
                 .map_groups(write_group, batch_format="pyarrow")
                 .to_pandas())
    return {"written": sorted(int(p) for p in summary["part"]),
            "skipped": done}


def read_partitioned(ray, out_dir: str):
    """Read a ``write_partitioned`` layout back as one Dataset (only
    partitions with a ``_SUCCESS`` marker are trusted)."""
    import glob

    files = sorted(
        f
        for d in os.listdir(out_dir)
        if d.startswith("part=")
        and os.path.exists(os.path.join(out_dir, d, "_SUCCESS"))
        for f in glob.glob(os.path.join(out_dir, d, "*.parquet")))
    return ray.data.read_parquet(files, partitioning=None)
