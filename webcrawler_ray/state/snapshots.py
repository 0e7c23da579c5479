"""Minimal snapshot/manifest table format — the lakehouse contract a
100-TB corpus directory needs and raw parquet directories lack:

- a TABLE is a directory of immutable parquet data files plus numbered
  manifest files (``manifest-00007.json``), each listing exactly the
  data files that make up that snapshot;
- a COMMIT is: write new data files (content-addressed names, atomic
  tmp+rename — never visible half-written), then atomically write the
  next manifest. Readers NEVER list the directory for data; they read
  one manifest, so concurrent writers/compactors can't tear a read;
- TIME TRAVEL is reading an older manifest (append-only history);
- COMPACTION rewrites many small files into target-size files and
  commits a new manifest with IDENTICAL logical contents — readers of
  old snapshots still see the old files (kept until expiry).

Public-design parity: this is the Iceberg/Delta snapshot idea reduced
to its testable core (manifest = the source of truth, not the
filesystem listing), implemented from first principles — no external
table-format library.
"""

from __future__ import annotations

import hashlib
import json
import os

import pyarrow as pa
import pyarrow.parquet as pq

_MANIFEST_FMT = "manifest-{:05d}.json"


def _manifest_path(table_dir: str, version: int) -> str:
    return os.path.join(table_dir, _MANIFEST_FMT.format(version))


def current_version(table_dir: str) -> int:
    """Highest committed manifest number, or 0 (no table yet)."""
    if not os.path.isdir(table_dir):
        return 0
    vs = [int(f[len("manifest-"):-len(".json")])
          for f in os.listdir(table_dir)
          if f.startswith("manifest-") and f.endswith(".json")]
    return max(vs, default=0)


def read_manifest(table_dir: str, version: int | None = None) -> dict:
    v = current_version(table_dir) if version is None else version
    with open(_manifest_path(table_dir, v)) as f:
        m = json.load(f)
    assert m["version"] == v
    return m


def _write_data_files(ds, table_dir: str, rows_per_file: int) -> list:
    """Content-addressed parquet data files written inside map_batches
    (parallel, atomic per file). Returns [(name, n_rows), ...]."""
    os.makedirs(table_dir, exist_ok=True)

    def write_batch(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table({"file": pa.array([], pa.string()),
                             "n_rows": pa.array([], pa.int64())})
        sink = pa.BufferOutputStream()
        pq.write_table(batch, sink)
        data = sink.getvalue().to_pybytes()
        name = (hashlib.blake2b(data, digest_size=16).hexdigest()
                + f"-{batch.num_rows}.parquet")
        path = os.path.join(table_dir, name)
        tmp = path + f".tmp-{os.getpid()}"
        with open(tmp, "wb") as f:
            f.write(data)
        os.replace(tmp, path)
        return pa.table({"file": pa.array([name], pa.string()),
                         "n_rows": pa.array([batch.num_rows],
                                            pa.int64())})

    summary = ds.map_batches(write_batch, batch_format="pyarrow",
                             batch_size=rows_per_file).take_all()
    return [(r["file"], int(r["n_rows"])) for r in summary]


def commit_append(ds, table_dir: str, rows_per_file: int = 1000) -> int:
    """Append ``ds`` as a new snapshot: new data files + a manifest that
    lists the previous snapshot's files plus the new ones (any pending
    merge-on-read deletes carry forward — an append never resurrects
    deleted rows). Returns the new version number."""
    base = current_version(table_dir)
    m = read_manifest(table_dir, base) if base else {}
    new = _write_data_files(ds, table_dir, rows_per_file)
    return _commit(table_dir, base, m.get("files", []) + new,
                   op="append", deletes=m.get("deletes", []),
                   delete_key=m.get("delete_key"))


def commit_compaction(ray, table_dir: str,
                      target_rows_per_file: int = 100_000) -> int:
    """Rewrite the CURRENT snapshot's files into ~target-size files and
    commit a new manifest with identical LOGICAL contents. Pending
    merge-on-read deletes are MATERIALIZED (the rewritten files lack
    the rows; the new manifest carries no delete files). Old manifests
    keep pointing at the old files (time travel intact)."""
    base = current_version(table_dir)
    ds = read_snapshot(ray, table_dir, base)  # deletes applied
    new = _write_data_files(ds, table_dir, target_rows_per_file)
    return _commit(table_dir, base, new, op="compact")


def commit_delete(ray, table_dir: str, key_col: str, keys_ds,
                  rows_per_file: int = 100_000) -> int:
    """MERGE-ON-READ delete: write the keys to delete as parquet
    'delete files' and commit a manifest that carries them alongside
    the (untouched) data files — no data file is rewritten; readers
    apply the deletes (anti-join on ``key_col``). ``keys_ds`` is a
    Dataset with exactly ``key_col``."""
    base = current_version(table_dir)
    m = read_manifest(table_dir, base)
    if m.get("delete_key") not in (None, key_col):
        raise ValueError(
            f"delete key mismatch: table uses {m['delete_key']!r}")
    new_del = _write_data_files(keys_ds, table_dir, rows_per_file)
    return _commit(table_dir, base, m["files"], op="delete",
                   deletes=m.get("deletes", [])
                   + [[n, r] for n, r in new_del],
                   delete_key=key_col)


def _commit(table_dir: str, base: int, files: list, op: str,
            deletes: list | None = None,
            delete_key: str | None = None) -> int:
    version = base + 1
    path = _manifest_path(table_dir, version)
    tmp = path + f".tmp-{os.getpid()}"
    m = {"version": version, "op": op,
         "files": [[n, r] for n, r in files],
         "n_rows": sum(r for _, r in files)}
    if deletes:
        m["deletes"] = [[n, r] for n, r in deletes]
        m["delete_key"] = delete_key
    with open(tmp, "w") as f:
        json.dump(m, f)
    try:
        # link(2) fails atomically on EEXIST — unlike replace(), a
        # losing racer can never overwrite the winner's manifest
        os.link(tmp, path)
    except FileExistsError:
        raise RuntimeError(
            f"snapshot conflict: version {version} already committed "
            "(concurrent writer) — retry from the new current version"
        ) from None
    finally:
        os.unlink(tmp)
    return version


def read_snapshot(ray, table_dir: str, version: int | None = None):
    """Dataset over exactly the files of ``version`` (default: current)
    — the manifest, never the directory listing, decides membership.
    Pending merge-on-read delete files are applied as ONE distributed
    anti-join on the manifest's delete key."""
    m = read_manifest(table_dir, version)
    paths = [os.path.join(table_dir, f) for f, _ in m["files"]]
    if not paths:
        raise FileNotFoundError(f"snapshot v{m['version']} is empty")
    ds = ray.data.read_parquet(paths)
    if m.get("deletes"):
        dpaths = [os.path.join(table_dir, f) for f, _ in m["deletes"]]
        keys = ray.data.read_parquet(dpaths)
        n_del = sum(r for _, r in m["deletes"])
        ds = ds.join(keys, join_type="left_anti",
                     on=(m["delete_key"],),
                     num_partitions=max(1, min(64, n_del // 16_384 + 1)))
    return ds
