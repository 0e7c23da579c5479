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

# a delete-key set at or under this many BYTES (manifest row counts x 8)
# is applied as a BROADCAST membership filter (ray.put once, vectorized
# searchsorted per batch — zero shuffles); larger sets use a
# distributed join. Same rationale as stages/joins.py::auto_join.
DELETE_BROADCAST_MAX_BYTES = 64 << 20


def _delete_keys_sorted(table_dir: str, entries: list, key_col: str):
    """Driver-side sorted-unique key array of the given delete files —
    only called when the manifest row counts say it fits the broadcast
    threshold (the same bounded collect a dimension broadcast does)."""
    import numpy as np

    parts = [pq.read_table(os.path.join(table_dir, e[0]),
                           columns=[key_col]).column(key_col)
             .to_numpy(zero_copy_only=False) for e in entries]
    return np.unique(np.concatenate(parts))


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
    """Append ``ds`` as a new snapshot: new data files (stamped with
    this commit's SEQUENCE NUMBER) + a manifest listing the previous
    snapshot's files plus the new ones. Pending merge-on-read deletes
    carry forward but, being sequence-scoped, never touch the appended
    rows. Returns the new version number."""
    base = current_version(table_dir)
    m = read_manifest(table_dir, base) if base else {}
    version = base + 1
    new = [[n, r, version]
           for n, r in _write_data_files(ds, table_dir, rows_per_file)]
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
    version = base + 1
    new = [[n, r, version]
           for n, r in _write_data_files(ds, table_dir,
                                         target_rows_per_file)]
    return _commit(table_dir, base, new, op="compact")


def commit_delete(ray, table_dir: str, key_col: str, keys_ds,
                  rows_per_file: int = 100_000) -> int:
    """MERGE-ON-READ delete: write the keys to delete as parquet
    'delete files' and commit a manifest that carries them alongside
    the (untouched) data files — no data file is rewritten; readers
    apply the deletes (anti-join on ``key_col``). A delete file is
    SEQUENCE-SCOPED: it applies only to data files with a smaller
    sequence number (the Iceberg rule), so later appends/merges are
    untouched. ``keys_ds`` is a Dataset with exactly ``key_col``."""
    base = current_version(table_dir)
    m = read_manifest(table_dir, base)
    if m.get("delete_key") not in (None, key_col):
        raise ValueError(
            f"delete key mismatch: table uses {m['delete_key']!r}")
    version = base + 1
    new_del = [[n, r, version]
               for n, r in _write_data_files(keys_ds, table_dir,
                                             rows_per_file)]
    return _commit(table_dir, base, m["files"], op="delete",
                   deletes=m.get("deletes", []) + new_del,
                   delete_key=key_col)


def commit_merge(ray, table_dir: str, key_col: str, upsert_ds,
                 rows_per_file: int = 100_000) -> int:
    """MERGE INTO (upsert): ONE commit that (a) scopes a delete of the
    upsert batch's keys to every EXISTING data file and (b) appends the
    batch as new data files with this commit's sequence number — so a
    matched row is replaced and an unmatched row inserts, atomically,
    with no data file rewritten. ``upsert_ds`` must contain ``key_col``.

    The batch is materialized once (its files ARE the insert side) and
    the delete side is just a column projection of those same files —
    the keys are never collected to the driver."""
    base = current_version(table_dir)
    m = read_manifest(table_dir, base) if base else {}
    if m.get("delete_key") not in (None, key_col):
        raise ValueError(
            f"delete key mismatch: table uses {m['delete_key']!r}")
    version = base + 1
    new = [[n, r, version]
           for n, r in _write_data_files(upsert_ds, table_dir,
                                         rows_per_file)]
    paths = [os.path.join(table_dir, n) for n, _, _ in new]
    keys_ds = ray.data.read_parquet(paths, columns=[key_col])
    new_del = [[n, r, version]
               for n, r in _write_data_files(keys_ds, table_dir,
                                             rows_per_file)]
    return _commit(table_dir, base, m.get("files", []) + new,
                   op="merge",
                   deletes=m.get("deletes", []) + new_del,
                   delete_key=key_col)


def _commit(table_dir: str, base: int, files: list, op: str,
            deletes: list | None = None,
            delete_key: str | None = None) -> int:
    version = base + 1
    path = _manifest_path(table_dir, version)
    tmp = path + f".tmp-{os.getpid()}"
    m = {"version": version, "op": op,
         "files": [list(e) for e in files],
         "n_rows": sum(e[1] for e in files)}
    if deletes:
        m["deletes"] = [list(e) for e in deletes]
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
    Merge-on-read delete files apply SEQUENCE-SCOPED: a data file is
    anti-joined only against delete files committed AFTER it. Files
    group by the set of deletes that cover them, so the read does one
    anti-join per distinct coverage group (= number of delete commits
    still pending, usually 0 or 1), never one per file."""
    m = read_manifest(table_dir, version)
    files = m["files"]
    if not files:
        raise FileNotFoundError(f"snapshot v{m['version']} is empty")
    deletes = m.get("deletes", [])
    if not deletes:
        return _sized_read(ray, table_dir, files)

    dseqs = sorted({e[2] for e in deletes})
    # coverage group of a data file = which delete seqs exceed its seq
    groups: dict[int, list] = {}
    for e in files:
        k = sum(1 for dq in dseqs if dq > e[2])  # deletes covering it
        groups.setdefault(k, []).append(e)
    parts = []
    for k, fl in sorted(groups.items()):
        ds = _sized_read(ray, table_dir, fl)
        if k:
            cover = [e for e in deletes if e[2] in dseqs[-k:]]
            n_del = sum(e[1] for e in cover)
            if n_del * 8 <= DELETE_BROADCAST_MAX_BYTES:
                # broadcast anti-membership: no shuffle, no join actors
                from ..stages.joins import key_membership_filter

                ks = _delete_keys_sorted(table_dir, cover,
                                         m["delete_key"])
                ds = key_membership_filter(ray, ds, m["delete_key"],
                                           ks, keep_matched=False)
            else:
                keys = ray.data.read_parquet(
                    [os.path.join(table_dir, e[0]) for e in cover])
                ds = ds.join(keys, join_type="left_anti",
                             on=(m["delete_key"],),
                             num_partitions=max(
                                 1, min(64, n_del // 16_384 + 1)))
        parts.append(ds)
    out = parts[0]
    for ds in parts[1:]:
        out = out.union(ds)
    return out


def _sized_read(ray, table_dir: str, entries: list):
    """read_parquet over manifest entries with block counts sized from
    the MANIFEST's row counts (small snapshots otherwise split into
    ~CPU-count near-empty blocks, turning every downstream aggregate
    into seconds of pure per-block scheduling — io_utils rationale)."""
    rows = sum(e[1] for e in entries)
    kw = {}
    if rows < 64 * 32_768:
        kw["override_num_blocks"] = max(1, rows // 32_768)
    return ray.data.read_parquet(
        [os.path.join(table_dir, e[0]) for e in entries], **kw)


def read_changelog(ray, table_dir: str, from_version: int,
                   to_version: int | None = None,
                   keys_unique: bool = False):
    """FILE-LEVEL change feed between two snapshots — the Iceberg
    changelog-scan idea: instead of anti-joining two full snapshots
    (O(table) x O(table) exchange), read ONLY what each commit in the
    span actually changed:

    - INSERTED rows stream straight out of the data files stamped with
      a sequence number in ``(from_version, to_version]`` — no join;
    - DELETED rows are the prior snapshot INNER-joined against the
      span's (deduplicated) delete-file keys — one join whose right
      side is the delete keys, not the whole table;
    - compaction commits (op == "compact") rewrite bytes, not contents,
      and contribute nothing.

    Returns ``(inserts, deletes)`` as Datasets (either may be None when
    the span has no such rows). Semantics note: a merge that rewrites
    an IDENTICAL row image shows up as a delete+insert pair here (file
    truth), where a row-image diff would cancel it — callers needing
    net-image semantics must cancel matching pairs themselves.

    ``keys_unique=True`` asserts the span's delete files carry no
    duplicate keys (true for any merge whose batch passed
    ``check_unique``), skipping the distributed key-dedup pass — the
    inner join is then already a semi-join."""
    if to_version is None:
        to_version = current_version(table_dir)
    ins_parts, del_parts = [], []
    for v in range(from_version + 1, to_version + 1):
        m = read_manifest(table_dir, v)
        if m["op"] == "compact":
            continue
        new_data = [e for e in m["files"] if e[2] == v]
        if new_data:
            ins_parts.append(_sized_read(ray, table_dir, new_data))
        new_del = [e for e in m.get("deletes", []) if e[2] == v]
        if new_del:
            key_col = m["delete_key"]
            paths = [os.path.join(table_dir, e[0]) for e in new_del]
            n_keys = sum(e[1] for e in new_del)
            prev = read_snapshot(ray, table_dir, v - 1)
            if n_keys * 8 <= DELETE_BROADCAST_MAX_BYTES:
                # broadcast semi-membership (sorted-unique keys: the
                # dedup is free, so keys_unique is irrelevant here)
                from ..stages.joins import key_membership_filter

                ks = _delete_keys_sorted(table_dir, new_del, key_col)
                del_parts.append(key_membership_filter(
                    ray, prev, key_col, ks, keep_matched=True))
            else:
                from ..stages.aggregates import (distinct_keys,
                                                 join_partitions_for,
                                                 normalize_for_join)

                keys = ray.data.read_parquet(paths)
                if not keys_unique:
                    # dedupe keys so the inner join IS a semi-join (a
                    # dup key must not multiply the deleted row)
                    key_type = pq.read_schema(
                        paths[0]).field(key_col).type
                    keys = normalize_for_join(
                        distinct_keys(keys, key_col, n_rows=n_keys),
                        pa.schema([(key_col, key_type)]))
                del_parts.append(prev.join(
                    keys, join_type="inner", on=(key_col,),
                    num_partitions=join_partitions_for(n_keys)))

    def _union(parts):
        if not parts:
            return None
        out = parts[0]
        for p in parts[1:]:
            out = out.union(p)
        return out

    return _union(ins_parts), _union(del_parts)


def expire_snapshots(table_dir: str, keep_last: int = 2) -> dict:
    """VACUUM: drop all but the newest ``keep_last`` manifests and
    delete every data/delete file no surviving manifest references —
    the retention step that keeps a long-lived table's directory from
    growing without bound while time travel stays available across the
    kept window.

    Deletion order is crash-safe: expired MANIFESTS go first (an
    interrupted vacuum can only leave orphaned data files, which the
    next vacuum collects — never a kept manifest with missing files).
    Returns {"kept_versions", "removed_manifests", "removed_files"}."""
    cur = current_version(table_dir)
    if cur == 0:
        return {"kept_versions": [], "removed_manifests": 0,
                "removed_files": 0}
    keep = list(range(max(1, cur - keep_last + 1), cur + 1))
    referenced: set[str] = set()
    for v in keep:
        m = read_manifest(table_dir, v)
        referenced |= {e[0] for e in m["files"]}
        referenced |= {e[0] for e in m.get("deletes", [])}

    removed_manifests = 0
    for v in range(1, keep[0]):
        p = _manifest_path(table_dir, v)
        if os.path.exists(p):
            os.unlink(p)
            removed_manifests += 1

    removed_files = 0
    for f in os.listdir(table_dir):
        if (f.endswith(".parquet") and f not in referenced):
            os.unlink(os.path.join(table_dir, f))
            removed_files += 1
    return {"kept_versions": keep,
            "removed_manifests": removed_manifests,
            "removed_files": removed_files}


def check_unique(ray, table_dir: str, key_col: str, batch_ds) -> None:
    """WRITE-TIME CONSTRAINT: raise if appending ``batch_ds`` would
    violate key uniqueness — duplicate keys INSIDE the batch, or keys
    already live in the current snapshot. Both checks are distributed
    (a grouped count and one semi-join); nothing is collected beyond
    the first offending keys. Callers gate ``commit_append`` with this
    when the table carries a primary key (use ``commit_merge`` when
    replacement is the intent)."""
    from ray.data.aggregate import Count

    def _only_dups(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        return t.filter(pc.greater(t.column("count()"), 1))

    dup = (batch_ds.groupby(key_col).aggregate(Count())
           .map_batches(_only_dups, batch_format="pyarrow"))
    dup_rows = dup.limit(3).take_all()
    if dup_rows:
        ks = [r[key_col] for r in dup_rows]
        raise ValueError(
            f"unique-key violation inside the batch: {key_col} "
            f"duplicated (e.g. {ks})")
    if current_version(table_dir) == 0:
        return
    cur = read_snapshot(ray, table_dir)
    hit = batch_ds.join(
        cur.map_batches(lambda t: t.select([key_col]),
                        batch_format="pyarrow"),
        join_type="left_semi", on=(key_col,),
        num_partitions=max(1, min(64, batch_ds.count() // 16_384 + 1)))
    hit_rows = hit.limit(3).take_all()
    if hit_rows:
        ks = [r[key_col] for r in hit_rows]
        raise ValueError(
            f"unique-key violation vs the current snapshot: {key_col} "
            f"already present (e.g. {ks})")
