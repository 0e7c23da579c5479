"""JSONL byte-format sink/source: gzipped newline-delimited JSON —
the debug-log interchange format (`DebugPrinter.py:9-18` writes JSON
records; this sink produces the same records as real ``.jsonl.gz``
bytes rather than parquet, closing the S6 byte-format gap the way
``sinks/warc.py`` closed S5's).

Determinism: fixed key order per record, file names derived from the
first record + count (blake2b), gzip mtime pinned to 0 — re-running
over the same dataset yields byte-identical files. Scale shape: one
file per batch written inside ``map_batches`` (fully parallel, no
driver materialization); the reader is ``ray.data.read_json`` — one
task per file, extension-inferred decompression."""

from __future__ import annotations

import gzip
import hashlib
import io
import json
import os

import pyarrow as pa

RECORDS_PER_FILE = 1000


def write_jsonl(ds, out_dir: str, fields: list[str],
                records_per_file: int = RECORDS_PER_FILE):
    """Write ``ds`` as ``.jsonl.gz`` files of ``records_per_file``
    records with EXACTLY ``fields`` per line (fixed order). Returns the
    per-file summary Dataset (jsonl_file, n_records, n_bytes)."""
    os.makedirs(out_dir, exist_ok=True)

    def write_batch(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table({"jsonl_file": pa.array([], pa.string()),
                             "n_records": pa.array([], pa.int64()),
                             "n_bytes": pa.array([], pa.int64())})
        cols = {f: batch.column(f).to_pylist() for f in fields}
        lines = []
        for i in range(batch.num_rows):
            rec = {f: cols[f][i] for f in fields}
            lines.append(json.dumps(rec, ensure_ascii=False,
                                    separators=(",", ":")))
        payload = ("\n".join(lines) + "\n").encode("utf-8")
        buf = io.BytesIO()
        with gzip.GzipFile(fileobj=buf, mode="wb", mtime=0) as gz:
            gz.write(payload)
        data = buf.getvalue()
        # name = digest of the FULL payload: distinct contents can
        # never collide (128-bit), and re-runs stay byte-deterministic.
        # Caveat: two batches with byte-identical content coalesce into
        # one file (idempotent re-writes depend on exactly that).
        name = (hashlib.blake2b(payload, digest_size=16).hexdigest()
                + f"-{len(lines)}.jsonl.gz")
        path = os.path.join(out_dir, name)
        tmp = path + ".tmp"
        with open(tmp, "wb") as f:
            f.write(data)
        os.replace(tmp, path)
        return pa.table({"jsonl_file": pa.array([name], pa.string()),
                         "n_records": pa.array([len(lines)], pa.int64()),
                         "n_bytes": pa.array([len(data)], pa.int64())})

    return ds.map_batches(write_batch, batch_format="pyarrow",
                          batch_size=records_per_file)


def read_jsonl(ray, paths):
    """Dataset over ``.jsonl.gz`` files (a directory, one file, or a
    list). One read task per file; gzip inferred from the extension."""
    if isinstance(paths, str) and os.path.isdir(paths):
        paths = sorted(os.path.join(paths, f) for f in os.listdir(paths)
                       if f.endswith(".jsonl.gz"))
        if not paths:
            raise FileNotFoundError(
                "no .jsonl.gz files in directory — the sink wrote "
                "nothing (empty input)")
    import pyarrow.json as _  # noqa: F401  (fail fast if missing)

    return ray.data.read_json(paths)
