"""Arrow IPC (Feather V2 / stream) byte-format sink/source — the
SEVENTH byte interchange format next to WARC, JSONL, CSV, ORC,
TFRecord and Avro, for zero-copy hand-off to any Arrow-native tool
(DuckDB, polars, Rust/Go Arrow, Arrow Flight peers).

Same contract as ``sinks/orcsink.py``: one file per batch written
inside ``map_batches`` (fully parallel, no driver materialization),
file names derived from the full payload digest (distinct contents
never collide, re-runs coalesce idempotently), atomic tmp-rename
writes. Files use the Arrow IPC STREAM framing (magic-checked on
read); the reader is ``read_binary_files`` + ``pa.ipc.open_stream``
per file — one task per file, schema carried by the format itself."""

from __future__ import annotations

import hashlib
import os

import pyarrow as pa

ROWS_PER_FILE = 1000


def write_ipc(ds, out_dir: str, fields: list[str],
              rows_per_file: int = ROWS_PER_FILE):
    """Write ``ds`` as ``.arrows`` IPC stream files of ``rows_per_file``
    rows with EXACTLY ``fields`` as the column order. Returns the
    per-file summary Dataset (ipc_file, n_rows, n_bytes)."""
    os.makedirs(out_dir, exist_ok=True)

    def write_batch(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table({"ipc_file": pa.array([], pa.string()),
                             "n_rows": pa.array([], pa.int64()),
                             "n_bytes": pa.array([], pa.int64())})
        t = batch.select(fields)
        sink = pa.BufferOutputStream()
        with pa.ipc.new_stream(sink, t.schema) as w:
            w.write_table(t)
        data = sink.getvalue().to_pybytes()
        name = (hashlib.blake2b(data, digest_size=16).hexdigest()
                + f"-{batch.num_rows}.arrows")
        path = os.path.join(out_dir, name)
        tmp = path + ".tmp"
        with open(tmp, "wb") as f:
            f.write(data)
        os.replace(tmp, path)
        return pa.table({"ipc_file": pa.array([name], pa.string()),
                         "n_rows": pa.array([batch.num_rows],
                                            pa.int64()),
                         "n_bytes": pa.array([len(data)], pa.int64())})

    return ds.map_batches(write_batch, batch_format="pyarrow",
                          batch_size=rows_per_file)


def read_ipc(ray, paths):
    """Dataset over ``.arrows`` IPC stream files (a directory, one file,
    or a list) — one binary read task per file, decoded zero-copy by
    ``pa.ipc.open_stream``."""
    if isinstance(paths, str) and os.path.isdir(paths):
        paths = sorted(os.path.join(paths, f) for f in os.listdir(paths)
                       if f.endswith(".arrows"))
        if not paths:
            raise FileNotFoundError(
                "no .arrows files in directory — the sink wrote "
                "nothing (empty input)")

    def decode(batch: pa.Table) -> pa.Table:
        tables = []
        for b in batch.column("bytes"):
            with pa.ipc.open_stream(pa.BufferReader(b.as_py())) as r:
                tables.append(r.read_all())
        return pa.concat_tables(tables)

    return ray.data.read_binary_files(paths).map_batches(
        decode, batch_format="pyarrow")
