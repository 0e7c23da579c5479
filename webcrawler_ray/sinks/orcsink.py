"""ORC byte-format sink/source — the FOURTH byte interchange format
next to WARC, JSONL and CSV, for the columnar-warehouse tools that
ingest ORC natively.

Same contract as ``sinks/csvsink.py``: one file per batch written
inside ``map_batches`` (fully parallel, no driver materialization),
file names derived from the full payload digest (distinct contents
never collide, re-runs coalesce idempotently), atomic tmp-rename
writes. The reader is ``read_binary_files`` + a pyarrow.orc decode per
file — one task per file, schema carried by the format itself."""

from __future__ import annotations

import hashlib
import io
import os

import pyarrow as pa

ROWS_PER_FILE = 1000


def write_orc(ds, out_dir: str, fields: list[str],
              rows_per_file: int = ROWS_PER_FILE):
    """Write ``ds`` as ``.orc`` files of ``rows_per_file`` rows with
    EXACTLY ``fields`` as the column order. Returns the per-file
    summary Dataset (orc_file, n_rows, n_bytes)."""
    os.makedirs(out_dir, exist_ok=True)

    def write_batch(batch: pa.Table) -> pa.Table:
        import pyarrow.orc as paorc

        if batch.num_rows == 0:
            return pa.table({"orc_file": pa.array([], pa.string()),
                             "n_rows": pa.array([], pa.int64()),
                             "n_bytes": pa.array([], pa.int64())})
        t = batch.select(fields)
        buf = io.BytesIO()
        paorc.write_table(t, buf)
        data = buf.getvalue()
        name = (hashlib.blake2b(data, digest_size=16).hexdigest()
                + f"-{batch.num_rows}.orc")
        path = os.path.join(out_dir, name)
        tmp = path + ".tmp"
        with open(tmp, "wb") as f:
            f.write(data)
        os.replace(tmp, path)
        return pa.table({"orc_file": pa.array([name], pa.string()),
                         "n_rows": pa.array([batch.num_rows], pa.int64()),
                         "n_bytes": pa.array([len(data)], pa.int64())})

    return ds.map_batches(write_batch, batch_format="pyarrow",
                          batch_size=rows_per_file)


def read_orc(ray, paths):
    """Dataset over ``.orc`` files (a directory, one file, or a list) —
    one binary read task per file, decoded to Arrow by pyarrow.orc."""
    if isinstance(paths, str) and os.path.isdir(paths):
        paths = sorted(os.path.join(paths, f) for f in os.listdir(paths)
                       if f.endswith(".orc"))
        if not paths:
            raise FileNotFoundError(
                "no .orc files in directory — the sink wrote "
                "nothing (empty input)")

    def decode(batch: pa.Table) -> pa.Table:
        import pyarrow.orc as paorc

        tables = [paorc.ORCFile(pa.BufferReader(b.as_py())).read()
                  for b in batch.column("bytes")]
        return pa.concat_tables(tables)

    return ray.data.read_binary_files(paths).map_batches(
        decode, batch_format="pyarrow")
