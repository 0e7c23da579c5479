"""CSV byte-format sink/source: gzipped RFC-4180 CSV — the third byte
interchange format next to WARC (``sinks/warc.py``) and JSONL
(``sinks/jsonl.py``), for the downstream tools (spreadsheets, loaders)
that speak neither.

Determinism: fixed column order, minimal quoting with ``\\n`` line
terminator, file names derived from the full payload digest, gzip mtime
pinned to 0 — re-running over the same dataset yields byte-identical
files. Scale shape: one file per batch written inside ``map_batches``
(fully parallel, no driver materialization); the reader is
``ray.data.read_csv`` — one task per file, gzip inferred from the
extension, quoted embedded newlines enabled so free-text columns
round-trip."""

from __future__ import annotations

import csv
import gzip
import hashlib
import io
import os

import pyarrow as pa

ROWS_PER_FILE = 1000


def write_csv(ds, out_dir: str, fields: list[str],
              rows_per_file: int = ROWS_PER_FILE):
    """Write ``ds`` as ``.csv.gz`` files of ``rows_per_file`` rows with
    EXACTLY ``fields`` as the header (fixed order). Returns the per-file
    summary Dataset (csv_file, n_rows, n_bytes)."""
    os.makedirs(out_dir, exist_ok=True)

    def write_batch(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table({"csv_file": pa.array([], pa.string()),
                             "n_rows": pa.array([], pa.int64()),
                             "n_bytes": pa.array([], pa.int64())})
        sio = io.StringIO()
        w = csv.writer(sio, lineterminator="\n",
                       quoting=csv.QUOTE_MINIMAL)
        w.writerow(fields)
        cols = [batch.column(f).to_pylist() for f in fields]
        w.writerows(zip(*cols))
        payload = sio.getvalue().encode("utf-8")
        buf = io.BytesIO()
        with gzip.GzipFile(fileobj=buf, mode="wb", mtime=0) as gz:
            gz.write(payload)
        data = buf.getvalue()
        # name = digest of the FULL payload (the sinks/jsonl.py rule):
        # distinct contents never collide, re-runs are byte-identical,
        # byte-identical batches coalesce idempotently
        name = (hashlib.blake2b(payload, digest_size=16).hexdigest()
                + f"-{batch.num_rows}.csv.gz")
        path = os.path.join(out_dir, name)
        tmp = path + ".tmp"
        with open(tmp, "wb") as f:
            f.write(data)
        os.replace(tmp, path)
        return pa.table({"csv_file": pa.array([name], pa.string()),
                         "n_rows": pa.array([batch.num_rows], pa.int64()),
                         "n_bytes": pa.array([len(data)], pa.int64())})

    return ds.map_batches(write_batch, batch_format="pyarrow",
                          batch_size=rows_per_file)


def read_csv(ray, paths):
    """Dataset over ``.csv.gz`` files (a directory, one file, or a
    list). One read task per file; quoted newlines inside values are
    parsed (free-text columns round-trip)."""
    from pyarrow import csv as pacsv

    if isinstance(paths, str) and os.path.isdir(paths):
        paths = sorted(os.path.join(paths, f) for f in os.listdir(paths)
                       if f.endswith(".csv.gz"))
        if not paths:
            raise FileNotFoundError(
                "no .csv.gz files in directory — the sink wrote "
                "nothing (empty input)")
    return ray.data.read_csv(
        paths, parse_options=pacsv.ParseOptions(newlines_in_values=True))
