"""TFRecord byte-format sink/source — the training-data interchange
format (TensorFlow's framed-record container), the FIFTH byte format
next to WARC, JSONL, CSV and ORC. Wire format per record (public TF
spec, tensorflow/core/lib/io/record_writer.h):

    uint64 length (LE) | uint32 masked_crc32c(length bytes) (LE)
    | data[length]     | uint32 masked_crc32c(data) (LE)

with CRC32C (Castagnoli, reflected poly 0x82F63B78) and TF's mask
``rotr15(crc) + 0xa282ead8``. The container has no network dependency
and no tensorflow import — the framing and checksum are implemented
here from the public spec (slice-by-8 table CRC), so the files are
bit-compatible with any TFRecord reader. Record payloads are one
compact JSON object per row in a FIXED field order (a deterministic,
schema-carrying stand-in for tf.Example — protobuf isn't in this
container, and the roundtrip oracle needs exact values, which JSON
gives for int64/string columns).

Same sink contract as ``sinks/csvsink.py`` / ``sinks/orcsink.py``: one
file per batch written inside ``map_batches`` (fully parallel, no
driver materialization), file names from the payload digest (re-runs
coalesce idempotently), atomic tmp-rename writes, ``_SUCCESS``-marker
set-completeness handled by callers via ``sinks/complete.py``."""

from __future__ import annotations

import hashlib
import io
import json
import os
import struct

import pyarrow as pa

ROWS_PER_FILE = 1000
_POLY = 0x82F63B78
_MASK_DELTA = 0xA282EAD8


def _make_tables():
    t0 = []
    for i in range(256):
        c = i
        for _ in range(8):
            c = (c >> 1) ^ (_POLY if c & 1 else 0)
        t0.append(c)
    tabs = [t0]
    for _ in range(7):
        prev = tabs[-1]
        tabs.append([t0[prev[i] & 0xFF] ^ (prev[i] >> 8)
                     for i in range(256)])
    return tabs


_T = _make_tables()


def crc32c(data: bytes) -> int:
    """CRC32C (Castagnoli) — slice-by-8 table algorithm (Intel's public
    formulation): 8 input bytes per loop iteration, pure stdlib."""
    crc = 0xFFFFFFFF
    n = len(data)
    i = 0
    T0, T1, T2, T3, T4, T5, T6, T7 = _T
    while n - i >= 8:
        crc ^= int.from_bytes(data[i:i + 4], "little")
        crc = (T7[crc & 0xFF] ^ T6[(crc >> 8) & 0xFF]
               ^ T5[(crc >> 16) & 0xFF] ^ T4[crc >> 24]
               ^ T3[data[i + 4]] ^ T2[data[i + 5]]
               ^ T1[data[i + 6]] ^ T0[data[i + 7]])
        i += 8
    while i < n:
        crc = T0[(crc ^ data[i]) & 0xFF] ^ (crc >> 8)
        i += 1
    return crc ^ 0xFFFFFFFF


def _masked_crc(data: bytes) -> int:
    c = crc32c(data)
    return (((c >> 15) | (c << 17)) + _MASK_DELTA) & 0xFFFFFFFF


def _frame(payload: bytes) -> bytes:
    header = struct.pack("<Q", len(payload))
    return (header + struct.pack("<I", _masked_crc(header)) + payload
            + struct.pack("<I", _masked_crc(payload)))


def _unframe(buf: bytes):
    """Yield payloads, verifying BOTH checksums (corruption raises —
    a sink roundtrip must never silently pass damaged bytes)."""
    i, n = 0, len(buf)
    while i < n:
        if n - i < 12:
            raise ValueError("truncated TFRecord frame header")
        header = buf[i:i + 8]
        (length,) = struct.unpack("<Q", header)
        (hcrc,) = struct.unpack("<I", buf[i + 8:i + 12])
        if _masked_crc(header) != hcrc:
            raise ValueError("TFRecord length-CRC mismatch")
        j = i + 12
        if n - j < length + 4:
            raise ValueError("truncated TFRecord payload")
        payload = buf[j:j + length]
        (dcrc,) = struct.unpack("<I", buf[j + length:j + length + 4])
        if _masked_crc(payload) != dcrc:
            raise ValueError("TFRecord data-CRC mismatch")
        yield payload
        i = j + length + 4


def write_tfrecord(ds, out_dir: str, fields: list[str],
                   rows_per_file: int = ROWS_PER_FILE):
    """Write ``ds`` as ``.tfrecord`` files of ``rows_per_file`` records
    (one JSON row per record, EXACTLY ``fields`` as the key order).
    Returns the per-file summary Dataset (tfrecord_file, n_rows,
    n_bytes)."""
    os.makedirs(out_dir, exist_ok=True)

    def write_batch(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table({"tfrecord_file": pa.array([], pa.string()),
                             "n_rows": pa.array([], pa.int64()),
                             "n_bytes": pa.array([], pa.int64())})
        cols = [batch.column(f).to_pylist() for f in fields]
        out = io.BytesIO()
        for row in zip(*cols):
            payload = json.dumps(dict(zip(fields, row)),
                                 ensure_ascii=False,
                                 separators=(",", ":")).encode("utf-8")
            out.write(_frame(payload))
        data = out.getvalue()
        name = (hashlib.blake2b(data, digest_size=16).hexdigest()
                + f"-{batch.num_rows}.tfrecord")
        path = os.path.join(out_dir, name)
        tmp = path + ".tmp"
        with open(tmp, "wb") as f:
            f.write(data)
        os.replace(tmp, path)
        return pa.table({
            "tfrecord_file": pa.array([name], pa.string()),
            "n_rows": pa.array([batch.num_rows], pa.int64()),
            "n_bytes": pa.array([len(data)], pa.int64())})

    return ds.map_batches(write_batch, batch_format="pyarrow",
                          batch_size=rows_per_file)


def read_tfrecord(ray, paths, schema: pa.Schema):
    """Dataset over ``.tfrecord`` files — one binary read task per
    file; each task verifies frame CRCs, JSON-decodes the records and
    casts to ``schema`` (JSON carries no types, so the reader owns
    them, like a CSV reader does)."""
    if isinstance(paths, str) and os.path.isdir(paths):
        paths = sorted(os.path.join(paths, f) for f in os.listdir(paths)
                       if f.endswith(".tfrecord"))
        if not paths:
            raise FileNotFoundError(
                "no .tfrecord files in directory — the sink wrote "
                "nothing (empty input)")

    names = [f.name for f in schema]

    def decode(batch: pa.Table) -> pa.Table:
        rows = [json.loads(p.decode("utf-8"))
                for b in batch.column("bytes")
                for p in _unframe(b.as_py())]
        arrays = [pa.array([r[k] for r in rows], schema.field(k).type)
                  for k in names]
        return pa.Table.from_arrays(arrays, schema=schema)

    return ray.data.read_binary_files(paths).map_batches(
        decode, batch_format="pyarrow")
