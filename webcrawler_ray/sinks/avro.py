"""Avro Object Container File sink/source — the SIXTH byte format next
to WARC, JSONL, CSV, ORC and TFRecord, implemented pure-stdlib from the
public Avro 1.11 specification (the binary encoding + object container
file layout; no avro package in this container). Files are
bit-compatible with any Avro reader for the supported types.

Wire format (spec, "Object Container Files"):

    magic ``Obj\\x01``
    | file metadata map: {"avro.schema": <JSON>, "avro.codec": "null"}
    | 16-byte sync marker
    | data blocks: long n_records | long n_bytes | records | sync

with the Avro binary primitives: ``long``/``int`` = zigzag varint,
``string``/``bytes`` = long length + payload, ``double`` = 8 LE bytes,
``boolean`` = 1 byte. Maps encode as count-prefixed key/value runs
terminated by a 0 count. Only the types this repo's tables need are
implemented (``long``, ``string``, ``double``, ``boolean``, ``bytes``)
— a reader hitting anything else fails loudly rather than guessing.

Same sink contract as ``sinks/tfrecord.py``: one file per batch written
inside ``map_batches`` (fully parallel, no driver materialization),
file names and sync markers derived from the payload digest (re-runs
coalesce idempotently, and the marker never collides across distinct
payloads), atomic tmp-rename writes, ``_SUCCESS`` set-completeness via
``sinks/complete.py`` handled by callers."""

from __future__ import annotations

import hashlib
import io
import json
import os
import struct

import pyarrow as pa

ROWS_PER_FILE = 1000
MAGIC = b"Obj\x01"

_ARROW_TO_AVRO = {
    pa.int64(): "long",
    pa.int32(): "long",
    pa.string(): "string",
    pa.large_string(): "string",
    pa.float64(): "double",
    pa.bool_(): "boolean",
    pa.binary(): "bytes",
    pa.large_binary(): "bytes",
}


def _zigzag(n: int) -> bytes:
    """Avro long: zigzag-mapped unsigned varint (spec 'Binary Encoding')."""
    u = (n << 1) ^ (n >> 63)
    out = bytearray()
    while True:
        b = u & 0x7F
        u >>= 7
        if u:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def _read_long(buf: memoryview, i: int) -> tuple[int, int]:
    shift = 0
    u = 0
    while True:
        b = buf[i]
        i += 1
        u |= (b & 0x7F) << shift
        if not b & 0x80:
            break
        shift += 7
    return (u >> 1) ^ -(u & 1), i


def _enc_str(s: str) -> bytes:
    b = s.encode("utf-8")
    return _zigzag(len(b)) + b


def avro_schema_json(schema: pa.Schema, name: str = "Row") -> str:
    """The Avro record schema (canonical JSON) for an Arrow schema."""
    fields = []
    for f in schema:
        if f.type not in _ARROW_TO_AVRO:
            raise NotImplementedError(
                f"avro sink: unsupported Arrow type {f.type} for "
                f"column {f.name!r}")
        fields.append({"name": f.name, "type": _ARROW_TO_AVRO[f.type]})
    return json.dumps({"type": "record", "name": name, "fields": fields},
                      separators=(",", ":"))


def _encode_records(tbl: pa.Table, fields: list[str]) -> bytes:
    out = io.BytesIO()
    w = out.write
    cols = []
    for f in fields:
        col = tbl.column(f)
        typ = col.type
        vals = col.to_pylist()
        if typ in (pa.int64(), pa.int32()):
            cols.append([_zigzag(v) for v in vals])
        elif typ in (pa.string(), pa.large_string()):
            cols.append([_enc_str(v) for v in vals])
        elif typ == pa.float64():
            cols.append([struct.pack("<d", v) for v in vals])
        elif typ == pa.bool_():
            cols.append([b"\x01" if v else b"\x00" for v in vals])
        elif typ in (pa.binary(), pa.large_binary()):
            cols.append([_zigzag(len(v)) + v for v in vals])
        else:  # pragma: no cover - avro_schema_json raised already
            raise NotImplementedError(str(typ))
    for row in zip(*cols):
        for cell in row:
            w(cell)
    return out.getvalue()


def _header(schema_json: str, sync: bytes) -> bytes:
    out = io.BytesIO()
    out.write(MAGIC)
    meta = {"avro.schema": schema_json, "avro.codec": "null"}
    out.write(_zigzag(len(meta)))
    for k, v in sorted(meta.items()):
        out.write(_enc_str(k))
        out.write(_enc_str(v))
    out.write(_zigzag(0))  # map terminator
    out.write(sync)
    return out.getvalue()


def write_avro(ds, out_dir: str, fields: list[str],
               rows_per_file: int = ROWS_PER_FILE):
    """Write ``ds`` as ``.avro`` object container files of
    ``rows_per_file`` records (null codec, one data block per file).
    Returns the per-file summary Dataset (avro_file, n_rows, n_bytes)."""
    os.makedirs(out_dir, exist_ok=True)

    def write_batch(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table({"avro_file": pa.array([], pa.string()),
                             "n_rows": pa.array([], pa.int64()),
                             "n_bytes": pa.array([], pa.int64())})
        schema_json = avro_schema_json(
            pa.schema([batch.schema.field(f) for f in fields]))
        records = _encode_records(batch.select(fields), fields)
        digest = hashlib.blake2b(records, digest_size=16)
        sync = digest.digest()
        data = (_header(schema_json, sync)
                + _zigzag(batch.num_rows) + _zigzag(len(records))
                + records + sync)
        name = f"{digest.hexdigest()}-{batch.num_rows}.avro"
        path = os.path.join(out_dir, name)
        tmp = path + ".tmp"
        with open(tmp, "wb") as f:
            f.write(data)
        os.replace(tmp, path)
        return pa.table({
            "avro_file": pa.array([name], pa.string()),
            "n_rows": pa.array([batch.num_rows], pa.int64()),
            "n_bytes": pa.array([len(data)], pa.int64())})

    return ds.map_batches(write_batch, batch_format="pyarrow",
                          batch_size=rows_per_file)


def _decode_file(buf: bytes, schema: pa.Schema) -> pa.Table:
    try:
        return _decode_file_inner(buf, schema)
    except (IndexError, struct.error) as e:
        # running off the end of the buffer is truncation, not a crash
        raise ValueError(f"truncated avro container file: {e}") from e


def _decode_file_inner(buf: bytes, schema: pa.Schema) -> pa.Table:
    mv = memoryview(buf)
    if bytes(mv[:4]) != MAGIC:
        raise ValueError("not an Avro object container file (bad magic)")
    i = 4
    meta = {}
    while True:
        n, i = _read_long(mv, i)
        if n == 0:
            break
        if n < 0:  # spec: negative count is |count| followed by size
            n, i = -n, _read_long(mv, i)[1]
        for _ in range(n):
            klen, i = _read_long(mv, i)
            k = bytes(mv[i:i + klen]).decode("utf-8")
            i += klen
            vlen, i = _read_long(mv, i)
            meta[k] = bytes(mv[i:i + vlen])
            i += vlen
    codec = meta.get("avro.codec", b"null")
    if codec != b"null":
        raise NotImplementedError(f"avro codec {codec!r}")
    file_fields = json.loads(meta["avro.schema"])["fields"]
    want = [{"name": f.name, "type": _ARROW_TO_AVRO[f.type]}
            for f in schema]
    got = [{"name": f["name"], "type": f["type"]} for f in file_fields]
    if got != want:
        raise ValueError(f"avro schema mismatch: file {got} != expected "
                         f"{want}")
    sync = bytes(mv[i:i + 16])
    i += 16

    cols: list[list] = [[] for _ in schema]
    types = [f.type for f in schema]
    n_total = len(buf)
    while i < n_total:
        n_rec, i = _read_long(mv, i)
        n_bytes, i = _read_long(mv, i)
        end = i + n_bytes
        for _ in range(n_rec):
            for ci, typ in enumerate(types):
                if typ in (pa.int64(), pa.int32()):
                    v, i = _read_long(mv, i)
                elif typ in (pa.string(), pa.large_string()):
                    ln, i = _read_long(mv, i)
                    v = bytes(mv[i:i + ln]).decode("utf-8")
                    i += ln
                elif typ == pa.float64():
                    (v,) = struct.unpack_from("<d", mv, i)
                    i += 8
                elif typ == pa.bool_():
                    v = mv[i] != 0
                    i += 1
                elif typ in (pa.binary(), pa.large_binary()):
                    ln, i = _read_long(mv, i)
                    v = bytes(mv[i:i + ln])
                    i += ln
                else:
                    raise NotImplementedError(str(typ))
                cols[ci].append(v)
        if i != end:
            raise ValueError("avro block length mismatch (corrupt block)")
        if bytes(mv[i:i + 16]) != sync:
            raise ValueError("avro sync marker mismatch (corrupt file)")
        i += 16
    return pa.Table.from_arrays(
        [pa.array(c, t) for c, t in zip(cols, types)], schema=schema)


def read_avro(ray, paths, schema: pa.Schema):
    """Dataset over ``.avro`` container files — one binary read task per
    file; each task validates magic/schema/sync and decodes per the
    expected Arrow ``schema``."""
    if isinstance(paths, str) and os.path.isdir(paths):
        paths = sorted(os.path.join(paths, f) for f in os.listdir(paths)
                       if f.endswith(".avro"))
        if not paths:
            raise FileNotFoundError(
                "no .avro files in directory — the sink wrote nothing "
                "(empty input)")

    def decode(batch: pa.Table) -> pa.Table:
        tables = [_decode_file(b.as_py(), schema)
                  for b in batch.column("bytes")]
        return pa.concat_tables(tables)

    return ray.data.read_binary_files(paths).map_batches(
        decode, batch_format="pyarrow")
