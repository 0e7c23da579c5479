"""WET byte-format sink — WARC/1.0 ``conversion`` records carrying the
EXTRACTED TEXT of each page (the Common Crawl companion format to the
response archives: same ISO 28500 record grammar, ``Content-Type:
text/plain`` body, one gzip member per record, ``.warc.wet.gz`` files).

The reference stops at WARC response records (`WarcFileSave.py:20-54`);
a training-data pipeline consumes the text, and WET is the public
interchange shape for it. Same determinism contract as ``sinks/warc.py``
(digest-derived ids and file names, warc_ts dates, pinned gzip mtime):
re-running over the same corpus is byte-identical, so output is
resumable/idempotent per file.
"""

from __future__ import annotations

import hashlib
import os

import pyarrow as pa

from .warc import WARC_VERSION, _gzip_member, _record_id, _warc_date

RECORDS_PER_FILE = 1000  # same rotation as the response archives


def build_conversion_record(url: str, text: str, ts_us: int) -> bytes:
    """One uncompressed WARC ``conversion`` record: headers + the plain
    UTF-8 text body (no HTTP envelope — conversion records carry the
    derived payload directly). ``WARC-Refers-To`` links the response
    record the text was extracted from (same (url, ts) id function)."""
    body = text.encode("utf-8")
    headers = (
        WARC_VERSION + b"\r\n"
        + b"WARC-Type: conversion\r\n"
        + f"WARC-Record-ID: {_record_id(url + '#wet', ts_us)}\r\n".encode()
        + f"WARC-Refers-To: {_record_id(url, ts_us)}\r\n".encode()
        + f"WARC-Date: {_warc_date(ts_us)}\r\n".encode()
        + f"WARC-Target-URI: {url}\r\n".encode()
        + b"Content-Type: text/plain\r\n"
        + f"Content-Length: {len(body)}\r\n".encode()
        + b"\r\n")
    return headers + body + b"\r\n\r\n"


def write_wet(ds, out_dir: str, records_per_file: int = RECORDS_PER_FILE):
    """Write a crawled Dataset (url, extracted_text|text, warc_ts|ts)
    as ``.warc.wet.gz`` files, one task per file — fully parallel, no
    driver materialization. Returns the per-file summary Dataset."""
    os.makedirs(out_dir, exist_ok=True)

    def write_batch(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table({"wet_file": pa.array([], pa.string()),
                             "n_records": pa.array([], pa.int64()),
                             "n_bytes": pa.array([], pa.int64())})
        urls = batch.column("url").to_pylist()
        tcol = ("extracted_text" if "extracted_text" in batch.column_names
                else "text")
        texts = batch.column(tcol).to_pylist()
        ts_col = "warc_ts" if "warc_ts" in batch.column_names else "ts"
        ts = batch.column(ts_col)
        if pa.types.is_timestamp(ts.type) or pa.types.is_floating(ts.type):
            ts = ts.cast(pa.int64())
        ts_us = ts.to_pylist()
        members = [_gzip_member(build_conversion_record(
                       u, t or "", int(s)))
                   for u, t, s in zip(urls, texts, ts_us)]
        name = (hashlib.blake2b(
            f"{urls[0]}\x1f{len(urls)}".encode(), digest_size=8).hexdigest()
            + f"-{len(urls)}.warc.wet.gz")
        path = os.path.join(out_dir, name)
        tmp = path + ".tmp"
        payload = b"".join(members)
        with open(tmp, "wb") as f:
            f.write(payload)
        os.replace(tmp, path)
        return pa.table({"wet_file": pa.array([name], pa.string()),
                         "n_records": pa.array([len(urls)], pa.int64()),
                         "n_bytes": pa.array([len(payload)], pa.int64())})

    return ds.map_batches(write_batch, batch_format="pyarrow",
                          batch_size=records_per_file)
