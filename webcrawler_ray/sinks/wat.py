"""WAT byte-format sink — WARC ``metadata`` records carrying per-page
JSON metadata (Common Crawl's third companion format: WARC = payload,
WET = extracted text, WAT = metadata). Body is a compact JSON object
(url, title, n_links, text_len) — the fields downstream link-graph /
stats consumers read — with the same record grammar, gzip-member
layout (``.warc.wat.gz``) and determinism contract as the other sinks.
"""

from __future__ import annotations

import hashlib
import json
import os

import pyarrow as pa

from .warc import WARC_VERSION, _gzip_member, _record_id, _warc_date

RECORDS_PER_FILE = 1000


def build_metadata_record(url: str, ts_us: int, meta: dict) -> bytes:
    body = json.dumps(meta, ensure_ascii=False,
                      sort_keys=True).encode("utf-8")
    headers = (
        WARC_VERSION + b"\r\n"
        + b"WARC-Type: metadata\r\n"
        + f"WARC-Record-ID: {_record_id(url + '#wat', ts_us)}\r\n".encode()
        + f"WARC-Refers-To: {_record_id(url, ts_us)}\r\n".encode()
        + f"WARC-Date: {_warc_date(ts_us)}\r\n".encode()
        + f"WARC-Target-URI: {url}\r\n".encode()
        + b"Content-Type: application/json\r\n"
        + f"Content-Length: {len(body)}\r\n".encode()
        + b"\r\n")
    return headers + body + b"\r\n\r\n"


def write_wat(ds, out_dir: str, records_per_file: int = RECORDS_PER_FILE):
    """Write a crawled Dataset (url, title, n_links, extracted_text,
    warc_ts) as ``.warc.wat.gz`` metadata archives; returns the
    per-file summary Dataset."""
    os.makedirs(out_dir, exist_ok=True)

    def write_batch(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table({"wat_file": pa.array([], pa.string()),
                             "n_records": pa.array([], pa.int64()),
                             "n_bytes": pa.array([], pa.int64())})
        urls = batch.column("url").to_pylist()
        titles = batch.column("title").to_pylist()
        nlinks = batch.column("n_links").to_pylist()
        texts = batch.column("extracted_text").to_pylist()
        ts = batch.column("warc_ts")
        if pa.types.is_timestamp(ts.type) or pa.types.is_floating(ts.type):
            ts = ts.cast(pa.int64())
        members = []
        for u, ti, nl, te, s in zip(urls, titles, nlinks, texts,
                                    ts.to_pylist()):
            meta = {"url": u, "title": ti, "n_links": int(nl),
                    "text_len": len(te or "")}
            members.append(_gzip_member(
                build_metadata_record(u, int(s), meta)))
        name = (hashlib.blake2b(
            f"{urls[0]}\x1f{len(urls)}".encode(), digest_size=8).hexdigest()
            + f"-{len(urls)}.warc.wat.gz")
        path = os.path.join(out_dir, name)
        tmp = path + ".tmp"
        payload = b"".join(members)
        with open(tmp, "wb") as f:
            f.write(payload)
        os.replace(tmp, path)
        return pa.table({"wat_file": pa.array([name], pa.string()),
                         "n_records": pa.array([len(urls)], pa.int64()),
                         "n_bytes": pa.array([len(payload)], pa.int64())})

    return ds.map_batches(write_batch, batch_format="pyarrow",
                          batch_size=records_per_file)


def read_wat(ray, paths):
    """Dataset over WAT metadata records: (wat_file, url, warc_ts,
    title, n_links, text_len)."""
    import gzip
    import io

    from .warc import parse_warc_stream

    if isinstance(paths, str) and os.path.isdir(paths):
        paths = sorted(os.path.join(paths, f) for f in os.listdir(paths)
                       if f.endswith(".warc.wat.gz"))
        if not paths:
            raise FileNotFoundError("no .warc.wat.gz files in directory")
    ds = ray.data.read_binary_files(paths, include_paths=True)

    def parse(batch: pa.Table) -> pa.Table:
        import datetime as dt

        files, urls, tss, titles, nlinks, tlens = [], [], [], [], [], []
        for path, data in zip(batch.column("path").to_pylist(),
                              batch.column("bytes").to_pylist()):
            if data[:2] == b"\x1f\x8b":
                data = gzip.GzipFile(fileobj=io.BytesIO(data)).read()
            name = os.path.basename(path)
            for headers, body in parse_warc_stream(data,
                                                   strip_http=False):
                if headers.get("WARC-Type") != "metadata":
                    continue
                meta = json.loads(body.decode("utf-8"))
                files.append(name)
                urls.append(headers["WARC-Target-URI"])
                t = dt.datetime.strptime(headers["WARC-Date"],
                                         "%Y-%m-%dT%H:%M:%SZ")
                tss.append(int(t.replace(
                    tzinfo=dt.timezone.utc).timestamp() * 1e6))
                titles.append(meta.get("title"))
                nlinks.append(int(meta.get("n_links", 0)))
                tlens.append(int(meta.get("text_len", 0)))
        return pa.table({"wat_file": pa.array(files, pa.string()),
                         "url": pa.array(urls, pa.string()),
                         "warc_ts": pa.array(tss, pa.int64()),
                         "title": pa.array(titles, pa.string()),
                         "n_links": pa.array(nlinks, pa.int64()),
                         "text_len": pa.array(tlens, pa.int64())})

    return ds.map_batches(parse, batch_format="pyarrow")
