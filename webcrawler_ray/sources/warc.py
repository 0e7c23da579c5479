"""WARC/1.0 source: read ``.warc.gz`` files (the sink's own format and
the Common Crawl interchange layout — concatenated gzip members, one
record each) back into a Ray Dataset.

Scale shape: ``ray.data.read_binary_files`` schedules ONE task per
archive file (the natural WARC parallelism unit — members of one file
must be walked sequentially, files are independent), the parser is a
plain map_batches, and the html payload stays a ``binary`` column —
the multimodal-column convention, never decoded until a downstream
stage asks. Round-trips ``sinks/warc.py`` byte-identically (tested) and
reads any spec-conforming response-record archive (`WarcFileSave.py`
parity surface: what the reference writes, this engine can re-ingest).
"""

from __future__ import annotations

import datetime as dt
import gzip
import io
import os

import pyarrow as pa

from ..sinks.warc import parse_warc_stream


def _warc_ts_us(date_str: str) -> int:
    t = dt.datetime.strptime(date_str, "%Y-%m-%dT%H:%M:%SZ")
    return int(t.replace(tzinfo=dt.timezone.utc).timestamp() * 1e6)


def read_warc(ray, paths):
    """Dataset over WARC response records: (warc_file, url, warc_ts,
    html). ``paths`` is a directory, one file, or a list of files."""
    if isinstance(paths, str) and os.path.isdir(paths):
        paths = sorted(os.path.join(paths, f) for f in os.listdir(paths)
                       if f.endswith(".warc.gz"))
        if not paths:
            raise FileNotFoundError(
                "no .warc.gz files in directory — the sink wrote "
                "nothing (empty input)")
    ds = ray.data.read_binary_files(paths, include_paths=True)

    def parse(batch: pa.Table) -> pa.Table:
        files, urls, tss, htmls = [], [], [], []
        for path, data in zip(batch.column("path").to_pylist(),
                              batch.column("bytes").to_pylist()):
            # ray.data.read_binary_files auto-decompresses .gz by
            # extension; keep the magic-number check so raw member-
            # concatenated streams (renamed files, other readers) work
            if data[:2] == b"\x1f\x8b":
                data = gzip.GzipFile(fileobj=io.BytesIO(data)).read()
            raw = data
            name = os.path.basename(path)
            for headers, body in parse_warc_stream(raw):
                if headers.get("WARC-Type") != "response":
                    continue
                files.append(name)
                urls.append(headers["WARC-Target-URI"])
                tss.append(_warc_ts_us(headers["WARC-Date"]))
                htmls.append(body)
        return pa.table({"warc_file": pa.array(files, pa.string()),
                         "url": pa.array(urls, pa.string()),
                         "warc_ts": pa.array(tss, pa.int64()),
                         "html": pa.array(htmls, pa.binary())})

    return ds.map_batches(parse, batch_format="pyarrow")
