"""WET source: read ``.warc.wet.gz`` conversion-record archives (the
``sinks/wet.py`` format and Common Crawl's extracted-text interchange
layout) back into a Ray Dataset — same scale shape as ``sources/warc.py``
(one read task per archive file, plain map_batches parse)."""

from __future__ import annotations

import gzip
import io
import os

import pyarrow as pa

from ..sinks.warc import parse_warc_stream
from .warc import _warc_ts_us


def read_wet(ray, paths):
    """Dataset over WET conversion records: (wet_file, url, warc_ts,
    text). ``paths`` is a directory, one file, or a list of files."""
    if isinstance(paths, str) and os.path.isdir(paths):
        paths = sorted(os.path.join(paths, f) for f in os.listdir(paths)
                       if f.endswith(".warc.wet.gz"))
        if not paths:
            raise FileNotFoundError(
                "no .warc.wet.gz files in directory — the sink wrote "
                "nothing (empty input)")
    ds = ray.data.read_binary_files(paths, include_paths=True)

    def parse(batch: pa.Table) -> pa.Table:
        files, urls, tss, texts = [], [], [], []
        for path, data in zip(batch.column("path").to_pylist(),
                              batch.column("bytes").to_pylist()):
            if data[:2] == b"\x1f\x8b":
                data = gzip.GzipFile(fileobj=io.BytesIO(data)).read()
            name = os.path.basename(path)
            # conversion records carry the payload directly (no HTTP
            # envelope) -> strip_http=False
            for headers, body in parse_warc_stream(data,
                                                   strip_http=False):
                if headers.get("WARC-Type") != "conversion":
                    continue
                files.append(name)
                urls.append(headers["WARC-Target-URI"])
                tss.append(_warc_ts_us(headers["WARC-Date"]))
                texts.append(body.decode("utf-8"))
        return pa.table({"wet_file": pa.array(files, pa.string()),
                         "url": pa.array(urls, pa.string()),
                         "warc_ts": pa.array(tss, pa.int64()),
                         "text": pa.array(texts, pa.string())})

    return ds.map_batches(parse, batch_format="pyarrow")
