"""Sitemap source: read sitemaps.org ``urlset`` XML documents back into
a Ray Dataset — the crawler-side half of the protocol (seed expansion
from published sitemaps). One read task per file (files are the natural
parallelism unit); stdlib ElementTree parse, namespace-tolerant."""

from __future__ import annotations

import datetime as dt
import os
import xml.etree.ElementTree as ET

import pyarrow as pa


def _lastmod_us(s: str) -> int:
    """Tolerant W3C-datetime parse: sitemaps.org allows full datetimes
    with 'Z' or numeric offsets, fractional seconds, minute precision,
    and bare dates (``2005-01-01``). A malformed value falls back to 0
    rather than raising — one sloppy <lastmod> must not discard an
    otherwise-valid urlset (the reference tolerates it too)."""
    try:
        # fromisoformat (3.11+) covers offsets + fractions; map 'Z'.
        t = dt.datetime.fromisoformat(s.replace("Z", "+00:00"))
    except ValueError:
        try:
            t = dt.datetime.strptime(s, "%Y-%m-%d")
        except ValueError:
            return 0
    if t.tzinfo is None:
        t = t.replace(tzinfo=dt.timezone.utc)
    return int(t.timestamp() * 1e6)


def parse_urlset(raw: bytes) -> list[tuple[str, int]]:
    """(loc, lastmod_us) entries of one urlset document. Accepts both
    namespaced and bare tags (real-world sitemaps are sloppy)."""
    root = ET.fromstring(raw)
    out = []
    for url_el in root:
        if not url_el.tag.endswith("url"):
            continue
        loc, lastmod = None, None
        for child in url_el:
            if child.tag.endswith("loc"):
                loc = (child.text or "").strip()
            elif child.tag.endswith("lastmod"):
                lastmod = (child.text or "").strip()
        if loc:
            out.append((loc, _lastmod_us(lastmod) if lastmod else 0))
    return out


def read_sitemaps(ray, paths):
    """Dataset over urlset entries: (sitemap_file, url, lastmod_us).
    ``paths`` is a directory (all sitemap-*.xml files, index excluded),
    one file, or a list of files."""
    if isinstance(paths, str) and os.path.isdir(paths):
        paths = sorted(os.path.join(paths, f) for f in os.listdir(paths)
                       if f.endswith(".xml") and not f.startswith(
                           "sitemap-index"))
        if not paths:
            raise FileNotFoundError("no sitemap xml files in directory")
    ds = ray.data.read_binary_files(paths, include_paths=True)

    def parse(batch: pa.Table) -> pa.Table:
        files, urls, ts = [], [], []
        for path, data in zip(batch.column("path").to_pylist(),
                              batch.column("bytes").to_pylist()):
            name = os.path.basename(path)
            for loc, us in parse_urlset(data):
                files.append(name)
                urls.append(loc)
                ts.append(us)
        return pa.table({"sitemap_file": pa.array(files, pa.string()),
                         "url": pa.array(urls, pa.string()),
                         "lastmod_us": pa.array(ts, pa.int64())})

    return ds.map_batches(parse, batch_format="pyarrow")
