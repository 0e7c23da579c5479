"""Sitemap sink — the sitemaps.org XML protocol over the crawl corpus.

A crawler both CONSUMES sitemaps (seed expansion) and, operating a
mirror/archive, PUBLISHES them; this sink writes one
``urlset`` document per host (``<url><loc>..</loc><lastmod>..</lastmod>``
entries, lastmod = the capture warc_ts in W3C datetime) plus a
``sitemapindex`` document listing the per-host files — the exact layout
the protocol prescribes for multi-file sites.

Scale shape: ``groupby(host).map_groups`` writes each host's sitemap in
its own task (no driver materialization of URLs); only the O(hosts)
per-file summary reaches the driver for the index document. File names
derive from the host (slug + short digest), so re-runs are idempotent
per file (tmp + atomic rename, same contract as the WARC sink)."""

from __future__ import annotations

import hashlib
import os
from xml.sax.saxutils import escape

import pyarrow as pa

XMLNS = "http://www.sitemaps.org/schemas/sitemap/0.9"


def _w3c_date(ts_us: int) -> str:
    import datetime as dt

    t = dt.datetime.fromtimestamp(ts_us / 1e6, tz=dt.timezone.utc)
    return t.strftime("%Y-%m-%dT%H:%M:%SZ")


def host_sitemap_name(host: str) -> str:
    slug = "".join(c if c.isalnum() else "-" for c in host)[-40:]
    dig = hashlib.blake2b(host.encode(), digest_size=4).hexdigest()
    return f"sitemap-{slug}-{dig}.xml"


def build_urlset(urls, ts_us_list) -> bytes:
    """One urlset document; entries sorted by loc for determinism."""
    rows = sorted(zip(urls, ts_us_list))
    parts = ['<?xml version="1.0" encoding="UTF-8"?>',
             f'<urlset xmlns="{XMLNS}">']
    for u, ts in rows:
        parts.append(f"  <url><loc>{escape(u)}</loc>"
                     f"<lastmod>{_w3c_date(int(ts))}</lastmod></url>")
    parts.append("</urlset>")
    return "\n".join(parts).encode("utf-8")


def write_sitemaps(ds, out_dir: str):
    """Write per-host sitemaps from a Dataset with (url, host,
    warc_ts|ts) columns; returns the per-host summary Dataset
    (host, sitemap_file, n_urls). Call ``write_sitemap_index`` on the
    summary to emit the index document."""
    os.makedirs(out_dir, exist_ok=True)

    def write_host(group: pa.Table) -> pa.Table:
        if group.num_rows == 0:
            return pa.table({"host": pa.array([], pa.string()),
                             "sitemap_file": pa.array([], pa.string()),
                             "n_urls": pa.array([], pa.int64())})
        host = group.column("host")[0].as_py()
        ts_col = "warc_ts" if "warc_ts" in group.column_names else "ts"
        ts = group.column(ts_col)
        if pa.types.is_timestamp(ts.type) or pa.types.is_floating(ts.type):
            ts = ts.cast(pa.int64())
        doc = build_urlset(group.column("url").to_pylist(),
                           ts.to_pylist())
        name = host_sitemap_name(host)
        tmp = os.path.join(out_dir, name + ".tmp")
        with open(tmp, "wb") as f:
            f.write(doc)
        os.replace(tmp, os.path.join(out_dir, name))
        return pa.table({"host": pa.array([host], pa.string()),
                         "sitemap_file": pa.array([name], pa.string()),
                         "n_urls": pa.array([group.num_rows], pa.int64())})

    return ds.groupby("host").map_groups(write_host,
                                         batch_format="pyarrow")


def write_sitemap_index(summary_rows, out_dir: str,
                        name: str = "sitemap-index.xml") -> str:
    """sitemapindex document over the per-host summary (O(hosts) driver
    rows — the protocol's multi-sitemap pointer file)."""
    parts = ['<?xml version="1.0" encoding="UTF-8"?>',
             f'<sitemapindex xmlns="{XMLNS}">']
    for f in sorted(summary_rows):
        parts.append(f"  <sitemap><loc>{escape(f)}</loc></sitemap>")
    parts.append("</sitemapindex>")
    path = os.path.join(out_dir, name)
    tmp = path + ".tmp"
    with open(tmp, "wb") as fh:
        fh.write("\n".join(parts).encode("utf-8"))
    os.replace(tmp, path)
    return path
