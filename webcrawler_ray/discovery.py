"""Sitemap-driven seed discovery — the standard crawler bootstrap.

Given a host list, fetch each host's ``robots.txt``, follow its
``Sitemap:`` directives (sitemaps.org discovery via RFC 9309 §2.3),
fetch and parse the advertised urlset documents, and emit the union of
listed URLs as a seed frontier. Every production crawler front-loads
this chain; the reference takes a hand-written seeds file instead
(`/root/reference/seeds.txt`) — seeds discovered here feed the same
``RayCrawler.crawl(seeds)`` entry point.

Scale shape: hosts fan out over ``map_batches`` tasks; each task uses
the per-process pooled HTTP fetcher (`stages/fetcher.py`) for its
robots + sitemap GETs, parses XML locally, and emits (url, lastmod_us,
source_host) rows — no driver-side fetching, no global sitemap
materialization. The output is a Dataset ready for dedup/priority
stages or ``.take_all()`` at seed-list sizes."""

from __future__ import annotations

import pyarrow as pa

from .robots import parse_robots_sitemaps
from .sources.sitemap import parse_urlset
from .stages.fetcher import _cached_http_fetcher


def discover_seeds(ray, hosts, gateway: str | None = None,
                   timeout_s: float = 10.0, max_sitemaps_per_host: int = 8):
    """Dataset of (host, url, lastmod_us) discovered through each
    host's robots.txt ``Sitemap:`` chain. ``hosts`` is a list of
    scheme-qualified hosts (``https://h0.test``) or a Dataset with a
    ``host`` column; hosts without robots, directives, or parseable
    sitemaps contribute nothing (a discovery miss is not an error)."""
    if isinstance(hosts, list):
        hosts = ray.data.from_arrow(
            pa.table({"host": pa.array(hosts, pa.string())}))

    def fetch_host(batch: pa.Table) -> pa.Table:
        f = _cached_http_fetcher(gateway, timeout_s)
        out_h, out_u, out_t = [], [], []
        hs = batch.column("host").to_pylist()
        robots = f.get([h + "/robots.txt" for h in hs])
        for h, raw in zip(hs, robots):
            if raw is None:
                continue
            sitemap_urls = parse_robots_sitemaps(
                raw.decode("utf-8", "replace"))[:max_sitemaps_per_host]
            if not sitemap_urls:
                continue
            for doc in f.get(list(sitemap_urls)):
                if doc is None:
                    continue
                try:
                    entries = parse_urlset(doc)
                except Exception:
                    continue  # malformed sitemap == discovery miss
                for u, ts in entries:
                    out_h.append(h)
                    out_u.append(u)
                    out_t.append(ts)
        return pa.table({"host": pa.array(out_h, pa.string()),
                         "url": pa.array(out_u, pa.string()),
                         "lastmod_us": pa.array(out_t, pa.int64())})

    return hosts.map_batches(fetch_host, batch_format="pyarrow",
                             batch_size=8)
