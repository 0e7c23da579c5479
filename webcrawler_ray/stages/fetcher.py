"""Fetcher seam — the interface a REAL network fetcher slots into.

The sandbox crawl fetches by joining the frontier against the pages
table (`stages/fetch.py`); that is an implementation of this interface,
not the interface itself. A live deployment swaps in ``HttpFetcher``
(urllib3 PoolManager, 10 s timeout, retries disabled — the reference's
`WebAccesser.py:42-94` behavior) without touching the crawl driver: the
GET stage is an actor-pool ``map_batches`` class whose constructor
builds the fetcher once per actor (connection pool == model-load
pattern).

``HttpPagesStore`` below is the live-HTTP implementation of the
PagesStore surface the crawl driver consumes (prepare / add_flags_fn /
attach_html); the loopback e2e (`tests/test_crawl_http_e2e.py`) runs a
real crawl through it against a 127.0.0.1 gateway — the only network
this repo's tests ever touch.
"""

from __future__ import annotations

from urllib.parse import quote

import numpy as np
import pyarrow as pa


class TableFetcher:
    """Fetcher over a parquet pages table (the sandbox 'web').

    head(urls) -> (exists, is_html) bool arrays; get(urls) -> list of
    html bytes or None. Loads the url->(html, is_html, warc_ts) map once
    per instance from a column-pruned read."""

    def __init__(self, pages_path: str, html_langs=("en", "pt"),
                 max_bytes: int | None = None):
        import pyarrow.dataset as pads

        if max_bytes is None:
            from ..config import CrawlConfig

            max_bytes = CrawlConfig.fetch_broadcast_max_bytes
        dset = pads.dataset(pages_path)
        # guard the whole-table materialization: this class is the
        # SMALL-web implementation of the fetcher seam — a big pages
        # table must go through PagesStore (broadcast/bucketed,
        # pipelines/crawl.py) or HttpPagesStore, never here. Footer
        # metadata is enough to size the decision without reading data.
        data_bytes = sum(
            rg.total_byte_size
            for frag in dset.get_fragments() if frag.metadata is not None
            for rg in (frag.metadata.row_group(i)
                       for i in range(frag.metadata.num_row_groups)))
        if data_bytes > max_bytes:
            raise ValueError(
                f"TableFetcher loads the whole pages table into one "
                f"process ({data_bytes} bytes > "
                f"fetch_broadcast_max_bytes={max_bytes}); use "
                f"PagesStore (bucketed) or HttpPagesStore for tables "
                f"this size")
        t = dset.to_table(columns=["url", "html", "lang", "warc_ts"])
        langs = t.column("lang").to_pylist()
        self._map = {u: (h, lg in html_langs, ts) for u, h, lg, ts in
                     zip(t.column("url").to_pylist(),
                         t.column("html").to_pylist(), langs,
                         t.column("warc_ts").to_pylist())}

    def head(self, urls) -> tuple[np.ndarray, np.ndarray]:
        exists = np.fromiter((u in self._map for u in urls), dtype=bool,
                             count=len(urls))
        is_html = np.fromiter(
            (self._map[u][1] if u in self._map else False for u in urls),
            dtype=bool, count=len(urls))
        return exists, is_html

    def get(self, urls) -> list:
        return [self._map[u][0] if u in self._map else None for u in urls]

    def get_pages(self, urls) -> list:
        """(html bytes | None, warc_ts | None) per url — the capture-
        timestamped variant of get() the crawl's GET stage consumes."""
        return [(self._map[u][0], self._map[u][2]) if u in self._map
                else (None, None) for u in urls]


class HttpFetcher:
    """Live HTTP fetcher mirroring the reference's `WebAccesser.py:42-94`:
    one urllib3 PoolManager per actor, 10 s total timeout, NO retries
    (`WebAccesser.py:45` disables them), text/html content-type gate.

    ``gateway``: optional fetch-gateway base URL — every request for URL
    ``u`` goes to ``{gateway}/{quote(u, safe='')}`` instead of ``u``
    directly (the standard proxy / rendering-service deployment shape;
    it is also what lets the loopback e2e serve a synthetic multi-host
    web from one 127.0.0.1 server with no DNS). None = direct fetch.

    Raises at construction when urllib3 is unavailable."""

    def __init__(self, timeout_s: float = 10.0, num_pools: int = 10,
                 gateway: str | None = None):
        try:
            import urllib3
        except ImportError as e:  # pragma: no cover
            raise RuntimeError("HttpFetcher requires urllib3") from e
        self._http = urllib3.PoolManager(
            num_pools=num_pools, retries=False,
            timeout=urllib3.Timeout(total=timeout_s))
        self._gw = gateway.rstrip("/") if gateway else None

    def _target(self, u: str) -> str:
        if self._gw is None:
            return u
        return f"{self._gw}/{quote(u, safe='')}"

    def head(self, urls):
        exists = np.zeros(len(urls), dtype=bool)
        is_html = np.zeros(len(urls), dtype=bool)
        for i, u in enumerate(urls):
            try:
                r = self._http.request("HEAD", self._target(u))
                exists[i] = r.status == 200
                ct = r.headers.get("Content-Type", "")
                is_html[i] = ct.startswith("text/html")
            except Exception:
                pass  # unreachable == miss (reference records, no retry)
        return exists, is_html

    def get(self, urls):
        out = []
        for u in urls:
            try:
                r = self._http.request("GET", self._target(u))
                out.append(r.data if r.status == 200 else None)
            except Exception:
                out.append(None)
        return out

    def get_pages(self, urls):
        """GET with capture timestamp: (html bytes | None, warc_ts
        datetime | None) per url. warc_ts comes from the
        ``Last-Modified`` response header (RFC 9110 HTTP-date, second
        resolution) normalized to naive UTC; absent/unparsable header ->
        None (the sink column is nullable)."""
        from datetime import timezone
        from email.utils import parsedate_to_datetime

        out = []
        for u in urls:
            try:
                r = self._http.request("GET", self._target(u))
            except Exception:
                out.append((None, None))
                continue
            if r.status != 200:
                out.append((None, None))
                continue
            ts = None
            lm = r.headers.get("Last-Modified")
            if lm:
                try:
                    ts = parsedate_to_datetime(lm).astimezone(
                        timezone.utc).replace(tzinfo=None)
                except Exception:
                    ts = None
            out.append((r.data, ts))
        return out


class FetchStage:
    """Actor-pool GET stage over any Fetcher: the fetcher (connection
    pool / table map) is built ONCE per actor in __init__; __call__
    fetches one batch of URLs and emits (url, html, fetched)."""

    def __init__(self, fetcher_factory):
        self.fetcher = fetcher_factory()

    def __call__(self, batch: pa.Table) -> pa.Table:
        urls = batch.column("url").to_pylist()
        htmls = self.fetcher.get(urls)
        return pa.table({
            "url": pa.array(urls, pa.string()),
            "html": pa.array([h or b"" for h in htmls], pa.binary()),
            "fetched": pa.array([h is not None for h in htmls],
                                pa.bool_())})


# -- live-HTTP PagesStore --------------------------------------------------

_HTTP_FETCHERS: dict = {}


def _cached_http_fetcher(gateway: str | None, timeout_s: float) -> HttpFetcher:
    """One HttpFetcher (== one connection pool) per WORKER PROCESS per
    (gateway, timeout) — the per-actor-pool pattern without requiring the
    closure itself to be an actor class (urllib3 pools hold locks and do
    not pickle; the pool is built on first use inside each worker)."""
    key = (gateway, timeout_s)
    f = _HTTP_FETCHERS.get(key)
    if f is None:
        f = HttpFetcher(timeout_s=timeout_s, gateway=gateway)
        _HTTP_FETCHERS[key] = f
    return f


class HttpPagesStore:
    """Live-HTTP implementation of the PagesStore surface the crawl
    driver consumes: the HEAD-equivalent flag probe and the GET html
    fetch go over the network through :class:`HttpFetcher` instead of a
    Parquet pages table (`WebAccesser.py:42-94` parity).

    ``bucketed`` is False — there is no table to hash-partition; the
    politeness frontier (not a lookup index) is the rate limiter, and
    per-process pooled fetchers replace the broadcast html map. A page
    that vanishes between HEAD and GET yields empty html (parses to
    empty text), matching a live crawler's torn-read behavior."""

    bucketed = False

    def __init__(self, cfg, gateway: str | None = None,
                 timeout_s: float = 10.0):
        self.cfg = cfg
        self.gateway = gateway
        self.timeout_s = timeout_s

    def prepare(self, ray) -> None:
        """Nothing to build: no flag index, no bucket layout — pools are
        constructed lazily per worker process."""

    def add_flags_fn(self):
        gw, to = self.gateway, self.timeout_s

        def add_flags(batch: pa.Table) -> pa.Table:
            f = _cached_http_fetcher(gw, to)
            urls = batch.column("url").to_pylist()
            exists, is_html = f.head(urls)
            out = batch.append_column("in_table",
                                      pa.array(exists, pa.bool_()))
            return out.append_column("is_html",
                                     pa.array(is_html, pa.bool_()))

        return add_flags

    def attach_html(self, ds, cfg, n_rows: int | None = None):
        gw, to = self.gateway, self.timeout_s

        def fetch(batch: pa.Table) -> pa.Table:
            f = _cached_http_fetcher(gw, to)
            urls = batch.column("url").to_pylist()
            pages = f.get_pages(urls)
            out = batch.append_column(
                "html", pa.array([h if h is not None else b""
                                  for h, _ in pages], pa.binary()))
            return out.append_column(
                "warc_ts", pa.array([t for _, t in pages],
                                    pa.timestamp("us")))

        return ds.map_batches(fetch, batch_format="pyarrow",
                              batch_size=cfg.parse_batch_size)
