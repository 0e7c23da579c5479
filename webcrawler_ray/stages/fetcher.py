"""Fetcher seam — the interface a REAL network fetcher slots into.

The sandbox crawl fetches by joining the frontier against the pages
table (`stages/fetch.py`); that is an implementation of this interface,
not the interface itself. A live deployment swaps in ``HttpFetcher``
(urllib3 PoolManager, 10 s timeout, retries disabled — the reference's
`WebAccesser.py:42-94` behavior) without touching the crawl driver: the
GET stage is an actor-pool ``map_batches`` class whose constructor
builds the fetcher once per actor (connection pool == model-load
pattern).

No code here performs network I/O in this repo's tests — the sandbox
has no network; ``TableFetcher`` is the active implementation and
``HttpFetcher`` is the documented seam.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


class TableFetcher:
    """Fetcher over a parquet pages table (the sandbox 'web').

    head(urls) -> (exists, is_html) bool arrays; get(urls) -> list of
    html bytes or None. Loads the url->(html, is_html) map once per
    instance from a column-pruned read."""

    def __init__(self, pages_path: str, html_langs=("en", "pt")):
        import pyarrow.dataset as pads

        t = pads.dataset(pages_path).to_table(
            columns=["url", "html", "lang"])
        langs = t.column("lang").to_pylist()
        self._map = {u: (h, lg in html_langs) for u, h, lg in
                     zip(t.column("url").to_pylist(),
                         t.column("html").to_pylist(), langs)}

    def head(self, urls) -> tuple[np.ndarray, np.ndarray]:
        exists = np.fromiter((u in self._map for u in urls), dtype=bool,
                             count=len(urls))
        is_html = np.fromiter(
            (self._map[u][1] if u in self._map else False for u in urls),
            dtype=bool, count=len(urls))
        return exists, is_html

    def get(self, urls) -> list:
        return [self._map[u][0] if u in self._map else None for u in urls]


class HttpFetcher:
    """Live HTTP fetcher mirroring the reference's `WebAccesser.py:42-94`:
    one urllib3 PoolManager per actor, 10 s total timeout, NO retries
    (`WebAccesser.py:45` disables them), text/html content-type gate.

    Raises at construction when urllib3 is unavailable; network use is a
    deployment concern — nothing in this repo calls it."""

    def __init__(self, timeout_s: float = 10.0, num_pools: int = 10):
        try:
            import urllib3
        except ImportError as e:  # pragma: no cover
            raise RuntimeError("HttpFetcher requires urllib3") from e
        self._http = urllib3.PoolManager(
            num_pools=num_pools, retries=False,
            timeout=urllib3.Timeout(total=timeout_s))

    def head(self, urls):
        exists = np.zeros(len(urls), dtype=bool)
        is_html = np.zeros(len(urls), dtype=bool)
        for i, u in enumerate(urls):
            try:
                r = self._http.request("HEAD", u)
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
                r = self._http.request("GET", u)
                out.append(r.data if r.status == 200 else None)
            except Exception:
                out.append(None)
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
