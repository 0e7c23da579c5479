"""Loopback HTTP gateway over a synthetic web directory.

Serves a webgen corpus (``pages.parquet`` + ``robots.parquet``) as a
real HTTP site behind the gateway protocol ``GET /{quote(url)}``
(`stages/fetcher.py` ``HttpFetcher(gateway=...)``):

* a page row -> 200 with ``Content-Type: text/html`` for html-lang rows
  (else ``application/octet-stream`` — the non-html branch),
  ``Last-Modified`` = the row's warc_ts (RFC 9110 HTTP-date), body =
  the html bytes;
* ``{host}/robots.txt`` -> the robots table row rendered as a real
  agent-``*`` robots.txt (``robots.render_robots_txt``); a
  ``fetchable=False`` host gets 404 (robots-unreachable -> allow-all);
* any other URL -> 404 (the non-2xx branch / fetch miss).

``delays`` maps specific URLs to a response sleep so the read-timeout
branch is exercisable. Binds 127.0.0.1 only; the live-fetch e2e
(`tests/test_crawl_http_e2e.py`) is the sole consumer — no test in this
repo touches any network beyond loopback.
"""

from __future__ import annotations

import threading
import time
from datetime import timezone
from email.utils import formatdate
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from urllib.parse import unquote

import pyarrow.parquet as pq

from .robots import render_robots_txt

_ROBOTS_SUFFIX = "/robots.txt"


class WebGateway:
    """Threaded loopback gateway over one synthetic web corpus."""

    def __init__(self, pages_path: str, robots_path: str,
                 html_langs=("en", "pt"),
                 delays: dict[str, float] | None = None):
        t = pq.read_table(pages_path,
                          columns=["url", "html", "lang", "warc_ts"])
        langs = set(html_langs)
        # warc_ts is a NAIVE UTC timestamp[us]; attach UTC explicitly so
        # .timestamp() cannot shift it by the host timezone
        self._pages = {
            u: (h, lg in langs,
                ts.replace(tzinfo=timezone.utc).timestamp())
            for u, h, lg, ts in zip(t.column("url").to_pylist(),
                                    t.column("html").to_pylist(),
                                    t.column("lang").to_pylist(),
                                    t.column("warc_ts").to_pylist())}
        # per-host sitemap.xml (sitemaps.org urlset over that host's
        # pages) + the robots.txt Sitemap: directive advertising it —
        # the discovery chain `discovery.discover_seeds` walks
        from .functions.urls import split_host_resource
        from .sinks.sitemap import build_urlset

        by_host: dict[str, list[tuple[str, float]]] = {}
        for u, (_h, _is, ts) in self._pages.items():
            host, _res = split_host_resource(u)
            if host:
                by_host.setdefault(host, []).append((u, ts * 1e6))
        self._sitemaps = {
            h: build_urlset([u for u, _ in rows], [t for _, t in rows])
            for h, rows in by_host.items()}
        r = pq.read_table(robots_path)
        al = (r.column("allow").to_pylist()
              if "allow" in r.column_names else [None] * r.num_rows)
        self._robots: dict[str, str] = {}
        for host, dis, a, cd, fe in zip(
                r.column("host").to_pylist(),
                r.column("disallow").to_pylist(), al,
                r.column("crawl_delay").to_pylist(),
                r.column("fetchable").to_pylist()):
            if fe:  # fetchable=False host == robots 404 (unreachable)
                self._robots[host] = render_robots_txt(
                    dis or (), a or (), cd,
                    sitemaps=([f"{host}/sitemap.xml"]
                              if host in self._sitemaps else []))
        self._delays = delays or {}
        gw = self

        class Handler(BaseHTTPRequestHandler):
            def log_message(self, *args):  # keep pytest output clean
                pass

            def _respond(self, send_body: bool) -> None:
                url = unquote(self.path.lstrip("/"))
                delay = gw._delays.get(url)
                if delay:
                    time.sleep(delay)
                if url.endswith("/sitemap.xml"):
                    doc = gw._sitemaps.get(url[:-len("/sitemap.xml")])
                    if doc is None:
                        self.send_error(404)
                        return
                    self.send_response(200)
                    self.send_header("Content-Type", "application/xml")
                    self.send_header("Content-Length", str(len(doc)))
                    self.end_headers()
                    if send_body:
                        self.wfile.write(doc)
                    return
                if url.endswith(_ROBOTS_SUFFIX):
                    text = gw._robots.get(url[:-len(_ROBOTS_SUFFIX)])
                    if text is None:
                        self.send_error(404)
                        return
                    body = text.encode()
                    self.send_response(200)
                    self.send_header("Content-Type", "text/plain")
                    self.send_header("Content-Length", str(len(body)))
                    self.end_headers()
                    if send_body:
                        self.wfile.write(body)
                    return
                page = gw._pages.get(url)
                if page is None:
                    self.send_error(404)
                    return
                html, is_html, ts = page
                self.send_response(200)
                self.send_header(
                    "Content-Type",
                    "text/html" if is_html else "application/octet-stream")
                self.send_header("Last-Modified",
                                 formatdate(ts, usegmt=True))
                self.send_header("Content-Length", str(len(html)))
                self.end_headers()
                if send_body:
                    self.wfile.write(html)

            def do_GET(self):
                self._respond(send_body=True)

            def do_HEAD(self):
                self._respond(send_body=False)

        self._httpd = ThreadingHTTPServer(("127.0.0.1", 0), Handler)
        self._thread: threading.Thread | None = None

    @property
    def base_url(self) -> str:
        host, port = self._httpd.server_address[:2]
        return f"http://{host}:{port}"

    def start(self) -> "WebGateway":
        self._thread = threading.Thread(target=self._httpd.serve_forever,
                                        daemon=True)
        self._thread.start()
        return self

    def stop(self) -> None:
        self._httpd.shutdown()
        self._httpd.server_close()
        if self._thread is not None:
            self._thread.join(timeout=5)
