"""Live-HTTP crawl e2e (loopback only): the SAME tiny web served over
127.0.0.1 through ``HttpFetcher`` must produce a crawl IDENTICAL to the
table-fetch route — attempts log (total order, statuses, virtual ts),
crawled text, warc_ts — with robots.txt fetched and parsed per host
over HTTP by the politeness shards.

This executes every piece of the live path the sandbox otherwise cannot:
urllib3 HEAD/GET (gateway mode), non-2xx (404 miss), non-html
content-type, robots-unreachable 404, Last-Modified -> warc_ts capture,
and connect/read timeout handling (`stages/fetcher.py`,
`robots.py LiveRobotsTable`, reference `WebAccesser.py:42-94`)."""

import pytest

from webcrawler_ray.config import CrawlConfig
from webcrawler_ray.pipelines.crawl import RayCrawler
from webcrawler_ray.state.politeness import STATUS_MISSING, STATUS_SAVED

ATT_COLS = ["fetch_seq", "url", "status", "round", "ts"]


@pytest.fixture(scope="module")
def gateway(tiny_web):
    from webcrawler_ray.webserve import WebGateway

    gw = WebGateway(tiny_web["pages"], tiny_web["robots"]).start()
    yield gw
    gw.stop()


def _run(pages, robots, wd, seeds_file, limit=40):
    cfg = CrawlConfig(limit=limit, num_seen_shards=3,
                      num_politeness_shards=2, parse_concurrency=2)
    c = RayCrawler(pages, robots, wd, cfg)
    seeds = open(seeds_file).read().splitlines()
    summary = c.crawl(seeds)
    return c, summary


@pytest.fixture(scope="module")
def both_runs(ray_session, tiny_web, gateway, tmp_path_factory):
    base = tmp_path_factory.mktemp("httpe2e")
    ct, st = _run(tiny_web["pages"], tiny_web["robots"],
                  str(base / "table"), tiny_web["seeds"])
    ch, sh = _run(gateway.base_url, gateway.base_url,
                  str(base / "http"), tiny_web["seeds"])
    yield ct, st, ch, sh
    ct.shutdown_services()
    ch.shutdown_services()


class TestHttpCrawlMatchesTableCrawl:
    def test_attempts_log_identical(self, both_runs):
        ct, _, ch, _ = both_runs
        a = (ct.attempts_dataset().to_pandas()[ATT_COLS]
             .sort_values("fetch_seq").reset_index(drop=True))
        b = (ch.attempts_dataset().to_pandas()[ATT_COLS]
             .sort_values("fetch_seq").reset_index(drop=True))
        assert a.equals(b)

    def test_multi_round_and_summary(self, both_runs):
        _, st, _, sh = both_runs
        assert sh["round"] >= 2  # the directive asks a >=2-round crawl
        assert {k: st[k] for k in ("round", "saved_total", "budget_left")} \
            == {k: sh[k] for k in ("round", "saved_total", "budget_left")}

    def test_crawled_text_and_warc_ts_identical(self, both_runs):
        ct, _, ch, _ = both_runs
        cols = ["url", "extracted_text", "title", "warc_ts"]
        a = (ct.crawled_dataset().to_pandas()[cols]
             .sort_values("url").reset_index(drop=True))
        b = (ch.crawled_dataset().to_pandas()[cols]
             .sort_values("url").reset_index(drop=True))
        assert len(a) > 0
        assert a.equals(b)

    def test_non_2xx_branch_exercised(self, both_runs):
        _, _, ch, _ = both_runs
        st = ch.attempts_dataset().to_pandas()["status"]
        assert (st == STATUS_SAVED).any()
        assert (st == STATUS_MISSING).any()    # 404 over live HTTP

    def test_non_html_content_type_gate(self, tiny_web, gateway):
        # decoy rows (lang outside html_langs) are served with a
        # non-html Content-Type: HEAD must flag exists=True,
        # is_html=False — the STATUS_NON_HTML input over live HTTP
        import pyarrow.compute as pc
        import pyarrow.parquet as pq

        from webcrawler_ray.stages.fetcher import HttpFetcher

        t = pq.read_table(tiny_web["pages"], columns=["url", "lang"])
        decoys = t.filter(pc.invert(pc.is_in(
            t.column("lang"), value_set=__import__("pyarrow").array(
                ["en", "pt"])))).column("url").to_pylist()
        assert decoys
        f = HttpFetcher(timeout_s=2.0, gateway=gateway.base_url)
        exists, is_html = f.head(decoys[:2])
        assert exists.all() and not is_html.any()


class TestHttpFetcherBranches:
    def test_read_timeout_is_a_miss(self, tiny_web):
        from webcrawler_ray.stages.fetcher import HttpFetcher
        from webcrawler_ray.webserve import WebGateway
        import pyarrow.parquet as pq

        url = pq.read_table(tiny_web["pages"],
                            columns=["url"]).column("url")[0].as_py()
        gw = WebGateway(tiny_web["pages"], tiny_web["robots"],
                        delays={url: 1.0}).start()
        try:
            f = HttpFetcher(timeout_s=0.2, gateway=gw.base_url)
            exists, _ = f.head([url])
            assert not exists[0]
            assert f.get([url]) == [None]
            assert f.get_pages([url]) == [(None, None)]
        finally:
            gw.stop()

    def test_connect_refused_is_a_miss(self):
        from webcrawler_ray.stages.fetcher import HttpFetcher

        # bind-then-close guarantees an unused loopback port
        import socket

        s = socket.socket()
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
        s.close()
        f = HttpFetcher(timeout_s=0.5)
        exists, is_html = f.head([f"http://127.0.0.1:{port}/x"])
        assert not exists[0] and not is_html[0]
        assert f.get([f"http://127.0.0.1:{port}/x"]) == [None]


class TestSitemapDiscovery:
    def test_discover_seeds_lists_fetchable_hosts_pages(
            self, ray_session, tiny_web, gateway):
        import pyarrow.parquet as pq

        from webcrawler_ray.discovery import discover_seeds
        from webcrawler_ray.functions.urls import split_host_resource

        r = pq.read_table(tiny_web["robots"])
        fetchable = {h for h, fe in zip(r.column("host").to_pylist(),
                                        r.column("fetchable").to_pylist())
                     if fe}
        all_hosts = set(r.column("host").to_pylist())
        got = discover_seeds(ray_session, sorted(all_hosts),
                             gateway=gateway.base_url,
                             timeout_s=2.0).to_pandas()
        # every page of every fetchable host, nothing else
        pages = pq.read_table(tiny_web["pages"],
                              columns=["url"]).column("url").to_pylist()
        want = {u for u in pages
                if split_host_resource(u)[0] in fetchable}
        assert set(got["url"]) == want
        assert set(got["host"]) <= fetchable
        # lastmod round-trips the capture timestamps (whole seconds)
        ts = dict(zip(
            pq.read_table(tiny_web["pages"]).column("url").to_pylist(),
            pq.read_table(tiny_web["pages"]).column(
                "warc_ts").to_pylist()))
        import datetime as dt

        for u, lm in zip(got["url"], got["lastmod_us"]):
            want_us = int(ts[u].replace(
                tzinfo=dt.timezone.utc).timestamp() * 1e6)
            assert int(lm) == want_us, u

    def test_discovered_seeds_drive_a_crawl(self, ray_session, tiny_web,
                                            gateway, tmp_path_factory):
        from webcrawler_ray.config import CrawlConfig
        from webcrawler_ray.discovery import discover_seeds
        from webcrawler_ray.pipelines.crawl import RayCrawler

        import pyarrow.parquet as pq

        r = pq.read_table(tiny_web["robots"])
        hosts = sorted(r.column("host").to_pylist())
        seeds = sorted(discover_seeds(
            ray_session, hosts, gateway=gateway.base_url,
            timeout_s=2.0).to_pandas()["url"])[:10]
        wd = str(tmp_path_factory.mktemp("disc") / "wd")
        cfg = CrawlConfig(limit=15, num_seen_shards=2,
                          num_politeness_shards=2, parse_concurrency=2)
        c = RayCrawler(gateway.base_url, gateway.base_url, wd, cfg)
        summary = c.crawl(seeds)
        try:
            assert summary["saved_total"] > 0
            att = c.attempts_dataset().to_pandas()
            assert set(seeds) <= set(att["url"])
        finally:
            c.shutdown_services()


class TestLiveRobots:
    def test_robots_roundtrip_and_unreachable(self, tiny_web, gateway):
        import pyarrow.parquet as pq

        from webcrawler_ray.robots import LiveRobotsTable, RobotsTable

        table = RobotsTable.from_parquet(tiny_web["robots"])
        live = LiveRobotsTable(gateway=gateway.base_url, timeout_s=2.0)
        r = pq.read_table(tiny_web["robots"])
        for host, fe in zip(r.column("host").to_pylist(),
                            r.column("fetchable").to_pylist()):
            want = table.get(host)
            got = live.get(host)
            assert got.fetchable == bool(fe)
            assert got.disallow == (want.disallow if fe else ())
            assert got.allow == (want.allow if fe else ())
            assert got.crawl_delay == (want.crawl_delay if fe else None)
            assert got.delay_seconds() == want.delay_seconds()
        # unknown host -> 404 -> allow-all
        missing = live.get("https://never-generated.test")
        assert not missing.fetchable and missing.allowed("/anything")

    def test_parse_render_roundtrip(self):
        from webcrawler_ray.robots import parse_robots_txt, render_robots_txt

        dis, al, cd = ("/s1/", "/*5$"), ("/s1/p1", "/s*/p2"), 1.5
        assert parse_robots_txt(render_robots_txt(dis, al, cd)) \
            == (dis, al, cd)
        # comments, case-insensitivity, other-agent groups ignored
        text = ("# banner\nUser-Agent: googlebot\nDisallow: /all\n\n"
                "user-agent: *\nDISALLOW: /a # trailing\nAllow: /a/b\n"
                "Crawl-Delay: 2.0\n")
        assert parse_robots_txt(text) == (("/a",), ("/a/b",), 2.0)
        # agent run: '*' anywhere in a consecutive User-agent run applies
        text2 = "User-agent: x\nUser-agent: *\nDisallow: /q\n"
        assert parse_robots_txt(text2) == (("/q",), (), None)
