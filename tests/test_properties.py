"""Property tests (SURVEY.md §5.5): random link graphs — no URL crawled
twice, politeness gap >= delay per host in virtual time, frontier
eventually empties, budget respected."""

from collections import defaultdict

import pyarrow.parquet as pq
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from webcrawler_ray.config import CrawlConfig
from webcrawler_ray.oracle.crawler import OracleCrawler
from webcrawler_ray.robots import RobotsTable
from webcrawler_ray.webgen import WebSpec, generate_web

_CACHE: dict = {}


def _web(tmp_base, seed, n_hosts, ppH):
    key = (seed, n_hosts, ppH)
    if key not in _CACHE:
        out = f"{tmp_base}/w{seed}_{n_hosts}_{ppH}"
        meta = generate_web(out, WebSpec(n_hosts=n_hosts, pages_per_host=ppH,
                                         seed=seed, n_seeds=3))
        pages = {r["url"]: r
                 for r in pq.read_table(meta["pages"]).to_pylist()}
        robots = RobotsTable.from_parquet(meta["robots"])
        seeds = open(meta["seeds"]).read().splitlines()
        _CACHE[key] = (pages, robots, seeds)
    return _CACHE[key]


@pytest.fixture(scope="module")
def tmp_base(tmp_path_factory):
    return str(tmp_path_factory.mktemp("propwebs"))


@settings(max_examples=8, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(seed=st.integers(0, 10_000), n_hosts=st.integers(2, 8),
       ppH=st.integers(3, 15), limit=st.integers(1, 400))
def test_oracle_invariants_on_random_graphs(tmp_base, seed, n_hosts, ppH,
                                            limit):
    pages, robots, seeds = _web(tmp_base, seed, n_hosts, ppH)
    cfg = CrawlConfig(limit=limit)
    res = OracleCrawler(pages, robots, cfg).run(seeds)

    # terminates within the round bound
    assert res.rounds < cfg.max_rounds

    # no URL attempted twice; seen == attempted
    urls = [r.url for r in res.records]
    assert len(urls) == len(set(urls))
    assert set(urls) == res.seen

    # budget: saves stop at exactly limit+1 (or graph exhausted below it)
    n_saved = len(res.saved_records)
    assert n_saved <= limit + 1

    # politeness: virtual-time gap between saved requests per host >= delay
    by_host = defaultdict(list)
    for r in res.records:
        if r.saved:
            by_host[r.host].append(r.ts)
    for host, tss in by_host.items():
        d = robots.get(host).delay_seconds()
        tss = sorted(tss)
        for a, b in zip(tss, tss[1:]):
            assert b - a >= d - 1e-9

    # fetch_seq is a dense total order and monotone in (round, ts)
    assert [r.fetch_seq for r in res.records] == list(range(len(res.records)))
    for a, b in zip(res.records, res.records[1:]):
        assert (a.round, a.ts) <= (b.round, b.ts) or a.round < b.round

    # every saved page's text is the golden extraction
    for r in res.saved_records:
        assert r.extracted_text == pages[r.url]["text"]

    # robots-denied URLs never save; saved URLs always pass the blocklist
    from webcrawler_ray.functions.urls import passes_extension_blocklist

    for r in res.records:
        if r.saved:
            assert passes_extension_blocklist(r.url)
            assert robots.get(r.host).allowed(r.resource)
