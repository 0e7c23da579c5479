"""Tests for the canonical oracle crawler (SURVEY.md §5.1, §5.5)."""

from collections import defaultdict

import pyarrow.parquet as pq
import pytest

from webcrawler_ray.config import CrawlConfig
from webcrawler_ray.oracle.crawler import (
    STATUS_SAVED,
    OracleCrawler,
)
from webcrawler_ray.robots import RobotsTable


@pytest.fixture(scope="module")
def tiny(tiny_web):
    pages = {r["url"]: r for r in pq.read_table(tiny_web["pages"]).to_pylist()}
    robots = RobotsTable.from_parquet(tiny_web["robots"])
    seeds = open(tiny_web["seeds"]).read().splitlines()
    return pages, robots, seeds


def run(tiny, **cfg):
    pages, robots, seeds = tiny
    return OracleCrawler(pages, robots, CrawlConfig(**cfg)).run(seeds)


class TestBudget:
    def test_limit_plus_one_quirk(self, tiny):  # ST6 (WorkersPipeline.py:271-272)
        res = run(tiny, limit=10)
        assert len(res.saved_records) == 11

    def test_no_quirk_mode(self, tiny):
        res = run(tiny, limit=10, plus_one_quirk=False)
        assert len(res.saved_records) == 10

    def test_unbounded_crawl_terminates(self, tiny):
        res = run(tiny, limit=10**6)
        assert res.rounds < 50
        assert len(res.saved_records) > 100  # reaches most of the tiny web


class TestDeterminism:
    def test_identical_runs(self, tiny):
        a, b = run(tiny, limit=40), run(tiny, limit=40)
        assert [(r.url, r.ts, r.status) for r in a.records] == \
               [(r.url, r.ts, r.status) for r in b.records]


class TestInvariants:
    def test_no_url_attempted_twice(self, tiny):  # property §5.5
        res = run(tiny, limit=10**6)
        urls = [r.url for r in res.records]
        assert len(urls) == len(set(urls))

    def test_politeness_gap_per_host(self, tiny):  # virtual-time gap >= delay
        pages, robots, seeds = tiny
        res = run(tiny, limit=10**6)
        saved_ts = defaultdict(list)
        for r in res.records:
            if r.saved:
                saved_ts[r.host].append(r.ts)
        for host, tss in saved_ts.items():
            d = robots.get(host).delay_seconds()
            for a, b in zip(tss, tss[1:]):
                assert b - a >= d - 1e-9, (host, d, a, b)

    def test_attempted_marked_even_when_not_saved(self, tiny):
        # Worker.py:202 — mark-crawled runs for blocked/missed URLs too
        res = run(tiny, limit=10**6)
        non_saved = [r for r in res.records if not r.saved]
        assert non_saved, "fixture must include blocked/missing URLs"
        assert all(r.url in res.seen for r in non_saved)

    def test_host_counts_count_attempts(self, tiny):
        res = run(tiny, limit=10**6)
        per_host = defaultdict(int)
        for r in res.records:
            per_host[r.host] += 1
        assert dict(per_host) == res.host_counts

    def test_fetch_seq_is_total_order(self, tiny):
        res = run(tiny, limit=10**6)
        assert [r.fetch_seq for r in res.records] == list(range(len(res.records)))

    def test_extracted_text_matches_golden(self, tiny):
        # the byte-identical invariant vs the pages.text golden column
        pages, _, _ = tiny
        res = run(tiny, limit=10**6)
        for r in res.saved_records:
            assert r.extracted_text == pages[r.url]["text"], r.url


class TestGates:
    def test_status_mix_present(self, tiny):
        res = run(tiny, limit=10**6)
        statuses = {r.status for r in res.records}
        assert STATUS_SAVED in statuses
        assert len(statuses) >= 3  # saved + at least two failure classes

    def test_seed_fetch_miss_attempted_not_saved(self, tiny):
        pages, robots, seeds = tiny
        res = run(tiny, limit=10**6)
        missing = [s for s in seeds if "missing" in s][0]
        rec = [r for r in res.records if "missing" in r.url]
        assert rec and not rec[0].saved
