"""End-to-end conformance: the Ray Data crawl must match the canonical
oracle EXACTLY — total crawl order, URL-seen set, per-URL byte-identical
extracted text, per-host counts (SURVEY.md §5.3)."""

import pyarrow.parquet as pq
import pytest

from webcrawler_ray.config import CrawlConfig
from webcrawler_ray.oracle.crawler import OracleCrawler
from webcrawler_ray.pipelines.crawl import RayCrawler
from webcrawler_ray.robots import RobotsTable


def oracle_run(web, limit):
    pages = {r["url"]: r for r in pq.read_table(web["pages"]).to_pylist()}
    robots = RobotsTable.from_parquet(web["robots"])
    seeds = open(web["seeds"]).read().splitlines()
    return OracleCrawler(pages, robots, CrawlConfig(limit=limit)).run(seeds)


@pytest.fixture(scope="module")
def ray_crawl(ray_session, tiny_web, tmp_path_factory):
    limit = 60
    wd = str(tmp_path_factory.mktemp("crawl") / "wd")
    cfg = CrawlConfig(limit=limit, num_seen_shards=4, num_politeness_shards=3,
                      parse_concurrency=2)
    crawler = RayCrawler(tiny_web["pages"], tiny_web["robots"], wd, cfg)
    seeds = open(tiny_web["seeds"]).read().splitlines()
    summary = crawler.crawl(seeds)
    oracle = oracle_run(tiny_web, limit)
    yield crawler, summary, oracle
    crawler.shutdown_services()


class TestConformance:
    def test_total_crawl_order_matches_oracle(self, ray_crawl):
        crawler, _, oracle = ray_crawl
        att = crawler.attempts_dataset().to_pandas().sort_values("fetch_seq")
        got = list(zip(att["fetch_seq"], att["url"], att["status"], att["round"]))
        want = [(r.fetch_seq, r.url, r.status, r.round) for r in oracle.records]
        assert got == want

    def test_virtual_timestamps_match(self, ray_crawl):
        crawler, _, oracle = ray_crawl
        att = crawler.attempts_dataset().to_pandas().sort_values("fetch_seq")
        got = list(zip(att["url"], att["ts"]))
        want = [(r.url, pytest.approx(r.ts)) for r in oracle.records]
        assert got == want

    def test_seen_set_matches(self, ray_crawl):
        crawler, _, oracle = ray_crawl
        att = crawler.attempts_dataset().to_pandas()
        assert set(att["url"]) == oracle.seen

    def test_saved_count_limit_plus_one(self, ray_crawl):
        _, summary, oracle = ray_crawl
        assert summary["saved_total"] == len(oracle.saved_records) == 61

    def test_extracted_text_byte_identical(self, ray_crawl, tiny_web):
        # BASELINE.json per-row invariant: byte-identical extracted text
        crawler, _, oracle = ray_crawl
        crawled = crawler.crawled_dataset().to_pandas()
        golden = {r["url"]: r["text"]
                  for r in pq.read_table(tiny_web["pages"]).to_pylist()}
        assert len(crawled) > 0
        for _, row in crawled.iterrows():
            assert row["extracted_text"] == golden[row["url"]], row["url"]
        want = {r.url: r.extracted_text for r in oracle.saved_records}
        got = dict(zip(crawled["url"], crawled["extracted_text"]))
        assert got == want

    def test_titles_and_first20_match(self, ray_crawl):
        crawler, _, oracle = ray_crawl
        crawled = crawler.crawled_dataset().to_pandas()
        want_t = {r.url: r.title for r in oracle.saved_records}
        want_f = {r.url: r.first_n for r in oracle.saved_records}
        assert dict(zip(crawled["url"], crawled["title"])) == want_t
        assert dict(zip(crawled["url"], crawled["first_n"])) == want_f

    def test_host_counts_match(self, ray_crawl):
        crawler, _, oracle = ray_crawl
        hc = crawler.host_counts().to_pandas()
        got = dict(zip(hc["host"], hc["count()"]))
        assert got == oracle.host_counts

    def test_crawled_parquet_resumable_layout(self, ray_crawl):
        # one directory per round with _SUCCESS markers (resumable output)
        import os
        crawler, summary, _ = ray_crawl
        rounds = sorted(os.listdir(os.path.join(crawler.workdir, "rounds")))
        assert len(rounds) >= 2
        for r in rounds:
            assert os.path.exists(
                os.path.join(crawler.workdir, "rounds", r, "_SUCCESS"))

    def test_n_links_matches_oracle(self, ray_crawl):
        crawler, _, oracle = ray_crawl
        crawled = crawler.crawled_dataset().to_pandas()
        want = {r.url: r.n_links for r in oracle.saved_records}
        assert dict(zip(crawled["url"], crawled["n_links"])) == want


class TestExchangeFetchRoute:
    """Force the cluster-scale fetch paths (bucketed store + groupby
    exchange instead of metadata broadcast) and verify identical results —
    the 100 TB route must produce the same crawl as the test route."""

    def test_forced_exchange_route_matches_oracle(self, ray_session,
                                                  tiny_web,
                                                  tmp_path_factory):
        limit = 40
        wd = str(tmp_path_factory.mktemp("exch") / "wd")
        cfg = CrawlConfig(limit=limit, num_seen_shards=3,
                          num_politeness_shards=2,
                          fetch_broadcast_max_bytes=0,  # force bucketed store
                          pages_store_buckets=8)
        cfg.extra["fetch_meta_broadcast_max_bytes"] = 0  # force exchange
        cfg.extra["direct_fetch_max_rows"] = 0
        crawler = RayCrawler(tiny_web["pages"], tiny_web["robots"], wd, cfg)
        seeds = open(tiny_web["seeds"]).read().splitlines()
        summary = crawler.crawl(seeds)
        oracle = oracle_run(tiny_web, limit)
        try:
            att = crawler.attempts_dataset().to_pandas().sort_values("fetch_seq")
            assert list(att["url"]) == [r.url for r in oracle.records]
            assert summary["saved_total"] == len(oracle.saved_records)
            crawled = crawler.crawled_dataset().to_pandas()
            want = {r.url: r.extracted_text for r in oracle.saved_records}
            assert dict(zip(crawled["url"],
                            crawled["extracted_text"])) == want
        finally:
            crawler.shutdown_services()


class TestBucketedFlagsRoute:
    """flags_bucketed=True: HEAD flags answered from the bucketed store's
    (url, lang) projection — the 10^10-URL mode. The crawl must be
    IDENTICAL to the broadcast-index route, and no driver-built flag
    index may exist anywhere on the path."""

    def test_flags_bucketed_matches_oracle(self, ray_session, tiny_web,
                                           tmp_path_factory):
        limit = 40
        wd = str(tmp_path_factory.mktemp("fbuck") / "wd")
        cfg = CrawlConfig(limit=limit, num_seen_shards=3,
                          num_politeness_shards=2,
                          fetch_broadcast_max_bytes=0,  # force bucketed store
                          pages_store_buckets=8,
                          flags_bucketed=True)
        crawler = RayCrawler(tiny_web["pages"], tiny_web["robots"], wd, cfg)
        seeds = open(tiny_web["seeds"]).read().splitlines()
        summary = crawler.crawl(seeds)
        oracle = oracle_run(tiny_web, limit)
        try:
            # the driver-built broadcast index must NOT exist on this path
            assert crawler.store._flags_ref is None
            att = crawler.attempts_dataset().to_pandas().sort_values(
                "fetch_seq")
            got = list(zip(att["fetch_seq"], att["url"], att["status"],
                           att["round"]))
            want = [(r.fetch_seq, r.url, r.status, r.round)
                    for r in oracle.records]
            assert got == want
            assert summary["saved_total"] == len(oracle.saved_records)
        finally:
            crawler.shutdown_services()

    def test_flags_bucketed_auto_follows_store(self, ray_session, tiny_web,
                                               tmp_path_factory):
        """flags_bucketed=None (the default) inherits the store's
        size-derived decision: a table too big to broadcast auto-selects
        the bucketed flag route with NO configuration, and the crawl is
        identical to the oracle (attempts output, saved count)."""
        limit = 40
        wd = str(tmp_path_factory.mktemp("fauto") / "wd")
        cfg = CrawlConfig(limit=limit, num_seen_shards=3,
                          num_politeness_shards=2,
                          fetch_broadcast_max_bytes=0,  # "large" table
                          pages_store_buckets=8)        # flags_bucketed unset
        crawler = RayCrawler(tiny_web["pages"], tiny_web["robots"], wd, cfg)
        seeds = open(tiny_web["seeds"]).read().splitlines()
        summary = crawler.crawl(seeds)
        oracle = oracle_run(tiny_web, limit)
        try:
            assert crawler.store.flags_bucketed is True   # auto-derived
            assert crawler.store._flags_ref is None       # no driver index
            att = crawler.attempts_dataset().to_pandas().sort_values(
                "fetch_seq")
            got = list(zip(att["fetch_seq"], att["url"], att["status"],
                           att["round"]))
            want = [(r.fetch_seq, r.url, r.status, r.round)
                    for r in oracle.records]
            assert got == want
            assert summary["saved_total"] == len(oracle.saved_records)
        finally:
            crawler.shutdown_services()

    def test_flags_auto_small_table_stays_broadcast(self, tiny_web,
                                                    tmp_path_factory):
        from webcrawler_ray.stages.fetch import PagesStore

        cfg = CrawlConfig()  # tiny table, default byte ceiling
        s = PagesStore(tiny_web["pages"], cfg,
                       str(tmp_path_factory.mktemp("fsmall") / "store"))
        assert s.bucketed is False and s.flags_bucketed is False


class TestStoreBucketCountRecorded:
    """The on-disk store records the bucket count it was built with; a
    LATER config with a different pages_store_buckets must hash lookups
    with the RECORDED value (else every URL silently misses)."""

    def test_lookup_uses_recorded_buckets(self, ray_session, tiny_web,
                                          tmp_path_factory):
        import ray as _ray

        import pyarrow as pa

        from webcrawler_ray.config import CrawlConfig
        from webcrawler_ray.stages.fetch import PagesStore

        store_dir = str(tmp_path_factory.mktemp("storeB") / "store")
        cfg8 = CrawlConfig(fetch_broadcast_max_bytes=0,
                           pages_store_buckets=8, flags_bucketed=True)
        s8 = PagesStore(tiny_web["pages"], cfg8, store_dir)
        s8.prepare(_ray)
        assert s8.store_buckets() == 8

        # reopen the SAME layout with a different configured B
        cfg4 = CrawlConfig(fetch_broadcast_max_bytes=0,
                           pages_store_buckets=4, flags_bucketed=True)
        s4 = PagesStore(tiny_web["pages"], cfg4, store_dir)
        s4.prepare(_ray)
        assert s4.store_buckets() == 8  # recorded, not configured

        import pyarrow.dataset as pads

        urls = (pads.dataset(tiny_web["pages"])
                .to_table(columns=["url"]).column("url").to_pylist()[:50])
        batch = pa.table({"url": pa.array(urls, pa.string())})
        flagged = s4.add_flags_fn()(batch)
        assert flagged.column("in_table").to_pylist() == [True] * len(urls)


class TestWidePolitenessStage:
    """The politeness stage must provably widen: P=16 shards (4x the
    default) and cluster-derived sizing both preserve exact conformance —
    the shard count is pure parallelism, never semantics."""

    def test_p16_matches_oracle(self, ray_session, tiny_web,
                                tmp_path_factory):
        limit = 40
        wd = str(tmp_path_factory.mktemp("p16") / "wd")
        cfg = CrawlConfig(limit=limit, num_seen_shards=3,
                          num_politeness_shards=16)
        crawler = RayCrawler(tiny_web["pages"], tiny_web["robots"], wd, cfg)
        seeds = open(tiny_web["seeds"]).read().splitlines()
        summary = crawler.crawl(seeds)
        oracle = oracle_run(tiny_web, limit)
        try:
            att = crawler.attempts_dataset().to_pandas().sort_values(
                "fetch_seq")
            got = list(zip(att["fetch_seq"], att["url"], att["status"],
                           att["round"]))
            want = [(r.fetch_seq, r.url, r.status, r.round)
                    for r in oracle.records]
            assert got == want
            assert summary["saved_total"] == len(oracle.saved_records)
        finally:
            crawler.shutdown_services()

    def test_cluster_derived_shard_count(self, ray_session, tiny_web,
                                         tmp_path_factory):
        import ray

        wd = str(tmp_path_factory.mktemp("pauto") / "wd")
        cfg = CrawlConfig(limit=5)  # BOTH shard counts default to None
        crawler = RayCrawler(tiny_web["pages"], tiny_web["robots"], wd, cfg)
        crawler._start_services()
        try:
            want = max(4, int(ray.cluster_resources().get("CPU", 4)) // 2)
            assert cfg.num_politeness_shards == want
            assert len(crawler.pol) == want
            assert cfg.num_seen_shards == want
            assert len(crawler.seen) == want
        finally:
            crawler.shutdown_services()


class TestSmallWebConformance:
    """Same exact-order conformance at the 'small' scale (more hosts,
    deeper rounds, different seed — FIXTURES.md §5)."""

    def test_total_order_and_seen_match(self, ray_session, small_web,
                                        tmp_path_factory):
        limit = 300
        wd = str(tmp_path_factory.mktemp("crawlS") / "wd")
        cfg = CrawlConfig(limit=limit, num_seen_shards=5,
                          num_politeness_shards=3)
        crawler = RayCrawler(small_web["pages"], small_web["robots"], wd, cfg)
        seeds = open(small_web["seeds"]).read().splitlines()
        summary = crawler.crawl(seeds)
        oracle = oracle_run(small_web, limit)
        try:
            att = crawler.attempts_dataset().to_pandas().sort_values("fetch_seq")
            got = list(zip(att["fetch_seq"], att["url"], att["status"],
                           att["round"]))
            want = [(r.fetch_seq, r.url, r.status, r.round)
                    for r in oracle.records]
            assert got == want
            assert set(att["url"]) == oracle.seen
            assert summary["saved_total"] == len(oracle.saved_records)
        finally:
            crawler.shutdown_services()


class TestMetaBroadcastThreshold:
    def test_explicit_value_wins(self):
        from webcrawler_ray.pipelines.crawl import _meta_broadcast_max

        cfg = CrawlConfig()
        cfg.extra["fetch_meta_broadcast_max_bytes"] = 12345
        assert _meta_broadcast_max(cfg) == 12345
        cfg.extra["fetch_meta_broadcast_max_bytes"] = 0  # force exchange
        assert _meta_broadcast_max(cfg) == 0

    def test_default_derives_from_object_store(self, ray_session):
        import ray as _ray

        from webcrawler_ray.pipelines.crawl import _meta_broadcast_max

        got = _meta_broadcast_max(CrawlConfig())
        oss = int(_ray.cluster_resources().get("object_store_memory", 0))
        assert got == min(1 << 30, oss // 32)
        assert 0 < got <= 1 << 30


class TestChunkedScheduleE2E:
    def test_chunked_politeness_matches_oracle_order(
            self, ray_session, tiny_web, tmp_path):
        """Force every pshard slice through the skew-split path
        (politeness_chunk_rows=5, far below any round slice) — the
        total crawl order must STILL match the oracle exactly."""
        limit = 60
        wd = str(tmp_path / "wd_chunked")
        cfg = CrawlConfig(limit=limit, num_seen_shards=4,
                          num_politeness_shards=3, parse_concurrency=2,
                          politeness_chunk_rows=5)
        crawler = RayCrawler(tiny_web["pages"], tiny_web["robots"], wd, cfg)
        seeds = open(tiny_web["seeds"]).read().splitlines()
        try:
            crawler.crawl(seeds)
            att = (crawler.attempts_dataset().to_pandas()
                   .sort_values("fetch_seq"))
            oracle = oracle_run(tiny_web, limit)
            got = list(zip(att["fetch_seq"], att["url"], att["status"]))
            want = [(r.fetch_seq, r.url, r.status)
                    for r in oracle.records]
            assert got == want
        finally:
            crawler.shutdown_services()
