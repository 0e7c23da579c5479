"""Round-5 ADVICE regression tests: oracle/engine parity edges that a
code reader flagged — each test pins BOTH sides of the contract so a
future drift on either side fails loudly.

No Ray session needed: these are pure-function + DuckDB checks.
"""

import os

import duckdb
import pyarrow as pa
import pyarrow.parquet as pq
import pytest


class TestPolitenessDelayOracleParity:
    """The crawl_politeness_audit oracle must recompute the EXACT
    delay semantics the scheduler enforces (`HostRules.delay_seconds`,
    which — like the reference `Host.py:95-114` — clamps only the top
    end at 3.0 and returns raw sub-floor values like 0.05 as-is).
    Grid includes the [0.05, 0.1) window the ADVICE worried about."""

    GRID = [
        # (crawl_delay, fetchable)
        (None, True), (None, False),
        (0.05, True), (0.05, False),
        (0.09, True), (0.1, True), (0.5, True),
        (2.0, True), (3.0, True), (5.0, True), (5.0, False),
    ]

    def test_case_expression_matches_delay_seconds(self, tmp_path):
        from webcrawler_ray.pipelines.registry import (
            _CRAWL_ORACLE_TEMPLATES,
        )
        from webcrawler_ray.robots import HostRules

        hosts = [f"https://h{i}.test" for i in range(len(self.GRID))]
        rules = {
            h: HostRules(host=h, crawl_delay=cd, fetchable=fe)
            for h, (cd, fe) in zip(hosts, self.GRID)
        }
        # robots parquet in the shape webgen emits
        rp = str(tmp_path / "robots.parquet")
        pq.write_table(pa.table({
            "host": pa.array(hosts, pa.string()),
            "disallow": pa.array([[] for _ in hosts],
                                 pa.list_(pa.string())),
            "allow": pa.array([[] for _ in hosts],
                              pa.list_(pa.string())),
            "crawl_delay": pa.array([cd for cd, _ in self.GRID],
                                    pa.float64()),
            "fetchable": pa.array([fe for _, fe in self.GRID],
                                  pa.bool_()),
        }), rp)

        # attempts dump: per host, two saved fetches with gap 0.07 —
        # inside [0.05, 0.1), so a SQL-side floor-to-0.1 would flag a
        # violation delay_seconds() does not (and vice versa for the
        # wide-delay hosts a third fetch at gap 10 never flags).
        gap = 0.07
        h_col, ts_col, st_col = [], [], []
        for i, h in enumerate(hosts):
            base = 100.0 * i
            for ts in (base, base + gap, base + gap + 10.0):
                h_col.append(h)
                ts_col.append(ts)
                st_col.append(200)
        dp = str(tmp_path / "attempts.parquet")
        pq.write_table(pa.table({
            "host": pa.array(h_col, pa.string()),
            "ts": pa.array(ts_col, pa.float64()),
            "status": pa.array(st_col, pa.int64()),
        }), dp)

        sql = _CRAWL_ORACLE_TEMPLATES["crawl_politeness_audit"].format(
            dump=dp, web_robots=rp)
        got = duckdb.sql(sql).df()

        expected_violations = sum(
            1 for h in hosts if gap < rules[h].delay_seconds() - 1e-9)
        assert int(got["n_hosts"].iloc[0]) == len(hosts)
        assert int(got["n_gaps"].iloc[0]) == 2 * len(hosts)
        assert int(got["n_violations"].iloc[0]) == expected_violations
        # the window in question is genuinely exercised: a 0.05-delay
        # fetchable host with gap 0.07 is NOT a violation on either side
        assert rules[hosts[2]].delay_seconds() == pytest.approx(0.05)


class TestSurtPathlessOracleParity:
    """surt_key('https://example.com') -> 'com,example)/' ; the cdx
    oracle SQL must produce the identical key for pathless URLs."""

    URLS = [
        "https://example.com",          # pathless, no trailing slash
        "https://example.com/",         # root path
        "https://News.Example.com/a/B",  # case folding + subdomain
        "http://host0.test/s1/p3",
    ]

    def test_pathless_surt_key(self):
        from webcrawler_ray.functions.urls import surt_key

        assert surt_key("https://example.com") == "com,example)/"
        assert surt_key("https://example.com/") == "com,example)/"

    def test_sql_parity(self, tmp_path):
        from webcrawler_ray.functions.urls import surt_key
        from webcrawler_ray.pipelines.registry import (
            _CRAWL_ORACLE_TEMPLATES,
        )

        dump_dir = tmp_path / "corpus_dump"
        dump_dir.mkdir()
        pq.write_table(pa.table({
            "url": pa.array(self.URLS, pa.string()),
            "warc_ts_us": pa.array(
                [1_600_000_000_000_000 + i for i in
                 range(len(self.URLS))], pa.int64()),
            "html_str": pa.array(["<html></html>"] * len(self.URLS),
                                 pa.string()),
        }), str(dump_dir / "part.parquet"))

        sql = _CRAWL_ORACLE_TEMPLATES["crawl_cdx"].format(
            corpus_dump=str(dump_dir))
        got = duckdb.sql(sql).df()
        assert list(got["surt_key"]) == sorted(
            surt_key(u) for u in self.URLS)
        for k, u in zip(got["surt_key"], got["url"]):
            assert k == surt_key(u)


class TestSitemapLastmodTolerance:
    """sitemaps.org allows date-only and offset W3C-datetime lastmod
    values; a sloppy one must not raise out of the read task."""

    def test_accepted_forms(self):
        from webcrawler_ray.sources.sitemap import _lastmod_us

        full = _lastmod_us("2005-01-01T12:00:00Z")
        assert full == 1104580800000000
        # date-only == midnight UTC of the same day
        assert _lastmod_us("2005-01-01") == full - 12 * 3600 * 10**6
        # numeric offset normalizes to the same instant
        assert _lastmod_us("2005-01-01T14:00:00+02:00") == full
        # fractional seconds
        assert _lastmod_us("2005-01-01T12:00:00.500Z") == full + 500_000
        # garbage degrades to 0, never raises
        assert _lastmod_us("not-a-date") == 0
        assert _lastmod_us("2005-13-45") == 0

    def test_sloppy_lastmod_keeps_urlset(self):
        from webcrawler_ray.sources.sitemap import parse_urlset

        xml = (b'<?xml version="1.0"?>'
               b'<urlset xmlns="http://www.sitemaps.org/schemas/'
               b'sitemap/0.9">'
               b"<url><loc>https://a.test/1</loc>"
               b"<lastmod>2005-01-01</lastmod></url>"
               b"<url><loc>https://a.test/2</loc>"
               b"<lastmod>garbage</lastmod></url>"
               b"<url><loc>https://a.test/3</loc>"
               b"<lastmod>2005-01-01T12:00:00Z</lastmod></url>"
               b"</urlset>")
        got = parse_urlset(xml)
        assert [u for u, _ in got] == [
            "https://a.test/1", "https://a.test/2", "https://a.test/3"]
        assert got[1][1] == 0
        assert got[2][1] == 1104580800000000


class TestTableFetcherGuard:
    """TableFetcher is the small-web fetcher seam implementation; a
    pages table bigger than fetch_broadcast_max_bytes must be refused
    with a pointer at PagesStore instead of silently materializing."""

    def _pages(self, tmp_path, n=8):
        p = str(tmp_path / "pages.parquet")
        pq.write_table(pa.table({
            "url": pa.array([f"https://h.test/p{i}" for i in range(n)],
                            pa.string()),
            "warc_ts": pa.array([1_600_000_000_000_000 + i
                                 for i in range(n)],
                                pa.timestamp("us")),
            "html": pa.array([b"<html>x</html>"] * n, pa.binary()),
            "text": pa.array(["x"] * n, pa.string()),
            "lang": pa.array(["en"] * n, pa.string()),
        }), p)
        return p

    def test_too_big_raises(self, tmp_path):
        from webcrawler_ray.stages.fetcher import TableFetcher

        p = self._pages(tmp_path)
        with pytest.raises(ValueError, match="PagesStore"):
            TableFetcher(p, max_bytes=1)

    def test_small_table_loads(self, tmp_path):
        from webcrawler_ray.stages.fetcher import TableFetcher

        p = self._pages(tmp_path)
        f = TableFetcher(p)
        exists, is_html = f.head(["https://h.test/p0",
                                  "https://h.test/nope"])
        assert list(exists) == [True, False]
        assert list(is_html) == [True, False]


class TestArchiveSummaryOracleParity:
    """Multi-file exercise of the WARC/WET/WAT value-checked summary:
    the per-file fold over ACTUAL archive bytes must match the oracle
    SQL recomputation from the corpus dump + manifest — including file
    grouping at a small rotation size (the sf checks only ever produce
    one file), and the '<MISSING>' coverage failure mode."""

    def _corpus(self, n=23):
        urls = [f"https://h{i % 3}.test/p{i}" for i in range(n)]
        htmls = [f"<html><body>page {i} é</body></html>"
                 .encode("utf-8") for i in range(n)]
        ts = [1_600_000_000_000_000 + i * 1_000_000 for i in range(n)]
        return urls, htmls, ts

    def test_warc_summary_multi_file(self, ray_session, tmp_path):
        import hashlib

        import pandas as pd

        from webcrawler_ray.sinks.warc import write_warc
        from webcrawler_ray.sources.warc import read_warc

        ray = ray_session
        urls, htmls, ts = self._corpus()
        ds = ray.data.from_arrow(pa.table({
            "url": pa.array(urls, pa.string()),
            "html": pa.array(htmls, pa.binary()),
            "warc_ts": pa.array(ts, pa.int64())}))
        out = str(tmp_path / "warc")
        write_warc(ds, out, records_per_file=7).materialize()
        files = [f for f in os.listdir(out) if f.endswith(".warc.gz")]
        assert len(files) >= 3  # rotation actually split

        # Ray side: per-record digests from the actual bytes, per-file
        # fold exactly as _archive_file_summary does
        rb = read_warc(ray, out).to_pandas()
        rb["d"] = [hashlib.sha256(h).hexdigest() for h in rb["html"]]
        rb["nb"] = [len(h) for h in rb["html"]]
        got = (rb.sort_values("url").groupby("warc_file")
               .agg(n_records=("url", "size"),
                    n_payload_bytes=("nb", "sum"),
                    content_digest=("d", lambda s: hashlib.sha256(
                        "".join(s).encode()).hexdigest()))
               .reset_index().sort_values("warc_file")
               .reset_index(drop=True))

        # oracle side: the committed template over a synthetic corpus
        # dump + the (file, url) manifest
        from webcrawler_ray.pipelines.registry import (
            _CRAWL_ORACLE_TEMPLATES,
        )

        dump_dir = tmp_path / "corpus_dump"
        dump_dir.mkdir()
        pq.write_table(pa.table({
            "url": pa.array(urls, pa.string()),
            "html_str": pa.array([h.decode("utf-8") for h in htmls],
                                 pa.string())}),
            str(dump_dir / "part.parquet"))
        mani_dir = tmp_path / "warc_manifest"
        mani_dir.mkdir()
        pq.write_table(pa.table({
            "warc_file": pa.array(list(rb["warc_file"]), pa.string()),
            "url": pa.array(list(rb["url"]), pa.string())}),
            str(mani_dir / "part.parquet"))
        sql = _CRAWL_ORACLE_TEMPLATES["crawl_warc"].format(
            warc_manifest=str(mani_dir), corpus_dump=str(dump_dir))
        want = duckdb.sql(sql).df()
        pd.testing.assert_frame_equal(
            got.astype({"n_records": "int64",
                        "n_payload_bytes": "int64"}),
            want, check_dtype=False)

        # coverage failure mode: a corpus url in NO archive surfaces as
        # a '<MISSING>' file row on the oracle side
        pq.write_table(pa.table({
            "url": pa.array(urls + ["https://h9.test/ghost"],
                            pa.string()),
            "html_str": pa.array(
                [h.decode("utf-8") for h in htmls] + ["<html></html>"],
                pa.string())}),
            str(dump_dir / "part.parquet"))
        want2 = duckdb.sql(sql).df()
        assert "<MISSING>" in set(want2["warc_file"])

    def test_wat_json_body_parity(self, tmp_path):
        """The WAT oracle's SQL-built JSON body is byte-identical to the
        sink's json.dumps layout, including unicode titles and nulls."""
        import json

        rows = [
            ("https://a.test/1", "Título — ünï", 3, 17),
            ("https://a.test/2", None, 0, 0),
            ('https://a.test/3?q="x"', 'quote "t" \\ back', 12, 999),
        ]
        bodies = [json.dumps(
            {"n_links": nl, "text_len": tl, "title": ti, "url": u},
            ensure_ascii=False, sort_keys=True) for u, ti, nl, tl in rows]
        got = duckdb.sql("""
            SELECT '{"n_links": ' || n_links ||
                   ', "text_len": ' || tl ||
                   ', "title": ' || COALESCE(to_json(title)::VARCHAR,
                                             'null') ||
                   ', "url": ' || to_json(url)::VARCHAR || '}' AS body
            FROM (SELECT * FROM (VALUES
                ('https://a.test/1', 'Título — ünï', 3, 17),
                ('https://a.test/2', NULL, 0, 0),
                ('https://a.test/3?q="x"', 'quote "t" \\ back', 12, 999))
                AS t(url, title, n_links, tl))
        """).df()
        assert list(got["body"]) == bodies
