"""Tests for the deterministic synthetic web generator (FIXTURES.md)."""

import pyarrow.parquet as pq

from webcrawler_ray.functions.htmlparse import extract_visible_text
from webcrawler_ray.webgen import HTML_LANGS, WebSpec, generate_web


class TestGenerate:
    def test_schema_matches_input_hint(self, tiny_web):
        s = pq.read_schema(tiny_web["pages"])
        assert s.names == ["url", "warc_ts", "html", "text", "lang"]
        assert str(s.field("warc_ts").type) == "timestamp[us]"
        assert str(s.field("html").type) == "binary"

    def test_text_is_golden_extraction(self, tiny_web):
        t = pq.read_table(tiny_web["pages"])
        for row in t.to_pylist():
            assert extract_visible_text(row["html"]) == row["text"]

    def test_deterministic_across_calls(self, tmp_path):
        a = generate_web(str(tmp_path / "a"), WebSpec(n_hosts=3, pages_per_host=5, seed=1))
        b = generate_web(str(tmp_path / "b"), WebSpec(n_hosts=3, pages_per_host=5, seed=1))
        ta, tb = pq.read_table(a["pages"]), pq.read_table(b["pages"])
        assert ta.equals(tb)

    def test_cache_skips_regeneration(self, tiny_web):
        # second call with same spec returns instantly via _WEBGEN_DONE
        import os
        out = os.path.dirname(tiny_web["pages"])
        m = generate_web(out, WebSpec(n_hosts=5, pages_per_host=20, seed=42))
        assert m["pages"] == tiny_web["pages"]

    def test_mega_host_skew(self, tiny_web):
        t = pq.read_table(tiny_web["pages"], columns=["url"])
        urls = t.column("url").to_pylist()
        h0 = sum(1 for u in urls if u.startswith("https://host0.test/"))
        h1 = sum(1 for u in urls if u.startswith("https://host1.test/"))
        assert h0 >= 8 * h1  # ~10x skew

    def test_decoys_present(self, tiny_web):
        t = pq.read_table(tiny_web["pages"], columns=["lang"])
        langs = set(t.column("lang").to_pylist())
        assert "octet" in langs
        assert langs - {"octet"} <= set(HTML_LANGS)

    def test_robots_schema(self, tiny_web):
        s = pq.read_schema(tiny_web["robots"])
        assert s.names == ["host", "disallow", "allow", "crawl_delay",
                           "fetchable"]
