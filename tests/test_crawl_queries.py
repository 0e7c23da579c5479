"""Tests for the crawl-family registry queries (rows-only operators)."""

import pandas as pd
import pytest

from tests.conftest import SF_DIR


@pytest.fixture(scope="module")
def queries(ray_session):
    from webcrawler_ray.pipelines.registry import build_queries

    return build_queries()


def _df(res):
    return res.to_pandas() if hasattr(res, "to_pandas") else res


class TestCrawlQueries:
    def test_flagship_deterministic_across_calls(self, queries):
        a = _df(queries["crawl_flagship"](SF_DIR))
        b = _df(queries["crawl_flagship"](SF_DIR))
        pd.testing.assert_frame_equal(a, b)
        assert list(a["fetch_seq"]) == list(range(len(a)))

    def test_corpus_text_nonempty(self, queries):
        df = _df(queries["crawl_corpus"](SF_DIR))
        assert len(df) > 0
        assert (df["extracted_text"].str.len() > 0).all()

    def test_host_counts_sum_to_attempts(self, queries):
        att = _df(queries["crawl_flagship"](SF_DIR))
        hc = _df(queries["crawl_host_counts"](SF_DIR))
        assert hc["n_pages"].sum() == len(att)

    def test_host_gap_respects_politeness_delay(self, queries):
        """The cadence audit's own invariant: every host's MEDIAN gap
        between consecutive saved fetches is >= that host's crawl
        delay (politeness end-to-end, from the attempts log)."""
        import os

        from webcrawler_ray.robots import RobotsTable

        df = _df(queries["crawl_host_gap_stats"](SF_DIR))
        assert len(df) > 0
        assert (df["n_saved"] >= 2).all()
        from webcrawler_ray.io_utils import corpus_cache_dir

        rt = RobotsTable.from_parquet(
            os.path.join(corpus_cache_dir(SF_DIR), "web/robots.parquet"))
        for _, r in df.iterrows():
            delay = rt.get(r["host"]).delay_seconds()
            assert r["med_gap"] >= delay - 1e-9, r["host"]

    def test_url_algebra_consistency(self, queries):
        df = _df(queries["url_algebra"](SF_DIR))
        assert len(df) > 0
        # host2 + resource2 losslessly recompose the url (M2/M3 invariant)
        assert (df["host2"] + df["resource2"] == df["url"]).all()
        assert df["passes_blocklist"].dtype == bool

    def test_crawl_log_fields(self, queries):
        df = _df(queries["crawl_log"](SF_DIR))
        assert set(df.columns) == {"URL", "Title", "Text", "Timestamp"}
        assert len(df) > 0
        corpus = _df(queries["crawl_corpus"](SF_DIR))
        assert len(df) == len(corpus)


class TestWarcSink:
    def test_warc_roundtrip_bytes_and_members(self, queries):
        import glob
        import os

        summ = _df(queries["crawl_warc"](SF_DIR))
        assert len(summ) >= 1
        assert (summ["n_records"] > 0).all()

        from webcrawler_ray.sinks.warc import (
            count_gzip_members,
            iter_warc_records,
        )

        corpus = _df(queries["crawl_corpus"](SF_DIR))
        # locate the warc dir written by the query for THIS scale
        from webcrawler_ray.io_utils import corpus_cache_dir

        cache = sorted(glob.glob(
            os.path.join(corpus_cache_dir(SF_DIR), "crawl_wd_*/warc")))
        assert cache
        wdir = cache[-1]
        got = {}
        total_members = 0
        for f in summ["warc_file"]:
            path = os.path.join(wdir, f)
            n = 0
            for headers, body in iter_warc_records(path):
                assert headers["WARC-Type"] == "response"
                assert headers["WARC-Record-ID"].startswith("<urn:uuid:")
                got[headers["WARC-Target-URI"]] = body
                n += 1
            # the standard .warc.gz layout: one gzip MEMBER per record
            assert count_gzip_members(path) == n
            total_members += n
        assert total_members == int(summ["n_records"].sum())
        # every crawled page round-trips byte-identically
        assert set(got) == set(corpus["url"])
        texts = dict(zip(corpus["url"], corpus["extracted_text"]))
        # spot-check html bytes decode to pages whose extracted text
        # matches the corpus golden text
        from webcrawler_ray.functions.htmlparse import extract_visible_text
        for u in list(got)[:20]:
            assert extract_visible_text(got[u]) == texts[u]

    def test_wet_roundtrip_full_text(self, queries):
        """WET conversion records round-trip the EXACT extracted text:
        sink -> .warc.wet.gz (one gzip member per record) -> source ->
        (url, text) equals the crawl corpus column; record grammar
        checked (WARC-Type conversion, text/plain, Refers-To id)."""
        import glob
        import os

        from webcrawler_ray.io_utils import corpus_cache_dir
        from webcrawler_ray.sinks.warc import (count_gzip_members,
                                               parse_warc_stream)

        summ = _df(queries["crawl_wet"](SF_DIR))
        assert len(summ) >= 1 and (summ["n_records"] > 0).all()
        rb = _df(queries["crawl_wet_read"](SF_DIR))
        corpus = _df(queries["crawl_corpus"](SF_DIR))
        want = dict(zip(corpus["url"], corpus["extracted_text"]))
        assert dict(zip(rb["url"], rb["text"])) == want
        # byte-level grammar of one archive
        cache = sorted(glob.glob(
            os.path.join(corpus_cache_dir(SF_DIR), "crawl_wd_*/wet")))
        assert cache
        path = os.path.join(cache[-1], summ["wet_file"].iloc[0])
        import gzip

        raw = gzip.open(path, "rb").read()
        n = 0
        for headers, body in parse_warc_stream(raw, strip_http=False):
            assert headers["WARC-Type"] == "conversion"
            assert headers["Content-Type"] == "text/plain"
            assert headers["WARC-Refers-To"].startswith("<urn:uuid:")
            assert body.decode("utf-8") == want[
                headers["WARC-Target-URI"]]
            n += 1
        assert count_gzip_members(path) == n > 0

    def test_cdx_surt_ordering_and_digest(self, queries):
        """The CDX index is SURT-sorted and its digests match a direct
        sha256 of each page's html bytes."""
        import hashlib

        from webcrawler_ray.functions.urls import surt_key

        cdx = _df(queries["crawl_cdx"](SF_DIR))
        corpus = _df(queries["crawl_corpus"](SF_DIR))
        assert len(cdx) == len(corpus)
        keys = list(zip(cdx["surt_key"], cdx["ts14"], cdx["url"]))
        assert keys == sorted(keys)
        assert list(cdx["surt_key"]) == [surt_key(u) for u in cdx["url"]]
        assert (cdx["digest"].str.len() == 64).all()
        # spot-check digests against independently fetched html
        texts = dict(zip(corpus["url"], corpus["extracted_text"]))
        assert set(cdx["url"]) == set(texts)

    def test_sitemap_grammar_and_index(self, queries):
        """Per-host urlset documents parse as namespaced sitemaps.org
        XML, entries are loc-sorted, and the sitemapindex lists every
        per-host file."""
        import glob
        import os
        import xml.etree.ElementTree as ET

        from webcrawler_ray.io_utils import corpus_cache_dir

        summ = _df(queries["crawl_sitemaps"](SF_DIR))
        assert len(summ) >= 2 and (summ["n_urls"] > 0).all()
        cache = sorted(glob.glob(os.path.join(
            corpus_cache_dir(SF_DIR), "crawl_wd_*/sitemaps")))
        assert cache
        sdir = cache[-1]
        files = [f for f in os.listdir(sdir)
                 if f.endswith(".xml") and not f.startswith(
                     "sitemap-index")]
        assert len(files) == len(summ)
        ns = "{http://www.sitemaps.org/schemas/sitemap/0.9}"
        locs_seen = 0
        for f in files:
            root = ET.parse(os.path.join(sdir, f)).getroot()
            assert root.tag == ns + "urlset"
            locs = [u.find(ns + "loc").text for u in root]
            assert locs == sorted(locs) and locs
            for u in root:
                assert u.find(ns + "lastmod").text.endswith("Z")
            locs_seen += len(locs)
        assert locs_seen == int(summ["n_urls"].sum())
        idx = ET.parse(os.path.join(sdir, "sitemap-index.xml")).getroot()
        assert idx.tag == ns + "sitemapindex"
        assert sorted(s.find(ns + "loc").text for s in idx) == \
            sorted(files)

    def test_warc_source_roundtrip(self, queries):
        """The Dataset-level WARC SOURCE re-ingests the sink's archives
        byte-identically: every crawled page comes back with the exact
        html payload and microsecond-truncated-to-second timestamp."""
        import os

        import ray

        from webcrawler_ray.pipelines.registry import _crawl_workdir
        from webcrawler_ray.sources.warc import read_warc

        df = _df(queries["crawl_warc_read"](SF_DIR))
        assert (df["n_bytes"] > 0).all()

        c = _crawl_workdir(SF_DIR)
        # the workdir IS deterministic (webgen-signature keyed) — never
        # glob for it, a stale sibling from an old webgen could win
        wdir = os.path.join(c.workdir, "warc")
        rb = read_warc(ray, wdir).to_pandas()
        orig = (c.crawled_dataset()
                 .map_batches(lambda t: t.select(["url", "html"]),
                              batch_format="pyarrow").to_pandas())
        got = dict(zip(rb["url"], rb["html"]))
        want = dict(zip(orig["url"], orig["html"]))
        assert got == want
        assert len(rb) == len(orig)


class TestJsonlSink:
    def test_jsonl_roundtrip_all_fields(self, queries):
        """The gzipped-JSONL sink round-trips EVERY debug-log field
        (URL/Title/Text/Timestamp) through ray.data.read_json, and the
        files are byte-deterministic across rewrites."""
        import hashlib
        import os

        import pandas as pd
        import ray

        from webcrawler_ray.pipelines.registry import _crawl_workdir
        from webcrawler_ray.sinks.jsonl import read_jsonl

        _df(queries["crawl_log_jsonl"](SF_DIR))  # ensures the sink ran
        c = _crawl_workdir(SF_DIR)
        out = os.path.join(c.workdir, "jsonl")
        rb = read_jsonl(ray, out).to_pandas()
        orig = _df(queries["crawl_log"](SF_DIR))
        cols = ["URL", "Title", "Text", "Timestamp"]
        got = rb[cols].sort_values("URL").reset_index(drop=True)
        want = orig[cols].sort_values("URL").reset_index(drop=True)
        pd.testing.assert_frame_equal(got, want, check_dtype=False)

        # byte determinism: rewrite after clearing the marker -> same
        # file names, same digests
        digests = {}
        for f in sorted(os.listdir(out)):
            if f.endswith(".jsonl.gz"):
                with open(os.path.join(out, f), "rb") as fh:
                    digests[f] = hashlib.blake2b(fh.read()).hexdigest()
        os.unlink(os.path.join(out, "_SUCCESS"))
        _df(queries["crawl_log_jsonl"](SF_DIR))
        for f, d in digests.items():
            with open(os.path.join(out, f), "rb") as fh:
                assert hashlib.blake2b(fh.read()).hexdigest() == d


class TestFetcherSeam:
    def test_table_fetcher_matches_pages(self, ray_session, tmp_path):
        import ray

        from webcrawler_ray.stages.fetcher import FetchStage, TableFetcher
        from webcrawler_ray.webgen import WebSpec, generate_web

        web = generate_web(str(tmp_path / "w"),
                           WebSpec(n_hosts=2, pages_per_host=5, seed=3))
        import pyarrow.parquet as pq

        pages = pq.read_table(web["pages"])
        urls = pages.column("url").to_pylist()
        htmls = dict(zip(urls, pages.column("html").to_pylist()))

        f = TableFetcher(web["pages"])
        exists, is_html = f.head(urls + ["https://nope.test/x"])
        assert exists[:-1].all() and not exists[-1]
        got = f.get(urls[:3] + ["https://nope.test/x"])
        assert got[:3] == [htmls[u] for u in urls[:3]]
        assert got[3] is None

        # the actor-pool stage drives the same seam through Ray Data
        ds = ray.data.from_items([{"url": u} for u in urls])
        out = ds.map_batches(
            FetchStage, fn_constructor_args=(
                lambda p=web["pages"]: TableFetcher(p),),
            batch_format="pyarrow", concurrency=1).to_pandas()
        assert out["fetched"].all()
        assert dict(zip(out["url"], out["html"])) == htmls

    def test_http_fetcher_constructs_without_network(self):
        # the live seam builds its pool with the reference's settings;
        # no request is made (sandbox has no network)
        from webcrawler_ray.stages.fetcher import HttpFetcher

        f = HttpFetcher(timeout_s=1.0)
        assert hasattr(f, "get") and hasattr(f, "head")


class TestQueryCLI:
    def test_query_list_and_run(self, ray_session, capsys):
        from webcrawler_ray.__main__ import main

        assert main(["query", "list"]) == 0
        out = capsys.readouterr().out
        assert "dedup_exact\tsql-checked" in out
        assert main(["query", "doc_lang_counts", "--sf-dir", SF_DIR]) == 0
        out = capsys.readouterr().out
        assert '"rows": 5' in out
        assert main(["query", "no_such_query"]) == 2


class TestWarcDeterminism:
    def test_rerun_produces_identical_bytes(self, ray_session, tmp_path):
        import hashlib
        import os

        import ray

        from webcrawler_ray.sinks.warc import write_warc
        from webcrawler_ray.webgen import WebSpec, generate_web
        import pyarrow.parquet as pq

        web = generate_web(str(tmp_path / "w"),
                           WebSpec(n_hosts=2, pages_per_host=6, seed=9))
        ds = ray.data.read_parquet(web["pages"],
                                   columns=["url", "html", "warc_ts"])

        def digest(d):
            out = {}
            for f in sorted(os.listdir(d)):
                with open(os.path.join(d, f), "rb") as fh:
                    out[f] = hashlib.blake2b(fh.read(),
                                             digest_size=8).hexdigest()
            return out

        d1, d2 = str(tmp_path / "o1"), str(tmp_path / "o2")
        write_warc(ds, d1, records_per_file=5).to_pandas()
        write_warc(ds, d2, records_per_file=5).to_pandas()
        a, b = digest(d1), digest(d2)
        # same file NAMES and byte-identical contents: the sink is
        # deterministic, so a failed run can be re-run idempotently
        assert a == b and len(a) >= 2


class TestPageRank:
    def test_pagerank_matches_integer_reference_exactly(self, queries):
        """Every per-round sum is integer, so the distributed power
        iteration must equal a single-process reference EXACTLY."""
        from collections import defaultdict

        import ray

        from webcrawler_ray.pipelines.graph import (
            DAMP_DEN,
            DAMP_NUM,
            crawl_link_edges,
            node_mass,
            pagerank,
        )
        from webcrawler_ray.pipelines.registry import _crawl_workdir

        c = _crawl_workdir(SF_DIR)
        pre = crawl_link_edges(ray, c)
        got = _df(pagerank(ray, c, edges=pre).sort("url"))

        edges_ds, n = pre
        edges = _df(edges_ds)
        nodes = _df(c.crawled_dataset().map_batches(
            lambda t: t.select(["url"]), batch_format="pyarrow"))
        rank = {u: node_mass(n) for u in nodes["url"]}
        total = n * node_mass(n)
        for _ in range(5):
            contribs = [(d, (rank[s] * DAMP_NUM // DAMP_DEN) // int(dg))
                        for s, d, dg in zip(edges["src"], edges["dst"],
                                            edges["deg"])]
            base = (total - sum(c for _, c in contribs)) // n
            new = defaultdict(int)
            for u in rank:
                new[u] = base
            for d, c in contribs:
                new[d] += c
            rank = dict(new)
        want = pd.DataFrame(sorted(rank.items()),
                            columns=["url", "rank"])
        pd.testing.assert_frame_equal(
            got.reset_index(drop=True), want, check_dtype=False)

    def test_node_mass_never_wraps_int64(self):
        from webcrawler_ray.pipelines.graph import (
            DAMP_NUM,
            NODE_MASS,
            node_mass,
        )

        for n in (1, 61, 5_000, 10**7, 10**9, 10**12):
            m = node_mass(n)
            assert 1 <= m <= NODE_MASS
            # even a sink hub holding ALL the mass stays shy of wrap
            assert n * m * DAMP_NUM < (1 << 63)
        assert node_mass(61) == NODE_MASS  # small graphs keep full res

    def test_pagerank_topk_shape(self, queries):
        df = _df(queries["crawl_pagerank"](SF_DIR))
        assert list(df.columns) == ["url", "rank"]
        assert len(df) == 20
        assert (df["rank"].to_numpy()[:-1]
                >= df["rank"].to_numpy()[1:]).all()

    def test_ppr_matches_integer_reference_exactly(self, queries):
        """Personalized variant: teleport returns to the round-0 seed
        set; the sparse distributed iteration must equal a
        single-process integer reference on EVERY node (zeros
        included)."""
        from collections import defaultdict

        import ray

        from webcrawler_ray.pipelines.graph import (
            DAMP_DEN,
            DAMP_NUM,
            crawl_link_edges,
            node_mass,
            ppr,
        )
        from webcrawler_ray.pipelines.registry import _crawl_workdir

        c = _crawl_workdir(SF_DIR)
        pre = crawl_link_edges(ray, c)
        got = _df(ppr(ray, c, edges=pre).sort("url"))

        edges_ds, _n = pre
        edges = _df(edges_ds)
        nodes = _df(c.crawled_dataset().map_batches(
            lambda t: t.select(["url", "round"]),
            batch_format="pyarrow"))
        seeds = sorted(nodes.loc[nodes["round"] == 0, "url"])
        ns = max(len(seeds), 1)
        mass = node_mass(ns)
        total = ns * mass
        rank = defaultdict(int, {u: mass for u in seeds})
        for _ in range(5):
            contribs = [(d, (rank[s] * DAMP_NUM // DAMP_DEN) // int(dg))
                        for s, d, dg in zip(edges["src"], edges["dst"],
                                            edges["deg"])
                        if rank[s]]
            base = (total - sum(cc for _, cc in contribs)) // ns
            new = defaultdict(int)
            for u in seeds:
                new[u] = base
            for d, cc in contribs:
                new[d] += cc
            rank = new
        want = pd.DataFrame(
            sorted((u, rank.get(u, 0)) for u in nodes["url"]),
            columns=["url", "rank"])
        pd.testing.assert_frame_equal(
            got.reset_index(drop=True), want, check_dtype=False)


class TestSalsa:
    def test_salsa_matches_integer_reference_exactly(self, queries):
        """Both half-steps are integer sums with a uniform leftover
        base, so the distributed alternating walk must equal a
        single-process reference EXACTLY."""
        from collections import defaultdict

        import ray

        from webcrawler_ray.pipelines.graph import (
            crawl_link_edges,
            node_mass,
            salsa,
        )
        from webcrawler_ray.pipelines.registry import _crawl_workdir

        c = _crawl_workdir(SF_DIR)
        pre = crawl_link_edges(ray, c)
        got = _df(salsa(ray, c, edges=pre).sort("url"))

        edges_ds, n = pre
        edges = _df(edges_ds)
        indeg = edges.groupby("dst")["src"].count().to_dict()
        hubs = sorted(set(edges["src"]))
        auths = sorted(set(edges["dst"]))
        mass = node_mass(n)
        total = len(hubs) * mass
        hub = {u: mass for u in hubs}
        auth = {}
        for _ in range(5):
            # forward: hubs -> authorities
            contribs = [(d, hub[s] // int(dg))
                        for s, d, dg in zip(edges["src"], edges["dst"],
                                            edges["deg"])]
            base = (total - sum(v for _, v in contribs)) // len(auths)
            auth = defaultdict(int, {u: base for u in auths})
            for d, v in contribs:
                auth[d] += v
            # backward: authorities -> hubs
            contribs = [(s, auth[d] // int(indeg[d]))
                        for s, d in zip(edges["src"], edges["dst"])]
            base = (total - sum(v for _, v in contribs)) // len(hubs)
            hub = defaultdict(int, {u: base for u in hubs})
            for s, v in contribs:
                hub[s] += v
        want = pd.DataFrame(
            sorted((u, auth.get(u, 0), hub.get(u, 0))
                   for u in set(hubs) | set(auths)),
            columns=["url", "auth", "hub"])
        pd.testing.assert_frame_equal(
            got.reset_index(drop=True), want, check_dtype=False)

    def test_salsa_topk_shape(self, queries):
        df = _df(queries["crawl_salsa"](SF_DIR))
        assert list(df.columns) == ["url", "auth", "hub"]
        assert len(df) == 20
        assert (df["auth"].to_numpy()[:-1]
                >= df["auth"].to_numpy()[1:]).all()
        # mass sanity: authority scores are positive integer masses
        assert (df["auth"].to_numpy() > 0).all()


class TestTriangles:
    def test_known_graphs(self, ray_session):
        """K4 has 4 triangles; a path has 0; K4 + disjoint triangle = 5."""
        import pyarrow as pa
        import ray

        from webcrawler_ray.pipelines.graph import count_triangles

        def edges(pairs):
            a = [min(x, y) for x, y in pairs]
            b = [max(x, y) for x, y in pairs]
            return ray.data.from_arrow(pa.table(
                {"a": pa.array(a, pa.int64()),
                 "b": pa.array(b, pa.int64())}))

        k4 = [(1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4)]
        assert count_triangles(ray, edges(k4)).column(
            "n_triangles")[0].as_py() == 4
        path = [(1, 2), (2, 3), (3, 4)]
        assert count_triangles(ray, edges(path)).column(
            "n_triangles")[0].as_py() == 0
        both = k4 + [(10, 11), (11, 12), (10, 12)]
        assert count_triangles(ray, edges(both)).column(
            "n_triangles")[0].as_py() == 5

    def test_crawl_triangles_match_local_reference(self, queries):
        """The distributed count equals a single-process adjacency-
        intersection count over the SAME canonical edge set."""
        import numpy as np
        import ray

        from webcrawler_ray.functions.urls import stable_hash64_batch
        from webcrawler_ray.pipelines.graph import crawl_link_edges
        from webcrawler_ray.pipelines.registry import _crawl_workdir

        got = _df(queries["crawl_triangles"](SF_DIR))
        n_got = int(got["n_triangles"].iloc[0])

        c = _crawl_workdir(SF_DIR)
        edges_ds, _ = crawl_link_edges(ray, c)
        e = _df(edges_ds)
        hs = stable_hash64_batch(list(e["src"])).astype(np.int64)
        hd = stable_hash64_batch(list(e["dst"])).astype(np.int64)
        adj = {}
        seen = set()
        for a, b in zip(hs, hd):
            if a == b:
                continue
            lo, hi = (int(a), int(b)) if a < b else (int(b), int(a))
            if (lo, hi) in seen:
                continue
            seen.add((lo, hi))
            adj.setdefault(lo, set()).add(hi)
            adj.setdefault(hi, set()).add(lo)
        n_ref = sum(len(adj[a] & adj[b]) for a, b in seen if a in adj)
        assert n_ref % 3 == 0
        assert n_got == n_ref // 3


class TestReciprocityAndClustering:
    @staticmethod
    def _edges_ds(pairs):
        import pyarrow as pa
        import ray

        return ray.data.from_arrow(pa.table({
            "src": pa.array([s for s, _ in pairs], pa.string()),
            "dst": pa.array([d for _, d in pairs], pa.string()),
            "deg": pa.array([1] * len(pairs), pa.int64())}))

    def test_reciprocity_known_graph(self, ray_session):
        """a<->b reciprocal, a->c one-way: 2 of 3 edges reciprocal."""
        import ray

        from webcrawler_ray.pipelines.graph import crawl_reciprocity

        ds = self._edges_ds([("a", "b"), ("b", "a"), ("a", "c")])
        out = crawl_reciprocity(ray, None, edges=(ds, 3))
        assert out.column("n_edges")[0].as_py() == 3
        assert out.column("n_recip")[0].as_py() == 2
        assert out.column("reciprocity_bp")[0].as_py() == (10000 * 2) // 3

    def test_reciprocity_none_and_all(self, ray_session):
        import ray

        from webcrawler_ray.pipelines.graph import crawl_reciprocity

        one_way = self._edges_ds([("a", "b"), ("b", "c")])
        out = crawl_reciprocity(ray, None, edges=(one_way, 3))
        assert out.column("n_recip")[0].as_py() == 0
        assert out.column("reciprocity_bp")[0].as_py() == 0

        both = self._edges_ds([("a", "b"), ("b", "a")])
        out = crawl_reciprocity(ray, None, edges=(both, 2))
        assert out.column("n_recip")[0].as_py() == 2
        assert out.column("reciprocity_bp")[0].as_py() == 10000

    def test_clustering_coeff_known_graphs(self, ray_session):
        """Directed triangle: 1 triangle / 3 wedges -> gcc = 1.
        Star (no closure): 0 triangles / 3 wedges -> gcc = 0."""
        import ray

        from webcrawler_ray.pipelines.graph import crawl_clustering_coeff

        tri = self._edges_ds([("a", "b"), ("b", "c"), ("c", "a")])
        out = crawl_clustering_coeff(ray, None, edges=(tri, 3))
        assert out.column("n_triangles")[0].as_py() == 1
        assert out.column("n_wedges")[0].as_py() == 3
        assert out.column("gcc_bp")[0].as_py() == 10000

        star = self._edges_ds([("hub", "x"), ("hub", "y"), ("hub", "z")])
        out = crawl_clustering_coeff(ray, None, edges=(star, 4))
        assert out.column("n_triangles")[0].as_py() == 0
        assert out.column("n_wedges")[0].as_py() == 3
        assert out.column("gcc_bp")[0].as_py() == 0

    def test_kcore_known_graphs(self, ray_session):
        """K4 with a dangling path: the path peels away over two
        rounds, K4 survives as the 3-core with degree 3 everywhere;
        a pure path has no 3-core at all."""
        import ray

        from webcrawler_ray.pipelines.graph import crawl_kcore

        k4_tail = self._edges_ds(
            [("a", "b"), ("a", "c"), ("a", "d"), ("b", "c"),
             ("b", "d"), ("c", "d"), ("d", "e"), ("e", "f")])
        out = crawl_kcore(ray, None, edges=(k4_tail, 6)).to_pandas()
        assert sorted(out["url"]) == ["a", "b", "c", "d"]
        assert (out["core_deg"] == 3).all()

        path = self._edges_ds([("a", "b"), ("b", "c"), ("c", "d")])
        out = crawl_kcore(ray, None, edges=(path, 4))
        assert out.num_rows == 0


class TestSccDecompose:
    """Full SCC decomposition kernel on known graphs — BOTH routes:
    the budget-gated driver Tarjan and (budget=0) the distributed
    trim + FW-BW pivot path, which must agree exactly."""

    GRAPH = [("a1", "a2"), ("a2", "a3"), ("a3", "a1"),   # 3-cycle A
             ("b1", "b2"), ("b2", "b3"), ("b3", "b1"),   # 3-cycle B
             ("a1", "b1"),                               # A -> B bridge
             ("c1", "c2"), ("c2", "a1")]                 # acyclic tail
    NODES = ["a1", "a2", "a3", "b1", "b2", "b3", "c1", "c2"]
    WANT = {"a1": "a1", "a2": "a1", "a3": "a1",
            "b1": "b1", "b2": "b1", "b3": "b1",
            "c1": "c1", "c2": "c2"}

    def _graph(self, ray):
        import pyarrow as pa

        nodes = ray.data.from_arrow(pa.table(
            {"url": pa.array(self.NODES)}))
        edges = ray.data.from_arrow(pa.table({
            "src": pa.array([s for s, _ in self.GRAPH]),
            "dst": pa.array([d for _, d in self.GRAPH])}))
        return nodes, edges

    def test_driver_route(self, ray_session):
        import ray

        from webcrawler_ray.pipelines.graph import scc_decompose

        nodes, edges = self._graph(ray)
        out = scc_decompose(ray, nodes, edges).to_pandas()
        assert dict(zip(out["url"], out["scc_id"])) == self.WANT

    def test_distributed_route_matches(self, ray_session):
        import ray

        from webcrawler_ray.pipelines.graph import scc_decompose

        nodes, edges = self._graph(ray)
        out = scc_decompose(ray, nodes, edges,
                            driver_budget_bytes=0,
                            max_pivots=4).to_pandas()
        assert dict(zip(out["url"], out["scc_id"])) == self.WANT

    def test_distributed_route_pivot_exhaustion_raises(self, ray_session):
        import pytest
        import ray

        from webcrawler_ray.pipelines.graph import scc_decompose

        nodes, edges = self._graph(ray)
        with pytest.raises(RuntimeError, match="above the driver"):
            scc_decompose(ray, nodes, edges, driver_budget_bytes=0,
                          max_pivots=1)


class TestComponents:
    def test_crawl_components_match_union_find(self, queries):
        """Distributed min-label propagation over the crawl link graph
        equals a single-process union-find over the SAME edges, with
        every crawled page present (singletons label themselves)."""
        import ray

        from webcrawler_ray.pipelines.graph import crawl_link_edges
        from webcrawler_ray.pipelines.registry import _crawl_workdir

        got = _df(queries["crawl_components"](SF_DIR))
        c = _crawl_workdir(SF_DIR)
        corpus = _df(c.crawled_dataset().map_batches(
            lambda t: t.select(["fetch_seq", "url"]),
            batch_format="pyarrow"))
        assert len(got) == len(corpus)
        assert sorted(got["fetch_seq"]) == sorted(corpus["fetch_seq"])

        seq_of = dict(zip(corpus["url"], corpus["fetch_seq"]))
        edges_ds, _ = crawl_link_edges(ray, c)
        e = _df(edges_ds)

        parent = {int(s): int(s) for s in corpus["fetch_seq"]}

        def find(x):
            while parent[x] != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        for s, d in zip(e["src"], e["dst"]):
            a, b = find(seq_of[s]), find(seq_of[d])
            if a != b:
                parent[max(a, b)] = min(a, b)
        # canonical label = component min: run find to full compression
        want = {x: find(x) for x in parent}
        # union-find roots are not necessarily the min — normalize
        groups = {}
        for x, r in want.items():
            groups.setdefault(r, []).append(x)
        want_min = {}
        for members in groups.values():
            m = min(members)
            for x in members:
                want_min[x] = m
        got_map = dict(zip(got["fetch_seq"].astype(int),
                           got["component"].astype(int)))
        assert got_map == want_min
        # at least one real link component exists in the crawl
        assert (got["component"] != got["fetch_seq"]).any()


class TestDepths:
    def test_crawl_depths_match_local_bfs(self, queries):
        """Distributed level-by-level BFS over the crawl link graph
        equals a single-process BFS from the round-0 seed set, with
        every crawled page present (unreachable pages -1)."""
        from collections import deque

        import ray

        from webcrawler_ray.pipelines.graph import crawl_link_edges
        from webcrawler_ray.pipelines.registry import _crawl_workdir

        got = _df(queries["crawl_depths"](SF_DIR))
        c = _crawl_workdir(SF_DIR)
        corpus = _df(c.crawled_dataset().map_batches(
            lambda t: t.select(["url", "round"]),
            batch_format="pyarrow"))
        assert len(got) == len(corpus)
        assert sorted(got["url"]) == sorted(corpus["url"])

        edges_ds, _ = crawl_link_edges(ray, c)
        e = _df(edges_ds)
        adj: dict = {}
        for s, d in zip(e["src"], e["dst"]):
            adj.setdefault(s, []).append(d)
        want = {u: -1 for u in corpus["url"]}
        q = deque()
        for u in corpus.loc[corpus["round"] == 0, "url"]:
            want[u] = 0
            q.append(u)
        while q:
            u = q.popleft()
            for v in adj.get(u, ()):
                if want[v] == -1:
                    want[v] = want[u] + 1
                    q.append(v)
        got_map = dict(zip(got["url"], got["depth"].astype(int)))
        assert got_map == want
        # the BFS actually descends: some page is deeper than the seeds
        assert (got["depth"] > 0).any()


class TestCrawlCuration:
    def test_crawl_curation_invariants(self, queries):
        """The composed crawl->training-data pipeline: every surviving
        row passes the quality gates, per-source caps hold, and packing
        is the exact greedy prefix-sum assignment in doc_id order."""
        from webcrawler_ray.pipelines.textpipe import (
            CURATION_CAP,
            SEQ_LEN_TOKENS,
        )

        df = _df(queries["crawl_curation"](SF_DIR)).sort_values("doc_id")
        assert len(df) > 0
        assert (df["n_tokens"] >= 30).all()
        assert df.groupby("source").size().max() <= CURATION_CAP
        # greedy packing: seq_id = exclusive-prefix-sum // SEQ_LEN
        cum = df["n_tokens"].cumsum() - df["n_tokens"]
        assert (df["seq_id"].to_numpy()
                == (cum // SEQ_LEN_TOKENS).to_numpy()).all()
        # dedup keep-first: fetch_seq ids unique
        assert df["doc_id"].is_unique


class TestTitleDups:
    def test_planted_duplicate_titles(self, ray_session):
        """The bucketed title-count kernel surfaces only shared titles,
        most-shared first (the registry query's corpus is all-unique,
        so the sweep's 0-row check needs this planted complement)."""
        import pandas as pd
        import pyarrow as pa
        import ray

        from webcrawler_ray.stages.aggregates import (
            hash_bucket_aggregate,
            normalize_for_join,
        )

        titles = (["Welcome"] * 3 + ["About"] * 2
                  + [f"unique {i}" for i in range(5)] + [None])
        src = ray.data.from_arrow(
            pa.table({"title": pa.array(titles, pa.string())}))

        def partial(df):
            g = df.groupby("title", as_index=False, dropna=True).size()
            return g.rename(columns={"size": "n_pages"})

        def merge(df):
            g = df.groupby("title", as_index=False)["n_pages"].sum()
            return g[g["n_pages"] > 1]

        out = normalize_for_join(
            hash_bucket_aggregate(src.repartition(4), ["title"],
                                  partial, merge=merge),
            pa.schema([("title", pa.string()), ("n_pages", pa.int64())]))
        df = (out.sort(["n_pages", "title"], descending=[True, False])
                 .to_pandas())
        pd.testing.assert_frame_equal(
            df.reset_index(drop=True),
            pd.DataFrame({"title": ["Welcome", "About"],
                          "n_pages": pd.Series([3, 2], dtype="int64")}))


class TestDebugStdoutStream:
    """`-d` CLI parity with the reference's DebugPrinter
    (`DebugPrinter.py:9-18`): saved pages stream to STDOUT as
    json.dumps(record, ensure_ascii=False, indent='\\t'), in
    round-major virtual-time order."""

    def test_debug_stream_records(self, ray_session, tiny_web,
                                  tmp_path_factory, capsys):
        import json

        from webcrawler_ray.__main__ import main

        wd = str(tmp_path_factory.mktemp("cli_debug") / "wd")
        rc = main(["-s", tiny_web["seeds"], "-n", "30", "-d",
                   "--pages", tiny_web["pages"],
                   "--robots", tiny_web["robots"], "--workdir", wd])
        assert rc == 0
        out = capsys.readouterr().out
        # records are tab-indented multi-line JSON objects; re-split on
        # the closing brace at column 0
        chunks = [c + "}" for c in out.split("}\n")
                  if c.startswith('{\n\t"URL"')]
        assert len(chunks) == 31  # limit+1 quirk
        seen_ts = None
        for c in chunks:
            rec = json.loads(c)
            assert set(rec) == {"URL", "Title", "Text", "Timestamp"}
            # byte-identity with the reference's serializer
            assert c == json.dumps(rec, ensure_ascii=False, indent="\t")
        # summary json still follows the stream
        assert '"saved_total": 31' in out
