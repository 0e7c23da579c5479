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


# --- vectorized-kernel properties (round-3 operators) -----------------------
class TestOrByGroupKernel:
    @given(st.lists(st.tuples(st.integers(0, 9), st.integers(0, 4),
                              st.integers(1, 31)),
                    min_size=0, max_size=200))
    @settings(max_examples=40, deadline=None)
    def test_matches_naive_or(self, rows):
        import numpy as np
        import pandas as pd

        from webcrawler_ray.pipelines.relational import or_by_group

        user = np.array([r[0] for r in rows], dtype=np.int64)
        day = np.array([r[1] for r in rows], dtype=np.int64)
        bits = np.array([r[2] for r in rows], dtype=np.int64)
        got = (or_by_group(user, day, bits)
               .sort_values(["user_id", "day"]).reset_index(drop=True))
        want: dict = {}
        for u, d, b in rows:
            want[(u, d)] = want.get((u, d), 0) | b
        want_df = pd.DataFrame(
            {"user_id": pd.Series([k[0] for k in sorted(want)],
                                  dtype="int64"),
             "day": pd.Series([k[1] for k in sorted(want)], dtype="int64"),
             "bits": pd.Series([want[k] for k in sorted(want)],
                               dtype="int64")})
        pd.testing.assert_frame_equal(got, want_df, check_dtype=False)


class TestFunnelChaining:
    @given(st.lists(st.tuples(st.integers(0, 5), st.integers(0, 30),
                              st.sampled_from(["view", "click", "purchase",
                                               "other"])),
                    min_size=0, max_size=120))
    @settings(max_examples=40, deadline=None)
    def test_stage_counts_match_naive(self, rows):
        """The vectorized per-bucket kernel equals a per-user brute-force
        strict-order subsequence scan (ts ties NOT advancing a stage)."""
        import pandas as pd

        from webcrawler_ray.pipelines.relational import (
            FUNNEL_STAGES,
            funnel_stage_counts,
        )

        g = pd.DataFrame({"user_id": [r[0] for r in rows],
                          "ts": [r[1] for r in rows],
                          "event_type": [r[2] for r in rows]})

        # drive the PRODUCTION kernel, not a copy
        got = funnel_stage_counts(g, FUNNEL_STAGES)

        # naive reference: per user, chain strict minima
        want = [0, 0, 0]
        for u in set(r[0] for r in rows):
            ev = sorted((r[1], r[2]) for r in rows if r[0] == u)
            t_prev = None
            for i, stg in enumerate(FUNNEL_STAGES):
                cand = [t for t, e in ev if e == stg
                        and (t_prev is None or t > t_prev)]
                if not cand:
                    break
                t_prev = min(cand)
                want[i] += 1
        assert got == want


class TestMixQuotaRule:
    @given(st.dictionaries(st.sampled_from(["en", "es", "de", "fr", "zh"]),
                           st.integers(0, 500), min_size=5, max_size=5))
    @settings(max_examples=60, deadline=None)
    def test_quota_never_exceeds_availability_and_mix_is_exact(self, avail):
        from webcrawler_ray.pipelines.textpipe import MIX_WEIGHTS, MIX_WSUM

        s_max = min((avail.get(l, 0) * MIX_WSUM) // w
                    for l, w in MIX_WEIGHTS.items())
        quota = {l: (s_max * w) // MIX_WSUM
                 for l, w in MIX_WEIGHTS.items()}
        for l, q in quota.items():
            assert q <= avail.get(l, 0)  # feasible
            # exact integer mixture: quota is the floor of the target
            # share of the supported corpus size
            assert q == (s_max * MIX_WEIGHTS[l]) // MIX_WSUM
        # monotonicity: adding availability to any single language can
        # only grow (never shrink) the supported corpus size — a
        # regression that under-sizes s_max breaks this on the argmin
        for bump in MIX_WEIGHTS:
            a2 = dict(avail)
            a2[bump] = a2.get(bump, 0) + 1
            s2 = min((a2.get(l, 0) * MIX_WSUM) // w
                     for l, w in MIX_WEIGHTS.items())
            assert s2 >= s_max


class TestByteCodecProperties:
    """Property tests for the pure byte codecs behind the TFRecord and
    Avro sinks — roundtrip identity over arbitrary payloads, with no
    Ray session involved."""

    @settings(max_examples=200, deadline=None)
    @given(st.integers(min_value=-2**63, max_value=2**63 - 1))
    def test_avro_zigzag_roundtrip(self, n):
        from webcrawler_ray.sinks.avro import _read_long, _zigzag

        enc = _zigzag(n)
        v, i = _read_long(memoryview(enc), 0)
        assert v == n and i == len(enc)
        # canonical: no over-long encodings
        assert len(enc) <= 10

    @settings(max_examples=100, deadline=None)
    @given(st.lists(st.binary(max_size=200), max_size=20))
    def test_tfrecord_frame_roundtrip(self, payloads):
        from webcrawler_ray.sinks.tfrecord import _frame, _unframe

        buf = b"".join(_frame(p) for p in payloads)
        assert list(_unframe(buf)) == payloads

    @settings(max_examples=60, deadline=None)
    @given(st.lists(
        st.tuples(st.integers(min_value=-2**63, max_value=2**63 - 1),
                  st.text(max_size=80),
                  st.floats(allow_nan=False, allow_infinity=False),
                  st.booleans(),
                  st.binary(max_size=60)),
        min_size=1, max_size=50))
    def test_avro_container_roundtrip(self, rows):
        import hashlib

        import pyarrow as pa

        from webcrawler_ray.sinks.avro import (
            _decode_file,
            _encode_records,
            _header,
            _zigzag,
            avro_schema_json,
        )

        schema = pa.schema([("a", pa.int64()), ("b", pa.string()),
                            ("c", pa.float64()), ("d", pa.bool_()),
                            ("e", pa.binary())])
        t = pa.table({"a": pa.array([r[0] for r in rows], pa.int64()),
                      "b": pa.array([r[1] for r in rows], pa.string()),
                      "c": pa.array([r[2] for r in rows], pa.float64()),
                      "d": pa.array([r[3] for r in rows], pa.bool_()),
                      "e": pa.array([r[4] for r in rows], pa.binary())})
        fields = ["a", "b", "c", "d", "e"]
        recs = _encode_records(t, fields)
        sync = hashlib.blake2b(recs, digest_size=16).digest()
        buf = (_header(avro_schema_json(schema), sync)
               + _zigzag(t.num_rows) + _zigzag(len(recs)) + recs + sync)
        back = _decode_file(buf, schema)
        assert back.equals(t)


class TestRobotsTxtRoundtripProperties:
    @settings(max_examples=60, deadline=None)
    @given(st.lists(st.from_regex(r"/[a-z0-9/*$.-]{0,12}",
                                  fullmatch=True), max_size=5),
           st.lists(st.from_regex(r"/[a-z0-9/*$.-]{0,12}",
                                  fullmatch=True), max_size=4),
           st.one_of(st.none(),
                     st.floats(0.01, 9.5, allow_nan=False)),
           st.lists(st.from_regex(r"https://[a-z0-9.]{1,10}/s\.xml",
                                  fullmatch=True), max_size=3))
    def test_render_parse_roundtrip(self, dis, al, cd, sm):
        from webcrawler_ray.robots import (parse_robots_sitemaps,
                                           parse_robots_txt,
                                           render_robots_txt)

        text = render_robots_txt(dis, al, cd, sitemaps=sm)
        got_dis, got_al, got_cd = parse_robots_txt(text)
        assert got_dis == tuple(p for p in dis if p)
        assert got_al == tuple(p for p in al if p)
        assert got_cd == cd
        assert parse_robots_sitemaps(text) == tuple(sm)


class TestSurtProperties:
    @settings(max_examples=80, deadline=None)
    @given(st.from_regex(
        r"https?://[a-z0-9]{1,8}(\.[a-z0-9]{1,6}){0,3}/[a-zA-Z0-9/._-]{0,16}",
        fullmatch=True))
    def test_surt_invariants(self, url):
        from webcrawler_ray.functions.urls import surt_key

        k = surt_key(url)
        assert ")/" in k
        assert k == k.lower()
        # scheme-insensitive: http and https produce the same key
        other = url.replace("https://", "http://", 1) \
            if url.startswith("https://") \
            else url.replace("http://", "https://", 1)
        assert surt_key(other) == k
        # host labels reversed: first SURT segment is the url's TLD
        host = url.split("://", 1)[1].split("/", 1)[0]
        assert k.split(",")[0].split(")")[0] == host.split(".")[-1]


class TestNoveltyInvariants:
    def test_novelty_sums_to_distinct_grams(self, ray_session):
        """Σ n_novel over docs == |distinct shingle hashes of the
        corpus|, and every doc's novelty_bp is in [0, 10000] with the
        first doc scoring exactly 10000."""
        import numpy as np

        from tests.conftest import SF_DIR
        from webcrawler_ray.functions.hashing import shingle_hashes
        from webcrawler_ray.pipelines.textpipe import docs_ngram_novelty
        import pyarrow.dataset as pads

        out = docs_ngram_novelty(ray_session, SF_DIR).to_pandas()
        assert ((out["novelty_bp"] >= 0)
                & (out["novelty_bp"] <= 10_000)).all()
        first = out.iloc[0]
        assert first["novelty_bp"] == 10_000  # nothing precedes doc 0
        t = pads.dataset(f"{SF_DIR}/documents.parquet").to_table(
            columns=["text"])
        all_sh = set()
        for txt in t.column("text").to_pylist():
            all_sh.update(shingle_hashes(txt).tolist())
        assert int(out["n_novel"].sum()) == len(all_sh)
