"""Unit tests for the politeness shard scheduler (ST2-ST4, M5)."""

import pyarrow as pa

from webcrawler_ray.robots import RobotsTable, HostRules
from webcrawler_ray.state.politeness import (
    STATUS_BLOCKLISTED,
    STATUS_MISSING,
    STATUS_NON_HTML,
    STATUS_ROBOTS_DENIED,
    STATUS_SAVED,
    PolitenessShardState,
)


def make_batch(rows):
    return pa.table({
        "url": pa.array([r[0] for r in rows], pa.string()),
        "host": pa.array([r[1] for r in rows], pa.string()),
        "resource": pa.array([r[2] for r in rows], pa.string()),
        "seq": pa.array([r[3] for r in rows], pa.int64()),
        "in_table": pa.array([r[4] for r in rows], pa.bool_()),
        "is_html": pa.array([r[5] for r in rows], pa.bool_()),
    })


def robots(**hosts):
    return RobotsTable(rules={h: r for h, r in hosts.items()})


H = "https://h.test"


class TestSchedule:
    def test_slot_assignment_and_delay(self):
        rt = robots(**{H: HostRules(host=H, crawl_delay=0.5, fetchable=True)})
        st = PolitenessShardState(0, rt)
        batch = make_batch([
            (f"{H}/a", H, "/a", 0, True, True),
            (f"{H}/b", H, "/b", 1, True, True),
            (f"{H}/c", H, "/c", 2, True, True),
        ])
        out = st.schedule(batch, T=0.0)
        assert out.column("ts").to_pylist() == [0.0, 0.5, 1.0]
        assert st.next_allowed[H] == 1.5

    def test_next_round_respects_next_allowed(self):
        rt = robots(**{H: HostRules(host=H, crawl_delay=1.0, fetchable=True)})
        st = PolitenessShardState(0, rt)
        st.schedule(make_batch([(f"{H}/a", H, "/a", 0, True, True)]), T=0.0)
        out = st.schedule(make_batch([(f"{H}/b", H, "/b", 5, True, True)]), T=0.2)
        assert out.column("ts").to_pylist() == [1.0]  # max(T, next_allowed)

    def test_non_saving_urls_consume_no_slot(self):
        rt = robots(**{H: HostRules(host=H, disallow=("/priv/",),
                                    crawl_delay=1.0, fetchable=True)})
        st = PolitenessShardState(0, rt)
        out = st.schedule(make_batch([
            (f"{H}/a", H, "/a", 0, True, True),
            (f"{H}/priv/x", H, "/priv/x", 1, True, True),   # robots-denied
            (f"{H}/b", H, "/b", 2, True, True),
        ]), T=0.0)
        ts = dict(zip(out.column("url").to_pylist(), out.column("ts").to_pylist()))
        assert ts[f"{H}/a"] == 0.0
        assert ts[f"{H}/priv/x"] == 1.0  # scheduled at next slot, no advance
        assert ts[f"{H}/b"] == 1.0
        assert st.next_allowed[H] == 2.0

    def test_statuses_and_precedence(self):
        rt = robots(**{H: HostRules(host=H, disallow=("/x",), fetchable=True)})
        st = PolitenessShardState(0, rt)
        out = st.schedule(make_batch([
            (f"{H}/x.pdf", H, "/x.pdf", 0, True, True),   # robots beats blocklist
            (f"{H}/y.pdf", H, "/y.pdf", 1, True, True),   # blocklist
            (f"{H}/miss", H, "/miss", 2, False, False),   # missing
            (f"{H}/bin", H, "/bin", 3, True, False),      # non-html
            (f"{H}/ok", H, "/ok", 4, True, True),
        ]), T=0.0)
        got = dict(zip(out.column("url").to_pylist(),
                       out.column("status").to_pylist()))
        assert got[f"{H}/x.pdf"] == STATUS_ROBOTS_DENIED
        assert got[f"{H}/y.pdf"] == STATUS_BLOCKLISTED
        assert got[f"{H}/miss"] == STATUS_MISSING
        assert got[f"{H}/bin"] == STATUS_NON_HTML
        assert got[f"{H}/ok"] == STATUS_SAVED

    def test_seq_order_not_arrival_order(self):
        rt = robots(**{H: HostRules(host=H, crawl_delay=1.0, fetchable=True)})
        st = PolitenessShardState(0, rt)
        out = st.schedule(make_batch([
            (f"{H}/late", H, "/late", 9, True, True),
            (f"{H}/early", H, "/early", 1, True, True),
        ]), T=0.0)
        ts = dict(zip(out.column("url").to_pylist(), out.column("ts").to_pylist()))
        assert ts[f"{H}/early"] == 0.0 and ts[f"{H}/late"] == 1.0

    def test_unreachable_robots_ignores_disallow(self):
        # Host.py:85-86: couldNotAccessRobots => allow-all even if the
        # table carries disallow rows (regression: the gate must check
        # fetchable before applying prefixes)
        rt = robots(**{H: HostRules(host=H, disallow=("/x/",),
                                    fetchable=False)})
        st = PolitenessShardState(0, rt)
        out = st.schedule(make_batch([
            (f"{H}/x/a", H, "/x/a", 0, True, True),
        ]), T=0.0)
        assert out.column("status").to_pylist() == [STATUS_SAVED]

    def test_unknown_host_allow_all_min_delay(self):
        st = PolitenessShardState(0, RobotsTable(rules={}))
        out = st.schedule(make_batch([
            ("https://u.test/a", "https://u.test", "/a", 0, True, True),
            ("https://u.test/b", "https://u.test", "/b", 1, True, True),
        ]), T=0.0)
        assert out.column("ts").to_pylist() == [0.0, 0.1]

    def test_round_id_makes_schedule_idempotent(self):
        rt = robots(**{H: HostRules(host=H, crawl_delay=1.0, fetchable=True)})
        st = PolitenessShardState(0, rt)
        b = make_batch([(f"{H}/a", H, "/a", 0, True, True)])
        out1 = st.schedule(b, T=0.0, round_id=7)
        out2 = st.schedule(b, T=0.0, round_id=7)  # simulated task retry
        assert out1.column("ts").to_pylist() == out2.column("ts").to_pylist()
        assert st.next_allowed[H] == 1.0

    def test_dump_load(self):
        rt = robots(**{H: HostRules(host=H, crawl_delay=1.0, fetchable=True)})
        st = PolitenessShardState(4, rt)
        st.schedule(make_batch([(f"{H}/a", H, "/a", 0, True, True)]), T=0.0)
        st2 = PolitenessShardState(4, rt)
        st2.load_next_allowed(st.dump())
        assert st2.next_allowed == st.next_allowed


class TestRobotsRFC9309:
    """Allow/Disallow longest-match precedence + * / $ wildcards
    (RFC 9309 §2.2.2 semantics, the behavior reppy implements for the
    reference at WebAccesser.py:51-71 / Host.py:83-93)."""

    def _hr(self, disallow=(), allow=(), fetchable=True):
        from webcrawler_ray.robots import HostRules

        return HostRules(host="https://h.test", disallow=tuple(disallow),
                         allow=tuple(allow), fetchable=fetchable)

    def test_plain_prefix_still_denies(self):
        r = self._hr(disallow=["/s1/"])
        assert not r.allowed("/s1/p3")
        assert r.allowed("/s2/p3")

    def test_allow_carveout_longest_match_wins(self):
        r = self._hr(disallow=["/s1/"], allow=["/s1/p1"])
        assert not r.allowed("/s1/p3")
        assert r.allowed("/s1/p1")       # longer Allow overrides
        assert r.allowed("/s1/p12")      # prefix semantics of the Allow
        assert r.allowed("/other")

    def test_disallow_more_specific_than_allow(self):
        r = self._hr(disallow=["/s1/p1/secret"], allow=["/s1/p1"])
        assert r.allowed("/s1/p1")
        assert not r.allowed("/s1/p1/secret/x")

    def test_tie_length_allow_wins(self):
        r = self._hr(disallow=["/abc"], allow=["/ab*"])  # both length 4
        assert r.allowed("/abc")

    def test_wildcard_star(self):
        r = self._hr(disallow=["/s*/tmp"])
        assert not r.allowed("/s1/tmp")
        assert not r.allowed("/s22/tmp")
        assert r.allowed("/q1/tmp")

    def test_dollar_anchor(self):
        r = self._hr(disallow=["/*5$"])
        assert not r.allowed("/p5")
        assert not r.allowed("/s1/p15")
        assert r.allowed("/p51")

    def test_unreachable_robots_allows_everything(self):
        r = self._hr(disallow=["/"], allow=(), fetchable=False)
        assert r.allowed("/s1/p1")

    def test_denied_batch_matches_scalar_path(self):
        import numpy as np
        import pandas as pd

        rules = [
            self._hr(disallow=["/s1/"]),                       # pure prefix
            self._hr(disallow=["/s1/"], allow=["/s1/p1"]),     # general
            self._hr(disallow=["/*5$"]),                       # wildcard
        ]
        paths = pd.Series(["/s1/p1", "/s1/p3", "/s2/p5", "/p15", "/x"],
                          dtype=object)
        for r in rules:
            want = np.array([not r.allowed(p) for p in paths])
            got = r.denied_batch(paths)
            assert (got == want).all(), (r.disallow, r.allow)

    def test_hostrules_pickle_roundtrip(self):
        import pickle

        r = self._hr(disallow=["/s1/", "/*5$"], allow=["/s1/p1"])
        r2 = pickle.loads(pickle.dumps(r))
        for p in ("/s1/p1", "/s1/p3", "/p5", "/x"):
            assert r2.allowed(p) == r.allowed(p)


class TestRobotsPropertyBased:
    """hypothesis: the compiled-regex matcher must agree with an
    INDEPENDENT naive recursive wildcard matcher on random rule sets."""

    @staticmethod
    def _naive_match(pattern: str, path: str) -> bool:
        # prefix match with * (any seq) and trailing $ (end anchor),
        # implemented by recursion — no regexes anywhere
        anchored = pattern.endswith("$")
        body = pattern[:-1] if anchored else pattern

        def rec(p: int, s: int) -> bool:
            if p == len(body):
                return s == len(path) if anchored else True
            if body[p] == "*":
                return any(rec(p + 1, i) for i in range(s, len(path) + 1))
            return (s < len(path) and path[s] == body[p]
                    and rec(p + 1, s + 1))

        return rec(0, 0)

    @classmethod
    def _naive_allowed(cls, disallow, allow, path) -> bool:
        best_len, best_allow = -1, True
        for is_allow, pats in ((False, disallow), (True, allow)):
            for pat in pats:
                if not pat or not cls._naive_match(pat, path):
                    continue
                if len(pat) > best_len or (len(pat) == best_len
                                           and is_allow):
                    best_len, best_allow = len(pat), is_allow
        return best_allow

    def test_matches_naive_reference(self):
        from hypothesis import given, settings
        from hypothesis import strategies as st

        from webcrawler_ray.robots import HostRules

        seg = st.text(alphabet="ab*/$5", min_size=0, max_size=6)
        pats = st.lists(seg.map(lambda s: "/" + s), max_size=3)
        path = st.text(alphabet="ab/5", min_size=0, max_size=10).map(
            lambda s: "/" + s)

        @settings(max_examples=300, deadline=None)
        @given(dis=pats, al=pats, p=path)
        def run(dis, al, p):
            hr = HostRules(host="https://h.test", disallow=tuple(dis),
                           allow=tuple(al))
            assert hr.allowed(p) == self._naive_allowed(dis, al, p), \
                (dis, al, p)

        run()


class TestChunkedScheduleIdentity:
    """The skew-split path (crawl._schedule_chunked): a shard slice
    streamed through the scheduler in seq-ordered chunks must be
    bit-identical to the one-shot call — ts is closed-form per host with
    the base carried in next_allowed between chunks."""

    H2 = "https://mega.test"

    def _mixed_batch(self):
        rows = []
        # mega host: 11 rows, shuffled seq order, mixed statuses
        for i, seq in enumerate([7, 0, 3, 9, 1, 4, 10, 2, 8, 5, 6]):
            rows.append((f"{self.H2}/p{seq}", self.H2, f"/p{seq}", seq,
                         i % 5 != 0,      # some MISSING
                         i % 7 != 0))     # some NON_HTML
        # small host interleaved
        for seq in (12, 11, 13):
            rows.append((f"{H}/q{seq}", H, f"/q{seq}", seq, True, True))
        return make_batch(rows)

    def _robots(self):
        return robots(**{
            H: HostRules(host=H, crawl_delay=0.5, fetchable=True),
            self.H2: HostRules(host=self.H2, crawl_delay=0.25,
                               fetchable=True)})

    @staticmethod
    def _canon(t: pa.Table):
        import pandas as pd
        df = t.select(["seq", "url", "ts", "status",
                       "will_save"]).to_pandas()
        return df.sort_values("seq").reset_index(drop=True)

    def test_chunked_equals_oneshot_and_state_carries(self):
        import pandas as pd

        batch = self._mixed_batch()
        a = PolitenessShardState(0, self._robots())
        b = PolitenessShardState(0, self._robots())

        one = a.schedule(batch, 1000.0, round_id=1)
        g = batch.sort_by("seq")
        outs = [b.schedule(g.slice(off, 4), 1000.0, 1, ci)
                for ci, off in enumerate(range(0, g.num_rows, 4))]
        two = pa.concat_tables(outs)

        pd.testing.assert_frame_equal(self._canon(one), self._canon(two))
        assert a.next_allowed == b.next_allowed

        # a SECOND round must also agree (state carried identically)
        nxt = make_batch([(f"{self.H2}/r1", self.H2, "/r1", 20, True, True),
                          (f"{H}/r2", H, "/r2", 21, True, True)])
        pd.testing.assert_frame_equal(
            self._canon(a.schedule(nxt, 1000.0, round_id=2)),
            self._canon(b.schedule(nxt, 1000.0, round_id=2)))

    def test_retry_replays_from_chunk0(self):
        import pandas as pd

        batch = self._mixed_batch().sort_by("seq")
        st = PolitenessShardState(0, self._robots())
        first = [st.schedule(batch.slice(off, 4), 1000.0, 1, ci)
                 for ci, off in enumerate(range(0, batch.num_rows, 4))]
        snap = dict(st.next_allowed)
        # simulated map_groups retry: the whole chunk sequence replays
        second = [st.schedule(batch.slice(off, 4), 1000.0, 1, ci)
                  for ci, off in enumerate(range(0, batch.num_rows, 4))]
        pd.testing.assert_frame_equal(
            self._canon(pa.concat_tables(first)),
            self._canon(pa.concat_tables(second)))
        assert st.next_allowed == snap

    def test_through_actor_helper(self, ray_session):
        import pandas as pd

        from webcrawler_ray.pipelines.crawl import _schedule_chunked
        from webcrawler_ray.state.politeness import (
            make_politeness_shard_actor,
        )

        batch = self._mixed_batch()
        ref = PolitenessShardState(0, self._robots())
        want = self._canon(ref.schedule(batch, 1000.0, round_id=1))

        actor = make_politeness_shard_actor().remote(0, self._robots())
        got = self._canon(
            _schedule_chunked(actor, batch, 1000.0, 1, chunk_rows=4))
        pd.testing.assert_frame_equal(got, want)
