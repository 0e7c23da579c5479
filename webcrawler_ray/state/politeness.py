"""Politeness / robots / priority scheduling shards (ST2-ST4, M5).

Each shard actor owns the hosts with ``stable_hash64(host) % P == shard_id``
and holds, per host: cached robots rules (ST2, reference `Host.py:116-122`
one-fetch-per-host-ever), the clamped crawl delay (ST3, `Host.py:95-114`),
and the ``next_allowed`` virtual timestamp (ST3/ST4 — the canonical
replacement for the reference's wall-clock PriorityQueue priorities,
`Worker.py:126-152`, see oracle/crawler.py module docstring).

``schedule()`` implements the canonical slot assignment for one round's
frontier slice: per host in discovery (``seq``) order,
``ts = max(T, next_allowed) + k*delay`` with k counting only
request-making (saving) URLs; gate statuses are computed here too
(robots -> blocklist -> fetch-miss -> content-type, `Worker.py:238-253`
precedence). State is checkpointed per round via dump()/load().
"""

from __future__ import annotations

import pickle

import numpy as np
import pyarrow as pa

from ..robots import RobotsTable

STATUS_SAVED = 200
STATUS_ROBOTS_DENIED = 460
STATUS_BLOCKLISTED = 461
STATUS_MISSING = 404
STATUS_NON_HTML = 415


class PolitenessShardState:
    """Plain-object shard state, testable without Ray."""

    def __init__(self, shard_id: int, robots: RobotsTable):
        self.shard_id = shard_id
        self.robots = robots
        self.next_allowed: dict[str, float] = {}
        self._rule_cache: dict[str, tuple] = {}  # host -> (delay, HostRules)
        self._last_round_id: int | None = None
        self._pre_round: dict[str, float] | None = None
        # within-round chunk-carry state (see schedule's chunk_id doc)
        self._round_base: dict[str, float] = {}
        self._round_k: dict[str, int] = {}

    def _rules_for(self, host: str) -> tuple:
        r = self._rule_cache.get(host)
        if r is None:
            hr = self.robots.get(host)
            r = (hr.delay_seconds(), hr)
            self._rule_cache[host] = r
        return r

    def schedule(self, batch: pa.Table, T: float,
                 round_id: int | None = None,
                 chunk_id: int = 0) -> pa.Table:
        """Assign (ts, status, will_save) to one round's frontier slice.

        ``batch`` columns: url, host, resource, seq, in_table, is_html.
        Rows may arrive in any order; scheduling is per host in seq order.
        Updates next_allowed for hosts that made requests.

        ``round_id`` makes the call idempotent under Ray task retries: a
        repeated call for the same round first restores the pre-round
        next_allowed snapshot (each shard is scheduled exactly once per
        round — one group per pshard key).

        ``chunk_id`` supports the skew-split path (a mega-host shard
        slice streamed through the actor in seq-ordered chunks, see
        crawl._schedule_chunked): chunks after the first must NOT
        restore the snapshot — they continue from the state the previous
        chunk advanced. ts assignment is closed-form per host
        (base + k*delay with base carried in next_allowed), so chunked
        output is bit-identical to the one-shot call. A retried
        map_groups task re-sends chunk 0 first, which restores the
        snapshot and replays the whole sequence.
        """
        if chunk_id == 0:
            if round_id is not None:
                if (round_id == self._last_round_id
                        and self._pre_round is not None):
                    self.next_allowed = dict(self._pre_round)
                else:
                    self._last_round_id = round_id
                    self._pre_round = dict(self.next_allowed)
            # per-round chunk-carry state: the ORIGINAL round base and the
            # cumulative save count per host, so every chunk computes
            # ts = base + k*delay as ONE multiply-add from the same base —
            # accumulating floats across chunks (base += k1*delay, then
            # + j*delay) would drift from the one-shot result by IEEE
            # non-associativity and break the canonical crawl order
            self._round_base = {}
            self._round_k = {}
        import pandas as pd

        n = batch.num_rows
        if n == 0:
            out = batch.append_column("ts", pa.array([], pa.float64()))
            out = out.append_column("status", pa.array([], pa.int16()))
            return out.append_column("will_save", pa.array([], pa.bool_()))
        urls = pd.Series(batch.column("url").to_pylist(), dtype=object)
        hosts = np.asarray(batch.column("host").to_pylist(), dtype=object)
        resources = pd.Series(batch.column("resource").to_pylist(),
                              dtype=object)
        seqs = batch.column("seq").to_numpy(zero_copy_only=False)
        in_table = batch.column("in_table").to_numpy(zero_copy_only=False)
        is_html = batch.column("is_html").to_numpy(zero_copy_only=False)

        # ---- gates, fully vectorized ------------------------------------
        # M4 blocklist (Worker.py:13-30 semantics)
        from ..functions.urls import BLOCKED_EXT3, BLOCKED_EXT4

        ulen = urls.str.len()
        blocked = (((ulen > 3) & urls.str.slice(-3).isin(BLOCKED_EXT3))
                   | ((ulen > 4)
                      & urls.str.slice(-4).isin(BLOCKED_EXT4))).to_numpy()

        # M5 robots: per host, RFC 9309 longest-match (HostRules picks the
        # vectorized prefix kernel when the rule set allows it)
        codes, uniq_hosts = pd.factorize(hosts)
        robots_denied = np.zeros(n, dtype=bool)
        delays = np.empty(len(uniq_hosts), dtype=np.float64)
        bases = np.empty(len(uniq_hosts), dtype=np.float64)
        k0 = np.zeros(len(uniq_hosts), dtype=np.int64)
        for hc, host in enumerate(uniq_hosts):
            delay, hr = self._rules_for(host)
            delays[hc] = delay
            rb = self._round_base.get(host)
            if rb is None:
                rb = max(T, self.next_allowed.get(host, 0.0))
                self._round_base[host] = rb
            bases[hc] = rb
            k0[hc] = self._round_k.get(host, 0)
            # unreachable robots => allow-all (Host.py:85-86), regardless
            # of any rules in the table (denied_batch handles this)
            if hr.fetchable and (hr.disallow or hr.allow):
                m = codes == hc
                robots_denied[m] = hr.denied_batch(resources[m])

        # gate precedence: robots -> blocklist -> miss -> content-type
        status = np.select(
            [robots_denied, blocked, ~in_table, ~is_html],
            [STATUS_ROBOTS_DENIED, STATUS_BLOCKLISTED, STATUS_MISSING,
             STATUS_NON_HTML],
            default=STATUS_SAVED).astype(np.int16)
        will_save = status == STATUS_SAVED

        # ---- slot assignment: segmented cumsum in (host, seq) order -----
        order = np.lexsort((seqs, codes))
        codes_s = codes[order]
        ws_s = will_save[order].astype(np.int64)
        starts_mask = np.r_[True, np.diff(codes_s) != 0]
        seg_start = np.flatnonzero(starts_mask)
        seg_id = np.cumsum(starts_mask) - 1
        cum = np.cumsum(ws_s)
        # k = saves before me within my host segment
        start_cum = np.r_[0, cum[seg_start[1:] - 1]]
        k_s = (cum - ws_s) - start_cum[seg_id]
        host_code_s = codes_s[seg_start]
        ts_s = (bases[codes_s] + (k0[codes_s] + k_s) * delays[codes_s])
        ts = np.empty(n, dtype=np.float64)
        ts[order] = ts_s

        # next_allowed advances for hosts that made >=1 request — always
        # recomputed as ONE multiply-add from the round base so chunked
        # and one-shot scheduling produce the same IEEE double
        seg_end = np.r_[seg_start[1:] - 1, n - 1]
        k_tot = cum[seg_end] - start_cum
        for si, hc in enumerate(host_code_s):
            if k_tot[si] > 0:
                host = uniq_hosts[hc]
                kc = int(k0[hc] + k_tot[si])
                self._round_k[host] = kc
                self.next_allowed[host] = bases[hc] + kc * delays[hc]

        out = batch.append_column("ts", pa.array(ts, pa.float64()))
        out = out.append_column("status", pa.array(status, pa.int16()))
        out = out.append_column("will_save",
                                pa.array(status == STATUS_SAVED, pa.bool_()))
        return out

    def dump(self) -> bytes:
        return pickle.dumps({"shard_id": self.shard_id,
                             "next_allowed": self.next_allowed},
                            protocol=pickle.HIGHEST_PROTOCOL)

    def load_next_allowed(self, blob: bytes) -> None:
        d = pickle.loads(blob)
        assert d["shard_id"] == self.shard_id
        self.next_allowed = d["next_allowed"]


def make_politeness_shard_actor():
    """Actor factory (deferred import so module import needs no Ray session)."""
    import ray

    @ray.remote(num_cpus=0.1)
    class PolitenessShard:
        def __init__(self, shard_id: int, robots_ref):
            # a ray.put ref arrives auto-dereferenced; only a raw
            # ObjectRef (tests passing refs directly) needs ray.get —
            # type-check the REF, not the table class (LiveRobotsTable
            # is RobotsTable-shaped, not a subclass)
            robots = (ray.get(robots_ref)
                      if isinstance(robots_ref, ray.ObjectRef)
                      else robots_ref)
            self.state = PolitenessShardState(shard_id, robots)

        def schedule(self, batch: pa.Table, T: float,
                     round_id: int | None = None,
                     chunk_id: int = 0) -> pa.Table:
            return self.state.schedule(batch, T, round_id, chunk_id)

        def dump(self) -> bytes:
            return self.state.dump()

        def load(self, blob: bytes) -> None:
            self.state.load_next_allowed(blob)

    return PolitenessShard
