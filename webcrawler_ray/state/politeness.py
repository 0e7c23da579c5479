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

from ..functions.urls import passes_extension_blocklist
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
        self._rule_cache: dict[str, tuple] = {}  # host -> (delay, disallow, fetchable)
        self._last_round_id: int | None = None
        self._pre_round: dict[str, float] | None = None

    def _rules_for(self, host: str) -> tuple:
        r = self._rule_cache.get(host)
        if r is None:
            hr = self.robots.get(host)
            r = (hr.delay_seconds(), hr.disallow, hr.fetchable)
            self._rule_cache[host] = r
        return r

    def schedule(self, batch: pa.Table, T: float,
                 round_id: int | None = None) -> pa.Table:
        """Assign (ts, status, will_save) to one round's frontier slice.

        ``batch`` columns: url, host, resource, seq, in_table, is_html.
        Rows may arrive in any order; scheduling is per host in seq order.
        Updates next_allowed for hosts that made requests.

        ``round_id`` makes the call idempotent under Ray task retries: a
        repeated call for the same round first restores the pre-round
        next_allowed snapshot (each shard is scheduled exactly once per
        round — one group per pshard key).
        """
        if round_id is not None:
            if round_id == self._last_round_id and self._pre_round is not None:
                self.next_allowed = dict(self._pre_round)
            else:
                self._last_round_id = round_id
                self._pre_round = dict(self.next_allowed)
        n = batch.num_rows
        urls = batch.column("url").to_pylist()
        hosts = batch.column("host").to_pylist()
        resources = batch.column("resource").to_pylist()
        seqs = batch.column("seq").to_numpy(zero_copy_only=False)
        in_table = batch.column("in_table").to_numpy(zero_copy_only=False)
        is_html = batch.column("is_html").to_numpy(zero_copy_only=False)

        ts = np.zeros(n, dtype=np.float64)
        status = np.zeros(n, dtype=np.int16)

        # group rows by host, process each host's rows in seq order
        order = sorted(range(n), key=lambda i: (hosts[i], seqs[i]))
        i = 0
        while i < len(order):
            j = i
            host = hosts[order[i]]
            while j < len(order) and hosts[order[j]] == host:
                j += 1
            delay, disallow, _fetchable = self._rules_for(host)
            base = max(T, self.next_allowed.get(host, 0.0))
            k = 0
            for oi in order[i:j]:
                res = resources[oi]
                if any(p and res.startswith(p) for p in disallow):
                    st = STATUS_ROBOTS_DENIED
                elif not passes_extension_blocklist(urls[oi]):
                    st = STATUS_BLOCKLISTED
                elif not in_table[oi]:
                    st = STATUS_MISSING
                elif not is_html[oi]:
                    st = STATUS_NON_HTML
                else:
                    st = STATUS_SAVED
                ts[oi] = base + k * delay
                status[oi] = st
                if st == STATUS_SAVED:
                    k += 1
            if k > 0:
                self.next_allowed[host] = base + k * delay
            i = j

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
            robots = ray.get(robots_ref) if not isinstance(robots_ref, RobotsTable) else robots_ref
            self.state = PolitenessShardState(shard_id, robots)

        def schedule(self, batch: pa.Table, T: float,
                     round_id: int | None = None) -> pa.Table:
            return self.state.schedule(batch, T, round_id)

        def dump(self) -> bytes:
            return self.state.dump()

        def load(self, blob: bytes) -> None:
            self.state.load_next_allowed(blob)

    return PolitenessShard
