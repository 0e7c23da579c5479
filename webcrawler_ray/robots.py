"""Robots model — M5 / ST2 / ST3 semantics over the synthetic robots table.

The reference fetches live ``robots.txt`` per host via reppy
(`WebAccesser.py:51-71`), caches one ruleset per host forever
(`Host.py:116-122`), treats an unreachable robots as allow-all
(`Host.py:74-81`), gates every page on ``robots.allowed(link, '*')``
(`Host.py:83-93`) and clamps the agent ``*`` crawl-delay to [0.1 s, 3 s]
with a 0.1 s default (`Host.py:95-114`).

In this sandbox the "web" is a Parquet table, so robots rules come from the
synthetic ``robots`` table (FIXTURES.md §3): per host a list of disallowed
path *prefixes* for agent ``*``, a nullable crawl_delay, and a ``fetchable``
flag (False == robots-unreachable -> allow-all, min delay). Prefix matching
is exact for this corpus (the generator only emits prefix rules — no
wildcards), which makes the model faithful to reppy on every input it sees.
"""

from __future__ import annotations

from dataclasses import dataclass, field

MIN_DELAY_SECONDS = 0.1  # Host.py:96 / spec politeness floor
MAX_DELAY_SECONDS = 3.0  # Host.py:97


@dataclass(frozen=True)
class HostRules:
    """Per-host politeness rules (the cached robots state, ST2)."""

    host: str  # host with schema, e.g. "https://host0.test"
    disallow: tuple[str, ...] = ()
    crawl_delay: float | None = None
    fetchable: bool = True  # False == robots unreachable (couldNotAccessRobots)

    def allowed(self, resource: str) -> bool:
        """M5: robots-allowed predicate on the resource path."""
        if not self.fetchable:
            return True  # Host.py:85-86 — unreachable robots => allow all
        for prefix in self.disallow:
            if prefix and resource.startswith(prefix):
                return False
        return True

    def delay_seconds(self) -> float:
        """ST3: crawl-delay clamped to [0.1, 3], default 0.1 (Host.py:95-114)."""
        if not self.fetchable:
            return MIN_DELAY_SECONDS
        if self.crawl_delay is None:
            return MIN_DELAY_SECONDS
        if self.crawl_delay > MAX_DELAY_SECONDS:
            return MAX_DELAY_SECONDS
        if self.crawl_delay < MIN_DELAY_SECONDS:
            # reppy returns the raw value; the reference clamps only the top
            # end — but a delay below the spec floor of 100 ms is still
            # returned as-is by Host.py:108-114 *unless* None. Reproduce:
            return self.crawl_delay
        return self.crawl_delay


ALLOW_ALL = HostRules(host="", disallow=(), crawl_delay=None, fetchable=False)


@dataclass
class RobotsTable:
    """host -> HostRules registry built from the synthetic robots table."""

    rules: dict[str, HostRules] = field(default_factory=dict)

    @classmethod
    def from_arrow(cls, table) -> "RobotsTable":
        """Build from a pyarrow.Table with columns
        (host, disallow: list<string>, crawl_delay: double?, fetchable: bool)."""
        d = {}
        hosts = table.column("host").to_pylist()
        dis = table.column("disallow").to_pylist()
        cd = table.column("crawl_delay").to_pylist()
        fe = table.column("fetchable").to_pylist()
        for h, dl, c, f in zip(hosts, dis, cd, fe):
            d[h] = HostRules(host=h, disallow=tuple(dl or ()), crawl_delay=c,
                             fetchable=bool(f))
        return cls(rules=d)

    @classmethod
    def from_parquet(cls, path: str) -> "RobotsTable":
        import pyarrow.parquet as pq

        return cls.from_arrow(pq.read_table(path))

    def get(self, host: str) -> HostRules:
        """Unknown host == robots unreachable -> allow-all, min delay."""
        r = self.rules.get(host)
        if r is None:
            return HostRules(host=host, fetchable=False)
        return r
