"""Robots model — M5 / ST2 / ST3 semantics over the synthetic robots table.

The reference fetches live ``robots.txt`` per host via reppy
(`WebAccesser.py:51-71`), caches one ruleset per host forever
(`Host.py:116-122`), treats an unreachable robots as allow-all
(`Host.py:74-81`), gates every page on ``robots.allowed(link, '*')``
(`Host.py:83-93`) and clamps the agent ``*`` crawl-delay to [0.1 s, 3 s]
with a 0.1 s default (`Host.py:95-114`).

Rule matching implements the full RFC 9309 semantics reppy implements:

* both **Allow** and **Disallow** rules;
* ``*`` matches any character sequence, ``$`` anchors the pattern end;
* a rule matches when its pattern matches a PREFIX of the path;
* among all matching rules the MOST SPECIFIC (longest pattern, by octet
  count) wins; on a specificity tie Allow wins (least-restrictive rule);
* no matching rule, an empty Disallow, or unreachable robots => allowed.

In this sandbox the "web" is a Parquet table, so rules come from the
synthetic ``robots`` table (FIXTURES.md §3): per host the agent-``*``
disallow and allow pattern lists, a nullable crawl_delay, and a
``fetchable`` flag (False == robots-unreachable -> allow-all, min delay).
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

import numpy as np

MIN_DELAY_SECONDS = 0.1  # Host.py:96 / spec politeness floor
MAX_DELAY_SECONDS = 3.0  # Host.py:97


def _compile_pattern(p: str) -> "re.Pattern[str]":
    """robots.txt path pattern -> compiled regex matched from the path
    start (``re.match``): ``*`` -> ``.*``; trailing ``$`` -> end anchor;
    everything else literal."""
    anchored = p.endswith("$")
    body = p[:-1] if anchored else p
    rx = ".*".join(re.escape(seg) for seg in body.split("*"))
    if anchored:
        rx += "$"
    return re.compile(rx)


@dataclass(frozen=True)
class HostRules:
    """Per-host politeness rules (the cached robots state, ST2)."""

    host: str  # host with schema, e.g. "https://host0.test"
    disallow: tuple[str, ...] = ()
    allow: tuple[str, ...] = ()
    crawl_delay: float | None = None
    fetchable: bool = True  # False == robots unreachable (couldNotAccessRobots)

    def __post_init__(self):
        rules = []
        for is_allow, pats in ((False, self.disallow), (True, self.allow)):
            for p in pats:
                if not p:
                    continue  # empty pattern = no-op rule (RFC 9309)
                rules.append((len(p), is_allow, _compile_pattern(p)))
        # longest pattern first; on equal length Allow first — so the
        # FIRST matching rule is the RFC winner
        rules.sort(key=lambda r: (-r[0], not r[1]))
        object.__setattr__(self, "_rules", tuple(rules))
        object.__setattr__(
            self, "_pure_prefix",
            not self.allow and all("*" not in p and "$" not in p
                                   for p in self.disallow))

    def allowed(self, resource: str) -> bool:
        """M5: robots-allowed predicate on the resource path (RFC 9309
        longest-match precedence)."""
        if not self.fetchable:
            return True  # Host.py:85-86 — unreachable robots => allow all
        for _len, is_allow, rx in self._rules:
            if rx.match(resource):
                return is_allow
        return True

    def denied_batch(self, resources) -> np.ndarray:
        """Vectorized denial over a pandas Series of resource paths (the
        politeness hot path). Pure-prefix Disallow-only rule sets use the
        pandas ``startswith`` kernel; rule sets with Allow or wildcards
        run one vectorized ``str.match`` PER RULE in precedence order
        (rules are sorted longest-first / Allow-first, so the first rule
        to match a row decides it) — never a per-row Python loop."""
        n = len(resources)
        if not self.fetchable or not self._rules:
            return np.zeros(n, dtype=bool)
        if self._pure_prefix:
            denied = np.zeros(n, dtype=bool)
            for p in self.disallow:
                if p:
                    denied |= resources.str.startswith(p).to_numpy()
            return denied
        denied = np.zeros(n, dtype=bool)
        undecided = np.ones(n, dtype=bool)
        for _len, is_allow, rx in self._rules:
            if not undecided.any():
                break
            m = resources.str.match(rx).to_numpy() & undecided
            if not is_allow:
                denied |= m
            undecided &= ~m
        return denied

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


def parse_robots_txt(text: str) -> tuple[tuple[str, ...], tuple[str, ...],
                                         float | None]:
    """Minimal RFC 9309 ``robots.txt`` parser for the agent-``*`` group:
    returns ``(disallow, allow, crawl_delay)``. Field names are
    case-insensitive, ``#`` comments are stripped, consecutive
    ``User-agent`` lines form one group header, and only groups naming
    ``*`` contribute rules (the reference's reppy usage queries agent
    ``*`` exclusively, `Host.py:83-114`)."""
    dis: list[str] = []
    al: list[str] = []
    cd: float | None = None
    active = False        # the current group applies to agent '*'
    in_agent_run = False  # inside a run of consecutive User-agent lines
    for raw in text.splitlines():
        line = raw.split("#", 1)[0].strip()
        if not line or ":" not in line:
            continue
        fieldname, _, value = line.partition(":")
        fieldname = fieldname.strip().lower()
        value = value.strip()
        if fieldname == "user-agent":
            if not in_agent_run:
                active = False
                in_agent_run = True
            if value == "*":
                active = True
            continue
        in_agent_run = False
        if not active:
            continue
        if fieldname == "disallow":
            if value:
                dis.append(value)
        elif fieldname == "allow":
            if value:
                al.append(value)
        elif fieldname == "crawl-delay":
            try:
                cd = float(value)
            except ValueError:
                pass
    return tuple(dis), tuple(al), cd


def render_robots_txt(disallow=(), allow=(), crawl_delay: float | None = None,
                      sitemaps=()) -> str:
    """Inverse of :func:`parse_robots_txt` (round-trip tested): one
    agent-``*`` group in the standard line format, plus optional
    group-independent ``Sitemap:`` directives (RFC 9309 §2.3 /
    sitemaps.org discovery). Used by the loopback test gateway to serve
    the synthetic robots table as real HTTP ``robots.txt`` bodies."""
    lines = ["User-agent: *"]
    lines += [f"Disallow: {p}" for p in disallow]
    lines += [f"Allow: {p}" for p in allow]
    if crawl_delay is not None:
        lines.append(f"Crawl-delay: {crawl_delay}")
    lines += [f"Sitemap: {s}" for s in sitemaps]
    return "\n".join(lines) + "\n"


def parse_robots_sitemaps(text: str) -> tuple[str, ...]:
    """``Sitemap:`` directives of a robots.txt — group-INDEPENDENT per
    the sitemaps.org protocol (they apply regardless of User-agent), so
    this is a separate scan from :func:`parse_robots_txt`'s agent-``*``
    group parse."""
    out = []
    for raw in text.splitlines():
        line = raw.split("#", 1)[0].strip()
        if ":" not in line:
            continue
        fieldname, _, value = line.partition(":")
        if fieldname.strip().lower() == "sitemap" and value.strip():
            out.append(value.strip())
    return tuple(out)


class LiveRobotsTable:
    """RobotsTable-shaped LIVE robots source: fetches
    ``{host}/robots.txt`` over HTTP on FIRST query per host and caches
    the parsed rules forever — the reference's per-host robots cache
    (ST2, `Host.py:116-122`, `WebAccesser.py:51-71`). A non-200 or
    unreachable robots is allow-all / min-delay (`Host.py:74-81`).

    Scale shape: the object is broadcast once (``ray.put``) and each
    politeness shard deserializes its OWN copy, so every shard ends up
    with a private connection pool and a robots cache covering exactly
    the hosts that hash to it — no shared mutable state, no global
    robots table materialized anywhere. Picklable by construction: the
    urllib3 pool is built lazily on first use after transfer."""

    def __init__(self, gateway: str | None = None, timeout_s: float = 10.0):
        self.gateway = gateway
        self.timeout_s = timeout_s
        self._cache: dict[str, HostRules] = {}
        self._fetcher = None

    def __getstate__(self):
        return {"gateway": self.gateway, "timeout_s": self.timeout_s}

    def __setstate__(self, st):
        self.__init__(**st)

    def get(self, host: str) -> HostRules:
        r = self._cache.get(host)
        if r is None:
            r = self._fetch_rules(host)
            self._cache[host] = r
        return r

    def _fetch_rules(self, host: str) -> HostRules:
        from .stages.fetcher import HttpFetcher

        if self._fetcher is None:
            self._fetcher = HttpFetcher(timeout_s=self.timeout_s,
                                        gateway=self.gateway)
        raw = self._fetcher.get([host + "/robots.txt"])[0]
        if raw is None:
            return HostRules(host=host, fetchable=False)
        try:
            dis, al, cd = parse_robots_txt(raw.decode("utf-8", "replace"))
        except Exception:
            return HostRules(host=host, fetchable=False)
        return HostRules(host=host, disallow=dis, allow=al,
                         crawl_delay=cd, fetchable=True)


@dataclass
class RobotsTable:
    """host -> HostRules registry built from the synthetic robots table."""

    rules: dict[str, HostRules] = field(default_factory=dict)

    @classmethod
    def from_arrow(cls, table) -> "RobotsTable":
        """Build from a pyarrow.Table with columns
        (host, disallow: list<string>, crawl_delay: double?, fetchable:
        bool[, allow: list<string>]) — ``allow`` optional for tables
        written before wildcard/Allow support."""
        d = {}
        hosts = table.column("host").to_pylist()
        dis = table.column("disallow").to_pylist()
        cd = table.column("crawl_delay").to_pylist()
        fe = table.column("fetchable").to_pylist()
        if "allow" in table.column_names:
            al = table.column("allow").to_pylist()
        else:
            al = [None] * len(hosts)
        for h, dl, a, c, f in zip(hosts, dis, al, cd, fe):
            d[h] = HostRules(host=h, disallow=tuple(dl or ()),
                             allow=tuple(a or ()), crawl_delay=c,
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
