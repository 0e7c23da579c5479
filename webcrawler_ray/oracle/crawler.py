"""Deterministic single-process oracle — the canonical reading of the
reference crawler's semantics (SURVEY.md §5.1, §7 "crawl-ordering").

The reference (`/root/reference/Worker.py`, `Host.py`, `WorkersPipeline.py`)
is wall-clock- and hash-salt-nondeterministic (salted builtin ``hash``
`utils.py:52`, wall-clock priorities `Host.py:124-130`, thread
interleaving, set iteration `Parser.py:18-24`). Reproduction is therefore
defined against THIS oracle: a virtual-clock, stable-hash, sorted-set,
single-logical-worker reading that keeps every per-operator semantic
bit-faithful (normalize M1, split M2, blocklist M4, href fixup M8,
visible-text M9, robots gate M5, delay clamp ST3, mark-crawled-on-failure
`Worker.py:202`, LIMIT+1 stop ST6) while replacing the nondeterministic
scheduler with the canonical round/virtual-time model below. The Ray
pipeline must match this oracle's TOTAL crawl order exactly.

Canonical scheduler (shared by oracle and Ray pipeline):

* virtual clock T starts at 0; politeness state: per host ``next_allowed``
  (init 0) and delay d(h) = robots crawl-delay clamp (ST3).
* round r has frontier F_r = unique not-yet-attempted URLs discovered in
  round r-1, each with discovery key ``seq`` (int64; seeds: line number;
  links: parent_attempt_index * 2^20 + rank-in-sorted-page-links).
* per host, URLs in seq order get virtual timestamps
  ``ts = max(T, next_allowed[h]) + k * d(h)`` where k counts the
  *request-making* URLs so far (robots-denied / blocklisted / fetch-miss /
  non-html URLs make no successful page request -> consume no delay slot;
  the reference likewise performs no politeness wait for them,
  `Worker.py:209-216` is only reached when `_shouldAccessPage` passes).
* the round's total order is ``sort by (ts, host, seq)``; every URL up to
  the budget cut is ATTEMPTED (marked seen whether or not it saves,
  `Worker.py:202`); saving stops the crawl after ``limit+1`` saves
  (reference stops when counter > LIMIT, `WorkersPipeline.py:271-272`).
* T advances to the max ts of saved pages in the round.

Deliberately-preserved quirks and collapses are documented in SURVEY.md §7
(enqueue-time-only dedup collapses in the round model; the reference's
`_hostsOnQueue` never-removed latch `Worker.py:149-152` is read as the
intended re-queue semantics; the first-host priority-0 / "medium priority"
formula `Worker.py:140-147` collapses to next_allowed=0 for new hosts).
"""

from __future__ import annotations

from dataclasses import dataclass, field

from ..config import CrawlConfig
from ..functions.htmlparse import parse_page
from ..functions.urls import (
    complete_link,
    fixup_hrefs,
    normalize_and_split,
    passes_extension_blocklist,
)
from ..robots import RobotsTable

SEQ_SHIFT = 20  # seq = parent_attempt_idx << SEQ_SHIFT | link_rank

# Deterministic status codes (documented, not HTTP-faithful for failures):
STATUS_SAVED = 200
STATUS_ROBOTS_DENIED = 460
STATUS_BLOCKLISTED = 461
STATUS_MISSING = 404      # URL absent from the pages table (fetch miss)
STATUS_NON_HTML = 415     # present but content-type (lang) not text/html
# gate precedence mirrors the reference: robots -> blocklist -> HEAD miss
# -> content-type (Worker.py:238-253)


@dataclass
class CrawlRecord:
    fetch_seq: int      # global attempt index (total order position)
    url: str
    host: str
    resource: str
    ts: float           # virtual timestamp of the (attempted) request
    round: int
    seq: int            # discovery key
    status: int
    saved: bool
    title: str | None = None
    extracted_text: str | None = None
    first_n: str | None = None
    n_links: int = 0


@dataclass
class CrawlResult:
    records: list[CrawlRecord] = field(default_factory=list)
    seen: set[str] = field(default_factory=set)
    host_counts: dict[str, int] = field(default_factory=dict)  # attempts/host
    rounds: int = 0

    @property
    def saved_records(self) -> list[CrawlRecord]:
        return [r for r in self.records if r.saved]


class OracleCrawler:
    """Pure-Python canonical crawler over an in-memory pages dict."""

    def __init__(self, pages: dict[str, dict], robots: RobotsTable,
                 config: CrawlConfig | None = None):
        """``pages``: url -> {html: bytes, lang: str, warc_ts: int}."""
        self.pages = pages
        self.robots = robots
        self.cfg = config or CrawlConfig()

    def run(self, seeds: list[str]) -> CrawlResult:
        cfg = self.cfg
        res = CrawlResult()
        budget = cfg.limit + (1 if cfg.plus_one_quirk else 0)
        next_allowed: dict[str, float] = {}
        T = 0.0
        attempt_idx = 0

        # F_0 from seeds (Crawler.py:67-84 enqueue path: normalize+split)
        frontier: dict[str, tuple[str, str, int]] = {}  # url -> (host, res, seq)
        for i, seed in enumerate(seeds):
            host, resource = normalize_and_split(seed)
            if not host:
                continue
            url = complete_link(host, resource)
            if url not in res.seen and url not in frontier:
                frontier[url] = (host, resource, i)

        rnd = 0
        stopped = False
        while frontier and not stopped and rnd < cfg.max_rounds:
            # ---- schedule: per host, seq order, slot timestamps ----------
            by_host: dict[str, list[tuple[int, str, str]]] = {}
            for url, (host, resource, seq) in frontier.items():
                by_host.setdefault(host, []).append((seq, url, resource))

            scheduled = []  # (ts, host, seq, url, resource, status, will_save)
            for host in sorted(by_host):
                rules = self.robots.get(host)
                delay = rules.delay_seconds()
                base = max(T, next_allowed.get(host, 0.0))
                k = 0
                for seq, url, resource in sorted(by_host[host]):
                    row = self.pages.get(url)
                    if not rules.allowed(resource):
                        status = STATUS_ROBOTS_DENIED
                    elif not passes_extension_blocklist(url):
                        status = STATUS_BLOCKLISTED
                    elif row is None:
                        status = STATUS_MISSING
                    elif row["lang"] not in cfg.html_langs:
                        status = STATUS_NON_HTML
                    else:
                        status = STATUS_SAVED
                    will_save = status == STATUS_SAVED
                    ts = base + k * delay
                    if will_save:
                        k += 1
                    scheduled.append((ts, host, seq, url, resource, status, will_save))
                if k > 0:
                    next_allowed[host] = base + k * delay

            scheduled.sort(key=lambda t: (t[0], t[1], t[2]))

            # ---- walk in canonical order, attempt until budget cut -------
            candidates: dict[str, tuple[str, str, int]] = {}
            max_saved_ts = T
            for ts, host, seq, url, resource, status, will_save in scheduled:
                rec = CrawlRecord(
                    fetch_seq=attempt_idx, url=url, host=host,
                    resource=resource, ts=ts, round=rnd, seq=seq,
                    status=status, saved=will_save,
                )
                if will_save:
                    row = self.pages[url]
                    parsed = parse_page(row["html"])
                    links = fixup_hrefs(parsed.hrefs, host)
                    rec.title = parsed.title
                    rec.extracted_text = parsed.visible_text
                    rec.first_n = parsed.first_n_words(cfg.first_n_words)
                    rec.n_links = len(links)
                    for rank, link in enumerate(links):
                        lhost, lres = normalize_and_split(link)
                        if not lhost:
                            continue
                        lurl = complete_link(lhost, lres)
                        lseq = (attempt_idx << SEQ_SHIFT) | rank
                        prev = candidates.get(lurl)
                        if prev is None or lseq < prev[2]:
                            candidates[lurl] = (lhost, lres, lseq)
                    max_saved_ts = max(max_saved_ts, ts)
                res.records.append(rec)
                res.seen.add(url)
                res.host_counts[host] = res.host_counts.get(host, 0) + 1
                attempt_idx += 1
                if will_save:
                    budget -= 1
                    if budget <= 0:
                        stopped = True
                        break

            T = max_saved_ts
            rnd += 1
            frontier = {u: v for u, v in candidates.items() if u not in res.seen}

        res.rounds = rnd
        return res
