"""sf1 scale rehearsal (round-5 directive): prove the crawl engine's
auto-sized BIG-SIDE routes fire and stay bit-identical at 10x the bench
scale.

Two flagship crawls over the same sf1 web (200 hosts x 360 pages,
limit 20,000 — 10x the sf0.1 spec):

1. DEFAULT config — the routes the auto-sizing picks at this scale.
2. BIG-SIDE config — ``fetch_broadcast_max_bytes`` lowered to 1 MiB so
   the production decision logic itself flips to the hash-bucketed
   PagesStore + bucketed flag index (the sandbox cannot hold a web
   whose flag index naturally exceeds 256 MiB — that needs ~15M URLs —
   so the knob is lowered and the SAME code path decides), plus
   ``politeness_chunk_rows=5000`` so hot-shard chunked scheduling
   engages.

The rehearsal asserts the two runs' attempts logs and corpora are
frame-equal (the engine invariant: routing is a performance decision,
never a semantic one), reports which routes engaged (store.bucketed /
flags_bucketed / per-round fetch_route) and the peak /dev/shm (object
store) footprint, and prints ONE JSON line for BASELINE.md.

    python tools/sf1_rehearsal.py            # ~minutes at 32 CPUs
"""

from __future__ import annotations

import hashlib
import json
import os
import shutil
import sys
import threading
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

NUM_CPUS = int(os.environ.get("RAY_GRAFT_CPUS", "32"))
SF1_BASE = "/tmp/webcrawler_ray_sf1"


class ShmSampler(threading.Thread):
    def __init__(self):
        super().__init__(daemon=True)
        self.peak = 0
        self._stop = threading.Event()

    def run(self):
        while not self._stop.is_set():
            try:
                self.peak = max(self.peak,
                                shutil.disk_usage("/dev/shm").used)
            except OSError:
                pass
            time.sleep(0.5)

    def stop(self) -> int:
        self._stop.set()
        return self.peak


def _crawl(web, workdir: str, cfg):
    from webcrawler_ray.pipelines.crawl import RayCrawler

    t0 = time.perf_counter()
    c = RayCrawler(web["pages"], web["robots"], workdir, cfg)
    seeds = open(web["seeds"]).read().splitlines()
    summary = c.crawl(seeds)
    wall = time.perf_counter() - t0
    att = c.attempts_dataset().to_pandas().sort_values(
        "fetch_seq").reset_index(drop=True)
    corpus = c.crawled_dataset().to_pandas().sort_values(
        "url").reset_index(drop=True)
    routes = {
        "store_bucketed": bool(c.store.bucketed),
        "flags_bucketed": bool(c.store.flags_bucketed),
        "fetch_routes": sorted({m.get("fetch_route", "?")
                                for m in _round_metrics(workdir)}),
    }
    c.shutdown_services()
    return summary, att, corpus, wall, routes


def _round_metrics(workdir: str):
    rdir = os.path.join(workdir, "rounds")
    out = []
    if os.path.isdir(rdir):
        for r in sorted(os.listdir(rdir)):
            mf = os.path.join(rdir, r, "metrics.json")
            if os.path.exists(mf):
                out.append(json.load(open(mf)))
    return out


def main() -> dict:
    import pandas as pd
    import ray

    from tools.make_sf1 import build

    ray.init(address="local", num_cpus=NUM_CPUS,
             include_dashboard=False, ignore_reinit_error=True,
             logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    sf1_dir = build(SF1_BASE)
    from webcrawler_ray.config import CrawlConfig
    from webcrawler_ray.pipelines.registry import _CRAWL_SCALES
    from webcrawler_ray.webgen import WebSpec, generate_web

    spec = dict(_CRAWL_SCALES["sf1"])
    limit = spec.pop("limit")
    web = generate_web(os.path.join(SF1_BASE, "web"), WebSpec(**spec))

    sampler = ShmSampler()
    sampler.start()

    wd_default = os.path.join(SF1_BASE, "rehearsal_default")
    shutil.rmtree(wd_default, ignore_errors=True)
    s1, att1, cor1, wall1, routes1 = _crawl(
        web, wd_default, CrawlConfig(limit=limit))

    wd_big = os.path.join(SF1_BASE, "rehearsal_bigside")
    shutil.rmtree(wd_big, ignore_errors=True)
    s2, att2, cor2, wall2, routes2 = _crawl(
        web, wd_big, CrawlConfig(
            limit=limit,
            fetch_broadcast_max_bytes=1 << 20,
            politeness_chunk_rows=5000))
    peak_shm = sampler.stop()

    # the engine invariant: routing never changes the answer
    pd.testing.assert_frame_equal(att1, att2)
    for col in ("url", "extracted_text", "title", "n_links"):
        assert list(cor1[col]) == list(cor2[col]), col
    html_digest = hashlib.sha256(
        b"".join(hashlib.sha256(h).digest()
                 for h in cor1["html"])).hexdigest()

    out = {
        "sf1_web": {"n_hosts": spec["n_hosts"],
                    "pages_per_host": spec["pages_per_host"],
                    "limit": limit},
        "pages_saved": int(s1["saved_total"]),
        "rounds": int(s1["round"]),
        "default_route": {"wall_sec": round(wall1, 2), **routes1,
                          "pages_per_sec": round(
                              s1["saved_total"] / wall1, 1)},
        "bigside_route": {"wall_sec": round(wall2, 2), **routes2,
                          "pages_per_sec": round(
                              s2["saved_total"] / wall2, 1)},
        "identical_output": True,
        "corpus_html_digest": html_digest[:16],
        "peak_shm_bytes": int(peak_shm),
        "num_cpus": NUM_CPUS,
        "sf1_tables_dir": sf1_dir,
    }
    print(json.dumps(out))
    ray.shutdown()
    return out


if __name__ == "__main__":
    main()
