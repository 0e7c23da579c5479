"""CLI mirroring the reference's entry surface (`main.py:18-64`:
``-s <seeds> -n <limit> [-d]``) plus the sandbox-specific inputs (the
pages/robots tables that stand in for the live web).

    python -m webcrawler_ray -s seeds.txt -n 1000 \
        --pages web/pages.parquet --robots web/robots.parquet \
        --workdir /tmp/crawl [-d] [--resume] [--num-cpus 32]

Prints the run summary JSON and the per-host stats (S7,
`main.py:92` / `WorkersPipeline.py:281-291`) at the end. This entry point
OWNS its Ray session (guarded init), unlike the library code.
"""

from __future__ import annotations

import argparse
import json
import sys


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(prog="webcrawler_ray")
    ap.add_argument("-s", "--seeds", required=True,
                    help="seed URL file, one per line")
    ap.add_argument("-n", "--limit", type=int, required=True,
                    help="page budget (reference semantics save limit+1)")
    ap.add_argument("-d", "--debug", action="store_true",
                    help="emit the crawl_log dataset (S6 debug records)")
    ap.add_argument("--pages", required=True,
                    help="pages parquet file/dir (the simulated web)")
    ap.add_argument("--robots", required=True, help="robots parquet")
    ap.add_argument("--workdir", required=True,
                    help="checkpoint/output directory")
    ap.add_argument("--resume", action="store_true",
                    help="resume from the last complete round")
    ap.add_argument("--num-cpus", type=int, default=None)
    ap.add_argument("--enrich", action="store_true",
                    help="crawl-time content fingerprints/quality columns")
    args = ap.parse_args(argv)

    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=args.num_cpus,
                 include_dashboard=False, ignore_reinit_error=True,
                 logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    from .config import CrawlConfig
    from .pipelines.crawl import RayCrawler

    cfg = CrawlConfig(limit=args.limit, debug_log=args.debug,
                      enrich=args.enrich)
    crawler = RayCrawler(args.pages, args.robots, args.workdir, cfg)
    with open(args.seeds) as f:
        seeds = f.read().splitlines()
    summary = crawler.crawl(seeds, resume=args.resume)
    print(json.dumps(summary))

    hc = crawler.host_counts()
    if hc is not None:
        stats = {r["host"]: r["count()"] for r in hc.take_all()}
        print(json.dumps({"resources_num_per_host": stats}))
    crawler.shutdown_services()
    ray.shutdown()
    return 0


if __name__ == "__main__":
    sys.exit(main())
