"""CLI mirroring the reference's entry surface (`main.py:18-64`:
``-s <seeds> -n <limit> [-d]``) plus the sandbox-specific inputs (the
pages/robots tables that stand in for the live web).

    python -m webcrawler_ray -s seeds.txt -n 1000 \
        --pages web/pages.parquet --robots web/robots.parquet \
        --workdir /tmp/crawl [-d] [--resume] [--num-cpus 32]

plus the standalone query runner over the registry (every operator a
reference user runs is one name away):

    python -m webcrawler_ray query list
    python -m webcrawler_ray query doc_top_terms --sf-dir /root/testdata/sf0.01
    python -m webcrawler_ray query dedup_exact --sf-dir ... --out /tmp/out.parquet

Prints the run summary JSON and the per-host stats (S7,
`main.py:92` / `WorkersPipeline.py:281-291`) at the end. This entry point
OWNS its Ray session (guarded init), unlike the library code.
"""

from __future__ import annotations

import argparse
import json
import os
import sys


def _init_ray(num_cpus=None):
    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=num_cpus,
                 include_dashboard=False, ignore_reinit_error=True,
                 logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    return ray


def query_main(argv) -> int:
    ap = argparse.ArgumentParser(prog="webcrawler_ray query")
    ap.add_argument("name", help="registry query name, or 'list'")
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    ap.add_argument("--out", default=None,
                    help="write the result as parquet here instead of "
                         "printing")
    ap.add_argument("--num-cpus", type=int, default=None)
    ap.add_argument("--head", type=int, default=10)
    ap.add_argument("--stats", action="store_true",
                    help="print the Ray Data per-stage execution stats "
                         "(ds.stats()) after the result")
    args = ap.parse_args(argv)

    from .pipelines.registry import ORACLE_SQL, build_queries

    if args.name == "list":
        for k in sorted(build_queries()):
            kind = "sql-checked" if ORACLE_SQL.get(k) else "rows-only"
            print(f"{k}\t{kind}")
        return 0

    import ray as _ray_probe

    owned = not _ray_probe.is_initialized()  # embedded callers keep theirs
    ray = _init_ray(args.num_cpus)
    q = build_queries()
    if args.name not in q:
        print(f"unknown query: {args.name}", file=sys.stderr)
        return 2
    res = q[args.name](args.sf_dir)
    if args.out:
        if hasattr(res, "write_parquet"):
            res.write_parquet(args.out)
        else:
            import pyarrow as pa
            import pyarrow.parquet as pq

            t = res if isinstance(res, pa.Table) else \
                pa.Table.from_pandas(res, preserve_index=False)
            pq.write_table(t, args.out)
        print(json.dumps({"query": args.name, "out": args.out}))
    else:
        df = res.to_pandas() if hasattr(res, "to_pandas") else res
        print(df.head(args.head).to_string(index=False))
        print(json.dumps({"query": args.name, "rows": int(len(df))}))
    if args.stats and hasattr(res, "stats"):
        print(res.stats())  # per-stage wall/cpu/rows — the tuning loop
    if owned:
        ray.shutdown()
    return 0


def discover_main(argv) -> int:
    """``python -m webcrawler_ray discover --hosts h.txt [--gateway U]``
    — sitemap-driven seed discovery (robots.txt ``Sitemap:`` chain);
    prints discovered URLs one per line, ready for ``-s``."""
    ap = argparse.ArgumentParser(prog="webcrawler_ray discover")
    ap.add_argument("--hosts", required=True,
                    help="file of scheme-qualified hosts, one per line")
    ap.add_argument("--gateway", default=None,
                    help="optional fetch-gateway base URL")
    ap.add_argument("--timeout", type=float, default=10.0)
    ap.add_argument("--num-cpus", type=int, default=None)
    args = ap.parse_args(argv)

    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=args.num_cpus,
                 include_dashboard=False, ignore_reinit_error=True,
                 logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    from .discovery import discover_seeds

    with open(args.hosts) as f:
        hosts = [h.strip() for h in f if h.strip()]
    df = discover_seeds(ray, hosts, gateway=args.gateway,
                        timeout_s=args.timeout).to_pandas()
    for u in sorted(set(df["url"])):
        print(u)
    ray.shutdown()
    return 0


def main(argv=None) -> int:
    argv = list(sys.argv[1:] if argv is None else argv)
    if argv and argv[0] == "query":
        return query_main(argv[1:])
    if argv and argv[0] == "discover":
        return discover_main(argv[1:])
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

    owned = not ray.is_initialized()  # embedded callers keep their session
    if owned:
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

    if args.debug:
        # DebugPrinter parity (`DebugPrinter.py:9-18`): the reference
        # prints each saved page's record to STDOUT as
        # json.dumps(..., ensure_ascii=False, indent='\t') under a
        # print lock. The round engine's equivalent delivery: stream
        # the per-round crawl_log partitions in round order, each
        # round's records in virtual-time (Timestamp, URL) order — the
        # same total order the lock-serialized printer realizes, with
        # the already-proven byte-identical record layout
        # (crawl_debug_text's DuckDB to_json parity).
        import pyarrow.dataset as pads

        rounds_dir = os.path.join(args.workdir, "rounds")
        for d in (sorted(os.listdir(rounds_dir))
                  if os.path.isdir(rounds_dir) else []):
            log_dir = os.path.join(rounds_dir, d, "crawl_log")
            if not (os.path.isdir(log_dir) and os.path.exists(
                    os.path.join(rounds_dir, d, "_SUCCESS"))):
                continue
            t = pads.dataset(log_dir, partitioning=None).to_table()
            t = t.sort_by([("Timestamp", "ascending"),
                           ("URL", "ascending")])
            for rec in t.to_pylist():
                print(json.dumps(rec, ensure_ascii=False, indent="\t"))

    print(json.dumps(summary))

    hc = crawler.host_counts()
    if hc is not None:
        stats = {r["host"]: r["count()"] for r in hc.take_all()}
        print(json.dumps({"resources_num_per_host": stats}))
    crawler.shutdown_services()
    if owned:
        ray.shutdown()
    return 0


if __name__ == "__main__":
    sys.exit(main())
