"""The Ray-Data-native crawl driver (SURVEY.md §3.4 lifecycle).

Each frontier round is a Dataset pipeline:

    read frontier parquet
      -> map_batches: HEAD-equivalent flags (broadcast hash index)   [S3/M11]
      -> map_batches: politeness-shard key                            [SH1]
      -> groupby(pshard).map_groups -> politeness actors: robots gate,
         virtual-time slot assignment (ts, status, will_save)         [ST2-ST4, M5]
      -> sort(ts, host, seq)  == the canonical total order            [SH3]
      -> distributed prefix-sum budget cut + global fetch_seq ranks   [ST6]
      -> map_batches: seen-shard insert (bloom+cuckoo+exact actors)   [ST1]
      -> filter saved -> GET-equivalent html fetch (broadcast or
         bucketed-store hash join)                                    [S4]
      -> map_batches actor pool: parse/extract/outlink fixup          [M6-M10]
      -> write crawled parquet (1000-row files == WARC rotation)      [S5]
      -> explode links -> groupby(url).min(seq) dedup -> seen filter
         -> next frontier parquet                                     [SH2/ST1]

Between rounds the driver checkpoints: next frontier, seen-shard dumps,
politeness dumps, metrics, then a ``_SUCCESS`` marker — a killed job
resumes from the last complete round and never re-fetches a URL already
in a ``crawled`` partition (SURVEY.md §4 checkpoint row). Termination is
the trivial driver-side check: budget exhausted or empty frontier
(replacing the reference's race-prone event protocol,
`WorkersPipeline.py:177-227`, SURVEY.md §2.7).

The budget cut is a distributed ordered prefix sum: per sorted block a
summary row (first key, row count, save count) -> tiny driver-side cumsum
-> per-block verdict broadcast back (keep / partial(n) / drop). No block
ordering assumption is needed — blocks are identified by their unique
first sort key.
"""

from __future__ import annotations

import json
import os
import time

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from ..config import CrawlConfig
from ..functions.urls import (
    complete_link,
    normalize_and_split,
    split_host_resource,
    stable_hash64_batch,
)
from ..robots import RobotsTable
from ..stages.fetch import PagesStore
from ..stages.parse import ParseHtmlBatch, explode_links
from ..state.politeness import STATUS_SAVED, make_politeness_shard_actor
from ..state.seen import make_seen_shard_actor

def _nblocks(rows: int, rows_per_block: int = 4000, cap: int = 64) -> int:
    """Right-size a tiny-to-medium dataset's block count: Ray's default
    read splitting gives ~CPU-count blocks, which turns every downstream
    sort/groupby of a small round into a 64-partition shuffle of near-empty
    blocks — pure scheduling overhead. Sized blocks keep shuffle partition
    counts proportional to data."""
    return max(1, min(cap, rows // rows_per_block + 1))


def _meta_broadcast_max(cfg) -> int:
    """Byte ceiling for the bucketwise fetch's broadcast metadata table
    (``ray.put`` once, read by every bucket task). Explicit
    ``fetch_meta_broadcast_max_bytes`` wins; the default derives from
    the CLUSTER's object store — 1/32 of it, capped at 1 GiB — so on a
    small-memory node the broadcast route steps aside for the
    groupby-exchange route before the metadata table can crowd the
    pipeline's own blocks out of the store."""
    explicit = cfg.extra.get("fetch_meta_broadcast_max_bytes")
    if explicit is not None:
        return int(explicit)
    try:
        import ray as _ray

        oss = int(_ray.cluster_resources().get("object_store_memory", 0))
    except Exception:
        oss = 0
    return min(1 << 30, oss // 32) if oss else 1 << 30


def _is_live(path: str) -> bool:
    """A pages/robots 'path' that is a URL (fetch-gateway base) or the
    sentinel ``live:`` selects the live-HTTP route."""
    return path == "live:" or path.startswith(("http://", "https://"))


def _live_gateway(path: str) -> str | None:
    return None if path == "live:" else path


FRONTIER_SCHEMA = pa.schema([
    ("url", pa.string()), ("host", pa.string()),
    ("resource", pa.string()), ("seq", pa.int64()),
])


def _write_frontier(path: str, urls, hosts, ress, seqs) -> int:
    os.makedirs(path, exist_ok=True)
    t = pa.table({"url": pa.array(urls, pa.string()),
                  "host": pa.array(hosts, pa.string()),
                  "resource": pa.array(ress, pa.string()),
                  "seq": pa.array(seqs, pa.int64())})
    pq.write_table(t, os.path.join(path, "part-0.parquet"))
    return t.num_rows


def _schedule_chunked(actor, group: pa.Table, T: float, rnd: int,
                      chunk_rows: int) -> pa.Table:
    """Schedule one pshard group, splitting oversized slices explicitly.

    Skew handling (north rule): hash(host) % P keeps hosts apart, but a
    mega-host's whole round slice still lands in ONE group, so an
    unbounded slice would ship through a single actor RPC and sit in the
    actor heap whole. Instead, the slice is sorted by seq and streamed
    through the SAME actor in ``chunk_rows``-row chunks: ts assignment
    is closed-form per host (base + k*delay) with the base carried in
    ``next_allowed`` between calls, so the concatenated result is
    bit-identical to the one-shot schedule while actor memory stays
    O(chunk_rows). chunk_id=0 owns the round-retry snapshot (a retried
    map_groups task replays from chunk 0, restoring state first).
    """
    import ray as _ray

    if group.num_rows <= chunk_rows:
        return _ray.get(actor.schedule.remote(group, T, rnd))
    g = group.sort_by("seq")  # per-host seq order across chunk cuts
    outs = []
    for ci, off in enumerate(range(0, g.num_rows, chunk_rows)):
        outs.append(_ray.get(actor.schedule.remote(
            g.slice(off, chunk_rows), T, rnd, ci)))
    return pa.concat_tables(outs)


class RayCrawler:
    """Crawl(config).run(seeds) — the programmatic surface mirroring the
    reference's ``Crawler`` (`Crawler.py:11-103`), returning datasets."""

    def __init__(self, pages_path: str, robots_path: str, workdir: str,
                 config: CrawlConfig | None = None):
        import ray

        self.ray = ray
        self.cfg = config or CrawlConfig()
        self.pages_path = pages_path
        self.robots_path = robots_path
        self.workdir = workdir
        os.makedirs(workdir, exist_ok=True)
        if _is_live(pages_path):
            # live web: pages_path is a fetch-gateway base URL (or the
            # sentinel "live:" for direct fetching) — HEAD/GET run over
            # HTTP through per-process pooled fetchers instead of the
            # Parquet pages table (`WebAccesser.py:42-94` parity)
            from ..stages.fetcher import HttpPagesStore

            self.store = HttpPagesStore(
                self.cfg, gateway=_live_gateway(pages_path),
                timeout_s=float(self.cfg.extra.get("fetch_timeout_s",
                                                   10.0)))
        else:
            # the bucketed store is derived data of the pages table:
            # co-locate it with the table so repeated runs (and fresh
            # workdirs) reuse it
            self.store = PagesStore(pages_path, self.cfg,
                                    pages_path + "_store")
        self._services_up = False
        self.seen = []
        self.pol = []

    # ------------------------------------------------------------------
    def _start_services(self):
        if self._services_up:
            return
        ray = self.ray
        cfg = self.cfg
        cpus = ray.cluster_resources().get("CPU", 4)
        if cfg.num_politeness_shards is None:
            # sizing rule: a politeness shard serves its whole round slice
            # in one schedule RPC (sched_group blocks on it), so shard
            # count IS that stage's parallelism — derive it from the
            # cluster rather than a constant. CPUs//2 leaves headroom for
            # the map_groups tasks doing the calling.
            cfg.num_politeness_shards = max(4, int(cpus) // 2)
        if cfg.num_seen_shards is None:
            # same rule: seen shards serve batched insert/contains RPCs
            # from every attempts/frontier task — widen with the cluster
            cfg.num_seen_shards = max(4, int(cpus) // 2)
        if _is_live(self.robots_path):
            # live robots: each politeness shard fetches+caches robots.txt
            # per host lazily (reference Host.py:116-122); the broadcast
            # object carries only the gateway/timeout, never a rule table
            from ..robots import LiveRobotsTable

            robots_src = LiveRobotsTable(
                gateway=_live_gateway(self.robots_path),
                timeout_s=float(cfg.extra.get("fetch_timeout_s", 10.0)))
        else:
            robots_src = RobotsTable.from_parquet(self.robots_path)
        robots_ref = ray.put(robots_src)
        Seen = make_seen_shard_actor()
        Pol = make_politeness_shard_actor()
        self.seen = [Seen.remote(i, cfg.seen_capacity_per_shard,
                                 cfg.seen_exact_confirm)
                     for i in range(cfg.num_seen_shards)]
        self.pol = [Pol.remote(i, robots_ref)
                    for i in range(cfg.num_politeness_shards)]
        self.store.prepare(ray)
        self._services_up = True

    def shutdown_services(self):
        for a in self.seen + self.pol:
            self.ray.kill(a)
        self.seen, self.pol = [], []
        self._services_up = False

    # ------------------------------------------------------------------
    def _round_dir(self, rnd: int) -> str:
        return os.path.join(self.workdir, "rounds", f"r={rnd:05d}")

    def _seed_frontier(self, seeds: list[str]) -> tuple[str, int]:
        """F_0: normalize+split seeds (Crawler.py:67-84 enqueue path)."""
        front: dict[str, tuple[str, str, int]] = {}
        for i, s in enumerate(seeds):
            s = s.strip()
            if not s:
                continue
            host, res = normalize_and_split(s)
            if not host:
                continue
            url = complete_link(host, res)
            if url not in front:
                front[url] = (host, res, i)
        path = os.path.join(self.workdir, "frontier_0")
        items = sorted(front.items(), key=lambda kv: kv[1][2])
        n = _write_frontier(path, [u for u, _ in items],
                            [v[0] for _, v in items],
                            [v[1] for _, v in items],
                            [v[2] for _, v in items])
        return path, n

    # ------------------------------------------------------------------
    def _checkpoint_shard_counts(self) -> tuple[int, int] | None:
        """(num_seen, num_politeness) recorded by the latest complete
        checkpoint's state dump — resume MUST recreate the same shard
        counts (state is hash-partitioned per actor), so these override
        the config/cluster-derived values; a crawl resumed on a
        different-sized cluster still loads correctly."""
        rounds_dir = os.path.join(self.workdir, "rounds")
        if not os.path.isdir(rounds_dir):
            return None
        done = sorted(d for d in os.listdir(rounds_dir)
                      if os.path.exists(os.path.join(rounds_dir, d,
                                                     "_SUCCESS")))
        if not done:
            return None
        sd = os.path.join(rounds_dir, done[-1], "state")
        if not os.path.isdir(sd):
            return None
        ns = len([f for f in os.listdir(sd) if f.startswith("seen_")])
        np_ = len([f for f in os.listdir(sd) if f.startswith("pol_")])
        return (ns, np_) if ns and np_ else None

    def crawl(self, seeds: list[str], resume: bool = False) -> dict:
        """Run (or resume) the crawl; returns the final summary dict."""
        if resume and not self._services_up:
            counts = self._checkpoint_shard_counts()
            if counts is not None:
                self.cfg.num_seen_shards, \
                    self.cfg.num_politeness_shards = counts
        self._start_services()
        cfg = self.cfg
        state = None
        if resume:
            state = self._load_latest_checkpoint()
        if state is None:
            frontier_path, n_frontier = self._seed_frontier(seeds)
            state = {"round": 0, "T": 0.0, "attempt_base": 0,
                     "budget_left": cfg.limit + (1 if cfg.plus_one_quirk else 0),
                     "saved_total": 0, "frontier_path": frontier_path,
                     "n_frontier": n_frontier, "stopped": False}

        while (not state["stopped"] and state["n_frontier"] > 0
               and state["budget_left"] > 0
               and state["round"] < cfg.max_rounds):
            state = self._run_round(state)

        summary = {k: state[k] for k in
                   ("round", "T", "attempt_base", "saved_total", "budget_left",
                    "stopped")}
        summary["rounds_dir"] = os.path.join(self.workdir, "rounds")
        with open(os.path.join(self.workdir, "summary.json"), "w") as f:
            json.dump(summary, f, indent=1)
        return summary

    # ------------------------------------------------------------------
    def _run_round(self, st: dict) -> dict:
        ray = self.ray
        cfg = self.cfg
        rnd = st["round"]
        T = st["T"]
        t0 = time.perf_counter()
        rdir = self._round_dir(rnd)
        if os.path.isdir(rdir) and not os.path.exists(
                os.path.join(rdir, "_SUCCESS")):
            # partial output of a killed run: wipe it so re-running the
            # round cannot mix stale part files into its parquet dirs
            import shutil

            shutil.rmtree(rdir)
        os.makedirs(rdir, exist_ok=True)
        stage_secs: dict[str, float] = {}
        _last = [t0]

        def _mark(stage: str) -> None:
            now = time.perf_counter()
            stage_secs[stage] = round(now - _last[0], 3)
            _last[0] = now

        # zstd on every sink: disk bandwidth is the one resource that does
        # NOT scale with CPUs — trade (parallel) compression cpu for it
        pq_args = {"compression": cfg.extra.get("parquet_compression", "zstd")}

        # chaos seam (faults.py): None in production; a test can target
        # one stage to SIGKILL its worker once, driving Ray's real
        # task-retry path through this round's idempotence contracts
        fault_spec = cfg.extra.get("fault_inject")

        # partitioning=None everywhere under workdir: the r=NNNNN round
        # path component must never be inferred as a hive column (it
        # would leak an `r` column into every written attempts/crawled
        # file downstream)
        ds = ray.data.read_parquet(
            st["frontier_path"], partitioning=None,
            override_num_blocks=_nblocks(st["n_frontier"]))

        # ---- flags (HEAD-equivalent) + politeness shard key -------------
        ds = ds.map_batches(self.store.add_flags_fn(), batch_format="pyarrow",
                            batch_size=cfg.url_batch_size)
        P = cfg.num_politeness_shards

        def add_pshard(batch: pa.Table) -> pa.Table:
            hh = stable_hash64_batch(batch.column("host").to_pylist())
            return batch.append_column(
                "pshard", pa.array((hh % P).astype(np.int64), pa.int64()))

        ds = ds.map_batches(add_pshard, batch_format="pyarrow")

        # ---- politeness scheduling (one actor RPC per shard; skew-split
        # for oversized slices — north-rule "skew-heavy hosts salted and
        # split explicitly": a mega-host concentrates its whole round
        # slice in one pshard group, so that group streams through its
        # actor in bounded seq-ordered chunks instead of one giant RPC) --
        pol = self.pol
        chunk_rows = cfg.politeness_chunk_rows

        def sched_group(group: pa.Table) -> pa.Table:
            if group.num_rows == 0:
                return group
            sid = int(group.column("pshard")[0].as_py())
            return _schedule_chunked(pol[sid],
                                     group.drop_columns(["pshard"]),
                                     T, rnd, chunk_rows)

        ds = ds.groupby("pshard").map_groups(sched_group, batch_format="pyarrow")

        # ---- canonical total order --------------------------------------
        sorted_ds = ds.sort(["ts", "host", "seq"]).materialize()
        _mark("schedule_sort")
        # politeness state is final for this round: checkpoint it async,
        # overlapped with the fetch/parse work below
        pol_futs = [a.dump.remote() for a in self.pol]

        # ---- distributed ordered prefix sum -> budget cut ---------------
        def block_summary(batch: pa.Table) -> pa.Table:
            if batch.num_rows == 0:
                return pa.table({"first_ts": pa.array([], pa.float64()),
                                 "first_host": pa.array([], pa.string()),
                                 "first_seq": pa.array([], pa.int64()),
                                 "n_rows": pa.array([], pa.int64()),
                                 "n_saves": pa.array([], pa.int64())})
            ws = batch.column("will_save").to_numpy(zero_copy_only=False)
            return pa.table({
                "first_ts": [batch.column("ts")[0].as_py()],
                "first_host": [batch.column("host")[0].as_py()],
                "first_seq": [batch.column("seq")[0].as_py()],
                "n_rows": [batch.num_rows],
                "n_saves": [int(ws.sum())],
            })

        summ = sorted_ds.map_batches(block_summary, batch_size=None,
                                     batch_format="pyarrow").to_pandas()
        _mark("block_summaries")
        summ = summ.sort_values(["first_ts", "first_host", "first_seq"])
        budget_left = st["budget_left"]
        block_info: dict[tuple, tuple] = {}
        base_rows = 0
        cum_saves = 0
        for _, row in summ.iterrows():
            key = (row.first_ts, row.first_host, int(row.first_seq))
            if cum_saves >= budget_left:
                block_info[key] = ("drop", 0, base_rows)
            elif cum_saves + row.n_saves >= budget_left:
                block_info[key] = ("partial", int(budget_left - cum_saves),
                                   base_rows)
            else:
                block_info[key] = ("keep", 0, base_rows)
            cum_saves += int(row.n_saves)
            base_rows += int(row.n_rows)

        attempt_base = st["attempt_base"]

        def cut_filter(batch: pa.Table) -> pa.Table:
            if batch.num_rows == 0:
                batch = batch.append_column("fetch_seq",
                                            pa.array([], pa.int64()))
                return batch.append_column("round", pa.array([], pa.int32()))
            key = (batch.column("ts")[0].as_py(),
                   batch.column("host")[0].as_py(),
                   batch.column("seq")[0].as_py())
            mode, allowed, base = block_info[key]
            if mode == "drop":
                batch = batch.slice(0, 0)
            elif mode == "partial":
                ws = batch.column("will_save").to_numpy(zero_copy_only=False)
                cum = np.cumsum(ws)
                cut_idx = int(np.searchsorted(cum, allowed))  # allowed-th save
                batch = batch.slice(0, cut_idx + 1)
            fs = attempt_base + base + np.arange(batch.num_rows, dtype=np.int64)
            batch = batch.append_column("fetch_seq", pa.array(fs, pa.int64()))
            return batch.append_column(
                "round", pa.array(np.full(batch.num_rows, rnd, dtype=np.int32),
                                  pa.int32()))

        # ---- seen-set insert (ST1) --------------------------------------
        seen = self.seen
        S = cfg.num_seen_shards

        def seen_insert(batch: pa.Table) -> pa.Table:
            import ray as _ray
            if batch.num_rows == 0:
                return batch
            urls = batch.column("url").to_pylist()
            h = stable_hash64_batch(urls)
            shard = h % S
            futs = []
            for s in np.unique(shard):
                m = shard == s
                futs.append(seen[int(s)].insert.remote(
                    h[m], [urls[i] for i in np.nonzero(m)[0]]))
            _ray.get(futs)
            # kill AFTER the shard inserts landed: the retry re-runs the
            # whole fused task (cut -> insert -> attempts write), so the
            # re-executed inserts must be absorbed set-idempotently
            from ..faults import maybe_inject_fault

            maybe_inject_fault(fault_spec, "seen_insert")
            return batch

        # ---- attempts log: the round's ONE materialization point --------
        # (parquet write executes cut + seen inserts; everything downstream
        # reads the columnar attempts log back — resumable by construction)
        att_dir = os.path.join(rdir, "attempts")
        (sorted_ds
         .map_batches(cut_filter, batch_size=None, batch_format="pyarrow")
         .map_batches(seen_insert, batch_format="pyarrow")
         .map_batches(lambda t: t.drop_columns(
             [c for c in ("in_table", "is_html", "will_save")
              if c in t.column_names]), batch_format="pyarrow")
         .write_parquet(att_dir, **pq_args))
        _mark("cut_insert_write")
        # the attempts write ran every seen-shard insert: seen state is
        # final for this round -> checkpoint async too
        seen_futs = [a.dump.remote() for a in self.seen]

        # ---- round stats: distributed per-block summaries; the driver
        # sees one row per block (O(blocks), never O(attempts))
        import pyarrow.dataset as pads

        def _round_summ(t: pa.Table) -> pa.Table:
            s = t.column("status").to_numpy(zero_copy_only=False)
            tsv = t.column("ts").to_numpy(zero_copy_only=False)
            m = s == STATUS_SAVED
            return pa.table({
                "n_rows": pa.array([t.num_rows], pa.int64()),
                "n_saved": pa.array([int(m.sum())], pa.int64()),
                "max_ts": pa.array(
                    [float(tsv[m].max()) if m.any() else float("-inf")],
                    pa.float64())})

        # NOTE: partitioning=None + columns= together trip an
        # UnboundLocalError in ray 2.49's parquet datasource; with an
        # explicit column list the inferred hive column is never
        # selected, so the default partitioning is safe here
        summ_att = (ray.data.read_parquet(att_dir,
                                          columns=["status", "ts"])
                    .map_batches(_round_summ, batch_size=None,
                                 batch_format="pyarrow").to_pandas())
        n_attempted = int(summ_att["n_rows"].sum())
        n_saved = int(summ_att["n_saved"].sum())
        T_next = max(T, float(summ_att["max_ts"].max())) if n_saved > 0 else T

        # ---- fetch + parse + sinks --------------------------------------
        n_candidates = 0
        fetch_route = "none"
        if n_saved > 0:
            import pyarrow.compute as pc

            meta_max = _meta_broadcast_max(cfg)
            if self.store.bucketed and n_saved * 200 <= meta_max:
                # bucketwise broadcast fetch: saved metadata is small ->
                # ship it to one task per bucket; each bucket read once
                fetch_route = "bucketwise"
                meta_tbl = pads.dataset(att_dir).to_table(
                    filter=(pc.field("status") == STATUS_SAVED))
                fetched = self.store.attach_html_bucketwise(ray, meta_tbl)
            else:
                fetch_route = "dataset"
                saved = ray.data.read_parquet(
                    att_dir, partitioning=None,
                    filter=(pc.field("status") == STATUS_SAVED),
                    override_num_blocks=_nblocks(
                        n_saved, rows_per_block=2 * cfg.parse_batch_size))
                fetched = self.store.attach_html(saved, cfg, n_rows=n_saved)
            # bucketwise: batch_size=None keeps one fused task per bucket
            # block (a row-batch size here would merge the 1-row bucket
            # blocks into one serial task before fetch_bucket runs)
            parse_bs = (None if fetch_route == "bucketwise"
                        else cfg.parse_batch_size)
            parsed = fetched.map_batches(
                ParseHtmlBatch(cfg.first_n_words, keep_html=cfg.store_html,
                               enrich=cfg.enrich,
                               decode=cfg.extra.get("decode_strategy")),
                batch_format="pyarrow", batch_size=parse_bs).materialize()
            _mark("fetch_parse")

            crawled_dir = os.path.join(rdir, "crawled")
            drop = ["links", "in_table", "is_html", "will_save"]
            crawled = parsed.map_batches(
                lambda t: t.drop_columns([c for c in drop
                                          if c in t.column_names]),
                batch_format="pyarrow")
            try:
                crawled.write_parquet(crawled_dir,
                                      min_rows_per_file=cfg.pages_per_file,
                                      **pq_args)
            except TypeError:  # older write_parquet API
                crawled.write_parquet(crawled_dir,
                                      num_rows_per_file=cfg.pages_per_file,
                                      **pq_args)
            _mark("crawled_write")

            if cfg.debug_log:
                # S6 debug record: URL/Title/Text(first-20)/Timestamp
                log_dir = os.path.join(rdir, "crawl_log")
                parsed.map_batches(
                    lambda t: pa.table({
                        "URL": t.column("url"), "Title": t.column("title"),
                        "Text": t.column("first_n"),
                        "Timestamp": t.column("ts")}),
                    batch_format="pyarrow").write_parquet(
                        log_dir, **pq_args)

            # ---- next frontier ------------------------------------------
            # dedup-by-min-seq over up to |frontier| * out-degree candidate
            # urls: a many-group aggregate -> bucketed vectorized combine
            from ..stages.aggregates import buckets_for, hash_bucket_aggregate

            cand = parsed.map_batches(explode_links, batch_format="pyarrow")
            # fan-out sized from the round's saved pages x a generous
            # out-degree bound (not a constant): at web out-degrees one
            # dedup task never holds more than ~one bucket of links
            cand = hash_bucket_aggregate(
                cand, ["url"],
                lambda df: df.groupby("url", as_index=False)["seq"].min(),
                num_buckets=buckets_for(32 * n_saved,
                                        lo=max(8, cfg.num_seen_shards)))

            def finish_candidates(batch: pa.Table) -> pa.Table:
                import ray as _ray

                from ..faults import maybe_inject_fault

                # kill BEFORE the seen.contains probe: the lost block
                # forces lineage recompute through the bucketed dedup
                # aggregate (the sidecar idempotence contract,
                # stages/aggregates.py) plus a re-probe of the shards
                maybe_inject_fault(fault_spec, "finish_candidates")
                names = batch.column_names
                seq_col = "min(seq)" if "min(seq)" in names else "seq"
                urls = batch.column("url").to_pylist()
                seqs = batch.column(seq_col).to_numpy(zero_copy_only=False)
                hosts, ress, keep = [], [], []
                for i, u in enumerate(urls):
                    h, r = split_host_resource(u)
                    hosts.append(h)
                    ress.append(r)
                    keep.append(bool(h))
                keep = np.array(keep, dtype=bool)
                t = pa.table({"url": pa.array(urls, pa.string()),
                              "host": pa.array(hosts, pa.string()),
                              "resource": pa.array(ress, pa.string()),
                              "seq": pa.array(seqs.astype(np.int64), pa.int64())})
                t = t.filter(pa.array(keep))
                if t.num_rows == 0:
                    return t
                urls2 = t.column("url").to_pylist()
                h64 = stable_hash64_batch(urls2)
                shard = h64 % S
                seen_mask = np.zeros(len(urls2), dtype=bool)
                futs, idxs = [], []
                for s in np.unique(shard):
                    m = shard == s
                    idxs.append(np.nonzero(m)[0])
                    futs.append(seen[int(s)].contains.remote(
                        h64[m], [urls2[i] for i in np.nonzero(m)[0]]))
                for ix, r in zip(idxs, _ray.get(futs)):
                    seen_mask[ix] = r
                return t.filter(pa.array(~seen_mask))

            nf_dir = os.path.join(rdir, "next_frontier")
            cand.map_batches(finish_candidates,
                             batch_format="pyarrow").write_parquet(
                                 nf_dir, **pq_args)
            try:
                n_candidates = pads.dataset(nf_dir).count_rows()
            except Exception:
                n_candidates = 0
            _mark("frontier_build")
        # ---- checkpoint --------------------------------------------------
        state_dir = os.path.join(rdir, "state")
        os.makedirs(state_dir, exist_ok=True)
        seen_blobs = ray.get(seen_futs)
        _mark("dump_seen_get")
        for i, blob in enumerate(seen_blobs):
            with open(os.path.join(state_dir, f"seen_{i}.bin"), "wb") as f:
                f.write(blob)
        _mark("dump_seen_write")
        for i, blob in enumerate(ray.get(pol_futs)):
            with open(os.path.join(state_dir, f"pol_{i}.bin"), "wb") as f:
                f.write(blob)
        _mark("dump_pol")

        budget_next = st["budget_left"] - n_saved
        stopped = budget_next <= 0
        new_state = {
            "round": rnd + 1, "T": T_next,
            "attempt_base": st["attempt_base"] + n_attempted,
            "budget_left": budget_next,
            "saved_total": st["saved_total"] + n_saved,
            "frontier_path": os.path.join(rdir, "next_frontier"),
            "n_frontier": n_candidates, "stopped": stopped,
        }
        _mark("checkpoint_state")
        metrics = dict(new_state)
        metrics.update({
            "this_round": rnd, "n_attempted": n_attempted, "n_saved": n_saved,
            "n_frontier_in": st["n_frontier"],
            "wall_sec": time.perf_counter() - t0,
            "stage_secs": stage_secs,
            "fetch_route": fetch_route,
            # lineage: the semantic-config signature pins what this
            # round COMPUTED; resume refuses a drifted config
            "config_sig": cfg.semantics_sig(),
        })
        with open(os.path.join(rdir, "metrics.json"), "w") as f:
            json.dump(metrics, f, indent=1)
        with open(os.path.join(rdir, "_SUCCESS"), "w") as f:
            f.write("ok")
        return new_state

    # ------------------------------------------------------------------
    def _load_latest_checkpoint(self) -> dict | None:
        rounds_dir = os.path.join(self.workdir, "rounds")
        if not os.path.isdir(rounds_dir):
            return None
        done = sorted(d for d in os.listdir(rounds_dir)
                      if os.path.exists(os.path.join(rounds_dir, d, "_SUCCESS")))
        if not done:
            return None
        last = os.path.join(rounds_dir, done[-1])
        with open(os.path.join(last, "metrics.json")) as f:
            m = json.load(f)
        stored_sig = m.get("config_sig")
        if stored_sig is not None and stored_sig != self.cfg.semantics_sig():
            raise ValueError(
                "resume refused: checkpoint was written under a "
                f"different semantic config (sig {stored_sig} != "
                f"{self.cfg.semantics_sig()}) — resuming would mix two "
                "crawl semantics in one output tree; use a fresh "
                "workdir (or restore the original CrawlConfig)")
        state_dir = os.path.join(last, "state")
        ray = self.ray
        futs = []
        for i, a in enumerate(self.seen):
            with open(os.path.join(state_dir, f"seen_{i}.bin"), "rb") as f:
                futs.append(a.load.remote(f.read()))
        for i, a in enumerate(self.pol):
            with open(os.path.join(state_dir, f"pol_{i}.bin"), "rb") as f:
                futs.append(a.load.remote(f.read()))
        ray.get(futs)
        return {k: m[k] for k in ("round", "T", "attempt_base", "budget_left",
                                  "saved_total", "frontier_path", "n_frontier",
                                  "stopped")}

    # ------------------------------------------------------------------
    def _round_subdirs(self, name: str) -> list[str]:
        import glob

        rounds_dir = os.path.join(self.workdir, "rounds")
        files = []
        if os.path.isdir(rounds_dir):
            for d in sorted(os.listdir(rounds_dir)):
                c = os.path.join(rounds_dir, d, name)
                if os.path.isdir(c) and os.path.exists(
                        os.path.join(rounds_dir, d, "_SUCCESS")):
                    files.extend(sorted(glob.glob(os.path.join(c, "*.parquet"))))
        return files

    def crawled_dataset(self):
        """Union of all rounds' crawled partitions, as one Dataset.
        ``partitioning=None``: the ``r=NNNNN`` round path component must
        NOT be inferred as a hive partition column (schema mismatch
        across rounds otherwise)."""
        dirs = self._round_subdirs("crawled")
        return (self.ray.data.read_parquet(dirs, partitioning=None)
                if dirs else None)

    def attempts_dataset(self):
        """Union of all rounds' attempt logs (the total crawl order)."""
        dirs = self._round_subdirs("attempts")
        return (self.ray.data.read_parquet(dirs, partitioning=None)
                if dirs else None)

    def host_counts(self):
        """S7 final stats (`WorkersPipeline.py:281-291` / `main.py:92`):
        host -> resources ATTEMPTED (the reference marks failures crawled
        too, `Worker.py:202`, `Host.py:135-142`)."""
        ds = self.attempts_dataset()
        if ds is None:
            return None
        return ds.groupby("host").count()
