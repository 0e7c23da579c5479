"""Simulated fetch (S3/S4): lookups into the Parquet pages table.

The sandbox "web" is the pages Parquet table (BASELINE.json input_hint);
HEAD (`WebAccesser.py:76-77`) becomes an existence + content-type flag
lookup, GET (`WebAccesser.py:73-88`) becomes an html-bytes lookup. Two
modes, chosen by table size (CrawlConfig.fetch_broadcast_max_bytes):

* **broadcast** — small webs (tests): flags as a broadcast sorted-uint64
  hash index (compact: 9 bytes/URL), html as a broadcast url->bytes dict;
  ``ray.put`` once, read once per actor/task via the object store.
* **bucketed** — large webs (bench and the 100 TB design point): a one-time
  preprocessing pass hash-partitions the pages table into
  ``store_dir/bucket=i/`` Parquet files by ``stable_hash64(url) % B``; a
  frontier round is partitioned by the same key and each bucket group does
  ONE filtered Parquet read (``url isin``, column-pruned) + Arrow hash
  join. Cost per round: O(frontier) + O(matching row groups), never a scan
  of the whole web. Failed lookups are 404-equivalents, recorded and never
  retried (reference disables retries, `WebAccesser.py:45`, report §5).

Flag lookups follow the store's own size heuristic by default
(``CrawlConfig.flags_bucketed=None``): small tables use the broadcast
hash index (compact: 9 bytes/URL, fine to ~10^8 URLs); tables above
``fetch_broadcast_max_bytes`` answer flags from the bucketed store
(url+lang projection, one filtered column-pruned read per touched bucket
per batch) — the required mode at the 10^10-URL design point, where the
index would be ~90 GB and its construction a driver-side materialization
of the whole key space. An explicit True/False overrides either way.
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.dataset as pads
import pyarrow.parquet as pq

from ..functions.urls import stable_hash64_batch
from ..config import CrawlConfig


_PROC_CACHE: dict = {}


def _cached_get(ref):
    """Fetch a broadcast object once per WORKER PROCESS (ray.put + first
    ray.get per process; later tasks in the same process reuse it). This is
    the broadcast-not-reshipped pattern: the payload crosses the object
    store once per node, not once per batch."""
    import ray

    key = ref.binary() if hasattr(ref, "binary") else id(ref)
    v = _PROC_CACHE.get(key)
    if v is None:
        v = ray.get(ref)
        _PROC_CACHE[key] = v
    return v


def _table_size_bytes(path: str) -> int:
    if os.path.isdir(path):
        total = 0
        for root, _dirs, files in os.walk(path):
            for f in files:
                total += os.path.getsize(os.path.join(root, f))
        return total
    return os.path.getsize(path)


def _bucket_dataset(store_dir: str, b: int):
    """Per-process-cached pyarrow dataset handle for one store bucket
    (amortizes the parquet footer parse); None if the bucket never
    received a row (possible for tiny webs / missing-URL lookups)."""
    key = ("pads", store_dir, int(b))
    d = _PROC_CACHE.get(key)
    if d is None:
        bdir = os.path.join(store_dir, f"bucket={int(b)}")
        if not os.path.isdir(bdir):
            return None
        d = pads.dataset(bdir)
        _PROC_CACHE[key] = d
    return d


def _table_files(path: str) -> list[str]:
    if os.path.isdir(path):
        return sorted(os.path.join(path, f) for f in os.listdir(path)
                      if f.endswith(".parquet"))
    return [path]


class PagesStore:
    def __init__(self, pages_path: str, cfg: CrawlConfig, store_dir: str):
        self.pages_path = pages_path  # a parquet file OR a directory of them
        self.cfg = cfg
        self.store_dir = store_dir
        self.bucketed = _table_size_bytes(pages_path) > cfg.fetch_broadcast_max_bytes
        # flags route: explicit config wins; None sizes the decision by
        # what the FLAG INDEX itself would cost (~17 bytes/URL: uint64
        # hash + bool + overhead), not by html bytes — a 2 GB-html web
        # of 100k pages has a 2 MB flag index (broadcast is right), a
        # 10^10-URL frontier has a ~170 GB one (bucketed is mandatory)
        if cfg.flags_bucketed is not None:
            self.flags_bucketed = cfg.flags_bucketed
        else:
            from ..io_utils import parquet_num_rows

            try:
                n_urls = parquet_num_rows(_table_files(pages_path))
            except Exception:
                n_urls = None
            self.flags_bucketed = (self.bucketed if n_urls is None
                                   else 17 * n_urls
                                   > cfg.fetch_broadcast_max_bytes)
        self._flags_ref = None
        self._html_ref = None
        self._store_B: int | None = None  # bucket count of the ON-DISK store

    # -- one-time preparation --------------------------------------------
    def prepare(self, ray) -> None:
        """Build broadcast refs and (if bucketed) the partitioned layout.
        With ``flags_bucketed`` the driver-built flag index is SKIPPED —
        no step of preparation (or of the crawl) materializes the full
        URL key space on the driver on that path."""
        if self.flags_bucketed or self.bucketed:
            self._build_buckets(ray)
        if not self.flags_bucketed:
            self._build_flags(ray)
        if not self.bucketed:
            tbl = pads.dataset(self.pages_path).to_table(
                columns=["url", "html", "warc_ts"])
            d = {}
            urls = tbl.column("url").to_pylist()
            htmls = tbl.column("html").to_pylist()
            ts = tbl.column("warc_ts").to_pylist()
            for u, h, t in zip(urls, htmls, ts):
                d[u] = (h, t)
            self._html_ref = ray.put(d)

    def _build_flags(self, ray) -> None:
        tbl = pads.dataset(self.pages_path).to_table(columns=["url", "lang"])
        urls = tbl.column("url").to_pylist()
        hashes = stable_hash64_batch(urls)
        is_html = np.array([l in self.cfg.html_langs
                            for l in tbl.column("lang").to_pylist()], dtype=bool)
        order = np.argsort(hashes)
        self._flags_ref = ray.put((hashes[order], is_html[order]))

    def _build_buckets(self, ray=None) -> None:
        """One-time hash-partitioned layout: bucket=i/ directories. Runs as
        parallel Ray tasks (one per input file) when a session is up —
        each task writes its own part files, so no cross-task writer state."""
        done = os.path.join(self.store_dir, "_STORE_DONE")
        if os.path.exists(done):
            self.store_buckets()  # resolve the recorded bucket count
            return
        os.makedirs(self.store_dir, exist_ok=True)
        B = self.cfg.pages_store_buckets
        store_dir = self.store_dir
        files = _table_files(self.pages_path)

        def partition_file(args) -> int:
            fidx, path = args
            pf = pq.ParquetFile(path)
            writers: dict[int, pq.ParquetWriter] = {}
            try:
                for rb in pf.iter_batches(batch_size=8192):
                    t = pa.Table.from_batches([rb])
                    bk = (stable_hash64_batch(t.column("url").to_pylist())
                          % B).astype(np.int64)
                    mask_col = pa.array(bk, pa.int64())
                    for b in np.unique(bk):
                        part = t.filter(pc.equal(mask_col, pa.scalar(int(b))))
                        w = writers.get(int(b))
                        if w is None:
                            bdir = os.path.join(store_dir, f"bucket={int(b)}")
                            os.makedirs(bdir, exist_ok=True)
                            w = pq.ParquetWriter(
                                os.path.join(bdir, f"part-{fidx}.parquet"),
                                part.schema)
                            writers[int(b)] = w
                        w.write_table(part)
            finally:
                for w in writers.values():
                    w.close()
            return fidx

        def compact_bucket(b: int) -> int:
            """Merge a bucket's per-task part files into one file with few
            row groups — lookups open ONE file instead of len(files)."""
            bdir = os.path.join(store_dir, f"bucket={b}")
            parts = sorted(os.listdir(bdir))
            if len(parts) <= 1:
                return b
            t = pads.dataset(bdir).to_table()
            tmp = os.path.join(bdir, "_compact.tmp")
            pq.write_table(t, tmp, row_group_size=16384)
            for p in parts:
                os.remove(os.path.join(bdir, p))
            os.rename(tmp, os.path.join(bdir, "part.parquet"))
            return b

        if ray is not None and ray.is_initialized() and len(files) > 1:
            task = ray.remote(partition_file)
            ray.get([task.remote((i, f)) for i, f in enumerate(files)])
            ctask = ray.remote(compact_bucket)
            ray.get([ctask.remote(b) for b in range(B)
                     if os.path.isdir(os.path.join(store_dir, f"bucket={b}"))])
        else:
            for i, f in enumerate(files):
                partition_file((i, f))
            for b in range(B):
                if os.path.isdir(os.path.join(store_dir, f"bucket={b}")):
                    compact_bucket(b)
        # record the bucket count the layout was built with: every lookup
        # MUST hash with this B, not the current config's — a config
        # changed between runs would otherwise read the wrong bucket=i
        # dirs and silently report every URL as not-in-table
        with open(done, "w") as f:
            f.write(str(B))
        self._store_B = B

    def store_buckets(self) -> int:
        """Bucket count of the on-disk layout (recorded in _STORE_DONE at
        build time). Falls back to the config value for legacy markers."""
        if self._store_B is None:
            B = self.cfg.pages_store_buckets
            done = os.path.join(self.store_dir, "_STORE_DONE")
            if os.path.exists(done):
                with open(done) as f:
                    content = f.read().strip()
                try:
                    B = int(content)
                except ValueError:
                    pass  # pre-recording marker ("ok"): assume config B
            self._store_B = B
        return self._store_B

    # -- flag lookup (HEAD-equivalent) ------------------------------------
    def add_flags_fn(self):
        """Plain map_batches fn adding in_table/is_html. Two modes:

        * broadcast (default): the driver-built sorted-hash index
          (per-process cached, zero-copy numpy searchsorted);
        * ``flags_bucketed``: no driver index exists — each batch hashes
          its URLs to store buckets and does one filtered (url, lang)
          column-pruned read per touched bucket. O(batch) + matching row
          groups, nothing driver-side, nothing O(corpus) anywhere."""
        if self.flags_bucketed:
            return self._add_flags_bucketed_fn()
        flags_ref = self._flags_ref

        def add_flags(batch: pa.Table) -> pa.Table:
            hashes, is_html = _cached_get(flags_ref)
            h = stable_hash64_batch(batch.column("url").to_pylist())
            idx = np.searchsorted(hashes, h)
            idx_c = np.clip(idx, 0, max(len(hashes) - 1, 0))
            found = ((len(hashes) > 0) & (hashes[idx_c] == h)) \
                if len(hashes) else np.zeros(len(h), dtype=bool)
            ih = np.zeros(len(h), dtype=bool)
            if len(hashes):
                ih[found] = is_html[idx_c[found]]
            out = batch.append_column("in_table", pa.array(found, pa.bool_()))
            return out.append_column("is_html", pa.array(ih, pa.bool_()))

        return add_flags

    def _add_flags_bucketed_fn(self):
        store_dir = self.store_dir
        B = self.store_buckets()
        html_langs = frozenset(self.cfg.html_langs)

        def add_flags(batch: pa.Table) -> pa.Table:
            n = batch.num_rows
            found = np.zeros(n, dtype=bool)
            ih = np.zeros(n, dtype=bool)
            if n:
                urls = batch.column("url").to_pylist()
                bk = stable_hash64_batch(urls) % B
                lut: dict[str, str] = {}
                for b in np.unique(bk):
                    d = _bucket_dataset(store_dir, int(b))
                    if d is None:  # bucket never received a page
                        continue
                    sub = batch.column("url").filter(pa.array(bk == b))
                    t = d.to_table(columns=["url", "lang"],
                                   filter=pc.field("url").isin(sub))
                    lut.update(zip(t.column("url").to_pylist(),
                                   t.column("lang").to_pylist()))
                for i, u in enumerate(urls):
                    lang = lut.get(u)
                    if lang is not None:
                        found[i] = True
                        ih[i] = lang in html_langs
            out = batch.append_column("in_table", pa.array(found, pa.bool_()))
            return out.append_column("is_html", pa.array(ih, pa.bool_()))

        return add_flags

    # -- html fetch (GET-equivalent) --------------------------------------
    def fetch_html_broadcast_fn(self):
        html_ref = self._html_ref

        def fetch_html(batch: pa.Table) -> pa.Table:
            pages = _cached_get(html_ref)
            urls = batch.column("url").to_pylist()
            htmls, tss = [], []
            for u in urls:
                h, t = pages[u]
                htmls.append(h)
                tss.append(t)
            out = batch.append_column("html", pa.array(htmls, pa.binary()))
            return out.append_column("warc_ts",
                                     pa.array(tss, pa.timestamp("us")))

        return fetch_html

    def fetch_html_bucket_fn(self):
        """Per-bucket group fn for groupby('fbucket').map_groups: one
        filtered parquet read + Arrow hash join per bucket per round."""
        store_dir = self.store_dir

        def fetch_group(group: pa.Table) -> pa.Table:
            if group.num_rows == 0:
                return group
            b = int(group.column("fbucket")[0].as_py())
            urls = group.column("url")
            dset = pads.dataset(os.path.join(store_dir, f"bucket={b}"))
            right = dset.to_table(columns=["url", "html", "warc_ts"],
                                  filter=pc.field("url").isin(urls))
            return group.join(right, keys="url", join_type="inner")

        return fetch_group

    def fetch_html_direct_fn(self):
        """Per-batch bucketed lookup WITHOUT a shuffle: each task groups its
        own rows by bucket and does one filtered read per touched bucket.
        Right for small/medium rounds (each bucket re-opened once per task);
        above ``direct_fetch_max_rows`` the groupby route reads each bucket
        exactly once per round instead."""
        store_dir = self.store_dir
        B = self.store_buckets()

        def fetch_direct(batch: pa.Table) -> pa.Table:
            if batch.num_rows == 0:
                return batch.append_column(
                    "html", pa.array([], pa.binary())).append_column(
                    "warc_ts", pa.array([], pa.timestamp("us")))
            urls = batch.column("url")
            bk = stable_hash64_batch(urls.to_pylist()) % B
            parts = []
            for b in np.unique(bk):
                m = bk == b
                parts.append(_bucket_dataset(store_dir, int(b)).to_table(
                    columns=["url", "html", "warc_ts"],
                    filter=pc.field("url").isin(urls.filter(pa.array(m)))))
            right = pa.concat_tables(parts)
            return batch.join(right, keys="url", join_type="inner")

        return fetch_direct

    def attach_html_bucketwise(self, ray, saved_meta: pa.Table):
        """Bucketwise broadcast fetch: the round's saved-row METADATA
        (no html — a few bytes/row) is broadcast once; one task per store
        bucket reads that bucket ONCE (url-isin filtered) and joins its
        slice of the metadata. No shuffle; round read volume = the touched
        buckets, each exactly once. This is the default bucketed path —
        above ``fetch_meta_broadcast_max_bytes`` (cluster-scale rounds) the
        groupby-exchange route takes over."""
        B = self.store_buckets()
        store_dir = self.store_dir
        bk = stable_hash64_batch(saved_meta.column("url").to_pylist()) % B
        meta_ref = ray.put((saved_meta, bk))
        touched = [int(b) for b in np.unique(bk)]

        def fetch_bucket(batch: pa.Table) -> pa.Table:
            meta, bks = _cached_get(meta_ref)
            out = []
            for b in batch.column("bucket").to_pylist():
                mine = meta.filter(pa.array(bks == b))
                if mine.num_rows == 0:
                    continue
                dset = pads.dataset(os.path.join(store_dir, f"bucket={b}"))
                right = dset.to_table(
                    columns=["url", "html", "warc_ts"],
                    filter=pc.field("url").isin(mine.column("url")))
                out.append(mine.join(right, keys="url", join_type="inner"))
            if not out:
                sch = meta.schema.append(pa.field("html", pa.binary()))
                sch = sch.append(pa.field("warc_ts", pa.timestamp("us")))
                return sch.empty_table()
            return pa.concat_tables(out, promote_options="default")

        return (ray.data.from_arrow(
                    pa.table({"bucket": pa.array(touched, pa.int64())}))
                .repartition(len(touched))
                .map_batches(fetch_bucket, batch_format="pyarrow",
                             batch_size=1))

    def attach_html(self, ds, cfg: CrawlConfig, n_rows: int | None = None):
        """Dataset-level html fetch for the saved rows of one round (used
        when the metadata-broadcast route doesn't apply)."""
        if not self.bucketed:
            return ds.map_batches(self.fetch_html_broadcast_fn(),
                                  batch_format="pyarrow",
                                  batch_size=cfg.parse_batch_size)
        direct_max = cfg.extra.get("direct_fetch_max_rows", 2000)
        if n_rows is not None and n_rows <= direct_max:
            return ds.map_batches(self.fetch_html_direct_fn(),
                                  batch_format="pyarrow", batch_size=4096)
        B = self.store_buckets()

        def add_bucket(batch: pa.Table) -> pa.Table:
            bk = (stable_hash64_batch(batch.column("url").to_pylist()) % B)
            return batch.append_column("fbucket",
                                       pa.array(bk.astype(np.int64), pa.int64()))

        ds = ds.map_batches(add_bucket, batch_format="pyarrow")
        ds = ds.groupby("fbucket").map_groups(self.fetch_html_bucket_fn(),
                                              batch_format="pyarrow")
        return ds.map_batches(lambda t: t.drop_columns(["fbucket"]),
                              batch_format="pyarrow")
