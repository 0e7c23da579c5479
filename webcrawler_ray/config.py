"""Typed configuration for the crawl engine.

The reference's configuration surface is the CLI (-s/-n/-d) plus
hard-coded constants (`main.py:85`, `Worker.py:177`, `Host.py:96-97`,
`WarcFileSave.py:9`, `WebAccesser.py:43-63` — see SURVEY.md §2.8); here it
is a dataclass, and per-stage UDFs are the extension surface.
"""

from __future__ import annotations

from dataclasses import dataclass, field


@dataclass
class CrawlConfig:
    # --- semantics (reference-parity knobs) ------------------------------
    limit: int = 100                 # page budget; run saves limit+1 pages
    #                                  (reference ST6 quirk: counter > LIMIT,
    #                                  WorkersPipeline.py:271-272)
    plus_one_quirk: bool = True      # keep the LIMIT+1 off-by-one
    max_rounds: int = 1000           # safety bound on frontier rounds
    first_n_words: int = 20          # DebugPrinter first-N (WorkersPipeline.py:276)
    html_langs: tuple = ("en", "pt")  # lang values treated as text/html

    # --- scale knobs -----------------------------------------------------
    num_seen_shards: int | None = None
    #                                  URL-seen actor shards (ST1).
    #                                  None (default) -> sized from the
    #                                  cluster at service start
    #                                  (max(4, CPUs // 2)) so CrawlConfig()
    #                                  scales with the machine
    num_politeness_shards: int | None = None
    #                                  politeness/robots actor shards
    #                                  (ST2-ST4). None (default) -> sized
    #                                  from the cluster at service start
    #                                  (max(4, CPUs // 2)): each shard
    #                                  handles its whole round slice in
    #                                  ONE schedule RPC, so P is the
    #                                  politeness stage's parallelism and
    #                                  must widen with the cluster
    politeness_chunk_rows: int = 2_000_000
    #                                  skew split: a politeness shard whose
    #                                  round slice exceeds this many rows
    #                                  (a mega-host / hot shard) is streamed
    #                                  through its actor in seq-ordered
    #                                  chunks of this size instead of one
    #                                  giant RPC — bounds actor heap to
    #                                  O(chunk) at the 10^10-URL design
    #                                  point; output is bit-identical
    #                                  (ts is closed-form per host, state
    #                                  carries across chunks)
    parse_concurrency: int = 4       # parse actor pool size
    parse_batch_size: int = 128      # html rows per parse batch (wide binary!)
    url_batch_size: int = 8192       # rows per batch in URL-algebra stages
    pages_per_file: int = 1000       # WARC rotation parity (WarcFileSave.py:9)
    fetch_broadcast_max_bytes: int = 256 * 1024 * 1024
    #                                  pages tables up to this size are
    #                                  broadcast via ray.put; larger ones use
    #                                  the hash-bucketed PagesStore
    pages_store_buckets: int = 64    # buckets for the partitioned store
    flags_bucketed: bool | None = None
    #                                  answer HEAD flags from the bucketed
    #                                  store (url+lang projection, filtered
    #                                  reads) instead of a driver-built
    #                                  broadcast hash index. None (default)
    #                                  = size the decision by the flag
    #                                  index's own cost (~17 bytes/URL vs
    #                                  fetch_broadcast_max_bytes), so no
    #                                  configuration of a huge-frontier
    #                                  crawl ever materializes the URL key
    #                                  space on the driver, while webs
    #                                  whose INDEX is small keep the fast
    #                                  broadcast route even when the html
    #                                  store is bucketed.
    #                                  REQUIRED at the 10^10-URL design
    #                                  point: the broadcast index is
    #                                  ~9 bytes/URL (~90 GB); the bucketed
    #                                  path never holds more than one
    #                                  filtered bucket projection per task

    # --- seen-set sizing -------------------------------------------------
    seen_capacity_per_shard: int = 1 << 20  # cuckoo slots per shard
    seen_exact_confirm: bool = True  # keep exact per-shard set (correctness
    #                                  oracle; turn off at 10^10 scale and
    #                                  accept cuckoo FP rate)

    # --- output ----------------------------------------------------------
    store_html: bool = True          # keep html bytes in the crawled corpus
    debug_log: bool = True           # emit the crawl_log dataset (S6)
    enrich: bool = False             # crawl-time content enrichment
    #                                  (token count, simhash/minhash
    #                                  fingerprints) in the parse stage

    extra: dict = field(default_factory=dict)

    def semantics_sig(self) -> str:
        """Stable signature of the SEMANTIC knobs (the ones that change
        what a crawl computes, not how parallel it runs). A checkpoint
        resumed under a different signature would silently mix two
        crawl semantics in one output tree — the resume path compares
        signatures and fails loudly instead (test_resume)."""
        import hashlib
        import json

        fields = {
            "limit": self.limit,
            "plus_one_quirk": self.plus_one_quirk,
            "first_n_words": self.first_n_words,
            "html_langs": list(self.html_langs),
            "store_html": self.store_html,
            "enrich": self.enrich,
            "debug_log": self.debug_log,
            "decode_strategy": str(self.extra.get("decode_strategy")),
        }
        return hashlib.blake2b(
            json.dumps(fields, sort_keys=True).encode(),
            digest_size=8).hexdigest()
