"""Query registry: one entry per implemented operator/pipeline
(SURVEY.md §2 coverage + the training-data operator families), consumed by
``__ray_entry__.py``. Each callable takes ``sf_dir`` and returns a Dataset
/ DataFrame / Arrow table; ``ORACLE_SQL`` holds the DuckDB-equivalent SQL
for every SQL-expressible entry (same column names — the driver's
value-hash compare requires it)."""

from __future__ import annotations

import os

from ..io_utils import corpus_cache_dir
from . import profile, relational, sketches, textpipe


def _ray():
    import ray

    return ray


# --- crawl-engine queries (no SQL oracle: stateful multi-round pipeline) ---
_CRAWL_SCALES = {  # sf_dir basename -> synthetic web spec + budget
    "sf0.001": dict(n_hosts=5, pages_per_host=20, seed=42, limit=60),
    "sf0.01": dict(n_hosts=20, pages_per_host=40, seed=7, limit=200),
    "sf0.1": dict(n_hosts=60, pages_per_host=120, seed=11, limit=2000),
    # scale rehearsal (tools/make_sf1.py tables): 10x the sf0.1 web +
    # budget, parallel generation — big enough that the auto-sized
    # fan-outs matter, small enough for one-command regeneration
    "sf1": dict(n_hosts=200, pages_per_host=360, seed=13, limit=20000,
                n_seeds=40, parallel=True),
}


def _crawl_workdir(sf_dir: str):
    """Run (or reuse a finished) crawl for this scale; returns the crawler.

    The synthetic web is derived deterministically from the sf scale (the
    pages-table input shape is fixed by BASELINE.json input_hint; testdata
    carries no pages table, so it is synthesized seeded — no external
    data)."""
    from ..config import CrawlConfig
    from ..pipelines.crawl import RayCrawler
    from ..webgen import WebSpec, generate_web

    name = os.path.basename(os.path.normpath(sf_dir))
    spec = dict(_CRAWL_SCALES.get(name, _CRAWL_SCALES["sf0.01"]))
    limit = spec.pop("limit")
    base = corpus_cache_dir(sf_dir)
    spec.setdefault("n_seeds", 5)
    web = generate_web(os.path.join(base, "web"), WebSpec(**spec))
    cfg = CrawlConfig(limit=limit)
    # crawl workdir is keyed by the webgen signature: a regenerated web
    # (webgen version bump) must never pair with a stale crawl checkpoint
    import hashlib

    sig8 = hashlib.blake2b(web["sig"].encode(), digest_size=4).hexdigest()
    crawler = RayCrawler(web["pages"], web["robots"],
                         os.path.join(base, f"crawl_wd_{sig8}"), cfg)
    summary_file = os.path.join(crawler.workdir, "summary.json")
    if not os.path.exists(summary_file):
        seeds = open(web["seeds"]).read().splitlines()
        crawler.crawl(seeds, resume=True)
        crawler.shutdown_services()
    _dump_attempts(crawler, os.path.join(base, "attempts_dump.parquet"))
    return crawler


def _dump_attempts(crawler, path: str) -> None:
    """One-file dump of the attempts log at a STABLE path so the DuckDB
    oracle SQL (a static string) can read the same rows the Ray queries
    read — this is what turns crawl_host_counts / url_algebra from
    rows-only checks into value-hashed ones. Atomic (tmp+rename),
    rewritten whenever the crawl workdir regenerates."""
    import pyarrow.dataset as pads
    import pyarrow.parquet as pq

    sig_file = path + ".sig"
    if os.path.exists(path) and os.path.exists(sig_file):
        with open(sig_file) as f:
            if f.read().strip() == crawler.workdir:
                return
    files = crawler._round_subdirs("attempts")
    cols = ["fetch_seq", "url", "host", "ts", "status", "round", "seq"]
    tmp = path + ".tmp"
    writer = None
    try:
        # STREAMED batch-at-a-time copy — the dump never materializes
        # the attempts log in driver memory
        for b in pads.dataset(files).to_batches(columns=cols):
            if writer is None:
                writer = pq.ParquetWriter(tmp, b.schema)
            if b.num_rows:
                writer.write_batch(b)
        if writer is None:
            # zero attempt rows (empty crawl): still write an empty file
            # with the expected schema so the oracle SQL can read it
            import pyarrow as pa

            schema = pa.schema([
                ("fetch_seq", pa.int64()), ("url", pa.string()),
                ("host", pa.string()), ("ts", pa.float64()),
                ("status", pa.int16()), ("round", pa.int32()),
                ("seq", pa.int64())])
            writer = pq.ParquetWriter(tmp, schema)
    finally:
        if writer is not None:
            writer.close()
    os.replace(tmp, path)
    with open(sig_file, "w") as f:
        f.write(crawler.workdir)


def crawl_flagship(sf_dir: str):
    """The flagship pipeline: full frontier crawl; returns the attempts log
    (total crawl order: url, host, ts, status, round, fetch_seq)."""
    c = _crawl_workdir(sf_dir)
    return (c.attempts_dataset()
             .map_batches(lambda t: t.select(
                 ["fetch_seq", "url", "host", "ts", "status", "round", "seq"]),
                 batch_format="pyarrow")
             .sort("fetch_seq"))


def crawl_corpus(sf_dir: str):
    """Saved-pages corpus with byte-identical extracted text
    (value-checked: identity SQL over the sig-keyed corpus dump —
    the docs_ipc_roundtrip precedent; the text bytes themselves are
    pinned by the crawl-oracle e2e)."""
    c = _crawl_workdir(sf_dir)
    _dump_crawl_corpus(c, sf_dir)   # oracle reads the dumped rows
    return (c.crawled_dataset()
             .map_batches(lambda t: t.select(
                 ["fetch_seq", "url", "host", "extracted_text", "title",
                  "first_n", "n_links"]), batch_format="pyarrow")
             .sort("fetch_seq"))


def crawl_host_counts(sf_dir: str):
    """S7 host->attempts stats (groupby-count over the attempts log)."""
    c = _crawl_workdir(sf_dir)
    import pyarrow as pa

    return (c.host_counts()
             .map_batches(lambda t: pa.table(
                 {"host": t.column("host"), "n_pages": t.column("count()")}),
                 batch_format="pyarrow")
             .sort("host"))


def url_algebra(sf_dir: str):
    """M1-M4/M8 URL algebra applied over the crawl's attempted URLs:
    (url, host2, resource2, passes_blocklist) — SQL-checked against an
    independent DuckDB reimplementation of the naive split + suffix
    blocklist over the attempts dump (the blake2b url hash is covered by
    unit tests; md5/blake are not portable to the SQL side)."""
    import pyarrow as pa

    from ..functions.urls import (
        passes_extension_blocklist_batch,
        split_host_resource,
    )

    c = _crawl_workdir(sf_dir)

    def f(batch: pa.Table) -> pa.Table:
        urls = batch.column("url").to_pylist()
        hosts, ress = [], []
        for u in urls:
            h, r = split_host_resource(u)
            hosts.append(h)
            ress.append(r)
        return pa.table({
            "url": pa.array(urls, pa.string()),
            "host2": pa.array(hosts, pa.string()),
            "resource2": pa.array(ress, pa.string()),
            "passes_blocklist": pa.array(
                passes_extension_blocklist_batch(urls), pa.bool_()),
        })

    return (c.attempts_dataset()
             .map_batches(lambda t: t.select(["url"]), batch_format="pyarrow")
             .map_batches(f, batch_format="pyarrow")
             .sort("url"))


def crawl_path_depths(sf_dir: str):
    """(depth, n_urls): PATH-DEPTH HISTOGRAM of every attempted URL —
    depth = path segments below the host (slash count minus the two of
    ``scheme://``), the URL-space shape diagnostic (how deep did the
    frontier descend?). Vectorized slash count per batch; the grouped
    count is a tiny mergeable aggregate; SQL side recomputes depth
    independently from string_split over the attempts dump."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.compute as pc
    from ray.data.aggregate import Sum

    c = _crawl_workdir(sf_dir)

    def f(batch: pa.Table):
        import pandas as pd

        n_slash = pc.count_substring(batch.column("url"), "/") \
                    .to_numpy(zero_copy_only=False)
        g = pd.DataFrame({"depth": n_slash.astype("int64") - 2,
                          "n_urls": np.ones(len(n_slash),
                                            dtype="int64")})
        return g.groupby("depth", as_index=False).sum()

    return (c.attempts_dataset()
             .map_batches(lambda t: t.select(["url"]),
                          batch_format="pyarrow")
             .map_batches(f, batch_format="pyarrow")
             .groupby("depth").aggregate(Sum("n_urls",
                                             alias_name="n_urls"))
             .sort("depth"))


def crawl_title_dups(sf_dir: str):
    """(title, n_pages): TITLES SHARED BY >1 CRAWLED PAGE, most-shared
    first — the duplicate-title diagnostic (soft-404s / templated pages
    surface here before any content hashing). One bucketed count over
    the corpus titles; oracle = GROUP BY HAVING over the corpus dump."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.compute as pc

    from ..stages.aggregates import hash_bucket_aggregate

    c = _crawl_workdir(sf_dir)
    _dump_crawl_corpus(c, sf_dir)

    def partial(df):
        g = df.groupby("title", as_index=False, dropna=True).size()
        return g.rename(columns={"size": "n_pages"})

    def merge(df):
        g = df.groupby("title", as_index=False)["n_pages"].sum()
        return g[g["n_pages"] > 1]

    from ..stages.aggregates import normalize_for_join

    src = c.crawled_dataset().map_batches(
        lambda t: t.select(["title"]), batch_format="pyarrow")
    out = hash_bucket_aggregate(src, ["title"], partial, merge=merge)
    # normalize: an all-filtered result otherwise ends as column-less
    # empty blocks and the driver sees a schema-less frame
    out = normalize_for_join(out, pa.schema(
        [("title", pa.string()), ("n_pages", pa.int64())])).materialize()
    if out.count() == 0:
        # a zero-group result yields a block-less dataset whose pandas
        # frame would be schema-less; return the typed empty directly
        return pa.table({"title": pa.array([], pa.string()),
                         "n_pages": pa.array([], pa.int64())})
    return out.sort(["n_pages", "title"], descending=[True, False])


def _archive_manifest_path(sf_dir: str, kind: str) -> str:
    return os.path.join(corpus_cache_dir(sf_dir), f"{kind}_manifest")


def _archive_file_summary(crawler, sf_dir: str, kind: str, per_rec,
                          file_col: str):
    """Shared value-checked per-file accounting for the byte-format
    archive sinks (the `knn_*_recall` dumped-artifact pattern applied
    to WARC/WET/WAT): ``per_rec`` is the per-record dataset derived by
    RE-READING the actual archive bytes — (file_col, url, d: sha256
    hexdigest of the record payload, nb: payload bytes). The
    (file, url) assignment is dumped for the oracle, which then
    recomputes every summary column FROM THE CORPUS DUMP independently
    (corpus LEFT JOIN manifest — a corpus url missing from every
    archive surfaces as a '<MISSING>' file row on the oracle side only,
    so coverage failures break the row count; duplicate records are
    covered by the ``*_read`` round-trip twins). content_digest =
    sha256 over the url-ordered concatenation of per-record digests,
    which DuckDB reproduces with sha256(string_agg(...)) — so the check
    proves the bytes on disk decode to exactly the per-url corpus
    payloads, file by file."""
    import hashlib as _hl

    import pandas as pd

    per_rec = per_rec.materialize()  # consumed twice: manifest + fold
    manifest = _archive_manifest_path(sf_dir, kind)
    _sig_keyed_dump(crawler.workdir + f"|{kind}manifestv1",
                    manifest + ".sig",
                    [(manifest, per_rec.map_batches(
                        lambda t: t.select([file_col, "url"]),
                        batch_format="pyarrow"))])

    def fold(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values("url")
        cd = _hl.sha256("".join(g["d"]).encode()).hexdigest()
        return pd.DataFrame({
            file_col: [g[file_col].iloc[0]],
            "n_records": pd.Series([len(g)], dtype="int64"),
            "n_payload_bytes": pd.Series([int(g["nb"].sum())],
                                         dtype="int64"),
            "content_digest": [cd]})

    # records/file is bounded by the rotation size (1000), so one
    # group = one O(1000)-row fold; file count scales out
    return (per_rec.groupby(file_col)
            .map_groups(fold, batch_format="pandas")
            .sort(file_col))


def crawl_warc(sf_dir: str):
    """S5 in the TRUE byte format: crawled corpus -> gzipped WARC
    response records, 1000/file (`WarcFileSave.py:20-54` parity).
    Returns the VALUE-CHECKED per-file summary (warc_file, n_records,
    n_payload_bytes, content_digest) recomputed from the actual
    archive bytes — the DuckDB oracle independently rebuilds every
    column from the corpus dump + the dumped (file, url) manifest
    (see ``_archive_file_summary``); byte-level format guarantees
    stay covered by the round-trip tests + ``crawl_warc_read``."""
    import hashlib as _hl

    import pyarrow as pa
    import pyarrow.compute as pc
    import ray

    from ..sinks.complete import ensure_complete_set
    from ..sinks.warc import write_warc
    from ..sources.warc import read_warc

    c = _crawl_workdir(sf_dir)
    out = os.path.join(c.workdir, "warc")

    def _write():
        ds = c.crawled_dataset().map_batches(
            lambda t: t.select(["url", "html", "warc_ts"]),
            batch_format="pyarrow")
        return write_warc(ds, out).materialize()

    # every writer of this dir goes through the set-completeness
    # protocol, so crawl_warc_read's marker check stays honest
    ensure_complete_set(out, ".warc.gz", _write)
    _dump_crawl_corpus(c, sf_dir)

    def digests(t: pa.Table) -> pa.Table:
        htmls = t.column("html").to_pylist()
        return pa.table({
            "warc_file": t.column("warc_file"),
            "url": t.column("url"),
            "d": pa.array([_hl.sha256(h or b"").hexdigest()
                           for h in htmls], pa.string()),
            "nb": pc.binary_length(t.column("html")).cast(pa.int64())})

    per_rec = read_warc(ray, out).map_batches(digests,
                                              batch_format="pyarrow")
    return _archive_file_summary(c, sf_dir, "warc", per_rec,
                                 "warc_file")


def crawl_warc_read(sf_dir: str):
    """WARC ROUND-TRIP: re-ingest the gzipped WARC archives the sink
    wrote (sources/warc.py — one read task per archive) and return
    (url, n_bytes) per record; rows-only (binary source) with the
    byte-identity covered by the round-trip test."""
    import pyarrow as pa
    import pyarrow.compute as pc
    import ray

    from ..sinks.warc import write_warc
    from ..sources.warc import read_warc

    from ..sinks.complete import ensure_complete_set

    c = _crawl_workdir(sf_dir)
    out = os.path.join(c.workdir, "warc")

    def _write():
        ds = c.crawled_dataset().map_batches(
            lambda t: t.select(["url", "html", "warc_ts"]),
            batch_format="pyarrow")
        return write_warc(ds, out).materialize()

    ensure_complete_set(out, ".warc.gz", _write)
    _dump_crawl_corpus(c, sf_dir)   # oracle: record lengths vs dump
    rb = read_warc(ray, out)
    return rb.map_batches(
        lambda t: pa.table({"url": t.column("url"),
                            "n_bytes": pc.binary_length(
                                t.column("html")).cast(pa.int64())}),
        batch_format="pyarrow").sort("url")


def crawl_wet(sf_dir: str):
    """Extracted-text corpus in the WET byte format (WARC ``conversion``
    records, ``.warc.wet.gz``, Common Crawl's text-interchange layout).
    Returns the VALUE-CHECKED per-file summary — the oracle rebuilds
    n_records / n_payload_bytes / content_digest from the corpus
    dump's text column + the dumped manifest (``_archive_file_summary``
    protocol; full-content equality stays with ``crawl_wet_read``)."""
    import hashlib as _hl

    import pyarrow as pa
    import ray

    from ..sinks.complete import ensure_complete_set
    from ..sinks.wet import write_wet
    from ..sources.wet import read_wet

    c = _crawl_workdir(sf_dir)
    out = os.path.join(c.workdir, "wet")

    def _write():
        ds = c.crawled_dataset().map_batches(
            lambda t: t.select(["url", "extracted_text", "warc_ts"]),
            batch_format="pyarrow")
        return write_wet(ds, out).materialize()

    ensure_complete_set(out, ".warc.wet.gz", _write)
    _dump_crawl_corpus(c, sf_dir)

    def digests(t: pa.Table) -> pa.Table:
        bodies = [(x or "").encode("utf-8")
                  for x in t.column("text").to_pylist()]
        return pa.table({
            "wet_file": t.column("wet_file"),
            "url": t.column("url"),
            "d": pa.array([_hl.sha256(b).hexdigest() for b in bodies],
                          pa.string()),
            "nb": pa.array([len(b) for b in bodies], pa.int64())})

    per_rec = read_wet(ray, out).map_batches(digests,
                                             batch_format="pyarrow")
    return _archive_file_summary(c, sf_dir, "wet", per_rec, "wet_file")


def crawl_wet_read(sf_dir: str):
    """WET ROUND-TRIP, full-content value check: re-ingest the
    ``.warc.wet.gz`` archives and return (url, text) — the oracle is
    the corpus dump's text column, so the EXACT extracted text must
    survive the byte format (record grammar, utf-8 body, gzip members)
    to hash-match."""
    import ray

    from ..sinks.complete import ensure_complete_set
    from ..sinks.wet import write_wet
    from ..sources.wet import read_wet

    c = _crawl_workdir(sf_dir)
    out = os.path.join(c.workdir, "wet")

    def _write():
        ds = c.crawled_dataset().map_batches(
            lambda t: t.select(["url", "extracted_text", "warc_ts"]),
            batch_format="pyarrow")
        return write_wet(ds, out).materialize()

    ensure_complete_set(out, ".warc.wet.gz", _write)
    _dump_crawl_corpus(c, sf_dir)   # oracle: (url, text) vs dump
    rb = read_wet(ray, out)
    return rb.map_batches(
        lambda t: t.select(["url", "text"]),
        batch_format="pyarrow").sort("url")


def crawl_cdx(sf_dir: str):
    """CDX capture index over the WARC archives (the real Common Crawl
    pipeline shape: the index is generated FROM the warc files):
    (surt_key, ts14, url, digest, n_html) per response record, sorted
    by SURT key then timestamp — value-checked: the DuckDB oracle
    recomputes the SURT transform, the 14-digit timestamp AND the
    sha256 payload digest independently from the corpus dump (the
    corpus is utf-8-clean, so bytes-digest == utf-8-string-digest;
    digest role of CC's base32 sha1, hash function swapped for SQL
    recomputability)."""
    import datetime as _dt
    import hashlib as _hl

    import pyarrow as pa
    import ray

    from ..functions.urls import surt_key
    from ..sinks.complete import ensure_complete_set
    from ..sinks.warc import write_warc
    from ..sources.warc import read_warc

    c = _crawl_workdir(sf_dir)
    out = os.path.join(c.workdir, "warc")

    def _write():
        ds = c.crawled_dataset().map_batches(
            lambda t: t.select(["url", "html", "warc_ts"]),
            batch_format="pyarrow")
        return write_warc(ds, out).materialize()

    ensure_complete_set(out, ".warc.gz", _write)
    _dump_crawl_corpus(c, sf_dir)

    def to_cdx(t: pa.Table) -> pa.Table:
        urls = t.column("url").to_pylist()
        htmls = t.column("html").to_pylist()
        tss = t.column("warc_ts").to_pylist()  # int64 us (read_warc)
        ts14 = [_dt.datetime.fromtimestamp(
                    x / 1e6, tz=_dt.timezone.utc).strftime("%Y%m%d%H%M%S")
                for x in tss]
        return pa.table({
            "surt_key": pa.array([surt_key(u) for u in urls],
                                 pa.string()),
            "ts14": pa.array(ts14, pa.string()),
            "url": pa.array(urls, pa.string()),
            "digest": pa.array([_hl.sha256(h).hexdigest()
                                for h in htmls], pa.string()),
            "n_html": pa.array([len(h) for h in htmls], pa.int64())})

    return (read_warc(ray, out)
            .map_batches(to_cdx, batch_format="pyarrow")
            .sort(["surt_key", "ts14", "url"]))


def crawl_robots_report(sf_dir: str):
    """Per-host politeness outcome report: (host, n_attempted,
    n_denied, n_blocklisted, n_missing, n_non_html, n_saved) — the
    crawl-ops dashboard row (how much of each host's frontier the
    robots/blocklist/content gates cut). Distributed: one status-coded
    groupby over the attempts log; SQL-checked against the attempts
    dump."""
    import pandas as pd
    import pyarrow as pa

    from ..state.politeness import (
        STATUS_BLOCKLISTED,
        STATUS_MISSING,
        STATUS_NON_HTML,
        STATUS_ROBOTS_DENIED,
        STATUS_SAVED,
    )

    # _crawl_workdir already refreshed the attempts dump the oracle reads
    c = _crawl_workdir(sf_dir)

    def partial(t: pa.Table) -> pd.DataFrame:
        import numpy as np

        df = pd.DataFrame({
            "host": t.column("host").to_pylist(),
            "status": t.column("status").to_numpy(
                zero_copy_only=False).astype(np.int64)})
        g = df.groupby("host")["status"]
        out = pd.DataFrame({
            "n_attempted": g.size(),
            "n_denied": g.apply(
                lambda s: int((s == STATUS_ROBOTS_DENIED).sum())),
            "n_blocklisted": g.apply(
                lambda s: int((s == STATUS_BLOCKLISTED).sum())),
            "n_missing": g.apply(
                lambda s: int((s == STATUS_MISSING).sum())),
            "n_non_html": g.apply(
                lambda s: int((s == STATUS_NON_HTML).sum())),
            "n_saved": g.apply(
                lambda s: int((s == STATUS_SAVED).sum())),
        }).reset_index()
        return out.astype({c2: "int64" for c2 in out.columns
                           if c2 != "host"})

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        s = g.drop(columns=["host"]).sum()
        out = pd.DataFrame([s]).astype("int64")
        out.insert(0, "host", g["host"].iloc[0])
        return out

    return (c.attempts_dataset()
             .map_batches(partial, batch_format="pyarrow")
             .groupby("host").map_groups(merge, batch_format="pandas")
             .sort("host"))


def crawl_wat(sf_dir: str):
    """Metadata archives in the WAT byte format (WARC ``metadata``
    records carrying per-page JSON: url/title/n_links/text_len —
    completing the WARC/WET/WAT companion-format triple). Returns the
    VALUE-CHECKED per-file summary: each record's JSON body is
    re-serialized from the parsed archive (CPython ``json.dumps``
    sort_keys/ensure_ascii=False layout) and digested; the oracle
    rebuilds the identical JSON bytes in SQL via the proven
    ``to_json`` byte-parity (crawl_debug_text precedent) from the
    corpus dump + the dumped manifest."""
    import hashlib as _hl
    import json as _json

    import pyarrow as pa
    import ray

    from ..sinks.complete import ensure_complete_set
    from ..sinks.wat import read_wat, write_wat

    c = _crawl_workdir(sf_dir)
    out = os.path.join(c.workdir, "wat")

    def _write():
        ds = c.crawled_dataset().map_batches(
            lambda t: t.select(["url", "title", "n_links",
                                "extracted_text", "warc_ts"]),
            batch_format="pyarrow")
        return write_wat(ds, out).materialize()

    ensure_complete_set(out, ".warc.wat.gz", _write)
    _dump_crawl_corpus(c, sf_dir)

    def digests(t: pa.Table) -> pa.Table:
        bodies = [
            _json.dumps({"n_links": int(nl), "text_len": int(tl),
                         "title": ti, "url": u},
                        ensure_ascii=False,
                        sort_keys=True).encode("utf-8")
            for u, ti, nl, tl in zip(t.column("url").to_pylist(),
                                     t.column("title").to_pylist(),
                                     t.column("n_links").to_pylist(),
                                     t.column("text_len").to_pylist())]
        return pa.table({
            "wat_file": t.column("wat_file"),
            "url": t.column("url"),
            "d": pa.array([_hl.sha256(b).hexdigest() for b in bodies],
                          pa.string()),
            "nb": pa.array([len(b) for b in bodies], pa.int64())})

    per_rec = read_wat(ray, out).map_batches(digests,
                                             batch_format="pyarrow")
    return _archive_file_summary(c, sf_dir, "wat", per_rec, "wat_file")


def crawl_wat_read(sf_dir: str):
    """WAT ROUND-TRIP value check: re-ingest the metadata archives and
    return (url, title, n_links, text_len) — the oracle recomputes all
    three from the corpus dump, so the JSON metadata must survive the
    byte format exactly."""
    import pyarrow as pa
    import ray

    from ..sinks.complete import ensure_complete_set
    from ..sinks.wat import read_wat, write_wat

    c = _crawl_workdir(sf_dir)
    out = os.path.join(c.workdir, "wat")

    def _write():
        ds = c.crawled_dataset().map_batches(
            lambda t: t.select(["url", "title", "n_links",
                                "extracted_text", "warc_ts"]),
            batch_format="pyarrow")
        return write_wat(ds, out).materialize()

    ensure_complete_set(out, ".warc.wat.gz", _write)
    _dump_crawl_corpus(c, sf_dir)
    rb = read_wat(ray, out)
    return rb.map_batches(
        lambda t: t.select(["url", "title", "n_links", "text_len"]),
        batch_format="pyarrow").sort("url")


def crawl_politeness_audit(sf_dir: str):
    """(n_hosts, n_gaps, n_violations): the politeness INVARIANT as a
    value-checked number — over every host's consecutive SAVED fetches
    (virtual-time order), count gaps smaller than the host's clamped
    crawl-delay (`Host.py:95-114` semantics). A correct scheduler
    yields n_violations = 0, and the oracle RECOMPUTES the whole audit
    (LAG window + the delay clamp CASE) from the attempts dump and the
    robots parquet — so the zero is proven, not asserted."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa

    from ..robots import RobotsTable
    from ..state.politeness import STATUS_SAVED

    c = _crawl_workdir(sf_dir)
    import ray

    robots_path = os.path.join(corpus_cache_dir(sf_dir), "web",
                               "robots.parquet")
    rt = RobotsTable.from_parquet(robots_path)
    delays = {h: r.delay_seconds() for h, r in rt.rules.items()}
    dref = ray.put(delays)

    att = c.attempts_dataset()

    # a host's saves can span blocks, so per-block partials would miss
    # boundary gaps: group by host first (input = saved rows only)
    def one_host(g: pd.DataFrame) -> pd.DataFrame:
        import ray as _ray

        d = _ray.get(dref)
        ts = np.sort(g["ts"].to_numpy())
        gaps = np.diff(ts)
        delay = d.get(g["host"].iloc[0], 0.1)
        return pd.DataFrame({
            "host": [g["host"].iloc[0]],
            "n_gaps": pd.Series([len(gaps)], dtype="int64"),
            "n_violations": pd.Series(
                [int((gaps < delay - 1e-9).sum())], dtype="int64")})

    saved = att.map_batches(
        lambda t: t.filter(pa.compute.equal(t.column("status"),
                                            STATUS_SAVED))
                   .select(["host", "ts"]),
        batch_format="pyarrow")
    per_host = saved.groupby("host").map_groups(one_host,
                                                batch_format="pandas")
    agg = per_host.to_pandas()  # O(hosts)
    return pd.DataFrame({
        "n_hosts": pd.Series([len(agg)], dtype="int64"),
        "n_gaps": pd.Series([int(agg["n_gaps"].sum())], dtype="int64"),
        "n_violations": pd.Series([int(agg["n_violations"].sum())],
                                  dtype="int64")})


def crawl_coverage_by_host(sf_dir: str):
    """(host, n_pages, n_crawled, coverage_bp): how much of each host's
    ACTUAL page inventory the crawl reached — the coverage-gap report a
    crawl operator reads before the next seed/budget decision.
    Distributed: one host-keyed count over the (url-only, column-pruned)
    pages table, one over the saved attempts, one small join; SQL-checked
    against the web pages parquet + attempts dump."""
    import pandas as pd
    import pyarrow as pa

    from ..functions.urls import split_host_resource
    from ..state.politeness import STATUS_SAVED

    c = _crawl_workdir(sf_dir)
    import ray

    web_pages = os.path.join(corpus_cache_dir(sf_dir), "web",
                             "pages.parquet")
    from ..io_utils import read_parquet_clean as _rpq2

    pages = _rpq2(ray, web_pages, columns=["url"])

    def page_hosts(t: pa.Table) -> pd.DataFrame:
        hosts = [split_host_resource(u)[0]
                 for u in t.column("url").to_pylist()]
        df = pd.DataFrame({"host": hosts})
        return df.groupby("host", as_index=False).size().rename(
            columns={"size": "n_pages"})

    def merge_counts(g: pd.DataFrame) -> pd.DataFrame:
        out = g.groupby("host", as_index=False)[
            ["n_pages", "n_crawled"]].sum()
        out["coverage_bp"] = (10_000 * out["n_crawled"]) // out["n_pages"]
        return out.astype({"n_pages": "int64", "n_crawled": "int64",
                           "coverage_bp": "int64"})

    pp = pages.map_batches(page_hosts, batch_format="pyarrow") \
              .map_batches(lambda df: df.assign(n_crawled=0),
                           batch_format="pandas")

    att = c.attempts_dataset()

    def saved_hosts(t: pa.Table) -> pd.DataFrame:
        import numpy as np

        st = t.column("status").to_numpy(zero_copy_only=False)
        hosts = pd.Series(t.column("host").to_pylist())[
            st == STATUS_SAVED]
        df = pd.DataFrame({"host": hosts})
        out = df.groupby("host", as_index=False).size().rename(
            columns={"size": "n_crawled"})
        return out.assign(n_pages=0)[["host", "n_pages", "n_crawled"]]

    aa = att.map_batches(saved_hosts, batch_format="pyarrow")
    return (pp.union(aa).groupby("host")
              .map_groups(merge_counts, batch_format="pandas")
              .sort("host"))


def crawl_sitemaps(sf_dir: str):
    """Publish per-host sitemaps.org urlset documents (+ the
    sitemapindex pointer file) from the crawl corpus — one distributed
    write task per host, O(hosts) driver rows for the index. Returns
    (host, n_urls) sorted by host (SQL-checked); file grammar and the
    full url/lastmod content are value-checked by
    ``crawl_sitemap_read``."""
    import pyarrow as pa

    from ..sinks.complete import write_complete_set
    from ..sinks.sitemap import write_sitemap_index, write_sitemaps

    c = _crawl_workdir(sf_dir)
    out = os.path.join(c.workdir, "sitemaps")

    def _write():
        ds = c.crawled_dataset().map_batches(
            lambda t: t.select(["url", "host", "warc_ts"]),
            batch_format="pyarrow")
        summ = write_sitemaps(ds, out).materialize()  # O(hosts)
        write_sitemap_index(
            summ.to_pandas()["sitemap_file"].tolist(), out)
        return summ

    summ = write_complete_set(out, ".xml", _write)
    return summ.map_batches(
        lambda t: t.select(["host", "n_urls"]),
        batch_format="pyarrow").sort("host")


def crawl_sitemap_read(sf_dir: str):
    """Sitemap ROUND-TRIP, full-content value check: re-ingest the
    urlset XML documents and return (url, lastmod_us) — the oracle is
    the corpus dump's capture timestamp, so every url and its W3C
    lastmod must survive the XML format exactly."""
    import ray

    from ..sinks.complete import ensure_complete_set, is_complete
    from ..sources.sitemap import read_sitemaps

    # ensure the sitemap set exists (same write as crawl_sitemaps)
    c = _crawl_workdir(sf_dir)
    out = os.path.join(c.workdir, "sitemaps")
    if not is_complete(out):
        crawl_sitemaps(sf_dir)
    _dump_crawl_corpus(c, sf_dir)   # oracle: (url, warc_ts_us) vs dump
    rb = read_sitemaps(ray, out)
    return rb.map_batches(
        lambda t: t.select(["url", "lastmod_us"]),
        batch_format="pyarrow").sort("url")


def crawl_log(sf_dir: str):
    """S6 debug-log dataset (URL/Title/Text/Timestamp per saved page,
    DebugPrinter.py:9-18 fields)."""
    import glob
    import os as _os

    c = _crawl_workdir(sf_dir)
    import ray

    _dump_crawl_corpus(c, sf_dir)   # the oracle joins the two dumps
    files = []
    rounds_dir = _os.path.join(c.workdir, "rounds")
    for d in sorted(_os.listdir(rounds_dir)):
        files.extend(sorted(glob.glob(
            _os.path.join(rounds_dir, d, "crawl_log", "*.parquet"))))
    # columns pinned: the r=NNNNN path component would otherwise be
    # inferred as a hive partition column
    return ray.data.read_parquet(
        files, columns=["URL", "Title", "Text", "Timestamp"]).sort("URL")


def crawl_debug_text(sf_dir: str):
    """S6 in the reference's EXACT stdout byte format: per saved page,
    the tab-indented, non-ascii-preserving JSON record the reference's
    debug printer emits (`DebugPrinter.py:9-18` —
    ``json.dumps({URL, Title, Text, Timestamp}, ensure_ascii=False,
    indent='\\t')``), byte-identical. The DuckDB oracle rebuilds every
    record with ``to_json`` (escaping and shortest-roundtrip double
    formatting match CPython's json exactly — probed property, relied
    on here), so the byte format itself is value-checked — closing the
    one accepted format deviation of the S6 sink."""
    import json as _json

    import pyarrow as pa

    log = crawl_log(sf_dir)

    def to_text(t: pa.Table) -> pa.Table:
        recs = [
            _json.dumps({"URL": u, "Title": ti, "Text": te,
                         "Timestamp": ts},
                        ensure_ascii=False, indent="\t")
            for u, ti, te, ts in zip(t.column("URL").to_pylist(),
                                     t.column("Title").to_pylist(),
                                     t.column("Text").to_pylist(),
                                     t.column("Timestamp").to_pylist())]
        return pa.table({"URL": t.column("URL"),
                         "debug_text": pa.array(recs, pa.string())})

    return log.map_batches(to_text, batch_format="pyarrow").sort("URL")


def crawl_log_jsonl(sf_dir: str):
    """S6 in the TRUE byte format: debug log -> gzipped JSONL files
    (sinks/jsonl.py), re-ingested through ray.data.read_json; returns
    (URL, Timestamp) per record — rows-only (byte sink) with field
    round-trip equality in tests."""
    import pyarrow as pa
    import ray

    from ..sinks.jsonl import read_jsonl, write_jsonl

    from ..sinks.complete import ensure_complete_set

    c = _crawl_workdir(sf_dir)
    out = os.path.join(c.workdir, "jsonl")
    ensure_complete_set(
        out, ".jsonl.gz",
        lambda: write_jsonl(crawl_log(sf_dir), out,
                            ["URL", "Title", "Text", "Timestamp"]
                            ).materialize())
    rb = read_jsonl(ray, out)
    return rb.map_batches(
        lambda t: t.select(["URL", "Timestamp"]),
        batch_format="pyarrow").sort("URL")


def _sig_keyed_dump(sig_key: str, sig_file: str, targets) -> None:
    """The ONE atomic oracle-dump protocol (attempts / link-graph /
    corpus dumps all route here): if ``sig_file`` records ``sig_key``
    AND every target directory still exists, the dump is current — skip
    (a stale sig with a deleted dump dir regenerates instead of letting
    the oracle read a missing path). Otherwise distributed-write each
    ``(path, dataset)`` in ``targets`` to ``path + ".tmp"`` and swap the
    whole directory in, then record the signature LAST (a crash between
    writes leaves an ignorable stale sig, never a half dump behind a
    fresh one)."""
    import shutil

    if os.path.exists(sig_file):
        with open(sig_file) as f:
            if (f.read().strip() == sig_key
                    and all(os.path.isdir(p) for p, _ in targets)):
                return
    for path, ds in targets:
        tmp = path + ".tmp"
        shutil.rmtree(tmp, ignore_errors=True)
        ds.write_parquet(tmp)
        shutil.rmtree(path, ignore_errors=True)
        os.replace(tmp, path)
    with open(sig_file, "w") as f:
        f.write(sig_key)


def _dump_link_graph(crawler, sf_dir: str):
    """Dump the crawled link graph — edges (src, dst, deg) and nodes
    (fetch_seq, url) — to STABLE per-scale paths so the graph oracles
    (PageRank's chained-CTE iterations, the components recursive CTE)
    can run DuckDB SQL over the exact edge set the Ray queries
    propagate over (same precedent as the attempts dump: the oracle
    value-checks the ITERATION math; the parse is checked by the
    crawl-oracle e2e). Returns the (edges_ds, n_nodes) tuple for the
    caller to reuse — the corpus is parsed ONCE per invocation.
    Distributed writes (no driver materialization), swapped in whole
    directories keyed by the crawl workdir signature."""
    from . import graph

    edges_dir, nodes_dir = _graph_dump_paths(sf_dir)
    edges = graph.crawl_link_edges(crawler.ray, crawler)
    _sig_keyed_dump(
        crawler.workdir, edges_dir + ".sig",
        [(edges_dir, edges[0]),
         (nodes_dir, crawler.crawled_dataset().map_batches(
             lambda t: t.select(["fetch_seq", "url"]),
             batch_format="pyarrow"))])
    return edges


def crawl_pagerank(sf_dir: str):
    """Top-20 pages by integer-mass PageRank over the crawled link
    graph (value-checked: 5-iteration chained-CTE DuckDB oracle over
    the dumped edge list, plus an exact-equality property test vs a
    single-process integer reference in
    test_crawl_queries.TestPageRank)."""
    c = _crawl_workdir(sf_dir)
    from . import graph

    return graph.crawl_pagerank(c.ray, c, edges=_dump_link_graph(c, sf_dir))


def crawl_salsa(sf_dir: str):
    """Top-20 pages by integer-mass SALSA authority score (with hub
    scores) over the crawled link graph (value-checked: chained-CTE
    DuckDB oracle over the dumped edge list, plus an exact-equality
    property test vs a single-process integer reference in
    test_crawl_queries.TestSalsa)."""
    c = _crawl_workdir(sf_dir)
    from . import graph

    return graph.crawl_salsa(c.ray, c, edges=_dump_link_graph(c, sf_dir))


def _corpus_dump_path(sf_dir: str) -> str:
    """Per-scale dump directory of the crawl corpus adapted to the
    curation input shape (doc_id=fetch_seq, source=host, text) — lets
    the crawl_curation oracle run the SAME SQL as corpus_curation over
    the exact rows the Ray pipeline curated."""
    return os.path.join(corpus_cache_dir(sf_dir), "corpus_dump")


def _adapted_corpus(crawler):
    import pyarrow as pa

    def adapt(t: pa.Table) -> pa.Table:
        # the curation columns PLUS the full crawl_corpus projection —
        # one dump serves the curation oracle (selects by name) and the
        # identity oracles of crawl_corpus / crawl_log / crawl_warc_read
        import pyarrow.compute as pc

        return pa.table({
            "doc_id": t.column("fetch_seq").cast(pa.int64()),
            "source": t.column("host").cast(pa.string()),
            "text": t.column("extracted_text").cast(pa.string()),
            "url": t.column("url").cast(pa.string()),
            "title": t.column("title").cast(pa.string()),
            "first_n": t.column("first_n").cast(pa.string()),
            "n_links": t.column("n_links").cast(pa.int64()),
            "n_html": pc.binary_length(t.column("html")).cast(
                pa.int64()),
            # v4 additions for the CDX oracle: capture time + the html
            # AS TEXT (the corpus is utf-8-clean by construction, so
            # sha256(html bytes) == sha256(utf-8 of this string) — what
            # lets DuckDB recompute the digest with its VARCHAR sha256)
            "warc_ts_us": t.column("warc_ts").cast(pa.int64()),
            "html_str": pc.cast(t.column("html"), pa.string())})

    return crawler.crawled_dataset().map_batches(
        adapt, batch_format="pyarrow")


def _dump_crawl_corpus(crawler, sf_dir: str):
    """Distributed write of the adapted crawl corpus to the stable
    oracle path (sig-keyed by the crawl workdir, same `_sig_keyed_dump`
    protocol as the attempts and link-graph dumps); returns the adapted
    dataset for reuse."""
    ds = _adapted_corpus(crawler)
    path = _corpus_dump_path(sf_dir)
    # "|corpusv4": schema-versioned sig — bump the suffix whenever the
    # dump's schema/kernel changes so older-versioned dumps regenerate
    # (v4: warc_ts_us + html_str for the CDX oracle)
    _sig_keyed_dump(crawler.workdir + "|corpusv4", path + ".sig",
                    [(path, ds)])
    return ds


def crawl_curation(sf_dir: str):
    """The composed crawl -> training-data story: the END-TO-END
    curation core (quality gates, exact keep-first dedup, per-source
    cap, sequence packing) applied to the LIVE crawl's byte-identical
    extracted text — (doc_id=fetch_seq, source=host). Value-checked:
    the corpus_curation oracle SQL runs over the dumped adapted corpus
    (text equality itself is pinned by the crawl-oracle e2e)."""
    import ray as _r

    from .textpipe import curation_over

    c = _crawl_workdir(sf_dir)
    n = c.crawled_dataset().count()
    ds = _dump_crawl_corpus(c, sf_dir)
    return curation_over(_r, ds, n).sort("doc_id")


def crawl_triangles(sf_dir: str):
    """Exact triangle count of the crawled link graph (value-checked:
    three-way self-join DuckDB oracle over the dumped canonical edge
    list, plus exact-equality tests vs a single-process adjacency-
    intersection reference and known closed-form graphs)."""
    c = _crawl_workdir(sf_dir)
    from . import graph

    return graph.crawl_triangles(c.ray, c,
                                 edges=_dump_link_graph(c, sf_dir))


def crawl_components(sf_dir: str):
    """Weakly-connected components of the crawled link graph, one row
    per crawled page, component = min fetch_seq of the component
    (value-checked: recursive-CTE min-label DuckDB oracle over the
    dumped edge list, plus an exact-equality test vs a single-process
    union-find reference over the same edge set)."""
    c = _crawl_workdir(sf_dir)
    from . import graph

    return graph.crawl_components(c.ray, c,
                                  edges=_dump_link_graph(c, sf_dir))


def crawl_depths(sf_dir: str):
    """(url, depth): minimum link distance of every crawled page from
    the round-0 seed pages; -1 = unreachable over surviving
    crawled-to-crawled edges (value-checked: bounded recursive-CTE BFS
    DuckDB oracle over the dumped edge list + attempts dump)."""
    c = _crawl_workdir(sf_dir)
    from . import graph

    return graph.crawl_depths(c.ray, c, edges=_dump_link_graph(c, sf_dir))


def crawl_pivot_scc(sf_dir: str):
    """(url): the strongly connected component of the pivot page
    (lexicographically smallest crawled url) — the FW∩BW step of
    divide-and-conquer distributed SCC (value-checked: two
    recursive-CTE closures intersected in DuckDB)."""
    c = _crawl_workdir(sf_dir)
    from . import graph

    return graph.crawl_pivot_scc(c.ray, c,
                                 edges=_dump_link_graph(c, sf_dir))


def crawl_scc(sf_dir: str):
    """(url, scc_id): FULL SCC decomposition of the crawled link graph
    (distributed trim + FW-BW pivots + budget-gated driver Tarjan;
    scc_id = minimum member url). Value-checked: recursive-CTE
    transitive closure + mutual-pair min-label DuckDB oracle."""
    c = _crawl_workdir(sf_dir)
    from . import graph

    return graph.crawl_scc(c.ray, c, edges=_dump_link_graph(c, sf_dir))


def crawl_host_scc(sf_dir: str):
    """(url=host, scc_id): SCC decomposition of the HOST-LEVEL graph —
    ``scc_decompose`` applied to the collapsed host edges (the
    link-spam / host-reputation unit of analysis; same generic core as
    crawl_scc, different graph — demonstrating the operator composes).
    Value-checked by the same closure oracle over host edges."""
    import pyarrow as pa

    from . import graph

    c = _crawl_workdir(sf_dir)
    hg = crawl_host_graph(sf_dir)  # (src_host, dst_host, n_links)
    edges = hg.map_batches(
        lambda t: pa.table({"src": t.column("src_host"),
                            "dst": t.column("dst_host")}),
        batch_format="pyarrow")
    nodes = edges.map_batches(
        lambda t: pa.table({"url": pa.concat_arrays(
            t.column("src").cast(pa.string()).chunks
            + t.column("dst").cast(pa.string()).chunks)}),
        batch_format="pyarrow")
    from ..stages.aggregates import distinct_keys

    nodes = distinct_keys(nodes, "url", n_rows=1024)
    return graph.scc_decompose(c.ray, nodes, edges)


def crawl_degree_hist(sf_dir: str):
    """(out_deg, n_pages): out-degree distribution of the crawled link
    graph including zero-outlink pages (value-checked: GROUP BY over
    the dumped edge list + node list)."""
    c = _crawl_workdir(sf_dir)
    from . import graph

    return graph.crawl_degree_hist(c.ray, c,
                                   edges=_dump_link_graph(c, sf_dir))


def _anchor_dump_path(sf_dir: str) -> str:
    return os.path.join(corpus_cache_dir(sf_dir), "anchor_pairs_dump")


def crawl_anchor_terms(sf_dir: str):
    """(url, token, n): top-5 incoming anchor-text terms per crawled
    page (value-checked: GROUP BY + ROW_NUMBER DuckDB oracle over the
    dumped (dst, token) anchor-pair table — same precedent as the edge
    dump: the oracle checks the AGGREGATION math, the parse/fixup is
    covered by the crawl-oracle e2e and the anchor unit tests)."""
    c = _crawl_workdir(sf_dir)
    from . import graph

    pairs = graph.crawl_anchor_pairs(c.ray, c)
    dump = _anchor_dump_path(sf_dir)
    # "|anchorv1": kernel-versioned sig (corpus-dump precedent) — bump
    # when anchor_texts/tokenize/fixup changes so stale pair dumps
    # cannot shadow a changed extraction kernel
    _sig_keyed_dump(c.workdir + "|anchorv1", dump + ".sig",
                    [(dump, pairs)])
    return graph.crawl_anchor_terms(c.ray, c, pairs=pairs)


FOCUS_TERMS = ("crawl", "frontier", "robot", "politeness")


def crawl_focused_frontier(sf_dir: str, k: int = 20):
    """Focused-crawl prioritization (Chakrabarti et al.'99 focused
    crawling — crawl order driven by topic relevance): rank crawled
    pages by how strongly their INCOMING anchor text describes them as
    on-topic — score = count of topic-term tokens across incoming
    anchors (the signal a focused frontier would sort by before
    fetching). Top-k with deterministic (score desc, url) ties;
    value-checked over the anchor-pair dump. Scale shape: anchor pairs
    stream through one token filter + one dst-keyed count; the html
    never leaves the parse stage."""
    import pyarrow as pa
    import pyarrow.compute as pc

    from . import graph

    c = _crawl_workdir(sf_dir)
    pairs = graph.crawl_anchor_pairs(c.ray, c)
    dump = _anchor_dump_path(sf_dir)
    _sig_keyed_dump(c.workdir + "|anchorv1", dump + ".sig",
                    [(dump, pairs)])
    terms = pa.array(list(FOCUS_TERMS), pa.string())

    def on_topic(t: pa.Table) -> pa.Table:
        return t.filter(pc.is_in(t.column("token"), value_set=terms))

    def rename(t: pa.Table) -> pa.Table:
        return pa.table({
            "url": t.column("dst"),
            "score": t.column("count()").cast(pa.int64())})

    return (pairs.map_batches(on_topic, batch_format="pyarrow")
                 .groupby("dst").count()
                 .map_batches(rename, batch_format="pyarrow")
                 .sort(["score", "url"], descending=[True, False])
                 .limit(k))


def crawl_hits(sf_dir: str):
    """Top-20 (url, authority, hub) by unnormalized integer HITS
    (value-checked: chained-CTE DuckDB oracle over the dumped edge
    list)."""
    c = _crawl_workdir(sf_dir)
    from . import graph

    return graph.crawl_hits(c.ray, c, edges=_dump_link_graph(c, sf_dir))


def crawl_indegree_hist(sf_dir: str):
    """(in_deg, n_pages): in-degree distribution incl. zero-indegree
    pages (value-checked: GROUP BY over the dumped edge + node lists)."""
    c = _crawl_workdir(sf_dir)
    from . import graph

    return graph.crawl_indegree_hist(c.ray, c,
                                     edges=_dump_link_graph(c, sf_dir))


def crawl_edge_locality(sf_dir: str):
    """Single row (n_intra, n_inter, intra_bp): same-host share of the
    page link graph (value-checked: host-split GROUP BY over the dumped
    edge list)."""
    c = _crawl_workdir(sf_dir)
    from . import graph

    return graph.crawl_edge_locality(c.ray, c,
                                     edges=_dump_link_graph(c, sf_dir))


def crawl_host_graph(sf_dir: str):
    """(src_host, dst_host, n_links): host-level collapse of the page
    link graph (value-checked: GROUP BY over the dumped edge list with
    the url_algebra host-split expression)."""
    c = _crawl_workdir(sf_dir)
    from . import graph

    return graph.crawl_host_graph(c.ray, c,
                                  edges=_dump_link_graph(c, sf_dir))


def crawl_kcore(sf_dir: str):
    """(url, core_deg): bounded 3-core peel of the crawled link graph
    (value-checked: 12-round unrolled peel chain in DuckDB over the
    dumped canonical edge list)."""
    c = _crawl_workdir(sf_dir)
    from . import graph

    return graph.crawl_kcore(c.ray, c, edges=_dump_link_graph(c, sf_dir))


def crawl_ppr(sf_dir: str):
    """Top-20 pages by seed-personalized PageRank (value-checked:
    chained-CTE DuckDB oracle over the dumped edge list + the attempts
    dump's round-0 seed set)."""
    c = _crawl_workdir(sf_dir)
    from . import graph

    return graph.crawl_ppr(c.ray, c, edges=_dump_link_graph(c, sf_dir))


def crawl_reciprocity(sf_dir: str):
    """Single row (n_edges, n_recip, reciprocity_bp): directed-edge
    reciprocity of the crawled link graph (value-checked: self-join
    DuckDB oracle over the dumped edge list)."""
    c = _crawl_workdir(sf_dir)
    from . import graph

    return graph.crawl_reciprocity(c.ray, c,
                                   edges=_dump_link_graph(c, sf_dir))


def crawl_clustering_coeff(sf_dir: str):
    """Single row (n_triangles, n_wedges, gcc_bp): global clustering
    coefficient (transitivity) of the crawled link graph in integer
    basis points (value-checked: triangle three-way self-join +
    degree-wedge sum DuckDB oracle over the dumped canonical edges)."""
    c = _crawl_workdir(sf_dir)
    from . import graph

    return graph.crawl_clustering_coeff(c.ray, c,
                                        edges=_dump_link_graph(c, sf_dir))


# --- registry --------------------------------------------------------------
def build_queries() -> dict:
    ray = _ray()
    q = {
        # crawl engine (rows-only checks: stateful multi-round pipelines)
        "crawl_flagship": crawl_flagship,
        "crawl_corpus": crawl_corpus,
        "crawl_host_counts": crawl_host_counts,
        "crawl_host_gap_stats": crawl_host_gap_stats,
        "crawl_warc": crawl_warc,
        "crawl_warc_read": crawl_warc_read,
        "crawl_wet": crawl_wet,
        "crawl_wet_read": crawl_wet_read,
        "crawl_wat": crawl_wat,
        "crawl_wat_read": crawl_wat_read,
        "crawl_cdx": crawl_cdx,
        "crawl_sitemaps": crawl_sitemaps,
        "crawl_sitemap_read": crawl_sitemap_read,
        "crawl_robots_report": crawl_robots_report,
        "crawl_coverage_by_host": crawl_coverage_by_host,
        "crawl_politeness_audit": crawl_politeness_audit,
        "crawl_round_stats": crawl_round_stats,
        "crawl_pagerank": crawl_pagerank,
        "crawl_salsa": crawl_salsa,
        "crawl_triangles": crawl_triangles,
        "crawl_components": crawl_components,
        "crawl_depths": crawl_depths,
        "crawl_pivot_scc": crawl_pivot_scc,
        "crawl_scc": crawl_scc,
        "crawl_host_scc": crawl_host_scc,
        "crawl_degree_hist": crawl_degree_hist,
        "crawl_ppr": crawl_ppr,
        "crawl_kcore": crawl_kcore,
        "crawl_anchor_terms": crawl_anchor_terms,
        "crawl_focused_frontier": crawl_focused_frontier,
        "crawl_host_graph": crawl_host_graph,
        "crawl_path_depths": crawl_path_depths,
        "crawl_hits": crawl_hits,
        "crawl_title_dups": crawl_title_dups,
        "crawl_indegree_hist": crawl_indegree_hist,
        "crawl_edge_locality": crawl_edge_locality,
        "crawl_reciprocity": crawl_reciprocity,
        "crawl_clustering_coeff": crawl_clustering_coeff,
        "crawl_curation": crawl_curation,
        # text analysis over documents
        "doc_token_counts": lambda sf: textpipe.token_counts(ray, sf),
        "doc_first20": lambda sf: textpipe.first_n_words(ray, sf),
        "doc_lang_counts": lambda sf: textpipe.lang_counts(ray, sf),
        "doc_quality": lambda sf: textpipe.quality_counts(ray, sf),
        "doc_fingerprint": lambda sf: textpipe.md5_fingerprints(ray, sf),
        "doc_langid": lambda sf: textpipe.langid(ray, sf),
        "doc_winnow": lambda sf: textpipe.winnow_fingerprints(ray, sf),
        "docs_sample": lambda sf: textpipe.docs_sample(ray, sf),
        "docs_sample_bottomk":
            lambda sf: textpipe.docs_sample_bottomk(ray, sf),
        "docs_weighted_sample":
            lambda sf: textpipe.docs_weighted_sample(ray, sf),
        "docs_per_source_cap":
            lambda sf: textpipe.docs_per_source_cap(ray, sf),
        "doc_normalize": lambda sf: textpipe.doc_normalize(ray, sf),
        "doc_top_terms": lambda sf: textpipe.doc_top_terms(ray, sf),
        "docs_skipgram_counts":
            lambda sf: textpipe.docs_skipgram_counts(ray, sf),
        "doc_token_counts_bpe": lambda sf: textpipe.token_counts_bpe(ray, sf),
        "docs_quality_filter": lambda sf: textpipe.quality_filter(ray, sf),
        "docs_dup_ngrams": lambda sf: textpipe.docs_dup_ngrams(ray, sf),
        "docs_ngram_novelty":
            lambda sf: textpipe.docs_ngram_novelty(ray, sf),
        "docs_readability":
            lambda sf: textpipe.docs_readability(ray, sf),
        "docs_gopher_filter":
            lambda sf: textpipe.docs_gopher_filter(ray, sf),
        "docs_freq_spectrum":
            lambda sf: textpipe.docs_freq_spectrum(ray, sf),
        "docs_dup_spans": lambda sf: textpipe.docs_dup_spans(ray, sf),
        # rows-only: iterative trainer (no SQL equivalent) — covered by
        # the exact-equality test vs the single-process reference
        "docs_bpe_merges": lambda sf: textpipe.docs_bpe_merges(ray, sf),
        "docs_bpe_encode": lambda sf: textpipe.docs_bpe_encode(ray, sf),
        "docs_chunks": lambda sf: textpipe.docs_chunks(ray, sf),
        "docs_orc_roundtrip":
            lambda sf: textpipe.docs_orc_roundtrip(ray, sf),
        "docs_tfrecord_roundtrip":
            lambda sf: textpipe.docs_tfrecord_roundtrip(ray, sf),
        "docs_avro_roundtrip":
            lambda sf: textpipe.docs_avro_roundtrip(ray, sf),
        "docs_ipc_roundtrip":
            lambda sf: textpipe.docs_ipc_roundtrip(ray, sf),
        "docs_schema_evolution":
            lambda sf: textpipe.docs_schema_evolution(ray, sf),
        "docs_kfold":
            lambda sf: textpipe.docs_kfold(ray, sf),
        "docs_boolean_search":
            lambda sf: textpipe.docs_boolean_search(ray, sf),
        "catalog_tables":
            lambda sf: textpipe.catalog_tables(ray, sf),
        "docs_rendezvous_shards":
            lambda sf: textpipe.docs_rendezvous_shards(ray, sf),
        "sources_token_jaccard":
            lambda sf: textpipe.sources_token_jaccard(ray, sf),
        "sources_ttr": lambda sf: textpipe.sources_ttr(ray, sf),
        "docs_contamination":
            lambda sf: textpipe.docs_contamination(ray, sf),
        "docs_range_partition":
            lambda sf: textpipe.docs_range_partition(ray, sf),
        "docs_length_histogram":
            lambda sf: textpipe.docs_length_histogram(ray, sf),
        "doc_tfidf_top": lambda sf: textpipe.doc_tfidf_top(ray, sf),
        "docs_bm25_topk": lambda sf: textpipe.docs_bm25_topk(ray, sf),
        "docs_rrf_fusion": lambda sf: textpipe.docs_rrf_fusion(ray, sf),
        "docs_vocab_encode":
            lambda sf: textpipe.docs_vocab_encode(ray, sf),
        "docs_bigram_lm_score":
            lambda sf: textpipe.docs_bigram_lm_score(ray, sf),
        "docs_pii_scrub": lambda sf: textpipe.docs_pii_scrub(ray, sf),
        "docs_repetition": lambda sf: textpipe.docs_repetition(ray, sf),
        "docs_inverted_index":
            lambda sf: textpipe.docs_inverted_index(ray, sf),
        "docs_greedy_cover":
            lambda sf: textpipe.docs_greedy_cover(ray, sf),
        "docs_boilerplate":
            lambda sf: textpipe.docs_boilerplate(ray, sf),
        "events_user_diversity":
            lambda sf: relational.events_user_diversity(ray, sf),
        "docs_lm_score": lambda sf: textpipe.docs_lm_score(ray, sf),
        "docs_dsir_weights":
            lambda sf: textpipe.docs_dsir_weights(ray, sf),
        "docs_dsir_resample":
            lambda sf: textpipe.docs_dsir_resample(ray, sf),
        "docs_winnow_pairs":
            lambda sf: textpipe.docs_winnow_pairs(ray, sf),
        "docs_mix_rebalance":
            lambda sf: textpipe.docs_mix_rebalance(ray, sf),
        "docs_shuffle_seeded":
            lambda sf: textpipe.docs_shuffle_seeded(ray, sf),
        "docs_pack_sequences":
            lambda sf: textpipe.docs_pack_sequences(ray, sf),
        "doc_compression_ratio":
            lambda sf: textpipe.doc_compression_ratio(ray, sf),
        "docs_langid_mix": lambda sf: textpipe.docs_langid_mix(ray, sf),
        "corpus_curation": lambda sf: textpipe.corpus_curation(ray, sf),
        "order_line_stats":
            lambda sf: relational.order_line_stats(ray, sf),
        "events_value_ntile":
            lambda sf: relational.events_value_ntile(ray, sf),
        # relational / windowed / as-of
        "q1_pricing_summary": lambda sf: relational.q1_pricing_summary(ray, sf),
        "top_customers": lambda sf: relational.top_customers(ray, sf),
        "revenue_by_nation": lambda sf: relational.revenue_by_nation(ray, sf),
        "events_topk_users": lambda sf: relational.events_topk_users(ray, sf),
        "docs_topk_longest": lambda sf: relational.docs_topk_longest(ray, sf),
        "url_algebra": url_algebra,
        "crawl_log": crawl_log,
        "crawl_log_jsonl": crawl_log_jsonl,
        "crawl_debug_text": crawl_debug_text,
        "events_by_type": lambda sf: relational.events_by_type(ray, sf),
        "events_windowed": lambda sf: relational.events_windowed(ray, sf),
        "events_windowed_late":
            lambda sf: relational.events_windowed_late(ray, sf),
        "events_grouping_sets":
            lambda sf: relational.events_grouping_sets(ray, sf),
        "events_value_winsorized":
            lambda sf: relational.events_value_winsorized(ray, sf),
        "events_hopping": lambda sf: relational.events_hopping(ray, sf),
        "events_windowed_incremental":
            lambda sf: relational.events_windowed_incremental(ray, sf),
        "events_user_topk": lambda sf: relational.events_user_topk(ray, sf),
        "events_value_percentiles":
            lambda sf: relational.events_value_percentiles(ray, sf),
        "customers_no_events":
            lambda sf: relational.customers_no_events(ray, sf),
        "events_semijoin_bloom":
            lambda sf: relational.events_semijoin_bloom(ray, sf),
        "orders_reorder_window":
            lambda sf: relational.orders_reorder_window(ray, sf),
        "events_sessionize": lambda sf: relational.sessionize(ray, sf),
        "events_user_value_delta":
            lambda sf: relational.events_user_value_delta(ray, sf),
        "events_type_transitions":
            lambda sf: relational.events_type_transitions(ray, sf),
        "events_moving_sum":
            lambda sf: relational.events_moving_sum(ray, sf),
        "events_ewm_sum":
            lambda sf: relational.events_ewm_sum(ray, sf),
        "events_max_concurrency":
            lambda sf: relational.events_max_concurrency(ray, sf),
        "events_changepoint":
            lambda sf: relational.events_changepoint(ray, sf),
        "events_trailing_sum":
            lambda sf: relational.events_trailing_sum(ray, sf),
        "events_bounce_rate":
            lambda sf: relational.events_bounce_rate(ray, sf),
        "events_gap_histogram":
            lambda sf: relational.events_gap_histogram(ray, sf),
        "events_active_time":
            lambda sf: relational.events_active_time(ray, sf),
        "docs_hapax_ratio":
            lambda sf: textpipe.docs_hapax_ratio(ray, sf),
        "docs_vocab_coverage":
            lambda sf: textpipe.docs_vocab_coverage(ray, sf),
        "orders_backlog_series":
            lambda sf: relational.orders_backlog_series(ray, sf),
        "events_attribution_window":
            lambda sf: relational.events_attribution_window(ray, sf),
        "events_profile": lambda sf: profile.events_profile(ray, sf),
        "docs_split": lambda sf: textpipe.docs_split(ray, sf),
        "docs_csv_roundtrip":
            lambda sf: textpipe.docs_csv_roundtrip(ray, sf),
        "docs_feature_hash":
            lambda sf: textpipe.docs_feature_hash(ray, sf),
        "docs_logreg_score":
            lambda sf: textpipe.docs_logreg_score(ray, sf),
        "revenue_cube": lambda sf: relational.revenue_cube(ray, sf),
        "events_dedup_daily":
            lambda sf: relational.events_dedup_daily(ray, sf),
        "events_zorder": lambda sf: relational.events_zorder(ray, sf),
        "events_props_extract":
            lambda sf: relational.events_props_extract(ray, sf),
        "events_range_sum":
            lambda sf: relational.events_range_sum(ray, sf),
        "users_orders_full":
            lambda sf: relational.users_orders_full(ray, sf),
        "events_type_iqr_outliers":
            lambda sf: relational.events_type_iqr_outliers(ray, sf),
        "events_value_props_corr":
            lambda sf: relational.events_value_props_corr(ray, sf),
        "lineitem_q6": lambda sf: relational.lineitem_q6(ray, sf),
        "q14_promo_revenue":
            lambda sf: relational.q14_promo_revenue(ray, sf),
        "events_dow_hour_heatmap":
            lambda sf: relational.events_dow_hour_heatmap(ray, sf),
        "q3_shipping_priority":
            lambda sf: relational.q3_shipping_priority(ray, sf),
        "orders_priority_exists":
            lambda sf: relational.orders_priority_exists(ray, sf),
        "events_type_stats":
            lambda sf: relational.events_type_stats(ray, sf),
        "events_type_pairs":
            lambda sf: relational.events_type_pairs(ray, sf),
        "events_funnel": lambda sf: relational.events_funnel(ray, sf),
        "events_latest": lambda sf: relational.events_latest(ray, sf),
        "orders_scd2": lambda sf: relational.orders_scd2(ray, sf),
        "events_cdc_merge":
            lambda sf: relational.events_cdc_merge(ray, sf),
        "events_windowed_distinct":
            lambda sf: relational.events_windowed_distinct(ray, sf),
        "customer_order_counts":
            lambda sf: relational.customer_order_counts(ray, sf),
        "orders_monthly_series":
            lambda sf: relational.orders_monthly_series(ray, sf),
        "q5_local_supplier_volume":
            lambda sf: relational.q5_local_supplier_volume(ray, sf),
        "q10_returned_revenue":
            lambda sf: relational.q10_returned_revenue(ray, sf),
        "q12_priority_lines":
            lambda sf: relational.q12_priority_lines(ray, sf),
        "q14_promo_revenue":
            lambda sf: relational.q14_promo_revenue(ray, sf),
        "q18_large_orders":
            lambda sf: relational.q18_large_orders(ray, sf),
        "q19_disjunct_revenue":
            lambda sf: relational.q19_disjunct_revenue(ray, sf),
        "fk_integrity": lambda sf: relational.fk_integrity(ray, sf),
        "events_percent_rank":
            lambda sf: relational.events_percent_rank(ray, sf),
        "events_moving_median":
            lambda sf: relational.events_moving_median(ray, sf),
        "customers_pareto_cut":
            lambda sf: relational.customers_pareto_cut(ray, sf),
        "orders_order_streaks":
            lambda sf: relational.orders_order_streaks(ray, sf),
        "orders_median_gap":
            lambda sf: relational.orders_median_gap(ray, sf),
        "events_value_ranks":
            lambda sf: relational.events_value_ranks(ray, sf),
        "lineitem_qty_mode":
            lambda sf: relational.lineitem_qty_mode(ray, sf),
        "q9_product_profit":
            lambda sf: relational.q9_product_profit(ray, sf),
        "q22_sales_opportunity":
            lambda sf: relational.q22_sales_opportunity(ray, sf),
        "q7_volume_shipping":
            lambda sf: relational.q7_volume_shipping(ray, sf),
        "q8_market_share":
            lambda sf: relational.q8_market_share(ray, sf),
        "q11_important_parts":
            lambda sf: relational.q11_important_parts(ray, sf),
        "q15_top_supplier":
            lambda sf: relational.q15_top_supplier(ray, sf),
        "q16_supplier_part_counts":
            lambda sf: relational.q16_supplier_part_counts(ray, sf),
        "q17_small_qty_revenue":
            lambda sf: relational.q17_small_qty_revenue(ray, sf),
        "q21_waiting_suppliers":
            lambda sf: relational.q21_waiting_suppliers(ray, sf),
        "q2_min_cost_supplier":
            lambda sf: relational.q2_min_cost_supplier(ray, sf),
        "q13_customer_distribution":
            lambda sf: relational.q13_customer_distribution(ray, sf),
        "q20_excess_suppliers":
            lambda sf: relational.q20_excess_suppliers(ray, sf),
        "events_pairs_intersect":
            lambda sf: relational.events_pairs_intersect(ray, sf),
        "events_pairs_except":
            lambda sf: relational.events_pairs_except(ray, sf),
        "events_value_percentile_cont":
            lambda sf: relational.events_value_percentile_cont(ray, sf),
        "events_type_percentile_cont":
            lambda sf: relational.events_type_percentile_cont(ray, sf),
        "events_asof_next_purchase":
            lambda sf: relational.events_asof_next_purchase(ray, sf),
        "events_value_share":
            lambda sf: relational.events_value_share(ray, sf),
        "customers_revenue_deciles":
            lambda sf: relational.customers_revenue_deciles(ray, sf),
        "events_user_orders":
            lambda sf: relational.events_user_orders(ray, sf),
        "events_type_regression":
            lambda sf: relational.events_type_regression(ray, sf),
        "events_cohort_matrix":
            lambda sf: relational.events_cohort_matrix(ray, sf),
        "events_daily_interpolated":
            lambda sf: relational.events_daily_interpolated(ray, sf),
        "events_above_user_mean":
            lambda sf: relational.events_above_user_mean(ray, sf),
        "events_day_bitmaps":
            lambda sf: relational.events_day_bitmaps(ray, sf),
        "orders_rfm_segments":
            lambda sf: relational.orders_rfm_segments(ray, sf),
        "events_time_travel":
            lambda sf: relational.events_time_travel(ray, sf),
        "events_pattern_match":
            lambda sf: relational.events_pattern_match(ray, sf),
        "events_running_distinct":
            lambda sf: relational.events_running_distinct(ray, sf),
        "events_upsert":
            lambda sf: relational.events_upsert(ray, sf),
        "lineitem_copurchase":
            lambda sf: relational.lineitem_copurchase(ray, sf),
        "events_conversion_lag":
            lambda sf: relational.events_conversion_lag(ray, sf),
        "events_windowed_topk":
            lambda sf: relational.events_windowed_topk(ray, sf),
        "orders_segment_revenue":
            lambda sf: relational.orders_segment_revenue(ray, sf),
        "customers_gini":
            lambda sf: relational.customers_gini(ray, sf),
        "events_snapshot_diff":
            lambda sf: relational.events_snapshot_diff(ray, sf),
        "events_dp_counts":
            lambda sf: relational.events_dp_counts(ray, sf),
        "events_mv_incremental":
            lambda sf: relational.events_mv_incremental(ray, sf),
        "events_wow_growth":
            lambda sf: relational.events_wow_growth(ray, sf),
        "docs_k_anonymity":
            lambda sf: relational.docs_k_anonymity(ray, sf),
        "events_unpivot":
            lambda sf: relational.events_unpivot(ray, sf),
        "part_min_supplier":
            lambda sf: relational.part_min_supplier(ray, sf),
        "revenue_rollup": lambda sf: relational.revenue_rollup(ray, sf),
        "events_daily_stats":
            lambda sf: relational.events_daily_stats(ray, sf),
        "events_by_segment":
            lambda sf: relational.events_by_segment(ray, sf),
        "events_type_median":
            lambda sf: relational.events_type_median(ray, sf),
        "events_type_mad":
            lambda sf: relational.events_type_mad(ray, sf),
        "events_pivot": lambda sf: relational.events_pivot(ray, sf),
        "events_user_profile":
            lambda sf: relational.events_user_profile(ray, sf),
        "users_retained": lambda sf: relational.users_retained(ray, sf),
        "events_asof_order": lambda sf: relational.events_asof_order(ray, sf),
        "events_running_index": lambda sf: relational.events_running_index(ray, sf),
    }
    try:
        from . import dedup, similarity, multimodal, sketches

        q.update({
            "dedup_exact": lambda sf: dedup.exact_dedup(ray, sf),
            "dedup_filtered_corpus":
                lambda sf: dedup.dedup_filtered_corpus(ray, sf),
            "dedup_edit_distance":
                lambda sf: dedup.edit_distance_pairs(ray, sf),
            "dedup_minhash_lsh": lambda sf: dedup.minhash_lsh_pairs(ray, sf),
            "dedup_ngram_jaccard": lambda sf: dedup.ngram_jaccard_pairs(ray, sf),
            "dedup_jaccard_join":
                lambda sf: dedup.jaccard_join_pairs(ray, sf),
            "dedup_containment_join":
                lambda sf: dedup.containment_join_pairs(ray, sf),
            "dedup_lsh_recall":
                lambda sf: dedup.dedup_lsh_recall(ray, sf),
            "dedup_clusters": lambda sf: dedup.dedup_clusters(ray, sf),
            "dedup_keep_best":
                lambda sf: dedup.dedup_keep_best(ray, sf),
            "dedup_rate_by_source":
                lambda sf: dedup.dedup_rate_by_source(ray, sf),
            "dedup_simhash": lambda sf: dedup.simhash_pairs(ray, sf),
            "dedup_embedding_cosine": lambda sf: similarity.cosine_dup_pairs(ray, sf),
            "dedup_incremental":
                lambda sf: dedup.dedup_incremental(ray, sf),
            "cluster_embedding_cosine":
                lambda sf: similarity.cluster_embedding_cosine(ray, sf),
            "knn_cosine": lambda sf: similarity.knn_brute_force(ray, sf),
            "knn_cosine_q8": lambda sf: similarity.knn_cosine_q8(ray, sf),
            "knn_cosine_filtered":
                lambda sf: similarity.knn_cosine_filtered(ray, sf),
            "emb_quantize": lambda sf: similarity.emb_quantize(ray, sf),
            "emb_qnorm_hist":
                lambda sf: similarity.emb_qnorm_hist(ray, sf),
            "knn_ivf": lambda sf: similarity.knn_ivf(ray, sf),
            "knn_lsh": lambda sf: similarity.knn_lsh(ray, sf),
            "knn_pq": lambda sf: similarity.knn_pq(ray, sf),
            # value-checked recall audits of the three approximate
            # indexes vs exact brute force (dump-bound SQL oracles)
            "knn_mips": lambda sf: similarity.knn_mips(ray, sf),
            "knn_ivf_recall":
                lambda sf: similarity.knn_ivf_recall(ray, sf),
            "knn_lsh_recall":
                lambda sf: similarity.knn_lsh_recall(ray, sf),
            "knn_pq_recall":
                lambda sf: similarity.knn_pq_recall(ray, sf),
            "knn_mmr": lambda sf: similarity.knn_mmr(ray, sf),
            "emb_label_sums": lambda sf: similarity.emb_label_sums(ray, sf),
            "emb_kmeans": lambda sf: similarity.emb_kmeans(ray, sf),
            "emb_pca": lambda sf: similarity.emb_pca(ray, sf),
            "emb_gram_matrix":
                lambda sf: similarity.emb_gram_matrix(ray, sf),
            "events_distinct_users_hll":
                lambda sf: sketches.events_distinct_users_hll(ray, sf),
            "events_type_distinct_hll":
                lambda sf: sketches.events_type_distinct_hll(ray, sf),
            "events_type_percentiles_tdigest":
                lambda sf: sketches.events_type_percentiles_tdigest(
                    ray, sf),
            "docs_distinct_texts_hll":
                lambda sf: sketches.docs_distinct_texts_hll(ray, sf),
            "events_value_percentiles_tdigest":
                lambda sf: sketches.events_value_percentiles_tdigest(
                    ray, sf),
            "doc_top_terms_mg":
                lambda sf: sketches.doc_top_terms_mg(ray, sf),
            "doc_top_terms_cms":
                lambda sf: sketches.doc_top_terms_cms(ray, sf),
            "doc_cms_counts":
                lambda sf: sketches.doc_cms_counts(ray, sf),
            "events_hll_registers":
                lambda sf: sketches.events_hll_registers(ray, sf),
            "events_kmv_bottomk":
                lambda sf: sketches.events_kmv_bottomk(ray, sf),
            "events_distinct_users_exact":
                lambda sf: sketches.events_distinct_users_exact(ray, sf),
            "multimodal_decode": lambda sf: multimodal.decode_meta(ray, sf),
            "multimodal_audio_windows":
                lambda sf: multimodal.audio_windows(ray, sf),
            "audio_meta": lambda sf: multimodal.audio_meta(ray, sf),
            "multimodal_frames": lambda sf: multimodal.frame_samples(ray, sf),
            "multimodal_meta": multimodal_meta,
            "frames_meta": frames_meta,
            "multimodal_resize": lambda sf: multimodal.resize_stats(ray, sf),
            "multimodal_channel_hist":
                lambda sf: multimodal.channel_hist(ray, sf),
            "multimodal_phash":
                lambda sf: multimodal.phash_pairs(ray, sf),
            "multimodal_phash_recall":
                lambda sf: multimodal.phash_recall(ray, sf),
            "multimodal_scene_cuts":
                lambda sf: multimodal.scene_cuts(ray, sf),
        })
    except ImportError:
        pass
    return q


def multimodal_meta(sf_dir: str):
    """Decoded header+size metadata of the multimodal payloads — the
    END-TO-END check of the binary decode path: the Ray side parses the
    actual payload bytes, the oracle derives the same values from the
    deterministic doc_id arithmetic (pixel stats stay rows-only: the
    oracle cannot run PCG64)."""
    import pyarrow as pa

    from . import multimodal

    ray = _ray()
    ds = multimodal.decode_meta(ray, sf_dir)
    return ds.map_batches(
        lambda t: t.select(["doc_id", "width", "height", "n_frames",
                            "n_bytes", "decode_ok"]),
        batch_format="pyarrow")


def frames_meta(sf_dir: str):
    """Frame-explode metadata of the multimodal payloads — the END-TO-END
    check of the frame-sampling path: the Ray side decodes the ACTUAL
    payload bytes and emits each frame's byte range; the oracle derives
    the same values from the deterministic doc_id arithmetic (per-frame
    pixel stats stay rows-only: the oracle cannot run PCG64)."""
    from . import multimodal

    ray = _ray()
    ds = multimodal.frame_samples(ray, sf_dir)
    return ds.map_batches(
        lambda t: t.select(["doc_id", "frame_idx", "byte_start",
                            "byte_len"]),
        batch_format="pyarrow")


FRAMES_META_SQL = """
WITH d AS (
  SELECT doc_id,
         (8 + (doc_id % 16) * 2) * (8 + (doc_id % 12) * 2) AS per,
         1 + doc_id % 4 AS nf
  FROM documents),
x AS (
  SELECT doc_id, per, unnest(generate_series(0, nf - 1)) AS fi FROM d)
SELECT doc_id, CAST(fi AS BIGINT) AS frame_idx,
       CAST(16 + fi * per AS BIGINT) AS byte_start,
       CAST(per AS BIGINT) AS byte_len
FROM x ORDER BY doc_id, frame_idx
"""


def _langid_sql() -> str:
    """DuckDB reimplementation of LangIdStage: same tokenizer class,
    same stopword tables, same strict-> tie rule over sorted langs."""
    from .textpipe import _STOPWORDS, SQL_WS_CLASS

    def inlist(lang):
        return ", ".join(f"'{w}'" for w in sorted(_STOPWORDS[lang]))

    trim = (f"regexp_replace(lower(text), '^{SQL_WS_CLASS}+|"
            f"{SQL_WS_CLASS}+$', '', 'g')")
    return f"""
WITH toks AS (
  SELECT doc_id,
         str_split_regex({trim}, '{SQL_WS_CLASS}+') AS tk
  FROM documents),
counts AS (
  SELECT doc_id,
    CAST(len(list_filter(tk, x -> x IN ({inlist('en')}))) AS BIGINT) AS n_en,
    CAST(len(list_filter(tk, x -> x IN ({inlist('es')}))) AS BIGINT) AS n_es,
    CAST(len(list_filter(tk, x -> x IN ({inlist('pt')}))) AS BIGINT) AS n_pt
  FROM toks)
SELECT doc_id,
  CASE WHEN n_en = 0 AND n_es = 0 AND n_pt = 0 THEN 'unk'
       WHEN n_en >= n_es AND n_en >= n_pt THEN 'en'
       WHEN n_es >= n_pt THEN 'es'
       ELSE 'pt' END AS lang_pred,
  CAST(greatest(n_en, n_es, n_pt) AS BIGINT) AS n_stopword_hits
FROM counts ORDER BY doc_id
"""


def _langid_mix_sql() -> str:
    """Per-source language mix: the SAME scorer SQL as _langid_sql with
    the source column carried through and a final (source, lang) count."""
    from .textpipe import _STOPWORDS, SQL_WS_CLASS

    def inlist(lang):
        return ", ".join(f"'{w}'" for w in sorted(_STOPWORDS[lang]))

    trim = (f"regexp_replace(lower(text), '^{SQL_WS_CLASS}+|"
            f"{SQL_WS_CLASS}+$', '', 'g')")
    return f"""
WITH toks AS (
  SELECT source,
         str_split_regex({trim}, '{SQL_WS_CLASS}+') AS tk
  FROM documents),
counts AS (
  SELECT source,
    CAST(len(list_filter(tk, x -> x IN ({inlist('en')}))) AS BIGINT) AS n_en,
    CAST(len(list_filter(tk, x -> x IN ({inlist('es')}))) AS BIGINT) AS n_es,
    CAST(len(list_filter(tk, x -> x IN ({inlist('pt')}))) AS BIGINT) AS n_pt
  FROM toks),
pred AS (
  SELECT source,
    CASE WHEN n_en = 0 AND n_es = 0 AND n_pt = 0 THEN 'unk'
         WHEN n_en >= n_es AND n_en >= n_pt THEN 'en'
         WHEN n_es >= n_pt THEN 'es'
         ELSE 'pt' END AS lang_pred
  FROM counts)
SELECT source, lang_pred, COUNT(*) AS n_docs
FROM pred GROUP BY source, lang_pred ORDER BY source, lang_pred
"""


MULTIMODAL_META_SQL = """
SELECT doc_id,
  CAST(8 + (doc_id % 16) * 2 AS BIGINT) AS width,
  CAST(8 + (doc_id % 12) * 2 AS BIGINT) AS height,
  CAST(1 + doc_id % 4 AS BIGINT) AS n_frames,
  CAST(16 + (8 + (doc_id % 16) * 2) * (8 + (doc_id % 12) * 2)
       * (1 + doc_id % 4) AS BIGINT) AS n_bytes,
  TRUE AS decode_ok
FROM documents ORDER BY doc_id
"""


# the crawl queries dump their attempts log to a per-scale STABLE path
# (see _dump_attempts) so the oracle SQL can read the exact rows the Ray
# side aggregated. The crawl oracles are TEMPLATES over that path:
# ``oracle_sql_for(sf_dir)`` formats them for any scale; the module-level
# ``ORACLE_SQL`` is pinned to sf0.01 (the scale the external driver runs
# oracles at).
def _attempts_dump_path(sf_dir: str) -> str:
    return os.path.join(corpus_cache_dir(sf_dir), "attempts_dump.parquet")


def _graph_dump_paths(sf_dir: str) -> tuple[str, str]:
    """(edges_dir, nodes_dir) for the per-scale link-graph dump the
    graph oracles read (directories of parquet files — the dump is a
    distributed write)."""
    base = corpus_cache_dir(sf_dir)
    return (os.path.join(base, "graph_edges_dump"),
            os.path.join(base, "graph_nodes_dump"))


def _pagerank_oracle_template(iters: int = 5, k: int = 20) -> str:
    """DuckDB SQL replicating the integer-mass PageRank EXACTLY
    (graph.py:pagerank): per-edge floor((rank*85//100)/deg) inflow,
    leftover (teleport + dangling + floor residue) split uniformly as
    floor((total - inflow_sum)/n). Fixed iteration count -> chained
    CTEs, no recursion needed. {edges_dump}/{nodes_dump} are the
    per-scale link-graph dump directories."""
    cte = [
        "WITH nodes AS (SELECT url FROM"
        " read_parquet('{nodes_dump}/*.parquet')),",
        " edges AS (SELECT src, dst, deg FROM"
        " read_parquet('{edges_dump}/*.parquet')),",
        # node_mass(n): max(1, min(1e9, 2^62 // (85 * max(n,1))))
        " const AS (SELECT COUNT(*) AS n, GREATEST(1, LEAST(1000000000,"
        " 4611686018427387904 // (85 * GREATEST(COUNT(*), 1)))) AS mass"
        " FROM nodes),",
        " r0 AS (SELECT url, (SELECT mass FROM const) AS rnk FROM nodes)",
    ]
    for i in range(1, iters + 1):
        cte.append(f""",
 i{i} AS (SELECT e.dst AS url,
        CAST(SUM((r.rnk * 85 // 100) // GREATEST(e.deg, 1)) AS BIGINT)
            AS infl
        FROM edges e JOIN r{i - 1} r ON e.src = r.url GROUP BY e.dst),
 r{i} AS (SELECT n.url,
        ((SELECT n * mass FROM const)
         - COALESCE((SELECT CAST(SUM(infl) AS BIGINT) FROM i{i}), 0))
        // (SELECT n FROM const) + COALESCE(i.infl, 0) AS rnk
        FROM nodes n LEFT JOIN i{i} i ON n.url = i.url)""")
    cte.append(f"""
SELECT url, CAST(rnk AS BIGINT) AS "rank" FROM r{iters}
ORDER BY rnk DESC, url LIMIT {k}
""")
    return _materialize_ctes("".join(cte))


def _ppr_oracle_template(iters: int = 5, k: int = 20) -> str:
    """DuckDB SQL replicating integer-mass PERSONALIZED PageRank
    EXACTLY (graph.py:ppr): teleport/dangling/floor leftover returns
    uniformly to the round-0 SEED set; mass = node_mass(n_seeds); the
    rank vector stays sparse until a final densifying left join."""
    cte = [
        "WITH nodes AS (SELECT url FROM"
        " read_parquet('{nodes_dump}/*.parquet')),",
        " edges AS (SELECT src, dst, deg FROM"
        " read_parquet('{edges_dump}/*.parquet')),",
        " seeds AS (SELECT a.url FROM read_parquet('{dump}') a"
        " JOIN nodes n ON n.url = a.url WHERE a.round = 0),",
        # node_mass(max(ns,1)) with ns = seed count
        " const AS (SELECT GREATEST(COUNT(*), 1) AS ns,"
        " GREATEST(1, LEAST(1000000000,"
        " 4611686018427387904 // (85 * GREATEST(COUNT(*), 1)))) AS mass"
        " FROM seeds),",
        " r0 AS (SELECT url, (SELECT mass FROM const) AS rnk FROM seeds)",
    ]
    for i in range(1, iters + 1):
        cte.append(f""",
 i{i} AS (SELECT e.dst AS url,
        CAST(SUM((r.rnk * 85 // 100) // GREATEST(e.deg, 1)) AS BIGINT)
            AS infl
        FROM edges e JOIN r{i - 1} r ON e.src = r.url GROUP BY e.dst),
 r{i} AS (SELECT url, CAST(SUM(rnk) AS BIGINT) AS rnk FROM (
        SELECT url,
               ((SELECT ns * mass FROM const)
                - COALESCE((SELECT CAST(SUM(infl) AS BIGINT)
                            FROM i{i}), 0))
               // (SELECT ns FROM const) AS rnk
        FROM seeds
        UNION ALL SELECT url, infl FROM i{i}) GROUP BY url)""")
    cte.append(f"""
SELECT n.url, CAST(COALESCE(r.rnk, 0) AS BIGINT) AS "rank"
FROM nodes n LEFT JOIN r{iters} r ON r.url = n.url
ORDER BY COALESCE(r.rnk, 0) DESC, n.url LIMIT {k}
""")
    return _materialize_ctes("".join(cte))


def _hits_oracle_template(iters: int = 2, k: int = 20) -> str:
    """DuckDB SQL replicating unnormalized integer HITS exactly
    (graph.py:crawl_hits): h0 = 1, then a = sum in-neighbor h /
    h = sum out-neighbor a per full round (a uses the SAME round's h;
    h uses the NEW a)."""
    cte = [
        "WITH nodes AS (SELECT url FROM"
        " read_parquet('{nodes_dump}/*.parquet')),",
        " e AS (SELECT src, dst FROM"
        " read_parquet('{edges_dump}/*.parquet')),",
        " h0 AS (SELECT url, CAST(1 AS BIGINT) AS s FROM nodes)",
    ]
    for i in range(1, iters + 1):
        cte.append(f""",
 a{i} AS (SELECT e.dst AS url, CAST(SUM(h.s) AS BIGINT) AS s
        FROM e JOIN h{i - 1} h ON e.src = h.url GROUP BY e.dst),
 h{i} AS (SELECT e.src AS url, CAST(SUM(a.s) AS BIGINT) AS s
        FROM e JOIN a{i} a ON e.dst = a.url GROUP BY e.src)""")
    cte.append(f"""
SELECT n.url, CAST(COALESCE(a.s, 0) AS BIGINT) AS authority,
       CAST(COALESCE(h.s, 0) AS BIGINT) AS hub
FROM nodes n LEFT JOIN a{iters} a ON a.url = n.url
             LEFT JOIN h{iters} h ON h.url = n.url
ORDER BY COALESCE(a.s, 0) DESC, n.url LIMIT {k}
""")
    return _materialize_ctes("".join(cte))


def _kcore_oracle_template(k: int = 3, rounds: int = 12) -> str:
    """DuckDB SQL replicating graph.py:crawl_kcore's BOUNDED peel
    exactly: ``rounds`` unrolled drop-degree-<k / restrict steps over
    the canonical undirected edge set, then the residual degrees.
    (The Ray side exits early only at a fixpoint, which the remaining
    unrolled rounds preserve — so the chain is value-identical.)"""
    cte = [
        "WITH e0 AS (SELECT DISTINCT LEAST(src, dst) AS a,"
        " GREATEST(src, dst) AS b"
        " FROM read_parquet('{edges_dump}/*.parquet') WHERE src <> dst)",
    ]
    for r in range(1, rounds + 1):
        cte.append(f""",
 d{r} AS (SELECT node, COUNT(*) AS d FROM (
        SELECT a AS node FROM e{r - 1}
        UNION ALL SELECT b AS node FROM e{r - 1}) GROUP BY node),
 a{r} AS (SELECT node FROM d{r} WHERE d >= {k}),
 e{r} AS (SELECT e.a, e.b FROM e{r - 1} e
        JOIN a{r} x ON e.a = x.node JOIN a{r} y ON e.b = y.node)""")
    cte.append(f"""
SELECT node AS url, CAST(COUNT(*) AS BIGINT) AS core_deg FROM (
  SELECT a AS node FROM e{rounds} UNION ALL SELECT b AS node
  FROM e{rounds}) GROUP BY node ORDER BY url
""")
    return _materialize_ctes("".join(cte))


def _materialize_ctes(sql: str) -> str:
    """Mark every CTE ``AS MATERIALIZED``: DuckDB 1.0 INLINES plain
    CTEs, so an iteration chain where each step references the
    previous one twice expands exponentially — the repeated
    read_parquet binds exhaust file handles (surfacing as a bogus
    'No files found' IOException) long before execution starts."""
    import re

    return re.sub(r"(\s)(\w+) AS \(", r"\1\2 AS MATERIALIZED (", sql)


def _salsa_oracle_template(iters: int = 5, k: int = 20) -> str:
    """DuckDB SQL replicating integer-mass SALSA EXACTLY
    (graph.py:salsa): alternating half-steps pushing floor(rank/deg)
    forward over edges then floor(rank/indeg) back, each half-step's
    leftover vs total = n_hubs * mass split uniformly over the
    receiving side. Fixed iterations -> chained CTE pairs."""
    cte = [
        "WITH nodes AS (SELECT url FROM"
        " read_parquet('{nodes_dump}/*.parquet')),",
        " edges AS (SELECT src, dst, deg FROM"
        " read_parquet('{edges_dump}/*.parquet')),",
        " ind AS (SELECT dst, CAST(COUNT(*) AS BIGINT) AS indeg"
        " FROM edges GROUP BY dst),",
        " e4 AS (SELECT e.src, e.dst, e.deg, i.indeg"
        " FROM edges e JOIN ind i ON e.dst = i.dst),",
        " hubs AS (SELECT DISTINCT src AS url FROM edges),",
        " auths AS (SELECT DISTINCT dst AS url FROM edges),",
        " const AS (SELECT (SELECT COUNT(*) FROM hubs) AS nh,"
        " (SELECT COUNT(*) FROM auths) AS na,"
        " GREATEST(1, LEAST(1000000000, 4611686018427387904 //"
        " (85 * GREATEST((SELECT COUNT(*) FROM nodes), 1)))) AS mass),",
        " h0 AS (SELECT url, (SELECT mass FROM const) AS rnk FROM hubs)",
    ]
    for i in range(1, iters + 1):
        cte.append(f""",
 ai{i} AS (SELECT e.dst AS url,
        CAST(SUM(h.rnk // GREATEST(e.deg, 1)) AS BIGINT) AS infl
        FROM e4 e JOIN h{i - 1} h ON e.src = h.url GROUP BY e.dst),
 a{i} AS (SELECT n.url,
        ((SELECT nh * mass FROM const)
         - COALESCE((SELECT CAST(SUM(infl) AS BIGINT) FROM ai{i}), 0))
        // (SELECT na FROM const) + COALESCE(i.infl, 0) AS rnk
        FROM auths n LEFT JOIN ai{i} i ON n.url = i.url),
 hi{i} AS (SELECT e.src AS url,
        CAST(SUM(a.rnk // GREATEST(e.indeg, 1)) AS BIGINT) AS infl
        FROM e4 e JOIN a{i} a ON e.dst = a.url GROUP BY e.src),
 h{i} AS (SELECT n.url,
        ((SELECT nh * mass FROM const)
         - COALESCE((SELECT CAST(SUM(infl) AS BIGINT) FROM hi{i}), 0))
        // (SELECT nh FROM const) + COALESCE(i.infl, 0) AS rnk
        FROM hubs n LEFT JOIN hi{i} i ON n.url = i.url)""")
    cte.append(f"""
SELECT u.url, CAST(COALESCE(a.rnk, 0) AS BIGINT) AS auth,
       CAST(COALESCE(h.rnk, 0) AS BIGINT) AS hub
FROM (SELECT url FROM hubs UNION SELECT url FROM auths) u
LEFT JOIN a{iters} a ON u.url = a.url
LEFT JOIN h{iters} h ON u.url = h.url
ORDER BY auth DESC, hub DESC, u.url LIMIT {k}
""")
    return _materialize_ctes("".join(cte))


# canonical unordered edges: any total order over node ids yields the
# same unordered-pair set, so counting over urls directly matches the
# Ray side's hash-canonicalized count (triangles are unordered triples)
_TRIANGLES_ORACLE_TEMPLATE = """
WITH ce AS (SELECT DISTINCT LEAST(src, dst) AS a, GREATEST(src, dst) AS b
            FROM read_parquet('{edges_dump}/*.parquet') WHERE src <> dst)
SELECT CAST(COUNT(*) AS BIGINT) AS n_triangles
FROM ce e1 JOIN ce e2 ON e2.a = e1.b
           JOIN ce e3 ON e3.a = e1.a AND e3.b = e2.b
"""


_COMPONENTS_ORACLE_TEMPLATE = """
WITH RECURSIVE
 nmap AS (SELECT fetch_seq, url FROM
          read_parquet('{nodes_dump}/*.parquet')),
 bi AS (SELECT src AS a, dst AS b FROM
            read_parquet('{edges_dump}/*.parquet')
        UNION
        SELECT dst, src FROM read_parquet('{edges_dump}/*.parquet')),
 e2 AS (SELECT na.fetch_seq AS a, nb.fetch_seq AS b
        FROM bi JOIN nmap na ON bi.a = na.url
                JOIN nmap nb ON bi.b = nb.url),
 lab AS (SELECT fetch_seq AS seq, fetch_seq AS comp FROM nmap
         UNION
         SELECT e2.b, lab.comp FROM lab JOIN e2 ON e2.a = lab.seq
         WHERE lab.comp < e2.b)
SELECT n.fetch_seq, n.url, CAST(MIN(l.comp) AS BIGINT) AS component
FROM nmap n JOIN lab l ON l.seq = n.fetch_seq
GROUP BY n.fetch_seq, n.url
ORDER BY n.fetch_seq
"""


_BLOCK3 = "'pdf','csv','png','svg','jpg','gif','raw','cr2','nef','orf','sr2','bmp','tif','ogv'"
_BLOCK4 = "'tiff','jpeg'"

# {dump} = the attempts-dump parquet path for the scale under test
_CRAWL_ORACLE_TEMPLATES: dict[str, str] = {
    "crawl_host_counts": """
SELECT host, COUNT(*) AS n_pages
FROM read_parquet('{dump}')
GROUP BY host ORDER BY host
""",
    "url_algebra": f"""
SELECT url,
       string_split(url, '/')[1] || '//' || string_split(url, '/')[3]
           AS host2,
       '/' || array_to_string(string_split(url, '/')[4:], '/') AS resource2,
       NOT ((length(url) > 3 AND right(url, 3) IN ({_BLOCK3}))
            OR (length(url) > 4 AND right(url, 4) IN ({_BLOCK4})))
           AS passes_blocklist
FROM read_parquet('{{dump}}')
ORDER BY url
""",
    "crawl_flagship": """
SELECT fetch_seq, url, host, ts, status, round, seq
FROM read_parquet('{dump}') ORDER BY fetch_seq
""",
    "crawl_log": """
SELECT a.url AS "URL", c.title AS "Title", c.first_n AS "Text",
       a.ts AS "Timestamp"
FROM read_parquet('{corpus_dump}/*.parquet') c
JOIN read_parquet('{dump}') a ON a.fetch_seq = c.doc_id
ORDER BY a.url
""",
    "crawl_corpus": """
SELECT CAST(doc_id AS BIGINT) AS fetch_seq, url, source AS host,
       text AS extracted_text, title, first_n,
       CAST(n_links AS INTEGER) AS n_links
FROM read_parquet('{corpus_dump}/*.parquet') ORDER BY fetch_seq
""",
    "crawl_log_jsonl": """
SELECT a.url AS "URL", a.ts AS "Timestamp"
FROM read_parquet('{dump}') a
JOIN read_parquet('{corpus_dump}/*.parquet') c ON a.fetch_seq = c.doc_id
ORDER BY a.url
""",
    "crawl_debug_text": """
SELECT a.url AS "URL",
       '{{' || chr(10) ||
       chr(9) || '"URL": '   || to_json(a.url)::VARCHAR  || ',' || chr(10) ||
       chr(9) || '"Title": ' || COALESCE(to_json(c.title)::VARCHAR,
                                         'null') || ',' || chr(10) ||
       chr(9) || '"Text": '  || COALESCE(to_json(c.first_n)::VARCHAR,
                                         'null') || ',' || chr(10) ||
       chr(9) || '"Timestamp": ' || to_json(a.ts)::VARCHAR || chr(10) ||
       '}}' AS debug_text
FROM read_parquet('{corpus_dump}/*.parquet') c
JOIN read_parquet('{dump}') a ON a.fetch_seq = c.doc_id
ORDER BY a.url
""",
    "crawl_warc_read": """
SELECT url, CAST(n_html AS BIGINT) AS n_bytes
FROM read_parquet('{corpus_dump}/*.parquet') ORDER BY url
""",
    "crawl_warc": """
WITH m AS (SELECT warc_file, url
           FROM read_parquet('{warc_manifest}/*.parquet')),
c AS (SELECT url, html_str FROM read_parquet('{corpus_dump}/*.parquet')),
j AS (SELECT COALESCE(m.warc_file, '<MISSING>') AS warc_file, c.url,
             strlen(c.html_str) AS nb, sha256(c.html_str) AS d
      FROM c LEFT JOIN m ON m.url = c.url)
SELECT warc_file,
       CAST(COUNT(*) AS BIGINT) AS n_records,
       CAST(SUM(nb) AS BIGINT) AS n_payload_bytes,
       sha256(string_agg(d, '' ORDER BY url)) AS content_digest
FROM j GROUP BY warc_file ORDER BY warc_file
""",
    "crawl_wet": """
WITH m AS (SELECT wet_file, url
           FROM read_parquet('{wet_manifest}/*.parquet')),
c AS (SELECT url, text FROM read_parquet('{corpus_dump}/*.parquet')),
j AS (SELECT COALESCE(m.wet_file, '<MISSING>') AS wet_file, c.url,
             strlen(c.text) AS nb, sha256(c.text) AS d
      FROM c LEFT JOIN m ON m.url = c.url)
SELECT wet_file,
       CAST(COUNT(*) AS BIGINT) AS n_records,
       CAST(SUM(nb) AS BIGINT) AS n_payload_bytes,
       sha256(string_agg(d, '' ORDER BY url)) AS content_digest
FROM j GROUP BY wet_file ORDER BY wet_file
""",
    "crawl_wat": """
WITH m AS (SELECT wat_file, url
           FROM read_parquet('{wat_manifest}/*.parquet')),
c AS (SELECT url,
             '{{"n_links": ' || n_links ||
             ', "text_len": ' || length(text) ||
             ', "title": ' || COALESCE(to_json(title)::VARCHAR, 'null') ||
             ', "url": ' || to_json(url)::VARCHAR || '}}' AS body
      FROM read_parquet('{corpus_dump}/*.parquet')),
j AS (SELECT COALESCE(m.wat_file, '<MISSING>') AS wat_file, c.url,
             strlen(c.body) AS nb, sha256(c.body) AS d
      FROM c LEFT JOIN m ON m.url = c.url)
SELECT wat_file,
       CAST(COUNT(*) AS BIGINT) AS n_records,
       CAST(SUM(nb) AS BIGINT) AS n_payload_bytes,
       sha256(string_agg(d, '' ORDER BY url)) AS content_digest
FROM j GROUP BY wat_file ORDER BY wat_file
""",
    "crawl_wet_read": """
SELECT url, text FROM read_parquet('{corpus_dump}/*.parquet')
ORDER BY url
""",
    "crawl_wat_read": """
SELECT url, title, CAST(n_links AS BIGINT) AS n_links,
       CAST(length(text) AS BIGINT) AS text_len
FROM read_parquet('{corpus_dump}/*.parquet') ORDER BY url
""",
    "crawl_sitemaps": """
SELECT source AS host, COUNT(*) AS n_urls
FROM read_parquet('{corpus_dump}/*.parquet')
GROUP BY source ORDER BY host
""",
    "crawl_politeness_audit": """
WITH saved AS (
  SELECT host, ts FROM read_parquet('{dump}') WHERE status = 200),
d AS (
  SELECT host,
         CASE WHEN NOT fetchable THEN 0.1
              WHEN crawl_delay IS NULL THEN 0.1
              WHEN crawl_delay > 3.0 THEN 3.0
              ELSE crawl_delay END AS delay
  FROM read_parquet('{web_robots}')),
g AS (
  SELECT s.host, s.ts - LAG(s.ts) OVER (PARTITION BY s.host
                                        ORDER BY s.ts) AS gap,
         COALESCE(d.delay, 0.1) AS delay
  FROM saved s LEFT JOIN d ON d.host = s.host)
SELECT CAST(COUNT(DISTINCT host) AS BIGINT) AS n_hosts,
       CAST(COUNT(gap) AS BIGINT) AS n_gaps,
       CAST(COALESCE(SUM(CASE WHEN gap < delay - 1e-9 THEN 1
                              ELSE 0 END), 0) AS BIGINT)
         AS n_violations
FROM g
""",
    "crawl_coverage_by_host": """
WITH p AS (SELECT regexp_extract(url, '^https?://[^/]+') AS host,
                  COUNT(*) AS n_pages
           FROM read_parquet('{web_pages}') GROUP BY 1),
a AS (SELECT host, COUNT(*) AS n_crawled
      FROM read_parquet('{dump}') WHERE status = 200 GROUP BY host)
SELECT p.host,
       CAST(p.n_pages AS BIGINT) AS n_pages,
       CAST(COALESCE(a.n_crawled, 0) AS BIGINT) AS n_crawled,
       CAST(10000 * COALESCE(a.n_crawled, 0) // p.n_pages AS BIGINT)
         AS coverage_bp
FROM p LEFT JOIN a ON a.host = p.host
ORDER BY p.host
""",
    "crawl_robots_report": """
SELECT host,
       COUNT(*) AS n_attempted,
       CAST(SUM(CASE WHEN status = 460 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_denied,
       CAST(SUM(CASE WHEN status = 461 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_blocklisted,
       CAST(SUM(CASE WHEN status = 404 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_missing,
       CAST(SUM(CASE WHEN status = 415 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_non_html,
       CAST(SUM(CASE WHEN status = 200 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_saved
FROM read_parquet('{dump}')
GROUP BY host ORDER BY host
""",
    "crawl_sitemap_read": """
SELECT url, warc_ts_us AS lastmod_us
FROM read_parquet('{corpus_dump}/*.parquet') ORDER BY url
""",
    "crawl_cdx": """
WITH c AS (
  SELECT url, warc_ts_us, html_str,
         regexp_replace(url, '^https?://', '') AS nohost
  FROM read_parquet('{corpus_dump}/*.parquet')
)
SELECT lower(array_to_string(
         list_reverse(string_split(split_part(nohost, '/', 1), '.')),
         ',')) || ')' ||
       CASE WHEN substr(nohost,
                 length(split_part(nohost, '/', 1)) + 1) = ''
            THEN '/'   -- pathless URL: surt_key still emits ')/' (urls.py)
            ELSE lower(substr(nohost,
                 length(split_part(nohost, '/', 1)) + 1)) END AS surt_key,
       strftime(make_timestamp(warc_ts_us), '%Y%m%d%H%M%S') AS ts14,
       url,
       sha256(html_str) AS digest,
       CAST(strlen(html_str) AS BIGINT) AS n_html
FROM c ORDER BY surt_key, ts14, url
""",
    "crawl_title_dups": """
SELECT title, CAST(COUNT(*) AS BIGINT) AS n_pages
FROM read_parquet('{corpus_dump}/*.parquet')
WHERE title IS NOT NULL
GROUP BY title HAVING COUNT(*) > 1
ORDER BY n_pages DESC, title
""",
    "crawl_path_depths": """
SELECT CAST(len(string_split(url, '/')) - 3 AS BIGINT) AS depth,
       COUNT(*) AS n_urls
FROM read_parquet('{dump}')
GROUP BY 1 ORDER BY depth
""",
    "crawl_round_stats": """
SELECT CAST(round AS BIGINT) AS round, COUNT(*) AS n_attempted,
       CAST(SUM(CASE WHEN status = 200 THEN 1 ELSE 0 END) AS BIGINT)
           AS n_saved
FROM read_parquet('{dump}')
GROUP BY round ORDER BY round
""",
}
_CRAWL_ORACLE_TEMPLATES["crawl_pagerank"] = _pagerank_oracle_template()
_CRAWL_ORACLE_TEMPLATES["crawl_components"] = _COMPONENTS_ORACLE_TEMPLATE

# BFS depths: bounded recursive closure over (url, depth) pairs — the
# depth < 32 cap mirrors graph.crawl_depths' max_depth, so a page first
# reachable deeper than the cap is -1 on BOTH sides
_DEPTHS_ORACLE_TEMPLATE = """
WITH RECURSIVE
 nmap AS (SELECT url FROM read_parquet('{nodes_dump}/*.parquet')),
 e AS (SELECT src, dst FROM read_parquet('{edges_dump}/*.parquet')),
 seeds AS (SELECT a.url FROM read_parquet('{dump}') a
           JOIN nmap n ON n.url = a.url
           WHERE a.round = 0),
 d AS (SELECT url, 0 AS depth FROM seeds
       UNION
       SELECT e.dst, d.depth + 1 FROM d JOIN e ON e.src = d.url
       WHERE d.depth < 32)
SELECT n.url, CAST(COALESCE(MIN(d.depth), -1) AS BIGINT) AS depth
FROM nmap n LEFT JOIN d ON d.url = n.url
GROUP BY n.url ORDER BY n.url
"""
_CRAWL_ORACLE_TEMPLATES["crawl_depths"] = _DEPTHS_ORACLE_TEMPLATE
_CRAWL_ORACLE_TEMPLATES["crawl_scc"] = """
WITH RECURSIVE
 e AS (SELECT DISTINCT src, dst
       FROM read_parquet('{edges_dump}/*.parquet') WHERE src <> dst),
 n AS (SELECT url FROM read_parquet('{nodes_dump}/*.parquet')),
 r AS (SELECT src, dst FROM e
       UNION
       SELECT r.src, e.dst FROM r JOIN e ON e.src = r.dst),
 m AS (SELECT a.src AS u, a.dst AS v
       FROM r a JOIN r b ON b.src = a.dst AND b.dst = a.src
       UNION
       SELECT url, url FROM n)
SELECT u AS url, MIN(v) AS scc_id FROM m GROUP BY u ORDER BY u
"""
_CRAWL_ORACLE_TEMPLATES["crawl_host_scc"] = """
WITH RECURSIVE
 e0 AS (SELECT
    string_split(src, '/')[1] || '//' || string_split(src, '/')[3]
        AS src,
    string_split(dst, '/')[1] || '//' || string_split(dst, '/')[3]
        AS dst
   FROM read_parquet('{edges_dump}/*.parquet')),
 e AS (SELECT DISTINCT src, dst FROM e0 WHERE src <> dst),
 n AS (SELECT DISTINCT src AS url FROM e0
       UNION SELECT DISTINCT dst FROM e0),
 r AS (SELECT src, dst FROM e
       UNION
       SELECT r.src, e.dst FROM r JOIN e ON e.src = r.dst),
 m AS (SELECT a.src AS u, a.dst AS v
       FROM r a JOIN r b ON b.src = a.dst AND b.dst = a.src
       UNION
       SELECT url, url FROM n)
SELECT u AS url, MIN(v) AS scc_id FROM m GROUP BY u ORDER BY u
"""
_CRAWL_ORACLE_TEMPLATES["crawl_pivot_scc"] = """
WITH RECURSIVE
 e AS (SELECT DISTINCT src, dst
       FROM read_parquet('{edges_dump}/*.parquet')),
 p AS (SELECT MIN(url) AS u
       FROM read_parquet('{nodes_dump}/*.parquet')),
 fwd AS (SELECT u AS url FROM p
         UNION
         SELECT e.dst FROM fwd f JOIN e ON e.src = f.url),
 bwd AS (SELECT u AS url FROM p
         UNION
         SELECT e.src FROM bwd b JOIN e ON e.dst = b.url)
SELECT f.url FROM fwd f JOIN bwd b ON b.url = f.url ORDER BY f.url
"""
_CRAWL_ORACLE_TEMPLATES["crawl_salsa"] = _salsa_oracle_template()
_CRAWL_ORACLE_TEMPLATES["crawl_triangles"] = _TRIANGLES_ORACLE_TEMPLATE
_CRAWL_ORACLE_TEMPLATES["crawl_ppr"] = _ppr_oracle_template()
# ANN recall audits: dump-bound like the crawl oracles (the dict holds
# every per-scale dump-bound template, not only crawl ones)
from . import similarity as _simtpl  # noqa: E402

for _v in ("ivf", "lsh", "pq"):
    _CRAWL_ORACLE_TEMPLATES[f"knn_{_v}_recall"] = \
        _simtpl.knn_recall_sql_template(f"knn_{_v}_dump")
from . import multimodal as _mmtpl  # noqa: E402

_CRAWL_ORACLE_TEMPLATES["multimodal_phash_recall"] = \
    _mmtpl.PHASH_RECALL_SQL_TEMPLATE
_CRAWL_ORACLE_TEMPLATES["crawl_kcore"] = _kcore_oracle_template()
_CRAWL_ORACLE_TEMPLATES["crawl_hits"] = _hits_oracle_template()
_CRAWL_ORACLE_TEMPLATES["crawl_indegree_hist"] = """
WITH nodes AS (SELECT url FROM read_parquet('{nodes_dump}/*.parquet')),
d AS (SELECT dst, CAST(COUNT(*) AS BIGINT) AS deg
      FROM read_parquet('{edges_dump}/*.parquet') GROUP BY dst)
SELECT CAST(COALESCE(d.deg, 0) AS BIGINT) AS in_deg,
       CAST(COUNT(*) AS BIGINT) AS n_pages
FROM nodes n LEFT JOIN d ON n.url = d.dst
GROUP BY 1 ORDER BY in_deg
"""
_CRAWL_ORACLE_TEMPLATES["crawl_edge_locality"] = """
WITH e AS (SELECT
    string_split(src, '/')[1] || '//' || string_split(src, '/')[3]
        AS sh,
    string_split(dst, '/')[1] || '//' || string_split(dst, '/')[3]
        AS dh
  FROM read_parquet('{edges_dump}/*.parquet')),
c AS (SELECT SUM(CASE WHEN sh = dh THEN 1 ELSE 0 END) AS ni,
             SUM(CASE WHEN sh = dh THEN 0 ELSE 1 END) AS nx
      FROM e)
SELECT CAST(ni AS BIGINT) AS n_intra, CAST(nx AS BIGINT) AS n_inter,
       CAST(CASE WHEN ni + nx = 0 THEN 0
                 ELSE (10000 * ni) // (ni + nx) END AS BIGINT)
           AS intra_bp
FROM c
"""
_CRAWL_ORACLE_TEMPLATES["crawl_host_graph"] = """
WITH e AS (SELECT
    string_split(src, '/')[1] || '//' || string_split(src, '/')[3]
        AS src_host,
    string_split(dst, '/')[1] || '//' || string_split(dst, '/')[3]
        AS dst_host
  FROM read_parquet('{edges_dump}/*.parquet'))
SELECT src_host, dst_host, CAST(COUNT(*) AS BIGINT) AS n_links
FROM e GROUP BY 1, 2 ORDER BY 1, 2
"""
_CRAWL_ORACLE_TEMPLATES["crawl_anchor_terms"] = """
WITH c AS (SELECT dst, token, COUNT(*) AS n
           FROM read_parquet('{anchor_dump}/*.parquet') GROUP BY 1, 2),
r AS (SELECT dst, token, n,
             ROW_NUMBER() OVER (PARTITION BY dst
                                ORDER BY n DESC, token) AS rk
      FROM c)
SELECT dst AS url, token, CAST(n AS BIGINT) AS n
FROM r WHERE rk <= 5 ORDER BY url, n DESC, token
"""
_CRAWL_ORACLE_TEMPLATES["crawl_focused_frontier"] = f"""
WITH s AS (SELECT dst, COUNT(*) AS n
           FROM read_parquet('{{anchor_dump}}/*.parquet')
           WHERE token IN {FOCUS_TERMS!r}
           GROUP BY dst)
SELECT dst AS url, CAST(n AS BIGINT) AS score
FROM s ORDER BY score DESC, url LIMIT 20
"""
_CRAWL_ORACLE_TEMPLATES["crawl_reciprocity"] = """
WITH e AS (SELECT DISTINCT src, dst
           FROM read_parquet('{edges_dump}/*.parquet') WHERE src <> dst),
r AS (SELECT COUNT(*) AS n
      FROM e JOIN e e2 ON e.src = e2.dst AND e.dst = e2.src),
t AS (SELECT COUNT(*) AS m FROM e)
SELECT CAST(t.m AS BIGINT) AS n_edges,
       CAST(r.n AS BIGINT) AS n_recip,
       CAST(CASE WHEN t.m = 0 THEN 0
                 ELSE (10000 * r.n) // t.m END AS BIGINT) AS reciprocity_bp
FROM t, r
"""
_CRAWL_ORACLE_TEMPLATES["crawl_clustering_coeff"] = """
WITH ce AS (SELECT DISTINCT LEAST(src, dst) AS a, GREATEST(src, dst) AS b
            FROM read_parquet('{edges_dump}/*.parquet') WHERE src <> dst),
tri AS (SELECT COUNT(*) AS t
        FROM ce e1 JOIN ce e2 ON e2.a = e1.b
                   JOIN ce e3 ON e3.a = e1.a AND e3.b = e2.b),
deg AS (SELECT node, COUNT(*) AS d FROM (
          SELECT a AS node FROM ce UNION ALL SELECT b AS node FROM ce)
        GROUP BY node),
w AS (SELECT COALESCE(SUM(d * (d - 1) // 2), 0) AS nw FROM deg)
SELECT CAST(tri.t AS BIGINT) AS n_triangles,
       CAST(w.nw AS BIGINT) AS n_wedges,
       CAST(CASE WHEN w.nw = 0 THEN 0
                 ELSE (30000 * tri.t) // w.nw END AS BIGINT) AS gcc_bp
FROM tri, w
"""
_CRAWL_ORACLE_TEMPLATES["crawl_degree_hist"] = """
WITH nodes AS (SELECT url FROM read_parquet('{nodes_dump}/*.parquet')),
d AS (SELECT src, MAX(deg) AS deg
      FROM read_parquet('{edges_dump}/*.parquet') GROUP BY src)
SELECT CAST(COALESCE(d.deg, 0) AS BIGINT) AS out_deg,
       CAST(COUNT(*) AS BIGINT) AS n_pages
FROM nodes n LEFT JOIN d ON n.url = d.src
GROUP BY 1 ORDER BY out_deg
"""
# crawl_curation = the (already value-checked) corpus_curation SQL over
# the dumped adapted crawl corpus instead of the documents view
_CRAWL_ORACLE_TEMPLATES["crawl_curation"] = \
    textpipe.CORPUS_CURATION_SQL.replace(
        "FROM documents", "FROM read_parquet('{corpus_dump}/*.parquet')")


def _host_gap_oracle_template() -> str:
    from ..state.politeness import STATUS_SAVED

    return f"""
WITH s AS (SELECT host, ts, seq FROM read_parquet('{{dump}}')
           WHERE status = {int(STATUS_SAVED)}),
cnt AS (SELECT host, CAST(COUNT(*) AS BIGINT) AS n_saved
        FROM s GROUP BY host),
g AS (SELECT host,
             ts - LAG(ts) OVER (PARTITION BY host ORDER BY ts, seq)
                 AS gap
      FROM s),
med AS (SELECT host, MEDIAN(gap) AS med_gap FROM g
        WHERE gap IS NOT NULL GROUP BY host)
SELECT cnt.host, n_saved, med_gap
FROM cnt JOIN med ON med.host = cnt.host
ORDER BY cnt.host
"""


_CRAWL_ORACLE_TEMPLATES["crawl_host_gap_stats"] = \
    _host_gap_oracle_template()


def crawl_host_gap_stats(sf_dir: str):
    """(host, n_saved, med_gap): per-host politeness-cadence audit —
    the median virtual-time gap between a host's consecutive SAVED
    fetches (in (ts, seq) order), plus its saved count; hosts with a
    single save have no gap and are absent. Verifies the politeness
    invariant end-to-end from the attempts log itself: a host's median
    gap must track its crawl delay. Scale shape: ONE shuffle keyed by
    coarse host-hash bucket; inside each bucket the lag-diff is a
    shifted-array subtraction over the (host, ts, seq)-sorted frame and
    the median one pandas grouped reduction (even counts average the
    two middles — the identical two-double (a+b)/2 in both engines)."""
    import numpy as np
    import pyarrow as pa
    import pandas as pd

    from ..functions.urls import stable_hash64_batch
    from ..stages.aggregates import buckets_for
    from ..state.politeness import STATUS_SAVED

    c = _crawl_workdir(sf_dir)
    ds = c.attempts_dataset().map_batches(
        lambda t: t.select(["host", "ts", "seq", "status"]),
        batch_format="pyarrow")

    def saved_only(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        t = t.filter(pc.equal(t.column("status"),
                              pa.scalar(STATUS_SAVED, pa.int16())))
        return t.select(["host", "ts", "seq"])

    ds = ds.map_batches(saved_only, batch_format="pyarrow")
    from ..io_utils import parquet_num_rows

    n_att = sum(parquet_num_rows(d) for d in c._round_subdirs("attempts"))
    N_BUCKETS = buckets_for(max(1, n_att))

    def add_bucket(t: pa.Table) -> pa.Table:
        h = stable_hash64_batch(t.column("host").to_pylist())
        return t.append_column(
            "hbucket", pa.array((h % N_BUCKETS).astype(np.int64),
                                pa.int64()))

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({
            "host": pd.Series([], dtype=str),
            "n_saved": pd.Series([], dtype="int64"),
            "med_gap": pd.Series([], dtype="float64")})
        if len(g) == 0:
            return empty
        g = g.sort_values(["host", "ts", "seq"], kind="mergesort")
        host = g["host"].to_numpy()
        ts = g["ts"].to_numpy()
        same = np.r_[False, host[1:] == host[:-1]]
        gap = np.r_[0.0, ts[1:] - ts[:-1]]
        cnt = (pd.DataFrame({"host": host})
               .groupby("host", as_index=False).size()
               .rename(columns={"size": "n_saved"}))
        df = pd.DataFrame({"host": host[same], "gap": gap[same]})
        if len(df) == 0:
            return empty
        med = (df.groupby("host", as_index=False)["gap"].median()
                 .rename(columns={"gap": "med_gap"}))
        out = cnt.merge(med, on="host", how="inner")
        return pd.DataFrame({
            "host": out["host"].astype(str),
            "n_saved": out["n_saved"].astype("int64"),
            "med_gap": out["med_gap"].astype("float64")})

    return (ds.map_batches(add_bucket, batch_format="pyarrow")
              .groupby("hbucket").map_groups(per_bucket,
                                             batch_format="pandas")
              .sort("host"))


def _phash_dump_kw(sf_dir: str) -> tuple[str, str]:
    from . import multimodal as _mm

    return _mm.phash_dump_paths(sf_dir)


def _sf_dump_kwargs(sf_dir: str) -> dict[str, str]:
    """All per-scale dump paths the dump-bound oracle templates can
    reference (crawl dumps + the ANN/phash recall dumps)."""
    from . import similarity as _sim

    edges_dump, nodes_dump = _graph_dump_paths(sf_dir)
    return dict(dump=_attempts_dump_path(sf_dir),
                edges_dump=edges_dump, nodes_dump=nodes_dump,
                corpus_dump=_corpus_dump_path(sf_dir),
                anchor_dump=_anchor_dump_path(sf_dir),
                web_pages=os.path.join(corpus_cache_dir(sf_dir),
                                       "web", "pages.parquet"),
                web_robots=os.path.join(corpus_cache_dir(sf_dir),
                                        "web", "robots.parquet"),
                knn_ivf_dump=_sim.knn_pairs_dump_path(sf_dir, "ivf"),
                knn_lsh_dump=_sim.knn_pairs_dump_path(sf_dir, "lsh"),
                knn_pq_dump=_sim.knn_pairs_dump_path(sf_dir, "pq"),
                warc_manifest=_archive_manifest_path(sf_dir, "warc"),
                wet_manifest=_archive_manifest_path(sf_dir, "wet"),
                wat_manifest=_archive_manifest_path(sf_dir, "wat"),
                phash_hash_dump=_phash_dump_kw(sf_dir)[0],
                phash_pairs_dump=_phash_dump_kw(sf_dir)[1])


def oracle_sql_for(sf_dir: str) -> dict[str, str]:
    """The full oracle dict with the dump-bound oracles (crawl + ANN
    recall audits) bound to ``sf_dir``'s dumps (the other oracles are
    scale-independent: they read the pre-registered table views)."""
    out = dict(ORACLE_SQL)
    kwargs = _sf_dump_kwargs(sf_dir)
    for name, tmpl in _CRAWL_ORACLE_TEMPLATES.items():
        out[name] = tmpl.format(**kwargs)
    return out


ORACLE_SQL: dict[str, str] = {
    "doc_token_counts": f"""
SELECT doc_id,
       CASE WHEN {textpipe.SQL_TRIM_TEXT} = '' THEN 0
            ELSE CAST(len(regexp_split_to_array({textpipe.SQL_TRIM_TEXT},
                 '{textpipe.SQL_WS_CLASS}+')) AS BIGINT)
       END AS n_tokens
FROM documents ORDER BY doc_id
""",
    "doc_first20": f"""
SELECT doc_id,
       array_to_string(regexp_split_to_array({textpipe.SQL_TRIM_TEXT},
           '{textpipe.SQL_WS_CLASS}+')[1:20], ' ') AS first20
FROM documents ORDER BY doc_id
""",
    "doc_lang_counts": """
SELECT lang, COUNT(*) AS n_docs FROM documents GROUP BY lang ORDER BY lang
""",
    "doc_quality": f"""
SELECT doc_id,
       CAST(length(text) AS BIGINT) AS n_chars2,
       CAST(length(text) - length(regexp_replace(text, '[A-Za-z]', '', 'g')) AS BIGINT) AS n_alpha,
       CAST(length(text) - length(regexp_replace(text, '[0-9]', '', 'g')) AS BIGINT) AS n_digit,
       CAST(length(text) - length(replace(text, ' ', '')) AS BIGINT) AS n_space,
       CASE WHEN {textpipe.SQL_TRIM_TEXT} = '' THEN 0
            ELSE CAST(len(regexp_split_to_array({textpipe.SQL_TRIM_TEXT},
                 '{textpipe.SQL_WS_CLASS}+')) AS BIGINT)
       END AS n_tokens2
FROM documents ORDER BY doc_id
""",
    "doc_fingerprint": f"""
SELECT doc_id, md5(LOWER({textpipe.SQL_TRIM_TEXT})) AS fp
FROM documents ORDER BY doc_id
""",
    "q1_pricing_summary": relational.Q1_SQL,
    "revenue_by_nation": relational.REVENUE_BY_NATION_SQL,
    "events_topk_users": relational.EVENTS_TOPK_SQL,
    "docs_topk_longest": relational.DOCS_TOPK_SQL,
    "dedup_filtered_corpus": None,  # filled below (module import order)
    "dedup_exact": f"""
SELECT MIN(doc_id) AS doc_id, COUNT(*) AS n_dups
FROM documents GROUP BY md5(LOWER({textpipe.SQL_TRIM_TEXT})) ORDER BY doc_id
""",
    "dedup_edit_distance": """
SELECT a.doc_id AS doc_id_a, b.doc_id AS doc_id_b,
       CAST(levenshtein(a.text, b.text) AS BIGINT) AS dist
FROM documents a JOIN documents b ON a.doc_id < b.doc_id
WHERE abs(a.n_chars - b.n_chars) <= 20
  AND levenshtein(a.text, b.text) <= 20
ORDER BY doc_id_a, doc_id_b
""",
    "dedup_embedding_cosine": """
SELECT a.vec_id AS vec_id_a, b.vec_id AS vec_id_b
FROM embeddings a JOIN embeddings b ON b.vec_id > a.vec_id
WHERE list_cosine_similarity(a.embedding, b.embedding) >= 0.45
ORDER BY vec_id_a, vec_id_b
""",
    "knn_cosine": None,  # filled below (module constant)
    "top_customers": relational.TOP_CUSTOMERS_SQL,
    "events_by_type": relational.EVENTS_BY_TYPE_SQL,
    "events_windowed": relational.EVENTS_WINDOWED_SQL,
    "events_windowed_late": relational.EVENTS_WINDOWED_LATE_SQL,
    "events_grouping_sets": relational.EVENTS_GROUPING_SETS_SQL,
    "events_value_winsorized": relational.EVENTS_WINSORIZED_SQL,
    "events_hopping": relational.EVENTS_HOPPING_SQL,
    "events_windowed_incremental": relational.EVENTS_WINDOWED_SQL,
    "events_user_topk": relational.EVENTS_USER_TOPK_SQL,
    "events_value_percentiles": relational.EVENTS_PERCENTILES_SQL,
    "customers_no_events": relational.CUSTOMERS_NO_EVENTS_SQL,
    "events_semijoin_bloom": relational.EVENTS_SEMIJOIN_BLOOM_SQL,
    "orders_reorder_window": relational.ORDERS_REORDER_SQL,
    "events_sessionize": relational.SESSIONIZE_SQL,
    "events_asof_order": relational.EVENTS_ASOF_SQL,
    "events_running_index": relational.EVENTS_RUNNING_INDEX_SQL,
    "events_user_value_delta": relational.EVENTS_USER_DELTA_SQL,
    "events_type_transitions": relational.EVENTS_TYPE_TRANSITIONS_SQL,
    "events_moving_sum": relational.EVENTS_MOVING_SUM_SQL,
    "events_ewm_sum": relational.EVENTS_EWM_SUM_SQL,
    "events_max_concurrency": relational.EVENTS_MAX_CONCURRENCY_SQL,
    "events_changepoint": relational.EVENTS_CHANGEPOINT_SQL,
    "events_trailing_sum": relational.EVENTS_TRAILING_SUM_SQL,
    "events_bounce_rate": relational.EVENTS_BOUNCE_SQL,
    "events_gap_histogram": relational.EVENTS_GAP_HISTOGRAM_SQL,
    "events_active_time": relational.EVENTS_ACTIVE_TIME_SQL,
    "docs_hapax_ratio": textpipe.DOCS_HAPAX_SQL,
    "docs_vocab_coverage": textpipe.DOCS_VOCAB_COVERAGE_SQL,
    "orders_backlog_series": relational.ORDERS_BACKLOG_SQL,
    "events_attribution_window": relational.EVENTS_ATTRIB_SQL,
    "events_profile": profile.EVENTS_PROFILE_SQL,
    "docs_split": textpipe.DOCS_SPLIT_SQL,
    "docs_csv_roundtrip": textpipe.DOCS_CSV_ROUNDTRIP_SQL,
    "docs_feature_hash": textpipe.DOCS_FEATURE_HASH_SQL,
    "docs_logreg_score": textpipe.DOCS_LOGREG_SCORE_SQL,
    "revenue_cube": relational.REVENUE_CUBE_SQL,
    "events_dedup_daily": relational.EVENTS_DEDUP_DAILY_SQL,
    "events_zorder": relational.EVENTS_ZORDER_SQL,
    "events_props_extract": relational.EVENTS_PROPS_SQL,
    "events_range_sum": relational.EVENTS_RANGE_SUM_SQL,
    "users_orders_full": relational.USERS_ORDERS_FULL_SQL,
    "events_type_iqr_outliers": relational.EVENTS_IQR_OUTLIERS_SQL,
    "events_value_props_corr": relational.EVENTS_VALUE_PROPS_CORR_SQL,
    "lineitem_q6": relational.LINEITEM_Q6_SQL,
    "q3_shipping_priority": relational.Q3_SQL,
    "q14_promo_revenue": relational.Q14_SQL,
    "events_dow_hour_heatmap": relational.EVENTS_DOW_HOUR_SQL,
    "orders_priority_exists": relational.Q4_EXISTS_SQL,
    "events_type_stats": relational.EVENTS_TYPE_STATS_SQL,
    "events_type_pairs": relational.EVENTS_TYPE_PAIRS_SQL,
    "events_funnel": relational.EVENTS_FUNNEL_SQL,
    "events_latest": relational.EVENTS_LATEST_SQL,
    "orders_scd2": relational.ORDERS_SCD2_SQL,
    "events_cdc_merge": relational.EVENTS_CDC_MERGE_SQL,
    "events_windowed_distinct": relational.EVENTS_WINDOWED_DISTINCT_SQL,
    "customer_order_counts": relational.CUSTOMER_ORDER_COUNTS_SQL,
    "orders_monthly_series": relational.ORDERS_MONTHLY_SQL,
    "q5_local_supplier_volume": relational.Q5_SQL,
    "q10_returned_revenue": relational.Q10_SQL,
    "q12_priority_lines": relational.Q12_SQL,
    "q14_promo_revenue": relational.Q14_SQL,
    "q18_large_orders": relational.Q18_SQL,
    "q19_disjunct_revenue": relational.Q19_SQL,
    "fk_integrity": relational.FK_INTEGRITY_SQL,
    "events_percent_rank": relational.EVENTS_PERCENT_RANK_SQL,
    "events_moving_median": relational.EVENTS_MOVING_MEDIAN_SQL,
    "customers_pareto_cut": relational.CUSTOMERS_PARETO_SQL,
    "orders_order_streaks": relational.ORDERS_STREAKS_SQL,
    "orders_median_gap": relational.ORDERS_MEDIAN_GAP_SQL,
    "events_value_ranks": relational.EVENTS_VALUE_RANKS_SQL,
    "lineitem_qty_mode": relational.LINEITEM_QTY_MODE_SQL,
    "q9_product_profit": relational.Q9_PRODUCT_PROFIT_SQL,
    "q22_sales_opportunity": relational.Q22_SALES_OPPORTUNITY_SQL,
    "q7_volume_shipping": relational.Q7_SQL,
    "q8_market_share": relational.Q8_SQL,
    "q11_important_parts": relational.Q11_SQL,
    "q15_top_supplier": relational.Q15_SQL,
    "q16_supplier_part_counts": relational.Q16_SQL,
    "q17_small_qty_revenue": relational.Q17_SQL,
    "events_type_mad": relational.EVENTS_TYPE_MAD_SQL,
    "docs_skipgram_counts": textpipe.DOCS_SKIPGRAM_SQL,
    "q21_waiting_suppliers": relational.Q21_SQL,
    "q2_min_cost_supplier": relational.Q2_SQL,
    "q13_customer_distribution": relational.Q13_SQL,
    "q20_excess_suppliers": relational.Q20_SQL,
    "events_pairs_intersect": relational.EVENTS_PAIRS_INTERSECT_SQL,
    "events_pairs_except": relational.EVENTS_PAIRS_EXCEPT_SQL,
    "events_value_percentile_cont": relational.EVENTS_PCONT_SQL,
    "events_type_percentile_cont": relational.EVENTS_TYPE_PCONT_SQL,
    "events_asof_next_purchase":
        relational.EVENTS_ASOF_NEXT_PURCHASE_SQL,
    "events_value_share": relational.EVENTS_VALUE_SHARE_SQL,
    "customers_revenue_deciles":
        relational.CUSTOMERS_REVENUE_DECILES_SQL,
    "events_user_orders": relational.EVENTS_USER_ORDERS_SQL,
    "events_type_regression": relational.EVENTS_TYPE_REGRESSION_SQL,
    "events_cohort_matrix": relational.EVENTS_COHORT_MATRIX_SQL,
    "events_daily_interpolated":
        relational.EVENTS_DAILY_INTERPOLATED_SQL,
    "events_above_user_mean": relational.EVENTS_ABOVE_USER_MEAN_SQL,
    "events_day_bitmaps": relational.EVENTS_DAY_BITMAPS_SQL,
    "orders_rfm_segments": relational.ORDERS_RFM_SQL,
    "events_time_travel": relational.EVENTS_TIME_TRAVEL_SQL,
    "events_pattern_match": relational.EVENTS_PATTERN_MATCH_SQL,
    "events_running_distinct":
        relational.EVENTS_RUNNING_DISTINCT_SQL,
    "events_upsert": relational.EVENTS_UPSERT_SQL,
    "lineitem_copurchase": relational.LINEITEM_COPURCHASE_SQL,
    "events_conversion_lag": relational.EVENTS_CONVERSION_LAG_SQL,
    "events_windowed_topk": relational.EVENTS_WINDOWED_TOPK_SQL,
    "orders_segment_revenue": relational.ORDERS_SEGMENT_REVENUE_SQL,
    "customers_gini": relational.CUSTOMERS_GINI_SQL,
    "events_snapshot_diff": relational.EVENTS_SNAPSHOT_DIFF_SQL,
    "events_dp_counts": relational.EVENTS_DP_COUNTS_SQL,
    "events_mv_incremental": relational.EVENTS_MV_INCREMENTAL_SQL,
    "events_wow_growth": relational.EVENTS_WOW_GROWTH_SQL,
    "docs_k_anonymity": relational.DOCS_K_ANONYMITY_SQL,
    "doc_cms_counts": sketches.DOC_CMS_COUNTS_SQL,
    "events_hll_registers": sketches.EVENTS_HLL_REGISTERS_SQL,
    "events_kmv_bottomk": sketches.EVENTS_KMV_SQL,
    "events_unpivot": relational.EVENTS_UNPIVOT_SQL,
    "part_min_supplier": relational.PART_MIN_SUPPLIER_SQL,
    "revenue_rollup": relational.REVENUE_ROLLUP_SQL,
    "events_daily_stats": relational.EVENTS_DAILY_SQL,
    "events_by_segment": relational.EVENTS_BY_SEGMENT_SQL,
    "docs_dup_ngrams": textpipe.DOCS_DUP_NGRAMS_SQL,
    "docs_ngram_novelty": textpipe.DOCS_NGRAM_NOVELTY_SQL,
    "docs_readability": textpipe.DOCS_READABILITY_SQL,
    "docs_gopher_filter": textpipe.DOCS_GOPHER_SQL,
    "docs_freq_spectrum": textpipe.DOCS_FREQ_SPECTRUM_SQL,
    "docs_chunks": textpipe.DOCS_CHUNKS_SQL,
    "docs_orc_roundtrip": textpipe.DOCS_ORC_ROUNDTRIP_SQL,
    "docs_tfrecord_roundtrip": textpipe.DOCS_TFRECORD_ROUNDTRIP_SQL,
    "docs_avro_roundtrip": textpipe.DOCS_AVRO_ROUNDTRIP_SQL,
    "docs_ipc_roundtrip": textpipe.DOCS_IPC_ROUNDTRIP_SQL,
    "docs_schema_evolution": textpipe.DOCS_SCHEMA_EVOLUTION_SQL,
    "docs_kfold": textpipe.DOCS_KFOLD_SQL,
    "docs_boolean_search": textpipe.DOCS_BOOLEAN_SEARCH_SQL,
    "catalog_tables": textpipe.CATALOG_TABLES_SQL,
    "docs_rendezvous_shards": textpipe.DOCS_RENDEZVOUS_SQL,
    "sources_token_jaccard": textpipe.SOURCES_TOKEN_JACCARD_SQL,
    "sources_ttr": textpipe.SOURCES_TTR_SQL,
    "docs_contamination": textpipe.DOCS_CONTAMINATION_SQL,
    "docs_length_histogram": textpipe.DOCS_LENGTH_HISTOGRAM_SQL,
    "docs_range_partition": textpipe.DOCS_RANGE_PARTITION_SQL,
    "doc_tfidf_top": textpipe.DOC_TFIDF_SQL,
    "docs_bm25_topk": textpipe.DOCS_BM25_SQL,
    "docs_rrf_fusion": textpipe.DOCS_RRF_FUSION_SQL,
    "docs_vocab_encode": textpipe.DOCS_VOCAB_ENCODE_SQL,
    "docs_bigram_lm_score": textpipe.DOCS_BIGRAM_LM_SQL,
    "docs_pack_sequences": textpipe.DOCS_PACK_SQL,
    "docs_pii_scrub": textpipe.DOCS_PII_SCRUB_SQL,
    "docs_repetition": textpipe.DOCS_REPETITION_SQL,
    "docs_inverted_index": textpipe.DOCS_INVERTED_INDEX_SQL,
    "docs_greedy_cover": textpipe.DOCS_GREEDY_COVER_SQL,
    "docs_boilerplate": textpipe.DOCS_BOILERPLATE_SQL,
    "events_user_diversity": relational.EVENTS_USER_DIVERSITY_SQL,
    "docs_lm_score": textpipe.DOCS_LM_SCORE_SQL,
    "docs_dsir_weights": textpipe.DOCS_DSIR_SQL,
    "docs_dsir_resample": textpipe.DOCS_DSIR_RESAMPLE_SQL,
    "docs_mix_rebalance": textpipe.DOCS_MIX_REBALANCE_SQL,
    "docs_shuffle_seeded": textpipe.DOCS_SHUFFLE_SQL,
    "corpus_curation": textpipe.CORPUS_CURATION_SQL,
    "events_type_median": relational.EVENTS_TYPE_MEDIAN_SQL,
    "events_pivot": relational.EVENTS_PIVOT_SQL,
    "events_user_profile": relational.EVENTS_USER_PROFILE_SQL,
    "users_retained": relational.USERS_RETAINED_SQL,
    "doc_langid": _langid_sql(),
    "docs_langid_mix": _langid_mix_sql(),
    "order_line_stats": relational.ORDER_LINE_STATS_SQL,
    "events_value_ntile": relational.EVENTS_NTILE_SQL,
    "docs_sample": textpipe.DOCS_SAMPLE_SQL,
    "docs_sample_bottomk": textpipe.DOCS_SAMPLE_BOTTOMK_SQL,
    "docs_weighted_sample": textpipe.DOCS_WEIGHTED_SAMPLE_SQL,
    "docs_per_source_cap": textpipe.DOCS_PER_SOURCE_CAP_SQL,
    "doc_normalize": textpipe.DOC_NORMALIZE_SQL,
    "doc_top_terms": textpipe.DOC_TOP_TERMS_SQL,
    "doc_token_counts_bpe": textpipe.TOKEN_COUNTS_BPE_SQL,
    "docs_quality_filter": textpipe.QUALITY_FILTER_SQL,
    "multimodal_meta": MULTIMODAL_META_SQL,
    "frames_meta": FRAMES_META_SQL,
    "audio_meta": None,  # filled below
}

try:
    from . import similarity as _sim

    ORACLE_SQL["knn_cosine"] = _sim.KNN_SQL
    ORACLE_SQL["emb_label_sums"] = _sim.EMB_LABEL_SUMS_SQL
    ORACLE_SQL["cluster_embedding_cosine"] = _sim.CLUSTER_COSINE_SQL
    ORACLE_SQL["emb_gram_matrix"] = _sim.EMB_GRAM_SQL
    ORACLE_SQL["emb_quantize"] = _sim.EMB_QUANTIZE_SQL
    ORACLE_SQL["emb_qnorm_hist"] = _sim.EMB_QNORM_HIST_SQL
    ORACLE_SQL["knn_cosine_q8"] = _sim.KNN_Q8_SQL
    ORACLE_SQL["knn_mips"] = _sim.KNN_MIPS_SQL
    ORACLE_SQL["knn_cosine_filtered"] = _sim.KNN_FILTERED_SQL
    ORACLE_SQL["knn_mmr"] = _sim.KNN_MMR_SQL

    from . import multimodal as _mm

    ORACLE_SQL["audio_meta"] = _mm.AUDIO_META_SQL
    ORACLE_SQL["multimodal_scene_cuts"] = _mm.SCENE_CUTS_SQL
except ImportError:
    ORACLE_SQL.pop("knn_cosine", None)

try:
    from . import dedup as _dedup

    ORACLE_SQL["dedup_filtered_corpus"] = _dedup.DEDUP_FILTERED_SQL
    ORACLE_SQL["dedup_incremental"] = _dedup.DEDUP_INCREMENTAL_SQL

    # bit-exact integer replication of the MinHash/LSH/SimHash/winnow
    # kernels straight from the documents view (md5 token hashing is
    # DuckDB's md5_number_upper; the rest is mod-2^64 arithmetic) — no
    # dump boundary, see dedup_oracle.py
    from . import dedup_oracle as _dor

    ORACLE_SQL["dedup_minhash_lsh"] = _materialize_ctes(
        _dor.minhash_lsh_sql())
    ORACLE_SQL["dedup_ngram_jaccard"] = _materialize_ctes(
        _dor.ngram_jaccard_sql())
    ORACLE_SQL["dedup_jaccard_join"] = _materialize_ctes(
        _dor.jaccard_join_sql())
    ORACLE_SQL["dedup_containment_join"] = _materialize_ctes(
        _dor.containment_join_sql())
    ORACLE_SQL["dedup_lsh_recall"] = _materialize_ctes(
        _dor.lsh_recall_sql())
    # the recursive closure re-evaluates every CTE it references, so the
    # whole minhash chain must be MATERIALIZED (199 s -> 16 s measured at
    # sf0.01); only the self-referencing `lab` must stay plain
    ORACLE_SQL["dedup_clusters"] = _materialize_ctes(
        _dor.clusters_sql()).replace("lab AS MATERIALIZED (", "lab AS (")
    ORACLE_SQL["dedup_keep_best"] = _materialize_ctes(
        _dor.keep_best_sql()).replace("lab AS MATERIALIZED (", "lab AS (")
    ORACLE_SQL["dedup_rate_by_source"] = _materialize_ctes(
        _dor.rate_by_source_sql())
    ORACLE_SQL["dedup_simhash"] = _materialize_ctes(_dor.simhash_sql())
    ORACLE_SQL["doc_winnow"] = _materialize_ctes(_dor.winnow_sql())
    from .textpipe import (
        WINNOW_PAIR_MAX_DF as _wdf,
        WINNOW_PAIR_MIN_SHARED as _wms,
    )

    ORACLE_SQL["docs_winnow_pairs"] = _materialize_ctes(
        _dor.winnow_pairs_sql(min_shared=_wms, max_df=_wdf))
    from .textpipe import DUP_SPAN_K as _dsk

    ORACLE_SQL["docs_dup_spans"] = _materialize_ctes(
        _dor.dup_spans_sql(k=_dsk))
except ImportError:
    ORACLE_SQL.pop("dedup_filtered_corpus", None)

try:
    from . import sketches as _sk

    ORACLE_SQL["events_distinct_users_exact"] = \
        _sk.EVENTS_DISTINCT_EXACT_SQL
except ImportError:
    pass


def crawl_round_stats(sf_dir: str):
    """(round, n_attempted, n_saved): per-round crawl progress — the
    driver-metrics view as a distributed aggregate over the attempts
    log, SQL-checked against the dump."""
    import pyarrow as pa
    from ray.data.aggregate import Count, Sum

    from ..state.politeness import STATUS_SAVED

    c = _crawl_workdir(sf_dir)

    def flag(t: pa.Table) -> pa.Table:
        import numpy as np

        s = t.column("status").to_numpy(zero_copy_only=False)
        return pa.table({
            "round": t.column("round").cast(pa.int64()),
            "saved": pa.array((s == STATUS_SAVED).astype(np.int64),
                              pa.int64())})

    return (c.attempts_dataset()
             .map_batches(lambda t: t.select(["round", "status"]),
                          batch_format="pyarrow")
             .map_batches(flag, batch_format="pyarrow")
             .groupby("round")
             .aggregate(Count(alias_name="n_attempted"),
                        Sum("saved", alias_name="n_saved"))
             .sort("round"))


# driver contract: the external driver runs oracles at sf0.01, so the
# module-level dict carries the dump-bound oracles (crawl + ANN recall)
# pinned to that scale; any other scale goes through oracle_sql_for()
_DRIVER_KWARGS = _sf_dump_kwargs("/root/testdata/sf0.01")
for _name, _tmpl in _CRAWL_ORACLE_TEMPLATES.items():
    ORACLE_SQL[_name] = _tmpl.format(**_DRIVER_KWARGS)
