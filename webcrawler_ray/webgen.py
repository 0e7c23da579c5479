"""Deterministic synthetic web generator (FIXTURES.md §1-3, §5).

Produces, fully seeded (no wall clock, no network):

* ``pages.parquet``  — the simulated web, schema fixed by BASELINE.json
  input_hint: (url:string, warc_ts:timestamp[us], html:binary, text:string,
  lang:string). ``text`` is the GOLDEN visible text for the html, produced
  by the shared extractor (`webcrawler_ray.functions.htmlparse`) — the
  byte-identical invariant compares pipeline output against this column.
  ``lang`` doubles as the content-type stand-in: rows with lang in
  HTML_LANGS are ``text/html``; decoy rows get lang="octet".
* ``robots.parquet`` — (host, disallow:list<string>, crawl_delay:double?,
  fetchable:bool) per FIXTURES.md §3.
* ``seeds.txt``      — seed URLs, one per line (hub page, zero-outlink
  page, one URL absent from pages == fetch-miss), mirroring the reference
  seeds file shape (`/root/reference/seeds.txt`, report §3.1).

Graph knobs (seeded): H hosts x P pages, host 0 is a ~10x "mega host"
(skew testing); out-degree 0..max_deg; ~30% cross-host edges; dead links;
cycles / diamonds arise naturally from random targets; edge-case hrefs
exercising `Parser.py:26-46` + `Worker.py:13-30` are injected verbatim.
"""

from __future__ import annotations

import os
import random

import pyarrow as pa
import pyarrow.parquet as pq

from .functions.htmlparse import extract_visible_text

HTML_LANGS = ("en", "pt")
WARC_TS_BASE_US = 1_650_000_000_000_000  # fixed epoch base (us)

_VOCAB = (
    "data web page crawl link index text word host frontier queue fetch "
    "parse robot delay host politeness graph node edge corpus token "
    "search rank score batch arrow block shard round seed depth"
).split()

# Edge-case hrefs injected verbatim (FIXTURES.md §1); each exercises one
# branch of the fixup/blocklist rules.
_EDGE_HREFS = (
    "#frag-only",            # dropped: fragment-only
    "rel/path.html",         # dropped: relative without leading /
    "mailto:a@b.test",       # dropped
    "javascript:void(0)",    # dropped
    "/files/report.pdf",     # blocklisted extension (3-char)
    "/files/photo.jpeg",     # blocklisted extension (4-char)
)


def _robots_rules(rng: random.Random) -> tuple[list[str], list[str]]:
    """Seeded (disallow, allow) rule lists for one host — mixes plain
    prefixes with RFC 9309 Allow carve-outs and ``*``/``$`` wildcards so
    the longest-match matcher is exercised by every corpus."""
    dis: list[str] = []
    al: list[str] = []
    if rng.random() < 0.3:
        sec = rng.choice([1, 2])
        dis.append(f"/s{sec}/")
        if rng.random() < 0.5:
            # Allow carve-out: longer pattern -> overrides the section ban
            al.append(f"/s{sec}/p1")
    if rng.random() < 0.1:
        dis.append("/admin/")
    if rng.random() < 0.15:
        dis.append("/*5$")  # wildcard+anchor: any path ending in 5
    if rng.random() < 0.1:
        al.append("/s*/p2")  # wildcard Allow across sections
    return dis, al


def _page_url(host: str, sec: int, j: int) -> str:
    if sec == 0:
        return f"https://{host}/p{j}"
    return f"https://{host}/s{sec}/p{j}"


class WebSpec:
    """Seeded spec for one synthetic web; all layout decided up front."""

    def __init__(self, n_hosts: int = 5, pages_per_host: int = 20,
                 seed: int = 42, max_outdegree: int = 12,
                 cross_host_frac: float = 0.3, dead_link_frac: float = 0.05,
                 mega_factor: int = 10, n_decoys: int = 3,
                 n_seeds: int = 3, text_words: int = 60,
                 parallel: bool = False, vocab_size: int = 0):
        self.n_hosts = n_hosts
        self.pages_per_host = pages_per_host
        self.seed = seed
        self.max_outdegree = max_outdegree
        self.cross_host_frac = cross_host_frac
        self.dead_link_frac = dead_link_frac
        self.mega_factor = mega_factor
        self.n_decoys = n_decoys
        self.n_seeds = n_seeds
        self.text_words = text_words
        # parallel=True: generate pages with Ray (per-page seeded rngs, a
        # large synthetic vocabulary, output = DIRECTORY of parquet files).
        # A different deterministic corpus from the sequential path — the
        # mode is part of the cache signature.
        self.parallel = parallel
        self.vocab_size = vocab_size  # 0 -> the small builtin vocab

    def hosts(self) -> list[str]:
        return [f"host{i}.test" for i in range(self.n_hosts)]

    def host_page_counts(self) -> list[int]:
        # host 0 is the mega host (skew testing)
        return [self.pages_per_host * (self.mega_factor if i == 0 else 1)
                for i in range(self.n_hosts)]


def generate_web(out_dir: str, spec: WebSpec | None = None, **kw) -> dict:
    """Generate pages/robots/seeds under ``out_dir``. Returns metadata.

    Idempotent: if ``out_dir/_WEBGEN_DONE`` exists with the same spec
    signature, generation is skipped (cache for bench runs).
    """
    spec = spec or WebSpec(**kw)
    sig = (f"v4:{spec.n_hosts}:{spec.pages_per_host}:{spec.seed}:"
           f"{spec.max_outdegree}:{spec.cross_host_frac}:{spec.dead_link_frac}:"
           f"{spec.mega_factor}:{spec.n_decoys}:{spec.n_seeds}:{spec.text_words}"
           f":{int(spec.parallel)}:{spec.vocab_size}")
    done = os.path.join(out_dir, "_WEBGEN_DONE")
    meta = {
        "pages": os.path.join(out_dir,
                              "pages" if spec.parallel else "pages.parquet"),
        "robots": os.path.join(out_dir, "robots.parquet"),
        "seeds": os.path.join(out_dir, "seeds.txt"),
        "sig": sig,
    }
    if os.path.exists(done):
        with open(done) as f:
            if f.read().strip() == sig:
                return meta
    # stale or fresh generation: wipe every artifact derived from the old
    # corpus (pages file/dir, the bucketed pages store, robots, seeds) —
    # parallel page writes use fresh file names, so leftovers from an
    # older corpus would otherwise survive inside the pages directory
    import shutil as _sh

    for p in (meta["pages"], meta["pages"] + "_store", meta["robots"],
              meta["seeds"], done):
        if os.path.isdir(p):
            _sh.rmtree(p, ignore_errors=True)
        elif os.path.exists(p):
            os.remove(p)
    os.makedirs(out_dir, exist_ok=True)
    if spec.parallel:
        _generate_parallel(out_dir, spec, meta)
        with open(done, "w") as f:
            f.write(sig)
        return meta

    rng = random.Random(spec.seed)
    hosts = spec.hosts()
    counts = spec.host_page_counts()

    # --- URL universe ----------------------------------------------------
    urls_by_host: dict[str, list[str]] = {}
    all_urls: list[str] = []
    for h, n in zip(hosts, counts):
        us = []
        for j in range(n):
            sec = rng.choice([0, 0, 0, 1, 2])  # some nested sections
            us.append(_page_url(h, sec, j))
        urls_by_host[h] = us
        all_urls.extend(us)

    # --- robots ----------------------------------------------------------
    r_hosts, r_dis, r_al, r_cd, r_fe = [], [], [], [], []
    for i, h in enumerate(hosts):
        hws = f"https://{h}"
        dis, al = _robots_rules(rng)
        cd = rng.choice([None, None, None, 0.05, 0.5, 2.0, 5.0])
        fe = rng.random() > 0.1  # ~10% robots-unreachable
        r_hosts.append(hws)
        r_dis.append(dis)
        r_al.append(al)
        r_cd.append(cd)
        r_fe.append(fe)
    robots_tbl = pa.table({
        "host": pa.array(r_hosts, pa.string()),
        "disallow": pa.array(r_dis, pa.list_(pa.string())),
        "allow": pa.array(r_al, pa.list_(pa.string())),
        "crawl_delay": pa.array(r_cd, pa.float64()),
        "fetchable": pa.array(r_fe, pa.bool_()),
    })
    pq.write_table(robots_tbl, meta["robots"])

    # --- pages -----------------------------------------------------------
    def rand_words(n: int) -> str:
        return " ".join(rng.choice(_VOCAB) for _ in range(n))

    p_url, p_ts, p_html, p_text, p_lang = [], [], [], [], []
    row_idx = 0
    for hi, h in enumerate(hosts):
        my_urls = urls_by_host[h]
        for j, url in enumerate(my_urls):
            deg = rng.randint(0, spec.max_outdegree)
            hrefs: list[str] = []
            for _ in range(deg):
                r = rng.random()
                if r < spec.dead_link_frac:
                    hrefs.append(f"/dead/p{rng.randint(0, 10_000)}")
                elif r < spec.dead_link_frac + spec.cross_host_frac:
                    th = hosts[rng.randrange(len(hosts))]
                    tu = urls_by_host[th][rng.randrange(len(urls_by_host[th]))]
                    if rng.random() < 0.25:
                        tu = "http" + tu[5:]  # http:// variant -> coerced
                    hrefs.append(tu)
                else:
                    tu = my_urls[rng.randrange(len(my_urls))]
                    kind = rng.random()
                    if kind < 0.5:
                        hrefs.append("/" + tu.split("/", 3)[3])  # relative-abs
                    elif kind < 0.6:
                        hrefs.append(tu + "#sec" + str(rng.randint(0, 5)))
                    else:
                        hrefs.append(tu)
            if rng.random() < 0.15:
                hrefs.append(rng.choice(_EDGE_HREFS))
            if rng.random() < 0.05 and hrefs:
                hrefs.append(hrefs[0])  # duplicate href (per-page set dedup)

            title = f"Page {j} of {h} " + rng.choice(_VOCAB)
            paras = []
            for pi in range(rng.randint(1, 3)):
                body_words = rand_words(spec.text_words // 2)
                para = f"<p>{body_words}"
                for k, href in enumerate(hrefs[pi::3]):
                    para += f' <a href="{href}">anchor {rng.choice(_VOCAB)}</a> '
                    para += rand_words(3)
                para += "</p>"
                paras.append(para)
            html = (
                "<!DOCTYPE html>\n<html><head><title>" + title + "</title>\n"
                '<meta charset="utf-8">\n'
                "<style>body { color: #222; }</style>\n"
                "<script>var x = 1; // not visible</script>\n"
                "</head>\n<body>\n<h1>" + title + "</h1>\n"
                "<!-- hidden comment -->\n" + "\n".join(paras)
                + "\n<div><b>" + rand_words(4) + "</b> tail</div>\n"
                "</body></html>\n"
            )
            html_b = html.encode("utf-8")
            p_url.append(url)
            p_ts.append(WARC_TS_BASE_US + row_idx * 1_000_000)
            p_html.append(html_b)
            p_text.append(extract_visible_text(html_b))
            p_lang.append(HTML_LANGS[rng.randrange(len(HTML_LANGS))])
            row_idx += 1

    # non-HTML decoys: real rows, wrong content type (lang="octet")
    for d in range(spec.n_decoys):
        h = hosts[rng.randrange(len(hosts))]
        url = f"https://{h}/bin/blob{d}"
        p_url.append(url)
        p_ts.append(WARC_TS_BASE_US + row_idx * 1_000_000)
        p_html.append(bytes([rng.randrange(256) for _ in range(64)]))
        p_text.append("")
        p_lang.append("octet")
        row_idx += 1
        # make one real page link to the decoy so the gate is exercised
        # (decoys are also injected as hrefs below via seeds hub)

    pages_tbl = pa.table({
        "url": pa.array(p_url, pa.string()),
        "warc_ts": pa.array(p_ts, pa.timestamp("us")),
        "html": pa.array(p_html, pa.binary()),
        "text": pa.array(p_text, pa.string()),
        "lang": pa.array(p_lang, pa.string()),
    })
    pq.write_table(pages_tbl, meta["pages"])

    # --- seeds -----------------------------------------------------------
    seeds = []
    seeds.append(urls_by_host[hosts[0]][0])                     # hub (mega host)
    if spec.n_hosts > 1:
        seeds.append(urls_by_host[hosts[1]][0])
    seeds.append(f"https://missing{spec.seed}.test/nope")       # fetch miss
    for i in range(3, min(spec.n_seeds, spec.n_hosts)):
        seeds.append(urls_by_host[hosts[i]][0])
    with open(meta["seeds"], "w") as f:
        f.write("\n".join(seeds) + "\n")

    with open(done, "w") as f:
        f.write(sig)
    meta["n_pages"] = len(p_url)
    return meta


# ---------------------------------------------------------------------------
# Parallel (Ray) generation path — for bench-scale webs. Per-page rngs
# seeded by (seed, row_idx) keep it deterministic regardless of batch
# boundaries or task placement; the page corpus is a directory of parquet
# files written by Ray Data.
# ---------------------------------------------------------------------------
def _generate_parallel(out_dir: str, spec: WebSpec, meta: dict) -> None:
    import ray

    assert ray.is_initialized(), "parallel webgen requires a Ray session"
    rng = random.Random(spec.seed)
    hosts = spec.hosts()
    counts = spec.host_page_counts()
    vocab = ([f"w{k:04d}" for k in range(spec.vocab_size)]
             if spec.vocab_size else list(_VOCAB))

    urls_by_host: list[list[str]] = []
    rows_url, rows_host_idx = [], []
    for hi, (h, n) in enumerate(zip(hosts, counts)):
        us = []
        for j in range(n):
            sec = rng.choice([0, 0, 0, 1, 2])
            us.append(_page_url(h, sec, j))
        urls_by_host.append(us)
        rows_url.extend(us)
        rows_host_idx.extend([hi] * n)

    # robots + seeds (same shapes as the sequential path)
    r_hosts, r_dis, r_al, r_cd, r_fe = [], [], [], [], []
    for i, h in enumerate(hosts):
        dis, al = _robots_rules(rng)
        r_hosts.append(f"https://{h}")
        r_dis.append(dis)
        r_al.append(al)
        r_cd.append(rng.choice([None, None, None, 0.05, 0.5, 2.0, 5.0]))
        r_fe.append(rng.random() > 0.1)
    pq.write_table(pa.table({
        "host": pa.array(r_hosts, pa.string()),
        "disallow": pa.array(r_dis, pa.list_(pa.string())),
        "allow": pa.array(r_al, pa.list_(pa.string())),
        "crawl_delay": pa.array(r_cd, pa.float64()),
        "fetchable": pa.array(r_fe, pa.bool_()),
    }), meta["robots"])

    seeds = [urls_by_host[i][0] for i in range(min(spec.n_seeds, spec.n_hosts))]
    seeds.append(f"https://missing{spec.seed}.test/nope")
    with open(meta["seeds"], "w") as f:
        f.write("\n".join(seeds) + "\n")

    ubh_ref = ray.put((hosts, urls_by_host, vocab))
    n_pages = len(rows_url)
    base_seed = spec.seed
    cross = spec.cross_host_frac
    dead = spec.dead_link_frac
    maxdeg = spec.max_outdegree
    words = spec.text_words

    rows = pa.table({
        "row_idx": pa.array(range(n_pages), pa.int64()),
        "url": pa.array(rows_url, pa.string()),
        "host_idx": pa.array(rows_host_idx, pa.int64()),
    })

    def gen_batch(batch: pa.Table) -> pa.Table:
        from .functions.htmlparse import extract_visible_text as _evt

        _hosts, _ubh, _vocab = ray.get(ubh_ref)
        urls, his = batch.column("url").to_pylist(), \
            batch.column("host_idx").to_pylist()
        idxs = batch.column("row_idx").to_pylist()
        o_html, o_text, o_ts, o_lang = [], [], [], []
        for ri, url, hi in zip(idxs, urls, his):
            prng = random.Random(f"{base_seed}:{ri}")
            my_urls = _ubh[hi]
            hrefs = []
            for _ in range(prng.randint(0, maxdeg)):
                r = prng.random()
                if r < dead:
                    hrefs.append(f"/dead/p{prng.randint(0, 10_000)}")
                elif r < dead + cross:
                    th = prng.randrange(len(_hosts))
                    tu = _ubh[th][prng.randrange(len(_ubh[th]))]
                    if prng.random() < 0.25:
                        tu = "http" + tu[5:]
                    hrefs.append(tu)
                else:
                    tu = my_urls[prng.randrange(len(my_urls))]
                    k = prng.random()
                    if k < 0.5:
                        hrefs.append("/" + tu.split("/", 3)[3])
                    elif k < 0.6:
                        hrefs.append(tu + "#sec" + str(prng.randint(0, 5)))
                    else:
                        hrefs.append(tu)
            if prng.random() < 0.1:
                hrefs.append(prng.choice(_EDGE_HREFS))
            title = f"Page {ri} of {_hosts[hi]} " + prng.choice(_vocab)
            paras = []
            n_paras = prng.randint(2, 4)
            for p in range(n_paras):
                body = " ".join(prng.choice(_vocab)
                                for _ in range(words // n_paras))
                para = f"<p>{body}"
                for href in hrefs[p::n_paras]:
                    para += (f' <a href="{href}">anchor '
                             f"{prng.choice(_vocab)}</a> "
                             + " ".join(prng.choice(_vocab) for _ in range(3)))
                para += "</p>"
                paras.append(para)
            html = (
                "<!DOCTYPE html>\n<html><head><title>" + title + "</title>\n"
                '<meta charset="utf-8">\n'
                "<style>body { color: #222; }</style>\n"
                "<script>var x = 1; // not visible</script>\n"
                "</head>\n<body>\n<h1>" + title + "</h1>\n"
                "<!-- hidden comment -->\n" + "\n".join(paras)
                + "\n</body></html>\n").encode("utf-8")
            o_html.append(html)
            o_text.append(_evt(html))
            o_ts.append(WARC_TS_BASE_US + ri * 1_000_000)
            o_lang.append(HTML_LANGS[prng.randrange(len(HTML_LANGS))])
        return pa.table({
            "url": pa.array(urls, pa.string()),
            "warc_ts": pa.array(o_ts, pa.timestamp("us")),
            "html": pa.array(o_html, pa.binary()),
            "text": pa.array(o_text, pa.string()),
            "lang": pa.array(o_lang, pa.string()),
        })

    pages_dir = meta["pages"]
    os.makedirs(pages_dir, exist_ok=True)
    (ray.data.from_arrow(rows)
        .repartition(max(8, min(256, n_pages // 2000)))
        .map_batches(gen_batch, batch_format="pyarrow", batch_size=1024)
        .write_parquet(pages_dir))
    meta["n_pages"] = n_pages
