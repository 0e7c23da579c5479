"""Graph analytics over the CRAWLED link graph — distributed PageRank
(Brin & Page 1998) by power iteration, expressed in the repo's
iterative join/aggregate shape (same skeleton as dedup's label
propagation: one hash join + one bucketed aggregate per round, no
driver-side graph).

Determinism: rank mass is INTEGER (per-node starting mass 10^9); each
edge carries floor(0.85 * rank / outdeg), and everything that does not
flow along an edge — the (1-d) share, dangling nodes' damped mass, and
the floor residue — redistributes uniformly as the exact leftover over
n. Integer sums are order-independent, so the distributed result is
bit-identical to a single-process reference whatever the block split —
the same quantization trick as emb_kmeans / emb_label_sums — and total
mass is conserved to < n units per round by construction.

Scale shape per iteration: ranks (url, rank) join edges (src, dst, deg)
on src — the edge list is the big side and is hash-partitioned once;
contributions shuffle as (dst, int64) pairs into a bucketed sum; the
leftover-mass base and the node count are O(1) driver scalars. State is
one (url, rank) row per node, never materialized on the driver.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

DAMP_NUM, DAMP_DEN = 85, 100          # 0.85 damping as integer ratio
NODE_MASS = 1_000_000_000             # starting integer mass per node


def node_mass(n_nodes: int) -> int:
    """Per-node starting mass, capped so rank * DAMP_NUM can never wrap
    int64 even if one sink hub accumulated the ENTIRE graph's mass:
    total_mass * DAMP_NUM <= 2^62. The 10^9 default holds up to ~5e7
    nodes; beyond that resolution trades down gracefully instead of
    silently wrapping negative."""
    return max(1, min(NODE_MASS, (1 << 62) // (DAMP_NUM * max(n_nodes, 1))))

_RANK = pa.schema([("url", pa.string()), ("rank", pa.int64())])
_EDGE = pa.schema([("src", pa.string()), ("dst", pa.string()),
                   ("deg", pa.int64())])


def crawl_link_edges(ray, crawler):
    """(src, dst, deg): the crawled-to-crawled link graph. Outlinks are
    re-derived from the stored html with the SAME parse/fixup kernel the
    crawl used (ParseHtmlBatch), then inner-joined against the crawled
    node set so dst is restricted to fetched pages; deg is the count of
    those surviving outlinks per src (duplicates collapse — PageRank
    over the simple graph)."""
    from ..stages.aggregates import (
        hash_bucket_aggregate,
        join_partitions_for,
        normalize_for_join,
    )
    from ..stages.parse import ParseHtmlBatch

    corpus = crawler.crawled_dataset()
    if "html" not in corpus.schema().names:
        raise ValueError(
            "crawl_link_edges needs the stored html to re-derive "
            "outlinks; this crawl ran with store_html=False")
    n_nodes = corpus.count()
    # decode with the SAME strategy the crawl parsed with — a different
    # charset decode would emit different hrefs than the crawl followed
    decode = crawler.cfg.extra.get("decode_strategy")

    def to_edges(batch: pa.Table) -> pa.Table:
        p = ParseHtmlBatch(keep_html=False, decode=decode)
        parsed = p(batch.select(["url", "host", "html"]))
        links = parsed.column("links").combine_chunks()
        # vectorized explode: flatten the list column, repeat each src
        # by its list length; self-loops drop here, duplicate (src,dst)
        # rows collapse in deg_group's global drop_duplicates
        lens = pc.list_value_length(links).to_numpy(
            zero_copy_only=False).astype(np.int64)
        dst = links.flatten()
        src = pa.array(np.repeat(
            parsed.column("url").to_numpy(zero_copy_only=False), lens),
            pa.string())
        t = pa.table({"src": src, "dst": dst.cast(pa.string())})
        return t.filter(pc.invert(pc.equal(t.column("src"),
                                           t.column("dst"))))

    # raw is joined next and then degree-aggregated; materializing gives
    # its REAL count so the join partitions follow the SMALLER side
    # (join_partitions_for's contract — an empty hash partition on
    # either side crashes ray 2.49's join)
    raw = corpus.map_batches(to_edges,
                             batch_format="pyarrow").materialize()
    nodes = normalize_for_join(
        corpus.map_batches(lambda t: t.select(["url"]).rename_columns(
            ["dst"]), batch_format="pyarrow"),
        pa.schema([("dst", pa.string())])).materialize()
    nparts = join_partitions_for(min(n_nodes, raw.count()))
    kept = raw.join(nodes, join_type="inner", on=("dst",),
                    num_partitions=nparts).materialize()

    # per-src degree rides the edge rows (one bucketed pass): emit each
    # edge once plus the src's surviving out-degree. kept is consumed by
    # the aggregate anyway; materializing it first makes its REAL row
    # count available for the fan-out instead of an outdegree guess.
    def deg_group(df: pd.DataFrame) -> pd.DataFrame:
        df = df.drop_duplicates(["src", "dst"])
        df["deg"] = df.groupby("src")["dst"].transform("count")
        return df[["src", "dst", "deg"]]

    n_kept = kept.count()
    edges = hash_bucket_aggregate(kept, ["src"], deg_group,
                                  n_rows=n_kept)
    return normalize_for_join(edges, _EDGE,
                              n_rows=n_kept).materialize(), n_nodes


def pagerank(ray, crawler, iters: int = 5, edges=None):
    """(url, rank): integer-mass PageRank after ``iters`` power
    iterations over the crawled link graph. ``edges`` accepts a
    precomputed ``crawl_link_edges`` result so callers that already
    built the edge list (e.g. the exactness test) don't re-parse the
    corpus."""
    from ..stages.aggregates import (
        hash_bucket_aggregate,
        join_partitions_for,
        normalize_for_join,
    )
    from ray.data.aggregate import Sum

    if edges is None:
        edges = crawl_link_edges(ray, crawler)
    edges, n_nodes = edges
    corpus = crawler.crawled_dataset()
    # join partitions follow the SMALLER side (edges is materialized —
    # count is metadata-only)
    nparts = join_partitions_for(min(n_nodes, edges.count()))
    mass = node_mass(n_nodes)

    ranks = normalize_for_join(
        corpus.map_batches(
            lambda t: pa.table({
                "url": t.column("url"),
                "rank": pa.array(np.full(t.num_rows, mass,
                                         dtype=np.int64))}),
            batch_format="pyarrow"),
        _RANK).materialize()
    total_mass = n_nodes * mass

    def sum_col(ds, col):
        out = ds.aggregate(Sum(col))
        return int(out[f"sum({col})"] or 0)

    for _ in range(iters):
        er = edges.join(
            ranks.map_batches(
                lambda t: t.rename_columns(["src", "rank"]),
                batch_format="pyarrow"),
            join_type="inner", on=("src",), num_partitions=nparts)

        def contrib(t: pa.Table) -> pa.Table:
            r = t.column("rank").to_numpy(zero_copy_only=False)
            d = t.column("deg").to_numpy(zero_copy_only=False)
            c = (r * DAMP_NUM // DAMP_DEN) // np.maximum(d, 1)
            return pa.table({"url": t.column("dst"),
                             "rank": pa.array(c.astype(np.int64))})

        inflow = er.map_batches(contrib, batch_format="pyarrow") \
                   .materialize()

        # EVERYTHING that did not flow along an edge — the (1-d) share,
        # the dangling nodes' damped mass, and the per-edge floor
        # residue — redistributes uniformly: base = the exact leftover
        # split over all nodes. One O(1) scalar per round (the inflow
        # sum), no dangling-node join; total mass is conserved to < n
        # units per round by construction.
        base = (total_mass - sum_col(inflow, "rank")) // n_nodes

        def seed(t: pa.Table, base=base) -> pa.Table:
            return pa.table({
                "url": t.column("url"),
                "rank": pa.array(np.full(t.num_rows, base,
                                         dtype=np.int64))})

        def merge(df: pd.DataFrame) -> pd.DataFrame:
            return df.groupby("url", as_index=False).agg(
                rank=("rank", "sum"))

        ranks = normalize_for_join(
            hash_bucket_aggregate(
                ranks.map_batches(seed, batch_format="pyarrow")
                     .union(inflow),
                # shuffled rows = one seed per node + one per edge
                # (edges is materialized: count() is metadata-only)
                ["url"], merge, n_rows=n_nodes + edges.count()),
            _RANK).materialize()
    return ranks


def crawl_pagerank(ray, crawler, iters: int = 5, k: int = 20, edges=None):
    """Top-k (url, rank) by PageRank over the crawled graph. Every
    per-round sum is integer and order-independent, so the result is
    EXACT: value-checked against a 5-iteration chained-CTE DuckDB
    oracle over the dumped edge list, plus a single-process integer
    reference property test."""
    ranks = pagerank(ray, crawler, iters=iters, edges=edges)
    return ranks.sort(["rank", "url"], descending=[True, False]).limit(k)


# ---------------------------------------------------------------------------
def count_triangles(ray, canon_edges, n_edges: int | None = None):
    """Distributed TRIANGLE COUNT over an undirected simple graph given
    as a Dataset of canonical ``(a, b)`` int64 edges (a < b, deduped).
    Algorithm: degree-ordered orientation (Cohen 2009 / the MapReduce
    standard) — direct each edge from its (degree, id)-smaller endpoint,
    so every out-neighborhood is O(sqrt(m)); each node's out-pairs are
    the candidate wedges, and one hash join of wedges against the edge
    set closes them. Each triangle is counted EXACTLY once (its
    orientation-minimum vertex owns it).

    Scale shape: degrees by bucketed count; orientation via ONE join per
    endpoint; wedge generation per from-node inside a bucketed
    map_groups (output-sized work — the sqrt(m) out-degree bound is
    what keeps it polynomial); closure via one hash join on the pair
    key. No driver-side adjacency."""
    from ray.data.aggregate import Sum

    from ..stages.aggregates import (
        buckets_for,
        hash_bucket_aggregate,
        join_partitions_for,
        normalize_for_join,
    )

    if n_edges is None:
        canon_edges = canon_edges.materialize()
        n_edges = canon_edges.count()
    if n_edges == 0:
        return pa.table({"n_triangles": pa.array([0], pa.int64())})

    # degree per node (each canonical edge contributes to both ends)
    def ends(t: pa.Table) -> pa.Table:
        ids = np.concatenate([
            t.column("a").to_numpy(zero_copy_only=False),
            t.column("b").to_numpy(zero_copy_only=False)])
        return pa.table({"node": pa.array(ids, pa.int64()),
                         "deg": pa.array(np.ones(len(ids), np.int64),
                                         pa.int64())})

    def sum_deg(df: pd.DataFrame) -> pd.DataFrame:
        return df.groupby("node", as_index=False).sum()

    _DEG = pa.schema([("node", pa.int64()), ("deg", pa.int64())])
    degs = normalize_for_join(
        hash_bucket_aggregate(
            canon_edges.map_batches(ends, batch_format="pyarrow"),
            ["node"], sum_deg, n_rows=2 * n_edges),
        _DEG).materialize()
    nparts = join_partitions_for(min(n_edges, degs.count()))

    _EDGE2 = pa.schema([("a", pa.int64()), ("b", pa.int64())])
    ed = normalize_for_join(canon_edges, _EDGE2)
    # attach both endpoint degrees (two equi-joins), then orient
    da = degs.map_batches(lambda t: t.rename_columns(["a", "deg_a"]),
                          batch_format="pyarrow")
    db = degs.map_batches(lambda t: t.rename_columns(["b", "deg_b"]),
                          batch_format="pyarrow")
    ed = ed.join(da, join_type="inner", on=("a",), num_partitions=nparts)
    ed = normalize_for_join(ed, pa.schema(
        [("a", pa.int64()), ("b", pa.int64()), ("deg_a", pa.int64())]))
    ed = ed.join(db, join_type="inner", on=("b",), num_partitions=nparts)

    def orient(t: pa.Table) -> pa.Table:
        a = t.column("a").to_numpy(zero_copy_only=False)
        b = t.column("b").to_numpy(zero_copy_only=False)
        da_ = t.column("deg_a").to_numpy(zero_copy_only=False)
        db_ = t.column("deg_b").to_numpy(zero_copy_only=False)
        a_first = (da_ < db_) | ((da_ == db_) & (a < b))
        return pa.table({
            "frm": pa.array(np.where(a_first, a, b), pa.int64()),
            "to": pa.array(np.where(a_first, b, a), pa.int64())})

    oriented = ed.map_batches(orient, batch_format="pyarrow")

    # wedges: all out-neighbor pairs per from-node (canonical u < v)
    N_BUCKETS = buckets_for(n_edges)

    def add_bucket(t: pa.Table) -> pa.Table:
        from ..stages.aggregates import int_bucket_column

        f = t.column("frm").to_numpy(zero_copy_only=False)
        return t.append_column("wbucket", pa.array(
            int_bucket_column(f, N_BUCKETS), pa.int64()))

    def wedges(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["frm", "to"], kind="mergesort")
        f = g["frm"].to_numpy()
        to = g["to"].to_numpy()
        starts = np.r_[0, np.nonzero(f[1:] != f[:-1])[0] + 1, len(f)]
        out_u, out_v = [], []
        # per-NODE loop (not per-row): wedge output is inherently
        # quadratic in the out-degree, which orientation bounds
        for i in range(len(starts) - 1):
            nb = to[starts[i]:starts[i + 1]]
            if len(nb) < 2:
                continue
            iu, iv = np.triu_indices(len(nb), k=1)
            out_u.append(nb[iu])
            out_v.append(nb[iv])
        if not out_u:
            return pd.DataFrame({"a": pd.Series([], dtype="int64"),
                                 "b": pd.Series([], dtype="int64")})
        u = np.concatenate(out_u)
        v = np.concatenate(out_v)
        lo = np.minimum(u, v)
        hi = np.maximum(u, v)
        return pd.DataFrame({"a": lo, "b": hi})

    wd = (oriented.map_batches(add_bucket, batch_format="pyarrow")
                  .groupby("wbucket")
                  .map_groups(wedges, batch_format="pandas"))
    wd = normalize_for_join(wd, _EDGE2).materialize()
    if wd.count() == 0:
        return pa.table({"n_triangles": pa.array([0], pa.int64())})

    closed = wd.join(
        normalize_for_join(canon_edges, _EDGE2).materialize(),
        join_type="inner", on=("a", "b"),
        num_partitions=join_partitions_for(min(wd.count(), n_edges)))
    n_tri = closed.count()
    return pa.table({"n_triangles": pa.array([int(n_tri)], pa.int64())})


def salsa(ray, crawler, iters: int = 5, edges=None):
    """(url, auth, hub): integer-mass SALSA (Lempel & Moran 2000,
    "SALSA: the stochastic approach for link-structure analysis")
    hub/authority scores after ``iters`` alternating half-steps over
    the crawled link graph. Each forward half-step pushes every hub's
    mass forward split evenly over its outlinks (auth(j) = sum over
    i->j of hub(i) / outdeg(i)); each backward half-step pulls it back
    split over inlinks (hub(i) = sum over i->j of auth(j) / indeg(j))
    — SALSA's stochastic row-normalization, vs HITS' unnormalized
    adjacency products, is what keeps every per-step sum bounded by
    the total mass, so pagerank's integer-quantization trick carries
    over with zero overflow risk.

    Determinism: masses are INTEGER (node_mass units); each edge
    carries floor(mass / degree) and the floor residue redistributes
    uniformly over that half-step's receiving side, recomputed against
    the constant TOTAL each time (no drift accumulation) — the exact
    scheme pagerank uses, so the distributed result is bit-identical
    to a single-process reference whatever the block split.

    Scale shape per iteration: two hash joins (scores onto the
    materialized edge list, by src then by dst) + two bucketed integer
    sums; shuffled rows are (url, int64) pairs only; the leftover base
    is one O(1) driver scalar per half-step. Hub/authority node sets
    and per-edge degrees are built ONCE up front (one bucketed count +
    one join)."""
    from ray.data.aggregate import Sum

    from ..stages.aggregates import (
        hash_bucket_aggregate,
        join_partitions_for,
        normalize_for_join,
    )

    if edges is None:
        edges = crawl_link_edges(ray, crawler)
    edges_ds, n_nodes = edges
    n_edges = edges_ds.count()
    if n_edges == 0:
        # a Dataset, not a pa.Table — crawl_salsa chains .sort().limit()
        return ray.data.from_arrow(pa.table(
            {"url": pa.array([], pa.string()),
             "auth": pa.array([], pa.int64()),
             "hub": pa.array([], pa.int64())}))

    # in-degree per dst (one bucketed count), then ride it on each edge
    # row so both half-steps are a single join against the same table
    def indeg_count(df: pd.DataFrame) -> pd.DataFrame:
        return df.groupby("dst", as_index=False).agg(indeg=("n", "sum"))

    def indeg_merge(df: pd.DataFrame) -> pd.DataFrame:
        return df.groupby("dst", as_index=False).agg(
            indeg=("indeg", "sum"))

    _IN = pa.schema([("dst", pa.string()), ("indeg", pa.int64())])
    indeg = normalize_for_join(
        hash_bucket_aggregate(
            edges_ds.map_batches(
                lambda t: pa.table({
                    "dst": t.column("dst"),
                    "n": pa.array(np.ones(t.num_rows, np.int64))}),
                batch_format="pyarrow"),
            ["dst"], indeg_count, merge=indeg_merge, n_rows=n_edges),
        _IN).materialize()
    nparts = join_partitions_for(min(indeg.count(), n_edges))
    _E4 = pa.schema([("src", pa.string()), ("dst", pa.string()),
                     ("deg", pa.int64()), ("indeg", pa.int64())])
    edges4 = normalize_for_join(
        edges_ds.join(indeg, join_type="inner", on=("dst",),
                      num_partitions=nparts),
        _E4).materialize()

    # hub side = distinct src (has outlinks); auth side = distinct dst
    def first_url(df: pd.DataFrame) -> pd.DataFrame:
        return df.drop_duplicates(["url"])

    _NODE = pa.schema([("url", pa.string())])
    hubs = normalize_for_join(
        hash_bucket_aggregate(
            edges4.map_batches(
                lambda t: t.select(["src"]).rename_columns(["url"]),
                batch_format="pyarrow"),
            ["url"], first_url, n_rows=n_edges),
        _NODE).materialize()
    auths = normalize_for_join(
        hash_bucket_aggregate(
            edges4.map_batches(
                lambda t: t.select(["dst"]).rename_columns(["url"]),
                batch_format="pyarrow"),
            ["url"], first_url, n_rows=n_edges),
        _NODE).materialize()
    n_h, n_a = hubs.count(), auths.count()
    mass = node_mass(n_nodes)
    total = n_h * mass

    def sum_col(ds, col):
        out = ds.aggregate(Sum(col))
        return int(out[f"sum({col})"] or 0)

    def seed_fn(base):
        def seed(t: pa.Table) -> pa.Table:
            return pa.table({
                "url": t.column("url"),
                "rank": pa.array(np.full(t.num_rows, base, np.int64))})
        return seed

    def merge(df: pd.DataFrame) -> pd.DataFrame:
        return df.groupby("url", as_index=False).agg(rank=("rank", "sum"))

    hub_ranks = normalize_for_join(
        hubs.map_batches(seed_fn(mass), batch_format="pyarrow"),
        _RANK).materialize()
    auth_ranks = None

    def half_step(scores, join_key, div_col, out_col, receivers, n_recv):
        """Push ``scores`` across edges4 joined on ``join_key``, each
        edge carrying floor(rank / div_col) toward ``out_col``; the
        leftover vs ``total`` seeds every receiver uniformly."""
        er = edges4.join(
            scores.map_batches(
                lambda t: t.rename_columns([join_key, "rank"]),
                batch_format="pyarrow"),
            join_type="inner", on=(join_key,), num_partitions=nparts)

        def contrib(t: pa.Table) -> pa.Table:
            r = t.column("rank").to_numpy(zero_copy_only=False)
            d = t.column(div_col).to_numpy(zero_copy_only=False)
            return pa.table({
                "url": t.column(out_col),
                "rank": pa.array((r // np.maximum(d, 1)).astype(np.int64))})

        inflow = er.map_batches(contrib, batch_format="pyarrow") \
                   .materialize()
        base = (total - sum_col(inflow, "rank")) // n_recv
        return normalize_for_join(
            hash_bucket_aggregate(
                receivers.map_batches(seed_fn(base),
                                      batch_format="pyarrow")
                         .union(inflow),
                ["url"], merge, n_rows=n_recv + n_edges),
            _RANK).materialize()

    for _ in range(iters):
        auth_ranks = half_step(hub_ranks, "src", "deg", "dst",
                               auths, n_a)
        hub_ranks = half_step(auth_ranks, "dst", "indeg", "src",
                              hubs, n_h)

    # one bucketed sum folds the two score tables into (url, auth, hub)
    # — no outer join needed (missing side contributes zeros)
    def tag(col):
        def fn(t: pa.Table) -> pa.Table:
            r = t.column("rank").to_numpy(zero_copy_only=False)
            z = np.zeros(t.num_rows, np.int64)
            return pa.table({
                "url": t.column("url"),
                "auth": pa.array(r if col == "auth" else z),
                "hub": pa.array(r if col == "hub" else z)})
        return fn

    def fold(df: pd.DataFrame) -> pd.DataFrame:
        return df.groupby("url", as_index=False).agg(
            auth=("auth", "sum"), hub=("hub", "sum"))

    return hash_bucket_aggregate(
        auth_ranks.map_batches(tag("auth"), batch_format="pyarrow")
                  .union(hub_ranks.map_batches(tag("hub"),
                                               batch_format="pyarrow")),
        ["url"], fold, n_rows=n_h + n_a)


def crawl_salsa(ray, crawler, iters: int = 5, k: int = 20, edges=None):
    """Top-k (url, auth, hub) by SALSA authority score over the crawled
    graph. Every per-half-step sum is integer and order-independent,
    so the result is EXACT: value-checked against a chained-CTE DuckDB
    oracle over the dumped edge list, plus a single-process integer
    reference property test."""
    scores = salsa(ray, crawler, iters=iters, edges=edges)
    return scores.sort(["auth", "hub", "url"],
                       descending=[True, True, False]).limit(k)


def canonical_undirected_edges(edges_ds):
    """Canonical UNDIRECTED simple edge set ``(a, b)`` (a < b, deduped,
    self-loops dropped) from a directed (src, dst, ...) string edge
    Dataset; node ids are the repo's stable 64-bit url hashes. One
    bucketed distinct — the shared front-end of every undirected graph
    statistic (triangles, wedges, clustering coefficient)."""
    from ..functions.urls import stable_hash64_batch
    from ..stages.aggregates import hash_bucket_aggregate

    def canon(t: pa.Table) -> pa.Table:
        hs = stable_hash64_batch(
            t.column("src").to_pylist()).astype(np.int64)
        hd = stable_hash64_batch(
            t.column("dst").to_pylist()).astype(np.int64)
        keep = hs != hd
        hs, hd = hs[keep], hd[keep]
        return pa.table({"a": pa.array(np.minimum(hs, hd), pa.int64()),
                         "b": pa.array(np.maximum(hs, hd), pa.int64())})

    def _dd(df: pd.DataFrame) -> pd.DataFrame:
        return df.drop_duplicates(["a", "b"])

    return hash_bucket_aggregate(
        edges_ds.map_batches(canon, batch_format="pyarrow"),
        ["a", "b"], _dd).materialize()


def crawl_triangles(ray, crawler, edges=None):
    """Single-row (n_triangles) over the crawled link graph, undirected
    and deduped; node ids are the repo's stable 64-bit url hashes (the
    exactness test builds its reference from the SAME canonical edge
    set, so the count is exact by construction)."""
    if edges is None:
        edges = crawl_link_edges(ray, crawler)
    edges_ds, _n = edges

    canon_edges = canonical_undirected_edges(edges_ds)
    return count_triangles(ray, canon_edges,
                           n_edges=canon_edges.count())


# ---------------------------------------------------------------------------
def crawl_components(ray, crawler, edges=None):
    """(fetch_seq, url, component): weakly-connected components of the
    crawled link graph — component = the member with the SMALLEST
    fetch_seq (the earliest-crawled page), so labels are integers and
    the result is exact (value-checked vs a recursive-CTE min-label
    DuckDB oracle over the dumped edge list — feasible because the
    oracle graph is small; the Ray side never assumes that).
    Composition of existing engines: edges from crawl_link_edges (same
    parse kernel as the crawl), url -> fetch_seq translation by two
    distributed string joins, then dedup's distributed min-label
    propagation (no driver union-find); pages with no surviving in/out
    links are their own singleton component via one left join against
    the labeled set (NULL label -> own seq)."""
    from ..stages.aggregates import join_partitions_for, normalize_for_join
    from .dedup import propagate_min_labels

    corpus = crawler.crawled_dataset().map_batches(
        lambda t: t.select(["fetch_seq", "url"]), batch_format="pyarrow")
    n_nodes = corpus.count()

    edges_ds, _ = edges if edges is not None \
        else crawl_link_edges(ray, crawler)
    edges = edges_ds.map_batches(
        lambda t: t.select(["src", "dst"]), batch_format="pyarrow"
    ).materialize()
    nparts = join_partitions_for(max(1, min(n_nodes, edges.count())))

    seq_src = normalize_for_join(
        corpus.map_batches(lambda t: t.rename_columns(["seq_a", "src"]),
                           batch_format="pyarrow"),
        pa.schema([("seq_a", pa.int64()), ("src", pa.string())])
    ).materialize()
    seq_dst = normalize_for_join(
        corpus.map_batches(lambda t: t.rename_columns(["seq_b", "dst"]),
                           batch_format="pyarrow"),
        pa.schema([("seq_b", pa.int64()), ("dst", pa.string())])
    ).materialize()
    int_edges = (edges.join(seq_src, join_type="inner", on=("src",),
                            num_partitions=nparts)
                      .join(seq_dst, join_type="inner", on=("dst",),
                            num_partitions=nparts)
                      .map_batches(lambda t: pa.table(
                          {"doc_a": t.column("seq_a"),
                           "doc_b": t.column("seq_b")}),
                          batch_format="pyarrow")
                      .materialize())

    if int_edges.count() == 0:
        return corpus.map_batches(
            lambda t: t.append_column("component", t.column("fetch_seq")),
            batch_format="pyarrow").sort("fetch_seq")

    labels = propagate_min_labels(ray, int_edges).map_batches(
        lambda t: t.rename_columns(["fetch_seq", "component"]),
        batch_format="pyarrow")
    labels = normalize_for_join(
        labels, pa.schema([("fetch_seq", pa.int64()),
                           ("component", pa.int64())])).materialize()
    joined = normalize_for_join(
        corpus, pa.schema([("fetch_seq", pa.int64()),
                           ("url", pa.string())])
    ).join(labels, join_type="left_outer", on=("fetch_seq",),
           num_partitions=join_partitions_for(
               max(1, min(n_nodes, labels.count()))))

    def fill(t: pa.Table) -> pa.Table:
        comp = t.column("component").to_numpy(zero_copy_only=False)
        seq = t.column("fetch_seq").to_numpy(zero_copy_only=False)
        comp = np.where(np.isnan(comp.astype(np.float64)), seq,
                        comp).astype(np.int64)
        return pa.table({"fetch_seq": pa.array(seq.astype(np.int64)),
                         "url": t.column("url"),
                         "component": pa.array(comp, pa.int64())})

    return joined.map_batches(fill, batch_format="pyarrow").sort("fetch_seq")


# ---------------------------------------------------------------------------
def crawl_depths(ray, crawler, edges=None, max_depth: int = 32):
    """(url, depth): minimum LINK DISTANCE of every crawled page from
    the round-0 seed pages over the crawled link graph (-1 = no path of
    surviving crawled-to-crawled edges). The crawl's own `round` is an
    arrival time shaped by politeness and budget, NOT link distance —
    this is the graph-analytics complement.

    Distributed BFS, one level per pass: frontier x edges inner join ->
    distinct candidate targets -> left_anti against the settled set ->
    the survivors ARE the next level (first arrival is minimal, so no
    relaxation is ever needed). Only (url) / (url, depth) rows move;
    level count = seed-set eccentricity, capped at ``max_depth``.

    Reference parity: the reference tracks no link distances; ADDED
    operator, value-checked vs a recursive-CTE DuckDB oracle over the
    dumped edge list (registry._DEPTHS_ORACLE_TEMPLATE)."""
    from ..stages.aggregates import (
        distinct_keys,
        join_partitions_for,
        normalize_for_join,
    )

    _URL = pa.schema([("url", pa.string())])
    _LVL = pa.schema([("url", pa.string()), ("depth", pa.int64())])

    # materialized: consumed THREE times (count, seeds filter, final
    # left join) — without this each consumer would re-scan the full
    # crawled corpus (html payload included) for a two-column table
    corpus = crawler.crawled_dataset().map_batches(
        lambda t: t.select(["url", "round"]),
        batch_format="pyarrow").materialize()
    n_nodes = corpus.count()
    edges_ds, _ = edges if edges is not None \
        else crawl_link_edges(ray, crawler)
    edges_n = normalize_for_join(
        edges_ds.map_batches(lambda t: t.select(["src", "dst"]),
                             batch_format="pyarrow"),
        pa.schema([("src", pa.string()), ("dst", pa.string())])
    ).materialize()
    n_edges = edges_n.count()

    def with_depth(ds, lvl: int):
        return ds.map_batches(
            lambda t, _l=lvl: t.select(["url"]).append_column(
                "depth", pa.array(np.full(t.num_rows, _l, np.int64))),
            batch_format="pyarrow")

    seeds = normalize_for_join(
        corpus.map_batches(
            lambda t: t.filter(pc.equal(t.column("round"), 0))
                       .select(["url"]),
            batch_format="pyarrow"), _URL).materialize()

    levels = [with_depth(seeds, 0)]
    seen = seeds
    frontier = seeds
    if n_edges > 0:
        for lvl in range(1, max_depth + 1):
            cand = (edges_n.join(
                        frontier.map_batches(
                            lambda t: t.rename_columns(["src"]),
                            batch_format="pyarrow"),
                        join_type="inner", on=("src",),
                        num_partitions=join_partitions_for(
                            max(1, min(n_edges, frontier.count()))))
                    .map_batches(
                        lambda t: t.select(["dst"]).rename_columns(["url"]),
                        batch_format="pyarrow"))
            cand = normalize_for_join(
                distinct_keys(cand, "url", n_rows=n_nodes), _URL
            ).materialize()
            if cand.count() == 0:
                break
            new = cand.join(
                seen, join_type="left_anti", on=("url",),
                num_partitions=join_partitions_for(
                    max(1, min(cand.count(), seen.count())))).materialize()
            if new.count() == 0:
                break
            levels.append(with_depth(new, lvl))
            # the settled set grows by exactly the new level — one
            # materialized union per level, never a re-scan of the corpus
            seen = normalize_for_join(seen.union(new), _URL).materialize()
            frontier = new

    labels = levels[0]
    for lv in levels[1:]:
        labels = labels.union(lv)
    labels = normalize_for_join(labels, _LVL).materialize()
    joined = normalize_for_join(corpus.map_batches(
        lambda t: t.select(["url"]), batch_format="pyarrow"), _URL
    ).join(labels, join_type="left_outer", on=("url",),
           num_partitions=join_partitions_for(
               max(1, min(n_nodes, labels.count()))))

    def fill(t: pa.Table) -> pa.Table:
        d = t.column("depth").to_numpy(zero_copy_only=False)
        d = np.where(np.isnan(d.astype(np.float64)), -1, d).astype(np.int64)
        return pa.table({"url": t.column("url"),
                         "depth": pa.array(d, pa.int64())})

    return joined.map_batches(fill, batch_format="pyarrow").sort("url")


# ---------------------------------------------------------------------------
def crawl_degree_hist(ray, crawler, edges=None):
    """(out_deg, n_pages): OUT-DEGREE DISTRIBUTION of the crawled link
    graph, zero-degree pages included — the first diagnostic any graph
    pipeline runs (power-law check, supernode detection before a
    join/propagation blows up on a hot key).

    Scale shape: the edge list carries each source's out-degree already
    (crawl_link_edges), so one bucketed distinct reduces it to a row
    per source; pages without surviving outlinks enter via a UNION of
    zero-marker rows and a max-merge (no driver-side node set), and the
    histogram is a tiny grouped count."""
    from ray.data.aggregate import Sum

    from ..stages.aggregates import hash_bucket_aggregate

    if edges is None:
        edges = crawl_link_edges(ray, crawler)
    edges_ds, n_nodes = edges

    def src_deg(t: pa.Table) -> pd.DataFrame:
        df = pd.DataFrame({
            "url": t.column("src").to_pylist(),
            "deg": t.column("deg").to_numpy(zero_copy_only=False)
            .astype("int64")})
        return df.drop_duplicates("url")

    nodes = crawler.crawled_dataset().map_batches(
        lambda t: pa.table({
            "url": t.column("url"),
            "deg": pa.array(np.zeros(t.num_rows, dtype=np.int64))}),
        batch_format="pyarrow")

    both = (edges_ds.map_batches(src_deg, batch_format="pyarrow")
            .union(nodes))
    per_url = hash_bucket_aggregate(
        both, ["url"],
        lambda df: df.groupby("url", as_index=False).max(),
        n_rows=n_nodes)

    def hist(t: pa.Table) -> pd.DataFrame:
        g = pd.DataFrame({
            "out_deg": t.column("deg").to_numpy(zero_copy_only=False)
            .astype("int64"),
            "n_pages": np.ones(t.num_rows, dtype="int64")})
        return g.groupby("out_deg", as_index=False).sum()

    return (per_url.map_batches(hist, batch_format="pyarrow")
            .groupby("out_deg")
            .aggregate(Sum("n_pages", alias_name="n_pages"))
            .sort("out_deg"))


# ---------------------------------------------------------------------------
def crawl_reciprocity(ray, crawler, edges=None):
    """Single-row (n_edges, n_recip, reciprocity_bp): link RECIPROCITY
    of the crawled DIRECTED graph — how many edges (u -> v) have the
    reverse edge (v -> u) too, and that share in integer basis points
    (floor(10000 * n_recip / n_edges)). The standard digraph diagnostic
    (a web graph is mostly one-way; a near-1 reciprocity means the
    "links" are really an undirected relation).

    Scale shape: each directed edge maps to its canonical unordered
    pair plus a direction bit; ONE bucketed aggregate ORs the bits per
    pair, and the per-bucket partial (edges seen, edges whose pair got
    both bits) folds into a single Sum — the pair table never lands on
    the driver."""
    from ray.data.aggregate import Sum

    from ..functions.urls import stable_hash64_batch
    from ..stages.aggregates import hash_bucket_aggregate

    if edges is None:
        edges = crawl_link_edges(ray, crawler)
    edges_ds, _n = edges

    def pair_bits(t: pa.Table) -> pa.Table:
        hs = stable_hash64_batch(
            t.column("src").to_pylist()).astype(np.int64)
        hd = stable_hash64_batch(
            t.column("dst").to_pylist()).astype(np.int64)
        keep = hs != hd
        hs, hd = hs[keep], hd[keep]
        fwd = hs < hd
        return pa.table({
            "a": pa.array(np.minimum(hs, hd), pa.int64()),
            "b": pa.array(np.maximum(hs, hd), pa.int64()),
            "bits": pa.array(np.where(fwd, 1, 2).astype(np.int64),
                             pa.int64())})

    def dedup_partial(df: pd.DataFrame) -> pd.DataFrame:
        # per-BATCH combine must keep the keys (it runs before the
        # exchange); the scalar fold happens in the per-bucket merge
        return df.drop_duplicates(["a", "b", "bits"])

    def fold_pairs(df: pd.DataFrame) -> pd.DataFrame:
        # per-pair OR of direction bits, then a per-bucket partial:
        # n_edges counts DISTINCT directed edges (a same-direction
        # duplicate collapses like the edge dump's dedup), n_recip
        # counts directed edges in both-direction pairs (2 per pair)
        g = (df.drop_duplicates(["a", "b", "bits"])
               .groupby(["a", "b"], as_index=False)["bits"]
               .agg(["sum", "count"]))
        both = g["sum"].to_numpy() == 3
        n_edges = int(g["count"].sum())
        n_recip = 2 * int(both.sum())
        return pd.DataFrame({"n_edges": [n_edges], "n_recip": [n_recip]})

    parts = hash_bucket_aggregate(
        edges_ds.map_batches(pair_bits, batch_format="pyarrow"),
        ["a", "b"], dedup_partial, merge=fold_pairs)
    tot = parts.aggregate(Sum("n_edges"), Sum("n_recip"))  # O(1) scalars
    n_edges = int(tot["sum(n_edges)"] or 0)
    n_recip = int(tot["sum(n_recip)"] or 0)
    bp = (10000 * n_recip) // n_edges if n_edges else 0
    return pa.table({"n_edges": pa.array([n_edges], pa.int64()),
                     "n_recip": pa.array([n_recip], pa.int64()),
                     "reciprocity_bp": pa.array([bp], pa.int64())})


# ---------------------------------------------------------------------------
def crawl_clustering_coeff(ray, crawler, edges=None):
    """Single-row (n_triangles, n_wedges, gcc_bp): GLOBAL CLUSTERING
    COEFFICIENT (transitivity) of the crawled link graph viewed as an
    undirected simple graph — 3 * triangles / wedges, in integer basis
    points (floor via integer division, so Ray and the SQL oracle agree
    bit-for-bit). Wedges = sum over nodes of deg*(deg-1)/2.

    Scale shape: canonical edge set once (shared kernel with
    crawl_triangles), degrees by bucketed count, wedge partial summed
    per block (never a per-node table on the driver), triangles by the
    degree-ordered orientation counter."""
    from ray.data.aggregate import Sum

    from ..stages.aggregates import hash_bucket_aggregate

    if edges is None:
        edges = crawl_link_edges(ray, crawler)
    edges_ds, _n = edges

    canon_edges = canonical_undirected_edges(edges_ds)
    n_edges = canon_edges.count()
    n_tri = int(count_triangles(ray, canon_edges, n_edges=n_edges)
                .column("n_triangles")[0].as_py())

    def ends(t: pa.Table) -> pa.Table:
        ids = np.concatenate([
            t.column("a").to_numpy(zero_copy_only=False),
            t.column("b").to_numpy(zero_copy_only=False)])
        return pa.table({"node": pa.array(ids, pa.int64()),
                         "deg": pa.array(np.ones(len(ids), np.int64),
                                         pa.int64())})

    def deg_partial(df: pd.DataFrame) -> pd.DataFrame:
        # mergeable per-batch partial — keeps the key column
        return df.groupby("node", as_index=False).sum()

    def wedge_fold(df: pd.DataFrame) -> pd.DataFrame:
        d = df.groupby("node")["deg"].sum().to_numpy()
        return pd.DataFrame({"n_wedges": [int((d * (d - 1) // 2).sum())]})

    wparts = hash_bucket_aggregate(
        canon_edges.map_batches(ends, batch_format="pyarrow"),
        ["node"], deg_partial, merge=wedge_fold,
        n_rows=2 * max(n_edges, 1))
    wtot = wparts.aggregate(Sum("n_wedges"))  # O(1) scalar
    n_wedges = int(wtot["sum(n_wedges)"] or 0)
    bp = (30000 * n_tri) // n_wedges if n_wedges else 0
    return pa.table({"n_triangles": pa.array([n_tri], pa.int64()),
                     "n_wedges": pa.array([n_wedges], pa.int64()),
                     "gcc_bp": pa.array([bp], pa.int64())})


# ---------------------------------------------------------------------------
def ppr(ray, crawler, iters: int = 5, edges=None):
    """(url, rank): integer-mass PERSONALIZED PageRank — the teleport
    mass restarts at the round-0 SEED pages instead of uniformly, so
    rank measures proximity to the seeds (topic-sensitive PageRank,
    Haveliwala 2002). Same exactness trick as ``pagerank``: all mass
    is integer; each round the damped floor-divided mass flows along
    edges, and EVERYTHING that did not flow (teleport share, dangling
    mass, floor residue) returns uniformly to the seed set.
    Unreached pages hold rank 0 (the rank vector stays SPARSE — only
    seed + reached rows exist until the final densifying union).

    Scale shape per iteration: identical to pagerank — one edge join,
    one bucketed sum, two O(1) driver scalars; the sparse rank table
    is never driver-materialized."""
    from ray.data.aggregate import Sum

    from ..stages.aggregates import (
        hash_bucket_aggregate,
        join_partitions_for,
        normalize_for_join,
    )

    if edges is None:
        edges = crawl_link_edges(ray, crawler)
    edges, n_nodes = edges

    corpus = crawler.crawled_dataset().map_batches(
        lambda t: t.select(["url", "round"]),
        batch_format="pyarrow").materialize()
    seeds = normalize_for_join(
        corpus.map_batches(
            lambda t: t.filter(pc.equal(t.column("round"), 0))
                       .select(["url"]),
            batch_format="pyarrow"),
        pa.schema([("url", pa.string())])).materialize()
    n_seeds = max(seeds.count(), 1)
    nparts = join_partitions_for(min(n_nodes, edges.count()))
    mass = node_mass(n_seeds)
    total_mass = n_seeds * mass

    def sum_col(ds, col):
        out = ds.aggregate(Sum(col))
        return int(out[f"sum({col})"] or 0)

    ranks = normalize_for_join(
        seeds.map_batches(
            lambda t: pa.table({
                "url": t.column("url"),
                "rank": pa.array(np.full(t.num_rows, mass,
                                         dtype=np.int64))}),
            batch_format="pyarrow"),
        _RANK).materialize()

    for _ in range(iters):
        er = edges.join(
            ranks.map_batches(
                lambda t: t.rename_columns(["src", "rank"]),
                batch_format="pyarrow"),
            join_type="inner", on=("src",), num_partitions=nparts)

        def contrib(t: pa.Table) -> pa.Table:
            r = t.column("rank").to_numpy(zero_copy_only=False)
            d = t.column("deg").to_numpy(zero_copy_only=False)
            c = (r * DAMP_NUM // DAMP_DEN) // np.maximum(d, 1)
            return pa.table({"url": t.column("dst"),
                             "rank": pa.array(c.astype(np.int64))})

        inflow = er.map_batches(contrib, batch_format="pyarrow") \
                   .materialize()
        base = (total_mass - sum_col(inflow, "rank")) // n_seeds

        def seed_rows(t: pa.Table, base=base) -> pa.Table:
            return pa.table({
                "url": t.column("url"),
                "rank": pa.array(np.full(t.num_rows, base,
                                         dtype=np.int64))})

        def merge(df: pd.DataFrame) -> pd.DataFrame:
            return df.groupby("url", as_index=False).agg(
                rank=("rank", "sum"))

        ranks = normalize_for_join(
            hash_bucket_aggregate(
                seeds.map_batches(seed_rows, batch_format="pyarrow")
                     .union(inflow),
                ["url"], merge, n_rows=n_seeds + edges.count()),
            _RANK).materialize()

    # densify: unreached crawled pages report rank 0
    zeros = corpus.map_batches(
        lambda t: pa.table({
            "url": t.column("url"),
            "rank": pa.array(np.zeros(t.num_rows, dtype=np.int64))}),
        batch_format="pyarrow")

    def merge_all(df: pd.DataFrame) -> pd.DataFrame:
        return df.groupby("url", as_index=False).agg(
            rank=("rank", "sum"))

    return normalize_for_join(
        hash_bucket_aggregate(ranks.union(zeros), ["url"], merge_all,
                              n_rows=n_nodes + n_seeds + edges.count()),
        _RANK)


def crawl_ppr(ray, crawler, iters: int = 5, k: int = 20, edges=None):
    """Top-k (url, rank) by seed-personalized PageRank (value-checked
    against a chained-CTE DuckDB oracle over the dumped edge list +
    attempts dump, same precedent as crawl_pagerank)."""
    ranks = ppr(ray, crawler, iters=iters, edges=edges)
    return ranks.sort(["rank", "url"], descending=[True, False]).limit(k)


# ---------------------------------------------------------------------------
KCORE_K = 3
KCORE_ROUNDS = 12


def crawl_kcore(ray, crawler, k: int = KCORE_K,
                rounds: int = KCORE_ROUNDS, edges=None):
    """(url, core_deg): BOUNDED k-CORE PEEL of the crawled link graph
    viewed as an undirected simple graph — ``rounds`` iterations of
    "drop every node with degree < k, restrict the edges, recompute",
    then each surviving endpoint with its degree in the residual
    subgraph. The dense-subgraph extractor (spam-farm / community
    core detection). Both engines run EXACTLY the same bounded peel
    (the Ray side exits early only at a fixpoint, which further
    rounds preserve — so a ``rounds``-unrolled SQL chain is value-
    identical whether or not the peel converged).

    Scale shape per round: one bucketed degree count (mergeable
    partials) + two hash joins restricting the edge table to the
    alive set; the edge table only ever SHRINKS, node ids stay the
    url strings the SQL oracle can canonicalize with LEAST/GREATEST,
    and nothing is driver-materialized but the O(1) edge count."""
    from ..stages.aggregates import (
        hash_bucket_aggregate,
        join_partitions_for,
        normalize_for_join,
    )

    if edges is None:
        edges = crawl_link_edges(ray, crawler)
    edges_ds, _n = edges
    _E = pa.schema([("a", pa.string()), ("b", pa.string())])
    _D = pa.schema([("node", pa.string()), ("deg", pa.int64())])

    def canon(t: pa.Table) -> pa.Table:
        src = t.column("src").to_numpy(zero_copy_only=False)
        dst = t.column("dst").to_numpy(zero_copy_only=False)
        keep = src != dst
        src, dst = src[keep], dst[keep]
        lt = src < dst          # lexicographic, ASCII == SQL binary
        return pa.table({
            "a": pa.array(np.where(lt, src, dst), pa.string()),
            "b": pa.array(np.where(lt, dst, src), pa.string())})

    def _dd(df: pd.DataFrame) -> pd.DataFrame:
        return df.drop_duplicates(["a", "b"])

    cur = normalize_for_join(
        hash_bucket_aggregate(
            edges_ds.map_batches(canon, batch_format="pyarrow"),
            ["a", "b"], _dd),
        _E).materialize()
    m = cur.count()

    def ends(t: pa.Table) -> pa.Table:
        ids = np.concatenate([
            t.column("a").to_numpy(zero_copy_only=False),
            t.column("b").to_numpy(zero_copy_only=False)])
        return pa.table({"node": pa.array(ids, pa.string()),
                         "deg": pa.array(np.ones(len(ids), np.int64),
                                         pa.int64())})

    def sum_deg(df: pd.DataFrame) -> pd.DataFrame:
        return df.groupby("node", as_index=False).sum()

    def degrees(eds, n_edges):
        return normalize_for_join(
            hash_bucket_aggregate(
                eds.map_batches(ends, batch_format="pyarrow"),
                ["node"], sum_deg, n_rows=2 * max(n_edges, 1)),
            _D).materialize()

    for _ in range(rounds):
        if m == 0:
            break
        degs = degrees(cur, m)
        alive = degs.map_batches(
            lambda t: t.filter(pc.greater_equal(t.column("deg"), k))
                       .select(["node"]),
            batch_format="pyarrow")
        alive = normalize_for_join(
            alive, pa.schema([("node", pa.string())])).materialize()
        n_alive = alive.count()
        if n_alive == 0:
            m = 0
            break
        nparts = join_partitions_for(max(1, min(m, n_alive)))
        cur = (cur.join(alive.map_batches(
                    lambda t: t.rename_columns(["a"]),
                    batch_format="pyarrow"),
                    join_type="inner", on=("a",),
                    num_partitions=nparts)
                  .join(alive.map_batches(
                      lambda t: t.rename_columns(["b"]),
                      batch_format="pyarrow"),
                      join_type="inner", on=("b",),
                      num_partitions=nparts))
        cur = normalize_for_join(
            cur.map_batches(lambda t: t.select(["a", "b"]),
                            batch_format="pyarrow"), _E).materialize()
        m2 = cur.count()
        if m2 == m:
            break           # fixpoint: every later round is a no-op
        m = m2

    if m == 0:
        return pa.table({"url": pa.array([], pa.string()),
                         "core_deg": pa.array([], pa.int64())})
    out = degrees(cur, m)
    return out.map_batches(
        lambda t: t.rename_columns(["url", "core_deg"]),
        batch_format="pyarrow").sort("url")


# ---------------------------------------------------------------------------
ANCHOR_TOPK = 5


def crawl_anchor_pairs(ray, crawler):
    """(dst, token) Dataset: every canonical-tokenizer token of every
    anchor text whose (fixup-surviving, non-self) href points at a
    CRAWLED page — the raw material of an anchor-text index (the
    description other pages give a page; the classic web-retrieval
    signal the page's own text can't provide). Re-parses the stored
    html with the SAME decode strategy and href skip/fixup rules the
    crawl used, restricted to crawled targets by one string join."""
    from ..functions.htmlparse import anchor_texts
    from ..functions.tokenizer import tokenize
    from ..functions.urls import fixup_href
    from ..stages.aggregates import join_partitions_for, normalize_for_join

    corpus = crawler.crawled_dataset()
    if "html" not in corpus.schema().names:
        raise ValueError("crawl_anchor_pairs needs the stored html")
    n_nodes = corpus.count()
    decode = crawler.cfg.extra.get("decode_strategy")

    def to_pairs(batch: pa.Table) -> pa.Table:
        urls = batch.column("url").to_pylist()
        hosts = batch.column("host").to_pylist()
        htmls = batch.column("html").to_pylist()
        dsts, toks = [], []
        for u, h, html in zip(urls, hosts, htmls):
            for href, atext in anchor_texts(html, decoder=decode):
                link = fixup_href(href, h)
                if link is None or link == u:
                    continue
                for tok in tokenize(atext):
                    dsts.append(link)
                    toks.append(tok)
        return pa.table({"dst": pa.array(dsts, pa.string()),
                         "token": pa.array(toks, pa.string())})

    _P = pa.schema([("dst", pa.string()), ("token", pa.string())])
    pairs = normalize_for_join(
        corpus.map_batches(to_pairs, batch_format="pyarrow"),
        _P).materialize()
    nodes = normalize_for_join(
        corpus.map_batches(lambda t: t.select(["url"]).rename_columns(
            ["dst"]), batch_format="pyarrow"),
        pa.schema([("dst", pa.string())])).materialize()
    nparts = join_partitions_for(max(1, min(n_nodes, pairs.count())))
    kept = pairs.join(nodes, join_type="inner", on=("dst",),
                      num_partitions=nparts)
    return normalize_for_join(kept, _P).materialize()


def crawl_anchor_terms(ray, crawler, k: int = ANCHOR_TOPK, pairs=None):
    """(url, token, n): the top-``k`` anchor-text terms per crawled
    page by incoming-anchor term frequency (ties to the smaller
    token) — the anchor-text profile every link-based retrieval /
    spam-analysis pipeline builds.

    Scale shape: mergeable per-batch (dst, token) count partials, ONE
    exchange keyed by dst (a page's terms co-locate), vectorized
    per-bucket sort + grouped head-k."""
    from ..stages.aggregates import hash_bucket_aggregate

    if pairs is None:
        pairs = crawl_anchor_pairs(ray, crawler)
    n_pairs = pairs.count()
    if n_pairs == 0:
        return pa.table({"url": pa.array([], pa.string()),
                         "token": pa.array([], pa.string()),
                         "n": pa.array([], pa.int64())})

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby(["dst", "token"], as_index=False).size()
        return g.rename(columns={"size": "n"})

    def merge(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby(["dst", "token"], as_index=False)["n"].sum()
        g = g.sort_values(["dst", "n", "token"],
                          ascending=[True, False, True],
                          kind="mergesort")
        return g.groupby("dst", as_index=False).head(k)

    out = hash_bucket_aggregate(pairs, ["dst"], partial, merge=merge,
                                n_rows=n_pairs)
    return (out.map_batches(
                lambda t: t.rename_columns(["url", "token", "n"]),
                batch_format="pyarrow")
               .sort(["url", "n", "token"],
                     descending=[False, True, False]))


# ---------------------------------------------------------------------------
def crawl_host_graph(ray, crawler, edges=None):
    """(src_host, dst_host, n_links): the HOST-LEVEL link graph — the
    page graph collapsed to hosts with page-edge multiplicities
    (intra-host edges included; the form web graphs actually ship in,
    and the input every host-reputation / link-spam analysis wants).

    Scale shape: host extraction is a vectorized per-batch map over
    the edge list (the SAME naive scheme://host split the reference
    uses, validated by url_algebra); ONE bucketed exchange keyed by
    the host pair sums the mergeable partial counts."""
    from ..functions.urls import split_host_resource
    from ..stages.aggregates import hash_bucket_aggregate

    if edges is None:
        edges = crawl_link_edges(ray, crawler)
    edges_ds, _n = edges

    def hosts(t: pa.Table) -> pd.DataFrame:
        sh = [split_host_resource(u)[0]
              for u in t.column("src").to_pylist()]
        dh = [split_host_resource(u)[0]
              for u in t.column("dst").to_pylist()]
        g = pd.DataFrame({"src_host": sh, "dst_host": dh,
                          "n_links": np.ones(len(sh), dtype="int64")})
        return g.groupby(["src_host", "dst_host"], as_index=False).sum()

    def merge(df: pd.DataFrame) -> pd.DataFrame:
        return df.groupby(["src_host", "dst_host"], as_index=False).sum()

    return hash_bucket_aggregate(
        edges_ds.map_batches(hosts, batch_format="pyarrow"),
        ["src_host", "dst_host"], merge,
        n_rows=edges_ds.count()).sort(["src_host", "dst_host"])


# ---------------------------------------------------------------------------
HITS_ITERS = 2


def crawl_hits(ray, crawler, iters: int = HITS_ITERS, k: int = 20,
               edges=None):
    """Top-k (url, authority, hub) by UNNORMALIZED integer HITS
    (Kleinberg 1999): h0 = 1 everywhere, then alternately
    a = sum of in-neighbors' h and h = sum of out-neighbors' a,
    ``iters`` full rounds. Skipping the float normalization keeps
    every value an exact integer sum (the ranking is identical —
    normalization is a positive scalar); magnitudes grow like
    deg^(2*iters), so iters=2 stays far inside int64 for web-scale
    degree distributions (the SQL oracle's HUGEINT has headroom
    beyond that).

    Scale shape per half-step: ONE hash join of the edge list against
    the current score table + ONE bucketed sum — the pagerank skeleton
    without the leftover redistribution."""
    from ray.data.aggregate import Sum  # noqa: F401  (parity w/ pagerank)

    from ..stages.aggregates import (
        hash_bucket_aggregate,
        join_partitions_for,
        normalize_for_join,
    )

    if edges is None:
        edges = crawl_link_edges(ray, crawler)
    edges, n_nodes = edges
    corpus = crawler.crawled_dataset()
    nparts = join_partitions_for(min(n_nodes, edges.count()))
    _E2 = pa.schema([("src", pa.string()), ("dst", pa.string())])
    ed = normalize_for_join(
        edges.map_batches(lambda t: t.select(["src", "dst"]),
                          batch_format="pyarrow"), _E2).materialize()

    def const_scores(ds, val):
        return normalize_for_join(
            ds.map_batches(
                lambda t: pa.table({
                    "url": t.column("url"),
                    "score": pa.array(np.full(t.num_rows, val,
                                              dtype=np.int64))}),
                batch_format="pyarrow"),
            pa.schema([("url", pa.string()),
                       ("score", pa.int64())])).materialize()

    def push(scores, key_in, key_out):
        """sum scores of ``key_in``-neighbors onto ``key_out`` nodes."""
        joined = ed.join(
            scores.map_batches(
                lambda t: t.rename_columns([key_in, "score"]),
                batch_format="pyarrow"),
            join_type="inner", on=(key_in,), num_partitions=nparts)

        def project(t: pa.Table) -> pd.DataFrame:
            g = pd.DataFrame({
                "url": t.column(key_out).to_pylist(),
                "score": t.column("score").to_numpy(
                    zero_copy_only=False).astype("int64")})
            return g.groupby("url", as_index=False).sum()

        return normalize_for_join(
            hash_bucket_aggregate(
                joined.map_batches(project, batch_format="pyarrow"),
                ["url"],
                lambda df: df.groupby("url", as_index=False).sum(),
                n_rows=ed.count()),
            pa.schema([("url", pa.string()),
                       ("score", pa.int64())])).materialize()

    nodes = corpus.map_batches(lambda t: t.select(["url"]),
                               batch_format="pyarrow").materialize()
    h = const_scores(nodes, 1)
    a = None
    for _ in range(iters):
        a = push(h, "src", "dst")     # authorities from hubs
        h = push(a, "dst", "src")     # hubs from authorities

    # densify + pair up: nodes left-join authority and hub, zeros fill
    av = a.map_batches(lambda t: t.rename_columns(["url", "authority"]),
                       batch_format="pyarrow")
    hv = h.map_batches(lambda t: t.rename_columns(["url", "hub"]),
                       batch_format="pyarrow")
    out = normalize_for_join(
        nodes, pa.schema([("url", pa.string())])).join(
        normalize_for_join(av, pa.schema(
            [("url", pa.string()), ("authority", pa.int64())])),
        join_type="left_outer", on=("url",),
        num_partitions=join_partitions_for(
            max(1, min(n_nodes, a.count()))))
    out = out.join(
        normalize_for_join(hv, pa.schema(
            [("url", pa.string()), ("hub", pa.int64())])),
        join_type="left_outer", on=("url",),
        num_partitions=join_partitions_for(
            max(1, min(n_nodes, h.count()))))

    def fill(t: pa.Table) -> pa.Table:
        def z(col):
            v = t.column(col).to_numpy(zero_copy_only=False)
            return np.nan_to_num(v.astype(np.float64),
                                 nan=0).astype(np.int64)

        return pa.table({"url": t.column("url"),
                         "authority": pa.array(z("authority")),
                         "hub": pa.array(z("hub"))})

    return (out.map_batches(fill, batch_format="pyarrow")
               .sort(["authority", "url"], descending=[True, False])
               .limit(k))


# ---------------------------------------------------------------------------
def crawl_indegree_hist(ray, crawler, edges=None):
    """(in_deg, n_pages): IN-DEGREE distribution of the crawled link
    graph, zero-indegree pages included — the authority-spread twin of
    crawl_degree_hist (out-degree): a heavy right tail here is the
    supernode warning for every dst-keyed join/propagation.

    Scale shape: identical to the out-degree kernel — per-batch dst
    count partials, zero-marker union, ONE bucketed max-merge, tiny
    grouped count."""
    from ray.data.aggregate import Sum

    from ..stages.aggregates import hash_bucket_aggregate

    if edges is None:
        edges = crawl_link_edges(ray, crawler)
    edges_ds, n_nodes = edges

    def dst_deg(t: pa.Table) -> pd.DataFrame:
        g = pd.DataFrame({"url": t.column("dst").to_pylist(),
                          "deg": np.ones(t.num_rows, dtype="int64")})
        return g.groupby("url", as_index=False).sum()

    nodes = crawler.crawled_dataset().map_batches(
        lambda t: pa.table({
            "url": t.column("url"),
            "deg": pa.array(np.zeros(t.num_rows, dtype=np.int64))}),
        batch_format="pyarrow")

    both = (edges_ds.map_batches(dst_deg, batch_format="pyarrow")
            .union(nodes))
    per_url = hash_bucket_aggregate(
        both, ["url"],
        lambda df: df.groupby("url", as_index=False).sum(),
        n_rows=n_nodes + edges_ds.count())

    def hist(t: pa.Table) -> pd.DataFrame:
        g = pd.DataFrame({
            "in_deg": t.column("deg").to_numpy(zero_copy_only=False)
            .astype("int64"),
            "n_pages": np.ones(t.num_rows, dtype="int64")})
        return g.groupby("in_deg", as_index=False).sum()

    return (per_url.map_batches(hist, batch_format="pyarrow")
            .groupby("in_deg")
            .aggregate(Sum("n_pages", alias_name="n_pages"))
            .sort("in_deg"))


# ---------------------------------------------------------------------------
def crawl_edge_locality(ray, crawler, edges=None):
    """(n_intra, n_inter, intra_bp): single-row EDGE LOCALITY — the
    share of page-level links staying on their own host, in integer
    basis points. High locality is what makes host-partitioned crawling
    and host-bucketed graph processing efficient; this measures it.

    Scale shape: vectorized host-split per batch, two O(1) partial
    counters per block, one Sum fold."""
    from ray.data.aggregate import Sum

    from ..functions.urls import split_host_resource

    if edges is None:
        edges = crawl_link_edges(ray, crawler)
    edges_ds, _n = edges

    def partial(t: pa.Table) -> pd.DataFrame:
        sh = [split_host_resource(u)[0]
              for u in t.column("src").to_pylist()]
        dh = [split_host_resource(u)[0]
              for u in t.column("dst").to_pylist()]
        same = sum(1 for a, b in zip(sh, dh) if a == b)
        return pd.DataFrame({"n_intra": [int(same)],
                             "n_inter": [int(len(sh) - same)]})

    tot = edges_ds.map_batches(partial, batch_format="pyarrow") \
                  .aggregate(Sum("n_intra"), Sum("n_inter"))
    ni = int(tot["sum(n_intra)"] or 0)
    nx = int(tot["sum(n_inter)"] or 0)
    bp = (10000 * ni) // (ni + nx) if (ni + nx) else 0
    return pa.table({"n_intra": pa.array([ni], pa.int64()),
                     "n_inter": pa.array([nx], pa.int64()),
                     "intra_bp": pa.array([bp], pa.int64())})


def crawl_pivot_scc(ray, crawler, edges=None):
    """(url) members of the strongly connected component containing the
    PIVOT page — the lexicographically smallest crawled url — i.e. the
    FW∩BW step of the classic divide-and-conquer distributed SCC
    decomposition (Fleischer-Hendrickson-Pinar 2000): SCC(pivot) =
    forward-reachable(pivot) ∩ backward-reachable(pivot). Two
    distributed BFS passes over the crawled-to-crawled edge list (the
    second with edges reversed); only url rows ever move. On web
    graphs this one pivot typically captures the giant core SCC.

    Value-checked: two bounded recursive-CTE closures intersected in
    DuckDB over the dumped edge list."""
    from ..stages.aggregates import (
        distinct_keys,
        join_partitions_for,
        normalize_for_join,
    )

    _URL = pa.schema([("url", pa.string())])

    corpus = crawler.crawled_dataset().map_batches(
        lambda t: t.select(["url"]), batch_format="pyarrow").materialize()
    n_nodes = corpus.count()
    edges_ds, _ = edges if edges is not None \
        else crawl_link_edges(ray, crawler)
    edges_n = normalize_for_join(
        edges_ds.map_batches(lambda t: t.select(["src", "dst"]),
                             batch_format="pyarrow"),
        pa.schema([("src", pa.string()), ("dst", pa.string())])
    ).materialize()
    n_edges = edges_n.count()

    # pivot: distributed per-block min -> O(blocks) driver reduce
    pmin = corpus.map_batches(
        lambda t: pa.table({"url": pa.array(
            [min(t.column("url").to_pylist())] if t.num_rows else [],
            pa.string())}), batch_size=None,
        batch_format="pyarrow").to_pandas()
    pivot = min(pmin["url"]) if len(pmin) else None
    if pivot is None:
        return pa.table({"url": pa.array([], pa.string())})

    def bfs_set(src_col: str, dst_col: str):
        """Set of urls reachable from the pivot following
        src_col -> dst_col edges (the reverse pass just swaps roles)."""
        start = normalize_for_join(
            ray.data.from_arrow(pa.table({"url": pa.array([pivot])})),
            _URL).materialize()
        seen, frontier = start, start
        if n_edges == 0:
            return seen
        # fixpoint, not a depth cap: the oracle's recursive-CTE closure
        # is unbounded, so a diameter-heavy graph must not truncate the
        # Ray side (scc_decompose._bfs discipline); the empty-frontier
        # breaks below guarantee termination on any finite graph.
        while True:
            cand = (edges_n.join(
                        frontier.map_batches(
                            lambda t: t.rename_columns([src_col]),
                            batch_format="pyarrow"),
                        join_type="inner", on=(src_col,),
                        num_partitions=join_partitions_for(
                            max(1, min(n_edges, frontier.count()))))
                    .map_batches(
                        lambda t: t.select([dst_col]).rename_columns(
                            ["url"]), batch_format="pyarrow"))
            cand = normalize_for_join(
                distinct_keys(cand, "url", n_rows=n_nodes), _URL
            ).materialize()
            if cand.count() == 0:
                break
            new = cand.join(
                seen, join_type="left_anti", on=("url",),
                num_partitions=join_partitions_for(
                    max(1, min(cand.count(), seen.count())))
            ).materialize()
            if new.count() == 0:
                break
            seen = normalize_for_join(seen.union(new), _URL).materialize()
            frontier = new
        return seen

    fwd = bfs_set("src", "dst")
    bwd = bfs_set("dst", "src")
    scc = fwd.join(bwd, join_type="inner", on=("url",),
                   num_partitions=join_partitions_for(
                       max(1, min(fwd.count(), bwd.count()))))
    return scc.sort("url")


def _scc_driver_tarjan(ep: "pd.DataFrame", nodes: list[str]) -> pa.Table:
    """Iterative Tarjan SCC over a driver-held edge list — the
    budget-gated finishing fold of ``crawl_scc`` (dedup_clusters
    union-find precedent). Returns (url, scc_id=min member url)."""
    import pandas as pd  # noqa: F401  (annotation only)

    idx = {u: i for i, u in enumerate(nodes)}
    n = len(nodes)
    adj: list[list[int]] = [[] for _ in range(n)]
    for s, d in zip(ep["src"], ep["dst"]):
        si, di = idx.get(s), idx.get(d)
        if si is not None and di is not None and si != di:
            adj[si].append(di)
    index = [-1] * n
    low = [0] * n
    on_stack = [False] * n
    stack: list[int] = []
    comp = [-1] * n
    counter = [0]
    comps: list[list[int]] = []
    for root in range(n):
        if index[root] != -1:
            continue
        # explicit-stack Tarjan (recursion depth == graph size)
        work = [(root, 0)]
        while work:
            v, pi = work[-1]
            if pi == 0:
                index[v] = low[v] = counter[0]
                counter[0] += 1
                stack.append(v)
                on_stack[v] = True
            recurse = False
            for j in range(pi, len(adj[v])):
                w = adj[v][j]
                if index[w] == -1:
                    work[-1] = (v, j + 1)
                    work.append((w, 0))
                    recurse = True
                    break
                if on_stack[w]:
                    low[v] = min(low[v], index[w])
            if recurse:
                continue
            if low[v] == index[v]:
                grp = []
                while True:
                    w = stack.pop()
                    on_stack[w] = False
                    grp.append(w)
                    if w == v:
                        break
                comps.append(grp)
            work.pop()
            if work:
                p = work[-1][0]
                low[p] = min(low[p], low[v])
    for grp in comps:
        label = min(nodes[i] for i in grp)
        for i in grp:
            comp[i] = label  # type: ignore[assignment]
    return pa.table({"url": pa.array(nodes, pa.string()),
                     "scc_id": pa.array([comp[i] for i in range(n)],
                                        pa.string())})


def scc_decompose(ray, nodes_ds, edges_ds, max_pivots: int = 8,
                  max_trim_iters: int = 64,
                  driver_budget_bytes: int = 64 << 20):
    """(url, scc_id) FULL SCC decomposition of an arbitrary directed
    graph — nodes_ds: (url), edges_ds: (src, dst). The classic
    distributed recipe (Fleischer-Hendrickson-Pinar 2000 FW-BW
    divide-and-conquer + the trim step of the parallel-SCC literature),
    with the budget-gated driver fold FIRST (dedup_clusters precedent):

    0. A graph whose edge+node lists fit the broadcast budget folds to
       an exact iterative driver Tarjan immediately.
    1. Above budget — TRIM, iterated distributed: a remaining node
       absent from either endpoint side of the remaining edges cannot
       be in a nontrivial SCC — label it a singleton and drop it (two
       distinct-key sets + three joins per iteration; strips the
       acyclic fringe, which on web crawls is most pages).
    2. FW-BW pivots: pivot = min remaining url; SCC(pivot) = forward
       BFS ∩ backward BFS within the remaining set (the giant core SCC
       falls in the first round); re-restrict edges and repeat.
    3. As soon as the remainder fits the budget, driver Tarjan
       finishes it; pivots exhausted ABOVE budget fails loudly.
    """
    from ..stages.aggregates import (
        distinct_keys,
        join_partitions_for,
        normalize_for_join,
    )

    _URL = pa.schema([("url", pa.string())])
    _EDGE = pa.schema([("src", pa.string()), ("dst", pa.string())])
    _OUT = pa.schema([("url", pa.string()), ("scc_id", pa.string())])

    edges_cur = normalize_for_join(
        edges_ds.map_batches(
            lambda t: t.filter(pc.invert(pc.equal(
                t.column("src"), t.column("dst"))))
             .select(["src", "dst"]),
            batch_format="pyarrow"), _EDGE).materialize()
    remaining = normalize_for_join(
        nodes_ds.map_batches(lambda t: t.select(["url"]),
                             batch_format="pyarrow"), _URL).materialize()
    n_rem = remaining.count()
    n_e = edges_cur.count()
    labeled_parts: list = []

    def _under_budget() -> bool:
        return (n_e * 48 + n_rem * 48) <= driver_budget_bytes

    def _driver_finish():
        ep = edges_cur.to_pandas()
        nodes = sorted(remaining.to_pandas()["url"])
        return ray.data.from_arrow(_scc_driver_tarjan(ep, nodes))

    def _jp(a: int, b: int) -> int:
        return join_partitions_for(max(1, min(a, b)))

    def _self_label(ds):
        return ds.map_batches(
            lambda t: pa.table({"url": t.column("url"),
                                "scc_id": t.column("url")}),
            batch_format="pyarrow")

    def _restrict_edges():
        """Edges with BOTH endpoints still in ``remaining``."""
        e1 = edges_cur.join(
            remaining.map_batches(lambda t: t.rename_columns(["src"]),
                                  batch_format="pyarrow"),
            join_type="inner", on=("src",), num_partitions=_jp(n_e, n_rem))
        e1 = normalize_for_join(e1, _EDGE).materialize()
        e2 = e1.join(
            remaining.map_batches(lambda t: t.rename_columns(["dst"]),
                                  batch_format="pyarrow"),
            join_type="inner", on=("dst",),
            num_partitions=_jp(e1.count(), n_rem))
        return normalize_for_join(e2, _EDGE).materialize()

    # ---- 1. iterated trim (only above budget) -----------------------
    trim_iters = 0
    while not _under_budget() and trim_iters < max_trim_iters \
            and n_rem > 0 and n_e > 0:
        srcs = normalize_for_join(distinct_keys(
            edges_cur.map_batches(
                lambda t: t.select(["src"]).rename_columns(["url"]),
                batch_format="pyarrow"), "url", n_rows=n_e), _URL
        ).materialize()
        dsts = normalize_for_join(distinct_keys(
            edges_cur.map_batches(
                lambda t: t.select(["dst"]).rename_columns(["url"]),
                batch_format="pyarrow"), "url", n_rows=n_e), _URL
        ).materialize()
        keep = normalize_for_join(
            srcs.join(dsts, join_type="inner", on=("url",),
                      num_partitions=_jp(srcs.count(), dsts.count())),
            _URL).materialize()
        n_keep = keep.count()
        if n_keep == n_rem:
            break
        dropped = remaining.join(
            keep, join_type="left_anti", on=("url",),
            num_partitions=_jp(n_rem, max(1, n_keep))).materialize()
        labeled_parts.append(_self_label(dropped).materialize())
        remaining, n_rem = keep, n_keep
        if n_rem:
            edges_cur = _restrict_edges()
            n_e = edges_cur.count()
        trim_iters += 1

    # ---- 2. FW-BW pivot rounds (only above budget) ------------------
    def _bfs(pivot: str, src_col: str, dst_col: str):
        start = normalize_for_join(
            ray.data.from_arrow(pa.table({"url": pa.array([pivot])})),
            _URL).materialize()
        seen, frontier = start, start
        if n_e == 0:
            return seen
        while True:
            cand = edges_cur.join(
                frontier.map_batches(
                    lambda t, _c=src_col: t.rename_columns([_c]),
                    batch_format="pyarrow"),
                join_type="inner", on=(src_col,),
                num_partitions=_jp(n_e, frontier.count())).map_batches(
                    lambda t, _c=dst_col: pa.table(
                        {"url": t.column(_c)}), batch_format="pyarrow")
            cand = normalize_for_join(
                distinct_keys(cand, "url", n_rows=n_e), _URL
            ).materialize()
            if cand.count() == 0:
                return seen
            new = cand.join(
                seen, join_type="left_anti", on=("url",),
                num_partitions=_jp(cand.count(), seen.count())
            ).materialize()
            if new.count() == 0:
                return seen
            seen = normalize_for_join(seen.union(new), _URL).materialize()
            frontier = new

    pivots = 0
    while n_rem > 0 and not _under_budget() and pivots < max_pivots:
        pmin = remaining.map_batches(
            lambda t: pa.table({"url": pa.array(
                [min(t.column("url").to_pylist())] if t.num_rows else [],
                pa.string())}), batch_size=None,
            batch_format="pyarrow").to_pandas()
        pivot = min(pmin["url"])
        fwd = _bfs(pivot, "src", "dst")
        bwd = _bfs(pivot, "dst", "src")
        scc = normalize_for_join(
            fwd.join(bwd, join_type="inner", on=("url",),
                     num_partitions=_jp(fwd.count(), bwd.count())),
            _URL).materialize()
        labeled_parts.append(scc.map_batches(
            lambda t, _p=pivot: pa.table(
                {"url": t.column("url"),
                 "scc_id": pa.array([_p] * t.num_rows, pa.string())}),
            batch_format="pyarrow").materialize())
        remaining = remaining.join(
            scc, join_type="left_anti", on=("url",),
            num_partitions=_jp(n_rem, scc.count())).materialize()
        n_rem = remaining.count()
        if n_rem:
            edges_cur = _restrict_edges()
            n_e = edges_cur.count()
        pivots += 1

    # ---- 3. budget-gated driver finish ------------------------------
    if n_rem > 0:
        if not _under_budget():
            raise RuntimeError(
                f"scc_decompose: {n_rem} nodes / {n_e} edges remain "
                f"above the driver budget after {max_pivots} pivots — "
                "raise max_pivots (each round removes one SCC)")
        labeled_parts.append(_driver_finish())

    if not labeled_parts:
        return ray.data.from_arrow(_OUT.empty_table())
    out = labeled_parts[0]
    for p in labeled_parts[1:]:
        out = out.union(p)
    return normalize_for_join(out, _OUT).sort("url")


def crawl_scc(ray, crawler, edges=None, **kw):
    """(url, scc_id): FULL SCC decomposition of the crawled link graph
    (``scc_decompose`` over the crawled-to-crawled edges; scc_id =
    minimum member url). Value-checked: recursive-CTE transitive
    closure + mutual-pair min-label DuckDB oracle."""
    corpus = crawler.crawled_dataset().map_batches(
        lambda t: t.select(["url"]), batch_format="pyarrow").materialize()
    edges_ds, _ = edges if edges is not None \
        else crawl_link_edges(ray, crawler)
    return scc_decompose(ray, corpus, edges_ds, **kw)
