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

    edges = hash_bucket_aggregate(kept, ["src"], deg_group,
                                  n_rows=kept.count())
    return normalize_for_join(edges, _EDGE).materialize(), n_nodes


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


def crawl_pagerank(ray, crawler, iters: int = 5, k: int = 20):
    """Top-k (url, rank) by PageRank over the crawled graph — rows-only
    (iterative; no SQL equivalent) with an EXACT-equality property test
    against a single-process integer reference (possible because every
    per-round sum is integer and order-independent)."""
    ranks = pagerank(ray, crawler, iters=iters)
    return ranks.sort(["rank", "url"], descending=[True, False]).limit(k)
