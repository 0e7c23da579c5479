"""Many-group aggregation that scales: hash-bucket the keys into a FEW
coarse partitions, then run a VECTORIZED (pandas/arrow) combine inside
each bucket.

Ray Data's native ``groupby(key).aggregate(...)`` keeps per-group Python
accumulator objects — ~1 ms per group — which is fine for tens of groups
and catastrophic for 10^4..10^9 groups (15k-group Sum measured 21 s on one
core). Bucketing by ``stable_hash(key) % num_buckets`` turns the shuffle
into a num_buckets-way exchange and the per-bucket work into one pandas
``groupby`` call, which is C-speed regardless of group count. This is the
default aggregation path for every many-group operator in this repo
(frontier dedup, per-orderkey rollups, LSH band buckets)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from ..functions.urls import stable_hash64_batch


_FIB = np.uint64(0x9E3779B97F4A7C15)


def _bucket_of(df_or_tbl, keys: list[str], num_buckets: int) -> np.ndarray:
    """Stable bucket id per row from the key columns (vectorized for
    integer keys; blake2b for strings/composites)."""
    if isinstance(df_or_tbl, pa.Table):
        cols = [df_or_tbl.column(k).to_pandas() for k in keys]
    else:
        cols = [df_or_tbl[k] for k in keys]
    if len(cols) == 1 and cols[0].dtype.kind in "iu":
        h = cols[0].to_numpy().astype(np.uint64) * _FIB
        return (h % np.uint64(num_buckets)).astype(np.int64)
    if len(cols) == 1:
        h = stable_hash64_batch([str(v) for v in cols[0]])
        return (h % num_buckets).astype(np.int64)
    joined = ["\x1f".join(str(v) for v in row) for row in zip(*cols)]
    return (stable_hash64_batch(joined) % num_buckets).astype(np.int64)


def int_bucket_column(values: np.ndarray, num_buckets: int) -> np.ndarray:
    """Stable coarse-bucket id for an INTEGER key column (Fibonacci
    multiplicative hash) — the ONE spelling of the idiom every bucketed
    window/exchange stage shares (a scheme change edits this line, not
    N inlined copies)."""
    return (values.astype(np.uint64) * _FIB
            % np.uint64(num_buckets)).astype(np.int64)


def buckets_for(n_rows: int | None, rows_per_bucket: int = 4096,
                lo: int | None = None, hi: int = 1024) -> int:
    """Shuffle fan-out sized from DATA, not a constant: each coarse
    bucket's map_groups task holds ~``rows_per_bucket`` rows in one
    pandas frame, so the per-task heap stays bounded as the input grows
    (a fixed 16/64-way fan-out makes one task hold 1/16..1/64 of the
    post-partial data — an OOM at 100x on a fat key column). ``n_rows``
    is the cheap parquet-footer count of the stage's INPUT — an upper
    bound on the post-partial rows actually shuffled, which is the safe
    direction. None (count genuinely unknown) falls back to 16.

    rows_per_bucket trades per-task heap against parallelism: 4096-row
    buckets keep mid-size inputs wide enough to fill a 32-CPU node
    (measured: 32k-row buckets collapsed the sf0.1 LSH band exchange to
    3 tasks and doubled its wall time) while the cap still bounds the
    task count at cluster scale. ``lo=None`` derives the floor from the
    cluster (2 x CPUs, clamped to [16, 128]) so the merge stage can
    always fill the machine even on small inputs."""
    if lo is None:
        lo = 16
        try:
            import ray

            if ray.is_initialized():
                cpus = int(ray.cluster_resources().get("CPU", 8))
                lo = max(16, min(128, 2 * cpus))
        except Exception:
            pass
    if n_rows is None:
        return max(lo, 16)
    return int(max(lo, min(hi, n_rows // rows_per_bucket + 1)))


def hash_bucket_aggregate(ds, keys: list[str], combine,
                          num_buckets: int | None = None,
                          batch_format: str = "pandas", merge=None,
                          n_rows: int | None = None, sidecar=None):
    """``combine(df) -> df``: a vectorized pandas aggregation over ``keys``
    (e.g. ``df.groupby(keys, as_index=False).sum()``), applied once per
    input batch (partial pre-aggregation). ``merge(df) -> df`` re-combines
    partials inside each bucket; defaults to ``combine`` (correct for
    sum/min/max). Aggregations whose merge differs from their map — e.g.
    count (merge = sum of partial counts) — must pass ``merge``.
    ``num_buckets`` defaults to ``buckets_for(n_rows)`` — pass the input
    row count (parquet_num_rows is footer-only) so the fan-out scales
    with data instead of being a constant.

    ``sidecar(bucket_id, merged_df)`` (optional) runs inside each
    bucket's merge task on its final frame — the piggyback slot for
    per-bucket summaries (e.g. a convergence metric shipped to an
    accumulator actor) that would otherwise cost a separate aggregation
    pass over the result. It must be idempotent per bucket (keyed by
    bucket_id) so a retried task cannot double-count."""
    merge = merge or combine
    if num_buckets is None:
        num_buckets = buckets_for(n_rows)

    # outputs go back to arrow with schema metadata STRIPPED: pandas->arrow
    # conversion attaches a `pandas` metadata dict that makes pa.Schema
    # unhashable and defeats Ray's block-schema dedup (io_utils docstring)
    def partial(batch: pd.DataFrame):
        if len(batch) == 0:
            # keep the __bucket column even on empty partials so an
            # ALL-empty input (e.g. greedy-cover round after full
            # coverage) still groupbys cleanly instead of failing on
            # a missing column
            batch = batch.assign(
                __bucket=pd.Series([], dtype="int64"))
            return pa.Table.from_pandas(
                batch, preserve_index=False).replace_schema_metadata(None)
        out = combine(batch)
        out = out.assign(__bucket=_bucket_of(out, keys, num_buckets))
        return pa.Table.from_pandas(
            out, preserve_index=False).replace_schema_metadata(None)

    def per_bucket(group: pd.DataFrame):
        g = merge(group.drop(columns=["__bucket"]))
        if sidecar is not None and len(group):
            sidecar(int(group["__bucket"].iloc[0]), g)
        return pa.Table.from_pandas(
            g, preserve_index=False).replace_schema_metadata(None)

    return (ds.map_batches(partial, batch_format=batch_format)
              .groupby("__bucket")
              .map_groups(per_bucket, batch_format="pandas"))


def join_partitions_for(n_rows: int, cap: int = 2048,
                        rows_per_partition: int = 16_384) -> int:
    """Safe, DATA-SIZED ``num_partitions`` for ``Dataset.join``: ray 2.49
    CRASHES when a join hash-partition receives zero rows on either side
    (its empty-partition table has no columns, so pyarrow's join can't
    find the key field). One partition is always safe; scaling as
    n_rows // 16384 keeps every partition statistically certain to see
    rows (the crash needs an empty one) while the partition count — and
    so the per-task join heap — tracks the input instead of a constant.
    ``n_rows`` should be the SMALLER side's (footer-cheap) row count.

    The cap is CLUSTER-AWARE: every partition costs an aggregator slot
    plus two shuffle tasks, so partitions beyond ~4x the cluster's CPUs
    are pure scheduling overhead (observed: a 30M-row sf1 join sized to
    1879 partitions starved a 32-CPU node); on a 256-node cluster the
    same rule leaves the data-sized count untouched."""
    try:
        import ray as _ray

        cpus = _ray.cluster_resources().get("CPU") \
            if _ray.is_initialized() else None
    except Exception:
        cpus = None
    if cpus:
        cap = min(cap, max(16, 4 * int(cpus)))
    return max(1, min(cap, n_rows // rows_per_partition))


def distinct_keys(ds, col: str, n_rows: int | None = None):
    """Distributed DISTINCT over one column: per-batch dedup combiner
    (one row per distinct key per batch leaves the scan) + bucketed
    distinct merge. ``n_rows`` should be the tightest cheap bound on the
    DISTINCT key count (e.g. the referenced dimension's footer row
    count), not the scanned table's total rows."""

    def _dd(df):
        return df.drop_duplicates([col])

    return hash_bucket_aggregate(
        ds.map_batches(_dd, batch_format="pandas"),
        [col], _dd, n_rows=n_rows)


def blocks_for_rows(n_rows: int, rows_per_block: int = 65_536,
                    lo: int = 8, hi: int = 512) -> int:
    """Repartition fan-out sized from DATA (the buckets_for principle
    applied to block counts): ~64k rows per block keeps every block a
    single sane Arrow table while the count — and with it both join
    parallelism and the per-task heap — scales with the input instead
    of being a constant."""
    return int(max(lo, min(hi, n_rows // rows_per_block + 1)))


def normalize_for_join(ds, schema: pa.Schema, num_blocks: int = 8,
                       n_rows: int | None = None):
    """Coerce every block of ``ds`` to exactly ``schema`` and rebalance.

    ``groupby().map_groups`` emits COLUMN-LESS empty pandas blocks for
    empty partitions; datasets carrying them break ``Dataset.join``
    ("No match ... for key field on right side") even when a map stage
    retypes each block — the join's partition build needs uniform block
    schemas, which only a repartition after the typed map guarantees.
    Use on any BOUNDED dataset headed into a join/union.

    ``n_rows`` (when the caller knows the row count — a materialized
    upstream makes it metadata-only) overrides the 8-block default
    with a data-sized count via ``blocks_for_rows`` so a LARGE table
    is never squeezed into 8 giant blocks (an OOM + parallelism
    ceiling at cluster scale)."""
    if n_rows is not None:
        num_blocks = blocks_for_rows(n_rows)

    def f(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return schema.empty_table()
        missing = set(schema.names) - set(t.column_names)
        if missing:
            # only EMPTY blocks may legitimately lack columns (map_groups'
            # column-less empties); a non-empty block missing an expected
            # column is an upstream rename/typo — dropping its rows here
            # would silently vanish data into the join
            raise ValueError(
                f"normalize_for_join: non-empty block is missing columns "
                f"{sorted(missing)} (has {t.column_names})")
        return t.select(schema.names).cast(schema)

    return (ds.map_batches(f, batch_format="pyarrow", batch_size=None)
              .repartition(num_blocks))


def first_key(t: pa.Table, key_cols: list[str]) -> tuple:
    """The lookup key for ``block_prefix_bases``: the block's first-row
    values of ``key_cols`` as plain-Python scalars."""
    return tuple(t.column(c)[0].as_py() for c in key_cols)


def block_prefix_bases(sorted_ds, key_cols: list[str],
                       ascending, weight=None, op: str = "sum") -> dict:
    """Driver-side EXCLUSIVE prefix scan of per-block weights over a
    SORTED, MATERIALIZED Dataset — the shared core of every global
    rank / offset / position assignment (sequence packing, distinctive-
    term positions, vocab ids, Z-order positions).

    One O(blocks) pass emits each block's first-row ``key_cols`` tuple
    plus its weight (row count by default, or ``weight(batch) -> int``
    e.g. a token-count sum). Summaries are re-ordered by the SAME sort
    spec the dataset was sorted with (``ascending`` is the per-key
    direction list / bool) — first-row keys are strictly increasing
    across blocks in that order because the dataset is globally sorted —
    and the exclusive cumsum of weights is returned as
    ``{first_key_tuple: base}``. The caller's second pass looks up
    ``bases[first_key(batch, key_cols)]`` and adds block-local offsets;
    the driver only ever holds one row per BLOCK, never per row.

    ``op="max"`` returns the exclusive running MAX instead (the
    watermark shape: each block's base is the largest weight of any
    EARLIER block, INT64_MIN for the first) — same two-pass protocol,
    different scan.

    Requires ``sorted_ds`` to be materialized: both passes (summary +
    assign) must see the identical block layout."""
    if isinstance(ascending, bool):
        ascending = [ascending] * len(key_cols)

    def summ_fn(t: pa.Table) -> pa.Table:
        first = t.slice(0, min(1, t.num_rows)).select(key_cols)
        w = ([] if t.num_rows == 0
             else [t.num_rows if weight is None else int(weight(t))])
        return first.append_column("__w", pa.array(w, pa.int64()))

    summ = (sorted_ds.map_batches(summ_fn, batch_size=None,
                                  batch_format="pyarrow")
                     .to_pandas()  # one row per block — tiny
                     .sort_values(key_cols, ascending=ascending,
                                  kind="mergesort"))
    w = summ["__w"].to_numpy()
    if op == "max":
        starts = np.r_[np.iinfo(np.int64).min,
                       np.maximum.accumulate(w)[:-1]].astype(np.int64)
    else:
        starts = np.r_[0, w[:-1].cumsum()].astype(np.int64)

    def _py(v):
        return v.item() if hasattr(v, "item") else v

    keys = zip(*(summ[c] for c in key_cols))
    return {tuple(_py(v) for v in k): int(o)
            for k, o in zip(keys, starts)}


# ---------------------------------------------------------------------------
def int_rank_select(ds, ranks: dict, col: str = "key",
                    bins: int = 1024) -> dict:
    """{name: the ranks[name]-th smallest value (1-based) of ``ds``'s
    int64 ``col``} — EXACT multi-rank selection with NO global sort and
    NO materialization: iterative partition-count refinement (the
    integer twin of the float rank-select on events.value).

    Each pass histograms every still-active rank's current [lo, hi]
    range into <= ``bins`` integer bins in ONE shared streamed read;
    the driver sums the tiny per-bin (count, realized min/max) tables
    and descends into the bin holding the target rank. Integer bins of
    width 1 pin their value exactly, so once a range narrows to
    <= ``bins`` distinct values the next pass finishes it — total
    passes are O(log_bins(key range)), each moving only per-bin
    summaries to the driver. This is the boundary-computation primitive
    for sort-free equi-depth partitioning / clustered writes."""
    from ray.data.aggregate import Max, Min

    if not ranks:
        return {}
    mm = ds.aggregate(Min(col), Max(col))
    if mm is None or mm.get(f"min({col})") is None:
        return {}
    gmin, gmax = int(mm[f"min({col})"]), int(mm[f"max({col})"])
    states = {p: {"lo": gmin, "hi": gmax, "base": 0,
                  "done": gmin == gmax, "value": gmin} for p in ranks}

    def hist_pass(snapshot):
        def f(t: pa.Table) -> pa.Table:
            v = t.column(col).to_numpy(zero_copy_only=False)
            o_p, o_b, o_c, o_lo, o_hi = [], [], [], [], []
            for p, st in snapshot.items():
                lo, hi = st["lo"], st["hi"]
                x = v[(v >= lo) & (v <= hi)]
                if len(x) == 0:
                    continue
                width = hi - lo + 1
                nb = min(bins, width)
                # integer bin index: monotone in x, exact; divide by a
                # ceil step (NOT multiply-then-divide, which overflows
                # int64 for wide 63-bit key ranges)
                step = -(-width // nb)
                b = (x - lo).astype(np.int64) // step
                for bi in np.unique(b):
                    xs = x[b == bi]
                    o_p.append(str(p))
                    o_b.append(int(bi))
                    o_c.append(len(xs))
                    o_lo.append(int(xs.min()))
                    o_hi.append(int(xs.max()))
            return pa.table({"pct": pa.array(o_p, pa.string()),
                             "bin": pa.array(o_b, pa.int64()),
                             "cnt": pa.array(o_c, pa.int64()),
                             "vmin": pa.array(o_lo, pa.int64()),
                             "vmax": pa.array(o_hi, pa.int64())})
        return f

    keymap = {str(p): p for p in ranks}
    for _ in range(64):
        snap = {p: dict(st) for p, st in states.items() if not st["done"]}
        if not snap:
            break
        hist = (ds.map_batches(hist_pass(snap), batch_format="pyarrow")
                .to_pandas())
        for sp, g in hist.groupby("pct"):
            p = keymap[sp]
            sub = (g.groupby("bin")
                   .agg(cnt=("cnt", "sum"), vmin=("vmin", "min"),
                        vmax=("vmax", "max"))
                   .sort_index())
            st = states[p]
            kk = ranks[p] - st["base"]
            cum = sub["cnt"].cumsum().to_numpy()
            j = int(np.searchsorted(cum, kk))
            st["base"] += int(cum[j - 1]) if j else 0
            st["lo"] = int(sub["vmin"].iloc[j])
            st["hi"] = int(sub["vmax"].iloc[j])
            if st["lo"] == st["hi"]:
                st["done"] = True
                st["value"] = st["lo"]
    return {p: states[p]["value"] for p in ranks}
