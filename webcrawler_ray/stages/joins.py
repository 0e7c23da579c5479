"""Adaptive join planning: broadcast the small side when it fits, hash
shuffle both sides when it doesn't — decided from CHEAP STATISTICS
(parquet footer bytes / row counts), never a guess.

At 100 TB the single most expensive accidental query-plan mistake is a
shuffle join against a dimension table that would have fit in every
task's memory (two all-to-all exchanges instead of zero), and the
second most expensive is the reverse — broadcasting a "dimension" that
grew past worker heap. ``auto_join`` makes the choice explicit,
observable (returns which plan ran) and threshold-driven.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

# default ceiling for a broadcast build side: comfortably inside a
# worker heap next to a 128 MB block and the batch being joined
BROADCAST_MAX_BYTES = 64 << 20


def estimate_bytes(tbl: pa.Table) -> int:
    return tbl.nbytes


def auto_join(ray, left, right_table: pa.Table | None, on: list[str],
              n_rows_left: int, right_ds=None,
              right_bytes: int | None = None,
              broadcast_max_bytes: int = BROADCAST_MAX_BYTES,
              how: str = "inner"):
    """Join ``left`` (a Dataset) with a build side given EITHER as an
    in-memory ``right_table`` (already collected by the caller — only
    sensible when the caller knows it is dimension-sized) or as a lazy
    ``right_ds`` Dataset plus a cheap ``right_bytes`` estimate.

    Plan choice:
      * build side bytes <= ``broadcast_max_bytes``: BROADCAST — the
        build table ships to the object store ONCE (ray.put), every
        left batch joins against it map-side (pandas merge per batch;
        zero shuffles).
      * otherwise: SHUFFLE — ``Dataset.join`` with partition count
        sized from the smaller side's rows.

    Returns ``(joined_dataset, plan)`` with plan in
    {"broadcast", "shuffle"} so callers/tests can assert the path."""
    from .aggregates import join_partitions_for

    if right_table is not None and right_bytes is None:
        right_bytes = estimate_bytes(right_table)
    if right_bytes is None:
        raise ValueError("need right_table or right_bytes")

    if right_bytes <= broadcast_max_bytes and right_table is not None:
        rdf = right_table.to_pandas()
        ref = ray.put(rdf)

        def bjoin(batch: pd.DataFrame) -> pd.DataFrame:
            r = ray.get(ref)
            return batch.merge(r, on=list(on), how=how)

        return (left.map_batches(bjoin, batch_format="pandas",
                                 batch_size=65536), "broadcast")

    if right_ds is None:
        # caller collected the table but it is too big to broadcast —
        # turn it back into a Dataset for the shuffle path
        right_ds = ray.data.from_arrow(right_table)
    joined = left.join(right_ds, join_type=how, on=tuple(on),
                       num_partitions=join_partitions_for(n_rows_left))
    return joined, "shuffle"


def key_membership_filter(ray, ds, key_col: str, keys_sorted,
                          keep_matched: bool):
    """SEMI (``keep_matched``) / ANTI row filter of ``ds`` against a
    BROADCAST sorted-unique key array — the zero-shuffle replacement
    for a semi/anti join whose build side fits the broadcast budget
    (``ray.put`` once, vectorized searchsorted per batch). THE one
    spelling of the idiom shared by the snapshot delete reader, FK
    audits and NOT-IN-style subqueries."""
    import numpy as np

    ref = ray.put(keys_sorted)

    def f(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or key_col not in t.column_names:
            return t
        k = ray.get(ref)
        v = t.column(key_col).to_numpy(zero_copy_only=False)
        if len(k) == 0:
            m = np.zeros(len(v), dtype=bool)
        else:
            idx = np.searchsorted(k, v)
            idx[idx == len(k)] = 0
            m = k[idx] == v
        return t.filter(pa.array(m if keep_matched else ~m))

    return ds.map_batches(f, batch_format="pyarrow")


def auto_join_ds(ray, left, right_ds, on: list[str], n_right: int,
                 row_bytes_est: int = 64, how: str = "inner",
                 broadcast_max_bytes: int = BROADCAST_MAX_BYTES):
    """``auto_join`` for a DERIVED build side that already exists as a
    (small, typically filtered/aggregated) Dataset with a known or
    bounded row count: when ``n_right * row_bytes_est`` fits the
    broadcast budget the build side is collected ONCE (bounded by that
    same budget) and joined map-side; otherwise ``Dataset.join``. The
    row-count gate runs BEFORE any collect, so the driver never holds
    more than the broadcast budget."""
    from .aggregates import join_partitions_for

    if n_right * row_bytes_est <= broadcast_max_bytes:
        rdf = right_ds.to_pandas()
        ref = ray.put(rdf)

        def bjoin(batch: pd.DataFrame) -> pd.DataFrame:
            return batch.merge(ray.get(ref), on=list(on), how=how)

        return (left.map_batches(bjoin, batch_format="pandas",
                                 batch_size=65536), "broadcast")
    joined = left.join(right_ds, join_type=how, on=tuple(on),
                       num_partitions=join_partitions_for(n_right))
    return joined, "shuffle"
