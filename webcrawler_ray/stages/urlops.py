"""Vectorized URL-algebra batch UDFs (M1-M4, SH1 key computation) used in
``map_batches(batch_format="pyarrow")`` stages.

All batch fns are Arrow-in / Arrow-out; per-row Python string work is
limited to the small URL columns (never the html payload)."""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..functions.urls import (
    split_host_resource,
    stable_hash64_batch,
)


def add_host_resource(batch: pa.Table) -> pa.Table:
    """Derive (host, resource) from the url column (M2 naive split)."""
    urls = batch.column("url").to_pylist()
    hosts = np.empty(len(urls), dtype=object)
    ress = np.empty(len(urls), dtype=object)
    for i, u in enumerate(urls):
        h, r = split_host_resource(u)
        hosts[i] = h
        ress[i] = r
    out = batch.append_column("host", pa.array(hosts, pa.string()))
    return out.append_column("resource", pa.array(ress, pa.string()))


def add_url_hash(batch: pa.Table, col: str = "url",
                 out_col: str = "url_hash") -> pa.Table:
    """Stable 64-bit url hash (seen-set shard key), as uint64."""
    h = stable_hash64_batch(batch.column(col).to_pylist())
    return batch.append_column(out_col, pa.array(h, pa.uint64()))


def add_shard_columns(batch: pa.Table, num_seen_shards: int,
                      num_politeness_shards: int) -> pa.Table:
    """Add seen-shard (by url hash) and politeness-shard (by host hash)."""
    if "url_hash" not in batch.column_names:
        batch = add_url_hash(batch)
    uh = batch.column("url_hash").to_numpy(zero_copy_only=False)
    hh = stable_hash64_batch(batch.column("host").to_pylist())
    batch = batch.append_column(
        "sshard", pa.array((uh % num_seen_shards).astype(np.int32), pa.int32()))
    return batch.append_column(
        "pshard", pa.array((hh % num_politeness_shards).astype(np.int32), pa.int32()))


def drop_columns_if_present(batch: pa.Table, cols) -> pa.Table:
    keep = [c for c in batch.column_names if c not in set(cols)]
    return batch.select(keep)
