"""Shared parquet-read helper.

Parquet files written by pandas carry a ``pandas`` schema-metadata blob;
``pa.Schema`` objects holding it are UNHASHABLE (``hash(schema)`` raises
``unhashable type: 'dict'``), which defeats Ray Data's block-schema
deduplication and logs ``Failed to hash the schemas`` from every stage.
Passing an explicit metadata-free (projected) schema to ``read_parquet``
keeps every downstream block schema hashable — no extra stage, no copy.
"""

from __future__ import annotations

import glob
import os

import pyarrow as pa
import pyarrow.parquet as pq


def _clamp_shuffle_aggregator_reservation() -> None:
    """Make hash-shuffle aggregator pools co-schedulable on the ACTUAL
    cluster.

    ray 2.49's hash-shuffle operators (every ``Dataset.join``) reserve
    per-aggregator logical CPU and memory from static estimates (a
    target-block-size partition guess of ~1 GiB x7, CPU proportional to
    partition count); at num_partitions ~ 64 a pool can demand ~500 GiB
    of logical memory / 240 logical CPUs. The pool needs EVERY
    aggregator alive before the shuffle makes progress, so on any
    cluster smaller than the estimate the join does not degrade — it
    deadlocks with part of the pool pending forever (observed: sf1
    PPJoin, 64 partitions, 87 GiB / 32-CPU node, ~0% CPU, no
    progress). A reservation the cluster cannot co-schedule is not
    conservative; clamping the per-aggregator num_cpus/memory so the
    WHOLE pool fits in 50% of the cluster's logical resources restores
    the estimator's protective intent — oversized partitions fall back
    to object-store spill / task queuing instead of livelock. Applied
    once at import (the base class covers join + hash-shuffle +
    hash-aggregate pools); reservations that already fit are kept."""
    try:
        from ray.data._internal.execution.operators.hash_shuffle import (
            HashShufflingOperatorBase,
        )
    except ImportError:  # internals moved in a future ray
        return
    if getattr(HashShufflingOperatorBase, "_wcr_clamped", False):
        return
    orig = HashShufflingOperatorBase._get_default_aggregator_ray_remote_args

    def clamped(self, *, num_partitions, num_aggregators,
                partition_size_hint=None):
        args = orig(self, num_partitions=num_partitions,
                    num_aggregators=num_aggregators,
                    partition_size_hint=partition_size_hint)
        try:
            import ray as _ray

            res = _ray.cluster_resources()
        except Exception:
            return args
        a = max(1, num_aggregators)
        total_cpu = res.get("CPU")
        if total_cpu and args.get("num_cpus"):
            # one POOL may reserve at most ~20% of cluster CPUs: joins
            # commonly run two pools concurrently (left+right inputs of
            # chained joins), and map/shuffle TASKS still need slots —
            # two 128-aggregator pools at ray's default 0.125 CPU each
            # reserve an entire 32-CPU node and deadlock the shuffle
            args["num_cpus"] = min(args["num_cpus"],
                                   max(0.01, 0.2 * total_cpu / a))
        total_mem = res.get("memory")
        if total_mem and args.get("memory"):
            # same 20%-per-pool rule as CPUs: the memory reservation is
            # a logical scheduling resource — two pools at 50% each
            # reserve the whole cluster and every memory-tagged task
            # pends forever (observed via `ray status`: 87.58/87.58 GiB
            # reserved, shuffle tasks starved)
            args["memory"] = min(int(args["memory"]),
                                 int(0.2 * total_mem / a))
        return args

    HashShufflingOperatorBase._get_default_aggregator_ray_remote_args = \
        clamped
    HashShufflingOperatorBase._wcr_clamped = True


_clamp_shuffle_aggregator_reservation()


def clean_schema(path, columns=None) -> pa.Schema:
    """Metadata-free (optionally projected) schema of a parquet file,
    directory, or file list — reads one footer only."""
    p = path[0] if isinstance(path, (list, tuple)) else path
    if os.path.isdir(p):
        files = sorted(glob.glob(os.path.join(p, "**", "*.parquet"),
                                 recursive=True))
        p = files[0]
    sch = pq.read_schema(p).remove_metadata()
    if columns:
        sch = pa.schema([sch.field(c) for c in columns])
    return sch


def corpus_cache_dir(sf_dir: str) -> str:
    """The ONE shared cache/dump root for derived data of a corpus
    (crawl workdirs, oracle dumps, windowed-op state, codec sinks).

    Resolution: ``$GRAFT_CACHE_DIR`` wins — on a multi-node cluster it
    MUST be a shared filesystem path, because distributed
    ``write_parquet`` tasks write dump files from every node; the
    default ``/tmp/webcrawler_ray_cache`` is correct only single-node.
    (The input directory itself would be the natural co-located default,
    the ``pages_path + "_store"`` pattern, but corpus inputs are
    commonly read-only mounts — so the root is a setting, not a
    sibling.) Layout: ``{root}/{basename(sf_dir)}/...`` so corpora keep
    separate namespaces."""
    root = os.environ.get("GRAFT_CACHE_DIR", "/tmp/webcrawler_ray_cache")
    return os.path.join(root, os.path.basename(os.path.normpath(sf_dir)))


_SMALL_ROWS_PER_BLOCK = 32_768
_SMALL_TABLE_BLOCKS_CAP = 64


def _num_rows(path) -> int:
    """Total rows from parquet footers only (no data read)."""
    paths = path if isinstance(path, (list, tuple)) else [path]
    total = 0
    for p in paths:
        if os.path.isdir(p):
            files = sorted(glob.glob(os.path.join(p, "**", "*.parquet"),
                                     recursive=True))
        else:
            files = [p]
        for f in files:
            total += pq.read_metadata(f).num_rows
    return total


def parquet_num_rows(path) -> int:
    """Public alias: exact row count from footers only — the cheap input
    for sizing shuffle fan-outs (buckets_for / join_partitions_for)."""
    return _num_rows(path)


def parquet_column_bytes(path, column: str) -> int:
    """Total UNCOMPRESSED bytes of one column from parquet footers only
    (no data read) — the cheap size proxy for sizing fan-outs whose
    shuffled row count tracks CONTENT volume (e.g. token partials) rather
    than the input row count."""
    paths = path if isinstance(path, (list, tuple)) else [path]
    total = 0
    for p in paths:
        if os.path.isdir(p):
            files = sorted(glob.glob(os.path.join(p, "**", "*.parquet"),
                                     recursive=True))
        else:
            files = [p]
        for f in files:
            md = pq.read_metadata(f)
            for rg in range(md.num_row_groups):
                g = md.row_group(rg)
                for ci in range(g.num_columns):
                    col = g.column(ci)
                    if col.path_in_schema == column:
                        total += col.total_uncompressed_size
    return total


def read_parquet_clean(ray, path, columns=None, **kw):
    """``ray.data.read_parquet`` with a metadata-free schema (see module
    docstring) and RIGHT-SIZED block counts for small tables: the
    default splitting gives ~CPU-count blocks, which turns every
    downstream sort/groupby of a small table into a 64-partition
    shuffle of near-empty blocks — each all-to-all then costs ~3 s of
    pure scheduling. Tables large enough to fill the default blocks
    keep Ray's own splitting. Drop-in replacement for every table read
    in this repo."""
    if "schema" not in kw:
        kw["schema"] = clean_schema(path, columns)
    if "override_num_blocks" not in kw:
        rows = _num_rows(path)
        if rows < _SMALL_TABLE_BLOCKS_CAP * _SMALL_ROWS_PER_BLOCK:
            kw["override_num_blocks"] = max(
                1, rows // _SMALL_ROWS_PER_BLOCK)
    return ray.data.read_parquet(path, columns=columns, **kw)


def union_by_name(dss, schemas=None):
    """UNION ALL BY NAME across Datasets with EVOLVED schemas — the
    read-side half of schema evolution (a v2 dataset that added
    columns unions with v1 archives; v1 rows null-fill the new
    columns, integer columns widen to the largest type seen).

    ``schemas``: optional list of pa.Schema (one per dataset) to avoid
    the ``ds.schema()`` metadata fetch when the caller already knows
    them. Column order of the result = first appearance across inputs.
    Each input gets ONE vectorized map_batches that adds null columns /
    widens types; the union itself is metadata-only (no shuffle)."""
    if schemas is None:
        schemas = [ds.schema().base_schema for ds in dss]

    # unified schema: first-appearance order, widest integer type wins
    order: list[str] = []
    types: dict[str, pa.DataType] = {}
    for sch in schemas:
        for f in sch:
            if f.name not in types:
                order.append(f.name)
                types[f.name] = f.type
            elif types[f.name] != f.type:
                a, b = types[f.name], f.type
                if pa.types.is_integer(a) and pa.types.is_integer(b):
                    types[f.name] = a if a.bit_width >= b.bit_width else b
                elif (pa.types.is_floating(a)
                      and pa.types.is_integer(b)) or (
                          pa.types.is_integer(a)
                          and pa.types.is_floating(b)):
                    types[f.name] = a if pa.types.is_floating(a) else b
                else:
                    raise TypeError(
                        f"column {f.name!r}: cannot unify {a} and {b}")
    unified = pa.schema([(n, types[n]) for n in order])

    def align(t: pa.Table) -> pa.Table:
        cols = []
        for f in unified:
            if f.name in t.column_names:
                c = t.column(f.name)
                cols.append(c if c.type == f.type else c.cast(f.type))
            else:
                cols.append(pa.nulls(t.num_rows, f.type))
        return pa.table(dict(zip(unified.names, cols)))

    aligned = [ds.map_batches(align, batch_format="pyarrow")
               for ds in dss]
    out = aligned[0]
    for ds in aligned[1:]:
        out = out.union(ds)
    return out
