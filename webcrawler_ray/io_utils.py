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


def read_parquet_clean(ray, path, columns=None, **kw):
    """``ray.data.read_parquet`` with a metadata-free schema (see module
    docstring). Drop-in replacement for every table read in this repo."""
    if "schema" not in kw:
        kw["schema"] = clean_schema(path, columns)
    return ray.data.read_parquet(path, columns=columns, **kw)
