"""Table profiling: per-column row/null/distinct counts and min/max in
one streaming pass plus one distinct exchange — the data-validation
operator (Great-Expectations-style column stats) a 100-TB ingest runs
before training, over the same engine as every other query.

Scale shape: count/null/min/max ride CONSTANT-size per-batch partials
(one row per column per batch, merged on the driver at O(blocks) cost).
COUNT(DISTINCT col) is the honest part — it costs a shuffle of the
distinct keys, so each column's values are reduced per batch
(drop_duplicates combiner), encoded as 8-byte int64 keys (the value
itself for integers, the IEEE bit pattern for doubles — EXACT, no hash
collisions), and exchanged once keyed by (col, key) hash bucket. All
profiled columns share ONE exchange; the fan-out is sized from the
table's footer row count."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from ..io_utils import parquet_num_rows as _nrows
from ..io_utils import read_parquet_clean as _rpq


def profile_table(ray, path: str, int_cols: list[str],
                  float_cols: list[str], ts_cols: list[str]):
    """(col, n_rows, n_null, n_distinct, min_val, max_val) per profiled
    column, sorted by col. min/max are reported as DOUBLE (timestamps as
    epoch microseconds — exact below 2^53 us, i.e. any date before
    year 2255); distinct/null counts follow SQL semantics (NULLs excluded
    from both DISTINCT and min/max)."""
    from ray.data.aggregate import Sum

    from ..stages.aggregates import hash_bucket_aggregate

    cols = list(int_cols) + list(float_cols) + list(ts_cols)
    ds = _rpq(ray, path, columns=cols)

    def to_keys(t: pa.Table) -> pa.Table:
        """One (col, key:int64) row per DISTINCT non-null value per batch
        (the combiner): ints keep their value, doubles their bit pattern
        (-0.0 normalized to 0.0 so the bit view matches SQL equality),
        timestamps their epoch-us int64."""
        names, keys = [], []
        for c in cols:
            arr = t.column(c)
            if c in ts_cols:
                v = arr.cast(pa.int64()).to_numpy(zero_copy_only=False)
            else:
                v = arr.to_numpy(zero_copy_only=False)
            mask = pd.isna(v)
            v = v[~mask]
            if v.dtype.kind == "f":
                v = v.copy()
                v[v == 0.0] = 0.0  # fold -0.0 into +0.0
                k = v.view(np.int64)
            else:
                k = v.astype(np.int64)
            k = np.unique(k)
            names.append(np.full(len(k), c, dtype=object))
            keys.append(k)
        return pa.table({
            "col": pa.array(np.concatenate(names), pa.string()),
            "key": pa.array(np.concatenate(keys), pa.int64())})

    def _dd(df: pd.DataFrame) -> pd.DataFrame:
        return df.drop_duplicates(["col", "key"])

    distinct = hash_bucket_aggregate(
        ds.map_batches(to_keys, batch_format="pyarrow"),
        ["col", "key"], _dd, n_rows=_nrows(path) * len(cols))

    def count_partial(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("col", as_index=False).size()
        return pd.DataFrame({"col": g["col"],
                             "n_distinct": g["size"].astype("int64")})

    n_distinct = (distinct
                  .map_batches(count_partial, batch_format="pandas")
                  .groupby("col")
                  .aggregate(Sum("n_distinct", alias_name="n_distinct"))
                  .to_pandas())  # one row per profiled column — tiny

    def stats_partial(t: pa.Table) -> pd.DataFrame:
        rows = []
        n = t.num_rows
        for c in cols:
            arr = t.column(c)
            if c in ts_cols:
                v = arr.cast(pa.int64()).to_numpy(zero_copy_only=False)
            else:
                v = arr.to_numpy(zero_copy_only=False)
            mask = pd.isna(v)
            nn = int(mask.sum())
            vv = v[~mask].astype(np.float64)
            rows.append({
                "col": c, "n_rows": n, "n_null": nn,
                "min_val": float(vv.min()) if len(vv) else np.inf,
                "max_val": float(vv.max()) if len(vv) else -np.inf})
        return pd.DataFrame(rows)

    stats = (ds.map_batches(stats_partial, batch_format="pyarrow",
                            batch_size=65536)
               .to_pandas())  # O(blocks * n_cols) rows — tiny
    agg = stats.groupby("col", as_index=False).agg(
        n_rows=("n_rows", "sum"), n_null=("n_null", "sum"),
        min_val=("min_val", "min"), max_val=("max_val", "max"))
    out = agg.merge(n_distinct, on="col", how="left")
    out["n_distinct"] = out["n_distinct"].fillna(0).astype("int64")
    # an all-NULL column leaves the +/-inf sentinels un-overridden:
    # report NULL (NaN), matching the SQL MIN/MAX-over-no-rows semantics
    allnull = out["n_null"] == out["n_rows"]
    out.loc[allnull, ["min_val", "max_val"]] = np.nan
    out = out[["col", "n_rows", "n_null", "n_distinct",
               "min_val", "max_val"]]
    out["n_rows"] = out["n_rows"].astype("int64")
    out["n_null"] = out["n_null"].astype("int64")
    return out.sort_values("col").reset_index(drop=True)


def events_profile(ray, sf_dir: str):
    """Column profile of the events table (the validation gate an ingest
    job runs before anything downstream trusts the data)."""
    return profile_table(ray, f"{sf_dir}/events.parquet",
                         int_cols=["event_id", "user_id"],
                         float_cols=["value"], ts_cols=["ts"])


def _one(col: str, expr: str) -> str:
    return (f"SELECT '{col}' AS col, COUNT(*) AS n_rows, "
            f"CAST(COUNT(*) - COUNT({expr}) AS BIGINT) AS n_null, "
            f"COUNT(DISTINCT {expr}) AS n_distinct, "
            f"CAST(MIN({expr}) AS DOUBLE) AS min_val, "
            f"CAST(MAX({expr}) AS DOUBLE) AS max_val FROM events")


EVENTS_PROFILE_SQL = (
    " UNION ALL ".join([
        _one("event_id", "event_id"),
        _one("user_id", "user_id"),
        _one("value", "value"),
        _one("ts", "epoch_us(ts)"),
    ]) + " ORDER BY col")
