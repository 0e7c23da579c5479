"""Driver-style side-by-side check: Ray query vs DuckDB oracle at a given sf.

Usage: python tools/check_queries.py [sf_dir] [query ...]
(no query args = every oracle-backed query, crawl included)

This mirrors the external driver's correctness gate: run the registry
callable AND its DuckDB oracle, sort columns by name, compare rows /
schema / values exactly.
"""
import sys

import duckdb
import numpy as np
import pandas as pd
import ray

sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
wanted = sys.argv[2:]

ray.init(address="local", num_cpus=8, include_dashboard=False,
         ignore_reinit_error=True)

sys.path.insert(0, "/root/repo")
import __ray_entry__ as E  # noqa: E402

qs = E.queries()
from webcrawler_ray.pipelines.registry import oracle_sql_for  # noqa: E402

# crawl oracles read the per-scale attempts dump: bind them to sf_dir
oracle = {k: v for k, v in oracle_sql_for(sf_dir).items() if v}

con = duckdb.connect()
for t in ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                f"read_parquet('{sf_dir}/{t}.parquet')")

names = wanted or [k for k in qs if k in oracle]
fails = 0
for name in names:
    if name not in oracle:
        print(f"{name}: no oracle, skipping")
        continue
    res = qs[name](sf_dir)
    if hasattr(res, "to_pandas") and not isinstance(res, pd.DataFrame):
        df = res.to_pandas()
    else:
        df = res
    odf = con.execute(oracle[name]).df()
    df = df[sorted(df.columns)].reset_index(drop=True)
    odf = odf[sorted(odf.columns)].reset_index(drop=True)
    rows = len(df) == len(odf)
    schema = list(df.columns) == list(odf.columns) and all(
        str(a) == str(b) for a, b in zip(df.dtypes, odf.dtypes))
    try:
        pd.testing.assert_frame_equal(df, odf, check_dtype=True)
        hash_ok = True
    except AssertionError as e:
        hash_ok = False
        err = str(e).splitlines()[:6]
    status = "OK" if (rows and schema and hash_ok) else "FAIL"
    if status == "FAIL":
        fails += 1
    print(f"{name}: rows={rows}({len(df)}/{len(odf)}) schema={schema} "
          f"values={hash_ok} -> {status}")
    if not schema:
        print("  ray:", dict(df.dtypes.astype(str)))
        print("  ora:", dict(odf.dtypes.astype(str)))
    if rows and schema and not hash_ok:
        for line in err:
            print("   ", line)
ray.shutdown()
sys.exit(1 if fails else 0)
