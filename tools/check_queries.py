"""Driver-style side-by-side check: Ray query vs DuckDB oracle at a given sf.

Usage: python tools/check_queries.py [sf_dir] [query ...]
(no query args = every oracle-backed query, crawl included)

This mirrors the external driver's correctness gate: run the registry
callable AND its DuckDB oracle, sort columns by name, compare rows /
schema / values exactly.

Pass ``--json OUT.json`` to also write the per-query verdict matrix
(the committed ``SWEEP_rN.json`` artifact: one command regenerates the
full oracle-backed matrix for the next judge).
"""
import json
import sys

import duckdb
import numpy as np
import pandas as pd
import ray

args = sys.argv[1:]
json_out = None
if "--json" in args:
    i = args.index("--json")
    json_out = args[i + 1]
    del args[i:i + 2]
sf_dir = args[0] if args else "/root/testdata/sf0.01"
wanted = args[1:]

import os  # noqa: E402

ray.init(address="local",
         num_cpus=int(os.environ.get("RAY_CHECK_CPUS", "8")),
         include_dashboard=False, ignore_reinit_error=True)

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
sweep: dict = {}
for name in names:
    if name not in oracle:
        print(f"{name}: no oracle, skipping")
        sweep[name] = {"status": "no_oracle"}
        continue
    try:
        res = qs[name](sf_dir)
        if hasattr(res, "to_pandas") and not isinstance(res, pd.DataFrame):
            df = res.to_pandas()
        else:
            df = res
        odf = con.execute(oracle[name]).df()
    except Exception as exc:  # full-matrix sweeps must not die mid-run
        fails += 1
        sweep[name] = {"status": "ERROR", "error": repr(exc)[:300]}
        print(f"{name}: ERROR {exc!r}")
        continue
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
    sweep[name] = {"status": status, "rows": len(df),
                   "oracle_rows": len(odf), "rows_match": rows,
                   "schema_match": schema, "values_match": hash_ok}
    print(f"{name}: rows={rows}({len(df)}/{len(odf)}) schema={schema} "
          f"values={hash_ok} -> {status}")
    if not schema:
        print("  ray:", dict(df.dtypes.astype(str)))
        print("  ora:", dict(odf.dtypes.astype(str)))
    if rows and schema and not hash_ok:
        for line in err:
            print("   ", line)
if json_out:
    n_ok = sum(1 for v in sweep.values() if v.get("status") == "OK")
    with open(json_out, "w") as f:
        json.dump({"sf_dir": sf_dir, "n_checked": len(sweep),
                   "n_ok": n_ok, "n_fail": fails,
                   "results": sweep}, f, indent=1, sort_keys=True)
    print(f"wrote {json_out}: {n_ok}/{len(sweep)} OK")
ray.shutdown()
sys.exit(1 if fails else 0)
