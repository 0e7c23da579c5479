"""Deterministic sf1 synthesis: a 10x replication of the sf0.1 testdata
tables with CONSISTENT key offsets (FK structure preserved copy-by-copy)
— the scale-rehearsal input the sandbox lacks. No randomness, no
external data: copy i of every fact/dim row shifts each *key column by
i * (max_key + 1) with the SAME shift applied to every referencing
column, so joins/groupbys see a corpus 10x wide with the same
selectivities. Dimension tables region/nation stay fixed (their keys
are semantic enums). Document/embedding ids shift likewise; copy texts
get a per-copy suffix token so text-similarity workloads scale in rows
without degenerating into 10-way identical-text cliques.

    python tools/make_sf1.py [out_base]   # default /tmp/webcrawler_ray_sf1

Writes <out_base>/sf1/*.parquet ("sf1" basename keys the crawl-scale
table in the registry). Idempotent via a sig file.
"""

from __future__ import annotations

import os
import sys

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

SRC = "/root/testdata/sf0.1"
COPIES = 10
SIG = f"sf1v2|{SRC}|copies={COPIES}"

# TPC-H name columns are unique in-spec and several ORDER BY clauses
# lean on that; keep the invariant across copies (v2)
NAME_COLS = {"customer": "c_name", "supplier": "s_name",
             "part": "p_name"}

# table -> {column: key_space} ; columns sharing a key_space get the
# same per-copy offset so FK joins stay intact across tables
KEYED = {
    "customer": {"c_custkey": "cust"},
    "orders": {"o_orderkey": "order", "o_custkey": "cust"},
    "lineitem": {"l_orderkey": "order", "l_partkey": "part",
                 "l_suppkey": "supp"},
    "part": {"p_partkey": "part"},
    "supplier": {"s_suppkey": "supp"},
    "events": {"event_id": "event", "user_id": "user"},
    "documents": {"doc_id": "doc"},
    "embeddings": {"vec_id": "vec"},
}
FIXED = ["region", "nation"]


def _key_spans() -> dict[str, int]:
    spans: dict[str, int] = {}
    for tbl, cols in KEYED.items():
        t = pq.read_table(os.path.join(SRC, f"{tbl}.parquet"),
                          columns=list(cols))
        for col, space in cols.items():
            mx = pc.max(t.column(col)).as_py() or 0
            spans[space] = max(spans.get(space, 0), int(mx) + 1)
    return spans


def build(out_base: str = "/tmp/webcrawler_ray_sf1") -> str:
    out = os.path.join(out_base, "sf1")
    sigf = os.path.join(out_base, "sf1.sig")
    if os.path.isdir(out) and os.path.exists(sigf) \
            and open(sigf).read() == SIG:
        return out
    os.makedirs(out, exist_ok=True)
    spans = _key_spans()
    for tbl in FIXED:
        pq.write_table(pq.read_table(os.path.join(SRC, f"{tbl}.parquet")),
                       os.path.join(out, f"{tbl}.parquet"))
    for tbl, cols in KEYED.items():
        t = pq.read_table(os.path.join(SRC, f"{tbl}.parquet"))
        parts = []
        for i in range(COPIES):
            c = t
            for col, space in cols.items():
                idx = c.schema.get_field_index(col)
                shifted = pc.add(c.column(col),
                                 pa.scalar(i * spans[space],
                                           c.schema.field(col).type))
                c = c.set_column(idx, c.schema.field(col), shifted)
            if tbl in NAME_COLS and i > 0:
                col = NAME_COLS[tbl]
                j = c.schema.get_field_index(col)
                uniq = pc.binary_join_element_wise(
                    c.column(col).cast(pa.string()),
                    pa.scalar(f"#{i}"), "")
                c = c.set_column(j, c.schema.field(col), uniq)
            if tbl == "documents" and i > 0:
                idx = c.schema.get_field_index("text")
                txt = pc.binary_join_element_wise(
                    c.column("text").cast(pa.string()),
                    pa.scalar(f" rep{i}"), "")
                c = c.set_column(idx, c.schema.field("text"), txt)
                # keep the derived n_chars column consistent
                if "n_chars" in c.column_names:
                    j = c.schema.get_field_index("n_chars")
                    c = c.set_column(
                        j, c.schema.field("n_chars"),
                        pc.utf8_length(c.column("text")).cast(pa.int64()))
            parts.append(c)
        pq.write_table(pa.concat_tables(parts),
                       os.path.join(out, f"{tbl}.parquet"))
    with open(sigf, "w") as f:
        f.write(SIG)
    return out


if __name__ == "__main__":
    base = sys.argv[1] if len(sys.argv) > 1 else "/tmp/webcrawler_ray_sf1"
    print(build(base))
