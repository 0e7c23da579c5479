"""Distributed probabilistic sketches — HyperLogLog distinct counting
(Flajolet-Fuchs-Gandouet-Meunier 2007, the standard bias-corrected
variant with linear-counting small-range correction).

Scale shape: each batch folds its values into one 2^P-register array
(one binary row out per batch — constant-size partials regardless of
batch size); the final merge is an elementwise register MAX over the
O(#blocks) partial rows. The exchange moves kilobytes however large the
input is — this is the sketch pattern the 100 TB counting path needs
(exact COUNT DISTINCT would shuffle every key).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..functions.urls import stable_hash64_batch
from ..io_utils import read_parquet_clean as _rpq

HLL_P = 12                      # 4096 registers, ~1.04/sqrt(m) = 1.6% err
_M = 1 << HLL_P
_ALPHA = 0.7213 / (1 + 1.079 / _M)


def _fold_registers(hashes: np.ndarray, regs: np.ndarray) -> None:
    """Fold uint64 hashes into the uint8 register array in place."""
    idx = (hashes >> np.uint64(64 - HLL_P)).astype(np.int64)
    w = hashes & np.uint64((1 << (64 - HLL_P)) - 1)
    m_bits = 64 - HLL_P
    # bit_length via float64 log2 — exact: w < 2^52 <= 2^53
    bl = np.zeros(len(w), dtype=np.int64)
    nz = w > 0
    bl[nz] = np.floor(np.log2(w[nz].astype(np.float64))).astype(np.int64) + 1
    rho = (m_bits - bl + 1).astype(np.uint8)
    np.maximum.at(regs, idx, rho)


def hll_estimate(regs: np.ndarray) -> float:
    """Bias-corrected HLL estimate with linear-counting correction."""
    est = _ALPHA * _M * _M / np.power(2.0, -regs.astype(np.float64)).sum()
    zeros = int((regs == 0).sum())
    if est <= 2.5 * _M and zeros > 0:
        est = _M * np.log(_M / zeros)
    return float(est)


def distinct_hll(ray, path: str, column: str, int_key: bool = True):
    """Single-row (n_distinct_est, n_registers) HLL distinct count of
    ``column`` in the parquet at ``path``."""
    ds = _rpq(ray, path, columns=[column])

    def partial(batch: pa.Table) -> pa.Table:
        regs = np.zeros(_M, dtype=np.uint8)
        col = batch.column(column)
        if int_key:
            v = col.to_numpy(zero_copy_only=False).astype(np.int64)
            # splitmix64-style scramble of the integer key
            h = v.astype(np.uint64)
            with np.errstate(over="ignore"):
                h = (h + np.uint64(0x9E3779B97F4A7C15))
                h ^= h >> np.uint64(30)
                h *= np.uint64(0xBF58476D1CE4E5B9)
                h ^= h >> np.uint64(27)
                h *= np.uint64(0x94D049BB133111EB)
                h ^= h >> np.uint64(31)
        else:
            h = stable_hash64_batch([str(x) for x in col.to_pylist()])
        _fold_registers(h, regs)
        return pa.table({"regs": pa.array([regs.tobytes()], pa.binary())})

    parts = ds.map_batches(partial, batch_format="pyarrow").to_pandas()
    merged = np.zeros(_M, dtype=np.uint8)
    for blob in parts["regs"]:  # O(#blocks) constant-size partials
        np.maximum(merged, np.frombuffer(blob, dtype=np.uint8),
                   out=merged)
    return pa.table({
        "n_distinct_est": pa.array([int(round(hll_estimate(merged)))],
                                   pa.int64()),
        "n_registers": pa.array([_M], pa.int64())})


def events_distinct_users_hll(ray, sf_dir: str):
    """HLL estimate of COUNT(DISTINCT user_id) over events (rows-only:
    approximate by design; the relative-error bound is unit-tested
    against the exact count)."""
    return distinct_hll(ray, f"{sf_dir}/events.parquet", "user_id")


def docs_distinct_texts_hll(ray, sf_dir: str):
    """HLL estimate of distinct document texts (string keys hashed with
    the repo's stable blake2b)."""
    return distinct_hll(ray, f"{sf_dir}/documents.parquet", "text",
                        int_key=False)


# ---------------------------------------------------------------------------
# t-digest quantiles (Dunning & Ertl, "Computing Extremely Accurate
# Quantiles Using t-Digests", 2019 — the clustering variant with the
# k1 arcsin scale function, fully vectorized).
#
# Scale shape: one constant-size (means, weights) centroid row per
# batch; merge = concatenate + sort + one vectorized re-cluster over
# O(blocks * delta) centroids. Like the HLL above, the exchange moves
# kilobytes regardless of input size — the mergeable-quantile path for
# inputs where the exact rank-select's O(log n) full re-scans
# (relational.events_value_percentiles) cost more than a ~1/delta rank
# error is worth.

TD_DELTA = 200  # <= ~delta/2+1 centroids; rank error O(1/delta), tighter at tails


def _td_cluster(v: np.ndarray, w: np.ndarray,
                delta: int = TD_DELTA) -> tuple[np.ndarray, np.ndarray]:
    """One vectorized t-digest clustering pass over value/weight arrays
    SORTED by value: each point lands in the cell floor(k1(q_mid)) of the
    arcsin scale function; cells are group-averaged with reduceat. The
    scale function's derivative blows up at q=0/1, so tail cells hold
    O(1) points — the property that makes extreme quantiles accurate."""
    total = w.sum()
    cum = np.cumsum(w)
    q = (cum - w / 2.0) / total
    k = (delta / (2.0 * np.pi)) * np.arcsin(2.0 * q - 1.0)
    cell = np.floor(k).astype(np.int64)
    # first index of each run of equal cell ids (input sorted => cells
    # are non-decreasing)
    starts = np.flatnonzero(np.diff(cell, prepend=cell[0] - 1))
    cw = np.add.reduceat(w, starts)
    cm = np.add.reduceat(v * w, starts) / cw
    return cm, cw


def _td_partial_fn(column: str, delta: int = TD_DELTA):
    def partial(batch: pa.Table) -> pa.Table:
        x = batch.column(column).to_numpy(zero_copy_only=False).astype(
            np.float64)
        x = x[~np.isnan(x)]
        if len(x) == 0:
            return pa.table({"means": pa.array([], pa.binary()),
                             "weights": pa.array([], pa.binary())})
        x = np.sort(x)
        m, w = _td_cluster(x, np.ones(len(x)), delta)
        return pa.table({"means": pa.array([m.tobytes()], pa.binary()),
                         "weights": pa.array([w.tobytes()], pa.binary())})

    return partial


def td_merge(parts_means, parts_weights,
             delta: int = TD_DELTA) -> tuple[np.ndarray, np.ndarray]:
    """Merge partial digests: concatenate centroids, sort by mean, one
    clustering pass. Deterministic (mergesort keeps equal means in blob
    order, and equal means are interchangeable under weighted average)."""
    m = np.concatenate([np.frombuffer(b, dtype=np.float64)
                        for b in parts_means])
    w = np.concatenate([np.frombuffer(b, dtype=np.float64)
                        for b in parts_weights])
    order = np.argsort(m, kind="mergesort")
    return _td_cluster(m[order], w[order], delta)


def td_quantile(means: np.ndarray, weights: np.ndarray, q: float) -> float:
    """Linear interpolation between centroid means at the target rank
    (centroid i sits at the midpoint of its weight span)."""
    cum = np.cumsum(weights) - weights / 2.0
    return float(np.interp(q * weights.sum(), cum, means))


def events_value_percentiles_tdigest(ray, sf_dir: str):
    """(pct, value): APPROXIMATE p25/p50/p75 of events.value via a
    distributed t-digest (rows-only: rank error <= ~1/delta by design;
    the bound is unit-tested against the exact rank-select result).
    Output schema matches events_value_percentiles."""
    import pandas as pd

    ds = _rpq(ray, f"{sf_dir}/events.parquet", columns=["value"])
    parts = ds.map_batches(_td_partial_fn("value"),
                           batch_format="pyarrow").to_pandas()
    if len(parts) == 0:
        return pd.DataFrame({"pct": pd.Series([], dtype="int64"),
                             "value": pd.Series([], dtype="float64")})
    m, w = td_merge(parts["means"], parts["weights"])
    return pd.DataFrame({
        "pct": pd.Series([25, 50, 75], dtype="int64"),
        "value": pd.Series([td_quantile(m, w, p / 100.0)
                            for p in (25, 50, 75)], dtype="float64")})


# ---------------------------------------------------------------------------
# Misra-Gries heavy hitters (Misra & Gries 1982; merge rule from
# Agarwal et al., "Mergeable Summaries", PODS 2012).
#
# Scale shape: each batch emits one k-counter summary (constant size);
# the merge concatenates summaries, sums counts per key, and subtracts
# the (k+1)-th largest count from every survivor (the mergeable-summary
# offset rule). Guarantee after any merge tree: every key with true
# frequency > n/(k+1) is present, and each reported count understates
# the true one by at most n/(k+1). The sketch path for "top terms over
# 100 TB" where doc_top_terms' exact token exchange is not worth it.

MG_K = 256  # counters per summary; error <= n/(k+1)


def _mg_truncate(tokens: np.ndarray, counts: np.ndarray,
                 k: int = MG_K) -> tuple[np.ndarray, np.ndarray]:
    """Keep the top-k entries by count, subtracting the (k+1)-th count
    (vectorized Misra-Gries decrement: equivalent to pairing each
    dropped occurrence with k surviving ones)."""
    if len(tokens) <= k:
        return tokens, counts
    order = np.argsort(counts, kind="mergesort")[::-1]
    thresh = counts[order[k]]
    keep = order[:k]
    out_c = counts[keep] - thresh
    pos = out_c > 0
    return tokens[keep][pos], out_c[pos]


def doc_top_terms_mg(ray, sf_dir: str, k_counters: int = MG_K,
                     k_out: int = 20):
    """(token, n_min): approximate top-k corpus terms via mergeable
    Misra-Gries summaries — counts are LOWER BOUNDS within n/(k+1) of
    the truth (rows-only: the containment + error bound are
    property-tested against the exact doc_top_terms). One constant-size
    summary row per batch; the driver merge touches O(blocks * k)
    counters, never the token stream."""
    from collections import Counter

    import pandas as pd

    from .textpipe import tokenize

    ds = _rpq(ray, f"{sf_dir}/documents.parquet", columns=["text"])

    def partial(batch: pa.Table) -> pa.Table:
        c: Counter = Counter()
        for t in batch.column("text").to_pylist():
            c.update(tokenize(t.lower()))
        toks = np.array(list(c.keys()), dtype=object)
        cnts = np.array(list(c.values()), dtype=np.int64)
        toks, cnts = _mg_truncate(toks, cnts, k_counters)
        return pa.table({"token": pa.array(list(toks), pa.string()),
                         "n": pa.array(cnts, pa.int64())})

    parts = ds.map_batches(partial, batch_format="pyarrow").to_pandas()
    g = parts.groupby("token", as_index=False).agg(n=("n", "sum"))
    toks, cnts = _mg_truncate(g["token"].to_numpy(),
                              g["n"].to_numpy().astype(np.int64),
                              k_counters)
    out = pd.DataFrame({"token": toks, "n_min": cnts})
    out = out.sort_values(["n_min", "token"],
                          ascending=[False, True]).head(k_out)
    return out.reset_index(drop=True)


def events_distinct_users_exact(ray, sf_dir: str):
    """(n_distinct): EXACT distributed COUNT DISTINCT — per-batch local
    dedup (the combiner: one row per distinct key per batch leaves the
    scan), bucketed distributed distinct, O(blocks) count fold. The
    exact companion the HLL sketch above trades against: this one
    shuffles one row per distinct key; the sketch shuffles kilobytes.
    Value-checked against DuckDB's COUNT(DISTINCT ...)."""
    import pandas as pd

    from ..stages.aggregates import distinct_keys
    from ..io_utils import parquet_num_rows

    ds = _rpq(ray, f"{sf_dir}/events.parquet", columns=["user_id"])
    # tightest cheap distinct bound: user ids come from the customer
    # keyspace, so the dimension's footer count beats the event count
    bound = min(parquet_num_rows(f"{sf_dir}/events.parquet"),
                parquet_num_rows(f"{sf_dir}/customer.parquet"))
    distinct = distinct_keys(ds, "user_id", n_rows=bound)
    return pd.DataFrame({"n_distinct": pd.Series([distinct.count()],
                                                 dtype="int64")})


EVENTS_DISTINCT_EXACT_SQL = """
SELECT CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_distinct FROM events
"""


# ---------------------------------------------------------------------------
def grouped_distinct_hll(ray, path: str, group_col: str, value_col: str):
    """(group, n_distinct_est): per-GROUP HLL distinct counting — one
    2^P-register array per group per batch (constant-size in the input,
    linear only in the batch's distinct groups), merged by elementwise
    register MAX inside a tiny groupby. The per-key approximate-distinct
    the exact path (events_distinct_users_exact) can't afford when the
    group count x key count explodes at 100 TB."""
    ds = _rpq(ray, path, columns=[group_col, value_col])

    def partial(batch: pa.Table) -> pa.Table:
        import pandas as pd

        g = batch.column(group_col).to_pylist()
        v = batch.column(value_col).to_numpy(
            zero_copy_only=False).astype(np.int64)
        h = v.astype(np.uint64)
        with np.errstate(over="ignore"):
            h = (h + np.uint64(0x9E3779B97F4A7C15))
            h ^= h >> np.uint64(30)
            h *= np.uint64(0xBF58476D1CE4E5B9)
            h ^= h >> np.uint64(27)
            h *= np.uint64(0x94D049BB133111EB)
            h ^= h >> np.uint64(31)
        out_g, out_r = [], []
        for grp, idx in pd.Series(range(len(g))).groupby(g).groups.items():
            regs = np.zeros(_M, dtype=np.uint8)
            _fold_registers(h[np.asarray(idx)], regs)
            out_g.append(grp)
            out_r.append(regs.tobytes())
        return pa.table({group_col: pa.array(out_g, pa.string()),
                         "regs": pa.array(out_r, pa.binary())})

    def merge(df):
        import pandas as pd

        rows = []
        for grp, sub in df.groupby(group_col):
            merged = np.zeros(_M, dtype=np.uint8)
            for blob in sub["regs"]:
                np.maximum(merged, np.frombuffer(blob, dtype=np.uint8),
                           out=merged)
            rows.append({group_col: grp, "regs": merged.tobytes()})
        return pd.DataFrame(rows)

    from ..stages.aggregates import hash_bucket_aggregate

    # fan-out = distinct groups, unknowable from footers; the default
    # floor (2 x CPUs) is right — each bucket merges whole groups
    merged = hash_bucket_aggregate(
        ds.map_batches(partial, batch_format="pyarrow"),
        [group_col], merge).to_pandas()  # one row per group — small

    import pandas as pd

    est = [int(round(hll_estimate(np.frombuffer(b, dtype=np.uint8))))
           for b in merged["regs"]]
    out = pd.DataFrame({group_col: merged[group_col],
                        "n_distinct_est": pd.Series(est, dtype="int64")})
    return out.sort_values(group_col).reset_index(drop=True)


def events_type_distinct_hll(ray, sf_dir: str):
    """(event_type, n_distinct_est): HLL distinct users per event type
    (rows-only: approximate by design; per-group relative error is
    bounded by a test against the exact per-type counts)."""
    return grouped_distinct_hll(ray, f"{sf_dir}/events.parquet",
                                "event_type", "user_id")


# ---------------------------------------------------------------------------
def grouped_percentiles_tdigest(ray, path: str, group_col: str,
                                value_col: str, pcts=(25, 50, 75)):
    """(group, pct, value): per-GROUP approximate percentiles via
    t-digest — one constant-size digest per group per batch, merged by
    concatenate-sort-recluster inside a tiny bucketed exchange. The
    per-key quantile path when group count x input size makes the exact
    grouped rank-select's O(log range) full re-scans too expensive; the
    error bound is the same O(1/delta) as the global digest and is
    tested against the EXACT grouped quartiles."""
    import pandas as pd

    from ..stages.aggregates import hash_bucket_aggregate

    ds = _rpq(ray, path, columns=[group_col, value_col])

    def partial(batch: pa.Table) -> pa.Table:
        g = np.asarray(batch.column(group_col).to_pylist())
        x = batch.column(value_col).to_numpy(
            zero_copy_only=False).astype(np.float64)
        keep = ~np.isnan(x)
        g, x = g[keep], x[keep]
        out_g, out_m, out_w = [], [], []
        for grp in np.unique(g):
            v = np.sort(x[g == grp])
            m, w = _td_cluster(v, np.ones(len(v)))
            out_g.append(grp)
            out_m.append(m.tobytes())
            out_w.append(w.tobytes())
        return pa.table({group_col: pa.array(out_g, pa.string()),
                         "means": pa.array(out_m, pa.binary()),
                         "weights": pa.array(out_w, pa.binary())})

    def merge(df: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for grp, sub in df.groupby(group_col):
            m, w = td_merge(sub["means"], sub["weights"])
            rows.append({group_col: grp, "means": m.tobytes(),
                         "weights": w.tobytes()})
        return pd.DataFrame(rows)

    merged = hash_bucket_aggregate(
        ds.map_batches(partial, batch_format="pyarrow"),
        [group_col], merge).to_pandas()  # one digest per group — small

    rows = []
    for _, r in merged.iterrows():
        m = np.frombuffer(r["means"], dtype=np.float64)
        w = np.frombuffer(r["weights"], dtype=np.float64)
        for p in pcts:
            rows.append({group_col: r[group_col], "pct": p,
                         "value": td_quantile(m, w, p / 100.0)})
    out = pd.DataFrame(rows)
    out["pct"] = out["pct"].astype("int64")
    return out.sort_values([group_col, "pct"]).reset_index(drop=True)


def events_type_percentiles_tdigest(ray, sf_dir: str):
    """Per-event-type approximate quartiles (rows-only: approximate by
    design; accuracy bounded by a test vs the exact grouped
    rank-select)."""
    return grouped_percentiles_tdigest(ray, f"{sf_dir}/events.parquet",
                                       "event_type", "value")


# ---------------------------------------------------------------------------
# Count-Min sketch (Cormode-Muthukrishnan 2005) — mergeable UPPER-bound
# frequency estimates. The dual of Misra-Gries above: MG reports lower
# bounds and decides WHICH keys matter; CMS answers "how often" for any
# key with est >= true always (deterministic one-sided error) and
# est <= true + eps*N with prob 1 - e^-d per query (eps = e/W). Partials
# are one constant-size d x W counter matrix per batch; the merge is an
# elementwise SUM over O(#blocks) rows — the same kilobytes-not-keys
# exchange shape as the HLL path.

CMS_D = 4                       # independent rows; fail prob e^-4 ~ 1.8%
CMS_LOGW = 14
CMS_W = 1 << CMS_LOGW           # 16384 counters/row; eps = e/W ~ 1.7e-4
# distinct odd multipliers -> d multiply-shift hash rows over one
# 64-bit base hash (Dietzfelbinger's universal family, same trick as
# the MinHash permutations in functions/hashing.py)
_CMS_A = np.array([0x9E3779B97F4A7C15, 0xC2B2AE3D27D4EB4F,
                   0x165667B19E3779F9, 0x27D4EB2F165667C5],
                  dtype=np.uint64)


def _cms_positions(hashes: np.ndarray, row: int) -> np.ndarray:
    return ((hashes * _CMS_A[row])
            >> np.uint64(64 - CMS_LOGW)).astype(np.int64)


def _cms_fold(hashes: np.ndarray, counts: np.ndarray,
              sk: np.ndarray) -> None:
    """Fold (hash, count) pairs into the d x W sketch in place."""
    for i in range(CMS_D):
        sk[i] += np.bincount(_cms_positions(hashes, i),
                             weights=counts, minlength=CMS_W)


def _cms_estimate(sk: np.ndarray, hashes: np.ndarray) -> np.ndarray:
    """Point-query estimates: min over the d rows (int64)."""
    ests = np.stack([sk[i][_cms_positions(hashes, i)]
                     for i in range(CMS_D)])
    return ests.min(axis=0).astype(np.int64)


def cms_token_sketch(ray, path: str, column: str) -> np.ndarray:
    """Build one merged d x W Count-Min sketch over every whitespace
    token of ``column``. Per batch: one Counter pass, one constant-size
    float64 partial row out (exact up to 2^53 adds); driver merge sums
    O(#blocks) partials."""
    from collections import Counter

    from .textpipe import tokenize

    ds = _rpq(ray, path, columns=[column])

    def partial(batch: pa.Table) -> pa.Table:
        c: Counter = Counter()
        for t in batch.column(column).to_pylist():
            c.update(tokenize(t.lower()))
        toks = list(c.keys())
        sk = np.zeros((CMS_D, CMS_W), dtype=np.float64)
        if toks:
            hs = stable_hash64_batch(np.array(toks, dtype=object))
            _cms_fold(hs, np.fromiter(c.values(), dtype=np.float64,
                                      count=len(toks)), sk)
        return pa.table({"sk": pa.array([sk.tobytes()], pa.binary())})

    parts = ds.map_batches(partial, batch_format="pyarrow").to_pandas()
    sk = np.zeros((CMS_D, CMS_W), dtype=np.float64)
    for buf in parts["sk"]:
        sk += np.frombuffer(buf, dtype=np.float64).reshape(CMS_D, CMS_W)
    return sk


def doc_top_terms_cms(ray, sf_dir: str, k_out: int = 20):
    """(token, n_min, n_est): the MG/CMS heavy-hitter sandwich — the
    Misra-Gries pass nominates the candidate top-k tokens with LOWER
    bounds, the Count-Min sketch answers each with an UPPER-biased
    estimate, so true counts are bracketed n_min <= n <= n_est without
    ever exchanging the token stream (rows-only: both sides
    approximate; the bracket is property-tested vs exact counts)."""
    import pandas as pd

    cand = doc_top_terms_mg(ray, sf_dir, k_out=k_out)
    sk = cms_token_sketch(ray, f"{sf_dir}/documents.parquet", "text")
    hs = stable_hash64_batch(cand["token"].to_numpy(dtype=object))
    out = pd.DataFrame({"token": cand["token"],
                        "n_min": cand["n_min"].astype("int64"),
                        "n_est": _cms_estimate(sk, hs)})
    return (out.sort_values(["n_est", "token"],
                            ascending=[False, True])
            .reset_index(drop=True))


# ---------------------------------------------------------------------------
# SQL-checkable Count-Min: the d x W sketch over an md5-derived 32-bit
# base hash with Dietzfelbinger multiply-shift rows. CMS is LINEAR
# (sketch(stream) == sketch(aggregated counts)) and its merge is a
# commutative SUM, so — unlike Misra-Gries, whose lower bounds depend on
# stream order — the whole structure is order-independent and a DuckDB
# oracle can rebuild it bit-for-bit from GROUP BY counts. doc_cms_counts
# below is therefore hash-GREEN: the one sketch in this repo whose every
# counter is value-checked against SQL, closing the loop the
# error-bound property tests on HLL/MG can only bracket.

CMS32_LOGW = 14
CMS32_W = 1 << CMS32_LOGW
# odd 32-bit multipliers (golden ratio + murmur3/splitmix mixing
# constants — public values, oddness is all the family needs)
CMS32_A = (0x9E3779B9, 0x85EBCA6B, 0xC2B2AE35, 0x27D4EB2F)


def _md5_h32(tokens) -> np.ndarray:
    """First 8 md5 hex chars as uint64 (matches the oracle's
    ('0x' || substr(md5(token), 1, 8))::UBIGINT)."""
    import hashlib

    return np.fromiter(
        (int(hashlib.md5(t.encode("utf-8")).hexdigest()[:8], 16)
         for t in tokens),
        dtype=np.uint64, count=len(tokens))


def _cms32_positions(h32: np.ndarray, row: int) -> np.ndarray:
    return (((h32 * np.uint64(CMS32_A[row])) & np.uint64(0xFFFFFFFF))
            >> np.uint64(32 - CMS32_LOGW)).astype(np.int64)


def doc_cms_counts(ray, sf_dir: str, k_out: int = 20):
    """(token, n_exact, n_cms): Count-Min point queries for the exact
    top-k corpus tokens, with the CMS built DISTRIBUTED (constant-size
    d x W partial per batch, elementwise-sum merge over O(blocks) rows)
    and every estimate >= the exact count by construction. Hash-green:
    the DuckDB oracle rebuilds the identical sketch from GROUP BY
    counts via the same md5-32 multiply-shift rows (CMS linearity).

    Scale shape: ONE wordcount pass (bucketed Counter merge, the
    doc_top_terms shape) materialized and reused by both consumers —
    the sketch partials and the exact top-k sort; the exchange after
    the scan moves distinct-token rows, never the token stream."""
    import pandas as pd

    from ..io_utils import parquet_column_bytes
    from ..stages.aggregates import hash_bucket_aggregate
    from .textpipe import tokenize

    ds = _rpq(ray, f"{sf_dir}/documents.parquet", columns=["text"])

    def partial(batch: pa.Table) -> "pd.DataFrame":
        from collections import Counter

        c: Counter = Counter()
        for t in batch.column("text").to_pylist():
            c.update(tokenize(t.lower()))
        return pd.DataFrame({"token": list(c.keys()),
                             "n": pd.Series(list(c.values()),
                                            dtype="int64")})

    counts = hash_bucket_aggregate(
        ds.map_batches(partial, batch_format="pyarrow"),
        ["token"],
        lambda df: df.groupby("token", as_index=False).agg(n=("n", "sum")),
        n_rows=parquet_column_bytes(f"{sf_dir}/documents.parquet",
                                    "text") // 2).materialize()

    def sk_partial(b: "pd.DataFrame") -> pa.Table:
        sk = np.zeros((len(CMS32_A), CMS32_W), dtype=np.int64)
        if len(b):
            h = _md5_h32(b["token"].tolist())
            n = b["n"].to_numpy()
            for i in range(len(CMS32_A)):
                np.add.at(sk[i], _cms32_positions(h, i), n)
        return pa.table({"sk": pa.array([sk.tobytes()], pa.binary())})

    parts = counts.map_batches(sk_partial,
                               batch_format="pandas").to_pandas()
    sk = np.zeros((len(CMS32_A), CMS32_W), dtype=np.int64)
    for buf in parts["sk"]:
        sk += np.frombuffer(buf, dtype=np.int64).reshape(len(CMS32_A),
                                                         CMS32_W)

    top = (counts.sort(["n", "token"], descending=[True, False])
                 .limit(k_out).to_pandas())
    h = _md5_h32(top["token"].tolist())
    ests = np.stack([sk[i][_cms32_positions(h, i)]
                     for i in range(len(CMS32_A))]).min(axis=0)
    return pd.DataFrame({"token": top["token"],
                         "n_exact": top["n"].astype("int64"),
                         "n_cms": ests.astype("int64")})


def _cms32_sql_pos(col: str, row: int) -> str:
    return (f"(({col} * CAST({CMS32_A[row]} AS UBIGINT)) "
            f"% CAST(4294967296 AS UBIGINT)) "
            f"// CAST({1 << (32 - CMS32_LOGW)} AS UBIGINT)")


def _doc_cms_sql() -> str:
    from .textpipe import SQL_WS_CLASS

    pos_cols = ",\n         ".join(
        f"{_cms32_sql_pos('h32', i)} AS p{i}"
        for i in range(len(CMS32_A)))
    sk_ctes = ",\n".join(
        f"sk{i} AS (SELECT p{i} AS pos, SUM(n) AS c FROM pos GROUP BY 1)"
        for i in range(len(CMS32_A)))
    joins = "\n".join(
        f"JOIN sk{i} ON top.p{i} = sk{i}.pos"
        for i in range(len(CMS32_A)))
    least = ", ".join(f"sk{i}.c" for i in range(len(CMS32_A)))
    return f"""
WITH t AS (
  SELECT unnest(str_split_regex(
      regexp_replace(lower(text), '^{SQL_WS_CLASS}+|{SQL_WS_CLASS}+$',
                     '', 'g'),
      '{SQL_WS_CLASS}+')) AS token
  FROM documents),
counts AS (SELECT token, COUNT(*) AS n FROM t WHERE token != ''
           GROUP BY token),
hashed AS (SELECT token, n,
                  ('0x' || substr(md5(token), 1, 8))::UBIGINT AS h32
           FROM counts),
pos AS (SELECT token, n,
         {pos_cols}
        FROM hashed),
{sk_ctes},
top AS (SELECT * FROM pos ORDER BY n DESC, token LIMIT 20)
SELECT top.token, top.n AS n_exact,
       CAST(LEAST({least}) AS BIGINT) AS n_cms
FROM top
{joins}
ORDER BY n_exact DESC, token
"""


DOC_CMS_COUNTS_SQL = _doc_cms_sql()


# ---------------------------------------------------------------------------
# SQL-checkable HyperLogLog REGISTERS. The float estimate formula is
# order-sensitive to sum over 4096 doubles, but the registers themselves
# are pure integer MAX-merges of (bucket, rho) pairs — order-independent
# and rebuildable in SQL from an md5-64 hash: reg_idx = top P bits,
# rho = leading zeros of the low (64-P) bits + 1 = (64-P) - bitlen + 1,
# with bitlen = length(bin(w)) (exact string/integer ops, no floats).
# events_hll_registers is hash-GREEN down to every register value; the
# blake2b-hashed estimate path (events_distinct_users_hll) keeps its
# 5-sigma error-bound test for the float half.

HLLR_P = 12
HLLR_M = 1 << HLLR_P
_HLLR_WBITS = 64 - HLLR_P


def events_hll_registers(ray, sf_dir: str):
    """(reg_idx, reg_val): the merged HyperLogLog register table over
    events.user_id (md5-64 hash), only the touched registers. Scale
    shape: per-batch constant-size register partial (one binary row per
    batch), elementwise-MAX merge over O(blocks) rows on the driver —
    identical exchange shape to the estimate path, but every output
    value is integer-exact against the DuckDB rebuild."""
    import pandas as pd

    ds = _rpq(ray, f"{sf_dir}/events.parquet", columns=["user_id"])

    def partial(batch: pa.Table) -> pa.Table:
        regs = np.zeros(HLLR_M, dtype=np.uint8)
        uids = batch.column("user_id").to_pylist()
        if uids:
            h = _md5_h64([str(u) for u in uids])
            idx = (h >> np.uint64(_HLLR_WBITS)).astype(np.int64)
            w = h & np.uint64((1 << _HLLR_WBITS) - 1)
            # exact bit length (float log2 misrounds near powers of
            # two, which would shift rho by one — keep it integer)
            nz = w != 0
            nbits = np.zeros(len(w), dtype=np.int64)
            nbits[nz] = np.frompyfunc(int.bit_length, 1, 1)(
                w[nz].astype(object)).astype(np.int64)
            rho = np.where(nz, _HLLR_WBITS - nbits + 1,
                           _HLLR_WBITS + 1).astype(np.uint8)
            np.maximum.at(regs, idx, rho)
        return pa.table({"regs": pa.array([regs.tobytes()], pa.binary())})

    parts = ds.map_batches(partial, batch_format="pyarrow").to_pandas()
    regs = np.zeros(HLLR_M, dtype=np.uint8)
    for buf in parts["regs"]:
        regs = np.maximum(regs,
                          np.frombuffer(buf, dtype=np.uint8))
    idx = np.nonzero(regs)[0]
    return pd.DataFrame({"reg_idx": idx.astype("int64"),
                         "reg_val": regs[idx].astype("int64")})


def _md5_h64(tokens) -> np.ndarray:
    """First 16 md5 hex chars as uint64 (matches
    ('0x' || substr(md5(x), 1, 16))::UBIGINT)."""
    import hashlib

    return np.fromiter(
        (int(hashlib.md5(t.encode("utf-8")).hexdigest()[:16], 16)
         for t in tokens),
        dtype=np.uint64, count=len(tokens))


EVENTS_HLL_REGISTERS_SQL = f"""
WITH h AS (
  SELECT ('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 16))::UBIGINT
             AS h64
  FROM events),
r AS (
  SELECT CAST(h64 >> {_HLLR_WBITS} AS BIGINT) AS reg_idx,
         CAST(h64 % CAST({1 << _HLLR_WBITS} AS UBIGINT) AS BIGINT) AS w
  FROM h),
rho AS (
  SELECT reg_idx,
         CASE WHEN w = 0 THEN {_HLLR_WBITS + 1}
              ELSE {_HLLR_WBITS} - length(bin(w)) + 1 END AS rho
  FROM r)
SELECT reg_idx, CAST(MAX(rho) AS BIGINT) AS reg_val
FROM rho GROUP BY reg_idx ORDER BY reg_idx
"""


# ---------------------------------------------------------------------------
# SQL-checkable KMV (k-minimum-values / bottom-k) distinct sketch
# (Bar-Yossef et al. 2002 / Beyer et al. 2007 — the theta-sketch
# family). Like the CMS counters and HLL registers above, the sketch
# CONTENT is order-independent pure integers (the k smallest hash
# values of the distinct keys), so DuckDB rebuilds it exactly; the
# derived cardinality estimate (k-1)*2^60/h_(k) and the union/intersect
# set algebra stay float and are documented, not emitted. 60-bit hashes
# (15 md5 hex chars) keep every value inside BIGINT for the oracle.

KMV_K = 256
_KMV_BITS = 60


def _md5_h60(tokens) -> np.ndarray:
    import hashlib

    return np.fromiter(
        (int(hashlib.md5(t.encode("utf-8")).hexdigest()[:15], 16)
         for t in tokens),
        dtype=np.int64, count=len(tokens))


def events_kmv_bottomk(ray, sf_dir: str, k: int = KMV_K):
    """(event_type, rank, h): the per-type KMV sketch — the k smallest
    distinct md5-60 user-id hashes, rank-numbered. Supports distinct
    estimates ((k-1) * 2^60 / h_(k)) and union/intersection algebra by
    sketch merge; every stored value is hash-checked against the SQL
    rebuild. Scale shape: per-batch per-type local bottom-k partial
    (<= k rows per type per batch leave the scan), one type-keyed
    bucket merge that dedups and re-takes the bottom-k."""
    import pandas as pd

    from ..stages.aggregates import hash_bucket_aggregate

    ds = _rpq(ray, f"{sf_dir}/events.parquet",
              columns=["event_type", "user_id"])

    def partial(batch: pa.Table) -> "pd.DataFrame":
        df = pd.DataFrame({
            "event_type": batch.column("event_type").to_pylist(),
            "user_id": batch.column("user_id").to_pylist()})
        df = df.drop_duplicates()
        df["h"] = _md5_h60([str(u) for u in df["user_id"]])
        return (df.sort_values("h")
                  .groupby("event_type", as_index=False)
                  .head(k)[["event_type", "h"]])

    def bottomk(df: "pd.DataFrame") -> "pd.DataFrame":
        return (df.drop_duplicates(["event_type", "h"])
                  .sort_values("h")
                  .groupby("event_type", as_index=False)
                  .head(k))

    merged = hash_bucket_aggregate(
        ds.map_batches(partial, batch_format="pyarrow",
                       batch_size=65536),
        ["event_type"], bottomk,
        # partials are <= k rows per (type, batch): type-count * k bounds
        # the exchange; 64 types is generous for the events taxonomy
        n_rows=64 * k).to_pandas()
    merged = bottomk(merged)
    merged = merged.sort_values(["event_type", "h"]).reset_index(drop=True)
    merged["rank"] = (merged.groupby("event_type").cumcount() + 1
                      ).astype("int64")
    merged["h"] = merged["h"].astype("int64")
    return merged[["event_type", "rank", "h"]]


EVENTS_KMV_SQL = f"""
WITH d AS (
  SELECT DISTINCT event_type,
         ('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 15))::BIGINT
             AS h
  FROM events),
r AS (
  SELECT event_type, h,
         ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY h) AS rank
  FROM d)
SELECT event_type, CAST(rank AS BIGINT) AS rank, h
FROM r WHERE rank <= {KMV_K}
ORDER BY event_type, h
"""
