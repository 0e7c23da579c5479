"""Deduplication family over the ``documents`` table — exact,
MinHash+LSH, SimHash — the core training-data cleaning operators
(public designs: Broder'97 minwise hashing; Charikar'02 simhash;
banding/LSH per Leskovec-Rajaraman-Ullman ch.3).

Scaling shape (the part that matters at 100 TB):
* signatures are computed batch-local in ``map_batches`` (one pass over
  the text, no shuffle),
* candidates come from a ``groupby`` on (band_id, band_hash) / simhash
  segment — the shuffle moves only (doc_id, band_hash) pairs, never text,
* verification joins candidate pairs back to their shingle sets via a
  hash-bucketed exchange (two distributed ``Dataset.join``s), not a
  broadcast of the corpus or any driver materialization of texts.
"""

from __future__ import annotations

from ..io_utils import corpus_cache_dir
from ..io_utils import read_parquet_clean as _rpq


import numpy as np
import pandas as pd
import pyarrow as pa

from ..io_utils import parquet_num_rows as _nrows
from ..functions.tokenizer import tokenize as _tokenize
from ..functions.hashing import (
    N_BANDS,
    N_PERM,
    TokenHashCache,
    jaccard,
    minhash_perm_params as _perm_params,
    shingle_hashes_from_token_hashes as _sh_from_th,
)

# worker-process-resident memoized token hashing: stateless map_batches
# tasks reuse the same worker processes, so the Zipf head of the corpus
# vocabulary is md5-hashed once per worker, not once per document
_TOKEN_CACHE = TokenHashCache()


def _exact_fps(texts: list[str]) -> list[str]:
    """Canonical exact-dedup fingerprint: md5 of the lowercased,
    WS_CHARS-trimmed text. ONE definition shared by every exact-dedup
    consumer — the SQL spelling below derives from the same
    textpipe.SQL_TRIM_TEXT constant so the Ray side and the oracle
    cannot drift apart (the r1 whitespace-divergence class)."""
    import hashlib as _h

    from .textpipe import WS_CHARS

    return [_h.md5(t.strip(WS_CHARS).lower().encode()).hexdigest()
            for t in texts]


# ---------------------------------------------------------------------------
def exact_dedup(ray, sf_dir: str):
    """(doc_id, n_dups): exact text dedup — md5 content hash per batch,
    hash-bucketed vectorized groupby, keep min doc_id per group. The
    canonical hash-partition + per-group-first pattern."""
    from ..stages.aggregates import hash_bucket_aggregate

    ds = _rpq(ray, f"{sf_dir}/documents.parquet",
                               columns=["doc_id", "text"])

    def add_fp(batch: pa.Table) -> pa.Table:
        fps = _exact_fps(batch.column("text").to_pylist())
        return pa.table({"doc_id": batch.column("doc_id"),
                         "fp": pa.array(fps, pa.string()),
                         "n_dups": pa.array(np.ones(batch.num_rows,
                                                    dtype=np.int64))})

    out = hash_bucket_aggregate(
        ds.map_batches(add_fp, batch_format="pyarrow"),
        ["fp"],
        lambda df: df.groupby("fp", as_index=False).agg(
            doc_id=("doc_id", "min"), n_dups=("n_dups", "sum")),
        n_rows=_nrows(f"{sf_dir}/documents.parquet"))
    return (out.map_batches(lambda t: t.select(["doc_id", "n_dups"]),
                            batch_format="pyarrow")
               .sort("doc_id"))


def dedup_filtered_corpus(ray, sf_dir: str):
    """(doc_id, n_chars): the DEDUPLICATED corpus materialization —
    keep-first (min doc_id) per exact-content group. Same
    hash-partitioned shape as exact_dedup, but the winner's payload
    columns ride THROUGH the bucketed aggregate (sort + drop_duplicates
    per bucket), so no join back to the documents table is needed to
    emit the surviving rows."""
    from ..stages.aggregates import hash_bucket_aggregate

    ds = _rpq(ray, f"{sf_dir}/documents.parquet",
              columns=["doc_id", "text", "n_chars"])

    def add_fp(batch: pa.Table) -> pa.Table:
        fps = _exact_fps(batch.column("text").to_pylist())
        return pa.table({"doc_id": batch.column("doc_id"),
                         "n_chars": batch.column("n_chars"),
                         "fp": pa.array(fps, pa.string())})

    def keep_first(df: pd.DataFrame) -> pd.DataFrame:
        return (df.sort_values("doc_id", kind="mergesort")
                  .drop_duplicates("fp", keep="first"))

    out = hash_bucket_aggregate(
        ds.map_batches(add_fp, batch_format="pyarrow"),
        ["fp"], keep_first,
        n_rows=_nrows(f"{sf_dir}/documents.parquet"))
    return (out.map_batches(lambda t: t.select(["doc_id", "n_chars"]),
                            batch_format="pyarrow")
               .sort("doc_id"))


from .textpipe import SQL_TRIM_TEXT as _SQL_TRIM_TEXT  # noqa: E402

DEDUP_FILTERED_SQL = f"""
SELECT doc_id, n_chars FROM (
  SELECT doc_id, n_chars,
         ROW_NUMBER() OVER (
             PARTITION BY md5(LOWER({_SQL_TRIM_TEXT}))
             ORDER BY doc_id) AS rn
  FROM documents)
WHERE rn = 1 ORDER BY doc_id
"""


EXACT_DEDUP_SQL = f"""
SELECT MIN(doc_id) AS doc_id, COUNT(*) AS n_dups
FROM documents
GROUP BY md5(LOWER({_SQL_TRIM_TEXT}))
ORDER BY doc_id
"""


# ---------------------------------------------------------------------------
def _lsh_candidate_pairs(ray, sf_dir: str, sh_ds=None):
    """Distributed candidate (doc_a, doc_b) pairs from MinHash banding:
    shingle -> minhash (map_batches) -> explode to (band_id, band_hash,
    doc_id) -> coarse-bucket groupby (the shuffle moves only id/band-hash
    triples, never text) -> in-bucket vectorized pair expansion ->
    distinct pairs via a bucketed aggregate. Returns a Dataset; shared by
    the MinHash and n-gram verifiers (computed ONCE, no threshold-0
    rerun). Pass the (materialized) ``_shingle_table`` dataset as
    ``sh_ds`` so shingling runs once for banding AND verification."""
    from ..stages.aggregates import buckets_for, hash_bucket_aggregate

    a, b = _perm_params()
    # coarse-bucket fan-out sized from the banded row count (N_BANDS rows
    # per doc), not a constant — one map_groups task holds ~one bucket
    n_cbuckets = buckets_for(N_BANDS * _nrows(f"{sf_dir}/documents.parquet"))

    if sh_ds is None:
        sh_ds = _shingle_table(ray, sf_dir)

    def to_bands(batch: pa.Table) -> pa.Table:
        from ..functions.hashing import (
            band_hashes_batch,
            minhash_signatures_batch,
        )

        doc_ids = batch.column("doc_id").to_numpy(
            zero_copy_only=False).astype(np.int64)
        n = len(doc_ids)
        # batched segmented-min signatures + vectorized band fold (the
        # per-doc hash-per-band loop this replaces spent more time in
        # 16n hash calls and 3x16n list appends than in the minhash)
        sig = minhash_signatures_batch(
            list(_sh_rows(batch.column("sh"))), a, b)
        bh = band_hashes_batch(sig, N_BANDS)  # (n, N_BANDS) int64
        return pa.table({
            "doc_id": pa.array(np.repeat(doc_ids, N_BANDS), pa.int64()),
            "band_id": pa.array(np.tile(
                np.arange(N_BANDS, dtype=np.int32), n), pa.int32()),
            "band_hash": pa.array(bh.ravel(), pa.int64())})

    bands = sh_ds.map_batches(to_bands, batch_format="pyarrow",
                              batch_size=512)

    # band buckets are MANY tiny groups -> coarse-bucket shuffle, then
    # vectorized duplicate detection inside each coarse bucket; only the
    # (rare) multi-doc band buckets are expanded into pairs
    def add_cbucket(batch: pa.Table) -> pa.Table:
        cb = (batch.column("band_hash").to_numpy(zero_copy_only=False)
              % n_cbuckets).astype(np.int64)
        return batch.append_column("cbucket", pa.array(cb, pa.int64()))

    def coarse_pairs(group: pd.DataFrame) -> pd.DataFrame:
        g = group.drop_duplicates(["band_id", "band_hash", "doc_id"])
        d = g[g.duplicated(["band_id", "band_hash"], keep=False)]
        out_a: list[int] = []
        out_b: list[int] = []
        for _, sub in d.groupby(["band_id", "band_hash"]):
            ids = np.sort(sub["doc_id"].unique())
            if len(ids) < 2:
                continue
            ia, ib = np.triu_indices(len(ids), k=1)
            out_a.extend(ids[ia])
            out_b.extend(ids[ib])
        return pd.DataFrame({"doc_a": pd.Series(out_a, dtype="int64"),
                             "doc_b": pd.Series(out_b, dtype="int64")})

    cand = (bands.map_batches(add_cbucket, batch_format="pyarrow")
                 .groupby("cbucket")
                 .map_groups(coarse_pairs, batch_format="pandas"))
    # a pair can surface from several bands (-> several coarse buckets):
    # distinct via a bucketed vectorized aggregate, still distributed
    # sized from the BANDED row count (N_BANDS rows/doc), not the doc
    # count: the shuffled rows here are candidate PAIRS, one per shared
    # band membership, so the doc count alone undersizes the fan-out by
    # ~N_BANDS at a realistic duplication rate (adversarially hot band
    # buckets can still exceed any footer-derived bound; the in-bucket
    # expansion is where that quadratic lives, and it is vectorized)
    return hash_bucket_aggregate(
        cand, ["doc_a", "doc_b"],
        lambda df: df.drop_duplicates(["doc_a", "doc_b"]),
        n_rows=N_BANDS * _nrows(f"{sf_dir}/documents.parquet"))


def _shingle_table(ray, sf_dir: str):
    """(doc_id, sh: binary) — each document's unique (sorted) shingle
    hashes as raw uint64 bytes. Binary, not list<uint64>: Acero's hash
    join (behind ``Dataset.join``) rejects list-typed payload columns but
    carries var-length binary fine; the bytes round-trip through
    ``np.frombuffer`` zero-copy. This is the verify-side exchange
    payload."""
    ds = _rpq(ray, f"{sf_dir}/documents.parquet",
              columns=["doc_id", "text"])

    def f(batch: pa.Table) -> pa.Table:
        texts = batch.column("text").to_pylist()
        ths = _TOKEN_CACHE.hash_token_lists(
            [_tokenize(t) for t in texts])
        blobs = [_sh_from_th(th).tobytes() for th in ths]
        return pa.table({"doc_id": batch.column("doc_id"),
                         "sh": pa.array(blobs, pa.binary())})

    return ds.map_batches(f, batch_format="pyarrow", batch_size=512)


def _sh_rows(col: pa.ChunkedArray):
    """Yield each row of the binary shingle column as a uint64 ndarray."""
    for b in col.to_pylist():
        yield np.frombuffer(b, dtype=np.uint64)


def _verify_pairs_exchange(ray, sf_dir: str, cand, threshold: float,
                           with_pct: bool, sh_ds=None):
    """Exact-Jaccard verification via a HASH-BUCKETED EXCHANGE: candidate
    pairs are joined back to their shingle sets with two distributed
    ``Dataset.join``s (keyed on doc_a, then doc_b) — texts and shingle
    sets move through the shuffle, never through the driver or a
    broadcast, so one hot band bucket cannot OOM anything."""
    empty_cols = {"doc_a": pa.array([], pa.int64()),
                  "doc_b": pa.array([], pa.int64())}
    if with_pct:
        empty_cols["jaccard_pct"] = pa.array([], pa.int64())
    from ..stages.aggregates import normalize_for_join

    cand = normalize_for_join(
        cand, pa.schema([("doc_a", pa.int64()),
                         ("doc_b", pa.int64())])).materialize()
    n_cand = cand.count()
    if n_cand == 0:
        return pa.table(empty_cols)
    from ..stages.aggregates import join_partitions_for

    nparts = join_partitions_for(n_cand)
    sh = sh_ds if sh_ds is not None else _shingle_table(ray, sf_dir)

    # small candidate sets verify DRIVER-SIDE from a membership-filtered
    # collect of the touched shingle blobs (the dedup_jaccard_join
    # pattern) — bounded by the broadcast budget, replacing two
    # distributed joins + a sort with a bounded vectorized fold
    from ..io_utils import parquet_column_bytes, parquet_num_rows

    n_docs = max(1, parquet_num_rows(f"{sf_dir}/documents.parquet"))
    avg_sh_bytes = max(64, 8 * parquet_column_bytes(
        f"{sf_dir}/documents.parquet", "text") // 6 // n_docs)
    if 2 * n_cand * avg_sh_bytes <= 64 << 20:
        from ..stages.joins import key_membership_filter

        cpd = cand.to_pandas()
        need = np.unique(np.concatenate(
            [cpd["doc_a"].to_numpy().astype(np.int64),
             cpd["doc_b"].to_numpy().astype(np.int64)]))
        sub = key_membership_filter(ray, sh, "doc_id", need,
                                    keep_matched=True).to_pandas()
        sets = {int(d): np.frombuffer(b, dtype=np.uint64)
                for d, b in zip(sub["doc_id"], sub["sh"])}
        ka, kb, jp = [], [], []
        for a, b in zip(cpd["doc_a"], cpd["doc_b"]):
            jac = jaccard(sets[int(a)], sets[int(b)])
            if jac >= threshold:
                ka.append(int(a))
                kb.append(int(b))
                jp.append(int(jac * 100))
        out = {"doc_a": pa.array(ka, pa.int64()),
               "doc_b": pa.array(kb, pa.int64())}
        if with_pct:
            out["jaccard_pct"] = pa.array(jp, pa.int64())
        tbl = pa.table(out)
        order = pa.compute.sort_indices(
            tbl, sort_keys=[("doc_a", "ascending"),
                            ("doc_b", "ascending")])
        return tbl.take(order)
    sh_a = sh.map_batches(lambda t: t.rename_columns(["doc_a", "sh_a"]),
                          batch_format="pyarrow")
    sh_b = sh.map_batches(lambda t: t.rename_columns(["doc_b", "sh_b"]),
                          batch_format="pyarrow")
    j = cand.join(sh_a, join_type="inner", on=("doc_a",),
                  num_partitions=nparts)
    j = j.join(sh_b, join_type="inner", on=("doc_b",),
               num_partitions=nparts)

    def verify(batch: pa.Table) -> pa.Table:
        da = batch.column("doc_a").to_numpy(zero_copy_only=False)
        db = batch.column("doc_b").to_numpy(zero_copy_only=False)
        keep_a, keep_b, jp = [], [], []
        for x, y, sa, sb in zip(da, db, _sh_rows(batch.column("sh_a")),
                                _sh_rows(batch.column("sh_b"))):
            jac = jaccard(sa, sb)
            if jac >= threshold:
                keep_a.append(int(x))
                keep_b.append(int(y))
                jp.append(int(jac * 100))
        out = {"doc_a": pa.array(keep_a, pa.int64()),
               "doc_b": pa.array(keep_b, pa.int64())}
        if with_pct:
            out["jaccard_pct"] = pa.array(jp, pa.int64())
        return pa.table(out)

    return (j.map_batches(verify, batch_format="pyarrow")
             .sort(["doc_a", "doc_b"]))


def minhash_lsh_pairs(ray, sf_dir: str, threshold: float = 0.8):
    """Near-dup pairs (doc_a, doc_b) with shingle-Jaccard >= threshold:
    MinHash+LSH banding candidates -> hash-bucketed-exchange exact
    verification (no corpus/candidate-text broadcast anywhere). The
    corpus is shingled ONCE (materialized, object-store backed) and
    shared by banding and both verify join sides."""
    sh = _shingle_table(ray, sf_dir).materialize()
    cand = _lsh_candidate_pairs(ray, sf_dir, sh_ds=sh)
    return _verify_pairs_exchange(ray, sf_dir, cand, threshold,
                                  with_pct=False, sh_ds=sh)


# ---------------------------------------------------------------------------
def ngram_jaccard_pairs(ray, sf_dir: str, threshold: float = 0.5):
    """(doc_a, doc_b, jaccard_pct): the SAME banding candidates as
    ``minhash_lsh_pairs`` (computed once, not re-run at threshold 0)
    verified with EXACT word-3-gram Jaccard, reported as an integer
    percent (floor) for deterministic comparison."""
    sh = _shingle_table(ray, sf_dir).materialize()
    cand = _lsh_candidate_pairs(ray, sf_dir, sh_ds=sh)
    return _verify_pairs_exchange(ray, sf_dir, cand, threshold,
                                  with_pct=True, sh_ds=sh)


# ---------------------------------------------------------------------------
# EXACT set-similarity join (prefix filtering — Chaudhuri ICDE'06 /
# PPJoin, Xiao et al. WWW'08): every pair with gram-set Jaccard >= tau,
# ZERO false negatives — the ground truth the LSH banding family
# approximates (its candidates can miss a true pair; this can't).

def _gram_set_table(ray, sf_dir: str, k: int = 3):
    """(doc_id, sh: binary, n: int64): each doc's UNIQUE ordered word
    k-gram hashes (``kgram_hashes_ordered`` + unique) as raw int64-view
    bytes. Unlike ``_shingle_table`` there is NO whole-doc fallback for
    docs shorter than k tokens — they get n=0 (Schleimer semantics), so
    the set matches the oracle's staged-FNV DISTINCT chain bit-exactly."""
    ds = _rpq(ray, f"{sf_dir}/documents.parquet",
              columns=["doc_id", "text"])

    def f(batch: pa.Table) -> pa.Table:
        texts = batch.column("text").to_pylist()
        # memoized md5 token hashing (the Zipf head hashes once per
        # worker); staged-FNV fold == kgram_hashes_ordered + unique
        ths = _TOKEN_CACHE.hash_token_lists(
            [_tokenize(t) for t in texts])
        blobs, ns = [], []
        empty = np.zeros(0, dtype=np.uint64)
        for th in ths:
            u = _sh_from_th(th, k) if len(th) >= k else empty
            blobs.append(u.tobytes())
            ns.append(len(u))
        return pa.table({"doc_id": batch.column("doc_id"),
                         "sh": pa.array(blobs, pa.binary()),
                         "n": pa.array(ns, pa.int64())})

    return ds.map_batches(f, batch_format="pyarrow", batch_size=512)


def _prefix_pairs_fold(pf: pd.DataFrame, threshold_pct: int) -> pd.DataFrame:
    """Driver-side candidate generation for the PPJoin prefix table:
    all within-gram-run pairs via pure numpy index arithmetic (no
    pandas hash merge), with the length and positional filters applied
    BEFORE the distinct so only survivors are deduplicated. Same
    semantics as the distributed ``pairs`` kernel — each unordered pair
    is emitted once per shared prefix gram, filters are symmetric in
    (a, b), and the result is distinct (doc_a < doc_b)."""
    h = pf["h"].to_numpy().astype(np.int64)
    order = np.argsort(h, kind="stable")
    h = h[order]
    doc = pf["doc"].to_numpy().astype(np.int64)[order]
    n = pf["n"].to_numpy().astype(np.int64)[order]
    pos = pf["pos"].to_numpy().astype(np.int64)[order]

    starts = np.flatnonzero(np.r_[True, h[1:] != h[:-1]])
    counts = np.diff(np.r_[starts, len(h)])
    # pairs-per-left-element: element at offset k of a c-run pairs with
    # the c-1-k elements after it
    offs = np.arange(len(h)) - np.repeat(starts, counts)
    reps = np.repeat(counts, counts) - 1 - offs
    total = int(reps.sum())
    if total == 0:
        return pd.DataFrame({"doc_a": pd.Series([], dtype="int64"),
                             "doc_b": pd.Series([], dtype="int64")})
    left = np.repeat(np.arange(len(h)), reps)
    cum = np.concatenate([[0], np.cumsum(reps)])
    right = np.arange(total) - np.repeat(cum[:-1], reps) + left + 1

    dx, dy = doc[left], doc[right]
    keep = dx != dy
    dx, dy = dx[keep], dy[keep]
    nx, ny = n[left][keep], n[right][keep]
    px, py = pos[left][keep], pos[right][keep]
    lo = np.minimum(nx, ny)
    hi = np.maximum(nx, ny)
    m = 100 * lo >= threshold_pct * hi
    alpha = ((threshold_pct * (nx + ny) + 100 + threshold_pct - 1)
             // (100 + threshold_pct))
    oub = (np.minimum(px, py) + 1
           + np.minimum(nx - px - 1, ny - py - 1))
    m &= oub >= alpha
    a = np.minimum(dx[m], dy[m])
    b = np.maximum(dx[m], dy[m])
    uniq = np.unique(np.stack([a, b], axis=1), axis=0)
    return pd.DataFrame({"doc_a": uniq[:, 0], "doc_b": uniq[:, 1]})


def jaccard_join_pairs(ray, sf_dir: str, threshold_pct: int = 50,
                       k: int = 3):
    """(doc_a, doc_b, n_common, jaccard_pct): EVERY pair of documents
    whose word-k-gram-set Jaccard is >= threshold_pct/100 — an EXACT
    similarity join via prefix filtering, all comparisons in integer
    arithmetic (bit-exact vs the DuckDB oracle, no float thresholds).

    Scale shape — three bucketed int64-triple exchanges plus the
    standard two-join verify, text never shuffles:
      1. gram-keyed: global document frequency per gram hash (all rows
         of one gram meet in one bucket, so a per-bucket count IS the
         global df);
      2. doc-keyed: each doc's PREFIX under the global (df asc, h asc)
         token order — p = n - ceil(tau*n) + 1 grams; the prefix-filter
         theorem guarantees any qualifying pair shares a prefix gram,
         and df-ascending ordering keeps stop-grams OUT of prefixes, so
         hot grams never generate candidate floods;
      3. gram-keyed: candidate pairs from shared prefix grams with the
         length prune 100*min(n) >= tau*max(n), distinct-merged;
      4. candidates join back to their gram-set blobs (two distributed
         ``Dataset.join``s, the ``_verify_pairs_exchange`` shape) and
         the exact integer intersection decides membership.

    Partitioning assumption: per-bucket candidate work is
    sum_over_prefix_grams(df^2) — bounded in practice by the df-ordered
    prefixes; a corpus where RARE grams are shared by many near-dup
    docs concentrates pairs by construction (they are real output)."""
    from ..io_utils import parquet_column_bytes
    from ..stages.aggregates import (buckets_for, hash_bucket_aggregate,
                                     int_bucket_column,
                                     join_partitions_for,
                                     normalize_for_join)

    gs = _gram_set_table(ray, sf_dir, k).materialize()
    n_gram_rows = max(1, parquet_column_bytes(
        f"{sf_dir}/documents.parquet", "text") // 6)
    B = buckets_for(n_gram_rows)

    ex = gs.map_batches(lambda t: _explode_gram_rows(t, bucket=B),
                        batch_format="pyarrow")

    def _typed_empty(cols):
        return pd.DataFrame({c: pd.Series([], dtype="int64")
                             for c in cols})

    # gram document frequencies — the ONE unavoidable exchange; the df
    # TABLE is distinct-gram-bounded (far below the exploded row count)
    def df_partial(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0 or "h" not in df.columns:
            return _typed_empty(["h", "df"])
        g = df.groupby("h", as_index=False).size()
        return pd.DataFrame({"h": g["h"],
                             "df": g["size"].astype("int64")})

    dfp = None
    if n_gram_rows * 16 <= 64 << 20:
        # the whole exploded-gram bound fits the broadcast budget:
        # fold the per-batch df partials on the driver (one map pass,
        # NO all-to-all)
        parts = ex.map_batches(df_partial,
                               batch_format="pandas").to_pandas()
        dfp = parts.groupby("h", as_index=False)["df"].sum()
    else:
        df_tbl = hash_bucket_aggregate(
            ex, ["h"], df_partial,
            merge=lambda df: df.groupby("h", as_index=False)["df"].sum(),
            n_rows=n_gram_rows).materialize()
        if df_tbl.count() * 16 <= 64 << 20:
            dfp = df_tbl.to_pandas()

    if dfp is not None:
        # df table fits the broadcast budget: per-doc prefixes come
        # straight from the gram-set blobs in ONE map pass — the
        # gram-keyed df-attach and doc-keyed regroup exchanges vanish
        dfp = dfp.sort_values("h")
        ha = dfp["h"].to_numpy().astype(np.int64)
        dfa = dfp["df"].to_numpy().astype(np.int64)
        ref = ray.put((ha, dfa))

        def prefix_local(t: pa.Table) -> pa.Table:
            k_arr, d_arr = ray.get(ref)
            hs, docs, ns, ps = [], [], [], []
            ids = t.column("doc_id").to_pylist()
            for did, n, blob in zip(ids, t.column("n").to_pylist(),
                                    t.column("sh").to_pylist()):
                if n == 0:
                    continue
                arr = np.frombuffer(blob,
                                    dtype=np.uint64).view(np.int64)
                dfs = d_arr[np.searchsorted(k_arr, arr)]
                p = n - (threshold_pct * n + 99) // 100 + 1
                # (df asc, h asc) global token order, same as the
                # exchange path's mergesort
                top = np.lexsort((arr, dfs))[:p]
                hs.append(arr[top])
                docs.append(np.full(len(top), did, np.int64))
                ns.append(np.full(len(top), n, np.int64))
                ps.append(np.arange(len(top), dtype=np.int64))
            h = np.concatenate(hs) if hs else np.zeros(0, np.int64)
            d = np.concatenate(docs) if docs else np.zeros(0, np.int64)
            nv = np.concatenate(ns) if ns else np.zeros(0, np.int64)
            pv = np.concatenate(ps) if ps else np.zeros(0, np.int64)
            return pa.table({"h": pa.array(h), "doc": pa.array(d),
                             "n": pa.array(nv), "pos": pa.array(pv)})

        pref = gs.map_batches(prefix_local, batch_format="pyarrow")
    else:
        # exchange 1 (gram-keyed): attach the GLOBAL df to every row
        def with_df(g: pd.DataFrame) -> pd.DataFrame:
            if len(g) == 0 or "h" not in g.columns:
                return _typed_empty(["h", "doc", "n", "df"])
            g = g.drop(columns=["hb"])
            g["df"] = (g.groupby("h")["h"].transform("size")
                       .astype("int64"))
            return g

        wdf = ex.groupby("hb").map_groups(with_df, batch_format="pandas")

        # exchange 2 (doc-keyed): per-doc prefix under (df asc, h asc)
        def add_db(t: pa.Table) -> pa.Table:
            if t.num_rows == 0 or "doc" not in t.column_names:
                return pa.table({c: pa.array([], pa.int64())
                                 for c in ("h", "doc", "n", "df", "db")})
            d = t.column("doc").to_numpy(zero_copy_only=False)
            return t.append_column("db",
                                   pa.array(int_bucket_column(d, B)))

        def prefix(g: pd.DataFrame) -> pd.DataFrame:
            if len(g) == 0 or "doc" not in g.columns:
                return _typed_empty(["h", "doc", "n", "pos"])
            g = (g.drop(columns=["db"])
                  .sort_values(["doc", "df", "h"], kind="mergesort"))
            pos = g.groupby("doc").cumcount().to_numpy()
            n = g["n"].to_numpy()
            p = n - (threshold_pct * n + 99) // 100 + 1
            mask = pos < p
            out = g.loc[mask, ["h", "doc", "n"]].copy()
            out["pos"] = pos[mask]
            return out

        pref = (wdf.map_batches(add_db, batch_format="pyarrow")
                   .groupby("db").map_groups(prefix,
                                             batch_format="pandas"))

    # exchange 3 (gram-keyed): candidates from shared prefix grams
    def add_hb(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "h" not in t.column_names:
            return pa.table({c: pa.array([], pa.int64())
                             for c in ("h", "doc", "n", "pos", "hb")})
        h = t.column("h").to_numpy(zero_copy_only=False)
        return t.append_column("hb", pa.array(int_bucket_column(h, B)))

    def pairs(g: pd.DataFrame) -> pd.DataFrame:
        if len(g) == 0 or "h" not in g.columns:
            return _typed_empty(["doc_a", "doc_b"])
        m = g.drop(columns=["hb"]).merge(g.drop(columns=["hb"]), on="h")
        m = m[m["doc_x"] < m["doc_y"]]
        if len(m):
            nx = m["n_x"].to_numpy()
            ny = m["n_y"].to_numpy()
            lo = np.minimum(nx, ny)
            hi = np.maximum(nx, ny)
            keep = 100 * lo >= threshold_pct * hi
            # POSITIONAL filter (PPJoin): a gram shared at sorted
            # positions (px, py) bounds the overlap by
            # min(px,py) + 1 + min(nx-px-1, ny-py-1); a true pair needs
            # overlap >= ceil(tau*(nx+ny)/(1+tau)) — every bound is an
            # upper bound on the SAME overlap, so filtering per row is
            # sound (true pairs pass all bounds)
            px = m["pos_x"].to_numpy()
            py = m["pos_y"].to_numpy()
            alpha = ((threshold_pct * (nx + ny) + 100 + threshold_pct
                      - 1) // (100 + threshold_pct))
            oub = (np.minimum(px, py) + 1
                   + np.minimum(nx - px - 1, ny - py - 1))
            m = m[keep & (oub >= alpha)]
        out = m[["doc_x", "doc_y"]].drop_duplicates()
        return pd.DataFrame({"doc_a": out["doc_x"].astype("int64"),
                             "doc_b": out["doc_y"].astype("int64")})

    cand_pd = None
    if n_gram_rows * 32 <= 64 << 20:
        # the whole prefix table (<= exploded-gram bound, 4 int64 cols)
        # fits the broadcast budget: fold candidate generation on the
        # driver with the SAME pairs kernel — one collect replaces two
        # all-to-all exchanges (pair groupby + distinct merge). The
        # exchange path below is the 100-TB route.
        pf = pref.to_pandas()
        cand_pd = (_prefix_pairs_fold(pf, threshold_pct) if len(pf)
                   else _typed_empty(["doc_a", "doc_b"]))
        n_cand = len(cand_pd)
    else:
        cand = (pref.map_batches(add_hb, batch_format="pyarrow")
                    .groupby("hb").map_groups(pairs,
                                              batch_format="pandas"))
        # the same pair arises from several shared prefix grams in
        # DIFFERENT buckets — one bucketed distinct merge
        cand = hash_bucket_aggregate(
            cand, ["doc_a", "doc_b"],
            lambda df: df.drop_duplicates(["doc_a", "doc_b"])).materialize()
        n_cand = cand.count()

    empty = pa.table({"doc_a": pa.array([], pa.int64()),
                      "doc_b": pa.array([], pa.int64()),
                      "n_common": pa.array([], pa.int64()),
                      "jaccard_pct": pa.array([], pa.int64())})
    if n_cand == 0:
        return empty

    # small candidate sets verify DRIVER-SIDE from a membership-filtered
    # collect of the touched gram-set blobs — bounded by the broadcast
    # budget (avg set bytes x touched docs), killing two distributed
    # joins + a sort whose fixed cost dwarfs a few hundred intersections
    n_docs = max(1, gs.count())
    avg_set_bytes = 8 * n_gram_rows // n_docs
    if 2 * n_cand * max(64, avg_set_bytes) <= 64 << 20:
        from ..stages.joins import key_membership_filter

        cpd = cand_pd if cand_pd is not None else cand.to_pandas()
        need = np.unique(np.concatenate(
            [cpd["doc_a"].to_numpy().astype(np.int64),
             cpd["doc_b"].to_numpy().astype(np.int64)]))
        sub = key_membership_filter(ray, gs, "doc_id", need,
                                    keep_matched=True).to_pandas()
        sets = {int(d): np.frombuffer(b, dtype=np.uint64)
                for d, b in zip(sub["doc_id"], sub["sh"])}
        ka, kb, nc, jp = [], [], [], []
        for a, b in zip(cpd["doc_a"], cpd["doc_b"]):
            sa, sb = sets[int(a)], sets[int(b)]
            ni = len(np.intersect1d(sa, sb, assume_unique=True))
            u = len(sa) + len(sb) - ni
            if u > 0 and 100 * ni >= threshold_pct * u:
                ka.append(int(a))
                kb.append(int(b))
                nc.append(ni)
                jp.append(100 * ni // u)
        return (pd.DataFrame({"doc_a": ka, "doc_b": kb,
                              "n_common": nc, "jaccard_pct": jp})
                .astype("int64")
                .sort_values(["doc_a", "doc_b"])
                .reset_index(drop=True))

    if cand_pd is not None:
        # driver-folded candidates exceeded the verify budget: lift
        # them back to a Dataset for the distributed two-join verify
        cand = ray.data.from_arrow(pa.table({
            "doc_a": pa.array(cand_pd["doc_a"].to_numpy(np.int64)),
            "doc_b": pa.array(cand_pd["doc_b"].to_numpy(np.int64))}))
    cand = normalize_for_join(
        cand, pa.schema([("doc_a", pa.int64()),
                         ("doc_b", pa.int64())])).materialize()
    nparts = join_partitions_for(n_cand)
    sh_a = gs.map_batches(
        lambda t: t.select(["doc_id", "sh"]).rename_columns(
            ["doc_a", "sh_a"]), batch_format="pyarrow")
    sh_b = gs.map_batches(
        lambda t: t.select(["doc_id", "sh"]).rename_columns(
            ["doc_b", "sh_b"]), batch_format="pyarrow")
    j = cand.join(sh_a, join_type="inner", on=("doc_a",),
                  num_partitions=nparts)
    j = j.join(sh_b, join_type="inner", on=("doc_b",),
               num_partitions=nparts)

    def verify(batch: pa.Table) -> pa.Table:
        da = batch.column("doc_a").to_numpy(zero_copy_only=False)
        db = batch.column("doc_b").to_numpy(zero_copy_only=False)
        ka, kb, nc, jp = [], [], [], []
        for x, y, sa, sb in zip(da, db, _sh_rows(batch.column("sh_a")),
                                _sh_rows(batch.column("sh_b"))):
            ni = len(np.intersect1d(sa, sb, assume_unique=True))
            u = len(sa) + len(sb) - ni
            if u > 0 and 100 * ni >= threshold_pct * u:
                ka.append(int(x))
                kb.append(int(y))
                nc.append(ni)
                jp.append(100 * ni // u)
        return pa.table({"doc_a": pa.array(ka, pa.int64()),
                         "doc_b": pa.array(kb, pa.int64()),
                         "n_common": pa.array(nc, pa.int64()),
                         "jaccard_pct": pa.array(jp, pa.int64())})

    return (j.map_batches(verify, batch_format="pyarrow")
             .sort(["doc_a", "doc_b"]))


def containment_join_pairs(ray, sf_dir: str, threshold_pct: int = 80,
                           k: int = 3):
    """(doc_a, doc_b, n_common, containment_pct): EXACT containment
    similarity join — every ORDERED pair where doc_a's word-k-gram set
    is >= threshold_pct/100 contained in doc_b's
    (|A∩B| / |A| >= tau). The asymmetric complement of
    ``jaccard_join_pairs``: it catches a short document embedded in a
    longer one (quote farms, wrapper pages, partial mirrors) that
    symmetric Jaccard misses because the union is dominated by the
    container. All arithmetic is integer (bit-exact vs DuckDB).

    Prefix filter for containment (Chaudhuri et al., ICDE'06 /
    PPJoin's containment variant): |A∩B| >= ceil(tau*|A|) forces A's
    first p = |A| - ceil(tau*|A|) + 1 grams under the global
    (df asc, h asc) token order to intersect B — the FULL B, so
    candidates come from A-prefix rows probing the complete posting
    table, not prefix x prefix. df-ascending prefixes hold each doc's
    rarest grams, which bounds per-gram posting fan-out.

    Scale shape mirrors ``jaccard_join_pairs``: df table folded on the
    driver under the broadcast budget (else one bucketed exchange),
    candidates as an h-bucketed prefix x posting merge (driver-folded
    numpy expansion when the exploded bound fits), verify via the
    membership-filtered blob collect or the two-join exchange."""
    from ..io_utils import parquet_column_bytes
    from ..stages.aggregates import (buckets_for, hash_bucket_aggregate,
                                     int_bucket_column,
                                     join_partitions_for,
                                     normalize_for_join)
    from ..stages.joins import key_membership_filter

    tau = threshold_pct
    gs = _gram_set_table(ray, sf_dir, k).materialize()
    n_gram_rows = max(1, parquet_column_bytes(
        f"{sf_dir}/documents.parquet", "text") // 6)
    empty = pa.table({"doc_a": pa.array([], pa.int64()),
                      "doc_b": pa.array([], pa.int64()),
                      "n_common": pa.array([], pa.int64()),
                      "containment_pct": pa.array([], pa.int64())})

    if n_gram_rows * 24 <= 64 << 20:
        # whole exploded posting table fits the broadcast budget:
        # df / prefixes / candidate expansion fold on the driver in
        # pure numpy, the verify reads only the touched blobs
        ept = gs.map_batches(
            lambda t: _explode_gram_rows(t), batch_format="pyarrow"
        ).to_pandas()
        if len(ept) == 0:
            return empty
        h = ept["h"].to_numpy().astype(np.int64)
        doc = ept["doc"].to_numpy().astype(np.int64)
        n = ept["n"].to_numpy().astype(np.int64)

        # global df per gram + posting order
        ho = np.argsort(h, kind="stable")
        h_s, doc_s, n_s = h[ho], doc[ho], n[ho]
        starts = np.flatnonzero(np.r_[True, h_s[1:] != h_s[:-1]])
        counts = np.diff(np.r_[starts, len(h_s)])
        h_keys = h_s[starts]
        dfv = np.repeat(counts, counts)  # df aligned to posting order

        # per-doc prefixes under (df asc, h asc): doc-major lexsort
        do = np.lexsort((h_s, dfv, doc_s))
        dh, dd, dn = h_s[do], doc_s[do], n_s[do]
        dstart = np.flatnonzero(np.r_[True, dd[1:] != dd[:-1]])
        dcnt = np.diff(np.r_[dstart, len(dd)])
        pos = np.arange(len(dd)) - np.repeat(dstart, dcnt)
        p = dn - (tau * dn + 99) // 100 + 1
        pm = pos < p
        pa_h, pa_doc, pa_n = dh[pm], dd[pm], dn[pm]

        # candidate expansion: each prefix row probes its gram's full
        # posting run
        ri = np.searchsorted(h_keys, pa_h)
        s = starts[ri]
        c = counts[ri]
        total = int(c.sum())
        if total == 0:
            return empty
        left = np.repeat(np.arange(len(pa_h)), c)
        cum = np.concatenate([[0], np.cumsum(c)])
        right = (np.arange(total) - np.repeat(cum[:-1], c)
                 + np.repeat(s, c))
        a_doc, a_n = pa_doc[left], pa_n[left]
        b_doc, b_n = doc_s[right], n_s[right]
        m = (a_doc != b_doc) & (100 * b_n >= tau * a_n)
        if not m.any():
            return empty
        uniq = np.unique(np.stack([a_doc[m], b_doc[m]], axis=1), axis=0)

        need = np.unique(uniq)
        sub = key_membership_filter(ray, gs, "doc_id", need,
                                    keep_matched=True).to_pandas()
        sets = {int(d): np.frombuffer(b, dtype=np.uint64)
                for d, b in zip(sub["doc_id"], sub["sh"])}
        ka, kb, nc, cp = [], [], [], []
        for a, b in uniq:
            sa, sb = sets[int(a)], sets[int(b)]
            if len(sa) == 0:
                continue
            ni = len(np.intersect1d(sa, sb, assume_unique=True))
            if 100 * ni >= tau * len(sa):
                ka.append(int(a))
                kb.append(int(b))
                nc.append(ni)
                cp.append(100 * ni // len(sa))
        return (pd.DataFrame({"doc_a": ka, "doc_b": kb,
                              "n_common": nc, "containment_pct": cp})
                .astype("int64")
                .sort_values(["doc_a", "doc_b"])
                .reset_index(drop=True))

    # ---- exchange route (the 100-TB shape) ----
    B = buckets_for(n_gram_rows)
    ex = gs.map_batches(
        lambda t: _explode_gram_rows(t, bucket=B),
        batch_format="pyarrow").materialize()

    def _typed_empty(cols):
        return pd.DataFrame({c: pd.Series([], dtype="int64")
                             for c in cols})

    def df_partial(df_: pd.DataFrame) -> pd.DataFrame:
        if len(df_) == 0 or "h" not in df_.columns:
            return _typed_empty(["h", "df"])
        g = df_.groupby("h", as_index=False).size()
        return pd.DataFrame({"h": g["h"],
                             "df": g["size"].astype("int64")})

    df_tbl = hash_bucket_aggregate(
        ex, ["h"], df_partial,
        merge=lambda d: d.groupby("h", as_index=False)["df"].sum(),
        n_rows=n_gram_rows).materialize()
    dfp = df_tbl.to_pandas().sort_values("h")
    ha = dfp["h"].to_numpy().astype(np.int64)
    dfa = dfp["df"].to_numpy().astype(np.int64)
    ref = ray.put((ha, dfa))

    def prefix_local(t: pa.Table) -> pa.Table:
        k_arr, d_arr = ray.get(ref)
        hs, docs, ns = [], [], []
        for did, nn, blob in zip(t.column("doc_id").to_pylist(),
                                 t.column("n").to_pylist(),
                                 t.column("sh").to_pylist()):
            if nn == 0:
                continue
            arr = np.frombuffer(blob, dtype=np.uint64).view(np.int64)
            dfs = d_arr[np.searchsorted(k_arr, arr)]
            pp = nn - (tau * nn + 99) // 100 + 1
            top = np.lexsort((arr, dfs))[:pp]
            hs.append(arr[top])
            docs.append(np.full(len(top), did, np.int64))
            ns.append(np.full(len(top), nn, np.int64))
        hh = np.concatenate(hs) if hs else np.zeros(0, np.int64)
        dd = np.concatenate(docs) if docs else np.zeros(0, np.int64)
        nv = np.concatenate(ns) if ns else np.zeros(0, np.int64)
        return pa.table({"h": pa.array(hh), "doc": pa.array(dd),
                         "n": pa.array(nv),
                         "hb": pa.array(int_bucket_column(hh, B)),
                         "pref": pa.array(np.ones(len(hh), np.bool_))})

    pref = gs.map_batches(prefix_local, batch_format="pyarrow")
    both = pref.union(ex.map_batches(
        lambda t: t.append_column(
            "pref", pa.array(np.zeros(t.num_rows, np.bool_))),
        batch_format="pyarrow"))

    def pairs(g: pd.DataFrame) -> pd.DataFrame:
        if len(g) == 0 or "h" not in g.columns:
            return _typed_empty(["doc_a", "doc_b"])
        pp = g[g["pref"]]
        fl = g[~g["pref"]]
        if len(pp) == 0 or len(fl) == 0:
            return _typed_empty(["doc_a", "doc_b"])
        m = pp[["h", "doc", "n"]].merge(fl[["h", "doc", "n"]], on="h",
                                        suffixes=("_a", "_b"))
        m = m[(m["doc_a"] != m["doc_b"])
              & (100 * m["n_b"] >= tau * m["n_a"])]
        out = m[["doc_a", "doc_b"]].drop_duplicates()
        return pd.DataFrame({"doc_a": out["doc_a"].astype("int64"),
                             "doc_b": out["doc_b"].astype("int64")})

    cand = hash_bucket_aggregate(
        both.groupby("hb").map_groups(pairs, batch_format="pandas"),
        ["doc_a", "doc_b"],
        lambda d: d.drop_duplicates(["doc_a", "doc_b"])).materialize()
    n_cand = cand.count()
    if n_cand == 0:
        return empty

    cand = normalize_for_join(
        cand, pa.schema([("doc_a", pa.int64()),
                         ("doc_b", pa.int64())])).materialize()
    nparts = join_partitions_for(n_cand)
    sh_a = gs.map_batches(
        lambda t: t.select(["doc_id", "sh", "n"]).rename_columns(
            ["doc_a", "sh_a", "n_a"]), batch_format="pyarrow")
    sh_b = gs.map_batches(
        lambda t: t.select(["doc_id", "sh"]).rename_columns(
            ["doc_b", "sh_b"]), batch_format="pyarrow")
    j = cand.join(sh_a, join_type="inner", on=("doc_a",),
                  num_partitions=nparts)
    j = j.join(sh_b, join_type="inner", on=("doc_b",),
               num_partitions=nparts)

    def verify(batch: pa.Table) -> pa.Table:
        da = batch.column("doc_a").to_numpy(zero_copy_only=False)
        db = batch.column("doc_b").to_numpy(zero_copy_only=False)
        ka, kb, nc, cp = [], [], [], []
        for x, y, sa, sb in zip(da, db, _sh_rows(batch.column("sh_a")),
                                _sh_rows(batch.column("sh_b"))):
            if len(sa) == 0:
                continue
            ni = len(np.intersect1d(sa, sb, assume_unique=True))
            if 100 * ni >= tau * len(sa):
                ka.append(int(x))
                kb.append(int(y))
                nc.append(ni)
                cp.append(100 * ni // len(sa))
        return pa.table({"doc_a": pa.array(ka, pa.int64()),
                         "doc_b": pa.array(kb, pa.int64()),
                         "n_common": pa.array(nc, pa.int64()),
                         "containment_pct": pa.array(cp, pa.int64())})

    return (j.map_batches(verify, batch_format="pyarrow")
             .sort(["doc_a", "doc_b"]))


def _explode_gram_rows(t: pa.Table, bucket: int | None = None) -> pa.Table:
    """(h, doc, n) posting rows from a gram-set blob batch; with
    ``bucket`` also an ``hb`` coarse-bucket column."""
    from ..stages.aggregates import int_bucket_column

    hs, docs, ns = [], [], []
    for did, n, blob in zip(t.column("doc_id").to_pylist(),
                            t.column("n").to_pylist(),
                            t.column("sh").to_pylist()):
        if n == 0:
            continue
        hs.append(np.frombuffer(blob, dtype=np.uint64).view(np.int64))
        docs.append(np.full(n, did, np.int64))
        ns.append(np.full(n, n, np.int64))
    h = np.concatenate(hs) if hs else np.zeros(0, np.int64)
    d = np.concatenate(docs) if docs else np.zeros(0, np.int64)
    nv = np.concatenate(ns) if ns else np.zeros(0, np.int64)
    cols = {"h": pa.array(h), "doc": pa.array(d), "n": pa.array(nv)}
    if bucket is not None:
        cols["hb"] = pa.array(int_bucket_column(h, bucket))
    return pa.table(cols)


def dedup_lsh_recall(ray, sf_dir: str, threshold_pct: int = 50):
    """(n_exact, n_found, n_missed, recall_bp): the LSH banding
    pipeline's RECALL against the exact similarity join at the same
    threshold — the audit an engine owes its own approximations (LSH
    candidates can miss true pairs; the prefix-filter join cannot).
    recall_bp = 10000 * |exact ∩ lsh| / |exact|, integer basis points.
    Both pair sets are the (small) outputs of their already-verified
    pipelines, so the set compare is a bounded driver fold."""
    exact = jaccard_join_pairs(ray, sf_dir, threshold_pct)
    exact = exact.to_pandas() if hasattr(exact, "to_pandas") else exact
    lsh = ngram_jaccard_pairs(ray, sf_dir, threshold_pct / 100)
    lsh = lsh.to_pandas() if hasattr(lsh, "to_pandas") else lsh
    ep = set(zip(exact["doc_a"], exact["doc_b"]))
    lp = set(zip(lsh["doc_a"], lsh["doc_b"]))
    n_exact, n_found = len(ep), len(ep & lp)
    recall_bp = (10_000 * n_found // n_exact) if n_exact else 10_000
    return pd.DataFrame({"n_exact": [n_exact], "n_found": [n_found],
                         "n_missed": [n_exact - n_found],
                         "recall_bp": [recall_bp]}).astype("int64")


_CLUSTERS_MEMO: dict = {}  # (path, mtime, size, threshold) -> members


def dedup_clusters(ray, sf_dir: str, threshold: float = 0.8,
                   max_iters: int = 50):
    """(doc_id, cluster_id): near-duplicate clusters = connected
    components of the verified MinHash pair graph, via the distributed
    min-label propagation in ``propagate_min_labels``.

    The MATERIALIZED result memoizes per session keyed by the corpus
    file's identity (path, mtime, size) + threshold — the downstream
    consumers (keep-best survivor selection, per-source dup rates) ask
    for the same clustering, and re-running the shingle/band/verify/
    propagate chain per consumer would triple the cost (the same
    share-don't-recompute rule as the shingle TokenHashCache)."""
    import os

    doc_path = os.path.join(sf_dir, "documents.parquet")
    st = os.stat(doc_path)
    key = (os.path.realpath(doc_path), st.st_mtime_ns, st.st_size,
           threshold)
    if key in _CLUSTERS_MEMO:
        return _CLUSTERS_MEMO[key]

    empty = pa.table({"doc_id": pa.array([], pa.int64()),
                      "cluster_id": pa.array([], pa.int64())})
    pairs = minhash_lsh_pairs(ray, sf_dir, threshold=threshold)
    if isinstance(pairs, pa.Table):
        # the verify's broadcast path returns a plain Table (possibly
        # empty); lift it back to a Dataset for the propagation rounds
        if pairs.num_rows == 0:
            return empty
        pairs = ray.data.from_arrow(pairs)
    edges = pairs.materialize()  # pair IDS only, bounded by verification
    n_edges = edges.count()
    if n_edges == 0:
        return empty
    if n_edges * 16 <= 64 << 20:
        # the edge list fits the broadcast budget: fold connected
        # components on the driver (path-compressed union-find over
        # int64 ids, min-id labels) — the same bounded-collect rule as
        # every other driver fold; the distributed propagation below is
        # the route once the pair graph outgrows the budget
        ep = edges.to_pandas()
        out = ray.data.from_arrow(_local_min_components(ep))
    else:
        out = propagate_min_labels(ray, edges, max_iters=max_iters)
    out = out.materialize()  # O(near-dup members) — safe to pin
    _CLUSTERS_MEMO.clear()   # keep at most one corpus pinned
    _CLUSTERS_MEMO[key] = out
    return out


def _local_min_components(ep: pd.DataFrame) -> pa.Table:
    """(doc_id, cluster_id) for the nodes of a driver-held edge list:
    path-compressed union-find, each component labeled with its minimum
    member id — exactly ``propagate_min_labels``'s output contract."""
    a = ep["doc_a"].to_numpy().astype(np.int64)
    b = ep["doc_b"].to_numpy().astype(np.int64)
    nodes = np.unique(np.concatenate([a, b]))
    idx = {int(v): i for i, v in enumerate(nodes)}
    parent = list(range(len(nodes)))

    def find(x: int) -> int:
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for x, y in zip(a, b):
        rx, ry = find(idx[int(x)]), find(idx[int(y)])
        if rx != ry:
            parent[ry] = rx
    roots = np.fromiter((find(i) for i in range(len(nodes))),
                        dtype=np.int64, count=len(nodes))
    # min node id per root (nodes ascending => first occurrence is min)
    first = {}
    for i, r in enumerate(roots):
        if int(r) not in first:
            first[int(r)] = int(nodes[i])
    labels = np.fromiter((first[int(r)] for r in roots),
                         dtype=np.int64, count=len(nodes))
    order = np.argsort(nodes, kind="stable")
    return pa.table({"doc_id": pa.array(nodes[order]),
                     "cluster_id": pa.array(labels[order])})


def propagate_min_labels(ray, edges, max_iters: int = 50):
    """Connected components of an undirected pair graph — a MATERIALIZED
    Dataset of ``(doc_a, doc_b)`` int64 edges — as ``(doc_id,
    cluster_id)`` with ``cluster_id`` = the component's minimum id, via
    DISTRIBUTED grouped min-label propagation: no driver-side
    union-find, so the pair graph can be arbitrarily large.

    Each round: ONE hash join of the (pre-built, bidirectional) edge
    list against the label table sends every endpoint's label to its
    neighbor; the grouped min of (own label, incoming messages) becomes
    the new labels. Labels only decrease, so the monotone label sum
    detects convergence; rounds needed = component diameter (near-dup
    clusters from banding are near-cliques, so 2-3 in practice).

    The convergence sum PIGGYBACKS on the label aggregate (each bucket's
    merge task ships its partial label sum to a tiny accumulator actor,
    keyed by (round, bucket) so retries cannot double-count) — one
    dataset execution per round, no separate aggregate(Sum) probe."""
    from ..stages.aggregates import hash_bucket_aggregate

    n_edges = edges.count()
    from ..stages.aggregates import join_partitions_for

    nparts = join_partitions_for(n_edges)

    def nodes(t: pa.Table) -> pa.Table:
        ids = np.concatenate([
            t.column("doc_a").to_numpy(zero_copy_only=False),
            t.column("doc_b").to_numpy(zero_copy_only=False)])
        return pa.table({"doc_id": pa.array(ids, pa.int64()),
                         "cluster_id": pa.array(ids, pa.int64())})

    def _min_combine(df: pd.DataFrame) -> pd.DataFrame:
        return df.groupby("doc_id", as_index=False).min()

    from ..stages.aggregates import normalize_for_join

    _LBL = pa.schema([("doc_id", pa.int64()), ("cluster_id", pa.int64())])

    def _typed(names):
        def f(t: pa.Table) -> pa.Table:
            if "doc_id" not in t.column_names:
                return pa.table({names[0]: pa.array([], pa.int64()),
                                 names[1]: pa.array([], pa.int64())})
            return (t.select(["doc_id", "cluster_id"])
                     .rename_columns(list(names)))
        return f

    # tiny accumulator actor: per-(round, bucket) partial label sums,
    # written synchronously from each bucket's merge task (idempotent —
    # a retried bucket task overwrites its own slot)
    import ray as _ray

    @_ray.remote(num_cpus=0)
    class _LabelSumAcc:
        def __init__(self):
            self._rounds: dict[int, dict[int, int]] = {}

        def put(self, rnd: int, bucket: int, s: int) -> None:
            self._rounds.setdefault(rnd, {})[bucket] = s

        def total(self, rnd: int) -> int:
            return sum(self._rounds.get(rnd, {}).values())

    acc = _LabelSumAcc.remote()

    def _agg_labels(ds, rnd: int):
        # normalize_for_join scrubs the column-less empty blocks that
        # map_groups emits — required before every Dataset.join;
        # fan-out sized from the edge count (nodes <= 2 * edges)
        def sidecar(bucket: int, g: pd.DataFrame) -> None:
            # blocking get: when materialize() returns, every bucket's
            # sum is already recorded
            _ray.get(acc.put.remote(rnd, bucket,
                                    int(g["cluster_id"].sum())))

        return normalize_for_join(
            hash_bucket_aggregate(ds, ["doc_id"], _min_combine,
                                  n_rows=2 * n_edges, sidecar=sidecar),
            _LBL).materialize()

    labels = _agg_labels(edges.map_batches(nodes, batch_format="pyarrow"),
                         rnd=0)

    # bidirectional edge list built ONCE: each round needs only a single
    # join (src -> its label), with the joined label forwarded to dst
    def bidir(t: pa.Table) -> pa.Table:
        a = t.column("doc_a").to_numpy(zero_copy_only=False)
        b = t.column("doc_b").to_numpy(zero_copy_only=False)
        return pa.table({
            "src": pa.array(np.concatenate([a, b]), pa.int64()),
            "dst": pa.array(np.concatenate([b, a]), pa.int64())})

    bi = edges.map_batches(bidir, batch_format="pyarrow").materialize()

    # try/finally: a failed round (join crash, worker OOM) must not leak
    # the accumulator actor — without the kill it would outlive every
    # failed invocation for the whole session
    try:
        prev = ray.get(acc.total.remote(0))
        for it in range(max_iters):
            la = labels.map_batches(_typed(("src", "lbl")),
                                    batch_format="pyarrow")
            j = bi.join(la, join_type="inner", on=("src",),
                        num_partitions=nparts)

            def msgs(t: pa.Table) -> pa.Table:
                return pa.table({
                    "doc_id": t.column("dst").cast(pa.int64()),
                    "cluster_id": t.column("lbl").cast(pa.int64())})

            # NOTE: a pointer-jumping (label-of-label) shortcut join was
            # measured here and REVERTED: it halves the round count on
            # chain-shaped components but doubles the per-round DAG
            # depth, and at bench scale rounds are scheduling-cost-
            # dominated — the shortcut variant ran ~1.9x SLOWER
            # end-to-end. Plain neighbor propagation (rounds = component
            # diameter) is the better trade until per-round work, not
            # round count, dominates.
            labels = _agg_labels(
                labels.union(j.map_batches(msgs, batch_format="pyarrow")),
                rnd=it + 1)
            cur = ray.get(acc.total.remote(it + 1))
            if cur == prev:
                break
            prev = cur
    finally:
        ray.kill(acc)
    return labels.sort("doc_id")


def hamming_pairs_int64(hashes_ds, n_rows: int, max_hamming: int = 3,
                        hash_col: str = "h"):
    """Generic 64-bit hamming-distance similarity join: (doc_id, <hash_col>)
    -> distinct (doc_a, doc_b) pairs with popcount(h_a XOR h_b) <=
    ``max_hamming``, candidates via 4-segment pigeonhole blocking (any
    pair within distance 3 shares at least one exact 16-bit segment —
    LOSSLESS for max_hamming <= 3).

    ``hash_col`` must be the centered-int64 encoding of a uint64 hash
    (``(h ^ (1 << 63)).view(int64)``): the re-cast back to uint64 flips
    bit 63 of every value consistently, so XOR/hamming is unaffected.
    Shared engine for text simhash and image perceptual-hash dedup; the
    shuffle moves only (doc_id, segment, hash) triples, never payloads."""
    from ..stages.aggregates import buckets_for

    n_cbuckets = buckets_for(4 * n_rows)  # 4 segment rows per input row

    def to_segments(batch: pa.Table) -> pa.Table:
        doc_ids = np.asarray(batch.column("doc_id").to_pylist(),
                             dtype=np.int64)
        sh = (batch.column(hash_col).to_numpy(zero_copy_only=False)
              .astype(np.int64).astype(np.uint64))
        n = len(doc_ids)
        segs = np.arange(4, dtype=np.int64)
        d_out = np.repeat(doc_ids, 4)
        s_out = np.tile(segs, n)
        v_out = ((sh[:, None] >> (np.uint64(16) * segs.astype(np.uint64)))
                 & np.uint64(0xFFFF)).astype(np.int64).ravel()
        h_out = np.repeat(sh.astype(np.int64), 4)
        return pa.table({"doc_id": pa.array(d_out, pa.int64()),
                         "seg_id": pa.array(s_out.astype(np.int32),
                                            pa.int32()),
                         "seg_val": pa.array(v_out, pa.int64()),
                         "simhash": pa.array(h_out, pa.int64())})

    segs = hashes_ds.map_batches(to_segments, batch_format="pyarrow",
                                 batch_size=512)

    def add_cbucket(batch: pa.Table) -> pa.Table:
        sv = batch.column("seg_val").to_numpy(zero_copy_only=False)
        si = batch.column("seg_id").to_numpy(zero_copy_only=False)
        cb = ((sv * 4 + si) % n_cbuckets).astype(np.int64)
        return batch.append_column("cbucket", pa.array(cb, pa.int64()))

    def coarse_pairs(group: pd.DataFrame) -> pd.DataFrame:
        g = group.drop_duplicates(["seg_id", "seg_val", "doc_id"])
        d = g[g.duplicated(["seg_id", "seg_val"], keep=False)]
        out_a: list[int] = []
        out_b: list[int] = []
        for _, sub in d.groupby(["seg_id", "seg_val"]):
            sub = sub.sort_values("doc_id")
            ids = sub["doc_id"].to_numpy()
            if len(ids) < 2:
                continue
            shs = (sub["simhash"].to_numpy().astype(np.int64)
                   .astype(np.uint64))
            ia, ib = np.triu_indices(len(ids), k=1)
            x = shs[ia] ^ shs[ib]
            ham = np.zeros(len(x), dtype=np.int64)
            for _ in range(64):
                ham += (x & np.uint64(1)).astype(np.int64)
                x >>= np.uint64(1)
            m = ham <= max_hamming
            out_a.extend(ids[ia][m])
            out_b.extend(ids[ib][m])
        return pd.DataFrame({"doc_a": pd.Series(out_a, dtype="int64"),
                             "doc_b": pd.Series(out_b, dtype="int64")})

    pairs = (segs.map_batches(add_cbucket, batch_format="pyarrow")
                 .groupby("cbucket")
                 .map_groups(coarse_pairs, batch_format="pandas"))
    # a pair within hamming distance can share up to 4 segments -> may
    # surface from several coarse buckets: distinct via the bucketed
    # DISTRIBUTED aggregate + distributed sort (never a driver
    # drop_duplicates — an all-near-identical corpus would put the full
    # C(n,2) pair set on the driver otherwise)
    from ..stages.aggregates import hash_bucket_aggregate

    return hash_bucket_aggregate(
        pairs, ["doc_a", "doc_b"],
        lambda df: df.drop_duplicates(["doc_a", "doc_b"]),
        # shuffled rows are pairs, <= 4 segment co-memberships each, so
        # bound by the segment row count (4/doc), not the doc count
        n_rows=4 * n_rows
    ).sort(["doc_a", "doc_b"])


def simhash_pairs(ray, sf_dir: str, max_hamming: int = 3):
    """Near-dup pairs by simhash hamming distance <= k, candidates via the
    4-segment pigeonhole blocking in ``hamming_pairs_int64``."""
    n_docs = _nrows(f"{sf_dir}/documents.parquet")
    ds = _rpq(ray, f"{sf_dir}/documents.parquet",
                               columns=["doc_id", "text"])

    def to_hashes(batch: pa.Table) -> pa.Table:
        from ..functions.hashing import simhash64_batch

        doc_ids = np.asarray(batch.column("doc_id").to_pylist(),
                             dtype=np.int64)
        texts = batch.column("text").to_pylist()
        codes, lengths, uh = _TOKEN_CACHE.encode_token_lists(
            [_tokenize(t) for t in texts])
        sh = simhash64_batch(codes, lengths, uh)
        # centered int64 encoding keeps ALL 64 bits (the old
        # `% (1 << 63)` zeroed bit 63, so hamming ignored it)
        h_out = (sh ^ np.uint64(1 << 63)).astype(np.int64)
        return pa.table({"doc_id": pa.array(doc_ids, pa.int64()),
                         "h": pa.array(h_out, pa.int64())})

    hashes = ds.map_batches(to_hashes, batch_format="pyarrow",
                            batch_size=512)
    return hamming_pairs_int64(hashes, n_docs, max_hamming)


# ---------------------------------------------------------------------------
def edit_distance_pairs(ray, sf_dir: str, threshold: int = 20):
    """(doc_id_a, doc_id_b, dist): EXACT edit-distance similarity join —
    every document pair with unit-cost Levenshtein distance <=
    ``threshold``, verified bit-exactly against DuckDB's ``levenshtein``
    (this is the character-level complement of the token-level
    MinHash/SimHash family: it catches small in-place edits that keep
    most shingles intact but also typo-level rewrites that break them).

    Three-stage shape, all filters LOSSLESS (admit-then-verify; no pair
    within the threshold can be pruned):

    1. length blocking — ed(a,b) >= |len(a)-len(b)|, so a pair can only
       match inside a length band of width T. Each doc is shuffled to
       coarse bucket floor(len/T) as a FULL member and to bucket-1 as a
       PROBE; a pair is owned by min(bucket_a, bucket_b), so full×full
       + full×probe enumerates every band pair exactly once. Shuffled
       rows are (bucket, doc_id, text) — one row + one probe copy per
       doc, never a cross product.
    2. q-gram count filter (Gravano et al., "Approximate string joins
       in a database (almost) for free", VLDB 2001): ed(a,b) <= T
       implies the q-gram BAGS share >= max(len)-q+1-T*q grams; the
       per-doc sorted (gram-id, count) arrays are built once per bucket
       and each candidate's bag intersection is a vectorized
       searchsorted — this kills ~all random pairs before any DP.
    3. Myers bit-parallel verify (functions/editdist.py) on survivors.

    At 100 TB the same shape holds: stage-1 buckets are a hash shuffle
    keyed on len//T (bounded skew — document lengths are capped by the
    pipeline's own max-doc-size), and within a band the count filter is
    the standard prefix-filter family's workhorse; an inverted index on
    rare q-grams (docs_inverted_index has the machinery) is the
    documented next step if a single length band ever outgrows a task.
    """
    from ..functions.editdist import myers_distance
    from ..stages.aggregates import normalize_for_join

    q = 3
    path = f"{sf_dir}/documents.parquet"
    ds = _rpq(ray, path, columns=["doc_id", "text"])

    def to_buckets(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
        texts = batch.column("text").to_pylist()
        lens = np.array([len(t) for t in texts], np.int64)
        lb = lens // threshold
        out_b, out_id, out_txt, out_probe = [], [], [], []
        for i, t in enumerate(texts):
            out_b.append(int(lb[i])); out_id.append(int(ids[i]))
            out_txt.append(t); out_probe.append(False)
            if lb[i] > 0:
                out_b.append(int(lb[i]) - 1); out_id.append(int(ids[i]))
                out_txt.append(t); out_probe.append(True)
        return pa.table({
            "bucket": pa.array(out_b, pa.int64()),
            "doc_id": pa.array(out_id, pa.int64()),
            "text": pa.array(out_txt, pa.string()),
            "probe": pa.array(out_probe, pa.bool_())})

    # hashed q-gram count vectors: H buckets of FEATURE-HASHED gram
    # counts per doc. The bag intersection under hashing only GROWS
    # (min(ca1+ca2, cb1+cb2) >= min(ca1,cb1) + min(ca2,cb2)), so
    # "hashed min-sum < need" proves the true bag intersection is below
    # the Gravano bound — a LOSSLESS prune. min-sum vectorizes via
    # sum_g min(ca,cb) = (Sa + Sb - L1(Ca,Cb)) / 2, computed over
    # cache-sized candidate chunks (1000 x H float32 temporaries; a
    # whole-band broadcast would allocate GBs and thrash).
    H = 2048
    from zlib import crc32

    _gram_cache: dict[str, int] = {}

    def hash_gram(s: str) -> int:
        v = _gram_cache.get(s)
        if v is None:
            v = crc32(s.encode()) % H
            if len(_gram_cache) < 1_000_000:   # Zipf head only
                _gram_cache[s] = v
        return v

    def band_pairs(g: pd.DataFrame) -> pd.DataFrame:
        texts = g["text"].tolist()
        ids = g["doc_id"].to_numpy()
        probe = g["probe"].to_numpy()
        n = len(texts)
        lens = np.array([len(t) for t in texts], np.int64)
        # int32, not int16: a bucket's count is bounded by the document
        # LENGTH, so one repeated gram in a >32k-char doc would wrap
        # int16 and silently break the lossless count-filter guarantee
        cmat = np.zeros((n, H), np.int32)
        one = np.int32(1)
        for i, t in enumerate(texts):
            if len(t) >= q:
                gi = np.fromiter(
                    (hash_gram(t[j:j + q]) for j in range(len(t) - q + 1)),
                    np.int64, count=len(t) - q + 1)
                np.add.at(cmat[i], gi, one)
        full_idx = np.nonzero(~probe)[0]
        probe_idx = np.nonzero(probe)[0]
        # full×full upper triangle + full×probe — each band pair once
        if len(full_idx) >= 2:
            iu, iv = np.triu_indices(len(full_idx), k=1)
            cand_a = full_idx[iu]; cand_b = full_idx[iv]
        else:
            cand_a = cand_b = np.array([], np.int64)
        if len(probe_idx) and len(full_idx):
            pa_, pb_ = np.meshgrid(full_idx, probe_idx, indexing="ij")
            cand_a = np.concatenate([cand_a, pa_.ravel()])
            cand_b = np.concatenate([cand_b, pb_.ravel()])
        keep = np.abs(lens[cand_a] - lens[cand_b]) <= threshold
        # a probe copy can meet its own full copy across the meshgrid
        keep &= ids[cand_a] != ids[cand_b]
        cand_a, cand_b = cand_a[keep], cand_b[keep]
        # Gravano count bound via hashed min-sum, in cache-sized chunks
        # (int32 diffs are exact for any doc shorter than 2^31 chars;
        # 2x min-sum avoids the halving division)
        sums = (lens - q + 1).astype(np.int32)
        need = (np.maximum(lens[cand_a], lens[cand_b])
                - q + 1 - threshold * q)
        minsum2 = np.empty(len(cand_a), np.int32)
        for s0 in range(0, len(cand_a), 2000):
            a = cand_a[s0:s0 + 2000]
            b = cand_b[s0:s0 + 2000]
            d = cmat[a]
            d -= cmat[b]
            np.abs(d, out=d)
            minsum2[s0:s0 + 2000] = (sums[a] + sums[b]
                                     - d.sum(axis=1, dtype=np.int32))
        keep = (need <= 0) | (minsum2 >= 2 * need)
        cand_a, cand_b = cand_a[keep], cand_b[keep]
        out_a, out_b, out_d = [], [], []
        for ia, ib in zip(cand_a, cand_b):
            d = myers_distance(texts[ia], texts[ib])
            if d <= threshold:
                lo, hi = sorted((int(ids[ia]), int(ids[ib])))
                out_a.append(lo); out_b.append(hi); out_d.append(int(d))
        return pd.DataFrame({
            "doc_id_a": pd.Series(out_a, dtype="int64"),
            "doc_id_b": pd.Series(out_b, dtype="int64"),
            "dist": pd.Series(out_d, dtype="int64")})

    # a small corpus reads as ONE block, which would collapse the
    # groupby to a single map_groups task — spread the banded rows
    # first so every length band verifies in its own task
    n_docs = _nrows(path)
    out = (ds.map_batches(to_buckets, batch_format="pyarrow")
             .repartition(int(min(64, max(8, n_docs // 256))))
             .groupby("bucket")
             .map_groups(band_pairs, batch_format="pandas"))
    return normalize_for_join(
        out, pa.schema([("doc_id_a", pa.int64()),
                        ("doc_id_b", pa.int64()),
                        ("dist", pa.int64())])
    ).sort(["doc_id_a", "doc_id_b"])


# ---------------------------------------------------------------------------
def dedup_incremental(ray, sf_dir: str, state_dir: str | None = None,
                      ingest_survivors: bool = False):
    """(doc_id, n_chars): INCREMENTAL exact dedup — the corpus-update
    path a production pipeline runs daily: a batch of NEW arrivals is
    deduplicated against a PERSISTED fingerprint state (everything
    ingested before) AND against itself. With ``ingest_survivors`` the
    survivors' fingerprints are appended to the state so the NEXT batch
    dedups against them too (the real stream-advancing mode; a re-run
    of the same batch then returns zero rows). The registry query keeps
    the default read-only mode so repeated driver checks stay
    deterministic.

    The driver-checkable simulation splits the documents table
    deterministically: doc_id % 2 == 0 is the already-ingested corpus
    (the state is (re)built from it when absent or stale), doc_id % 2
    == 1 is the arriving batch. Output = arrivals that survive both
    checks, so the whole call is SQL-expressible and value-checked.

    Scale shape: the state is hash-bucketed parquet of FINGERPRINTS
    only (16 bytes/doc, never text); arrivals shed exact in-batch dups
    with the keep-first bucketed aggregate, then drop state-matches via
    one ``left_anti`` join against the state's fp column — the arrivals
    side is the small side of a daily update, the state side streams
    from disk. Same single-writer flock + signature protocol as
    events_windowed_incremental."""
    import fcntl
    import os
    import shutil

    from ..stages.aggregates import (
        hash_bucket_aggregate,
        join_partitions_for,
        normalize_for_join,
    )

    path = f"{sf_dir}/documents.parquet"
    if state_dir is None:
        state_dir = os.path.join(corpus_cache_dir(sf_dir), "dedup_state")
    os.makedirs(state_dir, exist_ok=True)
    lock_fd = os.open(os.path.join(state_dir, "_LOCK"),
                      os.O_CREAT | os.O_RDWR)
    fcntl.flock(lock_fd, fcntl.LOCK_EX)
    try:
        sig = os.path.abspath(path)
        sig_file = os.path.join(state_dir, "_SIG")
        fp_dir = os.path.join(state_dir, "fps")
        have = False
        if os.path.exists(sig_file):
            with open(sig_file) as f:
                have = f.read().strip() == sig and os.path.isdir(fp_dir)
        if not have:
            # (re)build the state from the already-ingested half:
            # fingerprints ONLY, written hash-partitioned
            shutil.rmtree(fp_dir, ignore_errors=True)
            base = _rpq(ray, path, columns=["doc_id", "text"])

            def fp_even(t: pa.Table) -> pa.Table:
                ids = t.column("doc_id").to_numpy(zero_copy_only=False)
                t = t.filter(pa.array(ids % 2 == 0))
                return pa.table({"fp": pa.array(
                    _exact_fps(t.column("text").to_pylist()),
                    pa.string())})

            tmp = fp_dir + ".tmp"
            shutil.rmtree(tmp, ignore_errors=True)
            hash_bucket_aggregate(
                base.map_batches(fp_even, batch_format="pyarrow"),
                ["fp"], lambda df: df.drop_duplicates(["fp"]),
                n_rows=_nrows(path)).write_parquet(tmp)
            os.replace(tmp, fp_dir)
            with open(sig_file, "w") as f:
                f.write(sig)

        arrivals = _rpq(ray, path, columns=["doc_id", "text", "n_chars"])

        def fp_odd(t: pa.Table) -> pa.Table:
            ids = t.column("doc_id").to_numpy(zero_copy_only=False)
            t = t.filter(pa.array(ids % 2 == 1))
            return pa.table({
                "doc_id": t.column("doc_id"),
                "n_chars": t.column("n_chars"),
                "fp": pa.array(_exact_fps(t.column("text").to_pylist()),
                               pa.string())})

        def keep_first(df: pd.DataFrame) -> pd.DataFrame:
            return (df.sort_values("doc_id", kind="mergesort")
                      .drop_duplicates("fp", keep="first"))

        new = hash_bucket_aggregate(
            arrivals.map_batches(fp_odd, batch_format="pyarrow"),
            ["fp"], keep_first, n_rows=_nrows(path))
        new = normalize_for_join(
            new, pa.schema([("doc_id", pa.int64()),
                            ("n_chars", pa.int64()),
                            ("fp", pa.string())]))
        state = normalize_for_join(
            ray.data.read_parquet(fp_dir, partitioning=None),
            pa.schema([("fp", pa.string())])).materialize()
        survivors = new.join(
            state, join_type="left_anti", on=("fp",),
            num_partitions=join_partitions_for(
                min(_nrows(path), state.count())))
        if ingest_survivors:
            # advance the stream: append the survivors' fingerprints so
            # the next batch dedups against them too (the state read
            # above globs fp_dir recursively, so appended files join the
            # state on the next call). Materialize once; both the fp
            # write (under the flock) and the returned result reuse it.
            survivors = survivors.materialize()
            survivors.map_batches(lambda t: t.select(["fp"]),
                                  batch_format="pyarrow") \
                     .write_parquet(os.path.join(fp_dir, "ingested"))
        return (survivors.map_batches(
                    lambda t: t.select(["doc_id", "n_chars"]),
                    batch_format="pyarrow")
                         .sort("doc_id"))
    finally:
        fcntl.flock(lock_fd, fcntl.LOCK_UN)
        os.close(lock_fd)


_D_TRIM = _SQL_TRIM_TEXT.replace("regexp_replace(text,",
                                 "regexp_replace(d.text,")
_E_TRIM = _SQL_TRIM_TEXT.replace("regexp_replace(text,",
                                 "regexp_replace(e.text,")

DEDUP_INCREMENTAL_SQL = f"""
SELECT doc_id, n_chars FROM (
  SELECT doc_id, n_chars,
         ROW_NUMBER() OVER (
             PARTITION BY md5(LOWER({_D_TRIM}))
             ORDER BY doc_id) AS rn
  FROM documents d WHERE doc_id % 2 = 1
  AND NOT EXISTS (
    SELECT 1 FROM documents e WHERE e.doc_id % 2 = 0
    AND md5(LOWER({_E_TRIM})) = md5(LOWER({_D_TRIM}))))
WHERE rn = 1 ORDER BY doc_id
"""


# ---------------------------------------------------------------------------
def dedup_keep_best(ray, sf_dir: str, threshold: float = 0.8):
    """(doc_id,): the CANONICAL SURVIVOR SET of near-duplicate dedup —
    within every verified-MinHash cluster keep the single best document
    (max n_chars, ties to min doc_id); documents outside any cluster
    survive untouched. The keep-rule step an LLM-corpus curation run
    applies after clustering (keep the longest member, drop the rest).

    Scale shape: clusters come from the existing distributed label
    propagation (pair ids only); the per-cluster argmax is the
    combiner-keeps-one-winner pattern (idempotent max-by merge); losers
    = members minus winners via ONE left_anti join, and the final
    survivor set is documents left_anti losers — the corpus text never
    shuffles anywhere."""
    from ..stages.aggregates import (
        hash_bucket_aggregate,
        join_partitions_for,
    )

    n_docs = _nrows(f"{sf_dir}/documents.parquet")
    docs = _rpq(ray, f"{sf_dir}/documents.parquet",
                columns=["doc_id", "n_chars"])

    members = dedup_clusters(ray, sf_dir, threshold=threshold)
    if isinstance(members, pa.Table):  # empty pair graph: keep all
        return (docs.map_batches(lambda t: t.select(["doc_id"]),
                                 batch_format="pyarrow").sort("doc_id"))
    members = members.materialize()
    n_mem = max(1, members.count())

    scored = members.join(docs, join_type="inner", on=("doc_id",),
                          num_partitions=join_partitions_for(n_mem))

    def argbest(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["cluster_id", "n_chars", "doc_id"],
                            ascending=[True, False, True],
                            kind="mergesort")
        return df.drop_duplicates("cluster_id", keep="first")

    winners = hash_bucket_aggregate(
        scored.map_batches(argbest, batch_format="pandas"),
        ["cluster_id"], argbest, n_rows=n_mem)
    winners = winners.map_batches(
        lambda t: t.select(["doc_id"]), batch_format="pyarrow")

    losers = members.join(winners, join_type="left_anti",
                          on=("doc_id",),
                          num_partitions=join_partitions_for(n_mem))
    kept = docs.join(losers, join_type="left_anti", on=("doc_id",),
                     num_partitions=join_partitions_for(n_docs))
    return kept.map_batches(lambda t: t.select(["doc_id"]),
                            batch_format="pyarrow").sort("doc_id")


# ---------------------------------------------------------------------------
def dedup_rate_by_source(ray, sf_dir: str, threshold: float = 0.8):
    """(source, n_docs, n_dup_members, dup_rate_bp): near-duplicate
    RATE per corpus source — the curation health metric that tells you
    WHICH feed is flooding the corpus with near-copies. n_dup_members
    counts docs belonging to any verified-MinHash cluster; dup_rate_bp
    is the integer basis-point rate (n_dup_members * 10000 // n_docs,
    exact in both engines). Scale shape: cluster membership is ids
    only; ONE join attaches each member's source; both rollups are
    combiner partials over O(sources) rows."""
    from ray.data.aggregate import Sum

    from ..stages.aggregates import join_partitions_for

    docs = _rpq(ray, f"{sf_dir}/documents.parquet",
                columns=["doc_id", "source"])

    def count_partial(t: pa.Table) -> pd.DataFrame:
        g = pd.DataFrame({"source": t.column("source").to_pylist()})
        g["n_docs"] = np.ones(len(g), dtype="int64")
        return g.groupby("source", as_index=False).sum()

    per_source = (docs.map_batches(count_partial, batch_format="pyarrow")
                      .groupby("source")
                      .aggregate(Sum("n_docs", alias_name="n_docs"))
                      .to_pandas())

    members = dedup_clusters(ray, sf_dir, threshold=threshold)
    if isinstance(members, pa.Table) or members.count() == 0:
        mem_counts = pd.DataFrame({"source": pd.Series([], dtype=str),
                                   "n_dup_members": pd.Series(
                                       [], dtype="int64")})
    else:
        members = members.materialize()
        n_mem = max(1, members.count())
        tagged = members.join(docs, join_type="inner", on=("doc_id",),
                              num_partitions=join_partitions_for(n_mem))

        def mem_partial(t: pa.Table) -> pd.DataFrame:
            g = pd.DataFrame({"source": t.column("source").to_pylist()})
            g["n_dup_members"] = np.ones(len(g), dtype="int64")
            return g.groupby("source", as_index=False).sum()

        mem_counts = (tagged.map_batches(mem_partial,
                                         batch_format="pyarrow")
                            .groupby("source")
                            .aggregate(Sum("n_dup_members",
                                           alias_name="n_dup_members"))
                            .to_pandas())

    out = per_source.merge(mem_counts, on="source", how="left")
    nd = out["n_dup_members"].fillna(0).astype("int64")
    return pd.DataFrame({
        "source": out["source"].astype(str),
        "n_docs": out["n_docs"].astype("int64"),
        "n_dup_members": nd,
        "dup_rate_bp": (nd * 10000 // out["n_docs"].astype("int64")
                        ).astype("int64"),
    }).sort_values("source").reset_index(drop=True)
