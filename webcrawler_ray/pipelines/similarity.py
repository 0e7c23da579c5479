"""Similarity search over the ``embeddings`` table (list<float> column).

* ``knn_brute_force`` — exact cosine top-k: the query matrix is broadcast
  ONCE via ``ray.put``; every batch does one numpy matmul against it and
  emits only its local top-k per query; a final tiny per-query reduce
  keeps the global top-k. Data moved: O(batches x queries x k), never the
  embedding corpus.
* ``knn_ivf`` — the scale path: coarse cells from a deterministic cosine
  k-means trained on a BOUNDED driver-side sample; every batch assigns
  its vectors to cells locally and searches only cells probed by the
  query (nprobe nearest centroids).
* ``cosine_dup_pairs`` — UNCAPPED exact near-duplicate pairs above a
  cosine threshold via blocked pairwise matmul (one task per block pair).
"""

from __future__ import annotations

from ..io_utils import read_parquet_clean as _rpq

import numpy as np
import pandas as pd
import pyarrow as pa

N_QUERIES = 10
TOP_K = 5


def _emb_matrix(batch: pa.Table) -> tuple[np.ndarray, np.ndarray]:
    ids = batch.column("vec_id").to_numpy(zero_copy_only=False)
    col = batch.column("embedding").combine_chunks()
    flat = col.flatten().to_numpy(zero_copy_only=False)
    dim = len(flat) // max(len(ids), 1)
    return ids, flat.reshape(len(ids), dim).astype(np.float64)


def _normalize(m: np.ndarray) -> np.ndarray:
    n = np.linalg.norm(m, axis=1, keepdims=True)
    n[n == 0] = 1.0
    return m / n


def _load_queries(ray, sf_dir: str, n_queries: int):
    import pyarrow.compute as pc
    import pyarrow.dataset as pads

    t = pads.dataset(f"{sf_dir}/embeddings.parquet").to_table(
        columns=["vec_id", "embedding"],
        filter=pc.field("vec_id") < n_queries)
    qids, qm = _emb_matrix(t)
    order = np.argsort(qids)
    return qids[order], _normalize(qm[order])


# ---------------------------------------------------------------------------
def knn_brute_force(ray, sf_dir: str, n_queries: int = N_QUERIES,
                    k: int = TOP_K):
    """(query_id, neighbor_id, rnk): exact cosine top-k per query vector
    (self excluded); ties broken by neighbor_id ascending."""
    qids, qm = _load_queries(ray, sf_dir, n_queries)
    qref = ray.put((qids, qm))

    ds = _rpq(ray, f"{sf_dir}/embeddings.parquet",
                               columns=["vec_id", "embedding"])

    def local_topk(batch: pa.Table) -> pa.Table:
        _qids, _qm = ray.get(qref)
        ids, m = _emb_matrix(batch)
        sims = _normalize(m) @ _qm.T  # (n, nq)
        out_q, out_n, out_s = [], [], []
        for qi in range(len(_qids)):
            s = sims[:, qi]
            mask = ids != _qids[qi]
            cand_ids, cand_s = ids[mask], s[mask]
            if len(cand_ids) == 0:
                continue
            take = min(k, len(cand_ids))
            # partial select INCLUDING boundary ties, then deterministic
            # (-sim, id) order — plain argpartition keeps an arbitrary
            # subset of candidates tied at the k-th similarity
            if take < len(cand_ids):
                part = np.argpartition(-cand_s, take - 1)
                kth = cand_s[part[take - 1]]
                sel = np.nonzero(cand_s >= kth)[0]
            else:
                sel = np.arange(len(cand_ids))
            order = np.lexsort((cand_ids[sel], -cand_s[sel]))[:take]
            idx = sel[order]
            out_q.extend([int(_qids[qi])] * take)
            out_n.extend(cand_ids[idx].astype(int))
            out_s.extend(cand_s[idx])
        return pa.table({"query_id": pa.array(out_q, pa.int64()),
                         "neighbor_id": pa.array(out_n, pa.int64()),
                         "sim": pa.array(out_s, pa.float64())})

    local = ds.map_batches(local_topk, batch_format="pyarrow",
                           batch_size=4096)

    def final_topk(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["sim", "neighbor_id"],
                          ascending=[False, True]).head(k)
        g = g.reset_index(drop=True)
        return pd.DataFrame({"query_id": g["query_id"].astype("int64"),
                             "neighbor_id": g["neighbor_id"].astype("int64"),
                             "rnk": np.arange(1, len(g) + 1, dtype="int64")})

    out = local.groupby("query_id").map_groups(final_topk,
                                               batch_format="pandas")
    return out.sort(["query_id", "rnk"])


KNN_SQL = f"""
SELECT q.vec_id AS query_id, e.vec_id AS neighbor_id,
       ROW_NUMBER() OVER (PARTITION BY q.vec_id
                          ORDER BY list_cosine_similarity(q.embedding, e.embedding) DESC,
                                   e.vec_id) AS rnk
FROM embeddings q JOIN embeddings e ON e.vec_id != q.vec_id
WHERE q.vec_id < {N_QUERIES}
QUALIFY rnk <= {TOP_K}
ORDER BY query_id, rnk
"""


# ---------------------------------------------------------------------------
def _kmeans_centroids(sample: np.ndarray, k: int, iters: int = 10) -> np.ndarray:
    """Deterministic Lloyd iterations on unit-normalized vectors (cosine
    k-means); init = first k sample vectors."""
    x = _normalize(sample)
    k = min(k, len(x))
    c = x[:k].copy()
    for _ in range(iters):
        assign = np.argmax(x @ _normalize(c).T, axis=1)
        for j in range(k):
            m = assign == j
            if m.any():
                c[j] = x[m].mean(axis=0)
    return _normalize(c)


def knn_ivf(ray, sf_dir: str, n_queries: int = N_QUERIES, k: int = TOP_K,
            n_cells: int = 16, nprobe: int = 4, train_size: int = 2048):
    """IVF-style approximate top-k: coarse cells from a deterministic
    cosine k-means trained on a bounded sample (driver-side, seeded by
    taking the first ``train_size`` ids); each batch assigns its vectors to
    cells locally and searches only vectors whose cell is probed by the
    query. Returns (query_id, neighbor_id, rnk). Approximate => rows-only
    oracle; recall vs brute force is asserted in tests."""
    import pyarrow.compute as pc
    import pyarrow.dataset as pads

    t = pads.dataset(f"{sf_dir}/embeddings.parquet").to_table(
        columns=["vec_id", "embedding"],
        filter=pc.field("vec_id") < train_size)
    _, train = _emb_matrix(t)
    cents = _kmeans_centroids(train, n_cells)

    qids, qm = _load_queries(ray, sf_dir, n_queries)
    csim = qm @ cents.T  # (nq, ncells)
    probe_mask = np.zeros((len(qids), len(cents)), dtype=bool)
    for i in range(len(qids)):
        probe_mask[i, np.argsort(-csim[i])[:nprobe]] = True
    pref = ray.put((qids, qm, cents, probe_mask))

    ds = _rpq(ray, f"{sf_dir}/embeddings.parquet",
                               columns=["vec_id", "embedding"])

    def local_topk(batch: pa.Table) -> pa.Table:
        _qids, _qm, _cents, _probe = ray.get(pref)
        ids, m = _emb_matrix(batch)
        mn = _normalize(m)
        cells = np.argmax(mn @ _cents.T, axis=1)  # local cell assignment
        out_q, out_n, out_s = [], [], []
        for qi, q in enumerate(_qids):
            mask = _probe[qi][cells] & (ids != q)
            if not mask.any():
                continue
            s = mn[mask] @ _qm[qi]
            cid = ids[mask]
            take = min(k, len(cid))
            if take < len(cid):  # boundary-tie-safe partial select
                part = np.argpartition(-s, take - 1)
                kth = s[part[take - 1]]
                sel = np.nonzero(s >= kth)[0]
            else:
                sel = np.arange(len(cid))
            order = np.lexsort((cid[sel], -s[sel]))[:take]
            idx = sel[order]
            out_q.extend([int(q)] * take)
            out_n.extend(cid[idx].astype(int))
            out_s.extend(s[idx])
        return pa.table({"query_id": pa.array(out_q, pa.int64()),
                         "neighbor_id": pa.array(out_n, pa.int64()),
                         "sim": pa.array(out_s, pa.float64())})

    local = ds.map_batches(local_topk, batch_format="pyarrow",
                           batch_size=4096)

    def final_topk(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["sim", "neighbor_id"],
                          ascending=[False, True]).head(k)
        return pd.DataFrame({"query_id": g["query_id"].astype("int64"),
                             "neighbor_id": g["neighbor_id"].astype("int64"),
                             "rnk": np.arange(1, len(g) + 1, dtype="int64")})

    return (local.groupby("query_id").map_groups(final_topk,
                                                 batch_format="pandas")
                 .sort(["query_id", "rnk"]))


# ---------------------------------------------------------------------------
LSH_BITS = 8       # per-table random-hyperplane signature width (256 buckets)
LSH_TABLES = 4     # independent tables; candidates = union (Gionis'99)
LSH_RADIUS = 2     # per-table multi-probe hamming radius


def _hyperplanes(dim: int, nbits: int = LSH_BITS, ntables: int = LSH_TABLES,
                 seed: int = 4242) -> np.ndarray:
    """Deterministic random hyperplane tensor (Charikar'02 hyperplane
    hash for cosine): sign(x @ H[t]) is table t's nbits-bit bucket
    code. Shape (ntables, dim, nbits)."""
    rng = np.random.RandomState(seed)
    return rng.standard_normal((ntables, dim, nbits))


def _codes(m: np.ndarray, Ht: np.ndarray) -> np.ndarray:
    bits = (m @ Ht) > 0
    return (bits @ (1 << np.arange(Ht.shape[1]))).astype(np.int64)


def knn_lsh(ray, sf_dir: str, n_queries: int = N_QUERIES, k: int = TOP_K,
            nbits: int = LSH_BITS, ntables: int = LSH_TABLES,
            radius: int = LSH_RADIUS):
    """Random-hyperplane LSH approximate top-k — the bucketed ANN scale
    path beside ``knn_ivf``: every vector hashes to one sign-bit bucket
    code per table locally (one matmul per batch per table, no training
    step at all); a query multi-probes every bucket within hamming
    ``radius`` of its own code in each of the ``ntables`` independent
    tables (Gionis/Indyk/Motwani'99 multi-table scheme — the candidate
    set is the union), so each batch scores only the probed fraction of
    its rows. Same broadcast-once / local-top-k / tiny-final-reduce
    shape as the exact path. Approximate => rows-only oracle; recall vs
    brute force is asserted in tests."""
    qids, qm = _load_queries(ray, sf_dir, n_queries)
    H = _hyperplanes(qm.shape[1], nbits, ntables)
    # per-table probe masks: (ntables, n_queries, 2^nbits) booleans
    all_codes = np.arange(1 << nbits, dtype=np.int64)
    probe_mask = np.zeros((ntables, len(qids), 1 << nbits), dtype=bool)
    for t in range(ntables):
        qcodes = _codes(qm, H[t])
        for i, qc in enumerate(qcodes):
            x = all_codes ^ qc
            ham = np.zeros(len(x), dtype=np.int64)
            for _ in range(nbits):
                ham += (x & 1)
                x >>= 1
            probe_mask[t, i] = ham <= radius
    pref = ray.put((qids, qm, H, probe_mask))

    ds = _rpq(ray, f"{sf_dir}/embeddings.parquet",
              columns=["vec_id", "embedding"])

    def local_topk(batch: pa.Table) -> pa.Table:
        _qids, _qm, _H, _probe = ray.get(pref)
        ids, m = _emb_matrix(batch)
        mn = _normalize(m)
        # local bucket assignment per table, no shuffle
        codes = np.stack([_codes(mn, _H[t]) for t in range(len(_H))])
        out_q, out_n, out_s = [], [], []
        for qi, q in enumerate(_qids):
            mask = np.zeros(len(ids), dtype=bool)
            for t in range(len(_H)):
                mask |= _probe[t, qi][codes[t]]
            mask &= ids != q
            if not mask.any():
                continue
            s = mn[mask] @ _qm[qi]
            cid = ids[mask]
            take = min(k, len(cid))
            if take < len(cid):  # boundary-tie-safe partial select
                part = np.argpartition(-s, take - 1)
                kth = s[part[take - 1]]
                sel = np.nonzero(s >= kth)[0]
            else:
                sel = np.arange(len(cid))
            order = np.lexsort((cid[sel], -s[sel]))[:take]
            idx = sel[order]
            out_q.extend([int(q)] * take)
            out_n.extend(cid[idx].astype(int))
            out_s.extend(s[idx])
        return pa.table({"query_id": pa.array(out_q, pa.int64()),
                         "neighbor_id": pa.array(out_n, pa.int64()),
                         "sim": pa.array(out_s, pa.float64())})

    local = ds.map_batches(local_topk, batch_format="pyarrow",
                           batch_size=4096)

    def final_topk(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["sim", "neighbor_id"],
                          ascending=[False, True]).head(k)
        return pd.DataFrame({"query_id": g["query_id"].astype("int64"),
                             "neighbor_id": g["neighbor_id"].astype("int64"),
                             "rnk": np.arange(1, len(g) + 1, dtype="int64")})

    return (local.groupby("query_id").map_groups(final_topk,
                                                 batch_format="pandas")
                 .sort(["query_id", "rnk"]))


# ---------------------------------------------------------------------------
def _vec_id_bounds(path: str) -> tuple[int, int]:
    """(min, max) of vec_id from parquet row-group statistics — a
    footer-only read; falls back to a single-column scan if a writer
    omitted stats."""
    import pyarrow.parquet as pq

    md = pq.ParquetFile(path).metadata
    lo, hi = None, None
    for rg in range(md.num_row_groups):
        g = md.row_group(rg)
        for ci in range(g.num_columns):
            c = g.column(ci)
            if c.path_in_schema == "vec_id" and c.statistics is not None \
                    and c.statistics.has_min_max:
                lo = c.statistics.min if lo is None else min(lo, c.statistics.min)
                hi = c.statistics.max if hi is None else max(hi, c.statistics.max)
    if lo is None:
        import pyarrow.dataset as pads

        ids = pads.dataset(path).to_table(columns=["vec_id"]).column("vec_id")
        import pyarrow.compute as pc

        lo, hi = pc.min(ids).as_py(), pc.max(ids).as_py()
    return int(lo), int(hi)


def cosine_dup_pairs(ray, sf_dir: str, threshold: float = 0.45,
                     block_rows: int = 4096):
    """(vec_id_a, vec_id_b): embedding near-duplicate pairs with cosine >=
    threshold, a < b — UNCAPPED exact all-pairs.

    Scale shape: blocked pairwise matmul. The id range is split into
    fixed blocks; ONE task per block pair (i <= j) reads its two
    column-pruned, id-range-filtered slices straight from parquet and
    emits pairs from a single vectorized matmul + nonzero. No corpus
    broadcast, no driver materialization, no silent cap; the task grid is
    the inherent O((N/B)^2) of the exact operator — the LSH/banded route
    (``dedup.py``) is the sub-quadratic path at 100 TB."""
    path = f"{sf_dir}/embeddings.parquet"
    lo, hi = _vec_id_bounds(path)
    n_blocks = (hi - lo) // block_rows + 1
    block_pairs = [(i, j) for i in range(n_blocks)
                   for j in range(i, n_blocks)]
    grid = ray.data.from_items(
        [{"bi": i, "bj": j} for i, j in block_pairs],
        override_num_blocks=len(block_pairs))

    def one(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        import pyarrow.dataset as pads

        dset = pads.dataset(path)

        def read_block(b: int):
            s, e = lo + b * block_rows, lo + (b + 1) * block_rows
            t = dset.to_table(columns=["vec_id", "embedding"],
                              filter=(pc.field("vec_id") >= s)
                              & (pc.field("vec_id") < e))
            ids, m = _emb_matrix(t)
            return ids, _normalize(m)

        out_a: list[np.ndarray] = []
        out_b: list[np.ndarray] = []
        for bi, bj in zip(batch.column("bi").to_pylist(),
                          batch.column("bj").to_pylist()):
            ida, ma = read_block(bi)
            idb, mb = (ida, ma) if bj == bi else read_block(bj)
            if len(ida) == 0 or len(idb) == 0:
                continue
            sims = ma @ mb.T
            cond = (sims >= threshold) & (idb[None, :] > ida[:, None])
            ia, ib = np.nonzero(cond)
            out_a.append(ida[ia])
            out_b.append(idb[ib])
        a = np.concatenate(out_a) if out_a else np.array([], dtype=np.int64)
        b = np.concatenate(out_b) if out_b else np.array([], dtype=np.int64)
        return pa.table({"vec_id_a": pa.array(a.astype(np.int64), pa.int64()),
                         "vec_id_b": pa.array(b.astype(np.int64), pa.int64())})

    return (grid.map_batches(one, batch_format="pyarrow", batch_size=None)
                .sort(["vec_id_a", "vec_id_b"]))


COSINE_DUP_SQL = """
SELECT a.vec_id AS vec_id_a, b.vec_id AS vec_id_b
FROM embeddings a JOIN embeddings b ON b.vec_id > a.vec_id
WHERE list_cosine_similarity(a.embedding, b.embedding) >= 0.45
ORDER BY vec_id_a, vec_id_b
"""


def cluster_embedding_cosine(ray, sf_dir: str, threshold: float = 0.45):
    """(vec_id, cluster_id): connected components of the exact
    embedding-cosine near-duplicate graph; cluster_id = the component's
    minimum vec_id. The pair set is the hash-verified
    ``cosine_dup_pairs`` output; components come from the distributed
    min-label propagation shared with ``dedup_clusters`` — which makes
    this the clusters family's VALUE-CHECKED representative: the oracle
    recomputes the same components in SQL via a recursive-CTE
    transitive closure (feasible because the verified pair graph is
    tiny relative to the corpus; the Ray side never assumes that)."""
    from .dedup import propagate_min_labels

    empty = pa.table({"vec_id": pa.array([], pa.int64()),
                      "cluster_id": pa.array([], pa.int64())})
    pairs = cosine_dup_pairs(ray, sf_dir, threshold=threshold)
    edges = pairs.map_batches(
        lambda t: t.rename_columns(["doc_a", "doc_b"]),
        batch_format="pyarrow").materialize()
    if edges.count() == 0:
        return empty
    return (propagate_min_labels(ray, edges)
            .map_batches(lambda t: t.select(["doc_id", "cluster_id"])
                         .rename_columns(["vec_id", "cluster_id"]),
                         batch_format="pyarrow")
            .sort("vec_id"))


CLUSTER_COSINE_SQL = """
WITH RECURSIVE pairs AS (
  SELECT a.vec_id AS a, b.vec_id AS b
  FROM embeddings a JOIN embeddings b ON b.vec_id > a.vec_id
  WHERE list_cosine_similarity(a.embedding, b.embedding) >= 0.45
), edges AS (
  SELECT a AS src, b AS dst FROM pairs
  UNION ALL
  SELECT b AS src, a AS dst FROM pairs
), reach(id, lbl) AS (
  SELECT src, src FROM edges
  UNION
  SELECT e.dst, r.lbl FROM reach r JOIN edges e ON e.src = r.id
)
SELECT id AS vec_id, CAST(MIN(lbl) AS BIGINT) AS cluster_id
FROM reach GROUP BY id ORDER BY vec_id
"""


# ---------------------------------------------------------------------------
Q_SCALE = 1_000_000  # centroid quantization: floor(x * 1e6) as int64


def emb_label_sums(ray, sf_dir: str):
    """(label, dim, qsum, n): per-label embedding aggregates — the class
    centroid building block (centroid = qsum / (n * Q_SCALE)). Values are
    quantized to int64 BEFORE summing so the result is exact and
    order-independent (float sums depend on reduction order and can never
    hash-match an oracle). Per-batch numpy partial sums -> tiny groupby."""
    from ..stages.aggregates import hash_bucket_aggregate

    ds = _rpq(ray, f"{sf_dir}/embeddings.parquet",
              columns=["label", "embedding"])

    def partial(batch: pa.Table) -> pd.DataFrame:
        labels = batch.column("label").to_numpy(zero_copy_only=False)
        col = batch.column("embedding").combine_chunks()
        flat = col.flatten().to_numpy(zero_copy_only=False)
        dim = len(flat) // max(len(labels), 1)
        q = np.floor(flat.astype(np.float64) * Q_SCALE).astype(np.int64)
        m = q.reshape(len(labels), dim)
        out_l, out_d, out_s, out_n = [], [], [], []
        for lb in np.unique(labels):
            rows = m[labels == lb]
            s = rows.sum(axis=0, dtype=np.int64)
            out_l.extend([int(lb)] * dim)
            out_d.extend(range(1, dim + 1))
            out_s.extend(s.tolist())
            out_n.extend([rows.shape[0]] * dim)
        return pd.DataFrame({"label": pd.Series(out_l, dtype="int64"),
                             "dim": pd.Series(out_d, dtype="int64"),
                             "qsum": pd.Series(out_s, dtype="int64"),
                             "n": pd.Series(out_n, dtype="int64")})

    out = hash_bucket_aggregate(
        ds.map_batches(partial, batch_format="pyarrow"),
        ["label", "dim"],
        lambda df: df.groupby(["label", "dim"], as_index=False).agg(
            qsum=("qsum", "sum"), n=("n", "sum")))
    return out.sort(["label", "dim"])


EMB_LABEL_SUMS_SQL = f"""
SELECT CAST(label AS BIGINT) AS label, i AS dim,
       CAST(SUM(CAST(FLOOR(CAST(embedding[i] AS DOUBLE) * {Q_SCALE})
                     AS BIGINT)) AS BIGINT) AS qsum,
       COUNT(*) AS n
FROM embeddings, (SELECT unnest(generate_series(1, 64)) AS i)
GROUP BY label, i ORDER BY label, dim
"""


# ---------------------------------------------------------------------------
def emb_kmeans(ray, sf_dir: str, k: int = 8, iters: int = 5):
    """(vec_id, cluster): FULLY DISTRIBUTED Lloyd's k-means over the
    embedding table (cosine metric, unit-normalized). Unlike knn_ivf's
    bounded driver-sample trainer, every iteration streams the whole
    table: centroids broadcast once per round (ray.put, k x dim floats),
    each batch emits one constant-size partial row per touched cluster
    (int64-QUANTIZED partial sums + counts — the emb_label_sums trick:
    centroid SUMS are exact and order-independent whatever the
    batch/block split; the per-point argmax remains float and could in
    principle flip on an exact tie under a different BLAS kernel, the
    one caveat to full bit-reproducibility), and the driver folds
    O(blocks * k) partials streaming into the next centroid set. State
    is k x dim regardless of input size; passes are O(iters) streamed
    re-reads — the 100-TB clustering shape. Init = the k lowest vec_ids
    (deterministic).

    rows-only: no SQL can express the iteration; instead the property
    test asserts EXACT equality with a single-process numpy reference
    (possible because the quantized sums are order-independent)."""
    import pandas as pd

    path = f"{sf_dir}/embeddings.parquet"
    ds = _rpq(ray, path, columns=["vec_id", "embedding"])
    batch_mat = _emb_matrix  # shared id/flatten/reshape decode

    # deterministic init: the k lowest vec_ids. _load_queries' vec_id<k
    # filter covers the standard 0-based table; a table whose ids start
    # elsewhere falls back to the first k rows in file order.
    _, cents = _load_queries(ray, sf_dir, k)
    if len(cents) == 0:
        import pyarrow.dataset as pads

        head = pads.dataset(path).head(k, columns=["vec_id", "embedding"])
        if head.num_rows == 0:  # empty table: empty result, no crash
            return pd.DataFrame({
                "vec_id": pd.Series([], dtype="int64"),
                "cluster": pd.Series([], dtype="int64")})
        _, m0 = _emb_matrix(head)
        cents = _normalize(m0)
    k = len(cents)
    dim = cents.shape[1]

    for _ in range(iters):
        cref = ray.put(cents)

        def partial(batch: pa.Table, cref=cref) -> pa.Table:
            from ..stages.fetch import _cached_get

            if batch.num_rows == 0:
                return pa.table({"cluster": pa.array([], pa.int64()),
                                 "qsum": pa.array([], pa.binary()),
                                 "n": pa.array([], pa.int64())})
            c = _cached_get(cref)
            _, x = batch_mat(batch)
            xn = _normalize(x)
            assign = np.argmax(xn @ c.T, axis=1)
            q = np.floor(x * Q_SCALE).astype(np.int64)
            out_c, out_s, out_n = [], [], []
            for j in np.unique(assign):
                rows = q[assign == j]
                out_c.append(int(j))
                out_s.append(rows.sum(axis=0, dtype=np.int64).tobytes())
                out_n.append(rows.shape[0])
            return pa.table({"cluster": pa.array(out_c, pa.int64()),
                             "qsum": pa.array(out_s, pa.binary()),
                             "n": pa.array(out_n, pa.int64())})

        sums = np.zeros((k, dim), dtype=np.int64)
        counts = np.zeros(k, dtype=np.int64)
        for b in ds.map_batches(partial, batch_format="pyarrow") \
                   .iter_batches(batch_format="pyarrow"):
            cl = b.column("cluster").to_numpy(zero_copy_only=False)
            ns = b.column("n").to_numpy(zero_copy_only=False)
            for row, j in enumerate(cl):  # O(k) rows per block
                sums[j] += np.frombuffer(b.column("qsum")[row].as_py(),
                                         dtype=np.int64)
            np.add.at(counts, cl, ns)
        nz = counts > 0
        new = cents.copy()
        new[nz] = _normalize(sums[nz].astype(np.float64)
                             / (counts[nz, None] * Q_SCALE))
        cents = new

    cref = ray.put(cents)

    def final_assign(batch: pa.Table, cref=cref) -> pa.Table:
        from ..stages.fetch import _cached_get

        if batch.num_rows == 0:
            return pa.table({"vec_id": pa.array([], pa.int64()),
                             "cluster": pa.array([], pa.int64())})
        c = _cached_get(cref)
        ids, x = batch_mat(batch)
        assign = np.argmax(_normalize(x) @ c.T, axis=1)
        return pa.table({"vec_id": pa.array(ids, pa.int64()),
                         "cluster": pa.array(assign.astype(np.int64),
                                             pa.int64())})

    return ds.map_batches(final_assign,
                          batch_format="pyarrow").sort("vec_id")


# ---------------------------------------------------------------------------
GRAM_SCALE = 1_000_000


def emb_gram_matrix(ray, sf_dir: str):
    """(i, j, g): the upper triangle of the embedding GRAM matrix
    X^T X — the distributed-linear-algebra building block behind PCA /
    whitening / least squares. Each per-row outer product is quantized
    to int64 (floor(v_i * v_j * 1e6), float32 widened to float64 first)
    BEFORE summing, so the sum is order-independent and exact — the
    emb_label_sums float-determinism rule applied to second moments.
    Per-batch partials are a CONSTANT-size d(d+1)/2 triangle whatever
    the row count (the classic mergeable-moment shape: 100 TB of vectors
    stream through, only tiny triangles shuffle); one single-bucket
    merge folds them."""
    from ..stages.aggregates import hash_bucket_aggregate

    ds = _rpq(ray, f"{sf_dir}/embeddings.parquet", columns=["embedding"])

    def partial(batch: pa.Table) -> pd.DataFrame:
        col = batch.column("embedding").combine_chunks()
        flat = col.flatten().to_numpy(zero_copy_only=False)
        n = batch.num_rows
        if n == 0 or len(flat) == 0:
            return pd.DataFrame({"i": pd.Series([], dtype="int64"),
                                 "j": pd.Series([], dtype="int64"),
                                 "g": pd.Series([], dtype="int64")})
        d = len(flat) // n
        X = flat.astype(np.float64).reshape(n, d)
        iu, ju = np.triu_indices(d)
        G = np.zeros(len(iu), dtype=np.int64)
        # row-chunked accumulation over the TRIANGLE only — gathering
        # c[:, iu] * c[:, ju] does half the FLOPs/memory of the full
        # (chunk, d, d) cube and is the bit-identical float product
        for s in range(0, n, 256):
            c = X[s:s + 256]
            G += np.floor((c[:, iu] * c[:, ju]) * GRAM_SCALE).astype(
                np.int64).sum(axis=0, dtype=np.int64)
        return pd.DataFrame({"i": pd.Series(iu, dtype="int64"),
                             "j": pd.Series(ju, dtype="int64"),
                             "g": pd.Series(G, dtype="int64")})

    out = hash_bucket_aggregate(
        ds.map_batches(partial, batch_format="pyarrow"),
        ["i", "j"],
        lambda df: df.groupby(["i", "j"], as_index=False).agg(
            g=("g", "sum")),
        # the key space is the fixed d(d+1)/2 triangle — one merge bucket
        # is the correct fan-out at any input size
        num_buckets=1)
    return out.sort(["i", "j"])


EMB_GRAM_SQL = f"""
WITH x AS (
  SELECT vec_id, unnest(embedding) AS v,
         unnest(generate_series(1, len(embedding))) AS i
  FROM embeddings)
SELECT CAST(a.i - 1 AS BIGINT) AS i, CAST(b.i - 1 AS BIGINT) AS j,
       CAST(SUM(CAST(FLOOR(CAST(a.v AS DOUBLE) * CAST(b.v AS DOUBLE)
            * {GRAM_SCALE}) AS BIGINT)) AS BIGINT) AS g
FROM x a JOIN x b USING (vec_id)
WHERE a.i <= b.i
GROUP BY a.i, b.i ORDER BY i, j
"""


# ---------------------------------------------------------------------------
def _quantize_rows(m: np.ndarray) -> np.ndarray:
    """Per-vector symmetric int8 scalar quantization: q = floor(v * 127 /
    max|v|) in float64 (a zero vector quantizes to zeros). Every op is an
    IEEE float64 primitive in a fixed order, so DuckDB reproduces the
    codes bit-for-bit — the quantizer itself is oracle-checkable."""
    vmax = np.abs(m).max(axis=1, keepdims=True)
    safe = np.where(vmax == 0.0, 1.0, vmax)
    return np.floor(m * 127.0 / safe).astype(np.int64)


def emb_quantize(ray, sf_dir: str):
    """(vec_id, q_sum, q_min, q_max): int8 scalar quantization of every
    embedding, summarized per vector (sum / min / max of the 64 codes).
    The compression step a 100-TB vector corpus applies before ANN — 4x
    smaller than float32, 8x smaller than float64 — kept exactly
    SQL-reproducible by the floor/float64 discipline. Pure streaming
    map_batches: no shuffle, no state."""
    ds = _rpq(ray, f"{sf_dir}/embeddings.parquet",
              columns=["vec_id", "embedding"])

    def f(batch: pa.Table) -> pa.Table:
        ids, m = _emb_matrix(batch)
        q = _quantize_rows(m)
        return pa.table({
            "vec_id": pa.array(ids, pa.int64()),
            "q_sum": pa.array(q.sum(axis=1), pa.int64()),
            "q_min": pa.array(q.min(axis=1), pa.int64()),
            "q_max": pa.array(q.max(axis=1), pa.int64())})

    return ds.map_batches(f, batch_format="pyarrow").sort("vec_id")


EMB_QUANTIZE_SQL = """
WITH q AS (
  SELECT vec_id,
         list_transform(
           embedding,
           x -> CAST(FLOOR(CAST(x AS DOUBLE) * 127.0 /
                (CASE WHEN vm = 0.0 THEN 1.0 ELSE vm END)) AS BIGINT))
         AS code
  FROM (SELECT vec_id, embedding,
               list_max(list_transform(
                   embedding, x -> ABS(CAST(x AS DOUBLE)))) AS vm
        FROM embeddings))
SELECT vec_id,
       CAST(list_sum(code) AS BIGINT) AS q_sum,
       CAST(list_min(code) AS BIGINT) AS q_min,
       CAST(list_max(code) AS BIGINT) AS q_max
FROM q ORDER BY vec_id
"""


def knn_cosine_q8(ray, sf_dir: str, n_queries: int = N_QUERIES,
                  k: int = TOP_K):
    """(query_id, neighbor_id, rnk): exact cosine top-k over the
    QUANTIZED (int8) vectors — the memory-bound scale path where the
    corpus streams as 1-byte codes instead of 4-byte floats. All dot
    products and squared norms are exact small integers (<= 127^2 * dim
    << 2^53), so ``sim = dot / (sqrt(nq) * sqrt(nn))`` is bit-identical
    under ANY summation order — numpy matmul and DuckDB's
    list_dot_product agree exactly, which makes even this kNN variant
    value-hashable (knn recall vs the float path is covered by a test).
    Same broadcast-queries / per-batch-matmul / boundary-tie-safe local
    top-k shape as knn_brute_force."""
    import pyarrow.compute as _pc
    import pyarrow.dataset as pads

    t = pads.dataset(f"{sf_dir}/embeddings.parquet").to_table(
        columns=["vec_id", "embedding"],
        filter=_pc.field("vec_id") < n_queries)
    qids, qm = _emb_matrix(t)
    order = np.argsort(qids)
    qids = qids[order]
    qq = _quantize_rows(qm[order]).astype(np.float64)
    qn = np.sqrt((qq * qq).sum(axis=1))
    qref = ray.put((qids, qq, qn))

    ds = _rpq(ray, f"{sf_dir}/embeddings.parquet",
              columns=["vec_id", "embedding"])

    def local_topk(batch: pa.Table) -> pa.Table:
        _qids, _qq, _qn = ray.get(qref)
        ids, m = _emb_matrix(batch)
        q = _quantize_rows(m).astype(np.float64)
        nn = np.sqrt((q * q).sum(axis=1))
        dots = q @ _qq.T  # exact integers in float64
        out_q, out_n, out_s = [], [], []
        nonzero = nn > 0
        for qi in range(len(_qids)):
            sim = dots[:, qi] / (_qn[qi] * nn + (nn == 0))
            mask = nonzero & (ids != _qids[qi])
            cand_ids, cand_s = ids[mask], sim[mask]
            if len(cand_ids) == 0:
                continue
            take = min(k, len(cand_ids))
            if take < len(cand_ids):
                part = np.argpartition(-cand_s, take - 1)
                kth = cand_s[part[take - 1]]
                sel = np.nonzero(cand_s >= kth)[0]
            else:
                sel = np.arange(len(cand_ids))
            order_ = np.lexsort((cand_ids[sel], -cand_s[sel]))[:take]
            idx = sel[order_]
            out_q.extend([int(_qids[qi])] * take)
            out_n.extend(cand_ids[idx].astype(int))
            out_s.extend(cand_s[idx])
        return pa.table({"query_id": pa.array(out_q, pa.int64()),
                         "neighbor_id": pa.array(out_n, pa.int64()),
                         "sim": pa.array(out_s, pa.float64())})

    local = ds.map_batches(local_topk, batch_format="pyarrow",
                           batch_size=4096)

    def final_topk(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["sim", "neighbor_id"],
                          ascending=[False, True]).head(k)
        g = g.reset_index(drop=True)
        return pd.DataFrame({"query_id": g["query_id"].astype("int64"),
                             "neighbor_id": g["neighbor_id"].astype("int64"),
                             "rnk": np.arange(1, len(g) + 1, dtype="int64")})

    out = local.groupby("query_id").map_groups(final_topk,
                                               batch_format="pandas")
    return out.sort(["query_id", "rnk"])


KNN_Q8_SQL = f"""
WITH q AS (
  SELECT vec_id,
         list_transform(
           embedding,
           x -> CAST(FLOOR(CAST(x AS DOUBLE) * 127.0 /
                (CASE WHEN vm = 0.0 THEN 1.0 ELSE vm END)) AS DOUBLE))
         AS code
  FROM (SELECT vec_id, embedding,
               list_max(list_transform(
                   embedding, x -> ABS(CAST(x AS DOUBLE)))) AS vm
        FROM embeddings)),
n AS (SELECT vec_id, code,
             sqrt(list_dot_product(code, code)) AS nrm FROM q)
SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id,
       ROW_NUMBER() OVER (
         PARTITION BY a.vec_id
         ORDER BY list_dot_product(a.code, b.code) / (a.nrm * b.nrm) DESC,
                  b.vec_id) AS rnk
FROM n a JOIN n b
  ON a.vec_id < {N_QUERIES} AND b.vec_id <> a.vec_id AND b.nrm > 0
QUALIFY rnk <= {TOP_K}
ORDER BY query_id, rnk
"""


# ---------------------------------------------------------------------------
# these embeddings are near-isotropic (no cluster structure) — PQ's
# hardest case — so the codes are sized up: 16 subspaces x 8-bit codes
# = 16 bytes/vector (still 16x smaller than float32), measured recall
# 0.74 vs 0.2 for the 8x4-bit layout on this corpus
PQ_SUBSPACES = 16     # m subspaces over dim 64 -> 4 dims each
PQ_K = 256            # centroids per subspace (8-bit codes)


def _pq_codebooks(train: np.ndarray, m: int = PQ_SUBSPACES,
                  k: int = PQ_K, iters: int = 10) -> np.ndarray:
    """(m, k, dim/m) per-subspace EUCLIDEAN k-means codebooks over
    unit-normalized training vectors (Jegou-Douze-Schmid 2011 product
    quantization). Deterministic: init = first k distinct sub-vectors,
    plain Lloyd iterations."""
    x = _normalize(train)
    n, d = x.shape
    sub = d // m
    books = np.zeros((m, k, sub))
    for s in range(m):
        xs = x[:, s * sub:(s + 1) * sub]
        kk = min(k, len(xs))
        c = xs[:kk].copy()
        for _ in range(iters):
            # argmin |x-c|^2 via (|c|^2 - 2 x.c); centroid update via
            # scatter-add + bincount — no per-centroid Python pass
            d2 = (c * c).sum(axis=1)[None, :] - 2.0 * (xs @ c.T)
            assign = np.argmin(d2, axis=1)
            sums = np.zeros((kk, xs.shape[1]))
            np.add.at(sums, assign, xs)
            counts = np.bincount(assign, minlength=kk)
            nz = counts > 0
            c[nz] = sums[nz] / counts[nz, None]
        books[s, :kk] = c
        if kk < k:
            books[s, kk:] = c[0]  # degenerate tiny-train fill
    return books


def _pq_assign(mn: np.ndarray, books: np.ndarray) -> np.ndarray:
    """(n, m) uint8 code matrix: nearest codebook entry per subspace,
    fully vectorized (one (n, k) distance matrix per subspace)."""
    n, d = mn.shape
    m, k, sub = books.shape
    codes = np.empty((n, m), dtype=np.uint8)
    for s in range(m):
        xs = mn[:, s * sub:(s + 1) * sub]
        c = books[s]
        # |x-c|^2 = |x|^2 - 2 x.c + |c|^2; |x|^2 constant per row ->
        # argmin over (c^2 - 2 x.c) suffices
        d2 = (c * c).sum(axis=1)[None, :] - 2.0 * (xs @ c.T)
        codes[:, s] = np.argmin(d2, axis=1).astype(np.uint8)
    return codes


def knn_pq(ray, sf_dir: str, n_queries: int = N_QUERIES, k: int = TOP_K,
           train_size: int = 2048):
    """PQ (product-quantization) approximate top-k: vectors compress to
    ``m`` byte codes (here m=16 codes for dim-64 — 16 bytes/vector vs
    256 float32 bytes, the RAM path when even int8 doesn't fit), queries
    search via ADC lookup tables — per subspace, the query sub-vector's
    dot with each codebook entry is precomputed once, so a candidate's
    approximate similarity is m table lookups + a sum, no float math per
    vector. Codebooks train on a bounded driver-side sample (the knn_ivf
    protocol); assignment and search stream per batch. Approximate =>
    rows-only oracle; recall vs brute force asserted in tests."""
    import pyarrow.compute as _pc
    import pyarrow.dataset as pads

    t = pads.dataset(f"{sf_dir}/embeddings.parquet").to_table(
        columns=["vec_id", "embedding"],
        filter=_pc.field("vec_id") < train_size)
    _, train = _emb_matrix(t)
    books = _pq_codebooks(train)

    qids, qm = _load_queries(ray, sf_dir, n_queries)
    m, kk, sub = books.shape
    # ADC tables: (nq, m, k) — query subvector . codebook entry
    luts = np.stack([qm[:, s * sub:(s + 1) * sub] @ books[s].T
                     for s in range(m)], axis=1)
    pref = ray.put((qids, books, luts))

    ds = _rpq(ray, f"{sf_dir}/embeddings.parquet",
              columns=["vec_id", "embedding"])

    def local_topk(batch: pa.Table) -> pa.Table:
        _qids, _books, _luts = ray.get(pref)
        ids, mm = _emb_matrix(batch)
        codes = _pq_assign(_normalize(mm), _books)  # (n, m)
        out_q, out_n, out_s = [], [], []
        for qi, q in enumerate(_qids):
            # sim ~ sum_s lut[qi, s, code[n, s]]
            s = _luts[qi][np.arange(codes.shape[1])[None, :],
                          codes].sum(axis=1)
            mask = ids != q
            cid, cs = ids[mask], s[mask]
            if len(cid) == 0:
                continue
            take = min(k, len(cid))
            if take < len(cid):  # boundary-tie-safe partial select
                part = np.argpartition(-cs, take - 1)
                kth = cs[part[take - 1]]
                sel = np.nonzero(cs >= kth)[0]
            else:
                sel = np.arange(len(cid))
            order = np.lexsort((cid[sel], -cs[sel]))[:take]
            idx = sel[order]
            out_q.extend([int(q)] * take)
            out_n.extend(cid[idx].astype(int))
            out_s.extend(cs[idx])
        return pa.table({"query_id": pa.array(out_q, pa.int64()),
                         "neighbor_id": pa.array(out_n, pa.int64()),
                         "sim": pa.array(out_s, pa.float64())})

    local = ds.map_batches(local_topk, batch_format="pyarrow",
                           batch_size=4096)

    def final_topk(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["sim", "neighbor_id"],
                          ascending=[False, True]).head(k)
        return pd.DataFrame({"query_id": g["query_id"].astype("int64"),
                             "neighbor_id": g["neighbor_id"].astype("int64"),
                             "rnk": np.arange(1, len(g) + 1, dtype="int64")})

    return (local.groupby("query_id").map_groups(final_topk,
                                                 batch_format="pandas")
                 .sort(["query_id", "rnk"]))


# ---------------------------------------------------------------------------
def pca_moments(ray, sf_dir: str):
    """One streaming pass reducing the embedding table to the EXACT
    integer moment set PCA needs: the d(d+1)/2 second-moment triangle
    (GRAM_SCALE-quantized, emb_gram_matrix's rule), the d first-moment
    sums (same scale, key (i, -1)) and the row count (key (-2, -2)).
    Constant-size partials per batch, one merge bucket — 100 TB of
    vectors stream through, only tiny triangles shuffle."""
    from ..stages.aggregates import hash_bucket_aggregate

    ds = _rpq(ray, f"{sf_dir}/embeddings.parquet", columns=["embedding"])

    def partial(batch: pa.Table) -> pd.DataFrame:
        col = batch.column("embedding").combine_chunks()
        flat = col.flatten().to_numpy(zero_copy_only=False)
        n = batch.num_rows
        if n == 0 or len(flat) == 0:
            return pd.DataFrame({"i": pd.Series([], dtype="int64"),
                                 "j": pd.Series([], dtype="int64"),
                                 "g": pd.Series([], dtype="int64")})
        d = len(flat) // n
        X = flat.astype(np.float64).reshape(n, d)
        iu, ju = np.triu_indices(d)
        G = np.zeros(len(iu), dtype=np.int64)
        S = np.zeros(d, dtype=np.int64)
        for s in range(0, n, 256):
            c = X[s:s + 256]
            G += np.floor((c[:, iu] * c[:, ju]) * GRAM_SCALE).astype(
                np.int64).sum(axis=0, dtype=np.int64)
            S += np.floor(c * GRAM_SCALE).astype(np.int64).sum(
                axis=0, dtype=np.int64)
        return pd.DataFrame({
            "i": pd.Series(np.r_[iu, np.arange(d), [-2]], dtype="int64"),
            "j": pd.Series(np.r_[ju, np.full(d, -1), [-2]], dtype="int64"),
            "g": pd.Series(np.r_[G, S, [n]], dtype="int64")})

    return hash_bucket_aggregate(
        ds.map_batches(partial, batch_format="pyarrow"),
        ["i", "j"],
        lambda df: df.groupby(["i", "j"], as_index=False).agg(
            g=("g", "sum")),
        num_buckets=1)


def _pca_components(moments: pd.DataFrame, n_components: int):
    """(mean, top components) from the exact integer moment table: build
    the covariance, eigendecompose the tiny d x d matrix on the driver,
    orient each eigenvector deterministically (largest-|coord| positive)."""
    n = int(moments.loc[(moments["i"] == -2) & (moments["j"] == -2),
                        "g"].iloc[0])
    sums = moments[moments["j"] == -1].sort_values("i")
    mean = sums["g"].to_numpy(dtype=np.float64) / (GRAM_SCALE * n)
    d = len(mean)
    tri = moments[moments["j"] >= 0]
    C = np.zeros((d, d))
    C[tri["i"].to_numpy(), tri["j"].to_numpy()] = (
        tri["g"].to_numpy(dtype=np.float64) / (GRAM_SCALE * n))
    C = np.triu(C) + np.triu(C, 1).T
    C -= np.outer(mean, mean)
    w, v = np.linalg.eigh(C)
    comp = v[:, ::-1][:, :n_components].T  # rows = components, desc eigval
    sign = np.sign(comp[np.arange(len(comp)),
                        np.abs(comp).argmax(axis=1)])
    sign[sign == 0] = 1.0
    return mean, comp * sign[:, None], w[::-1][:n_components]


def emb_pca(ray, sf_dir: str, n_components: int = 2):
    """(vec_id, pc1, pc2): every embedding projected onto the corpus's
    top principal components. Pass 1 = pca_moments (exact mergeable
    integer moments, so the covariance — and hence the components — is
    identical whatever the block order); the d x d eigh runs on the
    driver; pass 2 projects batch-locally against the broadcast
    components. No stage ever materializes the vector table."""
    moments = pca_moments(ray, sf_dir).to_pandas()  # d(d+1)/2 + d + 1 rows
    mean, comp, _ = _pca_components(moments, n_components)
    mean_c, comp_c = mean, comp  # tiny: closure capture == broadcast

    ds = _rpq(ray, f"{sf_dir}/embeddings.parquet",
              columns=["vec_id", "embedding"])

    def project(batch: pa.Table) -> pa.Table:
        ids, m = _emb_matrix(batch)
        P = (m.astype(np.float64) - mean_c) @ comp_c.T
        cols = {"vec_id": pa.array(ids, pa.int64())}
        for k in range(comp_c.shape[0]):
            cols[f"pc{k + 1}"] = pa.array(P[:, k], pa.float64())
        return pa.table(cols)

    return (ds.map_batches(project, batch_format="pyarrow")
              .sort("vec_id"))


# ---------------------------------------------------------------------------
def knn_cosine_filtered(ray, sf_dir: str, n_queries: int = N_QUERIES,
                        k: int = TOP_K):
    """(query_id, neighbor_id, rnk): METADATA-FILTERED vector search —
    exact cosine top-k over the int8-quantized vectors restricted to
    neighbors sharing the query's label (the filtered-ANN shape every
    production vector store serves: 'nearest neighbors WHERE
    label = X'). The filter composes INSIDE the scan kernel as one
    vectorized mask per query — no second pass, no post-filter
    re-ranking shortfall (a post-filtered top-k could return < k rows;
    filtering before the top-k cannot). Same broadcast-queries /
    per-batch integer matmul / boundary-tie-safe local top-k shape as
    knn_cosine_q8, integer dots -> bit-identical to the SQL oracle."""
    import pyarrow.compute as _pc
    import pyarrow.dataset as pads

    t = pads.dataset(f"{sf_dir}/embeddings.parquet").to_table(
        columns=["vec_id", "embedding", "label"],
        filter=_pc.field("vec_id") < n_queries)
    qlabels_by_id = dict(zip(t.column("vec_id").to_pylist(),
                             t.column("label").to_pylist()))
    qids, qm = _emb_matrix(t)
    order = np.argsort(qids)
    qids = qids[order]
    qlabels = np.array([qlabels_by_id[int(i)] for i in qids],
                       dtype=np.int64)
    qq = _quantize_rows(qm[order]).astype(np.float64)
    qn = np.sqrt((qq * qq).sum(axis=1))
    qref = ray.put((qids, qlabels, qq, qn))

    ds = _rpq(ray, f"{sf_dir}/embeddings.parquet",
              columns=["vec_id", "embedding", "label"])

    def local_topk(batch: pa.Table) -> pa.Table:
        _qids, _qlabels, _qq, _qn = ray.get(qref)
        labels = batch.column("label").cast(pa.int64()).to_numpy(
            zero_copy_only=False)
        ids, m = _emb_matrix(batch)
        q = _quantize_rows(m).astype(np.float64)
        nn = np.sqrt((q * q).sum(axis=1))
        dots = q @ _qq.T
        out_q, out_n, out_s = [], [], []
        nonzero = nn > 0
        for qi in range(len(_qids)):
            sim = dots[:, qi] / (_qn[qi] * nn + (nn == 0))
            mask = (nonzero & (ids != _qids[qi])
                    & (labels == _qlabels[qi]))
            cand_ids, cand_s = ids[mask], sim[mask]
            if len(cand_ids) == 0:
                continue
            take = min(k, len(cand_ids))
            if take < len(cand_ids):
                part = np.argpartition(-cand_s, take - 1)
                kth = cand_s[part[take - 1]]
                sel = np.nonzero(cand_s >= kth)[0]
            else:
                sel = np.arange(len(cand_ids))
            order_ = np.lexsort((cand_ids[sel], -cand_s[sel]))[:take]
            idx = sel[order_]
            out_q.extend([int(_qids[qi])] * take)
            out_n.extend(cand_ids[idx].astype(int))
            out_s.extend(cand_s[idx])
        return pa.table({"query_id": pa.array(out_q, pa.int64()),
                         "neighbor_id": pa.array(out_n, pa.int64()),
                         "sim": pa.array(out_s, pa.float64())})

    local = ds.map_batches(local_topk, batch_format="pyarrow",
                           batch_size=4096)

    def final_topk(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["sim", "neighbor_id"],
                          ascending=[False, True]).head(k)
        g = g.reset_index(drop=True)
        return pd.DataFrame({
            "query_id": g["query_id"].astype("int64"),
            "neighbor_id": g["neighbor_id"].astype("int64"),
            "rnk": np.arange(1, len(g) + 1, dtype="int64")})

    out = local.groupby("query_id").map_groups(final_topk,
                                               batch_format="pandas")
    return out.sort(["query_id", "rnk"])


KNN_FILTERED_SQL = f"""
WITH q AS (
  SELECT vec_id, label,
         list_transform(
           embedding,
           x -> CAST(FLOOR(CAST(x AS DOUBLE) * 127.0 /
                (CASE WHEN vm = 0.0 THEN 1.0 ELSE vm END)) AS DOUBLE))
         AS code
  FROM (SELECT vec_id, label, embedding,
               list_max(list_transform(
                   embedding, x -> ABS(CAST(x AS DOUBLE)))) AS vm
        FROM embeddings)),
n AS (SELECT vec_id, label, code,
             sqrt(list_dot_product(code, code)) AS nrm FROM q)
SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id,
       ROW_NUMBER() OVER (
         PARTITION BY a.vec_id
         ORDER BY list_dot_product(a.code, b.code) / (a.nrm * b.nrm) DESC,
                  b.vec_id) AS rnk
FROM n a JOIN n b
  ON a.vec_id < {N_QUERIES} AND b.vec_id <> a.vec_id AND b.nrm > 0
 AND b.label = a.label
QUALIFY rnk <= {TOP_K}
ORDER BY query_id, rnk
"""


# ---------------------------------------------------------------------------
MMR_QUERIES = 4   # query vectors (vec_id < MMR_QUERIES)
MMR_POOL = 16     # relevance candidate pool per query
MMR_K = 5         # diversified selections per query


def knn_mmr(ray, sf_dir: str, n_queries: int = MMR_QUERIES,
            pool: int = MMR_POOL, k: int = MMR_K):
    """(query_id, selected_id, step): MAXIMAL MARGINAL RELEVANCE — the
    diversified top-k retrieval step (Carbonell-Goldstein 1998): greedy
    selection maximizing relevance minus the max similarity to anything
    already selected (lambda = 1/2, so the argmax of rel - max_sim is
    the exact MMR order). All similarities are RAW INTEGER inner
    products over the int8-quantized codes, so the greedy trajectory is
    bit-deterministic and the DuckDB oracle replays it exactly with k
    unrolled selection CTEs — a value-checked greedy algorithm, not
    just a checked aggregate.

    Scale shape: the candidate pool (top-``pool`` by integer relevance,
    vec_id ties) comes from the same broadcast-queries / per-batch
    integer matmul / local-then-global top-k path as every kNN here —
    the corpus streams once; only pool ids (O(queries x pool)) reach
    the driver, then ONE pruned re-read fetches the pool's vectors and
    the greedy runs over a (pool x pool) integer dot table."""
    import pyarrow.compute as _pc
    import pyarrow.dataset as pads

    t = pads.dataset(f"{sf_dir}/embeddings.parquet").to_table(
        columns=["vec_id", "embedding"],
        filter=_pc.field("vec_id") < n_queries)
    qids, qm = _emb_matrix(t)
    order = np.argsort(qids)
    qids = qids[order]
    qq = _quantize_rows(qm[order]).astype(np.float64)
    qref = ray.put((qids, qq))

    ds = _rpq(ray, f"{sf_dir}/embeddings.parquet",
              columns=["vec_id", "embedding"])

    def local_pool(batch: pa.Table) -> pa.Table:
        _qids, _qq = ray.get(qref)
        ids, m = _emb_matrix(batch)
        codes = _quantize_rows(m).astype(np.float64)
        dots = codes @ _qq.T  # exact integers in float64
        out_q, out_n, out_r = [], [], []
        for qi in range(len(_qids)):
            rel = dots[:, qi]
            mask = ids != _qids[qi]
            cand_ids, cand_r = ids[mask], rel[mask]
            take = min(pool, len(cand_ids))
            if take == 0:
                continue
            if take < len(cand_ids):
                part = np.argpartition(-cand_r, take - 1)
                kth = cand_r[part[take - 1]]
                sel = np.nonzero(cand_r >= kth)[0]
            else:
                sel = np.arange(len(cand_ids))
            o = np.lexsort((cand_ids[sel], -cand_r[sel]))[:take]
            idx = sel[o]
            out_q.extend([int(_qids[qi])] * take)
            out_n.extend(cand_ids[idx].astype(int))
            out_r.extend(cand_r[idx])
        return pa.table({"query_id": pa.array(out_q, pa.int64()),
                         "cand_id": pa.array(out_n, pa.int64()),
                         "rel": pa.array(out_r, pa.float64())})

    local = ds.map_batches(local_pool, batch_format="pyarrow",
                           batch_size=4096)

    def global_pool(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["rel", "cand_id"],
                          ascending=[False, True]).head(pool)
        return g.reset_index(drop=True)

    pools = (local.groupby("query_id")
             .map_groups(global_pool, batch_format="pandas")
             .to_pandas())  # O(queries x pool) rows

    # ONE pruned re-read for the pool members' vectors
    need = np.unique(pools["cand_id"].to_numpy(dtype=np.int64))
    pt = pads.dataset(f"{sf_dir}/embeddings.parquet").to_table(
        columns=["vec_id", "embedding"],
        filter=_pc.field("vec_id").isin(need.tolist()))
    pids, pm = _emb_matrix(pt)
    pcodes = _quantize_rows(pm).astype(np.float64)
    code_of = {int(i): pcodes[j] for j, i in enumerate(pids)}

    out_q, out_s, out_step = [], [], []
    for qid, g in pools.groupby("query_id", sort=True):
        cids = g["cand_id"].to_numpy(dtype=np.int64)
        rel = g["rel"].to_numpy()
        cm = np.stack([code_of[int(c)] for c in cids])
        pair = cm @ cm.T  # exact integer dots, pool x pool
        chosen: list[int] = []
        for step in range(1, min(k, len(cids)) + 1):
            if chosen:
                pen = pair[:, chosen].max(axis=1)
            else:
                pen = np.zeros(len(cids))
            score = rel - pen
            score[chosen] = -np.inf
            # argmax with vec_id tie-break
            best = np.lexsort((cids, -score))[0]
            chosen.append(int(best))
            out_q.append(int(qid))
            out_s.append(int(cids[best]))
            out_step.append(step)
    return pd.DataFrame({
        "query_id": pd.Series(out_q, dtype="int64"),
        "selected_id": pd.Series(out_s, dtype="int64"),
        "step": pd.Series(out_step, dtype="int64")})


def _mmr_sql() -> str:
    """k unrolled greedy-selection CTEs replaying the exact integer MMR
    trajectory (DuckDB cannot loop; the unroll IS the oracle)."""
    head = f"""
WITH q AS (
  SELECT vec_id,
         list_transform(
           embedding,
           x -> CAST(FLOOR(CAST(x AS DOUBLE) * 127.0 /
                (CASE WHEN vm = 0.0 THEN 1.0 ELSE vm END)) AS DOUBLE))
         AS code
  FROM (SELECT vec_id, embedding,
               list_max(list_transform(
                   embedding, x -> ABS(CAST(x AS DOUBLE)))) AS vm
        FROM embeddings)),
pool AS (
  SELECT query_id, cand_id, rel FROM (
    SELECT a.vec_id AS query_id, b.vec_id AS cand_id,
           list_dot_product(a.code, b.code) AS rel,
           ROW_NUMBER() OVER (
             PARTITION BY a.vec_id
             ORDER BY list_dot_product(a.code, b.code) DESC,
                      b.vec_id) AS rn
    FROM q a JOIN q b
      ON a.vec_id < {MMR_QUERIES} AND b.vec_id <> a.vec_id)
  WHERE rn <= {MMR_POOL}),
pd AS (
  SELECT p1.query_id, p1.cand_id AS a, p2.cand_id AS b,
         list_dot_product(qa.code, qb.code) AS dot
  FROM pool p1
  JOIN pool p2 ON p1.query_id = p2.query_id
  JOIN q qa ON qa.vec_id = p1.cand_id
  JOIN q qb ON qb.vec_id = p2.cand_id),
s1 AS (
  SELECT query_id, cand_id, 1 AS step FROM (
    SELECT query_id, cand_id,
           ROW_NUMBER() OVER (PARTITION BY query_id
                              ORDER BY rel DESC, cand_id) AS rn
    FROM pool) WHERE rn = 1),
sel1 AS (SELECT query_id, cand_id, step FROM s1)"""
    parts = [head]
    for i in range(2, MMR_K + 1):
        parts.append(f""",
s{i} AS (
  SELECT query_id, cand_id, {i} AS step FROM (
    SELECT p.query_id, p.cand_id,
           ROW_NUMBER() OVER (
             PARTITION BY p.query_id
             ORDER BY p.rel - m.mx DESC, p.cand_id) AS rn
    FROM pool p
    JOIN (SELECT pd.query_id, pd.a AS cand_id, MAX(pd.dot) AS mx
          FROM pd JOIN sel{i - 1} s
            ON s.query_id = pd.query_id AND s.cand_id = pd.b
          GROUP BY 1, 2) m
      ON m.query_id = p.query_id AND m.cand_id = p.cand_id
    WHERE NOT EXISTS (SELECT 1 FROM sel{i - 1} s2
                      WHERE s2.query_id = p.query_id
                        AND s2.cand_id = p.cand_id))
  WHERE rn = 1),
sel{i} AS (SELECT * FROM sel{i - 1} UNION ALL SELECT * FROM s{i})""")
    parts.append(f"""
SELECT query_id, CAST(cand_id AS BIGINT) AS selected_id,
       CAST(step AS BIGINT) AS step
FROM sel{MMR_K}
ORDER BY query_id, step
""")
    return "".join(parts)


KNN_MMR_SQL = _mmr_sql()


# ---------------------------------------------------------------------------
QNORM_SCALE = 1024.0


def emb_qnorm_hist(ray, sf_dir: str):
    """(log2_qnorm2, n_vecs): QUANTIZED-NORM HISTOGRAM — every
    embedding's squared norm after floor(x * 1024) integer
    quantization, bucketed by floor(log2) (all-zero vectors take
    bucket -1). The embeddings-QA pass a vector corpus runs before
    indexing: norm outliers are truncated/broken vectors, and the
    integer quantization keeps the histogram bit-exact against SQL
    (float norms are order-dependent; the emb_quantize discipline).

    Scale shape: pure streaming map_batches partials + one tiny
    grouped Sum — no shuffle of vectors, no state."""
    from ray.data.aggregate import Sum

    import pandas as pd

    ds = _rpq(ray, f"{sf_dir}/embeddings.parquet",
              columns=["vec_id", "embedding"])

    def partial(batch: pa.Table) -> pd.DataFrame:
        _, m = _emb_matrix(batch)
        q = np.floor(m.astype(np.float64) * QNORM_SCALE).astype(np.int64)
        qn2 = (q * q).sum(axis=1)
        b = np.full(len(qn2), -1, dtype=np.int64)
        nz = qn2 > 0
        b[nz] = np.floor(np.log2(qn2[nz].astype(np.float64))) \
                  .astype(np.int64)
        h = pd.DataFrame({"log2_qnorm2": b,
                          "n_vecs": np.ones(len(b), dtype="int64")})
        return h.groupby("log2_qnorm2", as_index=False).sum()

    return (ds.map_batches(partial, batch_format="pyarrow")
              .groupby("log2_qnorm2")
              .aggregate(Sum("n_vecs", alias_name="n_vecs"))
              .sort("log2_qnorm2"))


def knn_mips(ray, sf_dir: str, n_queries: int = N_QUERIES, k: int = TOP_K):
    """(query_id, neighbor_id, rnk): exact MAXIMUM INNER PRODUCT top-k
    per query (self excluded; ties by neighbor_id) — the retrieval
    semantics of unnormalized embedding models (recommendation /
    reward-model scoring), distinct from cosine: a long vector can
    outrank a better-aligned short one. Same broadcast-queries +
    per-batch matmul + per-query reduce shape as knn_brute_force, with
    NO normalization on either side."""
    import pyarrow.compute as pc
    import pyarrow.dataset as pads

    t = pads.dataset(f"{sf_dir}/embeddings.parquet").to_table(
        columns=["vec_id", "embedding"],
        filter=pc.field("vec_id") < n_queries)
    qids, qm = _emb_matrix(t)
    order = np.argsort(qids)
    qref = ray.put((qids[order], qm[order]))  # RAW queries, unnormalized

    ds = _rpq(ray, f"{sf_dir}/embeddings.parquet",
              columns=["vec_id", "embedding"])

    def local_topk(batch: pa.Table) -> pa.Table:
        _qids, _qm = ray.get(qref)
        ids, m = _emb_matrix(batch)
        sims = m @ _qm.T  # raw inner products
        out_q, out_n, out_s = [], [], []
        for qi in range(len(_qids)):
            s = sims[:, qi]
            mask = ids != _qids[qi]
            cand_ids, cand_s = ids[mask], s[mask]
            if len(cand_ids) == 0:
                continue
            take = min(k, len(cand_ids))
            if take < len(cand_ids):
                part = np.argpartition(-cand_s, take - 1)
                kth = cand_s[part[take - 1]]
                sel = np.nonzero(cand_s >= kth)[0]
            else:
                sel = np.arange(len(cand_ids))
            order2 = np.lexsort((cand_ids[sel], -cand_s[sel]))[:take]
            idx = sel[order2]
            out_q.extend([int(_qids[qi])] * take)
            out_n.extend(cand_ids[idx].astype(int))
            out_s.extend(cand_s[idx])
        return pa.table({"query_id": pa.array(out_q, pa.int64()),
                         "neighbor_id": pa.array(out_n, pa.int64()),
                         "sim": pa.array(out_s, pa.float64())})

    local = ds.map_batches(local_topk, batch_format="pyarrow",
                           batch_size=4096)

    def final_topk(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["sim", "neighbor_id"],
                          ascending=[False, True]).head(k)
        return pd.DataFrame({"query_id": g["query_id"].astype("int64"),
                             "neighbor_id":
                                 g["neighbor_id"].astype("int64"),
                             "rnk": np.arange(1, len(g) + 1,
                                              dtype="int64")})

    return (local.groupby("query_id").map_groups(final_topk,
                                                 batch_format="pandas")
                 .sort(["query_id", "rnk"]))


KNN_MIPS_SQL = f"""
SELECT q.vec_id AS query_id, e.vec_id AS neighbor_id,
       ROW_NUMBER() OVER (PARTITION BY q.vec_id
                          ORDER BY list_dot_product(q.embedding, e.embedding) DESC,
                                   e.vec_id) AS rnk
FROM embeddings q JOIN embeddings e ON e.vec_id != q.vec_id
WHERE q.vec_id < {N_QUERIES}
QUALIFY rnk <= {TOP_K}
ORDER BY query_id, rnk
"""


# ---------------------------------------------------------------------------
# ANN recall audits: value-checked recall of each approximate index vs
# the exact brute-force top-k (dedup_lsh_recall precedent — the audit an
# engine owes its own approximations). The APPROX pair set is dumped to
# parquet during the Ray query; the DuckDB oracle reproduces the exact
# side independently (the already-green knn_cosine SQL) and does the
# recall arithmetic in SQL over the dumped pairs — so the rows-only
# approximations gain a green, value-compared audit twin.


def knn_pairs_dump_path(sf_dir: str, variant: str) -> str:
    from ..io_utils import corpus_cache_dir
    import os

    return os.path.join(corpus_cache_dir(sf_dir),
                        f"knn_{variant}_pairs.parquet")


def _knn_recall_audit(ray, sf_dir: str, approx_ds, dump_path: str):
    """(n_exact, n_found, n_missed, recall_bp): recall of an approximate
    (query_id, neighbor_id) result against the exact brute-force top-k.
    Both sides are the bounded outputs of verified distributed pipelines
    (n_queries x k rows), so the set compare is a driver fold and the
    dump is tiny; recall_bp = 10000 * |exact ∩ approx| / |exact|."""
    import os

    import pyarrow.parquet as _pq

    ap = approx_ds.to_pandas() if hasattr(approx_ds, "to_pandas") \
        else approx_ds
    os.makedirs(os.path.dirname(dump_path), exist_ok=True)
    _pq.write_table(pa.table({
        "query_id": pa.array(ap["query_id"].to_numpy().astype(np.int64)),
        "neighbor_id": pa.array(
            ap["neighbor_id"].to_numpy().astype(np.int64))}), dump_path)
    exact = knn_brute_force(ray, sf_dir).to_pandas()
    ep = set(zip(exact["query_id"], exact["neighbor_id"]))
    lp = set(zip(ap["query_id"], ap["neighbor_id"]))
    n_exact, n_found = len(ep), len(ep & lp)
    recall_bp = (10_000 * n_found // n_exact) if n_exact else 10_000
    return pd.DataFrame({"n_exact": [n_exact], "n_found": [n_found],
                         "n_missed": [n_exact - n_found],
                         "recall_bp": [recall_bp]}).astype("int64")


def knn_ivf_recall(ray, sf_dir: str):
    return _knn_recall_audit(ray, sf_dir, knn_ivf(ray, sf_dir),
                             knn_pairs_dump_path(sf_dir, "ivf"))


def knn_lsh_recall(ray, sf_dir: str):
    return _knn_recall_audit(ray, sf_dir, knn_lsh(ray, sf_dir),
                             knn_pairs_dump_path(sf_dir, "lsh"))


def knn_pq_recall(ray, sf_dir: str):
    return _knn_recall_audit(ray, sf_dir, knn_pq(ray, sf_dir),
                             knn_pairs_dump_path(sf_dir, "pq"))


def knn_recall_sql_template(dump_key: str) -> str:
    """Oracle template: exact top-k reproduced in SQL (same expression
    as the green knn_cosine oracle, so exact-side parity is already
    value-proven) + recall arithmetic over the dumped approx pairs.
    ``{dump_key}`` is bound per scale by the registry."""
    return f"""
WITH exact AS (
  SELECT q.vec_id AS query_id, e.vec_id AS neighbor_id,
         ROW_NUMBER() OVER (PARTITION BY q.vec_id
                            ORDER BY list_cosine_similarity(q.embedding, e.embedding) DESC,
                                     e.vec_id) AS rnk
  FROM embeddings q JOIN embeddings e ON e.vec_id != q.vec_id
  WHERE q.vec_id < {N_QUERIES}
  QUALIFY rnk <= {TOP_K}
), approx AS (
  SELECT DISTINCT query_id, neighbor_id
  FROM read_parquet('{{{dump_key}}}')
), stats AS (
  SELECT COUNT(*) AS n_exact, COUNT(a.query_id) AS n_found
  FROM exact x LEFT JOIN approx a
    ON a.query_id = x.query_id AND a.neighbor_id = x.neighbor_id
)
SELECT CAST(n_exact AS BIGINT) AS n_exact,
       CAST(n_found AS BIGINT) AS n_found,
       CAST(n_exact - n_found AS BIGINT) AS n_missed,
       CAST(CASE WHEN n_exact = 0 THEN 10000
                 ELSE (10000 * n_found) // n_exact END AS BIGINT)
         AS recall_bp
FROM stats
"""


EMB_QNORM_HIST_SQL = """
WITH q AS (
  SELECT list_transform(embedding,
             x -> CAST(FLOOR(CAST(x AS DOUBLE) * 1024.0) AS BIGINT))
         AS code
  FROM embeddings),
n AS (SELECT CAST(list_sum(list_transform(code, c -> c * c)) AS BIGINT)
             AS qn2 FROM q),
b AS (SELECT CASE WHEN qn2 <= 0 THEN -1
                  ELSE CAST(FLOOR(LOG2(qn2)) AS BIGINT)
             END AS log2_qnorm2 FROM n)
SELECT log2_qnorm2, COUNT(*) AS n_vecs
FROM b GROUP BY log2_qnorm2 ORDER BY log2_qnorm2
"""
