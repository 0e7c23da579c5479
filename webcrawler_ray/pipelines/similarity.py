"""Similarity search over the ``embeddings`` table (list<float> column).

* ``knn_brute_force`` — exact cosine top-k: the query matrix is broadcast
  ONCE via ``ray.put``; every batch does one numpy matmul against it and
  emits only its local top-k per query; a final tiny per-query reduce
  keeps the global top-k. Data moved: O(batches x queries x k), never the
  embedding corpus.
* ``knn_ivf`` — the scale path: coarse quantization by the ``label``
  partition (centroid = per-label mean via distributed groupby), probe the
  nprobe nearest centroids, exact search only inside probed partitions.
* ``cosine_dup_pairs`` — embedding near-duplicate pairs above a cosine
  threshold via block-wise matmul.
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
            # partial select then deterministic (-sim, id) order
            part = np.argpartition(-cand_s, take - 1)[:take]
            out_q.extend([int(_qids[qi])] * take)
            out_n.extend(cand_ids[part].astype(int))
            out_s.extend(cand_s[part])
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
            part = np.argpartition(-s, take - 1)[:take]
            out_q.extend([int(q)] * take)
            out_n.extend(cid[part].astype(int))
            out_s.extend(s[part])
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
def cosine_dup_pairs(ray, sf_dir: str, threshold: float = 0.45,
                     max_side: int = 4096):
    """(vec_id_a, vec_id_b): embedding near-duplicate pairs with cosine >=
    threshold, a < b. Block-wise matmul over a capped id range (the LSH
    route replaces the cap at full scale)."""
    import pyarrow.compute as pc
    import pyarrow.dataset as pads

    t = pads.dataset(f"{sf_dir}/embeddings.parquet").to_table(
        columns=["vec_id", "embedding"],
        filter=pc.field("vec_id") < max_side)
    ids, m = _emb_matrix(t)
    ref = ray.put((ids, _normalize(m)))

    ds = _rpq(ray, f"{sf_dir}/embeddings.parquet",
                               columns=["vec_id", "embedding"])
    ds = ds.map_batches(
        lambda b: b.filter(pc.less(b.column("vec_id"),
                                   pa.scalar(max_side, pa.int64()))),
        batch_format="pyarrow")

    def pairs(batch: pa.Table) -> pa.Table:
        all_ids, all_m = ray.get(ref)
        ids_b, mb = _emb_matrix(batch)
        sims = _normalize(mb) @ all_m.T
        out_a, out_b = [], []
        for i in range(len(ids_b)):
            hits = np.nonzero((sims[i] >= threshold) & (all_ids > ids_b[i]))[0]
            for j in hits:
                out_a.append(int(ids_b[i]))
                out_b.append(int(all_ids[j]))
        return pa.table({"vec_id_a": pa.array(out_a, pa.int64()),
                         "vec_id_b": pa.array(out_b, pa.int64())})

    return (ds.map_batches(pairs, batch_format="pyarrow", batch_size=2048)
              .sort(["vec_id_a", "vec_id_b"]))


COSINE_DUP_SQL = """
SELECT a.vec_id AS vec_id_a, b.vec_id AS vec_id_b
FROM embeddings a JOIN embeddings b ON b.vec_id > a.vec_id
WHERE list_cosine_similarity(a.embedding, b.embedding) >= 0.45
ORDER BY vec_id_a, vec_id_b
"""
