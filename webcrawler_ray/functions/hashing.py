"""Content-hashing primitives shared by the dedup pipelines and the
crawl-time enrichment stage: word-shingle hashing, MinHash (Broder'97)
via the multiply-shift universal family, SimHash (Charikar'02), Jaccard.

All hot paths are uint64-vectorized; per-token blake2b hashing is the
irreducible per-document cost (token space is unbounded on real text)."""

from __future__ import annotations

import hashlib

import numpy as np

N_PERM = 128
N_BANDS = 16  # 8 rows per band
SHINGLE_K = 3


def hash_tokens(tokens) -> np.ndarray:
    """blake2b-8 per token -> uint64 array (not deduped)."""
    b = hashlib.blake2b
    return np.fromiter(
        (int.from_bytes(b(t.encode(), digest_size=8).digest(), "big")
         for t in tokens), dtype=np.uint64, count=len(tokens))


def shingle_hashes(text: str, k: int = SHINGLE_K) -> np.ndarray:
    """Unique uint64 hashes of the word k-shingles of ``text``."""
    toks = text.split()
    if len(toks) < k:
        grams = [" ".join(toks)] if toks else []
    else:
        grams = [" ".join(toks[i:i + k]) for i in range(len(toks) - k + 1)]
    if not grams:
        return np.zeros(0, dtype=np.uint64)
    return np.unique(hash_tokens(grams))


def minhash_perm_params(n_perm: int = N_PERM, seed: int = 1234):
    """Multiply-shift universal hash family over uint64 (Dietzfelbinger et
    al.): perm_i(x) = (a_i * x + b_i) mod 2^64 with odd a_i — fully
    vectorizable (uint64 wraparound is the modulus)."""
    rng = np.random.RandomState(seed)
    a = rng.randint(0, 1 << 62, size=n_perm).astype(np.uint64) * 2 + 1
    b = rng.randint(0, 1 << 62, size=n_perm).astype(np.uint64)
    return a, b


def minhash_signature(sh: np.ndarray, a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """(n_perm,) uint64 signature; empty shingle set -> all-max sentinel."""
    if len(sh) == 0:
        return np.full(len(a), np.iinfo(np.uint64).max, dtype=np.uint64)
    with np.errstate(over="ignore"):
        vals = a[:, None] * sh[None, :] + b[:, None]  # uint64 wraparound
    return vals.min(axis=1)


def jaccard(a: np.ndarray, b: np.ndarray) -> float:
    if len(a) == 0 and len(b) == 0:
        return 1.0
    inter = len(np.intersect1d(a, b, assume_unique=True))
    union = len(a) + len(b) - inter
    return inter / union if union else 1.0


_SHIFTS = np.arange(64, dtype=np.uint64)


def simhash64(text: str) -> int:
    """64-bit SimHash over word unigrams, weighted by token count (each
    unique token hashed once — the standard counted-token formulation)."""
    toks = text.split()
    if not toks:
        return 0
    uniq, counts = np.unique(np.array(toks, dtype=object), return_counts=True)
    hs = hash_tokens(list(uniq))
    bits = ((hs[:, None] >> _SHIFTS[None, :]) & np.uint64(1)).astype(np.int64)
    acc = ((bits * 2 - 1) * counts[:, None].astype(np.int64)).sum(axis=0)
    out = np.uint64(0)
    for i in range(64):
        if acc[i] > 0:
            out |= np.uint64(1) << np.uint64(i)
    return int(out)
