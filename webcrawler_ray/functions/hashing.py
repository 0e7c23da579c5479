"""Content-hashing primitives shared by the dedup pipelines and the
crawl-time enrichment stage: word-shingle hashing, MinHash (Broder'97)
via the multiply-shift universal family, SimHash (Charikar'02), Jaccard.

All hot paths are uint64-vectorized; per-token md5 hashing is the
irreducible per-document cost (token space is unbounded on real text)."""

from __future__ import annotations

import hashlib

import numpy as np

from .tokenizer import tokenize

N_PERM = 128
N_BANDS = 16  # 8 rows per band
SHINGLE_K = 3


def hash_tokens(tokens) -> np.ndarray:
    """md5-first-8-bytes (little-endian) per token -> uint64 array (not
    deduped). md5, not blake2b, ON PURPOSE: DuckDB's
    ``md5_number_upper(t)`` computes this exact value, so every integer
    pipeline downstream of token hashing (shingle polynomial, MinHash,
    LSH banding, SimHash, winnowing) is replicable in oracle SQL
    directly from the documents table — no dump boundary needed."""
    m = hashlib.md5
    return np.fromiter(
        (int.from_bytes(m(t.encode()).digest()[:8], "little")
         for t in tokens), dtype=np.uint64, count=len(tokens))


class TokenHashCache:
    """Memoized ``hash_tokens``: md5 runs only on first-seen tokens.

    Real webtext vocabulary is Zipf-distributed, so an actor-resident
    cache (built once per actor in ``__init__``, reused across batches)
    turns the per-token md5 pass — the enrichment kernel's dominant
    cost — into a C-speed ``pandas.factorize`` plus a handful of misses.
    Values are bit-identical to ``hash_tokens``; the cache is bounded and
    simply stops admitting new entries when full (checked per call, so
    the bound is loose by at most one batch's uniques; the hot head of
    the Zipf curve is cached long before that)."""

    def __init__(self, max_entries: int = 1 << 21):
        self._cache: dict[str, int] = {}
        self._max = max_entries

    def hash_unique(self, uniques) -> np.ndarray:
        """uint64 ``hash_tokens`` values of an array of UNIQUE tokens."""
        c = self._cache
        admit = len(c) < self._max
        m = hashlib.md5
        out = np.empty(len(uniques), dtype=np.uint64)
        for i, t in enumerate(uniques):
            v = c.get(t)
            if v is None:
                v = int.from_bytes(m(t.encode()).digest()[:8], "little")
                if admit:
                    c[t] = v
            out[i] = v
        return out

    def encode_token_lists(self, token_lists):
        """One factorize over every token of the batch, one cache probe
        per unique -> ``(codes, lengths, uniq_hashes)`` where
        ``uniq_hashes[codes]`` reconstructs the concatenated per-doc
        ``hash_tokens`` outputs. The factorized form feeds
        ``simhash64_batch`` directly."""
        import pandas as pd

        lengths = np.fromiter((len(t) for t in token_lists), dtype=np.int64,
                              count=len(token_lists))
        total = int(lengths.sum())
        if total == 0:
            return (np.zeros(0, dtype=np.int64), lengths,
                    np.zeros(0, dtype=np.uint64))
        flat = np.empty(total, dtype=object)
        pos = 0
        for toks in token_lists:
            flat[pos:pos + len(toks)] = toks
            pos += len(toks)
        codes, uniques = pd.factorize(flat)
        return (codes.astype(np.int64, copy=False), lengths,
                self.hash_unique(uniques))

    def hash_token_lists(self, token_lists):
        """List of per-doc uint64 hash arrays (each the exact
        ``hash_tokens`` output for that doc), via one batch factorize."""
        codes, lengths, uh = self.encode_token_lists(token_lists)
        if len(codes) == 0:
            return [np.zeros(0, dtype=np.uint64) for _ in token_lists]
        th_all = uh[codes]
        bounds = np.cumsum(lengths)
        return [th_all[s:e] for s, e in
                zip(bounds - lengths, bounds)]


_POLY = np.uint64(1099511628211)  # FNV prime — shingle combiner


def shingle_hashes(text: str, k: int = SHINGLE_K) -> np.ndarray:
    """Unique uint64 hashes of the word k-shingles of ``text``.

    Tokens are md5-hashed ONCE; k-shingle hashes are the vectorized
    polynomial combination of the token-hash windows (no per-shingle
    string building — that allocation storm dominated the kernel and
    destroyed multi-core scaling)."""
    return shingle_hashes_from_token_hashes(hash_tokens(tokenize(text)), k)


def shingle_hashes_from_token_hashes(th: np.ndarray,
                                     k: int = SHINGLE_K) -> np.ndarray:
    """``shingle_hashes`` over pre-computed token hashes — lets a caller
    that needs several per-doc signatures (crawl-time enrichment: shingle
    minhash AND simhash) pay the md5 token pass ONCE."""
    if len(th) == 0:
        return np.zeros(0, dtype=np.uint64)
    if len(th) < k:
        with np.errstate(over="ignore"):
            acc = np.uint64(0)
            for v in th:
                acc = acc * _POLY + v
        return np.array([acc], dtype=np.uint64)
    m = len(th) - k + 1
    with np.errstate(over="ignore"):
        acc = th[:m].copy()
        for j in range(1, k):
            acc *= _POLY
            acc += th[j:m + j]
    return np.unique(acc)


def kgram_hashes_ordered(text: str, k: int) -> np.ndarray:
    """ORDERED (non-deduped) uint64 hashes of the word k-grams — the
    winnowing front-end: tokens are md5-hashed once, k-gram hashes
    are the vectorized polynomial combination of token-hash windows
    (same kernel as ``shingle_hashes`` minus the unique)."""
    toks = tokenize(text)
    if not toks:
        return np.zeros(0, dtype=np.uint64)
    th = hash_tokens(toks)
    if len(th) < k:
        # Schleimer'03: a doc shorter than one k-gram has NO fingerprints
        # (shingle_hashes' whole-doc fallback only makes sense for dedup,
        # where every doc must map to a non-empty set)
        return np.zeros(0, dtype=np.uint64)
    m = len(th) - k + 1
    with np.errstate(over="ignore"):
        acc = th[:m].copy()
        for j in range(1, k):
            acc *= _POLY
            acc += th[j:m + j]
    return acc


def minhash_perm_params(n_perm: int = N_PERM, seed: int = 1234):
    """Multiply-shift universal hash family over uint64 (Dietzfelbinger et
    al.): perm_i(x) = (a_i * x + b_i) mod 2^64 with odd a_i — fully
    vectorizable (uint64 wraparound is the modulus)."""
    rng = np.random.RandomState(seed)
    a = rng.randint(0, 1 << 62, size=n_perm).astype(np.uint64) * 2 + 1
    b = rng.randint(0, 1 << 62, size=n_perm).astype(np.uint64)
    return a, b


_MH_CHUNK = 1024  # keep the (n_perm x chunk) temporary inside L2 — the
#                   unchunked matrix (n_perm x n_shingles, ~6 MB for a 6k-word
#                   doc) turns the kernel DRAM-bandwidth-bound and kills
#                   multi-core scaling


def minhash_signature(sh: np.ndarray, a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """(n_perm,) uint64 signature; empty shingle set -> all-max sentinel."""
    if len(sh) == 0:
        return np.full(len(a), np.iinfo(np.uint64).max, dtype=np.uint64)
    out = np.full(len(a), np.iinfo(np.uint64).max, dtype=np.uint64)
    with np.errstate(over="ignore"):
        for i in range(0, len(sh), _MH_CHUNK):
            chunk = sh[i:i + _MH_CHUNK]
            vals = a[:, None] * chunk[None, :] + b[:, None]
            np.minimum(out, vals.min(axis=1), out=out)
    return out


def minhash_signatures_batch(sh_rows: list, a: np.ndarray,
                             b: np.ndarray) -> np.ndarray:
    """(n_docs, n_perm) uint64 signature matrix for a batch of per-doc
    shingle arrays. Internally per-doc ``minhash_signature`` calls: the
    cache-chunked kernel is already compute-bound (128 x n_shingles
    multiplies dwarf the python call overhead), and the measured
    alternatives lost — a whole-batch (n_perm x total_shingles)
    broadcast ran ~250x slower than chunks (huge temporaries), and a
    reduceat-over-doc-slabs variant was ~1.5x slower than this loop at
    every doc size tried. The batch API exists for the BAND layer:
    callers get one matrix to feed ``band_hashes_batch`` (where the
    vectorization does pay) without re-deriving row layout."""
    n = len(sh_rows)
    sig = np.empty((n, len(a)), dtype=np.uint64)
    for i in range(n):
        sig[i] = minhash_signature(sh_rows[i], a, b)
    return sig


def band_hashes_batch(sig: np.ndarray, n_bands: int) -> np.ndarray:
    """(n_docs, n_bands) int64 band hashes from a (n_docs, n_perm)
    signature matrix: each band's rows fold with the FNV polynomial and
    a splitmix64 finalizer (vectorized over the batch — the per-doc
    hash-per-band loop this replaces cost more than the minhash
    itself). Identical signature segments collide under any
    deterministic hash, which is the only property banding needs."""
    n, nperm = sig.shape
    rpb = nperm // n_bands
    out = np.zeros((n, n_bands), dtype=np.uint64)
    with np.errstate(over="ignore"):
        for bi in range(n_bands):
            acc = np.zeros(n, dtype=np.uint64)
            for r in range(rpb):
                acc = acc * _POLY + sig[:, bi * rpb + r]
            acc += np.uint64(0x9E3779B97F4A7C15)
            acc ^= acc >> np.uint64(30)
            acc *= np.uint64(0xBF58476D1CE4E5B9)
            acc ^= acc >> np.uint64(27)
            acc *= np.uint64(0x94D049BB133111EB)
            acc ^= acc >> np.uint64(31)
            out[:, bi] = acc
    return (out % np.uint64(1 << 63)).astype(np.int64)


def jaccard(a: np.ndarray, b: np.ndarray) -> float:
    if len(a) == 0 and len(b) == 0:
        return 1.0
    inter = len(np.intersect1d(a, b, assume_unique=True))
    union = len(a) + len(b) - inter
    return inter / union if union else 1.0


_SHIFTS = np.arange(64, dtype=np.uint64)


def simhash64(text: str) -> int:
    """64-bit SimHash over word unigrams, weighted by token count (each
    unique token hashed once — the standard counted-token formulation).
    Chunked like minhash to keep temporaries cache-resident."""
    return simhash64_from_token_hashes(hash_tokens(tokenize(text)))


_SIMHASH_DENSE_MAX = 4_000_000  # docs x uniques cells for the dense route


def simhash64_batch(codes: np.ndarray, lengths: np.ndarray,
                    uniq_hashes: np.ndarray) -> np.ndarray:
    """Per-doc 64-bit SimHash over FACTORIZED tokens — the
    batch-vectorized form of ``simhash64_from_token_hashes``.

    The counted-token formulation is a count-weighted sum over unique
    hashes, which equals the plain sum over every token instance — so
    the per-doc ``np.unique`` disappears and the bit matrix is unpacked
    once for the batch's UNIQUE hashes only. Two exact routes, picked by
    shape: a dense per-doc count matrix + one BLAS matmul (small
    vocabularies — counts are integers < 2^53, so float64 sums are
    exact), else a per-doc bit-row gather+sum whose cost is independent
    of vocabulary size (the Zipf-tail case). Returns uint64 per doc;
    empty docs hash to 0."""
    n = len(lengths)
    out = np.zeros(n, dtype=np.uint64)
    if n == 0 or len(codes) == 0 or len(uniq_hashes) == 0:
        return out
    lengths = np.asarray(lengths, dtype=np.int64)
    starts = np.cumsum(lengths) - lengths
    U = len(uniq_hashes)
    bits_u = np.unpackbits(
        np.ascontiguousarray(uniq_hashes).view(np.uint8).reshape(-1, 8),
        axis=1, bitorder="little")
    ones = np.zeros((n, 64), dtype=np.int64)
    if n * U <= _SIMHASH_DENSE_MAX:
        cnt = np.zeros((n, U))
        for i in range(n):
            if lengths[i]:
                cnt[i] = np.bincount(codes[starts[i]:starts[i] + lengths[i]],
                                     minlength=U)
        ones = np.rint(cnt @ bits_u.astype(np.float64)).astype(np.int64)
    else:
        for i in range(n):
            if lengths[i]:
                ones[i] = bits_u[
                    codes[starts[i]:starts[i] + lengths[i]]].sum(
                        axis=0, dtype=np.int64)
    # bit j set  <=>  acc_j = sum(2*bit - 1) > 0  <=>  2*ones_j > n_tokens
    set_bits = (2 * ones) > lengths[:, None]
    codes64 = (set_bits.astype(np.uint64)
               << _SHIFTS[None, :]).sum(axis=1, dtype=np.uint64)
    out[:] = codes64
    return out


def simhash64_from_token_hashes(hs_all: np.ndarray) -> int:
    """``simhash64`` over pre-computed token hashes (see
    ``shingle_hashes_from_token_hashes``)."""
    if len(hs_all) == 0:
        return 0
    # unique on uint64 (C-speed) with counts — same counted-token
    # weighting, no python-object sorting
    hs, counts = np.unique(hs_all, return_counts=True)
    acc = np.zeros(64, dtype=np.int64)
    for i in range(0, len(hs), _MH_CHUNK):
        h = hs[i:i + _MH_CHUNK]
        c = counts[i:i + _MH_CHUNK].astype(np.int64)
        bits = ((h[:, None] >> _SHIFTS[None, :]) & np.uint64(1)).astype(np.int64)
        acc += ((bits * 2 - 1) * c[:, None]).sum(axis=0)
    out = np.uint64(0)
    for i in range(64):
        if acc[i] > 0:
            out |= np.uint64(1) << np.uint64(i)
    return int(out)
