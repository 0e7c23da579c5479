"""Sharded URL-seen set (ST1) — bloom pre-filter + cuckoo filter + exact
confirm set, held in Ray actors sharded by stable url-hash.

The reference keeps a per-host ``set`` of crawled resources
(`Host.py:17,135-142`) sharded across 80 threads by salted ``hash(host)``
(`utils.py:51-52`). Here the seen set is sharded by
``stable_hash64(canonical_url) % num_shards`` into actors, each holding:

* a bloom bit-array pre-filter (cheap vectorized negative checks),
* a cuckoo filter (16-bit fingerprints, 4-slot buckets) — the scale
  structure: ~2 bytes/URL, deletable, mergeable by rebuild,
* an optional exact set of URLs (``exact_confirm``) that turns cuckoo
  false-positives back into exact answers — on for correctness tests,
  off at 10^10-URL scale where the accepted FP rate is the cuckoo's
  (~2^-14 per lookup with 16-bit fingerprints).

All membership ops are vectorized over uint64 hash arrays; actors expose
batched ``contains``/``insert`` and are checkpointed per crawl round
(``dump``/``load``) so a killed job resumes without re-fetching (ST1 +
checkpoint row of SURVEY.md §4).
"""

from __future__ import annotations

import pickle

import numpy as np

_MURMUR_MIX = np.uint64(0x5BD1E995)


class BloomFilter:
    """Vectorized bloom filter over uint64 pre-hashed keys."""

    def __init__(self, n_bits: int = 1 << 23, n_hashes: int = 4):
        assert n_bits % 8 == 0
        self.n_bits = np.uint64(n_bits)
        self.n_hashes = n_hashes
        self.bits = np.zeros(n_bits // 8, dtype=np.uint8)

    def _positions(self, h: np.ndarray) -> np.ndarray:
        h1 = h & np.uint64(0xFFFFFFFF)
        h2 = h >> np.uint64(32)
        idx = np.empty((self.n_hashes, len(h)), dtype=np.uint64)
        for i in range(self.n_hashes):
            idx[i] = (h1 + np.uint64(i) * h2) % self.n_bits
        return idx

    def add(self, h: np.ndarray) -> None:
        pos = self._positions(h).ravel()
        np.bitwise_or.at(self.bits, (pos >> np.uint64(3)).astype(np.int64),
                         np.left_shift(np.uint8(1), (pos & np.uint64(7)).astype(np.uint8)))

    def might_contain(self, h: np.ndarray) -> np.ndarray:
        pos = self._positions(h)
        out = np.ones(len(h), dtype=bool)
        for i in range(self.n_hashes):
            p = pos[i]
            byte = self.bits[(p >> np.uint64(3)).astype(np.int64)]
            bit = np.left_shift(np.uint8(1), (p & np.uint64(7)).astype(np.uint8))
            out &= (byte & bit) != 0
        return out


class CuckooFilter:
    """4-way bucketed cuckoo filter with 16-bit fingerprints over uint64 keys.

    Public-design parameters (Fan et al., "Cuckoo Filter: Practically
    Better Than Bloom", CoNEXT'14): bucket size 4, partial-key cuckoo
    hashing with i2 = i1 XOR H(fp).
    """

    SLOTS = 4
    MAX_KICKS = 500

    def __init__(self, capacity: int = 1 << 20, seed: int = 0):
        n_buckets = 1
        while n_buckets * self.SLOTS < capacity:
            n_buckets <<= 1
        self.n_buckets = n_buckets
        self._mask = np.uint64(n_buckets - 1)
        self.table = np.zeros((n_buckets, self.SLOTS), dtype=np.uint16)
        self.count = 0
        self._rng = np.random.RandomState(seed)  # kick-slot choice (stateful,
        #                                          deterministic per shard)

    def _fp(self, h: np.ndarray) -> np.ndarray:
        fp = (h >> np.uint64(48)).astype(np.uint16)
        fp[fp == 0] = 1  # 0 is the empty-slot sentinel
        return fp

    def _i1(self, h: np.ndarray) -> np.ndarray:
        return (h & self._mask).astype(np.int64)

    def _i2(self, i1: np.ndarray, fp: np.ndarray) -> np.ndarray:
        alt = np.uint64(i1) ^ (fp.astype(np.uint64) * _MURMUR_MIX)
        return (alt & self._mask).astype(np.int64)

    def contains(self, h: np.ndarray) -> np.ndarray:
        if len(h) == 0:
            return np.zeros(0, dtype=bool)
        fp = self._fp(h)
        i1 = self._i1(h)
        i2 = self._i2(i1, fp)
        fpc = fp[:, None]
        return ((self.table[i1] == fpc).any(axis=1)
                | (self.table[i2] == fpc).any(axis=1))

    def insert(self, h: np.ndarray) -> None:
        """Insert all keys (assumed not present; duplicates are harmless
        but consume slots)."""
        fp_a = self._fp(h)
        i1_a = self._i1(h)
        i2_a = self._i2(i1_a, fp_a)
        tbl = self.table
        for fp, i1, i2 in zip(fp_a, i1_a, i2_a):
            placed = False
            for idx in (i1, i2):
                row = tbl[idx]
                empty = np.nonzero(row == 0)[0]
                if len(empty):
                    row[empty[0]] = fp
                    placed = True
                    break
            if placed:
                self.count += 1
                continue
            # kick loop
            idx = int(i2)
            cur = fp
            ok = False
            for _ in range(self.MAX_KICKS):
                slot = self._rng.randint(self.SLOTS)
                cur, tbl[idx, slot] = tbl[idx, slot], cur
                idx = int((np.uint64(idx) ^ (np.uint64(cur) * _MURMUR_MIX)) & self._mask)
                row = tbl[idx]
                empty = np.nonzero(row == 0)[0]
                if len(empty):
                    row[empty[0]] = cur
                    ok = True
                    break
            if not ok:
                raise RuntimeError(
                    "cuckoo filter over capacity — raise seen_capacity_per_shard")
            self.count += 1


class SeenShardState:
    """One shard's state; plain object so it is testable without Ray."""

    def __init__(self, capacity: int = 1 << 20, exact_confirm: bool = True,
                 bloom_bits_per_key: int = 8, shard_id: int = 0):
        self.shard_id = shard_id
        self.exact_confirm = exact_confirm
        self.bloom = BloomFilter(n_bits=max(1 << 13, capacity * bloom_bits_per_key))
        self.cuckoo = CuckooFilter(capacity=capacity, seed=shard_id)
        self.exact: set[str] | None = set() if exact_confirm else None

    def contains(self, hashes: np.ndarray, urls: list[str] | None = None) -> np.ndarray:
        """Vectorized membership. With exact_confirm, cuckoo positives are
        confirmed against the exact set (urls required)."""
        maybe = self.bloom.might_contain(hashes)
        if maybe.any():
            sub = np.zeros_like(maybe)
            sub[maybe] = self.cuckoo.contains(hashes[maybe])
            maybe = sub
        if self.exact is not None and maybe.any():
            if urls is None:
                raise ValueError("exact_confirm requires urls")
            ex = self.exact
            for i in np.nonzero(maybe)[0]:
                if urls[i] not in ex:
                    maybe[i] = False
        return maybe

    def insert(self, hashes: np.ndarray, urls: list[str] | None = None) -> int:
        """Insert keys not already present; returns number inserted."""
        present = self.contains(hashes, urls)
        new = ~present
        if new.any():
            h_new = hashes[new]
            self.bloom.add(h_new)
            self.cuckoo.insert(h_new)
            if self.exact is not None:
                if urls is None:
                    raise ValueError("exact_confirm requires urls")
                for i in np.nonzero(new)[0]:
                    self.exact.add(urls[i])
        return int(new.sum())

    def check_and_insert(self, hashes: np.ndarray,
                         urls: list[str] | None = None) -> np.ndarray:
        """Atomic membership-test + insert; returns is_new mask."""
        present = self.contains(hashes, urls)
        new = ~present
        if new.any():
            self.insert(hashes[new],
                        [urls[i] for i in np.nonzero(new)[0]] if urls else None)
        return new

    # -- checkpointing ----------------------------------------------------
    def dump(self) -> bytes:
        # zlib-1: the bloom/cuckoo arrays are sparse for most of a crawl's
        # life; compression shrinks checkpoint IO ~30x for ~50ms CPU
        import zlib

        return zlib.compress(pickle.dumps({
            "shard_id": self.shard_id,
            "exact_confirm": self.exact_confirm,
            "bloom_bits": self.bloom.bits,
            "bloom_nbits": int(self.bloom.n_bits),
            "bloom_k": self.bloom.n_hashes,
            "cuckoo_table": self.cuckoo.table,
            "cuckoo_count": self.cuckoo.count,
            "cuckoo_rng": self.cuckoo._rng.get_state(),
            "exact": self.exact,
        }, protocol=pickle.HIGHEST_PROTOCOL), 1)

    @classmethod
    def from_dump(cls, blob: bytes) -> "SeenShardState":
        import zlib

        d = pickle.loads(zlib.decompress(blob))
        st = cls.__new__(cls)
        st.shard_id = d["shard_id"]
        st.exact_confirm = d["exact_confirm"]
        st.bloom = BloomFilter.__new__(BloomFilter)
        st.bloom.bits = d["bloom_bits"]
        st.bloom.n_bits = np.uint64(d["bloom_nbits"])
        st.bloom.n_hashes = d["bloom_k"]
        st.cuckoo = CuckooFilter.__new__(CuckooFilter)
        st.cuckoo.table = d["cuckoo_table"]
        st.cuckoo.n_buckets = d["cuckoo_table"].shape[0]
        st.cuckoo._mask = np.uint64(st.cuckoo.n_buckets - 1)
        st.cuckoo.count = d["cuckoo_count"]
        st.cuckoo._rng = np.random.RandomState()
        st.cuckoo._rng.set_state(d["cuckoo_rng"])
        st.exact = d["exact"]
        return st


def make_seen_shard_actor():
    """Actor class factory (deferred so importing this module never needs a
    live Ray session)."""
    import ray

    @ray.remote(num_cpus=0.1)
    class SeenShard:
        def __init__(self, shard_id: int, capacity: int, exact_confirm: bool):
            self.state = SeenShardState(capacity=capacity,
                                        exact_confirm=exact_confirm,
                                        shard_id=shard_id)

        def contains(self, hashes: np.ndarray, urls=None) -> np.ndarray:
            return self.state.contains(hashes, urls)

        def insert(self, hashes: np.ndarray, urls=None) -> int:
            return self.state.insert(hashes, urls)

        def check_and_insert(self, hashes: np.ndarray, urls=None) -> np.ndarray:
            return self.state.check_and_insert(hashes, urls)

        def size(self) -> int:
            return self.state.cuckoo.count

        def dump(self) -> bytes:
            return self.state.dump()

        def load(self, blob: bytes) -> None:
            self.state = SeenShardState.from_dump(blob)

    return SeenShard
