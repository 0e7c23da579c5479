"""Unit tests for the bloom/cuckoo/exact seen-set (ST1)."""

import numpy as np
import pytest

from webcrawler_ray.functions.urls import stable_hash64_batch
from webcrawler_ray.state.seen import BloomFilter, CuckooFilter, SeenShardState


def H(*strs):
    return stable_hash64_batch(list(strs))


class TestBloom:
    def test_no_false_negatives(self):
        b = BloomFilter(n_bits=1 << 16)
        keys = np.random.RandomState(0).randint(0, 2**63, 1000).astype(np.uint64)
        b.add(keys)
        assert b.might_contain(keys).all()

    def test_mostly_negative_for_absent(self):
        b = BloomFilter(n_bits=1 << 16)
        rng = np.random.RandomState(0)
        b.add(rng.randint(0, 2**63, 500).astype(np.uint64))
        absent = rng.randint(0, 2**63, 2000).astype(np.uint64)
        fp = b.might_contain(absent).mean()
        assert fp < 0.1


class TestCuckoo:
    def test_insert_contains(self):
        c = CuckooFilter(capacity=1 << 12)
        keys = np.random.RandomState(1).randint(0, 2**63, 2000).astype(np.uint64)
        c.insert(keys)
        assert c.contains(keys).all()  # no false negatives

    def test_absent_mostly_negative(self):
        c = CuckooFilter(capacity=1 << 12)
        rng = np.random.RandomState(1)
        c.insert(rng.randint(0, 2**63, 1000).astype(np.uint64))
        absent = rng.randint(0, 2**63, 5000).astype(np.uint64)
        assert c.contains(absent).mean() < 0.01

    def test_over_capacity_raises(self):
        c = CuckooFilter(capacity=1 << 6)
        keys = np.arange(10_000, dtype=np.uint64) * np.uint64(2654435761)
        with pytest.raises(RuntimeError):
            c.insert(keys)

    def test_empty_query(self):
        c = CuckooFilter(capacity=64)
        assert c.contains(np.array([], dtype=np.uint64)).tolist() == []


class TestSeenShard:
    def test_check_and_insert_semantics(self):
        s = SeenShardState(capacity=1 << 10, exact_confirm=True)
        urls = [f"https://h.test/p{i}" for i in range(100)]
        h = stable_hash64_batch(urls)
        new = s.check_and_insert(h, urls)
        assert new.all()
        again = s.check_and_insert(h, urls)
        assert not again.any()

    def test_contains_without_insert(self):
        s = SeenShardState(capacity=1 << 10)
        urls = ["https://a.test/1", "https://a.test/2"]
        h = stable_hash64_batch(urls)
        assert not s.contains(h, urls).any()
        s.insert(h[:1], urls[:1])
        got = s.contains(h, urls)
        assert got.tolist() == [True, False]

    def test_exact_confirm_kills_false_positive(self):
        # force a cuckoo FP by inserting a key with the same fingerprint+bucket
        s = SeenShardState(capacity=1 << 10, exact_confirm=True)
        u1 = ["https://x.test/a"]
        h1 = stable_hash64_batch(u1)
        s.insert(h1, u1)
        # same hash (guaranteed cuckoo positive), different url string
        assert s.contains(h1, ["https://x.test/DIFFERENT"]).tolist() == [False]

    def test_dump_load_roundtrip(self):
        s = SeenShardState(capacity=1 << 10, exact_confirm=True, shard_id=3)
        urls = [f"https://h.test/p{i}" for i in range(50)]
        h = stable_hash64_batch(urls)
        s.insert(h, urls)
        s2 = SeenShardState.from_dump(s.dump())
        assert s2.contains(h, urls).all()
        assert s2.shard_id == 3
        more = ["https://h.test/new"]
        hm = stable_hash64_batch(more)
        assert not s2.contains(hm, more).any()
        s2.insert(hm, more)
        assert s2.contains(hm, more).all()

    def test_no_exact_mode(self):
        s = SeenShardState(capacity=1 << 10, exact_confirm=False)
        urls = [f"https://h.test/{i}" for i in range(10)]
        h = stable_hash64_batch(urls)
        s.insert(h)
        assert s.contains(h).all()
