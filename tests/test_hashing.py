"""Unit tests for content-hashing primitives (MinHash/SimHash/shingles)."""

import numpy as np

from webcrawler_ray.functions.hashing import (
    hash_tokens,
    jaccard,
    minhash_perm_params,
    minhash_signature,
    shingle_hashes,
    simhash64,
)


class TestShingles:
    def test_deterministic(self):
        t = "the quick brown fox jumps over the lazy dog"
        assert np.array_equal(shingle_hashes(t), shingle_hashes(t))

    def test_count(self):
        t = "a b c d e"
        assert len(shingle_hashes(t, k=3)) == 3  # 3 distinct trigrams

    def test_short_and_empty(self):
        assert len(shingle_hashes("", 3)) == 0
        assert len(shingle_hashes("one two", 3)) == 1

    def test_order_sensitive(self):
        a = shingle_hashes("a b c d")
        b = shingle_hashes("d c b a")
        assert not np.array_equal(np.sort(a), np.sort(b))


class TestMinhash:
    def test_similar_docs_share_signature_entries(self):
        a, b = minhash_perm_params()
        base = "w1 w2 w3 w4 w5 w6 w7 w8 w9 w10 " * 10
        near = base + "extra token"
        far = "x1 x2 x3 x4 x5 x6 " * 20
        s_base = minhash_signature(shingle_hashes(base), a, b)
        s_near = minhash_signature(shingle_hashes(near), a, b)
        s_far = minhash_signature(shingle_hashes(far), a, b)
        agree_near = (s_base == s_near).mean()
        agree_far = (s_base == s_far).mean()
        assert agree_near > 0.7
        assert agree_far < 0.1

    def test_signature_estimates_jaccard(self):
        a, b = minhash_perm_params(256)
        x = shingle_hashes("a b c d e f g h i j k l m n o p " * 5)
        y = shingle_hashes("a b c d e f g h i j k l m n o p " * 5 + " q r s")
        est = (minhash_signature(x, a, b) == minhash_signature(y, a, b)).mean()
        true = jaccard(x, y)
        assert abs(est - true) < 0.15

    def test_chunking_invariant(self):
        # chunked kernel must equal the one-shot result
        from webcrawler_ray.functions import hashing

        a, b = minhash_perm_params(64)
        sh = np.unique(np.random.RandomState(5).randint(
            0, 2**63, 5000).astype(np.uint64))
        with np.errstate(over="ignore"):
            ref = (a[:, None] * sh[None, :] + b[:, None]).min(axis=1)
        assert np.array_equal(minhash_signature(sh, a, b), ref)

    def test_empty_sentinel(self):
        a, b = minhash_perm_params(8)
        sig = minhash_signature(np.zeros(0, dtype=np.uint64), a, b)
        assert (sig == np.iinfo(np.uint64).max).all()


class TestSimhash:
    def test_near_docs_low_hamming(self):
        base = " ".join(f"w{i}" for i in range(200))
        near = base + " extra"
        far = " ".join(f"z{i}" for i in range(200))
        h1, h2, h3 = simhash64(base), simhash64(near), simhash64(far)

        def ham(a, b):
            return bin(a ^ b).count("1")

        assert ham(h1, h2) <= 6
        assert ham(h1, h3) > 15

    def test_empty(self):
        assert simhash64("") == 0

    def test_deterministic(self):
        t = "some repeated words some repeated words"
        assert simhash64(t) == simhash64(t)


class TestJaccard:
    def test_identical(self):
        x = np.array([1, 2, 3], dtype=np.uint64)
        assert jaccard(x, x) == 1.0

    def test_disjoint(self):
        a = np.array([1, 2], dtype=np.uint64)
        b = np.array([3, 4], dtype=np.uint64)
        assert jaccard(a, b) == 0.0

    def test_both_empty(self):
        e = np.zeros(0, dtype=np.uint64)
        assert jaccard(e, e) == 1.0


class TestHashTokens:
    def test_stable(self):
        a = hash_tokens(["x", "y"])
        b = hash_tokens(["x", "y"])
        assert np.array_equal(a, b)
        assert a.dtype == np.uint64


class TestSimhashBatch:
    def test_matches_per_doc_on_both_routes(self):
        import webcrawler_ray.functions.hashing as H
        from webcrawler_ray.functions.hashing import (
            TokenHashCache,
            simhash64_from_token_hashes,
        )

        rng = np.random.RandomState(11)
        vocab = [f"w{i}" for i in range(200)]
        docs = [[vocab[j] for j in
                 rng.randint(0, 200, size=rng.randint(0, 80))]
                for _ in range(40)]
        docs[3] = []  # empty doc -> simhash 0
        c = TokenHashCache()
        codes, lengths, uh = c.encode_token_lists(docs)
        ref = np.array([simhash64_from_token_hashes(hash_tokens(d))
                        for d in docs], dtype=np.uint64)
        assert np.array_equal(H.simhash64_batch(codes, lengths, uh), ref)
        old = H._SIMHASH_DENSE_MAX
        try:
            H._SIMHASH_DENSE_MAX = 1  # force the gather route
            assert np.array_equal(H.simhash64_batch(codes, lengths, uh), ref)
        finally:
            H._SIMHASH_DENSE_MAX = old

    def test_all_empty(self):
        from webcrawler_ray.functions.hashing import (
            TokenHashCache,
            simhash64_batch,
        )

        c = TokenHashCache()
        codes, lengths, uh = c.encode_token_lists([[], []])
        assert np.array_equal(simhash64_batch(codes, lengths, uh),
                              np.zeros(2, dtype=np.uint64))


class TestTokenHashCache:
    def test_bit_identical_to_hash_tokens(self):
        from webcrawler_ray.functions.hashing import TokenHashCache

        rng = np.random.RandomState(7)
        vocab = [f"tok{i}" for i in range(50)]
        docs = [[vocab[j] for j in
                 rng.randint(0, 50, size=rng.randint(0, 40))]
                for _ in range(20)] + [[]]
        c = TokenHashCache()
        for _ in range(2):  # second pass = all cache hits, same values
            for toks, th in zip(docs, c.hash_token_lists(docs)):
                assert th.dtype == np.uint64
                assert np.array_equal(hash_tokens(toks), th)

    def test_full_cache_stops_admitting_but_stays_correct(self):
        from webcrawler_ray.functions.hashing import TokenHashCache

        c = TokenHashCache(max_entries=2)
        docs = [["a", "b", "c"], ["d", "e", "a"]]
        first = c.hash_token_lists(docs)
        n_cached = len(c._cache)
        again = c.hash_token_lists(docs)
        assert len(c._cache) == n_cached  # no growth past the bound
        for toks, th, th2 in zip(docs, first, again):
            assert np.array_equal(hash_tokens(toks), th)
            assert np.array_equal(th, th2)


class TestSimhashInt64Encoding:
    def test_centered_encoding_preserves_bit63_hamming(self):
        # the dedup pipeline stores simhash as centered int64
        # (sh - 2**63) and decodes by int64 -> uint64 cast; the cast
        # flips bit 63 of every value CONSISTENTLY, so xor-hamming must
        # equal the true hamming — including bit-63 differences (the old
        # `% 2**63` encoding zeroed that bit)
        import numpy as np

        rng = np.random.default_rng(3)
        raw = rng.integers(0, 1 << 63, size=64, dtype=np.uint64) * 2 \
            + rng.integers(0, 2, size=64, dtype=np.uint64)
        # force some pairs that differ ONLY in bit 63
        raw[1] = raw[0] ^ np.uint64(1 << 63)
        enc = np.array([int(v) - (1 << 63) for v in raw], dtype=np.int64)
        dec = enc.astype(np.uint64)
        for i in range(0, len(raw), 2):
            a, b = raw[i], raw[i + 1]
            true_ham = bin(int(a) ^ int(b)).count("1")
            x = int(dec[i]) ^ int(dec[i + 1])
            assert bin(x).count("1") == true_ham
        # the pair differing only in bit 63 has hamming exactly 1
        assert bin(int(dec[0]) ^ int(dec[1])).count("1") == 1
