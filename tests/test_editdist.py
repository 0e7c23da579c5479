"""Myers bit-parallel Levenshtein vs the classic DP — exact equality on
random, adversarial, and boundary inputs (no Ray needed)."""

import random

from hypothesis import given, settings
from hypothesis import strategies as st

from webcrawler_ray.functions.editdist import dp_distance, myers_distance


class TestKnown:
    def test_textbook_cases(self):
        assert myers_distance("kitten", "sitting") == 3
        assert myers_distance("flaw", "lawn") == 2
        assert myers_distance("", "") == 0
        assert myers_distance("", "abc") == 3
        assert myers_distance("abc", "") == 3
        assert myers_distance("same", "same") == 0
        assert myers_distance("a", "b") == 1

    def test_order_symmetric(self):
        assert myers_distance("short", "a much longer string") == \
            myers_distance("a much longer string", "short")

    def test_long_pattern_over_word_size(self):
        # > 64 chars exercises the unbounded-int bit vector
        a = "x" * 100
        b = "x" * 60 + "y" * 40
        assert myers_distance(a, b) == dp_distance(a, b) == 40


class TestPropertyVsDP:
    @settings(max_examples=200, deadline=None)
    @given(st.text(alphabet="abcde", max_size=40),
           st.text(alphabet="abcde", max_size=40))
    def test_small_alphabet(self, a, b):
        assert myers_distance(a, b) == dp_distance(a, b)

    @settings(max_examples=50, deadline=None)
    @given(st.text(max_size=80), st.text(max_size=80))
    def test_arbitrary_unicode(self, a, b):
        assert myers_distance(a, b) == dp_distance(a, b)

    def test_near_duplicates_like_the_corpus(self):
        rng = random.Random(7)
        words = ["alpha", "beta", "gamma", "delta", "epsilon"]
        base = " ".join(rng.choice(words) for _ in range(60))
        for _ in range(20):
            chars = list(base)
            for _ in range(rng.randrange(0, 25)):
                op = rng.randrange(3)
                pos = rng.randrange(len(chars))
                if op == 0:
                    chars[pos] = rng.choice("xyz")
                elif op == 1:
                    del chars[pos]
                else:
                    chars.insert(pos, rng.choice("xyz"))
            other = "".join(chars)
            assert myers_distance(base, other) == dp_distance(base, other)
