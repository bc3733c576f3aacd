"""Pure-numpy sketch tests: bounds, merge associativity, serialization.

Fast (no Spark) — the statistical contracts from BASELINE.md:
CMS eps*N @ 1-delta, KLL/t-digest rank error, Bloom zero-FN + FPR.
"""

from __future__ import annotations

import functools

import numpy as np
import pytest

from verdictdb_spark.sketches.cms import CmsSketch
from verdictdb_spark.sketches.kll import KllSketch
from verdictdb_spark.sketches.tdigest import TDigestSketch
from verdictdb_spark.sketches.bloom import BloomSketch


def _hashes(n, seed=0):
    return np.random.default_rng(seed).integers(-(2**63), 2**63, size=n, dtype=np.int64)


# ---------------------------------------------------------------- CMS
class TestCms:
    def test_point_estimates_with_bound(self):
        sk = CmsSketch(eps=1.0 / (1 << 14), delta=0.01)
        rng = np.random.default_rng(3)
        # zipf-ish frequencies over 5000 items
        items = _hashes(5000, seed=1)
        freqs = np.maximum((20000 / np.arange(1, 5001) ** 1.2).astype(np.int64), 1)
        stream = np.repeat(items, freqs)
        rng.shuffle(stream)
        st = sk.build(stream)
        est = sk.query(st, items)
        n = stream.size
        # never underestimates
        assert (est >= freqs).all()
        # eps*N overestimate bound, allow the delta failure fraction
        over = est - freqs
        assert (over <= sk.eps * n).mean() >= 1 - sk.delta

    def test_merge_associative_bitexact(self):
        sk = CmsSketch(eps=1.0 / (1 << 10), delta=0.05)
        chunks = [_hashes(2000, seed=s) for s in range(6)]
        states = [sk.build(c) for c in chunks]
        a = functools.reduce(sk.merge, states)
        b = functools.reduce(sk.merge, states[::-1])
        whole = sk.build(np.concatenate(chunks))
        assert np.array_equal(a, b) and np.array_equal(a, whole)

    def test_roundtrip_and_param_check(self):
        sk = CmsSketch(eps=1.0 / (1 << 10), delta=0.05)
        st = sk.build(_hashes(100))
        assert np.array_equal(sk.from_bytes(sk.to_bytes(st)), st)
        with pytest.raises(ValueError):
            CmsSketch(eps=1.0 / (1 << 11), delta=0.05).from_bytes(sk.to_bytes(st))

    def test_weighted_update(self):
        sk = CmsSketch(eps=1.0 / (1 << 10), delta=0.05)
        h = _hashes(10, seed=2)
        st = sk.empty()
        sk.update(st, h, weights=np.full(10, 7))
        assert (sk.query(st, h) >= 7).all()


# ---------------------------------------------------------------- KLL
class TestKll:
    def test_rank_error_bound(self):
        sk = KllSketch(k=256)
        rng = np.random.default_rng(11)
        vals = rng.lognormal(0, 2, size=200_000)
        st = sk.build(vals)
        qs = [0.01, 0.1, 0.25, 0.5, 0.75, 0.9, 0.99]
        est = sk.quantiles(st, qs)
        svals = np.sort(vals)
        for q, e in zip(qs, est):
            true_rank = np.searchsorted(svals, e) / len(svals)
            assert abs(true_rank - q) <= 2 * sk.error_bound(), (q, true_rank)

    def test_merge_order_bound_equivalence(self):
        sk = KllSketch(k=256)
        rng = np.random.default_rng(5)
        chunks = [rng.normal(0, 1, size=30_000) for _ in range(8)]
        states = [sk.build(c) for c in chunks]
        orders = [states, states[::-1], states[3:] + states[:3]]
        svals = np.sort(np.concatenate(chunks))
        for ss in orders:
            st = functools.reduce(sk.merge, ss)
            for q in (0.1, 0.5, 0.9):
                e = sk.quantiles(st, [q])[0]
                true_rank = np.searchsorted(svals, e) / len(svals)
                assert abs(true_rank - q) <= 3 * sk.error_bound()

    def test_roundtrip(self):
        sk = KllSketch(k=128)
        st = sk.build(np.arange(10_000, dtype=np.float64))
        rt = sk.from_bytes(sk.to_bytes(st))
        assert rt["n"] == st["n"]
        assert all(np.array_equal(a, b) for a, b in zip(rt["levels"], st["levels"]))

    def test_state_stays_small(self):
        sk = KllSketch(k=256)
        st = sk.build(np.random.default_rng(0).normal(size=500_000))
        total_items = sum(l.size for l in st["levels"])
        assert total_items < 30 * sk.k  # sublinear summary


# ---------------------------------------------------------------- t-digest
class TestTDigest:
    def test_rank_error_tails(self):
        sk = TDigestSketch(compression=200)
        rng = np.random.default_rng(9)
        vals = rng.exponential(5.0, size=200_000)
        st = sk.build(vals)
        svals = np.sort(vals)
        for q in (0.001, 0.01, 0.5, 0.99, 0.999):
            e = sk.quantiles(st, [q])[0]
            true_rank = np.searchsorted(svals, e) / len(svals)
            tol = max(4 * q * (1 - q) / sk.compression, 5e-4)
            assert abs(true_rank - q) <= tol, (q, true_rank)

    def test_centroid_count_bounded(self):
        sk = TDigestSketch(compression=100)
        st = sk.build(np.random.default_rng(0).normal(size=300_000))
        assert st["mean"].size <= 2 * sk.compression + 2

    def test_merge_order_bound_equivalence(self):
        sk = TDigestSketch(compression=200)
        rng = np.random.default_rng(5)
        chunks = [rng.gamma(2, 3, size=25_000) for _ in range(6)]
        states = [sk.build(c) for c in chunks]
        svals = np.sort(np.concatenate(chunks))
        for ss in (states, states[::-1]):
            st = functools.reduce(sk.merge, ss)
            for q in (0.05, 0.5, 0.95):
                e = sk.quantiles(st, [q])[0]
                true_rank = np.searchsorted(svals, e) / len(svals)
                assert abs(true_rank - q) <= 6 * q * (1 - q) / sk.compression + 1e-3

    def test_roundtrip(self):
        sk = TDigestSketch()
        st = sk.build(np.random.default_rng(1).normal(size=10_000))
        rt = sk.from_bytes(sk.to_bytes(st))
        assert np.array_equal(rt["mean"], st["mean"]) and np.array_equal(rt["weight"], st["weight"])


# ---------------------------------------------------------------- Bloom
class TestBloom:
    def test_no_false_negatives_and_fpr(self):
        sk = BloomSketch(capacity=50_000, fpr=0.01)
        inserted = _hashes(50_000, seed=1)
        st = sk.build(inserted)
        assert sk.contains(st, inserted).all()  # zero false negatives
        other = _hashes(100_000, seed=2)
        fpr = sk.contains(st, other).mean()
        assert fpr <= 2.5 * sk.fpr, fpr

    def test_merge_is_or(self):
        sk = BloomSketch(capacity=10_000, fpr=0.01)
        a, b = _hashes(3000, 1), _hashes(3000, 2)
        merged = sk.merge(sk.build(a), sk.build(b))
        assert np.array_equal(merged, sk.build(np.concatenate([a, b])))
        assert sk.contains(merged, a).all() and sk.contains(merged, b).all()

    def test_estimate_distinct_from_fill(self):
        sk = BloomSketch(capacity=100_000, fpr=0.01)
        st = sk.build(_hashes(60_000, seed=3))
        assert abs(sk.estimate(st) - 60_000) / 60_000 < 0.05

    def test_roundtrip(self):
        sk = BloomSketch(capacity=1000, fpr=0.05)
        st = sk.build(_hashes(500))
        assert np.array_equal(sk.from_bytes(sk.to_bytes(st)), st)
