"""Property-based tests (hypothesis): the sketch/sampling invariants
must hold for ARBITRARY inputs, not just the fixtures — mirroring the
reference's accuracy-guarantee test strategy (SURVEY §5) with
generative coverage.

Pure-numpy layer only (no SparkSession): fast, wide input space.
"""

from __future__ import annotations

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from verdictdb_spark.sampling.scramble import _pack_tier_cdfs
from verdictdb_spark.sketches.bloom import BloomSketch
from verdictdb_spark.sketches.cms import CmsSketch
from verdictdb_spark.sketches.hll import HllSketch
from verdictdb_spark.sketches.kll import KllSketch


def _hashes(values: list[int]) -> np.ndarray:
    # 64-bit avalanche so hypothesis's small ints exercise full hash space
    v = np.asarray(values, dtype=np.uint64)
    with np.errstate(over="ignore"):
        v = (v ^ (v >> np.uint64(33))) * np.uint64(0xFF51AFD7ED558CCD)
        v = (v ^ (v >> np.uint64(33))) * np.uint64(0xC4CEB9FE1A85EC53)
        return v ^ (v >> np.uint64(33))


ints = st.lists(st.integers(min_value=0, max_value=2**62), min_size=1, max_size=400)


@given(ints, st.integers(2, 6))
@settings(max_examples=60, deadline=None)
def test_hll_merge_associative_any_split(values, nsplits):
    """merge(merge(a,b),c) == merge(a,merge(b,c)) bit-exactly for ANY
    partitioning of ANY input."""
    sk = HllSketch(p=8)
    h = _hashes(values)
    parts = np.array_split(h, nsplits)
    states = [sk.build(p) for p in parts]
    left = states[0]
    for s in states[1:]:
        left = sk.merge(left, s)
    right = states[-1]
    for s in reversed(states[:-1]):
        right = sk.merge(s, right)
    assert np.array_equal(left, right)
    assert np.array_equal(left, sk.build(h))  # == single-pass build


@given(ints)
@settings(max_examples=60, deadline=None)
def test_hll_estimate_within_bound_generative(values):
    sk = HllSketch(p=12)
    h = _hashes(values)
    true = len(np.unique(h))
    est = sk.estimate(sk.build(h))
    # 5 sigma of the published 1.04/sqrt(m) relative error (+small-n slack)
    assert abs(est - true) <= max(5 * 1.04 / np.sqrt(2**12) * true, 3)


@given(ints, st.integers(2, 5))
@settings(max_examples=40, deadline=None)
def test_cms_one_sided_and_merge_additive(values, nsplits):
    """CMS never undercounts; merging split builds == whole build."""
    sk = CmsSketch(eps=0.01, delta=0.01)
    h = _hashes(values)
    whole = sk.build(h)
    parts = [sk.build(p) for p in np.array_split(h, nsplits) if len(p)]
    merged = parts[0]
    for p in parts[1:]:
        merged = sk.merge(merged, p)
    assert np.array_equal(merged, whole)
    uniq, cnt = np.unique(h, return_counts=True)
    est = sk.query(whole, uniq)
    assert (est >= cnt).all()  # one-sided overestimate
    assert (est <= cnt + 0.01 * len(h)).all()  # eps*N bound (w.h.p.)


@given(
    st.lists(st.floats(min_value=-1e9, max_value=1e9, allow_nan=False), min_size=5, max_size=500),
    st.sampled_from([0.1, 0.5, 0.9]),
)
@settings(max_examples=40, deadline=None)
def test_kll_rank_error_generative(values, q):
    sk = KllSketch(k=256)
    x = np.asarray(values, dtype=np.float64)
    state = sk.build(x)
    est = sk.quantiles(state, [q])[0]
    xs = np.sort(x)
    # the sketch interpolates (midpoint convention), so the rank-error
    # statement is: est lies between the order statistics at rank
    # q*n -+ eps*n (KLL eps ~3.3/k, 3x slack; +-1 for the midpoint step)
    target = q * len(xs)
    eps_n = max(3.3 / 256 * len(xs) * 3, 1.0)
    lo_idx = int(np.clip(np.floor(target - eps_n), 0, len(xs) - 1))
    hi_idx = int(np.clip(np.ceil(target + eps_n), 0, len(xs) - 1))
    assert xs[lo_idx] <= est <= xs[hi_idx], (est, xs[lo_idx], xs[hi_idx])


@given(ints)
@settings(max_examples=40, deadline=None)
def test_bloom_zero_false_negatives_generative(values):
    sk = BloomSketch(capacity=max(len(values), 16), fpr=0.01)
    h = _hashes(values)
    state = sk.build(h)
    assert sk.contains(state, h).all()


@given(
    st.integers(0, 10**6),
    st.integers(0, 10**6),
    st.integers(0, 10**6),
    st.integers(2, 50),
)
@settings(max_examples=100, deadline=None)
def test_fastconverge_packing_properties(n0, n1, n2, nblocks):
    """For ANY tier sizes: CDFs are monotone, end at 1, and honor the
    50%/80% per-block caps whenever the caps are globally satisfiable."""
    if n0 + n1 + n2 == 0:
        return
    cdfs = _pack_tier_cdfs(n0, n1, n2, nblocks)
    total = n0 + n1 + n2
    B = total / nblocks
    for t in (0, 1, 2):
        c = np.asarray(cdfs[t])
        assert len(c) == nblocks
        assert (np.diff(c) >= -1e-12).all()
        assert abs(c[-1] - 1.0) < 1e-9
    a0 = np.diff(np.concatenate([[0.0], cdfs[0]])) * n0
    a1 = np.diff(np.concatenate([[0.0], cdfs[1]])) * n1
    if n0 <= 0.5 * total:
        assert (a0 <= 0.5 * B + 1e-6 * total + 1e-9).all()
    if n0 + n1 <= 0.8 * total:
        assert (a0 + a1 <= 0.8 * B + 1e-6 * total + 1e-9).all()
