"""HyperLogLog (++-style) — mergeable approximate-distinct-count state.

Rebuilds the reference's count-distinct path: VerdictDB answers
``COUNT(DISTINCT c)`` either by hash-universe sampling + 1/p scaling
(``coordinator/SelectQueryCoordinator.java:189-238``) or by dialect
``approx_count_distinct`` passthrough
(``sqlsyntax/SparkSyntax.getApproximateCountDistinct:132-134``).
Here the sketch itself is the product: a dense 2^p register array,
built fully vectorized from pre-computed 64-bit hashes (hashing is
JVM-side ``xxhash64``; this module never touches strings).

Estimator: standard HLL (alpha_m * m^2 / sum(2^-M)) with
linear-counting small-range correction — the HLL++ empirical-bias
refinement without the sparse representation (dense arrays merge
trivially and 2^12 bytes/group is cheap).

Error guarantee: relative standard error ~ 1.04 / sqrt(2^p)
(p=12 -> ~1.625%), asserted in tests with a safety multiplier.

Merge = elementwise max — bit-exact associative + commutative.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from ..hashing import clz64
from .state import check_header, pack_header


def _alpha(m: int) -> float:
    if m == 16:
        return 0.673
    if m == 32:
        return 0.697
    if m == 64:
        return 0.709
    return 0.7213 / (1.0 + 1.079 / m)


@dataclass(frozen=True)
class HllSketch:
    """Factory for HLL states with precision ``p`` (m = 2^p registers)."""

    p: int = 12

    @property
    def m(self) -> int:
        return 1 << self.p

    # -- state lifecycle ----------------------------------------------------
    def empty(self) -> np.ndarray:
        return np.zeros(self.m, dtype=np.uint8)

    def build(self, hashes: np.ndarray) -> np.ndarray:
        """Vectorized register update from a batch of 64-bit hashes.

        Top p bits -> register index; leading-zero count of the
        remaining (64-p) bits + 1 -> rank.  ``np.maximum.at`` does the
        scatter-max; no Python loop over rows.
        """
        state = self.empty()
        self.update(state, hashes)
        return state

    def update(self, state: np.ndarray, hashes: np.ndarray) -> None:
        if hashes.size == 0:
            return
        h = hashes.astype(np.uint64, copy=False)
        idx = (h >> np.uint64(64 - self.p)).astype(np.int64)
        w = h << np.uint64(self.p)  # remaining bits, left-aligned
        rho = np.minimum(clz64(w) + 1, 64 - self.p + 1).astype(np.uint8)
        np.maximum.at(state, idx, rho)

    def merge(self, s1: np.ndarray, s2: np.ndarray) -> np.ndarray:
        return np.maximum(s1, s2)

    # -- serialization ------------------------------------------------------
    def to_bytes(self, state: np.ndarray) -> bytes:
        return pack_header("hll") + np.uint8(self.p).tobytes() + state.tobytes()

    def from_bytes(self, data: bytes) -> np.ndarray:
        body = check_header("hll", data)
        p = int(np.frombuffer(body[:1], dtype=np.uint8)[0])
        if p != self.p:
            raise ValueError(f"precision mismatch: state p={p}, sketch p={self.p}")
        return np.frombuffer(body[1:], dtype=np.uint8).copy()

    # -- estimation ---------------------------------------------------------
    def estimate(self, state: np.ndarray) -> float:
        m = float(self.m)
        regs = state.astype(np.float64)
        raw = _alpha(self.m) * m * m / np.sum(np.exp2(-regs))
        zeros = float(np.count_nonzero(state == 0))
        if raw <= 2.5 * m and zeros > 0:
            return m * np.log(m / zeros)  # linear counting
        return raw

    def estimate_many(self, states: np.ndarray) -> np.ndarray:
        """Vectorized estimate over a (n_groups, m) register matrix."""
        m = float(self.m)
        raw = _alpha(self.m) * m * m / np.sum(np.exp2(-states.astype(np.float64)), axis=1)
        zeros = np.count_nonzero(states == 0, axis=1).astype(np.float64)
        lc = np.where(zeros > 0, m * np.log(np.maximum(m / np.maximum(zeros, 1e-12), 1.0)), raw)
        return np.where((raw <= 2.5 * m) & (zeros > 0), lc, raw)

    def error_bound(self) -> float:
        """Relative standard error: 1.04/sqrt(m)."""
        return 1.04 / np.sqrt(self.m)
