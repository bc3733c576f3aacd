"""Count-min sketch — mergeable approximate frequency state.

Answers VerdictDB-class frequency / heavy-hitter queries
(``SELECT c, COUNT(*) FROM t GROUP BY c ORDER BY 2 DESC LIMIT k``)
without an exact group-by over a high-cardinality key.

Guarantee: for any item, estimate >= true count, and
estimate <= true count + eps * N with probability >= 1 - delta,
where w = ceil(e / eps) columns and d = ceil(ln(1/delta)) rows.

Merge = elementwise + (bit-exact associative + commutative).
Counts are int64; row hashes derive from the single JVM-side
xxhash64 via multiply-shift (seeded, identical everywhere).
"""

from __future__ import annotations

import struct
from dataclasses import dataclass

import numpy as np

from ..hashing import mod_index_family
from .state import check_header, pack_header

_CMS_SEED = 0xC0FFEE


@dataclass(frozen=True)
class CmsSketch:
    eps: float = 1.0 / (1 << 14)
    delta: float = 0.01

    @property
    def w(self) -> int:
        return int(np.ceil(np.e / self.eps))

    @property
    def d(self) -> int:
        return int(np.ceil(np.log(1.0 / self.delta)))

    def _row_indices(self, hashes: np.ndarray) -> np.ndarray:
        """(d, n) column indices per row hash — multiply-shift family
        (shared definition: ``hashing.mod_index_family``)."""
        return mod_index_family(hashes, self.d, self.w, _CMS_SEED)

    # -- state lifecycle ----------------------------------------------------
    def empty(self) -> np.ndarray:
        return np.zeros((self.d, self.w), dtype=np.int64)

    def build(self, hashes: np.ndarray, weights: np.ndarray | None = None) -> np.ndarray:
        state = self.empty()
        self.update(state, hashes, weights)
        return state

    def update(self, state: np.ndarray, hashes: np.ndarray, weights: np.ndarray | None = None) -> None:
        if hashes.size == 0:
            return
        idx = self._row_indices(hashes)
        for i in range(self.d):
            if weights is None:
                np.add.at(state[i], idx[i], 1)
            else:
                np.add.at(state[i], idx[i], weights.astype(np.int64, copy=False))

    def merge(self, s1: np.ndarray, s2: np.ndarray) -> np.ndarray:
        return s1 + s2

    def merge_many(self, states: list) -> np.ndarray:
        return np.sum(states, axis=0)

    # -- queries --------------------------------------------------------------
    def query(self, state: np.ndarray, hashes: np.ndarray) -> np.ndarray:
        """Point-estimate counts for a batch of item hashes (vectorized)."""
        idx = self._row_indices(hashes)
        ests = np.stack([state[i][idx[i]] for i in range(self.d)])
        return ests.min(axis=0)

    def total(self, state: np.ndarray) -> int:
        return int(state[0].sum())

    # -- serialization --------------------------------------------------------
    def to_bytes(self, state: np.ndarray) -> bytes:
        hdr = pack_header("cms") + struct.pack("<dd", self.eps, self.delta)
        return hdr + state.tobytes()

    def from_bytes(self, data: bytes) -> np.ndarray:
        body = check_header("cms", data)
        eps, delta = struct.unpack("<dd", body[:16])
        if abs(eps - self.eps) > 1e-12 or abs(delta - self.delta) > 1e-12:
            raise ValueError(f"CMS param mismatch: state=({eps},{delta}) sketch=({self.eps},{self.delta})")
        return np.frombuffer(body[16:], dtype=np.int64).reshape(self.d, self.w).copy()

    def estimate(self, state: np.ndarray) -> int:
        return self.total(state)

    def error_bound(self) -> tuple[float, float]:
        """(eps, delta): additive error eps*N with probability 1-delta."""
        return (self.eps, self.delta)
