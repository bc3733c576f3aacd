"""Bloom filter — mergeable approximate membership state.

The sketch analogue of the reference's semi-join pushdown use case:
build a filter over the distinct keys of one table and pre-filter the
probe side before an expensive shuffle join (at 100 TB, shipping a
few-MB filter to every task beats shuffling the probe table).

Guarantees: zero false negatives; false-positive rate <= configured
``fpr`` while inserted distinct items <= ``capacity``.
Merge = bitwise OR (bit-exact associative + commutative).
"""

from __future__ import annotations

import struct
from dataclasses import dataclass

import numpy as np

from ..hashing import mod_index_family
from .state import check_header, pack_header

_BLOOM_SEED = 0xB100F


@dataclass(frozen=True)
class BloomSketch:
    capacity: int = 1_000_000
    fpr: float = 0.01

    @property
    def m_bits(self) -> int:
        ln2 = np.log(2.0)
        m = int(np.ceil(-self.capacity * np.log(self.fpr) / (ln2 * ln2)))
        return ((m + 63) // 64) * 64  # round up to whole words

    @property
    def k(self) -> int:
        return max(1, int(round(self.m_bits / self.capacity * np.log(2.0))))

    def _bit_indices(self, hashes: np.ndarray) -> np.ndarray:
        return mod_index_family(hashes, self.k, self.m_bits, _BLOOM_SEED)

    # -- state lifecycle ----------------------------------------------------
    def empty(self) -> np.ndarray:
        return np.zeros(self.m_bits // 8, dtype=np.uint8)

    def build(self, hashes: np.ndarray) -> np.ndarray:
        state = self.empty()
        self.update(state, hashes)
        return state

    def update(self, state: np.ndarray, hashes: np.ndarray) -> None:
        if hashes.size == 0:
            return
        idx = self._bit_indices(hashes).ravel()
        np.bitwise_or.at(state, idx >> 3, (1 << (idx & 7)).astype(np.uint8))

    def merge(self, s1: np.ndarray, s2: np.ndarray) -> np.ndarray:
        return np.bitwise_or(s1, s2)

    def merge_many(self, states: list) -> np.ndarray:
        return np.bitwise_or.reduce(states)

    # -- queries ------------------------------------------------------------
    def contains(self, state: np.ndarray, hashes: np.ndarray) -> np.ndarray:
        """Vectorized membership test for a batch of hashes -> bool array."""
        if hashes.size == 0:
            return np.zeros(0, dtype=bool)
        idx = self._bit_indices(hashes)
        ok = np.ones(hashes.shape[0], dtype=bool)
        for i in range(self.k):
            bits = (state[idx[i] >> 3] >> (idx[i] & 7).astype(np.uint8)) & 1
            ok &= bits.astype(bool)
        return ok

    def fill_ratio(self, state: np.ndarray) -> float:
        return float(np.unpackbits(state).mean())

    # -- serialization --------------------------------------------------------
    def to_bytes(self, state: np.ndarray) -> bytes:
        hdr = pack_header("blm") + struct.pack("<qd", self.capacity, self.fpr)
        return hdr + state.tobytes()

    def from_bytes(self, data: bytes) -> np.ndarray:
        body = check_header("blm", data)
        cap, fpr = struct.unpack("<qd", body[:16])
        if cap != self.capacity or abs(fpr - self.fpr) > 1e-12:
            raise ValueError(f"Bloom param mismatch: state=({cap},{fpr}) sketch=({self.capacity},{self.fpr})")
        return np.frombuffer(body[16:], dtype=np.uint8).copy()

    def estimate(self, state: np.ndarray) -> float:
        """Approximate inserted-distinct count from fill ratio."""
        x = self.fill_ratio(state)
        if x >= 1.0:
            return float("inf")
        return -self.m_bits / self.k * np.log(1.0 - x)

    def error_bound(self) -> float:
        return self.fpr
