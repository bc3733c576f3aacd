"""KLL quantile sketch — mergeable approximate-quantile state.

Re-expresses the reference's "percentile" future-work aggregate
(docs "Future supported": var/stddev/percentile) as a first-class
mergeable state, per the north_star's KLL requirement.

Structure: levels of value buffers; level i items carry weight 2^i.
A full level is sorted and every other item (deterministic offset)
is promoted to level i+1.  Capacities decay geometrically (c=2/3)
below the top level.

Guarantee: normalized rank error ~ a/k with constant a ~ 3.3 at
high probability (Apache DataSketches reports 1.65% for k=200);
tests assert the bound empirically with a safety margin.

Merge: concatenate level-wise then re-compact — associative up to
rank-error equivalence (NOT bit-exact; tests assert estimates agree
within bound across merge orders).
"""

from __future__ import annotations

import struct
from dataclasses import dataclass

import numpy as np

from .state import check_header, pack_header


@dataclass(frozen=True)
class KllSketch:
    k: int = 256
    c: float = 2.0 / 3.0

    # -- state: {"n": int, "levels": list[np.ndarray(float64)]} -------------
    def empty(self) -> dict:
        return {"n": 0, "levels": [np.empty(0, dtype=np.float64)]}

    def _cap(self, level: int, num_levels: int) -> int:
        depth = num_levels - 1 - level
        return max(int(np.ceil(self.k * (self.c**depth))), 8)

    def _compress(self, state: dict) -> None:
        levels = state["levels"]
        i = 0
        while i < len(levels):
            cap = self._cap(i, len(levels))
            if levels[i].size > cap:
                buf = np.sort(levels[i])
                # deterministic offset from state content (reproducible runs)
                offset = (state["n"] + i + buf.size) & 1
                promoted = buf[offset::2]
                levels[i] = np.empty(0, dtype=np.float64)
                if i + 1 == len(levels):
                    levels.append(np.empty(0, dtype=np.float64))
                levels[i + 1] = np.concatenate([levels[i + 1], promoted])
            i += 1

    def build(self, values: np.ndarray) -> dict:
        state = self.empty()
        self.update(state, values)
        return state

    def update(self, state: dict, values: np.ndarray) -> None:
        v = np.asarray(values, dtype=np.float64)
        v = v[~np.isnan(v)]
        if v.size == 0:
            return
        # insert in level-0-capacity chunks so intermediate buffers stay small
        chunk = max(self.k * 4, 1024)
        for s in range(0, v.size, chunk):
            state["levels"][0] = np.concatenate([state["levels"][0], v[s : s + chunk]])
            state["n"] += min(chunk, v.size - s)
            self._compress(state)

    def merge(self, s1: dict, s2: dict) -> dict:
        n_levels = max(len(s1["levels"]), len(s2["levels"]))
        levels = []
        for i in range(n_levels):
            a = s1["levels"][i] if i < len(s1["levels"]) else np.empty(0)
            b = s2["levels"][i] if i < len(s2["levels"]) else np.empty(0)
            levels.append(np.concatenate([a, b]).astype(np.float64))
        out = {"n": s1["n"] + s2["n"], "levels": levels}
        self._compress(out)
        return out

    # -- queries --------------------------------------------------------------
    def _items(self, state: dict) -> tuple[np.ndarray, np.ndarray]:
        vals, wts = [], []
        for i, lvl in enumerate(state["levels"]):
            if lvl.size:
                vals.append(lvl)
                wts.append(np.full(lvl.size, float(1 << i)))
        if not vals:
            return np.empty(0), np.empty(0)
        v = np.concatenate(vals)
        w = np.concatenate(wts)
        order = np.argsort(v, kind="stable")
        return v[order], w[order]

    def quantiles(self, state: dict, qs) -> np.ndarray:
        v, w = self._items(state)
        if v.size == 0:
            return np.full(len(qs), np.nan)
        cum = np.cumsum(w) - 0.5 * w
        total = w.sum()
        return np.interp(np.asarray(qs, dtype=np.float64) * total, cum, v)

    def rank(self, state: dict, value: float) -> float:
        v, w = self._items(state)
        if v.size == 0:
            return float("nan")
        return float(w[v <= value].sum() / w.sum())

    def estimate(self, state: dict) -> float:
        return self.quantiles(state, [0.5])[0]

    # -- serialization --------------------------------------------------------
    def to_bytes(self, state: dict) -> bytes:
        lens = [lvl.size for lvl in state["levels"]]
        hdr = pack_header("kll") + struct.pack(
            f"<qhq{len(lens)}q", self.k, len(lens), state["n"], *lens
        )
        return hdr + b"".join(lvl.tobytes() for lvl in state["levels"])

    def from_bytes(self, data: bytes) -> dict:
        body = check_header("kll", data)
        k, nl = struct.unpack("<qh", body[:10])
        if k != self.k:
            raise ValueError(f"KLL k mismatch: state k={k}, sketch k={self.k}")
        n, *lens = struct.unpack(f"<q{nl}q", body[10 : 10 + 8 * (nl + 1)])
        off = 10 + 8 * (nl + 1)
        levels = []
        for ln in lens:
            levels.append(np.frombuffer(body[off : off + 8 * ln], dtype=np.float64).copy())
            off += 8 * ln
        return {"n": n, "levels": levels}

    def error_bound(self) -> float:
        """Approximate normalized rank error at ~99% confidence."""
        return 3.3 / self.k
