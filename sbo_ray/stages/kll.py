"""KLL quantile sketch (Karnin-Lang-Liberty 2016): the mergeable
bounded-memory scale path for percentiles over an UNBOUNDED value
domain. The exact histogram path (`queries.q_log_bytes_quantiles`)
is right when the distinct-value count is bounded (byte sizes in log
data); a real-valued column (latencies, scores) makes that histogram
input-sized — a KLL sketch holds O(k log(n/k)) values regardless of n
and merges associatively, so one sketch per block tree-combines like
the CMS/HLL family (`stages/sketch.py`, `stages/hll.py`).

Ladder of compactors: level i holds items of weight 2^i; an overfull
level sorts, promotes every other item (even prefix only — an odd
leftover stays, so total weight is conserved exactly), and the
offset bit comes from a counter-seeded LCG: a given insertion
sequence is reproducible, but cross-run Ray block order still varies,
which is inherent to the sketch family — tests assert the KLL
rank-error bound, not byte equality.
"""

from __future__ import annotations

import struct

import numpy as np

_EMPTY = np.empty(0, dtype=np.float64)


class KLLSketch:
    __slots__ = ("k", "levels", "n", "_coin")

    def __init__(self, k: int = 256) -> None:
        self.k = k
        self.levels: list[np.ndarray] = [_EMPTY]
        self.n = 0
        self._coin = 0x9E3779B97F4A7C15

    # -- internals ------------------------------------------------------

    def _flip(self) -> int:
        # middle bits of an LCG (the low bit alternates with period 2)
        self._coin = (6364136223846793005 * self._coin
                      + 1442695040888963407) % (1 << 64)
        return (self._coin >> 33) & 1

    def _cap(self, lvl: int, height: int) -> int:
        # KLL capacity schedule: k * (2/3)^(distance from the top level)
        c = int(np.ceil(self.k * (2.0 / 3.0) ** (height - 1 - lvl)))
        return max(8, c)

    def _compress(self) -> None:
        while True:
            height = len(self.levels)
            for lvl in range(height):
                if len(self.levels[lvl]) <= self._cap(lvl, height):
                    continue
                a = np.sort(self.levels[lvl])
                m = len(a) - (len(a) % 2)  # compact an even count only
                kept = a[self._flip():m:2]
                self.levels[lvl] = a[m:]  # odd leftover keeps its weight
                if lvl + 1 == len(self.levels):
                    self.levels.append(_EMPTY)
                self.levels[lvl + 1] = np.concatenate(
                    [self.levels[lvl + 1], kept])
                break
            else:
                return

    # -- public API -----------------------------------------------------

    def add(self, values) -> None:
        v = np.asarray(values, dtype=np.float64)
        if not len(v):
            return
        self.n += len(v)
        self.levels[0] = np.concatenate([self.levels[0], v])
        self._compress()

    def merge(self, other: "KLLSketch") -> None:
        self.n += other.n
        while len(self.levels) < len(other.levels):
            self.levels.append(_EMPTY)
        for i, lv in enumerate(other.levels):
            if len(lv):
                self.levels[i] = np.concatenate([self.levels[i], lv])
        self._compress()

    def quantile(self, q: float) -> float:
        """Weighted lower quantile: the smallest retained value whose
        cumulative weight reaches q * n."""
        if self.n == 0:
            raise ValueError("quantile of an empty sketch")
        vals = np.concatenate(self.levels)
        wts = np.concatenate([
            np.full(len(lv), 1 << i, dtype=np.int64)
            for i, lv in enumerate(self.levels)])
        order = np.argsort(vals, kind="stable")
        vals, wts = vals[order], wts[order]
        cum = np.cumsum(wts)
        ix = int(np.searchsorted(cum, q * cum[-1], side="left"))
        return float(vals[min(ix, len(vals) - 1)])

    # -- wire format (binary column through Arrow) -----------------------

    def to_bytes(self) -> bytes:
        parts = [struct.pack("<qqq", self.k, self.n, len(self.levels))]
        for lv in self.levels:
            parts.append(struct.pack("<q", len(lv)))
            parts.append(lv.tobytes())
        return b"".join(parts)

    @classmethod
    def from_bytes(cls, blob: bytes) -> "KLLSketch":
        k, n, nlev = struct.unpack_from("<qqq", blob, 0)
        s = cls(k)
        s.n = n
        s.levels = []
        off = 24
        for _ in range(nlev):
            (ln,) = struct.unpack_from("<q", blob, off)
            off += 8
            s.levels.append(np.frombuffer(
                blob, dtype=np.float64, count=ln, offset=off).copy())
            off += 8 * ln
        return s
