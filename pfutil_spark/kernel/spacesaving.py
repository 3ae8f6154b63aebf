"""SpaceSaving heavy-hitters sketch (Metwally, Agrawal & El Abbadi,
"Efficient computation of frequent and top-k elements in data streams",
ICDT 2005), with the mergeable-summaries merge (Agarwal, Cormode,
Huang, Phillips, Wei & Yi, PODS 2012). No reference-repo counterpart —
same zero/update/merge/estimate/dump/restore contract as the others.

State: at most m (item, count) pairs plus a floor theta = the largest
count ever evicted. Guarantees (maintained under update AND merge):

* no undercount of the floor kind: true_count(v) <= est(v) <= true_count(v) + theta
* theta <= N / m  (N = total weight seen)
* every item with true frequency > N/m is IN the summary

Items are stored as UTF-8 strings (the operator casts the column), so
results are reportable values, not opaque hashes.
"""

from __future__ import annotations

import numpy as np

MAGIC = b"SSAV"
DEFAULT_M = 256


class SpaceSaving:
    __slots__ = ("m", "counts", "theta", "n")

    def __init__(self, m: int = DEFAULT_M):
        self.m = int(m)
        self.counts: dict[str, int] = {}
        self.theta = 0  # max count ever evicted (overcount bound)
        self.n = 0

    def update_batch(self, values: list[str] | np.ndarray, weights=None) -> None:
        """Add a batch: aggregate exact batch counts first (C-level), then
        one merge pass over the distinct values — per-DISTINCT work, never
        per-row."""
        import pandas as pd

        s = pd.Series(values, dtype="object")
        if weights is None:
            vc = s.value_counts()
        else:
            vc = pd.Series(np.asarray(weights), index=s).groupby(level=0).sum()
        self.n += int(vc.sum())
        for v, c in vc.items():
            c = int(c)
            if v in self.counts:
                self.counts[v] += c
            else:
                # new item enters at theta + c (the SS overestimate)
                self.counts[v] = self.theta + c
        self._truncate()

    def merge(self, other: "SpaceSaving") -> "SpaceSaving":
        """Mergeable-summaries combine: absent items contribute the other
        summary's theta (their maximum possible count there)."""
        out: dict[str, int] = {}
        for v, c in self.counts.items():
            out[v] = c + other.counts.get(v, other.theta)
        for v, c in other.counts.items():
            if v not in self.counts:
                out[v] = c + self.theta
        self.counts = out
        self.theta += other.theta
        self.n += other.n
        self._truncate()
        return self

    def _truncate(self) -> None:
        if len(self.counts) <= self.m:
            return
        items = sorted(self.counts.items(), key=lambda kv: (-kv[1], kv[0]))
        kept = items[: self.m]
        evicted_max = items[self.m][1]
        self.theta = max(self.theta, evicted_max)
        self.counts = dict(kept)

    def top_k(self, k: int) -> list[tuple[str, int, int]]:
        """[(value, est_count, max_overcount)] — est is an upper bound;
        est - theta is a guaranteed lower bound."""
        items = sorted(self.counts.items(), key=lambda kv: (-kv[1], kv[0]))
        return [(v, c, self.theta) for v, c in items[:k]]

    def estimate(self, value: str) -> int:
        return self.counts.get(value, self.theta)

    def encode(self) -> bytes:
        import json

        payload = json.dumps(
            {"c": self.counts, "t": self.theta, "n": self.n}, ensure_ascii=False
        ).encode("utf-8")
        head = MAGIC + np.array([1, self.m, len(payload)], dtype="<u4").tobytes()
        return head + payload


def decode(buf: bytes) -> SpaceSaving:
    import json

    if buf[:4] != MAGIC:
        raise ValueError("Invalid SpaceSaving representation")
    ver, m, plen = np.frombuffer(buf, dtype="<u4", count=3, offset=4)
    if ver != 1:
        raise ValueError(f"unsupported SpaceSaving version {ver}")
    d = json.loads(buf[16 : 16 + int(plen)].decode("utf-8"))
    ss = SpaceSaving(int(m))
    ss.counts = {str(k): int(v) for k, v in d["c"].items()}
    ss.theta = int(d["t"])
    ss.n = int(d["n"])
    return ss


def merge_all(sketches: list[SpaceSaving]) -> SpaceSaving:
    out = sketches[0]
    for s in sketches[1:]:
        out.merge(s)
    return out
