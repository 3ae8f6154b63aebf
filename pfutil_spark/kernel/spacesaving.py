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
        """Add a batch: exact batch counts via C-level factorize/bincount,
        then ONE keyed ``Series.add`` fold into the summary (hash-join on
        the index) and a vectorized truncate — no per-distinct Python
        loop (r3; the r2 path walked every distinct value in a dict
        loop). New items enter at theta + c (the SS overestimate)."""
        import pandas as pd

        s = pd.Series(values, dtype="object")
        if len(s) == 0:
            return
        codes, uniq = pd.factorize(s, sort=False)
        if (codes < 0).any():  # drop nulls, like value_counts did
            keep = codes >= 0
            codes = codes[keep]
            if weights is not None:
                weights = np.asarray(weights)[keep]
        if weights is None:
            bc = np.bincount(codes, minlength=len(uniq)).astype(np.int64)
        else:
            bc = np.bincount(
                codes,
                weights=np.asarray(weights, dtype=np.float64),
                minlength=len(uniq),
            ).astype(np.int64)
        self.n += int(bc.sum())
        add = pd.Series(bc, index=pd.Index(uniq, dtype="object"))
        cur = pd.Series(self.counts, dtype="int64")
        combined = cur.add(add, fill_value=0).astype("int64")
        if self.theta:
            combined[combined.index.difference(cur.index)] += self.theta
        if len(combined) > self.m:
            # sort by (-count, value): stable value sort, then stable
            # count sort — same total order as _truncate
            combined = combined.sort_index(kind="stable").sort_values(
                ascending=False, kind="stable"
            )
            self.theta = max(self.theta, int(combined.iloc[self.m]))
            combined = combined.iloc[: self.m]
        self.counts = {str(k): int(v) for k, v in combined.items()}  # <= m entries

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
