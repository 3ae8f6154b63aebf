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
        a C-level hash join of the batch distincts against the <=m summary
        keys (``pd.Index.get_indexer``), and a partition-based truncate
        that only value-sorts the count ties straddling the boundary — no
        per-distinct Python loop (r3; the r2 path walked every distinct
        value in a dict loop). New items enter at theta + c (the SS
        overestimate); the kept set and theta are identical to a full
        (-count, value) sort."""
        import pandas as pd

        vals = np.asarray(values, dtype=object)
        if len(vals) == 0:
            return
        codes, uniq = pd.factorize(vals, sort=False)
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
        if len(uniq) and not all(isinstance(u, str) for u in uniq):
            # items are STRINGS everywhere (summary dict, wire format,
            # merge/_keep_m tie-break via Python str order == numpy U
            # order) — coerce non-string inputs here so the update-path
            # boundary tie-break below agrees with the merge path's.
            # Re-factorize afterwards: distinct inputs with equal str()
            # (e.g. 5 and "5") must collapse to ONE summary item.
            codes2, uniq = pd.factorize(
                np.asarray(uniq.astype("U"), dtype=object), sort=False
            )
            bc = np.bincount(
                codes2, weights=bc.astype(np.float64), minlength=len(uniq)
            ).astype(np.int64)
        self.n += int(bc.sum())
        cur_k = np.array(list(self.counts.keys()), dtype=object)
        cur_c = np.fromiter(self.counts.values(), dtype=np.int64, count=len(cur_k))
        if len(cur_k):
            pos = pd.Index(cur_k).get_indexer(uniq)
        else:
            pos = np.full(len(uniq), -1, dtype=np.int64)
        hit = pos >= 0
        cur_c[pos[hit]] += bc[hit]  # uniq is distinct -> positions unique
        keys = np.concatenate([cur_k, uniq[~hit]])
        cnts = np.concatenate([cur_c, bc[~hit] + self.theta])
        self._keep_m(keys, cnts)

    def _keep_m(self, keys: np.ndarray, cnts: np.ndarray) -> None:
        """Truncate candidate (keys, cnts) arrays to the m largest by
        (-count, value) order, updating theta with the max evicted count
        — partition-based: only the count ties straddling the boundary
        get value-sorted, never the full candidate set. The kept summary
        dict is rebuilt in (-count, value) order (a <=m-item sort), so
        encoded bytes are a pure function of the summary MAP — merge
        operand order / shuffle arrival cannot leak into checkpointed
        sketch blobs (r4 review finding)."""
        n_tot = len(keys)
        if n_tot <= self.m:
            kept_idx = np.arange(n_tot)
        else:
            # (m+1)-th / m-th largest counts via partition (no full sort)
            c_evict = np.partition(cnts, n_tot - self.m - 1)[n_tot - self.m - 1]
            c_keep = np.partition(cnts, n_tot - self.m)[n_tot - self.m]
            self.theta = max(self.theta, int(c_evict))
            if c_keep > c_evict:
                kept_idx = np.nonzero(cnts >= c_keep)[0]  # exactly m items
            else:
                # ties at the boundary: keep smallest values first, the
                # same total order as sorting by (-count, value)
                sure = np.nonzero(cnts > c_keep)[0]
                ties = np.nonzero(cnts == c_keep)[0]
                order = np.argsort(keys[ties].astype("U"), kind="stable")
                kept_idx = np.concatenate(
                    [sure, ties[order[: self.m - len(sure)]]]
                )
        kept_k, kept_c = keys[kept_idx], cnts[kept_idx]
        order = np.lexsort((kept_k.astype("U"), -kept_c))  # (-count, value)
        self.counts = dict(
            zip(kept_k[order].tolist(), kept_c[order].tolist())
        )  # <= m entries, canonical order

    def merge(self, other: "SpaceSaving") -> "SpaceSaving":
        """Mergeable-summaries combine: absent items contribute the other
        summary's theta (their maximum possible count there). Vectorized
        (r4; was a per-item dict loop): one C-level hash join of the two
        key sets plus the shared partition-based truncate."""
        import pandas as pd

        ka = np.array(list(self.counts.keys()), dtype=object)
        ca = np.fromiter(self.counts.values(), dtype=np.int64, count=len(ka))
        kb = np.array(list(other.counts.keys()), dtype=object)
        cb = np.fromiter(other.counts.values(), dtype=np.int64, count=len(kb))
        if len(ka):
            pos = pd.Index(ka).get_indexer(kb)  # b's keys located in a
        else:
            pos = np.full(len(kb), -1, dtype=np.int64)
        hit = pos >= 0
        out_a = ca + other.theta          # default: absent from b
        out_a[pos[hit]] = ca[pos[hit]] + cb[hit]  # present in both
        keys = np.concatenate([ka, kb[~hit]])
        cnts = np.concatenate([out_a, cb[~hit] + self.theta])
        self.theta += other.theta
        self.n += other.n
        self._keep_m(keys, cnts)
        return self

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


def valid_flat(data: np.ndarray, offsets: np.ndarray, m: int) -> np.ndarray:
    """Non-raising per-buffer HEADER validity (merge passthrough probe):
    magic / version / matching m / length == 16 + payload length. The
    JSON payload itself is not parsed here — a length-consistent buffer
    with corrupt JSON would pass through as a single-partial group
    (multi-partial groups still fully decode and raise). Our own
    partials are always well-formed; this is the documented trade for
    zero per-group Python on the passthrough path."""
    from .sketch_common import probe_headers, read_le_flat

    ok, hp, lens = probe_headers(data, offsets, MAGIC, 16)
    if not ok.any():
        return ok
    ok &= read_le_flat(data, hp + 4, 4) == 1
    ok &= read_le_flat(data, hp + 8, 4).astype(np.int64) == m
    plen = read_le_flat(data, hp + 12, 4).astype(np.int64)
    ok &= lens == 16 + plen
    return ok
