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
        """Binary v2 wire (r5; replaces the bulky JSON v1 — which
        :func:`decode` still accepts for checkpointed stores): header
        ``MAGIC | ver=2 u4 | m u4 | n_items u4 | theta i8 | n i8`` (32
        bytes), then ``counts <i8 * n_items``, ``key_lens <u4 *
        n_items``, then the UTF-8 key bytes concatenated. Items are in
        the summary's canonical (-count, value) order (``_keep_m``
        rebuilds the dict that way), so encoded bytes stay a pure
        function of the summary map."""
        keys = [k.encode("utf-8") for k in self.counts.keys()]
        head = MAGIC + np.array([2, self.m, len(keys)], dtype="<u4").tobytes()
        head += np.array([self.theta, self.n], dtype="<i8").tobytes()
        cnts = np.fromiter(
            self.counts.values(), dtype="<i8", count=len(keys)
        ).tobytes()
        lens = np.array([len(b) for b in keys], dtype="<u4").tobytes()
        return head + cnts + lens + b"".join(keys)


def decode(buf: bytes) -> SpaceSaving:
    if buf[:4] != MAGIC:
        raise ValueError("Invalid SpaceSaving representation")
    ver, m, third = np.frombuffer(buf, dtype="<u4", count=3, offset=4)
    if ver == 1:  # legacy JSON wire (pre-r5 checkpoints)
        import json

        d = json.loads(buf[16 : 16 + int(third)].decode("utf-8"))
        ss = SpaceSaving(int(m))
        ss.counts = {str(k): int(v) for k, v in d["c"].items()}
        ss.theta = int(d["t"])
        ss.n = int(d["n"])
        return ss
    if ver != 2:
        raise ValueError(f"unsupported SpaceSaving version {ver}")
    ni = int(third)
    theta, n = np.frombuffer(buf, dtype="<i8", count=2, offset=16)
    cnts = np.frombuffer(buf, dtype="<i8", count=ni, offset=32)
    lens = np.frombuffer(buf, dtype="<u4", count=ni, offset=32 + 8 * ni)
    if len(buf) != 32 + 12 * ni + int(lens.sum()):
        raise ValueError("Invalid SpaceSaving representation")
    ss = SpaceSaving(int(m))
    off = 32 + 12 * ni
    counts: dict[str, int] = {}
    for i in range(ni):
        L = int(lens[i])
        counts[buf[off : off + L].decode("utf-8")] = int(cnts[i])
        off += L
    ss.counts = counts
    ss.theta = int(theta)
    ss.n = int(n)
    return ss


def merge_all(sketches: list[SpaceSaving]) -> SpaceSaving:
    out = sketches[0]
    for s in sketches[1:]:
        out.merge(s)
    return out


def valid_flat(data: np.ndarray, offsets: np.ndarray, m: int) -> np.ndarray:
    """Non-raising per-buffer STRUCTURAL validity of the v2 wire (merge
    passthrough probe): magic / version 2 / matching m / item count <= m
    / length == 32 + 12*n_items + sum(key_lens). Key bytes and the
    canonical (-count, value) order are not audited flat (variable-
    length string comparison has no cheap vectorized form) — our own
    partials are always well-formed; the documented trade for zero
    per-group Python on the passthrough path. Legacy JSON (v1) buffers
    are NOT passed through: they re-route to the work path and come out
    re-encoded as v2 (the upgrade path for pre-r5 checkpoint blobs)."""
    from .sketch_common import probe_headers, read_le_flat, segment_ranks

    ok, hp, lens = probe_headers(data, offsets, MAGIC, 32)
    if not ok.any():
        return ok
    ok &= read_le_flat(data, hp + 4, 4) == 2
    ok &= read_le_flat(data, hp + 8, 4).astype(np.int64) == m
    ni = read_le_flat(data, hp + 12, 4).astype(np.int64)
    ok &= (ni <= m) & (lens >= 32 + 12 * ni)
    rows = np.flatnonzero(ok & (ni > 0))
    if len(rows):
        seg = np.repeat(np.arange(len(rows), dtype=np.int64), ni[rows])
        klens = read_le_flat(
            data,
            offsets[rows][seg] + 32 + 8 * ni[rows][seg] + 4 * segment_ranks(seg),
            4,
        ).astype(np.int64)
        tot = np.bincount(
            seg, weights=klens.astype(np.float64), minlength=len(rows)
        ).astype(np.int64)
        ok[rows] = lens[rows] == 32 + 12 * ni[rows] + tot
    zr = ok & (ni == 0)
    ok[zr] = lens[zr] == 32
    return ok


def parse_items_flat(
    data: np.ndarray, offsets: np.ndarray, m: int
) -> tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """Raising flat parse of many SpaceSaving buffers ->
    ``(theta, n, item_row, item_count, item_keys)`` with ``item_keys``
    an object array of UTF-8 bytes (byte order == code-point order ==
    the summary's Python-str tie-break order). v2 buffers parse fully
    vectorized; legacy v1 (JSON) rows fall back to :func:`decode` per
    such row — the documented upgrade path, never taken for partials
    this package wrote at r5+."""
    from .sketch_common import read_le_flat, segment_ranks

    n_rows = len(offsets) - 1
    offsets = np.asarray(offsets, dtype=np.int64)
    lens = np.diff(offsets)
    if n_rows == 0:
        e = np.zeros(0, dtype=np.int64)
        return e, e, e, e, np.zeros(0, dtype=object)
    if (lens < 16).any():
        raise ValueError("Invalid SpaceSaving representation")
    hp = offsets[:-1]
    ok = np.ones(n_rows, dtype=bool)
    for i, byte in enumerate(MAGIC):
        ok &= data[hp + i] == byte
    if not ok.all():
        raise ValueError("Invalid SpaceSaving representation")
    ver = read_le_flat(data, hp + 4, 4)
    if ((ver != 1) & (ver != 2)).any():
        bad = ver[(ver != 1) & (ver != 2)][0]
        raise ValueError(f"unsupported SpaceSaving version {int(bad)}")
    if (read_le_flat(data, hp + 8, 4).astype(np.int64) != m).any():
        raise ValueError("Invalid SpaceSaving representation")  # param mismatch
    theta = np.zeros(n_rows, dtype=np.int64)
    n = np.zeros(n_rows, dtype=np.int64)
    row_parts, cnt_parts, key_parts = [], [], []
    v2 = np.flatnonzero(ver == 2)
    if len(v2):
        if (lens[v2] < 32).any():
            raise ValueError("Invalid SpaceSaving representation")
        ni = read_le_flat(data, hp[v2] + 12, 4).astype(np.int64)
        theta[v2] = read_le_flat(data, hp[v2] + 16, 8).view(np.int64)
        n[v2] = read_le_flat(data, hp[v2] + 24, 8).view(np.int64)
        rows = np.flatnonzero(ni > 0)
        if len(rows):
            seg = np.repeat(np.arange(len(rows), dtype=np.int64), ni[rows])
            rk = segment_ranks(seg)
            base = hp[v2][rows][seg]
            cnts = read_le_flat(data, base + 32 + 8 * rk, 8).view(np.int64)
            klens = read_le_flat(
                data, base + 32 + 8 * ni[rows][seg] + 4 * rk, 4
            ).astype(np.int64)
            tot = np.bincount(
                seg, weights=klens.astype(np.float64), minlength=len(rows)
            ).astype(np.int64)
            if (lens[v2][rows] != 32 + 12 * ni[rows] + tot).any():
                raise ValueError("Invalid SpaceSaving representation")
            kstart = base + 32 + 12 * ni[rows][seg] + (
                np.cumsum(klens) - klens
                - np.repeat(np.cumsum(tot) - tot, ni[rows])
            )
            # gather ONLY the key bytes into a compact blob (no
            # whole-buffer tobytes copy — r5 review), then slice
            bseg = np.repeat(np.arange(len(klens), dtype=np.int64), klens)
            bidx = np.repeat(kstart, klens) + segment_ranks(bseg)
            blob = np.ascontiguousarray(data[bidx]).tobytes()
            ko = np.concatenate(([0], np.cumsum(klens)))
            keys = np.empty(len(klens), dtype=object)
            for i in range(len(klens)):
                keys[i] = blob[ko[i] : ko[i + 1]]
            row_parts.append(v2[rows][seg])
            cnt_parts.append(cnts)
            key_parts.append(keys)
        zi = np.flatnonzero(ni == 0)
        if len(zi) and (lens[v2][zi] != 32).any():
            raise ValueError("Invalid SpaceSaving representation")
    v1 = np.flatnonzero(ver == 1)
    for r in v1:  # legacy JSON rows only
        ss = decode(bytes(data[offsets[r] : offsets[r + 1]]))
        theta[r] = ss.theta
        n[r] = ss.n
        if ss.counts:
            row_parts.append(np.full(len(ss.counts), r, dtype=np.int64))
            cnt_parts.append(np.fromiter(ss.counts.values(), dtype=np.int64))
            key_parts.append(
                np.array([k.encode("utf-8") for k in ss.counts], dtype=object)
            )
    if not row_parts:
        e = np.zeros(0, dtype=np.int64)
        return theta, n, e, e, np.zeros(0, dtype=object)
    return (
        theta,
        n,
        np.concatenate(row_parts),
        np.concatenate(cnt_parts),
        np.concatenate(key_parts),
    )


def merge_groups_flat(
    data: np.ndarray,
    offsets: np.ndarray,
    group_codes: np.ndarray,
    n_groups: int,
    m: int,
) -> tuple[np.ndarray, np.ndarray]:
    """Grouped SpaceSaving merge over flat wire buffers (``group_codes``
    non-decreasing, every code present) — the ONE-SHOT multiway
    mergeable-summaries combine (Agarwal et al., PODS 2012), zero
    per-group Python:

    for item x present in partial subset S of a group,
    ``est(x) = sum_{i in S} (c_i(x) - theta_i) + Theta`` with
    ``Theta = sum_i theta_i`` (absent partials contribute their theta,
    algebraically folded via the per-item adjustment); keep the m
    largest by (-est, key) per group; final theta = max(Theta, largest
    evicted est). For P=2 this is byte-identical to the scalar pairwise
    :meth:`SpaceSaving.merge`; for P>2 the one-shot combine never
    truncates between steps, so its overcount bound is <= the
    sequential path's (arrival-order byte dependence documented since
    r2 is thereby REMOVED: the multiway result is order-free).
    All guarantees hold: est in [true, true + theta], theta <= N/m,
    every item with frequency > N/m survives."""
    import pandas as pd

    g_row = np.asarray(group_codes, dtype=np.int64)
    if len(g_row) == 0:
        raise ValueError("merge_groups_flat needs at least one buffer")
    theta, n, item_row, item_cnt, item_keys = parse_items_flat(data, offsets, m)
    theta_g = np.bincount(g_row, weights=theta.astype(np.float64), minlength=n_groups).astype(np.int64)
    n_g = np.bincount(g_row, weights=n.astype(np.float64), minlength=n_groups).astype(np.int64)

    if len(item_row):
        item_g = g_row[item_row]
        adj = item_cnt - theta[item_row]
        # sorted key codes: UTF-8 byte order == code-point order, the
        # same total order as the scalar path's Python-str tie-break
        kcode, uniq_keys = pd.factorize(item_keys, sort=True)
        u_g, u_kcode, sums = _sum_by_group_key(
            item_g, kcode.astype(np.int64), adj, len(uniq_keys)
        )
        est = sums + theta_g[u_g]
        out_g, out_cnt, out_kcode, theta_g = _top_m(
            u_g, est, u_kcode, theta_g, m
        )
        out_keys = np.asarray(uniq_keys, dtype=object)[out_kcode]
    else:
        out_g = out_cnt = np.zeros(0, dtype=np.int64)
        out_keys = np.zeros(0, dtype=object)
    return _emit_summaries(out_g, out_cnt, out_keys, theta_g, n_g, n_groups, m)


def _sum_by_group_key(
    item_g: np.ndarray, kcode: np.ndarray, cnt: np.ndarray, n_keys: int
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Exact int64 count sums per (group, key-code) pair via
    lexsort+reduceat (the CMS v2 item-fold shape). Returns the unique
    pairs' ``(group, kcode, sum)`` sorted by (group, kcode)."""
    combined = item_g * np.int64(n_keys) + kcode
    order = np.argsort(combined, kind="stable")
    cs, as_ = combined[order], cnt[order]
    starts = np.flatnonzero(np.diff(cs, prepend=-1))
    sums = np.add.reduceat(as_, starts) if len(cs) else np.zeros(0, dtype=np.int64)
    uk = cs[starts] if len(cs) else cs
    return uk // n_keys, uk % n_keys, sums


def _top_m(
    u_g: np.ndarray,
    est: np.ndarray,
    u_kcode: np.ndarray,
    theta_g: np.ndarray,
    m: int,
) -> tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """Per-group top-m selection by (-est, key) — the same total order
    as the scalar ``_keep_m`` — raising each group's theta to its
    largest evicted est. ``u_kcode`` must be SORTED key codes (rank ==
    key order). Returns kept ``(group, est, kcode)`` in canonical
    (-est, key) order per group plus the updated theta array."""
    from .sketch_common import segment_ranks

    sel = np.lexsort((u_kcode, -est, u_g))
    rank = segment_ranks(u_g[sel])
    kept = sel[rank < m]
    evict_first = sel[rank == m]  # est-desc => the largest evicted
    if len(evict_first):
        theta_g = theta_g.copy()
        eg = u_g[evict_first]
        theta_g[eg] = np.maximum(theta_g[eg], est[evict_first])
    return u_g[kept], est[kept], u_kcode[kept], theta_g


def _emit_summaries(
    out_g: np.ndarray,
    out_cnt: np.ndarray,
    out_keys: np.ndarray,
    theta_g: np.ndarray,
    n_g: np.ndarray,
    n_groups: int,
    m: int,
) -> tuple[np.ndarray, np.ndarray]:
    """Serialize per-group summaries (items in canonical order, grouped
    by non-decreasing ``out_g``) into flat v2 wire buffers — the single
    writer shared by :func:`merge_groups_flat` and :func:`fold_groups`.
    ``out_keys`` holds UTF-8 bytes objects."""
    from .sketch_common import segment_ranks, write_le_flat

    ni_out = np.bincount(out_g, minlength=n_groups).astype(np.int64)
    klens = np.fromiter(
        (len(b) for b in out_keys), dtype=np.int64, count=len(out_keys)
    )
    keybytes_g = np.bincount(
        out_g, weights=klens.astype(np.float64), minlength=n_groups
    ).astype(np.int64)
    row_len = 32 + 12 * ni_out + keybytes_g
    out_offsets = np.zeros(n_groups + 1, dtype=np.int64)
    np.cumsum(row_len, out=out_offsets[1:])
    out = np.zeros(int(out_offsets[-1]), dtype=np.uint8)
    hp = out_offsets[:-1]
    for i, byte in enumerate(MAGIC):
        out[hp + i] = byte
    ones = np.ones(n_groups, dtype=np.int64)
    write_le_flat(out, hp + 4, ones * 2, 4)          # version
    write_le_flat(out, hp + 8, ones * m, 4)          # m
    write_le_flat(out, hp + 12, ni_out, 4)           # n_items
    write_le_flat(out, hp + 16, theta_g, 8)          # theta
    write_le_flat(out, hp + 24, n_g, 8)              # n
    if len(out_g):
        rk = segment_ranks(out_g)
        base = out_offsets[out_g]
        write_le_flat(out, base + 32 + 8 * rk, out_cnt, 8)
        write_le_flat(out, base + 32 + 8 * ni_out[out_g] + 4 * rk, klens, 4)
        # key bytes: scatter the concatenated blob to per-key positions
        blob = np.frombuffer(b"".join(out_keys.tolist()), dtype=np.uint8)
        within = np.cumsum(klens) - klens  # blob offset of each key
        grp_blob_base = np.repeat(
            np.cumsum(keybytes_g) - keybytes_g, ni_out
        )  # blob offset where each key's GROUP starts
        kstart = base + 32 + 12 * ni_out[out_g] + (within - grp_blob_base)
        tgt = np.repeat(kstart, klens) + (
            np.arange(len(blob), dtype=np.int64) - np.repeat(within, klens)
        )
        out[tgt] = blob
    return out, out_offsets


def _fold_counts(
    values: np.ndarray,
    inverse: np.ndarray,
    weights: "np.ndarray | None",
) -> tuple[np.ndarray, np.ndarray, np.ndarray, "object"]:
    """Shared count stage of the grouped folds: exact per-(group, value)
    int64 counts with the SAME string coercion/collapse semantics as
    :meth:`SpaceSaving.update_batch` (non-strings coerce to ``str`` and
    equal-``str()`` inputs collapse). Returns ``(item_g, item_kcode,
    counts, sorted_uniques)`` with key codes in sorted-key order."""
    import pandas as pd

    vals = np.asarray(values, dtype=object)
    g = np.asarray(inverse, dtype=np.int64)
    codes, uniq = pd.factorize(vals, sort=False)
    keep = codes >= 0  # drop nulls, like update_batch
    codes, g = codes[keep], g[keep]
    if weights is not None:
        weights = np.asarray(weights)[keep]
    if len(uniq) and not all(isinstance(u, str) for u in uniq):
        codes2, uniq = pd.factorize(
            np.asarray(uniq.astype("U"), dtype=object), sort=False
        )
        codes = codes2[codes]
    # sorted-key ranks (Python str order == the scalar tie-break order)
    sk, suniq = pd.factorize(np.asarray(uniq, dtype=object), sort=True)
    kcode = sk.astype(np.int64)[codes]
    if weights is None:
        cnt = np.ones(len(codes), dtype=np.int64)
    else:
        cnt = np.asarray(weights).astype(np.int64)
    u_g, u_kcode, sums = _sum_by_group_key(g, kcode, cnt, len(suniq))
    return u_g, u_kcode, sums, suniq


def fold_groups(
    values: np.ndarray,
    inverse: np.ndarray,
    n_groups: int,
    m: int = DEFAULT_M,
) -> tuple[np.ndarray, np.ndarray]:
    """Grouped direct-emit fold for the high-cardinality regime (r5):
    each group's summary is byte-identical to
    ``SpaceSaving(m).update_batch(group_values)`` — exact batch counts
    (theta starts at 0), top-m by (-count, value), canonical order —
    computed for ALL groups of a batch in one vectorized pass. This is
    what lets per-key heavy-hitter summaries survive 10^6-group batches
    (the accumulation path pays a Python update+encode per group)."""
    u_g, u_kcode, sums, suniq = _fold_counts(values, inverse, None)
    theta_g = np.zeros(n_groups, dtype=np.int64)
    n_g = np.bincount(u_g, weights=sums.astype(np.float64), minlength=n_groups).astype(
        np.int64
    )
    out_g, out_cnt, out_kcode, theta_g = _top_m(u_g, sums, u_kcode, theta_g, m)
    out_keys = np.array(
        [k.encode("utf-8") for k in np.asarray(suniq, dtype=object)[out_kcode]],
        dtype=object,
    ) if len(out_kcode) else np.zeros(0, dtype=object)
    return _emit_summaries(out_g, out_cnt, out_keys, theta_g, n_g, n_groups, m)


def fold_groups_weighted(
    values: np.ndarray,
    weights: np.ndarray,
    inverse: np.ndarray,
    n_groups: int,
    m: int = DEFAULT_M,
) -> tuple[np.ndarray, np.ndarray]:
    """Weighted grouped fold: each row adds its (positive int64) weight.
    Byte-identical to the scalar weighted update per group; rows with
    weight <= 0 drop BEFORE counting (they must not seed theta+0
    items — the r4 weighted-sketch trap)."""
    wt = np.asarray(weights).astype(np.int64)
    keep = wt > 0
    u_g, u_kcode, sums, suniq = _fold_counts(
        np.asarray(values, dtype=object)[keep],
        np.asarray(inverse, dtype=np.int64)[keep],
        wt[keep],
    )
    theta_g = np.zeros(n_groups, dtype=np.int64)
    n_g = np.bincount(u_g, weights=sums.astype(np.float64), minlength=n_groups).astype(
        np.int64
    )
    out_g, out_cnt, out_kcode, theta_g = _top_m(u_g, sums, u_kcode, theta_g, m)
    out_keys = np.array(
        [k.encode("utf-8") for k in np.asarray(suniq, dtype=object)[out_kcode]],
        dtype=object,
    ) if len(out_kcode) else np.zeros(0, dtype=object)
    return _emit_summaries(out_g, out_cnt, out_keys, theta_g, n_g, n_groups, m)
