"""Vectorized extension-sketch aggregation (VERDICT r3 top item): the
flat grouped fold/merge kernels must be byte-identical to the scalar
update/merge paths, the Arrow merge stage must match the pandas engine,
high-cardinality direct emit must match accumulation, and — structurally
— the merge stage must run zero per-group Python for the vectorized
specs (monkeypatch gate, mirroring tests/test_highcard.py's HLL gate)."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from pfutil_spark.kernel import bloom, cms, kll, kmv, spacesaving as ss, tdigest
from pfutil_spark.operators.sketch_agg import (
    SKETCH_COL,
    bloom_spec,
    cms_spec,
    kll_spec,
    kmv_spec,
    merge_sketch_batch,
    sketch_agg,
    sketch_merge,
    spacesaving_spec,
    tdigest_spec,
)


def _pairs(seed=0, n=60_000, n_groups=4000):
    rng = np.random.default_rng(seed)
    inv = rng.integers(0, n_groups, n).astype(np.int64)
    inv[:n_groups] = np.arange(n_groups)  # every group present
    h = rng.integers(-(2**63), 2**63 - 1, n, dtype=np.int64)
    return rng, inv, h


class TestKernelFoldParity:
    """fold_groups == per-group scalar update, byte for byte."""

    def test_kmv(self):
        rng, inv, h = _pairs(1)
        data, offs = kmv.fold_groups_hashes(h, inv, 4000, k=64)
        for g in rng.choice(4000, 40, replace=False):
            sk = kmv.KmvSketch(64).update(h[inv == g])
            assert bytes(data[offs[g] : offs[g + 1]]) == sk.encode()
        assert kmv.valid_flat(data, offs, 64).all()
        assert not kmv.valid_flat(data, offs, 65).any()

    def test_cms(self):
        rng, inv, h = _pairs(2)
        data, offs = cms.fold_groups(h, inv, 4000, depth=3, width=64)
        for g in rng.choice(4000, 25, replace=False):
            st = cms.empty(3, 64)
            cms.update(st, h[inv == g])
            assert bytes(data[offs[g] : offs[g + 1]]) == cms.encode(st)
        assert cms.valid_flat(data, offs, 3, 64).all()
        assert not cms.valid_flat(data, offs, 3, 65).any()

    def test_bloom(self):
        rng, inv, h = _pairs(3)
        data, offs = bloom.fold_groups(h, inv, 4000, m_bits=1 << 10, k=5)
        for g in rng.choice(4000, 25, replace=False):
            st = bloom.empty(1 << 10)
            bloom.update(st, h[inv == g], 5)
            assert bytes(data[offs[g] : offs[g + 1]]) == bloom.encode(st, 5)
        assert bloom.valid_flat(data, offs, 1 << 10, 5).all()

    def test_kll_level0(self):
        rng, inv, _ = _pairs(4)
        vals = rng.normal(size=len(inv))
        vals[rng.random(len(inv)) < 0.05] = np.nan  # NaN-drop parity
        data, offs = kll.fold_groups_level0(vals, inv, 4000, k=200)
        for g in rng.choice(4000, 40, replace=False):
            sk = kll.KllSketch(200)
            sk.update(vals[inv == g])
            assert bytes(data[offs[g] : offs[g + 1]]) == sk.encode()
        assert kll.valid_flat(data, offs, 200).all()
        # a real multi-level sketch round-trips and passes the probe
        big = kll.KllSketch(200)
        big.update(rng.normal(size=5000))
        bb = big.encode()
        flat = np.frombuffer(bb, dtype=np.uint8)
        assert kll.valid_flat(flat, np.array([0, len(bb)]), 200).all()
        assert kll.decode(bb).encode() == bb

    def test_tdigest(self):
        rng, inv, _ = _pairs(5)
        vals = rng.normal(size=len(inv))
        data, offs = tdigest.fold_groups(vals, inv, 4000, delta=100)
        for g in rng.choice(4000, 40, replace=False):
            td = tdigest.TDigest(100)
            td.update(vals[inv == g])
            assert bytes(data[offs[g] : offs[g + 1]]) == td.encode()
        assert tdigest.valid_flat(data, offs, 100).all()
        assert not tdigest.valid_flat(data, offs, 101).any()


class TestKernelMergeParity:
    """merge_groups_flat == merge_all over per-group decodes."""

    @pytest.mark.parametrize("name", ["kmv", "cms", "bloom"])
    def test_merge_matches_scalar(self, name):
        rng, inv, h = _pairs(6)
        if name == "kmv":
            data, offs = kmv.fold_groups_hashes(h, inv, 4000, k=64)
            mg = lambda d, o, c, n: kmv.merge_groups_flat(d, o, c, n, 64)  # noqa: E731
            dec, mrg, enc = kmv.decode, kmv.merge_all, lambda s: s.encode()
        elif name == "cms":
            data, offs = cms.fold_groups(h, inv, 4000, 3, 64)
            mg = lambda d, o, c, n: cms.merge_groups_flat(d, o, c, n, 3, 64)  # noqa: E731
            dec, mrg, enc = cms.decode, cms.merge, cms.encode
        else:
            data, offs = bloom.fold_groups(h, inv, 4000, 1 << 10, 5)
            mg = lambda d, o, c, n: bloom.merge_groups_flat(d, o, c, n, 1 << 10, 5)  # noqa: E731
            dec = lambda b: bloom.decode(b)[0]  # noqa: E731
            mrg, enc = bloom.merge, lambda s: bloom.encode(s, 5)
        codes = np.repeat(np.arange(1000, dtype=np.int64), 4)  # 4 partials/group
        md, mo = mg(data, offs, codes, 1000)
        for g in rng.choice(1000, 25, replace=False):
            states = [
                dec(bytes(data[offs[4 * g + j] : offs[4 * g + j + 1]]))
                for j in range(4)
            ]
            assert bytes(md[mo[g] : mo[g + 1]]) == enc(mrg(states))

    def test_kmv_merge_rejects_corrupt_and_mismatched(self):
        _, inv, h = _pairs(7, n=1000, n_groups=4)
        data, offs = kmv.fold_groups_hashes(h, inv, 4, k=32)
        bad = data.copy()
        bad[offs[1]] = 0x58  # break magic of row 1
        with pytest.raises(ValueError, match="Invalid KMV"):
            kmv.merge_groups_flat(bad, offs, np.array([0, 0, 1, 1]), 2, 32)
        with pytest.raises(ValueError, match="k mismatch"):
            kmv.merge_groups_flat(data, offs, np.array([0, 0, 1, 1]), 2, 64)


def _mk_df(spark, n=40_000, groups=25_000):
    return (
        spark.range(n)
        .select(
            F.concat(F.lit("k"), (F.col("id") % groups).cast("string")).alias("k"),
            F.col("id").cast("string").alias("e"),
            (F.col("id") % 1000).cast("double").alias("v"),
        )
        .repartition(4)
    )


ALL_SPECS = [
    ("kmv", lambda: kmv_spec(64), "hash"),
    ("cms", lambda: cms_spec(3, 64), "hash"),
    ("bloom", lambda: bloom_spec(1 << 10, 5), "hash"),
    ("kll", lambda: kll_spec(100), "value"),
    ("tdigest", lambda: tdigest_spec(50), "value"),
    ("spacesaving", lambda: spacesaving_spec(32), "string"),
]


def _element(kind):
    if kind == "hash":
        return F.xxhash64(F.col("e"))
    if kind == "value":
        return F.col("v")
    return F.col("e").cast("string")


class TestArrowEngineSpark:
    @pytest.mark.parametrize("name,mkspec,kind", ALL_SPECS)
    def test_arrow_equals_pandas_engine(self, spark, name, mkspec, kind):
        """Both merge engines over the same input: byte-stable sketches
        (KMV/CMS/Bloom — merge is a set/sum/OR function) must agree byte
        for byte; order-dependent ones (KLL/t-digest/SpaceSaving, whose
        bytes depend on shuffle arrival order) must agree on totals and
        estimates."""
        df = _mk_df(spark, n=8000, groups=40)
        spec = mkspec()
        a = {
            r["k"]: bytes(r[SKETCH_COL])
            for r in sketch_agg(df, _element(kind), spec, by=("k",), engine="arrow").collect()
        }
        p = {
            r["k"]: bytes(r[SKETCH_COL])
            for r in sketch_agg(df, _element(kind), spec, by=("k",), engine="pandas").collect()
        }
        assert a.keys() == p.keys() and len(a) == 40
        if name in ("kmv", "cms", "bloom"):
            assert a == p  # byte-stable sketches: exact parity
        elif name == "spacesaving":
            for k in a:
                da, dp = ss.decode(a[k]), ss.decode(p[k])
                assert da.n == dp.n
                assert da.top_k(3)[0][0] == dp.top_k(3)[0][0]
        else:
            for k in a:
                da, dp = spec.decode(a[k]), spec.decode(p[k])
                assert da.n == dp.n
                assert abs(float(da.quantile(0.5)) - float(dp.quantile(0.5))) <= 60.0

    @pytest.mark.parametrize("name,mkspec,kind", ALL_SPECS[:3])
    def test_direct_emit_matches_accumulation(self, spark, name, mkspec, kind):
        """High-cardinality direct emit == accumulation path after the
        merge, byte for byte (exact-merge sketches)."""
        df = _mk_df(spark, n=30_000, groups=20_000)
        spec = mkspec()
        lo = {
            r["k"]: bytes(r[SKETCH_COL])
            for r in sketch_agg(df, _element(kind), spec, by=("k",), direct_emit_groups=1).collect()
        }
        hi = {
            r["k"]: bytes(r[SKETCH_COL])
            for r in sketch_agg(
                df, _element(kind), spec, by=("k",), direct_emit_groups=10**9
            ).collect()
        }
        assert lo == hi

    def test_kll_tdigest_direct_emit_estimates(self, spark):
        """Value sketches at high-card by: direct emit merges to valid
        sketches whose quantiles agree with accumulation within the rank
        error (bytes may differ: compaction timing is path-dependent)."""
        df = _mk_df(spark, n=30_000, groups=10_000)
        for mk in (lambda: kll_spec(100), lambda: tdigest_spec(50)):
            spec = mk()
            de = sketch_agg(df, F.col("v"), spec, by=("k",), direct_emit_groups=1)
            acc = sketch_agg(df, F.col("v"), spec, by=("k",), direct_emit_groups=10**9)
            rows_d = {r["k"]: bytes(r[SKETCH_COL]) for r in de.collect()}
            rows_a = {r["k"]: bytes(r[SKETCH_COL]) for r in acc.collect()}
            assert rows_d.keys() == rows_a.keys()
            rng = np.random.default_rng(0)
            for k in rng.choice(list(rows_d), 50, replace=False):
                qd = spec.decode(rows_d[k])
                qa = spec.decode(rows_a[k])
                assert abs(float(qd.quantile(0.5)) - float(qa.quantile(0.5))) <= 30.0

    def test_global_merge(self, spark):
        df = _mk_df(spark, n=5000, groups=10)
        spec = kmv_spec(256)
        a = bytes(sketch_agg(df, F.xxhash64("e"), spec, engine="arrow").collect()[0][0])
        p = bytes(sketch_agg(df, F.xxhash64("e"), spec, engine="pandas").collect()[0][0])
        assert a == p

    def test_corrupt_partials_raise(self, spark):
        """Invalid buffers must fail with the kernel's validation error,
        not pass through the singleton fast path silently."""
        df = spark.createDataFrame(
            [("a", bytearray(b"JUNK")), ("b", bytearray(b"xy"))],
            "k string, sketch binary",
        )
        with pytest.raises(Exception, match="Invalid KMV"):
            sketch_merge(df, kmv_spec(64), ["k"]).collect()
        with pytest.raises(Exception, match="Invalid KLL"):
            sketch_merge(df, kll_spec(100), ["k"]).collect()


class TestReviewFindings:
    """r4 self-review regressions: direct-emit byte cap, KLL space
    contract, SpaceSaving byte determinism, CMS zero-sum entries."""

    def test_bloom_bound_and_cap_fallback_parity(self, spark):
        """The direct emit is gated on a per-spec byte bound (r4 review
        finding: pre-sparse-wire, per-key Bloom at default sizing would
        have allocated n_groups x m/8 = gigabytes). With the sparse v2
        wire the bound is row-scaled — and when the cap DOES trip, the
        accumulation path produces identical bytes (OR-merge is exact
        either way)."""
        import pfutil_spark.operators.sketch_agg as sa

        df = _mk_df(spark, n=6000, groups=5000)
        spec = bloom_spec(1 << 10, 5)
        # row-scaled: 20/group + 4 bytes per (row, hash) — independent
        # of m, so default-m per-key filters direct-emit fine
        assert spec.fold_bytes_bound(5000, 6000) == 20 * 5000 + 4 * 5 * 6000
        big = bloom_spec(1 << 24, 7)
        assert big.fold_bytes_bound(4096, 10_000) < sa.DIRECT_EMIT_BYTES_CAP
        direct = {
            r["k"]: bytes(r[SKETCH_COL])
            for r in sketch_agg(df, F.xxhash64("e"), spec, by=("k",), direct_emit_groups=1).collect()
        }
        orig = sa.DIRECT_EMIT_BYTES_CAP
        try:
            sa.DIRECT_EMIT_BYTES_CAP = 1000  # every batch exceeds it
            fallback = {
                r["k"]: bytes(r[SKETCH_COL])
                for r in sketch_agg(df, F.xxhash64("e"), spec, by=("k",), direct_emit_groups=1).collect()
            }
        finally:
            sa.DIRECT_EMIT_BYTES_CAP = orig
        assert direct == fallback

    def test_kll_fold_compacts_over_cap_groups(self):
        """A skewed key that concentrates >k values in one batch must
        emit the COMPACTED sketch (scalar-update parity), not an
        unbounded raw level-0 dump."""
        rng = np.random.default_rng(13)
        vals = rng.normal(size=6000)
        inv = np.zeros(6000, dtype=np.int64)
        inv[:500] = np.arange(500) % 300  # 300 small groups too
        data, offs = kll.fold_groups_level0(vals, inv, 300, k=200)
        lens = np.diff(offs)
        assert lens[0] < 32 + 8 * 1000  # compacted, not ~5500 raw values
        sk = kll.KllSketch(200)
        sk.update(vals[inv == 0])
        assert bytes(data[offs[0] : offs[1]]) == sk.encode()
        for g in (1, 5, 299):  # small groups: level-0 parity as before
            sk = kll.KllSketch(200)
            sk.update(vals[inv == g])
            assert bytes(data[offs[g] : offs[g + 1]]) == sk.encode()

    def test_spacesaving_merge_bytes_order_independent(self):
        """Merged summary bytes must be a pure function of the summary
        map: merge(A,B) == merge(B,A) byte-for-byte even when truncation
        fires (shuffle arrival order must not leak into checkpoints)."""

        def mk(seed):
            s = ss.SpaceSaving(32)
            vals = [f"w{int(v) % 200}" for v in np.random.default_rng(seed).zipf(1.3, 5000)]
            s.update_batch(np.asarray(vals, dtype=object))
            return s

        ab = mk(1).merge(mk(2))
        ba = mk(2).merge(mk(1))
        assert len(ab.counts) > 0
        assert ab.counts == ba.counts and ab.theta == ba.theta and ab.n == ba.n
        assert ab.encode() == ba.encode()

    def test_bloom_merge_keeps_dense_rows_packed(self, monkeypatch):
        """r4 second-review finding: dense (v1) Bloom partials must OR
        as packed byte matrices — never unpack to per-bit items (an 8x
        blowup plus a 16B-per-set-bit sort at default m). Gate: a merge
        whose inputs and output are dense runs with np.unpackbits
        BROKEN (only the rare heavy-but-sparse-output corner may
        unpack)."""
        rng = np.random.default_rng(16)
        sketches = []
        for _ in range(6):
            st = bloom.empty(1 << 14)
            bloom.update(st, rng.integers(-(2**63), 2**63 - 1, 4000, dtype=np.int64), 5)
            sketches.append(bloom.encode(st, 5))
        assert all(b[4] == 1 for b in sketches)  # dense inputs
        want = bloom.encode(bloom.merge([bloom.decode(b)[0] for b in sketches]), 5)
        flat = np.frombuffer(b"".join(sketches), dtype=np.uint8)
        offs = np.concatenate(([0], np.cumsum([len(b) for b in sketches])))

        def boom(*a, **kw):
            raise AssertionError("np.unpackbits called in packed dense merge")

        monkeypatch.setattr(np, "unpackbits", boom)
        md, mo = bloom.merge_groups_flat(
            flat, offs, np.zeros(6, dtype=np.int64), 1, 1 << 14, 5
        )
        monkeypatch.undo()
        assert bytes(md[mo[0] : mo[1]]) == want

    def test_cms_merge_drops_zero_sum_counters(self):
        """Third-party buffers may carry negative counts; counters that
        cancel to zero must be dropped like the scalar encoder does, so
        arrow == pandas bytes and the output stays canonical."""
        dw = 3 * 32
        pos = cms.empty(3, 32)
        cms.update(pos, np.array([5, 7], dtype=np.int64))
        neg = -pos  # cancels everything
        half = cms.empty(3, 32)
        cms.update(half, np.array([5], dtype=np.int64))
        bufs = [cms.encode(pos), cms.encode(neg.copy()), cms.encode(half)]
        # hand-encode the negative state (encode works fine on it: nnz
        # counts nonzeros regardless of sign)
        flat = np.frombuffer(b"".join(bufs), dtype=np.uint8)
        offs = np.concatenate(([0], np.cumsum([len(b) for b in bufs])))
        md, mo = cms.merge_groups_flat(flat, offs, np.array([0, 0, 0]), 1, 3, 32)
        expected = cms.encode(cms.merge([cms.decode(b) for b in bufs]))
        assert bytes(md[mo[0] : mo[1]]) == expected
        merged = cms.decode(bytes(md[mo[0] : mo[1]]))
        assert np.array_equal(merged, half)  # pos+neg cancelled


class TestNoPerGroupPython:
    """Structural gate: for vectorized specs, merge_sketch_batch must
    never call the scalar kernel entry points — passthrough singles and
    grouped merges both go through the flat machinery."""

    def _drive(self, spec, data, offs, n_singles, n_multi):
        """Build a batch of n_singles one-partial groups + n_multi
        two-partial groups from consecutive rows of (data, offs), BREAK
        every scalar hook on the spec object (the merge binds spec
        attributes, so patching the spec is airtight), and merge."""
        import pyarrow as pa

        keys, bufs = [], []
        n_rows = len(offs) - 1
        i = 0
        for g in range(n_singles):
            keys.append(f"s{g}")
            bufs.append(bytes(data[offs[i] : offs[i + 1]]))
            i += 1
        for g in range(n_multi):
            for _ in range(2):
                keys.append(f"m{g}")
                bufs.append(bytes(data[offs[i] : offs[i + 1]]))
                i += 1
        assert i <= n_rows
        batch = pa.record_batch(
            [pa.array(keys), pa.array(bufs, type=pa.binary())],
            names=["k", SKETCH_COL],
        )

        def boom(*a, **kw):
            raise AssertionError("scalar kernel called in vectorized merge stage")

        spec.decode = boom
        spec.merge = boom
        spec.update = boom
        spec.encode = boom
        spec.zero = boom
        out = merge_sketch_batch(batch, ["k"], SKETCH_COL, spec)
        assert out.num_rows == n_singles + n_multi
        return {
            out.column("k")[j].as_py(): out.column(SKETCH_COL)[j].as_py()
            for j in range(out.num_rows)
        }

    def test_kmv(self):
        _, inv, h = _pairs(8, n=30_000, n_groups=500)
        spec = kmv_spec(64)
        data, offs = kmv.fold_groups_hashes(h, inv, 500, k=64)
        expected = {}
        for g in range(100):
            expected[f"s{g}"] = bytes(data[offs[g] : offs[g + 1]])
        for g in range(150):
            a = kmv.decode(bytes(data[offs[100 + 2 * g] : offs[100 + 2 * g + 1]]))
            b = kmv.decode(bytes(data[offs[100 + 2 * g + 1] : offs[100 + 2 * g + 2]]))
            expected[f"m{g}"] = kmv.merge_all([a, b]).encode()
        got = self._drive(spec, data, offs, 100, 150)
        assert got == expected

    def test_cms(self):
        _, inv, h = _pairs(9, n=30_000, n_groups=400)
        spec = cms_spec(3, 64)
        data, offs = cms.fold_groups(h, inv, 400, 3, 64)
        got = self._drive(spec, data, offs, 100, 150)
        assert len(got) == 250

    def test_bloom(self):
        _, inv, h = _pairs(11, n=30_000, n_groups=400)
        spec = bloom_spec(1 << 10, 5)
        data, offs = bloom.fold_groups(h, inv, 400, 1 << 10, 5)
        got = self._drive(spec, data, offs, 100, 150)
        assert len(got) == 250

    def test_kll_singles_passthrough(self):
        """KLL has no vectorized merge — but singles (the ~only regime at
        high-cardinality by) must pass through without touching the
        scalar decode."""
        rng, inv, _ = _pairs(10, n=20_000, n_groups=300)
        vals = rng.normal(size=len(inv))
        spec = kll_spec(100)
        data, offs = kll.fold_groups_level0(vals, inv, 300, 100)
        got = self._drive(spec, data, offs, 300, 0)
        assert len(got) == 300

    def test_cms_sparse_wire(self):
        """Sparse (v2) CMS encoding: the canonical encoder picks sparse
        iff strictly smaller; the passthrough probe enforces that rule
        on both sides (dense-but-eligible and corrupt-sparse re-route)."""
        rng = np.random.default_rng(12)
        few = cms.empty(5, 2048)
        cms.update(few, rng.integers(-(2**63), 2**63 - 1, 2, dtype=np.int64))
        many = cms.empty(5, 2048)
        cms.update(many, rng.integers(-(2**63), 2**63 - 1, 100_000, dtype=np.int64))
        bf, bm = cms.encode(few), cms.encode(many)
        assert bf[4] == 2 and len(bf) < 200          # sparse, tiny
        assert bm[4] == 1 and len(bm) == 16 + 5 * 2048 * 8  # dense dump
        for b, st in ((bf, few), (bm, many)):
            assert np.array_equal(cms.decode(b), st)
            assert cms.encode(cms.decode(b)) == b
        # dense bytes for a sparse-eligible state: decodable, NOT canonical
        nc = cms.MAGIC + np.array([1, 5, 2048], dtype="<u4").tobytes() + few.astype("<i8").tobytes()
        flat = np.frombuffer(nc, dtype=np.uint8)
        assert np.array_equal(cms.decode(nc), few)
        assert not cms.valid_flat(flat, np.array([0, len(nc)]), 5, 2048).any()
        # unsorted sparse entries: rejected by decode AND the probe
        two = cms.empty(3, 32)
        cms.update(two, np.array([5, 9], dtype=np.int64))
        b2 = bytearray(cms.encode(two))
        b2[20:32], b2[32:44] = b2[32:44], b2[20:32]
        with pytest.raises(ValueError, match="Invalid CMS"):
            cms.decode(bytes(b2))
        flat2 = np.frombuffer(bytes(b2), dtype=np.uint8)
        assert not cms.valid_flat(flat2, np.array([0, len(b2)]), 3, 32).any()

    def test_cms_merge_partition_independent_for_noncanonical_single(self):
        """The dense-encoded-but-sparse-eligible single must merge to the
        same bytes whether alone or sharing its group — the HLL
        canonicality invariant, ported to the CMS passthrough."""
        import pyarrow as pa

        st = cms.empty(3, 32)
        cms.update(st, np.array([5], dtype=np.int64))
        nc = cms.MAGIC + np.array([1, 3, 32], dtype="<u4").tobytes() + st.astype("<i8").tobytes()
        empty_b = cms.encode(cms.empty(3, 32))
        spec = cms_spec(3, 32)
        one = pa.record_batch(
            [pa.array(["g"]), pa.array([nc], type=pa.binary())], names=["k", SKETCH_COL]
        )
        split = pa.record_batch(
            [pa.array(["g", "g"]), pa.array([nc, empty_b], type=pa.binary())],
            names=["k", SKETCH_COL],
        )
        o1 = merge_sketch_batch(one, ["k"], SKETCH_COL, spec).column(SKETCH_COL)[0].as_py()
        o2 = merge_sketch_batch(split, ["k"], SKETCH_COL, spec).column(SKETCH_COL)[0].as_py()
        assert o1 == o2 == cms.encode(st)

    def test_bloom_sparse_wire(self):
        """Sparse (v2) Bloom encoding: canonical-iff-strictly-smaller,
        roundtrip stability, duplicate-byte scatter, and the passthrough
        probe rejecting dense-but-eligible bytes."""
        rng = np.random.default_rng(15)
        few = bloom.empty(1 << 20)
        bloom.update(few, rng.integers(-(2**63), 2**63 - 1, 2, dtype=np.int64), 7)
        many = bloom.empty(1 << 12)
        bloom.update(many, rng.integers(-(2**63), 2**63 - 1, 50_000, dtype=np.int64), 5)
        bf, bm = bloom.encode(few, 7), bloom.encode(many, 5)
        assert bf[4] == 2 and len(bf) < 100        # sparse, tiny at default m
        assert bm[4] == 1 and len(bm) == 16 + (1 << 9)  # dense dump
        for b, st in ((bf, few), (bm, many)):
            assert np.array_equal(bloom.decode(b)[0], st)
            assert bloom.encode(*bloom.decode(b)) == b
        # two bits in ONE byte must survive the v2 decode scatter
        st = bloom.empty(1 << 10)
        st[3] = 0b10000001  # bits 24 and 31
        b = bloom.encode(st, 5)
        assert b[4] == 2
        assert np.array_equal(bloom.decode(b)[0], st)
        # dense bytes for a sparse-eligible state: decodable, NOT canonical
        one = bloom.empty(1 << 10)
        bloom.update(one, np.array([5], dtype=np.int64), 5)
        nc = bloom.MAGIC + np.array([1, 1 << 10, 5], dtype="<u4").tobytes() + one.tobytes()
        flat = np.frombuffer(nc, dtype=np.uint8)
        assert np.array_equal(bloom.decode(nc)[0], one)
        assert not bloom.valid_flat(flat, np.array([0, len(nc)]), 1 << 10, 5).any()

    def test_near_unique_1m_gate_fresh_jvm(self):
        """VERDICT r3 done-criterion: kmv / cms / bloom sketches (CMS at
        the DEFAULT width, Bloom at the default 1M-key sizing — feasible
        only because of the sparse wire formats) at 1M rows / 900k
        near-unique groups within ~3x of the low-card case. Fresh JVM
        via tools/sketch_highcard_gate.py (the shared test session
        measures GC archaeology — see tools/highcard_gate rationale);
        A-B-A low-card timing + one retry for noise bursts."""
        import json
        import os
        import subprocess
        import sys

        gate = os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            "tools",
            "sketch_highcard_gate.py",
        )
        kinds = ("kmv", "cms", "bloom")
        for _ in range(2):
            out = subprocess.run(
                [sys.executable, gate], capture_output=True, text=True, timeout=1800
            )
            assert out.returncode == 0, out.stderr[-2000:]
            r = json.loads(out.stdout.strip().splitlines()[-1])
            for kind in kinds:
                assert r[kind]["g_lo"] == 17
                assert r[kind]["g_hi"] == 900_000
            if all(r[k]["t_hi"] <= 3.0 * r[k]["t_lo"] + 4.0 for k in kinds):
                break
        else:
            raise AssertionError(f"sketch high-card gate failed twice: {r}")

    def test_spacesaving_singles_passthrough(self):
        spec = spacesaving_spec(16)
        bufs = []
        for i in range(200):
            s = ss.SpaceSaving(16)
            s.update_batch(np.asarray([f"v{i}", f"v{i}", "common"], dtype=object))
            bufs.append(s.encode())
        flat = np.frombuffer(b"".join(bufs), dtype=np.uint8)
        offs = np.zeros(201, dtype=np.int64)
        offs[1:] = np.cumsum([len(b) for b in bufs])
        got = self._drive(spec, flat, offs, 200, 0)
        assert got == {f"s{i}": bufs[i] for i in range(200)}
