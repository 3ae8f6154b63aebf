"""Extension sketch kernels (SURVEY.md §2.4): published-bound error gates,
merge associativity/commutativity, serialization round-trips."""

import numpy as np
import pytest

from pfutil_spark.kernel import bloom, cms, kll, tdigest
from pfutil_spark.kernel.sketch_common import splitmix64


def hashes_of(ids) -> np.ndarray:
    return splitmix64(np.asarray(ids, dtype=np.uint64))


# ---------------------------------------------------------------------------
# count-min
# ---------------------------------------------------------------------------

class TestCMS:
    def test_exact_for_small_sets(self):
        s = cms.empty()
        ids = np.repeat(np.arange(50), np.arange(1, 51))  # item i occurs i+1 times
        cms.update(s, hashes_of(ids))
        est = cms.query(s, hashes_of(np.arange(50)))
        np.testing.assert_array_equal(est, np.arange(1, 51))

    def test_overcount_bound(self):
        s = cms.empty(depth=5, width=2048)
        rng = np.random.default_rng(0)
        ids = rng.integers(0, 50_000, size=200_000)
        cms.update(s, hashes_of(ids))
        exact = np.bincount(ids, minlength=50_000)
        est = cms.query(s, hashes_of(np.arange(50_000)))
        assert (est >= exact).all()  # never undercounts
        eps, delta = cms.error_bound(5, 2048)
        n = len(ids)
        frac_over = ((est - exact) > eps * n).mean()
        assert frac_over <= delta * 5  # generous slack on the tail prob

    def test_merge_is_sum_and_orderless(self):
        rng = np.random.default_rng(1)
        parts = [hashes_of(rng.integers(0, 1000, size=5000)) for _ in range(4)]
        states = []
        for p in parts:
            s = cms.empty()
            cms.update(s, p)
            states.append(s)
        merged = cms.merge(states)
        merged_rev = cms.merge(states[::-1])
        np.testing.assert_array_equal(merged, merged_rev)
        whole = cms.empty()
        cms.update(whole, np.concatenate(parts))
        np.testing.assert_array_equal(merged, whole)
        assert cms.total(merged) == 20_000

    def test_weighted_update_and_roundtrip(self):
        s = cms.empty(depth=3, width=64)
        cms.update(s, hashes_of([1, 2]), counts=np.array([10, 5]))
        est = cms.query(s, hashes_of([1, 2]))
        assert est[0] >= 10 and est[1] >= 5
        s2 = cms.decode(cms.encode(s))
        np.testing.assert_array_equal(s, s2)
        with pytest.raises(ValueError):
            cms.decode(b"XXXX" + bytes(16))


# ---------------------------------------------------------------------------
# Bloom
# ---------------------------------------------------------------------------

class TestBloom:
    def test_no_false_negatives(self):
        m, k = bloom.params_for(10_000, fpr=0.01)
        s = bloom.empty(m)
        members = hashes_of(np.arange(10_000))
        bloom.update(s, members, k)
        assert bloom.contains(s, members, k).all()

    def test_fpr_within_target(self):
        m, k = bloom.params_for(10_000, fpr=0.01)
        s = bloom.empty(m)
        bloom.update(s, hashes_of(np.arange(10_000)), k)
        non_members = hashes_of(np.arange(1_000_000, 1_100_000))
        fpr = bloom.contains(s, non_members, k).mean()
        assert fpr <= 0.03  # 3x target as slack

    def test_merge_or_idempotent_orderless(self):
        m, k = 1 << 16, 5
        a, b = bloom.empty(m), bloom.empty(m)
        bloom.update(a, hashes_of(np.arange(0, 500)), k)
        bloom.update(b, hashes_of(np.arange(400, 900)), k)
        ab = bloom.merge([a, b])
        ba = bloom.merge([b, a])
        np.testing.assert_array_equal(ab, ba)
        np.testing.assert_array_equal(bloom.merge([ab, a]), ab)  # idempotent
        assert bloom.contains(ab, hashes_of(np.arange(0, 900)), k).all()

    def test_roundtrip(self):
        m, k = 1 << 12, 3
        s = bloom.empty(m)
        bloom.update(s, hashes_of([7, 8, 9]), k)
        s2, k2 = bloom.decode(bloom.encode(s, k))
        assert k2 == k
        np.testing.assert_array_equal(s, s2)


# ---------------------------------------------------------------------------
# KLL
# ---------------------------------------------------------------------------

class TestKLL:
    def test_rank_error_bound(self):
        rng = np.random.default_rng(2)
        data = rng.normal(size=100_000)
        sk = kll.KllSketch(200)
        for chunk in np.array_split(data, 10):
            sk.update(chunk)
        assert sk.n == len(data)
        for q in (0.01, 0.1, 0.25, 0.5, 0.75, 0.9, 0.99):
            est = sk.quantile(q)
            true_rank = (data <= est).mean()
            assert abs(true_rank - q) <= 0.025, (q, est, true_rank)

    def test_merge_matches_whole_within_bound(self):
        rng = np.random.default_rng(3)
        data = rng.exponential(size=60_000)
        parts = np.array_split(data, 6)
        sketches = []
        for p in parts:
            s = kll.KllSketch(200)
            s.update(p)
            sketches.append(s)
        merged = kll.merge_all(sketches)
        assert merged.n == len(data)
        for q in (0.1, 0.5, 0.9):
            est = merged.quantile(q)
            true_rank = (data <= est).mean()
            assert abs(true_rank - q) <= 0.03

    def test_rank_query_and_roundtrip(self):
        sk = kll.KllSketch(200)
        sk.update(np.arange(10_000, dtype=float))
        assert abs(sk.rank(5000.0) - 0.5) <= 0.03
        sk2 = kll.decode(sk.encode())
        assert sk2.n == sk.n
        np.testing.assert_array_equal(sk2.quantile([0.25, 0.5]), sk.quantile([0.25, 0.5]))
        with pytest.raises(ValueError):
            kll.decode(b"NOPE" + bytes(30))

    def test_nan_ignored_empty_quantile(self):
        sk = kll.KllSketch()
        sk.update(np.array([np.nan, np.nan]))
        assert sk.n == 0
        assert np.isnan(sk.quantile(0.5))


# ---------------------------------------------------------------------------
# t-digest
# ---------------------------------------------------------------------------

class TestTDigest:
    def test_quantile_accuracy_tails(self):
        rng = np.random.default_rng(4)
        data = rng.normal(size=200_000)
        td = tdigest.TDigest(100)
        for chunk in np.array_split(data, 4):
            td.update(chunk)
        assert td.n == len(data)
        assert len(td.means) <= 120  # bounded by ~delta
        for q, tol in ((0.001, 0.002), (0.01, 0.005), (0.5, 0.02), (0.99, 0.005), (0.999, 0.002)):
            est = td.quantile(q)
            true_rank = (data <= est).mean()
            assert abs(true_rank - q) <= tol, (q, est, true_rank)

    def test_merge_matches_whole_within_bound(self):
        rng = np.random.default_rng(5)
        data = rng.lognormal(size=80_000)
        parts = np.array_split(data, 8)
        digests = []
        for p in parts:
            d = tdigest.TDigest(100)
            d.update(p)
            digests.append(d)
        merged = tdigest.merge_all(digests)
        assert abs(merged.n - len(data)) < 1e-6
        for q in (0.05, 0.5, 0.95):
            est = merged.quantile(q)
            true_rank = (data <= est).mean()
            assert abs(true_rank - q) <= 0.02

    def test_cdf_min_max_and_roundtrip(self):
        td = tdigest.TDigest(100)
        td.update(np.arange(1000, dtype=float))
        assert td.quantile(0.0) == 0.0 and td.quantile(1.0) == 999.0
        assert abs(td.cdf(500.0) - 0.5) <= 0.02
        td2 = tdigest.decode(td.encode())
        np.testing.assert_allclose(td2.quantile([0.1, 0.9]), td.quantile([0.1, 0.9]))
        assert td2.vmin == td.vmin and td2.vmax == td.vmax


# ---------------------------------------------------------------------------
# KMV / theta
# ---------------------------------------------------------------------------

class TestKMV:
    def test_exact_regime_below_k(self):
        from pfutil_spark.kernel import kmv

        s = kmv.KmvSketch(256)
        s.update(hashes_of(np.arange(200)))
        s.update(hashes_of(np.arange(100, 200)))  # re-adds are no-ops
        assert s.estimate() == 200.0
        assert kmv.decode(s.encode()).encode() == s.encode()

    def test_estimate_within_published_rse(self):
        from pfutil_spark.kernel import kmv

        k, n = 1024, 500_000
        s = kmv.KmvSketch(k)
        h = hashes_of(np.arange(n))
        for i in range(0, n, 50_000):
            s.update(h[i : i + 50_000])
        rse = 1 / np.sqrt(k - 2)
        assert abs(s.estimate() - n) <= 5 * rse * n

    def test_bytes_invariant_across_partitioning_and_merge_order(self):
        from pfutil_spark.kernel import kmv

        h = hashes_of(np.arange(100_000))
        whole = kmv.KmvSketch(512).update(h).encode()
        rng = np.random.default_rng(5)
        for splits in (3, 7, 16):
            parts = np.array_split(rng.permutation(h), splits)
            sks = [kmv.KmvSketch(512).update(p) for p in parts]
            order = rng.permutation(splits)
            out = sks[order[0]]
            for i in order[1:]:
                out.merge(sks[i])
            assert out.encode() == whole

    def test_set_ops_vs_exact(self):
        from pfutil_spark.kernel import kmv

        k = 2048
        a_ids = np.arange(0, 300_000)
        b_ids = np.arange(280_000, 500_000)
        A = kmv.KmvSketch(k).update(hashes_of(a_ids))
        B = kmv.KmvSketch(k).update(hashes_of(b_ids))
        rse = 1 / np.sqrt(k - 2)
        assert abs(kmv.union_estimate([A, B]) - 500_000) <= 5 * rse * 500_000
        # intersection error is relative to its own sample (~k*i/u points),
        # NOT the union — the whole reason this sketch exists next to HLL
        i_sample = k * 20_000 / 500_000
        assert abs(kmv.intersect_estimate(A, B) - 20_000) <= 5 / np.sqrt(i_sample) * 20_000
        assert abs(kmv.a_not_b_estimate(A, B) - 280_000) <= 5 * rse * 280_000 * 2
        j = kmv.jaccard_estimate(A, B)
        assert abs(j - 0.04) <= 5 / np.sqrt(i_sample) * 0.04

    def test_disjoint_and_identical_sets(self):
        from pfutil_spark.kernel import kmv

        A = kmv.KmvSketch(256).update(hashes_of(np.arange(0, 50_000)))
        B = kmv.KmvSketch(256).update(hashes_of(np.arange(50_000, 100_000)))
        # disjoint: intersection sample is empty -> estimate exactly 0
        assert kmv.intersect_estimate(A, B) == 0.0
        assert kmv.jaccard_estimate(A, B) == 0.0
        # identical: jaccard exactly 1, a_not_b exactly 0
        C = kmv.KmvSketch(256).update(hashes_of(np.arange(0, 50_000)))
        assert kmv.jaccard_estimate(A, C) == 1.0
        assert kmv.a_not_b_estimate(A, C) == 0.0

    def test_corrupt_and_mismatched_rejected(self):
        from pfutil_spark.kernel import kmv

        s = kmv.KmvSketch(64).update(hashes_of(np.arange(40)))
        for bad in (b"XXXX" + bytes(20), s.encode()[:10], s.encode() + b"\x00"):
            with pytest.raises(ValueError, match="Invalid KMV"):
                kmv.decode(bad)
        # unsorted entry stream rejected (not a valid canonical sketch)
        good = bytearray(s.encode())
        good[16:24], good[24:32] = good[24:32], good[16:24]
        with pytest.raises(ValueError, match="Invalid KMV"):
            kmv.decode(bytes(good))
        with pytest.raises(ValueError, match="k mismatch"):
            kmv.KmvSketch(64).merge(kmv.KmvSketch(128))
        with pytest.raises(ValueError, match="k >= 3"):
            kmv.KmvSketch(2)


class TestWeightedKernels:
    def test_tdigest_weighted_equals_replication_and_drop_rules(self):
        rng = np.random.default_rng(7)
        vals = rng.normal(50, 10, 5000)
        wts = rng.integers(1, 6, 5000).astype(float)
        td_w = tdigest.TDigest(100)
        td_w.update_weighted(vals, wts)
        rep = np.repeat(vals, wts.astype(int))
        assert td_w.n == rep.size
        qs = np.array([0.05, 0.5, 0.95, 0.99])
        for q, est in zip(qs, td_w.quantile(qs)):
            rank = float(np.mean(rep <= est))
            assert abs(rank - q) <= 0.02, (q, est, rank)
        td = tdigest.TDigest(100)
        td.update_weighted(
            np.array([1.0, 2.0, np.nan, 4.0]), np.array([1.0, -1.0, 2.0, np.nan])
        )
        assert td.n == 1.0 and td.quantile(0.5) == 1.0

    def test_tdigest_weighted_fold_matches_scalar_per_group(self):
        rng = np.random.default_rng(5)
        n = 50_000
        g = rng.integers(0, 40, n)
        v = rng.normal(0, 1, n) + g * 0.1
        w = rng.random(n) * 3
        data, offs = tdigest.fold_groups_weighted(v, w, g, 40)
        assert tdigest.valid_flat(
            np.frombuffer(bytes(data), dtype=np.uint8), offs, 100
        ).all()
        qs = np.array([0.1, 0.5, 0.9])
        for gi in range(40):
            dd = tdigest.decode(bytes(data[offs[gi] : offs[gi + 1]]))
            m = g == gi
            ref = tdigest.TDigest(100)
            ref.update_weighted(v[m], w[m])
            assert abs(dd.n - ref.n) < 1e-9 * max(1.0, ref.n)
            assert np.abs(dd.quantile(qs) - ref.quantile(qs)).max() < 0.2

    def test_tdigest_weighted_fold_empty_and_trailing_groups(self):
        g = np.array([0, 0, 2])
        v = np.array([1.0, 2.0, 3.0])
        w = np.array([1.0, 1.0, np.nan])
        data, offs = tdigest.fold_groups_weighted(v, w, g, 5)
        for gi in (1, 2, 3, 4):  # group 2's only row dropped; 3-4 never seen
            dd = tdigest.decode(bytes(data[offs[gi] : offs[gi + 1]]))
            assert dd.n == 0.0, gi

    def test_cms_weighted_fold_unit_weights_byte_identical(self):
        rng = np.random.default_rng(3)
        h = rng.integers(0, 2**63, 5000)
        g = rng.integers(0, 20, 5000)
        d1, o1 = cms.fold_groups(h, g, 20, 4, 512)
        d2, o2 = cms.fold_groups_weighted(
            h, np.ones(5000, dtype=np.int64), g, 20, 4, 512
        )
        assert (o1 == o2).all() and bytes(d1) == bytes(d2)

    def test_cms_weighted_fold_matches_scalar_update(self):
        rng = np.random.default_rng(3)
        h = rng.integers(0, 2**63, 5000)
        g = rng.integers(0, 20, 5000)
        w = rng.integers(1, 9, 5000)
        data, offs = cms.fold_groups_weighted(h, w, g, 20, 4, 512)
        for gi in range(20):
            st = cms.empty(4, 512)
            m = g == gi
            cms.update(st, h[m], counts=w[m])
            assert bytes(data[offs[gi] : offs[gi + 1]]) == cms.encode(st), gi

    def test_cms_weighted_nonpositive_weights_dropped(self):
        data, offs = cms.fold_groups_weighted(
            np.array([1, 2, 3], dtype=np.uint64),
            np.array([5, 0, -2]),
            np.zeros(3, dtype=np.int64),
            1, 4, 512,
        )
        st = cms.empty(4, 512)
        cms.update(st, np.array([1], dtype=np.uint64), counts=np.array([5]))
        assert bytes(data) == cms.encode(st)

    # -- weighted KLL (binary-expansion insertion) --------------------------

    def test_kll_weighted_unit_weights_byte_identical(self):
        rng = np.random.default_rng(11)
        v = rng.normal(size=4000)
        a = kll.KllSketch(200)
        b = kll.KllSketch(200)
        for s in range(0, len(v), 900):
            a.update(v[s : s + 900])
            b.update_weighted(v[s : s + 900], np.ones(len(v[s : s + 900]), dtype=np.int64))
        assert a.encode() == b.encode()

    def test_kll_weighted_quantiles_vs_exact_weighted_rank(self):
        rng = np.random.default_rng(12)
        v = rng.uniform(0, 1000, 20_000)
        w = rng.integers(1, 500, 20_000)
        sk = kll.KllSketch(200)
        for s in range(0, len(v), 3000):
            sk.update_weighted(v[s : s + 3000], w[s : s + 3000])
        assert sk.n == int(w.sum())
        order = np.argsort(v)
        cum = np.cumsum(w[order])
        for q in (0.05, 0.25, 0.5, 0.75, 0.95):
            est = sk.quantile(q)
            rank = cum[np.searchsorted(v[order], est, "right") - 1] / cum[-1]
            assert abs(rank - q) < 0.03, (q, est, rank)

    def test_kll_weighted_drop_rules(self):
        sk = kll.KllSketch(200)
        sk.update_weighted(
            np.array([1.0, 2.0, np.nan, 4.0, 5.0]),
            np.array([3, 0, 2, -1, np.nan], dtype=object).astype(float),
        )
        # only (1.0, w=3) survives: NaN value, zero/negative/NaN weights drop
        assert sk.n == 3 and sk.quantile(0.5) == 1.0

    def test_kll_weighted_fold_matches_scalar_per_group(self):
        rng = np.random.default_rng(13)
        n, ng = 30_000, 500
        g = rng.integers(0, ng, n)
        v = rng.normal(size=n)
        w = rng.integers(1, 100, n)
        v[g == 5] = np.nan   # all-dropped group (NaN values)
        w[g == 6] = 0        # all-dropped group (zero weights)
        g[g == 7] = 8        # never-seen group id 7
        data, offs = kll.fold_groups_weighted(v, w, g, ng, 200)
        assert kll.valid_flat(
            np.frombuffer(bytes(data), dtype=np.uint8), offs.astype(np.int64), 200
        ).all()
        for gi in range(ng):
            m = g == gi
            ref = kll.KllSketch(200)
            ref.update_weighted(v[m], w[m])
            assert bytes(data[offs[gi] : offs[gi + 1]]) == ref.encode(), gi

    def test_kll_weighted_fold_big_group_compacts(self):
        """A group whose expanded items exceed the level capacities goes
        through the scalar sketch — same bytes as the scalar update."""
        rng = np.random.default_rng(14)
        n = 5000
        v = rng.normal(size=n)
        w = rng.integers(1, 1000, n)
        g = np.zeros(n, dtype=np.int64)
        data, offs = kll.fold_groups_weighted(v, w, g, 1, 200)
        ref = kll.KllSketch(200)
        ref.update_weighted(v, w)
        assert ref.compactions > 0  # really exercised the big path
        assert bytes(data[offs[0] : offs[1]]) == ref.encode()

    def test_kll_weighted_huge_weight_levels(self):
        sk = kll.KllSketch(200)
        sk.update_weighted(np.array([42.0]), np.array([(1 << 40) + 12345]))
        assert sk.n == (1 << 40) + 12345
        assert sk.quantile(0.5) == 42.0
        # round-trips and merges like any other sketch
        other = kll.KllSketch(200)
        other.update(np.full(10, 7.0))
        merged = kll.decode(sk.encode()).merge(other)
        assert merged.n == sk.n + 10
        assert merged.quantile(0.5) == 42.0  # weight dominates

    def test_kll_popcount_sum(self):
        assert kll.popcount_sum(np.array([1, 3, 7, (1 << 62) + 1])) == 8
        assert kll.popcount_sum(np.array([0, -5])) == 0  # nonpositive ignored
        assert kll.popcount_sum(np.array([], dtype=np.int64)) == 0

    def test_kll_popcount_sum_float_weights_no_warning(self):
        """popcount_sum shares _int_weights coercion: NaN/inf -> 0,
        finite overflow saturates, and no RuntimeWarning fires (the old
        bare int64 cast was platform-defined on such inputs)."""
        import warnings

        with warnings.catch_warnings():
            warnings.simplefilter("error")
            # 3.0 -> 2 bits; nan/inf -> 0; 1e300 saturates to 2**62 -> 1
            assert kll.popcount_sum(np.array([3.0, np.nan, np.inf, 1e300])) == 3

    def test_kll_weight_overflow_saturates_not_dropped(self):
        """A finite float weight beyond int64 range saturates at 2**62
        instead of hitting the platform-defined float->int cast (x86:
        INT64_MIN, which the w > 0 filter then silently DROPPED — the
        heaviest row contributing nothing)."""
        import warnings

        sk = kll.KllSketch(200)
        with warnings.catch_warnings():
            warnings.simplefilter("error")
            sk.update_weighted(
                np.array([42.0, 7.0]), np.array([1e300, 1.0])
            )
        assert sk.n == (1 << 62) + 1
        assert sk.quantile(0.5) == 42.0  # saturated row still dominates
