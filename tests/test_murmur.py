"""Hash kernel parity tests (reference layer-1: HllUtilTest.java)."""

import numpy as np
import pytest

from pfutil_spark.kernel.murmur import HLL_SEED, murmur64a, murmur64a_scalar


def test_reference_vector():
    # core/src/test/java/com/mayreh/pfutil/HllUtilTest.java:19-25
    data = b"Lorem ipsum dolor sit amet, consectetur adipisicing elit"
    assert murmur64a_scalar(data, 0xE17A1465) == 0x0920E0C1B7EEB261
    out = murmur64a([data], 0xE17A1465)
    assert int(out[0]) == 0x0920E0C1B7EEB261


@pytest.mark.parametrize("seed", [0xE17A1465, HLL_SEED, 0, 0xFFFFFFFF])
def test_vectorized_matches_scalar_all_lengths(seed):
    rng = np.random.default_rng(42)
    datas = []
    for ln in list(range(0, 40)) + [63, 64, 65, 127, 128, 1000]:
        datas.append(rng.integers(0, 256, size=ln, dtype=np.uint8).tobytes())
    expected = np.array([murmur64a_scalar(d, seed) for d in datas], dtype=np.uint64)
    got = murmur64a(datas, seed)
    assert got.dtype == np.uint64
    np.testing.assert_array_equal(got, expected)


def test_uniform_fastpath_matches_scalar():
    rng = np.random.default_rng(7)
    for ln in (8, 64, 13):  # multiple-of-8 fast path and padded uniform path
        datas = [rng.integers(0, 256, size=ln, dtype=np.uint8).tobytes() for _ in range(100)]
        expected = np.array([murmur64a_scalar(d) for d in datas], dtype=np.uint64)
        np.testing.assert_array_equal(murmur64a(datas), expected)


def test_empty_batch_and_empty_elements():
    assert murmur64a([]).shape == (0,)
    got = murmur64a([b"", b"a", b""])
    exp = np.array([murmur64a_scalar(b""), murmur64a_scalar(b"a"), murmur64a_scalar(b"")],
                   dtype=np.uint64)
    np.testing.assert_array_equal(got, exp)
