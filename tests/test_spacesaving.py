"""SpaceSaving heavy-hitters: guarantees under update and merge, Spark
two-phase plan, top-k parity with exact counts on skewed data."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from pfutil_spark.kernel import spacesaving as ss
from pfutil_spark.operators.sketch_agg import spacesaving_sketch, spacesaving_topk_col


def zipf_stream(rng, n=50_000, vocab=5_000, a=1.5):
    vals = rng.zipf(a, size=n) % vocab
    return [f"w{v}" for v in vals]


class TestKernel:
    def test_bounds_and_heavy_hitters_present(self):
        rng = np.random.default_rng(0)
        stream = zipf_stream(rng)
        sk = ss.SpaceSaving(256)
        for i in range(0, len(stream), 7000):
            sk.update_batch(stream[i : i + 7000])
        import collections

        exact = collections.Counter(stream)
        n = len(stream)
        assert sk.theta <= n // 256 + 1
        for v, c in exact.items():
            est = sk.estimate(v)
            assert est >= c, (v, est, c)  # never undercounts
            if v in sk.counts:
                assert est <= c + sk.theta
            if c > 2 * n / 256:
                assert v in sk.counts  # guaranteed presence

    def test_merge_preserves_guarantees(self):
        rng = np.random.default_rng(1)
        stream = zipf_stream(rng, n=60_000)
        parts = [stream[i::5] for i in range(5)]
        sketches = []
        for p in parts:
            s = ss.SpaceSaving(256)
            s.update_batch(p)
            sketches.append(s)
        merged = ss.merge_all(sketches)
        import collections

        exact = collections.Counter(stream)
        assert merged.n == len(stream)
        for v, c in exact.most_common(20):
            est = merged.estimate(v)
            assert est >= c
            assert est <= c + merged.theta
        # top-1 of the summary is the true top-1 (heavily skewed)
        assert merged.top_k(1)[0][0] == exact.most_common(1)[0][0]

    def test_roundtrip(self):
        sk = ss.SpaceSaving(16)
        sk.update_batch(["a", "b", "a", "c", "a"])
        back = ss.decode(sk.encode())
        assert back.counts == sk.counts and back.theta == sk.theta and back.n == sk.n
        with pytest.raises(ValueError):
            ss.decode(b"XXXX" + bytes(12))


class TestSpark:
    def test_topk_matches_exact_on_skewed(self, spark):
        ev = spark.read.parquet("/root/testdata/sf0.01/events.parquet")
        sk = spacesaving_sketch(ev, "event_type", m=64)
        top = sk.select(spacesaving_topk_col(3).alias("t")).collect()[0]["t"]
        exact = (
            ev.groupBy("event_type").agg(F.count(F.lit(1)).alias("c"))
            .orderBy(F.col("c").desc(), "event_type").limit(3).collect()
        )
        # with m=64 >> 5 distinct types the summary is exact
        assert [(r["value"], r["est_count"]) for r in top] == [
            (r["event_type"], r["c"]) for r in exact
        ]

    def test_grouped_and_partition_count_stability(self, spark):
        ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
        rows = spacesaving_sketch(ev.repartition(7), "user_id", by=("event_type",), m=128).collect()
        assert len(rows) == 5
        for r in rows:
            summ = ss.decode(bytes(r["sketch"]))
            assert summ.n == ev.filter(F.col("event_type") == r["event_type"]).count()
