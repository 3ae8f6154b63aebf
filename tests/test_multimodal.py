"""Multimodal plumbing: schema, batching, determinism of the stubbed
decode path; real decoder correctly gated behind NotImplementedError."""

import pytest

from pfutil_spark.operators.multimodal import (
    image_features,
    resize_images,
    sample_video_frames,
    synthetic_media_table,
)


def test_image_features_deterministic_and_schema(spark):
    media = synthetic_media_table(spark, n=32)
    feats = image_features(media)
    rows = {r["media_id"]: r for r in feats.collect()}
    assert len(rows) == 32
    again = {r["media_id"]: r for r in image_features(media.repartition(5)).collect()}
    for mid, r in rows.items():
        assert tuple(r) == tuple(again[mid])
        assert r["width"] > 0 and r["height"] > 0 and r["channels"] in (1, 3)
    # same payload bytes => same features (content-keyed, like a real codec)
    assert feats.schema["phash"].dataType.typeName() == "long"


def test_resize_emits_right_sizes(spark):
    media = synthetic_media_table(spark, n=8)
    out = resize_images(media, 32, 16).collect()
    for r in out:
        assert len(bytes(r["resized"])) == 32 * 16
        assert (r["out_width"], r["out_height"]) == (32, 16)


def test_frame_sampling_explodes(spark):
    media = synthetic_media_table(spark, n=9).filter("kind = 'video'")
    frames = sample_video_frames(media, every_n=10, n_frames_col="n_frames")
    pdf = frames.toPandas()
    meta = {r["media_id"]: r["n_frames"] for r in media.select("media_id", "n_frames").collect()}
    for mid, grp in pdf.groupby("media_id"):
        expected = len(range(0, meta[mid], 10))
        assert len(grp) == expected
        assert grp["frame_sha"].nunique() == expected


def test_frame_sampling_is_pure_jvm_and_sha_exact(spark):
    """VERDICT r2 item 3: frame sampling must be a pure-JVM plan (no
    Python-eval node of any kind) and the frame fingerprint must equal
    sha256(payload || frame_no as 4 little-endian bytes)."""
    import hashlib

    media = synthetic_media_table(spark, n=6)
    frames = sample_video_frames(media, every_n=10, n_frames_col="n_frames")
    plan = frames._jdf.queryExecution().executedPlan().toString()
    for node in ("MapInPandas", "BatchEvalPython", "ArrowEvalPython", "MapInArrow"):
        assert node not in plan, f"python node {node} in frame-sampling plan"
    payloads = {r["media_id"]: bytes(r["payload"]) for r in media.collect()}
    for r in frames.collect():
        exp = hashlib.sha256(
            payloads[r["media_id"]] + int(r["frame_no"]).to_bytes(4, "little")
        ).hexdigest()
        assert r["frame_sha"] == exp
    # derived-n_frames variant (no metadata column) also explodes
    derived = sample_video_frames(media, every_n=16)
    counts = {r["media_id"]: r["n"] for r in
              derived.groupBy("media_id").count().withColumnRenamed("count", "n").collect()}
    for mid, b in payloads.items():
        nf = 30 + hashlib.sha256(b).digest()[0]
        assert counts[mid] == len(range(0, nf, 16))


def test_real_decoder_gated(spark):
    media = synthetic_media_table(spark, n=2)
    with pytest.raises(NotImplementedError):
        image_features(media, decoder="real")
