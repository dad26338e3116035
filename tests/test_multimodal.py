"""Multimodal plumbing: schema, batching, deterministic fake kernels."""

import math

import pytest

from graphrag_rs_spark.operators import multimodal as mm


@pytest.fixture(scope="module")
def media(spark):
    return mm.synth_media(spark, n=48).cache()


def test_decode_stub_contract():
    with pytest.raises(NotImplementedError):
        mm.decode_image(b"xxxx")
    a = mm.decode_image(b"hello world", fake=True)
    b = mm.decode_image(b"hello world", fake=True)
    assert a.shape == (4, 4, 3)
    assert (a == b).all()


def test_extract_features_schema_and_determinism(media):
    f1 = {r["media_id"]: r for r in mm.extract_features(media).collect()}
    f2 = {r["media_id"]: r for r in
          mm.extract_features(media.repartition(7)).collect()}
    assert len(f1) == 48
    for mid, r in f1.items():
        assert len(r["feature"]) == 16
        assert r["n_bytes"] > 0
        norm = math.sqrt(sum(x * x for x in r["feature"]))
        assert math.isclose(norm, 1.0, rel_tol=1e-5)
        assert f2[mid]["feature"] == r["feature"]  # partition-invariant


def test_frame_sample_plan(media):
    plan = mm.frame_sample_plan(media, every_ms=1000).collect()
    assert plan
    by_media = {}
    for r in plan:
        by_media.setdefault(r["media_id"], []).append(r)
    durations = {r["media_id"]: r["duration_ms"]
                 for r in media.filter("kind = 'video'").collect()}
    for mid, frames in by_media.items():
        assert len(frames) == max(durations[mid] // 1000, 1)
        idxs = sorted(f["frame_idx"] for f in frames)
        assert idxs == list(range(len(frames)))
        assert all(f["ts_ms"] == f["frame_idx"] * 1000 for f in frames)


def test_payload_partitioning(media):
    out = mm.payload_partitions(media, target_mb=1)
    assert out.count() == 48
    assert set(out.columns) == set(media.columns)


def test_resize_array_nearest_neighbor_exact():
    import numpy as np
    # 4x4 single-channel ramp: resize 4->2 picks pixel centers (rows 1, 3)
    img = np.arange(16, dtype=np.uint8).reshape(4, 4, 1)
    out = mm.resize_array(img, 2, 2)
    assert out.shape == (2, 2, 1)
    assert out[:, :, 0].tolist() == [[5, 7], [13, 15]]
    # upscale 2->4 repeats each source pixel twice
    small = np.array([[[1], [2]], [[3], [4]]], dtype=np.uint8)
    up = mm.resize_array(small, 4, 4)
    assert up[:, :, 0].tolist() == [[1, 1, 2, 2], [1, 1, 2, 2],
                                    [3, 3, 4, 4], [3, 3, 4, 4]]


def test_resize_images_plumbing(media):
    import numpy as np
    out = {r["media_id"]: r for r in
           mm.resize_images(media, out_h=2, out_w=2).collect()}
    srcs = {r["media_id"]: bytes(r["payload"])
            for r in media.filter("kind = 'image'").collect()}
    assert set(out) == set(srcs)          # one row per image, none lost
    for mid, r in out.items():
        assert (r["height"], r["width"]) == (2, 2)
        assert len(bytes(r["payload"])) == 2 * 2 * 3
        # byte-exact vs the same kernel run locally (partition-invariant)
        want = mm.resize_array(
            mm.decode_image(srcs[mid], fake=True), 2, 2)
        assert bytes(r["payload"]) == want.astype(np.uint8).tobytes()
