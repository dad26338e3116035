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
