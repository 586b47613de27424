import pytest

from kgpipe_spark.operators.multimodal import (
    extract_features,
    frame_sample_plan,
    synth_media,
)


def test_synth_media_and_features(spark):
    m = synth_media(spark, 30)
    assert m.count() == 30
    feats = extract_features(m, fake=True, dim=16).collect()
    assert len(feats) == 30
    assert all(len(r["feature"]) == 16 for r in feats)
    assert all(r["n_bytes"] == 64 for r in feats)  # sha256 hex = 64 bytes
    # deterministic
    feats2 = extract_features(synth_media(spark, 30), fake=True, dim=16).collect()
    assert sorted(r["feature"] for r in feats) == sorted(r["feature"] for r in feats2)


def test_real_decode_is_stubbed(spark):
    m = synth_media(spark, 3)
    with pytest.raises(Exception) as exc_info:
        extract_features(m, fake=False).collect()
    assert "NotImplementedError" in str(exc_info.value) or "decode" in str(exc_info.value)


def test_frame_sample_plan(spark):
    m = synth_media(spark, 30)
    plan = frame_sample_plan(m, every_ms=1000)
    rows = plan.groupBy("media_id").count().collect()
    assert all(r["count"] >= 2 for r in rows)  # duration ≥ 1000ms → ≥2 samples
