"""Multimodal plumbing: mapInPandas schema, determinism, stub gating."""

from __future__ import annotations

import pytest

from quack_reduce_spark.inventory._util import load
from quack_reduce_spark.multimodal import (
    attach_binary_payload,
    decode_image_meta,
    sample_frames,
)


@pytest.fixture(scope="module")
def payloads(spark, sf_dir):
    return attach_binary_payload(load(spark, sf_dir, "documents").limit(50))


def test_decode_schema_and_determinism(payloads):
    out1 = {r["doc_id"]: (r["width"], r["height"], r["mode"]) for r in decode_image_meta(payloads).collect()}
    out2 = {r["doc_id"]: (r["width"], r["height"], r["mode"]) for r in decode_image_meta(payloads).collect()}
    assert out1 == out2  # deterministic across runs/partitionings
    assert len(out1) == 50
    w, h, m = next(iter(out1.values()))
    assert 64 <= w < 256 and 64 <= h < 256 and m in {"RGB", "RGBA", "L"}


def test_decode_real_path_rejects_non_png(payloads):
    # fake=False is now a REAL PNG header parse (png.py); on non-PNG
    # bytes (these payloads are UTF-8 text) it must fail loudly, not
    # fabricate metadata
    with pytest.raises(Exception, match="not a PNG payload"):
        decode_image_meta(payloads, fake=False).collect()


def test_video_paths_remain_gated(payloads):
    # frame extraction / scene detection genuinely need ffmpeg
    from quack_reduce_spark.multimodal import sample_frames, scene_changes

    with pytest.raises(Exception, match="NotImplementedError|ffmpeg"):
        sample_frames(payloads, fake=False).collect()
    with pytest.raises(Exception, match="NotImplementedError|ffmpeg"):
        scene_changes(payloads, fake=False).collect()


def test_frame_sampling_fanout(payloads):
    frames = sample_frames(payloads, every_n_bytes=64).collect()
    by_doc = {}
    for r in frames:
        by_doc.setdefault(r["doc_id"], []).append(r)
    assert len(by_doc) == 50
    some = next(iter(by_doc.values()))
    assert [f["frame_idx"] for f in sorted(some, key=lambda x: x["frame_idx"])] == list(
        range(len(some))
    )
    assert all(isinstance(bytes(f["frame"]), bytes) for f in some)


def test_binary_meta_matches_python_hashlib(payloads):
    import hashlib

    rows = payloads.limit(3).collect()
    import pyspark.sql.functions as F

    metas = (
        payloads.limit(3)
        .select("doc_id", F.sha2(F.col("payload"), 256).alias("sha"))
        .collect()
    )
    expected = {r["doc_id"]: hashlib.sha256(bytes(r["payload"])).hexdigest() for r in rows}
    for m in metas:
        assert m["sha"] == expected[m["doc_id"]]


def test_resize_shape_and_determinism(payloads):
    from quack_reduce_spark.multimodal import resize_image

    out1 = {r["doc_id"]: bytes(r["thumb"]) for r in resize_image(payloads, 32, 32).collect()}
    out2 = {r["doc_id"]: bytes(r["thumb"]) for r in resize_image(payloads, 32, 32).collect()}
    assert out1 == out2
    assert len(out1) == 50
    assert all(len(t) == 32 * 32 for t in out1.values())


def test_resize_real_path_rejects_non_png(payloads):
    # fake=False is a REAL PNG decode→resize→re-encode; on non-PNG
    # bytes it must fail loudly
    from quack_reduce_spark.multimodal import resize_image

    with pytest.raises(Exception, match="not a PNG payload"):
        resize_image(payloads, fake=False).collect()


def test_feature_extraction_shape_and_determinism(payloads):
    from quack_reduce_spark.multimodal import extract_features
    from quack_reduce_spark.multimodal.codec import FEATURE_DIM

    out1 = {r["doc_id"]: tuple(r["feature"]) for r in extract_features(payloads).collect()}
    out2 = {
        r["doc_id"]: tuple(r["feature"])
        for r in extract_features(payloads.repartition(7)).collect()
    }
    assert out1 == out2  # partitioning-independent
    assert all(len(f) == FEATURE_DIM for f in out1.values())
    assert all(0.0 <= x <= 1.0 for f in out1.values() for x in f)


def test_audio_windows_overlap_and_energy(spark):
    """Overlapping windows: stride < window means interior bytes land
    in two windows; mean_byte equals the python-side mean of the same
    segment; deterministic across runs."""
    from quack_reduce_spark.multimodal import attach_binary_payload, audio_windows

    df = spark.createDataFrame(
        [(1, "a" * 200)], "doc_id long, text string"
    )
    wins = audio_windows(
        attach_binary_payload(df), window_bytes=128, stride=64
    ).orderBy("window_idx").collect()
    # 200 bytes, stride 64 -> starts 0,64,128,192 -> sizes 128,128,72,8
    assert [(r["window_idx"], r["n_bytes"]) for r in wins] == [
        (0, 128), (1, 128), (2, 72), (3, 8)
    ]
    # payload is all 'a' (0x61): every window's mean byte is exactly 97
    assert all(r["mean_byte"] == 97.0 for r in wins)

    again = audio_windows(
        attach_binary_payload(df), window_bytes=128, stride=64
    ).orderBy("window_idx").collect()
    assert [tuple(r) for r in again] == [tuple(r) for r in wins]


def test_scene_changes_flags_intensity_jumps(spark):
    # frame 0 always opens a scene; a frame of high bytes after a frame
    # of low bytes must open a new one; a flat continuation must not
    from quack_reduce_spark.multimodal import scene_changes

    payload = bytes([10] * 64 + [10] * 64 + [200] * 64)
    df = spark.createDataFrame([(1, bytearray(payload))], "doc_id long, payload binary")
    rows = {r["frame_idx"]: r for r in scene_changes(df, frame_bytes=64).collect()}
    assert rows[0]["is_scene_start"] is True
    assert rows[1]["is_scene_start"] is False  # identical intensity
    assert rows[2]["is_scene_start"] is True   # |200-10| > 2
    assert rows[2]["mean_byte"] == 200.0


# -- real WAV codec path ------------------------------------------------


def test_synthesize_wav_is_spec_conformant_per_stdlib_wave():
    # independent parser: python's stdlib wave module must accept the
    # synthesized bytes and agree on every header field
    import io
    import wave

    from quack_reduce_spark.multimodal import synthesize_wav

    data = synthesize_wav(n_samples=75, amplitude=1234, sample_rate=8000)
    with wave.open(io.BytesIO(data)) as w:
        assert w.getnchannels() == 1
        assert w.getsampwidth() == 2
        assert w.getframerate() == 8000
        assert w.getnframes() == 75


def test_decode_wav_roundtrip_and_rejects_garbage():
    import numpy as np
    import pytest

    from quack_reduce_spark.multimodal import decode_wav, synthesize_wav

    rate, nch, samples = decode_wav(synthesize_wav(10, 700))
    assert (rate, nch) == (8000, 1)
    assert samples.tolist() == [700, -700] * 5
    assert float(np.sqrt((samples.astype("float64") ** 2).mean())) == 700.0

    with pytest.raises(ValueError, match="RIFF"):
        decode_wav(b"not a wav at all")


def test_wav_stats_real_decode_on_spark(spark):
    from quack_reduce_spark.multimodal import attach_wav_payload, wav_stats

    df = spark.createDataFrame([(3,), (107,)], "doc_id long")
    got = {r["doc_id"]: r for r in wav_stats(attach_wav_payload(df)).collect()}
    # doc 3: n_samples 53, amplitude 503; doc 107: n_samples 57, amp 607
    assert got[3]["n_samples"] == 53 and got[3]["rms"] == 503.0 and got[3]["peak"] == 503
    assert got[107]["n_samples"] == 57 and got[107]["rms"] == 607.0
    assert all(r["sample_rate"] == 8000 and r["n_channels"] == 1 for r in got.values())


def test_audio_windows_real_path_windows_decoded_samples(spark):
    from quack_reduce_spark.multimodal import attach_wav_payload, audio_windows

    clips = attach_wav_payload(spark.createDataFrame([(0,)], "doc_id long"))
    # doc 0: 50 samples, amplitude 500; 16-sample windows, stride 16
    wins = audio_windows(
        clips, window_bytes=16, stride=16, payload_col="wav", fake=False
    ).collect()
    assert [r["window_idx"] for r in wins] == [0, 1, 2, 3]
    assert [r["n_bytes"] for r in wins] == [32, 32, 32, 4]  # 2 bytes/sample
    # |±500| averages to exactly 500 in every window
    assert all(r["mean_byte"] == 500.0 for r in wins)


def test_image_sig_dedup_groups_and_decode_once(spark, sf_dir):
    """The dedup contract: groups cover every doc exactly once at the
    group level (sum over ALL signature groups == corpus size), the
    top groups are genuine duplicates (n_docs > 1 — the %200 keying
    guarantees them), pair counts are C(n,2), and decode work is
    content-addressed (distinct payloads only: 200 regardless of
    corpus size)."""
    import pyspark.sql.functions as F

    from quack_reduce_spark.inventory._util import load
    from quack_reduce_spark.inventory.multimodal import mm_image_sig_dedup

    out = mm_image_sig_dedup(spark, sf_dir).collect()
    assert len(out) == 20
    assert all(r.n_docs > 1 for r in out)
    assert all(r.n_pairs == r.n_docs * (r.n_docs - 1) // 2 for r in out)
    n_docs = load(spark, sf_dir, "documents").count()
    n_imgs = (
        load(spark, sf_dir, "documents")
        .select((F.col("doc_id") % 200).alias("i"))
        .distinct()
        .count()
    )
    assert n_imgs <= 200 < n_docs  # decode-once: payloads, not docs
