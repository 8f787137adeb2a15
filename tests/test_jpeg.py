"""Baseline JPEG codec (multimodal/jpeg.py): the encode→decode
differential with a DERIVED quantization-error bound, the
lossless-subspace guarantee the mm_jpeg_stats oracle relies on,
stream conformance (marker layout, byte stuffing), and the Spark
mapInPandas plumbing (attach_jpeg_payload / jpeg_image_stats).

Reference parity note: the reference repo has no binary-column or
codec surface at all (its query surface is DuckDB SQL over parquet
scalars — app.py:51); this is north-star multimodal scope.
"""

from __future__ import annotations

import numpy as np
import pytest

from quack_reduce_spark.multimodal.jpeg import (
    _C,
    DEFAULT_Q,
    decode_gray_jpeg,
    encode_gray_jpeg,
    synthesize_gray_jpeg,
)


def _reference_pixels(doc_id: int) -> np.ndarray:
    """The synthesize_gray_jpeg generator formula, re-derived
    independently (kept in sync with the SQL oracle in
    inventory/multimodal.py::mm_jpeg_stats)."""
    wb = 2 + doc_id % 3
    hb = 2 + (doc_id // 3) % 3
    s = doc_id % 251
    bx, by = np.meshgrid(np.arange(wb), np.arange(hb))
    v = 2 * ((37 * bx + 53 * by + 11 * s) % 128)
    return np.kron(v, np.ones((8, 8), dtype=np.int64)).astype(np.uint8)


def _pixel_error_bound(q: int) -> float:
    """Worst-case per-pixel reconstruction error of the codec.

    Each quantized coefficient differs from the true DCT coefficient
    by at most q/2 (the encoder's floor(x+0.5) half-up round). The
    IDCT maps a coefficient-domain error E to pixel errors
    (C.T @ E @ C); the operator's max absolute pixel response to a
    uniform ±q/2 coefficient box is (q/2) * (max_x Σ_u |C[u,x]|)^2,
    plus 1 for the final pixel half-up round + uint8 clamp.
    """
    col_abs_sum = np.abs(_C).sum(axis=0).max()
    return (q / 2.0) * col_abs_sum**2 + 1.0


def test_encode_decode_differential_error_bound():
    # the lossy path for real: random images exercise AC run-lengths,
    # ZRL, EOB, multi-category amplitudes — reconstruction must stay
    # inside the derived quantization-error bound
    rng = np.random.default_rng(20260814)
    for q in (8, 16, 32):
        bound = _pixel_error_bound(q)
        for _ in range(6):
            h = 8 * int(rng.integers(1, 5))
            w = 8 * int(rng.integers(1, 5))
            img = rng.integers(0, 256, size=(h, w)).astype(np.uint8)
            dec = decode_gray_jpeg(encode_gray_jpeg(img, q=q))
            assert dec.shape == img.shape
            err = np.abs(dec.astype(int) - img.astype(int)).max()
            assert err <= bound, (q, err, bound)


def test_smooth_images_reconstruct_tightly():
    # low-frequency content concentrates energy in few coefficients;
    # error should be far below the worst-case bound
    y, x = np.mgrid[0:32, 0:32]
    img = (128 + 100 * np.sin(x / 7.0) * np.cos(y / 9.0)).astype(np.uint8)
    dec = decode_gray_jpeg(encode_gray_jpeg(img, q=DEFAULT_Q))
    err = np.abs(dec.astype(int) - img.astype(int))
    assert err.max() <= 12 and err.mean() <= 4.0


def test_lossless_subspace_exact_roundtrip():
    # the property mm_jpeg_stats' hash oracle stands on: synthesized
    # block-constant images with even level-shifted values decode
    # BIT-EXACTLY to the generator formula
    for doc_id in [0, 1, 2, 7, 8, 17, 123, 250, 251, 252, 997, 54321]:
        ref = _reference_pixels(doc_id)
        dec = decode_gray_jpeg(synthesize_gray_jpeg(doc_id))
        assert dec.shape == ref.shape
        assert (dec == ref).all(), doc_id


def test_constant_image_exact_any_even_shift():
    # the subspace characterization itself: ANY constant image whose
    # level-shifted value is even round-trips exactly at q=16
    for v in (0, 2, 64, 128, 130, 254):
        img = np.full((16, 24), v, dtype=np.uint8)
        assert (decode_gray_jpeg(encode_gray_jpeg(img)) == img).all()


def test_stream_conformance_markers_and_stuffing():
    payload = synthesize_gray_jpeg(11)
    assert payload[:2] == b"\xff\xd8" and payload[-2:] == b"\xff\xd9"
    # DQT segment: FFDB, length 0x0043, Pq/Tq byte 0, 64 entries
    i = payload.index(b"\xff\xdb")
    assert payload[i + 2 : i + 5] == b"\x00\x43\x00"
    assert payload[i + 5 : i + 69] == bytes([DEFAULT_Q] * 64)
    # every 0xFF between SOS payload and EOI must be a stuffed 0xFF00
    sos = payload.index(b"\xff\xda")
    data = payload[sos + 2 + 8 : -2]
    j = 0
    while j < len(data):
        if data[j] == 0xFF:
            assert data[j + 1] == 0x00, f"unstuffed 0xFF at {j}"
            j += 2
        else:
            j += 1


def test_decoder_rejects_malformed():
    with pytest.raises(ValueError, match="SOI"):
        decode_gray_jpeg(b"\x89PNG\r\n")
    with pytest.raises(ValueError):
        decode_gray_jpeg(b"\xff\xd8\xff\xd9")  # no SOF/SOS
    with pytest.raises(ValueError, match="multiple-of-8"):
        encode_gray_jpeg(np.zeros((9, 8), dtype=np.uint8))
    with pytest.raises(ValueError, match="16-bit DQT"):
        # 16-bit quant table is legal JPEG but outside baseline scope
        bad = b"\xff\xd8\xff\xdb" + b"\x00\x83" + b"\x10" + bytes(128) + b"\xff\xd9"
        decode_gray_jpeg(bad)


def test_spark_jpeg_stats_pipeline(spark, sf_dir):
    # the registry path end to end on a real documents sample:
    # synthesize via mapInPandas, decode via mapInPandas, compare the
    # exact stats to the generator formula
    from quack_reduce_spark.inventory._util import load
    from quack_reduce_spark.multimodal import attach_jpeg_payload, jpeg_image_stats

    docs = load(spark, sf_dir, "documents").limit(40)
    rows = jpeg_image_stats(attach_jpeg_payload(docs)).collect()
    assert len(rows) == 40
    for r in rows:
        ref = _reference_pixels(r["doc_id"])
        assert (r["height"], r["width"]) == ref.shape
        assert r["n_blocks"] == (ref.shape[0] // 8) * (ref.shape[1] // 8)
        assert r["px_sum"] == int(ref.astype(np.int64).sum())
        assert r["mean_px"] == pytest.approx(float(ref.mean()), abs=1e-9)
