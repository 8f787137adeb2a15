"""Real PNG codec: roundtrip across all filter types, header parse,
nearest-neighbor resize, grey histogram, and the Spark kernels'
real-decode paths (fake=False)."""

from __future__ import annotations

import numpy as np
import pytest

from quack_reduce_spark.multimodal import (
    attach_png_payload,
    decode_image_meta,
    decode_png,
    encode_png,
    extract_features,
    gray_histogram,
    parse_png_header,
    png_image_stats,
    resize_image,
    resize_nearest,
    synthesize_png,
)


@pytest.mark.parametrize("shape", [(8, 8, 3), (16, 9, 4), (5, 7), (3, 3, 2), (1, 1, 1), (64, 33, 3)])
def test_roundtrip_exact(shape):
    rng = np.random.RandomState(hash(shape) % 2**31)
    arr = rng.randint(0, 256, shape).astype(np.uint8)
    back = decode_png(encode_png(arr))[3]
    exp = arr if arr.ndim == 3 else arr[:, :, None]
    assert back.shape == exp.shape
    assert (back == exp).all()


def test_all_five_filters_present_and_decoded():
    # encoder cycles filter = y % 5; a 10-row image uses each type twice
    arr = np.random.RandomState(1).randint(0, 256, (10, 6, 3)).astype(np.uint8)
    payload = encode_png(arr)
    import zlib

    # locate IDAT and inspect the filter byte of each scanline
    pos, idat = 8, b""
    while pos + 8 <= len(payload):
        import struct

        length, ctype = struct.unpack_from(">I4s", payload, pos)
        if ctype == b"IDAT":
            idat += payload[pos + 8 : pos + 8 + length]
        pos += 12 + length
    raw = zlib.decompress(idat)
    stride = 6 * 3 + 1
    filters = [raw[y * stride] for y in range(10)]
    assert filters == [0, 1, 2, 3, 4, 0, 1, 2, 3, 4]
    assert (decode_png(payload)[3] == arr).all()


def test_header_parse_no_inflate():
    arr = np.zeros((4, 9, 3), np.uint8)
    w, h, mode = parse_png_header(encode_png(arr))
    assert (w, h, mode) == (9, 4, "RGB")
    with pytest.raises(ValueError):
        parse_png_header(b"not a png at all----")


def test_synthesize_matches_formula():
    for did in (0, 7, 250, 251, 1234):
        w, h, mode, arr = decode_png(synthesize_png(did))
        assert (w, h, mode) == (8 + did % 9, 8 + (did // 3) % 9, "RGB")
        x = np.arange(w)[None, :, None]
        y = np.arange(h)[:, None, None]
        c = np.arange(3)[None, None, :]
        assert (arr == (3 * x + 7 * y + 11 * (did % 251) + 13 * c) % 256).all()


def test_resize_nearest_floor_convention():
    arr = np.arange(8 * 8 * 3, dtype=np.uint8).reshape(8, 8, 3)
    out = resize_nearest(arr, 4, 4)
    # src index = (dst * 8) // 4 = 2*dst
    for yy in range(4):
        for xx in range(4):
            assert (out[yy, xx] == arr[2 * yy, 2 * xx]).all()


def test_gray_histogram_integer_math():
    arr = np.zeros((2, 2, 3), np.uint8)
    arr[0, 0] = (10, 20, 33)  # grey = 21 -> bucket 0
    arr[0, 1] = (100, 100, 100)  # grey 100 -> bucket 3
    arr[1, 0] = (255, 255, 255)  # grey 255 -> bucket 7
    arr[1, 1] = (64, 64, 64)  # grey 64 -> bucket 2
    assert gray_histogram(arr).tolist() == [1, 0, 1, 1, 0, 0, 0, 1]


def test_spark_real_decode_paths(spark, sf_dir):
    from quack_reduce_spark.inventory._util import load

    docs = load(spark, sf_dir, "documents").limit(20)
    pngs = attach_png_payload(docs)

    meta = decode_image_meta(pngs, payload_col="png", fake=False).collect()
    assert len(meta) == 20
    for r in meta:
        assert r.width == 8 + r.doc_id % 9
        assert r.height == 8 + (r.doc_id // 3) % 9
        assert r.mode == "RGB"

    stats = {r.doc_id: r for r in png_image_stats(pngs).collect()}
    one = synthesize_png(int(next(iter(stats))))
    _, _, _, arr = decode_png(one)
    did = next(iter(stats))
    assert stats[did].mean_r == pytest.approx(arr[:, :, 0].mean())

    thumbs = resize_image(pngs, width=4, height=4, payload_col="png", fake=False)
    for r in thumbs.limit(5).collect():
        tw, th, mode, tarr = decode_png(bytes(r.thumb))
        assert (tw, th, mode) == (4, 4, "RGB")
        _, _, _, full = decode_png(synthesize_png(int(r.doc_id)))
        assert (tarr == resize_nearest(full, 4, 4)).all()

    feats = extract_features(pngs, payload_col="png", fake=False).limit(5).collect()
    for r in feats:
        assert len(r.feature) == 8
        assert sum(r.feature) == pytest.approx(1.0)
