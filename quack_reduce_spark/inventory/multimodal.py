"""Multimodal-column inventory (north-star component).

mm_binary_meta is fully oracle-checkable (byte length + sha256 of the
payload — both engines hash identical UTF-8 bytes). mm_decode_stub
exercises the Arrow-batched mapInPandas decode plumbing with a
deterministic fake codec → rows-only driver check + unit tests.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from quack_reduce_spark.inventory._util import load
from quack_reduce_spark.multimodal import (
    attach_binary_payload,
    audio_windows,
    decode_image_meta,
    extract_features,
    resize_image,
    sample_frames,
    scene_changes,
)


def mm_binary_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Typed metadata over a binary payload column: size + sha256."""
    docs = attach_binary_payload(load(spark, sf_dir, "documents"))
    return docs.select(
        "doc_id",
        F.octet_length(F.col("payload")).alias("n_bytes"),
        F.sha2(F.col("payload"), 256).alias("sha"),
    )


def mm_decode_stub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """mapInPandas decode of binary payloads → image-meta rows
    (deterministic fake codec; rows-only driver check)."""
    docs = attach_binary_payload(load(spark, sf_dir, "documents"))
    return decode_image_meta(docs)


def mm_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame sampling (one row fans out to N typed frame rows via
    mapInPandas). Oracle-checkable on the relational skeleton:
    (doc_id, frame_idx, frame byte length) — both engines chunk the
    identical UTF-8 payload into 64-byte frames."""
    docs = attach_binary_payload(load(spark, sf_dir, "documents"))
    frames = sample_frames(docs, every_n_bytes=64)
    return frames.select(
        "doc_id", "frame_idx", F.octet_length(F.col("frame")).alias("n_bytes")
    )


def mm_audio_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Overlapping audio-style windows (128-byte window, 64-byte
    stride) over the binary payload via mapInPandas — the sliding
    counterpart of mm_frame_sample's tumbling chunks. Oracle checks
    the full relational skeleton (window index + byte length); the
    mean-byte energy stub is unit-tested."""
    docs = attach_binary_payload(load(spark, sf_dir, "documents"))
    wins = audio_windows(docs, window_bytes=128, stride=64)
    return wins.select("doc_id", "window_idx", "n_bytes")


def mm_resize_stub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Resize plumbing (fake codec): fixed 32x32 thumbnail per doc.
    Rows-only driver check; determinism unit-tested."""
    docs = attach_binary_payload(load(spark, sf_dir, "documents"))
    resized = resize_image(docs, width=32, height=32)
    return resized.select(
        "doc_id", "width", "height", F.octet_length(F.col("thumb")).alias("thumb_bytes")
    )


def mm_feature_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Feature-extraction plumbing (fake encoder): 8-dim embedding per
    payload, projected to its L2 norm so the driver sees a stable
    scalar column. Rows-only; vector determinism unit-tested."""
    from quack_reduce_spark.operators.similarity import l2_norm

    docs = attach_binary_payload(load(spark, sf_dir, "documents"))
    feats = extract_features(docs)
    return feats.select("doc_id", l2_norm(F.col("feature")).alias("feature_norm"))


def mm_video_scenes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scene-change detection stub over 64-byte tumbling frames: a
    frame opens a scene when its mean byte intensity jumps > 2.0 from
    the previous frame. Unlike the decode stubs, the fake kernel is
    exact integer math, so the WHOLE mapInPandas output (per-frame
    mean + scene flags) is hash-ORACLED against a pure-SQL rebuild —
    the strongest correctness gate the multimodal family has.

    Both engines restrict to ASCII-only docs (octet length == char
    length) because the SQL rebuild indexes characters while the
    kernel reads bytes — the filter keeps the comparison exact even if
    a future fixture regeneration introduces multi-byte text."""
    ascii_only = F.octet_length(F.col("text")) == F.length(F.col("text"))
    docs = attach_binary_payload(load(spark, sf_dir, "documents").filter(ascii_only))
    from quack_reduce_spark.inventory._util import rnd

    scenes = scene_changes(docs, frame_bytes=64, threshold=2.0)
    return scenes.select(
        "doc_id", "frame_idx", rnd(F.col("mean_byte"), 4).alias("mean_byte"),
        "is_scene_start",
    )


def mm_audio_rms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL audio decode, end to end: each document id parameterizes a
    spec-conformant RIFF/PCM-16 WAV payload (square wave, n_samples =
    50 + id % 100, amplitude = 500 + id % 30000), and ``wav_stats``
    parses the actual bytes — chunk walk, fmt header, int16 frames —
    then computes RMS/peak with numpy. A square wave's RMS and peak
    both equal its amplitude EXACTLY in float64, so the whole decode
    path is hash-oracled against the analytic closed form (the same
    trick mm_video_scenes uses for its kernel). The one modality this
    environment can decode without external libs."""
    from quack_reduce_spark.multimodal import attach_wav_payload, wav_stats

    docs = load(spark, sf_dir, "documents")
    clips = attach_wav_payload(docs)
    return wav_stats(clips).select(
        "doc_id", "sample_rate", "n_channels", "n_samples", "rms", "peak"
    )


def mm_image_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL image decode, end to end: each document id parameterizes a
    spec-conformant 8-bit RGB PNG (w = 8 + id%9, h = 8 + (id//3)%9,
    pixel[y,x,c] = (3x + 7y + 11*(id%251) + 13c) % 256, scanline
    filter cycling through ALL FIVE PNG filter types), and
    ``png_image_stats`` decodes the actual bytes — chunk walk, zlib
    inflate, unfilter — then computes per-channel means with numpy.
    The pixel formula is closed-form integer math, so the whole
    encode→decode pipeline (including every unfilter branch) is
    hash-ORACLED against a pure-SQL rebuild. Second real-codec
    modality after mm_audio_rms's WAV; no PIL anywhere."""
    from quack_reduce_spark.multimodal import attach_png_payload, png_image_stats

    docs = load(spark, sf_dir, "documents")
    stats = png_image_stats(attach_png_payload(docs))
    from quack_reduce_spark.inventory._util import rnd

    return stats.select(
        "doc_id", "width", "height", "mode",
        rnd(F.col("mean_r"), 4).alias("mean_r"),
        rnd(F.col("mean_g"), 4).alias("mean_g"),
        rnd(F.col("mean_b"), 4).alias("mean_b"),
    )


def mm_jpeg_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL JPEG decode, end to end (third real-codec modality after
    WAV and PNG): each document id parameterizes a spec-conformant
    baseline-DCT grayscale JPEG — Huffman-entropy-coded with the ITU
    T.81 Annex K tables, uniform q=16 quantization — and
    ``jpeg_image_stats`` decodes the actual bytes: marker walk,
    canonical Huffman reconstruction, entropy decode with 0xFF00
    unstuffing, DC differential EXTEND, dequantize, float 8x8 IDCT.
    The synthesized images are block-constant with even level-shifted
    values, which pins them in the lossy codec's LOSSLESS subspace
    (see jpeg.synthesize_gray_jpeg), so per-image dimensions, exact
    pixel sum and mean are hash-ORACLED against a pure-SQL rebuild of
    the generator formula. The lossy path (AC coefficients,
    run-lengths) is exercised by tests/test_jpeg.py's encode→decode
    differential with a derived quantization-error bound."""
    from quack_reduce_spark.multimodal import attach_jpeg_payload, jpeg_image_stats

    docs = load(spark, sf_dir, "documents")
    stats = jpeg_image_stats(attach_jpeg_payload(docs))
    from quack_reduce_spark.inventory._util import rnd

    return stats.select(
        "doc_id", "width", "height", "n_blocks", "px_sum",
        rnd(F.col("mean_px"), 4).alias("mean_px"),
    )


def mm_image_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL resize roundtrip: synthesize PNG → decode → 4x4
    nearest-neighbor resize (integer floor-div index mapping) →
    RE-ENCODE as PNG → decode AGAIN → exact pixel sum. Two full codec
    roundtrips per row, hash-oracled against the SQL rebuild of the
    nearest-neighbor sample of the generator formula."""
    from quack_reduce_spark.multimodal import (
        attach_png_payload,
        png_thumb_sums,
        resize_image,
    )

    docs = load(spark, sf_dir, "documents")
    thumbs = resize_image(
        attach_png_payload(docs), width=4, height=4, payload_col="png", fake=False
    )
    return png_thumb_sums(thumbs).select("doc_id", "thumb_w", "thumb_h", "pixel_sum")


def mm_image_hist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL decoded-pixel feature: per-image 8-bucket greyscale
    histogram (grey = (r+g+b)//3, bucket = grey//32 — pure integer
    math) over fully decoded PNGs, exploded to rows and hash-oracled.
    This is the counting form of ``extract_features(fake=False)``'s
    normalized histogram feature vector."""
    from quack_reduce_spark.multimodal.codec import png_gray_hist
    from quack_reduce_spark.multimodal import attach_png_payload

    docs = load(spark, sf_dir, "documents")
    return png_gray_hist(attach_png_payload(docs)).select("doc_id", "bucket", "n")


# mm_decode_stub / mm_resize_stub retired from the registry (r6): the
# real PNG/WAV codec paths (mm_image_stats / mm_image_resize /
# mm_audio_rms, all hash-oracled and driver-green) now carry the
# decode/resize coverage; the fake-codec plumbing they exercised stays
# unit-tested in tests/test_multimodal.py.
def mm_image_sig_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Image DEDUP over decoded pixels — the multimodal member of the
    dedup family: each doc carries an image whose content is keyed by
    ``doc_id % 200`` (exact-duplicate groups by construction, the
    CommonCrawl shape where the same image recurs under many pages),
    the distinct payloads are REAL-decoded ONCE (content-addressed:
    200 PNG decodes regardless of corpus size — the decode-dedup
    optimization every multimodal pipeline runs), and each image's
    8-bucket greyscale histogram is folded into a canonical signature
    string. Duplicate groups are signature-equality groups — ONE
    shuffle on a fixed-width key, the same banded/bucketed shape as
    every text-dedup operator here (a perceptual aHash/dHash drops in
    for the signature without changing the plan). Top-20 groups with
    their pair counts; hash-ORACLED end to end against a pure-SQL
    rebuild of the generator-formula histograms."""
    from quack_reduce_spark.multimodal import attach_png_payload
    from quack_reduce_spark.multimodal.codec import png_gray_hist

    docs = load(spark, sf_dir, "documents").select(
        "doc_id", (F.col("doc_id") % 200).alias("img_id")
    )
    imgs = docs.select(F.col("img_id").alias("doc_id")).distinct()
    hist = png_gray_hist(attach_png_payload(imgs))
    sig = (
        hist.groupBy("doc_id")
        .agg(
            F.concat_ws(
                ",",
                F.sort_array(
                    F.collect_list(F.concat_ws(":", F.col("bucket"), F.col("n")))
                ),
            ).alias("sig")
        )
        .withColumnRenamed("doc_id", "img_id")
    )
    return (
        docs.join(sig, "img_id")
        .groupBy("sig")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.min("doc_id").alias("rep_doc"),
        )
        .select(
            "rep_doc",
            "n_docs",
            F.expr("n_docs * (n_docs - 1) DIV 2").alias("n_pairs"),
        )
        .orderBy(F.col("n_docs").desc(), F.col("rep_doc").asc())
        .limit(20)
    )


QUERIES = {
    "mm_binary_meta": mm_binary_meta,
    "mm_image_sig_dedup": mm_image_sig_dedup,
    "mm_audio_rms": mm_audio_rms,
    "mm_image_stats": mm_image_stats,
    "mm_jpeg_stats": mm_jpeg_stats,
    "mm_image_resize": mm_image_resize,
    "mm_image_hist": mm_image_hist,
    "mm_video_scenes": mm_video_scenes,
    "mm_frame_sample": mm_frame_sample,
    "mm_audio_windows": mm_audio_windows,
    "mm_feature_extract": mm_feature_extract,
}


ORACLES = {
    "mm_image_sig_dedup": """
        -- rebuild each DISTINCT image's histogram from the generator
        -- formula (same px kernel as mm_image_hist, keyed by the
        -- shared img id), fold it into the same canonical signature,
        -- and group the docs by signature
        WITH d AS (
            SELECT doc_id, doc_id % 200 AS iid FROM documents
        ),
        p AS (
            SELECT DISTINCT iid,
                   8 + iid % 9 AS w,
                   8 + (iid // 3) % 9 AS h,
                   iid % 251 AS s
            FROM d
        ),
        px AS (
            SELECT p.iid,
                   ((3 * x.i + 7 * y.i + 11 * p.s) % 256
                    + (3 * x.i + 7 * y.i + 11 * p.s + 13) % 256
                    + (3 * x.i + 7 * y.i + 11 * p.s + 26) % 256) // 3 AS grey
            FROM p
            CROSS JOIN generate_series(0, 15) AS x(i)
            CROSS JOIN generate_series(0, 15) AS y(i)
            WHERE x.i < p.w AND y.i < p.h
        ),
        hist AS (
            SELECT iid, grey // 32 AS bucket, COUNT(*) AS n
            FROM px GROUP BY iid, grey // 32
        ),
        sig AS (
            SELECT iid,
                   string_agg(CAST(bucket AS VARCHAR) || ':' || CAST(n AS VARCHAR),
                              ',' ORDER BY bucket) AS sig
            FROM hist GROUP BY iid
        ),
        g AS (
            SELECT sig.sig, CAST(COUNT(*) AS BIGINT) AS n_docs,
                   MIN(d.doc_id) AS rep_doc
            FROM d JOIN sig ON d.iid = sig.iid
            GROUP BY sig.sig
        )
        SELECT rep_doc, n_docs,
               CAST(n_docs * (n_docs - 1) // 2 AS BIGINT) AS n_pairs
        FROM g
        ORDER BY n_docs DESC, rep_doc ASC
        LIMIT 20
    """,
    "mm_image_stats": """
        -- analytic rebuild of the synthesized PNGs: header fields are
        -- the synthesis parameters, channel means re-derive from the
        -- closed-form pixel formula (3x + 7y + 11s + 13c) % 256 over
        -- the image extent. A hash match proves the Spark side's
        -- zlib inflate + all-five-filter unfilter reconstructed every
        -- pixel exactly.
        WITH p AS (
            SELECT doc_id,
                   CAST(8 + doc_id % 9 AS INT) AS w,
                   CAST(8 + (doc_id // 3) % 9 AS INT) AS h,
                   doc_id % 251 AS s
            FROM documents
        ),
        px AS (
            SELECT p.doc_id, p.w, p.h, c.i AS c,
                   (3 * x.i + 7 * y.i + 11 * p.s + 13 * c.i) % 256 AS v
            FROM p
            CROSS JOIN generate_series(0, 15) AS x(i)
            CROSS JOIN generate_series(0, 15) AS y(i)
            CROSS JOIN generate_series(0, 2) AS c(i)
            WHERE x.i < p.w AND y.i < p.h
        )
        SELECT doc_id, w AS width, h AS height, 'RGB' AS mode,
               FLOOR(AVG(CASE WHEN c = 0 THEN v END) * 1e4 + 0.5) / 1e4 AS mean_r,
               FLOOR(AVG(CASE WHEN c = 1 THEN v END) * 1e4 + 0.5) / 1e4 AS mean_g,
               FLOOR(AVG(CASE WHEN c = 2 THEN v END) * 1e4 + 0.5) / 1e4 AS mean_b
        FROM px GROUP BY doc_id, w, h
    """,
    "mm_jpeg_stats": """
        -- analytic rebuild of the synthesized JPEGs: dimensions are
        -- the synthesis parameters; because each 8x8 block is constant
        -- with an even level-shifted value, the lossy codec is exact
        -- on these images (quantized DC = (v-128)/2 is an integer a
        -- full 0.5 from every rounding boundary), so pixel sum/mean
        -- re-derive from the block formula v = 2*((37bx+53by+11s)%128)
        -- scaled by the 64 pixels per block. A hash match proves the
        -- Spark side's Huffman entropy decode + dequant + float IDCT
        -- reconstructed every pixel exactly.
        WITH p AS (
            SELECT doc_id,
                   2 + doc_id % 3 AS wb,
                   2 + (doc_id // 3) % 3 AS hb,
                   doc_id % 251 AS s
            FROM documents
        ),
        blk AS (
            SELECT p.doc_id, p.wb, p.hb,
                   2 * ((37 * gx.i + 53 * gy.i + 11 * p.s) % 128) AS v
            FROM p
            CROSS JOIN generate_series(0, 3) AS gx(i)
            CROSS JOIN generate_series(0, 3) AS gy(i)
            WHERE gx.i < p.wb AND gy.i < p.hb
        )
        SELECT doc_id,
               CAST(8 * wb AS INT) AS width,
               CAST(8 * hb AS INT) AS height,
               CAST(wb * hb AS INT) AS n_blocks,
               CAST(64 * SUM(v) AS BIGINT) AS px_sum,
               FLOOR(AVG(v) * 1e4 + 0.5) / 1e4 AS mean_px
        FROM blk GROUP BY doc_id, wb, hb
    """,
    "mm_image_resize": """
        -- nearest-neighbor sample of the generator formula at
        -- src = (dst * extent) // 4 — the same floor-division
        -- convention as png.resize_nearest, so the double-roundtrip
        -- (encode, decode, resize, re-encode, decode) pixel sum
        -- matches exactly
        WITH p AS (
            SELECT doc_id,
                   8 + doc_id % 9 AS w,
                   8 + (doc_id // 3) % 9 AS h,
                   doc_id % 251 AS s
            FROM documents
        ),
        px AS (
            SELECT p.doc_id,
                   (3 * ((x.i * p.w) // 4) + 7 * ((y.i * p.h) // 4)
                    + 11 * p.s + 13 * c.i) % 256 AS v
            FROM p
            CROSS JOIN generate_series(0, 3) AS x(i)
            CROSS JOIN generate_series(0, 3) AS y(i)
            CROSS JOIN generate_series(0, 2) AS c(i)
        )
        SELECT doc_id, 4 AS thumb_w, 4 AS thumb_h,
               CAST(SUM(v) AS BIGINT) AS pixel_sum
        FROM px GROUP BY doc_id
    """,
    "mm_image_hist": """
        -- integer greyscale bucketing of the generator formula:
        -- grey = (r + g + b) // 3 with each channel reduced mod 256
        -- FIRST (matching the decoded uint8 pixels), bucket = grey//32
        WITH p AS (
            SELECT doc_id,
                   8 + doc_id % 9 AS w,
                   8 + (doc_id // 3) % 9 AS h,
                   doc_id % 251 AS s
            FROM documents
        ),
        px AS (
            SELECT p.doc_id,
                   ((3 * x.i + 7 * y.i + 11 * p.s) % 256
                    + (3 * x.i + 7 * y.i + 11 * p.s + 13) % 256
                    + (3 * x.i + 7 * y.i + 11 * p.s + 26) % 256) // 3 AS grey
            FROM p
            CROSS JOIN generate_series(0, 15) AS x(i)
            CROSS JOIN generate_series(0, 15) AS y(i)
            WHERE x.i < p.w AND y.i < p.h
        )
        SELECT doc_id, CAST(grey // 32 AS INT) AS bucket,
               CAST(COUNT(*) AS BIGINT) AS n
        FROM px GROUP BY doc_id, grey // 32
    """,
    "mm_audio_rms": """
        -- analytic closed form of the synthesized square-wave clips:
        -- RMS and peak of an alternating ±A wave are exactly A, and
        -- the header fields are the synthesis parameters
        SELECT doc_id,
               8000 AS sample_rate,
               1 AS n_channels,
               CAST(50 + doc_id % 100 AS INT) AS n_samples,
               CAST(500 + doc_id % 30000 AS DOUBLE) AS rms,
               CAST(500 + doc_id % 30000 AS INT) AS peak
        FROM documents
    """,
    "mm_video_scenes": """
        -- rebuild the byte-frame kernel in SQL: per-char ascii codes
        -- (fixture text is pure ASCII, so char == byte), 64-byte
        -- tumbling frames, mean intensity, lag-diff scene flags
        WITH ascii_docs AS (
            SELECT doc_id, text FROM documents
            WHERE octet_length(encode(text)) = length(text)
        ),
        chars AS (
            SELECT doc_id, s.i AS i, ascii(substr(text, s.i + 1, 1)) AS b
            FROM ascii_docs CROSS JOIN generate_series(0, 1023) AS s(i)
            WHERE s.i < octet_length(encode(text))
        ),
        fr AS (
            SELECT doc_id, CAST(FLOOR(i / 64) AS INT) AS frame_idx, AVG(b) AS m
            FROM chars GROUP BY 1, 2
        ),
        d AS (
            SELECT doc_id, frame_idx, m,
                   lag(m) OVER (PARTITION BY doc_id ORDER BY frame_idx) AS prev
            FROM fr
        )
        SELECT doc_id, frame_idx,
               FLOOR(m * 1e4 + 0.5) / 1e4 AS mean_byte,
               (prev IS NULL OR abs(m - prev) > 2.0) AS is_scene_start
        FROM d
    """,
    "mm_frame_sample": """
        -- static series (DuckDB lacks lateral generate_series params);
        -- 0..1023 covers payloads up to 64 KiB (fixture max ~600 B)
        SELECT d.doc_id,
               CAST(s.i AS INT) AS frame_idx,
               CAST(LEAST(64, d.len - s.i * 64) AS INT) AS n_bytes
        FROM (SELECT doc_id, octet_length(encode(text)) AS len FROM documents) d
        CROSS JOIN generate_series(0, 1023) AS s(i)
        WHERE s.i * 64 < d.len
    """,
    "mm_audio_windows": """
        SELECT d.doc_id,
               CAST(s.i AS INT) AS window_idx,
               CAST(LEAST(128, d.len - s.i * 64) AS INT) AS n_bytes
        FROM (SELECT doc_id, octet_length(encode(text)) AS len FROM documents) d
        CROSS JOIN generate_series(0, 1023) AS s(i)
        WHERE s.i * 64 < d.len
    """,
    "mm_binary_meta": """
        SELECT doc_id,
               CAST(octet_length(encode(text)) AS INT) AS n_bytes,
               sha256(text) AS sha
        FROM documents
    """,
}
