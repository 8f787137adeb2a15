"""Multimodal column support (north-star component).

Images/audio/video are opaque ``binary`` columns with typed metadata
structs. The Spark-side plumbing — schemas, Arrow-batched mapInPandas
processors, partitioning discipline — is real and tested. TWO
modalities are decoded FOR REAL with zero external libraries: 16-bit
PCM WAV (stdlib ``struct`` + numpy — ``decode_wav`` / ``wav_stats``)
and PNG (stdlib ``zlib`` + ``struct`` + numpy — png.py implements
both encode and decode with all five scanline filters, driving
``decode_image_meta`` / ``resize_image`` / ``extract_features`` with
``fake=False``). A THIRD real codec, baseline-DCT grayscale JPEG
(stdlib ``struct`` + numpy — jpeg.py: Huffman entropy coding, float
IDCT, full marker-walk decoder), drives ``attach_jpeg_payload`` /
``jpeg_image_stats``. Color/progressive JPEG, WebP and video codec
calls (libjpeg/PIL/ffmpeg) remain stubbed behind
``NotImplementedError`` / deterministic fakes because those libraries
are not in this environment (see codec.py).
"""

from quack_reduce_spark.multimodal.codec import (
    attach_binary_payload,
    attach_jpeg_payload,
    attach_png_payload,
    attach_wav_payload,
    audio_windows,
    decode_image_meta,
    decode_wav,
    extract_features,
    jpeg_image_stats,
    png_image_stats,
    png_thumb_sums,
    resize_image,
    sample_frames,
    scene_changes,
    synthesize_wav,
    wav_stats,
)
from quack_reduce_spark.multimodal.jpeg import (
    decode_gray_jpeg,
    encode_gray_jpeg,
    synthesize_gray_jpeg,
)
from quack_reduce_spark.multimodal.png import (
    decode_png,
    encode_png,
    gray_histogram,
    parse_png_header,
    resize_nearest,
    synthesize_png,
)

__all__ = [
    "attach_binary_payload",
    "attach_jpeg_payload",
    "attach_png_payload",
    "attach_wav_payload",
    "audio_windows",
    "decode_gray_jpeg",
    "decode_image_meta",
    "decode_png",
    "decode_wav",
    "encode_gray_jpeg",
    "encode_png",
    "extract_features",
    "gray_histogram",
    "jpeg_image_stats",
    "parse_png_header",
    "png_image_stats",
    "png_thumb_sums",
    "resize_image",
    "resize_nearest",
    "sample_frames",
    "scene_changes",
    "synthesize_gray_jpeg",
    "synthesize_png",
    "synthesize_wav",
    "wav_stats",
]
