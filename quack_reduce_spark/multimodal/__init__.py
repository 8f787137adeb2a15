"""Multimodal column support (north-star component).

Images/audio/video are opaque ``binary`` columns with typed metadata
structs. The Spark-side plumbing — schemas, Arrow-batched mapInPandas
processors, partitioning discipline — is real and tested. TWO
modalities are decoded FOR REAL with zero external libraries: 16-bit
PCM WAV (stdlib ``struct`` + numpy — ``decode_wav`` / ``wav_stats``)
and PNG (stdlib ``zlib`` + ``struct`` + numpy — png.py implements
both encode and decode with all five scanline filters, driving
``decode_image_meta`` / ``resize_image`` / ``extract_features`` with
``fake=False``). JPEG/WebP and video codec calls (libjpeg/PIL/ffmpeg)
remain stubbed behind ``NotImplementedError`` / deterministic fakes
because those libraries are not in this environment (see codec.py).
"""

from quack_reduce_spark.multimodal.codec import (
    attach_binary_payload,
    attach_png_payload,
    attach_wav_payload,
    audio_windows,
    decode_image_meta,
    decode_wav,
    extract_features,
    png_image_stats,
    png_thumb_sums,
    resize_image,
    sample_frames,
    scene_changes,
    synthesize_wav,
    wav_stats,
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
    "attach_png_payload",
    "attach_wav_payload",
    "audio_windows",
    "decode_image_meta",
    "decode_png",
    "decode_wav",
    "encode_png",
    "extract_features",
    "gray_histogram",
    "parse_png_header",
    "png_image_stats",
    "png_thumb_sums",
    "resize_image",
    "resize_nearest",
    "sample_frames",
    "scene_changes",
    "synthesize_png",
    "synthesize_wav",
    "wav_stats",
]
