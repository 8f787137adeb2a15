"""Multimodal column support (north-star component).

Images/audio/video are opaque ``binary`` columns with typed metadata
structs. The Spark-side plumbing — schemas, Arrow-batched mapInPandas
processors, partitioning discipline — is real and tested; the actual
codec calls (PIL/ffmpeg-style decode) are stubbed behind
``NotImplementedError`` / deterministic fakes because the decode
libraries are not in this environment (see codec.py).
"""

from quack_reduce_spark.multimodal.codec import (
    attach_binary_payload,
    audio_windows,
    decode_image_meta,
    extract_features,
    resize_image,
    sample_frames,
    scene_changes,
)

__all__ = [
    "attach_binary_payload",
    "audio_windows",
    "decode_image_meta",
    "extract_features",
    "resize_image",
    "sample_frames",
    "scene_changes",
]
