"""Multimodal column support (north-star component).

Images/audio/video are opaque ``binary`` columns with typed metadata
structs. The Spark-side plumbing — schemas, Arrow-batched mapInPandas
processors, partitioning discipline — is real and tested. Audio is
decoded FOR REAL: 16-bit PCM WAV parsing is pure stdlib+numpy
(``decode_wav`` / ``wav_stats``), no external libs needed. Image/video
codec calls (PIL/ffmpeg-style decode) remain stubbed behind
``NotImplementedError`` / deterministic fakes because those libraries
are not in this environment (see codec.py).
"""

from quack_reduce_spark.multimodal.codec import (
    attach_binary_payload,
    attach_wav_payload,
    audio_windows,
    decode_image_meta,
    decode_wav,
    extract_features,
    resize_image,
    sample_frames,
    scene_changes,
    synthesize_wav,
    wav_stats,
)

__all__ = [
    "attach_binary_payload",
    "attach_wav_payload",
    "audio_windows",
    "decode_image_meta",
    "decode_wav",
    "extract_features",
    "resize_image",
    "sample_frames",
    "scene_changes",
    "synthesize_wav",
    "wav_stats",
]
