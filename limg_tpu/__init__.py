"""limg-tpu: a TPU-native (JAX/XLA/Pallas) rebuild of the limg image codec.

The reference (rainerzufalldererste/limg) is a C++17/SSE research codec that
fits three sequential linear color factors per 8x8 block, merges similar
blocks into larger areas, bit-crushes the factor planes to adaptive bit
depths with dithering, and scores itself with a perceptually weighted PSNR.
This package re-designs every component TPU-first: blocks become the vector
lane axis of batched tensor programs, serial searches become masked
rank-over-candidates reductions, and the thread pool becomes XLA dispatch
plus jax.sharding meshes for multi-chip corpora.
"""

from .config import EncodeConfig, BLOCK_SIZE
from .encoder import encode_image, encode_image_device, encode_perf_step
from .ops.error import psnr as compare_psnr


def __getattr__(name):
    # lazy heavyweight surfaces so `import limg_tpu` stays light
    if name == "encode_image_merged":
        from .regions import encode_image_merged
        return encode_image_merged
    if name == "encode_legacy":
        from .legacy import encode_legacy
        return encode_legacy
    if name in ("serialize", "deserialize"):
        from . import bitstream
        return getattr(bitstream, name)
    raise AttributeError(name)


__all__ = [
    "EncodeConfig",
    "BLOCK_SIZE",
    "encode_image",
    "encode_image_device",
    "encode_perf_step",
    "encode_image_merged",
    "encode_legacy",
    "serialize",
    "deserialize",
    "compare_psnr",
]

__version__ = "0.2.0"
