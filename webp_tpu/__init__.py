"""webp_tpu — a TPU-native WebP codec engine.

Full-capability WebP implementation (VP8 lossy + VP8L lossless, alpha,
animation, extended RIFF metadata) re-designed TPU-first: host code handles
containers and serial entropy tails; batched array kernels (numpy reference
implementations mirrored by JAX/Pallas device kernels) handle transforms,
prediction, filtering, color conversion, and rate-distortion search.

Public surface mirrors the reference crate `zenwebp`
(`/root/reference/src/lib.rs:89-101`).
"""

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
