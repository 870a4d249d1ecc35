"""Public encoder API and RIFF container muxing.

Capability parity with the reference encoder API
(`/root/reference/src/encoder/api.rs:417-914` EncoderParams/EncoderConfig/
Encoder/Preset, `:1232-1397` chunk writing incl. the VP8X+ALPH path for
lossy-with-alpha).
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import numpy as np

from ..errors import EncodingError, InvalidDimensions
from ..ops import yuv as yuvops


class Preset:
    """Content presets. The reference accepts these and ignores them
    (api.rs:633-640); here they tune real knobs: photographic presets turn
    on sharp-YUV chroma, synthetic-content presets route to lossless."""

    DEFAULT = "default"
    PICTURE = "picture"
    PHOTO = "photo"
    DRAWING = "drawing"
    ICON = "icon"
    TEXT = "text"


@dataclasses.dataclass
class EncoderParams:
    """Fine-tuning knobs (reference `EncoderParams`, api.rs:417-459)."""

    use_predictor_transform: bool = True


@dataclasses.dataclass
class EncoderConfig:
    """Reusable encoder configuration (reference api.rs:487-671)."""

    quality: float = 75.0
    alpha_quality: float = 100.0
    method: int = 4
    lossless: bool = False
    exact: bool = False
    preset: str = Preset.DEFAULT
    near_lossless: int = 100  # pre-quantization level (vp8l.py; the
                              # reference accepts but never wires this)
    target_size: int = 0      # full-output rate control (encode(); the
                              # reference accepts but never wires this)
    sharp_yuv: bool = False   # least-squares chroma refinement (ops/yuv.py);
                              # the reference accepts but never wires this
    params: EncoderParams = dataclasses.field(default_factory=EncoderParams)

    @classmethod
    def new_lossy(cls, quality: float = 75.0) -> "EncoderConfig":
        return cls(quality=quality, lossless=False)

    @classmethod
    def new_lossless(cls) -> "EncoderConfig":
        return cls(quality=100.0, lossless=True)


def _chunk(fourcc: bytes, payload: bytes) -> bytes:
    out = fourcc + len(payload).to_bytes(4, "little") + payload
    if len(payload) & 1:
        out += b"\x00"
    return out


def _riff(chunks: bytes) -> bytes:
    return b"RIFF" + (4 + len(chunks)).to_bytes(4, "little") + b"WEBP" + chunks


def _vp8x(
    width: int,
    height: int,
    *,
    alpha=False,
    icc=False,
    exif=False,
    xmp=False,
    anim=False,
) -> bytes:
    flags = (
        (0x20 if icc else 0)
        | (0x10 if alpha else 0)
        | (0x08 if exif else 0)
        | (0x04 if xmp else 0)
        | (0x02 if anim else 0)
    )
    payload = bytes([flags, 0, 0, 0])
    payload += (width - 1).to_bytes(3, "little")
    payload += (height - 1).to_bytes(3, "little")
    return _chunk(b"VP8X", payload)


class Encoder:
    """Builder-style encoder over an in-memory image.

    Accepts RGB8 / RGBA8 / L8 / LA8 numpy arrays ([h, w, c] or [h, w]).
    """

    def __init__(self, image: np.ndarray, color_type: Optional[str] = None):
        image = np.asarray(image)
        if image.ndim == 2:
            image = image[:, :, None]
        channels = image.shape[2]
        inferred = {1: "L8", 2: "LA8", 3: "RGB8", 4: "RGBA8"}.get(channels)
        if inferred is None:
            raise EncodingError(f"unsupported channel count {channels}")
        self.color_type = color_type or inferred
        self.image = image
        self.config = EncoderConfig()
        self.icc_profile: Optional[bytes] = None
        self.exif_metadata: Optional[bytes] = None
        self.xmp_metadata: Optional[bytes] = None

    # -- constructors mirrored from the reference builder -------------------

    @classmethod
    def new_rgb(cls, image):
        return cls(image, "RGB8")

    @classmethod
    def new_rgba(cls, image):
        return cls(image, "RGBA8")

    @classmethod
    def new_l8(cls, image):
        return cls(image, "L8")

    @classmethod
    def new_la8(cls, image):
        return cls(image, "LA8")

    # -- builder setters -----------------------------------------------------

    def with_quality(self, q: float):
        self.config.quality = q
        return self

    def with_method(self, m: int):
        self.config.method = m
        return self

    def with_lossless(self, lossless: bool = True):
        self.config.lossless = lossless
        return self

    def with_preset(self, preset: str):
        self.config.preset = preset
        if preset in (Preset.PHOTO, Preset.PICTURE):
            self.config.sharp_yuv = True
        elif preset in (Preset.ICON, Preset.TEXT):
            # Hard-edged synthetic content: lossless (the palette and LZ77
            # paths compress it far better than blocky lossy).
            self.config.lossless = True
        return self

    def with_sharp_yuv(self, sharp: bool = True):
        self.config.sharp_yuv = sharp
        return self

    def with_near_lossless(self, quality: int):
        self.config.near_lossless = int(quality)
        return self

    def with_target_size(self, size: int):
        self.config.target_size = int(size)
        return self

    def with_config(self, config: EncoderConfig):
        self.config = config
        return self

    def with_icc_profile(self, data: bytes):
        self.icc_profile = bytes(data)
        return self

    def with_exif_metadata(self, data: bytes):
        self.exif_metadata = bytes(data)
        return self

    def with_xmp_metadata(self, data: bytes):
        self.xmp_metadata = bytes(data)
        return self

    # -- encode --------------------------------------------------------------

    def _to_rgba(self) -> np.ndarray:
        img = self.image
        h, w = img.shape[:2]
        rgba = np.empty((h, w, 4), np.uint8)
        if self.color_type == "L8":
            rgba[:, :, 0] = rgba[:, :, 1] = rgba[:, :, 2] = img[:, :, 0]
            rgba[:, :, 3] = 255
        elif self.color_type == "LA8":
            rgba[:, :, 0] = rgba[:, :, 1] = rgba[:, :, 2] = img[:, :, 0]
            rgba[:, :, 3] = img[:, :, 1]
        elif self.color_type == "RGB8":
            rgba[:, :, :3] = img
            rgba[:, :, 3] = 255
        else:
            rgba[:, :] = img
        return rgba

    def encode(self) -> bytes:
        h, w = self.image.shape[:2]
        if not (0 < w <= 16383 and 0 < h <= 16383):
            raise InvalidDimensions(f"{w}x{h}")

        if self.config.target_size > 0 and not self.config.lossless:
            # Rate control on the FULL container output: bisect quality to
            # the largest file that fits (the reference accepts target_size
            # but never wires it; api.rs:487-671).
            target = self.config.target_size
            saved_q = self.config.quality
            self.config.target_size = 0
            try:
                lo, hi, best = 0.0, 100.0, None
                for _ in range(7):
                    self.config.quality = (lo + hi) / 2
                    cand = self.encode()
                    if len(cand) <= target:
                        best, lo = cand, self.config.quality
                    else:
                        hi = self.config.quality
                if best is None:
                    self.config.quality = 0.0
                    best = self.encode()
                return best
            finally:
                self.config.target_size = target
                self.config.quality = saved_q
        has_alpha = self.color_type in ("RGBA8", "LA8")
        has_meta = any(
            x is not None for x in (self.icc_profile, self.exif_metadata, self.xmp_metadata)
        )

        if self.config.lossless:
            from .vp8l import encode_lossless, near_lossless_preprocess

            rgba = self._to_rgba()
            if self.config.near_lossless < 100:
                rgba = near_lossless_preprocess(rgba, self.config.near_lossless)
            payload = encode_lossless(
                rgba,
                use_predictor=self.config.params.use_predictor_transform,
                alpha_used=has_alpha,
            )
            body = _chunk(b"VP8L", payload)
            needs_vp8x = has_meta
            alpha_flag = has_alpha
        else:
            from .vp8 import Vp8Encoder

            if self.color_type in ("L8", "LA8"):
                y, u, v = yuvops.gray_to_yuv420(self.image[:, :, 0])
            elif self.config.sharp_yuv:
                y, u, v = yuvops.rgb_to_yuv420_sharp(self.image)
            else:
                y, u, v = yuvops.rgb_to_yuv420(self.image)

            enc = Vp8Encoder(int(self.config.quality), self.config.method)
            vp8 = enc.encode_yuv(y, u, v, w, h)
            body = _chunk(b"VP8 ", vp8)
            alpha_flag = False
            if has_alpha:
                from .vp8l import encode_alpha_lossless

                alpha_plane = np.ascontiguousarray(self.image[:, :, -1])
                if self.config.alpha_quality < 100:
                    # Lossy-ish alpha: near-lossless pre-quantization of the
                    # plane before the (still lossless) ALPH compression —
                    # bounded error, much smaller chunks at low settings.
                    from .vp8l import near_lossless_preprocess

                    rgba_a = np.repeat(alpha_plane[:, :, None], 4, axis=2)
                    alpha_plane = np.ascontiguousarray(
                        near_lossless_preprocess(
                            rgba_a, int(self.config.alpha_quality)
                        )[:, :, 0]
                    )
                alph = _chunk(b"ALPH", encode_alpha_lossless(alpha_plane))
                body = alph + body
                alpha_flag = True
            needs_vp8x = has_meta or alpha_flag

        chunks = b""
        if needs_vp8x:
            chunks += _vp8x(
                w,
                h,
                alpha=alpha_flag,
                icc=self.icc_profile is not None,
                exif=self.exif_metadata is not None,
                xmp=self.xmp_metadata is not None,
            )
            if self.icc_profile is not None:
                chunks += _chunk(b"ICCP", self.icc_profile)
        chunks += body
        if needs_vp8x:
            if self.exif_metadata is not None:
                chunks += _chunk(b"EXIF", self.exif_metadata)
            if self.xmp_metadata is not None:
                chunks += _chunk(b"XMP ", self.xmp_metadata)
        return _riff(chunks)


class WebPEncoder:
    """Legacy writer-style API (reference `WebPEncoder`, api.rs:1243-1397)."""

    def __init__(self):
        self.config = EncoderConfig()
        self.icc_profile = None
        self.exif_metadata = None
        self.xmp_metadata = None

    def set_params(self, params: EncoderParams):
        self.config.params = params

    def set_quality(self, q: float):
        self.config.quality = q

    def set_lossless(self, lossless: bool):
        self.config.lossless = lossless

    def encode(self, data: np.ndarray, color_type: Optional[str] = None) -> bytes:
        enc = Encoder(data, color_type)
        enc.config = self.config
        enc.icc_profile = self.icc_profile
        enc.exif_metadata = self.exif_metadata
        enc.xmp_metadata = self.xmp_metadata
        return enc.encode()


def encode_rgb(image, quality: float = 75.0) -> bytes:
    return Encoder.new_rgb(image).with_quality(quality).encode()


def encode_rgba(image, quality: float = 75.0) -> bytes:
    return Encoder.new_rgba(image).with_quality(quality).encode()


def encode_lossless_rgba(image) -> bytes:
    return Encoder.new_rgba(image).with_lossless().encode()


class AnimationEncoder:
    """Animated WebP muxer: VP8X(anim) + ANIM + per-frame ANMF chunks.

    The reference has no animation encoder (its decoder-side state machine
    is api.rs:211-234 / extended.rs:31-149); this matches what its demuxer
    and ours both consume. Frames are lossless (VP8L) by default — lossless
    frames additionally crop to the changed bounding box against the
    running canvas — or lossy (VP8) at `quality` with full-frame rects.
    """

    def __init__(self, width: int, height: int, *, loop_count: int = 0,
                 background=(255, 255, 255, 255), lossless: bool = True,
                 quality: float = 75.0, method: int = 4):
        if not (0 < width <= 16384 and 0 < height <= 16384):
            raise InvalidDimensions(f"{width}x{height}")
        self.width = width
        self.height = height
        self.loop_count = loop_count
        self.background = tuple(int(c) for c in background)
        self.lossless = lossless
        self.quality = quality
        self.method = method
        self._frames = []  # ANMF chunk bytes
        self._canvas = None

    def add_frame(self, rgba: np.ndarray, duration_ms: int):
        """Append a full-canvas RGBA frame shown for duration_ms."""
        rgba = np.asarray(rgba)
        if rgba.shape[:2] != (self.height, self.width) or rgba.shape[2] != 4:
            raise EncodingError("frame must be full-canvas RGBA")
        x = y = 0
        fw, fh = self.width, self.height
        patch = rgba
        if self.lossless and self._canvas is not None:
            diff = (rgba != self._canvas).any(-1)
            ys, xs = np.nonzero(diff)
            if len(ys) == 0:
                # identical frame: 2x2 no-op patch (even offsets required)
                ys = xs = np.zeros(1, np.int64)
            # even offsets (ANMF stores x/2, y/2)
            y = int(ys.min()) & ~1
            x = int(xs.min()) & ~1
            fh = int(ys.max()) + 1 - y
            fw = int(xs.max()) + 1 - x
            patch = np.ascontiguousarray(rgba[y : y + fh, x : x + fw])

        if self.lossless:
            from .vp8l import encode_lossless

            sub = _chunk(b"VP8L", encode_lossless(patch, alpha_used=True))
        else:
            from ..ops import yuv as yuvops
            from .vp8 import Vp8Encoder

            yb, ub, vb = yuvops.rgb_to_yuv420(patch[:, :, :3])
            vp8 = Vp8Encoder(int(self.quality), self.method).encode_yuv(
                yb, ub, vb, fw, fh
            )
            sub = _chunk(b"VP8 ", vp8)
            if (patch[:, :, 3] != 255).any():
                from .vp8l import encode_alpha_lossless

                sub = _chunk(
                    b"ALPH", encode_alpha_lossless(np.ascontiguousarray(patch[:, :, 3]))
                ) + sub

        head = (x // 2).to_bytes(3, "little")
        head += (y // 2).to_bytes(3, "little")
        head += (fw - 1).to_bytes(3, "little")
        head += (fh - 1).to_bytes(3, "little")
        head += int(duration_ms).to_bytes(3, "little")
        head += bytes([0b10])  # no alpha-blend (overwrite rect), no dispose
        self._frames.append(_chunk(b"ANMF", head + sub))

        if self._canvas is None:
            self._canvas = np.zeros((self.height, self.width, 4), np.uint8)
            self._canvas[:, :] = np.array(self.background, np.uint8)
        self._canvas[y : y + fh, x : x + fw] = patch
        return self

    def finish(self) -> bytes:
        if not self._frames:
            raise EncodingError("animation needs at least one frame")
        anim = bytes(self.background) + int(self.loop_count).to_bytes(2, "little")
        chunks = _vp8x(self.width, self.height, alpha=True, anim=True)
        chunks += _chunk(b"ANIM", anim)
        chunks += b"".join(self._frames)
        return _riff(chunks)
