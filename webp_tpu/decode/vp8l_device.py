"""Batched VP8L lossless decode with device-side inverse transforms.

The serial Huffman entropy pass runs per image on the host (native C++,
threaded across the batch; python fallback), producing the pre-transform
pixel tensor plus the transform descriptors. Images sharing geometry AND
transform signature batch into one jitted device call that applies the
inverse transforms in reverse stream order (ops/vp8l_device.py kernels:
subtract-green / color / palette as vector ops, the predictor as a
knight-move wavefront scan).

Reference behavior: /root/reference/src/decoder/lossless.rs:92-177 (entropy)
and lossless_transform.rs (transforms).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import vp8l_device as K
from .vp8l import LosslessDecoder


def _host_entropy(data: bytes, width: int, height: int, implicit: bool):
    """(pre-transform buf [h, tw, 4] uint8, transforms list) via C++ or python."""
    from ..io import native

    if native.available():
        try:
            return native.vp8l_decode_entropy(data, width, height, implicit)
        except Exception:
            pass
    dec = LosslessDecoder(data)
    flat, tw = dec.decode_entropy(width, height, implicit)
    transforms = []
    for t in dec.transform_order:
        kind, payload = dec.transforms[t]
        if kind == "predictor":
            transforms.append((0, payload[0], 0, payload[1]))
        elif kind == "color":
            transforms.append((1, payload[0], 0, payload[1]))
        elif kind == "subtract_green":
            transforms.append((2, 0, 0, np.zeros(0, np.uint8)))
        else:
            transforms.append((3, 0, payload[0], payload[1].reshape(-1)))
    return flat.reshape(height, tw, 4), transforms


def _subsample(size: int, bits: int) -> int:
    return (size + (1 << bits) - 1) >> bits


def _signature(transforms, tw: int):
    return tuple((t, sb, ts) for t, sb, ts, _ in transforms) + (tw,)


@functools.partial(
    jax.jit, static_argnames=("sig", "width", "height")
)
def _apply_transforms_device(px, tparams, sig, width: int, height: int):
    """px [B, h, tw, 4]; tparams: tuple of stacked per-transform arrays."""
    out = px
    for (ttype, size_bits, table_size), param in zip(
        reversed(sig[:-1]), reversed(tparams)
    ):
        if ttype == 0:
            out = K.inverse_predictor_batch(out, param, size_bits)
        elif ttype == 1:
            out = K.color_transform(out, param, size_bits)
        elif ttype == 2:
            out = K.subtract_green(out)
        else:
            out = K.color_indexing(out, param, table_size, width)
    return out


def decode_lossless_batch_device(datas, width: int, height: int,
                                 implicit_dims: bool = False,
                                 device_out: bool = False):
    """Decode same-geometry VP8L payloads to RGBA [B, h, w, 4].

    Host entropy runs threaded across the batch; each distinct transform
    signature dispatches one batched device call (payloads produced by one
    encoder share a signature, so the common case is a single call).
    """
    from .device import _parse_pool

    B = len(datas)
    results = list(
        _parse_pool().map(
            lambda d: _host_entropy(bytes(d), width, height, implicit_dims), datas
        )
    )

    out = [None] * B
    groups = {}
    for i, (buf, transforms) in enumerate(results):
        groups.setdefault(_signature(transforms, buf.shape[1]), []).append(i)

    pieces = []
    for sig, idxs in groups.items():
        px = jnp.asarray(np.stack([results[i][0] for i in idxs]))
        tparams = []
        for k, (ttype, size_bits, table_size) in enumerate(sig[:-1]):
            if ttype == 0:
                # predictor image's green channel = per-block mode
                stacked = np.stack(
                    [
                        results[i][1][k][3].reshape(-1, 4)[:, 1].reshape(
                            _subsample(height, size_bits), -1
                        )
                        for i in idxs
                    ]
                )
            elif ttype == 1:
                stacked = np.stack(
                    [
                        results[i][1][k][3].reshape(
                            _subsample(height, size_bits), -1, 4
                        )
                        for i in idxs
                    ]
                )
            elif ttype == 2:
                stacked = np.zeros((len(idxs), 0), np.uint8)
            else:
                tab = np.zeros((len(idxs), 256, 4), np.uint8)
                for j, i in enumerate(idxs):
                    d = results[i][1][k][3].reshape(-1, 4)
                    tab[j, : len(d)] = d
                stacked = tab
            tparams.append(jnp.asarray(stacked))
        rgba = _apply_transforms_device(px, tuple(tparams), sig, width, height)
        pieces.append((idxs, rgba))

    if device_out and len(pieces) == 1:
        return pieces[0][1]
    for idxs, rgba in pieces:
        arr = np.asarray(rgba)
        for j, i in enumerate(idxs):
            out[i] = arr[j]
    return np.stack(out)
