"""Device-side VP8 boolean (arithmetic) encoding over many lanes.

The range coder itself is bit-serial, but its SERIAL state is tiny
(bottom/range/bit counter); the part that looks un-vectorizable — carry
propagation through emitted 0xFF bytes — is just base-256 addition, and
addition has a carry-lookahead form. So the encoder runs as:

 1. one lax.scan over the (prob, bit) op stream, vectorized across lanes
    (e.g. batch x 8 coefficient partitions), whose per-step outputs are a
    possible raw byte and a carry count — NO feedback into emitted bytes;
 2. a gather-only compaction of the emitted bytes per lane
    (cumsum + searchsorted, same machinery as ops/sparse.py);
 3. carry resolution as big-integer addition with jax.lax.associative_scan
    (generate/propagate per byte digit; between two byte emissions there
    are exactly 8 range doublings, so per-digit carry addends are <= 8 and
    one lookahead pass suffices);
 4. a tiny per-lane epilogue for the final flush (host side).

Bit-exact against encode/boolenc.BoolEncoder (RFC 6386 §7.3 / reference
encoder/arithmetic.rs:19-195) — see tests/test_boolenc2.py.

Lane op streams are padded to a common length with `valid=0` no-ops.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


def _apply_op(carry, bit, prob, ok):
    """One boolean-coder op, vectorized over lanes.  Returns the new
    (bottom, range, bit_num) carry plus (emit_byte, emitted, carries)."""
    bottom, rng, bit_num = carry  # bottom uint32
    split = (1 + (((rng - 1) * prob) >> 8)).astype(jnp.uint32)
    bottom2 = jnp.where(bit != 0, bottom + split, bottom)
    rng2 = jnp.where(bit != 0, rng - split.astype(jnp.int32), split.astype(jnp.int32))

    emit_byte = jnp.zeros(bottom.shape, jnp.int32)
    emitted = jnp.zeros(bottom.shape, jnp.int32)
    carries = jnp.zeros(bottom.shape, jnp.int32)
    bit_num2 = bit_num
    # Renormalize: at most 7 doublings bring range back to >= 128.
    # A carry after this step's emission is impossible (the flushed
    # bottom is < 2^24 and <= 6 doublings remain), so every carry here
    # belongs to a PREVIOUS byte and rides the `carries` count.
    for _ in range(7):
        need = rng2 < 128
        carries = carries + jnp.where(need & ((bottom2 >> 31) != 0), 1, 0)
        rng2 = jnp.where(need, rng2 << 1, rng2)
        bottom2 = jnp.where(need, bottom2 << 1, bottom2)  # uint32 wraps
        bit_num2 = bit_num2 - need.astype(jnp.int32)
        do_emit = need & (bit_num2 == 0)
        emit_byte = jnp.where(
            do_emit, ((bottom2 >> 24) & 0xFF).astype(jnp.int32), emit_byte
        )
        emitted = emitted | do_emit.astype(jnp.int32)
        bottom2 = jnp.where(do_emit, bottom2 & 0xFFFFFF, bottom2)
        bit_num2 = jnp.where(do_emit, 8, bit_num2)

    okb = ok != 0
    new_carry = (
        jnp.where(okb, bottom2, bottom),
        jnp.where(okb, rng2, rng),
        jnp.where(okb, bit_num2, bit_num),
    )
    # narrow per-step outputs: T x L of them accumulate in HBM
    return new_carry, (
        emit_byte.astype(jnp.uint8),
        jnp.where(okb, emitted, 0).astype(jnp.uint8),
        jnp.where(okb, carries, 0).astype(jnp.uint8),
    )


# Ops per scan iteration.  One-op-per-iteration measured ~8 us/step of
# loop/DMA overhead on v5e (the ~172k-step stream ran 1.43 s/img — NOTES
# r3), and plain `unroll=` replicates the per-op [1, L] HBM slicing 16x
# rather than coalescing it (the r4 DMA-granularity floor, 274 ms/img).
# Instead the streams are reshaped to [T/C, C, L] so each scan iteration
# moves ONE contiguous [C, L] block per operand and the unrolled inner
# loop walks rows already resident in VMEM/registers.
CHUNK = 64


@functools.partial(jax.jit, static_argnames=("max_bytes",))
def bool_encode_lanes(bits, probs, valid, max_bytes: int, init_state=None):
    """Encode per-lane boolean op streams.

    bits/probs/valid: [T, L] integer arrays (valid==0 steps are no-ops,
    used to ragged-pad lanes). Returns (lead [L] int32 — nonzero means a
    carry overflowed past the stream start (prepend it, or carry-walk it
    into a host-written prefix when continuing an in-progress encoder via
    `init_state` = per-lane (bottom uint32, range, bit_num)), bytes_out
    [L, max_bytes] uint8 carry-resolved, n_bytes [L], and the final
    (bottom, range, bit_num) registers for the flush epilogue). A lane
    whose output exceeds max_bytes reports n_bytes > max_bytes (caller
    must fall back)."""
    T, L = bits.shape
    # Pad the op streams with no-ops: small T to the next power of two (it
    # collapses the set of distinct compiled shapes — the chunked body
    # makes each compile non-trivial, and tests sweep many lengths), large
    # T just to a CHUNK multiple (production T is fixed per geometry and
    # pow2 padding would waste up to 2x stream memory).  The wide chunk is
    # TPU-only: XLA:CPU takes >10 minutes to compile the 64-op body
    # (measured r5), and the CPU paths are tests/dryruns where chunk=8
    # compiles in seconds.
    chunk = CHUNK if (T > 8192 and jax.default_backend() == "tpu") else 8
    if T > 8192:
        Tp = ((T + chunk - 1) // chunk) * chunk
    else:
        Tp = chunk
        while Tp < T:
            Tp *= 2
    pad = Tp - T
    # Keep the streams at their narrow dtypes in HBM; widen per-step.
    bits = jnp.pad(bits, ((0, pad), (0, 0))).reshape(-1, chunk, L)
    probs = jnp.pad(probs, ((0, pad), (0, 0))).reshape(-1, chunk, L)
    valid = jnp.pad(valid, ((0, pad), (0, 0))).reshape(-1, chunk, L)

    def step(carry, x):
        bit_c, prob_c, ok_c = x  # [CHUNK, L] blocks, one DMA each
        bit_c = bit_c.astype(jnp.int32)
        prob_c = prob_c.astype(jnp.int32)
        ok_c = ok_c.astype(jnp.int32)
        eb, ef, ec = [], [], []
        for j in range(chunk):
            carry, (b, f, c) = _apply_op(
                carry, bit_c[j], prob_c[j], ok_c[j]
            )
            eb.append(b)
            ef.append(f)
            ec.append(c)
        return carry, (
            jnp.stack(eb), jnp.stack(ef), jnp.stack(ec)
        )

    if init_state is None:
        init = (
            jnp.zeros((L,), jnp.uint32),
            jnp.full((L,), 255, jnp.int32),
            jnp.full((L,), 24, jnp.int32),
        )
    else:
        b0, r0, n0 = init_state
        init = (
            b0.astype(jnp.uint32),
            r0.astype(jnp.int32),
            n0.astype(jnp.int32),
        )
    (bottom, rng, bit_num), (ebytes, eflags, ecarr) = jax.lax.scan(
        step,
        init,
        (bits, probs, valid),
    )
    T = Tp
    ebytes = ebytes.reshape(T, L)
    eflags = eflags.reshape(T, L)
    ecarr = ecarr.reshape(T, L)
    ebytes = ebytes.T.astype(jnp.int32)  # [L, T]
    eflags = eflags.T.astype(jnp.int32)
    ecarr = ecarr.T.astype(jnp.int32)

    cs = jnp.cumsum(eflags, axis=1)  # emitted-count prefix per lane
    n_bytes = cs[:, -1]
    ks = jnp.arange(1, max_bytes + 1, dtype=jnp.int32)

    def one(cs_l, eb_l, ec_l):
        idx = jnp.searchsorted(cs_l, ks, side="left")  # step of k-th emit
        d = eb_l[jnp.clip(idx, 0, T - 1)]
        d = jnp.where(idx < T, d, 0)
        csc = jnp.cumsum(ec_l)
        at_k = jnp.where(idx < T, csc[jnp.clip(idx, 0, T - 1)], csc[-1])
        # addend[k] = carries arriving while digit k is the newest byte:
        # strictly after emit_k, up to and including emit_{k+1}'s step.
        nxt = jnp.concatenate([at_k[1:], csc[-1][None]])
        addend = nxt - at_k
        # carries before the first byte exists overflow past the stream
        # start (BoolEncoder prepends 0x01): they ride a virtual lead digit.
        early = at_k[0] if max_bytes > 0 else csc[-1]
        return d, addend, early

    digits, addend, early = jax.vmap(one)(cs, ebytes, ecarr)

    # Base-256 carry-lookahead over [lead | digits]: carries flow from the
    # last digit toward the front.
    s = jnp.concatenate([early[:, None], digits + addend], axis=1)
    g = (s >= 256).astype(jnp.int32)
    p = (s == 255).astype(jnp.int32)

    def comb(a, b):
        ga, pa = a
        gb, pb = b
        return gb | (pb & ga), pb & pa

    gr = jnp.flip(g, axis=1)
    pr = jnp.flip(p, axis=1)
    G, _ = jax.lax.associative_scan(comb, (gr, pr), axis=1)
    carry_in = jnp.flip(
        jnp.concatenate([jnp.zeros((L, 1), jnp.int32), G[:, :-1]], axis=1), axis=1
    )
    out = (s + carry_in) & 0xFF
    return (
        out[:, 0],
        out[:, 1:].astype(jnp.uint8),
        n_bytes,
        (bottom, rng, bit_num),
    )


def flush_lane(bottom: int, bit_num: int, prefix: bytes) -> bytes:
    """Host epilogue: replicate BoolEncoder.flush() on a lane's final
    registers, applying any final carry to the already-resolved prefix."""
    out = bytearray(prefix)
    c = bit_num
    v = int(bottom)
    if v & (1 << (32 - c)):
        i = len(out) - 1
        while i >= 0:
            if out[i] < 255:
                out[i] += 1
                break
            out[i] = 0
            i -= 1
        else:
            out[0:0] = b"\x01"
    v = (v << (c & 7)) & 0xFFFFFFFF
    c = (c >> 3) - 1
    while c >= 0:
        v = (v << 8) & 0xFFFFFFFF
        c -= 1
    for _ in range(4):
        out.append((v >> 24) & 0xFF)
        v = (v << 8) & 0xFFFFFFFF
    return bytes(out)


def _carry_walk(out: bytearray):
    """Apply one +1 carry to the tail of `out` (0xFF chain; prepend 0x01)."""
    i = len(out) - 1
    while i >= 0:
        if out[i] < 255:
            out[i] += 1
            return
        out[i] = 0
        i -= 1
    out[0:0] = b"\x01"


def assemble_lane(lead: int, data: np.ndarray, n: int, bottom: int,
                  bit_num: int, prefix: bytes = b"") -> bytes:
    """Final per-lane byte stream: host-written prefix (when continuing an
    in-progress encoder) with `lead` carries applied, resolved digits, and
    the flush epilogue."""
    out = bytearray(prefix)
    for _ in range(int(lead)):
        _carry_walk(out)
    out += bytes(data[:n])
    return flush_lane(bottom, bit_num, bytes(out))
