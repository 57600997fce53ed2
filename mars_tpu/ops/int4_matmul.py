"""Weight-only int4 matmul: packed nibbles streamed from HBM, unpacked
in-kernel.

The reference serves ViP-LLaVA-7B through bitsandbytes 4-bit CUDA kernels
(reference: mars/components/TextRetrieverModule.py:468-471).  On this
environment jax's native int4 arrays cannot cross a jit boundary (the
argument-resharding path recurses — see CLAUDE.md), so 4-bit weights are
stored as two nibbles per int8 byte along the INPUT dimension in a
**hybrid-coded** layout chosen so the in-kernel unpack is two integer ops:

    byte[i, o] = (q[2i+1, o] << 4) | ((q[2i, o] + 8) & 0xF)

i.e. the high nibble is the SIGNED value of the odd row and the low nibble
is the even row OFFSET by +8 (in [1, 15]).  Unpacking is then

    lo_u = byte & 0xF          # q_even + 8
    hi   = byte >> 4           # arithmetic shift: exact signed q_odd
                               # (lo_u <= 15 never carries into hi)

— no sign-extension shifts.  The +8 bias is removed with one rowsum
correction per input tile (acc -= 8 * sum(x_even_tile)), which is O(TILE_IN)
against the O(TILE_IN * TILE_OUT) unpack.  With x_even = x[:, 0::2] and
x_odd = x[:, 1::2] (a tiny activation shuffle done once per call):

    y = x_even @ (lo_u - 8) + x_odd @ hi

(NOT the algebraic 16*hi+lo packing with a single extraction — that
formulation cancels catastrophically in bf16 dots: measured rel err
0.022 vs 0.002, and it is no faster.)

The Pallas kernel evaluates tile by tile: the packed (TILE_IN/2, TILE_OUT)
int8 block is the ONLY weight traffic (0.5 bytes/param — half of int8, a
quarter of bf16), nibbles are split in VMEM and fed to the MXU as two
dots.  Per-output-channel scales multiply after the accumulation.

Measured bound (decode-proxy, 8 LLaMA-7B layers on one v5e): this kernel
streams packed bytes at ~135 GB/s vs the XLA int8 path's ~425-690 GB/s.
The gap is structural, not schedule slack: at B=1 every dot is bounded by
the MXU weight-feed rate (each 128x128 weight tile costs ~128 cycles to
load for one row of MACs) AND every nibble costs >=1 VPU lane-op to place,
so int4 cannot out-run int8 decoding on this chip generation — its value
is the 2x weight-memory saving (3.67 GB vs 7.0 GB for the 7B VLM).  For
decode THROUGHPUT, batch rows instead (generate_greedy's per-row
true_length); see BASELINE.md "Quantization".
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# 256 divides every production matmul dim in the zoo (LLaMA-7B: 4096,
# 11008, 32000-head excluded; CLIP/DINOv2: 768/1024/3072/4096)
TILE_IN = 256   # unpacked input rows per grid step (128 packed rows)
TILE_OUT = 256


def pack_int4(q: jnp.ndarray) -> jnp.ndarray:
    """(IN, OUT) int8 values in [-7, 7] → (IN/2, OUT) hybrid-packed int8."""
    assert q.shape[0] % 2 == 0, "input dim must be even to pack nibbles"
    lo, hi = q[0::2], q[1::2]
    return jnp.bitwise_or(jnp.bitwise_and(lo + 8, 0xF),
                          jnp.left_shift(hi, 4)).astype(jnp.int8)


def unpack_int4(packed: jnp.ndarray) -> jnp.ndarray:
    """(IN/2, OUT) hybrid-packed int8 → (IN, OUT) int8 in [-7, 7]."""
    p = packed.astype(jnp.int32)
    lo = jnp.bitwise_and(p, 0xF) - 8
    hi = jnp.right_shift(p, 4)  # arithmetic: sign-preserving
    n, out = packed.shape
    return jnp.stack([lo, hi], axis=1).reshape(n * 2, out).astype(jnp.int8)


def _nf4_code():
    # single source of truth for the published 16-entry codebook (lazy to
    # keep ops→models import one-directional at module-load time)
    from mars_tpu.models.quantization import NF4_CODE

    return NF4_CODE


def _nf4_lookup(c: jnp.ndarray) -> jnp.ndarray:
    """int32 codes in [0, 15] → f32 codebook values.

    Mosaic has no vector gather; a 4-deep binary select tree (15 ``where``s
    against scalar constants, one per codebook entry) does the 16-entry
    lookup in pure VPU lane ops."""
    C = _nf4_code()
    b0, b1 = (c & 1) != 0, (c & 2) != 0
    b2, b3 = (c & 4) != 0, (c & 8) != 0
    lvl = [jnp.where(b0, float(C[2 * i + 1]), float(C[2 * i]))
           for i in range(8)]
    lvl = [jnp.where(b1, lvl[2 * i + 1], lvl[2 * i]) for i in range(4)]
    lvl = [jnp.where(b2, lvl[2 * i + 1], lvl[2 * i]) for i in range(2)]
    return jnp.where(b3, lvl[1], lvl[0])


def _nf4_kernel(x_even_ref, x_odd_ref, wp_ref, bs_ref, o_ref):
    """NF4 tile matmul: packed codes + per-64-block scales → two MXU dots.

    Unlike the affine kernel there is no epilogue rescale: block scales
    vary along the INPUT dim, so they fold into the looked-up weights
    before the dot (packed row r holds original rows 2r/2r+1 — the same
    64-block, so one expanded scale row serves both nibbles)."""
    i = pl.program_id(1)

    @pl.when(i == 0)
    def _init():
        o_ref[...] = jnp.zeros_like(o_ref)

    p = wp_ref[...].astype(jnp.int32) & 0xFF  # undo int8 sign-extension
    vlo = _nf4_lookup(p & 0xF)                # (TILE_IN//2, TILE_OUT) f32
    vhi = _nf4_lookup((p >> 4) & 0xF)
    # bs block is (TILE_IN//64, 1, TILE_OUT): the singleton second-minor dim
    # satisfies Mosaic's block divisibility rule for ANY block count per
    # tile (tile_in//64 can be 4 at din=11008 where no 512-multiple divides)
    bs = bs_ref[...]
    nb, _, t_out = bs.shape
    rep = jnp.broadcast_to(bs, (nb, 32, t_out))
    rep = rep.reshape(nb * 32, t_out)         # per-packed-row scale
    dt = x_even_ref.dtype
    acc = jax.lax.dot_general(
        x_even_ref[...], (vlo * rep).astype(dt), (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    acc += jax.lax.dot_general(
        x_odd_ref[...], (vhi * rep).astype(dt), (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    o_ref[...] += acc


@functools.partial(jax.jit,
                   static_argnames=("interpret", "tile_in", "tile_out"))
def matmul_nf4(x: jnp.ndarray, packed: jnp.ndarray, bscale: jnp.ndarray,
               interpret: bool = False, tile_in: int = None,
               tile_out: int = TILE_OUT) -> jnp.ndarray:
    """x (B, IN) @ nf4_dequant(packed (IN/2, OUT), bscale (IN/64, OUT)).

    The bitsandbytes NF4 layout (models/quantization.quantize_kernel_nf4):
    unsigned 4-bit codebook indices two-per-byte along the input dim, f32
    absmax scales per 64-input-row block.  Streams 0.5625 bytes/param
    (codes + scales) and does the codebook lookup + scale fold in VMEM —
    the reference's --vlm4bit numerics WITHOUT materializing bf16 weights
    in HBM (the dense dequant path measured 304 ms/step on the 7B).
    """
    b, d_in = x.shape
    d_out = packed.shape[1]
    assert packed.shape[0] * 2 == d_in
    assert bscale.shape == (d_in // 64, d_out), (bscale.shape, d_in, d_out)
    if tile_in is None:
        tile_in = next((t for t in (2048, 1024, 512, 256) if d_in % t == 0),
                       TILE_IN)
    assert tile_in % 64 == 0
    out_dtype = x.dtype
    if interpret and x.dtype == jnp.bfloat16:
        x = x.astype(jnp.float32)  # CPU interpret lacks bf16 dot support

    pad_in = -d_in % tile_in
    pad_out = -d_out % tile_out
    if pad_in:
        x = jnp.pad(x, ((0, 0), (0, pad_in)))
    if pad_in or pad_out:
        # code 7 is the exact-zero codebook entry: 0x77 pads decode to 0.0
        wp = jnp.pad(packed, ((0, pad_in // 2), (0, pad_out)),
                     constant_values=0x77)
        bscale = jnp.pad(bscale, ((0, pad_in // 64), (0, pad_out)))
    else:
        wp = packed
    x_even, x_odd = x[:, 0::2], x[:, 1::2]

    ip, op = d_in + pad_in, d_out + pad_out
    grid = (op // tile_out, ip // tile_in)
    y = pl.pallas_call(
        _nf4_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((b, tile_in // 2), lambda j, i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((b, tile_in // 2), lambda j, i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_in // 2, tile_out), lambda j, i: (i, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_in // 64, 1, tile_out), lambda j, i: (i, 0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((b, tile_out), lambda j, i: (0, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, op), jnp.float32),
        interpret=interpret,
    )(x_even, x_odd, wp, bscale[:, None, :])
    return y[:, :d_out].astype(out_dtype)


def _kernel(x_even_ref, x_odd_ref, wp_ref, o_ref):
    i = pl.program_id(1)  # minor grid dim: input tiles (accumulation)

    @pl.when(i == 0)
    def _init():
        o_ref[...] = jnp.zeros_like(o_ref)

    # Mosaic has no i8 vector ops: widen to i32 for the nibble split.
    # Hybrid coding needs only an AND (low, offset-coded) and one
    # arithmetic shift (high, signed) — see module docstring.
    p = wp_ref[...].astype(jnp.int32)  # (TILE_IN//2, TILE_OUT)
    lo_u = jnp.bitwise_and(p, 0xF)     # q_even + 8
    hi = jnp.right_shift(p, 4)
    dt = x_even_ref.dtype
    xe = x_even_ref[...]
    acc = jax.lax.dot_general(
        xe, lo_u.astype(dt), (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    acc += jax.lax.dot_general(
        x_odd_ref[...], hi.astype(dt), (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    # remove the +8 offset on the even nibbles
    acc -= 8.0 * jnp.sum(xe.astype(jnp.float32), axis=1, keepdims=True)
    o_ref[...] += acc


@functools.partial(jax.jit,
                   static_argnames=("interpret", "tile_in", "tile_out"))
def matmul_int4(x: jnp.ndarray, packed: jnp.ndarray, scale: jnp.ndarray,
                interpret: bool = False, tile_in: int = None,
                tile_out: int = TILE_OUT) -> jnp.ndarray:
    """x (B, IN) @ dequant(packed (IN/2, OUT), scale (OUT,)) → (B, OUT).

    Output dtype follows x; accumulation is f32.  ``tile_in`` defaults to
    the largest divisor of IN in {2048, 1024, 512, 256} (measured sweep on
    v5e; see module docstring for the bound analysis).  Non-tile-multiple
    dims are padded per call — a full weight copy; pack production kernels
    at tile-multiple shapes.
    """
    b, d_in = x.shape
    d_out = packed.shape[1]
    assert packed.shape[0] * 2 == d_in
    if tile_in is None:
        tile_in = next((t for t in (2048, 1024, 512, 256) if d_in % t == 0),
                       TILE_IN)
    out_dtype = x.dtype
    if interpret and x.dtype == jnp.bfloat16:
        x = x.astype(jnp.float32)  # CPU interpret lacks bf16 dot support

    pad_in = -d_in % tile_in
    pad_out = -d_out % tile_out
    if pad_in:
        x = jnp.pad(x, ((0, 0), (0, pad_in)))
    if pad_in or pad_out:
        # pad packed rows with the zero-valued CODE (8 = 0+8 offset low
        # nibble, 0 high nibble) so padded rows contribute 0 - 8*x_pad,
        # and x is zero there anyway; pure zero bytes would decode to -8
        wp = jnp.pad(packed, ((0, pad_in // 2), (0, pad_out)),
                     constant_values=8)
    else:
        wp = packed
    x_even, x_odd = x[:, 0::2], x[:, 1::2]

    ip, op = d_in + pad_in, d_out + pad_out
    grid = (op // tile_out, ip // tile_in)
    y = pl.pallas_call(
        _kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((b, tile_in // 2), lambda j, i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((b, tile_in // 2), lambda j, i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_in // 2, tile_out), lambda j, i: (i, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((b, tile_out), lambda j, i: (0, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, op), jnp.float32),
        interpret=interpret,
    )(x_even, x_odd, wp)
    y = y[:, :d_out] * scale[None, :]
    return y.astype(out_dtype)
