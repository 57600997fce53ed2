"""Pallas TPU kernel for SAM's global grid attention with decomposed rel-pos.

The SAM image encoder's 4 global layers (reference image_encoder.py:224-241,
``add_decomposed_rel_pos`` :325-366) attend over the full (H/16)x(W/16) token
grid — 4096 tokens at the ViT-H production scale (1024 px).  The XLA path
materializes the (heads, 4096, 4096) logits tensor in HBM (512 MB bf16),
adds the decomposed rel-pos bias through a 6-d broadcast, and round-trips
the whole thing through an f32 softmax: ~2 GB of HBM traffic per layer on
an op with only ~86 GFLOP of real matmul work.

This kernel keeps each (q-tile, L) logits block resident in VMEM:

- grid = (heads, L/TILE_Q); K and V stay whole-head in VMEM across the
  inner q-tile loop (Mosaic skips re-fetch while the block index is
  unchanged), so HBM reads per layer are just heads * (K + V).
- The decomposed bias ``B[q, k] = Bh[q, yk] + Bw[q, xk]`` (yk = k // W,
  xk = k % W) is expanded on the MXU: two (TILE_Q, Hpad) x (Hpad, L)
  matmuls against constant 0/1 expander matrices Eh/Ew — no gathers, no
  reshape of the big tensor, f32 accumulation for free.
- softmax is f32 in VMEM (the tower's precision discipline) and the
  probs are cast to the value dtype only for the PV matmul.

Numerics: the qk product accumulates in f32 on the MXU (the XLA path's
bf16-tower einsum rounds to bf16 first), so results differ from the XLA
path at bf16 epsilon; a tolerance-gated parity test pins the two paths
against each other.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TILE_Q = 256
_LANE = 128


def _kernel(l_actual, scale,
            q_ref, k_ref, v_ref, bh_ref, bw_ref, eh_ref, ew_ref, out_ref):
    lp = k_ref.shape[1]
    logits = jax.lax.dot_general(
        q_ref[0], k_ref[0], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) * scale
    logits += jax.lax.dot_general(
        bh_ref[0], eh_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    logits += jax.lax.dot_general(
        bw_ref[0], ew_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    if l_actual != lp:
        col = jax.lax.broadcasted_iota(jnp.int32, (TILE_Q, lp), 1)
        logits = jnp.where(col < l_actual, logits, -jnp.inf)
    probs = jax.nn.softmax(logits, axis=-1)
    out_ref[0] = jax.lax.dot_general(
        probs.astype(v_ref.dtype), v_ref[0], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(out_ref.dtype)


def _expanders(h, w, lp, dtype):
    """Eh (Hpad, Lp) with Eh[y, k] = [k // w == y]; Ew (Wpad, Lp) likewise
    for k % w.  Constant 0/1 matrices; padded rows/cols are zero."""
    hpad = -(-h // _LANE) * _LANE
    wpad = -(-w // _LANE) * _LANE
    k = np.arange(lp)
    valid = k < h * w
    eh = np.zeros((hpad, lp), np.float32)
    ew = np.zeros((wpad, lp), np.float32)
    eh[np.where(valid, k // w, 0), k] = valid.astype(np.float32)
    ew[np.where(valid, k % w, 0), k] = valid.astype(np.float32)
    return jnp.asarray(eh, dtype), jnp.asarray(ew, dtype)


@functools.partial(jax.jit, static_argnames=("grid_hw", "interpret"))
def grid_attention_pallas(q, k, v, bias_h, bias_w, grid_hw,
                          interpret: bool = False):
    """Global grid attention with decomposed rel-pos bias.

    q, k, v: (heads, L, hd) tower dtype, q UNscaled (the kernel applies
    hd**-0.5 to the qk product only, matching the reference's
    ``(q * scale) @ k.T + decomposed_bias(q_unscaled)``).
    bias_h: (heads, L, H) per-query bias over key ROWS; bias_w (heads, L, W)
    over key COLUMNS, both precomputed by the caller's small einsums.
    grid_hw: static (H, W) with H * W == L.  Returns (heads, L, hd).
    """
    nh, l, d = q.shape
    h, w = grid_hw
    assert h * w == l, (h, w, l)
    scale = d ** -0.5
    lp = -(-l // TILE_Q) * TILE_Q
    dp = max(-(-d // _LANE) * _LANE, _LANE)
    hpad = -(-h // _LANE) * _LANE
    wpad = -(-w // _LANE) * _LANE

    qp = jnp.pad(q, ((0, 0), (0, lp - l), (0, dp - d)))
    kp = jnp.pad(k, ((0, 0), (0, lp - l), (0, dp - d)))
    vp = jnp.pad(v, ((0, 0), (0, lp - l), (0, dp - d)))
    bh = jnp.pad(bias_h, ((0, 0), (0, lp - l), (0, hpad - h)))
    bw = jnp.pad(bias_w, ((0, 0), (0, lp - l), (0, wpad - w)))
    eh, ew = _expanders(h, w, lp, q.dtype)

    grid = (nh, lp // TILE_Q)
    out = pl.pallas_call(
        functools.partial(_kernel, l, scale),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, TILE_Q, dp), lambda hh, i: (hh, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, lp, dp), lambda hh, i: (hh, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, lp, dp), lambda hh, i: (hh, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, TILE_Q, hpad), lambda hh, i: (hh, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, TILE_Q, wpad), lambda hh, i: (hh, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((hpad, lp), lambda hh, i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((wpad, lp), lambda hh, i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, TILE_Q, dp), lambda hh, i: (hh, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((nh, lp, dp), q.dtype),
        compiler_params=pltpu.CompilerParams(
            # K + V + Eh + Ew resident (~4 MB bf16 at 4096) + the f32
            # logits/probs tiles (~8 MB) sit close to Mosaic's default
            # 16 MB scoped-vmem cap; grant headroom like ops/assignment.py
            vmem_limit_bytes=64 * 1024 * 1024,
        ),
        interpret=interpret,
    )(qp, kp, vp, bh, bw, eh, ew)
    return out[:, :l, :d]


# ---------------------------------------------------------------------------
# windowed grid attention (the 28 non-global ViT-H layers)
# ---------------------------------------------------------------------------

def _kernel_win(l_actual, scale, g,
                q_ref, k_ref, v_ref, bh_ref, bw_ref, eh_ref, ew_ref,
                out_ref):
    """``g`` window-heads per grid step; each is one whole (L, L) window
    attention (L = ws² = 196 → one 256 tile) with the decomposed rel-pos
    bias expanded on the MXU, exactly like the global kernel's q-tiles."""
    lp = k_ref.shape[1]
    col = jax.lax.broadcasted_iota(jnp.int32, (lp, lp), 1)
    key_mask = col < l_actual
    for i in range(g):  # static unroll
        logits = jax.lax.dot_general(
            q_ref[i], k_ref[i], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * scale
        logits += jax.lax.dot_general(
            bh_ref[i], eh_ref[...], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        logits += jax.lax.dot_general(
            bw_ref[i], ew_ref[...], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        logits = jnp.where(key_mask, logits, -jnp.inf)
        probs = jax.nn.softmax(logits, axis=-1)
        out_ref[i] = jax.lax.dot_general(
            probs.astype(v_ref.dtype), v_ref[i], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("window_hw", "interpret"))
def windowed_attention_pallas(q, k, v, bias_h, bias_w, window_hw,
                              interpret: bool = False):
    """Windowed grid attention with decomposed rel-pos, all windows and
    heads in ONE pallas_call.

    q, k, v: (B, nh, L, hd) tower dtype with B = batch·n_windows and
    L = ws² (196 at SAM's ws=14), q UNscaled.  bias_h: (B, nh, L, ws)
    per-query bias over key rows, bias_w likewise over key columns
    (the caller's small einsums against the rel-pos tables, reference
    image_encoder.py:325-366).  Returns (B, nh, L, hd).

    The XLA windowed path materializes (B, nh, L, L) logits in HBM,
    re-reads them through a 6-d broadcast bias add and an f32 softmax —
    measured ~2.7 ms/layer of the 4.4 ms ViT-H windowed layer
    (tools/sam_encode_profile.py no_rel_pos delta).  Here each
    window-head's logits live only in VMEM; the bias expansion runs as
    two (L, ws)x(ws, L) expander matmuls on the MXU.
    """
    b, nh, l, d = q.shape
    h, w = window_hw
    assert h * w == l, (h, w, l)
    scale = d ** -0.5
    lp = -(-l // _LANE) * _LANE
    dp = max(-(-d // _LANE) * _LANE, _LANE)
    hpad = -(-h // _LANE) * _LANE
    wpad = -(-w // _LANE) * _LANE

    bh_count = b * nh
    g = 8 if bh_count % 8 == 0 else (4 if bh_count % 4 == 0 else 1)

    qp = jnp.pad(q.reshape(bh_count, l, d), ((0, 0), (0, lp - l), (0, dp - d)))
    kp = jnp.pad(k.reshape(bh_count, l, d), ((0, 0), (0, lp - l), (0, dp - d)))
    vp = jnp.pad(v.reshape(bh_count, l, d), ((0, 0), (0, lp - l), (0, dp - d)))
    bh = jnp.pad(bias_h.reshape(bh_count, l, h),
                 ((0, 0), (0, lp - l), (0, hpad - h)))
    bw = jnp.pad(bias_w.reshape(bh_count, l, w),
                 ((0, 0), (0, lp - l), (0, wpad - w)))
    eh, ew = _expanders(h, w, lp, q.dtype)

    blk = lambda minor: pl.BlockSpec((g, lp, minor), lambda i: (i, 0, 0),
                                     memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        functools.partial(_kernel_win, l, scale, g),
        grid=(bh_count // g,),
        in_specs=[
            blk(dp), blk(dp), blk(dp), blk(hpad), blk(wpad),
            pl.BlockSpec((hpad, lp), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((wpad, lp), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=blk(dp),
        out_shape=jax.ShapeDtypeStruct((bh_count, lp, dp), q.dtype),
        interpret=interpret,
    )(qp, kp, vp, bh, bw, eh, ew)
    return out[:, :l, :d].reshape(b, nh, l, d)
