"""Pallas TPU attention kernel with a fused attention-statistics tap.

The PIR refinement consumes the mean over heads (and later blocks) of the
softmax attention probabilities (reference:
PriorInformationRefinementModule.py:31-44).  The XLA path materializes the
(H, L, L) per-head probs in HBM every tapped layer (~120 MB at DINOv2-L's
16 x 1374 x 1374) just to reduce them.  This kernel fuses the reduction:
one grid step per query tile; K/V stay in HBM and are streamed per head
into double-buffered VMEM scratch, each head's (TQ, L) probability block
lives only in VMEM, is applied to V for the attention output, and is
accumulated into the (TQ, L) head-mean block — per-head probabilities never
touch HBM.

Layout: q, k, v as (H, L, D) per batch element; L padded to the tile size
by the wrapper, with padded KEY columns masked to -inf (padded QUERY rows
produce garbage rows the wrapper slices off).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TILE_Q = 256


def _kernel(l_actual, num_heads, scale,
            q_ref, k_hbm, v_hbm, out_ref, attn_ref,
            k_buf, v_buf, sem):
    lp = k_hbm.shape[1]

    def start_fetch(h, slot):
        pltpu.make_async_copy(k_hbm.at[h], k_buf.at[slot], sem.at[slot, 0]).start()
        pltpu.make_async_copy(v_hbm.at[h], v_buf.at[slot], sem.at[slot, 1]).start()

    def wait_fetch(h, slot):
        pltpu.make_async_copy(k_hbm.at[h], k_buf.at[slot], sem.at[slot, 0]).wait()
        pltpu.make_async_copy(v_hbm.at[h], v_buf.at[slot], sem.at[slot, 1]).wait()

    start_fetch(0, 0)
    attn_ref[:] = jnp.zeros_like(attn_ref)

    col = jax.lax.broadcasted_iota(jnp.int32, (TILE_Q, lp), 1)
    key_mask = col < l_actual

    for h in range(num_heads):  # static unroll
        slot = h % 2
        if h + 1 < num_heads:
            start_fetch(h + 1, (h + 1) % 2)
        wait_fetch(h, slot)
        q = q_ref[h]  # (TQ, D)
        logits = jax.lax.dot_general(
            q, k_buf[slot], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * scale
        logits = jnp.where(key_mask, logits, -jnp.inf)
        probs = jax.nn.softmax(logits, axis=-1)
        out_ref[h] = jax.lax.dot_general(
            probs.astype(v_buf.dtype), v_buf[slot], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).astype(out_ref.dtype)
        attn_ref[:] += probs * (1.0 / num_heads)


@functools.partial(jax.jit, static_argnames=("interpret",))
def attention_with_tap(q, k, v, interpret: bool = False):
    """q, k, v: (H, L, D) float32 → (out (H, L, D), attn_mean (L, L)).

    out = softmax(q kᵀ / sqrt(D)) v per head; attn_mean = head-mean probs.
    """
    h, l, d = q.shape
    scale = d ** -0.5
    lp = -(-l // TILE_Q) * TILE_Q
    # pad head_dim to the 128-lane width (free on the MXU; Mosaic requires
    # 128-aligned minor dims for sliced refs) and L to the q tile
    dp = max(-(-d // 128) * 128, 128)
    padw = ((0, 0), (0, lp - l), (0, dp - d))
    if lp != l or dp != d:
        q = jnp.pad(q, padw)
        k = jnp.pad(k, padw)
        v = jnp.pad(v, padw)

    grid = (lp // TILE_Q,)
    out, attn = pl.pallas_call(
        functools.partial(_kernel, l, h, scale),
        grid=grid,
        in_specs=[
            pl.BlockSpec((h, TILE_Q, dp), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),  # K stays in HBM
            pl.BlockSpec(memory_space=pl.ANY),  # V stays in HBM
        ],
        out_specs=[
            pl.BlockSpec((h, TILE_Q, dp), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TILE_Q, lp), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((h, lp, dp), q.dtype),
            jax.ShapeDtypeStruct((lp, lp), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((2, lp, dp), k.dtype),  # K/V stream at input width
            pltpu.VMEM((2, lp, dp), v.dtype),
            pltpu.SemaphoreType.DMA((2, 2)),
        ],
        interpret=interpret,
    )(q, k, v)
    return out[:, :l, :d], attn[:l, :l]


def mha_pallas(qkv, num_heads, interpret: bool = False):
    """(B, L, 3, H, hd) packed qkv → (out (B, L, H*hd), attn_mean (B, L, L)).

    Batch handled by vmap (episode pipelines run B=1 per tower call)."""
    b, l, _, nh, hd = qkv.shape
    q = qkv[:, :, 0].transpose(0, 2, 1, 3)  # (B, H, L, hd)
    k = qkv[:, :, 1].transpose(0, 2, 1, 3)
    v = qkv[:, :, 2].transpose(0, 2, 1, 3)

    def one(qh, kh, vh):
        return attention_with_tap(qh, kh, vh, interpret=interpret)

    out, attn = jax.vmap(one)(q, k, v)
    out = out.transpose(0, 2, 1, 3).reshape(b, l, nh * hd)
    return out, attn


# ---------------------------------------------------------------------------
# untapped attention (no (L, L) statistics output)
# ---------------------------------------------------------------------------

def _kernel_notap(l_actual, scale, g, q_ref, k_ref, v_ref, out_ref):
    """``g`` (L, D) heads per grid step, no attention-statistics output:
    each head's (L, L) probability block lives only in VMEM between its
    two matmuls.  This is the path for the UNTAPPED tower blocks
    (AlphaCLIP ranking / DINOv2 early blocks), where the XLA schedule
    round-trips the (B, H, L, L) logits+probs through HBM every layer —
    at the AlphaCLIP L/14@336 geometry (16 heads x 577 tokens, batch-16
    chunks of the 128-proposal bucket, reference
    mars/components/FilteringMergingModule.py:183-207) that HBM traffic
    caps the stage (round-4 verdict: 24% MFU).

    No manual DMA choreography: q/k/v arrive as Mosaic-pipelined VMEM
    blocks (the next step's heads stream in during this step's compute),
    and the head dim stays at its true width — the manual-DMA variant
    padded D to 128 and serialized heads inside one step, measured SLOWER
    than XLA (2.86 vs 2.26 ms/layer on v5e).  ``g`` heads per step
    amortize Mosaic's per-step cost: the one-head variant ran a 256-step
    grid of ~10 us steps at the AlphaCLIP geometry and lost to XLA on
    pure overhead (2.52 vs 2.32 ms/op, BASELINE.md round 5)."""
    lp = k_ref.shape[1]
    col = jax.lax.broadcasted_iota(jnp.int32, (q_ref.shape[1], lp), 1)
    key_mask = col < l_actual
    for h in range(g):  # static unroll
        logits = jax.lax.dot_general(
            q_ref[h], k_ref[h], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * scale
        logits = jnp.where(key_mask, logits, -jnp.inf)
        probs = jax.nn.softmax(logits, axis=-1)
        out_ref[h] = jax.lax.dot_general(
            probs.astype(v_ref.dtype), v_ref[h], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).astype(out_ref.dtype)


def _pick_heads_per_step(bh: int, lp: int, dp: int, itemsize: int) -> int:
    """Largest g in {8,4,2,1} dividing B*H whose double-buffered working
    set (2x in/out blocks + one f32 (L, L) logits/probs pair) fits well
    under Mosaic's 16 MB scoped-VMEM default."""
    budget = 12 * 1024 * 1024
    for g in (8, 4, 2, 1):
        if bh % g:
            continue
        est = 2 * g * 4 * lp * dp * itemsize + 2 * lp * lp * 4
        if est <= budget:
            return g
    return 1


@functools.partial(jax.jit, static_argnames=("interpret", "heads_per_step"))
def attention_notap(q, k, v, interpret: bool = False,
                    heads_per_step: int | None = None):
    """q, k, v: (B, H, L, D) → out (B, H, L, D) = softmax(q kᵀ/√D) v.

    Whole-row softmax with ``heads_per_step`` heads per grid step over a
    flattened (B*H,) grid, so L is bounded by VMEM — fine for every tower
    geometry in the pipeline (≤ ~1.5k tokens).
    """
    b, h, l, d = q.shape
    scale = d ** -0.5
    lp = -(-l // 128) * 128
    dp = -(-d // 128) * 128 if interpret else d  # interpret needs padded D
    padw = ((0, 0), (0, 0), (0, lp - l), (0, dp - d))
    if lp != l or dp != d:
        q = jnp.pad(q, padw)
        k = jnp.pad(k, padw)
        v = jnp.pad(v, padw)
    bh = b * h
    g = heads_per_step or _pick_heads_per_step(bh, lp, dp, q.dtype.itemsize)
    assert bh % g == 0, (bh, g)
    qf = q.reshape(bh, lp, dp)
    kf = k.reshape(bh, lp, dp)
    vf = v.reshape(bh, lp, dp)

    spec = pl.BlockSpec((g, lp, dp), lambda i: (i, 0, 0),
                        memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        functools.partial(_kernel_notap, l, scale, g),
        grid=(bh // g,),
        in_specs=[spec, spec, spec],
        out_specs=spec,
        out_shape=jax.ShapeDtypeStruct((bh, lp, dp), q.dtype),
        interpret=interpret,
    )(qf, kf, vf)
    return out.reshape(b, h, lp, dp)[:, :, :l, :d]


def mha_pallas_notap(qkv, num_heads, interpret: bool = False):
    """(B, L, 3, H, hd) packed qkv → out (B, L, H*hd), no attention tap."""
    import os

    b, l, _, nh, hd = qkv.shape
    q = qkv[:, :, 0].transpose(0, 2, 1, 3)  # (B, H, L, hd)
    k = qkv[:, :, 1].transpose(0, 2, 1, 3)
    v = qkv[:, :, 2].transpose(0, 2, 1, 3)
    g = int(os.environ.get("MARS_NOTAP_HEADS_PER_STEP", "0")) or None
    out = attention_notap(q, k, v, interpret=interpret, heads_per_step=g)
    return out.transpose(0, 2, 1, 3).reshape(b, l, nh * hd)
