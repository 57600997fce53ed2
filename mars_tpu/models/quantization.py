"""Weight-only quantization for the frozen towers (VLM especially).

The reference runs ViP-LLaVA-7B 4/8-bit through bitsandbytes CUDA kernels
(reference: TextRetrieverModule.py:468-471).  The TPU-native equivalent is
weight-only int8/int4 with per-output-channel scales: kernels are stored
quantized in HBM (2-4x less weight traffic — the dominant cost of
autoregressive decoding) and dequantized on the fly; with per-column scales
the scale multiplies AFTER the matmul, so XLA keeps the int8 operand feeding
the MXU directly.

``layers.dense`` understands the quantized leaf format, so quantized params
drop into every model in the zoo unchanged.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np


@partial(jax.jit, static_argnums=(1,))
def quantize_kernel(w: jnp.ndarray, bits: int = 8):
    """(in, out) kernel → quantized leaf with per-output-channel scales.

    bits=8: {"q": int8 (in, out), "scale": f32 (out,)}.
    bits=4: {"q4": int8 (in/2, out) with two nibbles packed along the input
    dim, "scale": f32 (out,)} — native jnp.int4 arrays cannot cross a jit
    boundary on this environment (argument resharding recurses), so 4-bit
    is stored packed and unpacked inside the matmul (ops.int4_matmul).

    Jitted (cached per kernel shape — a ViT has only a handful): the eager
    version costs ~6 device round trips per kernel, ~15 s per tower on a
    remote-attached chip."""
    assert bits in (4, 8)
    maxq = 127.0 if bits == 8 else 7.0
    absmax = jnp.max(jnp.abs(w), axis=0)
    scale = absmax / maxq
    q = jnp.round(w / jnp.maximum(scale, 1e-12)[None, :])
    q = jnp.clip(q, -maxq, maxq).astype(jnp.int8)
    if bits == 4:
        from mars_tpu.ops.int4_matmul import pack_int4

        return {"q4": pack_int4(q), "scale": scale.astype(jnp.float32)}
    return {"q": q, "scale": scale.astype(jnp.float32)}


def dequantize_kernel(p) -> jnp.ndarray:
    if "q4" in p:
        from mars_tpu.ops.int4_matmul import unpack_int4

        return unpack_int4(p["q4"]).astype(jnp.float32) * p["scale"][None, :]
    return p["q"].astype(jnp.float32) * p["scale"][None, :]


def quantized_dense(p, x):
    """x @ W for a quantized kernel: int matmul + per-column rescale.

    Kernels carrying an ``act8`` marker (quantize_params(act_bits=8)) also
    quantize the ACTIVATIONS per row on the fly: the MXU then runs a true
    s8 x s8 -> s32 matmul — ~2x the bf16 peak on v5e — and the result is
    rescaled by (row scale x column scale).  Dynamic per-row absmax keeps
    it calibration-free (the bnb "LLM.int8" pattern without outlier
    decomposition — adequate for the frozen ViT towers)."""
    k = p["kernel"]
    if "q" in k and "act8" in k and jnp.issubdtype(x.dtype, jnp.floating):
        ax = jnp.max(jnp.abs(x.astype(jnp.float32)), axis=-1, keepdims=True)
        sx = jnp.maximum(ax, 1e-8) / 127.0
        xq = jnp.clip(jnp.round(x.astype(jnp.float32) / sx), -127, 127)
        y = jnp.einsum("...i,io->...o", xq.astype(jnp.int8), k["q"],
                       preferred_element_type=jnp.int32)
        y = (y.astype(jnp.float32) * sx * k["scale"]).astype(x.dtype)
        if "bias" in p:
            y = y + p["bias"]
        return y
    if "q4" in k:
        from mars_tpu.ops import int4_matmul

        if jax.default_backend() == "tpu":
            shape = x.shape
            y = int4_matmul.matmul_int4(
                x.reshape(-1, shape[-1]), k["q4"], k["scale"])
            y = y.reshape(shape[:-1] + (k["q4"].shape[1],))
        else:
            w = int4_matmul.unpack_int4(k["q4"]).astype(x.dtype)
            y = jnp.einsum("...i,io->...o", x, w,
                           preferred_element_type=jnp.float32)
            y = (y * k["scale"]).astype(x.dtype)
    else:
        y = jnp.einsum(
            "...i,io->...o", x, k["q"].astype(x.dtype),
            preferred_element_type=jnp.float32,
        )
        y = (y * k["scale"]).astype(x.dtype)
    if "bias" in p:
        y = y + p["bias"]
    return y


def quantize_params(params, bits: int = 8, min_size: int = 1 << 14,
                    act_bits: int = None):
    """Quantize every 2-D floating kernel with ≥ min_size elements.

    Leaves biases, norms, embeddings (1-D/3-D+) untouched.  Returns a pytree
    layers.dense consumes transparently.  ``act_bits=8`` (with bits=8) marks
    kernels for dynamic activation quantization too — true s8xs8 MXU
    matmuls (see quantized_dense).
    """

    def q(path, leaf):
        names = [getattr(k, "key", getattr(k, "name", str(k))) for k in path]
        leaf_name = names[-1] if names else ""
        # NOTE: lm_head stays floating — bitsandbytes (the reference's 8-bit
        # loader) skips it too; int8 argmax over near-tied logits flips
        # greedy tokens, and the head is only ~3% of decode bandwidth
        if (
            leaf_name == "kernel"
            and hasattr(leaf, "ndim")
            and leaf.ndim == 2
            and jnp.issubdtype(leaf.dtype, jnp.floating)
            and leaf.size >= min_size
        ):
            out = quantize_kernel(jnp.asarray(leaf), bits)
            if act_bits == 8 and bits == 8:
                out["act8"] = jnp.ones((), jnp.int8)  # marker leaf
            return out
        return leaf

    return jax.tree_util.tree_map_with_path(
        q, params, is_leaf=lambda x: not isinstance(x, dict)
    )
