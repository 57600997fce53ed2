"""Mixed-precision policy for the frozen towers.

The reference runs its big towers in fp16 on GPU (CLIP's convert_weights,
AlphaCLIP .half(), VLM fp16).  The TPU equivalent is bf16 weights with
f32-stable pieces kept f32 automatically by construction:
  - LayerNorm always computes in f32 (layers.layer_norm)
  - attention logits/softmax accumulate in f32 (layers.mha)
  - the PIR/EMD/score-fusion stages consume f32 statistics

So casting a tower's params to bf16 flips the whole matmul path to bf16
while the numerics-sensitive reductions stay f32.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def cast_floating(params, dtype=jnp.bfloat16):
    """Cast floating-point leaves of a param pytree to ``dtype``."""

    def cast(x):
        if hasattr(x, "dtype") and jnp.issubdtype(x.dtype, jnp.floating):
            return x.astype(dtype)
        return x

    return jax.tree.map(cast, params)
