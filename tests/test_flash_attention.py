"""Pallas attention-tap kernel vs the XLA reference path (interpret mode)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mars_tpu.models import layers as L
from mars_tpu.ops import flash_attention


def xla_reference(q, k, v):
    scale = q.shape[-1] ** -0.5
    logits = jnp.einsum("hld,hmd->hlm", q * scale, k)
    probs = jax.nn.softmax(logits, axis=-1)
    out = jnp.einsum("hlm,hmd->hld", probs, v)
    return out, jnp.mean(probs, axis=0)


class TestKernel:
    @pytest.mark.parametrize("l", [64, 128, 200])  # exercises padding
    def test_matches_xla(self, l):
        rng = np.random.RandomState(0)
        h, d = 3, 32
        q = jnp.asarray(rng.randn(h, l, d).astype(np.float32))
        k = jnp.asarray(rng.randn(h, l, d).astype(np.float32))
        v = jnp.asarray(rng.randn(h, l, d).astype(np.float32))
        out, attn = flash_attention.attention_with_tap(q, k, v, interpret=True)
        want_out, want_attn = xla_reference(q, k, v)
        np.testing.assert_allclose(np.asarray(out), np.asarray(want_out),
                                   atol=1e-5, rtol=1e-4)
        np.testing.assert_allclose(np.asarray(attn), np.asarray(want_attn),
                                   atol=1e-6, rtol=1e-4)
        # probs rows sum to 1 over the true length
        np.testing.assert_allclose(np.asarray(attn).sum(-1), 1.0, atol=1e-5)

    def test_layer_integration(self):
        """L.mha with the pallas impl == the XLA impl."""
        rng = np.random.RandomState(1)
        b, l, d, nh = 1, 100, 64, 4
        x = jnp.asarray(rng.randn(b, l, d).astype(np.float32))
        p = L.init_block_params(jax.random.PRNGKey(0), d, d * 4)["attn"]
        ref_out, ref_attn = L.mha(p, x, nh, return_attn=True)
        L.set_attention_impl("pallas_interpret")
        try:
            out, attn = L.mha(p, x, nh, return_attn=True)
        finally:
            L.set_attention_impl("xla")
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref_out),
                                   atol=1e-5, rtol=1e-4)
        np.testing.assert_allclose(np.asarray(attn), np.asarray(ref_attn),
                                   atol=1e-6, rtol=1e-4)
