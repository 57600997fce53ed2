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
            L.set_attention_impl("auto")
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref_out),
                                   atol=1e-5, rtol=1e-4)
        np.testing.assert_allclose(np.asarray(attn), np.asarray(ref_attn),
                                   atol=1e-6, rtol=1e-4)

    def test_gradcam_forces_xla_under_pallas(self):
        """The Grad-CAM head differentiates through its attention tap, so it
        must take the XLA path even when the pallas impl is active
        (pallas_call has no VJP) — and produce identical CAMs."""
        from mars_tpu.models import clip as clip_m
        from mars_tpu.models import zoo

        cfg = clip_m.ClipVisualConfig(
            patch_size=16, width=32, depth=2, num_heads=2, output_dim=8,
            pos_embed_grid=2)
        params = zoo._on_host(clip_m.init_visual_params,
                              jax.random.PRNGKey(0), cfg)
        rng = np.random.RandomState(2)
        img = jnp.asarray(rng.randn(1, 32, 32, 3).astype(np.float32))
        txt = jnp.asarray(rng.randn(2, 8).astype(np.float32))
        scale = jnp.float32(np.log(1 / 0.07))

        def run():
            x = clip_m.visual_embed(params, img, cfg)
            tokens, _ = clip_m.prefinal(params, x, cfg)
            return clip_m.gradcam_last_block(params, tokens, txt, scale, cfg)

        ref_cam, ref_probs, _ = run()
        L.set_attention_impl("pallas_interpret")
        try:
            cam, probs, _ = run()
        finally:
            L.set_attention_impl("auto")
        np.testing.assert_allclose(np.asarray(cam), np.asarray(ref_cam),
                                   atol=1e-6)
        np.testing.assert_allclose(np.asarray(probs), np.asarray(ref_probs),
                                   atol=1e-6)
