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


class TestKernelNotap:
    """attention_notap — the untapped-block path (AlphaCLIP ranking tower):
    same whole-row softmax as the tapped kernel, no (L, L) output."""

    @pytest.mark.parametrize("l", [64, 200, 577, 900])  # 577 = L/14@336;
    def test_matches_xla(self, l):                      # 900 > 768 → tiled
        rng = np.random.RandomState(0)
        b, h, d = 2, 3, 32
        q = jnp.asarray(rng.randn(b, h, l, d).astype(np.float32))
        k = jnp.asarray(rng.randn(b, h, l, d).astype(np.float32))
        v = jnp.asarray(rng.randn(b, h, l, d).astype(np.float32))
        out = flash_attention.attention_notap(q, k, v, interpret=True)
        for i in range(b):  # per-batch-row dense reference
            want_out, _ = xla_reference(q[i], k[i], v[i])
            np.testing.assert_allclose(np.asarray(out[i]),
                                       np.asarray(want_out),
                                       atol=1e-5, rtol=1e-4)

    @pytest.mark.parametrize("g", [1, 2, 4, 8])
    def test_heads_per_step_parity(self, g):
        """Every heads-per-step blocking produces identical attention —
        g only amortizes Mosaic's per-grid-step overhead (the one-head
        variant's 256 ~10us steps lost to XLA on pure overhead)."""
        rng = np.random.RandomState(7)
        b, h, l, d = 2, 4, 150, 32  # bh=8: every g divides
        q = jnp.asarray(rng.randn(b, h, l, d).astype(np.float32))
        k = jnp.asarray(rng.randn(b, h, l, d).astype(np.float32))
        v = jnp.asarray(rng.randn(b, h, l, d).astype(np.float32))
        out = flash_attention.attention_notap(q, k, v, interpret=True,
                                              heads_per_step=g)
        for i in range(b):
            want_out, _ = xla_reference(q[i], k[i], v[i])
            np.testing.assert_allclose(np.asarray(out[i]),
                                       np.asarray(want_out),
                                       atol=1e-5, rtol=1e-4)

    def test_bf16_inputs(self):
        rng = np.random.RandomState(3)
        b, h, l, d = 1, 2, 130, 16
        mk = lambda: jnp.asarray(rng.randn(b, h, l, d).astype(np.float32))
        q, k, v = mk(), mk(), mk()
        out = flash_attention.attention_notap(
            q.astype(jnp.bfloat16), k.astype(jnp.bfloat16),
            v.astype(jnp.bfloat16), interpret=True)
        assert out.dtype == jnp.bfloat16
        want, _ = xla_reference(q[0], k[0], v[0])
        np.testing.assert_allclose(np.asarray(out[0], np.float32),
                                   np.asarray(want), atol=0.1, rtol=0.1)

    def test_layer_integration_untapped(self):
        """L.mha(return_attn=False) under the pallas impl == the XLA impl —
        the swap the AlphaCLIP ranking tower rides."""
        rng = np.random.RandomState(4)
        b, l, d, nh = 2, 100, 64, 4
        x = jnp.asarray(rng.randn(b, l, d).astype(np.float32))
        p = L.init_block_params(jax.random.PRNGKey(0), d, d * 4)["attn"]
        ref_out, ref_none = L.mha(p, x, nh, return_attn=False)
        assert ref_none is None
        L.set_attention_impl("pallas_interpret")
        try:
            out, none = L.mha(p, x, nh, return_attn=False)
        finally:
            L.set_attention_impl("auto")
        assert none is None
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref_out),
                                   atol=1e-5, rtol=1e-4)

    def test_visual_cls_integration(self):
        """clip.visual_cls (the AlphaCLIP ranking head) end-to-end under the
        pallas impl == the XLA path, alpha channel active."""
        from mars_tpu.models import clip as clip_m
        from mars_tpu.models import zoo

        cfg = clip_m.ClipVisualConfig(
            patch_size=16, width=32, depth=2, num_heads=2, output_dim=8,
            pos_embed_grid=2, alpha_channel=True)
        params = zoo._on_host(clip_m.init_visual_params,
                              jax.random.PRNGKey(1), cfg)
        rng = np.random.RandomState(5)
        img = jnp.asarray(rng.randn(2, 32, 32, 3).astype(np.float32))
        alpha = jnp.asarray(rng.randn(2, 32, 32).astype(np.float32))
        ref = clip_m.visual_cls(params, img, cfg, alpha=alpha)
        L.set_attention_impl("pallas_interpret")
        try:
            out = clip_m.visual_cls(params, img, cfg, alpha=alpha)
        finally:
            L.set_attention_impl("auto")
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=1e-5, rtol=1e-4)


class TestSamGridAttention:
    """ops/sam_attention.py — SAM global-layer kernel vs the XLA path."""

    @pytest.mark.parametrize("h,w", [(5, 7), (16, 16)])
    def test_kernel_matches_dense(self, h, w):
        from mars_tpu.ops import sam_attention

        rng = np.random.RandomState(0)
        nh, l, d = 2, h * w, 24
        q = jnp.asarray(rng.randn(nh, l, d).astype(np.float32))
        k = jnp.asarray(rng.randn(nh, l, d).astype(np.float32))
        v = jnp.asarray(rng.randn(nh, l, d).astype(np.float32))
        bh = jnp.asarray(rng.randn(nh, l, h).astype(np.float32))
        bw = jnp.asarray(rng.randn(nh, l, w).astype(np.float32))

        out = sam_attention.grid_attention_pallas(
            q, k, v, bh, bw, (h, w), interpret=True)

        cols = np.arange(l)
        bias = (np.asarray(bh)[:, :, cols // w]
                + np.asarray(bw)[:, :, cols % w])  # (nh, l, l)
        logits = np.einsum("hld,hmd->hlm", np.asarray(q), np.asarray(k))
        logits = logits * d ** -0.5 + bias
        probs = jax.nn.softmax(jnp.asarray(logits), axis=-1)
        want = jnp.einsum("hlm,hmd->hld", probs, v)
        np.testing.assert_allclose(np.asarray(out), np.asarray(want),
                                   atol=1e-4, rtol=1e-4)

    def test_global_layer_integration(self):
        """sam._grid_attention(allow_pallas=True) under the pallas impl ==
        the XLA path at a production-family grid (>= 1024 tokens)."""
        from mars_tpu.models import sam

        rng = np.random.RandomState(1)
        b, h, w, c, nh = 1, 32, 32, 48, 2
        hd = c // nh
        x = jnp.asarray(rng.randn(b, h, w, c).astype(np.float32))
        p = {
            "qkv": {"kernel": jnp.asarray(
                rng.randn(c, 3 * c).astype(np.float32) * 0.05),
                "bias": jnp.asarray(rng.randn(3 * c).astype(np.float32) * 0.1)},
            "proj": {"kernel": jnp.asarray(
                rng.randn(c, c).astype(np.float32) * 0.05),
                "bias": jnp.zeros((c,), jnp.float32)},
            "rel_pos_h": jnp.asarray(
                rng.randn(2 * h - 1, hd).astype(np.float32) * 0.1),
            "rel_pos_w": jnp.asarray(
                rng.randn(2 * w - 1, hd).astype(np.float32) * 0.1),
        }
        ref = sam._grid_attention(p, x, nh)
        L.set_attention_impl("pallas_interpret")
        try:
            out = sam._grid_attention(p, x, nh, allow_pallas=True)
        finally:
            L.set_attention_impl("auto")
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=2e-4, rtol=1e-3)

    @pytest.mark.parametrize("b,nh", [(2, 2), (3, 4)])  # bh: g=4, g=4/8
    def test_windowed_kernel_matches_dense(self, b, nh):
        """windowed_attention_pallas — all windows+heads in one call —
        vs the dense decomposed-rel-pos computation."""
        from mars_tpu.ops import sam_attention

        rng = np.random.RandomState(5)
        h, w, d = 5, 6, 24
        l = h * w
        mk = lambda *s: jnp.asarray(rng.randn(*s).astype(np.float32))
        q, k, v = mk(b, nh, l, d), mk(b, nh, l, d), mk(b, nh, l, d)
        bh_, bw_ = mk(b, nh, l, h), mk(b, nh, l, w)

        out = sam_attention.windowed_attention_pallas(
            q, k, v, bh_, bw_, (h, w), interpret=True)

        cols = np.arange(l)
        bias = (np.asarray(bh_)[..., cols // w]
                + np.asarray(bw_)[..., cols % w])  # (b, nh, l, l)
        logits = np.einsum("bhld,bhmd->bhlm", np.asarray(q), np.asarray(k))
        probs = jax.nn.softmax(jnp.asarray(logits * d ** -0.5 + bias), -1)
        want = jnp.einsum("bhlm,bhmd->bhld", probs, v)
        np.testing.assert_allclose(np.asarray(out), np.asarray(want),
                                   atol=1e-4, rtol=1e-4)

    def test_windowed_layer_integration(self):
        """sam._grid_attention(windowed_pallas=True) under the pallas impl
        == the XLA path at the window geometry (B = batch·n_windows)."""
        from mars_tpu.models import sam

        rng = np.random.RandomState(6)
        b, h, w, c, nh = 9, 7, 7, 48, 2  # 9 windows of 7x7
        hd = c // nh
        x = jnp.asarray(rng.randn(b, h, w, c).astype(np.float32))
        p = {
            "qkv": {"kernel": jnp.asarray(
                rng.randn(c, 3 * c).astype(np.float32) * 0.05),
                "bias": jnp.asarray(rng.randn(3 * c).astype(np.float32) * 0.1)},
            "proj": {"kernel": jnp.asarray(
                rng.randn(c, c).astype(np.float32) * 0.05),
                "bias": jnp.zeros((c,), jnp.float32)},
            "rel_pos_h": jnp.asarray(
                rng.randn(2 * h - 1, hd).astype(np.float32) * 0.1),
            "rel_pos_w": jnp.asarray(
                rng.randn(2 * w - 1, hd).astype(np.float32) * 0.1),
        }
        ref = sam._grid_attention(p, x, nh)
        L.set_attention_impl("pallas_interpret")
        try:
            out = sam._grid_attention(p, x, nh, windowed_pallas=True)
        finally:
            L.set_attention_impl("auto")
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=2e-4, rtol=1e-3)

    def test_kernel_bf16_inputs(self):
        """Production towers are bf16: the kernel must accept bf16 q/k/v and
        bias tables (f32 logits accumulation inside) and stay within bf16
        tolerance of the dense f32 computation."""
        from mars_tpu.ops import sam_attention

        rng = np.random.RandomState(2)
        nh, h, w, d = 2, 8, 8, 16
        l = h * w
        mk = lambda *s: jnp.asarray(rng.randn(*s).astype(np.float32))
        q, k, v = mk(nh, l, d), mk(nh, l, d), mk(nh, l, d)
        bh, bw = mk(nh, l, h) * 0.1, mk(nh, l, w) * 0.1

        out = sam_attention.grid_attention_pallas(
            q.astype(jnp.bfloat16), k.astype(jnp.bfloat16),
            v.astype(jnp.bfloat16), bh.astype(jnp.bfloat16),
            bw.astype(jnp.bfloat16), (h, w), interpret=True)
        assert out.dtype == jnp.bfloat16

        cols = np.arange(l)
        bias = (np.asarray(bh)[:, :, cols // w]
                + np.asarray(bw)[:, :, cols % w])
        logits = np.einsum("hld,hmd->hlm", np.asarray(q), np.asarray(k))
        probs = jax.nn.softmax(jnp.asarray(logits * d ** -0.5 + bias), -1)
        want = jnp.einsum("hlm,hmd->hld", probs, v)
        np.testing.assert_allclose(
            np.asarray(out, np.float32), np.asarray(want), atol=0.15, rtol=0.1)
