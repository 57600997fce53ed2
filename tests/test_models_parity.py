"""Numerical parity of the JAX model zoo against reference-torch fixtures.

Fixtures were produced by tools/make_fixtures.py from the reference
implementation with seeded random weights on tiny configs; see that script.
"""
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mars_tpu.models import clip as clip_m
from mars_tpu.models import convert, dinov2, sam

FIXTURES = os.path.join(os.path.dirname(__file__), "fixtures")


def load(name):
    data = np.load(os.path.join(FIXTURES, name + ".npz"))
    sd = {k[3:]: data[k] for k in data.files if k.startswith("sd.")}
    rest = {k: data[k] for k in data.files if not k.startswith("sd.")}
    return sd, rest


def nchw_to_nhwc(x):
    return np.transpose(x, (0, 2, 3, 1))


class TestDinoV2:
    @pytest.fixture(scope="class")
    def setup(self):
        sd, d = load("dinov2_tiny")
        cfg = dinov2.DinoV2Config(
            patch_size=14, embed_dim=32, depth=3, num_heads=2,
            num_register_tokens=4, pos_embed_grid=4,
        )
        params = convert.dinov2_to_flax(sd, depth=3, num_register_tokens=4)
        return cfg, params, d

    def test_forward_features(self, setup):
        cfg, params, d = setup
        out = dinov2.forward_features(params, jnp.asarray(nchw_to_nhwc(d["input"])), cfg)
        np.testing.assert_allclose(
            np.asarray(out["x_prenorm"]), d["x_prenorm"], atol=2e-5, rtol=1e-4
        )
        np.testing.assert_allclose(
            np.asarray(out["x_norm_patchtokens"]), d["x_norm_patch"], atol=2e-5, rtol=1e-4
        )

    def test_attn_tap(self, setup):
        cfg, params, d = setup
        out = dinov2.forward_features(
            params, jnp.asarray(nchw_to_nhwc(d["input"][:1])), cfg, attn_tap_last_n=2
        )
        np.testing.assert_allclose(
            np.asarray(out["attn_mean"][0]), d["attn_mean_last2"], atol=2e-5, rtol=1e-4
        )

    def test_interpolate_offset_pos_embed(self, setup):
        """Non-native input size: the reference's interpolate_offset=0.1
        uses scale_factor=(w0+0.1)/M bicubic (vision_transformer.py:204-209)
        with torch's A=-0.75 Keys kernel — not size-based resampling."""
        cfg, params, d = setup
        from mars_tpu.models import layers as L

        pe = L.interpolate_pos_embed(
            params["pos_embed"], (5, 5), 1, "bicubic",
            interpolate_offset=cfg.interpolate_offset)
        np.testing.assert_allclose(
            np.asarray(pe), d["pos_embed70"], atol=2e-6, rtol=1e-5)

    def test_forward_features_non_native_size(self, setup):
        cfg, params, d = setup
        out = dinov2.forward_features(
            params, jnp.asarray(nchw_to_nhwc(d["input70"])), cfg)
        np.testing.assert_allclose(
            np.asarray(out["x_prenorm"]), d["x_prenorm70"], atol=2e-5,
            rtol=1e-4)


class TestClip:
    @pytest.fixture(scope="class")
    def setup(self):
        sd, d = load("clip_tiny")
        vcfg = clip_m.ClipVisualConfig(
            patch_size=16, width=64, depth=3, num_heads=1, output_dim=16, pos_embed_grid=2
        )
        tcfg = clip_m.ClipTextConfig(
            context_length=77, vocab_size=100, width=16, depth=2, num_heads=2, output_dim=16
        )
        vp = convert.clip_visual_to_flax(sd, depth=3)
        tp = convert.clip_text_to_flax(sd, depth=2)
        return vcfg, tcfg, vp, tp, d

    def test_encode_image_prefinal(self, setup):
        vcfg, _, vp, _, d = setup
        x = clip_m.visual_embed(vp, jnp.asarray(nchw_to_nhwc(d["image"])), vcfg)
        tokens, attn_sum = clip_m.prefinal(vp, x, vcfg, attn_tap_last_n=3)
        np.testing.assert_allclose(
            np.asarray(tokens), d["image_tokens_prefinal"], atol=2e-4, rtol=1e-4
        )
        # attn list parity: reference maps are head-averaged (N, L, L)
        want = (d["attn_l0"][:, 1:, 1:] + d["attn_l1"][:, 1:, 1:])
        np.testing.assert_allclose(np.asarray(attn_sum), want, atol=2e-4, rtol=1e-4)

    def test_encode_text(self, setup):
        _, tcfg, _, tp, d = setup
        feats = clip_m.encode_text(tp, jnp.asarray(d["text_tokens"]), tcfg)
        np.testing.assert_allclose(np.asarray(feats), d["text_feats"], atol=3e-5, rtol=1e-4)

    def test_gradcam_last_block(self, setup):
        vcfg, _, vp, _, d = setup
        x = clip_m.visual_embed(vp, jnp.asarray(nchw_to_nhwc(d["image"])), vcfg)
        tokens, _ = clip_m.prefinal(vp, x, vcfg)
        tf = d["text_feats"] / np.linalg.norm(d["text_feats"], axis=1, keepdims=True)
        cam, probs, attn_last = clip_m.gradcam_last_block(
            vp, tokens, jnp.asarray(tf), jnp.asarray(d["logit_scale"]), vcfg
        )
        np.testing.assert_allclose(np.asarray(probs), d["probs"], atol=2e-4, rtol=1e-4)
        np.testing.assert_allclose(
            np.asarray(attn_last), d["attn_last"][:, 1:, 1:], atol=2e-4, rtol=1e-4
        )
        np.testing.assert_allclose(np.asarray(cam), d["cam"], atol=2e-4, rtol=1e-3)


class TestAlphaClip:
    def test_visual_cls(self):
        sd, d = load("alpha_clip_tiny")
        vcfg = clip_m.ClipVisualConfig(
            patch_size=16, width=64, depth=2, num_heads=1, output_dim=16,
            pos_embed_grid=2, alpha_channel=True,
        )
        vp = convert.alpha_clip_visual_to_flax(sd, depth=2)
        emb = clip_m.visual_cls(
            vp, jnp.asarray(nchw_to_nhwc(d["image"])), vcfg,
            alpha=jnp.asarray(d["alpha"][:, 0]),
        )
        np.testing.assert_allclose(np.asarray(emb), d["cls_emb"], atol=3e-5, rtol=1e-4)


class TestSam:
    @pytest.fixture(scope="class")
    def setup(self):
        sd, d = load("sam_tiny")
        cfg = sam.SamConfig(
            img_size=64, patch_size=16, embed_dim=32, depth=3, num_heads=2,
            global_attn_indexes=(1,), window_size=2, out_chans=16,
            decoder_mlp_dim=32, decoder_heads=2,
        )
        enc_p = convert.sam_encoder_to_flax(sd, depth=3)
        pe_p = convert.sam_prompt_encoder_to_flax(sd)
        dec_p = convert.sam_decoder_to_flax(sd)
        return cfg, enc_p, pe_p, dec_p, d

    def test_encoder(self, setup):
        cfg, enc_p, _, _, d = setup
        emb = sam.encode_image(enc_p, jnp.asarray(nchw_to_nhwc(d["image"])), cfg)
        np.testing.assert_allclose(
            np.asarray(emb), nchw_to_nhwc(d["embedding"]), atol=3e-5, rtol=1e-4
        )

    def test_prompt_encoder_points(self, setup):
        cfg, _, pe_p, _, d = setup
        sparse = sam.embed_points(
            pe_p, jnp.asarray(d["coords"]), jnp.asarray(d["labels"]), (64, 64), pad=True
        )
        np.testing.assert_allclose(np.asarray(sparse), d["sparse_pts"], atol=3e-5, rtol=1e-4)
        dense = sam.no_mask_dense(pe_p, (4, 4))
        np.testing.assert_allclose(
            np.asarray(jnp.broadcast_to(dense, (1, 4, 4, 16))),
            nchw_to_nhwc(d["dense_no"]), atol=3e-5, rtol=1e-4,
        )

    def test_prompt_encoder_boxes_masks(self, setup):
        cfg, _, pe_p, _, d = setup
        pts = sam.embed_points(
            pe_p, jnp.asarray(d["coords"]), jnp.asarray(d["labels"]), (64, 64), pad=False
        )
        box = sam.embed_boxes(pe_p, jnp.asarray(d["boxes"]), (64, 64))
        sparse = jnp.concatenate([pts, box], axis=1)
        np.testing.assert_allclose(np.asarray(sparse), d["sparse_box"], atol=3e-5, rtol=1e-4)
        dense = sam.embed_mask_input(pe_p, jnp.asarray(d["mask_in"][:, 0]))
        np.testing.assert_allclose(
            np.asarray(dense), nchw_to_nhwc(d["dense_m"]), atol=3e-5, rtol=1e-4
        )

    def test_dense_pe(self, setup):
        cfg, _, pe_p, _, d = setup
        pe = sam.dense_pe(pe_p, (4, 4))
        np.testing.assert_allclose(
            np.asarray(pe), np.transpose(d["dense_pe"][0], (1, 2, 0)), atol=3e-5, rtol=1e-4
        )

    def test_decoder(self, setup):
        cfg, _, pe_p, dec_p, d = setup
        emb = jnp.asarray(nchw_to_nhwc(d["embedding"])[0])
        pe = sam.dense_pe(pe_p, (4, 4))
        masks, iou = sam.decode_masks(
            dec_p, emb, pe, jnp.asarray(d["sparse_pts"]),
            jnp.asarray(nchw_to_nhwc(d["dense_no"])), cfg,
        )
        np.testing.assert_allclose(
            np.asarray(masks[:, :1]), d["masks_single"], atol=5e-5, rtol=1e-3
        )
        np.testing.assert_allclose(
            np.asarray(iou[:, :1]), d["iou_single"], atol=5e-5, rtol=1e-3
        )
        masks2, iou2 = sam.decode_masks(
            dec_p, emb, pe, jnp.asarray(d["sparse_box"]),
            jnp.asarray(nchw_to_nhwc(d["dense_m"])), cfg,
        )
        np.testing.assert_allclose(
            np.asarray(masks2[:, 1:]), d["masks_multi"], atol=5e-5, rtol=1e-3
        )
        np.testing.assert_allclose(np.asarray(iou2[:, 1:]), d["iou_multi"], atol=5e-5, rtol=1e-3)


class TestSwin:
    """Swin backbone vs the transformers SwinModel oracle (window padding,
    shift masks, odd-dim patch merging, window clamping all exercised at
    image 56 / window 4)."""

    @pytest.fixture(scope="class")
    def setup(self):
        from mars_tpu.models import swin

        sd, d = load("swin_tiny")
        cfg = swin.SwinConfig(patch_size=4, embed_dim=24, depths=(2, 2, 2),
                              num_heads=(2, 4, 8), window=4)
        params = convert.swin_to_flax(sd, depths=cfg.depths)
        out = swin.forward_features(
            params, jnp.asarray(nchw_to_nhwc(d["input"])), cfg)
        return swin, cfg, params, sd, d, out

    def test_final_stage(self, setup):
        swin, cfg, params, sd, d, out = setup
        got = np.asarray(out["stage2"]).reshape(2, -1, 96)
        np.testing.assert_allclose(got, d["h3"], atol=3e-5, rtol=1e-4)

    def test_last_hidden_with_final_norm(self, setup):
        from mars_tpu.models import layers as L

        swin, cfg, params, sd, d, out = setup
        ln = {"scale": jnp.asarray(sd["layernorm.weight"]),
              "bias": jnp.asarray(sd["layernorm.bias"])}
        got = L.layer_norm(ln, jnp.asarray(out["stage2"]).reshape(2, -1, 96))
        np.testing.assert_allclose(np.asarray(got), d["last_hidden"],
                                   atol=3e-5, rtol=1e-4)

    def test_patch_merge_chain(self, setup):
        """h1/h2 (post-downsample states) from my pre-downsample outputs."""
        swin, cfg, params, sd, d, out = setup
        m1 = swin._patch_merge(params["stage0"]["downsample"],
                               jnp.asarray(out["stage0"]), cfg.ln_eps)
        np.testing.assert_allclose(
            np.asarray(m1).reshape(2, -1, 48), d["h1"], atol=3e-5, rtol=1e-4)
        x = jnp.pad(jnp.asarray(out["stage1"]),
                    ((0, 0), (0, 1), (0, 1), (0, 0)))  # 7 -> 8 odd-dim pad
        m2 = swin._patch_merge(params["stage1"]["downsample"], x, cfg.ln_eps)
        np.testing.assert_allclose(
            np.asarray(m2).reshape(2, -1, 96), d["h2"], atol=3e-5, rtol=1e-4)

    def test_clamped_window_uses_table_stride(self):
        """When the runtime window clamps below cfg.window, the bias lookup
        must keep the TABLE's (2*cfg.window-1) stride: token pairs inside a
        w×w patch read the same table rows the full-window index would."""
        from mars_tpu.models import swin

        tw = 8
        for w in (3, 5):
            clamped = swin._rel_index(w, tw)  # (w², w²)
            full = swin._rel_index(tw, tw)  # (tw², tw²)
            # positions of the w×w sub-grid inside the tw-window token order
            sub = (np.arange(w)[:, None] * tw + np.arange(w)[None, :]).ravel()
            np.testing.assert_array_equal(clamped, full[np.ix_(sub, sub)])
            assert clamped.max() < (2 * tw - 1) ** 2

    def test_small_input_forward_with_converted_params(self, setup):
        """Clamped-window forward must run (and be finite) on converted
        params whose bias tables are laid out for cfg.window."""
        swin, cfg, params, sd, d, out = setup
        img = jnp.asarray(nchw_to_nhwc(d["input"]))[:, :12, :12]  # stage0 res 3 < window 4
        small = swin.forward_features(params, img, cfg)
        assert np.isfinite(np.asarray(small["stage2"])).all()
