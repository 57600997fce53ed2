"""Production-shape converter contract tests.

Every converter is oracle-tested at tiny scale elsewhere; these tests build
the REFERENCE torch modules at the exact production configurations the
shipped evaluation uses (scripts/coco_1shot.sh: DINOv2-L/14 reg4, CLIP
ViT-B/16 JIT-archive layout, AlphaCLIP ViT-L/14@336, SAM ViT-H,
ViP-LLaVA-7B), convert their state_dicts, and check:

  1. **Tree contract**: the converted pytree has exactly the structure and
     leaf shapes of our own ``init_*`` functions at the production config
     (via jax.eval_shape — no production-sized materialization on the jax
     side beyond the converted arrays themselves).
  2. **Numeric contract**: a forward at production width/geometry through a
     DEPTH-TRUNCATED stack (first 2 blocks — per-layer mapping is uniform,
     so depth adds no new conversion surface) matches torch.  This
     exercises the geometry-dependent pieces real checkpoints hit:
     pos-embed interpolation at production grids, SAM rel-pos tables at
     window 14 / 1024 px, the alpha conv, the JIT-archive extra keys.

Naming/shape drift against real checkpoints is the one thing that cannot
be fixed after weights arrive — this is the guard.

Slow-marked (~minutes, single CPU core); requires /root/reference.
"""
import gc
import os
import sys

import numpy as np
import pytest

import jax
import jax.numpy as jnp

REFERENCE = "/root/reference"
TOOLS = os.path.join(os.path.dirname(__file__), "..", "tools")

pytestmark = [
    pytest.mark.slow,
    pytest.mark.skipif(not os.path.isdir(REFERENCE),
                       reason="reference tree not mounted"),
]


def _ref_on_path():
    for p in (REFERENCE, TOOLS):
        if p not in sys.path:
            sys.path.insert(0, p)


def _randomize(module, scale=0.05, seed=0):
    import torch

    g = torch.Generator().manual_seed(seed)
    with torch.no_grad():
        for p in module.parameters():
            p.copy_(torch.randn(p.shape, generator=g) * scale)


def _sd_np(module):
    return {k: v.detach().cpu().numpy().astype(np.float32)
            for k, v in module.state_dict().items()}


def _shape_map(tree):
    out = {}

    def visit(path, leaf):
        names = "/".join(getattr(k, "key", getattr(k, "name", str(k)))
                         for k in path)
        out[names] = tuple(leaf.shape)
        return leaf

    jax.tree_util.tree_map_with_path(visit, tree)
    return out


def _assert_tree_contract(converted, init_fn):
    """Converted tree must match the init function's structure+shapes."""
    expected = _shape_map(jax.eval_shape(init_fn))
    got = _shape_map(converted)
    missing = sorted(set(expected) - set(got))
    extra = sorted(set(got) - set(expected))
    assert not missing, f"converter missing leaves: {missing[:10]}"
    assert not extra, f"converter extra leaves: {extra[:10]}"
    bad = {k: (got[k], expected[k]) for k in expected if got[k] != expected[k]}
    assert not bad, f"shape mismatches: {dict(list(bad.items())[:10])}"


def _nchw_to_nhwc(x):
    return np.ascontiguousarray(np.transpose(x, (0, 2, 3, 1)))


class TestDinoV2LargeReg4:
    def test_contract_and_truncated_forward(self):
        _ref_on_path()
        import torch
        from dinov2.models.vision_transformer import DinoVisionTransformer

        from mars_tpu.models import convert, dinov2

        # build_matcher_oss kwargs + vit_large (reference Matcher.py:1301-1312,
        # dinov2/models/vision_transformer.py:409-421)
        model = DinoVisionTransformer(
            img_size=518, patch_size=14, embed_dim=1024, depth=24,
            num_heads=16, mlp_ratio=4, init_values=1e-5, ffn_layer="mlp",
            block_chunks=0, num_register_tokens=4, qkv_bias=True,
            proj_bias=True, ffn_bias=True,
        ).eval()
        _randomize(model, scale=0.02, seed=10)
        sd = _sd_np(model)
        params = convert.dinov2_to_flax(sd, depth=24, num_register_tokens=4)

        cfg = dinov2.DINOV2_VARIANTS["vit_large"]
        _assert_tree_contract(
            params, lambda: dinov2.init_params(jax.random.PRNGKey(0), cfg))

        # truncated numeric forward at the production 518-px geometry
        from dataclasses import replace

        model.blocks = torch.nn.ModuleList(list(model.blocks[:2]))
        x = torch.randn(1, 3, 518, 518, generator=torch.Generator().manual_seed(1)) * 0.5
        with torch.no_grad():
            want = model.forward_features(x)["x_prenorm"].numpy()
        got = dinov2.forward_features(
            params, jnp.asarray(_nchw_to_nhwc(x.numpy())), replace(cfg, depth=2))
        np.testing.assert_allclose(np.asarray(got["x_prenorm"]), want,
                                   atol=1e-4, rtol=1e-3)
        del model, sd, params
        gc.collect()


class TestClipB16JitLayout:
    def test_contract_and_truncated_forward(self):
        _ref_on_path()
        import torch
        from make_fixtures import _load_module

        from mars_tpu.models import convert, clip as clip_m

        ref_clip = _load_module("ref_clip_model_prod", f"{REFERENCE}/clip/model.py")
        # exact CLIP ViT-B/16 dims (the JIT archive the reference loads,
        # clip/clip.py:95-153 + build_model:568-615 shape inference)
        model = ref_clip.CLIP(
            embed_dim=512, image_resolution=224, vision_layers=12,
            vision_width=768, vision_patch_size=16, context_length=77,
            vocab_size=49408, transformer_width=512, transformer_heads=8,
            transformer_layers=12,
        ).float().eval()
        _randomize(model, scale=0.02, seed=11)
        sd = _sd_np(model)
        # the JIT archive carries these extra scalar entries; build_model
        # deletes them (clip/model.py:605-607) — converters must tolerate
        sd["input_resolution"] = np.asarray(224)
        sd["context_length"] = np.asarray(77)
        sd["vocab_size"] = np.asarray(49408)
        vp = convert.clip_visual_to_flax(sd, depth=12)
        tp = convert.clip_text_to_flax(sd, depth=12)

        vcfg = clip_m.CLIP_B16_VISUAL
        tcfg = clip_m.CLIP_B16_TEXT
        _assert_tree_contract(
            vp, lambda: clip_m.init_visual_params(jax.random.PRNGKey(0), vcfg))
        _assert_tree_contract(
            tp, lambda: clip_m.init_text_params(jax.random.PRNGKey(0), tcfg))

        # truncated forward at the production VTA geometry: 528 px → the
        # 14→33 pos-emb upsample fires (clip/model.py:99-115,339-390)
        from dataclasses import replace

        model.visual.transformer.resblocks = torch.nn.Sequential(
            *list(model.visual.transformer.resblocks[:2]))
        model.visual.transformer.layers = 2  # extract loop bound (model.py:312)
        model.visual.patch_size = 16
        x = torch.randn(1, 3, 528, 528, generator=torch.Generator().manual_seed(2)) * 0.5
        with torch.no_grad():
            feats, attns = model.encode_image(x, 528, 528)  # runs depth-1 = 1 block
        vcfg2 = replace(vcfg, depth=2)
        emb = clip_m.visual_embed(vp, jnp.asarray(_nchw_to_nhwc(x.numpy())), vcfg2)
        tokens, _ = clip_m.prefinal(vp, emb, vcfg2)
        np.testing.assert_allclose(
            np.asarray(tokens), feats.permute(1, 0, 2).numpy(),
            atol=1e-4, rtol=1e-3)

        # full-depth text encoder (cheap at 77 tokens)
        toks = torch.zeros(2, 77, dtype=torch.long)
        g = torch.Generator().manual_seed(3)
        for i in range(2):
            n = 6 + i
            toks[i, :n] = torch.randint(1, 40000, (n,), generator=g)
            toks[i, n - 1] = 49407  # eot = argmax
        with torch.no_grad():
            want_t = model.encode_text(toks).numpy()
        got_t = clip_m.encode_text(tp, jnp.asarray(toks.numpy()), tcfg)
        np.testing.assert_allclose(np.asarray(got_t), want_t, atol=1e-4,
                                   rtol=1e-3)
        del model, sd, vp, tp
        gc.collect()


class TestAlphaClipL14_336:
    def test_contract_and_truncated_forward(self):
        _ref_on_path()
        import types
        import torch
        from make_fixtures import _load_module

        from mars_tpu.models import convert, clip as clip_m

        sys.modules.setdefault("loralib", types.ModuleType("loralib"))
        ref_aclip = _load_module("ref_alpha_clip_model_prod",
                                 f"{REFERENCE}/alpha_clip/model.py")
        # AlphaCLIP ViT-L/14@336 (the clip_l14_336_grit_20m checkpoint,
        # alpha_clip/alpha_clip.py:94-150; FilteringMergingModule.py:229)
        model = ref_aclip.CLIP(
            embed_dim=768, image_resolution=336, vision_layers=24,
            vision_width=1024, vision_patch_size=14, context_length=77,
            vocab_size=49408, transformer_width=768, transformer_heads=12,
            transformer_layers=12, lora_adapt=False,
        ).float().eval()
        _randomize(model, scale=0.02, seed=12)
        sd = _sd_np(model)
        vp = convert.alpha_clip_visual_to_flax(sd, depth=24)
        vcfg = clip_m.ALPHA_CLIP_L14_336_VISUAL
        _assert_tree_contract(
            vp, lambda: clip_m.init_visual_params(jax.random.PRNGKey(0), vcfg))

        from dataclasses import replace

        model.visual.transformer.resblocks = torch.nn.Sequential(
            *list(model.visual.transformer.resblocks[:2]))
        g = torch.Generator().manual_seed(4)
        x = torch.randn(1, 3, 336, 336, generator=g) * 0.5
        alpha = torch.randn(1, 1, 336, 336, generator=g)
        with torch.no_grad():
            want = model.visual(x, alpha).numpy()
        got = clip_m.visual_cls(
            vp, jnp.asarray(_nchw_to_nhwc(x.numpy())), replace(vcfg, depth=2),
            alpha=jnp.asarray(alpha.numpy()[:, 0]))
        np.testing.assert_allclose(np.asarray(got), want, atol=1e-4, rtol=1e-3)
        del model, sd, vp
        gc.collect()


class TestSamVitH:
    def test_contract_and_truncated_forward(self):
        _ref_on_path()
        import torch
        from make_fixtures import _stub_torchvision

        _stub_torchvision()
        from segment_anything.build_sam import sam_model_registry

        from mars_tpu.models import convert, sam as jsam

        model = sam_model_registry["vit_h"](checkpoint=None).eval()
        _randomize(model, scale=0.02, seed=13)
        sd = _sd_np(model)
        cfg = jsam.SAM_VARIANTS["vit_h"]
        enc_p = convert.sam_encoder_to_flax(sd, depth=32)
        pe_p = convert.sam_prompt_encoder_to_flax(sd)
        dec_p = convert.sam_decoder_to_flax(sd)
        _assert_tree_contract(
            enc_p, lambda: jsam.init_encoder_params(jax.random.PRNGKey(0), cfg))
        _assert_tree_contract(
            pe_p, lambda: jsam.init_prompt_encoder_params(jax.random.PRNGKey(0), cfg))
        _assert_tree_contract(
            dec_p, lambda: jsam.init_decoder_params(jax.random.PRNGKey(0), cfg))

        # truncated encoder at the production 1024-px geometry (rel-pos
        # tables at window 14, grid 64); ViT-H blocks 0-1 are windowed
        from dataclasses import replace

        model.image_encoder.blocks = torch.nn.ModuleList(
            list(model.image_encoder.blocks[:2]))
        x = torch.randn(1, 3, 1024, 1024,
                        generator=torch.Generator().manual_seed(5)) * 0.5
        with torch.no_grad():
            want = model.image_encoder(x).numpy()
        cfg2 = replace(cfg, depth=2, global_attn_indexes=())
        got = jsam.encode_image(enc_p, jnp.asarray(_nchw_to_nhwc(x.numpy())), cfg2)
        np.testing.assert_allclose(
            np.asarray(got), _nchw_to_nhwc(want), atol=1e-4, rtol=1e-3)

        # FULL prompt encoder + decoder at production dims (small)
        coords = torch.tensor([[[100.0, 200.0], [640.0, 800.0], [5.0, 5.0]]])
        labels = torch.tensor([[1, 0, -1]])
        with torch.no_grad():
            sparse, dense = model.prompt_encoder(
                points=(coords, labels), boxes=None, masks=None)
            masks_t, iou_t = model.mask_decoder(
                image_embeddings=torch.randn(
                    1, 256, 64, 64, generator=torch.Generator().manual_seed(6)) * 0.1,
                image_pe=model.prompt_encoder.get_dense_pe(),
                sparse_prompt_embeddings=sparse,
                dense_prompt_embeddings=dense, multimask_output=True)
        got_sparse = jsam.embed_points(
            pe_p, jnp.asarray(coords.numpy()), jnp.asarray(labels.numpy()),
            (1024, 1024), pad=True)
        np.testing.assert_allclose(np.asarray(got_sparse), sparse.numpy(),
                                   atol=1e-4, rtol=1e-3)
        del model, sd, enc_p, pe_p, dec_p
        gc.collect()


class TestVipLlava7B:
    def test_contract_and_truncated_forward(self):
        import torch
        from transformers import (CLIPVisionConfig, LlamaConfig,
                                  VipLlavaConfig,
                                  VipLlavaForConditionalGeneration)

        from mars_tpu.models import vip_llava as vl

        # llava-hf/vip-llava-7b-hf production config
        # (TextRetrieverModule.py:448-479)
        hf_cfg = VipLlavaConfig(
            vision_config=CLIPVisionConfig(
                hidden_size=1024, intermediate_size=4096,
                num_hidden_layers=24, num_attention_heads=16,
                image_size=336, patch_size=14),
            text_config=LlamaConfig(
                hidden_size=4096, intermediate_size=11008,
                num_hidden_layers=32, num_attention_heads=32,
                num_key_value_heads=32, vocab_size=32064,
                max_position_embeddings=4096),
            vision_feature_layers=[-2, -5, -8, -11, 6],
            image_token_index=32000,
        )
        # constructing a 7B model with real random init takes minutes on
        # this 1-core host: no-op the expensive init fns during
        # construction (buffers like rotary inv_freq still compute
        # normally), then fill parameters deterministically from a rolling
        # seeded buffer — values need only be positionally varied, not
        # iid, for a conversion contract
        from unittest import mock

        noop = lambda tensor, *a, **k: tensor
        with mock.patch.object(torch.nn.init, "normal_", noop), \
             mock.patch.object(torch.nn.init, "trunc_normal_", noop), \
             mock.patch.object(torch.nn.init, "kaiming_normal_", noop), \
             mock.patch.object(torch.nn.init, "kaiming_uniform_", noop), \
             mock.patch.object(torch.nn.init, "xavier_normal_", noop), \
             mock.patch.object(torch.nn.init, "xavier_uniform_", noop), \
             mock.patch.object(torch.nn.init, "uniform_", noop):
            model = VipLlavaForConditionalGeneration(hf_cfg).eval()
        buf = (torch.randn(1 << 22,
                           generator=torch.Generator().manual_seed(14))
               * 0.02)
        off = 0
        with torch.no_grad():
            for p in model.parameters():
                n = p.numel()
                idx = (torch.arange(n) + off) % buf.numel()
                p.copy_(buf[idx].reshape(p.shape))
                off += n % 997 + 1
        sd = {k: v.detach().numpy() for k, v in model.state_dict().items()}
        cfg = vl.VipLlavaConfig()  # defaults ARE the 7B production dims
        params = vl.convert_hf(sd, cfg)
        _assert_tree_contract(
            params,
            lambda: vl.init_random_params(0, cfg, dtype=jnp.float32))

        # truncated forward: 2 vision + 2 decoder layers at full width.
        # The converted layer0/layer1 subtrees are the production-shape
        # weights; deeper layers share the identical mapping.
        from dataclasses import replace

        small = replace(cfg, v_layers=2, layers=2, vision_feature_layers=(-2,))
        model.model.vision_tower.vision_model.encoder.layers = \
            torch.nn.ModuleList(list(
                model.model.vision_tower.vision_model.encoder.layers[:2]))
        model.model.language_model.layers = torch.nn.ModuleList(
            list(model.model.language_model.layers[:2]))
        model.config.vision_feature_layers = [-2]
        # projector input width shrinks 5120→1024 with one feature layer:
        # reuse the production projector SLICED on its input dim (torch
        # side gets the same slice so the numeric check stays meaningful)
        with torch.no_grad():
            mp = model.model.multi_modal_projector
            mp.projector_layernorm.weight.data = \
                mp.projector_layernorm.weight[:1024].clone()
            mp.projector_layernorm.bias.data = \
                mp.projector_layernorm.bias[:1024].clone()
            mp.projector_layernorm.normalized_shape = (1024,)
            mp.linear_1.weight.data = mp.linear_1.weight[:, :1024].clone()
            mp.linear_1.in_features = 1024
        p_small = jax.tree_util.tree_map(lambda x: x, params)  # shallow ok
        p_small["projector"] = {
            "ln": {"scale": params["projector"]["ln"]["scale"][:1024],
                   "bias": params["projector"]["ln"]["bias"][:1024]},
            "linear_1": {"kernel": params["projector"]["linear_1"]["kernel"][:1024],
                         "bias": params["projector"]["linear_1"]["bias"]},
            "linear_2": params["projector"]["linear_2"],
        }

        g = 576  # (336/14)^2
        ids = np.full((1, 5 + g), 7, np.int64)
        ids[0, 2:2 + g] = 32000
        pixels = torch.randn(1, 3, 336, 336,
                             generator=torch.Generator().manual_seed(7)) * 0.5
        with torch.no_grad():
            want = model(input_ids=torch.from_numpy(ids),
                         pixel_values=pixels,
                         attention_mask=torch.ones(1, ids.shape[1],
                                                   dtype=torch.long),
                         ).logits.numpy()
        got = vl.forward_logits(
            p_small, jnp.asarray(ids),
            jnp.asarray(_nchw_to_nhwc(pixels.numpy())), small)
        np.testing.assert_allclose(np.asarray(got), want, atol=2e-3, rtol=1e-2)
        del model, sd, params, p_small
        gc.collect()
