"""End-to-end golden-episode parity against the reference orchestrator.

The fixture is one tiny episode pushed through the ACTUAL reference MARS
pipeline (mars/MARS.py:33-104) with seeded random weights and a stubbed
VLM (tools/make_fixtures.py::make_golden_episode).  The per-component
fixtures pin model semantics; this pins the cross-stage WIRING: VTA
nearest-resize to the VVA grid + min-max (:77-82), AlphaCLIP text
construction (:84-89), score fusion, thresholding, and merging.
"""
import os

import jax.numpy as jnp
import numpy as np
import pytest

from mars_tpu.core import imaging
from mars_tpu.core.episode import Episode, pad_proposals
from mars_tpu.models import clip as clip_m, convert, dinov2
from mars_tpu.ops import emd as emd_ops
from mars_tpu.pipeline import filtering, mars as mars_m, vta as vta_m, vva as vva_m
from mars_tpu.text import prompts as prompt_data, tokenizer

FIXTURES = os.path.join(os.path.dirname(__file__), "fixtures")
BUCKET = 8
DESC = "a domesticated carnivorous mammal"


def _sub(sd, prefix):
    return {k[len(prefix):]: v for k, v in sd.items() if k.startswith(prefix)}


@pytest.fixture(scope="module")
def golden():
    data = np.load(os.path.join(FIXTURES, "golden_episode_tiny.npz"))
    sd = {k[3:]: data[k] for k in data.files if k.startswith("sd.")}
    d = {k: data[k] for k in data.files if not k.startswith("sd.")}

    dino_cfg = dinov2.DinoV2Config(
        patch_size=14, embed_dim=32, depth=3, num_heads=2,
        num_register_tokens=4, pos_embed_grid=8,
    )
    clip_vcfg = clip_m.ClipVisualConfig(
        patch_size=16, width=64, depth=3, num_heads=1, output_dim=16,
        pos_embed_grid=7,
    )
    clip_tcfg = clip_m.ClipTextConfig(
        context_length=77, vocab_size=49408, width=16, depth=2, num_heads=2,
        output_dim=16,
    )
    ac_vcfg = clip_m.ClipVisualConfig(
        patch_size=16, width=64, depth=2, num_heads=1, output_dim=16,
        pos_embed_grid=7, alpha_channel=True,
    )

    clip_sd, ac_sd = _sub(sd, "clip."), _sub(sd, "aclip.")
    models = dict(
        dino=(convert.dinov2_to_flax(_sub(sd, "dino."), depth=3,
                                     num_register_tokens=4), dino_cfg),
        clip=(convert.clip_visual_to_flax(clip_sd, depth=3),
              convert.clip_text_to_flax(clip_sd, depth=2),
              jnp.asarray(convert.clip_logit_scale(clip_sd)),
              clip_vcfg, clip_tcfg),
        # the AlphaCLIP text tower has the same layout as CLIP's
        alpha_clip=(convert.alpha_clip_visual_to_flax(ac_sd, depth=2),
                    convert.clip_text_to_flax(ac_sd, depth=2),
                    jnp.asarray(convert.clip_logit_scale(ac_sd)),
                    ac_vcfg, clip_tcfg),
    )
    cfg = mars_m.MarsConfig(
        vva=vva_m.VVAConfig(refinement_box_threshold=0.8, attn_tap_last_n=2,
                            grid=8),
        vta=vta_m.VTAConfig(refinement_box_threshold=0.4, attn_tap_last_n=3,
                            input_size=112, grid=7),
        filter_merge=filtering.FilterMergeConfig(
            alpha=0.85, static_threshold=0.55, dynamic_threshold=0.95,
            grid=8, alpha_clip_size=112, alpha_clip_batch=4,
            emd_row_bucket=128, emd_col_bucket=64),
    )
    episode = Episode(
        support_images=jnp.asarray(d["support_images"][0].transpose(0, 2, 3, 1)),
        support_masks=jnp.asarray(d["support_masks"][0]),
        support_valid=jnp.ones((2,), bool),
        query_image=jnp.asarray(d["query_image"][0].transpose(1, 2, 0)),
        class_id=jnp.asarray(-1, jnp.int32),
    )
    proposals = pad_proposals(jnp.asarray(d["proposals"]), BUCKET)
    return models, cfg, episode, proposals, d


class TestGoldenEpisode:
    def test_merged_mask_via_orchestrator(self, golden):
        """The production Mars.predict reproduces the reference's merged
        mask bit-for-bit."""
        models, cfg, episode, proposals, d = golden
        m = mars_m.Mars(models["dino"], models["clip"], models["alpha_clip"],
                        retriever=None, cfg=cfg)
        merged = m.predict(episode, proposals, class_name="dog",
                           class_description=DESC)
        np.testing.assert_array_equal(np.asarray(merged), d["merged"])

    def test_vva_and_cost(self, golden):
        models, cfg, episode, _, d = golden
        dino_p, dino_cfg = models["dino"]
        prior, cost, _ = vva_m.compute(
            dino_p, episode.support_images, episode.support_masks,
            episode.support_valid, episode.query_image, dino_cfg, cfg.vva)
        np.testing.assert_allclose(np.asarray(cost), d["cost_matrix"],
                                   atol=2e-5, rtol=1e-4)
        np.testing.assert_allclose(np.asarray(prior), d["vva"],
                                   atol=5e-4, rtol=1e-3)

    def test_vta_resized(self, golden):
        models, cfg, episode, _, d = golden
        _, clip_t, scale, vcfg, tcfg = models["clip"]
        clip_v = models["clip"][0]
        fg, bg = prompt_data.vta_text_pair("dog")
        feats = vta_m.compute_text_feats(
            clip_t, tcfg, jnp.asarray(tokenizer.tokenize(fg)),
            jnp.asarray(tokenizer.tokenize(bg)))
        cam = vta_m.compute(clip_v, episode.query_image, feats, scale, vcfg,
                            cfg.vta)
        np.testing.assert_allclose(np.asarray(cam), d["vta_refined"],
                                   atol=5e-4, rtol=1e-3)
        rs = imaging.interpolate_2d(cam, (8, 8), "nearest")
        rs = (rs - rs.min()) / (1e-7 + rs.max() - rs.min())
        np.testing.assert_allclose(np.asarray(rs), d["vta_resized"],
                                   atol=5e-4, rtol=1e-3)

    def test_alphaclip_raw_scores(self, golden):
        models, cfg, episode, proposals, d = golden
        ac_v, ac_t, _, ac_vcfg, tcfg = models["alpha_clip"]
        text = prompt_data.alpha_clip_text("dog", DESC)
        assert text == "a dog, a domesticated carnivorous mammal."
        tok = jnp.asarray(tokenizer.tokenize([text]))
        tf = clip_m.encode_text(ac_t, tok, tcfg)
        tf = tf / jnp.linalg.norm(tf, axis=-1, keepdims=True)
        scores = filtering.alphaclip_scores(
            ac_v, episode.query_image, proposals.masks, tf, ac_vcfg,
            cfg.filter_merge, proposal_valid=proposals.valid)
        np.testing.assert_allclose(np.asarray(scores)[:6], d["ac_raw"],
                                   atol=3e-4, rtol=1e-3)

    def test_emd_raw(self, golden):
        models, cfg, episode, proposals, d = golden
        g = cfg.vva.grid
        pooled_sup = imaging.pool_mask_to_grid(episode.support_masks, g) > 0
        fg = (pooled_sup & episode.support_valid[:, None, None]).reshape(-1)
        pooled_p = imaging.pool_mask_to_grid(proposals.masks, g) > 0
        pooled_p = pooled_p & proposals.valid[:, None, None]
        emd = emd_ops.batched_emd(
            jnp.asarray(d["cost_matrix"]), fg,
            pooled_p.reshape(BUCKET, -1),
            cfg.filter_merge.emd_row_bucket, cfg.filter_merge.emd_col_bucket,
            col_valid=proposals.valid)
        np.testing.assert_allclose(
            1.0 - np.asarray(emd)[:6], d["emd_raw"], atol=5e-3)

    def test_final_scores(self, golden):
        models, cfg, episode, proposals, d = golden
        m = mars_m.Mars(models["dino"], models["clip"], models["alpha_clip"],
                        retriever=None, cfg=cfg)
        vta_text = m._vta_text_feats("dog")
        ac_text = m._alpha_clip_text_feats(
            prompt_data.alpha_clip_text("dog", DESC))
        _, scores = m._fused()(
            models["dino"][0], models["clip"][0], models["clip"][2],
            models["alpha_clip"][0],
            episode.support_images, episode.support_masks,
            episode.support_valid, episode.query_image,
            proposals.masks, proposals.valid, vta_text, ac_text)
        np.testing.assert_allclose(np.asarray(scores)[:6], d["final_scores"],
                                   atol=2e-2)
        assert np.all(np.asarray(scores)[6:] == -np.inf)
