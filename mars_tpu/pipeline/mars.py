"""MARS orchestrator: the end-to-end episode prediction.

Functional parity with the reference orchestrator (reference:
mars/MARS.py:14-116):
  1. class name + definition from the support set (host VLM + WordNet)
  2. VVA prior (DINOv2)                                [device]
  3. VTA prior (CLIP Grad-CAM), nearest-resized to the VVA grid and
     min-max scaled (reference :77-82)                 [device]
  4. AlphaCLIP text "a {name}, {description}." (:84-89)
  5. proposal scoring / filtering / merging            [device]

TPU-first: stages 2-5 are jitted pure functions sharing one device graph
per episode; the only host work is the VLM text step and tokenization.
"""
from __future__ import annotations

import time
from functools import partial
from dataclasses import dataclass, field
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from mars_tpu.core import imaging
from mars_tpu.core.episode import Episode, Proposals
from mars_tpu.models import clip as clip_m, dinov2
from mars_tpu.pipeline import filtering, vta, vva
from mars_tpu.text import prompts as prompt_data
from mars_tpu.text import tokenizer
from mars_tpu.text.retriever import TextRetriever
from mars_tpu.utils.profiling import StageTimers, force_sync


@dataclass(frozen=True)
class MarsConfig:
    vva: vva.VVAConfig = field(default_factory=vva.VVAConfig)
    vta: vta.VTAConfig = field(default_factory=vta.VTAConfig)
    filter_merge: filtering.FilterMergeConfig = field(default_factory=filtering.FilterMergeConfig)
    use_multiple_prompts: bool = False
    # per-stage wall-clock spans (forces a device sync per stage — costs a
    # few tunnel round trips, so opt-in)
    profile_stages: bool = False


class Mars:
    """Holds frozen params + configs; ``predict`` runs one episode.

    Models (all frozen):
      dino:       (params, DinoV2Config)        — VVA backbone
      clip:       (visual_params, text_params, logit_scale, vcfg, tcfg)
      alpha_clip: (visual_params, text_params, logit_scale, vcfg, tcfg)
      retriever:  host-side TextRetriever (VLM + WordNet), or None to use
                  a provided class name (gt-class-name mode)
    """

    def __init__(self, dino, clip, alpha_clip, retriever: Optional[TextRetriever],
                 cfg: MarsConfig = MarsConfig()):
        self.dino_params, self.dino_cfg = dino
        (self.clip_v, self.clip_t, self.clip_scale,
         self.clip_vcfg, self.clip_tcfg) = clip
        (self.ac_v, self.ac_t, self.ac_scale,
         self.ac_vcfg, self.ac_tcfg) = alpha_clip
        self.retriever = retriever
        self.cfg = cfg
        self.timings = {}
        self.stage_timers = StageTimers()

    # ---------------- host text stage ----------------

    def support_host_arrays(self, episode: Episode):
        """Valid support shots as host uint8 images + float masks (the
        retriever and the pipelined text stage draw visual prompts on
        these)."""
        imgs = np.asarray(
            jnp.clip(episode.support_images * 255, 0, 255).astype(jnp.uint8)
        )
        masks = np.asarray(episode.support_masks)
        n = int(np.asarray(episode.support_valid).sum())
        return [imgs[i] for i in range(n)], [masks[i] for i in range(n)]

    def conceptual_information(self, episode: Episode):
        return self.retriever.get_conceptual_information(
            *self.support_host_arrays(episode)
        )

    # ---------------- device stages ----------------

    def _vta_text_feats(self, label: str):
        fg, bg = prompt_data.vta_text_pair(label, self.cfg.use_multiple_prompts)
        fg_tok = jnp.asarray(tokenizer.tokenize(fg))
        bg_tok = jnp.asarray(tokenizer.tokenize(bg))
        return vta.compute_text_feats(self.clip_t, self.clip_tcfg, fg_tok, bg_tok)

    def _alpha_clip_text_feats(self, text: str):
        tok = jnp.asarray(tokenizer.tokenize([text]))

        # jitted: eager op-by-op execution is pathological on remote-attached
        # devices (every op is a host round trip)
        @jax.jit
        def enc(params, tok):
            feats = clip_m.encode_text(params, tok, self.ac_tcfg)
            return feats / jnp.linalg.norm(feats, axis=-1, keepdims=True)

        if not hasattr(self, "_ac_text_jit"):
            self._ac_text_jit = enc
        return self._ac_text_jit(self.ac_t, tok)

    def _fused(self):
        """One jitted program for ALL device stages of an episode (same graph
        bench.py times).  On a remote-attached chip each dispatch is a ~35 ms
        round trip; fusing stages 2-5 leaves one dispatch per episode."""
        if hasattr(self, "_fused_jit"):
            return self._fused_jit
        dino_cfg, clip_vcfg, ac_vcfg = self.dino_cfg, self.clip_vcfg, self.ac_vcfg
        vva_cfg, vta_cfg, fm_cfg = self.cfg.vva, self.cfg.vta, self.cfg.filter_merge
        g = vva_cfg.grid

        @jax.jit
        def fused(dino_params, clip_v, clip_scale, ac_v,
                  sup_img, sup_mask, sup_valid, qry,
                  prop_masks, prop_valid, vta_text, ac_text):
            vva_prior, cost, support_fg = vva.compute(
                dino_params, sup_img, sup_mask, sup_valid, qry, dino_cfg, vva_cfg)
            vta_prior = vta.compute(
                clip_v, qry, vta_text, clip_scale, clip_vcfg, vta_cfg)
            vta_prior = imaging.interpolate_2d(vta_prior, (g, g), "nearest")
            vta_prior = (vta_prior - vta_prior.min()) / (
                1e-7 + vta_prior.max() - vta_prior.min())
            ac_scores = filtering.alphaclip_scores(
                ac_v, qry, prop_masks, ac_text, ac_vcfg, fm_cfg,
                proposal_valid=prop_valid)
            return filtering.score_and_merge(
                prop_masks, prop_valid, support_fg, cost,
                vva_prior, vta_prior, ac_scores, fm_cfg)

        self._fused_jit = fused
        return fused

    def _fused_debug(self):
        """The fused program, but returning the per-stage internals the
        reference's --visualize figures draw (Matcher.py:230-231,872-1037):
        priors, per-proposal scores, AlphaCLIP scores.  A separate
        executable so the hot path's program stays minimal; only traced
        when visualization is requested."""
        if hasattr(self, "_fused_debug_jit"):
            return self._fused_debug_jit
        dino_cfg, clip_vcfg, ac_vcfg = self.dino_cfg, self.clip_vcfg, self.ac_vcfg
        vva_cfg, vta_cfg, fm_cfg = self.cfg.vva, self.cfg.vta, self.cfg.filter_merge
        g = vva_cfg.grid

        @jax.jit
        def fused_debug(dino_params, clip_v, clip_scale, ac_v,
                        sup_img, sup_mask, sup_valid, qry,
                        prop_masks, prop_valid, vta_text, ac_text):
            vva_prior, cost, support_fg = vva.compute(
                dino_params, sup_img, sup_mask, sup_valid, qry, dino_cfg, vva_cfg)
            vta_prior = vta.compute(
                clip_v, qry, vta_text, clip_scale, clip_vcfg, vta_cfg)
            vta_prior = imaging.interpolate_2d(vta_prior, (g, g), "nearest")
            vta_prior = (vta_prior - vta_prior.min()) / (
                1e-7 + vta_prior.max() - vta_prior.min())
            ac_scores = filtering.alphaclip_scores(
                ac_v, qry, prop_masks, ac_text, ac_vcfg, fm_cfg,
                proposal_valid=prop_valid)
            merged, scores = filtering.score_and_merge(
                prop_masks, prop_valid, support_fg, cost,
                vva_prior, vta_prior, ac_scores, fm_cfg)
            return merged, scores, vva_prior, vta_prior, ac_scores

        self._fused_debug_jit = fused_debug
        return fused_debug

    def predict_debug(
        self,
        episode: Episode,
        proposals: Proposals,
        class_name: str,
        class_description: str = "",
    ) -> dict:
        """predict(), plus the internal state --visualize plots: dict with
        merged, scores (per-proposal), vva_prior, vta_prior (both (g, g)),
        ac_scores — all host numpy."""
        vta_text = self._vta_text_feats(class_name)
        ac_text = self._alpha_clip_text_feats(
            prompt_data.alpha_clip_text(class_name, class_description))
        out = self._fused_debug()(
            self.dino_params, self.clip_v, self.clip_scale, self.ac_v,
            episode.support_images, episode.support_masks,
            episode.support_valid, episode.query_image,
            proposals.masks, proposals.valid, vta_text, ac_text)
        keys = ("merged", "scores", "vva_prior", "vta_prior", "ac_scores")
        return {k: np.asarray(v) for k, v in zip(keys, out)}

    def predict_launch(
        self,
        episode: Episode,
        proposals: Proposals,
        class_name: str,
        class_description: str = "",
    ) -> jnp.ndarray:
        """Dispatch the fused ranking program WITHOUT waiting: returns the
        merged mask as a device array the caller syncs later (np.asarray).

        The production loop (cli.py --overlap-ranking) launches a block's
        rankings and pulls results a block late, so the chip's queue stays
        fed while the host fetches earlier results through the ~35 ms
        tunnel round trip.  Identical program and inputs to predict() —
        bit-identical outputs (tests/test_cli.py pins the meter trace)."""
        vta_text = self._vta_text_feats(class_name)
        ac_text = self._alpha_clip_text_feats(
            prompt_data.alpha_clip_text(class_name, class_description))
        merged, _ = self._fused()(
            self.dino_params, self.clip_v, self.clip_scale, self.ac_v,
            episode.support_images, episode.support_masks,
            episode.support_valid, episode.query_image,
            proposals.masks, proposals.valid, vta_text, ac_text)
        return merged

    def predict(
        self,
        episode: Episode,
        proposals: Proposals,
        class_name: Optional[str] = None,
        class_description: str = "",
    ) -> jnp.ndarray:
        """→ (H, W) float mask in {0, 1} (reference MARS.predict :33-104)."""
        t0 = time.time()
        if class_name is None:
            class_name, class_description = self.conceptual_information(episode)
        t1 = time.time()

        if not self.cfg.profile_stages:
            vta_text = self._vta_text_feats(class_name)
            ac_text = self._alpha_clip_text_feats(
                prompt_data.alpha_clip_text(class_name, class_description))
            merged, _ = self._fused()(
                self.dino_params, self.clip_v, self.clip_scale, self.ac_v,
                episode.support_images, episode.support_masks,
                episode.support_valid, episode.query_image,
                proposals.masks, proposals.valid, vta_text, ac_text)
            merged.block_until_ready()
            t2 = time.time()
            self.timings = {"total": t2 - t0, "after_text_extraction": t2 - t1}
            return merged

        with self.stage_timers.span("vva", None):
            vva_prior, cost, support_fg = vva.compute(
                self.dino_params,
                episode.support_images, episode.support_masks, episode.support_valid,
                episode.query_image, self.dino_cfg, self.cfg.vva,
            )
            if self.cfg.profile_stages:
                force_sync(vva_prior)

        with self.stage_timers.span("vta", None):
            vta_text = self._vta_text_feats(class_name)
            vta_prior = vta.compute(
                self.clip_v, episode.query_image, vta_text, self.clip_scale,
                self.clip_vcfg, self.cfg.vta,
            )
            if self.cfg.profile_stages:
                force_sync(vta_prior)
        # nearest-resize VTA to the VVA grid + min-max (reference :77-82)
        g = self.cfg.vva.grid

        @partial(jax.jit, static_argnames=("g",))
        def _resize_scale(x, g):
            x = imaging.interpolate_2d(x, (g, g), "nearest")
            return (x - x.min()) / (1e-7 + x.max() - x.min())

        if not hasattr(self, "_resize_scale_jit"):
            self._resize_scale_jit = _resize_scale
        vta_prior = self._resize_scale_jit(vta_prior, g)

        ac_text = self._alpha_clip_text_feats(
            prompt_data.alpha_clip_text(class_name, class_description)
        )
        with self.stage_timers.span("alphaclip", None):
            ac_scores = filtering.alphaclip_scores(
                self.ac_v, episode.query_image, proposals.masks, ac_text,
                self.ac_vcfg, self.cfg.filter_merge,
                proposal_valid=proposals.valid,
            )
            if self.cfg.profile_stages:
                force_sync(ac_scores)
        merged, scores = filtering.score_and_merge(
            proposals.masks, proposals.valid, support_fg, cost,
            vva_prior, vta_prior, ac_scores, self.cfg.filter_merge,
        )
        merged.block_until_ready()
        t2 = time.time()
        self.timings = {
            "total": t2 - t0,
            "after_text_extraction": t2 - t1,
        }
        return merged
