"""Visual-Text Alignment (VTA): CLIP Softmax-Grad-CAM prior.

Functional parity with the reference
(reference: mars/components/VisualTextAlignmentModule.py:49-74 +
mars/components/SoftmaxGradCAM.py:123-175 + the pytorch_grad_cam fork):
  - query resized to ceil(518/16)*16 = 528 bicubic, CLIP-normalized
  - text features: "a photo of {label}." vs "a photo without {label}."
    (or the 62 coco_templates ensemble), each normalized, template-averaged,
    re-normalized (SoftmaxGradCAM.compute_text_feats:63-109)
  - 11 CLIP blocks no-grad; Grad-CAM through the held-out block via
    jax.value_and_grad (models.clip.gradcam_last_block)
  - CAM min-max scaled twice, matching base_cam.py:126-164's
    per-layer + aggregate scaling
  - PIR refinement over the mean of the last-8 attention maps
    (the 7 tapped prefinal maps + the final block's)

The returned CAM is NOT min-max scaled at the end (the orchestrator does
that after the nearest-resize to the VVA grid, reference mars/MARS.py:77-82).
"""
from __future__ import annotations

from dataclasses import dataclass
from functools import partial

import jax
import jax.numpy as jnp

from mars_tpu.core import imaging
from mars_tpu.models import clip as clip_m
from mars_tpu.pipeline import pir


@dataclass(frozen=True)
class VTAConfig:
    refinement_box_threshold: float = 0.4  # scripts/coco_1shot.sh
    attn_tap_last_n: int = 8
    input_size: int = 528  # ceil(518/16)*16
    grid: int = 33  # 528 / 16


def _scale_cam(cam):
    """Reference scale_cam_image: subtract min, divide by (1e-7 + max)
    (SoftmaxGradCAM.py:111-121), applied per image."""
    cam = cam - jnp.min(cam, axis=-1, keepdims=True)
    return cam / (1e-7 + jnp.max(cam, axis=-1, keepdims=True))


@partial(jax.jit, static_argnames=("model_cfg", "cfg"))
def compute(
    params,
    query_image: jnp.ndarray,  # (H, W, 3) raw [0,1]
    fg_bg_text_feats: jnp.ndarray,  # (T, out_dim): fg label row 0, bg after
    logit_scale: jnp.ndarray,
    model_cfg: clip_m.ClipVisualConfig,
    cfg: VTAConfig,
) -> jnp.ndarray:
    """Returns the PIR-refined CAM (grid, grid), unscaled."""
    g = cfg.grid
    img = imaging.resize(query_image, (cfg.input_size, cfg.input_size), "bicubic")
    img = imaging.normalize(img, imaging.CLIP_MEAN, imaging.CLIP_STD)[None]

    x = clip_m.visual_embed(params, img, model_cfg)
    tokens, attn_sum = clip_m.prefinal(params, x, model_cfg, cfg.attn_tap_last_n)
    cam, probs, attn_last = clip_m.gradcam_last_block(
        params, tokens, fg_bg_text_feats, logit_scale, model_cfg
    )
    attn_mean = (attn_sum + attn_last) / cfg.attn_tap_last_n  # (1, L, L)

    # reference: per-layer scale, then aggregate (mean over 1 layer) + scale
    cam = _scale_cam(cam)
    cam = _scale_cam(cam)
    cam = cam[0].reshape(g, g)

    return pir.refine(cam, attn_mean[0], cfg.refinement_box_threshold)


@partial(jax.jit, static_argnames=("text_cfg",))
def compute_text_feats(text_params, text_cfg, fg_tokens, bg_tokens):
    """Template-averaged fg/bg prompt features
    (reference SoftmaxGradCAM.compute_text_feats:63-109).

    fg_tokens: (n_templates, 77) int32; bg_tokens: (n_bg_templates, 77).
    Returns (2, out_dim): [fg_mean, bg_mean], each normalized.
    """

    def avg(tokens):
        e = clip_m.encode_text(text_params, tokens, text_cfg)
        e = e / jnp.linalg.norm(e, axis=-1, keepdims=True)
        m = jnp.mean(e, axis=0)
        return m / jnp.linalg.norm(m)

    return jnp.stack([avg(fg_tokens), avg(bg_tokens)])
