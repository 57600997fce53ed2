"""CLIP (CLIP-ES forked dialect) + AlphaCLIP as pure functions.

Functional parity with the reference forks:
  - ``visual_embed``/``prefinal``: conv patch embed + CLS + bilinearly
    upsampled pos embed (reference clip/model.py:102-117 ``upsample_pos_emb``),
    ln_pre, then ``depth-1`` blocks for images (reference Transformer.forward
    :326-327) while accumulating head-averaged patch attention for the PIR
    tap (the reference collects every per-layer map; we keep a running sum).
  - ``gradcam_last_block``: the held-out final block with gradients through
    its ln_1 activation, mean-pooled patch tokens, projection, softmaxed
    image-text logits (reference ``forward_last_layer`` clip/model.py:501-524)
    — the hook + backward machinery of pytorch_grad_cam
    (base_cam.py:62-158, grad_cam.py:16-23, activations_and_gradients.py)
    collapses into a single ``jax.value_and_grad``.
  - ``encode_text``: causal transformer, eot-token pooling, projection
    (reference clip/model.py:486-499; identical math in
    alpha_clip/model.py's CLIP.encode_text).
  - ``alpha_visual_cls``: AlphaCLIP's visual forward with the additive
    1-channel alpha patch conv, CLS pooling (reference
    alpha_clip/model.py:359-386).
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from mars_tpu.models import layers as L


@dataclass(frozen=True)
class ClipVisualConfig:
    patch_size: int = 16
    width: int = 768
    depth: int = 12
    num_heads: int = 12
    output_dim: int = 512
    pos_embed_grid: int = 14  # 224/16
    alpha_channel: bool = False


@dataclass(frozen=True)
class ClipTextConfig:
    context_length: int = 77
    vocab_size: int = 49408
    width: int = 512
    depth: int = 12
    num_heads: int = 8
    output_dim: int = 512


CLIP_B16_VISUAL = ClipVisualConfig()
CLIP_B16_TEXT = ClipTextConfig()
# reference: alpha_clip ViT-L/14@336px (FilteringMergingModule.py:226-231)
ALPHA_CLIP_L14_336_VISUAL = ClipVisualConfig(
    patch_size=14, width=1024, depth=24, num_heads=16, output_dim=768,
    pos_embed_grid=24, alpha_channel=True,
)
ALPHA_CLIP_L14_TEXT = ClipTextConfig(width=768, num_heads=12, output_dim=768)
# plain CLIP ViT-L/14@224 — the reference's alternate --vta_backbone
# (main_MARS.py:144, VisualTextAlignmentModule.py:81-86)
CLIP_L14_VISUAL = ClipVisualConfig(
    patch_size=14, width=1024, depth=24, num_heads=16, output_dim=768,
    pos_embed_grid=16,
)
CLIP_L14_TEXT = ALPHA_CLIP_L14_TEXT


# --------------------------------------------------------------------------
# visual tower
# --------------------------------------------------------------------------

def visual_embed(params, images, cfg: ClipVisualConfig, alpha=None):
    """(B, H, W, 3) → post-ln_pre tokens (B, 1+P, D)."""
    b, h, w, _ = images.shape
    gh, gw = h // cfg.patch_size, w // cfg.patch_size
    x = L.conv_patch_embed(params["patch_embed"], images, cfg.patch_size)
    if cfg.alpha_channel:
        # reference: alpha_clip/model.py:361-362 — additive alpha conv
        xa = L.conv_patch_embed(params["patch_embed_alpha"], alpha[..., None], cfg.patch_size)
        x = x + xa
    cls = jnp.broadcast_to(params["class_embedding"], (b, 1, cfg.width))
    x = jnp.concatenate([cls, x], axis=1)
    x = x + L.interpolate_pos_embed(params["pos_embed"], (gh, gw), 1, "bilinear")
    return L.layer_norm(params["ln_pre"], x)


def prefinal(params, x, cfg: ClipVisualConfig, attn_tap_last_n: int = 0):
    """Run blocks 0..depth-2 (image branch holds out the final block,
    reference clip/model.py:326-327).

    attn_tap_last_n counts over the FULL depth-long attn list (the final
    block's map is added later by the CAM step), so the tapped prefinal
    blocks are those with index >= depth - attn_tap_last_n.

    Returns (tokens, attn_patch_sum or None).
    """
    attn_total = None
    tap_start = cfg.depth - attn_tap_last_n
    for i in range(cfg.depth - 1):
        tap = attn_tap_last_n > 1 and i >= tap_start
        x, attn = L.block(params[f"block{i}"], x, cfg.num_heads,
                          act=L.quick_gelu, return_attn=tap)
        if tap:
            pa = attn[:, 1:, 1:]
            attn_total = pa if attn_total is None else attn_total + pa
    return x, attn_total


def gradcam_last_block(params, x_prefinal, text_feats, logit_scale, cfg: ClipVisualConfig):
    """Softmax-Grad-CAM through the held-out final block.

    text_feats: (T, output_dim), foreground label at row 0
    (reference SoftmaxGradCAM.py:152-170 builds [fg] + bg prompt features).

    Returns (cam, probs, attn_patch_last):
      cam:   (B, P) ReLU(sum_c w_c * act_c) — unscaled; caller applies the
             reference's double min-max scaling (base_cam.py:126-164).
      probs: (B, T) softmaxed image-text logits.
      attn_patch_last: (B, P, P) head-mean patch attention of the final block.
    """
    p = params[f"block{cfg.depth - 1}"]
    a = L.layer_norm(p["ln1"], x_prefinal)  # the Grad-CAM target activation
    # (reference: VTA target layer = resblocks[-1].ln_1,
    #  VisualTextAlignmentModule.py:56)

    txt = text_feats / jnp.linalg.norm(text_feats, axis=-1, keepdims=True)

    def head(a_in):
        attn_out, attn_w = L.mha(p["attn"], a_in, cfg.num_heads,
                                 return_attn=True, force_xla=True)
        h = x_prefinal + attn_out
        h = h + L.mlp(p["mlp"], L.layer_norm(p["ln2"], h), L.quick_gelu)
        h = L.layer_norm(params["ln_post"], h)
        pooled = jnp.mean(h[:, 1:, :], axis=1)  # mean over patch tokens
        img = pooled @ params["proj"]
        img = img / jnp.linalg.norm(img, axis=-1, keepdims=True)
        logits = jnp.exp(logit_scale) * img @ txt.T
        probs = jax.nn.softmax(logits, axis=-1)
        # Grad-CAM target: softmaxed logit of the foreground label
        # (reference ClipOutputTarget(0), SoftmaxGradCAM.py:22-30,170)
        return jnp.sum(probs[:, 0]), (probs, attn_w)

    (_, (probs, attn_w)), grads = jax.value_and_grad(head, has_aux=True)(a)
    # weights = spatial mean of grads per channel over PATCH tokens
    # (reference reshape_transform strips CLS, grad_cam.py:16-23)
    g = grads[:, 1:, :]
    act = a[:, 1:, :]
    w = jnp.mean(g, axis=1)  # (B, D)
    cam = jnp.maximum(jnp.einsum("bpd,bd->bp", act, w), 0.0)
    return cam, probs, attn_w[:, 1:, 1:]


def visual_cls(params, images, cfg: ClipVisualConfig, alpha=None):
    """Full visual tower → projected CLS embedding (AlphaCLIP ranking head,
    reference alpha_clip/model.py:359-386)."""
    x = visual_embed(params, images, cfg, alpha=alpha)
    for i in range(cfg.depth):
        x, _ = L.block(params[f"block{i}"], x, cfg.num_heads, act=L.quick_gelu)
    x_cls = L.layer_norm(params["ln_post"], x[:, 0:1])[:, 0]
    return x_cls @ params["proj"]


# --------------------------------------------------------------------------
# text tower
# --------------------------------------------------------------------------

def encode_text(params, tokens, cfg: ClipTextConfig):
    """tokens: (B, 77) int32 → (B, output_dim) eot-pooled projected features
    (reference clip/model.py:486-499)."""
    x = params["token_embedding"]["embedding"][tokens]
    x = x + params["pos_embed"]
    l = x.shape[1]
    mask = jnp.tril(jnp.ones((l, l), dtype=bool))[None, None]
    for i in range(cfg.depth):
        x, _ = L.block(params[f"block{i}"], x, cfg.num_heads,
                       act=L.quick_gelu, mask=mask)
    x = L.layer_norm(params["ln_final"], x)
    eot = jnp.argmax(tokens, axis=-1)
    pooled = x[jnp.arange(x.shape[0]), eot]
    return pooled @ params["text_projection"]


# --------------------------------------------------------------------------
# random init (tests / benchmarks without checkpoints)
# --------------------------------------------------------------------------

def init_visual_params(key, cfg: ClipVisualConfig):
    ks = jax.random.split(key, cfg.depth + 5)
    scale = cfg.width ** -0.5
    p = {
        "patch_embed": {
            "kernel": jax.random.normal(
                ks[0], (cfg.patch_size, cfg.patch_size, 3, cfg.width), jnp.float32) * 0.02,
        },
        "class_embedding": jax.random.normal(ks[1], (cfg.width,), jnp.float32) * scale,
        "pos_embed": jax.random.normal(
            ks[2], (1, cfg.pos_embed_grid ** 2 + 1, cfg.width), jnp.float32) * scale,
        "ln_pre": L._init_ln(cfg.width),
        "ln_post": L._init_ln(cfg.width),
        "proj": jax.random.normal(ks[3], (cfg.width, cfg.output_dim), jnp.float32) * scale,
    }
    if cfg.alpha_channel:
        p["patch_embed_alpha"] = {
            "kernel": jax.random.normal(
                ks[4], (cfg.patch_size, cfg.patch_size, 1, cfg.width), jnp.float32) * 0.02,
        }
    for i in range(cfg.depth):
        p[f"block{i}"] = L.init_block_params(ks[5 + i], cfg.width, cfg.width * 4)
    return p


def init_text_params(key, cfg: ClipTextConfig):
    ks = jax.random.split(key, cfg.depth + 3)
    p = {
        "token_embedding": {
            "embedding": jax.random.normal(ks[0], (cfg.vocab_size, cfg.width), jnp.float32) * 0.02
        },
        "pos_embed": jax.random.normal(ks[1], (cfg.context_length, cfg.width), jnp.float32) * 0.01,
        "ln_final": L._init_ln(cfg.width),
        "text_projection": jax.random.normal(
            ks[2], (cfg.width, cfg.output_dim), jnp.float32) * cfg.width ** -0.5,
    }
    for i in range(cfg.depth):
        p[f"block{i}"] = L.init_block_params(ks[3 + i], cfg.width, cfg.width * 4)
    return p
