"""DINOv2 vision transformer as a pure function over a param pytree.

Functional parity with the reference fork
(reference: dinov2/models/vision_transformer.py:46-371):
  - patch embed (conv p=14) + CLS + register tokens + interpolated pos embed
    (``prepare_tokens_with_masks``, reference :223-243)
  - pre-LN blocks with LayerScale
  - ``forward_features`` returning prenorm tokens (reference :266-286)
  - attention tap: instead of ``get_last_self_attention`` materializing all
    per-block per-head maps in a *second* forward pass (reference :352-371),
    the forward accumulates the running mean over the last
    ``attn_tap_last_n`` blocks of the head-averaged patch-token attention —
    the only statistic PIR consumes — in the same pass.
"""
from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp

from mars_tpu.models import layers as L


@dataclass(frozen=True)
class DinoV2Config:
    patch_size: int = 14
    embed_dim: int = 1024
    depth: int = 24
    num_heads: int = 16
    mlp_ratio: float = 4.0
    num_register_tokens: int = 4
    layer_scale_init: float = 1e-5
    ln_eps: float = 1e-6
    pos_embed_grid: int = 37  # grid the checkpoint's pos embed covers
    # scale-factor kludge for non-native input sizes (reference
    # vision_transformer.py:204-209); 0.1 is the DINOv2 default
    interpolate_offset: float = 0.1


# reference: dinov2/models/vision_transformer.py:381-437
DINOV2_VARIANTS = {
    "vit_small": DinoV2Config(embed_dim=384, depth=12, num_heads=6),
    "vit_base": DinoV2Config(embed_dim=768, depth=12, num_heads=12),
    "vit_large": DinoV2Config(embed_dim=1024, depth=24, num_heads=16),
    "vit_giant2": DinoV2Config(embed_dim=1536, depth=40, num_heads=24),
}


def forward_features(params, images, cfg: DinoV2Config, attn_tap_last_n: int = 0):
    """images: (B, H, W, 3) normalized, NHWC.

    Returns dict with:
      x_prenorm:          (B, 1+R+P, D) tokens before the final norm
      x_norm_clstoken:    (B, D)
      x_norm_patchtokens: (B, P, D)
      attn_mean:          (B, P, P) mean over last-N blocks & heads of
                          patch-token attention; None if attn_tap_last_n==0
    """
    b, h, w, _ = images.shape
    gh, gw = h // cfg.patch_size, w // cfg.patch_size

    x = L.conv_patch_embed(params["patch_embed"], images, cfg.patch_size)
    cls = jnp.broadcast_to(params["cls_token"], (b, 1, cfg.embed_dim))
    x = jnp.concatenate([cls, x], axis=1)
    x = x + L.interpolate_pos_embed(
        params["pos_embed"], (gh, gw), 1, "bicubic",
        interpolate_offset=cfg.interpolate_offset,
    )
    if cfg.num_register_tokens:
        regs = jnp.broadcast_to(
            params["register_tokens"], (b, cfg.num_register_tokens, cfg.embed_dim)
        )
        x = jnp.concatenate([x[:, :1], regs, x[:, 1:]], axis=1)

    num_prefix = 1 + cfg.num_register_tokens
    attn_total = None
    tap_start = cfg.depth - attn_tap_last_n
    for i in range(cfg.depth):
        tap = attn_tap_last_n > 0 and i >= tap_start
        x, attn = L.block(
            params[f"block{i}"], x, cfg.num_heads,
            act=L.exact_gelu, ln_eps=cfg.ln_eps, return_attn=tap,
        )
        if tap:
            pa = attn[:, num_prefix:, num_prefix:]
            attn_total = pa if attn_total is None else attn_total + pa

    x_norm = L.layer_norm(params["norm"], x, cfg.ln_eps)
    return {
        "x_prenorm": x,
        "x_norm_clstoken": x_norm[:, 0],
        "x_norm_patchtokens": x_norm[:, num_prefix:],
        "attn_mean": None if attn_total is None else attn_total / attn_tap_last_n,
    }


def patch_features(out: dict, num_register_tokens: int, l2_normalize: bool = True) -> jnp.ndarray:
    """Prenorm patch features the way the pipeline consumes them
    (reference: VisualVisualAlignmentModule.py:113-127 — x_prenorm[:, 1+regs:],
    flattened over the batch, L2-normalized)."""
    feats = out["x_prenorm"][:, 1 + num_register_tokens:]
    feats = feats.reshape(-1, feats.shape[-1])
    if l2_normalize:
        feats = feats / jnp.clip(jnp.linalg.norm(feats, axis=-1, keepdims=True), 1e-12)
    return feats


def init_params(key, cfg: DinoV2Config):
    """Random params for tests/benchmarks (no checkpoint)."""
    ks = jax.random.split(key, cfg.depth + 3)
    p = {
        "patch_embed": {
            "kernel": jax.random.normal(
                ks[0], (cfg.patch_size, cfg.patch_size, 3, cfg.embed_dim), jnp.float32
            ) * 0.02,
            "bias": jnp.zeros((cfg.embed_dim,), jnp.float32),
        },
        "cls_token": jax.random.normal(ks[1], (1, 1, cfg.embed_dim), jnp.float32) * 1e-6,
        "pos_embed": jax.random.normal(
            ks[2], (1, cfg.pos_embed_grid ** 2 + 1, cfg.embed_dim), jnp.float32
        ) * 0.02,
        "norm": L._init_ln(cfg.embed_dim),
    }
    if cfg.num_register_tokens:
        p["register_tokens"] = (
            jax.random.normal(ks[0], (1, cfg.num_register_tokens, cfg.embed_dim), jnp.float32) * 1e-6
        )
    for i in range(cfg.depth):
        p[f"block{i}"] = L.init_block_params(
            ks[3 + i], cfg.embed_dim, int(cfg.embed_dim * cfg.mlp_ratio),
            layer_scale=cfg.layer_scale_init,
        )
    return p
