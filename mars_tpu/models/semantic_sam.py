"""Native Semantic-SAM network: SwinL + MaskDINO pixel decoder +
interactive mask decoder with multi-granularity point queries.

The reference's Matcher_SemanticSAM drives this network through the
external ``semantic_sam`` package (reference:
matcher/Matcher_SemanticSAM.py:23, 120-139 — 0-1 normalized click coords
on a 640px bicubic-resized image, several masks per click); the package
is not vendored there, so this is a from-the-architecture TPU
implementation (Semantic-SAM, Li et al. 2023 = MaskDINO encoder/decoder
with granularity-aware point queries):

  backbone   SwinL multi-scale pyramid (models/swin.py)
  pixel dec  1x1 proj + GroupNorm per level (res5/4/3 — the reversed
             feature order MaskDINO/Mask2Former flatten with), 6 encoder
             layers of multi-scale deformable self-attention with sine
             position + level embeddings (ops/deformable_attention.py);
             mask features at 1/4 via the MaskDINO FPN tail: lateral
             1x1(no bias)+GroupNorm on res2 + bilinear-upsampled encoder
             res3, 3x3(no bias)+GroupNorm+ReLU, biased 1x1 projection
             (oracle: transformers Mask2FormerPixelDecoder end-to-end,
             tests/test_models_parity.py::TestSemanticSamDecoder)
  decoder    per click: `num_granularities` learnable content queries +
             the click's sine position embedding; each layer = query
             self-attention, deformable cross-attention anchored at the
             click, FFN; heads produce per-granularity masks (dot of a
             3-layer mask MLP with the mask features) and IoU scores

TPU notes: clicks ride the batch axis (each click's granularity queries
only self-attend among themselves, matching the interactive branch),
every shape is static, the whole predict path is one jitted program.

Checkpoint conversion for released Semantic-SAM weights maps the
Microsoft-layout Swin via convert.swin_semantic_sam_to_flax; the
encoder/decoder tensors follow MaskDINO naming and can be mapped the
same way (not verified here — no weights ship in this environment).
"""
from __future__ import annotations

import math
from dataclasses import dataclass, field
from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from mars_tpu.models import layers as L
from mars_tpu.models import swin as swin_m
from mars_tpu.ops import deformable_attention as da


@dataclass(frozen=True)
class SemanticSamConfig:
    swin: swin_m.SwinConfig = field(default_factory=lambda: swin_m.SWIN_L)
    hidden: int = 256
    num_heads: int = 8
    enc_layers: int = 6
    dec_layers: int = 9
    num_points: int = 4
    ffn_dim: int = 2048
    num_granularities: int = 6
    input_size: int = 640  # Matcher_SemanticSAM.py:130 Resize(640)

    @property
    def feature_levels(self) -> int:
        return 3  # res3 (1/8), res4 (1/16), res5 (1/32)


SEMANTIC_SAM_L = SemanticSamConfig()
SEMANTIC_SAM_TINY = SemanticSamConfig(
    swin=swin_m.SwinConfig(embed_dim=16, depths=(1, 1, 1, 1),
                           num_heads=(2, 2, 4, 4), window=4),
    hidden=32, num_heads=4, enc_layers=2, dec_layers=2, ffn_dim=64,
    num_points=2, input_size=64,
)


def _group_norm(p, x, groups: int = 32, eps: float = 1e-5):
    """GroupNorm over (B, ..., C): statistics per (sample, group) across
    the group's channels AND every non-batch spatial axis — torch
    nn.GroupNorm semantics (caught by the Mask2FormerPixelDecoder
    end-to-end oracle; a channels-only reduction is instance norm).

    Statistics in f32 regardless of the tower dtype (the repo invariant:
    norms stay f32 under bf16 weights — see models/layers.layer_norm)."""
    c = x.shape[-1]
    g = min(groups, c)
    xs = x.reshape(x.shape[0], -1, g, c // g).astype(jnp.float32)
    mean = xs.mean(axis=(1, 3), keepdims=True)
    var = ((xs - mean) ** 2).mean(axis=(1, 3), keepdims=True)
    xs = (xs - mean) * jax.lax.rsqrt(var + eps)
    out = xs.reshape(x.shape) * p["scale"] + p["bias"]
    return out.astype(x.dtype)


def _sine_embed_2d(coords: jnp.ndarray, dim: int,
                   temperature: float = 10000.0) -> jnp.ndarray:
    """(..., 2) normalized xy in [0,1] → (..., dim) DETR sine embedding."""
    half = dim // 2
    scale = 2.0 * math.pi
    # standard DETR: dim_t = T^(2*(i//2)/half)
    i = jnp.arange(half)
    dim_t = temperature ** (2 * (i // 2) / half)
    x = coords[..., 0:1] * scale / dim_t
    y = coords[..., 1:2] * scale / dim_t
    x = jnp.where(i % 2 == 0, jnp.sin(x), jnp.cos(x))
    y = jnp.where(i % 2 == 0, jnp.sin(y), jnp.cos(y))
    return jnp.concatenate([y, x], axis=-1)


def _level_grid(h: int, w: int) -> np.ndarray:
    """(h·w, 2) normalized cell-center xy — the deformable REFERENCE-POINT
    convention (Deformable-DETR get_reference_points: linspace(0.5, H-0.5)/H)."""
    ys = (np.arange(h) + 0.5) / h
    xs = (np.arange(w) + 0.5) / w
    gx, gy = np.meshgrid(xs, ys)
    return np.stack([gx.reshape(-1), gy.reshape(-1)], axis=-1).astype(np.float32)


def _pos_grid(h: int, w: int) -> np.ndarray:
    """(h·w, 2) normalized xy for the SINE POSITION embedding — the
    cumsum-normalized convention ((i+1)/(n+1e-6)) of detectron2's
    PositionEmbeddingSine that MaskDINO/Mask2Former pixel decoders are
    trained with (transformers Mask2FormerSinePositionEmbedding).  Distinct
    from the cell-center reference-point grid above: released checkpoints
    bake this half-cell shift into their weights."""
    ys = (np.arange(h) + 1.0) / (h + 1e-6)
    xs = (np.arange(w) + 1.0) / (w + 1e-6)
    gx, gy = np.meshgrid(xs, ys)
    return np.stack([gx.reshape(-1), gy.reshape(-1)], axis=-1).astype(np.float32)


def _ffn(p, x):
    return x + L.dense(p["fc2"], jax.nn.relu(L.dense(p["fc1"], x)))


def _detr_self_attn(p, x, pos, num_heads: int):
    """DETR-convention self-attention: the position embedding is added to
    queries and KEYS only — VALUES stay position-free (transformers
    DeformableDetrMultiheadAttention; torch `self_attn(q, k, value=tgt)`).
    Uses the packed-qkv param layout, split per component."""
    b, l, d = x.shape
    hd = d // num_heads
    wq, wk, wv = jnp.split(p["qkv"]["kernel"], 3, axis=1)
    bq, bk, bv = jnp.split(p["qkv"]["bias"], 3)
    xp = x + pos
    q = (jnp.einsum("blc,cd->bld", xp, wq) + bq).reshape(b, l, num_heads, hd)
    k = (jnp.einsum("blc,cd->bld", xp, wk) + bk).reshape(b, l, num_heads, hd)
    v = (jnp.einsum("blc,cd->bld", x, wv) + bv).reshape(b, l, num_heads, hd)
    logits = jnp.einsum("blhd,bmhd->bhlm", q * (hd ** -0.5), k)
    probs = jax.nn.softmax(logits.astype(jnp.float32), axis=-1).astype(x.dtype)
    out = jnp.einsum("bhlm,bmhd->blhd", probs, v).reshape(b, l, d)
    return L.dense(p["proj"], out)


def _mlp3(p, x):
    x = jax.nn.relu(L.dense(p["l0"], x))
    x = jax.nn.relu(L.dense(p["l1"], x))
    return L.dense(p["l2"], x)


def feature_shapes(cfg: SemanticSamConfig, h: int, w: int):
    """Static per-level (h, w) in FLATTENED order — res5, res4, res3 (the
    reversed-feature convention MaskDINO/Mask2Former train with; see
    pixel_decoder)."""
    p = cfg.swin.patch_size
    g = (h // p, w // p)
    return tuple(( -(-g[0] // (2 ** s)), -(-g[1] // (2 ** s)))
                 for s in (3, 2, 1))


def _conv3x3(kernel, x):
    """(B, H, W, Cin) · (3, 3, Cin, Cout) same-padded stride-1 conv."""
    return jax.lax.conv_general_dilated(
        x, kernel.astype(x.dtype), (1, 1), [(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


def pixel_decoder(params, feats, cfg: SemanticSamConfig):
    """MaskDINO/Mask2Former MSDeformAttn pixel decoder over a backbone
    pyramid ``feats`` (stage0..stage3 = res2..res5, NHWC) → (memory
    (1, L, C), mask_feats (1, H/4, W/4, C)).

    Level ORDER matters for converted checkpoints: the flattened sequence
    is features[::-1] = [res5 (1/32), res4 (1/16), res3 (1/8)]
    (transformers modeling_mask2former.py:1304; detectron2/MaskDINO
    msdeformattn does the same) — input_proj / level_embed index 0 ↔ res5.

    Mask features follow MaskDINO's FPN tail (Mask2FormerPixelDecoder
    .forward:1363-1384, identical in maskdino_encoder.forward_features):
    lateral 1x1(no bias)+GroupNorm on res2, plus the bilinear-upsampled
    (align_corners=False) encoder output at res3, through 3x3(no bias)+
    GroupNorm+ReLU, then a biased 1x1 mask projection.  Oracle-tested
    end-to-end vs the transformers module with converted weights."""
    srcs, shapes, pos = [], [], []
    for lev, stage in enumerate(("stage3", "stage2", "stage1")):
        f = feats[stage]
        f = L.dense(params[f"input_proj{lev}"]["proj"], f)
        f = _group_norm(params[f"input_proj{lev}"]["norm"], f)
        b, h, w, c = f.shape
        shapes.append((h, w))
        srcs.append(f.reshape(b, h * w, c))
        grid = jnp.asarray(_pos_grid(h, w))
        pos.append(_sine_embed_2d(grid, cfg.hidden)[None]
                   + params["level_embed"][lev][None, None])
    memory = jnp.concatenate(srcs, axis=1)
    pos_all = jnp.concatenate(pos, axis=1)
    refs = jnp.concatenate(
        [jnp.asarray(_level_grid(h, w)) for h, w in shapes], axis=0)
    refs = jnp.broadcast_to(refs[None, :, None, :],
                            (1, refs.shape[0], len(shapes), 2))

    for i in range(cfg.enc_layers):
        lp = params[f"enc{i}"]
        q = memory + pos_all
        attn = da.msda_layer(lp["msda"], q, refs, memory, tuple(shapes),
                             cfg.num_heads, cfg.num_points)
        memory = L.layer_norm(lp["ln1"], memory + attn)
        memory = L.layer_norm(lp["ln2"], _ffn(lp["ffn"], memory))

    # FPN tail at 1/4: res3 is the LAST flattened segment
    lat = _group_norm(params["adapter"]["norm"],
                      L.dense(params["adapter"]["conv"], feats["stage0"]))
    h3, w3 = shapes[-1]
    enc3 = memory[:, -(h3 * w3):].reshape(1, h3, w3, cfg.hidden)
    up = jax.image.resize(enc3, (1, lat.shape[1], lat.shape[2], cfg.hidden),
                          "bilinear")
    out = _conv3x3(params["layer"]["conv"]["kernel"], lat + up)
    out = jax.nn.relu(_group_norm(params["layer"]["norm"], out))
    mask_feats = L.dense(params["mask_projection"], out)
    return memory, mask_feats


@partial(jax.jit, static_argnames=("cfg",))
def encode_image(params, image: jnp.ndarray, cfg: SemanticSamConfig):
    """image (H, W, 3) normalized → (memory (1, L, C), mask_feats
    (1, H/4, W/4, C)).  Backbone + pixel decoder; run once per target.
    Level shapes are static: feature_shapes(cfg, H, W)."""
    feats = swin_m.forward_features(params["backbone"], image[None], cfg.swin)
    return pixel_decoder(params, feats, cfg)


@partial(jax.jit, static_argnames=("cfg", "shapes", "return_embeddings"))
def predict_points(params, memory, mask_feats,
                   points: jnp.ndarray,  # (K, 2) normalized xy in [0, 1]
                   cfg: SemanticSamConfig, shapes=None,
                   return_embeddings: bool = False):
    """→ (masks (K, G, H/4, W/4) logits, iou (K, G)); with
    ``return_embeddings`` → (emb (K, G, C), iou) and the caller takes
    masks = emb · mask_feats (the head is linear, so averaging embeddings
    across clicks equals averaging their mask logits — the backend uses
    this to avoid materializing K·G full-resolution logits).

    Each click spawns cfg.num_granularities queries that self-attend only
    among themselves and cross-attend (deformable) at the click location —
    the Semantic-SAM interactive branch; multi-granularity output mirrors
    the reference contract (Matcher_SemanticSAM.py:266-276)."""
    k = points.shape[0]
    g = cfg.num_granularities
    pos = _sine_embed_2d(points, cfg.hidden)[:, None]  # (K, 1, C)
    # DETR convention: content queries (granularity embeddings) carry the
    # click's sine position only at the attention inputs
    q = jnp.broadcast_to(params["granularity_embed"][None],
                         (k, g, cfg.hidden))
    mem = memory  # (1, L, C): msda_layer folds queries into the shared value
    refs = jnp.broadcast_to(points[:, None, None, :],
                            (k, g, len(shapes), 2))

    for i in range(cfg.dec_layers):
        lp = params[f"dec{i}"]
        # self-attention among the click's granularity queries (DETR
        # convention: pos on q/k, values pos-free)
        sa = _detr_self_attn(lp["self_attn"], q, pos, cfg.num_heads)
        q = L.layer_norm(lp["ln1"], q + sa)
        ca = da.msda_layer(lp["msda"], q + pos, refs, mem,
                           shapes, cfg.num_heads, cfg.num_points)
        q = L.layer_norm(lp["ln2"], q + ca)
        q = L.layer_norm(lp["ln3"], _ffn(lp["ffn"], q))

    emb = _mlp3(params["mask_embed"], q)  # (K, G, C)
    iou = _mlp3(params["iou_head"], q)[..., 0]
    if return_embeddings:
        return emb, iou
    masks = jnp.einsum("kgc,bhwc->kghw", emb, mask_feats)
    return masks, iou


def init_params(key, cfg: SemanticSamConfig):
    keys = iter(jax.random.split(key, 1024))

    def dense_p(di, do):
        return L._init_dense(next(keys), di, do)

    def gn(c):
        return {"scale": jnp.ones((c,)), "bias": jnp.zeros((c,))}

    c = cfg.hidden
    params = {
        "backbone": swin_m.init_params(next(keys), cfg.swin),
        "level_embed": jax.random.normal(
            next(keys), (cfg.feature_levels, c)) * 0.02,
        "granularity_embed": jax.random.normal(
            next(keys), (cfg.num_granularities, c)) * 0.02,
    }
    # input_proj index 0 ↔ res5 (the reversed level order of pixel_decoder)
    for lev, s in enumerate((3, 2, 1)):
        params[f"input_proj{lev}"] = {
            "proj": dense_p(cfg.swin.stage_dim(s), c), "norm": gn(c)}
    # MaskDINO FPN tail: lateral 1x1 (no bias) + GN, output 3x3 (no bias)
    # + GN, biased 1x1 mask projection
    params["adapter"] = {
        "conv": {"kernel": L._init_dense(
            next(keys), cfg.swin.stage_dim(0), c, bias=False)["kernel"]},
        "norm": gn(c)}
    params["layer"] = {
        "conv": {"kernel": jax.random.normal(next(keys), (3, 3, c, c)) * 0.02},
        "norm": gn(c)}
    params["mask_projection"] = dense_p(c, c)
    for i in range(cfg.enc_layers):
        params[f"enc{i}"] = {
            "msda": da.init_msda_params(next(keys), c, cfg.num_heads,
                                        cfg.feature_levels, cfg.num_points),
            "ln1": L._init_ln(c), "ln2": L._init_ln(c),
            "ffn": {"fc1": dense_p(c, cfg.ffn_dim),
                    "fc2": dense_p(cfg.ffn_dim, c)},
        }
    for i in range(cfg.dec_layers):
        params[f"dec{i}"] = {
            "self_attn": {"qkv": dense_p(c, 3 * c), "proj": dense_p(c, c)},
            "msda": da.init_msda_params(next(keys), c, cfg.num_heads,
                                        cfg.feature_levels, cfg.num_points),
            "ln1": L._init_ln(c), "ln2": L._init_ln(c), "ln3": L._init_ln(c),
            "ffn": {"fc1": dense_p(c, cfg.ffn_dim),
                    "fc2": dense_p(cfg.ffn_dim, c)},
        }
    params["mask_embed"] = {"l0": dense_p(c, c), "l1": dense_p(c, c),
                            "l2": dense_p(c, c)}
    params["iou_head"] = {"l0": dense_p(c, c), "l1": dense_p(c, c),
                          "l2": dense_p(c, 1)}
    return params
