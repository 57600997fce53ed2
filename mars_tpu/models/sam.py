"""SAM (Segment Anything) in pure-function JAX, TPU-first.

Functional parity with the reference's vendored SAM
(reference: segment_anything/modeling/):
  - ViTDet image encoder with windowed attention + decomposed relative
    position embeddings (image_encoder.py:17-240, :292-366)
  - prompt encoder with random-Fourier positional encoding
    (prompt_encoder.py:16-214)
  - two-way transformer + mask decoder with 4 mask tokens, IoU head,
    hypernetwork MLPs (transformer.py:16-240, mask_decoder.py:16-176)
  - pre/post-processing (sam.py:133-170, utils/transforms.py)

TPU-first notes: tokens stay NHWC grids; window partitioning is pure
reshape/transpose (no gathers); all prompt batches are fixed-shape — callers
pad point sets and use label -1 ("not a point", reference
prompt_encoder.py:82-94) for padding, which is exactly SAM's native padding
mechanism, so ragged prompt sets cost nothing.
"""
from __future__ import annotations

import os
from dataclasses import dataclass
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from mars_tpu.models import layers as L


@dataclass(frozen=True)
class SamConfig:
    img_size: int = 1024
    patch_size: int = 16
    embed_dim: int = 768
    depth: int = 12
    num_heads: int = 12
    global_attn_indexes: Tuple[int, ...] = (2, 5, 8, 11)
    window_size: int = 14
    out_chans: int = 256
    mask_threshold: float = 0.0
    # decoder
    decoder_depth: int = 2
    decoder_heads: int = 8
    decoder_mlp_dim: int = 2048
    num_multimask_outputs: int = 3


# reference: segment_anything/build_sam.py:14-52
SAM_VARIANTS = {
    "vit_b": SamConfig(),
    "vit_l": SamConfig(embed_dim=1024, depth=24, num_heads=16,
                       global_attn_indexes=(5, 11, 17, 23)),
    "vit_h": SamConfig(embed_dim=1280, depth=32, num_heads=16,
                       global_attn_indexes=(7, 15, 23, 31)),
}

# SAM normalization in 0-255 pixel space (reference: sam.py preprocess)
SAM_PIXEL_MEAN = np.array([123.675, 116.28, 103.53], np.float32)
SAM_PIXEL_STD = np.array([58.395, 57.12, 57.375], np.float32)


# --------------------------------------------------------------------------
# image encoder
# --------------------------------------------------------------------------

def _window_partition(x, ws):
    """(B, H, W, C) → (B*nWin, ws, ws, C) with zero padding; returns padded HW."""
    b, h, w, c = x.shape
    ph, pw = (ws - h % ws) % ws, (ws - w % ws) % ws
    if ph or pw:
        x = jnp.pad(x, ((0, 0), (0, ph), (0, pw), (0, 0)))
    hp, wp = h + ph, w + pw
    x = x.reshape(b, hp // ws, ws, wp // ws, ws, c)
    x = x.transpose(0, 1, 3, 2, 4, 5).reshape(-1, ws, ws, c)
    return x, (hp, wp)


def _window_unpartition(x, ws, pad_hw, hw):
    hp, wp = pad_hw
    h, w = hw
    b = x.shape[0] // ((hp // ws) * (wp // ws))
    x = x.reshape(b, hp // ws, wp // ws, ws, ws, -1)
    x = x.transpose(0, 1, 3, 2, 4, 5).reshape(b, hp, wp, -1)
    return x[:, :h, :w]


def _rel_pos_table(rel_pos, q_size, k_size):
    """Interpolate/select the relative position table (reference
    image_encoder.py:292-323)."""
    max_rel_dist = 2 * max(q_size, k_size) - 1
    if rel_pos.shape[0] != max_rel_dist:
        r = jax.image.resize(
            rel_pos.astype(jnp.float32), (max_rel_dist, rel_pos.shape[1]), "linear"
        )
    else:
        r = rel_pos
    q_coords = jnp.arange(q_size)[:, None] * max(k_size / q_size, 1.0)
    k_coords = jnp.arange(k_size)[None, :] * max(q_size / k_size, 1.0)
    rel = (q_coords - k_coords) + (k_size - 1) * max(q_size / k_size, 1.0)
    return r[rel.astype(jnp.int32)]


def _grid_attention(p, x, num_heads, use_rel_pos=True, allow_pallas=False,
                    windowed_pallas=False):
    """Attention over an (B, H, W, C) token grid with decomposed rel pos
    (reference image_encoder.py:224-241, add_decomposed_rel_pos :325-366).

    ``allow_pallas``: the GLOBAL layers (full-grid L, e.g. 4096 tokens at
    ViT-H@1024) may route through ops/sam_attention.py's fused kernel —
    the (heads, L, L) logits tensor then never touches HBM.  Follows the
    same impl switch as the tapped towers (layers.set_attention_impl).

    ``windowed_pallas``: the WINDOWED layers (B = batch·n_windows small
    grids) may route through the batched window kernel — the XLA path's
    (B, nh, L, L) logits materialization + 6-d rel-pos broadcast measured
    ~2.7 of the 4.4 ms ViT-H windowed layer
    (tools/sam_encode_profile.py no_rel_pos delta)."""
    b, h, w, c = x.shape
    hd = c // num_heads
    if (allow_pallas and use_rel_pos and h * w >= 1024
            and L._attention_impl() != "xla"):
        return _grid_attention_pallas(
            p, x, num_heads,
            interpret=L._attention_impl() == "pallas_interpret")
    if windowed_pallas and use_rel_pos and h * w < 1024:
        # Default OFF by measurement (mirror of the notap-attention
        # verdict): the window kernel WINS in isolation (2.21 vs 2.93
        # ms/layer, tools/sam_attn_ab.py --windowed 25 --grid 14) but
        # LOSES ~1.4 ms/layer inside the encoder (tools/sam_encode_
        # profile.py windowed_only 49.1 vs full 39.5 at 8 layers) — the
        # pallas call's pad/transpose barriers forfeit more XLA fusion
        # with the surrounding partition/LN/MLP ops than the kernel
        # saves.  MARS_SAM_WINDOWED_IMPL=pallas re-routes for
        # re-measurement; interpret-mode tests always drive the kernel.
        wimpl = L._attention_impl()
        if wimpl == "pallas_interpret" or (
                wimpl != "xla"
                and os.environ.get("MARS_SAM_WINDOWED_IMPL", "xla")
                == "pallas"):
            return _grid_attention_pallas_windowed(
                p, x, num_heads, interpret=wimpl == "pallas_interpret")
    qkv = L.dense(p["qkv"], x).reshape(b, h * w, 3, num_heads, hd)
    q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]  # (B, HW, nh, hd)
    logits = jnp.einsum("bqhd,bkhd->bhqk", q * (hd ** -0.5), k)  # tower dtype
    if use_rel_pos:
        rh = _rel_pos_table(p["rel_pos_h"], h, h)  # (h, h, hd)
        rw = _rel_pos_table(p["rel_pos_w"], w, w)  # (w, w, hd)
        rq = q.reshape(b, h, w, num_heads, hd)
        bias_h = jnp.einsum("bywhd,yYd->bhywY", rq, rh)  # (b, nh, h, w, h')
        bias_w = jnp.einsum("bywhd,wWd->bhywW", rq, rw)  # (b, nh, h, w, w')
        logits = (
            logits.reshape(b, num_heads, h, w, h, w)
            + bias_h[..., :, None]
            + bias_w[..., None, :]
        ).reshape(b, num_heads, h * w, h * w)
    probs = jax.nn.softmax(logits.astype(jnp.float32), axis=-1).astype(x.dtype)
    out = jnp.einsum("bhqk,bkhd->bqhd", probs, v).reshape(b, h, w, c)
    return L.dense(p["proj"], out)


def _grid_attention_pallas(p, x, num_heads, interpret=False):
    """Global-layer grid attention via ops/sam_attention.py: the decomposed
    rel-pos bias is reduced to its two small per-query tables here (the
    same einsums as the XLA path, reference image_encoder.py:325-366) and
    expanded tile-wise on the MXU inside the kernel."""
    from mars_tpu.ops import sam_attention

    b, h, w, c = x.shape
    hd = c // num_heads
    qkv = L.dense(p["qkv"], x).reshape(b, h * w, 3, num_heads, hd)
    q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]  # (B, HW, nh, hd)
    rh = _rel_pos_table(p["rel_pos_h"], h, h).astype(x.dtype)  # (h, h', hd)
    rw = _rel_pos_table(p["rel_pos_w"], w, w).astype(x.dtype)
    rq = q.reshape(b, h, w, num_heads, hd)  # unscaled, as in the reference
    bias_h = jnp.einsum("bywhd,yYd->bhywY", rq, rh).reshape(
        b, num_heads, h * w, h)
    bias_w = jnp.einsum("bywhd,wWd->bhywW", rq, rw).reshape(
        b, num_heads, h * w, w)

    def one(qb, kb, vb, bhb, bwb):
        return sam_attention.grid_attention_pallas(
            qb, kb, vb, bhb, bwb, (h, w), interpret=interpret)

    out = jax.vmap(one)(
        q.transpose(0, 2, 1, 3), k.transpose(0, 2, 1, 3),
        v.transpose(0, 2, 1, 3), bias_h, bias_w)  # (B, nh, HW, hd)
    out = out.transpose(0, 2, 1, 3).reshape(b, h, w, c)
    return L.dense(p["proj"], out)


def _grid_attention_pallas_windowed(p, x, num_heads, interpret=False):
    """Windowed-layer grid attention via ops/sam_attention.py's batched
    window kernel: the decomposed rel-pos bias reduces to its two small
    per-query tables here (same einsums as the XLA path, reference
    image_encoder.py:325-366) and expands tile-wise on the MXU inside the
    kernel; each window-head's (L, L) logits live only in VMEM."""
    from mars_tpu.ops import sam_attention

    b, h, w, c = x.shape
    hd = c // num_heads
    qkv = L.dense(p["qkv"], x).reshape(b, h * w, 3, num_heads, hd)
    q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]  # (B, HW, nh, hd)
    rh = _rel_pos_table(p["rel_pos_h"], h, h).astype(x.dtype)  # (h, h', hd)
    rw = _rel_pos_table(p["rel_pos_w"], w, w).astype(x.dtype)
    rq = q.reshape(b, h, w, num_heads, hd)  # unscaled, as in the reference
    bias_h = jnp.einsum("bywhd,yYd->bhywY", rq, rh).reshape(
        b, num_heads, h * w, h)
    bias_w = jnp.einsum("bywhd,wWd->bhywW", rq, rw).reshape(
        b, num_heads, h * w, w)
    out = sam_attention.windowed_attention_pallas(
        q.transpose(0, 2, 1, 3), k.transpose(0, 2, 1, 3),
        v.transpose(0, 2, 1, 3), bias_h, bias_w, (h, w),
        interpret=interpret)  # (B, nh, HW, hd)
    out = out.transpose(0, 2, 1, 3).reshape(b, h, w, c)
    return L.dense(p["proj"], out)


def _layer_norm_2d(p, x, eps=1e-6):
    """Channel LayerNorm without learned stats over spatial (reference
    common.py LayerNorm2d); in NHWC this is LN over the channel axis with
    biased variance.  Stats in f32 so bf16 towers stay stable."""
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mean), axis=-1, keepdims=True)
    y = (xf - mean) * jax.lax.rsqrt(var + eps) * p["scale"] + p["bias"]
    return y.astype(x.dtype)


def encode_image(params, images, cfg: SamConfig):
    """images: (B, S, S, 3) SAM-normalized → (B, S/16, S/16, out_chans)."""
    x = L.conv_patch_embed(params["patch_embed"], images, cfg.patch_size)
    b = images.shape[0]
    gh = images.shape[1] // cfg.patch_size
    gw = images.shape[2] // cfg.patch_size
    x = x.reshape(b, gh, gw, cfg.embed_dim)
    pos = params["pos_embed"]
    if pos.shape[1] != gh or pos.shape[2] != gw:
        pos = jax.image.resize(pos.astype(jnp.float32), (1, gh, gw, pos.shape[-1]), "cubic")
    x = x + pos

    for i in range(cfg.depth):
        p = params[f"block{i}"]
        windowed = i not in cfg.global_attn_indexes
        shortcut = x
        h = L.layer_norm(p["ln1"], x, eps=1e-6)
        if windowed:
            h, pad_hw = _window_partition(h, cfg.window_size)
            h = _grid_attention(p["attn"], h, cfg.num_heads,
                                windowed_pallas=True)
            h = _window_unpartition(h, cfg.window_size, pad_hw, (gh, gw))
        else:
            h = _grid_attention(p["attn"], h, cfg.num_heads, allow_pallas=True)
        x = shortcut + h
        x = x + L.mlp(p["mlp"], L.layer_norm(p["ln2"], x, eps=1e-6), L.exact_gelu)

    # neck: 1x1 conv → LN2d → 3x3 conv → LN2d (reference image_encoder.py:88-105)
    x = jax.lax.conv_general_dilated(
        x, params["neck_conv1"]["kernel"], (1, 1), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    x = _layer_norm_2d(params["neck_ln1"], x)
    x = jax.lax.conv_general_dilated(
        x, params["neck_conv2"]["kernel"], (1, 1), [(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    x = _layer_norm_2d(params["neck_ln2"], x)
    return x


# --------------------------------------------------------------------------
# prompt encoder
# --------------------------------------------------------------------------

def _pe_encoding(gauss, coords01):
    """Random-Fourier features of [0,1]-normalized coords (reference
    prompt_encoder.py:186-194).  sin/cos computed in f32 (bf16 phase wraps
    badly), result cast back to the parameter dtype so bf16 towers stay
    bf16 downstream."""
    c = (2.0 * coords01.astype(jnp.float32) - 1.0) @ gauss.astype(jnp.float32)
    c = 2.0 * jnp.pi * c
    return jnp.concatenate([jnp.sin(c), jnp.cos(c)], axis=-1).astype(gauss.dtype)


def dense_pe(params, grid_hw: Tuple[int, int]):
    """(H, W, embed_dim) positional grid (reference prompt_encoder.py:196-207)."""
    h, w = grid_hw
    y = (jnp.arange(h, dtype=jnp.float32) + 0.5) / h
    x = (jnp.arange(w, dtype=jnp.float32) + 0.5) / w
    coords = jnp.stack(jnp.meshgrid(x, y, indexing="xy"), axis=-1)  # (h, w, 2)
    return _pe_encoding(params["pe_gaussian"], coords)


def embed_points(params, coords, labels, input_size: Tuple[int, int], pad: bool):
    """coords (B, N, 2) xy in input pixels, labels (B, N) in {-1, 0, 1}.

    label -1 → not_a_point (SAM's native padding, reference
    prompt_encoder.py:74-94); appends one pad point when ``pad``.
    """
    if pad:
        b = coords.shape[0]
        coords = jnp.concatenate([coords, jnp.zeros((b, 1, 2), coords.dtype)], axis=1)
        labels = jnp.concatenate([labels, -jnp.ones((b, 1), labels.dtype)], axis=1)
    c = (coords + 0.5) / jnp.asarray([input_size[1], input_size[0]], jnp.float32)
    pe = _pe_encoding(params["pe_gaussian"], c)
    emb = params["point_embeddings"]  # (4, D): [neg, pos, box_tl, box_br]
    lab = labels[..., None]
    out = jnp.where(lab == -1, params["not_a_point_embed"][0], pe)
    out = out + jnp.where(lab == -1, 0.0, 0.0)
    out = jnp.where(lab == 0, pe + emb[0], out)
    out = jnp.where(lab == 1, pe + emb[1], out)
    return out


def embed_boxes(params, boxes, input_size: Tuple[int, int]):
    """boxes (B, 4) xyxy → (B, 2, D) corner embeddings (reference
    prompt_encoder.py:96-103)."""
    b = boxes.shape[0]
    corners = (boxes.reshape(b, 2, 2) + 0.5) / jnp.asarray(
        [input_size[1], input_size[0]], jnp.float32
    )
    pe = _pe_encoding(params["pe_gaussian"], corners)
    emb = params["point_embeddings"]
    return pe + jnp.stack([emb[2], emb[3]])[None]


def embed_mask_input(params, masks):
    """(B, 4*G, 4*G) low-res mask logits → (B, G, G, D) dense embeddings
    (reference prompt_encoder.py:52-60 mask_downscaling)."""
    p = params["mask_downscale"]
    x = masks[..., None]

    def conv(cp, x, stride, k):
        y = jax.lax.conv_general_dilated(
            x, cp["kernel"], (stride, stride), "VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        return y + cp["bias"]

    x = conv(p["conv1"], x, 2, 2)
    x = _layer_norm_2d(p["ln1"], x)
    x = L.exact_gelu(x)
    x = conv(p["conv2"], x, 2, 2)
    x = _layer_norm_2d(p["ln2"], x)
    x = L.exact_gelu(x)
    x = conv(p["conv3"], x, 1, 1)
    return x


def no_mask_dense(params, grid_hw: Tuple[int, int]):
    return jnp.broadcast_to(
        params["no_mask_embed"][0], (grid_hw[0], grid_hw[1], params["no_mask_embed"].shape[-1])
    )


# --------------------------------------------------------------------------
# two-way transformer + mask decoder
# --------------------------------------------------------------------------

def _attn(p, q, k, v, num_heads, key_valid=None):
    """Projection attention with optional internal downsampling (reference
    transformer.py:185-240).

    ``key_valid`` (B, Nk) masks padded key tokens out of the softmax — with
    it, a prompt row padded to a common length decodes EXACTLY like the
    unpadded row (duplicated not_a_point pads would otherwise reweight the
    softmax), which lets mixed-size prompt sets share one batched decode.
    """
    q = L.dense(p["q"], q)
    k = L.dense(p["k"], k)
    v = L.dense(p["v"], v)
    b, nq, c = q.shape
    hd = c // num_heads
    qh = q.reshape(b, nq, num_heads, hd)
    kh = k.reshape(b, k.shape[1], num_heads, hd)
    vh = v.reshape(b, v.shape[1], num_heads, hd)
    logits = jnp.einsum("bqhd,bkhd->bhqk", qh, kh) / (hd ** 0.5)
    if key_valid is not None:
        logits = jnp.where(key_valid[:, None, None, :], logits, -jnp.inf)
    probs = jax.nn.softmax(logits, axis=-1)
    out = jnp.einsum("bhqk,bkhd->bqhd", probs, vh).reshape(b, nq, c)
    return L.dense(p["out"], out)


def _two_way_block(p, queries, keys, query_pe, key_pe, num_heads, skip_first_pe,
                   token_valid=None):
    if skip_first_pe:
        queries = _attn(p["self_attn"], queries, queries, queries, num_heads,
                        key_valid=token_valid)
    else:
        q = queries + query_pe
        queries = queries + _attn(p["self_attn"], q, q, queries, num_heads,
                                  key_valid=token_valid)
    queries = L.layer_norm(p["norm1"], queries)

    q = queries + query_pe
    k = keys + key_pe
    queries = queries + _attn(p["cross_attn_t2i"], q, k, keys, num_heads)
    queries = L.layer_norm(p["norm2"], queries)

    h = L.dense(p["mlp"]["fc2"], jax.nn.relu(L.dense(p["mlp"]["fc1"], queries)))
    queries = L.layer_norm(p["norm3"], queries + h)

    q = queries + query_pe
    k = keys + key_pe
    keys = keys + _attn(p["cross_attn_i2t"], k, q, queries, num_heads,
                        key_valid=token_valid)
    keys = L.layer_norm(p["norm4"], keys)
    return queries, keys


def _mlp_head(p, x, depth):
    for j in range(depth):
        x = L.dense(p[f"layer{j}"], x)
        if j < depth - 1:
            x = jax.nn.relu(x)
    return x


def decode_masks(
    params,
    image_embedding,  # (G, G, C) single image
    image_pe,  # (G, G, C)
    sparse_prompts,  # (B, N, C)
    dense_prompts,  # (B, G, G, C) or None
    cfg: SamConfig,
    sparse_valid=None,  # (B, N) bool — pad slots masked out of attention
):
    """Predict (B, 4, 4G, 4G) mask logits + (B, 4) IoU for B prompt sets
    against one image embedding (reference mask_decoder.py:112-176).

    The caller selects multimask slices (reference :100-110) — kept out of
    the kernel so one jitted decode serves every output_layer config
    (reference automatic_mask_generator.py:405-415,508-518).

    With ``sparse_valid``, rows of DIFFERENT prompt-set sizes padded to a
    common N decode exactly as their unpadded selves (pad tokens are
    attention-masked), so one batched program replaces the reference's
    per-size batches (automatic_mask_generator.py:455-556).
    """
    d = params
    b = sparse_prompts.shape[0]
    g = image_embedding.shape[0]
    c = image_embedding.shape[-1]
    num_mask_tokens = cfg.num_multimask_outputs + 1

    output_tokens = jnp.concatenate([d["iou_token"], d["mask_tokens"]], axis=0)
    tokens = jnp.concatenate(
        [jnp.broadcast_to(output_tokens, (b,) + output_tokens.shape), sparse_prompts], axis=1
    )

    src = jnp.broadcast_to(image_embedding[None], (b, g, g, c))
    if dense_prompts is not None:
        src = src + dense_prompts
    src = src.reshape(b, g * g, c)
    pos = jnp.broadcast_to(image_pe[None], (b, g, g, c)).reshape(b, g * g, c)

    token_valid = None
    if sparse_valid is not None:
        token_valid = jnp.concatenate(
            [jnp.ones((b, 1 + num_mask_tokens), bool), sparse_valid], axis=1)

    queries, keys = tokens, src
    t = d["transformer"]
    for i in range(cfg.decoder_depth):
        queries, keys = _two_way_block(
            t[f"layer{i}"], queries, keys, tokens, pos, cfg.decoder_heads,
            i == 0, token_valid=token_valid,
        )
    q = queries + tokens
    k = keys + pos
    queries = queries + _attn(t["final_attn"], q, k, keys, cfg.decoder_heads)
    queries = L.layer_norm(t["norm_final"], queries)

    iou_token_out = queries[:, 0]
    mask_tokens_out = queries[:, 1 : 1 + num_mask_tokens]

    # upscale 4x with two stride-2 transposed convs (reference :53-59)
    x = keys.reshape(b, g, g, c)
    x = jax.lax.conv_transpose(
        x, d["upscale_conv1"]["kernel"], (2, 2), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"), transpose_kernel=True,
    ) + d["upscale_conv1"]["bias"]
    x = _layer_norm_2d(d["upscale_ln"], x)
    x = L.exact_gelu(x)
    x = jax.lax.conv_transpose(
        x, d["upscale_conv2"]["kernel"], (2, 2), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"), transpose_kernel=True,
    ) + d["upscale_conv2"]["bias"]
    x = L.exact_gelu(x)  # (B, 4G, 4G, C/8)

    hyper_in = jnp.stack(
        [
            _mlp_head(d["hypernetworks"][f"mlp{i}"], mask_tokens_out[:, i], 3)
            for i in range(num_mask_tokens)
        ],
        axis=1,
    )  # (B, 4, C/8)
    masks = jnp.einsum("bmc,bhwc->bmhw", hyper_in, x)
    iou_depth = len(d["iou_head"])
    iou_pred = _mlp_head(d["iou_head"], iou_token_out, iou_depth)
    return masks, iou_pred


def postprocess_masks(masks, encoder_input_size: int, original_hw: Tuple[int, int]):
    """(..., 4G, 4G) logits → (..., H, W) at the original image size
    (reference sam.py:133-160: resize to encoder input, crop the unpadded
    region, resize to original). For square inputs the crop is a no-op."""
    up = jax.image.resize(
        masks, masks.shape[:-2] + (encoder_input_size, encoder_input_size), "bilinear"
    )
    scale = encoder_input_size / max(original_hw)
    crop_h = int(round(original_hw[0] * scale))
    crop_w = int(round(original_hw[1] * scale))
    up = up[..., :crop_h, :crop_w]
    return jax.image.resize(up, masks.shape[:-2] + tuple(original_hw), "bilinear")


def transform_coords(coords, original_hw: Tuple[int, int], encoder_input_size: int):
    """ResizeLongestSide.apply_coords (reference utils/transforms.py)."""
    oh, ow = original_hw
    scale = encoder_input_size / max(oh, ow)
    new_h, new_w = int(oh * scale + 0.5), int(ow * scale + 0.5)
    return coords * jnp.asarray([new_w / ow, new_h / oh], jnp.float32)


# --------------------------------------------------------------------------
# random init (tests / benchmarks without checkpoints)
# --------------------------------------------------------------------------

def init_encoder_params(key, cfg: SamConfig):
    ks = jax.random.split(key, cfg.depth + 6)
    g = cfg.img_size // cfg.patch_size
    p = {
        "patch_embed": {
            "kernel": jax.random.normal(
                ks[0], (cfg.patch_size, cfg.patch_size, 3, cfg.embed_dim), jnp.float32) * 0.02,
            "bias": jnp.zeros((cfg.embed_dim,), jnp.float32),
        },
        "pos_embed": jax.random.normal(ks[1], (1, g, g, cfg.embed_dim), jnp.float32) * 0.02,
        "neck_conv1": {"kernel": jax.random.normal(ks[2], (1, 1, cfg.embed_dim, cfg.out_chans), jnp.float32) * 0.02},
        "neck_ln1": L._init_ln(cfg.out_chans),
        "neck_conv2": {"kernel": jax.random.normal(ks[3], (3, 3, cfg.out_chans, cfg.out_chans), jnp.float32) * 0.02},
        "neck_ln2": L._init_ln(cfg.out_chans),
    }
    hd = cfg.embed_dim // cfg.num_heads
    for i in range(cfg.depth):
        blk = L.init_block_params(ks[4 + i], cfg.embed_dim, cfg.embed_dim * 4)
        size = cfg.window_size if i not in cfg.global_attn_indexes else g
        blk["attn"]["rel_pos_h"] = jnp.zeros((2 * size - 1, hd), jnp.float32)
        blk["attn"]["rel_pos_w"] = jnp.zeros((2 * size - 1, hd), jnp.float32)
        p[f"block{i}"] = blk
    return p


def init_prompt_encoder_params(key, cfg: SamConfig):
    ks = jax.random.split(key, 8)
    d = cfg.out_chans
    mic = 16
    return {
        "pe_gaussian": jax.random.normal(ks[0], (2, d // 2), jnp.float32),
        "not_a_point_embed": jax.random.normal(ks[1], (1, d), jnp.float32) * 0.02,
        "no_mask_embed": jax.random.normal(ks[2], (1, d), jnp.float32) * 0.02,
        "point_embeddings": jax.random.normal(ks[3], (4, d), jnp.float32) * 0.02,
        "mask_downscale": {
            "conv1": {"kernel": jax.random.normal(ks[4], (2, 2, 1, mic // 4), jnp.float32) * 0.1,
                      "bias": jnp.zeros((mic // 4,), jnp.float32)},
            "ln1": L._init_ln(mic // 4),
            "conv2": {"kernel": jax.random.normal(ks[5], (2, 2, mic // 4, mic), jnp.float32) * 0.1,
                      "bias": jnp.zeros((mic,), jnp.float32)},
            "ln2": L._init_ln(mic),
            "conv3": {"kernel": jax.random.normal(ks[6], (1, 1, mic, d), jnp.float32) * 0.1,
                      "bias": jnp.zeros((d,), jnp.float32)},
        },
    }


def _init_sam_attn(key, d, internal):
    ks = jax.random.split(key, 4)
    return {
        "q": L._init_dense(ks[0], d, internal),
        "k": L._init_dense(ks[1], d, internal),
        "v": L._init_dense(ks[2], d, internal),
        "out": L._init_dense(ks[3], internal, d),
    }


def init_decoder_params(key, cfg: SamConfig):
    d = cfg.out_chans
    num_mask_tokens = cfg.num_multimask_outputs + 1
    ks = jax.random.split(key, 32)
    t = {}
    ki = 0
    for i in range(cfg.decoder_depth):
        t[f"layer{i}"] = {
            "self_attn": _init_sam_attn(ks[ki], d, d),
            "norm1": L._init_ln(d),
            "cross_attn_t2i": _init_sam_attn(ks[ki + 1], d, d // 2),
            "norm2": L._init_ln(d),
            "mlp": {"fc1": L._init_dense(ks[ki + 2], d, cfg.decoder_mlp_dim),
                    "fc2": L._init_dense(ks[ki + 3], cfg.decoder_mlp_dim, d)},
            "norm3": L._init_ln(d),
            "cross_attn_i2t": _init_sam_attn(ks[ki + 4], d, d // 2),
            "norm4": L._init_ln(d),
        }
        ki += 5
    t["final_attn"] = _init_sam_attn(ks[ki], d, d // 2)
    t["norm_final"] = L._init_ln(d)
    ki += 1
    hyper = {}
    for i in range(num_mask_tokens):
        kk = jax.random.split(ks[ki + i], 3)
        hyper[f"mlp{i}"] = {
            "layer0": L._init_dense(kk[0], d, d),
            "layer1": L._init_dense(kk[1], d, d),
            "layer2": L._init_dense(kk[2], d, d // 8),
        }
    kk = jax.random.split(ks[ki + num_mask_tokens], 6)
    return {
        "iou_token": jax.random.normal(kk[0], (1, d), jnp.float32) * 0.02,
        "mask_tokens": jax.random.normal(kk[1], (num_mask_tokens, d), jnp.float32) * 0.02,
        "transformer": t,
        "upscale_conv1": {"kernel": jax.random.normal(kk[2], (2, 2, d // 4, d), jnp.float32) * 0.05,
                          "bias": jnp.zeros((d // 4,), jnp.float32)},
        "upscale_ln": L._init_ln(d // 4),
        "upscale_conv2": {"kernel": jax.random.normal(kk[3], (2, 2, d // 8, d // 4), jnp.float32) * 0.05,
                          "bias": jnp.zeros((d // 8,), jnp.float32)},
        "hypernetworks": hyper,
        "iou_head": {
            "layer0": L._init_dense(kk[4], d, 256),
            "layer1": L._init_dense(jax.random.split(kk[4])[0], 256, 256),
            "layer2": L._init_dense(kk[5], 256, num_mask_tokens),
        },
    }
