"""Automatic mask generation (SAM AMG) as fixed-shape device batches.

Functional parity with the reference's heavily-forked
``SamAutomaticMaskGenerator`` (reference:
segment_anything/automatic_mask_generator.py):
  - selected-prompt batches (``_process_sel_batch`` :455-556): Matcher's
    point/label/box/mask-input combos → batched decode, predicted-IoU
    filter, stability filter, box-from-mask, crop-edge filter, NMS
  - dense grid sweep (``_process_batch`` :385-453): points_per_side² grid
  - multimask output-layer selection (:405-415, :508-518)

TPU-first re-design: the image is encoded ONCE; every prompt set is a
fixed-(K,2) row of a single (B, K) batch padded with label -1 (SAM's native
null point); all filters become validity-mask updates; masks stay dense in
HBM (no RLE); NMS is the O(N²) XLA kernel.  Single whole-image crop (the
reference's default crop_n_layers=0) — the crop-edge filter is then a no-op
(is_box_near_crop_edge with crop == image is all-False).
"""
from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from mars_tpu.core import masks as mask_ops
from mars_tpu.models import sam
from mars_tpu.ops import nms as nms_ops


@dataclass(frozen=True)
class AmgConfig:
    # thresholds for selected-prompt batches (reference :147-155)
    sel_pred_iou_thresh: float = 0.88
    sel_stability_score_thresh: float = 0.95
    sel_stability_score_offset: float = 1.0
    # thresholds for the dense grid sweep
    pred_iou_thresh: float = 0.88
    stability_score_thresh: float = 0.95
    stability_score_offset: float = 1.0
    box_nms_thresh: float = 0.7
    points_per_side: int = 32
    # multimask selection: single-mask output unless sel_multimask_output;
    # 0..2 → that multimask layer; 3..5 → layers (k-3).. (reference :405-415)
    sel_multimask_output: bool = False
    sel_output_layer: int = 3
    multimask_output: bool = True
    output_layer: int = 3
    decode_batch: int = 32
    # multi-crop sweep (reference automatic_mask_generator.py:51-54)
    crop_n_layers: int = 0
    crop_nms_thresh: float = 0.7
    crop_overlap_ratio: float = 512 / 1500
    crop_n_points_downscale_factor: int = 1


@partial(jax.jit, static_argnames=("cfg",))
def encode_target(params, image01: jnp.ndarray, cfg: sam.SamConfig):
    """image01: (H, W, 3) raw [0,1] → (G, G, C) embedding.

    Preprocess per reference sam.py:133-150 + utils/transforms.py: scale the
    longest side to cfg.img_size, normalize in 0-255 space, zero-pad to
    square AFTER normalization.  Square inputs reduce to a plain resize.
    Input shape is static, so non-square crops each compile one program.
    """
    s = cfg.img_size
    h, w = image01.shape[:2]
    scale = s / max(h, w)
    nh, nw = int(h * scale + 0.5), int(w * scale + 0.5)
    img = jax.image.resize(image01 * 255.0, (nh, nw, 3), "bilinear")
    img = (img - jnp.asarray(sam.SAM_PIXEL_MEAN)) / jnp.asarray(sam.SAM_PIXEL_STD)
    if (nh, nw) != (s, s):
        img = jnp.pad(img, ((0, s - nh), (0, s - nw), (0, 0)))
    return sam.encode_image(params["encoder"], img[None], cfg)[0]


def _select_layers(masks, ious, multimask: bool, output_layer: int):
    """(B, 4, ...) decoder outputs → (B, M, ...): single-mask → slot 0;
    multimask + layer 0..2 → that one of the 3 multimask slots;
    multimask + layer 3..5 → slots (layer-3)..2 (reference :405-415)."""
    if not multimask:
        return masks[:, 0:1], ious[:, 0:1]
    if output_layer in (0, 1, 2):
        i = 1 + output_layer
        return masks[:, i : i + 1], ious[:, i : i + 1]
    layer = output_layer - 3
    return masks[:, 1 + layer :], ious[:, 1 + layer :]


def _pad_to_multiple(x, mult, axis=0, fill=0):
    n = x.shape[axis]
    pad = (-n) % mult
    if pad == 0:
        return x
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, pad)
    return jnp.pad(x, widths, constant_values=fill)


@partial(jax.jit, static_argnames=("model_cfg", "cfg", "original_size", "use_box", "use_mask_input", "dense_grid"))
def decode_prompt_sets(
    params,
    embedding: jnp.ndarray,  # (G, G, C)
    point_coords: jnp.ndarray,  # (B, K, 2) xy in ORIGINAL image pixels
    point_labels: jnp.ndarray,  # (B, K) in {-1, 0, 1}; -1 = padding
    set_valid: jnp.ndarray,  # (B,) bool
    model_cfg: sam.SamConfig,
    cfg: AmgConfig,
    original_size: Tuple[int, int] = (518, 518),
    box: Optional[jnp.ndarray] = None,  # (4,) xyxy in original pixels
    mask_input: Optional[jnp.ndarray] = None,  # (4G, 4G) low-res logits
    use_box: bool = False,
    use_mask_input: bool = False,
    dense_grid: bool = False,
):
    """Decode every prompt set and apply the AMG filters, all on device.

    Returns dict over N = B·M fixed mask slots:
      masks (N, H, W) bool at original size, low_res_logits (N, 4G, 4G),
      iou (N,), stability (N,), boxes (N, 4) float original pixels,
      valid (N,) after iou/stability/NMS, set_index (N,).
    """
    g = embedding.shape[0]
    b0 = point_coords.shape[0]
    sel = not dense_grid
    iou_thr = cfg.sel_pred_iou_thresh if sel else cfg.pred_iou_thresh
    st_thr = cfg.sel_stability_score_thresh if sel else cfg.stability_score_thresh
    st_off = cfg.sel_stability_score_offset if sel else cfg.stability_score_offset
    multimask = cfg.sel_multimask_output if sel else cfg.multimask_output
    out_layer = cfg.sel_output_layer if sel else cfg.output_layer

    coords = sam.transform_coords(point_coords, original_size, model_cfg.img_size)
    sparse = sam.embed_points(
        params["prompt_encoder"], coords, point_labels, (model_cfg.img_size,) * 2,
        pad=not use_box,
    )
    # label -1 slots inside the K columns are PADDING, masked out of the
    # decoder's attention so mixed-size prompt rows decode exactly as their
    # unpadded selves (the reference batches per size instead,
    # automatic_mask_generator.py:455-556); the appended canonical pad
    # point / box tokens stay live.
    b_rows = point_labels.shape[0]
    sparse_valid = point_labels != -1
    extra = 2 if use_box else 1
    sparse_valid = jnp.concatenate(
        [sparse_valid, jnp.ones((b_rows, extra), bool)], axis=1)
    if use_box:
        bcoords = sam.transform_coords(box.reshape(2, 2), original_size, model_cfg.img_size)
        bemb = sam.embed_boxes(params["prompt_encoder"], bcoords.reshape(1, 4),
                               (model_cfg.img_size,) * 2)
        sparse = jnp.concatenate(
            [sparse, jnp.broadcast_to(bemb, (sparse.shape[0], 2, sparse.shape[-1]))], axis=1
        )
    if use_mask_input:
        dense = sam.embed_mask_input(params["prompt_encoder"], mask_input[None])[0]
    else:
        dense = sam.no_mask_dense(params["prompt_encoder"], (g, g))
    image_pe = sam.dense_pe(params["prompt_encoder"], (g, g))

    # dead-chunk skip (same pattern as the AlphaCLIP / EMD stages): valid
    # prompt sets are compacted to the front and all-dead chunks skip the
    # decoder + upscale + stability through a runtime lax.cond.  The combo
    # family's layout is mostly dead by construction (246 rows of which
    # only C(n,lo..hi) are live — the size<lo rows and index≥n rows are
    # invalid), so an n=5 episode decodes 1 chunk instead of ~8.
    order = jnp.argsort(~set_valid, stable=True)
    inv_set = jnp.zeros((b0,), jnp.int32).at[order].set(
        jnp.arange(b0, dtype=jnp.int32))
    sparse = sparse[order]
    sparse_valid = sparse_valid[order]
    n_live = jnp.sum(set_valid)

    nb = cfg.decode_batch
    sparse_p = _pad_to_multiple(sparse, nb)
    valid_p = _pad_to_multiple(sparse_valid, nb)
    n_chunks = sparse_p.shape[0] // nb
    sparse_c = sparse_p.reshape(n_chunks, nb, *sparse.shape[1:])
    # pad ROWS may be all-False: safe — decode_masks always keeps the
    # IoU/mask output tokens live in every attention row, and pad-row
    # outputs are sliced away below anyway
    valid_c = valid_p.reshape(n_chunks, nb, valid_p.shape[1])
    starts = jnp.arange(n_chunks, dtype=jnp.int32) * nb

    def chunk(args):
        sp, sv = args
        lr, iou = sam.decode_masks(
            params["decoder"], embedding, image_pe, sp,
            jnp.broadcast_to(dense, (nb, g, g, dense.shape[-1])), model_cfg,
            sparse_valid=sv,
        )  # (nb, 4, 4G, 4G), (nb, 4)
        lr_sel, iou_sel = _select_layers(lr, iou, multimask, out_layer)
        # full-res logits for parity-exact stability/boxes
        # (reference predict_torch upscales before filtering)
        up = sam.postprocess_masks(lr_sel, model_cfg.img_size, original_size)
        stab = mask_ops.stability_score(up, model_cfg.mask_threshold, st_off)
        th = up > model_cfg.mask_threshold
        boxes = mask_ops.mask_to_box(th).astype(jnp.float32)
        return th, lr_sel, iou_sel, stab, boxes

    out_shapes = jax.eval_shape(chunk, (sparse_c[0], valid_c[0]))

    def guarded(args):
        sp, sv, start = args
        return jax.lax.cond(
            start < n_live,
            chunk,
            lambda _: tuple(jnp.zeros(s.shape, s.dtype) for s in out_shapes),
            (sp, sv),
        )

    th, lr, iou, stab, boxes = jax.lax.map(guarded, (sparse_c, valid_c, starts))

    def flat(x):
        return x.reshape((-1,) + x.shape[3:])

    th, lr, iou, stab, boxes = flat(th), flat(lr), flat(iou), flat(stab), flat(boxes)
    m = th.shape[0] // sparse_p.shape[0]
    n0 = b0 * m

    # un-permute back to the caller's set order (dead rows are all-zero)
    rows = (inv_set[:, None] * m
            + jnp.arange(m, dtype=jnp.int32)[None, :]).reshape(-1)
    th, lr, iou, stab, boxes = (
        th[rows], lr[rows], iou[rows], stab[rows], boxes[rows])

    valid = jnp.repeat(set_valid, m)
    set_index = jnp.repeat(jnp.arange(b0), m)
    if iou_thr > 0:
        valid = valid & (iou > iou_thr)
    if st_thr > 0:
        valid = valid & (stab >= st_thr)
    # NOTE: EMPTY decoded masks stay valid — the reference never drops them
    # (their [0,0,0,0] boxes are never NMS-suppressed, 0-area IoU, and they
    # flow into scoring where purity ≈ 1e-6 sinks them); dropping them here
    # would change the proposal set vs the reference.
    # NMS is applied by the caller across ALL prompt batches of the crop
    # (reference _process_crop :370-376 runs it once after the batch loop)
    return {
        "masks": th,
        "low_res_logits": lr,
        "iou": iou,
        "stability": stab,
        "boxes": boxes,
        "valid": valid,
        "set_index": set_index,
    }


def nms_filter(data: dict, box_nms_thresh: float) -> dict:
    """Cross-batch NMS over concatenated decode results."""
    keep = nms_ops.nms_keep(data["boxes"], data["iou"], data["valid"], box_nms_thresh)
    return {**data, "valid": keep}


def concat_decodes(results) -> dict:
    return {k: jnp.concatenate([r[k] for r in results], axis=0) for k in results[0]}


def grid_points(points_per_side: int, original_size: Tuple[int, int]) -> jnp.ndarray:
    """The dense AMG point grid (reference utils/amg.py:179-198): n² points
    at cell centers in normalized coords, scaled to (W, H)."""
    offset = 1.0 / (2 * points_per_side)
    ax = jnp.linspace(offset, 1.0 - offset, points_per_side)
    gx, gy = jnp.meshgrid(ax, ax, indexing="xy")
    pts = jnp.stack([gx, gy], axis=-1).reshape(-1, 2)
    return pts * jnp.asarray([original_size[1], original_size[0]], jnp.float32)


def generate_dense(
    params,
    embedding: jnp.ndarray,
    model_cfg,
    cfg: AmgConfig,
    original_size: Tuple[int, int] = (518, 518),
) -> dict:
    """The classic grid AMG sweep (reference _process_crop dense_pred branch
    :326-330 + _process_batch :385-453): points_per_side² single-point
    prompts, decoded in batches, filtered, NMS'd.  Returns the same dict as
    ``decode_prompt_sets`` (already NMS-filtered)."""
    pts = grid_points(cfg.points_per_side, original_size)[:, None, :]  # (n², 1, 2)
    labels = jnp.ones((pts.shape[0], 1), jnp.int32)
    data = decode_prompt_sets(
        params, embedding, pts, labels, jnp.ones((pts.shape[0],), bool),
        model_cfg, cfg, original_size=original_size, dense_grid=True,
    )
    return nms_filter(data, cfg.box_nms_thresh)


def generate_crop_boxes(im_size: Tuple[int, int], n_layers: int,
                        overlap_ratio: float):
    """Static (host-side) crop-box enumeration: layer i has (2^i)² crops
    (reference utils/amg.py:200-239).  Returns ([x0,y0,x1,y1]…, layer_idx…).
    """
    import math
    from itertools import product

    im_h, im_w = im_size
    short_side = min(im_h, im_w)
    crop_boxes, layer_idxs = [(0, 0, im_w, im_h)], [0]

    def crop_len(orig_len, n_crops, overlap):
        return int(math.ceil((overlap * (n_crops - 1) + orig_len) / n_crops))

    for i_layer in range(n_layers):
        n_side = 2 ** (i_layer + 1)
        overlap = int(overlap_ratio * short_side * (2 / n_side))
        cw, ch = crop_len(im_w, n_side, overlap), crop_len(im_h, n_side, overlap)
        xs = [int((cw - overlap) * i) for i in range(n_side)]
        ys = [int((ch - overlap) * i) for i in range(n_side)]
        for x0, y0 in product(xs, ys):
            crop_boxes.append((x0, y0, min(x0 + cw, im_w), min(y0 + ch, im_h)))
            layer_idxs.append(i_layer + 1)
    return crop_boxes, layer_idxs


def generate_multicrop(
    params,
    image01: jnp.ndarray,  # (H, W, 3) raw [0,1]
    model_cfg,
    cfg: AmgConfig,
    original_size: Tuple[int, int] = (518, 518),
) -> dict:
    """Dense AMG over the full crop pyramid (reference _generate_masks
    :245-292 + _process_crop :293-384): per crop — encode, layer-scaled
    point grid, iou/stability filters, crop-edge filter, within-crop NMS —
    then uncrop to the image frame and cross-crop NMS preferring smaller
    crops (scores 1/crop_area, :281-289).

    TPU-first: crop boxes are static python ints, so each distinct crop
    SIZE compiles one fixed-shape program (layer crops share a size); masks
    are padded back to (H, W) on device, and both NMS passes are the O(N²)
    XLA kernel.  With crop_n_layers=0 this equals ``generate_dense``.
    """
    H, W = original_size
    crop_boxes, layer_idxs = generate_crop_boxes(
        (H, W), cfg.crop_n_layers, cfg.crop_overlap_ratio)
    results = []
    for cb, layer in zip(crop_boxes, layer_idxs):
        x0, y0, x1, y1 = cb
        crop = jax.lax.slice(image01, (y0, x0, 0), (y1, x1, 3))
        emb = encode_target(params, crop, model_cfg)
        n_side = max(1, cfg.points_per_side
                     // (cfg.crop_n_points_downscale_factor ** layer))
        pts = grid_points(n_side, (y1 - y0, x1 - x0))[:, None, :]
        labels = jnp.ones((pts.shape[0], 1), jnp.int32)
        data = decode_prompt_sets(
            params, emb, pts, labels, jnp.ones((pts.shape[0],), bool),
            model_cfg, cfg, original_size=(y1 - y0, x1 - x0), dense_grid=True,
        )
        boxes_orig = mask_ops.uncrop_boxes_xyxy(data["boxes"], cb)
        near = mask_ops.is_box_near_crop_edge(boxes_orig, cb, (0, 0, W, H))
        data["valid"] = data["valid"] & ~near
        data = nms_filter(data, cfg.box_nms_thresh)
        data["masks"] = mask_ops.uncrop_masks(data["masks"], cb, H, W)
        data["boxes"] = boxes_orig
        data["points"] = mask_ops.uncrop_points(
            pts[data["set_index"], 0].astype(jnp.float32), cb)
        data["crop_area"] = jnp.full(
            (data["masks"].shape[0],), float((x1 - x0) * (y1 - y0)), jnp.float32)
        del data["low_res_logits"]  # crop-frame logits are not comparable
        results.append(data)
    out = concat_decodes(results)
    if len(crop_boxes) > 1:
        keep = nms_ops.nms_keep(out["boxes"], 1.0 / out["crop_area"],
                                out["valid"], cfg.crop_nms_thresh)
        out["valid"] = keep
    return out


@partial(jax.jit, static_argnames=("min_area", "nms_thresh"))
def postprocess_small_regions(data: dict, min_area: int, nms_thresh: float) -> dict:
    """Remove small disconnected regions / fill small holes, then re-NMS
    (reference automatic_mask_generator.py:558-607 + utils/amg.py:274-299).

    Masks whose cleanup changed them get NMS score 0 (the reference's
    "prefer unchanged masks" rule); boxes are recomputed from the cleaned
    masks.  Fixed-shape: every slot processed, validity preserved.
    """
    from mars_tpu.ops import components as comp

    def clean(mask):
        m = mask.astype(bool)
        m1, ch_holes = comp.remove_small_regions(m, float(min_area), True)
        m2, ch_islands = comp.remove_small_regions(m1, float(min_area), False)
        return m2, ch_holes | ch_islands

    masks, changed = jax.vmap(clean)(data["masks"])
    boxes = mask_ops.mask_to_box(masks).astype(jnp.float32)
    scores = jnp.where(changed, 0.0, 1.0)
    keep = nms_ops.nms_keep(boxes, scores, data["valid"], nms_thresh)
    return {**data, "masks": masks, "boxes": boxes, "valid": keep}
