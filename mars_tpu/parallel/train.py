"""Training: SAM decoder fine-tuning on few-shot episodes (dp x tp).

The reference ships only a vestigial, unused DINOv2 SSL trainer (SURVEY
§2.7); its live path is training-free.  This module gives the framework a
first-class training capability anyway — prompt-driven segmentation
fine-tuning of the SAM prompt-encoder + mask decoder with the frozen image
encoder, using SAM's published loss recipe (focal + dice on mask logits,
MSE on the IoU head):

  - data parallelism: the episode batch shards over the mesh 'data' axis;
    gradient all-reduce is inserted by GSPMD from the output sharding.
  - tensor parallelism: decoder kernels shard over 'model'
    (parallel.mesh rules).
"""
from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
import optax

from mars_tpu.models import sam


@dataclass(frozen=True)
class TrainConfig:
    learning_rate: float = 1e-5
    focal_alpha: float = 0.25
    focal_gamma: float = 2.0
    focal_weight: float = 20.0
    dice_weight: float = 1.0
    iou_weight: float = 1.0


def _focal_loss(logits, targets, alpha, gamma):
    p = jax.nn.sigmoid(logits)
    ce = optax.sigmoid_binary_cross_entropy(logits, targets)
    p_t = p * targets + (1 - p) * (1 - targets)
    a_t = alpha * targets + (1 - alpha) * (1 - targets)
    return jnp.mean(a_t * (1 - p_t) ** gamma * ce)


def _dice_loss(logits, targets, eps=1.0):
    p = jax.nn.sigmoid(logits)
    num = 2 * jnp.sum(p * targets, axis=(-1, -2)) + eps
    den = jnp.sum(p, axis=(-1, -2)) + jnp.sum(targets, axis=(-1, -2)) + eps
    return jnp.mean(1 - num / den)


def segmentation_loss(
    trainable,  # {"prompt_encoder", "decoder"}
    embedding,  # (B, G, G, C) frozen image embeddings
    point_coords,  # (B, K, 2)
    point_labels,  # (B, K)
    gt_masks,  # (B, 4G, 4G) {0,1} at low-res mask scale
    cfg: sam.SamConfig,
    tcfg: TrainConfig,
):
    pe, dec = trainable["prompt_encoder"], trainable["decoder"]
    g = embedding.shape[1]
    image_pe = sam.dense_pe(pe, (g, g))
    sparse = sam.embed_points(pe, point_coords, point_labels,
                              (cfg.img_size, cfg.img_size), pad=True)
    dense = jnp.broadcast_to(
        sam.no_mask_dense(pe, (g, g))[None],
        (embedding.shape[0], g, g, embedding.shape[-1]),
    )

    def decode_one(emb, sp, dn):
        masks, iou = sam.decode_masks(dec, emb, image_pe, sp[None], dn[None], cfg)
        return masks[0], iou[0]

    masks, iou_pred = jax.vmap(decode_one)(embedding, sparse, dense)
    logits = masks[:, 0]  # single-mask slot
    focal = _focal_loss(logits, gt_masks, tcfg.focal_alpha, tcfg.focal_gamma)
    dice = _dice_loss(logits, gt_masks)
    # IoU-head regression toward the actual IoU of the predicted mask
    pred_bin = (logits > 0).astype(jnp.float32)
    inter = jnp.sum(pred_bin * gt_masks, axis=(-1, -2))
    union = jnp.sum(jnp.maximum(pred_bin, gt_masks), axis=(-1, -2))
    actual_iou = inter / jnp.maximum(union, 1.0)
    iou_loss = jnp.mean((iou_pred[:, 0] - jax.lax.stop_gradient(actual_iou)) ** 2)
    loss = tcfg.focal_weight * focal + tcfg.dice_weight * dice + tcfg.iou_weight * iou_loss
    return loss, {"focal": focal, "dice": dice, "iou": iou_loss}


def make_train_step(cfg: sam.SamConfig, tcfg: TrainConfig = TrainConfig()):
    """→ (optimizer, train_step(trainable, opt_state, batch) → (trainable,
    opt_state, metrics)).  jit-able; shard trainable with
    parallel.mesh.shard_params and the batch over 'data'."""
    opt = optax.adamw(tcfg.learning_rate)

    def step(trainable, opt_state, embedding, coords, labels, gt_masks):
        (loss, aux), grads = jax.value_and_grad(segmentation_loss, has_aux=True)(
            trainable, embedding, coords, labels, gt_masks, cfg, tcfg
        )
        updates, opt_state = opt.update(grads, opt_state, trainable)
        trainable = optax.apply_updates(trainable, updates)
        return trainable, opt_state, {"loss": loss, **aux}

    return opt, step
