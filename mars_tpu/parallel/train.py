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


def make_train_step(cfg: sam.SamConfig, tcfg: TrainConfig = TrainConfig(),
                    accum_steps: int = 1, remat: bool = False):
    """→ (optimizer, train_step(trainable, opt_state, batch) → (trainable,
    opt_state, metrics)).  jit-able; shard trainable with
    parallel.mesh.shard_params and the batch over 'data'.

    ``accum_steps > 1``: gradient accumulation — the batch's leading axis
    is split into ``accum_steps`` equal microbatches scanned sequentially,
    averaging gradients/metrics.  All loss terms are batch means over
    equal-size microbatches, so the averaged gradient equals the
    full-batch gradient (tested); use it to train at batch sizes whose
    activations exceed HBM.  ``remat``: rematerialize the loss forward
    under ``jax.checkpoint`` — activations are recomputed in the backward
    pass, trading ~1 extra forward for not holding the decoder/upscale
    activations live (the (B, 4, 4G, 4G) upscale stack dominates
    activation memory at production scale)."""
    opt = optax.adamw(tcfg.learning_rate)
    loss_fn = segmentation_loss
    if remat:
        loss_fn = jax.checkpoint(segmentation_loss, static_argnums=(5, 6))
    grad_fn = jax.value_and_grad(loss_fn, has_aux=True)

    def step(trainable, opt_state, embedding, coords, labels, gt_masks):
        if accum_steps == 1:
            (loss, aux), grads = grad_fn(
                trainable, embedding, coords, labels, gt_masks, cfg, tcfg)
        else:
            b = embedding.shape[0]
            if b % accum_steps:
                raise ValueError(
                    f"batch {b} not divisible by accum_steps {accum_steps}")
            mb = lambda x: x.reshape((accum_steps, b // accum_steps)
                                     + x.shape[1:])

            def micro(carry, batch_i):
                g_acc, l_acc, aux_acc = carry
                e, c, l, g = batch_i
                (loss_i, aux_i), grads_i = grad_fn(
                    trainable, e, c, l, g, cfg, tcfg)
                return (jax.tree.map(jnp.add, g_acc, grads_i),
                        l_acc + loss_i,
                        jax.tree.map(jnp.add, aux_acc, aux_i)), None

            zeros = jax.tree.map(jnp.zeros_like, trainable)
            aux0 = {"focal": 0.0, "dice": 0.0, "iou": 0.0}
            (grads, loss, aux), _ = jax.lax.scan(
                micro, (zeros, 0.0, aux0),
                (mb(embedding), mb(coords), mb(labels), mb(gt_masks)))
            inv = 1.0 / accum_steps
            grads = jax.tree.map(lambda x: x * inv, grads)
            loss = loss * inv
            aux = jax.tree.map(lambda x: x * inv, aux)
        updates, opt_state = opt.update(grads, opt_state, trainable)
        trainable = optax.apply_updates(trainable, updates)
        return trainable, opt_state, {"loss": loss, **aux}

    return opt, step
