"""Fixed-shape episode containers.

The reference pipeline passes episodes around as dicts of ragged torch tensors
(reference: matcher/data/coco.py:58-67) and keeps proposals as Python lists of
variable length (reference: main_MARS.py:62, mars/MARS.py:33-104).  On TPU we
keep everything fixed-shape: images are NHWC float arrays at a single episode
resolution, the shot dimension is padded to ``max_shots`` with a validity mask,
and proposals are padded to a bucket size with a validity mask.  All pipeline
stages are pure functions over these pytrees, so they jit/vmap/shard cleanly.
"""
from __future__ import annotations

from typing import NamedTuple, Optional

import jax.numpy as jnp


class Episode(NamedTuple):
    """One few-shot segmentation episode (fixed shapes, batchable).

    Shapes (unbatched):
      support_images: (S, H, W, 3) float32/bfloat16, model-normalized upstream.
      support_masks:  (S, H, W)    float32 in {0,1}.
      support_valid:  (S,)         bool — True for real shots (pad to S).
      query_image:    (H, W, 3)
      class_id:       ()           int32 (dataset class id; -1 if unknown).
    """

    support_images: jnp.ndarray
    support_masks: jnp.ndarray
    support_valid: jnp.ndarray
    query_image: jnp.ndarray
    class_id: jnp.ndarray

    @property
    def num_shots(self) -> int:
        return self.support_images.shape[-4]


class Proposals(NamedTuple):
    """A fixed-size bucket of candidate masks for one query image.

    The reference loads a ragged ``N x H x W`` bool stack from disk per episode
    (reference: main_MARS.py:62).  Here ``masks`` is padded to a static bucket
    ``P`` and ``valid`` marks the live rows; every downstream scoring kernel
    multiplies by / selects on ``valid`` instead of looping.
    """

    masks: jnp.ndarray  # (P, H, W) float32 in {0,1}
    valid: jnp.ndarray  # (P,) bool

    @property
    def bucket(self) -> int:
        return self.masks.shape[-3]


def pad_proposals(masks: jnp.ndarray, bucket: int, valid=None) -> Proposals:
    """Pad/truncate a (N, H, W) mask stack to a static bucket size.

    ``valid``: optional (N,) bool marking live rows (e.g. a Matcher output
    whose stack is already bucketed with dead rows); defaults to all-live.
    """
    n = masks.shape[0]
    h, w = masks.shape[1:]
    if valid is None:
        valid = jnp.ones((n,), dtype=bool)
    if n >= bucket:
        out = masks[:bucket]
        valid = valid[:bucket]
    else:
        out = jnp.concatenate(
            [masks, jnp.zeros((bucket - n, h, w), masks.dtype)], axis=0
        )
        valid = jnp.concatenate([valid, jnp.zeros((bucket - n,), bool)])
    return Proposals(masks=out.astype(jnp.float32), valid=valid)
