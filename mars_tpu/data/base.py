"""Episode records and host→device conversion.

The reference yields torch-tensor episode dicts through a DataLoader
(reference: matcher/data/dataset.py:14-49, coco.py:58-67).  Here datasets
yield numpy ``EpisodeRecord``s; ``to_device_episode`` resizes/normalizes on
device (jax.image) and pads the shot dimension so every episode has one
static shape.
"""
from __future__ import annotations

from dataclasses import dataclass, field
from typing import List, Optional, Tuple

import jax.numpy as jnp
import numpy as np

from mars_tpu.core import imaging
from mars_tpu.core.episode import Episode


@dataclass
class EpisodeRecord:
    query_img: np.ndarray  # (H, W, 3) uint8
    query_mask: np.ndarray  # (H, W) {0,1}
    support_imgs: List[np.ndarray]  # each (H, W, 3) uint8
    support_masks: List[np.ndarray]  # each (H, W) {0,1}
    class_id: int
    class_name: str = ""
    query_name: str = ""
    support_names: List[str] = field(default_factory=list)
    query_ignore: Optional[np.ndarray] = None  # (H, W) {0,1} PASCAL boundary
    org_query_imsize: Optional[Tuple[int, int]] = None


def to_device_episode(rec: EpisodeRecord, size: int = 518, max_shots: int = 1) -> Episode:
    """Resize images (bilinear, antialiased — torchvision Resize semantics,
    reference dataset.py:32-35) and masks (nearest), pad shots."""

    def prep_img(img):
        x = jnp.asarray(img, jnp.float32) / 255.0
        return imaging.resize(x, (size, size), "bilinear")

    def prep_mask(m):
        x = jnp.asarray(m, jnp.float32)
        return imaging.resize_mask(x, (size, size))

    s = len(rec.support_imgs)
    assert s <= max_shots, f"{s} shots > max_shots {max_shots}"
    sup_i = [prep_img(i) for i in rec.support_imgs]
    sup_m = [prep_mask(m) for m in rec.support_masks]
    for _ in range(max_shots - s):
        sup_i.append(jnp.zeros((size, size, 3), jnp.float32))
        sup_m.append(jnp.zeros((size, size), jnp.float32))
    return Episode(
        support_images=jnp.stack(sup_i),
        support_masks=jnp.stack(sup_m),
        support_valid=jnp.arange(max_shots) < s,
        query_image=prep_img(rec.query_img),
        class_id=jnp.int32(rec.class_id),
    )


def resized_gt(rec: EpisodeRecord, size: int = 518):
    """Ground-truth mask (and ignore mask) at evaluation resolution."""
    m = np.asarray(
        imaging.resize_mask(jnp.asarray(rec.query_mask, jnp.float32), (size, size))
    )
    ig = None
    if rec.query_ignore is not None:
        ig = np.asarray(
            imaging.resize_mask(jnp.asarray(rec.query_ignore, jnp.float32), (size, size))
        )
    return m, ig
