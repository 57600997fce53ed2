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

import jax
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
    """Resize images (bilinear antialiased) and masks (nearest), pad shots,
    ship ONE fixed-shape transfer to the device.

    Resizing runs on the host with PIL — the reference resizes PIL images
    through torchvision transforms (reference dataset.py:32-35), so this IS
    the reference semantics; it also keeps varying source-image shapes out
    of the device program (every new source shape would otherwise compile a
    fresh resize executable — ~seconds per episode on real datasets, where
    each record has its own resolution)."""
    sup, msk, qry, valid = episode_host_u8(rec, size, max_shots)
    # uint8 over the wire (4x less host->device traffic), one jitted
    # conversion on device
    sup_f, sup_mf, qry_f = _episode_floats(
        jnp.asarray(sup), jnp.asarray(msk), jnp.asarray(qry))
    return Episode(
        support_images=sup_f,
        support_masks=sup_mf,
        support_valid=jnp.asarray(valid),
        query_image=qry_f,
        class_id=jnp.int32(rec.class_id),
    )


def episode_host_u8(rec: EpisodeRecord, size: int, max_shots: int):
    """to_device_episode's HOST half: resized uint8 numpy fields with no
    transfer.  Batch drivers (cli_parallel) stack B of these and ship ONE
    fixed-shape transfer per field per batch — per-episode eager dispatches
    cost ~35 ms each on a tunnel-attached chip."""
    from PIL import Image

    def prep_img(img):
        im = Image.fromarray(np.ascontiguousarray(np.asarray(img, np.uint8)))
        return np.asarray(im.resize((size, size), Image.BILINEAR), np.uint8)

    def prep_mask(m):
        im = Image.fromarray(np.ascontiguousarray(np.asarray(m, np.uint8)))
        return np.asarray(im.resize((size, size), Image.NEAREST), np.uint8)

    s = len(rec.support_imgs)
    assert s <= max_shots, f"{s} shots > max_shots {max_shots}"
    sup_i = [prep_img(i) for i in rec.support_imgs]
    sup_m = [prep_mask(m) for m in rec.support_masks]
    for _ in range(max_shots - s):
        sup_i.append(np.zeros((size, size, 3), np.uint8))
        sup_m.append(np.zeros((size, size), np.uint8))
    return (np.stack(sup_i), np.stack(sup_m), prep_img(rec.query_img),
            np.arange(max_shots) < s)


@jax.jit
def _episode_floats(sup_u8, msk_u8, qry_u8):
    return (sup_u8.astype(jnp.float32) / 255.0,
            msk_u8.astype(jnp.float32),
            qry_u8.astype(jnp.float32) / 255.0)


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
