"""Connected components and box-union on device.

Replaces the reference's CPU round-trip through cv2
(threshold → findContours → boundingRect per contour → paint boxes,
reference: mars/components/PriorInformationRefinementModule.py:91-122 and
clip/model.py:10-37) with a jittable label-propagation kernel:

1. min-label propagation with pointer jumping — each round takes the min
   label over the 8-neighborhood and then compresses via ``label[label]``,
   converging in O(log n) rounds for any component shape;
2. per-component bounding boxes via segment min/max scatters;
3. the box-union indicator as one (n_labels, G) x (n_labels, G) matmul.

Everything is fixed-shape; no host sync anywhere.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


def _neighbor_min(lab: jnp.ndarray, big: jnp.ndarray) -> jnp.ndarray:
    """Min over the 3x3 neighborhood (8-connectivity, matching
    cv2.findContours component semantics) of a (H, W) label grid."""
    padded = jnp.pad(lab, 1, constant_values=big)
    h, w = lab.shape
    best = lab
    for dy in (-1, 0, 1):
        for dx in (-1, 0, 1):
            if dy == 0 and dx == 0:
                continue
            best = jnp.minimum(best, padded[1 + dy : 1 + dy + h, 1 + dx : 1 + dx + w])
    return best


@partial(jax.jit, static_argnums=(1,))
def label_components(fg: jnp.ndarray, num_iters: int = 20) -> jnp.ndarray:
    """8-connected component labels of a (H, W) bool grid.

    Returns int32 (H, W): for foreground pixels, the flat index of the
    component's minimum-index pixel; background pixels get H*W.
    ``num_iters`` rounds of propagate+pointer-jump; 20 covers any component
    on grids up to ~10^6 pixels (effective reach doubles per round).
    """
    h, w = fg.shape
    big = jnp.int32(h * w)
    idx = jnp.arange(h * w, dtype=jnp.int32).reshape(h, w)
    lab = jnp.where(fg, idx, big)

    def body(_, lab):
        nb = jnp.where(fg, _neighbor_min(lab, big), big)
        lab = jnp.minimum(lab, nb)
        # pointer jumping: follow the label to its own label
        flat = lab.reshape(-1)
        flat_ext = jnp.concatenate([flat, jnp.array([big], jnp.int32)])
        jumped = flat_ext[jnp.clip(flat, 0, h * w)]
        lab = jnp.where(fg, jnp.minimum(flat, jumped).reshape(h, w), big)
        return lab

    return jax.lax.fori_loop(0, num_iters, body, lab)


@jax.jit
def component_boxes_union(fg: jnp.ndarray) -> jnp.ndarray:
    """Union-of-component-bounding-boxes indicator, cv2-parity clamped.

    For each 8-connected component with bbox rows [r0, r1], cols [c0, c1]
    (inclusive), paints rows [r0, min(r1+1, H-1)) x cols [c0, min(c1+1, W-1))
    — reproducing the reference's ``x1 = min(x+w, W-1)`` clamp and
    exclusive-end paint (PriorInformationRefinementModule.py:61-63,114-120).

    Returns float32 (H, W) in {0, 1}.
    """
    h, w = fg.shape
    lab = label_components(fg)
    flat_lab = lab.reshape(-1)
    rows = (jnp.arange(h * w, dtype=jnp.int32) // w)
    cols = (jnp.arange(h * w, dtype=jnp.int32) % w)
    big = jnp.int32(1 << 30)

    n = h * w
    init_min = jnp.full((n + 1,), big, jnp.int32)
    init_max = jnp.full((n + 1,), -1, jnp.int32)
    r0 = init_min.at[flat_lab].min(jnp.where(flat_lab < n, rows, big))
    r1 = init_max.at[flat_lab].max(jnp.where(flat_lab < n, rows, -1))
    c0 = init_min.at[flat_lab].min(jnp.where(flat_lab < n, cols, big))
    c1 = init_max.at[flat_lab].max(jnp.where(flat_lab < n, cols, -1))
    r0, r1, c0, c1 = r0[:n], r1[:n], c0[:n], c1[:n]

    # cv2-parity exclusive ends with the edge clamp
    r_end = jnp.minimum(r1 + 1, h - 1)
    c_end = jnp.minimum(c1 + 1, w - 1)

    rr = jnp.arange(h, dtype=jnp.int32)
    cc = jnp.arange(w, dtype=jnp.int32)
    row_ind = (rr[None, :] >= r0[:, None]) & (rr[None, :] < r_end[:, None])  # (n, H)
    col_ind = (cc[None, :] >= c0[:, None]) & (cc[None, :] < c_end[:, None])  # (n, W)
    union = jnp.einsum(
        "kr,kc->rc", row_ind.astype(jnp.float32), col_ind.astype(jnp.float32)
    )
    return (union > 0).astype(jnp.float32)


def threshold_prior(prior: jnp.ndarray, threshold: float) -> jnp.ndarray:
    """cv2-parity binarization of a [0,1] score map: quantize to uint8
    (floor of prior*255), threshold strictly-greater at
    int(threshold * max) (reference _scoremap2bbox:96-102)."""
    q = jnp.clip(jnp.floor(prior * 255.0), 0, 255).astype(jnp.int32)
    t = jnp.floor(threshold * jnp.max(q).astype(jnp.float32)).astype(jnp.int32)
    return q > t


@partial(jax.jit, static_argnums=(2,))
def remove_small_regions(mask: jnp.ndarray, area_thresh: float, mode_holes: bool):
    """Drop small islands/fill small holes, matching
    segment_anything/utils/amg.py:274-299 (cv2.connectedComponentsWithStats):
    in 'holes' mode small background components become foreground; in
    'islands' mode small foreground components become background.
    Returns (mask, changed)."""
    working = (~mask) if mode_holes else mask
    lab = label_components(working)
    n = mask.shape[0] * mask.shape[1]
    sizes = jnp.zeros((n + 1,), jnp.int32).at[lab.reshape(-1)].add(1)
    # note: cv2 treats the area OUTSIDE as a component too; component ids here
    # are min-pixel indices, the "background of working" bucket is id n
    small = (sizes < area_thresh) & (jnp.arange(n + 1) < n)
    is_small = small[jnp.clip(lab, 0, n)]
    if_changed = jnp.any(is_small & working)
    new_working = working & ~is_small
    if not mode_holes:
        # keep-largest fallback (segment_anything/utils/amg.py:292-296): in
        # islands mode, if EVERY region is below threshold, keep the largest
        # one instead of emptying the mask.  Component ids are min-pixel
        # row-major indices — the same ordering as cv2 labels — so argmax's
        # first-max tie-break matches np.argmax(sizes) over cv2 stats.
        comp_sizes = jnp.where(jnp.arange(n + 1) < n, sizes, 0)
        largest = jnp.argmax(comp_sizes).astype(lab.dtype)
        all_small = ~jnp.any(new_working)
        new_working = jnp.where(all_small, working & (lab == largest), new_working)
    out = (~new_working) if mode_holes else new_working
    return out, if_changed
