"""Matcher/MARS internal-state visualization (host-side, matplotlib).

The reference dumps a 10-panel matplotlib figure of the matching pipeline's
internal state per episode (reference: matcher/Matcher.py:872-1037
``visualize_internal_state``).  This is the equivalent over the TPU
pipeline's output dicts: support/query images, matched points, priors,
top proposals, and the merged prediction.
"""
from __future__ import annotations

import os
from typing import Optional

import numpy as np


def plot_episode(
    out_path: str,
    query_img: np.ndarray,  # (H, W, 3) uint8/float
    support_img: Optional[np.ndarray] = None,
    support_mask: Optional[np.ndarray] = None,
    points: Optional[np.ndarray] = None,  # (L, 2)
    point_valid: Optional[np.ndarray] = None,
    vva: Optional[np.ndarray] = None,  # (g, g)
    vta: Optional[np.ndarray] = None,
    proposals: Optional[np.ndarray] = None,  # (P, H, W)
    proposal_valid: Optional[np.ndarray] = None,
    scores: Optional[np.ndarray] = None,
    merged: Optional[np.ndarray] = None,
    gt: Optional[np.ndarray] = None,
    title: str = "",
) -> str:
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    panels = []
    if support_img is not None:
        panels.append(("support", support_img, support_mask))
    panels.append(("query + points", query_img, None))
    if vva is not None:
        panels.append(("VVA prior", vva, None))
    if vta is not None:
        panels.append(("VTA prior", vta, None))
    if proposals is not None and proposal_valid is not None:
        order = (
            np.argsort(-scores)[: 4] if scores is not None
            else np.nonzero(proposal_valid)[0][:4]
        )
        for i, idx in enumerate(order):
            if proposal_valid[idx]:
                label = f"prop#{idx}"
                if scores is not None:
                    label += f" s={scores[idx]:.2f}"
                panels.append((label, proposals[idx], None))
    if merged is not None:
        panels.append(("merged", merged, None))
    if gt is not None:
        panels.append(("gt", gt, None))

    n = len(panels)
    cols = min(n, 5)
    rows = -(-n // cols)
    fig, axes = plt.subplots(rows, cols, figsize=(3.2 * cols, 3.2 * rows))
    axes = np.atleast_1d(axes).reshape(-1)
    for ax, (name, img, overlay) in zip(axes, panels):
        img = np.asarray(img)
        if img.ndim == 2:
            ax.imshow(img, cmap="viridis")
        else:
            disp = img if img.dtype == np.uint8 else np.clip(img, 0, 1)
            ax.imshow(disp)
        if overlay is not None:
            ax.imshow(np.asarray(overlay), alpha=0.4, cmap="Reds")
        if name.startswith("query") and points is not None:
            pv = point_valid if point_valid is not None else np.ones(len(points), bool)
            pts = np.asarray(points)[np.asarray(pv)]
            ax.scatter(pts[:, 0], pts[:, 1], s=8, c="red", marker="x")
        ax.set_title(name, fontsize=9)
        ax.axis("off")
    for ax in axes[n:]:
        ax.axis("off")
    if title:
        fig.suptitle(title)
    fig.tight_layout()
    os.makedirs(os.path.dirname(out_path) or ".", exist_ok=True)
    fig.savefig(out_path, dpi=110)
    plt.close(fig)
    return out_path


def plot_matcher_state(out_path: str, query_img, generate_out: dict, title: str = "") -> str:
    """Plot straight from matcher.generate_proposals output."""
    g = generate_out
    return plot_episode(
        out_path,
        query_img=np.asarray(query_img),
        points=np.asarray(g["points"]),
        point_valid=np.asarray(g["point_valid"]),
        proposals=np.asarray(g["proposal_masks"]),
        proposal_valid=np.asarray(g["proposal_valid"]),
        scores=np.asarray(g["emd_score"]),
        merged=np.asarray(g["merged"]),
        title=title,
    )


def pca_feature_map(patch_features: np.ndarray, grid: int, n_components: int = 3) -> np.ndarray:
    """(P, D) patch features → (grid, grid, 3) PCA false-color map
    (the reference's torch PCA feature visualization, utils/misc.py:221-360)."""
    x = np.asarray(patch_features, np.float64)
    x = x - x.mean(0, keepdims=True)
    # SVD-based PCA (features are small: 1369 x 1024)
    _, _, vt = np.linalg.svd(x, full_matrices=False)
    proj = x @ vt[:n_components].T  # (P, 3)
    lo, hi = proj.min(0), proj.max(0)
    rgb = (proj - lo) / np.maximum(hi - lo, 1e-9)
    return rgb.reshape(grid, grid, n_components).astype(np.float32)
