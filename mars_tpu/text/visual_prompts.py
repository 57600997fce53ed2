"""Visual-prompt drawing for VLM queries (host-side, cv2).

Functional parity with the reference's generator family
(reference: mars/components/VisualPromptGenerator.py:6-301): mask fill,
bounding box, mask contour, and ellipse overlays with alpha blending and
optional zoom-crop around the masked object.  This stage only feeds the VLM
(a host-side model), so it deliberately stays on the host — it never touches
the device compute path.
"""
from __future__ import annotations

import numpy as np

try:
    import cv2
except ImportError:  # pragma: no cover
    cv2 = None


def zoom_on_masked_object(image: np.ndarray, mask: np.ndarray, zoom_percent: int) -> np.ndarray:
    """Crop around the mask's bounding box scaled by 100/zoom_percent and
    resize back (reference :45-104)."""
    if zoom_percent <= 0:
        return image
    m = (mask.reshape(mask.shape[:2]) > 0).astype(np.uint8)
    contours, _ = cv2.findContours(m, cv2.RETR_EXTERNAL, cv2.CHAIN_APPROX_SIMPLE)
    if not contours:
        return image
    x, y, w, h = cv2.boundingRect(np.concatenate(contours))
    cx, cy = x + w // 2, y + h // 2
    nw = min(int(w * (100 / zoom_percent)), image.shape[1])
    nh = min(int(h * (100 / zoom_percent)), image.shape[0])
    nx = max(0, cx - nw // 2)
    ny = max(0, cy - nh // 2)
    nx = min(nx, image.shape[1] - nw)
    ny = min(ny, image.shape[0] - nh)
    cropped = image[ny : ny + nh, nx : nx + nw]
    return cv2.resize(cropped, (image.shape[1], image.shape[0]), interpolation=cv2.INTER_LINEAR)


def draw_mask(image, mask, color=(255, 0, 0), alpha=0.5, thickness=2, zoom_percent=0):
    """alpha-blended mask fill (reference MaskGenerator :106-152)."""
    m = (mask > 0).astype(float)[..., None]
    color_mask = m * np.array(color)
    composite = alpha * color_mask + (1 - alpha) * image
    out = np.where(m, composite, image).astype(np.uint8)
    return zoom_on_masked_object(out, m, zoom_percent)


def _blend_overlay(image, overlay, alpha):
    return cv2.addWeighted(overlay, alpha, image, 1 - alpha, 0)


def draw_bbox(image, mask, color=(255, 0, 0), alpha=0.5, thickness=2, zoom_percent=0):
    """per-contour bounding boxes (reference BoundingBoxGenerator :154-199)."""
    m = (mask > 0).astype(np.uint8)
    contours, _ = cv2.findContours(m, cv2.RETR_EXTERNAL, cv2.CHAIN_APPROX_SIMPLE)
    overlay = image.copy()
    for c in contours:
        x, y, w, h = cv2.boundingRect(c)
        cv2.rectangle(overlay, (x, y), (x + w, y + h), color, thickness)
    return zoom_on_masked_object(_blend_overlay(image, overlay, alpha), m, zoom_percent)


def draw_contour(image, mask, color=(255, 0, 0), alpha=0.5, thickness=2, zoom_percent=0):
    """mask contours (reference MaskContourGenerator :201-244; the default
    MARS prompt type, scripts/coco_1shot.sh --prompt_type contour)."""
    m = (mask > 0).astype(np.uint8)
    contours, _ = cv2.findContours(m, cv2.RETR_EXTERNAL, cv2.CHAIN_APPROX_SIMPLE)
    overlay = image.copy()
    cv2.drawContours(overlay, contours, -1, color, thickness)
    return zoom_on_masked_object(_blend_overlay(image, overlay, alpha), m, zoom_percent)


def draw_ellipse(image, mask, color=(255, 0, 0), alpha=0.5, thickness=2, zoom_percent=0):
    """rotated ellipses 1.2x the min-area rect (reference EllipseGenerator
    :247-301)."""
    m = (mask > 0).astype(np.uint8)
    contours, _ = cv2.findContours(m, cv2.RETR_EXTERNAL, cv2.CHAIN_APPROX_SIMPLE)
    overlay = image.copy()
    for c in contours:
        (cx, cy), axes, angle = cv2.minAreaRect(c)
        ax = (axes[0] * 1.2, axes[1] * 1.2)
        cv2.ellipse(overlay, (int(cx), int(cy)), (int(ax[0] // 2), int(ax[1] // 2)),
                    angle, 0, 360, color, thickness)
    return zoom_on_masked_object(_blend_overlay(image, overlay, alpha), m, zoom_percent)


GENERATORS = {
    "mask": draw_mask,
    "bb": draw_bbox,
    "contour": draw_contour,
    "ellipse": draw_ellipse,
}
