"""GradCAM attention visualization.

Counterpart of ``lavis/common/gradcam.py`` (unused in the RESSA path but
part of the library surface): relevance = ReLU(∂loss/∂attn ⊙ attn),
averaged over heads, reshaped onto the image patch grid and blended with
the input image."""

from __future__ import annotations

import numpy as np


def compute_gradcam_map(attn: np.ndarray, grad: np.ndarray,
                        patch_hw: int) -> np.ndarray:
    """(heads, q, k) attention + its gradient → (patch_hw, patch_hw)
    relevance over image patches (cls query row, patch key columns)."""
    rel = np.maximum(grad, 0) * attn
    rel = rel.mean(axis=0)               # avg heads → (q, k)
    cam = rel[0, 1: 1 + patch_hw * patch_hw]
    cam = cam.reshape(patch_hw, patch_hw)
    lo, hi = cam.min(), cam.max()
    return (cam - lo) / (hi - lo + 1e-8)


def getAttMap(img: np.ndarray, att_map: np.ndarray,
              blur: bool = True, overlap: bool = True) -> np.ndarray:
    """Blend a normalized attention map onto an HWC float image
    (reference gradcam.getAttMap signature)."""
    from PIL import Image

    h, w = img.shape[:2]
    amap = np.asarray(
        Image.fromarray((att_map * 255).astype(np.uint8)).resize(
            (w, h), Image.BICUBIC), np.float32) / 255.0
    if blur:
        from PIL import ImageFilter

        amap = np.asarray(
            Image.fromarray((amap * 255).astype(np.uint8)).filter(
                ImageFilter.GaussianBlur(radius=0.02 * max(h, w))),
            np.float32) / 255.0
    heat = np.stack([amap, np.zeros_like(amap), 1.0 - amap], axis=-1)
    if overlap:
        return (1 - amap[..., None]) * img + amap[..., None] * heat
    return heat
