"""Standalone image helpers (reference tools/image_processing.py:4-96).

The reference ships these four functions unused by any other module; they
are kept here for API completeness with the same contracts: short-side
rescale with a long-side cap, free resize, BGR->mean-subtracted CHW RGB
tensor, and its inverse.
"""

from __future__ import annotations

import cv2
import numpy as np


def rescale(im: np.ndarray, target_size: int, max_size: int):
    """Resize so the short side hits target_size, capping the long side at
    max_size; returns (image, scale) (reference tools/image_processing.py:4-29)."""
    im_size_min = np.min(im.shape[0:2])
    im_size_max = np.max(im.shape[0:2])
    im_scale = float(target_size) / float(im_size_min)
    if np.round(im_scale * im_size_max) > max_size:
        im_scale = float(max_size) / float(im_size_max)
    out = cv2.resize(im, None, None, fx=im_scale, fy=im_scale,
                     interpolation=cv2.INTER_LINEAR)
    return out, im_scale


def resize(im: np.ndarray, target_size, interp_method=cv2.INTER_LINEAR):
    """Resize to (h, w) regardless of aspect ratio (image_processing.py:31-45)."""
    h, w = target_size
    return cv2.resize(im, (w, h), interpolation=interp_method)


def transform(im: np.ndarray, pixel_means) -> np.ndarray:
    """BGR HWC -> (3, H, W) float: RGB reorder, subtract RGB means, CHW
    (image_processing.py:47-70)."""
    im = im[:, :, ::-1].astype(float) - np.asarray(pixel_means, float)
    return im.transpose(2, 0, 1)


def transform_inverse(im_tensor: np.ndarray, pixel_means) -> np.ndarray:
    """(1, 3, H, W) tensor -> RGB HWC float with means added back
    (image_processing.py:73-96)."""
    assert im_tensor.shape[0] == 1
    im = im_tensor.transpose(0, 2, 3, 1)[0]
    assert im.shape[2] == 3
    return im + np.asarray(pixel_means, float)
