"""VOC segmentation palette utilities.

The reference ships `data/VOC2007/palette2grayscale.py` (and a VOC2012 twin)
to convert palette-indexed VOC SegmentationClass PNGs to grayscale class-id
images using the standard VOC colormap (reference
data/VOC2007/palette2grayscale.py:15-17). This is the working version of that
tool: the canonical bit-reversal colormap, palette->index and index->color
conversion, and a small CLI.

Usage::

    python -m dspnet_tpu.tools.voc_palette 000001.png 000001_index.png
    python -m dspnet_tpu.tools.voc_palette --colorize 000001_index.png out.png
"""

from __future__ import annotations

import argparse

import cv2
import numpy as np


def voc_palette(n: int = 256) -> np.ndarray:
    """The standard VOC colormap: (n, 3) uint8 RGB rows.

    Classic bit-reversal construction (each class id's bits are distributed
    across the RGB channels MSB-first) — the `getpalette` the reference tool
    imports (data/VOC2007/palette2grayscale.py:11,15)."""
    out = np.zeros((n, 3), np.uint8)
    for i in range(n):
        cid, r, g, b = i, 0, 0, 0
        for j in range(8):
            r |= ((cid >> 0) & 1) << (7 - j)
            g |= ((cid >> 1) & 1) << (7 - j)
            b |= ((cid >> 2) & 1) << (7 - j)
            cid >>= 3
        out[i] = (r, g, b)
    return out


def palette_to_index(rgb: np.ndarray, n: int = 256) -> np.ndarray:
    """(H, W, 3) RGB colormap image -> (H, W) uint8 class indices.

    Unknown colors (e.g. the 224,224,192 'void' boundary) map to 255."""
    pal = voc_palette(n)
    h, w = rgb.shape[:2]
    flat = rgb.reshape(-1, 3)
    # pack RGB into one int for a vectorized dict-free lookup
    key = (flat[:, 0].astype(np.int32) << 16) | (flat[:, 1].astype(np.int32) << 8) \
        | flat[:, 2].astype(np.int32)
    pal_key = (pal[:, 0].astype(np.int32) << 16) | (pal[:, 1].astype(np.int32) << 8) \
        | pal[:, 2].astype(np.int32)
    sort = np.argsort(pal_key)
    pos = np.searchsorted(pal_key[sort], key)
    pos = np.clip(pos, 0, n - 1)
    hit = pal_key[sort][pos] == key
    idx = np.where(hit, sort[pos], 255).astype(np.uint8)
    return idx.reshape(h, w)


def index_to_palette(idx: np.ndarray, n: int = 256) -> np.ndarray:
    """(H, W) class indices -> (H, W, 3) RGB colormap image."""
    return voc_palette(n)[idx]


def main(argv=None):
    p = argparse.ArgumentParser(description="VOC palette <-> class-index PNGs.")
    p.add_argument("src")
    p.add_argument("dst")
    p.add_argument("--colorize", action="store_true",
                   help="index -> color (default: color -> index)")
    args = p.parse_args(argv)
    if args.colorize:
        idx = cv2.imread(args.src, cv2.IMREAD_GRAYSCALE)
        rgb = index_to_palette(idx)
        cv2.imwrite(args.dst, rgb[:, :, ::-1])  # RGB -> BGR for cv2
    else:
        bgr = cv2.imread(args.src, cv2.IMREAD_COLOR)
        idx = palette_to_index(bgr[:, :, ::-1])
        cv2.imwrite(args.dst, idx)


if __name__ == "__main__":
    main()
