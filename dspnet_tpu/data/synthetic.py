"""Synthetic Cityscapes-format fixtures.

The reference assumes the real Cityscapes download; for tests, demos and
benchmarks we synthesize a tiny dataset in the same on-disk contract:
JPEG street-ish images, gtFine-style trainId segmentation PNGs, disparity
PNGs (for the depth-eval oracle), and the (cls, corners, distance) label
matrix. Determinism: everything derives from a single numpy seed.
"""

from __future__ import annotations

import os
from typing import Tuple

import cv2
import numpy as np

from dspnet_tpu.data.cs_labels import DET_CLASSES
from dspnet_tpu.data.iterator import MAX_OBJECTS, Sample, SampleIndex

# disparity -> meters constant used across the reference
# (train/metric.py:222, data/cityscapes/disparity2distance.py:67)
DISPARITY_SCALE = 2200.0 * 75.0


def make_example(
    rng: np.random.RandomState, hw: Tuple[int, int], num_objects: int, num_classes: int = 8
):
    """Returns (img BGR uint8, label rows (n, 6) normalized, seg trainId uint8,
    disparity uint16)."""
    H, W = hw
    img = np.full((H, W, 3), 90, np.uint8)
    # sky / road bands give the seg head something learnable
    seg = np.full((H, W), 255, np.uint8)
    horizon = H // 3
    img[:horizon] = (200, 160, 120)
    seg[:horizon] = 10  # sky
    img[horizon:] = (60, 60, 60)
    seg[horizon:] = 0  # road
    disparity = np.zeros((H, W), np.uint16)
    far = DISPARITY_SCALE / 150.0
    disparity[:] = int(far)

    # fixed per-class BGR colors so the class is learnable from appearance
    class_colors = [
        (40, 40, 220), (40, 220, 220), (220, 40, 40), (220, 40, 220),
        (40, 220, 40), (220, 220, 40), (140, 40, 140), (40, 140, 220),
    ]
    rows = []
    for _ in range(num_objects):
        cls = rng.randint(0, num_classes)
        w = rng.randint(max(6, W // 16), max(8, W // 4))
        h = rng.randint(max(6, H // 16), max(8, H // 4))
        x1 = rng.randint(0, W - w)
        y1 = rng.randint(max(0, horizon - h // 2), H - h)
        # distance inversely tied to apparent size (learnable signal)
        dist_m = float(np.clip(30.0 * W / 8.0 / max(w, h), 5.0, 150.0))
        color = class_colors[cls % len(class_colors)]
        cv2.rectangle(img, (x1, y1), (x1 + w, y1 + h), color, -1)
        seg[y1 : y1 + h, x1 : x1 + w] = 13  # car trainId
        disparity[y1 : y1 + h, x1 : x1 + w] = int(DISPARITY_SCALE / dist_m)
        rows.append(
            [cls, x1 / W, y1 / H, (x1 + w) / W, (y1 + h) / H, min(1.0, dist_m / 255.0)]
        )
    label = np.asarray(rows, np.float32) if rows else np.zeros((0, 6), np.float32)
    return img, label, seg, disparity


def build_dataset(
    root: str,
    num_samples: int = 8,
    hw: Tuple[int, int] = (256, 512),
    max_objects: int = 6,
    seed: int = 233,
    with_disparity: bool = True,
    with_instances: bool = False,
) -> SampleIndex:
    """Write a synthetic dataset under ``root`` and return its SampleIndex.

    ``with_instances`` also writes gtFine-style ``*_instanceIds.png``
    (labelId*1000 + instance index per box, draw order = occlusion order)
    under SegmentationInstance/, for the instance-level evaluator."""
    rng = np.random.RandomState(seed)
    os.makedirs(os.path.join(root, "JPEGImages"), exist_ok=True)
    os.makedirs(os.path.join(root, "SegmentationClass"), exist_ok=True)
    if with_disparity:
        os.makedirs(os.path.join(root, "Disparity"), exist_ok=True)
    if with_instances:
        os.makedirs(os.path.join(root, "SegmentationInstance"), exist_ok=True)
    samples = []
    for i in range(num_samples):
        img, label, seg, disp = make_example(rng, hw, rng.randint(1, max_objects + 1))
        ipath = os.path.join(root, "JPEGImages", f"synth_{i:04d}_leftImg8bit.jpg")
        spath = os.path.join(root, "SegmentationClass", f"synth_{i:04d}_gtFine_labelTrainIds.png")
        cv2.imwrite(ipath, img, [cv2.IMWRITE_JPEG_QUALITY, 95])
        cv2.imwrite(spath, seg)
        if with_disparity:
            cv2.imwrite(os.path.join(root, "Disparity", f"synth_{i:04d}_disparity.png"), disp)
        if with_instances:
            from dspnet_tpu.data.cs_labels import name2label

            H, W = seg.shape
            inst = np.zeros((H, W), np.uint16)
            counts = [0] * len(DET_CLASSES)
            for row in label:
                cid = int(row[0])
                lid = name2label[DET_CLASSES[cid]].id
                x1, y1 = int(round(row[1] * W)), int(round(row[2] * H))
                x2, y2 = int(round(row[3] * W)), int(round(row[4] * H))
                inst[y1:y2, x1:x2] = lid * 1000 + counts[cid]
                counts[cid] += 1
            cv2.imwrite(os.path.join(
                root, "SegmentationInstance", f"synth_{i:04d}_gtFine_instanceIds.png"), inst)
        samples.append(Sample(ipath, SampleIndex.pad_label(label), spath))
    return SampleIndex(samples)


def class_names():
    return list(DET_CLASSES)
