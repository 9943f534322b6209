"""Corner-format box math: IoU, SSD target encode / decode (jnp, fixed shape).

Encoding contract (reference operator/multibox_target.cc:31-56):

    tx = (gx - ax) / aw / vx          ty = (gy - ay) / ah / vy
    tw = log(gw / aw) / vw            th = log(gh / ah) / vh
    tz = gz / 0.1                     (per-box distance channel, DSPNet's 5th)

Decoding contract (reference operator/multibox_detection.cc:102-125):

    ox = px * vx * aw + ax            ow = exp(pw * vw) * aw / 2
    oy = py * vy * ah + ay            oh = exp(ph * vh) * ah / 2
    corners = (ox - ow, oy - oh, ox + ow, oy + oh), oz = pz * 0.1
    optionally clipped into [0, 1].

IoU contract: intersection = max(0, min(r) - max(l)) * max(0, min(b) - max(t));
union = areaA + areaB - I with a zero-denominator guard
(multibox_target-inl.h:44-50,154-161; multibox_detection.cc:45-51).
"""

from __future__ import annotations

import jax.numpy as jnp

DEFAULT_VARIANCES = (0.1, 0.1, 0.2, 0.2)
DISTANCE_VARIANCE = 0.1


def corner_to_center(boxes):
    """(..., 4) corners -> (cx, cy, w, h)."""
    xmin, ymin, xmax, ymax = jnp.split(boxes, 4, axis=-1)
    w = xmax - xmin
    h = ymax - ymin
    cx = (xmin + xmax) * 0.5
    cy = (ymin + ymax) * 0.5
    return jnp.concatenate([cx, cy, w, h], axis=-1)


def iou_matrix(a, b):
    """Pairwise IoU between ``a`` (..., N, 4) and ``b`` (..., M, 4) corners.

    Zero or negative union maps to IoU 0 (safe_divide semantics of the
    reference, multibox_target-inl.h:44-50).
    """
    a_ = a[..., :, None, :]
    b_ = b[..., None, :, :]
    iw = jnp.maximum(0.0, jnp.minimum(a_[..., 2], b_[..., 2]) - jnp.maximum(a_[..., 0], b_[..., 0]))
    ih = jnp.maximum(0.0, jnp.minimum(a_[..., 3], b_[..., 3]) - jnp.maximum(a_[..., 1], b_[..., 1]))
    inter = iw * ih
    area_a = (a_[..., 2] - a_[..., 0]) * (a_[..., 3] - a_[..., 1])
    area_b = (b_[..., 2] - b_[..., 0]) * (b_[..., 3] - b_[..., 1])
    union = area_a + area_b - inter
    return jnp.where(union > 0.0, inter / jnp.where(union > 0.0, union, 1.0), 0.0)


def encode_targets(anchors, gt_boxes, gt_dist, variances=DEFAULT_VARIANCES):
    """Encode matched GT (corners + distance) against anchors.

    anchors:  (..., A, 4) corners
    gt_boxes: (..., A, 4) matched GT corners per anchor
    gt_dist:  (..., A)    matched GT distance per anchor
    returns   (..., A, 5) regression targets [tx, ty, tw, th, tz].
    """
    vx, vy, vw, vh = variances
    aw = anchors[..., 2] - anchors[..., 0]
    ah = anchors[..., 3] - anchors[..., 1]
    ax = (anchors[..., 0] + anchors[..., 2]) * 0.5
    ay = (anchors[..., 1] + anchors[..., 3]) * 0.5
    gw = gt_boxes[..., 2] - gt_boxes[..., 0]
    gh = gt_boxes[..., 3] - gt_boxes[..., 1]
    gx = (gt_boxes[..., 0] + gt_boxes[..., 2]) * 0.5
    gy = (gt_boxes[..., 1] + gt_boxes[..., 3]) * 0.5
    tx = (gx - ax) / aw / vx
    ty = (gy - ay) / ah / vy
    # guard: for unmatched anchors gw/gh may be <= 0; callers mask the result.
    tw = jnp.log(jnp.maximum(gw, 1e-12) / aw) / vw
    th = jnp.log(jnp.maximum(gh, 1e-12) / ah) / vh
    tz = gt_dist / DISTANCE_VARIANCE
    return jnp.stack([tx, ty, tw, th, tz], axis=-1)


def decode_locations(anchors, loc_pred, variances=DEFAULT_VARIANCES, clip=True):
    """Inverse transform: (..., A, 5) loc predictions -> corners + distance.

    Returns ``(boxes (..., A, 4), dist (..., A))``; if ``clip`` both are
    clamped into [0, 1] (multibox_detection.cc:121-125).
    """
    vx, vy, vw, vh = variances
    aw = anchors[..., 2] - anchors[..., 0]
    ah = anchors[..., 3] - anchors[..., 1]
    ax = (anchors[..., 0] + anchors[..., 2]) * 0.5
    ay = (anchors[..., 1] + anchors[..., 3]) * 0.5
    px, py, pw, ph, pz = (loc_pred[..., i] for i in range(5))
    ox = px * vx * aw + ax
    oy = py * vy * ah + ay
    ow = jnp.exp(pw * vw) * aw * 0.5
    oh = jnp.exp(ph * vh) * ah * 0.5
    oz = pz * DISTANCE_VARIANCE
    boxes = jnp.stack([ox - ow, oy - oh, ox + ow, oy + oh], axis=-1)
    if clip:
        boxes = jnp.clip(boxes, 0.0, 1.0)
        oz = jnp.clip(oz, 0.0, 1.0)
    return boxes, oz
