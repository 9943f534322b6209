"""Property tests: JAX ops vs numpy oracles transcribed from the reference C++."""

import numpy as np
import pytest

import jax.numpy as jnp

from dspnet_tpu.ops import anchors as anchor_ops
from dspnet_tpu.ops import boxes as box_ops
from dspnet_tpu.ops import detection as det_ops
from dspnet_tpu.ops import nms as nms_ops
from dspnet_tpu.ops import target as target_ops

from tests import oracles


# ---------------------------------------------------------------- anchors

RESNET50_512 = dict(
    feat_shapes=[(32, 64), (16, 32), (8, 16), (4, 8), (2, 4), (1, 2)],
    sizes=[[.1, .141], [.2, .272], [.37, .447], [.54, .619], [.71, .79], [.88, .961]],
    ratios=[[1, 2, .5], [1, 2, .5, 3, 1. / 3], [1, 2, .5, 3, 1. / 3],
            [1, 2, .5, 3, 1. / 3], [1, 2, .5], [1, 2, .5]],
)


@pytest.mark.parametrize(
    "fh,fw,sizes,ratios,steps,clip",
    [
        (4, 8, [0.2, 0.3], [1, 2, 0.5], (-1, -1), False),
        (3, 3, [0.5], [1.0], (-1, -1), True),
        (2, 5, [0.1, 0.141], [1, 2, 0.5, 3, 1.0 / 3], (0.25, 0.125), False),
        (1, 2, [0.88, 0.961], [1, 2, 0.5], (-1, -1), False),
        # mixed-sign steps: C++ resets BOTH to 1/f (multibox_prior-inl.h)
        (4, 6, [0.3], [1, 2], (0.5, -1.0), False),
    ],
)
def test_multibox_prior_matches_oracle(fh, fw, sizes, ratios, steps, clip):
    got = anchor_ops.multibox_prior(fh, fw, sizes, ratios, steps, clip=clip)
    want = oracles.multibox_prior_oracle(fh, fw, sizes, ratios, steps, clip=clip)
    np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-7)


def test_total_anchor_count_matches_reference_shape_table():
    """utils.py:37 — resnet-50 @ 512x1024 has 12264 anchors; :35 — 4822 @320x640."""
    a = anchor_ops.anchors_for_config(**RESNET50_512)
    assert a.shape == (12264, 4)
    shapes_320 = [(20, 40), (10, 20), (5, 10), (3, 5), (2, 3), (1, 2)]
    a320 = anchor_ops.anchors_for_config(
        feat_shapes=shapes_320, sizes=RESNET50_512["sizes"], ratios=RESNET50_512["ratios"]
    )
    assert a320.shape == (4822, 4)


# ---------------------------------------------------------------- box math


def _random_corners(rng, n):
    cx = rng.uniform(0.05, 0.95, n)
    cy = rng.uniform(0.05, 0.95, n)
    w = rng.uniform(0.02, 0.5, n)
    h = rng.uniform(0.02, 0.5, n)
    return np.stack([cx - w / 2, cy - h / 2, cx + w / 2, cy + h / 2], -1).astype(np.float32)


def test_iou_matrix(rng):
    a = _random_corners(rng, 17)
    b = _random_corners(rng, 9)
    got = np.asarray(box_ops.iou_matrix(jnp.asarray(a), jnp.asarray(b)))
    want = np.array([[oracles._iou(x, y) for y in b] for x in a])
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_encode_decode_roundtrip(rng):
    anchors = _random_corners(rng, 50)
    gt = _random_corners(rng, 50)
    dist = rng.uniform(0, 1, 50).astype(np.float32)
    enc = box_ops.encode_targets(jnp.asarray(anchors), jnp.asarray(gt), jnp.asarray(dist))
    dec_boxes, dec_dist = box_ops.decode_locations(jnp.asarray(anchors), enc, clip=False)
    np.testing.assert_allclose(np.asarray(dec_boxes), gt, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(dec_dist), dist, rtol=1e-4, atol=1e-5)


# ---------------------------------------------------------------- target


def _make_labels(rng, B, L, num_obj, num_classes):
    labels = np.full((B, L, 6), -1.0, np.float32)
    for b in range(B):
        n = num_obj if np.isscalar(num_obj) else num_obj[b]
        if n == 0:
            continue
        boxes = _random_corners(rng, n)
        labels[b, :n, 0] = rng.randint(0, num_classes, n)
        labels[b, :n, 1:5] = np.clip(boxes, 0, 1)
        labels[b, :n, 5] = rng.uniform(0, 1, n)
    return labels


@pytest.mark.parametrize("mining", [-1.0, 3.0])
@pytest.mark.parametrize("num_obj", [0, 1, 5, 12])
def test_multibox_target_matches_oracle(rng, mining, num_obj):
    A, L, B, C = 120, 16, 2, 9
    anchors = oracles.multibox_prior_oracle(5, 6, [0.2, 0.4], [1, 2, 0.5, 3])
    anchors = anchors[:A]
    labels = _make_labels(rng, B, L, num_obj, C - 1)
    cls_preds = rng.randn(B, C, A).astype(np.float32)

    got = target_ops.multibox_target(
        jnp.asarray(anchors), jnp.asarray(labels), jnp.asarray(cls_preds),
        overlap_threshold=0.5, negative_mining_ratio=mining, negative_mining_thresh=0.5,
    )
    want = oracles.multibox_target_oracle(
        anchors, labels, cls_preds,
        overlap_threshold=0.5, negative_mining_ratio=mining, negative_mining_thresh=0.5,
    )
    np.testing.assert_array_equal(np.asarray(got[2]), want[2])  # cls_target
    np.testing.assert_array_equal(np.asarray(got[1]), want[1])  # loc_mask
    np.testing.assert_allclose(np.asarray(got[0]), want[0], rtol=1e-3, atol=5e-4)


def test_multibox_target_no_gt_all_ignore(rng):
    """Zero valid GT -> everything stays at init (cc:107, -inl.h:121-123)."""
    anchors = _random_corners(rng, 30)
    labels = np.full((1, 8, 6), -1.0, np.float32)
    cls_preds = rng.randn(1, 4, 30).astype(np.float32)
    loc_t, mask, cls_t = target_ops.multibox_target(
        jnp.asarray(anchors), jnp.asarray(labels), jnp.asarray(cls_preds),
        negative_mining_ratio=3.0,
    )
    assert np.all(np.asarray(cls_t) == -1.0)
    assert np.all(np.asarray(mask) == 0.0)
    assert np.all(np.asarray(loc_t) == 0.0)


# ---------------------------------------------------------------- detection


@pytest.mark.parametrize("force", [False, True])
@pytest.mark.parametrize("nms_thresh", [0.5, 0.45])
def test_multibox_detection_matches_oracle(rng, force, nms_thresh):
    B, C, A = 2, 5, 64
    anchors = _random_corners(rng, A)
    logits = rng.randn(B, C, A).astype(np.float32) * 2
    cls_prob = np.exp(logits) / np.exp(logits).sum(1, keepdims=True)
    loc_pred = (rng.randn(B, A, 5) * 0.3).astype(np.float32)

    got = np.asarray(
        det_ops.multibox_detection(
            jnp.asarray(cls_prob), jnp.asarray(loc_pred), jnp.asarray(anchors),
            threshold=0.3, nms_threshold=nms_thresh, force_suppress=force, nms_topk=A,
        )
    )
    want = oracles.multibox_detection_oracle(
        cls_prob, loc_pred, anchors,
        threshold=0.3, nms_threshold=nms_thresh, force_suppress=force, nms_topk=A,
    )
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_multibox_detection_topk_prefix(rng):
    """With topk < valid_count our output must equal the oracle's sorted+NMS'd
    top-K prefix (the documented deviation only affects the dropped tail)."""
    B, C, A, K = 1, 3, 48, 8
    anchors = _random_corners(rng, A)
    logits = rng.randn(B, C, A).astype(np.float32)
    cls_prob = np.exp(logits) / np.exp(logits).sum(1, keepdims=True)
    loc_pred = np.zeros((B, A, 5), np.float32)
    # NMS keep decisions for prefix rows depend only on earlier prefix rows,
    # so the oracle's first K rows are comparable even when valid_count > K.
    got = np.asarray(
        det_ops.multibox_detection(
            jnp.asarray(cls_prob), jnp.asarray(loc_pred), jnp.asarray(anchors),
            threshold=0.0, nms_threshold=0.5, nms_topk=K,
        )
    )
    want = oracles.multibox_detection_oracle(
        cls_prob, loc_pred, anchors, threshold=0.0, nms_threshold=0.5, nms_topk=K,
    )
    np.testing.assert_allclose(got[:, :K], want[:, :K], rtol=1e-4, atol=1e-5)


def test_multibox_detection_nms_disabled_matches_oracle(rng):
    """nms_threshold <= 0: reference skips sort/top-K/NMS entirely
    (multibox_detection.cc:130-133) — all rows compacted in anchor order."""
    B, C, A = 2, 4, 40
    anchors = _random_corners(rng, A)
    logits = rng.randn(B, C, A).astype(np.float32)
    cls_prob = np.exp(logits) / np.exp(logits).sum(1, keepdims=True)
    loc_pred = (rng.randn(B, A, 5) * 0.2).astype(np.float32)
    got = np.asarray(
        det_ops.multibox_detection(
            jnp.asarray(cls_prob), jnp.asarray(loc_pred), jnp.asarray(anchors),
            threshold=0.3, nms_threshold=-1.0, nms_topk=5,  # topk must be moot
        )
    )
    want = oracles.multibox_detection_oracle(
        cls_prob, loc_pred, anchors, threshold=0.3, nms_threshold=-1.0, nms_topk=5,
    )
    assert got.shape == (B, A, 7)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_multibox_target_zero_overlap_threshold_bipartite_only(rng):
    """overlap_threshold <= 0 gates off threshold matching entirely
    (multibox_target.cc:151) — only bipartite matches become positive."""
    A, L, B, C = 80, 8, 2, 5
    anchors = _random_corners(rng, A)
    labels = _make_labels(rng, B, L, 4, C - 1)
    cls_preds = rng.randn(B, C, A).astype(np.float32)
    got = target_ops.multibox_target(
        jnp.asarray(anchors), jnp.asarray(labels), jnp.asarray(cls_preds),
        overlap_threshold=0.0, negative_mining_ratio=3.0,
    )
    want = oracles.multibox_target_oracle(
        anchors, labels, cls_preds, overlap_threshold=0.0,
        negative_mining_ratio=3.0,
    )
    np.testing.assert_array_equal(np.asarray(got[2]), want[2])
    np.testing.assert_array_equal(np.asarray(got[1]), want[1])
    # at most one bipartite positive per valid GT
    assert (np.asarray(got[2]) > 0).sum() <= 2 * 4


# ---------------------------------------------------------------- plain NMS


def test_standalone_nms_matches_reference_semantics(rng):
    n = 40
    boxes = _random_corners(rng, n) * 100
    # distinct scores so the unstable reference sort is deterministic
    scores = rng.permutation(n).astype(np.float32) / n
    dets = np.concatenate([boxes, scores[:, None]], -1).astype(np.float32)
    keep_np = nms_ops.nms(dets, 0.5)
    # re-run the documented reference algorithm inline as oracle
    ref = []
    x1, y1, x2, y2, s = dets[:, 0], dets[:, 1], dets[:, 2], dets[:, 3], dets[:, 4]
    areas = (x2 - x1 + 1) * (y2 - y1 + 1)
    order = s.argsort()[::-1]
    while order.size > 0:
        i = order[0]
        ref.append(int(i))
        xx1 = np.maximum(x1[i], x1[order[1:]])
        yy1 = np.maximum(y1[i], y1[order[1:]])
        xx2 = np.minimum(x2[i], x2[order[1:]])
        yy2 = np.minimum(y2[i], y2[order[1:]])
        w = np.maximum(0.0, xx2 - xx1 + 1)
        h = np.maximum(0.0, yy2 - yy1 + 1)
        ovr = w * h / (areas[i] + areas[order[1:]] - w * h)
        order = order[np.where(ovr <= 0.5)[0] + 1]
    assert keep_np == ref

    keep_mask = np.asarray(nms_ops.nms_jax(dets, 0.5))
    assert sorted(keep_np) == sorted(np.nonzero(keep_mask)[0].tolist())


def test_bbox_overlaps(rng):
    a = _random_corners(rng, 12) * 50
    b = _random_corners(rng, 7) * 50
    got = nms_ops.bbox_overlaps(a, b)
    # inline sequential oracle (bbox.pyx:33-54)
    want = np.zeros((12, 7))
    for k in range(7):
        qa = (b[k, 2] - b[k, 0] + 1) * (b[k, 3] - b[k, 1] + 1)
        for n in range(12):
            iw = min(a[n, 2], b[k, 2]) - max(a[n, 0], b[k, 0]) + 1
            if iw > 0:
                ih = min(a[n, 3], b[k, 3]) - max(a[n, 1], b[k, 1]) + 1
                if ih > 0:
                    ua = (a[n, 2] - a[n, 0] + 1) * (a[n, 3] - a[n, 1] + 1) + qa - iw * ih
                    want[n, k] = iw * ih / ua
    np.testing.assert_allclose(got, want, rtol=1e-6)
