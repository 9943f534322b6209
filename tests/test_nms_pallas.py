"""Pallas NMS kernel vs the XLA fixpoint reference (interpret mode on CPU)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from dspnet_tpu.ops.detection import _nms_fixpoint
from dspnet_tpu.ops.nms_pallas import nms_keep_mask
from dspnet_tpu.ops import boxes as box_ops


def _random_rows(rng, B, K):
    cx = rng.uniform(0.1, 0.9, (B, K))
    cy = rng.uniform(0.1, 0.9, (B, K))
    w = rng.uniform(0.05, 0.4, (B, K))
    h = rng.uniform(0.05, 0.4, (B, K))
    boxes = np.stack([cx - w / 2, cy - h / 2, cx + w / 2, cy + h / 2], -1).astype(np.float32)
    ids = rng.randint(0, 3, (B, K)).astype(np.float32)
    valid = rng.rand(B, K) > 0.2
    ids = np.where(valid, ids, -1.0)
    return boxes, ids, valid


@pytest.mark.parametrize("force", [False, True])
def test_pallas_nms_matches_xla(rng, force):
    B, K = 3, 50
    boxes, ids, valid = _random_rows(rng, B, K)
    got = np.asarray(
        nms_keep_mask(
            jnp.asarray(boxes), jnp.asarray(ids), jnp.asarray(valid),
            nms_threshold=0.5, force_suppress=force, interpret=True,
        )
    )
    for b in range(B):
        iou = box_ops.iou_matrix(jnp.asarray(boxes[b]), jnp.asarray(boxes[b]))
        row = jnp.arange(K)
        upper = row[:, None] < row[None, :]
        class_ok = (
            jnp.ones((K, K), bool) if force else jnp.asarray(ids[b])[:, None] == jnp.asarray(ids[b])[None, :]
        )
        suppress = (
            upper & class_ok & (iou >= 0.5)
            & jnp.asarray(valid[b])[:, None] & jnp.asarray(valid[b])[None, :]
        )
        want = np.asarray(_nms_fixpoint(jnp.asarray(valid[b]), suppress))
        np.testing.assert_array_equal(got[b], want)
