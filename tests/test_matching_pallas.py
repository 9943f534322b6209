"""Pallas bipartite matching kernel vs the XLA reference (interpret mode)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from dspnet_tpu.ops import boxes as box_ops
from dspnet_tpu.ops.matching_pallas import bipartite_match_pallas
from dspnet_tpu.ops.target import _bipartite_match


@pytest.mark.parametrize("num_gt", [0, 1, 7, 16])
def test_pallas_matching_matches_xla(rng, num_gt):
    B, A, L = 2, 150, 16
    cx = rng.uniform(0.1, 0.9, (B, A)); cy = rng.uniform(0.1, 0.9, (B, A))
    w = rng.uniform(0.05, 0.3, (B, A)); h = rng.uniform(0.05, 0.3, (B, A))
    anchors = np.stack([cx - w/2, cy - h/2, cx + w/2, cy + h/2], -1).astype(np.float32)
    gx = rng.uniform(0.1, 0.9, (B, L)); gy = rng.uniform(0.1, 0.9, (B, L))
    gw = rng.uniform(0.05, 0.3, (B, L)); gh = rng.uniform(0.05, 0.3, (B, L))
    gts = np.stack([gx - gw/2, gy - gh/2, gx + gw/2, gy + gh/2], -1).astype(np.float32)
    col_valid = np.zeros((B, L), bool)
    col_valid[:, :num_gt] = True

    iou = jax.vmap(box_ops.iou_matrix)(jnp.asarray(anchors), jnp.asarray(gts))
    got_m, got_gt, got_iou = bipartite_match_pallas(
        iou, jnp.asarray(col_valid), interpret=True
    )
    for b in range(B):
        want_m, want_gt, want_iou, _ = _bipartite_match(iou[b], jnp.asarray(col_valid[b]))
        np.testing.assert_array_equal(np.asarray(got_m[b]), np.asarray(want_m))
        # unmatched entries: ours -1, reference -1 as well
        np.testing.assert_array_equal(np.asarray(got_gt[b]), np.asarray(want_gt))
        np.testing.assert_allclose(np.asarray(got_iou[b]), np.asarray(want_iou), rtol=1e-6)
