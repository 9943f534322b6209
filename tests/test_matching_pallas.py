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


def test_pallas_matching_vgg512_anchor_scale(rng):
    """A=24576 (the vgg@512 anchor count): the kernel's VMEM working set is
    25.2 MB there, past Mosaic's default 16 MB scoped-VMEM limit — the r4
    preset smoke caught the compile failure on v5e, fixed by sizing
    vmem_limit_bytes to the footprint. Interpret mode can't reproduce the
    VMEM limit, but this pins the large-A padding/chunking semantics."""
    B, A, L, num_gt = 1, 24576, 200, 9
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
    want_m, want_gt, want_iou, _ = _bipartite_match(iou[0], jnp.asarray(col_valid[0]))
    np.testing.assert_array_equal(np.asarray(got_m[0]), np.asarray(want_m))
    np.testing.assert_array_equal(np.asarray(got_gt[0]), np.asarray(want_gt))
    np.testing.assert_allclose(np.asarray(got_iou[0]), np.asarray(want_iou), rtol=1e-6)


def test_multibox_target_pallas_backend(rng):
    """Full multibox_target equivalence: bipartite_backend pallas vs xla."""
    from dspnet_tpu.ops.target import multibox_target

    B, A, L, C = 2, 150, 16, 9
    cx = rng.uniform(0.1, 0.9, (A,)); cy = rng.uniform(0.1, 0.9, (A,))
    w = rng.uniform(0.05, 0.3, (A,)); h = rng.uniform(0.05, 0.3, (A,))
    anchors = np.stack([cx - w/2, cy - h/2, cx + w/2, cy + h/2], -1).astype(np.float32)
    labels = np.full((B, L, 6), -1.0, np.float32)
    for b in range(B):
        n = rng.randint(1, 6)
        gx = rng.uniform(0.2, 0.8, n); gy = rng.uniform(0.2, 0.8, n)
        gw = rng.uniform(0.1, 0.3, n); gh = rng.uniform(0.1, 0.3, n)
        labels[b, :n] = np.stack([
            rng.randint(0, 8, n).astype(np.float32),
            gx - gw/2, gy - gh/2, gx + gw/2, gy + gh/2,
            rng.uniform(0, 1, n)], -1)
    cls_preds = rng.randn(B, C, A).astype(np.float32)

    args = (jnp.asarray(anchors), jnp.asarray(labels), jnp.asarray(cls_preds))
    kw = dict(overlap_threshold=0.5, negative_mining_ratio=3.0)
    want = multibox_target(*args, **kw)
    got = multibox_target(*args, bipartite_backend="pallas", **kw)
    for g, w_ in zip(got, want):
        np.testing.assert_allclose(np.asarray(g), np.asarray(w_), atol=1e-6)
