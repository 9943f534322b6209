"""Pallas TPU kernel: fused greedy-NMS keep-mask computation.

One kernel per batch element computes the full K x K IoU matrix, builds the
suppression matrix, and iterates the greedy fixpoint
``keep = valid & ~(keep @ S)`` entirely in VMEM — the MXU does the
(1, K) x (K, K) matvec each round, and no intermediate ever touches HBM.
This replaces the reference's per-batch CUDA block NMS
(multibox_detection.cu:53-140: atomicAdd compaction + in-kernel merge sort +
sequential suppression) with a fixed-shape formulation whose fixpoint equals
the sequential greedy result exactly (see ops/detection.py docstring).

K is padded to a multiple of 128 lanes; padded rows are invalid and cannot
suppress or survive.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def _nms_kernel(boxes_ref, ids_ref, valid_ref, out_ref, *, nms_threshold, force_suppress, k):
    boxes = boxes_ref[0]  # (K, 4)
    ids = ids_ref[0]  # (K, 128) broadcast-padded class ids (col 0 real)
    valid = valid_ref[0]  # (K, 128)

    x1 = boxes[:, 0]
    y1 = boxes[:, 1]
    x2 = boxes[:, 2]
    y2 = boxes[:, 3]
    iw = jnp.maximum(
        0.0, jnp.minimum(x2[:, None], x2[None, :]) - jnp.maximum(x1[:, None], x1[None, :])
    )
    ih = jnp.maximum(
        0.0, jnp.minimum(y2[:, None], y2[None, :]) - jnp.maximum(y1[:, None], y1[None, :])
    )
    inter = iw * ih
    area = (x2 - x1) * (y2 - y1)
    union = area[:, None] + area[None, :] - inter
    iou = jnp.where(union > 0.0, inter / jnp.where(union > 0.0, union, 1.0), 0.0)

    row = jax.lax.broadcasted_iota(jnp.int32, (k, k), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (k, k), 1)
    upper = row < col
    vcol = valid[:, 0]
    if force_suppress:
        class_ok = jnp.ones((k, k), jnp.float32) > 0.0
    else:
        idc = ids[:, 0]
        class_ok = idc[:, None] == idc[None, :]
    suppress = (
        upper & class_ok & (iou >= nms_threshold) & (vcol[:, None] > 0.0) & (vcol[None, :] > 0.0)
    )
    sup_f = suppress.astype(jnp.float32)

    def cond(state):
        _, changed = state
        return changed

    def body(state):
        keep, _ = state
        hit = jnp.dot(keep[None, :], sup_f, preferred_element_type=jnp.float32)[0]
        new_keep = jnp.where((vcol > 0.0) & (hit == 0.0), 1.0, 0.0)
        return new_keep, jnp.any(new_keep != keep)

    keep, _ = jax.lax.while_loop(cond, body, (vcol, jnp.array(True)))
    out_ref[0] = jnp.broadcast_to(keep[:, None], (k, 128))


@functools.partial(jax.jit, static_argnames=("nms_threshold", "force_suppress", "interpret"))
def nms_keep_mask(boxes, ids, valid, nms_threshold=0.5, force_suppress=False, interpret=False):
    """Batched keep mask. boxes (B, K, 4) f32, ids (B, K) f32 class ids,
    valid (B, K) bool -> keep (B, K) bool."""
    B, K, _ = boxes.shape
    kp = max(_round_up(K, 128), 128)
    pad = kp - K
    boxes_p = jnp.pad(boxes.astype(jnp.float32), ((0, 0), (0, pad), (0, 0)))
    ids_p = jnp.pad(ids.astype(jnp.float32), ((0, 0), (0, pad)), constant_values=-2.0)
    valid_p = jnp.pad(valid.astype(jnp.float32), ((0, 0), (0, pad)))
    # lane-broadcast the per-row scalars so every block is (K, 128)-tileable
    ids_b = jnp.broadcast_to(ids_p[..., None], (B, kp, 128))
    valid_b = jnp.broadcast_to(valid_p[..., None], (B, kp, 128))
    boxes_b = jnp.pad(boxes_p, ((0, 0), (0, 0), (0, 128 - 4)))

    kernel = functools.partial(
        _nms_kernel, nms_threshold=nms_threshold, force_suppress=force_suppress, k=kp
    )
    out = pl.pallas_call(
        kernel,
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, kp, 128), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, kp, 128), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, kp, 128), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, kp, 128), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, kp, 128), jnp.float32),
        interpret=interpret,
    )(boxes_b, ids_b, valid_b)
    return out[:, :K, 0] > 0.0
