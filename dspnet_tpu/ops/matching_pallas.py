"""Pallas TPU kernel: greedy bipartite anchor<->GT matching (phase 1 of
MultiBoxTarget).

The XLA formulation in ops/target.py runs the greedy loop as a
`lax.while_loop` whose every iteration re-reads the (A, L) IoU matrix from
HBM and pays dispatch latency — ~20 ms/step at A=12264. This kernel DMAs the
matrix into a single VMEM scratch once and runs the whole loop on-core with
a per-anchor row-max cache:

  per iteration
    1. global max + its first row from the packed row-max cache (49 KB scan);
    2. the winning GT = first max lane within that single row;
    3. row cleared with one dynamic row store; the GT column cleared and the
       row-max cache recomputed in one chunked read-modify-write pass over
       the matrix (chunking keeps vector temporaries ~1.5 MB so the whole
       kernel fits VMEM).

Semantics identical to ops/target._bipartite_match (and therefore to the
reference's row-major strictly-greater scan, multibox_target.cc:113-149):
repeated global argmax over available (anchor, gt) pairs with IoU > 1e-6,
ties to the smallest flat row-major index, each match consuming its anchor
row and GT column.

Layout: lanes = GT axis padded to 128's multiple (invalid columns poisoned
to -1 by the wrapper), sublanes = anchors padded to 128's multiple so the
row-max cache packs exactly into (A_pad/128, 128).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


from dspnet_tpu.ops.nms_pallas import _round_up  # noqa: E402


def _match_kernel(
    iou_hbm_ref, gt_ref, iou_out_ref, w_ref, rowmax_ref, sem, *, a_pad, l_pad, chunk
):
    b = pl.program_id(0)
    dma = pltpu.make_async_copy(iou_hbm_ref.at[b], w_ref, sem)
    dma.start()
    dma.wait()

    rows = a_pad // 128
    n_chunks = a_pad // chunk
    crows = chunk // 128  # packed row-max rows per chunk

    gt_ref[0] = jnp.full((rows, 128), -1.0, jnp.float32)
    iou_out_ref[0] = jnp.full((rows, 128), -1.0, jnp.float32)

    lane_idx_row = jax.lax.broadcasted_iota(jnp.int32, (1, l_pad), 1)
    pk_row = jax.lax.broadcasted_iota(jnp.int32, (rows, 128), 0)
    pk_lane = jax.lax.broadcasted_iota(jnp.int32, (rows, 128), 1)
    lane_big = jnp.int32(l_pad + 7)
    row_big = jnp.int32(a_pad + 7)

    # initial row-max cache
    for c in range(n_chunks):
        wch = w_ref[pl.ds(c * chunk, chunk), :]
        rowmax_ref[pl.ds(c * crows, crows), :] = jnp.max(wch, axis=1).reshape(crows, 128)

    def cond(carry):
        return carry[0]

    def body(carry):
        _, it = carry
        rm = rowmax_ref[:]
        m = jnp.max(rm)
        ok = m > 1e-6
        j = jnp.min(jnp.where(rm == m, pk_row * 128 + pk_lane, row_big))
        j = jnp.where(ok, j, 0)
        row_j = w_ref[pl.ds(j, 1), :]  # (1, l_pad)
        k = jnp.min(jnp.where(row_j == m, lane_idx_row, lane_big))

        hit = (pk_row == j // 128) & (pk_lane == j % 128) & ok
        gt_ref[0] = jnp.where(hit, k.astype(jnp.float32), gt_ref[0])
        iou_out_ref[0] = jnp.where(hit, m, iou_out_ref[0])

        @pl.when(ok)
        def _():
            # consume anchor row j, then GT column k chunk by chunk while
            # refreshing the row-max cache
            w_ref[pl.ds(j, 1), :] = jnp.full((1, l_pad), -1.0, jnp.float32)
            for c in range(n_chunks):
                wch = w_ref[pl.ds(c * chunk, chunk), :]
                wch = jnp.where(
                    jax.lax.broadcasted_iota(jnp.int32, (chunk, l_pad), 1) == k,
                    -1.0,
                    wch,
                )
                w_ref[pl.ds(c * chunk, chunk), :] = wch
                rowmax_ref[pl.ds(c * crows, crows), :] = jnp.max(wch, axis=1).reshape(
                    crows, 128
                )

        return ok, it + 1

    jax.lax.while_loop(cond, body, (jnp.array(True), jnp.int32(0)))


@functools.partial(jax.jit, static_argnames=("interpret",))
def bipartite_match_pallas(iou, col_valid, interpret: bool = False):
    """Batched greedy bipartite matching.

    iou: (B, A, L) f32; col_valid: (B, L) bool.
    Returns (matched (B, A) bool, match_gt (B, A) int32, match_iou (B, A) f32).
    """
    B, A, L = iou.shape
    a_pad = _round_up(A, 1024)
    l_pad = _round_up(L, 128)
    chunk = 1024
    w = jnp.where(col_valid[:, None, :], iou, -1.0)
    w = jnp.pad(w, ((0, 0), (0, a_pad - A), (0, l_pad - L)), constant_values=-1.0)
    rows = a_pad // 128

    # The IoU working matrix lives in one VMEM scratch; at vgg@512 anchor
    # counts (A=24576, l_pad=256 -> 25.2 MB) it exceeds Mosaic's default
    # 16 MB scoped-VMEM limit, so size the limit to the actual footprint
    # (v5e has 128 MB VMEM; found by the r4 preset smoke, vgg16_reduced@512).
    vmem_bytes = (a_pad * l_pad + 3 * rows * 128) * 4 + (1 << 22)

    kernel = functools.partial(_match_kernel, a_pad=a_pad, l_pad=l_pad, chunk=chunk)
    gt_packed, iou_packed = pl.pallas_call(
        kernel,
        grid=(B,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],  # stays in HBM
        out_specs=(
            pl.BlockSpec((1, rows, 128), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, rows, 128), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((B, rows, 128), jnp.float32),
            jax.ShapeDtypeStruct((B, rows, 128), jnp.float32),
        ),
        scratch_shapes=[
            pltpu.VMEM((a_pad, l_pad), jnp.float32),
            pltpu.VMEM((rows, 128), jnp.float32),
            pltpu.SemaphoreType.DMA(()),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=max(vmem_bytes, 16 * 2**20)
        ),
        interpret=interpret,
    )(w)
    match_gt = gt_packed.reshape(B, a_pad)[:, :A].astype(jnp.int32)
    match_iou = iou_packed.reshape(B, a_pad)[:, :A]
    return match_gt >= 0, match_gt, match_iou
