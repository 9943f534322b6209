"""Shared benchmarking helpers — the axon-safe timing harness and the
canonical synthetic train batch.

The timing pattern encodes an axon-specific correctness rule
(.claude/skills/verify/SKILL.md): ``jax.block_until_ready`` does not
reliably synchronize over the remote-TPU tunnel, so measurements chain a
scalar accumulator through every iteration and force a host transfer at
the window edges; the warmup MUST include the accumulator add itself or
its one-time compile (~400 ms) silently inflates every timed iteration.
"""

from __future__ import annotations

import time


def timed(fn, *args, n: int = 20, warmup: int = 3) -> float:
    """Mean seconds/call of ``fn(*args)`` (which must return a scalar)."""
    import jax.numpy as jnp

    acc = jnp.float32(0)
    for _ in range(warmup):
        acc = acc + fn(*args)
    float(acc)
    acc = jnp.float32(0)
    t0 = time.perf_counter()
    for _ in range(n):
        acc = acc + fn(*args)
    float(acc)
    return (time.perf_counter() - t0) / n


def canonical_train_batch(B: int = 4, H: int = 512, W: int = 1024, seed: int = 0,
                          pre_s2d: bool = False):
    """Device-resident synthetic multitask batch at the canonical training
    config (8 random boxes/image, 19-class seg labels) — shared by
    bench.py's train mode and the profiling/A-B scripts so the workload is
    identical across them.

    ``pre_s2d``: deliver the image as its space-to-depth transform
    ([B, H/2, W/2, 12], the loaders' ``--input-s2d`` contract) so the step
    graph contains no input relayout (models/resnet.py stem)."""
    import jax
    import numpy as np

    rng = np.random.RandomState(seed)
    lab = np.full((B, 200, 6), -1, np.float32)
    lab[:, :8] = np.abs(rng.rand(B, 8, 6)).astype(np.float32)
    lab[:, :8, 0] = rng.randint(0, 8, (B, 8))
    lab[:, :8, 3:5] = lab[:, :8, 1:3] + 0.2
    img = rng.rand(B, H, W, 3).astype(np.float32)
    if pre_s2d:
        img = host_space_to_depth(img)
    batch = {
        "images": jax.device_put(img),
        "label_det": jax.device_put(lab),
        "seg_label": jax.device_put(
            rng.randint(0, 19, (B, H // 4, W // 4)).astype(np.int32)),
    }
    jax.block_until_ready(batch)
    return batch


def host_space_to_depth(img):
    """numpy [B, H, W, C] -> [B, H/2, W/2, 4C] — models/layers.space_to_depth
    applied on host (same code; ndarray methods keep numpy in, numpy out)."""
    from dspnet_tpu.models.layers import space_to_depth

    return space_to_depth(img)


def timed_train_steps(solver, state, batch, n: int = 20, warmup: int = 3):
    """Mean seconds/step of ``solver.train_step`` (donated-state chaining is
    the synchronization: the final ``float(metrics['loss'])`` forces the
    whole chain). Returns (state, seconds_per_step)."""
    for _ in range(warmup):
        state, metrics = solver.train_step(state, batch)
    float(metrics["loss"])
    t0 = time.perf_counter()
    for _ in range(n):
        state, metrics = solver.train_step(state, batch)
    float(metrics["loss"])
    return state, (time.perf_counter() - t0) / n
