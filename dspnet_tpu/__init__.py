"""dspnet_tpu — a TPU-native (JAX/Flax/Pallas/pjit) driving-scene-perception framework.

A from-scratch rebuild of the capabilities of the DSPNet reference
(single-shot multitask network: 2-D detection + per-box distance + semantic
segmentation), designed TPU-first:

* the whole forward/backward is one jitted program (no per-step graph rebind),
* anchors are trace-time constants,
* anchor matching / target assignment / decode+NMS are fixed-shape on-device
  ops (JAX + Pallas) instead of CUDA kernels,
* data parallelism is a `jax.sharding.Mesh` + `shard_map`/`pjit` batch shard
  with psum gradient reduction over ICI.

Reference capability map: see SURVEY.md at the repo root.
"""

__version__ = "0.1.0"

import os as _os

# The remote-TPU (axon tunnel) client journals every host->device buffer so
# it can replay the session if the connection drops; on a training run that
# retains every input batch on the host (~25 MB/step uint8 at 512x1024 b16,
# measured) until the kernel OOM-kills the process after a few hundred
# epochs. Journal compaction bounds host memory (~1 MB/step residual); the
# trade is that a dropped tunnel ends the run instead of replaying — which
# per-epoch checkpoints + --resume already cover. Must be set before the
# backend initializes; harmless on other platforms.
_os.environ.setdefault("AXON_JOURNAL_COMPACT", "1")

from dspnet_tpu.ops import anchors, boxes  # noqa: F401

# Persistent XLA compilation cache: every CLI launch re-compiles the train /
# inference graphs from scratch (2-8 min over the remote-TPU tunnel), which
# taxes resumable long runs (scripts/run_resumable.sh restarts) and repeat
# benches. The cache keys on (HLO, compile options, backend version), so it
# is correctness-neutral; DSPNET_COMPILE_CACHE=0 disables, or set a path to
# relocate it. (jax 0.9 ignores the JAX_COMPILATION_CACHE_DIR env var, so
# this must be the programmatic config.)
_cache = _os.environ.get("DSPNET_COMPILE_CACHE", "1")
if _cache != "0":
    import jax as _jax

    try:
        _jax.config.update(
            "jax_compilation_cache_dir",
            _cache if _cache not in ("", "1") else _os.path.join(
                _os.path.expanduser("~"), ".cache", "dspnet_tpu_xla"))
        # cache even fast-to-compile programs: over the tunnel the win is
        # the round-trips, not the local compile time
        _jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
        _jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except Exception:  # unknown flags on a future jax: run uncached
        pass

# lazy top-level API (avoids importing flax/cv2 for ops-only users)
_LAZY = {
    "create_model": ("dspnet_tpu.api", "create_model"),
    "ModelBundle": ("dspnet_tpu.api", "ModelBundle"),
    "Detector": ("dspnet_tpu.detect.detector", "Detector"),
    "ServingPipeline": ("dspnet_tpu.detect.pipeline", "ServingPipeline"),
    "MultiTaskSolver": ("dspnet_tpu.train.solver", "MultiTaskSolver"),
    "MultiTaskIterator": ("dspnet_tpu.data.iterator", "MultiTaskIterator"),
    "evaluate_model": ("dspnet_tpu.evaluate.loop", "evaluate_model"),
}


def __getattr__(name):
    if name in _LAZY:
        import importlib

        module, attr = _LAZY[name]
        return getattr(importlib.import_module(module), attr)
    raise AttributeError(f"module 'dspnet_tpu' has no attribute {name!r}")


def __dir__():
    return sorted(list(globals()) + list(_LAZY))
