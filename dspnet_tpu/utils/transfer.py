"""Transfer / fine-tune initialization.

Capability parity with reference multi_init.py:50-169 (init_from_resnet /
init_from_vgg16 / init_from_fcnxs): start a new multitask model from a
pretrained backbone checkpoint — backbone params copied, every new head left
at its fresh initialization (flax init already covers the reference's
explicit random/zeros/ones head init; the deconv bilinear-upsampling init
lives in models/layers.py Deconv2x, multi_init.py:13-21 equivalent).
"""

from __future__ import annotations

from typing import Any, Dict

import jax


def merge_param_subtree(params: Dict[str, Any], pretrained: Dict[str, Any],
                        subtree: str = "backbone", strict_shapes: bool = True):
    """Return ``params`` with ``params[subtree]`` leaves replaced by matching
    leaves from ``pretrained[subtree]`` (shape-checked)."""
    assert subtree in params, f"model has no '{subtree}' params"
    src = pretrained[subtree] if subtree in pretrained else pretrained

    def merge(dst_node, src_node, path):
        if isinstance(dst_node, dict):
            out = {}
            for k, v in dst_node.items():
                if isinstance(src_node, dict) and k in src_node:
                    out[k] = merge(v, src_node[k], path + "/" + k)
                else:
                    out[k] = v  # keep fresh init for params missing upstream
            return out
        if hasattr(src_node, "shape") and src_node.shape != dst_node.shape:
            if strict_shapes:
                raise ValueError(f"shape mismatch at {path}: {src_node.shape} vs {dst_node.shape}")
            return dst_node
        return src_node

    new = dict(params)
    new[subtree] = merge(params[subtree], src, subtree)
    return new


def init_from_checkpoint(state, checkpoint_dir: str, subtree: str = "backbone",
                         epoch=None):
    """Load ``subtree`` params (and matching batch stats) from an Orbax
    checkpoint written by this framework into a fresh TrainState."""
    from dspnet_tpu.utils.checkpoint import CheckpointManagerWrapper

    mgr = CheckpointManagerWrapper(checkpoint_dir)
    # template-free read: the source checkpoint may come from a DIFFERENT
    # architecture (other head widths / class counts / optimizer) — a
    # template-validated restore would reject exactly the cross-model
    # transfer this function exists for (multi_init.py:50-169)
    restored, _ = mgr.restore_raw(epoch)
    params = merge_param_subtree(state.params, restored.get("params", {}), subtree)
    batch_stats = state.batch_stats
    if batch_stats and restored.get("batch_stats"):
        batch_stats = merge_param_subtree(
            dict(batch_stats), dict(restored["batch_stats"]), subtree)
    mgr.close()
    return state.replace(params=params, batch_stats=batch_stats)
