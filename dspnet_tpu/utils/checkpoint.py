"""Checkpoint save/restore (Orbax) with the reference naming contract.

The reference writes `{prefix}-symbol.json` + `{prefix}-{epoch:04d}.params`
per epoch via mx.callback.do_checkpoint (multi_train.py:370,
multi_solver.py:347-348), with prefix `{dir}/multitask_{net}_{height}`
(multi_train.py:287). Here each epoch is an Orbax step directory under
`{prefix}` carrying params, batch_stats, and optimizer state, so
``--resume N`` works the same way (multi_train.py:336-341).
"""

from __future__ import annotations

import os
from typing import Any, Optional

import orbax.checkpoint as ocp


def checkpoint_prefix(model_dir: str, net_name: str, data_height: int) -> str:
    """`{dir}/multitask_{net}_{height}` (multi_train.py:287)."""
    return os.path.join(os.path.abspath(model_dir), f"multitask_{net_name}_{data_height}")


class CheckpointManagerWrapper:
    def __init__(self, prefix: str, max_to_keep: Optional[int] = None):
        # orbax/tensorstore reject relative paths at commit time (from a
        # background thread, leaving a stale tmp dir) — normalize here
        prefix = os.path.abspath(prefix)
        self.prefix = prefix
        os.makedirs(prefix, exist_ok=True)
        options = ocp.CheckpointManagerOptions(max_to_keep=max_to_keep, create=True)
        # pre-register the item handler: a restore-only manager otherwise has
        # no handler for the 'default' item, so item_metadata() silently
        # returns an empty tree (breaking the template-free restore_raw path)
        self.mgr = ocp.CheckpointManager(
            prefix, options=options,
            item_handlers=ocp.StandardCheckpointHandler())

    def save(self, epoch: int, state: Any):
        payload = {
            "params": state.params,
            "batch_stats": state.batch_stats,
            "opt_state": state.opt_state,
            "step": state.step,
        }
        self.mgr.save(epoch, args=ocp.args.StandardSave(payload))
        self.mgr.wait_until_finished()

    def restore(self, epoch: Optional[int], template_state: Any):
        if epoch is None:
            epoch = self.mgr.latest_step()
        assert epoch is not None, f"no checkpoints under {self.prefix}"
        payload = {
            "params": template_state.params,
            "batch_stats": template_state.batch_stats,
            "opt_state": template_state.opt_state,
            "step": template_state.step,
        }
        restored = self.mgr.restore(epoch, args=ocp.args.StandardRestore(payload))
        return template_state.replace(
            params=restored["params"],
            batch_stats=restored["batch_stats"],
            opt_state=restored["opt_state"],
            step=restored["step"],
        ), epoch

    def restore_raw(self, epoch: Optional[int] = None):
        """Template-free restore: the stored tree as plain numpy dicts.

        Unlike :meth:`restore`, this never validates against a target state,
        so a checkpoint from a DIFFERENT architecture/optimizer can be read
        and partially merged (the transfer-init path)."""
        if epoch is None:
            epoch = self.mgr.latest_step()
        assert epoch is not None, f"no checkpoints under {self.prefix}"
        # restore every leaf directly as host numpy (concrete np template):
        # a template-free jax.Array restore replays the SAVED device
        # topology, which fails for checkpoints written by a different
        # mesh/process count (e.g. reading a pod-DP checkpoint on one host
        # for transfer/eval), and restoring onto a REMOTE device then
        # fetching back pays serial per-leaf round-trips (~110 s for a
        # 247 MiB state over the axon tunnel; measured 157 s via the old
        # SingleDeviceSharding path vs 10 s as numpy). A sharding-less
        # ShapeDtypeStruct does NOT work: orbax then replays the sharding
        # recorded in the checkpoint file. The merge/transfer consumers
        # re-place leaves on device themselves
        import jax
        import numpy as _np

        meta = self.mgr.item_metadata(epoch)
        meta = getattr(meta, "tree", meta)  # TreeMetadata wrapper -> plain tree

        def as_numpy_template(m):
            if getattr(m, "dtype", None) is None:  # scalar / non-array leaf
                return ocp.RestoreArgs()
            return _np.zeros(m.shape, m.dtype)

        template = jax.tree.map(as_numpy_template, meta)
        return self.mgr.restore(
            epoch, args=ocp.args.StandardRestore(template)), epoch

    def latest_epoch(self) -> Optional[int]:
        return self.mgr.latest_step()

    def close(self):
        self.mgr.close()


def save_params_only(path: str, params, batch_stats=None):
    """One-shot save of inference variables (detector deployments)."""
    ckptr = ocp.StandardCheckpointer()
    payload = {"params": params}
    if batch_stats is not None:
        payload["batch_stats"] = batch_stats
    ckptr.save(os.path.abspath(path), payload)
    ckptr.wait_until_finished()


def load_params_only(path: str, template):
    ckptr = ocp.StandardCheckpointer()
    return ckptr.restore(os.path.abspath(path), target=template)
