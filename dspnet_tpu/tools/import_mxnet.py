"""import_mxnet — convert a reference MXNet `.params` checkpoint to Orbax.

The reference saves `prefix-epoch.params` (multi_train.py:370); this tool
reads that binary (no MXNet needed — dspnet_tpu/utils/mxnet_import.py),
maps the resnet backbone names (symbol/resnet.py contract) into this
framework's flax trees, merges them into a freshly initialized model, and
writes an Orbax checkpoint that `multi_train --resume` / `multi_eval` /
`multi_demo` consume directly. Heads not present in the map keep their
fresh init (the reference's init_from_resnet behavior, multi_init.py:50-169).

Usage::

    python -m dspnet_tpu.tools.import_mxnet \
        --params resnet-50-0000.params --network resnet-50_multi \
        --data-shape 3,512,1024 --model-dir model --epoch 0
"""

from __future__ import annotations

import argparse


def main(argv=None):
    p = argparse.ArgumentParser(description="MXNet .params -> Orbax checkpoint.")
    p.add_argument("--params", required=True, help="MXNet .params file")
    p.add_argument("--network", default="resnet-50_multi")
    p.add_argument("--data-shape", default="3,512,1024")
    p.add_argument("--num-classes", type=int, default=8)
    p.add_argument("--model-dir", default="model")
    p.add_argument("--epoch", type=int, default=0,
                   help="epoch number to write the checkpoint as")
    args = p.parse_args(argv)

    import jax
    import jax.numpy as jnp

    from dspnet_tpu.api import create_model
    from dspnet_tpu.cli.common import parse_data_shape
    from dspnet_tpu.train.solver import MultiTaskSolver
    from dspnet_tpu.utils.checkpoint import CheckpointManagerWrapper, checkpoint_prefix
    from dspnet_tpu.utils.mxnet_import import load_params, map_multitask
    from dspnet_tpu.utils.transfer import merge_param_subtree

    import numpy as np

    H, W = parse_data_shape(args.data_shape)
    bundle = create_model(args.network, (H, W), args.num_classes)
    solver = MultiTaskSolver(
        bundle.model,
        bundle.anchors if bundle.anchors is not None else np.zeros((1, 4), np.float32),
    )
    state = solver.init_state(jax.random.PRNGKey(233), jnp.zeros((1, H, W, 3)))

    mx_args, mx_auxs = load_params(args.params)
    # full trained-checkpoint inventory (backbone + multi_feat + multibox +
    # seg); a pretrained-backbone-only file simply maps its backbone subset
    mapped_params, mapped_stats, unused = map_multitask(
        mx_args, mx_auxs, args.network, H)
    n_mapped = len(jax.tree.leaves(mapped_params)) + len(jax.tree.leaves(mapped_stats))
    print(f"mapped {n_mapped} arrays from {args.params}")
    if unused:
        print(f"WARNING: {len(unused)} reference arrays not consumed: "
              + ", ".join(sorted(unused)[:20]))

    params = state.params
    batch_stats = state.batch_stats
    for top, sub in mapped_params.items():
        if top not in params:
            # e.g. a multitask checkpoint's seg head imported into a
            # det-task network: keep the backbone/det subset, drop the rest
            print(f"skipping '{top}' subtree: target network has no such params")
            continue
        params = merge_param_subtree(params, {top: sub}, subtree=top)
    if batch_stats:
        batch_stats = dict(batch_stats)
        for top, sub in mapped_stats.items():
            if top in batch_stats:
                batch_stats = merge_param_subtree(
                    batch_stats, {top: sub}, subtree=top, strict_shapes=False)
    state = state.replace(params=params, batch_stats=batch_stats)

    prefix = checkpoint_prefix(args.model_dir, args.network, H)
    mgr = CheckpointManagerWrapper(prefix)
    mgr.save(args.epoch, state)
    mgr.close()
    print(f"wrote {prefix} epoch {args.epoch}")


if __name__ == "__main__":
    main()
