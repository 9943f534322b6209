"""TPU smoke of every backbone preset (VERDICT r4 item 6).

All prior hardware numbers are resnet-18/50; this drives jitted init +
forward + ONE train step for each remaining factory preset on the attached
chip and prints inference + train img/s per preset. Any preset that fails
to compile on TPU is a found bug. Reference preset table:
/root/reference/symbol/multitask_symbol_factory.py:17-95.

Usage: python scripts/tpu_preset_smoke.py [preset ...]
  (default: the full grid below; pass names to rerun a subset)
"""

import os
import sys
import time
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("AXON_JOURNAL_COMPACT", "1")

import jax
import jax.numpy as jnp
import numpy as np

# (network, data_shape HxW, inference batch, train batch)
GRID = [
    ("vgg16_reduced", (300, 300), 32, 4),        # plain SSD 300
    ("vgg16_reduced", (512, 512), 32, 4),        # plain SSD 512
    ("legacy_vgg16_ssd", (512, 512), 32, 4),     # legacy 4x4-conv12_2 config
    ("inceptionv3", (512, 512), 32, 4),
    ("resnet101", (512, 512), 32, 4),            # reference spelling, factory.py:144
    # NOT smoked: inceptionv3_multi / resnet101_multi — the multitask heads
    # require the 3-tap resnet presets, matching the reference's seg/multi
    # builders indexing from_layers[0:3] (multitask_symbol_builder.py:498-500);
    # these presets are 2-tap in both repos and raise NotImplementedError.
]


def smoke(network, hw, infer_b, train_b):
    from dspnet_tpu.api import create_model
    from dspnet_tpu.ops.detection import multibox_detection
    from dspnet_tpu.train.solver import MultiTaskSolver
    from dspnet_tpu.utils.benchmark import canonical_train_batch, timed, timed_train_steps
    from dspnet_tpu.utils.precision import bf16_variables

    H, W = hw
    on_tpu = jax.devices()[0].platform != "cpu"
    bundle = create_model(network, (H, W), num_classes=8)
    anchors = bundle.anchors  # numpy f32 — device constants stall axon lowering

    # --- inference (bf16 weights, full decode+NMS like bench.py)
    variables = jax.jit(lambda r, x: bundle.model.init(r, x, train=False))(
        jax.random.PRNGKey(0), jnp.zeros((1, H, W, 3), jnp.float32))
    variables = bf16_variables(variables)
    images = jax.device_put(
        np.random.RandomState(0).rand(infer_b, H, W, 3).astype(np.float32))
    jax.block_until_ready(images)

    @jax.jit
    def forward(v, x):
        out = bundle.model.apply(v, x.astype(jnp.bfloat16), train=False)
        cls_prob = jax.nn.softmax(out["cls_logits"].astype(jnp.float32), axis=-1)
        det = multibox_detection(
            jnp.swapaxes(cls_prob, 1, 2), out["loc_preds"].astype(jnp.float32),
            anchors, threshold=0.01, nms_threshold=0.45, nms_topk=400,
            nms_backend="pallas" if on_tpu else "xla")
        acc = det[:, 0, 1]
        if "seg_logits" in out:
            acc = acc + jnp.argmax(out["seg_logits"], axis=-1)[:, 0, 0]
        return jnp.sum(acc.astype(jnp.float32))

    dt_inf = timed(forward, variables, images, n=10)

    # --- one+N train steps (bf16 compute, canonical synthetic batch)
    solver = MultiTaskSolver(bundle.model, bundle.anchors,
                             compute_dtype="bfloat16", batch_size=train_b,
                             seg_normalize="valid")
    state = solver.init_state(jax.random.PRNGKey(0),
                              jnp.zeros((1, H, W, 3)))
    batch = canonical_train_batch(train_b, H, W)
    if bundle.task in ("ssd", "det"):
        batch.pop("seg_label")
    state, dt_train = timed_train_steps(solver, state, batch, n=5)
    return infer_b / dt_inf, train_b / dt_train, dt_train * 1e3


def main():
    print(f"devices: {jax.devices()}", flush=True)
    wanted = sys.argv[1:]
    rows = []
    for network, hw, ib, tb in GRID:
        if wanted and network not in wanted:
            continue
        tag = f"{network}@{hw[0]}x{hw[1]}"
        t0 = time.time()
        try:
            inf, tr, tr_ms = smoke(network, hw, ib, tb)
            rows.append((tag, inf, tr, tr_ms))
            print(f"OK   {tag:<32} infer {inf:8.1f} img/s (b{ib})   "
                  f"train {tr:7.2f} img/s ({tr_ms:.1f} ms b{tb})   "
                  f"[{time.time() - t0:.0f}s wall]", flush=True)
        except Exception:
            print(f"FAIL {tag}", flush=True)
            traceback.print_exc()
    print("\n| preset | data | infer img/s | train img/s |")
    print("|---|---|---|---|")
    for tag, inf, tr, _ in rows:
        net, hw = tag.split("@")
        print(f"| {net} | {hw} | {inf:.0f} | {tr:.1f} |")


if __name__ == "__main__":
    main()
