"""Bisect the slow .lower() of the b128 exact-seg graph on axon (VERDICT r4
item 7: ~8.6 min on the axon backend vs 0.9 s CPU lowering of the same
graph — a 575x host-side blow-up with no obvious cause).

RESOLVED (docs/LOWERING_NOTE.md): lowering was never slow — the first
cell's .lower() embedded a device-resident anchors jax.Array as an MLIR
constant (ir_constant -> array._value), and the FIRST device->host
readback of an axon process stalls 90-580 s (all later fetches are ms).
With numpy anchors every cell lowers in <2 s on axon. This script is
kept as the regression guard: any cell over a few seconds means a
device-resident constant crept back into a jitted closure.

Times jax.jit(...).lower(...) — NOT compile — for a grid of configs:
batch size x seg head (exact / fast / none) x NMS backend, printing one
line per cell as it completes (flush=True).

Usage: python scripts/diagnose_lowering.py [quick]
  quick: only the b32 cells (a first signal in ~1 min).
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("AXON_JOURNAL_COMPACT", "1")

import jax
import jax.numpy as jnp


def build(batch, seg, nms_backend):
    from dspnet_tpu.api import create_model
    from dspnet_tpu.ops.detection import multibox_detection

    H = W = 512
    bundle = create_model("resnet-50_multi" if seg != "none" else "resnet-50_det",
                          (H, W), num_classes=8, seg_fast=(seg == "fast"))
    model = bundle.model
    anchors = bundle.anchors  # numpy f32 — device constants stall axon lowering
    # .lower() takes ShapeDtypeStructs — NO device buffers. Materializing
    # the variables tree with an un-jitted tree.map(jnp.zeros) on axon is
    # itself hundreds of tiny remote dispatches (minutes — the un-jitted
    # model.init anti-pattern, CLAUDE.md), which would contaminate the
    # lowering timings this script exists to isolate.
    images = jax.ShapeDtypeStruct((batch, H, W, 3), jnp.float32)
    variables = jax.eval_shape(
        lambda r, x: model.init(r, x, train=False),
        jax.random.PRNGKey(0), jax.ShapeDtypeStruct((1, H, W, 3), jnp.float32))

    def forward(variables, images):
        out = model.apply(variables, images.astype(jnp.bfloat16), train=False)
        res = []
        if "cls_logits" in out:
            cls_prob = jax.nn.softmax(out["cls_logits"].astype(jnp.float32), axis=-1)
            det = multibox_detection(
                jnp.swapaxes(cls_prob, 1, 2),
                out["loc_preds"].astype(jnp.float32), anchors,
                threshold=0.01, nms_threshold=0.45, nms_topk=400,
                nms_backend=nms_backend)
            res.append(det)
        if "seg_logits" in out:
            res.append(jnp.argmax(out["seg_logits"], axis=-1))
        return tuple(res)

    return forward, (variables, images)


def main():
    quick = len(sys.argv) > 1 and sys.argv[1] == "quick"
    print(f"platform: {jax.devices()[0].platform}", flush=True)
    batches = (32,) if quick else (32, 128)
    cells = []
    for batch in batches:
        for seg in ("fast", "exact", "none"):
            for nms in (("pallas",) if jax.devices()[0].platform != "cpu"
                        else ("xla",)):
                cells.append((batch, seg, nms))
        # NMS-backend control at the exact head only
        if jax.devices()[0].platform != "cpu":
            cells.append((batch, "exact", "xla"))

    for batch, seg, nms in cells:
        fn, args = build(batch, seg, nms)
        t0 = time.perf_counter()
        lowered = jax.jit(fn).lower(*args)
        t_lower = time.perf_counter() - t0
        text_len = 0
        try:
            t0 = time.perf_counter()
            text_len = len(lowered.as_text())
            t_text = time.perf_counter() - t0
        except Exception:
            t_text = float("nan")
        print(f"b{batch:<4} seg={seg:<6} nms={nms:<7} "
              f"lower={t_lower:8.2f}s  stablehlo={text_len / 1e6:7.2f} MB "
              f"(as_text {t_text:.2f}s)", flush=True)


if __name__ == "__main__":
    main()
