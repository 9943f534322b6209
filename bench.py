"""End-to-end multitask inference throughput benchmark.

Measures the BASELINE.md north-star metric: images/sec/chip for the full
512x512 multitask pipeline (resnet-50 backbone + SSD/depth head + PSP seg
head + on-device decode+NMS + seg argmax) on the attached TPU.

Serving configuration: bfloat16 weights/activations on the MXU (box decode,
NMS, and softmax stay float32), Pallas fused-NMS backend, reference-EXACT
seg head by default (same numerics as the reference's builder; ~1672 img/s
at b128 on v5e; set BENCH_SEG_FAST=1 for the FCN-style variant head,
~1700-1730 — dspnet_tpu/models/seg_head.py). Default batch 128 maximizes
throughput/chip;
pass a smaller batch as argv[1] for latency-oriented serving.
BENCH_TRAIN=1 switches to the canonical train-step benchmark (bench_train);
BENCH_SERVE=1 to the 512x1024 b1 serving-latency benchmark (bench_serve).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
``vs_baseline`` is value / 500 (the >=500 img/s/chip target for v5e).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time


def wait_for_backend(deadline_s: float = 600.0, probe_timeout_s: float = 90.0) -> bool:
    """Poll backend availability in a SUBPROCESS with retry/backoff.

    The axon tunnel fails in two ways a naive ``jax.devices()`` call can't
    survive: it HANGS silently (2026-08-17 outage: >10 min, no error), or it
    raises ``UNAVAILABLE`` at init — and a backend that failed to init once
    is sticky for the process lifetime. Probing in a fresh subprocess with a
    bounded timeout makes each attempt independent, so a transient flap at
    capture time costs a retry, not the round's whole bench artifact
    (BENCH_r02.json was an rc=1 traceback for exactly this reason).

    Returns True once a probe sees devices; False when ``deadline_s`` (env
    ``BENCH_PROBE_DEADLINE_S``) expires. CPU runs pass on the first probe.
    """
    deadline_s = float(os.environ.get("BENCH_PROBE_DEADLINE_S", deadline_s))
    t0 = time.monotonic()
    attempt = 0
    while True:
        attempt += 1
        try:
            r = subprocess.run(
                [sys.executable, "-c", "import jax; jax.devices()"],
                timeout=probe_timeout_s,
                stdout=subprocess.DEVNULL,
                stderr=subprocess.DEVNULL,
            )
            if r.returncode == 0:
                return True
        except subprocess.TimeoutExpired:
            pass
        elapsed = time.monotonic() - t0
        if elapsed >= deadline_s:
            return False
        wait = min(30.0, 5.0 * attempt, deadline_s - elapsed)
        print(f"bench: backend unreachable (attempt {attempt}, "
              f"{elapsed:.0f}s elapsed); retrying in {wait:.0f}s",
              file=sys.stderr)
        time.sleep(wait)


def bench_train():
    """BENCH_TRAIN=1 mode: the 512x1024 resnet-50_multi bf16 train step,
    device-resident batch, at b4 (the reference-parity config) AND b8 (the
    per-chip throughput config) — img/s + est. MFU from the compiled step's
    XLA cost analysis.

    Regression guard for the train-step campaign: 81.5 ms/step b4 at
    round-1 end; 54.6 after round 2 (bandwidth-lean BatchNorm +
    space-to-depth stem + seg-head tap-split + one-hot CE). Round-3
    roofline work (docs/ROOFLINE.md) showed b4 half-fills the 8-sublane
    tiles of the batch-minor layouts XLA picks for backward convs, so b8
    runs in nearly the same wall time (49.8 ms, 160.6 img/s, 24.3% MFU on
    2026-08-18) — b8 is the headline; b4 rides along for continuity.
    Round 5: the batch arrives in the loaders' space-to-depth layout
    (--input-s2d, free on the host side), removing the stem's input
    relayout copies — 42.5 -> 41.6 ms b8 on 2026-08-20.
    """
    import jax
    import jax.numpy as jnp

    from dspnet_tpu.api import create_model
    from dspnet_tpu.train.solver import MultiTaskSolver
    from dspnet_tpu.utils.benchmark import canonical_train_batch, timed_train_steps

    H, W = 512, 1024
    res = {}
    for B in (4, 8):
        bundle = create_model("resnet-50_multi", (H, W), num_classes=8)
        solver = MultiTaskSolver(bundle.model, bundle.anchors,
                                 compute_dtype="bfloat16", batch_size=B)
        state = solver.init_state(jax.random.PRNGKey(0),
                                  jnp.zeros((1, H, W, 3)))
        batch = canonical_train_batch(B, H, W, pre_s2d=True)
        if solver._train_step is None:
            solver._train_step = solver._build_train_step()
        compiled = solver._train_step.lower(state, batch).compile()
        ca = compiled.cost_analysis()
        ca = ca[0] if isinstance(ca, (list, tuple)) else ca
        flops = float(ca.get("flops", 0.0))
        state, dt = timed_train_steps(solver, state, batch)
        res[B] = (dt, flops / dt / 197e12)  # v5e bf16 peak 197 TFLOP/s
    dt4, _ = res[4]
    dt8, mfu8 = res[8]
    print(json.dumps({
        "metric": "multitask_train_step_512x1024_b8_bf16",
        "value": round(8 / dt8, 2),
        "unit": "images/sec/chip",
        "vs_baseline": round(0.0815 / 2 / (dt8 / 8), 4),  # vs r1 ms/img
        "ms_per_step": round(dt8 * 1e3, 2),
        "est_mfu": round(mfu8, 4),
        "b4_ms_per_step": round(dt4 * 1e3, 2),
        "b4_img_per_s": round(4 / dt4, 2),
    }))


def bench_serve():
    """BENCH_SERVE=1 mode: 512x1024 b1 serving latency, three numbers that
    tell the serving story (regression guard for VERDICT r3 item 8):

    * ``sync_ms`` — one `predict_raw` (uint8 BGR H2D + on-device normalize
      + forward + full D2H) per call, materialized before the next call.
      Tunnel-RTT-bound over axon: every np.asarray of a computed result is
      a blocking ~30 ms round trip PER BUFFER (det + seg = two), on top of
      exec (~100-160 ms measured r4; tunnel jitter is large).
    * ``pipelined_ms`` — ServingPipeline depth=2 (async dispatch +
      copy_to_host_async at submit, results one window behind): each
      call's H2D/compute/D2H overlaps its neighbors'. ~47 ms r4 — the
      measured floor of max(b1 exec ~13-23 ms, 1.5 MB frame H2D + D2H
      stream over the tunnel); probed flat across depth 2/4/8 and drain
      chunk 8/16 (docs/SERVING_NOTE.md). The headline ``value``.
    * ``device_resident_ms`` — forward only, input already on device
      (~13-23 ms across r4 runs): the pure-compute floor the pipeline
      approaches on real PCIe hosts, where the transport terms vanish.

    Reference counterpart: the per-frame FPS print,
    /root/reference/detect/multitask_detector.py:454.
    """
    import jax
    import jax.numpy as jnp
    import numpy as np

    from dspnet_tpu.api import create_model
    from dspnet_tpu.detect.detector import Detector
    from dspnet_tpu.detect.pipeline import ServingPipeline
    from dspnet_tpu.utils.benchmark import timed
    from dspnet_tpu.utils.precision import bf16_variables

    H, W = 512, 1024
    bundle = create_model("resnet-50_multi", (H, W), num_classes=8)
    variables = jax.jit(lambda r, x: bundle.model.init(r, x, train=False))(
        jax.random.PRNGKey(0), jnp.zeros((1, H, W, 3), jnp.float32))
    variables = bf16_variables(variables)
    det = Detector(bundle.model, variables, bundle.anchors, (H, W))

    rng = np.random.RandomState(0)
    frame = rng.randint(0, 256, (1, H, W, 3), np.uint8)

    def materialize(res):
        return {k: np.asarray(v) for k, v in res.items()}

    # --- sync: materialize every call before dispatching the next
    n = 30
    materialize(det.predict_raw(frame))  # compile + warm
    materialize(det.predict_raw(frame))
    t0 = time.perf_counter()
    for _ in range(n):
        materialize(det.predict_raw(frame))
    sync_ms = (time.perf_counter() - t0) / n * 1e3

    # --- pipelined: depth-2 window, results one window behind
    pipe = ServingPipeline(det, depth=2, raw=True)
    for _ in range(4):  # fill + warm the window
        pipe.submit(frame)
    t0 = time.perf_counter()
    for _ in range(n):
        pipe.submit(frame)
    for _ in pipe.drain():
        pass
    pipelined_ms = (time.perf_counter() - t0) / n * 1e3

    # --- device-resident: pure compute, chained-accumulator timing
    # (block_until_ready is unreliable on axon — utils/benchmark.timed)
    images = jax.device_put(
        (frame[..., ::-1].astype(np.float32) - np.asarray(det.mean_pixels)))
    jax.block_until_ready(images)

    def step(v, x):
        res = det._predict(v, x)
        return (res["det"][0, 0, 1].astype(jnp.float32)
                + res["seg"][0, 0, 0].astype(jnp.float32))

    device_ms = timed(step, variables, images, n=n) * 1e3

    print(json.dumps({
        "metric": "serving_latency_512x1024_b1",
        "value": round(pipelined_ms, 2),
        "unit": "ms/call",
        "vs_baseline": round(47.0 / pipelined_ms, 4),  # vs the r2 sync number
        "sync_ms": round(sync_ms, 2),
        "pipelined_ms": round(pipelined_ms, 2),
        "device_resident_ms": round(device_ms, 2),
    }))


def main():
    train_mode = bool(os.environ.get("BENCH_TRAIN"))
    serve_mode = bool(os.environ.get("BENCH_SERVE"))
    if not wait_for_backend():
        # one structured line the driver can record, not a traceback —
        # labeled with the metric the selected mode would have produced
        metric = ("multitask_train_step_512x1024_b8_bf16" if train_mode
                  else "serving_latency_512x1024_b1" if serve_mode
                  else "multitask_inference_throughput_512x512")
        print(json.dumps({"error": "tpu_unavailable", "metric": metric,
                          "value": None,
                          "unit": "ms/call" if serve_mode else "images/sec/chip",
                          "vs_baseline": None}))
        return

    if train_mode:
        return bench_train()
    if serve_mode:
        return bench_serve()

    import jax
    import jax.numpy as jnp

    from dspnet_tpu.api import create_model
    from dspnet_tpu.ops.detection import multibox_detection
    from dspnet_tpu.utils.precision import bf16_variables

    H = W = 512
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 128
    on_tpu = jax.devices()[0].platform != "cpu"
    from dspnet_tpu.utils.warmup import prime_d2h_async

    prime_d2h_async()  # overlap axon's first-D2H stall with the compiles
    # Default measures the REFERENCE-EXACT seg head (same numerics as
    # reference multitask_symbol_builder.py:574-584); BENCH_SEG_FAST=1
    # opts into the FCN-style variant head (~1.7% faster, different
    # numerics). Flipped in r5 so the driver-captured headline records
    # parity semantics first (VERDICT r4 #4).
    seg_fast = bool(os.environ.get("BENCH_SEG_FAST"))
    bundle = create_model("resnet-50_multi", (H, W), num_classes=8,
                          seg_fast=seg_fast)
    model = bundle.model
    anchors = bundle.anchors  # numpy f32 — device constants stall axon lowering

    images = jax.random.normal(jax.random.PRNGKey(0), (batch, H, W, 3), jnp.float32)
    variables = jax.jit(lambda r, x: model.init(r, x, train=False))(
        jax.random.PRNGKey(0), images[:1]
    )
    variables = bf16_variables(variables)

    @jax.jit
    def forward(variables, images):
        out = model.apply(variables, images.astype(jnp.bfloat16), train=False)
        cls_prob = jax.nn.softmax(out["cls_logits"].astype(jnp.float32), axis=-1)
        det = multibox_detection(
            jnp.swapaxes(cls_prob, 1, 2), out["loc_preds"].astype(jnp.float32), anchors,
            threshold=0.01, nms_threshold=0.45, nms_topk=400,
            nms_backend="pallas" if on_tpu else "xla",
        )
        seg = jnp.argmax(out["seg_logits"], axis=-1)
        return det, seg

    # warmup / compile
    import numpy as np

    det, _ = jax.block_until_ready(forward(variables, images))
    # The one-time axon first-D2H stall (90-580 s, docs/LOWERING_NOTE.md)
    # overlaps the cold compile via prime_d2h_async — but with a WARM
    # compile cache it would land inside the timed window instead
    # (measured: 93 img/s instead of ~1700). Join the priming thread and
    # pay one real readback here so the timed loop sees steady state.
    from dspnet_tpu.utils.warmup import wait_primed

    # bounded join: if the priming fetch wedges past the observed 580 s
    # worst case, fall through — the real readback below pays the stall
    # instead of hanging the bench with no output (ADVICE r4)
    wait_primed(timeout=900)
    np.asarray(det[0, :1, :1])
    # timed
    iters = 20
    t0 = time.perf_counter()
    for _ in range(iters):
        det, seg = forward(variables, images)
    jax.block_until_ready((det, seg))
    dt = time.perf_counter() - t0
    imgs_per_sec = batch * iters / dt

    print(json.dumps({
        "metric": "multitask_inference_throughput_512x512",
        "value": round(float(imgs_per_sec), 2),
        "unit": "images/sec/chip",
        "vs_baseline": round(float(imgs_per_sec) / 500.0, 4),
        "seg_head": "fast_variant" if seg_fast else "reference_exact",
    }))


if __name__ == "__main__":
    main()
