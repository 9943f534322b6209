"""Decompose the pipelined eval ms/batch into measured components.

VERDICT r4 item 8: the 55.9 ms/batch2 eval number carried an *estimated*
residual attribution (H2D bytes + dispatch RTTs). This measures each term
the way docs/SERVING_NOTE.md measured serving:

  (a) end-to-end pipelined eval ms/batch (multi_eval loop, native-u8,
      synthetic val set) — the headline being reconciled;
  (b) device-resident forward compute ms/batch (predict_raw on a resident
      uint8 batch, chained-accumulator timing);
  (c) H2D ms/batch for the same uint8 bytes (device_put + 1-element
      readback chain, steady state);
  (d) per-dispatch RTT (trivial jitted scalar round trip);
  (e) D2H bytes/batch of the fetched result tuple (counted, priced at the
      measured c rate).

Pipelined floor = max(b, c) (transfers overlap compute at depth>=2);
the table prints measured (a) against floor + overhead attribution.

Usage: python scripts/probe_eval.py  [--batch 2] [--n 40]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("AXON_JOURNAL_COMPACT", "1")

import jax
import jax.numpy as jnp
import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=2)
    ap.add_argument("--n", type=int, default=40)
    ap.add_argument("--val", type=int, default=48)
    args = ap.parse_args()
    B, H, W = args.batch, 512, 1024

    from dspnet_tpu.api import create_model
    from dspnet_tpu.detect.detector import Detector
    from dspnet_tpu.utils import warmup

    warmup.prime_d2h_async()

    # (d) dispatch RTT
    one = jnp.float32(1.0)
    add = jax.jit(lambda a, b: a + b)
    acc = add(one, one)
    float(acc)
    t0 = time.perf_counter()
    for _ in range(30):
        float(add(one, one))
    rtt_ms = (time.perf_counter() - t0) / 30 * 1e3

    # (b) device-resident forward (random init — timing only)
    from dspnet_tpu.train.solver import MultiTaskSolver
    bundle = create_model("resnet-50_multi", (H, W), num_classes=8)
    solver = MultiTaskSolver(bundle.model, bundle.anchors)
    state = solver.init_state(jax.random.PRNGKey(0),
                              jnp.zeros((args.batch, H, W, 3)))
    det = Detector(bundle.model, MultiTaskSolver.detector_variables(state),
                   bundle.anchors, (H, W))
    rng = np.random.RandomState(0)
    raw = rng.randint(0, 255, (B, H, W, 3), np.uint8)
    raw_dev = jax.device_put(raw)
    res = det.predict_raw(raw_dev)
    leaves = jax.tree.leaves(res)
    d2h_bytes = sum(l.size * l.dtype.itemsize for l in leaves)
    def first_leaf(out):
        return jax.tree.leaves(out)[0].ravel()[0].astype(jnp.float32)

    acc = jnp.float32(0)
    for _ in range(3):
        acc = acc + first_leaf(det.predict_raw(raw_dev))
    float(acc)
    acc = jnp.float32(0)
    t0 = time.perf_counter()
    for _ in range(args.n):
        acc = acc + first_leaf(det.predict_raw(raw_dev))
    float(acc)
    fwd_ms = (time.perf_counter() - t0) / args.n * 1e3

    # (c) H2D steady state for the uint8 batch bytes
    h2d_mb = raw.nbytes / 1e6
    acc = jnp.float32(0)
    for _ in range(3):
        acc = acc + jax.device_put(raw).ravel()[0].astype(jnp.float32)
    float(acc)
    acc = jnp.float32(0)
    t0 = time.perf_counter()
    for _ in range(args.n):
        acc = acc + jax.device_put(raw).ravel()[0].astype(jnp.float32)
    float(acc)
    h2d_ms = (time.perf_counter() - t0) / args.n * 1e3

    # (a) end-to-end pipelined eval on a synthetic val set (same flags as
    # the recorded 55.9 ms/batch2 measurement)
    from dspnet_tpu.cli import multi_eval
    results = multi_eval.main([
        "--network", "resnet-50_multi", "--data-shape", f"3,{H},{W}",
        "--num-classes", "8", "--batch-size", str(B),
        "--synthetic", str(args.val), "--synthetic-dir", "/tmp/probe_eval_ds",
        "--random-init", "--loader", "native", "--native-u8",
        "--pipeline-depth", "4",
    ])
    e2e_ms = results["ms_per_batch"]

    # (c) chains one readback per device_put, so it carries one dispatch
    # RTT per iteration that the pipelined loop overlaps — the transfer
    # floor is (c) minus (d)
    xfer_ms = h2d_ms - rtt_ms
    floor = max(fwd_ms, xfer_ms)
    print("\n=== eval residual probe (512x1024, batch %d) ===" % B)
    print(f"(a) end-to-end pipelined eval : {e2e_ms:7.1f} ms/batch")
    print(f"(b) device-resident forward   : {fwd_ms:7.1f} ms/batch")
    print(f"(c) H2D {h2d_mb:5.1f} MB uint8, chained: {h2d_ms:6.1f} ms/batch")
    print(f"(d) dispatch RTT              : {rtt_ms:7.1f} ms")
    print(f"(e) D2H result bytes          : {d2h_bytes / 1e6:7.2f} MB/batch")
    print(f"H2D transfer (c - d)          : {xfer_ms:7.1f} ms/batch "
          f"({h2d_mb / max(xfer_ms, 1e-9) * 1e3:.0f} MB/s)")
    print(f"pipelined floor max(b, c - d) : {floor:7.1f} ms/batch")
    print(f"residual (a - floor)          : {e2e_ms - floor:7.1f} ms/batch "
          f"(~{(e2e_ms - floor) / max(rtt_ms, 1e-9):.1f} RTTs)")


if __name__ == "__main__":
    main()
