"""A/B XLA compiler options on the canonical b8 train step.

VERDICT r4 item 1 asks for the layout/scheduling-flag lever to be pulled.
Each variant recompiles the identical step graph with one
``compiler_options`` override and times it with the axon-safe chained
accumulator. Unknown/rejected options are reported and skipped, so the
sweep degrades gracefully across libtpu versions.

Usage:
    python scripts/ab_flags.py            # built-in sweep
    AB_N=20 python scripts/ab_flags.py    # more timing reps
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("AXON_JOURNAL_COMPACT", "1")

import jax
import jax.numpy as jnp

EXPLORE = [
    ("baseline", {}),
    ("scoped_vmem_32m", {"xla_tpu_scoped_vmem_limit_kib": "32768"}),
    ("scoped_vmem_64m", {"xla_tpu_scoped_vmem_limit_kib": "65536"}),
    ("latency_hiding_sched", {"xla_tpu_enable_latency_hiding_scheduler": "true"}),
    ("no_rwb_fusion", {"xla_tpu_rwb_fusion": "false"}),
    ("bundle_aware_cost", {"xla_tpu_use_bundle_aware_cost_model_for_fusions": "true"}),
    ("no_multi_level_fusion", {"xla_tpu_enable_multi_level_nested_loop_fusion": "false"}),
    ("dot_strength_red_off", {"xla_tpu_enable_dot_strength_reduction": "false"}),
    ("licm_inflation_2", {"xla_tpu_licm_size_inflation_ratio": "2"}),
]

# round-2 refinement: winners of EXPLORE re-measured + combos (tunnel
# noise on the one shared chip is ~±1%, so every survivor gets a second
# independent compile+measure before being believed)
REFINE = [
    ("baseline", {}),
    ("no_rwb_fusion", {"xla_tpu_rwb_fusion": "false"}),
    ("dot_strength_red_off", {"xla_tpu_enable_dot_strength_reduction": "false"}),
    ("rwb+dot", {"xla_tpu_rwb_fusion": "false",
                 "xla_tpu_enable_dot_strength_reduction": "false"}),
    ("rwb+dot+licm", {"xla_tpu_rwb_fusion": "false",
                      "xla_tpu_enable_dot_strength_reduction": "false",
                      "xla_tpu_licm_size_inflation_ratio": "2"}),
]

SWEEP = REFINE if os.environ.get("AB_SWEEP") == "refine" else EXPLORE


def main():
    from dspnet_tpu.api import create_model
    from dspnet_tpu.train.solver import MultiTaskSolver
    from dspnet_tpu.utils.benchmark import canonical_train_batch

    B, H, W = 8, 512, 1024
    n = int(os.environ.get("AB_N", "15"))
    print(f"devices: {jax.devices()}")
    bundle = create_model("resnet-50_multi", (H, W), num_classes=8)
    solver = MultiTaskSolver(bundle.model, bundle.anchors,
                             compute_dtype="bfloat16", batch_size=B)
    state = solver.init_state(jax.random.PRNGKey(0), jnp.zeros((1, H, W, 3)))
    batch = canonical_train_batch(B, H, W)
    if solver._train_step is None:
        solver._train_step = solver._build_train_step()
    lowered = solver._train_step.lower(state, batch)

    results = []
    for name, opts in SWEEP:
        try:
            t0 = time.time()
            compiled = lowered.compile(compiler_options=opts) if opts \
                else lowered.compile()
            compile_s = time.time() - t0
        except Exception as e:
            print(f"{name:<24} REJECTED: {str(e)[:120]}")
            continue
        # donation: train step donates state; re-derive a fresh state per
        # variant so chained calls stay valid
        st = jax.tree.map(lambda a: a.copy() if hasattr(a, "copy") else a, state)
        for _ in range(3):
            st, metrics = compiled(st, batch)
        float(metrics["loss"])
        t0 = time.perf_counter()
        for _ in range(n):
            st, metrics = compiled(st, batch)
        float(metrics["loss"])
        dt = (time.perf_counter() - t0) / n
        results.append((dt, name))
        print(f"{name:<24} {dt * 1e3:7.2f} ms/step  ({B / dt:6.1f} img/s)"
              f"  [compile {compile_s:.0f}s]", flush=True)

    if os.environ.get("AB_PRE_S2D"):
        # the loader-side space-to-depth contract: same step, image
        # delivered as [B, H/2, W/2, 12] so no input relayout exists
        batch2 = canonical_train_batch(B, H, W, pre_s2d=True)
        lowered2 = solver._train_step.lower(state, batch2)
        for name, opts in (("pre_s2d", {}),
                           ("pre_s2d+rwb+dot",
                            {"xla_tpu_rwb_fusion": "false",
                             "xla_tpu_enable_dot_strength_reduction": "false"})):
            try:
                compiled = lowered2.compile(compiler_options=opts) if opts \
                    else lowered2.compile()
            except Exception as e:
                print(f"{name:<24} REJECTED: {str(e)[:120]}")
                continue
            st = jax.tree.map(lambda a: a.copy() if hasattr(a, "copy") else a,
                              state)
            for _ in range(3):
                st, metrics = compiled(st, batch2)
            float(metrics["loss"])
            t0 = time.perf_counter()
            for _ in range(n):
                st, metrics = compiled(st, batch2)
            float(metrics["loss"])
            dt = (time.perf_counter() - t0) / n
            results.append((dt, name))
            print(f"{name:<24} {dt * 1e3:7.2f} ms/step  ({B / dt:6.1f} img/s)",
                  flush=True)

    results.sort()
    print("\nranking:")
    for dt, name in results:
        print(f"  {dt * 1e3:7.2f} ms  {name}")


if __name__ == "__main__":
    main()
