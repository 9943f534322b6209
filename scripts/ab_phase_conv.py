"""A/B bench of the Deconv2x variants (VERDICT r2 item 4).

The seg head's final 4x4 stride-2 transposed conv (reference
multitask_symbol_builder.py:316-318) has two mathematically-equal
implementations in models/layers.py: the plain ``lax.conv_transpose`` and
``phase_conv=True`` (stride-1 conv producing the 4 subpixel phases +
depth-to-space). This measures BOTH as the standalone op at seg-head
shapes AND embedded in the full multitask forward (b128 inference) /
train step (b4 512x1024), on the real TPU.

Decision rule: enable phase_conv in SegHead if it wins either embedded
measurement by >2%; delete it (and its equivalence test) if it loses both.
"""

import os
import sys

# running as `python scripts/foo.py` puts scripts/ (not the repo
# root) on sys.path; make `import dspnet_tpu` work regardless of cwd
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("AXON_JOURNAL_COMPACT", "1")

import jax
import jax.numpy as jnp
import numpy as np

from dspnet_tpu.utils.benchmark import (
    canonical_train_batch,
    timed,
    timed_train_steps,
)


def bench_standalone():
    from dspnet_tpu.models.layers import Deconv2x

    print("== standalone Deconv2x (19ch out), bf16 ==")
    for B, H, W in [(128, 128, 128), (4, 128, 256)]:
        x = jnp.asarray(np.random.RandomState(0).randn(B, H, W, 19),
                        jnp.bfloat16)
        for phase in (False, True):
            m = Deconv2x(19, phase_conv=phase)
            v = m.init(jax.random.PRNGKey(0), x)
            f = jax.jit(lambda v, x: m.apply(v, x).astype(jnp.float32).sum())
            t = timed(f, v, x)
            print(f"  B{B} {H}x{W} phase={phase}: {t * 1e3:.3f} ms")


def bench_embedded(phase: bool):
    """Full multitask forward (b128 512x512) + train step (b4 512x1024)."""
    import dspnet_tpu.models.seg_head as seg_head
    from dspnet_tpu.models.layers import Deconv2x as _D

    # patch the head's deconv for the B arm (parameter layout is identical)
    orig = seg_head.Deconv2x
    seg_head.Deconv2x = (lambda feats, name=None:
                         _D(feats, phase_conv=phase, name=name))
    try:
        from dspnet_tpu.api import create_model
        from dspnet_tpu.train.solver import MultiTaskSolver
        from dspnet_tpu.utils.precision import bf16_variables

        # inference b128 512x512 (the bench.py configuration, seg_fast off)
        bundle = create_model("resnet-50_multi", (512, 512), num_classes=8)
        model = bundle.model
        imgs = jax.random.normal(jax.random.PRNGKey(0), (128, 512, 512, 3))
        v = jax.jit(lambda r, x: model.init(r, x, train=False))(
            jax.random.PRNGKey(0), imgs[:1])
        v = bf16_variables(v)

        @jax.jit
        def fwd(v, x):
            out = model.apply(v, x.astype(jnp.bfloat16), train=False)
            return out["seg_logits"].astype(jnp.float32).sum()

        t_inf = timed(fwd, v, imgs, n=10)
        print(f"  phase={phase} inference fwd b128 512x512: {t_inf * 1e3:.2f} ms"
              f" ({128 / t_inf:.0f} img/s)")

        # train step b4 512x1024
        B, H, W = 4, 512, 1024
        bundle2 = create_model("resnet-50_multi", (H, W), num_classes=8)
        solver = MultiTaskSolver(bundle2.model, bundle2.anchors,
                                 compute_dtype="bfloat16", batch_size=B)
        state = solver.init_state(jax.random.PRNGKey(0), jnp.zeros((1, H, W, 3)))
        batch = canonical_train_batch(B, H, W)
        state, t_tr = timed_train_steps(solver, state, batch)
        print(f"  phase={phase} train step b4 512x1024: {t_tr * 1e3:.2f} ms")
        return t_inf, t_tr
    finally:
        seg_head.Deconv2x = orig


def main():
    print(f"devices: {jax.devices()}")
    bench_standalone()
    print("== embedded ==")
    a = bench_embedded(False)
    b = bench_embedded(True)
    inf_gain = (a[0] - b[0]) / a[0]
    tr_gain = (a[1] - b[1]) / a[1]
    win = inf_gain > 0.02 or tr_gain > 0.02
    print(f"phase_conv gains: inference {inf_gain * 100:+.1f}%, "
          f"train {tr_gain * 100:+.1f}% -> "
          f"{'ENABLE in SegHead' if win else 'DELETE the variant'}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
