"""int8-MXU feasibility probe (VERDICT r2 item 8): s8 x s8 -> s32 conv and
matmul throughput vs bf16 on v5e, at the backbone's hot shapes.

Run on the real TPU: ``python scripts/probe_int8.py``. Prints a table; the
go/no-go rule is: build a quantized serving path only if int8 conv
throughput >= 1.5x bf16 on the shapes that dominate the inference profile.

Timing uses the chained-accumulator pattern (block_until_ready is
unreliable on the axon backend; see .claude/skills/verify/SKILL.md).
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

from dspnet_tpu.utils.benchmark import timed


def conv_flops(B, H, W, Cin, Cout, k, stride):
    return 2 * B * (H // stride) * (W // stride) * Cin * Cout * k * k


def main():
    rng = np.random.RandomState(0)
    # backbone-dominant shapes at 512x512 serving (resnet-50 stages) +
    # a big matmul as the MXU ceiling reference
    conv_cases = [
        # (name, B, H, W, Cin, Cout, k, stride)
        ("res2 3x3", 32, 128, 128, 64, 64, 3, 1),
        ("res3 3x3", 32, 64, 64, 128, 128, 3, 1),
        ("res4 3x3", 32, 32, 32, 256, 256, 3, 1),
        ("res5 3x3", 32, 16, 16, 512, 512, 3, 1),
        ("res4 1x1x1024", 32, 32, 32, 1024, 256, 1, 1),
    ]
    print(f"devices: {jax.devices()}")
    results = []
    for name, B, H, W, Cin, Cout, k, s in conv_cases:
        x8 = jnp.asarray(rng.randint(-127, 127, (B, H, W, Cin)), jnp.int8)
        w8 = jnp.asarray(rng.randint(-127, 127, (k, k, Cin, Cout)), jnp.int8)
        xb = x8.astype(jnp.bfloat16)
        wb = w8.astype(jnp.bfloat16)
        dn = jax.lax.conv_dimension_numbers(x8.shape, w8.shape,
                                            ("NHWC", "HWIO", "NHWC"))

        @jax.jit
        def conv_i8(x, w):
            y = jax.lax.conv_general_dilated(
                x, w, (s, s), "SAME", dimension_numbers=dn,
                preferred_element_type=jnp.int32)
            return y.sum().astype(jnp.float32)

        @jax.jit
        def conv_bf(x, w):
            y = jax.lax.conv_general_dilated(
                x, w, (s, s), "SAME", dimension_numbers=dn,
                preferred_element_type=jnp.float32)
            return y.sum()

        try:
            t8 = timed(conv_i8, x8, w8)
        except Exception as e:  # int8 conv may not lower on all backends
            print(f"{name}: int8 conv FAILED to compile/run: {type(e).__name__}: {e}")
            t8 = None
        tb = timed(conv_bf, xb, wb)
        fl = conv_flops(B, H, W, Cin, Cout, k, s)
        line = {
            "case": name,
            "bf16_ms": round(tb * 1e3, 3),
            "bf16_tflops": round(fl / tb / 1e12, 1),
        }
        if t8:
            line.update(int8_ms=round(t8 * 1e3, 3),
                        int8_tops=round(fl / t8 / 1e12, 1),
                        speedup=round(tb / t8, 2))
        results.append(line)
        print(line)

    # MXU ceiling: plain matmul 4096^3
    N = 4096
    a8 = jnp.asarray(rng.randint(-127, 127, (N, N)), jnp.int8)
    b8 = jnp.asarray(rng.randint(-127, 127, (N, N)), jnp.int8)

    @jax.jit
    def mm_i8(a, b):
        return jax.lax.dot(a, b, preferred_element_type=jnp.int32).sum().astype(jnp.float32)

    @jax.jit
    def mm_bf(a, b):
        return jax.lax.dot(a, b, preferred_element_type=jnp.float32).sum()

    fl = 2 * N ** 3
    try:
        t8 = timed(mm_i8, a8, b8)
        print({"case": "matmul4096", "int8_ms": round(t8 * 1e3, 3),
               "int8_tops": round(fl / t8 / 1e12, 1)})
    except Exception as e:
        print(f"matmul int8 FAILED: {type(e).__name__}: {e}")
        t8 = None
    tb = timed(mm_bf, a8.astype(jnp.bfloat16), b8.astype(jnp.bfloat16))
    print({"case": "matmul4096", "bf16_ms": round(tb * 1e3, 3),
           "bf16_tflops": round(fl / tb / 1e12, 1),
           "speedup": round(tb / t8, 2) if t8 else None})

    ok = [r.get("speedup") for r in results if r.get("speedup")]
    verdict = "GO" if ok and np.mean(ok) >= 1.5 else "NO-GO"
    print(f"VERDICT: {verdict} (mean conv speedup "
          f"{np.mean(ok):.2f} over {len(ok)} cases)" if ok else
          f"VERDICT: NO-GO (int8 path unavailable)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
