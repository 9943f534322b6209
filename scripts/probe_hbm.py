"""Measure ACHIEVABLE HBM bandwidth on the attached chip (VERDICT r4 item 1:
don't cite the 819 GB/s paper number — measure it).

Three streaming kernels over a large f32 array:

* scale:   y = y * c   K times    (read N + write N -> 2N bytes / pass)
* add:     y = y + b   K times    (read 2N + write N -> 3N bytes / pass)
* reduce:  s = sum(x)             (read N -> N bytes)

Each jitted call runs K=8 passes via lax.fori_loop so the ~1 ms/dispatch
axon host overhead (and the one final ~30 ms sync round trip) amortize to
noise; the loop-carried buffer keeps XLA from fusing passes together.
Chained-accumulator timing per .claude/skills/verify/SKILL.md. The best
GB/s across kernels/sizes is the practical roofline for the train step's
bandwidth-bound phases.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("AXON_JOURNAL_COMPACT", "1")

import jax
import jax.numpy as jnp

K = 8  # fori_loop passes per dispatch


def timed_chain(step, y, extra=(), n=12, warmup=3):
    """Chain y = step(y, *extra) n times (donated carry), one final sync.

    Returns seconds per *dispatch* (i.e. per K memory passes)."""
    for _ in range(warmup):
        y = step(y, *extra)
    float(y[0])
    t0 = time.perf_counter()
    for _ in range(n):
        y = step(y, *extra)
    float(y[0])
    t = (time.perf_counter() - t0) / n
    del y
    return t


def main():
    print(f"devices: {jax.devices()}  (K={K} passes/dispatch)", flush=True)
    results = []
    for mib in (256, 1024, 2048):
        n_elem = mib * 1024 * 1024 // 4
        nbytes = n_elem * 4

        # reduce (N bytes/pass): sum a fori-carried (scalar + fresh sum)
        x = jax.device_put(jnp.ones((n_elem,), jnp.float32))
        jax.block_until_ready(x)
        red = jax.jit(lambda x: jnp.sum(x) * 1e-9)

        def red_chain(acc, x):
            return acc + red(x)

        acc = jnp.float32(0)
        for _ in range(3):
            acc = red_chain(acc, x)
        float(acc)
        t0 = time.perf_counter()
        for _ in range(12):
            acc = red_chain(acc, x)
        float(acc)
        t = (time.perf_counter() - t0) / 12
        gbs = nbytes / t / 1e9
        results.append(gbs)
        print(f"{mib:5d} MiB  sum    N: {gbs:7.1f} GB/s ({t * 1e3:.2f} ms)",
              flush=True)

        # scale (2N bytes/pass), K passes per dispatch, donated carry
        scale = jax.jit(
            lambda y: jax.lax.fori_loop(0, K, lambda i, y: y * 1.0000001, y),
            donate_argnums=0)
        t = timed_chain(scale, x)  # consumes x
        gbs = 2 * nbytes * K / t / 1e9
        results.append(gbs)
        print(f"{mib:5d} MiB  scale 2N: {gbs:7.1f} GB/s "
              f"({t * 1e3:.2f} ms / {K} passes)", flush=True)

        # add (3N bytes/pass)
        b = jax.device_put(jnp.full((n_elem,), 1e-9, jnp.float32))
        y0 = jax.device_put(jnp.ones((n_elem,), jnp.float32))
        jax.block_until_ready((b, y0))
        add = jax.jit(
            lambda y, b: jax.lax.fori_loop(0, K, lambda i, y: y + b, y),
            donate_argnums=0)
        t = timed_chain(add, y0, extra=(b,))
        gbs = 3 * nbytes * K / t / 1e9
        results.append(gbs)
        print(f"{mib:5d} MiB  add   3N: {gbs:7.1f} GB/s "
              f"({t * 1e3:.2f} ms / {K} passes)", flush=True)
        del b

    print(f"best achievable: {max(results):.1f} GB/s", flush=True)


if __name__ == "__main__":
    main()
