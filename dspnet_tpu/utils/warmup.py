"""Prime the device->host transfer channel in the background.

The FIRST device->host readback of a process on the axon backend stalls
for minutes (measured 90.7 s / 201.5 s / >580 s across runs; every later
fetch is milliseconds — docs/LOWERING_NOTE.md). Left alone, that cost
lands on whatever fetches first: a metric sync, a bench warmup, or — when
a device-resident array is closed over a jitted fn — ``.lower()`` itself
(mlir ``ir_constant`` -> ``array._value``), which is how it masqueraded
as an "8.6-minute lowering" of the b128 exact-seg graph.

:func:`prime_d2h_async` dispatches a 4-byte readback on a daemon thread
at init time, so the stall runs concurrently with the multi-minute XLA
compile instead of serializing after it. The stall is idle waiting (the
stuck process sits at ~1% CPU), so the overlap is free; JAX dispatch is
thread-safe. No-op on CPU and on every call after the first.
"""

from __future__ import annotations

import threading

_lock = threading.Lock()
_thread: threading.Thread | None = None


def prime_d2h_async() -> None:
    """Start the one-time background device->host readback (idempotent)."""
    global _thread
    with _lock:
        if _thread is not None:
            return
        import jax

        if jax.devices()[0].platform == "cpu":
            _thread = threading.current_thread()  # mark done
            return

        def _work() -> None:
            try:
                import jax.numpy as jnp
                import numpy as np

                x = jax.jit(lambda: jnp.zeros((), jnp.float32))()
                np.asarray(x)
            except Exception:
                pass  # priming is best-effort; the real fetch pays instead

        _thread = threading.Thread(target=_work, daemon=True, name="d2h-prime")
        _thread.start()


def wait_primed(timeout: float | None = None) -> None:
    """Block until the priming fetch finished (for tests/benchmarks)."""
    t = _thread
    if t is not None and t is not threading.current_thread():
        t.join(timeout)
