"""Gradient accumulation: k microbatches -> one optimizer update.

Semantics: summed grads with rescale_grad = 1/(batch*k) (the MXNet
rescale convention extended to the effective batch), BN stats updated per
microbatch, optimizer step counter advances once per k. Feeding the SAME
batch twice with grad_accum=2 must reproduce the single-step update
exactly (2g / (2b) == g / b); a partial tail chunk still applies.
"""

import numpy as np
import jax.numpy as jnp
import pytest


HW = (128, 256)


@pytest.fixture(scope="module")
def bundle():
    from dspnet_tpu.api import create_model

    return create_model("resnet-18_multi", HW, 8)


def _batch(rng, b=2):
    H, W = HW
    label = np.full((b, 200, 6), -1, np.float32)
    label[:, 0] = [1, 0.2, 0.2, 0.7, 0.8, 0.3]
    label[:, 1] = [3, 0.1, 0.4, 0.4, 0.9, 0.1]
    seg = rng.randint(0, 19, (b, H // 4, W // 4)).astype(np.int32)
    return {
        "images": rng.randn(b, H, W, 3).astype(np.float32),
        "label_det": label,
        "seg_label": seg,
    }


def _solver(bundle, **kw):
    import jax

    from dspnet_tpu.train.solver import MultiTaskSolver

    s = MultiTaskSolver(
        bundle.model, bundle.anchors, learning_rate=1e-2,
        seg_normalize="valid", **kw)
    state = s.init_state(jax.random.PRNGKey(0), jnp.zeros((2, *HW, 3)))
    return s, state


def test_same_batch_twice_matches_single_step(bundle):
    import jax

    rng = np.random.RandomState(7)
    batch = _batch(rng)

    s1, st1 = _solver(bundle, batch_size=2)
    st1, _ = s1.train_step(st1, batch)

    s2, st2 = _solver(bundle, batch_size=2, grad_accum=2)
    st2 = s2.fit(st2, [batch, batch], num_epochs=1, eval_every=0,
                 log_fn=lambda *_: None)

    assert int(st2.step) == 1
    flat1 = jax.tree.leaves(st1.params)
    flat2 = jax.tree.leaves(st2.params)
    for a, b in zip(flat1, flat2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-5, atol=2e-6)


def test_partial_tail_chunk_applies(bundle):
    rng = np.random.RandomState(3)
    batches = [_batch(rng) for _ in range(3)]
    s, st = _solver(bundle, batch_size=2, grad_accum=2)
    st = s.fit(st, batches, num_epochs=1, eval_every=0, log_fn=lambda *_: None)
    # 3 microbatches at accum 2 -> one full update + one tail update
    assert int(st.step) == 2


def test_train_step_guard(bundle):
    s, st = _solver(bundle, batch_size=2, grad_accum=2)
    with pytest.raises(AssertionError):
        s.train_step(st, _batch(np.random.RandomState(0)))


def test_accum_on_mesh(bundle):
    """Accumulation composes with data-parallel mesh sharding (the
    replicated-state/sharded-batch jit path)."""
    from dspnet_tpu.parallel.mesh import make_mesh

    rng = np.random.RandomState(11)
    mesh = make_mesh(n_data=2, n_model=1)
    s, st = _solver(bundle, batch_size=2, grad_accum=2, mesh=mesh)
    st = s.fit(st, [_batch(rng), _batch(rng)], num_epochs=1, eval_every=0,
               log_fn=lambda *_: None)
    assert int(st.step) == 1


def test_accum_on_spatial_mesh(bundle):
    """Accumulation composes with spatial width sharding (the memoized
    per-key-set jit path of _jit_with_batch)."""
    from dspnet_tpu.parallel.mesh import make_mesh

    rng = np.random.RandomState(13)
    mesh = make_mesh(n_data=1, n_model=2)
    s, st = _solver(bundle, batch_size=2, grad_accum=2, mesh=mesh,
                    spatial=True)
    st = s.fit(st, [_batch(rng), _batch(rng)], num_epochs=1, eval_every=0,
               log_fn=lambda *_: None)
    assert int(st.step) == 1


def test_accum_carries_across_epochs(bundle):
    """3 microbatches/epoch at accum 2 must NOT under-scale a per-epoch
    tail: chunks span epoch boundaries, so 2 epochs x 3 batches = 3 full
    updates and no partial flush."""
    rng = np.random.RandomState(5)
    batches = [_batch(rng) for _ in range(3)]
    s, st = _solver(bundle, batch_size=2, grad_accum=2)
    st = s.fit(st, batches, num_epochs=2, eval_every=0, log_fn=lambda *_: None)
    assert int(st.step) == 3


def test_eval_every_zero_with_eval_iter(bundle):
    """eval_iter + eval_every=0 skips eval instead of ZeroDivisionError."""
    rng = np.random.RandomState(9)
    s, st = _solver(bundle, batch_size=2)
    st = s.fit(st, [_batch(rng)], num_epochs=1, eval_iter=[], eval_every=0,
               data_shape=HW, log_fn=lambda *_: None)
    assert int(st.step) == 1
