"""Training-step tests: loss semantics, SGD parity, 8-device DP mesh."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from dspnet_tpu.models import factory
from dspnet_tpu.models.dspnet import DSPNet
from dspnet_tpu.parallel.mesh import make_mesh, shard_batch
from dspnet_tpu.train import losses
from dspnet_tpu.train.lr import lr_scheduler_from_epochs, multifactor_schedule
from dspnet_tpu.train.optim import mxnet_sgd
from dspnet_tpu.train.solver import MultiTaskSolver


def test_smooth_l1():
    x = jnp.asarray([-2.0, -0.5, 0.0, 0.5, 2.0])
    got = np.asarray(losses.smooth_l1(x, 1.0))
    want = np.asarray([1.5, 0.125, 0.0, 0.125, 1.5])
    np.testing.assert_allclose(got, want, rtol=1e-6)


def test_cls_loss_ignores_negative_labels():
    logits = jnp.zeros((1, 4, 3))
    tgt = jnp.asarray([[0.0, 1.0, -1.0, 2.0]])
    loss, count = losses.cls_loss_valid(logits, tgt)
    assert int(count) == 3
    np.testing.assert_allclose(float(loss), np.log(3.0), rtol=1e-6)


def test_seg_loss_null_normalization_sums():
    logits = jnp.zeros((1, 2, 2, 19))
    lbl = jnp.asarray([[[0, 255], [3, 255]]])
    s = losses.seg_loss(logits, lbl, grad_scale=4.0)
    np.testing.assert_allclose(float(s), 4.0 * 2 * np.log(19.0), rtol=1e-6)


def test_mxnet_sgd_update_rule():
    """One step must equal: mom = mu*mom - lr*(g/r + wd*w); w += mom."""
    params = {"w": jnp.asarray([1.0, -2.0])}
    grads = {"w": jnp.asarray([0.5, 0.25])}
    lr, mu, wd, bs = 0.1, 0.9, 5e-4, 2
    tx = mxnet_sgd(lr, mu, wd, rescale_grad=1.0 / bs)
    st = tx.init(params)
    upd, st = tx.update(grads, st, params)
    new_w = params["w"] + upd["w"]
    want = np.asarray([1.0, -2.0]) + (
        -lr * (np.asarray([0.5, 0.25]) / bs + wd * np.asarray([1.0, -2.0]))
    )
    np.testing.assert_allclose(np.asarray(new_w), want, rtol=1e-6)
    # second step uses momentum buffer
    upd2, st = tx.update(grads, st, {"w": new_w})
    mom1 = upd["w"]
    want2 = mu * np.asarray(mom1) - lr * (np.asarray([0.5, 0.25]) / bs + wd * np.asarray(new_w))
    np.testing.assert_allclose(np.asarray(upd2["w"]), want2, rtol=1e-5)


def test_multifactor_schedule():
    sched = multifactor_schedule(1.0, [10, 20], 0.5)
    assert float(sched(0)) == 1.0
    assert float(sched(10)) == 0.5
    assert float(sched(25)) == 0.25
    lr, sched2 = lr_scheduler_from_epochs(0.02, "80,160", 0.5, 2975, 32, begin_epoch=100)
    np.testing.assert_allclose(lr, 0.01)
    epoch_size = 2975 // 32
    assert float(sched2(epoch_size * 60)) == pytest.approx(0.005)


def _tiny_batch(rng, B, H, W):
    labels = np.full((B, 8, 6), -1.0, np.float32)
    labels[:, 0] = [1.0, 0.3, 0.3, 0.6, 0.7, 0.4]
    seg = rng.randint(0, 19, (B, H // 4, W // 4)).astype(np.int32)
    seg[:, 0, :] = 255
    return {
        "images": rng.randn(B, H, W, 3).astype(np.float32),
        "label_det": labels,
        "seg_label": seg,
    }


def test_single_device_train_step_decreases_loss(rng):
    H, W = 128, 256
    cfg = factory.get_config("resnet-18", 512)
    model = DSPNet(cfg=cfg, num_classes=8, task="multi")
    anchors = factory.build_anchors(cfg.drop_first_tap(), (H, W))
    solver = MultiTaskSolver(model, anchors, learning_rate=1e-3, batch_size=2,
                             seg_normalize="valid")
    batch = _tiny_batch(rng, 2, H, W)
    state = solver.init_state(jax.random.PRNGKey(0), jnp.asarray(batch["images"]))
    state, m0 = solver.train_step(state, batch)
    for _ in range(5):
        state, m = solver.train_step(state, batch)
    assert float(m["loss"]) < float(m0["loss"])
    assert int(state.step) == 6


def test_pre_s2d_batch_matches_plain_batch(rng):
    """The loader-side space-to-depth contract (images delivered as
    [B, H/2, W/2, 12], models/resnet.py stem) must produce the same loss
    trajectory and state as the plain [B, H, W, 3] batch — the transform
    is a pure relayout the model undoes by kernel reindexing."""
    from dspnet_tpu.utils.benchmark import host_space_to_depth

    H, W = 128, 256
    cfg = factory.get_config("resnet-18", 512)
    model = DSPNet(cfg=cfg, num_classes=8, task="multi")
    anchors = factory.build_anchors(cfg.drop_first_tap(), (H, W))

    batch = _tiny_batch(rng, 2, H, W)
    batch_s2d = dict(batch, images=host_space_to_depth(batch["images"]))
    assert batch_s2d["images"].shape == (2, H // 2, W // 2, 12)

    losses = {}
    for name, b in (("plain", batch), ("s2d", batch_s2d)):
        solver = MultiTaskSolver(model, anchors, learning_rate=1e-3,
                                 batch_size=2, seg_normalize="valid")
        state = solver.init_state(
            jax.random.PRNGKey(0), jnp.zeros((1, H, W, 3)))
        traj = []
        for _ in range(3):
            state, m = solver.train_step(state, b)
            traj.append(float(m["loss"]))
        losses[name] = traj
    np.testing.assert_allclose(losses["plain"], losses["s2d"],
                               rtol=2e-4, atol=1e-5)


def test_fit_aborts_on_divergence(rng):
    """A NaN loss must abort fit() with TrainingDiverged instead of training
    (and checkpointing) garbage for the rest of the run."""
    from dspnet_tpu.train.solver import TrainingDiverged

    # unit: the guard fires on any non-finite metric, passes finite ones
    MultiTaskSolver._check_finite({"loss": 1.0, "ce": 0.5}, 0, 20)
    with pytest.raises(TrainingDiverged, match="epoch 3 batch 20"):
        MultiTaskSolver._check_finite({"loss": float("nan")}, 3, 20)
    with pytest.raises(TrainingDiverged, match="seg-normalize"):
        MultiTaskSolver._check_finite({"loss": float("inf")}, 0, 1)

    # integration: a batch with non-finite pixels NaNs the first step; the
    # loop must raise at its first log sync rather than keep iterating
    H, W = 128, 256
    cfg = factory.get_config("resnet-18", 512)
    model = DSPNet(cfg=cfg, num_classes=8, task="multi")
    anchors = factory.build_anchors(cfg.drop_first_tap(), (H, W))
    solver = MultiTaskSolver(model, anchors, learning_rate=1e-3, batch_size=2,
                             seg_normalize="valid")
    batch = _tiny_batch(rng, 2, H, W)
    batch["images"][0, 0, 0, 0] = np.nan
    state = solver.init_state(jax.random.PRNGKey(0), jnp.asarray(batch["images"]))
    with pytest.raises(TrainingDiverged):
        solver.fit(state, [batch] * 3, num_epochs=1, eval_every=0,
                   log_every=1, log_fn=lambda *_: None)


def test_data_parallel_mesh_8_devices(rng):
    assert jax.device_count() == 8
    H, W = 128, 256
    cfg = factory.get_config("resnet-18", 512)
    model = DSPNet(cfg=cfg, num_classes=8, task="multi")
    anchors = factory.build_anchors(cfg.drop_first_tap(), (H, W))
    mesh = make_mesh()
    assert mesh.shape["data"] == 8
    solver = MultiTaskSolver(model, anchors, learning_rate=1e-3, batch_size=8,
                             mesh=mesh, seg_normalize="valid")
    batch = shard_batch(mesh, _tiny_batch(rng, 8, H, W))
    state = solver.init_state(jax.random.PRNGKey(0), jnp.asarray(batch["images"]))
    state, metrics = solver.train_step(state, batch)
    assert np.isfinite(float(metrics["loss"]))
    # params must stay replicated after the update
    leaf = jax.tree_util.tree_leaves(state.params)[0]
    assert leaf.sharding.is_fully_replicated

    # the loaders' space-to-depth batch contract shards and steps the same
    # way (images [B, H/2, W/2, 12]; boundary-beta strip slices under pjit)
    from dspnet_tpu.utils.benchmark import host_space_to_depth

    b2 = _tiny_batch(rng, 8, H, W)
    b2["images"] = host_space_to_depth(b2["images"])
    b2 = shard_batch(mesh, b2)
    state, metrics = solver.train_step(state, b2)
    assert np.isfinite(float(metrics["loss"]))


def test_eval_cadence_uses_absolute_epoch(rng, monkeypatch):
    """A resumed fit() (epoch_offset > 0) must keep the eval schedule
    anchored on ABSOLUTE epochs: eval_every=4 evals after epochs 3, 7, ...
    regardless of where the resume started. (The r5 scale rehearsal resumed
    from epoch 3 and silently shifted its 500-image evals by the offset.)"""
    H, W = 128, 256
    cfg = factory.get_config("resnet-18", 512)
    model = DSPNet(cfg=cfg, num_classes=8, task="multi")
    anchors = factory.build_anchors(cfg.drop_first_tap(), (H, W))
    solver = MultiTaskSolver(model, anchors, learning_rate=1e-3, batch_size=2,
                             seg_normalize="valid")
    batch = _tiny_batch(rng, 2, H, W)
    state = solver.init_state(jax.random.PRNGKey(0),
                              jnp.asarray(batch["images"]))

    evaled = []
    import dspnet_tpu.evaluate.loop as eval_loop

    def fake_eval(detector, it, log_fn=None, **kw):
        evaled.append(None)
        return {}

    monkeypatch.setattr(eval_loop, "evaluate_model", fake_eval)
    val_rows = []
    # resume at absolute epoch 2, run 4 epochs (abs 2..5): with
    # eval_every=4 only absolute epoch 3 matches ((ep+1) % 4 == 0)
    solver.fit(state, [batch], num_epochs=4, eval_iter=[batch],
               eval_every=4, data_shape=(H, W), epoch_offset=2,
               log_fn=lambda *_: None, log_every=100,
               metrics_sink=lambda ep, split, m: val_rows.append((ep, split)))
    assert len(evaled) == 1
    assert ("train", ) == tuple({s for _, s in val_rows if s == "train"})
    assert (3, "val") in val_rows
