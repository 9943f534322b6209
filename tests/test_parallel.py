"""Mesh parallelism tests: DP is covered in test_train; here spatial (width)
sharding over the 'model' axis and the combined 2D mesh."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from dspnet_tpu.api import create_model
from dspnet_tpu.parallel.mesh import (
    batch_shardings_for,
    make_mesh,
    shard_batch,
    spatial_image_sharding,
)


def test_spatial_sharding_matches_unsharded(rng):
    bundle = create_model("resnet-18_multi", (128, 256), 8)
    model = bundle.model
    x = jnp.asarray(rng.randn(2, 128, 256, 3).astype(np.float32))
    v = jax.jit(lambda r, xx: model.init(r, xx, train=False))(jax.random.PRNGKey(0), x)

    mesh = make_mesh(n_data=2, n_model=4)
    rep = NamedSharding(mesh, P())
    spatial = spatial_image_sharding(mesh)
    fwd = jax.jit(lambda v, xx: model.apply(v, xx, train=False),
                  in_shardings=(rep, spatial), out_shardings=rep)
    ref = jax.jit(lambda v, xx: model.apply(v, xx, train=False))(v, x)
    out = fwd(v, jax.device_put(x, spatial))
    for k in ref:
        np.testing.assert_allclose(np.asarray(out[k]), np.asarray(ref[k]),
                                   atol=5e-5, rtol=1e-4)


def test_shard_batch_spatial(rng):
    mesh = make_mesh(n_data=2, n_model=4)
    batch = {
        "images": rng.randn(2, 64, 128, 3).astype(np.float32),
        "label_det": np.full((2, 8, 6), -1.0, np.float32),
    }
    sharded = shard_batch(mesh, batch, spatial=True)
    img_spec = sharded["images"].sharding.spec
    assert tuple(img_spec) == ("data", None, "model", None)
    lbl_spec = sharded["label_det"].sharding.spec
    assert tuple(lbl_spec)[:1] == ("data",)
    sh = batch_shardings_for(mesh, batch, spatial=False)
    assert tuple(sh["images"].spec) == ("data",)


def test_detector_mesh_sharded_inference():
    """Serving batches shard over the mesh 'data' axis; results match the
    single-device detector exactly."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from dspnet_tpu.api import create_model
    from dspnet_tpu.detect.detector import Detector
    from dspnet_tpu.parallel.mesh import make_mesh

    H, W = 128, 256
    bundle = create_model("resnet-18_multi", (H, W), num_classes=8)
    variables = jax.jit(lambda r, x: bundle.model.init(r, x, train=False))(
        jax.random.PRNGKey(0), jnp.zeros((1, H, W, 3)))
    mesh = make_mesh(n_data=4)
    det_mesh = Detector(bundle.model, variables, bundle.anchors, (H, W), mesh=mesh)
    det_one = Detector(bundle.model, variables, bundle.anchors, (H, W))
    raw = np.random.RandomState(0).randint(0, 255, (4, H, W, 3)).astype(np.uint8)
    rm = det_mesh.predict_raw(raw)
    r1 = det_one.predict_raw(raw)
    np.testing.assert_allclose(np.asarray(rm["det"]), np.asarray(r1["det"]), atol=1e-5)
    np.testing.assert_array_equal(np.asarray(rm["seg"]), np.asarray(r1["seg"]))


def test_detector_mesh_pads_small_batches():
    """Batch sizes that don't divide the data axis (incl. b1 serving /
    im_detect_single) are padded on the host and sliced back."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from dspnet_tpu.api import create_model
    from dspnet_tpu.detect.detector import Detector
    from dspnet_tpu.parallel.mesh import make_mesh

    H, W = 128, 256
    bundle = create_model("resnet-18_multi", (H, W), num_classes=8)
    variables = jax.jit(lambda r, x: bundle.model.init(r, x, train=False))(
        jax.random.PRNGKey(0), jnp.zeros((1, H, W, 3)))
    mesh = make_mesh(n_data=4)
    det_mesh = Detector(bundle.model, variables, bundle.anchors, (H, W), mesh=mesh)
    det_one = Detector(bundle.model, variables, bundle.anchors, (H, W))
    raw = np.random.RandomState(1).randint(0, 255, (3, H, W, 3)).astype(np.uint8)
    rm = det_mesh.predict_raw(raw)
    r1 = det_one.predict_raw(raw)
    assert np.asarray(rm["det"]).shape[0] == 3
    np.testing.assert_allclose(np.asarray(rm["det"]), np.asarray(r1["det"]), atol=1e-5)
    dets, seg = det_mesh.im_detect_single(raw[0])  # b1 on a 4-chip mesh
    assert seg.shape == (H // 4, W // 4)
