"""Utility tests: JAX warp parity, shapes dump, profiler, precision."""

import numpy as np
import pytest

import jax.numpy as jnp


def test_jax_warp_matches_cv2(rng):
    import cv2

    from dspnet_tpu.data.augment import warp_affine_batch_jax

    img = rng.randint(0, 255, (40, 60, 3)).astype(np.uint8)
    M = np.array([[1.2, 0.1, -3.0], [-0.05, 0.9, 2.0]])
    want = cv2.warpAffine(img.astype(np.float32), M, (50, 30),
                          flags=cv2.INTER_LINEAR, borderValue=(128, 128, 128))
    got = np.asarray(
        warp_affine_batch_jax(jnp.asarray(img[None], jnp.float32),
                              jnp.asarray(M[None]), (30, 50), 128.0)
    )[0]
    np.testing.assert_allclose(got, want, atol=1.0)  # cv2 uses Q5 fixed point

    want_n = cv2.warpAffine(img[:, :, 0], M, (50, 30),
                            flags=cv2.INTER_NEAREST, borderValue=255)
    got_n = np.asarray(
        warp_affine_batch_jax(jnp.asarray(img[None, :, :, 0], jnp.float32),
                              jnp.asarray(M[None]), (30, 50), 255.0, nearest=True)
    )[0]
    mismatch = np.mean(got_n != want_n)
    assert mismatch < 0.05  # rounding boundaries only


def test_intermediate_shapes():
    from dspnet_tpu.models import factory
    from dspnet_tpu.models.dspnet import DSPNet
    from dspnet_tpu.utils.shapes import intermediate_shapes

    model = DSPNet(cfg=factory.get_config("resnet-18", 512), num_classes=8, task="multi")
    shapes = intermediate_shapes(model, (128, 256))
    assert any("backbone" in k for k in shapes)
    seg_out = [v for k, v in shapes.items() if k.startswith("seg/") and "__call__" in k]
    assert (1, 32, 64, 19) in seg_out


def test_precision_cast():
    from dspnet_tpu.utils.precision import bf16_variables

    tree = {"a": jnp.zeros((2,), jnp.float32), "b": jnp.zeros((2,), jnp.int32)}
    out = bf16_variables(tree)
    assert out["a"].dtype == jnp.bfloat16
    assert out["b"].dtype == jnp.int32


def test_speedometer_and_timer(caplog):
    import logging
    from dspnet_tpu.utils.profiler import Speedometer, StepTimer

    logger = logging.getLogger("test_speedo")
    s = Speedometer(batch_size=4, frequent=2, logger=logger)
    with caplog.at_level(logging.INFO, logger="test_speedo"):
        s(0, {"loss": 1.0})
        s(0, {"loss": 0.9})
    assert any("Speed" in r.message for r in caplog.records)
    t = StepTimer()
    with t:
        pass
    assert t.count == 1 and t.ms_per_step >= 0


def test_voc_palette_roundtrip(tmp_path):
    import cv2
    import numpy as np
    from dspnet_tpu.tools import voc_palette as vp

    pal = vp.voc_palette()
    # canonical VOC colors: background black, class 1 maroon, class 15 person
    assert tuple(pal[0]) == (0, 0, 0)
    assert tuple(pal[1]) == (128, 0, 0)
    assert tuple(pal[15]) == (192, 128, 128)
    idx = np.random.RandomState(0).randint(0, 21, (16, 24)).astype(np.uint8)
    rgb = vp.index_to_palette(idx)
    back = vp.palette_to_index(rgb)
    np.testing.assert_array_equal(back, idx)
    # unknown color -> 255 void
    weird = np.full((2, 2, 3), (1, 2, 3), np.uint8)
    assert (vp.palette_to_index(weird) == 255).all()
    # CLI roundtrip through PNG files
    src = str(tmp_path / "color.png")
    dst = str(tmp_path / "index.png")
    cv2.imwrite(src, rgb[:, :, ::-1])
    vp.main([src, dst])
    np.testing.assert_array_equal(cv2.imread(dst, cv2.IMREAD_GRAYSCALE), idx)
