"""Rand crop/pad sampler + config tests."""

import numpy as np

from dspnet_tpu.data.rand_sampler import RandCropper, RandPadder
from dspnet_tpu.utils.config import cfg, config_as_dict


def _label(rows):
    out = np.full((10, 5), -1.0)
    out[: len(rows)] = rows
    return out


def test_rand_cropper_constraints(rng):
    label = _label([[0, 0.4, 0.4, 0.6, 0.6]])
    c = RandCropper(min_scale=0.5, max_scale=0.9, min_aspect_ratio=0.5,
                    max_aspect_ratio=2.0, min_overlap=0.1, max_trials=100, max_sample=5)
    samples = c.sample(label, rng)
    assert samples, "should find crops around a centered box"
    for box, lbl in samples:
        l, t, r, b = box
        assert 0 <= l < r <= 1 and 0 <= t < b <= 1
        valid = lbl[lbl[:, 0] >= 0]
        assert valid.shape[0] >= 1
        assert np.all(valid[:, 1:] >= 0) and np.all(valid[:, 1:] <= 1)
        # the GT center must lie inside the crop (gt_constraint='center')
        cx, cy = 0.5, 0.5
        assert l <= cx <= r and t <= cy <= b


def test_rand_padder(rng):
    label = _label([[1, 0.3, 0.3, 0.7, 0.7]])
    p = RandPadder(min_scale=1.5, max_scale=3.0, min_aspect_ratio=0.5,
                   max_aspect_ratio=2.0, min_gt_scale=0.05, max_trials=100, max_sample=3)
    samples = p.sample(label, rng)
    assert samples
    for box, lbl in samples:
        l, t, r, b = box
        assert (r - l) >= 1.0 or (b - t) >= 1.0  # padding canvas is >= image
        valid = lbl[lbl[:, 0] >= 0]
        w = valid[:, 3] - valid[:, 1]
        h = valid[:, 4] - valid[:, 2]
        assert np.all(np.minimum(w, h) >= 0.05)


def test_cfg_presets():
    assert len(cfg.train.rand_crop_samplers) == 5
    assert cfg.train.seed == 233
    flat = config_as_dict({"a": {"b": 1}, "c": 2})
    assert flat == {"a_b": 1, "c": 2}
    # reference config/config.py:50-51 jitter preset is live surface
    assert cfg.train.color_jitter.random_hue_prob == 0.5
    assert cfg.train.color_jitter.max_random_contrast == 0.5
    assert cfg.valid.color_jitter.random_hue_prob == 0.0


def test_color_jitter():
    """hue/sat/illumination/contrast ops: deterministic under seed,
    each op's no-op configuration is the identity, magnitudes bounded
    (reference config/config.py:22-29 defaults via the C++ augmenter)."""
    from dspnet_tpu.data.augment import color_jitter

    img = np.random.RandomState(0).randint(0, 256, (32, 48, 3), np.uint8)
    off = {"random_hue_prob": 0.0, "max_random_hue": 18,
           "random_saturation_prob": 0.0, "max_random_saturation": 32,
           "random_illumination_prob": 0.0, "max_random_illumination": 32,
           "random_contrast_prob": 0.0, "max_random_contrast": 0.5}
    # all probs zero -> identity, rng untouched
    r = np.random.RandomState(1)
    out = color_jitter(img, off, r)
    np.testing.assert_array_equal(out, img)
    assert r.rand() == np.random.RandomState(1).rand()

    # determinism: same seed, same draws
    on = dict(off, random_hue_prob=1.0, random_saturation_prob=1.0,
              random_illumination_prob=1.0, random_contrast_prob=1.0)
    a = color_jitter(img, on, np.random.RandomState(233))
    b = color_jitter(img, on, np.random.RandomState(233))
    np.testing.assert_array_equal(a, b)
    assert a.dtype == np.uint8 and a.shape == img.shape
    assert np.any(a != img)

    # illumination alone: shift bounded by max_random_illumination (+clip)
    ill = dict(off, random_illumination_prob=1.0)
    c = color_jitter(img, ill, np.random.RandomState(5))
    d = c.astype(np.int32) - img.astype(np.int32)
    interior = (img > 40) & (img < 215)  # away from the clip rails
    deltas = np.unique(d[interior])
    assert len(deltas) == 1 and abs(int(deltas[0])) <= 32

    # contrast alone: exact affine about the grayscale mean
    con = dict(off, random_contrast_prob=1.0)
    rng2 = np.random.RandomState(7)
    e = color_jitter(img, con, rng2)
    ref_rng = np.random.RandomState(7)
    ref_rng.rand()  # the op's probability gate draw
    alpha = 1.0 + ref_rng.uniform(-0.5, 0.5)
    import cv2

    mean = float(cv2.cvtColor(img, cv2.COLOR_BGR2GRAY).mean())
    expect = np.clip(img.astype(np.float32) * alpha + (1 - alpha) * mean,
                     0, 255).astype(np.uint8)
    np.testing.assert_array_equal(e, expect)
