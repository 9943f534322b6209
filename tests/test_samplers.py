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
