"""On-device augmentation pipeline parity vs the host cv2 path."""

import numpy as np
import pytest

from dspnet_tpu.data import synthetic
from dspnet_tpu.data.device_pipeline import DeviceAugIterator
from dspnet_tpu.data.iterator import MultiTaskIterator


@pytest.fixture(scope="module")
def dataset(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("dev_synth"))
    return synthetic.build_dataset(root, num_samples=6, hw=(128, 256))


@pytest.mark.parametrize("enable_aug", [False, True])
def test_device_pipeline_matches_host(dataset, enable_aug):
    # raw 128x256 -> warped to 64x128 exercises the rescale factor too
    kw = dict(batch_size=2, data_shape=(64, 128), enable_aug=enable_aug, shuffle=True)
    host = MultiTaskIterator(dataset, **kw)
    dev = DeviceAugIterator(dataset, **kw)
    hi, di = host.epoch(), dev.epoch()
    for _ in range(3):
        hb, hn = next(hi)
        db, dn = next(di)
        assert hn == dn
        # box labels: identical math in f32 vs f64 -> tight tolerance
        np.testing.assert_allclose(
            np.asarray(db["label_det"]), hb["label_det"], atol=2e-4)
        # pixels: float bilinear vs cv2 fixed-point bilinear
        diff = np.abs(np.asarray(db["images"]) - hb["images"])
        assert np.mean(diff) < 1.0, f"mean abs diff {np.mean(diff)}"
        assert np.percentile(diff, 99) <= 16.0
        seg_mismatch = np.mean(np.asarray(db["seg_label"]) != hb["seg_label"])
        assert seg_mismatch < 0.02, f"seg mismatch rate {seg_mismatch}"


def test_device_pipeline_sharded(dataset):
    kw = dict(batch_size=1, data_shape=(64, 128), enable_aug=True, shuffle=True)
    ref = [b for b, _ in DeviceAugIterator(dataset, **kw).epoch()]
    it = DeviceAugIterator(dataset, shard=(1, 2), **kw)
    for k, (b, _) in enumerate(it.epoch()):
        np.testing.assert_array_equal(
            np.asarray(b["label_det"]), np.asarray(ref[2 * k + 1]["label_det"]))


def test_device_pipeline_rejects_mixed_sizes(tmp_path):
    import cv2

    from dspnet_tpu.data.iterator import Sample, SampleIndex

    p1, p2 = str(tmp_path / "a.jpg"), str(tmp_path / "b.jpg")
    cv2.imwrite(p1, np.zeros((32, 64, 3), np.uint8))
    cv2.imwrite(p2, np.zeros((64, 64, 3), np.uint8))
    idx = SampleIndex([
        Sample(p1, SampleIndex.pad_label(np.zeros((0, 6), np.float32))),
        Sample(p2, SampleIndex.pad_label(np.zeros((0, 6), np.float32))),
    ])
    it = DeviceAugIterator(idx, batch_size=2, data_shape=(32, 64), shuffle=False)
    with pytest.raises(AssertionError, match="mixed raw resolutions"):
        next(it.epoch())


@pytest.mark.parametrize("enable_aug", [False, True])
def test_device_pipeline_predownscale(dataset, enable_aug):
    # host pre-resize to train res: labels identical to the one-step path
    # (geometry is resolution-independent), pixels close
    kw = dict(batch_size=2, data_shape=(64, 128), enable_aug=enable_aug,
              shuffle=True)
    ref = DeviceAugIterator(dataset, **kw)
    pre = DeviceAugIterator(dataset, predownscale=True, **kw)
    (rb, rn), (pb, pn) = next(ref.epoch()), next(pre.epoch())
    assert rn == pn
    np.testing.assert_allclose(
        np.asarray(pb["label_det"]), np.asarray(rb["label_det"]), atol=2e-4)
    diff = np.abs(np.asarray(pb["images"]) - np.asarray(rb["images"]))
    assert np.mean(diff) < 4.0, f"mean abs diff {np.mean(diff)}"
    seg_mismatch = np.mean(np.asarray(pb["seg_label"]) != np.asarray(rb["seg_label"]))
    assert seg_mismatch < 0.05, f"seg mismatch rate {seg_mismatch}"


def test_device_pipeline_predownscale_mixed_sizes(tmp_path):
    import cv2

    from dspnet_tpu.data.iterator import Sample, SampleIndex

    p1, p2 = str(tmp_path / "a.jpg"), str(tmp_path / "b.jpg")
    cv2.imwrite(p1, np.full((32, 64, 3), 60, np.uint8))
    cv2.imwrite(p2, np.full((96, 64, 3), 200, np.uint8))
    idx = SampleIndex([
        Sample(p1, SampleIndex.pad_label(np.zeros((0, 6), np.float32))),
        Sample(p2, SampleIndex.pad_label(np.zeros((0, 6), np.float32))),
    ])
    it = DeviceAugIterator(idx, batch_size=2, data_shape=(32, 64),
                           shuffle=False, enable_aug=False, predownscale=True)
    batch, _ = next(it.epoch())
    assert np.asarray(batch["images"]).shape == (2, 32, 64, 3)


def test_device_pipeline_pad_last(dataset):
    # 6 samples, batch 4, pad_last: 2 batches; tail fnames list only the 2
    # real rows (padded rows repeat the last sample and are sliced off by
    # consumers via len(fnames))
    from dspnet_tpu.data.device_pipeline import DeviceAugIterator

    it = DeviceAugIterator(dataset, 4, (128, 256), enable_aug=False,
                           shuffle=False, pad_last=True)
    batches = list(it.epoch())
    assert len(batches) == 2
    tail, names = batches[-1]
    assert len(names) == 2
    assert np.asarray(tail["images"]).shape[0] == 4
    it2 = DeviceAugIterator(dataset, 4, (128, 256), enable_aug=False,
                            shuffle=False)
    assert len(list(it2.epoch())) == 1
