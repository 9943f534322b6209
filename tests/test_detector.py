"""End-to-end detector / eval-pipeline tests (CPU, small shapes)."""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from dspnet_tpu.api import create_model, parse_network_name
from dspnet_tpu.data import synthetic
from dspnet_tpu.data.cs_labels import DET_CLASSES
from dspnet_tpu.data.iterator import MultiTaskIterator
from dspnet_tpu.detect.detector import Detector


def test_parse_network_name():
    assert parse_network_name("resnet-50_multi") == ("resnet-50", "multi")
    assert parse_network_name("resnet-18_det") == ("resnet-18", "det")
    assert parse_network_name("resnet-50_seg") == ("resnet-50", "seg")
    assert parse_network_name("vgg16_reduced") == ("vgg16_reduced", "ssd")


@pytest.fixture(scope="module")
def detector():
    H, W = 128, 256
    bundle = create_model("resnet-18_multi", (H, W), num_classes=8)
    variables = bundle.model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, H, W, 3)), train=False
    )
    return Detector(
        bundle.model, variables, bundle.anchors, (H, W), classes=list(DET_CLASSES),
        nms_thresh=0.45,
    )


def test_detector_end_to_end(tmp_path_factory, detector):
    root = str(tmp_path_factory.mktemp("synth"))
    index = synthetic.build_dataset(root, num_samples=2, hw=(128, 256))
    it = MultiTaskIterator(index, 2, (128, 256), enable_aug=False, shuffle=False)
    batch, fnames = it.next_batch()
    dets, seg = detector.detect(batch["images"], det_threshold=0.0)
    assert len(dets) == 2
    for d in dets:
        assert d.ndim == 2 and d.shape[1] == 7
        assert np.all(d[:, 0] >= 0)
    assert seg.shape == (2, 32, 64)


def test_detector_single_and_visualize(tmp_path, detector):
    root = str(tmp_path)
    index = synthetic.build_dataset(root, num_samples=1, hw=(128, 256))
    img_path = index[0].image_path
    dets, seg = detector.im_detect_single(img_path)
    import cv2

    img = cv2.imread(img_path)
    vis = detector.visualize_detection(img, dets, seg, thresh=0.0)
    assert vis.shape == img.shape
    out = detector.detect_and_visualize(img_path, str(tmp_path))
    assert os.path.exists(out[0])


def test_detector_video_path(tmp_path, detector):
    """Video branch: mp4 in -> annotated mp4 out, with the second host NMS
    pass at 0.95 (reference multitask_detector.py:433-456)."""
    import cv2

    rng = np.random.RandomState(0)
    src = str(tmp_path / "in.mp4")
    w = cv2.VideoWriter(src, cv2.VideoWriter_fourcc(*"mp4v"), 25, (256, 128))
    assert w.isOpened(), "mp4 codec unavailable"
    for _ in range(3):
        w.write(rng.randint(0, 255, (128, 256, 3)).astype(np.uint8))
    w.release()
    out_dir = str(tmp_path / "out")
    written = detector.detect_and_visualize(src, out_dir, thresh=0.0)
    assert written and os.path.exists(written[0])
    cap = cv2.VideoCapture(written[0])
    assert int(cap.get(cv2.CAP_PROP_FRAME_COUNT)) == 3
    cap.release()


def test_serving_pipeline_matches_sync(detector):
    """ServingPipeline returns the SAME results as sync predict_raw, in
    submission order, tagged; drain flushes the window tail."""
    from dspnet_tpu.detect.pipeline import ServingPipeline

    rng = np.random.RandomState(3)
    frames = [rng.randint(0, 255, (128, 256, 3)).astype(np.uint8)
              for _ in range(5)]
    pipe = ServingPipeline(detector, depth=2, raw=True)
    got = []
    for i, f in enumerate(frames):
        out = pipe.submit(f)
        if out is not None:
            got.append(out)
    assert len(got) == 3  # window held 2 back
    got.extend(pipe.drain())
    assert len(pipe) == 0
    assert [tag for tag, _ in got] == [0, 1, 2, 3, 4]
    for i, (tag, res) in enumerate(got):
        ref = detector.predict_raw(frames[i][None])
        for k in ref:
            np.testing.assert_array_equal(res[k], np.asarray(ref[k]), err_msg=k)
