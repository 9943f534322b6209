"""CLI-level plain-SSD VOC pillar: train with the DetIterator pipeline via
multi_train, then score the checkpoint with cli.eval_voc — the streaming
VOC07MApMetric AND the offline devkit result-file path in one command
(reference evaluate/evaluate_net.py:13-110 + dataset/pascal_voc.py:170-259).
"""

import os

import numpy as np

from dspnet_tpu.data import synthetic


def test_voc_train_then_eval_cli(tmp_path):
    root = synthetic.build_voc_dataset(
        str(tmp_path / "devkit"), num_samples=4, hw=(96, 96), seed=233)
    model_dir = str(tmp_path / "model")
    names = ",".join(synthetic.class_names())

    from dspnet_tpu.cli import eval_voc, multi_train

    multi_train.main([
        "--network", "resnet-18", "--data-shape", "3,96,96",
        "--num-classes", "8", "--batch-size", "2", "--end-epoch", "2",
        "--lr", "0.001", "--dataset-root", root, "--loader", "det",
        "--model-dir", model_dir, "--eval-every", "2",
        "--num-devices", "1",  # conftest's 8-device mesh needs batch % 8
    ])

    result_dir = str(tmp_path / "results")
    res = eval_voc.main([
        "--network", "resnet-18", "--data-shape", "3,96,96",
        "--num-classes", "8", "--class-names", names,
        "--voc-root", root, "--year", "", "--image-set", "val",
        "--batch-size", "2", "--model-dir", model_dir,
        "--voc07", "--result-dir", result_dir,
    ])

    # streaming VOC07 metric: per-class APs + mAP, all finite-or-nan floats
    assert "mAP" in res and np.isfinite(res["mAP"])
    # devkit path: one comp4 result file per class, re-scored mAP present
    assert np.isfinite(res["devkit_mAP"])
    for c in synthetic.class_names():
        assert os.path.exists(
            os.path.join(result_dir, f"comp4_det_val_{c}.txt")), c
    # two epochs from scratch: the pipeline must run, not converge — but the
    # two mAP flavors score the SAME detections, so they can only disagree
    # by the 11-point-vs-envelope interpolation, never by orders of magnitude
    assert abs(res["mAP"] - res["devkit_mAP"]) < 0.3


def test_class_table_threads_into_training_index(tmp_path):
    """The name->id table the training index uses must match the head being
    trained. Regression for the round-5 VOC convergence collapse: load_index
    defaulted to the VOC 20-class table for any VOC-layout tree, so an
    8-class run silently dropped rider/truck/motorcycle (unknown names) and
    trained the rest under scrambled 20-class ids — val mAP 0.065 after 1600
    converged epochs. resolve_dataset now derives the table from
    --class-names/--num-classes, and multi_train asserts every GT id fits."""
    from types import SimpleNamespace

    import pytest

    from dspnet_tpu.cli.common import resolve_dataset
    from dspnet_tpu.cli import multi_train
    from dspnet_tpu.data.imdb import load_index

    root = synthetic.build_voc_dataset(
        str(tmp_path / "devkit"), num_samples=6, hw=(96, 96), seed=3)

    def ids(index):
        out = set()
        for s in index.samples:
            rows = s.label[s.label[:, 0] >= 0]
            out.update(int(c) for c in rows[:, 0])
        return sorted(out)

    names = synthetic.class_names()
    good = ids(load_index(root, "train", classes=names))
    assert good and max(good) < len(names)

    # the old default (VOC 20-class table) produces a DIFFERENT mapping:
    # out-of-range ids and/or dropped objects — the bug this test pins
    bad = ids(load_index(root, "train"))
    assert bad != good

    # resolve_dataset derives the 8-name table from --num-classes alone
    ns = SimpleNamespace(dataset_root=root, num_classes=8, class_names="")
    assert ids(resolve_dataset(ns, "train")) == good
    # ... and --class-names wins outright
    ns = SimpleNamespace(dataset_root=root, num_classes=8,
                         class_names=",".join(names))
    assert ids(resolve_dataset(ns, "train")) == good

    # a table/head mismatch must fail at startup, not as scrambled mAP:
    # --num-classes 4 leaves the default (20-class) table in place, whose
    # ids exceed the 4-class head
    with pytest.raises(AssertionError, match="class id"):
        multi_train.main([
            "--network", "resnet-18", "--data-shape", "3,96,96",
            "--num-classes", "4", "--batch-size", "2", "--end-epoch", "1",
            "--dataset-root", root, "--loader", "det",
            "--model-dir", str(tmp_path / "m"), "--num-devices", "1",
        ])


def test_use_difficult_switches_metric(tmp_path):
    """PascalVoc(difficult_in_label=True) + DetIterator passthrough carry the
    difficult flag into MApMetric labels column 5; use_difficult toggles
    whether difficult GT counts (reference eval_metric.py:100-104)."""
    from dspnet_tpu.data.det_iterator import DetIterator
    from dspnet_tpu.data.imdb import PascalVoc
    from dspnet_tpu.evaluate.eval_metric import MApMetric

    root = synthetic.build_voc_dataset(
        str(tmp_path / "devkit"), num_samples=6, hw=(96, 96), seed=7,
        difficult_frac=0.5)
    imdb = PascalVoc("val", "", root, classes=synthetic.class_names(),
                     difficult_in_label=True)
    index = imdb.index()
    it = DetIterator(index, 2, (96, 96), is_train=False,
                     label_col5="passthrough")
    flags = []
    for batch, fnames in it.epoch():
        lbl = batch["label_det"]
        flags.append(lbl[lbl[:, :, 0] >= 0][:, 5])
    flags = np.concatenate(flags)
    assert set(np.unique(flags)) <= {0.0, 1.0}
    assert (flags == 1.0).any(), "difficult_frac=0.5 produced no difficult GT"

    # perfect predictions on every GT (difficult included): with
    # use_difficult=False the difficult matches are ignored (not fp, not
    # counted); with True they are tp — both give mAP 1.0 here, but the
    # gt_count differs, which shows when a difficult GT is MISSED:
    gt = np.array([[0, 0.1, 0.1, 0.4, 0.4, 0.0],
                   [0, 0.5, 0.5, 0.9, 0.9, 1.0]])  # second is difficult
    pred = np.array([[0, 0.9, 0.1, 0.1, 0.4, 0.4]])  # only the easy one found
    m0 = MApMetric(0.5, False, ["car"])
    m0.update([gt], [pred])
    m1 = MApMetric(0.5, True, ["car"])
    m1.update([gt], [pred])
    assert m0.get()[1][-1] == 1.0  # difficult GT not required
    assert m1.get()[1][-1] == 0.5  # use_difficult: the miss halves recall
