"""Instance-level AP evaluation tests."""

import numpy as np
import pytest

from dspnet_tpu.evaluate.instance_eval import (
    average_precision,
    boxes_and_seg_to_instances,
    decode_instance_png,
    evaluate_instances,
    match_instances,
)


def _mask(h, w, y1, y2, x1, x2):
    m = np.zeros((h, w), bool)
    m[y1:y2, x1:x2] = True
    return m


def test_perfect_match_ap_one():
    gt = [(_mask(20, 20, 2, 10, 2, 10), "car")]
    pred = [(_mask(20, 20, 2, 10, 2, 10), "car", 0.9)]
    res = evaluate_instances([(pred, gt)], ["car"])
    assert res["car"] == pytest.approx(1.0)
    assert res["AP"] == pytest.approx(1.0)
    assert res["AP50"] == pytest.approx(1.0)


def test_partial_overlap_counts_only_at_low_thresholds():
    gt = [(_mask(20, 20, 0, 10, 0, 10), "car")]
    # IoU = 64 / (100 + 64 + ... ) -> shift by 2: inter 8x8=64, union 136 -> 0.47
    pred = [(_mask(20, 20, 2, 12, 2, 12), "car", 0.9)]
    rec, cnt = match_instances(pred, gt, 0.4)
    assert rec["car"][0][1] is True or rec["car"][0][1] == True  # noqa: E712
    rec2, _ = match_instances(pred, gt, 0.5)
    assert not rec2["car"][0][1]


def test_duplicate_predictions_are_fp():
    gt = [(_mask(20, 20, 2, 10, 2, 10), "car")]
    pred = [
        (_mask(20, 20, 2, 10, 2, 10), "car", 0.9),
        (_mask(20, 20, 2, 10, 2, 10), "car", 0.8),
    ]
    rec, cnt = match_instances(pred, gt, 0.5)
    flags = [tp for _, tp in rec["car"]]
    assert flags.count(True) == 1 and flags.count(False) == 1
    ap = average_precision(rec["car"], cnt["car"])
    assert ap == pytest.approx(1.0)  # tp is the higher-confidence one


def test_decode_instance_png():
    img = np.zeros((10, 10), np.int32)
    img[2:5, 2:5] = 26000  # car, instance 0
    img[6:9, 6:9] = 26001  # car, instance 1
    img[0, 0] = 7  # road (stuff)
    inst = decode_instance_png(img, {26: "car", 7: "road"}, ["car"])
    assert len(inst) == 2
    assert all(name == "car" for _, name in inst)


def test_boxes_and_seg_to_instances():
    seg = np.zeros((8, 16), np.uint8)
    seg[2:6, 2:10] = 13  # car trainId at quarter res
    dets = np.array([[2, 0.9, 0.05, 0.2, 0.65, 0.8, 0.3]])  # det class 2 = car
    inst = boxes_and_seg_to_instances(
        dets, seg, {2: 13}, ["person", "rider", "car"], (32, 64)
    )
    assert len(inst) == 1
    mask, name, conf = inst[0]
    assert name == "car" and conf == pytest.approx(0.9)
    assert mask.sum() > 0


def test_polygons_to_instanceid_png_roundtrip(tmp_path):
    # json2instanceImg.py:142-165 encoding: instance classes -> id*1000+n,
    # groups and stuff -> bare id; background = unlabeled id (0)
    import json

    import cv2

    from dspnet_tpu.data.cs_labels import id2label
    from dspnet_tpu.tools.prepare_cityscapes import polygons_to_instanceid_png

    poly = {
        "imgHeight": 64,
        "imgWidth": 128,
        "objects": [
            {"label": "car", "polygon": [[4, 4], [40, 4], [40, 30], [4, 30]]},
            {"label": "car", "polygon": [[60, 4], [100, 4], [100, 30], [60, 30]]},
            {"label": "cargroup", "polygon": [[4, 40], [60, 40], [60, 60], [4, 60]]},
            {"label": "sky", "polygon": [[100, 40], [127, 40], [127, 60], [100, 60]]},
            {"label": "car", "deleted": 1,
             "polygon": [[110, 10], [120, 10], [120, 20], [110, 20]]},
        ],
    }
    jp = str(tmp_path / "x_gtFine_polygons.json")
    json.dump(poly, open(jp, "w"))
    out = str(tmp_path / "x_gtFine_instanceIds.png")
    polygons_to_instanceid_png(jp, out)
    img = cv2.imread(out, cv2.IMREAD_UNCHANGED)
    assert img.dtype == np.uint16 and img.shape == (64, 128)
    vals = set(np.unique(img).tolist())
    # car id=26: two instances + one group; sky id=23; unlabeled background 0
    assert {26000, 26001, 26, 23, 0} == vals
    id2name = {lid: lab.name for lid, lab in id2label.items()}
    inst = decode_instance_png(img, id2name, ["car"])
    assert len(inst) == 2 and all(n == "car" for _, n in inst)


def test_evaluate_model_instance_eval(tmp_path):
    # end-to-end through evaluate/loop.py: a perfect stub detector on the
    # synthetic dataset (GT boxes + GT seg) scores instAP ~1.0 for 'car'
    import cv2

    from dspnet_tpu.data import synthetic
    from dspnet_tpu.data.iterator import MultiTaskIterator
    from dspnet_tpu.evaluate.loop import evaluate_model

    hw = (64, 128)
    index = synthetic.build_dataset(str(tmp_path), num_samples=3, hw=hw,
                                    with_instances=True)

    class GtStub:
        def __init__(self):
            self.cursor = 0

        def predict(self, images):
            B = np.asarray(images).shape[0]
            dets, segs = [], []
            for _ in range(B):
                s = index[self.cursor]
                self.cursor += 1
                rows = s.label[s.label[:, 0] >= 0]
                det = np.full((40, 7), -1, np.float32)
                for j, r in enumerate(rows):
                    det[j] = [r[0], 0.9, r[1], r[2], r[3], r[4], r[5]]
                seg = cv2.imread(s.seg_path, cv2.IMREAD_UNCHANGED)
                seg = cv2.resize(seg, (hw[1] // 4, hw[0] // 4),
                                 interpolation=cv2.INTER_NEAREST)
                dets.append(det)
                segs.append(seg.astype(np.int32))
            return {"det": np.stack(dets), "seg": np.stack(segs)}

    it = MultiTaskIterator(index, batch_size=1, data_shape=hw,
                           enable_aug=False, shuffle=False)
    res = evaluate_model(GtStub(), it, instance_eval=True)
    assert "instAP" in res and "instAP50" in res
    # per-class keys are namespaced per metric (det classes are a subset of
    # seg classes; a flat merge would collide)
    assert "ap_car" in res and "iou_road" in res and "derror_car" in res
    assert "car" not in res
    # perfect boxes -> high AP50; occluded (overwritten) GT rects cost a bit
    assert res["instAP50"] > 0.5, res
    assert 0.0 < res["instAP"] <= 1.0
