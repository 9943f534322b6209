"""Instance-level AP evaluation unit tests (official-semantics API).

The authoritative check is tests/test_instance_official.py, which cross-runs
evaluate/instance_eval.py against the vendored official evaluator; these
cover the individual behaviors and the evaluate/loop.py integration.
"""

import numpy as np
import pytest

from dspnet_tpu.evaluate.instance_eval import (
    InstanceEvalAccumulator,
    boxes_and_seg_to_instances,
    decode_instance_png,
    evaluate_instances,
    official_ap_curve,
)


def _mask(h, w, y1, y2, x1, x2):
    m = np.zeros((h, w), bool)
    m[y1:y2, x1:x2] = True
    return m


def _gt(h, w, *rects):
    """rects: (value, y1, y2, x1, x2) painted over a road background."""
    img = np.full((h, w), 7, np.int64)
    for val, y1, y2, x1, x2 in rects:
        img[y1:y2, x1:x2] = val
    return img


def test_perfect_match_ap_one():
    gt = _gt(40, 40, (26001, 2, 22, 2, 22))  # 400 px car instance
    pred = [(_mask(40, 40, 2, 22, 2, 22), "car", 0.9)]
    res = evaluate_instances([(pred, gt)], ["car"])
    assert res["car"] == pytest.approx(1.0)
    assert res["AP"] == pytest.approx(1.0)
    assert res["AP50"] == pytest.approx(1.0)


def test_overlap_is_strictly_greater():
    # inter 256, union 2*400-256=544 -> IoU ~0.47: counts only below 0.47
    gt = _gt(60, 60, (26001, 0, 20, 0, 20))
    pred = [(_mask(60, 60, 6, 26, 6, 26), "car", 0.9)]
    acc = InstanceEvalAccumulator(["car"])
    acc.update(pred, gt)
    mat = acc.ap_matrix()
    assert mat[0, 0] == 0.0  # 0.5 threshold: no match -> hard FN + FP
    gt2 = _gt(60, 60, (26001, 0, 20, 0, 20))
    pred2 = [(_mask(60, 60, 2, 22, 2, 22), "car", 0.9)]  # IoU ~0.68
    acc2 = InstanceEvalAccumulator(["car"])
    acc2.update(pred2, gt2)
    mat2 = acc2.ap_matrix()
    assert mat2[0, 0] == pytest.approx(1.0)   # > 0.5 matches
    assert mat2[0, -1] == 0.0                 # > 0.95 does not


def test_duplicate_predictions_lower_conf_is_fp():
    gt = _gt(40, 40, (26001, 2, 22, 2, 22))
    m = _mask(40, 40, 2, 22, 2, 22)
    pred = [(m, "car", 0.9), (m.copy(), "car", 0.8)]
    acc = InstanceEvalAccumulator(["car"])
    acc.update(pred, gt)
    # higher-confidence one is the TP; the FP at 0.8 sits below it on the
    # curve, so AP stays 1.0 (official :434-446)
    assert acc.get()["car"] == pytest.approx(1.0)
    # one TP + one FP recorded at every overlap
    assert sorted(acc._y_true["car"][0]) == [0.0, 1.0]


def test_small_gt_region_is_ignored():
    # 36 px < 100 px min region: not scored as GT, and a prediction covering
    # it is ignored rather than counted FP (official :412, :463-476)
    gt = _gt(40, 40, (26001, 0, 6, 0, 6))
    pred = [(_mask(40, 40, 0, 6, 0, 6), "car", 0.9)]
    acc = InstanceEvalAccumulator(["car"])
    acc.update(pred, gt)
    res = acc.get()
    assert np.isnan(res["car"])  # no scorable GT anywhere -> NaN
    assert acc._y_true["car"][0] == []  # and no FP recorded


def test_group_region_ignores_unmatched_pred():
    gt = _gt(64, 64, (26, 0, 32, 0, 32),        # car group (bare labelId)
             (26001, 40, 60, 40, 60))           # one real 400 px car
    pred = [
        (_mask(64, 64, 0, 30, 0, 30), "car", 0.7),   # covers the group only
        (_mask(64, 64, 40, 60, 40, 60), "car", 0.9),  # exact on the real car
    ]
    res = evaluate_instances([(pred, gt)], ["car"])
    assert res["car"] == pytest.approx(1.0)  # group-covering pred not an FP


def test_void_pixels_ignore_unmatched_pred():
    gt = _gt(64, 64, (0, 0, 32, 0, 32),          # unlabeled strip -> void
             (26001, 40, 60, 40, 60))
    pred = [
        (_mask(64, 64, 0, 30, 0, 30), "car", 0.7),   # sits on void
        (_mask(64, 64, 40, 60, 40, 60), "car", 0.9),
    ]
    res = evaluate_instances([(pred, gt)], ["car"])
    assert res["car"] == pytest.approx(1.0)


def test_missed_gt_is_hard_fn():
    gt = _gt(64, 64, (26001, 0, 20, 0, 20), (26002, 30, 50, 30, 50))
    pred = [(_mask(64, 64, 30, 50, 30, 50), "car", 0.9)]  # finds only one
    acc = InstanceEvalAccumulator(["car"])
    acc.update(pred, gt)
    assert acc._hard_fns["car"][0] == 1
    # official curve: 1 TP, recall 0.5, precision 1 -> step AP 0.5
    assert acc.ap_matrix()[0, 0] == pytest.approx(0.5)


def test_official_ap_curve_matches_simple_case():
    # two TPs at conf .9/.8, one FP at .7, one hard FN (3 GT total):
    # thresholds .7/.8/.9 -> (p,r): (2/3,2/3), (1,2/3), (1,1/3) + artificial
    ap = official_ap_curve([1.0, 1.0, 0.0], [0.9, 0.8, 0.7], hard_fns=1)
    # step integration: sum p*dr with centered steps
    assert 0.5 < ap < 0.8


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
    p = inst[0]  # bbox-local PredInstance (no full-res mask allocated)
    assert p.class_name == "car" and p.confidence == pytest.approx(0.9)
    assert p.mask.sum() > 0
    full = p.full_mask((32, 64))
    assert full.shape == (32, 64) and full.sum() == p.mask.sum()


def test_accumulator_compact_equals_full_masks():
    """Bbox-local PredInstance path must score bit-identically to the
    full-image mask path (same set intersections, VERDICT r4 #6)."""
    from dspnet_tpu.evaluate.instance_eval import PredInstance

    rng = np.random.RandomState(3)
    H, W = 96, 128
    gt = _gt(H, W, (0, 0, 30, 90, 128),          # void strip
             (26, 50, 90, 0, 40),                # car group
             (26001, 10, 40, 10, 50),
             (26002, 60, 90, 60, 110),
             (24001, 20, 60, 70, 100))           # person instance
    preds_full, preds_compact = [], []
    for i in range(8):
        y1 = int(rng.randint(0, H - 12)); y2 = y1 + int(rng.randint(8, 40))
        x1 = int(rng.randint(0, W - 12)); x2 = x1 + int(rng.randint(8, 50))
        y2, x2 = min(y2, H), min(x2, W)
        local = rng.rand(y2 - y1, x2 - x1) > 0.3
        cname = "car" if i % 2 == 0 else "person"
        conf = float(rng.rand())
        m = np.zeros((H, W), bool)
        m[y1:y2, x1:x2] = local
        preds_full.append((m, cname, conf))
        preds_compact.append(PredInstance((y1, y2, x1, x2), local, cname, conf))
    a = InstanceEvalAccumulator(["car", "person"])
    a.update(preds_full, gt)
    b = InstanceEvalAccumulator(["car", "person"])
    b.update(preds_compact, gt)
    np.testing.assert_array_equal(a.ap_matrix(), b.ap_matrix())
    for c in ("car", "person"):
        for ti in range(10):
            assert a._y_true[c][ti] == b._y_true[c][ti]
            assert a._y_score[c][ti] == b._y_score[c][ti]
        assert (a._hard_fns[c] == b._hard_fns[c]).all()


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
