"""Cross-check our instance-level AP scoring against the VENDORED official
evaluator, executed directly (not transcribed).

Mirrors tests/test_official_cityscapes.py for the pixel-level scoring: the
reference vendors the official script at
data/cityscapes/Scripts/evaluation/evalInstanceLevelSemanticLabeling.py;
our evaluate/instance_eval.py re-implements its matching + AP-curve
semantics (strict-> overlap, duplicate-match FPs, void/group/small-region
FP ignores, step-integrated AP curve, nanmean averages). This test runs
BOTH on the same generated GT instanceIds PNGs + prediction mask sets and
demands equal per-class AP / AP50 and dataset averages.
"""

import os
import sys

import numpy as np
import pytest

OFFICIAL_DIR = "/root/reference/data/cityscapes/Scripts/evaluation"


@pytest.fixture(scope="module")
def official():
    if not os.path.isdir(OFFICIAL_DIR):
        pytest.skip("vendored official evaluator not present")
    import PIL

    if not hasattr(PIL, "PILLOW_VERSION"):  # removed in Pillow 7
        PIL.PILLOW_VERSION = PIL.__version__
    # the official script uses np.float / np.bool (removed in numpy 1.24)
    if not hasattr(np, "float"):
        np.float = float
    if not hasattr(np, "bool"):
        np.bool = bool
    sys.path.insert(0, OFFICIAL_DIR)
    try:
        import evalInstanceLevelSemanticLabeling as ev
    finally:
        sys.path.remove(OFFICIAL_DIR)
    ev.args.quiet = True
    ev.args.colorized = False
    ev.args.JSONOutput = False
    ev.args.csv = False
    return ev


def _run_official(ev, root, scenes, preds_per_scene):
    """scenes: [(H, W) int GT instanceIds arrays]; preds_per_scene:
    [[(mask bool, labelID, conf)]]. Runs the vendored evaluateImgLists on
    PNG/txt files in ``root`` and returns its result dict."""
    from PIL import Image

    gt_list, pred_list = [], []
    for i, gtimg in enumerate(scenes):
        gp = os.path.join(root, f"img{i}_gtFine_instanceIds.png")
        Image.fromarray(gtimg.astype(np.uint16)).save(gp)
        lines = []
        for j, (mask, lid, conf) in enumerate(preds_per_scene[i]):
            mp = f"img{i}_mask{j}.png"
            Image.fromarray(mask.astype(np.uint8) * 255).save(
                os.path.join(root, mp))
            lines.append(f"{mp} {lid} {conf!r}\n")
        pp = os.path.join(root, f"img{i}_pred.txt")
        with open(pp, "w") as f:
            f.writelines(lines)
        gt_list.append(gp)
        pred_list.append(pp)
    ev.args.predictionPath = os.path.abspath(root)
    ev.args.predictionWalk = None
    # fresh per run or stale caches poison later calls; must NOT default to
    # a path inside the read-only reference tree
    ev.args.gtInstancesFile = os.path.join(root, "gtInstances.json")
    cwd = os.getcwd()
    os.chdir(root)  # the script writes matches.json into CWD
    try:
        return ev.evaluateImgLists(pred_list, gt_list, ev.args)
    finally:
        os.chdir(cwd)


def _run_ours(scenes, preds_per_scene):
    from dspnet_tpu.data.cs_labels import id2label, labels
    from dspnet_tpu.evaluate.instance_eval import InstanceEvalAccumulator

    inst_names = [l.name for l in labels
                  if l.hasInstances and not l.ignoreInEval]
    acc = InstanceEvalAccumulator(inst_names)
    for gtimg, preds in zip(scenes, preds_per_scene):
        ours_preds = [(mask, id2label[lid].name, conf)
                      for mask, lid, conf in preds]
        acc.update(ours_preds, gtimg)
    return acc


def _rect(h, w, y1, y2, x1, x2):
    m = np.zeros((h, w), bool)
    m[y1:y2, x1:x2] = True
    return m


def _scenes(rng, n=4, hw=(64, 128)):
    """Adversarial synthetic scenes exercising every scoring branch:
    real instances (>= and < the 100 px min region size), group regions,
    void pixels, duplicate predictions, near-threshold overlaps, wrong-class
    predictions, predictions covering void/groups, and confidence ties."""
    h, w = hw
    inst_ids = [24, 25, 26, 27, 28, 31, 32, 33]
    scenes, preds = [], []
    for si in range(n):
        gt = np.full((h, w), 7, np.uint16)  # road (stuff, evaluated-as-void? no: not in instLabels, not ignoreInEval -> neither instance nor void)
        gt[:, : rng.randint(4, 12)] = 0  # unlabeled strip -> void
        gt[-6:, -20:] = 29  # caravan: hasInstances but ignoreInEval -> void
        gt_rects = []
        counters = {}
        for _ in range(rng.randint(4, 9)):
            lid = inst_ids[rng.randint(len(inst_ids))]
            big = rng.rand() < 0.7
            hh = rng.randint(10, 26) if big else rng.randint(3, 9)
            ww = rng.randint(10, 30) if big else rng.randint(3, 9)
            y, x = rng.randint(0, h - hh), rng.randint(0, w - ww)
            if rng.rand() < 0.2:
                val = lid  # group region (bare labelId)
            else:
                counters[lid] = counters.get(lid, 0) + 1
                val = lid * 1000 + counters[lid]
            gt[y:y + hh, x:x + ww] = val
            gt_rects.append((val, lid, y, y + hh, x, x + ww))
        p = []
        for val, lid, y1, y2, x1, x2 in gt_rects:
            r = rng.rand()
            if r < 0.15:
                continue  # miss -> hard FN (or unannotated group)
            conf = rng.randint(1, 64) / 64.0  # exact binary fractions
            dy, dx = rng.randint(-3, 4), rng.randint(-3, 4)
            m = _rect(h, w, max(0, y1 + dy), min(h, y2 + dy),
                      max(0, x1 + dx), min(w, x2 + dx))
            plid = lid if rng.rand() < 0.85 else inst_ids[
                rng.randint(len(inst_ids))]  # some wrong-class preds
            p.append((m, plid, conf))
            if rng.rand() < 0.3:  # duplicate (sometimes with tied conf)
                conf2 = conf if rng.rand() < 0.5 else rng.randint(1, 64) / 64.0
                p.append((m.copy(), lid, conf2))
        for _ in range(rng.randint(1, 4)):  # spurious boxes, some on void
            hh, ww = rng.randint(4, 16), rng.randint(4, 16)
            y, x = rng.randint(0, h - hh), rng.randint(0, w - ww)
            p.append((_rect(h, w, y, y + hh, x, x + ww),
                      inst_ids[rng.randint(len(inst_ids))],
                      rng.randint(1, 64) / 64.0))
        scenes.append(gt)
        preds.append(p)
    return scenes, preds


def _assert_close(a, b, ctx):
    if np.isnan(a) or np.isnan(b):
        assert np.isnan(a) and np.isnan(b), (ctx, a, b)
    else:
        assert abs(a - b) < 1e-12, (ctx, a, b)


@pytest.mark.parametrize("seed", [5, 11, 23])
def test_matches_official_instance_evaluator(tmp_path, official, seed):
    rng = np.random.RandomState(seed)
    scenes, preds = _scenes(rng)

    res_off = _run_official(official, str(tmp_path), scenes, preds)
    acc = _run_ours(scenes, preds)
    ours = acc.get()

    off_avg = res_off["averages"]
    assert res_off["instLabels"] == acc.class_names
    # full per-class x per-overlap AP matrix, elementwise
    off_mat = np.asarray(res_off["resultApMatrix"])[0]  # dInf slice
    ours_mat = acc.ap_matrix()
    assert off_mat.shape == ours_mat.shape
    for ci, cname in enumerate(acc.class_names):
        for oi in range(off_mat.shape[1]):
            _assert_close(ours_mat[ci, oi], off_mat[ci, oi],
                          (cname, 0.5 + 0.05 * oi))
        _assert_close(ours[cname], off_avg["classes"][cname]["ap"], cname)
    _assert_close(ours["AP"], off_avg["allAp"], "AP")
    _assert_close(ours["AP50"], off_avg["allAp50%"], "AP50")


def test_matches_official_no_predictions(tmp_path, official):
    """Class with GT but zero predictions -> AP 0; class with neither -> NaN
    excluded from the average (official :541-544)."""
    h, w = 64, 128
    gt = np.full((h, w), 7, np.uint16)
    gt[10:40, 10:60] = 26001  # one big car
    gt[45:60, 70:110] = 24001  # one big person
    scenes = [gt]
    # only the car is predicted (exactly)
    preds = [[(_rect(h, w, 10, 40, 10, 60), 26, 0.75)]]

    res_off = _run_official(official, str(tmp_path), scenes, preds)
    ours = _run_ours(scenes, preds).get()

    off_avg = res_off["averages"]
    _assert_close(ours["car"], off_avg["classes"]["car"]["ap"], "car")
    _assert_close(ours["person"], off_avg["classes"]["person"]["ap"], "person")
    assert ours["car"] == pytest.approx(1.0)
    assert ours["person"] == 0.0
    assert np.isnan(ours["truck"])
    _assert_close(ours["AP"], off_avg["allAp"], "AP")
    _assert_close(ours["AP50"], off_avg["allAp50%"], "AP50")
