"""Cross-check our Cityscapes pixel-level scoring against the VENDORED
official evaluator, executed directly (not transcribed).

The reference vendors the official scripts at
data/cityscapes/Scripts/evaluation/evalPixelLevelSemanticLabeling.py; they
are py2/py3-portable except for a removed Pillow constant, shimmed below.
Our evaluate/cityscapes_eval.py re-implements the same scoring
(getIouScoreForLabel:229-255, getIouScoreForCategory, getScoreAverage);
this test runs BOTH on the same generated prediction/GT labelId PNGs and
demands equal per-class/per-category IoU and averages.
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
    sys.path.insert(0, OFFICIAL_DIR)
    try:
        import evalPixelLevelSemanticLabeling as ev
    finally:
        sys.path.remove(OFFICIAL_DIR)
    ev.args.evalInstLevelScore = False
    ev.args.evalPixelAccuracy = False
    ev.args.JSONOutput = False
    ev.args.quiet = True
    ev.args.colorized = False
    return ev


def _scenes(rng, n=4, hw=(64, 128)):
    """Synthetic (pred, gt) labelId scenes covering evaluated AND ignored
    ids (GT void pixels must not count as false positives)."""
    h, w = hw
    out = []
    for _ in range(n):
        gt = rng.randint(0, 34, (h, w)).astype(np.uint8)
        # blocky structure so classes have real regions, not salt/pepper
        for _ in range(6):
            y, x = rng.randint(0, h - 8), rng.randint(0, w - 16)
            gt[y:y + 8, x:x + 16] = rng.randint(0, 34)
        pred = gt.copy()
        flip = rng.rand(h, w) < 0.25
        pred[flip] = rng.randint(0, 34, int(flip.sum()))
        out.append((pred, gt))
    return out


def test_matches_official_evaluator(tmp_path, official):
    from PIL import Image

    from dspnet_tpu.evaluate import cityscapes_eval

    rng = np.random.RandomState(5)
    scenes = _scenes(rng)

    preds, gts = [], []
    for i, (pred, gt) in enumerate(scenes):
        pp = str(tmp_path / f"pred_{i}.png")
        gp = str(tmp_path / f"gt_{i}_labelIds.png")
        Image.fromarray(pred).save(pp)
        Image.fromarray(gt).save(gp)
        preds.append(pp)
        gts.append(gp)

    res_official = official.evaluateImgLists(preds, gts, official.args)
    res_ours = cityscapes_eval.evaluate_pairs(scenes)

    off_classes = res_official["classScores"]
    for name, ours in res_ours["classScores"].items():
        theirs = off_classes[name]
        if np.isnan(ours) or np.isnan(theirs):
            assert np.isnan(ours) and np.isnan(theirs), (name, ours, theirs)
        else:
            assert abs(ours - theirs) < 1e-12, (name, ours, theirs)
    # every evaluated class appears in both
    eval_names = {official.id2label[l].name for l in official.args.evalLabels
                  if not official.id2label[l].ignoreInEval}
    assert eval_names == set(res_ours["classScores"])

    off_cats = res_official["categoryScores"]
    for cat, ours in res_ours["categoryScores"].items():
        theirs = off_cats[cat]
        if np.isnan(ours) or np.isnan(theirs):
            assert np.isnan(ours) and np.isnan(theirs), (cat, ours, theirs)
        else:
            assert abs(ours - theirs) < 1e-12, (cat, ours, theirs)

    assert abs(res_ours["averageScoreClasses"]
               - official.getScoreAverage(off_classes, official.args)) < 1e-12
    assert abs(res_ours["averageScoreCategories"]
               - official.getScoreAverage(off_cats, official.args)) < 1e-12
