"""Instance-level segmentation evaluation (Cityscapes-style AP).

Capability counterpart of the reference's vendored official scripts
(data/cityscapes/Scripts/evaluation/evalInstanceLevelSemanticLabeling.py,
instances2dict.py, instance.py) — never invoked by the reference's own code,
shipped for offline use. This implementation provides:

* :func:`match_instances` — greedy confidence-ordered matching of predicted
  instance masks to GT instances at an IoU threshold, with the official
  overlap definition (intersection / union of pixel masks);
* :func:`average_precision` — the official AP curve (precision envelope over
  the recall axis);
* :func:`evaluate_instances` — AP per class averaged over the official
  overlap thresholds 0.5:0.05:0.95 plus AP50, over a dataset of images;
* :func:`boxes_and_seg_to_instances` — glue that derives instance masks from
  DSPNet's outputs (detection box ∩ matching seg-class pixels), so the
  multitask model can be scored end-to-end.

GT format: per image, a list of (mask (H, W) bool, class_name) pairs — e.g.
decoded from Cityscapes ``instanceIds`` images with :func:`decode_instance_png`.
"""

from __future__ import annotations

from typing import Dict, Iterable, List, Sequence, Tuple

import numpy as np

OVERLAPS = np.arange(0.5, 1.0, 0.05)


def decode_instance_png(inst_img: np.ndarray, id2name: Dict[int, str],
                        has_instances: Sequence[str]) -> List[Tuple[np.ndarray, str]]:
    """Cityscapes instanceIds image -> [(mask, class_name)].

    Pixels encode labelId * 1000 + instance index for instance classes;
    plain labelId (< 1000) for stuff."""
    out = []
    for val in np.unique(inst_img):
        if val < 1000:
            continue
        name = id2name.get(int(val) // 1000)
        if name is None or name not in has_instances:
            continue
        out.append((inst_img == val, name))
    return out


def _mask_iou(a: np.ndarray, b: np.ndarray) -> float:
    inter = np.logical_and(a, b).sum()
    if inter == 0:
        return 0.0
    union = a.sum() + b.sum() - inter
    return float(inter) / float(union)


def match_instances(preds, gts, iou_thresh: float):
    """preds: [(mask, class_name, confidence)] one image; gts: [(mask,
    class_name)]. Returns per-class lists of (confidence, is_tp) + gt counts."""
    records: Dict[str, List[Tuple[float, bool]]] = {}
    counts: Dict[str, int] = {}
    for _, cname in gts:
        counts[cname] = counts.get(cname, 0) + 1
    order = sorted(range(len(preds)), key=lambda i: -preds[i][2])
    gt_used = [False] * len(gts)
    for i in order:
        mask, cname, conf = preds[i]
        best, best_j = 0.0, -1
        for j, (gmask, gname) in enumerate(gts):
            if gname != cname or gt_used[j]:
                continue
            iou = _mask_iou(mask, gmask)
            if iou > best:
                best, best_j = iou, j
        tp = best >= iou_thresh and best_j >= 0
        if tp:
            gt_used[best_j] = True
        records.setdefault(cname, []).append((conf, tp))
    return records, counts


def average_precision(scored: List[Tuple[float, bool]], num_gt: int) -> float:
    """AP with precision envelope (matches the official curve computation)."""
    if num_gt == 0:
        return float("nan")
    if not scored:
        return 0.0
    scored = sorted(scored, key=lambda t: -t[0])
    tps = np.cumsum([1.0 if s[1] else 0.0 for s in scored])
    fps = np.cumsum([0.0 if s[1] else 1.0 for s in scored])
    recall = tps / num_gt
    prec = tps / np.maximum(tps + fps, 1)
    mrec = np.concatenate(([0.0], recall, [1.0]))
    mpre = np.concatenate(([0.0], prec, [0.0]))
    for i in range(mpre.size - 1, 0, -1):
        mpre[i - 1] = max(mpre[i - 1], mpre[i])
    idx = np.where(mrec[1:] != mrec[:-1])[0]
    return float(np.sum((mrec[idx + 1] - mrec[idx]) * mpre[idx + 1]))


class InstanceEvalAccumulator:
    """Streaming per-image accumulation: each image's masks are matched at
    every overlap threshold immediately and then released, so whole-dataset
    mask sets never sit in memory (real Cityscapes val would otherwise hold
    tens of GB of full-resolution boolean masks)."""

    def __init__(self, class_names: Sequence[str]):
        self.class_names = list(class_names)
        self._records: Dict[float, Dict[str, List]] = {t: {} for t in OVERLAPS}
        self._counts: Dict[float, Dict[str, int]] = {t: {} for t in OVERLAPS}
        self.num_images = 0

    def update(self, preds, gts) -> None:
        """One image: preds [(mask, class_name, confidence)], gts
        [(mask, class_name)]."""
        self.num_images += 1
        for t in OVERLAPS:
            rec, cnt = match_instances(preds, gts, t)
            for c, r in rec.items():
                self._records[t].setdefault(c, []).extend(r)
            for c, n in cnt.items():
                self._counts[t][c] = self._counts[t].get(c, 0) + n

    def get(self) -> Dict[str, float]:
        results: Dict[str, float] = {}
        aps_all, aps_50 = [], []
        for c in self.class_names:
            aps = []
            for t in OVERLAPS:
                num_gt = self._counts[t].get(c, 0)
                if num_gt == 0:
                    continue
                aps.append(average_precision(self._records[t].get(c, []), num_gt))
            if aps:
                results[c] = float(np.mean(aps))
                aps_all.append(results[c])
                t50 = OVERLAPS[0]
                aps_50.append(average_precision(self._records[t50].get(c, []),
                                                self._counts[t50].get(c, 0)))
        results["AP"] = float(np.mean(aps_all)) if aps_all else float("nan")
        results["AP50"] = float(np.mean(aps_50)) if aps_50 else float("nan")
        return results


def evaluate_instances(
    images: Iterable[Tuple[List, List]], class_names: Sequence[str]
) -> Dict[str, float]:
    """images: iterable of (preds, gts) per image. Returns {class: AP} +
    'AP' (mean over classes/overlaps) and 'AP50'."""
    acc = InstanceEvalAccumulator(class_names)
    for preds, gts in images:
        acc.update(preds, gts)
    return acc.get()


def boxes_and_seg_to_instances(
    dets: np.ndarray,
    seg: np.ndarray,
    det_class_to_seg_trainid: Dict[int, int],
    det_class_names: Sequence[str],
    hw: Tuple[int, int],
):
    """Derive instance masks from DSPNet outputs: each detection contributes
    the pixels of its box whose seg prediction matches the class.

    dets: (n, 7) rows [cls, score, x1, y1, x2, y2, dist] normalized;
    seg: (H', W') trainId map (resized to ``hw`` here).
    """
    import cv2

    H, W = hw
    seg_full = cv2.resize(seg.astype(np.uint8), (W, H), interpolation=cv2.INTER_NEAREST)
    out = []
    for row in np.asarray(dets):
        cid = int(row[0])
        if cid < 0:
            continue
        tid = det_class_to_seg_trainid.get(cid)
        if tid is None:
            continue
        x1, y1 = max(0, int(row[2] * W)), max(0, int(row[3] * H))
        x2, y2 = min(W, int(row[4] * W)), min(H, int(row[5] * H))
        if x2 <= x1 or y2 <= y1:
            continue
        mask = np.zeros((H, W), bool)
        region = seg_full[y1:y2, x1:x2] == tid
        if not region.any():
            region = np.ones((y2 - y1, x2 - x1), bool)  # fall back to the box
        mask[y1:y2, x1:x2] = region
        out.append((mask, det_class_names[cid], float(row[1])))
    return out
