"""Shared evaluation loop — the forward-only metric pass used by the eval
CLI and the per-epoch validation inside training (reference
multi_solver.py:355-517 / multi_eval.py:275-423 behavior)."""

from __future__ import annotations

import os
import time
from typing import Dict, Optional

import numpy as np


from dspnet_tpu.data.cs_labels import DET_CLASSES, SEG_CLASSES
from dspnet_tpu.evaluate.eval_metric import (
    CustomAccuracyMetric,
    DistanceAccuracyMetric,
    IoUMetric,
    MApMetric,
)


def disparity_path_for(image_path: str) -> str:
    """Image path -> sibling disparity PNG (the synthetic/prepared layout)."""
    return image_path.replace("JPEGImages", "Disparity").replace(
        "_leftImg8bit.jpg", "_disparity.png"
    )


def instance_path_for(image_path: str) -> str:
    """Image path -> sibling instanceIds PNG (prepare_cityscapes
    --instance-ids layout)."""
    return image_path.replace("JPEGImages", "SegmentationInstance").replace(
        "_leftImg8bit.jpg", "_gtFine_instanceIds.png"
    )


def evaluate_model(
    detector,
    iterator,
    det_score_thresh: float = 0.1,
    overlap_thresh: float = 0.5,
    class_names=DET_CLASSES,
    seg_class_names=SEG_CLASSES,
    write_results: Optional[str] = None,
    dist_errors_path: Optional[str] = None,
    instance_eval: bool = False,
    log_fn=None,
) -> Dict[str, float]:
    """One pass over ``iterator`` computing mAP, mIoU, pixel accuracy, depth
    relative error, and steady-state ms/batch. Returns a flat metric dict."""
    import cv2

    map_metric = MApMetric(overlap_thresh, class_names=list(class_names))
    iou_metric = IoUMetric(list(seg_class_names))
    acc_metric = CustomAccuracyMetric()
    dist_metric = DistanceAccuracyMetric(list(class_names))

    inst_acc = None
    if instance_eval:
        from dspnet_tpu.data.cs_labels import name2label
        from dspnet_tpu.evaluate.instance_eval import (
            InstanceEvalAccumulator,
            boxes_and_seg_to_instances,
        )

        inst_acc = InstanceEvalAccumulator(list(class_names))
        det_to_trainid = {
            i: name2label[n].trainId for i, n in enumerate(class_names)
            if n in name2label
        }

    n_batches = 0
    total_ms = 0.0
    timed = 0
    for batch, fnames in iterator.epoch():
        t0 = time.time()
        res = detector.predict(batch["images"])
        # force completion with a host transfer — block_until_ready is
        # unreliable on the axon remote backend (see CLAUDE.md timing notes)
        res = {k: np.asarray(v) for k, v in res.items()}
        if n_batches > 0:
            total_ms += (time.time() - t0) * 1000.0
            timed += 1
        n_batches += 1

        # batches may be device-resident (DeviceAugIterator); metric math is host numpy
        label_det = np.asarray(batch["label_det"]) if "label_det" in batch else None
        # a pad_last iterator pads the final batch; only the first
        # len(fnames) rows are real samples
        n_real = len(fnames)
        if "det" in res:
            det = np.asarray(res["det"])
            inst_seg = (np.asarray(res["seg"])
                        if inst_acc is not None and "seg" in res else None)
            labels, preds = [], []
            for b in range(min(det.shape[0], n_real)):
                gt = label_det[b]
                gt = gt[gt[:, 0] >= 0][:, :5]
                rows = det[b]
                rows = rows[(rows[:, 0] >= 0) & (rows[:, 1] > det_score_thresh)]
                labels.append(gt)
                preds.append(rows[:, :6])
                dpath = disparity_path_for(fnames[b])
                if os.path.exists(dpath):
                    disparity = cv2.imread(dpath, cv2.IMREAD_UNCHANGED)
                    if disparity is not None:
                        dist_metric.update(disparity, rows)
                if inst_seg is not None:
                    # same filtered rows feed mAP and instance AP; masks are
                    # matched per image by the accumulator, then released
                    ipath = instance_path_for(fnames[b])
                    inst_img = (cv2.imread(ipath, cv2.IMREAD_UNCHANGED)
                                if ipath != fnames[b] and os.path.exists(ipath)
                                else None)
                    if inst_img is not None:
                        inst_preds = boxes_and_seg_to_instances(
                            rows, inst_seg[b], det_to_trainid,
                            list(class_names), inst_img.shape[:2])
                        inst_acc.update(inst_preds,
                                        inst_img.astype(np.int64))
            map_metric.update(labels, preds)

        if "seg" in res and "seg_label" in batch:
            seg_pred = np.asarray(res["seg"])[:n_real]
            seg_gt = np.asarray(batch["seg_label"])[:n_real]
            iou_metric.update(seg_gt, seg_pred)
            acc_metric.update(seg_gt, seg_pred)
            if write_results:
                from dspnet_tpu.evaluate.cityscapes_eval import (
                    write_result_png,
                    write_result_png_from_probs,
                )

                os.makedirs(write_results, exist_ok=True)
                seg_prob = res.get("seg_prob")  # prefer the reference's
                # bilinear probability upsampling (multi_eval.py:28-34)
                for b in range(seg_pred.shape[0]):
                    name = os.path.splitext(os.path.basename(fnames[b]))[0] + "_pred.png"
                    path = os.path.join(write_results, name)
                    if seg_prob is not None:
                        write_result_png_from_probs(seg_prob[b], path)
                    else:
                        write_result_png(seg_pred[b], path)

    if dist_errors_path:
        # per-box relative-error dump, percent (reference train/metric.py:259)
        dist_metric.save_errors(dist_errors_path)

    results: Dict[str, float] = {}
    # Per-class entries are namespaced: the metrics all key by bare class
    # name and det classes are a subset of the seg classes, so a flat
    # update() would overwrite per-class AP with IoU and then derror.
    headline = {"mAP", "mIoU", "accuracy", "derror"}
    for metric, prefix in ((map_metric, "ap_"), (iou_metric, "iou_"),
                           (acc_metric, ""), (dist_metric, "derror_")):
        try:
            for k, v in metric.get_dict().items():
                results[k if k in headline else prefix + k] = v
        except Exception:  # a broken metric must not abort the others,
            import logging  # but silence would read as "not computed"

            logging.getLogger(__name__).exception(
                "metric %s failed; its keys are missing from the results",
                type(metric).__name__)
    if inst_acc is not None:
        if inst_acc.num_images == 0:
            import logging

            logging.getLogger(__name__).warning(
                "instance_eval: no *_instanceIds.png ground truth found "
                "(expected SegmentationInstance/ beside JPEGImages/, see "
                "prepare_cityscapes --instance-ids); instAP not computed")
        else:
            inst = inst_acc.get()
            results["instAP"] = inst.pop("AP")
            results["instAP50"] = inst.pop("AP50")
            results.update({f"inst_{c}": v for c, v in inst.items()})
    results["ms_per_batch"] = total_ms / max(timed, 1)
    if log_fn:
        for k in ("mAP", "mIoU", "accuracy", "derror", "instAP", "instAP50",
                  "ms_per_batch"):
            if k in results:
                log_fn(f"{k}: {results[k]}")
        # LaTeX-ready &-joined row (multi_solver.py:500-517)
        log_fn(" & ".join(
            f"{k}={results[k]:.4f}" for k in ("mAP", "mIoU", "accuracy", "derror", "ms_per_batch")
            if isinstance(results.get(k), float)
        ))
    return results
