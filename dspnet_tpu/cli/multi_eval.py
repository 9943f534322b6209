"""Evaluation CLI — parity with reference multi_eval.py:106-465.

Computes detection mAP, segmentation mIoU + pixel accuracy, depth relative
error, and ms/batch in one pass over the validation set; optionally writes
full-resolution Cityscapes result PNGs (trainId -> labelId LUT) for the
official evaluator (multi_eval.py:356-362).
"""

from __future__ import annotations

import argparse
import os
import time

import cv2
import numpy as np
import jax

from dspnet_tpu.api import create_model
from dspnet_tpu.cli.common import parse_data_shape, resolve_dataset, setup_logging
from dspnet_tpu.data.cs_labels import DET_CLASSES, SEG_CLASSES, TRAINID_TO_LABELID
from dspnet_tpu.data.iterator import MultiTaskIterator
from dspnet_tpu.detect.detector import Detector
from dspnet_tpu.evaluate.eval_metric import (
    DistanceAccuracyMetric,
    IoUMetric,
    MApMetric,
    CustomAccuracyMetric,
)
from dspnet_tpu.utils.checkpoint import CheckpointManagerWrapper, checkpoint_prefix


def parse_args(argv=None):
    p = argparse.ArgumentParser(description="Evaluate a DSPNet network (TPU).")
    p.add_argument("--network", default="resnet-50_multi")
    p.add_argument("--data-shape", default="3,512,1024")
    p.add_argument("--num-classes", type=int, default=8)
    p.add_argument("--batch-size", type=int, default=1)
    p.add_argument("--epoch", type=int, default=-1, help="checkpoint epoch (-1 latest)")
    p.add_argument("--model-dir", default="model")
    p.add_argument("--dataset-root", default="")
    p.add_argument("--synthetic", type=int, default=0)
    p.add_argument("--synthetic-dir", default="/tmp/dspnet_synth")
    p.add_argument("--overlap-thresh", type=float, default=0.5)
    p.add_argument("--nms-thresh", type=float, default=0.45)
    p.add_argument("--det-score-thresh", type=float, default=0.1)
    p.add_argument("--write-results", default="", help="dir for Cityscapes result PNGs")
    p.add_argument("--random-init", action="store_true",
                   help="skip checkpoint load (pipeline smoke testing)")
    args = p.parse_args(argv)
    args.data_shape = parse_data_shape(args.data_shape)
    return args


def main(argv=None):
    args = parse_args(argv)
    log = setup_logging(log_file=time.strftime("eval_%Y%m%d_%H%M%S.log"))
    H, W = args.data_shape
    bundle = create_model(args.network, (H, W), args.num_classes)

    import jax.numpy as jnp

    from dspnet_tpu.train.solver import MultiTaskSolver

    solver = MultiTaskSolver(bundle.model, bundle.anchors if bundle.anchors is not None
                             else np.zeros((1, 4), np.float32))
    state = solver.init_state(jax.random.PRNGKey(0), jnp.zeros((args.batch_size, H, W, 3)))
    if not args.random_init:
        ckpt = CheckpointManagerWrapper(checkpoint_prefix(args.model_dir, args.network, H))
        state, epoch = ckpt.restore(None if args.epoch < 0 else args.epoch, state)
        log.info("loaded checkpoint epoch %d", epoch)

    variables = {"params": state.params}
    if state.batch_stats:
        variables["batch_stats"] = state.batch_stats
    detector = Detector(
        bundle.model, variables, bundle.anchors, (H, W), classes=list(DET_CLASSES),
        nms_thresh=args.nms_thresh, score_threshold=0.01,
    )

    index = resolve_dataset(args, "val")
    it = MultiTaskIterator(index, args.batch_size, (H, W), enable_aug=False, shuffle=False)

    map_metric = MApMetric(args.overlap_thresh, class_names=list(DET_CLASSES))
    iou_metric = IoUMetric(list(SEG_CLASSES))
    acc_metric = CustomAccuracyMetric()
    dist_metric = DistanceAccuracyMetric(list(DET_CLASSES))

    n_batches = 0
    total_ms = 0.0
    timed_batches = 0
    for batch, fnames in it.epoch():
        t0 = time.time()
        res = detector.predict(batch["images"])
        jax.block_until_ready(res)
        if n_batches > 0:  # exclude the compile batch from timing
            total_ms += (time.time() - t0) * 1000.0
            timed_batches += 1
        n_batches += 1

        if "det" in res:
            det = np.asarray(res["det"])
            labels, preds = [], []
            for b in range(det.shape[0]):
                gt = batch["label_det"][b]
                gt = gt[gt[:, 0] >= 0][:, :5]
                rows = det[b]
                rows = rows[(rows[:, 0] >= 0) & (rows[:, 1] > args.det_score_thresh)]
                labels.append(gt)
                preds.append(rows[:, :6])
                # depth error vs disparity PNG if present
                disp_path = fnames[b].replace("JPEGImages", "Disparity").replace(
                    "_leftImg8bit.jpg", "_disparity.png"
                )
                if os.path.exists(disp_path):
                    disparity = cv2.imread(disp_path, cv2.IMREAD_UNCHANGED)
                    dist_metric.update(disparity, rows)
            map_metric.update(labels, preds)
        if "seg" in res and "seg_label" in batch:
            seg_pred = np.asarray(res["seg"])
            iou_metric.update(batch["seg_label"], seg_pred)
            acc_metric.update(batch["seg_label"], seg_pred)
            if args.write_results:
                os.makedirs(args.write_results, exist_ok=True)
                for b in range(seg_pred.shape[0]):
                    up = cv2.resize(
                        seg_pred[b].astype(np.uint8), (2048, 1024),
                        interpolation=cv2.INTER_NEAREST,
                    )
                    out = TRAINID_TO_LABELID[np.clip(up, 0, 18)]
                    name = os.path.splitext(os.path.basename(fnames[b]))[0] + "_pred.png"
                    cv2.imwrite(os.path.join(args.write_results, name), out)

    results = {}
    for metric in (map_metric, iou_metric, acc_metric, dist_metric):
        try:
            results.update(metric.get_dict())
        except Exception:
            pass
    results["ms_per_batch"] = total_ms / max(timed_batches, 1)
    for k, v in results.items():
        log.info("%s: %s", k, v)
    # LaTeX-style row like the reference (multi_solver.py:500-517)
    keys = ["mAP", "mIoU", "accuracy", "derror", "ms_per_batch"]
    log.info(" & ".join(f"{k}={results.get(k, float('nan')):.4f}"
                        if isinstance(results.get(k), float) else f"{k}={results.get(k)}"
                        for k in keys))
    return results


if __name__ == "__main__":
    main()
