"""Shared CLI plumbing: logging + dataset resolution."""

from __future__ import annotations

import logging
import os
import time


def setup_logging(log_dir: str = "log", log_file: str | None = None):
    """Timestamped file handler under log/ (reference multi_train.py:267-274)."""
    logger = logging.getLogger()
    logger.setLevel(logging.INFO)
    fmt = logging.Formatter("%(asctime)s %(levelname)s %(message)s")
    sh = logging.StreamHandler()
    sh.setFormatter(fmt)
    logger.addHandler(sh)
    os.makedirs(log_dir, exist_ok=True)
    if log_file is None:
        log_file = time.strftime("train_%Y%m%d_%H%M%S.log")
    fh = logging.FileHandler(os.path.join(log_dir, log_file))
    fh.setFormatter(fmt)
    logger.addHandler(fh)
    return logger


def resolve_dataset(args, split: str):
    """Return a SampleIndex for --dataset-root / --synthetic options."""
    from dspnet_tpu.data import synthetic

    if getattr(args, "synthetic", 0):
        n = int(args.synthetic)
        if split != "train" and getattr(args, "synthetic_val", 0):
            n = int(args.synthetic_val)
        root = os.path.join(getattr(args, "synthetic_dir", "/tmp/dspnet_synth"), split)
        return synthetic.build_dataset(
            root,
            num_samples=n,
            hw=(args.data_shape[0], args.data_shape[1]),
            seed=233 if split == "train" else 91,
            with_instances=getattr(args, "instance_eval", False),
        )
    from dspnet_tpu.data.imdb import (CITYSCAPES_DET_CLASSES, VOC_CLASSES,
                                      load_index)

    # Thread the model's class-name table into XML-backed layouts so the
    # name->id mapping matches the head the labels will train/score (the
    # reference's cfg.dataset.class_names contract). Without this, an
    # 8-class run over a VOC tree silently indexed annotations with the
    # 20-class VOC table: rider/truck/motorcycle dropped as unknown names,
    # the rest trained under scrambled ids (caught by the mAP collapse in
    # the round-5 VOC convergence run).
    classes = None
    spec = getattr(args, "class_names", "")
    if spec:
        classes = resolve_class_names(spec, None)
    else:
        nc = int(getattr(args, "num_classes", 0) or 0)
        if nc == len(CITYSCAPES_DET_CLASSES):
            classes = list(CITYSCAPES_DET_CLASSES)
        elif nc == len(VOC_CLASSES):
            classes = list(VOC_CLASSES)
    return load_index(args.dataset_root, split, classes=classes)


def resolve_class_names(spec: str, default):
    """--class-names: a file of one name per line (the reference's
    dataset/names/*.txt contract, multi_train.py:141-143), a comma-separated
    list, or '' for the default (Cityscapes 8 / VOC 20 per the model)."""
    if not spec:
        return list(default)
    if os.path.exists(spec):
        with open(spec) as f:
            return [line.strip() for line in f if line.strip()]
    return [c.strip() for c in spec.split(",") if c.strip()]


def parse_data_shape(s):
    """'3,512,1024' or '512,1024' or '512' -> (H, W)."""
    parts = [int(x) for x in str(s).split(",")]
    if len(parts) == 3:
        return (parts[1], parts[2])
    if len(parts) == 2:
        return (parts[0], parts[1])
    return (parts[0], parts[0])
