"""Evaluation: streaming detection mAP, segmentation IoU, depth error,
offline VOC eval, Cityscapes result writing."""
