"""Detection-only iterator with SSD-style random crop/pad augmentation.

Capability parity with the reference's plain-SSD input paths
(dataset/iterator.py:113-297 DetIter and :10-111 DetRecordIter): per image,
one candidate pooled from the IoU-constrained RandCropper samples and the
RandPadder canvas (tools/rand_sampler.py) is applied, plus optional
horizontal mirror, random-interpolation resize, color jitter with the
cfg.train.color_jitter probabilities (config/config.py:50-51, forwarded to
the C++ record iterator at dataset/iterator.py:52-64 — here implemented in
data/augment.py:color_jitter), then mean-sub NHWC float.
Labels are (B, max_objects, 6) rows [cls, x1, y1, x2, y2, dist=0] — the
width-6 layout lets the shared multibox_target op consume plain-SSD labels
unchanged. The final partial batch is padded by wrapping to the start of
the epoch (the reference's getpad roll-over).

Used for training the 4-coordinate SSD variant (VOC-style datasets); the
multitask path uses data.iterator.MultiTaskIterator instead.
"""

from __future__ import annotations

from typing import Tuple

import cv2
import numpy as np

from dspnet_tpu.data import augment as aug
from dspnet_tpu.data import iterator as iterator_mod
from dspnet_tpu.data.iterator import SampleIndex
from dspnet_tpu.utils.config import cfg as default_cfg

INTERP_METHODS = [cv2.INTER_LINEAR, cv2.INTER_CUBIC, cv2.INTER_AREA,
                  cv2.INTER_NEAREST, cv2.INTER_LANCZOS4]


class DetIterator:
    def __init__(
        self,
        index: SampleIndex,
        batch_size: int,
        data_shape: Tuple[int, int],
        mean_pixels=aug.MEAN_PIXELS,
        max_objects: int = 100,
        is_train: bool = True,
        train_cfg=None,
        seed: int = 233,
        label_col5: str = "zero",
    ):
        """``label_col5``: 'zero' writes 0.0 into label column 5 (the dist
        slot — plain-SSD training, the default); 'passthrough' carries the
        sample's column 5 (the VOC eval path stores the difficult flag
        there, data/imdb.py PascalVoc(difficult_in_label=True), which the
        MApMetric labels contract expects)."""
        assert label_col5 in ("zero", "passthrough"), label_col5
        self.index = index
        self.batch_size = batch_size
        self.data_shape = tuple(data_shape)
        self.mean_pixels = mean_pixels
        self.max_objects = max_objects
        self.is_train = is_train
        self.label_col5 = label_col5
        self.cfg = train_cfg if train_cfg is not None else (
            default_cfg.train if is_train else default_cfg.valid
        )
        self.rng = np.random.RandomState(seed)
        self.order = np.arange(len(index))
        if is_train and self.cfg.get("shuffle", False):
            self.rng.shuffle(self.order)
        self.cursor = 0

    def reset(self):
        if self.is_train and self.cfg.get("shuffle", False):
            self.rng.shuffle(self.order)
        self.cursor = 0

    def __iter__(self):
        self.reset()
        while self.cursor < len(self.index):
            yield self.next_batch()

    def epoch(self):
        """Yield (batch, fnames) pairs like MultiTaskIterator.epoch — the
        eval-loop contract. The final partial batch wraps to the epoch start
        (this iterator's roll-over padding), so ``fnames`` lists only the
        REAL tail samples and consumers slice outputs by ``len(fnames)``."""
        self.reset()
        n = len(self.index)
        while self.cursor < n:
            start = self.cursor
            fnames = [self.index[int(self.order[i])].image_path
                      for i in range(start, min(start + self.batch_size, n))]
            yield self.next_batch(), fnames

    def _augment(self, img, label):
        """Crop/pad/mirror pipeline (iterator.py:249-297).

        Reference semantics: candidates are pooled from EVERY sampler
        (croppers return up to max_sample each; the padder's candidates are
        gated by rand_pad_prob), then exactly ONE is picked uniformly and
        applied — as a crop when its box lies inside the image, as a 128-
        filled pad canvas otherwise (iterator.py:254-279)."""
        rng = self.rng
        candidates = []
        for rs in self.cfg.get("rand_crop_samplers", []):
            candidates += rs.sample(label, rng)
        padder = self.cfg.get("rand_pad", None)
        if padder is not None and rng.rand() < self.cfg.get("rand_pad_prob", 0.0):
            candidates += padder.sample(label, rng)
        if candidates:
            box, label = candidates[int(rng.uniform(0, 1) * len(candidates))]
            h, w = img.shape[:2]
            # int() truncation like the reference (iterator.py:263-266)
            x1, y1 = int(box[0] * w), int(box[1] * h)
            x2, y2 = int(box[2] * w), int(box[3] * h)
            if x1 >= 0 and y1 >= 0 and x2 <= w and y2 <= h:
                img = img[y1:y2, x1:x2]
            else:  # padding mode: canvas filled 128, image at its offset
                canvas = np.full((y2 - y1, x2 - x1, 3), 128, img.dtype)
                canvas[-y1:-y1 + h, -x1:-x1 + w] = img
                img = canvas
        # mirror
        if rng.rand() < self.cfg.get("rand_mirror_prob", 0.0):
            img = cv2.flip(img, 1)
            valid = label[:, 0] >= 0
            x1 = label[valid, 1].copy()
            label[valid, 1] = 1.0 - label[valid, 3]
            label[valid, 3] = 1.0 - x1
        return img, label

    def next_batch(self):
        H, W = self.data_shape
        B = self.batch_size
        images = np.zeros((B, H, W, 3), np.float32)
        # width-6 rows (dist column 0) so the shared multibox_target op
        # consumes plain-SSD labels unchanged
        labels = np.full((B, self.max_objects, 6), -1.0, np.float32)
        for b in range(B):
            # final partial batch wraps to the epoch start (reference
            # DetIter pads via getpad roll-over) so no sample is dropped
            s = self.index[int(self.order[self.cursor % len(self.index)])]
            img, _ = iterator_mod.load_sample_arrays(s, with_seg=False)
            label = s.label[:, :6].copy()
            if self.is_train:
                img, label = self._augment(img, label)
                interp = INTERP_METHODS[self.rng.randint(len(INTERP_METHODS))] \
                    if self.cfg.get("inter_method", 1) == 10 else cv2.INTER_LINEAR
            else:
                interp = cv2.INTER_LINEAR
            img = cv2.resize(img, (W, H), interpolation=interp)
            if self.is_train:
                # hue/sat/illumination/contrast with the cfg probabilities
                # (reference config/config.py:50-51 via iterator.py:52-64);
                # applied post-resize on the data_shape uint8 image —
                # jitter is pixelwise, so ordering vs the geometric ops
                # differs only through interpolation rounding
                jitter = self.cfg.get("color_jitter", None)
                if jitter:
                    img = aug.color_jitter(img, jitter, self.rng)
            images[b] = aug.normalize_image(img, self.mean_pixels)
            valid = label[label[:, 0] >= 0][: self.max_objects]
            labels[b, : valid.shape[0], :5] = valid[:, :5]
            labels[b, : valid.shape[0], 5] = (
                valid[:, 5] if self.label_col5 == "passthrough" else 0.0)
            self.cursor += 1
        return {"images": images, "label_det": labels}
