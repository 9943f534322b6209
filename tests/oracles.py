"""Pure-numpy oracles for the reference's custom operators.

These are sequential, loop-level transcriptions of the *behavior* of the
reference C++ CPU kernels (cited per function), used only as property-test
oracles for the fixed-shape JAX/Pallas ops. They intentionally favor
legibility over speed.
"""

from __future__ import annotations

import math

import numpy as np


def multibox_prior_oracle(fh, fw, sizes, ratios, steps=(-1.0, -1.0), offsets=(0.5, 0.5), clip=False):
    """Oracle for operator/multibox_prior.cc:30-71 (+-inl.h:119-128)."""
    if steps[0] > 0 and steps[1] > 0:
        step_y, step_x = steps[0], steps[1]
    else:  # C++ resets BOTH when either is unset (multibox_prior-inl.h)
        step_y, step_x = 1.0 / fh, 1.0 / fw
    out = []
    for r in range(fh):
        cy = (r + offsets[0]) * step_y
        for c in range(fw):
            cx = (c + offsets[1]) * step_x
            for s in sizes:
                w = s * fh / fw / 2.0
                h = s / 2.0
                out.append([cx - w, cy - h, cx + w, cy + h])
            s0 = sizes[0]
            for ratio in ratios[1:]:
                sr = math.sqrt(ratio)
                w = s0 * fh / fw * sr / 2.0
                h = s0 / sr / 2.0
                out.append([cx - w, cy - h, cx + w, cy + h])
    out = np.asarray(out, np.float32)
    if clip:
        out = np.clip(out, 0.0, 1.0)
    return out


def _iou(a, b):
    """IoU of two corner boxes with the zero-union guard
    (multibox_target-inl.h:44-50,154-161)."""
    iw = max(0.0, min(a[2], b[2]) - max(a[0], b[0]))
    ih = max(0.0, min(a[3], b[3]) - max(a[1], b[1]))
    inter = iw * ih
    union = (a[2] - a[0]) * (a[3] - a[1]) + (b[2] - b[0]) * (b[3] - b[1]) - inter
    if union == 0.0:
        return 0.0
    return inter / union


def multibox_target_oracle(
    anchors,
    labels,
    cls_preds,
    overlap_threshold=0.5,
    ignore_label=-1.0,
    negative_mining_ratio=-1.0,
    negative_mining_thresh=0.5,
    variances=(0.1, 0.1, 0.2, 0.2),
):
    """Oracle for operator/multibox_target.cc:73-284.

    anchors (A, 4), labels (B, L, 6), cls_preds (B, C, A) ->
    loc_target (B, A, 5), loc_mask (B, A, 5), cls_target (B, A).
    """
    anchors = np.asarray(anchors, np.float64)
    labels = np.asarray(labels, np.float64)
    cls_preds = np.asarray(cls_preds, np.float64)
    B, L, _ = labels.shape
    A = anchors.shape[0]
    C = cls_preds.shape[1]
    loc_target = np.zeros((B, A, 5))
    loc_mask = np.zeros((B, A, 5))
    cls_target = np.full((B, A), ignore_label)

    for b in range(B):
        num_valid = 0
        for i in range(L):
            if labels[b, i, 0] == -1.0:
                break
            num_valid += 1
        if num_valid == 0:
            continue

        overlaps = np.zeros((A, L))
        for j in range(A):
            for k in range(num_valid):
                overlaps[j, k] = _iou(anchors[j], labels[b, k, 1:5])

        gt_flags = [False] * num_valid
        match_iou = [-1.0] * A
        match_gt = [-1] * A
        anchor_flags = [-1] * A  # -1 ignore, 0 negative, 1 positive
        num_positive = 0

        # phase 1: greedy bipartite (cc:113-149)
        while not all(gt_flags):
            best_anchor, best_gt, max_overlap = -1, -1, 1e-6
            for j in range(A):
                if anchor_flags[j] == 1:
                    continue
                for k in range(num_valid):
                    if gt_flags[k]:
                        continue
                    if overlaps[j, k] > max_overlap:
                        best_anchor, best_gt, max_overlap = j, k, overlaps[j, k]
            if best_anchor == -1:
                break
            match_iou[best_anchor] = max_overlap
            match_gt[best_anchor] = best_gt
            num_positive += 1
            gt_flags[best_gt] = True
            anchor_flags[best_anchor] = 1

        # phase 2: threshold matching (cc:151-180)
        if overlap_threshold > 0:
            for j in range(A):
                if anchor_flags[j] == 1:
                    continue
                best_gt, max_iou = -1, -1.0
                for k in range(num_valid):
                    if overlaps[j, k] > max_iou:
                        best_gt, max_iou = k, overlaps[j, k]
                if best_gt != -1:
                    match_iou[j] = max_iou
                    match_gt[j] = best_gt
                    if max_iou > overlap_threshold:
                        num_positive += 1
                        gt_flags[best_gt] = True
                        anchor_flags[j] = 1

        # phase 3: negatives (cc:182-249)
        if negative_mining_ratio > 0:
            num_negative = int(num_positive * negative_mining_ratio)
            num_negative = min(num_negative, A - num_positive)
            if num_negative > 0:
                cand = []
                for j in range(A):
                    if anchor_flags[j] == 1:
                        continue
                    if match_iou[j] < 0:
                        best_gt, max_iou = -1, -1.0
                        for k in range(num_valid):
                            if overlaps[j, k] > max_iou:
                                best_gt, max_iou = k, overlaps[j, k]
                        if best_gt != -1:
                            match_iou[j] = max_iou
                            match_gt[j] = best_gt
                    if match_iou[j] < negative_mining_thresh and anchor_flags[j] == -1:
                        logits = cls_preds[b, :, j]
                        m = logits.max()
                        prob0 = math.exp(logits[0] - m) / np.exp(logits - m).sum()
                        cand.append((-prob0, j))
                # std::stable_sort on descending -prob == ascending prob,
                # ties keep anchor order
                cand.sort(key=lambda t: t[0], reverse=True)
                for _, j in cand[:num_negative]:
                    anchor_flags[j] = 0
        else:
            for j in range(A):
                if anchor_flags[j] != 1:
                    anchor_flags[j] = 0

        # target assignment (cc:251-281)
        vx, vy, vw, vh = variances
        for j in range(A):
            if anchor_flags[j] == 1:
                g = labels[b, match_gt[j]]
                cls_target[b, j] = g[0] + 1
                loc_mask[b, j, :] = 1
                al, at, ar, ab = anchors[j]
                aw, ah = ar - al, ab - at
                ax, ay = (al + ar) / 2, (at + ab) / 2
                gl, gt_, gr, gb, gz = g[1], g[2], g[3], g[4], g[5]
                gw, gh = gr - gl, gb - gt_
                gx, gy = (gl + gr) / 2, (gt_ + gb) / 2
                loc_target[b, j] = [
                    (gx - ax) / aw / vx,
                    (gy - ay) / ah / vy,
                    math.log(gw / aw) / vw,
                    math.log(gh / ah) / vh,
                    gz / 0.1,
                ]
            elif anchor_flags[j] == 0:
                cls_target[b, j] = 0
    return loc_target, loc_mask, cls_target


def multibox_detection_oracle(
    cls_prob,
    loc_pred,
    anchors,
    threshold=0.01,
    clip=True,
    variances=(0.1, 0.1, 0.2, 0.2),
    nms_threshold=0.5,
    force_suppress=False,
    nms_topk=400,
):
    """Oracle for operator/multibox_detection.cc:53-169.

    Returns the full (B, A, 7) buffer with the reference's exact semantics,
    including the unsorted-tail quirk when valid_count > nms_topk.
    """
    cls_prob = np.asarray(cls_prob, np.float64)
    loc_pred = np.asarray(loc_pred, np.float64).reshape(cls_prob.shape[0], -1, 5)
    anchors = np.asarray(anchors, np.float64).reshape(-1, 4)
    B, C, A = cls_prob.shape
    vx, vy, vw, vh = variances
    out = np.full((B, A, 7), -1.0)

    for b in range(B):
        valid = 0
        for i in range(A):
            score, cid = -1.0, 0
            for j in range(1, C):
                if cls_prob[b, j, i] > score:
                    score, cid = cls_prob[b, j, i], j
            if cid > 0 and score < threshold:
                cid = 0
            if cid > 0:
                al, at, ar, ab = anchors[i]
                aw, ah = ar - al, ab - at
                ax, ay = (al + ar) / 2, (at + ab) / 2
                px, py, pw, ph, pz = loc_pred[b, i]
                ox = px * vx * aw + ax
                oy = py * vy * ah + ay
                ow = math.exp(pw * vw) * aw / 2
                oh = math.exp(ph * vh) * ah / 2
                oz = pz * 0.1
                row = [ox - ow, oy - oh, ox + ow, oy + oh, oz]
                if clip:
                    row = [min(1.0, max(0.0, v)) for v in row]
                out[b, valid] = [cid - 1, score] + row[:4] + [row[4]]
                valid += 1
        if valid < 1 or nms_threshold <= 0 or nms_threshold > 1:
            continue
        temp = out[b].copy()
        order = sorted(range(valid), key=lambda i: -out[b, i, 1])  # stable
        nkeep = min(valid, nms_topk) if nms_topk > 0 else valid
        for i in range(nkeep):
            out[b, i] = temp[order[i]]
        for i in range(valid):
            if out[b, i, 0] < 0:
                continue
            for j in range(i + 1, valid):
                if out[b, j, 0] < 0:
                    continue
                if force_suppress or out[b, i, 0] == out[b, j, 0]:
                    if _iou(out[b, i, 2:6], out[b, j, 2:6]) >= nms_threshold:
                        out[b, j, 0] = -1
    return out
