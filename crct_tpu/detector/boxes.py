"""Anchor generation, box delta coding, IoU matching, fixed-size sampling.

The geometry layer under the RPN and RoI heads (functionality Detectron2's
anchor generator / Box2BoxTransform / Matcher provide for the reference).
Everything is static-shape: matching produces per-anchor labels, sampling
selects a fixed number of rows via randomized top-k instead of dynamic
boolean indexing.
"""

from __future__ import annotations

from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from crct_tpu.ops.nms import iou_matrix


def generate_anchors(feat_shape: Tuple[int, int], stride: int,
                     sizes: Sequence[float],
                     ratios: Sequence[float] = (0.5, 1.0, 2.0)) -> np.ndarray:
    """Anchors for one level: [H*W*A, 4] (x1,y1,x2,y2), cell-centered."""
    H, W = feat_shape
    base = []
    for size in sizes:
        area = size * size
        for r in ratios:
            w = np.sqrt(area / r)
            h = w * r
            base.append([-w / 2, -h / 2, w / 2, h / 2])
    base = np.asarray(base, np.float32)                       # [A, 4]
    shift_x = (np.arange(W) + 0.5) * stride
    shift_y = (np.arange(H) + 0.5) * stride
    sx, sy = np.meshgrid(shift_x, shift_y)
    shifts = np.stack([sx, sy, sx, sy], axis=-1).reshape(-1, 1, 4)
    anchors = shifts + base[None, :, :]
    return anchors.reshape(-1, 4).astype(np.float32)


def encode_deltas(boxes: jnp.ndarray, anchors: jnp.ndarray,
                  weights=(1.0, 1.0, 1.0, 1.0)) -> jnp.ndarray:
    """Box -> (dx, dy, dw, dh) relative to anchors (R-CNN parameterization).
    Degenerate (zero-size) anchors/boxes are clamped so padding rows produce
    finite targets (their losses are masked downstream anyway)."""
    aw = jnp.maximum(anchors[:, 2] - anchors[:, 0], 1e-6)
    ah = jnp.maximum(anchors[:, 3] - anchors[:, 1], 1e-6)
    ax = anchors[:, 0] + aw / 2
    ay = anchors[:, 1] + ah / 2
    bw = jnp.maximum(boxes[:, 2] - boxes[:, 0], 1e-6)
    bh = jnp.maximum(boxes[:, 3] - boxes[:, 1], 1e-6)
    bx = boxes[:, 0] + bw / 2
    by = boxes[:, 1] + bh / 2
    wx, wy, ww, wh = weights
    return jnp.stack([wx * (bx - ax) / aw, wy * (by - ay) / ah,
                      ww * jnp.log(bw / aw), wh * jnp.log(bh / ah)], axis=-1)


def decode_deltas(deltas: jnp.ndarray, anchors: jnp.ndarray,
                  weights=(1.0, 1.0, 1.0, 1.0),
                  clip: float = np.log(1000.0 / 16)) -> jnp.ndarray:
    """(dx, dy, dw, dh) -> boxes."""
    aw = jnp.maximum(anchors[:, 2] - anchors[:, 0], 1e-6)
    ah = jnp.maximum(anchors[:, 3] - anchors[:, 1], 1e-6)
    ax = anchors[:, 0] + aw / 2
    ay = anchors[:, 1] + ah / 2
    wx, wy, ww, wh = weights
    dx = deltas[..., 0] / wx
    dy = deltas[..., 1] / wy
    dw = jnp.clip(deltas[..., 2] / ww, None, clip)
    dh = jnp.clip(deltas[..., 3] / wh, None, clip)
    cx = dx * aw + ax
    cy = dy * ah + ay
    w = jnp.exp(dw) * aw
    h = jnp.exp(dh) * ah
    return jnp.stack([cx - w / 2, cy - h / 2, cx + w / 2, cy + h / 2],
                     axis=-1)


def clip_boxes(boxes: jnp.ndarray, height, width) -> jnp.ndarray:
    x1 = jnp.clip(boxes[..., 0], 0, width)
    y1 = jnp.clip(boxes[..., 1], 0, height)
    x2 = jnp.clip(boxes[..., 2], 0, width)
    y2 = jnp.clip(boxes[..., 3], 0, height)
    return jnp.stack([x1, y1, x2, y2], axis=-1)


def match_anchors(anchors: jnp.ndarray, gt_boxes: jnp.ndarray,
                  gt_valid: jnp.ndarray, *, pos_thr: float, neg_thr: float
                  ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """IoU matching: returns (matched_gt_idx [N], label [N]) with label 1
    positive / 0 negative / -1 ignore. Anchors with max-IoU over pos_thr are
    positive, under neg_thr negative; each valid GT's best anchor is forced
    positive (low-quality matches, as in Detectron2's Matcher)."""
    ious = iou_matrix(anchors, gt_boxes)                  # [N, M]
    ious = jnp.where(gt_valid[None, :], ious, -1.0)
    best_gt = jnp.argmax(ious, axis=1)
    best_iou = jnp.max(ious, axis=1)
    label = jnp.where(best_iou >= pos_thr, 1,
                      jnp.where(best_iou < neg_thr, 0, -1))
    # force-match the best anchor of each GT. Invalid (padding) GTs must be
    # dropped from the scatter, not scattered as False: their argmax all
    # lands on anchor 0 and a duplicate-index .set(False) would clobber a
    # valid GT whose best anchor is also 0 (index 0 is the top NMS proposal
    # in the RoI-head match, so that collision is common).
    best_anchor_per_gt = jnp.argmax(ious, axis=0)         # [M]
    n = anchors.shape[0]
    scatter_idx = jnp.where(gt_valid, best_anchor_per_gt, n)  # n -> dropped
    forced = jnp.zeros(n, bool).at[scatter_idx].set(
        True, mode="drop")
    label = jnp.where(forced, 1, label)
    return best_gt, label


def sample_fixed(label: jnp.ndarray, rng: jax.Array, *, num: int,
                 pos_fraction: float) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Sample a fixed number of rows, positives first (up to
    num*pos_fraction), the rest negatives — randomized top-k so shapes stay
    static. Returns (indices [num], weights [num]) where weight 0 marks
    padding rows."""
    n = label.shape[0]
    num_pos = int(num * pos_fraction)
    noise = jax.random.uniform(rng, (n,))
    pos_score = jnp.where(label == 1, 1.0 + noise, 0.0)
    _, pos_idx = jax.lax.top_k(pos_score, num_pos)
    pos_ok = pos_score[pos_idx] > 0
    n_pos = jnp.sum(pos_ok)
    neg_score = jnp.where(label == 0, 1.0 + noise, 0.0)
    _, neg_idx = jax.lax.top_k(neg_score, num)
    # take enough negatives to fill the quota
    rank = jnp.arange(num)
    neg_ok = (neg_score[neg_idx] > 0) & (rank < (num - n_pos))
    idx = jnp.concatenate([pos_idx, neg_idx])
    ok = jnp.concatenate([pos_ok, neg_ok])
    order = jnp.argsort(~ok)          # valid rows first
    idx = idx[order][:num]
    ok = ok[order][:num]
    return idx, ok.astype(jnp.float32)
