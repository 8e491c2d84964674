"""Region Proposal Network over the FPN levels.

Fixed-shape proposal generation (replacing Detectron2's RPN used at
reference Detector/extract_features.py:54): shared 3x3 conv + objectness /
delta heads per level, static pre-NMS top-k per level, delta decoding,
clipping, and one fixed-size NMS over the concatenated candidates. Training
losses use IoU 0.7/0.3 matching and a 256-anchor fixed sample.
"""

from __future__ import annotations

from typing import Any, Dict, List, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from crct_tpu.detector import boxes as box_ops
from crct_tpu.ops.nms import fast_nms, nms

RPN_SIZES = (32, 64, 128, 256, 512)        # one size per P2..P6
RPN_STRIDES = (4, 8, 16, 32, 64)
NUM_ANCHOR_RATIOS = 3


class RPNHead(nn.Module):
    """Shared conv + objectness/delta predictions for each level."""
    num_anchors: int = NUM_ANCHOR_RATIOS
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, feats: Sequence[jnp.ndarray]):
        conv = nn.Conv(feats[0].shape[-1], (3, 3), padding=1,
                       dtype=self.dtype, name="conv")
        obj = nn.Conv(self.num_anchors, (1, 1), dtype=self.dtype,
                      name="objectness")
        deltas = nn.Conv(self.num_anchors * 4, (1, 1), dtype=self.dtype,
                         name="deltas")
        logits, boxes = [], []
        for f in feats:
            h = nn.relu(conv(f))
            logits.append(obj(h).reshape(-1))
            boxes.append(deltas(h).reshape(-1, 4))
        return logits, boxes


def level_anchors(feat_shapes: Sequence[Tuple[int, int]]) -> List[np.ndarray]:
    return [box_ops.generate_anchors(shape, RPN_STRIDES[i], [RPN_SIZES[i]])
            for i, shape in enumerate(feat_shapes)]


def propose(logits: Sequence[jnp.ndarray], deltas: Sequence[jnp.ndarray],
            anchors: Sequence[jnp.ndarray], image_hw: Tuple[int, int], *,
            pre_nms_topk: int = 1000, post_nms_topk: int = 512,
            nms_thresh: float = 0.7, fast: bool = False
            ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Decode + per-level top-k + joint NMS -> fixed post_nms_topk proposals.

    ``fast=True`` swaps the exact sequential NMS for the parallel
    ``fast_nms`` (keep set is a subset of exact; see ops/nms.py) — a
    train-time throughput option, since proposals only feed RoI sampling.

    Returns (boxes [K,4], scores [K], valid [K])."""
    cand_boxes, cand_scores = [], []
    H, W = image_hw
    for lg, dl, an in zip(logits, deltas, anchors):
        k = min(pre_nms_topk, lg.shape[0])
        # f32 decode under a bf16 model: box coords must keep sub-pixel
        # precision on large canvases
        top_scores, idx = jax.lax.top_k(lg.astype(jnp.float32), k)
        dec = box_ops.decode_deltas(dl[idx].astype(jnp.float32),
                                    jnp.asarray(an)[idx])
        dec = box_ops.clip_boxes(dec, H, W)
        cand_boxes.append(dec)
        cand_scores.append(top_scores)
    all_boxes = jnp.concatenate(cand_boxes)
    all_scores = jax.nn.sigmoid(jnp.concatenate(cand_scores))
    # degenerate boxes get zero score
    wh_ok = ((all_boxes[:, 2] - all_boxes[:, 0]) > 1e-3) & \
        ((all_boxes[:, 3] - all_boxes[:, 1]) > 1e-3)
    all_scores = jnp.where(wh_ok, all_scores, 0.0)
    nms_fn = fast_nms if fast else nms
    keep, valid = nms_fn(all_boxes, all_scores, iou_threshold=nms_thresh,
                         score_threshold=0.0, max_outputs=post_nms_topk)
    safe = jnp.maximum(keep, 0)
    return all_boxes[safe], all_scores[safe] * valid, valid


def rpn_losses(logits: Sequence[jnp.ndarray], deltas: Sequence[jnp.ndarray],
               anchors: Sequence[np.ndarray], gt_boxes: jnp.ndarray,
               gt_valid: jnp.ndarray, rng: jax.Array, *,
               batch_per_image: int = 256, pos_fraction: float = 0.5
               ) -> Dict[str, jnp.ndarray]:
    """Objectness BCE + box smooth-L1 over a 256-anchor fixed sample."""
    # f32 loss boundary (no-op for an f32 model; see box_head_losses)
    all_logits = jnp.concatenate(list(logits)).astype(jnp.float32)
    all_deltas = jnp.concatenate(list(deltas)).astype(jnp.float32)
    all_anchors = jnp.asarray(np.concatenate(anchors))
    matched_gt, label = box_ops.match_anchors(
        all_anchors, gt_boxes, gt_valid, pos_thr=0.7, neg_thr=0.3)
    idx, weight = box_ops.sample_fixed(label, rng, num=batch_per_image,
                                       pos_fraction=pos_fraction)
    sel_logits = all_logits[idx]
    sel_label = (label[idx] == 1).astype(jnp.float32)
    bce = jnp.maximum(sel_logits, 0) - sel_logits * sel_label + \
        jnp.log1p(jnp.exp(-jnp.abs(sel_logits)))
    obj_loss = jnp.sum(bce * weight) / jnp.maximum(jnp.sum(weight), 1.0)

    pos_w = weight * sel_label
    target = box_ops.encode_deltas(gt_boxes[matched_gt[idx]],
                                   all_anchors[idx])
    diff = jnp.abs(all_deltas[idx] - target)
    beta = 1.0 / 9
    sl1 = jnp.where(diff < beta, 0.5 * diff * diff / beta, diff - 0.5 * beta)
    box_loss = jnp.sum(sl1.sum(-1) * pos_w) / jnp.maximum(jnp.sum(weight), 1.0)
    return {"rpn_obj": obj_loss, "rpn_box": box_loss}
