"""RoI box head, class-specific box predictor and mask head.

The 1024-d FC box-head features are the per-element visual features the
feature extractor stores into `.npy` records (reference
Detector/extract_features.py:62-100: box_pooler -> box_head -> 1024-d FC
feats). The predictor mirrors Detectron2's FastRCNNOutputLayers: softmax
over num_classes + background and class-specific box deltas with weights
(10, 10, 5, 5); inference applies the 0.5 score threshold of the reference
config (frcnn.py:133) and fixed-shape batched NMS.
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from crct_tpu.detector import boxes as box_ops
from crct_tpu.ops.nms import batched_nms

BOX_REG_WEIGHTS = (10.0, 10.0, 5.0, 5.0)


class BoxHead(nn.Module):
    """RoIAlign 7x7 -> flatten -> 2x FC(1024). Output is the 1024-d feature
    vector recorded per chart element."""
    fc_dim: int = 1024
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, pooled: jnp.ndarray) -> jnp.ndarray:
        x = pooled.reshape(pooled.shape[0], -1)
        x = nn.relu(nn.Dense(self.fc_dim, dtype=self.dtype, name="fc1")(x))
        x = nn.relu(nn.Dense(self.fc_dim, dtype=self.dtype, name="fc2")(x))
        return x


class BoxPredictor(nn.Module):
    """Classification (num_classes + 1 bg) + class-specific deltas."""
    num_classes: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, feats: jnp.ndarray):
        scores = nn.Dense(self.num_classes + 1, dtype=self.dtype,
                          name="cls_score")(feats)
        deltas = nn.Dense(self.num_classes * 4, dtype=self.dtype,
                          name="bbox_pred")(feats)
        return scores, deltas.reshape(feats.shape[0], self.num_classes, 4)


class MaskHead(nn.Module):
    """4x conv3x3 + deconv2x + 1x1 per-class mask logits (14x14 -> 28x28)."""
    num_classes: int
    conv_dim: int = 256
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, pooled: jnp.ndarray) -> jnp.ndarray:
        x = pooled
        for i in range(4):
            x = nn.relu(nn.Conv(self.conv_dim, (3, 3), padding=1,
                                dtype=self.dtype, name=f"mask_fcn{i + 1}")(x))
        x = nn.relu(nn.ConvTranspose(self.conv_dim, (2, 2), (2, 2),
                                     dtype=self.dtype, name="deconv")(x))
        return nn.Conv(self.num_classes, (1, 1), dtype=self.dtype,
                       name="predictor")(x)


def box_head_inference(scores: jnp.ndarray, deltas: jnp.ndarray,
                       proposals: jnp.ndarray, proposal_valid: jnp.ndarray,
                       image_hw: Tuple[int, int], *,
                       score_thresh: float = 0.5, nms_thresh: float = 0.5,
                       max_detections: int = 100):
    """Per-proposal best-class selection, delta decode, thresholded batched
    NMS; returns fixed-size (boxes, scores, classes, valid, kept_row)."""
    # box decoding and scoring stay f32 even under a bf16 model: bf16 box
    # coordinates on a 1344px canvas quantize to whole pixels
    scores = scores.astype(jnp.float32)
    deltas = deltas.astype(jnp.float32)
    probs = jax.nn.softmax(scores, axis=-1)
    fg = probs[:, :-1]                                # drop background col
    cls = jnp.argmax(fg, axis=-1)
    cls_score = jnp.max(fg, axis=-1)
    sel_deltas = jnp.take_along_axis(
        deltas, cls[:, None, None].repeat(4, -1), axis=1)[:, 0]
    dec = box_ops.decode_deltas(sel_deltas, proposals,
                                weights=BOX_REG_WEIGHTS)
    dec = box_ops.clip_boxes(dec, image_hw[0], image_hw[1])
    cls_score = cls_score * proposal_valid
    keep, valid = batched_nms(dec, cls_score, cls,
                              iou_threshold=nms_thresh,
                              score_threshold=score_thresh,
                              max_outputs=max_detections)
    safe = jnp.maximum(keep, 0)
    return (dec[safe], cls_score[safe] * valid, cls[safe], valid, safe)


def box_head_losses(scores: jnp.ndarray, deltas: jnp.ndarray,
                    proposals: jnp.ndarray, matched_gt_boxes: jnp.ndarray,
                    gt_class: jnp.ndarray, sample_weight: jnp.ndarray,
                    is_fg: jnp.ndarray) -> Dict[str, jnp.ndarray]:
    """Softmax CE over classes (+bg) and smooth-L1 on fg rows."""
    # losses always reduce in f32 (no-op for an f32 model; keeps the
    # opt-in bf16 detector's loss numerics stable)
    scores = scores.astype(jnp.float32)
    deltas = deltas.astype(jnp.float32)
    num_classes = deltas.shape[1]
    labels = jnp.where(is_fg, gt_class, num_classes)   # bg = last index
    logp = jax.nn.log_softmax(scores, axis=-1)
    ce = -jnp.take_along_axis(logp, labels[:, None], axis=-1)[:, 0]
    cls_loss = jnp.sum(ce * sample_weight) / \
        jnp.maximum(jnp.sum(sample_weight), 1.0)

    fg_w = sample_weight * is_fg.astype(jnp.float32)
    target = box_ops.encode_deltas(matched_gt_boxes, proposals,
                                   weights=BOX_REG_WEIGHTS)
    safe_cls = jnp.clip(gt_class, 0, num_classes - 1)
    sel = jnp.take_along_axis(
        deltas, safe_cls[:, None, None].repeat(4, -1), axis=1)[:, 0]
    diff = jnp.abs(sel - target)
    beta = 1.0
    sl1 = jnp.where(diff < beta, 0.5 * diff * diff / beta, diff - 0.5 * beta)
    box_loss = jnp.sum(sl1.sum(-1) * fg_w) / \
        jnp.maximum(jnp.sum(sample_weight), 1.0)
    return {"box_cls": cls_loss, "box_reg": box_loss}


def mask_loss(mask_logits: jnp.ndarray, gt_masks: jnp.ndarray,
              gt_class: jnp.ndarray, fg_weight: jnp.ndarray) -> jnp.ndarray:
    """Per-class BCE on 28x28 mask targets of the sampled foreground rows."""
    mask_logits = mask_logits.astype(jnp.float32)
    num_classes = mask_logits.shape[-1]
    safe_cls = jnp.clip(gt_class, 0, num_classes - 1)
    sel = jnp.take_along_axis(
        mask_logits,
        safe_cls[:, None, None, None].repeat(
            mask_logits.shape[1], 1).repeat(mask_logits.shape[2], 2),
        axis=-1)[..., 0]
    t = gt_masks.astype(jnp.float32)
    bce = jnp.maximum(sel, 0) - sel * t + jnp.log1p(jnp.exp(-jnp.abs(sel)))
    per_row = bce.mean(axis=(1, 2))
    return jnp.sum(per_row * fg_weight) / jnp.maximum(jnp.sum(fg_weight), 1.0)
