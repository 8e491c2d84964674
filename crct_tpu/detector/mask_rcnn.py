"""Mask R-CNN / Faster R-CNN assembled, fixed shapes end to end.

The detector the reference trains with Detectron2 (Mask-RCNN R50-FPN for
plotqa, Faster-RCNN R50/R101-FPN for the other datasets,
Detector/frcnn.py:137-155), rebuilt as one jittable Flax module: ResNet ->
FPN -> RPN (fixed-k proposals) -> RoIAlign box head -> class-specific
predictor (-> optional mask head). Single-image graphs are vmapped/batched
by the trainer; all box counts are static.
"""

from __future__ import annotations

from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from crct_tpu.detector import boxes as box_ops
from crct_tpu.detector.fpn import FPN
from crct_tpu.detector.heads import (BoxHead, BoxPredictor, MaskHead,
                                     box_head_inference, box_head_losses,
                                     mask_loss)
from crct_tpu.detector.resnet import ResNet
from crct_tpu.detector.rpn import RPNHead, level_anchors, propose, rpn_losses
from crct_tpu.ops.roi_align import multilevel_roi_align

ROI_STRIDES = (4, 8, 16, 32)


class MaskRCNN(nn.Module):
    """Single-image detector; batching via jax.vmap in the trainer."""
    num_classes: int
    depth: int = 50
    with_mask: bool = True
    fc_dim: int = 1024
    post_nms_topk_train: int = 512
    post_nms_topk_test: int = 512
    roi_batch: int = 256            # sampled proposals per image (train)
    # single source of truth for the fg fraction: sample_fixed caps
    # positives at roi_batch * ROI_POS_FRACTION, and the mask branch sizes
    # its fg-only subset from the same constant — keeping the two coupled
    # is what makes the fg-subset mask loss exactly equal the all-roi one
    ROI_POS_FRACTION = 0.25
    dtype: Any = jnp.float32
    stride_in_1x1: bool = False     # True for Detectron2 model-zoo weights
    freeze_at: int = 0              # reference fine-tune default: 2
    # opt-in: parallel fast-NMS for TRAIN-time proposals only (keep set is
    # a subset of exact NMS; proposals only feed RoI sampling). Inference
    # and extraction always use exact NMS.
    fast_train_nms: bool = False
    # inference score cut before NMS; 0.5 is the reference's
    # SCORE_THRESH_TEST (Detector/frcnn.py:133). Lower it for weakly
    # trained detectors (e.g. extraction smoke runs) or mAP-style eval.
    score_thresh_test: float = 0.5

    def setup(self):
        self.backbone = ResNet(self.depth, self.dtype, self.stride_in_1x1,
                               self.freeze_at)
        self.fpn = FPN(256, self.dtype)
        self.rpn_head = RPNHead(dtype=self.dtype)
        self.box_head = BoxHead(self.fc_dim, self.dtype)
        self.box_predictor = BoxPredictor(self.num_classes, self.dtype)
        if self.with_mask:
            self.mask_head = MaskHead(self.num_classes, dtype=self.dtype)

    def features(self, image: jnp.ndarray) -> Tuple[jnp.ndarray, ...]:
        """image [H, W, 3] -> FPN maps (P2..P6)."""
        c_feats = self.backbone(image[None])
        p_feats = self.fpn([c[0] for c in c_feats])
        return p_feats

    def __call__(self, image: jnp.ndarray, *, train: bool = False,
                 gt_boxes: Optional[jnp.ndarray] = None,
                 gt_classes: Optional[jnp.ndarray] = None,
                 gt_valid: Optional[jnp.ndarray] = None,
                 gt_masks28: Optional[jnp.ndarray] = None,
                 rng: Optional[jax.Array] = None,
                 compute_masks: bool = True):
        H, W = image.shape[0], image.shape[1]
        p_feats = self.features(image)
        logits, deltas = self.rpn_head(p_feats)
        anchors = level_anchors([f.shape[:2] for f in p_feats])

        topk = self.post_nms_topk_train if train else self.post_nms_topk_test
        proposals, prop_scores, prop_valid = propose(
            logits, deltas, anchors, (H, W), post_nms_topk=topk,
            fast=train and self.fast_train_nms)

        if not train:
            return self._infer(p_feats, proposals, prop_valid, (H, W),
                               compute_masks)

        # ---- training path ------------------------------------------------
        assert rng is not None and gt_boxes is not None
        r1, r2 = jax.random.split(rng)
        losses = rpn_losses(logits, deltas, anchors, gt_boxes, gt_valid, r1)

        # proposals are training CONSTANTS (Detectron2 detaches them before
        # the RoI heads): without this, gradients from the box/mask losses
        # flow back through the RoIAlign sampling coordinates and the NMS
        # gathers into the RPN delta head — wrong semantics and a large
        # backward graph
        proposals = jax.lax.stop_gradient(proposals)

        # add GT boxes to the proposal pool (standard trick for early training)
        pool_boxes = jnp.concatenate([proposals, gt_boxes])
        pool_valid = jnp.concatenate(
            [prop_valid, gt_valid]).astype(jnp.float32)
        matched_gt, label = box_ops.match_anchors(
            pool_boxes, gt_boxes, gt_valid, pos_thr=0.5, neg_thr=0.5)
        label = jnp.where(pool_valid > 0, label, -1)
        idx, weight = box_ops.sample_fixed(
            label, r2, num=self.roi_batch,
            pos_fraction=self.ROI_POS_FRACTION)
        rois = pool_boxes[idx]
        is_fg = label[idx] == 1
        matched = matched_gt[idx]
        pooled = multilevel_roi_align(p_feats[:4], rois,
                                      strides=ROI_STRIDES, output_size=7)
        feats = self.box_head(pooled)
        scores, box_deltas = self.box_predictor(feats)
        losses.update(box_head_losses(
            scores, box_deltas, rois, gt_boxes[matched],
            gt_classes[matched], weight, is_fg))

        if self.with_mask and gt_masks28 is not None:
            # foreground-only mask branch (Detectron2 trains the mask head
            # on fg proposals only): sample_fixed caps positives at
            # roi_batch//4, so a fixed roi_batch//4-row subset (fg rows
            # first, stable) holds every foreground roi; the loss is
            # fg-weighted so the value is identical to running all rois,
            # at 1/4 the 14x14 RoIAlign + mask-head volume
            n_mask = max(1, int(self.roi_batch * self.ROI_POS_FRACTION))
            fg_w = weight * is_fg.astype(jnp.float32)
            fg_first = jnp.argsort(~is_fg, stable=True)[:n_mask]
            m_matched = matched[fg_first]     # compose indices: gather the
            mask_pooled = multilevel_roi_align(   # fg quarter once, not all
                p_feats[:4], rois[fg_first], strides=ROI_STRIDES,
                output_size=14)
            mlogits = self.mask_head(mask_pooled)
            losses["mask"] = mask_loss(mlogits, gt_masks28[m_matched],
                                       gt_classes[m_matched],
                                       fg_w[fg_first])
        losses["total"] = sum(losses.values())
        return losses

    def _infer(self, p_feats, proposals, prop_valid, hw,
               compute_masks: bool):
        """Inference tail shared by __call__ and detect_with_roi_features."""
        pooled = multilevel_roi_align(p_feats[:4], proposals,
                                      strides=ROI_STRIDES, output_size=7)
        feats = self.box_head(pooled)
        scores, box_deltas = self.box_predictor(feats)
        det_boxes, det_scores, det_classes, det_valid, kept_rows = \
            box_head_inference(scores, box_deltas, proposals,
                               prop_valid.astype(scores.dtype), hw,
                               score_thresh=self.score_thresh_test)
        out = {"boxes": det_boxes, "scores": det_scores,
               "classes": det_classes, "valid": det_valid,
               "features": feats[kept_rows],
               "proposals": proposals, "proposal_valid": prop_valid}
        # feature extraction only needs boxes + box-head features; the
        # mask branch (RoIAlign 14x14 + 4 convs + a [K,28,28,C] output
        # that would ride the host link) is skippable per call
        if self.with_mask and compute_masks:
            mask_pooled = multilevel_roi_align(
                p_feats[:4], det_boxes, strides=ROI_STRIDES,
                output_size=14)
            out["mask_logits"] = self.mask_head(mask_pooled)
        return out

    def detect_with_roi_features(self, image: jnp.ndarray,
                                 extra_boxes: jnp.ndarray, *,
                                 compute_masks: bool = False):
        """Inference plus box-head features for caller-supplied boxes from
        ONE backbone/FPN pass — the extractor's <IMG>-token path
        (extract_features.py:54-100) without running the trunk twice.
        Returns the inference dict with ``roi_features`` [K, fc_dim]
        appended."""
        H, W = image.shape[0], image.shape[1]
        p_feats = self.features(image)
        logits, deltas = self.rpn_head(p_feats)
        anchors = level_anchors([f.shape[:2] for f in p_feats])
        proposals, _, prop_valid = propose(
            logits, deltas, anchors, (H, W),
            post_nms_topk=self.post_nms_topk_test)
        out = self._infer(p_feats, proposals, prop_valid, (H, W),
                          compute_masks)
        extra_pooled = multilevel_roi_align(p_feats[:4], extra_boxes,
                                            strides=ROI_STRIDES,
                                            output_size=7)
        out["roi_features"] = self.box_head(extra_pooled)
        return out

    def extract_roi_features(self, image: jnp.ndarray, boxes: jnp.ndarray
                             ) -> jnp.ndarray:
        """1024-d box-head features for given boxes (the <IMG>-token path of
        the feature extractor, extract_features.py:54-100)."""
        p_feats = self.features(image)
        pooled = multilevel_roi_align(p_feats[:4], boxes,
                                      strides=ROI_STRIDES, output_size=7)
        return self.box_head(pooled)
