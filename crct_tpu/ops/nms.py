"""Fixed-shape non-maximum suppression for XLA.

TPU-native replacement for Detectron2's CUDA batched NMS (inside
``box_predictor.inference``, reference Detector/extract_features.py:66):
an iterative masked-suppression ``lax.fori_loop`` with static bounds — at
each of ``max_outputs`` steps the highest-scoring live box is selected and
everything over the IoU threshold is suppressed. No dynamic shapes: the
output is always [max_outputs] indices plus a validity mask.

Class-aware ("batched") NMS uses the coordinate-offset trick: boxes are
shifted per class so cross-class pairs never overlap.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp

NEG_INF = -1e10


def iou_matrix(boxes_a: jnp.ndarray, boxes_b: jnp.ndarray) -> jnp.ndarray:
    """Pairwise IoU of [N,4] x [M,4] (x1,y1,x2,y2) -> [N,M]."""
    area_a = jnp.maximum(boxes_a[:, 2] - boxes_a[:, 0], 0) * \
        jnp.maximum(boxes_a[:, 3] - boxes_a[:, 1], 0)
    area_b = jnp.maximum(boxes_b[:, 2] - boxes_b[:, 0], 0) * \
        jnp.maximum(boxes_b[:, 3] - boxes_b[:, 1], 0)
    lt = jnp.maximum(boxes_a[:, None, :2], boxes_b[None, :, :2])
    rb = jnp.minimum(boxes_a[:, None, 2:], boxes_b[None, :, 2:])
    wh = jnp.maximum(rb - lt, 0)
    inter = wh[..., 0] * wh[..., 1]
    union = area_a[:, None] + area_b[None, :] - inter
    return inter / jnp.maximum(union, 1e-9)


@functools.partial(jax.jit, static_argnames=("max_outputs",))
def nms(boxes: jnp.ndarray, scores: jnp.ndarray, *, iou_threshold: float = 0.5,
        score_threshold: float = 0.0, max_outputs: int = 100
        ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Returns (indices [max_outputs], valid [max_outputs] bool)."""
    n = boxes.shape[0]
    ious = iou_matrix(boxes, boxes)
    live = scores > score_threshold

    def body(i, state):
        live_mask, keep_idx, keep_valid = state
        masked = jnp.where(live_mask, scores, NEG_INF)
        best = jnp.argmax(masked)
        ok = masked[best] > NEG_INF / 2
        keep_idx = keep_idx.at[i].set(jnp.where(ok, best, -1))
        keep_valid = keep_valid.at[i].set(ok)
        # suppress the selected box and everything it overlaps
        suppress = (ious[best] > iou_threshold) | \
            (jnp.arange(n) == best)
        live_mask = live_mask & jnp.where(ok, ~suppress, live_mask)
        return live_mask, keep_idx, keep_valid

    keep_idx = jnp.full((max_outputs,), -1, jnp.int32)
    keep_valid = jnp.zeros((max_outputs,), bool)
    _, keep_idx, keep_valid = jax.lax.fori_loop(
        0, min(max_outputs, n), body, (live, keep_idx, keep_valid))
    return keep_idx, keep_valid


@functools.partial(jax.jit, static_argnames=("max_outputs",))
def batched_nms(boxes: jnp.ndarray, scores: jnp.ndarray,
                classes: jnp.ndarray, *, iou_threshold: float = 0.5,
                score_threshold: float = 0.0, max_outputs: int = 100
                ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Class-aware NMS via per-class coordinate offsets."""
    span = jnp.max(boxes) - jnp.min(boxes) + 1.0
    offset = classes.astype(boxes.dtype)[:, None] * span
    return nms(boxes + offset, scores, iou_threshold=iou_threshold,
               score_threshold=score_threshold, max_outputs=max_outputs)


@functools.partial(jax.jit, static_argnames=("k",))
def top_k_boxes(scores: jnp.ndarray, k: int):
    """Static top-k with validity mask (for fixed proposal counts)."""
    k = min(k, scores.shape[0])
    vals, idx = jax.lax.top_k(scores, k)
    return idx, vals
