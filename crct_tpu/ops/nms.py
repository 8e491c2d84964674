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
def fast_nms(boxes: jnp.ndarray, scores: jnp.ndarray, *,
             iou_threshold: float = 0.5, score_threshold: float = 0.0,
             max_outputs: int = 100) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Parallel NMS (YOLACT-style): box i survives iff NO higher-scoring
    box overlaps it — including boxes that were themselves suppressed.

    The keep set is therefore always a SUBSET of exact ``nms()``'s (a
    suppressed j can still suppress i here), i.e. it only over-suppresses;
    kept boxes still never overlap above the threshold. In exchange the
    whole op is one sort + one IoU matrix + a column max — no
    ``max_outputs``-step serialized loop, which on TPU turns hundreds of
    tiny dependent kernels into a handful of parallel ones.

    Same interface as ``nms()``: (indices [max_outputs], valid) with
    indices emitted in score order.
    """
    n = boxes.shape[0]
    order = jnp.argsort(-scores)
    b = boxes[order]
    s = scores[order]
    ious = iou_matrix(b, b)
    # row j suppresses column i only for j < i (strictly higher score;
    # ties broken by sort order, matching nms()'s argmax-first semantics)
    ut = jnp.triu(jnp.ones((n, n), bool), k=1)
    overlapped = jnp.max(jnp.where(ut, ious, 0.0), axis=0)
    keep = (overlapped <= iou_threshold) & (s > score_threshold)

    # compact the kept rows (already score-ordered) into max_outputs slots
    rank = jnp.cumsum(keep) - 1
    slot = jnp.where(keep & (rank < max_outputs), rank, max_outputs)
    keep_idx = jnp.full((max_outputs + 1,), -1, jnp.int32)
    keep_idx = keep_idx.at[slot].set(order.astype(jnp.int32))[:max_outputs]
    keep_valid = jnp.zeros((max_outputs + 1,), bool)
    keep_valid = keep_valid.at[slot].set(keep)[:max_outputs]
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
